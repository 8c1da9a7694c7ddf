"""Deterministic text-hashing primitives shared by the dedup surface.

Single source for the integer hashing used by the corpus dedup queries
(corpus/textops.py, corpus/simops.py) and the incremental LshIndex
(operators/lsh.py).  Everything is explicit integer arithmetic — a
31-polynomial rolling hash over char 5-grams and modular minhash
permutations — NEVER engine-native hash functions, so Spark and the
DuckDB oracle (and any future engine) produce bit-identical values.

Bounds: cleaned text is capped at 64 chars, so a 5-gram hash is
< 128 * (1+31+961+29791+923521) < 1.3e8; a*h for the largest perm
coefficient stays < 2^53 — exact in any engine's integer or double
arithmetic.
"""

from __future__ import annotations

# normalize: lowercase, strip non-alphanumerics, cap at 64 chars
CLEAN_SPARK = "substr(regexp_replace(lower(text), '[^a-z0-9 ]', ''), 1, 64)"
CLEAN_DUCK = "substr(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, 64)"

POW31 = (1, 31, 961, 29791, 923521)

# (a, b) pairs for minhash permutations; p prime. a*h <= 1e6 * 2.4e8 < 2^53.
MINHASH_PERMS = (
    (123457, 886731), (594521, 193939), (354761, 902389), (781937, 359791),
    (279551, 645131), (909091, 122807), (443389, 777001), (671771, 500009),
)
MINHASH_P = 1_000_003

# 2 bands x 4 rows: P(band collision) = jaccard^4 — tight enough that a
# low-diversity corpus (tiny vocabulary) doesn't explode the candidate
# set.  4 bands x 2 rows produced 582k candidates from 5k docs here.
LSH_BANDS = ((0, 1, 2, 3), (4, 5, 6, 7))
JACCARD_THRESHOLD = 0.5


def h_expr(s: str, i: str) -> str:
    """SQL expr: 31-polynomial hash of the 5-gram of ``s`` starting at
    1-based position ``i`` (identical text in Spark and DuckDB SQL)."""
    terms = " + ".join(
        f"{p} * ascii(substr({s}, {i} + {j}, 1))" for j, p in enumerate(POW31))
    return f"CAST({terms} AS BIGINT)"


def shingle_array_expr(col: str = "clean") -> str:
    """SQL expr: array of DISTINCT 5-gram hashes of ``col`` (Spark)."""
    h = h_expr(col, "i")
    return (f"array_distinct(transform("
            f"sequence(1, length({col}) - 4), i -> {h}))")


def minhash_expr(hs_col: str, a: int, b: int) -> str:
    """SQL expr: one minhash value over a shingle-hash array (Spark)."""
    return f"array_min(transform({hs_col}, h -> ({a} * h + {b}) % {MINHASH_P}))"
