"""Z-order (Morton) clustering: multi-column data layout for file and
row-group skipping.

Why not just ``cluster_by`` (lexicographic sort)?  A lexicographic sort
on (a, b) concentrates ALL of its pruning power on ``a``: every file
covers a narrow slice of ``a`` but the full range of ``b``, so a
predicate on ``b`` alone skips nothing.  Interleaving the bits of the
two columns (the Morton / Z-curve) makes every file cover a small
*rectangle* in (a, b)-space — ~sqrt(N)-in-each-dimension instead of
N-in-one — so range predicates on EITHER column (or both) skip most
files.  At 100 TB this is the difference between "queries filtered on
the secondary column scan everything" and "they scan ~1/sqrt(files)".
(The same idea Delta/Iceberg expose as ZORDER BY; implemented here as a
pure Catalyst expression — no UDF, no shuffle beyond the single layout
rewrite the caller already pays for.)

Mechanics:

* Each column is affinely mapped onto an unsigned ``bits``-bit grid
  using its global min/max (one metadata-sized aggregate).  Rank-based
  mappings are possible but need a full sort; min/max scaling is free
  and good enough unless a column is pathologically skewed — in which
  case pre-transform it (log, bucketize) before z-ordering.
* The grid cells' bits are interleaved column-major: bit ``i`` of
  column ``j`` lands at position ``i*n_cols + (n_cols-1-j)``, so all
  columns contribute equally at every scale of the curve.
* The interleave is a fold of shift/AND/OR Column expressions —
  whole-stage-codegen-able, evaluated once per row during the rewrite,
  never stored.

``bits`` is capped so the z-value fits a signed 64-bit long
(``n_cols * bits <= 62``).  NULLs map to grid cell 0 (they cluster
together at the curve's origin, which also keeps them prunable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_column(df_minmax: dict[str, tuple[float, float]],
                  bits: int = 16) -> Column:
    """Build the interleaved z-value Column from ``{col: (min, max)}``.

    ``df_minmax`` must hold the GLOBAL min/max per column (see
    ``minmax``); rows outside that range (possible if the stats are
    stale) clamp to the grid edge rather than corrupting the curve.
    """
    cols = list(df_minmax)
    n = len(cols)
    if n < 1:
        raise ValueError("zorder needs at least one column")
    bits = min(bits, 62 // n)
    if bits < 1:
        raise ValueError(f"too many zorder columns ({n}) for 62 bits")
    top = (1 << bits) - 1
    scaled: list[Column] = []
    for c in cols:
        lo, hi = df_minmax[c]
        if lo is None or hi is None or not (float(hi) > float(lo)):
            scaled.append(F.lit(0).cast("long"))
            continue
        span = float(hi) - float(lo)
        g = F.floor((F.col(c).cast("double") - F.lit(float(lo)))
                    * F.lit(top / span)).cast("long")
        g = F.least(F.greatest(g, F.lit(0)), F.lit(top))
        scaled.append(F.coalesce(g, F.lit(0)).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, s in enumerate(scaled):
            bit = F.shiftleft(F.shiftright(s, i).bitwiseAND(F.lit(1)),
                              i * n + (n - 1 - j))
            z = z.bitwiseOR(bit)
    return z


def minmax(df: DataFrame, cols: Sequence[str]) -> dict[str, tuple[float, float]]:
    """One aggregate job returning ``{col: (min, max)}`` — metadata-sized
    (2×n_cols scalars), the only thing z-ordering ever collects."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    row = df.agg(*aggs).head()
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def zorder_py(values: Sequence[int], bits: int) -> int:
    """Pure-python reference interleave (tests compare the Column
    expression against this bit-for-bit)."""
    n = len(values)
    z = 0
    for i in range(bits):
        for j, v in enumerate(values):
            z |= ((int(v) >> i) & 1) << (i * n + (n - 1 - j))
    return z
