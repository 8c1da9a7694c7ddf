"""Distributed connected components — the clustering step of near-dup
deduplication.

LSH/SimHash produce *pairs* (doc_a ~ doc_b); an actual deduplicated
corpus needs those pairs grouped into clusters so one representative per
cluster survives.  Pair-chasing is transitive, so this is connected
components over the candidate-pair graph.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
literature).  Unlike naive label propagation, which needs O(diameter)
rounds (a 10M-long chain of near-dups = 10M rounds), large/small-star
converges in O(log^2 n) rounds regardless of graph shape, and each round
is one groupBy shuffle over the edge list — no vertex state, no driver
data.  This is the published MapReduce-scale algorithm for exactly this
job (Google's near-dup dedup pipeline), re-expressed as DataFrame ops:

  large-star: for each node u, attach every neighbor v > u to
              m = min(N(u) ∪ {u}).
  small-star: for each node u (edges oriented high→low), attach every
              neighbor v <= u, and u itself, to m = min(N(u) ∪ {u}).

Both steps preserve connectivity and strictly shrink the potential
function; at fixpoint every edge is (node → component-min).  The only
driver-side value per round is the convergence check — a count+checksum
scalar pair, metadata-bounded like every other collect in this repo.

Scale notes (100 TB corpus, ~10^10 candidate pairs):
- per-round cost is one shuffle of the edge list on node id; edges
  only ever *shrink* toward star form, so round cost is non-increasing;
- high-degree hubs (a boilerplate doc near-dup to millions) are exactly
  what large-star is designed for: it splits a hub's star across rounds
  without ever materializing N(u) in one task beyond a sort-group;
- lineage is truncated every round with localCheckpoint (no
  checkpoint-dir requirement, executor-local blocks), the standard
  iterative-Spark pattern — without it the plan doubles per round.

No analogue in the reference (its MERGE dedup is exact-key only,
``lambda/handler.py:545-608``); this is beyond-reference surface for the
LLM-training-data brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star round.

    ``edges`` is an undirected edge list held as (src, dst) in BOTH
    orientations for large-star, and oriented high→low for small-star.
    Returns the new deduplicated edge list (src > dst orientation).
    """
    if large:
        # symmetric orientation: every node sees its full neighborhood
        nbr = edges.selectExpr("src AS u", "dst AS v").unionAll(
            edges.selectExpr("dst AS u", "src AS v"))
    else:
        # high→low orientation: u sees only neighbors <= u
        nbr = edges.selectExpr(
            "CASE WHEN src > dst THEN src ELSE dst END AS u",
            "CASE WHEN src > dst THEN dst ELSE src END AS v")
    # m = min(N(u) ∪ {u}) via a map-side-combinable min aggregate, then
    # joined back to the neighbor stream on u.  Deliberately NOT
    # collect_set: a hub's neighborhood must never materialize in one
    # task, and the groupBy and the join shuffle on the same key so AQE
    # co-partitions them (no extra shuffle for the join).
    mins = (nbr.groupBy("u").agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m")))
    joined = nbr.join(mins, "u")
    if large:
        # attach strictly-larger neighbors to m
        out = joined.where("v > u").select(
            F.col("v").alias("src"), F.col("m").alias("dst"))
    else:
        # attach all (<u) neighbors and u itself to m
        out = (joined.where("v != m")
               .select(F.col("v").alias("src"), F.col("m").alias("dst"))
               .unionAll(mins.where("u != m")
                         .select(F.col("u").alias("src"),
                                 F.col("m").alias("dst"))))
    return (out.where("src != dst")
            .selectExpr("CASE WHEN src > dst THEN src ELSE dst END AS src",
                        "CASE WHEN src > dst THEN dst ELSE src END AS dst")
            .distinct())


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         stats: dict | None = None) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns ``(node, component)`` for every node that appears in
    ``edges``, where ``component`` is the minimum node id reachable from
    ``node`` (so a component's representative is its own smallest
    member, and ``node == component`` identifies it).

    Self-loops and duplicate/reversed edges are tolerated.  Node ids
    must be orderable (int or string).  Raises ``RuntimeError`` if the
    fixpoint is not reached within ``max_iter`` alternating rounds
    (large/small-star needs O(log^2 n); 50 covers any realistic graph).

    Pass a dict as ``stats`` to receive ``rounds`` (alternating rounds
    to fixpoint) and ``edges_per_round`` (edge count after each round —
    monotonically shrinking toward the star forest).
    """
    raw = (edges.selectExpr(f"{src} AS src", f"{dst} AS dst")
           .where("src IS NOT NULL AND dst IS NOT NULL"))
    nodes = (raw.selectExpr("src AS node").unionAll(raw.selectExpr("dst AS node"))
             .distinct().localCheckpoint())
    e = (raw.where("src != dst")
         .selectExpr("CASE WHEN src > dst THEN src ELSE dst END AS src",
                     "CASE WHEN src > dst THEN dst ELSE src END AS dst")
         .distinct()
         .localCheckpoint())

    prev_sig = None
    rounds, sizes = 0, []
    for _ in range(max_iter):
        e = _star_round(_star_round(e, large=True), large=False)
        e = e.localCheckpoint()   # truncate lineage; one job per round
        # convergence: edge multiset stable.  The signature gates the
        # CORRECTNESS of the clustering, so it must be effectively
        # collision-proof: count + order-free 64-bit xxhash64 checksum +
        # min/max edge hash.  (The previous 32-bit `hash` sum had a ~2^-32
        # chance of declaring a false fixpoint on a changed multiset; two
        # independent 64-bit order-free digests push that below any
        # realistic concern, for free — same single aggregation job.)
        # (the checksum sums 64-bit hashes as DECIMAL(38,0): exact, and
        # immune to the ANSI-mode BIGINT overflow a long sum would hit)
        sig = e.selectExpr(
            "count(*) AS n",
            "sum(CAST(xxhash64(src, dst) AS DECIMAL(38,0))) AS chk",
            "min(xxhash64(dst, src)) AS lo",
            "max(xxhash64(dst, src)) AS hi").first()
        sig = (sig["n"], sig["chk"], sig["lo"], sig["hi"])
        rounds += 1
        sizes.append(sig[0])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    if stats is not None:
        stats["rounds"] = rounds
        stats["edges_per_round"] = sizes

    # at fixpoint e is a star forest: src=member, dst=component-min.
    # Roots (and isolated-after-cleanup nodes) map to themselves.
    comp = e.selectExpr("src AS node", "dst AS component")
    roots = (nodes.join(comp, on="node", how="left_anti")
             .selectExpr("node", "node AS component"))
    return comp.unionByName(roots)
