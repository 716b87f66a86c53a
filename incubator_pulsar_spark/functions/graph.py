"""Distributed graph analytics: fixed-iteration PageRank.

Complements ``fuzzy.connected_components`` (the dedup-cluster
resolver): PageRank ranks nodes by stationary random-walk mass — the
classic importance signal for link-graph-weighted corpus sampling
(crawl frontier prioritization, per-domain quality weighting).

Spark-first shape: each iteration is

    contribs = edges ⋈ ranks (on src)  → groupBy(dst).sum
    ranks'   = nodes ⟕ contribs        (+ teleport base)

— two shuffles per iteration on the node key, the standard
Pregel-on-DataFrames layout. Edges and ranks co-partition on the join
key, so at 1000 executors each iteration is one co-located join plus
one aggregation; no driver-side state beyond the node COUNT (one
scalar).

Determinism discipline (the DuckDB oracle unrolls the iterations as
CTEs): ranks live in integer MICRO-UNITS and every contribution is
integer-floor arithmetic —

    r_0(v)      = 1e6 DIV N
    contrib(u→v) = (r(u) · d_num) DIV (d_den · outdeg(u))
    r_{t+1}(v)  = ((1e6 DIV N) · (d_den − d_num)) DIV d_den
                  + Σ_incoming contrib

Integer sums are order-independent, so the result is bit-identical on
any engine and any partitioning (float PageRank is fold-order-
dependent — unusable under a value-hash gate). Floor bias is ≤ 1
micro-unit per edge per iteration — irrelevant for ranking.

Dangling nodes (outdeg 0) keep their mass out of circulation (their
rank decays to the teleport base) — the "remove dangling mass"
variant; documented rather than redistributed because redistribution
needs a global float sum per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, *, src_col: str = "src",
             dst_col: str = "dst", iters: int = 5,
             damping_num: int = 85, damping_den: int = 100,
             micro: int = 1_000_000,
             broadcast_ranks: bool = False) -> DataFrame:
    """Fixed-iteration integer-unit PageRank over a directed edge list.

    Duplicate edges are collapsed (DISTINCT) so outdeg counts unique
    successors. Returns (node, rank_micro) for every node appearing as
    src or dst. ``iters`` is small and fixed (the oracle unrolls it);
    each iteration extends the lazy plan — for iters ≳ 10 add a
    localCheckpoint every ~5 to cut lineage.

    ``broadcast_ranks=True`` is the SMALL-NODE-SET plan (domain graphs,
    nation graphs: few nodes, arbitrarily many edges): the rank and
    contribution tables broadcast, so each iteration is ONE shuffle
    (the per-dst aggregation) and the edge table never re-shuffles.
    The default keeps shuffle hash joins — the correct posture when the
    node set itself is billions of rows (web graphs), where ranks
    co-partition with edges on the join key instead.
    """
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct()
         # cut the upstream lineage ONCE: without this every iteration's
         # join re-plans (and re-executes) the whole edge-derivation —
         # measured 43 shuffles / 264 scans for a 5-iteration run over a
         # 6-table edge build, vs 2 shuffles per iteration after
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    n = nodes.count()  # one driver scalar — the only collect
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_micro"))
    r0 = micro // n
    base = (r0 * (damping_den - damping_num)) // damping_den
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
    ed = e.join(outdeg, on="src").localCheckpoint(eager=True)  # (src, dst, _od)

    _maybe_b = F.broadcast if broadcast_ranks else (lambda df: df)
    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank_micro"))
    for _ in range(iters):
        contribs = (
            ed.join(_maybe_b(ranks), ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                # SQL DIV — exact integer floor division (float `/` +
                # floor can mis-round when the true quotient sits within
                # one ulp of an integer)
                F.expr(f"CAST((rank_micro * {int(damping_num)}) DIV "
                       f"({int(damping_den)} * _od) AS LONG)").alias("_c"))
            .groupBy("node").agg(F.sum("_c").alias("_s")))
        ranks = (nodes.join(_maybe_b(contribs), on="node", how="left")
                 .select("node",
                         (F.lit(base) + F.coalesce(F.col("_s"), F.lit(0)))
                         .cast("long").alias("rank_micro")))
    return ranks
