"""Distributed connected components for duplicate-cluster resolution.

The near-dup operators in :mod:`pipeline.dedup` contract each node to
the min of its DIRECT neighbors (one pass).  A duplicate chain
A~B~C where A and C never share a band needs the transitive closure;
this module supplies it as the alternating **large-star / small-star**
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public literature), which converges in
O(log² n) rounds on any graph and O(log n) in practice.

Execution shape per round: two groupBy-min shuffles over the edge list
(large-star then small-star), each linear in |E| — no driver-side data,
no all-pairs work.  Lineage is truncated every round with
``localCheckpoint`` so the plan stays O(1) deep regardless of round
count (iterative DataFrame algorithms otherwise compile ever-growing
plans).  At 100 TB the edge list from LSH banding is a small multiple
of the corpus row count, so each round is a bounded shuffle;
convergence on dedup graphs (dense cliques + short chains) is
typically 2-4 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _both_directions(edges: DataFrame) -> DataFrame:
    """(u, v) plus (v, u) for every edge via ONE explode (narrow).
    r14: the former union of two projections planned and executed the
    edge subtree once per branch — for `lboth` that recomputed the
    whole large-star aggregation twice per iteration (no
    common-subexpression reuse across union arms)."""
    return (edges.select(F.explode(F.array(
        F.struct(F.col("u"), F.col("v")),
        F.struct(F.col("v").alias("u"), F.col("u").alias("v"))
    )).alias("__e")).select("__e.u", "__e.v"))


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star alternation.

    edges: canonical (u, v) pairs, u != v.  Returns a new edge list in
    which every node points toward smaller labels; fixpoint is a star
    forest (v -> component minimum).
    """
    # ---- large-star: for each u, m = min(N(u) ∪ {u});
    #      emit (v, m) for v in N(u) with v > u
    both = _both_directions(edges)
    with_min = (both.groupBy("u")
                .agg(F.min(F.least("u", "v")).alias("m"),
                     F.collect_set("v").alias("nbrs")))
    large = (with_min
             .select(F.explode("nbrs").alias("v"), "u", "m")
             .filter(F.col("v") > F.col("u"))
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .filter(F.col("u") != F.col("v")))

    # ---- small-star over the large-star output: for each u,
    #      neighbors ≤ u plus u itself link to their min
    lboth = _both_directions(large)
    small_src = lboth.filter(F.col("v") <= F.col("u"))
    smin = (small_src.groupBy("u")
            .agg(F.min(F.least("u", "v")).alias("m"),
                 F.collect_set("v").alias("nbrs")))
    small = (smin.select(
        F.explode(F.array_union("nbrs", F.array("u"))).alias("v"),
        "m")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v")))
    return small.dropDuplicates(["u", "v"])


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """Label every node appearing in ``edges`` with its component's
    minimum node id.  Returns (node, label).

    Nodes must be orderable (long/int/string).  Isolated nodes don't
    appear in an edge list — union them back with label = self at the
    call site if needed.
    """
    cur = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.greatest("u", "v").alias("u"),
                   F.least("u", "v").alias("v"))
           .dropDuplicates(["u", "v"]))
    cur = cur.localCheckpoint(eager=True)
    prev_fp = None
    for _ in range(max_iter):
        nxt = _star_round(cur).localCheckpoint(eager=True)
        fp = nxt.agg(
            F.count("*").alias("c"),
            F.coalesce(F.sum(F.hash("u", "v").cast("long")),
                       F.lit(0)).alias("s")).first()
        fp = (fp.c, fp.s)
        cur = nxt
        if fp == prev_fp:
            break
        prev_fp = fp
    # fixpoint edge list is (node -> component min); nodes that ARE a
    # component min only appear on the right side, so union them in
    labels = cur.select(F.col("u").alias("node"), F.col("v").alias("label"))
    roots = cur.select(F.col("v").alias("node"),
                       F.col("v").alias("label")).dropDuplicates(["node"])
    return (labels.unionByName(roots)
            .groupBy("node").agg(F.min("label").alias("label")))


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b",
                   max_iter: int = 25) -> DataFrame:
    """Resolve verified duplicate PAIRS into transitive clusters:
    (node, label) where label = min doc id of the full cluster.  The
    canonical document per cluster is the one with node == label."""
    return connected_components(pairs, src=id_a, dst=id_b,
                                max_iter=max_iter)
