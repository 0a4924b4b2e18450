"""Similarity search over embedding columns (array<float>).

Analog of the reference's vector-similarity index
(reference src/Storages/MergeTree/MergeTreeIndexVectorSimilarity.h:167,
usearch HNSW) re-thought for Spark: brute-force cosine top-k as the
exact baseline (a single narrow scan + TakeOrderedAndProject — no
shuffle of the embeddings themselves), and a random-hyperplane LSH
bucketing as the approximate scale path (turns search into a bucket
equi-join exactly like the dedup blocking).

Dot products use built-in higher-order functions (zip_with + aggregate)
so they run inside codegen; no Python in the scoring loop.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    """arrayL2Distance analog (reference src/Functions/array/arrayDistance.cpp)."""
    return F.sqrt(F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(df: DataFrame, query: Sequence[float], k: int,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query``.

    Plan shape: scan → project(score) → TakeOrderedAndProject(k) —
    Spark's top-k never materializes a global sort, so this scales to
    any corpus the scan scales to.  Returns (id, score) descending.
    """
    q = _lit_vec(query)
    return (df.select(F.col(id_col),
                      cosine_similarity(F.col(vec_col), q).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim)).astype(float)


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane signature: bit i = sign(<v, plane_i>) packed
    into a long — computed entirely with built-in expressions."""
    bits = [F.when(dot(vec_col, _lit_vec(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
            for p in planes]
    acc = F.lit(0).cast("long")
    for i, bit in enumerate(bits):
        acc = acc + (bit.cast("long") * F.lit(1 << i))
    return acc


def lsh_ann_topk(df: DataFrame, query: Sequence[float], k: int,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 bits: int = 8, seed: int = 42,
                 multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane bucket is
    within hamming distance ``multiprobe`` of the query's signature (an
    IN-list filter over the bucket column — partition-prunable when the
    table is written bucketed/partitioned by the signature).

    Recall/efficiency trade via ``bits`` and ``multiprobe``: 8 bits with
    multiprobe=1 scores (1 + 8)/256 ≈ 3.5% of the corpus on average and
    recovers the near-misses where the query sits close to one
    hyperplane (the dominant recall loss of single-bucket LSH).
    multiprobe=0 reproduces single-bucket probing.
    """
    dim = len(query)
    planes = _hyperplanes(dim, bits, seed)
    qsig = int(sum((1 << i) for i, p in enumerate(planes)
                   if float(np.dot(p, np.asarray(query, dtype=float))) >= 0))
    probe_set = {qsig}
    if multiprobe >= 1:
        probe_set |= {qsig ^ (1 << i) for i in range(bits)}
    if multiprobe >= 2:
        probe_set |= {qsig ^ (1 << i) ^ (1 << j)
                      for i in range(bits) for j in range(i + 1, bits)}
    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    return (bucketed.filter(F.col("__bucket").isin(*sorted(probe_set)))
            .select(F.col(id_col),
                    cosine_similarity(F.col(vec_col), _lit_vec(query)).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def embedding_near_duplicates(df: DataFrame, threshold: float = 0.95,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              bits: int = 8, seed: int = 42,
                              dim: int | None = None) -> DataFrame:
    """All pairs with cosine >= threshold, blocked by LSH bucket
    (candidates must share the full signature; at 0.95+ cosine the
    collision probability per bit is >0.93, so recall stays high while
    the join is an equi-join on the bucket).

    Pass ``dim`` (embedding dimensionality) to keep plan construction
    metadata-only; when omitted, one row is fetched to infer it — a
    driver round-trip that triggers a job before the real one."""
    if dim is None:
        sample = df.select(vec_col).first()
        dim = len(sample[vec_col])
    planes = _hyperplanes(dim, bits, seed)
    b = df.select(F.col(id_col), F.col(vec_col),
                  lsh_bucket(F.col(vec_col), planes).alias("__bucket"))
    lhs = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "__bucket")
    rhs = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "__bucket")
    return (lhs.join(rhs, on="__bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cosine_similarity(F.col("v_a"), F.col("v_b")))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def ivf_assignments(df: DataFrame, n_centroids: int = 16,
                    iterations: int = 3, seed: int = 7,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> tuple:
    """IVF coarse quantizer: k-means over the embeddings with
    deterministic seeding (the rows with the smallest md5(id) — any
    engine reproduces the draw), Lloyd iterations as DataFrame
    aggregations.  Returns (assignments DataFrame with __centroid,
    centroids as a list of (cid, vector)).

    The centroid set is tiny (n_centroids × dim floats): it collects to
    the driver between iterations and broadcasts into the assignment
    expression — the same shape FAISS-style IVF training uses, with the
    train set being the full corpus here.  Assignment is argmin over
    literal centroid vectors, fully codegen; one aggregation per
    iteration, no per-row Python.
    """
    from pyspark.sql import Window

    seeds = (df
             .withColumn("__draw", F.md5(F.concat(F.lit(str(seed)),
                                                  F.col(id_col).cast("string"))))
             .withColumn("__rn", F.row_number().over(
                 Window.orderBy("__draw", id_col)))
             .filter(F.col("__rn") <= n_centroids))
    centroids = [(i, [float(x) for x in r[vec_col]])
                 for i, r in enumerate(seeds.select(vec_col).collect())]

    def assign_expr(cents):
        best_id = F.lit(cents[0][0])
        best_d = l2_distance(F.col(vec_col), _lit_vec(cents[0][1]))
        for cid, vec in cents[1:]:
            d = l2_distance(F.col(vec_col), _lit_vec(vec))
            cond = d < best_d
            best_id = F.when(cond, F.lit(cid)).otherwise(best_id)
            best_d = F.when(cond, d).otherwise(best_d)
        return best_id

    for _ in range(iterations):
        assigned = df.withColumn("__centroid", assign_expr(centroids))
        dim = len(centroids[0][1])
        means = (assigned.groupBy("__centroid")
                 .agg(*[F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"c{i}")
                        for i in range(dim)])
                 .collect())
        new = {r["__centroid"]: [float(r[f"c{i}"]) for i in range(dim)]
               for r in means}
        centroids = [(cid, new.get(cid, vec)) for cid, vec in centroids]

    assigned = df.withColumn("__centroid", assign_expr(centroids))
    return assigned, centroids


def ivf_topk(df: DataFrame, query, k: int, n_centroids: int = 16,
             n_probe: int = 4, iterations: int = 3, seed: int = 7,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF approximate top-k (the FAISS-style inverted-file scale path
    the reference's vector index family targets,
    src/Storages/MergeTree/MergeTreeIndexVectorSimilarity.h:167): score
    only the ``n_probe`` clusters whose centroids are nearest the
    query.  With ``n_probe >= n_centroids`` the search is exhaustive
    and exactly equals brute-force cosine top-k (the oracle-checkable
    configuration); smaller n_probe trades recall for scanning
    ~n_probe/n_centroids of the corpus.  At scale, write the corpus
    partitioned by the centroid id and the probe filter becomes
    partition pruning."""
    import numpy as np

    assigned, centroids = ivf_assignments(df, n_centroids, iterations, seed,
                                          vec_col, id_col)
    qv = np.asarray(list(query), dtype=float)
    by_dist = sorted(centroids,
                     key=lambda cv: float(np.linalg.norm(np.asarray(cv[1]) - qv)))
    probe = [cid for cid, _ in by_dist[:max(1, n_probe)]]
    return (assigned.filter(F.col("__centroid").isin(probe))
            .select(F.col(id_col),
                    cosine_similarity(F.col(vec_col), _lit_vec(list(query)))
                    .alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def semantic_dedup(df: DataFrame, threshold: float = 0.95,
                   n_centroids: int = 16, iterations: int = 3,
                   seed: int = 7, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   transitive: bool = False) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public method): k-means-cluster the embeddings,
    compare pairs only WITHIN a cluster, drop rows whose cosine to a
    smaller-id cluster-mate exceeds ``threshold``.

    Scale shape: the pair join is an equi-join on the centroid id —
    never all-pairs across the corpus; cluster count scales the blocking
    (at 100 TB raise ``n_centroids`` so clusters stay executor-sized and
    write the corpus partitioned by centroid, making the self-join
    co-located).  Representative choice is the deterministic min-id
    (the paper keeps a random/low-centroid-distance exemplar — any
    single-keeper contract satisfies SemDeDup; min-id is
    oracle-checkable).  ``transitive=True`` upgrades the single-pass
    min-of-neighbors contraction to full connected components, same as
    minhash_lsh_dedup.

    Returns the deduplicated DataFrame (original columns).
    """
    assigned, _cents = ivf_assignments(df, n_centroids, iterations, seed,
                                       vec_col, id_col)
    slim = assigned.select(F.col(id_col), F.col(vec_col), "__centroid")
    lhs = slim.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("v_a"), "__centroid")
    rhs = slim.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("v_b"), "__centroid")
    similar = (lhs.join(rhs, on="__centroid")
               .filter(F.col("id_a") < F.col("id_b"))
               .filter(cosine_similarity(F.col("v_a"), F.col("v_b"))
                       >= threshold)
               .select("id_a", "id_b"))

    if transitive:
        from clickhouse_core_spark.pipeline.graphs import (
            connected_components)
        rep = (connected_components(similar, src="id_a", dst="id_b")
               .select(F.col("node").alias("__id"),
                       F.col("label").alias("__rep")))
    else:
        # single-explode expansion (r14, see dedup._undirected): the
        # union shape ran the IVF-assign + cluster self-join subtree
        # once per direction
        from clickhouse_core_spark.pipeline.dedup import _undirected
        rep = (_undirected(similar)
               .groupBy("__id").agg(F.min("__n").alias("__rep")))
    return (df.join(rep, on=df[id_col] == rep["__id"], how="left")
            .withColumn("__keep", F.col("__rep").isNull()
                        | (F.col("__rep") >= F.col(id_col)))
            .filter(F.col("__keep"))
            .select(*df.columns))


def build_ivf_index(df: DataFrame, path: str, n_centroids: int = 16,
                    iterations: int = 3, seed: int = 7,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> None:
    """PERSISTED IVF index — the actual 100 TB ANN layout (the scale
    path ivf_topk's docstring promises): the corpus is written
    partitioned by its centroid assignment, centroids go to a tiny
    JSON sidecar.  A probe then reads ONLY the probed centroid
    partition directories — Spark partition pruning IS the
    inverted-file lookup, so a search touches ~n_probe/n_centroids of
    the data with zero shuffle.  Build cost: the k-means passes (one
    aggregation per iteration) plus one partitioned write."""
    import json
    import os
    assigned, centroids = ivf_assignments(df, n_centroids, iterations,
                                          seed, vec_col, id_col)
    (assigned.write.mode("overwrite")
     .partitionBy("__centroid")
     .parquet(os.path.join(path, "data")))
    with open(os.path.join(path, "centroids.json"), "w") as fh:
        json.dump([[int(cid), [float(x) for x in vec]]
                   for cid, vec in centroids], fh)


def ivf_index_search(spark, path: str, query: Sequence[float], k: int,
                     n_probe: int = 4, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Search a persisted IVF index: rank centroids driver-side (a
    n_centroids×dim JSON — planning metadata, like a partition list),
    scan only the probed partitions, score with the codegen cosine.
    n_probe >= n_centroids is exhaustive and exactly equals brute
    force."""
    import json
    import os
    with open(os.path.join(path, "centroids.json")) as fh:
        centroids = json.load(fh)
    qv = np.asarray(list(query), dtype=float)
    by_dist = sorted(centroids,
                     key=lambda cv: float(np.linalg.norm(
                         np.asarray(cv[1]) - qv)))
    probe = [int(cid) for cid, _ in by_dist[:max(1, n_probe)]]
    data = spark.read.parquet(os.path.join(path, "data"))
    return (data.filter(F.col("__centroid").isin(probe))
            .select(F.col(id_col),
                    cosine_similarity(F.col(vec_col),
                                      _lit_vec(list(query)))
                    .alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))
