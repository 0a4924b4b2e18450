"""Recursive CTE fixpoint behavior and hash-range SAMPLE contract."""

from pyspark.sql import functions as F

from clickhouse_core_spark.operators import recursive_cte, sample_by_hash


def test_recursive_transitive_closure(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 2)],  # contains a cycle 2->3->4->2
        "src int, dst int")
    base = spark.createDataFrame([(1,)], "node int")

    def step(frontier):
        return (frontier.join(edges, frontier["node"] == edges["src"])
                .select(F.col("dst").alias("node")))

    out = sorted(r["node"] for r in recursive_cte(base, step).collect())
    assert out == [1, 2, 3, 4]  # terminates despite the cycle


def test_recursive_depth_labels(spark):
    edges = spark.createDataFrame([(0, 1), (0, 2), (1, 3)], "p int, c int")
    base = spark.createDataFrame([(0, 0)], "node int, depth int")

    def step(frontier):
        return (frontier.join(edges, frontier["node"] == edges["p"])
                .select(F.col("c").alias("node"), (F.col("depth") + 1).alias("depth")))

    rows = {r["node"]: r["depth"] for r in recursive_cte(base, step).collect()}
    assert rows == {0: 0, 1: 1, 2: 1, 3: 2}


def test_sample_fraction_and_determinism(catalog):
    li = catalog.lineitem
    n = li.count()
    s1 = sample_by_hash(li, 0.2, ["l_orderkey", "l_linenumber"])
    s2 = sample_by_hash(li, 0.2, ["l_orderkey", "l_linenumber"])
    c1, c2 = s1.count(), s2.count()
    assert c1 == c2  # deterministic
    assert abs(c1 / n - 0.2) < 0.05  # near the requested fraction


def test_sample_composability(catalog):
    li = catalog.lineitem
    # sampling 0.5 twice over the same key = sampling 0.25 once
    inner = sample_by_hash(sample_by_hash(li, 0.5, ["l_orderkey"]), 0.25,
                           ["l_orderkey"])
    direct = sample_by_hash(li, 0.25, ["l_orderkey"])
    assert inner.count() == direct.count()
