"""Connected components (large-star/small-star) for transitive dedup
clusters."""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.pipeline import (
    connected_components, minhash_lsh_dedup)


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = connected_components(df)
    return {r.node: r.label for r in out.collect()}


def test_cc_clique(spark):
    got = _labels(spark, [(1, 2), (2, 3), (1, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_cc_long_chain(spark):
    n = 64
    got = _labels(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_cc_multiple_components(spark):
    got = _labels(spark, [(5, 9), (9, 2), (20, 30), (40, 40), (7, 7)])
    # self-loops are dropped; {2,5,9} and {20,30} remain
    assert got == {2: 2, 5: 2, 9: 2, 20: 20, 30: 20}


def test_cc_duplicate_and_reversed_edges(spark):
    got = _labels(spark, [(3, 1), (1, 3), (3, 1), (4, 3)])
    assert got == {1: 1, 3: 1, 4: 1}


def test_cc_string_nodes(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "src string, dst string")
    out = {r.node: r.label for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_minhash_transitive_chain(spark):
    # A~B and B~C highly similar, A vs C a bit less: with a threshold
    # that admits both adjacent pairs, transitive mode must keep ONE doc
    base = "the quick brown fox jumps over the lazy dog " * 6
    a = base
    b = base + "tail one"
    c = base + "tail one tail two"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string")
    kept = minhash_lsh_dedup(df, jaccard_threshold=0.6, transitive=True)
    assert [r.doc_id for r in kept.collect()] == [1]
    # single-pass mode keeps at least the min too (sanity)
    kept1 = minhash_lsh_dedup(df, jaccard_threshold=0.6)
    assert 1 in {r.doc_id for r in kept1.collect()}
