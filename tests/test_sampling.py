"""Deterministic/stratified sampling and token-budget shard packing."""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.pipeline import (
    deterministic_sample, pack_token_budget, stratified_sample)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, ["en", "es", "de"][i % 3], 10 + (i * 37) % 90)
         for i in range(600)],
        "doc_id bigint, lang string, n_tokens int")


def test_deterministic_sample_stable_and_unbiased(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.3).collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 0.3).collect()}
    assert a == b                       # reproducible
    assert 0.2 < len(a) / 600 < 0.4     # roughly the fraction
    # a larger fraction is a superset (nested samples)
    big = {r.doc_id for r in deterministic_sample(docs, 0.6).collect()}
    assert a <= big


def test_stratified_sample_per_language(docs):
    out = stratified_sample(docs, {"en": 1.0, "es": 0.5},
                            strata_col="lang")
    counts = {r.lang: r.c for r in
              out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert counts["en"] == 200          # keep all
    assert "de" not in counts           # default fraction 0
    assert 60 < counts["es"] < 140      # ~half


def test_pack_token_budget_respects_budget(docs):
    packed = pack_token_budget(docs, budget=500, n_buckets=8)
    sizes = (packed.groupBy("shard")
             .agg(F.sum("n_tokens").alias("tok"),
                  F.count("*").alias("docs")).collect())
    # every shard except possibly each bucket's last stays within
    # budget + one max-document overshoot
    max_doc = 99
    assert all(r.tok <= 500 + max_doc for r in sizes)
    # all docs assigned exactly once
    assert packed.count() == 600
    assert packed.select("doc_id").distinct().count() == 600


def test_pack_token_budget_deterministic(docs):
    a = sorted((r.doc_id, r.shard) for r in
               pack_token_budget(docs, 500).collect())
    b = sorted((r.doc_id, r.shard) for r in
               pack_token_budget(docs, 500).collect())
    assert a == b


def test_mixture_sample_budgets_and_determinism(spark):
    from clickhouse_core_spark.pipeline import mixture_sample
    rows = [(i, "web" if i % 3 else "code", 100) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, n_tokens int")
    out = mixture_sample(df, "domain", {"web": 0.8, "code": 0.2},
                         total_tokens=10000)
    per = {r.domain: r.s for r in
           out.groupBy("domain").agg(F.sum("n_tokens").alias("s")).collect()}
    # budgets met, never exceeded by more than one document (100 tokens)
    assert 8000 <= per["web"] <= 8100
    assert 2000 <= per["code"] <= 2100
    # deterministic across invocations
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in mixture_sample(
        df, "domain", {"web": 0.8, "code": 0.2}, 10000).collect())
    assert a == b
    # seed changes the drawn subset but not the budgets
    c = sorted(r.doc_id for r in mixture_sample(
        df, "domain", {"web": 0.8, "code": 0.2}, 10000, seed=7).collect())
    assert a != c and len(a) == len(c)
    # unweighted domains drop
    out2 = mixture_sample(df, "domain", {"code": 1.0}, 2000)
    assert {r.domain for r in out2.collect()} == {"code"}
