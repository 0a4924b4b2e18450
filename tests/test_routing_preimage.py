"""Summary-table routing (aggregate-projection analog) and the
date-preimage pushdown rewrite."""

from pyspark.sql import functions as F

from clickhouse_core_spark.plans.frontend import apply_date_preimage, translate_ch_sql
from clickhouse_core_spark.plans.routing import SummaryRouter, build_summary


def test_preimage_rewrites_equality():
    out = apply_date_preimage("SELECT * FROM orders WHERE toYear(o_orderdate) = 1995")
    assert "o_orderdate >= TIMESTAMP '1995-01-01" in out
    assert "o_orderdate < TIMESTAMP '1996-01-01" in out
    assert "toYear" not in out


def test_preimage_inequalities():
    assert "o_orderdate >= TIMESTAMP '1996-01-01" in \
        apply_date_preimage("WHERE year(o_orderdate) > 1995")
    assert "o_orderdate < TIMESTAMP '1996-01-01" in \
        apply_date_preimage("WHERE year(o_orderdate) <= 1995")


def test_preimage_enables_parquet_pushdown(spark, catalog):
    catalog.register_all()
    naive = spark.sql("SELECT count(*) FROM orders WHERE year(o_orderdate) = 1995")
    rewritten = spark.sql(translate_ch_sql(
        "SELECT count(*) FROM orders WHERE toYear(o_orderdate) = 1995"))
    assert naive.collect() == rewritten.collect()
    plan = rewritten._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:")[1][:300]
    # the range predicate reached the scan
    assert "GreaterThanOrEqual(o_orderdate" in pushed
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    naive_pushed = naive_plan.split("PushedFilters:")[1][:300]
    assert "GreaterThanOrEqual(o_orderdate" not in naive_pushed


def test_summary_router_routes_and_matches(spark, catalog):
    o = catalog.orders
    base_day = o.withColumn("day", F.date_trunc("day", "o_orderdate")) \
                .withColumn("month", F.date_trunc("month", "o_orderdate"))
    router = SummaryRouter(base_day)
    router.register(build_summary(base_day, ["month", "o_orderpriority"],
                                  sum_cols=["o_totalprice"],
                                  max_cols=["o_totalprice"]))

    routed = router.aggregate(["month"], {
        "total": ("sum", "o_totalprice"),
        "n": ("count", "*"),
        "biggest": ("max", "o_totalprice"),
        "avg_price": ("avg", "o_totalprice"),
    })
    direct = base_day.groupBy("month").agg(
        F.sum("o_totalprice").alias("total"), F.count("*").alias("n"),
        F.max("o_totalprice").alias("biggest"),
        F.avg("o_totalprice").alias("avg_price"))
    r = {row["month"]: row for row in routed.collect()}
    d = {row["month"]: row for row in direct.collect()}
    assert r.keys() == d.keys()
    for k in r:
        assert abs(r[k]["total"] - d[k]["total"]) < 1e-6
        assert r[k]["n"] == d[k]["n"]
        assert r[k]["biggest"] == d[k]["biggest"]
        assert abs(r[k]["avg_price"] - d[k]["avg_price"]) < 1e-6


def test_summary_router_avg_with_nulls(spark):
    # routed avg must divide by the NON-NULL count, matching F.avg
    df = spark.createDataFrame(
        [("a", 10.0), ("a", None), ("a", 20.0), ("b", None), ("b", 4.0)],
        "k string, v double")
    router = SummaryRouter(df)
    router.register(build_summary(df, ["k"], sum_cols=["v"]))
    routed = {r["k"]: r["avg_v"]
              for r in router.aggregate(["k"], {"avg_v": ("avg", "v")}).collect()}
    direct = {r["k"]: r["avg_v"]
              for r in df.groupBy("k").agg(F.avg("v").alias("avg_v")).collect()}
    assert routed == direct == {"a": 15.0, "b": 4.0}


def test_summary_router_falls_back(spark, catalog):
    o = catalog.orders
    router = SummaryRouter(o)
    router.register(build_summary(o, ["o_orderpriority"], sum_cols=["o_totalprice"]))
    # grouping key not covered by the summary -> base scan
    out = router.aggregate(["o_orderstatus"], {"total": ("sum", "o_totalprice")})
    direct = o.groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("total"))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, direct.collect()))
