"""PRQL dialect frontend (reference src/Interpreters/executeQuery.cpp:997
dialect=prql; semantics = the public PRQL spec)."""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.plans import prql


@pytest.fixture(scope="module")
def emp(spark):
    rows = [
        ("Alice", "eng", 120.0, 30),
        ("Bob", "eng", 100.0, 25),
        ("Carol", "mgmt", 150.0, 41),
        ("Dave", "eng", 90.0, 25),
        ("Eve", "mgmt", 140.0, 35),
    ]
    df = spark.createDataFrame(rows, "name string, dept string, salary double, age int")
    df.createOrReplaceTempView("employees")
    return df


def test_filter_derive_select_sort(spark, emp):
    out = prql(spark, """
      from employees
      filter salary > 95 && dept == 'eng'
      derive {bonus = salary * 0.1}
      select {name, total = salary + bonus}
      sort {-total}
    """).collect()
    assert [(r["name"], r["total"]) for r in out] == \
        [("Alice", 132.0), ("Bob", 110.0)]


def test_group_aggregate(spark, emp):
    out = prql(spark, """
      from employees
      group {dept} (aggregate {n = count this, avg_sal = average salary})
      sort {dept}
    """).collect()
    assert [(r["dept"], r["n"], round(r["avg_sal"], 2)) for r in out] == \
        [("eng", 3, 103.33), ("mgmt", 2, 145.0)]


def test_global_aggregate(spark, emp):
    r = prql(spark, "from employees | aggregate {s = sum salary, n = count this}").first()
    assert r["s"] == 600.0 and r["n"] == 5


def test_take_range_and_exclusion(spark, emp):
    out = prql(spark, """
      from employees
      sort {-salary}
      take 2..4
      select !{age}
    """)
    assert out.columns == ["name", "dept", "salary"]
    assert [r["name"] for r in out.collect()] == ["Eve", "Alice", "Bob"]


def test_group_top_n(spark, emp):
    out = prql(spark, """
      from employees
      group {dept} (sort {-salary} | take 1)
      sort {dept}
    """).collect()
    assert [(r["dept"], r["name"]) for r in out] == \
        [("eng", "Alice"), ("mgmt", "Carol")]


def test_join_shorthand(spark, emp):
    depts = spark.createDataFrame([("eng", "Engineering"), ("mgmt", "Management")],
                                  "dept string, dept_name string")
    out = prql(spark, """
      from employees
      join side:left d (==dept)
      select {name, dept_name}
      sort {name}
    """, tables={"employees": emp, "d": depts}).collect()
    assert out[0]["dept_name"] == "Engineering"
    assert len(out) == 5


def test_fstring_and_not(spark, emp):
    out = prql(spark, """
      from employees
      filter !(dept == 'mgmt')
      derive {tag = f"{name}-{dept}"}
      sort {name}
      take 1
    """).first()
    assert out["tag"] == "Alice-eng"


def test_unmapped_transform_raises(spark, emp):
    with pytest.raises(NotImplementedError):
        prql(spark, "from employees | window (sum salary)")


def test_fixture_pipeline(spark, catalog):
    out = prql(spark, """
      from orders
      filter o_orderstatus == 'F'
      group {o_orderpriority} (aggregate {n = count this, tp = sum o_totalprice})
      sort {o_orderpriority}
    """).collect()
    exp = (catalog.orders.filter(F.col("o_orderstatus") == "F")
           .groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("tp"))
           .orderBy("o_orderpriority").collect())
    assert [tuple(r) for r in out] == [tuple(r) for r in exp]


def test_prql_setops_and_group_take(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")],
                              "k int, v string")
    b = spark.createDataFrame([(2, "y"), (3, "z")], "k int, v string")
    a.createOrReplaceTempView("prql_a")
    b.createOrReplaceTempView("prql_b")
    assert prql(spark, "from prql_a | append prql_b").count() == 5
    assert sorted(r.k for r in
                  prql(spark, "from prql_a | remove prql_b").collect()) \
        == [1, 2]      # exceptAll removes one of the (2,y) duplicates
    assert sorted(r.k for r in
                  prql(spark, "from prql_a | intersect prql_b")
                  .collect()) == [2]
    # distinct idiom: group {cols} (take 1)
    d = prql(spark, "from prql_a | group {k, v} (take 1)")
    assert sorted((r.k, r.v) for r in d.collect()) == [(1, "x"), (2, "y")]
