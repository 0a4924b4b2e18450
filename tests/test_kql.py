"""KQL dialect frontend (reference src/Parsers/Kusto/ParserKQLQuery.h)."""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.plans import kql


@pytest.fixture(scope="module")
def customers(spark):
    rows = [
        ("Alice", "Engineer", "MS", 30, "2024-01-05 10:00:00"),
        ("bob", "Engineer", "BS", 25, "2024-01-06 11:30:00"),
        ("Carol", "Manager", "PhD", 41, "2024-02-01 09:15:00"),
        ("dave", "Analyst", "BS", 25, "2024-02-03 23:59:00"),
        ("Eve", "Engineer", "MS", 35, "2024-03-10 00:10:00"),
        ("frank thompson", "Manager", None, 52, "2024-03-11 12:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "Name string, Occupation string, Education string, Age int, Joined string"
    ).withColumn("Joined", F.to_timestamp("Joined"))
    df.createOrReplaceTempView("Customers")
    return df


def test_where_project_sort(spark, customers):
    out = kql(spark, """
      Customers
      | where Age < 40 and Occupation == 'Engineer'
      | project Name, Age
      | sort by Age asc, Name asc
    """).collect()
    assert [(r["Name"], r["Age"]) for r in out] == \
        [("bob", 25), ("Alice", 30), ("Eve", 35)]


def test_sort_defaults_desc(spark, customers):
    out = kql(spark, "Customers | project Age | sort by Age | take 2").collect()
    assert [r["Age"] for r in out] == [52, 41]


def test_summarize_alias_rules(spark, customers):
    # count() -> count_, count(Age) -> count_Age (KQL_ReleaseNote.md)
    out = kql(spark, """
      Customers | summarize count(), count(Age), avg(Age) by Occupation
      | sort by Occupation asc
    """)
    assert out.columns == ["Occupation", "count_", "count_Age", "avg_Age"]
    rows = {r["Occupation"]: (r["count_"], r["avg_Age"]) for r in out.collect()}
    assert rows["Engineer"] == (3, 30.0)
    assert rows["Manager"][0] == 2


def test_summarize_bin_keeps_column_name(spark, customers):
    out = kql(spark, "Customers | summarize count() by bin(Age, 10)")
    assert out.columns == ["Age", "count_"]
    got = {int(r["Age"]): r["count_"] for r in out.collect()}
    assert got == {20: 2, 30: 2, 40: 1, 50: 1}


def test_bin_datetime_timespan(spark, customers):
    out = kql(spark, """
      Customers | summarize n=count() by day = bin(Joined, 1d) | sort by day asc
    """).collect()
    assert out[0]["day"].day == 5 and out[0]["n"] == 1
    assert len(out) == 6


def test_string_predicates(spark, customers):
    # contains is case-insensitive; contains_cs is not
    assert kql(spark, "Customers | where Name contains 'ALICE'").count() == 1
    assert kql(spark, "Customers | where Name contains_cs 'ALICE'").count() == 0
    assert kql(spark, "Customers | where Name startswith 'al'").count() == 1
    assert kql(spark, "Customers | where Name !startswith 'al'").count() == 5
    # has = whole-term match
    assert kql(spark, "Customers | where Name has 'thompson'").count() == 1
    assert kql(spark, "Customers | where Name has 'thomp'").count() == 0
    assert kql(spark, "Customers | where Name hasprefix 'thomp'").count() == 1
    assert kql(spark, "Customers | where Name =~ 'ALICE'").count() == 1
    assert kql(spark, "Customers | where Age between (25 .. 30)").count() == 3
    assert kql(spark, "Customers | where Age !between (25 .. 30)").count() == 3
    assert kql(spark,
               "Customers | where Occupation in~ ('engineer', 'MANAGER')"
               ).count() == 5
    assert kql(spark, "Customers | where Name matches regex '^[A-Z]'").count() == 3


def test_extend_and_scalars(spark, customers):
    out = kql(spark, """
      Customers
      | extend NameLen = strlen(Name), Upper = toupper(Name),
               Sub = substring(Name, 0, 2)
      | where Name == 'Alice'
      | project NameLen, Upper, Sub
    """).first()
    assert (out["NameLen"], out["Upper"], out["Sub"]) == (5, "ALICE", "Al")


def test_iif_isempty_toint(spark, customers):
    out = kql(spark, """
      Customers
      | extend Grp = iif(Age < 30, 'young', 'old'),
               NoEdu = isempty(Education), N = toint('12x')
      | where Name == 'frank thompson'
      | project Grp, NoEdu, N
    """).first()
    assert out["Grp"] == "old" and out["NoEdu"] is True and out["N"] is None


def test_top_distinct_count(spark, customers):
    out = kql(spark, "Customers | top 2 by Age").collect()
    assert [r["Age"] for r in out] == [52, 41]
    assert kql(spark, "Customers | distinct Occupation").count() == 3
    assert kql(spark, "Customers | count").first()["Count"] == 6


def test_project_away_rename(spark, customers):
    out = kql(spark, """
      Customers | project-away Joined, Education | project-rename Who = Name
    """)
    assert out.columns == ["Who", "Occupation", "Age"]


def test_print_and_datetime_literal(spark):
    r = kql(spark, "print x = strcat('a', 'b'), y = 1 + 2, "
                   "d = datetime(2024-05-01 00:00:00)").first()
    assert r["x"] == "ab" and r["y"] == 3
    assert r["d"].year == 2024 and r["d"].month == 5


def test_dcount_percentile_argmax(spark, customers):
    out = kql(spark, """
      Customers | summarize dcount(Occupation), percentile(Age, 50),
                            oldest = arg_max(Age, Name)
    """).first()
    assert out["dcount_Occupation"] == 3
    assert out["percentile_Age_50"] == 32.5
    assert out["oldest"] == "frank thompson"


def test_mv_expand(spark):
    df = spark.createDataFrame([(1, [10, 20])], "id int, xs array<int>")
    out = kql(spark, "T | mv-expand xs", tables={"T": df}).collect()
    assert [(r["id"], r["xs"]) for r in out] == [(1, 10), (1, 20)]


def test_unmapped_operator_raises(spark, customers):
    # join/union are mapped since r5; fork remains unmapped
    with pytest.raises(NotImplementedError):
        kql(spark, "Customers | fork (where Age > 1)")


def test_fixture_tables(spark, catalog):
    out = kql(spark, """
      lineitem
      | where l_quantity > 45 and l_returnflag == 'R'
      | summarize n = count(), qty = sum(l_quantity) by l_linestatus
      | sort by l_linestatus asc
    """).collect()
    exp = (catalog.lineitem.filter((F.col("l_quantity") > 45)
                                   & (F.col("l_returnflag") == "R"))
           .groupBy("l_linestatus")
           .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
           .orderBy("l_linestatus").collect())
    assert [tuple(r) for r in out] == [tuple(r) for r in exp]


def test_make_series(spark, customers):
    out = kql(spark, """
      Customers
      | make-series n = count() default = 0
        on Joined from datetime(2024-01-01 00:00:00) to datetime(2024-04-01 00:00:00)
        step 30d by Occupation
      | sort by Occupation asc
    """).collect()
    by_occ = {r["Occupation"]: (list(r["n"]), r["Joined"]) for r in out}
    # 91 days / 30d step -> 4 bins starting 2024-01-01
    assert all(len(v[0]) == 4 for v in by_occ.values())
    assert by_occ["Engineer"][0] == [2.0, 0.0, 1.0, 0.0]
    # Feb 1 / Feb 3 land in the second 30-day bin (Jan 31 .. Mar 1)
    assert by_occ["Manager"][0] == [0.0, 1.0, 1.0, 0.0]
    assert by_occ["Analyst"][0] == [0.0, 1.0, 0.0, 0.0]
    assert by_occ["Engineer"][1][0].month == 1 and by_occ["Engineer"][1][0].day == 1


def test_kql_function_extensions(spark):
    import datetime as dtm
    r = kql(spark, """print a = array_index_of(pack_array(10,20,30), 20),
      s = array_sum(pack_array(1.5, 2.5)),
      e = extract_all(@'(\\d+)', 'a1b22c333'),
      j = extractjson('$.k', '{"k": 7}'),
      c = strcmp('a', 'b'),
      b = base64_decode_tostring(base64_encode_tostring('hi')),
      v = parse_version('1.2.3'),
      dd = datetime_diff('day', datetime(2021-01-03), datetime(2021-01-01)),
      dw = dayofweek(datetime(2021-01-03)),
      eod = endofmonth(datetime(2021-02-10)),
      ji = jaccard_index(pack_array(1,2,3), pack_array(2,3,4)),
      md = make_datetime(2021, 2, 3),
      so = set_difference(pack_array(1,2,3), pack_array(2))""").first()
    assert r.a == 1 and r.s == 4.0 and r.e == ["1", "22", "333"]
    assert r.j == "7" and r.c == -1 and r.b == "hi"
    assert r.v == 1000000020000000300000000
    assert r.dd == 2 and r.dw == 0 and r.ji == 0.5
    assert str(r.eod).startswith("2021-02-28 23:59:59")
    assert r.md == dtm.datetime(2021, 2, 3) and sorted(r.so) == [1, 3]


def test_kql_parse_operator(spark):
    df = spark.createDataFrame(
        [("GET /api/users?id=42 took 15ms",),
         ("POST /api/orders?id=7 took 230ms",)], "msg string")
    df.createOrReplaceTempView("kql_logs")
    out = kql(spark, """kql_logs
      | parse msg with verb ' /api/' endpoint '?id=' uid:long ' took ' dur:long 'ms'
      | project verb, endpoint, uid, dur""").collect()
    assert sorted((r.verb, r.endpoint, r.uid, r.dur) for r in out) == \
        [("GET", "users", 42, 15), ("POST", "orders", 7, 230)]
    import pytest as _pt
    with _pt.raises(NotImplementedError, match="kind"):
        kql(spark, "kql_logs | parse kind=regex msg with a 'x' b")


@pytest.fixture(scope="module")
def depts(spark):
    rows = [("Engineer", "R&D", 10), ("Manager", "Ops", 20),
            ("Sales", "GTM", 30)]
    df = spark.createDataFrame(rows, "Occupation string, Dept string, Code int")
    df.createOrReplaceTempView("Depts")
    return df


def test_join_same_name_key_kinds(spark, customers, depts):
    out = kql(spark, """
      Customers
      | join kind=inner Depts on Occupation
      | project Name, Dept
      | sort by Name asc
    """)
    got = [(r.Name, r.Dept) for r in out.collect()]
    assert ("Alice", "R&D") in got and ("Carol", "Ops") in got
    assert len(got) == 5  # dave the Analyst has no dept row
    # right key surfaces with the Kusto '1' suffix
    cols = kql(spark, "Customers | join kind=inner Depts on Occupation",
               None).columns
    assert "Occupation" in cols and "Occupation1" in cols

    anti = kql(spark, """
      Customers | join kind=leftanti Depts on Occupation | project Name
    """)
    assert sorted(r.Name for r in anti.collect()) == ["dave"]
    semi = kql(spark, """
      Customers | join kind=leftsemi Depts on Occupation
    """)
    assert semi.count() == 5 and "Dept" not in semi.columns
    rsemi = kql(spark, """
      Customers | join kind=rightsemi Depts on Occupation | project Dept
    """)
    assert sorted(r.Dept for r in rsemi.collect()) == ["Ops", "R&D"]
    ranti = kql(spark, """
      Customers | join kind=rightanti Depts on Occupation | project Dept
    """)
    assert sorted(r.Dept for r in ranti.collect()) == ["GTM"]


def test_join_dollar_terms_and_subquery(spark, customers, depts):
    out = kql(spark, """
      Customers
      | join kind=leftouter (Depts | where Code < 25)
            on $left.Occupation == $right.Occupation
      | project Name, Dept
      | sort by Name asc
    """)
    got = {r.Name: r.Dept for r in out.collect()}
    assert got["Alice"] == "R&D" and got["dave"] is None


def test_join_innerunique_dedups_left(spark, customers, depts):
    out = kql(spark, """
      Customers
      | join Depts on Occupation
      | project Occupation, Dept
    """)
    rows = [(r.Occupation, r.Dept) for r in out.collect()]
    assert sorted(set(rows)) == sorted(rows)  # one row per left key
    assert set(rows) == {("Engineer", "R&D"), ("Manager", "Ops")}


def test_union_outer_and_inner(spark, customers, depts):
    out = kql(spark, """
      Customers | project Name, Occupation
      | union (Depts | project Occupation, Dept)
    """)
    assert out.count() == 9
    assert set(out.columns) == {"Name", "Occupation", "Dept"}
    inner = kql(spark, """
      Customers | project Name, Occupation
      | union kind=inner (Depts | project Occupation, Dept)
    """)
    assert inner.columns == ["Occupation"] and inner.count() == 9


def test_join_unknown_kind_raises(spark, customers, depts):
    with pytest.raises(NotImplementedError, match="kind=cross"):
        kql(spark, "Customers | join kind=cross Depts on Occupation")
