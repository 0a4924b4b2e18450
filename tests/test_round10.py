"""Round-10 regression tests: the three judge-confirmed wrong-answer
classes (keyless empty-set aggregate defaults, ENGINE = Distributed
proxy reads, \\xHH string escapes) plus the codec-order narrowing,
numbers() constant folding, and DETACH/ATTACH PART."""

import math

import pytest

from clickhouse_core_spark.plans.frontend import (
    SESSION_SETTINGS, ch_sql)


@pytest.fixture(scope="module")
def spark():
    from clickhouse_core_spark import get_spark
    s = get_spark("test_round10", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    s.sparkContext.setLogLevel("ERROR")
    return s


def _rows(spark, sql, tables):
    df = ch_sql(spark, sql, tables=tables)
    return [tuple(r) for r in df.collect()]


# ------------------------------------------- empty-set keyless defaults

def test_keyless_empty_defaults_00572(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_e (x UInt8) ENGINE = Memory",
           tables=t)
    (cnt, uq, av, avn, ga, gua), = _rows(
        spark, "SELECT count(), uniq(x), avg(x), avg(toNullable(x)), "
               "groupArray(x), groupUniqArray(x) FROM r10t_e", t)
    assert (cnt, uq) == (0, 0)
    assert math.isnan(av)
    assert avn is None
    assert ga == [] and gua == []


def test_keyless_empty_identity_defaults(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_e2 (x UInt32, n Nullable(Int64), "
                  "s String) ENGINE = Memory", tables=t)
    (mn, mx, sm, anys, minn, sumn), = _rows(
        spark, "SELECT min(x), max(x), sum(x), any(s), min(n), "
               "sum(n) FROM r10t_e2", t)
    assert (mn, mx, sm, anys) == (0, 0, 0, "")
    assert minn is None and sumn is None


def test_keyless_empty_defaults_01559(spark):
    q = ("SELECT MAX(aggr) AS m FROM (SELECT MAX(-1) AS aggr "
         "FROM system.one WHERE NOT 1 UNION ALL SELECT MAX(-1) AS "
         "aggr FROM system.one WHERE 1)")
    assert _rows(spark, q, {}) == [(0,)]
    SESSION_SETTINGS["aggregate_functions_null_for_empty"] = "1"
    try:
        q2 = ("SELECT MAX(aggr) AS m FROM (SELECT MAX(-1) AS aggr "
              "FROM system.one WHERE NOT 1 UNION ALL SELECT MAX(-1) "
              "AS aggr FROM system.one WHERE NOT 1)")
        assert _rows(spark, q2, {}) == [(None,)]
    finally:
        SESSION_SETTINGS.pop("aggregate_functions_null_for_empty")


def test_keyless_nonempty_unchanged(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_ne (x UInt32) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO r10t_ne VALUES (3), (7)", tables=t)
    assert _rows(spark, "SELECT min(x), max(x), sum(x), avg(x) "
                        "FROM r10t_ne", t) == [(3, 7, 10, 5.0)]


def test_grouped_empty_returns_no_rows(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_g (x UInt32) ENGINE = Memory",
           tables=t)
    assert _rows(spark, "SELECT x, max(x) FROM r10t_g GROUP BY x",
                 t) == []


# ------------------------------------------------- Distributed proxy

def test_distributed_proxy_reads_and_writes(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE mt_00609 (x UInt64, s String) "
                  "ENGINE = MergeTree ORDER BY x", tables=t)
    ch_sql(spark, "INSERT INTO mt_00609 VALUES (1, 'hello'), "
                  "(2, 'world')", tables=t)
    ch_sql(spark, "CREATE TABLE dist_00609 AS mt_00609 ENGINE = "
                  "Distributed(test_shard_localhost, currentDatabase()"
                  ", mt_00609)", tables=t)
    assert _rows(spark, "SELECT s FROM dist_00609 ORDER BY x",
                 t) == [("hello",), ("world",)]
    # INSERT into the distributed name routes to the local table
    ch_sql(spark, "INSERT INTO dist_00609 VALUES (3, 'third')",
           tables=t)
    assert _rows(spark, "SELECT count() AS c FROM mt_00609",
                 t) == [(3,)]
    ch_sql(spark, "DROP TABLE dist_00609", tables=t)
    assert _rows(spark, "SELECT count() AS c FROM mt_00609",
                 t) == [(3,)]


def test_distributed_explicit_columns(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE loc_r10 (x UInt32) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO loc_r10 VALUES (42)", tables=t)
    ch_sql(spark, "CREATE TABLE dist_r10 (x UInt32) ENGINE = "
                  "Distributed(test_cluster, default, loc_r10)",
           tables=t)
    assert _rows(spark, "SELECT x FROM dist_r10", t) == [(42,)]


# -------------------------------------------------- \xHH escapes

def test_hex_escape_invalid_utf8(spark):
    assert _rows(spark, "SELECT length('\\xe2') AS l, hex('\\xe2') "
                        "AS h", {}) == [(1, "E2")]


def test_hex_escape_valid_ascii(spark):
    assert _rows(spark, "SELECT '\\x41\\x42' AS s, length('a\\x20b') "
                        "AS l", {}) == [("AB", 3)]


def test_hex_escape_insert_roundtrip(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_hex (s String) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO r10t_hex VALUES ('\\xe2'), ('plain')",
           tables=t)
    assert sorted(_rows(spark, "SELECT length(s) AS l FROM r10t_hex",
                        t)) == [(1,), (5,)]


# ---------------------------------------------- codec-order narrowing

def test_suspicious_codecs_rejected_by_default(spark):
    with pytest.raises(Exception):
        ch_sql(spark, "CREATE TABLE r10t_cod (x UInt64 "
                      "CODEC(ZSTD, Delta(4))) ENGINE = MergeTree "
                      "ORDER BY x", tables={})


def test_suspicious_codecs_allowed_by_setting(spark):
    SESSION_SETTINGS["allow_suspicious_codecs"] = "1"
    try:
        t = {}
        ch_sql(spark, "CREATE TABLE r10t_cod2 (id UInt64 "
                      "CODEC(LZ4, ZSTD, NONE, LZ4HC, Delta(4))) "
                      "ENGINE = MergeTree ORDER BY id", tables=t)
        ch_sql(spark, "INSERT INTO r10t_cod2 VALUES (7)", tables=t)
        assert _rows(spark, "SELECT id FROM r10t_cod2", t) == [(7,)]
    finally:
        SESSION_SETTINGS.pop("allow_suspicious_codecs")


# ---------------------------------------------- numbers() const folding

def test_numbers_const_expr(spark):
    assert _rows(spark, "SELECT count() AS c FROM "
                        "numbers(toUInt64(5))", {}) == [(5,)]
    assert _rows(spark, "SELECT number FROM numbers(2 + 3) "
                        "ORDER BY number DESC LIMIT 1", {}) == [(4,)]


def test_numbers_wraparound_unbounded(spark):
    assert _rows(spark, "SELECT number FROM numbers(toUInt64(-1)) "
                        "LIMIT 2", {}) == [(0,), (1,)]


# ------------------------------------------------- DETACH/ATTACH PART

def test_detach_attach_part(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_dp (x UInt32) ENGINE = MergeTree "
                  "ORDER BY x", tables=t)
    ch_sql(spark, "INSERT INTO r10t_dp VALUES (1), (2)", tables=t)
    ch_sql(spark, "INSERT INTO r10t_dp VALUES (10)", tables=t)
    ch_sql(spark, "ALTER TABLE r10t_dp DETACH PART 'all_1_1_0'",
           tables=t)
    assert _rows(spark, "SELECT sum(x) AS s FROM r10t_dp",
                 t) == [(10,)]
    ch_sql(spark, "ALTER TABLE r10t_dp ATTACH PART 'all_1_1_0'",
           tables=t)
    assert _rows(spark, "SELECT sum(x) AS s FROM r10t_dp",
                 t) == [(13,)]
    with pytest.raises(Exception):
        ch_sql(spark, "ALTER TABLE r10t_dp DETACH PART 'all_99_99_0'",
               tables=t)


# ------------------------------------------------- JSON SQL surface

def test_json_array_subcolumn(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_j (id UInt32, o JSON) "
                  "ENGINE = Memory", tables=t)
    ch_sql(spark, "INSERT INTO r10t_j VALUES "
                  "(1, '{\"a\": {\"b\": 1, \"c\": [{\"d\": 10}, "
                  "{\"d\": 20}]}}'), "
                  "(2, '{\"a\": {\"b\": 2, \"c\": []}}')", tables=t)
    assert _rows(spark, "SELECT o.a.c[].d AS d FROM r10t_j "
                        "ORDER BY id", t) == [(["10", "20"],), ([],)]
    assert _rows(spark, "SELECT o.a.b.:Int64 AS bi, o.a.b.:String "
                        "AS bs FROM r10t_j ORDER BY bi",
                 t) == [(1, None), (2, None)]
    assert _rows(spark, "SELECT o.a.c.:`Array(JSON)`.d AS d "
                        "FROM r10t_j ORDER BY id",
                 t) == [(["10", "20"],), ([],)]


def test_json_paths_functions(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_jp (o JSON) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO r10t_jp VALUES "
                  "('{\"a\": {\"b\": 1, \"c\": [2]}, \"x\": \"s\"}')",
           tables=t)
    assert _rows(spark, "SELECT JSONAllPaths(o) AS p FROM r10t_jp",
                 t) == [(["a.b", "a.c", "x"],)]
    # *WithTypes forms carry the map as its ORDERED entry array
    # (py4j's MapType→dict collect scrambles entry order; golden
    # 03270 needs the sorted path order preserved end-to-end)
    (pt,), = _rows(spark, "SELECT JSONAllPathsWithTypes(o) AS pt "
                          "FROM r10t_jp", t)
    assert [(e["__ch_k"], e["__ch_v"]) for e in pt] == [
        ("a.b", "Int64"), ("a.c", "Array(Nullable(String))"),
        ("x", "String")]
    # arrayJoin over the Map form yields (k, v) entry tuples
    aj = _rows(spark, "SELECT arrayJoin(JSONAllPathsWithTypes(o)) "
                      "AS p FROM r10t_jp ORDER BY p", t)
    assert [tuple(r[0]) for r in aj] == [
        ("a.b", "Int64"), ("a.c", "Array(Nullable(String))"),
        ("x", "String")]
    (dt,), = _rows(spark, "SELECT distinctJSONPathsAndTypes(o) AS m "
                          "FROM r10t_jp", t)
    assert [(e["__ch_k"], list(e["__ch_v"])) for e in dt] == [
        ("a.b", ["Int64"]), ("a.c", ["Array(Nullable(String))"]),
        ("x", ["String"])]
    assert _rows(spark, "SELECT JSONSharedDataPaths(o) AS s "
                        "FROM r10t_jp", t) == [([],)]
    assert _rows(spark, "SELECT distinctJSONPaths(o) AS d "
                        "FROM r10t_jp", t) == [(["a.b", "a.c", "x"],)]


# --------------------------------------- USING / GROUP BY alias scope

def test_join_using_select_alias(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_ua (a Int32) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO r10t_ua VALUES (0), (1), (2), (3)",
           tables=t)
    ch_sql(spark, "CREATE TABLE r10t_ub (b Int32, s String) "
                  "ENGINE = Memory", tables=t)
    ch_sql(spark, "INSERT INTO r10t_ub VALUES (2, 'x'), (3, 'y'), "
                  "(4, 'z')", tables=t)
    assert _rows(spark, "SELECT a + 2 AS b FROM r10t_ua JOIN r10t_ub "
                        "USING (b) ORDER BY b",
                 t) == [(2,), (3,), (4,)]


def test_group_by_expression_alias(spark):
    assert _rows(spark, "SELECT n FROM numbers(6) GROUP BY "
                        "number % 3 AS n ORDER BY n",
                 {}) == [(0,), (1,), (2,)]
    assert _rows(spark, "SELECT k, sum(number) AS s FROM numbers(10) "
                        "GROUP BY intDiv(number, 5) AS k ORDER BY k",
                 {}) == [(0, 10), (1, 35)]


# --------------------------------------- array lexicographic compare

def test_array_lexicographic_compare(spark):
    assert _rows(spark, "SELECT [1, 2] > [1] AS a, [1] < [1, 2] AS b, "
                        "[2] > [1, 9] AS c, [1, 2] >= [1, 2] AS d",
                 {}) == [(True, True, True, True)]
    assert _rows(spark, "SELECT number FROM numbers(5) WHERE "
                        "[number] > [2] ORDER BY number",
                 {}) == [(3,), (4,)]


# ------------------------------------------- Nested dotted references

def test_nested_dotted_order_by_and_mutation(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_n (id UInt32, n Nested(a UInt32, "
                  "b String)) ENGINE = Memory", tables=t)
    ch_sql(spark, "INSERT INTO r10t_n VALUES (1, [3, 1], ['x', 'y']), "
                  "(2, [2], ['z'])", tables=t)
    assert _rows(spark, "SELECT id FROM r10t_n ORDER BY n.a",
                 t) == [(2,), (1,)]
    assert _rows(spark, "SELECT id, n.a, n.b FROM r10t_n ARRAY JOIN n "
                        "ORDER BY id, n.a",
                 t) == [(1, 1, "y"), (1, 3, "x"), (2, 2, "z")]
    ch_sql(spark, "ALTER TABLE r10t_n DELETE WHERE id = 2", tables=t)
    assert _rows(spark, "SELECT count() AS c FROM r10t_n",
                 t) == [(1,)]


# ------------------------------------------------ batch-3 signatures

def test_json_cast_forms(spark):
    assert _rows(spark, "SELECT '{\"a\": 1}'::JSON AS j",
                 {}) == [('{"a":1}',)]
    assert _rows(spark, "SELECT CAST('{\"a\": 1}' AS "
                        "JSON(max_dynamic_paths=8, SKIP a.b)) AS j",
                 {}) == [('{"a":1}',)]


def test_remote_tvf_proxies_local(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_rem (x UInt32) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO r10t_rem VALUES (5)", tables=t)
    assert _rows(spark, "SELECT x FROM remote('127.0.0.1', "
                        "currentDatabase(), r10t_rem)", t) == [(5,)]
    # Brace patterns fan out per shard and union the results (reference
    # golden 00183_skip_unavailable_shards: count() over 2 shards = 2).
    assert _rows(spark, "SELECT count() AS c FROM "
                        "remote('127.{1,1}', 'system.one')",
                 t) == [(2,)]


def test_neighbor_nonconstant_offset(spark):
    assert _rows(spark, "SELECT neighbor(toString(number), number) "
                        "AS nb FROM numbers(4)",
                 {}) == [("0",), ("2",), ("",), ("",)]


def test_bool_arith_retry(spark):
    assert _rows(spark, "SELECT a FROM (SELECT 1 AS a) t "
                        "ORDER BY (t.a > t.a) + 1", {}) == [(1,)]


def test_order_by_hidden_group_expr(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_ob (id UInt64, u UInt64) "
                  "ENGINE = Memory", tables=t)
    ch_sql(spark, "INSERT INTO r10t_ob SELECT number, number "
                  "FROM numbers(6)", tables=t)
    rows = _rows(spark, "SELECT sum(u) AS s FROM r10t_ob "
                        "GROUP BY id % 3 AS k WITH TOTALS ORDER BY k",
                 t)
    assert sorted(r[0] for r in rows) == [3, 5, 7, 15]


def test_using_alias_subquery_sides(spark):
    assert _rows(spark, "SELECT 1 AS c0 FROM (SELECT 1 AS c1) t0 "
                        "JOIN (SELECT 1 AS c0) t1 USING (c0)",
                 {}) == [(1,)]


def test_scalar_tuple_cte_numbers(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_seq (number UInt64) "
                  "ENGINE = Memory", tables=t)
    ch_sql(spark, "INSERT INTO r10t_seq VALUES (2), (5)", tables=t)
    assert _rows(spark, "WITH (Select min(number), max(number) from "
                        "r10t_seq) as range Select * from "
                        "numbers(range.1, range.2)",
                 t) == [(2,), (3,), (4,), (5,), (6,)]


def test_json_mutation_predicate(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_mu (id UInt32, obj JSON) "
                  "ENGINE = MergeTree ORDER BY id", tables=t)
    ch_sql(spark, "INSERT INTO r10t_mu VALUES (1, '{\"k3\": 5}'), "
                  "(2, '{\"k3\": 7}')", tables=t)
    ch_sql(spark, "ALTER TABLE r10t_mu DELETE WHERE obj.k3 = 5",
           tables=t)
    assert _rows(spark, "SELECT id FROM r10t_mu", t) == [(2,)]


def test_nested_arrayjoin_chains(spark):
    assert _rows(spark, "SELECT arrayJoin(arrayJoin([[1, 2], [3]])) "
                        "AS v ORDER BY v", {}) == [(1,), (2,), (3,)]
    assert _rows(spark, "SELECT arrayJoin(arrayMap(x -> x + 1, "
                        "arrayJoin([[1], [2, 3]]))) AS v ORDER BY v",
                 {}) == [(2,), (3,), (4,)]
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_ja (id UInt32, o JSON) "
                  "ENGINE = Memory", tables=t)
    ch_sql(spark, "INSERT INTO r10t_ja VALUES "
                  "(1, '{\"k1\": [{\"a\": 1}, {\"b\": 2}]}')",
           tables=t)
    assert _rows(spark, "SELECT DISTINCT arrayJoin(JSONAllPaths("
                        "arrayJoin(o.k1[]))) AS p FROM r10t_ja "
                        "ORDER BY p", t) == [("a",), ("b",)]


# --------------------------------------------- batch-4 sweep signatures

def test_engine_less_create_defaults_mergetree(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_noeng (id UInt64, s "
                  "Nullable(String)) ORDER BY id", tables=t)
    ch_sql(spark, "INSERT INTO r10t_noeng VALUES (1, 'a'), (2, NULL)",
           tables=t)
    assert _rows(spark, "SELECT count() AS c FROM r10t_noeng",
                 t) == [(2,)]


def test_trailing_comma_and_all_join(spark):
    assert _rows(spark, "WITH 1 as a SELECT a, FROM numbers(1)",
                 {}) == [(1,)]
    assert _rows(spark, "SELECT * FROM (SELECT 1 AS dt) t1 ALL JOIN "
                        "(SELECT 1 AS dt) t2 ON t1.dt = t2.dt",
                 {}) == [(1, 1)]


def test_group_by_alias_inside_aggregate(spark):
    assert _rows(spark, "select uniqExact(x) AS u from numbers(10) "
                        "group by number % 2 as x ORDER BY u",
                 {}) == [(1,), (1,)]


def test_int_logical_retry(spark):
    assert _rows(spark, "SELECT a FROM (SELECT 1 AS a, 2 AS b, "
                        "0 AS c) t ORDER BY (a > b) + 1 AND "
                        "(a > c) + 1", {}) == [(1,)]


def test_remote_numbers_tvf(spark):
    # Each brace-expanded shard evaluates the TVF independently and the
    # results union (reference 00183_skip_unavailable_shards semantics:
    # per-shard rows sum across shards).
    assert _rows(spark, "SELECT count() AS c FROM "
                        "remote('127.{1,1}', numbers(6))",
                 {}) == [(12,)]


def test_optimize_partition_clause(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_op (d Date, x UInt32) ENGINE = "
                  "MergeTree PARTITION BY d ORDER BY x", tables=t)
    ch_sql(spark, "INSERT INTO r10t_op VALUES ('2020-01-01', 1)",
           tables=t)
    ch_sql(spark, "OPTIMIZE TABLE r10t_op PARTITION '2020-01-01' "
                  "FINAL", tables=t)
    assert _rows(spark, "SELECT x FROM r10t_op", t) == [(1,)]


# -------------------------------------------- batch-5 rejection contracts

def test_vector_similarity_index_contract(spark):
    ok = ("CREATE TABLE r10t_vs (id Int32, vec Array(Float32), INDEX "
          "idx vec TYPE vector_similarity('hnsw', 'L2Distance', 2)) "
          "ENGINE = MergeTree ORDER BY id")
    ch_sql(spark, ok, tables={})
    for bad in [
            "vector_similarity",
            "vector_similarity()",
            "vector_similarity('cant have', 'two args')",
            "vector_similarity('not_hnsw', 'L2Distance', 1)",
            "vector_similarity('hnsw', 'invalid_distance', 1)",
            "vector_similarity('hnsw', 'L2Distance', 0)"]:
        with pytest.raises(Exception):
            ch_sql(spark, "CREATE TABLE r10t_vsb (id Int32, vec "
                          f"Array(Float32), INDEX idx vec TYPE {bad})"
                          " ENGINE = MergeTree ORDER BY id",
                   tables={})


def test_distributed_rejections(spark):
    t = {}
    # empty db = CURRENT database, lazy target accepted (01763)...
    ch_sql(spark, "CREATE TABLE r10t_d6 (id UInt32) ENGINE = "
                  "Distributed('c', '', 'r10t_d7', rand())", tables=t)
    # ...but a cycle of Distributed tables is INFINITE_LOOP
    with pytest.raises(Exception):
        ch_sql(spark, "CREATE TABLE r10t_d7 (id UInt32) ENGINE = "
                      "Distributed('c', '', 'r10t_d6', rand())",
               tables=t)
    with pytest.raises(Exception):
        ch_sql(spark, "CREATE TABLE r10t_d8 (key int, INDEX i1 key "
                      "TYPE minmax GRANULARITY 1) Engine = "
                      "Distributed(c, currentDatabase(), 'foo')",
               tables=t)


def test_using_alias_left_side_only(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_ul (b Int32) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "CREATE TABLE r10t_ur (a Int32) ENGINE = Memory",
           tables=t)
    # right side lacks b and aliases do NOT resolve there (02989:
    # UNKNOWN_IDENTIFIER)
    with pytest.raises(Exception):
        ch_sql(spark, "SELECT 1 AS b FROM r10t_ul JOIN r10t_ur "
                      "USING (b)", tables=t).collect()


def test_tosoi_origin_contracts(spark):
    with pytest.raises(Exception):
        ch_sql(spark, "SELECT toStartOfInterval(toDateTime("
                      "'2023-01-02 14:45:50'), toIntervalYear(1), 5, "
                      "'Europe/Amsterdam')", tables={})
    with pytest.raises(Exception):
        ch_sql(spark, "SELECT toStartOfInterval(toDateTime("
                      "'2023-10-09 10:11:12'), toIntervalMillisecond"
                      "(1), toDateTime('2023-10-09 10:11:12'))",
               tables={})


def test_dynamic_mixed_values_insert(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_dy (d Dynamic) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO r10t_dy VALUES (42), ('str'), (NULL)",
           tables=t)
    rows = _rows(spark, "SELECT d, d.UInt64 FROM r10t_dy "
                        "ORDER BY d NULLS FIRST", t)
    assert rows == [(None, None), ("42", 42), ("str", None)]


# ------------------------------------------------ declared ALIAS columns

def test_alias_columns_02989(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_abc (a UInt32, b UInt32 ALIAS "
                  "a + 1, c UInt32 ALIAS b + 1, s String) ENGINE = "
                  "MergeTree ORDER BY a", tables=t)
    ch_sql(spark, "INSERT INTO r10t_abc (a, s) SELECT number, 'abc' "
                  "|| toString(number) FROM numbers(4)", tables=t)
    # hidden from SELECT *
    assert _rows(spark, "SELECT * FROM r10t_abc ORDER BY a",
                 t)[0] == (0, "abc0")
    # computed on explicit reference (chained aliases expand)
    assert _rows(spark, "SELECT a, b, c FROM r10t_abc ORDER BY a",
                 t)[:2] == [(0, 1, 2), (1, 2, 3)]
    ch_sql(spark, "CREATE TABLE r10t_tb (b Int32) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO r10t_tb VALUES (0), (1), (2), (3)",
           tables=t)
    ch_sql(spark, "CREATE TABLE r10t_ta (a Int32) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO r10t_ta VALUES (0), (1), (2), (3)",
           tables=t)
    # golden 02989 shapes over the alias columns
    assert _rows(spark, "SELECT a + 2 AS b FROM r10t_ta JOIN "
                        "r10t_abc USING (b) ORDER BY ALL",
                 t) == [(2,), (3,), (4,)]
    assert _rows(spark, "SELECT b + 2 AS a FROM r10t_tb JOIN "
                        "r10t_abc USING (a) ORDER BY ALL",
                 t) == [(2,), (3,)]
    assert _rows(spark, "SELECT b AS a, a FROM r10t_tb JOIN "
                        "r10t_abc USING (a) ORDER BY ALL",
                 t) == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_aggregating_merge_tree_final(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_agmt (key Int32, value Int32, "
                  "INDEX idx value TYPE minmax GRANULARITY 1) "
                  "Engine = AggregatingMergeTree() ORDER BY key "
                  "PARTITION BY key", tables=t)
    ch_sql(spark, "INSERT INTO r10t_agmt SELECT number, number "
                  "FROM numbers(10)", tables=t)
    assert _rows(spark, "SELECT * FROM r10t_agmt FINAL WHERE "
                        "value = 1", t) == [(1, 1)]


def test_replicate_function(spark):
    assert _rows(spark, "SELECT replicate(7, [1, 2, 3]) AS r",
                 {}) == [([7, 7, 7],)]


def test_distinct_order_by_expression(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_jd (json JSON) ENGINE = Memory",
           tables=t)
    ch_sql(spark, "INSERT INTO r10t_jd VALUES ('{\"a0\": 3}'), "
                  "('{\"a0\": 1}'), ('{\"a0\": 3}')", tables=t)
    assert _rows(spark, "select distinct json.a0 from r10t_jd "
                        "order by json.a0.:Int64",
                 t) == [("1",), ("3",)]


def test_anti_join_nonjoined_side_columns(spark):
    t = {}
    ch_sql(spark, "CREATE TABLE r10t_a1 (x UInt32, s String) "
                  "engine = MergeTree ORDER BY tuple()", tables=t)
    ch_sql(spark, "CREATE TABLE r10t_a2 (x UInt32, s String) "
                  "engine = MergeTree ORDER BY tuple()", tables=t)
    ch_sql(spark, "INSERT INTO r10t_a1 (x, s) VALUES (0, 'a1'), "
                  "(1, 'a2'), (2, 'a3'), (3, 'a4'), (4, 'a5'), "
                  "(2, 'a6')", tables=t)
    ch_sql(spark, "INSERT INTO r10t_a2 (x, s) VALUES (2, 'b1'), "
                  "(2, 'b2'), (4, 'b3'), (4, 'b4'), (4, 'b5'), "
                  "(5, 'b6')", tables=t)
    assert _rows(spark, "SELECT r10t_a1.*, r10t_a2.* FROM r10t_a1 "
                        "ANTI LEFT JOIN r10t_a2 USING(x) ORDER BY "
                        "r10t_a1.x, r10t_a2.x, r10t_a1.s, r10t_a2.s",
                 t) == [(0, "a1", 0, ""), (1, "a2", 1, ""),
                        (3, "a4", 3, "")]
    assert _rows(spark, "SELECT r10t_a1.*, r10t_a2.* FROM r10t_a1 "
                        "ANTI RIGHT JOIN r10t_a2 USING(x) ORDER BY "
                        "r10t_a1.x, r10t_a2.x, r10t_a1.s, r10t_a2.s",
                 t) == [(0, "", 5, "b6")]
