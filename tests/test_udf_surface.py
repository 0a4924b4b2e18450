"""UDF surface: SQL-lambda macro UDFs, executable (pandas) UDFs,
Python UDTFs (reference §2.10 analogs)."""

import pandas as pd

from pyspark.sql import functions as F

from clickhouse_core_spark.functions.udf import (
    call_function, create_function, register_executable_udf,
    register_python_udtf,
)


def test_sql_lambda_udf_inlines(spark):
    create_function("discounted", lambda price, disc: price * (1 - disc))
    df = spark.createDataFrame([(100.0, 0.1)], "p double, d double")
    out = df.select(call_function("discounted", F.col("p"), F.col("d"))
                    .alias("x"))
    assert out.collect()[0]["x"] == 90.0
    # macro expansion: no python execution boundary in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_executable_udf_pandas_batches(spark):
    def shout(s: pd.Series) -> pd.Series:
        return s.str.upper() + "!"

    register_executable_udf(spark, "shout", shout, "string")
    df = spark.createDataFrame([("hey",), ("ho",)], "s string")
    df.createOrReplaceTempView("t_shout")
    out = spark.sql("SELECT shout(s) AS x FROM t_shout ORDER BY x").collect()
    assert [r["x"] for r in out] == ["HEY!", "HO!"]


def test_python_udtf(spark):
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield (i, w)

    register_python_udtf(spark, "split_words", SplitWords,
                         "pos int, word string")
    out = spark.sql("SELECT * FROM split_words('a b c')").collect()
    assert [(r["pos"], r["word"]) for r in out] == [(0, "a"), (1, "b"), (2, "c")]


def test_register_sql_scalar_udfs(spark):
    from clickhouse_core_spark.functions.udf import register_sql_scalar_udfs
    names = register_sql_scalar_udfs(spark)
    assert "punycodeEncode" in names and "keccak256" in names
    row = spark.sql(
        "SELECT punycodeEncode('München') AS p, "
        "normalizeUTF8NFKC('ﬁn') AS n, "
        "base58Decode(base58Encode('round trip')) AS rt, "
        "sqidDecode('86Rf07') AS s").first()
    assert row.p == "Mnchen-3ya" and row.n == "fin"
    assert row.rt == "round trip" and row.s == [1, 2, 3]
