import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_core_spark import get_spark, Catalog  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_MED", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    extra = {"spark.sql.shuffle.partitions": "8"}
    # CI-style ANSI run: SPARK_GRAFT_TEST_ANSI=1 forces the Spark 4
    # default ANSI mode so session-sensitive expressions fail locally
    # instead of in the driver's session.
    if os.environ.get("SPARK_GRAFT_TEST_ANSI") == "1":
        extra["spark.sql.ansi.enabled"] = "true"
    s = get_spark("tests", master="local[8]", extra_conf=extra)
    yield s


@pytest.fixture(scope="session")
def catalog(spark):
    cat = Catalog(spark, SF_DIR)
    cat.register_all()
    return cat


@pytest.fixture(scope="session")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"create view {t} as select * from read_parquet('{path}')")
    return con
