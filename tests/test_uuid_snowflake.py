"""UUID / Snowflake / ULID families (reference
src/Functions/FunctionsCodingUUID.cpp, snowflake.cpp,
snowflakeIDToDateTime.cpp, FunctionsCodingULID.cpp)."""

import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.functions import ch

UUID = "61f0c404-5cb3-11e7-907b-a6006ad3dba0"


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_to_uuid_variants(spark):
    assert _one(spark, ch.toUUID(F.lit(UUID.upper()))) == UUID
    assert _one(spark, ch.toUUIDOrNull(F.lit("not-a-uuid"))) is None
    assert _one(spark, ch.toUUIDOrZero(F.lit("nope"))) == \
        "00000000-0000-0000-0000-000000000000"
    assert _one(spark, ch.toUUIDOrDefault(
        F.lit("bad"), F.lit(UUID))) == UUID


def test_uuid_num_roundtrip(spark):
    out = _one(spark, ch.UUIDNumToString(ch.UUIDStringToNum(F.lit(UUID))))
    assert out == UUID
    raw = _one(spark, ch.UUIDStringToNum(F.lit(UUID)))
    assert len(bytes(raw)) == 16


def test_uuidv7_to_datetime(spark):
    # UUIDv7 with ms timestamp 0x017F22E279B0 = 2022-03-31T...
    u = "017f22e2-79b0-7cc3-98c4-dc0c0c07398f"
    ts = _one(spark, ch.UUIDv7ToDateTime(F.lit(u)))
    assert ts == dt.datetime(2022, 2, 22, 19, 22, 22)


def test_generate_uuid_v7_shape(spark):
    u = _one(spark, ch.generateUUIDv7())
    assert re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}", u)


def test_snowflake_roundtrip(spark):
    ts = F.lit("2021-08-15 18:57:56").cast("timestamp")
    sid = ch.dateTimeToSnowflake(ts)
    back = _one(spark, ch.snowflakeToDateTime(sid))
    assert back == dt.datetime(2021, 8, 15, 18, 57, 56)
    # ms precision via the 64 variant
    ts64 = F.lit("2021-08-15 18:57:56.492").cast("timestamp")
    back64 = _one(spark, ch.snowflakeToDateTime64(
        ch.dateTime64ToSnowflake(ts64)))
    assert back64 == dt.datetime(2021, 8, 15, 18, 57, 56, 492000)


def test_snowflake_id_epoch_zero(spark):
    ts64 = F.lit("2021-08-15 18:57:56.492").cast("timestamp")
    back = _one(spark, ch.snowflakeIDToDateTime64(
        ch.dateTimeToSnowflakeID(ts64)))
    assert back == dt.datetime(2021, 8, 15, 18, 57, 56, 492000)


def test_ulid_time(spark):
    # 01GNB2... : Crockford("01GNB2HMCD") -> 2022-12-28-ish ms
    ulid = "01GNB2HMCDSW4HPNWREKMJW7FG"
    ts = _one(spark, ch.ULIDStringToDateTime(F.lit(ulid)))
    assert ts.year == 2022 and ts.month == 12
    gen = _one(spark, ch.generateULID())
    assert len(gen) == 26 and all(c in
                                  "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
                                  for c in gen)
    # generated ULID decodes back to ~now
    t2 = _one(spark, ch.ULIDStringToDateTime(ch.generateULID()))
    assert abs((t2 - dt.datetime.utcnow()).total_seconds()) < 3600
