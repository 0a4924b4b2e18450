"""H3 index-format subset (functions/h3.py): constant tables asserted
against the reference's OWN test expectations
(tests/queries/0_stateless/02160/02165/01070/01044/02212*.reference)
and bit-layout functions against the public H3 index spec."""

from pyspark.sql import functions as F

from clickhouse_core_spark.functions import ch

# a well-known valid res-5 cell (the h3 docs example index)
CELL = 0x85283473FFFFFFF        # res 5, base cell 20


def test_constant_tables(spark):
    r = spark.range(1).select(
        ch.h3EdgeLengthKm(F.lit(0)).alias("e0"),
        ch.h3EdgeLengthKm(F.lit(15)).alias("e15"),
        ch.h3EdgeLengthM(F.lit(2)).alias("m2"),
        ch.h3HexAreaKm2(F.lit(0)).alias("a0"),
        ch.h3HexAreaM2(F.lit(5)).alias("am5"),
        ch.h3HexAreaM2(F.lit(13)).alias("am13"),
        ch.h3NumHexagons(F.lit(0)).alias("n0"),
        ch.h3NumHexagons(F.lit(15)).alias("n15"),
        ch.h3EdgeAngle(F.lit(10)).alias("ang"),
    ).first()
    # 02165_h3_edge_length_km.reference
    assert r.e0 == 1107.712591 and r.e15 == 0.000509713
    assert abs(r.m2 - 158244.6558) < 1e-4
    # 02160_h3_hex_area_Km2.reference
    assert r.a0 == 4250546.848
    # 01070_h3_hex_area_m2.reference
    assert abs(r.am5 - 252903364.5) < 1e-4
    assert abs(r.am13 - 43.9) < 1e-9
    # 02165_h3_num_hexagons.reference
    assert r.n0 == 122 and r.n15 == 569707381193162
    # 01044_h3_edge_angle.reference
    assert abs(r.ang - 0.0005927224846720883) < 1e-15


def test_bit_layout(spark):
    r = spark.range(1).select(
        ch.h3GetResolution(F.lit(CELL)).alias("res"),
        ch.h3GetBaseCell(F.lit(CELL)).alias("bc"),
        ch.h3IsValid(F.lit(CELL)).alias("valid"),
        ch.h3IsValid(F.lit(0)).alias("inv0"),
        ch.h3IsValid(F.lit(CELL + (7 << 56))).alias("inv_reserved"),
        ch.h3IsResClassIII(F.lit(CELL)).alias("c3"),
        ch.h3IsPentagon(F.lit(CELL)).alias("pent"),
        ch.h3ToString(F.lit(CELL)).alias("s"),
        ch.stringToH3(F.lit("85283473fffffff")).alias("parsed"),
        ch.stringToH3(F.lit("nope")).alias("bad"),
    ).first()
    assert r.res == 5 and r.bc == 20
    assert r.valid == 1 and r.inv0 == 0 and r.inv_reserved == 0
    assert r.c3 == 1                   # res 5 is Class III
    assert r.pent == 0
    assert r.s == "85283473fffffff"
    assert r.parsed == CELL
    assert r.bad == 0


def test_res0_and_pentagons(spark):
    r = spark.range(1).select(
        ch.h3GetRes0Indexes().alias("r0"),
        ch.h3GetPentagonIndexes(F.lit(0)).alias("p0"),
    ).first()
    # 02212_h3_get_res0_indexes.reference first/last values
    assert len(r.r0) == 122
    assert r.r0[0] == 576495936675512319
    assert r.r0[-1] == 580753245698260991
    assert len(r.p0) == 12
    # every res-0 pentagon is a valid pentagon cell
    df = spark.createDataFrame([(v,) for v in r.p0], "h long")
    flags = df.select(ch.h3IsPentagon(F.col("h")).alias("p"),
                      ch.h3IsValid(F.col("h")).alias("v")).collect()
    assert all(x.p == 1 and x.v == 1 for x in flags)
    # res-0 indexes are all valid, and exactly 12 are pentagons
    d0 = spark.createDataFrame([(v,) for v in r.r0], "h long")
    agg = d0.select(F.sum(ch.h3IsValid(F.col("h"))).alias("v"),
                    F.sum(ch.h3IsPentagon(F.col("h"))).alias("p")).first()
    assert agg.v == 122 and agg.p == 12


def test_pentagon_deleted_axis_validity(spark):
    """On a pentagon base cell the leading digit 1 is the deleted K
    axis: such indexes are invalid; leading 0 then 1 is fine."""
    # base cell 4 (pentagon), res 1, digit1 = 1 -> invalid
    bad = (1 << 59) | (1 << 52) | (4 << 45) | (1 << 42) | ((1 << 42) - 1)
    # base cell 4, res 2, digits (0, 2) -> valid
    good = (1 << 59) | (2 << 52) | (4 << 45) | (0 << 42) | (2 << 39) \
        | ((1 << 39) - 1)
    df = spark.createDataFrame([(bad,), (good,)], "h long")
    got = [r.v for r in
           df.select(ch.h3IsValid(F.col("h")).alias("v")).collect()]
    assert got == [0, 1]


def test_sql_frontend_bridge(spark):
    from clickhouse_core_spark.plans.frontend import ch_sql
    r = ch_sql(spark, "SELECT h3EdgeLengthKm(0) AS e, "
                      "h3GetResolution(stringToH3('85283473fffffff')) "
                      "AS res").first()
    assert r.e == 1107.712591 and r.res == 5
