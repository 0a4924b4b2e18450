"""H3 index-format functions — the lib-free subset.

Reference registers ~60 h3* functions (src/Functions/h3*.cpp) backed by
the vendored Uber h3 library.  The GEOGRAPHIC functions (latLngToCell,
cellToLatLng, kRing, h3Line ...) need the icosahedron projection and
stay out of scope (LIMITS.md).  This module implements everything that
is pure PUBLIC INDEX FORMAT or a PUBLIC CONSTANT TABLE — no geometry:

- bit-layout functions (H3 index spec: 1 reserved bit, 4 mode bits,
  3 reserved, 4 resolution bits, 7 base-cell bits, 15x3 digit bits):
  h3GetResolution, h3GetBaseCell, h3IsValid, h3IsResClassIII,
  h3IsPentagon, h3ToString, stringToH3, h3GetRes0Indexes,
  h3GetPentagonIndexes
- constant tables (published h3 v3 average-metric tables, matching the
  reference's own test expectations in
  tests/queries/0_stateless/02160/02165/01070/01044*.reference):
  h3EdgeLengthKm, h3EdgeLengthM, h3HexAreaKm2, h3HexAreaM2,
  h3EdgeAngle, h3NumHexagons

Everything is Catalyst expression math over BIGINT carriers (h3
indexes have bit 63 clear, so the signed carrier is lossless).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _great_circle_rads(lat1, lon1, lat2, lon2) -> Column:
    """H3 greatCircleDistanceRads (haversine; reference
    src/Functions/h3PointDist.cpp over H3's latLngDistanceRads)."""
    p1 = F.radians(_c(lat1).cast("double"))
    l1 = F.radians(_c(lon1).cast("double"))
    p2 = F.radians(_c(lat2).cast("double"))
    l2 = F.radians(_c(lon2).cast("double"))
    sp = F.sin((p2 - p1) / 2)
    sl = F.sin((l2 - l1) / 2)
    a = sp * sp + F.cos(p1) * F.cos(p2) * sl * sl
    return 2 * F.asin(F.sqrt(a))


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# ------------------------------------------------- published constants

# Average hex edge length (km) per resolution — h3 v3 table; rendered
# values match the reference's 02165_h3_edge_length_km.reference.
EDGE_KM = [1107.712591, 418.6760055, 158.2446558, 59.81085794,
           22.6063794, 8.544408276, 3.229482772, 1.220629759,
           0.461354684, 0.174375668, 0.065907807, 0.024910561,
           0.009415526, 0.003559893, 0.001348575, 0.000509713]

# The meters table carries MORE digits than km*1000 (h3 v3 publishes
# both at their own precision; the reference's 01044 edge-angle
# expectation only reproduces from this one).
EDGE_M = [1107712.591, 418676.0055, 158244.6558, 59810.85794,
          22606.3794, 8544.408276, 3229.482772, 1220.629759,
          461.3546837, 174.3756681, 65.90780749, 24.9105614,
          9.415526211, 3.559893033, 1.348574562, 0.509713273]

# Average hex area (km^2) — matches 02160_h3_hex_area_Km2.reference.
AREA_KM2 = [4250546.848, 607220.9782, 86745.85403, 12392.26486,
            1770.323552, 252.9033645, 36.1290521, 5.1612932,
            0.7373276, 0.1053325, 0.0150475, 0.0021496, 0.0003071,
            0.0000439, 0.0000063, 0.0000009]

_EARTH_RADIUS_M = 6371007.180918475     # h3's authalic Earth radius

# 12 pentagon base cells (H3 spec)
PENTAGON_BASE_CELLS = [4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117]


def _table_lookup(table, res) -> Column:
    return F.element_at(F.array(*[F.lit(v) for v in table]),
                        _c(res).cast("int") + 1)


def h3EdgeLengthKm(res) -> Column:
    return _table_lookup(EDGE_KM, res)


def h3EdgeLengthM(res) -> Column:
    return _table_lookup(EDGE_M, res)


def h3HexAreaKm2(res) -> Column:
    return _table_lookup(AREA_KM2, res)


def h3HexAreaM2(res) -> Column:
    return _table_lookup([v * 1e6 for v in AREA_KM2], res)


def h3EdgeAngle(res) -> Column:
    """Average edge length in degrees: edgeLengthM * 180 / (pi * R)
    (the identity the reference asserts in 01044_h3_edge_angle.sql)."""
    import math
    return _table_lookup(
        [v * 180 / (math.pi * _EARTH_RADIUS_M) for v in EDGE_M], res)


def h3NumHexagons(res) -> Column:
    """Total cells at a resolution: 2 + 120 * 7^res (the two poles'
    pentagon deficit), exact in BIGINT."""
    r = _c(res).cast("int")
    return (F.lit(2) + F.lit(120)
            * F.pow(F.lit(7.0), r).cast("long")).cast("long")


# ------------------------------------------------- index bit layout

def h3GetResolution(h) -> Column:
    return F.shiftright(_c(h).cast("long"), 52) \
        .bitwiseAND(F.lit(0xF)).cast("int")


def h3GetBaseCell(h) -> Column:
    return F.shiftright(_c(h).cast("long"), 45) \
        .bitwiseAND(F.lit(0x7F)).cast("int")


def _digit(h: Column, d: int) -> Column:
    """Resolution digit d (1-based; digit 1 is bits 42-44)."""
    return F.shiftright(h, 45 - 3 * d).bitwiseAND(F.lit(7))


def h3IsValid(h) -> Column:
    """Full index validation (H3 spec): high bit 0, mode 1, reserved
    bits 0, base cell < 122, digits within resolution in 0..6, digits
    beyond resolution all 7, and on pentagon base cells the leading
    (first nonzero) digit is never 1 (the deleted K axis)."""
    v = _c(h).cast("long")
    res = F.shiftright(v, 52).bitwiseAND(F.lit(0xF))
    bc = F.shiftright(v, 45).bitwiseAND(F.lit(0x7F))
    ok = ((v > 0)
          & (F.shiftright(v, 59).bitwiseAND(F.lit(0xF)) == 1)  # mode
          & (F.shiftright(v, 56).bitwiseAND(F.lit(0x7)) == 0)  # reserved
          & (bc < 122))
    pent = bc.isin(PENTAGON_BASE_CELLS)
    bad_pent = F.lit(False)
    for d in range(1, 16):
        dig = _digit(v, d)
        in_range = F.lit(d) <= res
        ok = ok & F.when(in_range, dig != 7).otherwise(dig == 7)
        if d == 1:
            prefix_zero = F.lit(True)
        else:
            mask = (1 << (3 * (d - 1))) - 1
            prefix_zero = (F.shiftright(v, 45 - 3 * (d - 1))
                           .bitwiseAND(F.lit(mask)) == 0)
        bad_pent = bad_pent | (in_range & prefix_zero & (dig == 1))
    ok = ok & ~(pent & bad_pent)
    return F.coalesce(ok, F.lit(False)).cast("int")


def h3IsResClassIII(h) -> Column:
    return (h3GetResolution(h) % 2 == 1).cast("int")


def h3IsPentagon(h) -> Column:
    """A cell is a pentagon iff its base cell is one of the 12 pentagon
    base cells and every used digit is 0 (pentagon children stay
    pentagons only along the center axis)."""
    v = _c(h).cast("long")
    res = F.shiftright(v, 52).bitwiseAND(F.lit(0xF))
    bc = F.shiftright(v, 45).bitwiseAND(F.lit(0x7F))
    all_zero = F.lit(True)
    for d in range(1, 16):
        all_zero = all_zero & ((F.lit(d) > res) | (_digit(v, d) == 0))
    return (bc.isin(PENTAGON_BASE_CELLS) & all_zero).cast("int")


def h3ToString(h) -> Column:
    return F.lower(F.hex(_c(h).cast("long")))


def stringToH3(s) -> Column:
    """Hex parse; malformed input -> 0 (the reference contract)."""
    return F.coalesce(
        F.when(F.upper(_c(s)).rlike("^[0-9A-F]{1,16}$"),
               F.conv(_c(s), 16, 10).cast("long")),
        F.lit(0).cast("long"))


def h3GetRes0Indexes() -> Column:
    """All 122 resolution-0 indexes: mode 1, res 0, base cell b, all
    15 digits unused (7) — (1<<59) | (b<<45) | (2^45 - 1)."""
    return F.array(*[
        F.lit((1 << 59) | (b << 45) | ((1 << 45) - 1))
        for b in range(122)])


def h3GetPentagonIndexes(res) -> Column:
    """The 12 pentagon cells at a resolution: pentagon base cell with
    all used digits 0 and the rest unused (7)."""
    r = _c(res).cast("long")
    unused = F.pow(F.lit(8.0), F.lit(15) - r).cast("long") - 1
    return F.array(*[
        F.lit(1 << 59) + r * F.lit(1 << 52) + F.lit(b << 45) + unused
        for b in PENTAGON_BASE_CELLS])


H3_FUNCTIONS = {
    "h3EdgeLengthKm": h3EdgeLengthKm,
    "h3EdgeLengthM": h3EdgeLengthM,
    "h3HexAreaKm2": h3HexAreaKm2,
    "h3HexAreaM2": h3HexAreaM2,
    "h3EdgeAngle": h3EdgeAngle,
    "h3NumHexagons": h3NumHexagons,
    "h3GetResolution": h3GetResolution,
    "h3GetBaseCell": h3GetBaseCell,
    "h3PointDistRads": lambda lat1, lon1, lat2, lon2:
        _great_circle_rads(lat1, lon1, lat2, lon2),
    "h3PointDistKm": lambda lat1, lon1, lat2, lon2:
        _great_circle_rads(lat1, lon1, lat2, lon2) * 6371.007180918475,
    "h3PointDistM": lambda lat1, lon1, lat2, lon2:
        _great_circle_rads(lat1, lon1, lat2, lon2) * 6371007.180918475,
    "h3IsValid": h3IsValid,
    "h3IsResClassIII": h3IsResClassIII,
    "h3IsPentagon": h3IsPentagon,
    "h3ToString": h3ToString,
    "stringToH3": stringToH3,
    "h3GetRes0Indexes": h3GetRes0Indexes,
    "h3GetPentagonIndexes": h3GetPentagonIndexes,
}
