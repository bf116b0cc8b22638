"""Geohash encode/decode helpers.

Reference: QuestDB GEOBYTE/GEOSHORT/GEOINT/GEOLONG types (1-60 bit
geohashes, ``cairo/ColumnType.java:61-69``) and ``functions/geohash/``
(make_geohash, rnd_geohash). Spark-side: geohashes are base32 strings /
long bit values produced by pure column math (bit interleaving via an
unrolled fold — no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 8) -> Column:
    """lat/lon → base32 geohash string of the given precision (1-12 chars).

    Classic bit-interleave: even bits = longitude, odd bits = latitude.
    Unrolled at plan-build time into pure arithmetic (runs in codegen).
    """
    nbits = precision * 5
    # normalize to [0,1)
    latn = (lat + 90.0) / 180.0
    lonn = (lon + 180.0) / 360.0
    # bit i (from MSB): for lon bits, floor(lonn * 2^(k+1)) % 2 where k =
    # number of lon bits before it; same for lat.
    bits: list[Column] = []
    lon_k = 0
    lat_k = 0
    for i in range(nbits):
        if i % 2 == 0:
            lon_k += 1
            bits.append((F.floor(lonn * (2 ** lon_k)).cast("long") % 2))
        else:
            lat_k += 1
            bits.append((F.floor(latn * (2 ** lat_k)).cast("long") % 2))
    # pack and map each 5-bit group to base32
    chars = []
    for c in range(precision):
        v = F.lit(0)
        for j in range(5):
            v = v * 2 + bits[c * 5 + j]
        chars.append(F.lit(_B32).substr(v.cast("int") + F.lit(1), F.lit(1)))
    return F.concat(*chars)


def geohash_to_long(gh: Column) -> Column:
    """base32 geohash string → packed long (QuestDB GEOLONG bit value)."""
    pos = F.transform(
        F.split(gh, ""),
        lambda ch: F.when(ch != "", F.instr(F.lit(_B32), ch) - 1),
    )
    return F.aggregate(
        F.filter(pos, lambda p: p.isNotNull()),
        F.lit(0).cast("long"),
        lambda acc, p: acc * 32 + p,
    )


def geohash_prefix(gh: Column, chars: int) -> Column:
    """Truncate a geohash to a coarser precision (QuestDB cast
    geohash→geohash of fewer bits)."""
    return F.substring(gh, 1, chars)


def cast_str_to_geohash(col: Column, chars: int) -> Column:
    """``cast(str as geohash(Nc))`` (``CastStrToGeoHashFunctionFactory``):
    longer strings truncate to the target precision; strings shorter than
    the precision or containing non-base32 characters (geohash base32
    excludes a, i, l, o) yield NULL."""
    g = F.lower(F.substring(col, 1, chars))
    return F.when(g.rlike(f"^[{_B32}]{{{chars}}}$"), g)


def geohash_to_bits(gh: Column, bits: int) -> Column:
    """Geohash string → GEOLONG bit value truncated to ``bits`` (1-60) —
    the bit-granularity geohash cast (``ColumnType.java:61-69`` sizes
    geohash types in BITS, so ``geohash(27b)`` is legal and truncation
    lands mid-character)."""
    if not 1 <= bits <= 60:
        raise ValueError("geohash bits must be in [1, 60]")
    chars = (bits + 4) // 5
    full = geohash_to_long(geohash_prefix(gh, chars))
    return F.shiftright(full, chars * 5 - bits)
