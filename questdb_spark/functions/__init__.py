"""Function library (SURVEY §2.8): finance, geohash, IPv4, arrays, UUID /
LONG256 / BINARY, DECIMAL256 emulation, TIMESTAMP_NANO, misc aggregates,
window extras."""

from .finance import ema, l2price, mid, spread_bps, twap, vwap
from .geohash import cast_str_to_geohash, geohash_encode, geohash_prefix, geohash_to_bits, geohash_to_long
from .uuid256 import (
    bin_from_hex, bin_to_hex, long256_add, long256_from, long256_from_long,
    long256_normalize, long256_to_boolean, long256_to_literal, long256_to_long,
    uuid_v4_from,
)
from .window_extras import vwema

__all__ = [
    "ema", "l2price", "mid", "spread_bps", "twap", "vwap",
    "cast_str_to_geohash", "geohash_encode", "geohash_prefix",
    "geohash_to_bits", "geohash_to_long",
    "bin_from_hex", "bin_to_hex", "long256_add", "long256_from",
    "long256_from_long", "long256_normalize", "long256_to_boolean",
    "long256_to_literal", "long256_to_long", "uuid_v4_from", "vwema",
]
