"""Operator lowerings: the time-series query surface (SURVEY §2.3-2.6)."""

from .asof import asof_join, lt_join, splice_join
from .intervals import in_interval, parse_interval_ranges, parse_interval_string
from .latest import latest_on
from .limits import limit_range, limit_signed
from .sample_by import bucket_col, sample_by
from .window_join import horizon_join, markout_agg, window_join

__all__ = [
    "asof_join", "lt_join", "splice_join", "in_interval",
    "parse_interval_ranges", "parse_interval_string", "latest_on",
    "limit_range", "limit_signed", "bucket_col", "sample_by",
    "horizon_join", "markout_agg", "window_join",
]
