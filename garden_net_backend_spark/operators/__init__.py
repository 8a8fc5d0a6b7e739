from .interval import (  # noqa: F401
    interval_overlap_join,
    nearest_interval_join,
    overlap_aggregate,
    overlap_flag,
    range_query,
)
