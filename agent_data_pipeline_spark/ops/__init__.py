from .asof import asof_join
from .graph import pagerank
from .merge import scd2_apply, upsert
from .sessionize import sessionize
from .skew import salted_agg, salted_join
from .timeseries import (
    bucket_agg,
    ewma,
    gap_fill,
    hypertable_rollup,
    interpolate_linear,
    locf,
    time_bucket,
)

__all__ = [
    "asof_join",
    "pagerank",
    "upsert",
    "scd2_apply",
    "sessionize",
    "salted_agg",
    "salted_join",
    "bucket_agg",
    "ewma",
    "gap_fill",
    "hypertable_rollup",
    "interpolate_linear",
    "locf",
    "time_bucket",
]
