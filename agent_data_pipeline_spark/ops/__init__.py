from .asof import asof_join
from .expectations import profile_table, run_expectations
from .graph import pagerank, triangle_count
from .merge import (
    merge_partial_aggs,
    point_in_time_join,
    scd2_apply,
    snapshot_diff,
    upsert,
)
from .observe import observed, write_parquet_validated
from .sessionize import sessionize
from .skew import salted_agg, salted_join, skew_report
from .timeseries import (
    bucket_agg,
    counter_deltas,
    ewma,
    gap_fill,
    hypertable_rollup,
    interpolate_linear,
    locf,
    time_bucket,
    time_weighted_avg,
)

__all__ = [
    "asof_join",
    "run_expectations",
    "profile_table",
    "pagerank",
    "triangle_count",
    "upsert",
    "scd2_apply",
    "snapshot_diff",
    "point_in_time_join",
    "merge_partial_aggs",
    "observed",
    "write_parquet_validated",
    "sessionize",
    "salted_agg",
    "salted_join",
    "skew_report",
    "bucket_agg",
    "counter_deltas",
    "ewma",
    "gap_fill",
    "hypertable_rollup",
    "interpolate_linear",
    "locf",
    "time_bucket",
    "time_weighted_avg",
]
