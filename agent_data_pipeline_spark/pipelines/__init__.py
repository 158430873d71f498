"""Reference-parity pipelines (SURVEY.md §3): taxi ingest + transform."""

from .taxi import (
    clean_taxi_trips,
    ingest_csv,
    run_taxi_pipeline,
    smoke_check,
    taxi_summary,
    validate_nonempty,
)

__all__ = [
    "clean_taxi_trips",
    "ingest_csv",
    "run_taxi_pipeline",
    "smoke_check",
    "taxi_summary",
    "validate_nonempty",
]
