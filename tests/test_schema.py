"""Schema subsystem tests (SURVEY.md §1.3, D1-D4): sampled inference,
5-type vocabulary, sanitation, zone inference, additive-only evolution."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from agent_data_pipeline_spark.schema import (
    diff_schemas,
    ensure_table,
    evolve_ddl,
    existing_columns,
    infer_csv_schema,
    run_ddl,
    sanitize_identifier,
    to_five_type,
    zone_from_path,
)

CSV_V1 = (
    "trip_id,fare-amount,pickup time,is_shared,note\n"
    "1,12.5,2025-01-01 08:00:00,true,hello\n"
    "2,7.25,2025-01-01 09:30:00,false,world\n"
)
# v2 adds a column (additive evolution trigger) and changes nothing else.
CSV_V2 = (
    "trip_id,fare-amount,pickup time,is_shared,note,congestion_fee\n"
    "3,9.0,2025-01-02 10:00:00,true,again,2.5\n"
)


@pytest.fixture
def csv_v1(tmp_path):
    p = tmp_path / "raw" / "trips_v1.csv"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(CSV_V1)
    return str(p)


@pytest.fixture
def csv_v2(tmp_path):
    p = tmp_path / "raw" / "trips_v2.csv"
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(CSV_V2)
    return str(p)


def test_sanitize_identifier():
    assert sanitize_identifier("fare-amount") == "fare_amount"
    assert sanitize_identifier("pickup time") == "pickup_time"
    assert sanitize_identifier("2col") == "_2col"
    assert sanitize_identifier("ok_name") == "ok_name"


def test_to_five_type_vocabulary():
    assert to_five_type(T.IntegerType()) == T.LongType()
    assert to_five_type(T.DecimalType(10, 2)) == T.DoubleType()
    assert to_five_type(T.DateType()) == T.TimestampType()
    assert to_five_type(T.BooleanType()) == T.BooleanType()
    assert to_five_type(T.ArrayType(T.IntegerType())) == T.StringType()


def test_zone_from_path():
    assert zone_from_path("/data/raw/trips.csv") == "raw"
    assert zone_from_path("/data/analytics/out.csv") == "analytics"
    assert zone_from_path("/data/staging/x.csv") == "staging"
    assert zone_from_path("/somewhere/else.csv") == "raw"


def test_infer_csv_schema_five_types(spark, csv_v1):
    schema = infer_csv_schema(spark, csv_v1)
    got = {f.name: f.dataType for f in schema.fields}
    assert got == {
        "trip_id": T.LongType(),
        "fare_amount": T.DoubleType(),
        "pickup_time": T.TimestampType(),
        "is_shared": T.BooleanType(),
        "note": T.StringType(),
    }


def test_infer_respects_sample_bound(spark, tmp_path):
    # rows past the sample window must not influence the inferred type:
    # first 100 rows are ints, row 101 is a string.
    p = tmp_path / "mixed.csv"
    lines = ["v"] + [str(i) for i in range(100)] + ["not-a-number"]
    p.write_text("\n".join(lines) + "\n")
    schema = infer_csv_schema(spark, str(p), sample_rows=100)
    assert schema.fields[0].dataType == T.LongType()


def test_diff_is_case_insensitive_and_additive():
    existing = {"trip_id": "bigint", "fare_amount": "double"}
    inferred = T.StructType(
        [
            T.StructField("TRIP_ID", T.LongType()),  # case-only diff: ignored
            T.StructField("fare_amount", T.DoubleType()),
            T.StructField("tip_amount", T.DoubleType()),  # genuinely new
        ]
    )
    missing = diff_schemas(existing, inferred)
    assert [f.name for f in missing] == ["tip_amount"]


def test_ensure_table_creates_then_evolves(spark, csv_v1, csv_v2):
    plan1 = ensure_table(spark, csv_v1, "trips_evolve_t")
    assert plan1.zone == "raw"  # inferred from the path segment
    assert plan1.created_table
    cols1 = existing_columns(spark, plan1.qualified)
    assert set(cols1) == {"trip_id", "fare_amount", "pickup_time", "is_shared", "note"}

    # re-running on the same file is a no-op (idempotent)
    plan_again = ensure_table(spark, csv_v1, "trips_evolve_t")
    assert not plan_again.created_table and plan_again.added_columns == []

    # v2 adds exactly one column; nothing dropped or renamed
    plan2 = ensure_table(spark, csv_v2, "trips_evolve_t")
    assert not plan2.created_table
    assert plan2.added_columns == ["congestion_fee"]
    cols2 = existing_columns(spark, plan2.qualified)
    assert set(cols2) == set(cols1) | {"congestion_fee"}
    spark.sql("DROP TABLE IF EXISTS raw.trips_evolve_t")


def test_evolve_ddl_statements_shape(spark, csv_v1):
    inferred = infer_csv_schema(spark, csv_v1)
    plan = evolve_ddl(spark, inferred, "analytics.trips_ddl_shape")
    assert plan.statements[0] == "CREATE DATABASE IF NOT EXISTS analytics"
    assert plan.statements[1].startswith(
        "CREATE TABLE IF NOT EXISTS analytics.trips_ddl_shape ("
    )
    # D4: executing then re-planning yields no ALTERs
    run_ddl(spark, plan.statements)
    plan2 = evolve_ddl(spark, inferred, "analytics.trips_ddl_shape")
    assert len(plan2.statements) == 1  # just the CREATE DATABASE IF NOT EXISTS
    spark.sql("DROP TABLE IF EXISTS analytics.trips_ddl_shape")
