

def test_asof_directions_and_tolerance(spark):
    """backward / forward / nearest semantics on a hand series, with
    the tolerance voiding far matches (left row survives with NULL)."""
    from pyspark.sql import functions as F

    from agent_data_pipeline_spark.ops.asof import asof_join

    left = spark.createDataFrame(
        [("k", 100, "L1"), ("k", 205, "L2"), ("k", 400, "L3")],
        "k string, ts long, tag string",
    )
    right = spark.createDataFrame(
        [("k", 90, "A"), ("k", 210, "B"), ("k", 1000, "C")],
        "k string, ts long, v string",
    )

    def run(direction, tolerance=None):
        out = asof_join(
            left, right, "k", "ts", "ts", ["v"],
            tolerance=tolerance, direction=direction,
        )
        return {r["tag"]: r["v"] for r in out.collect()}

    assert run("backward") == {"L1": "A", "L2": "A", "L3": "B"}
    assert run("forward") == {"L1": "B", "L2": "B", "L3": "C"}
    # nearest: L1 -> A (10 vs 110), L2 -> B (5 vs 115), L3 -> B (190 vs 600)
    assert run("nearest") == {"L1": "A", "L2": "B", "L3": "B"}
    # tolerance 50s: only L1's backward match (10s away) survives;
    # L2 (115s) and L3 (190s) void -> NULL
    assert run("backward", tolerance=50.0) == {"L1": "A", "L2": None, "L3": None}
    assert run("nearest", tolerance=8.0) == {"L1": None, "L2": "B", "L3": None}


def test_asof_nearest_tie_prefers_backward(spark):
    from agent_data_pipeline_spark.ops.asof import asof_join

    left = spark.createDataFrame([("k", 100, "L")], "k string, ts long, tag string")
    right = spark.createDataFrame(
        [("k", 90, "before"), ("k", 110, "after")], "k string, ts long, v string"
    )
    out = asof_join(left, right, "k", "ts", "ts", ["v"], direction="nearest")
    assert out.collect()[0]["v"] == "before"


def test_asof_simultaneous_right_matches_both_directions(spark):
    """A right row at exactly the left timestamp matches under backward
    AND forward (<= / >= contracts)."""
    from agent_data_pipeline_spark.ops.asof import asof_join

    left = spark.createDataFrame([("k", 100, "L")], "k string, ts long, tag string")
    right = spark.createDataFrame([("k", 100, "same")], "k string, ts long, v string")
    for d in ("backward", "forward", "nearest"):
        out = asof_join(left, right, "k", "ts", "ts", ["v"], direction=d)
        assert out.collect()[0]["v"] == "same", d
