#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion through the `noop` sink — every column
is materialized (a bare count() would let Catalyst prune the projections
and undercount the work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from agent_data_pipeline_spark.fns import release_persists
from agent_data_pipeline_spark.hostinfo import cpu_probe, host_load
from agent_data_pipeline_spark.queries import REGISTRY
from agent_data_pipeline_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "brand_revenue",
    "left_join_counts",
    "range_join_60d",
    "top3_orders_per_customer",
    "moving_avg",
    "running_total",
    "filter_kit",
    "events_cleaned",
    "conditional_scalars",
    "json_extract_agg",
    "tumbling_hourly",
    "session_windows",
    "asof_purchases",
    "hypertable_rollup",
    "gapfill_interpolate",
    "exact_dedup",
    "training_data_prep",
    "decontaminate_ngrams",
    "repetition_stats",
    "pii_scrub",
    "global_shuffle_shards",
    "text_stats",
    "vocab_top20",
    "tfidf_top_terms",
    "jaccard_pairs",
    "neardup_dedup_summary",
    "minhash_lsh_pairs",
    "salted_agg_by_flag",
    "vector_centroids",
    "frame_sample_manifest",
    "embedding_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "grouped_zscore",
    "udf_kit",
    "stream_tumbling_hourly",
    # round 2 additions
    "nation_trade_flows",
    "bucketed_join_agg",
    "partition_prune_agg",
    "arrow_udf_kit",
    "higher_order_kit",
    "gopher_filters",
    "embedding_quantize",
    "variant_kit",
    "recursive_cte_months",
    "exists_subquery",
    "dynamic_gap_sessions",
    "salted_join_counts",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # host-load snapshot BEFORE any Spark work: /proc/loadavg is kernel-wide
    # on this shared box, so it records co-tenant contention the artifact
    # previously couldn't prove (round-11 verdict item #1). A second
    # snapshot lands after the timed passes.
    load_start = host_load()
    # absolute single-core speed calibration (round-13: in-container
    # loadavg can read ~0 while the HOST runs ~30% slow — this pins it)
    cpu = cpu_probe()
    spark = get_spark(app_name="agent_data_pipeline_spark-bench")

    # Warm up the JVM (codegen, parquet reader, Arrow) and prime file
    # footers so timings measure steady-state query cost, not first-call
    # JIT — standard benchmark hygiene.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for tbl in ("lineitem", "orders", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").limit(1).collect()

    # min of 3 runs per query, taken over 3 INTERLEAVED round-robin passes
    # (run every query once, then again, then again) rather than 3
    # back-to-back runs in a fixed order. Rationale: the hosting machine
    # shows bursty background load, and with back-to-back runs a burst that
    # overlaps a query's slot poisons all its samples at once — r2 showed
    # exactly that signature (the first two queries in the fixed order
    # regressed 2-3x with unchanged plans). Interleaving separates
    # machine-state noise from plan changes; min-of-N (hyperfine et al.) is
    # standard for isolating steady-state cost. Per-pass order is rotated
    # so no query always runs first.
    # Each sample is split into (plan, exec): `plan` is driver-side
    # DataFrame construction (py4j column building, any eager probes the
    # query performs), `exec` is the noop-sink materialization. The
    # round-4 adjudication of training_data_prep showed ~35-40% of its
    # timed cost was plan construction — reporting both makes executor
    # regressions attributable in one read. `queries` stays the
    # plan+exec total (back-compat with earlier BENCH_r*.json).
    samples: dict[str, list[tuple[float, float]]] = {name: [] for name in HEADLINE}
    n_passes = 3
    # per-pass load samples: a co-tenant burst in the middle of the run is
    # invisible at the endpoints — sampling after each pass bounds when it
    # happened (round-11 verdict item #1, falsifiable bench)
    load_passes: list[dict] = []
    for p in range(n_passes):
        shift = (p * len(HEADLINE)) // n_passes
        order = HEADLINE[shift:] + HEADLINE[:shift]
        for name in order:
            spec = REGISTRY[name]
            start = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            mid = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples[name].append((mid - start, time.perf_counter() - mid))
        load_passes.append(host_load())
    # Release AFTER all passes, not between queries: cross-pass cache
    # reuse for the persisting queries (hypertable_rollup,
    # gapfill_interpolate) has been the measurement semantics since
    # round 1 — releasing mid-run would shift their numbers for
    # methodology reasons, not plan reasons. End-of-run release still
    # caps session accumulation (ADVICE r9).
    release_persists()
    load_end = host_load()
    timings = {
        name: round(min(pl + ex for pl, ex in ts), 3)
        for name, ts in samples.items()
    }
    plan_timings = {
        name: round(min(pl for pl, _ in ts), 3) for name, ts in samples.items()
    }
    exec_timings = {
        name: round(min(ex for _, ex in ts), 3) for name, ts in samples.items()
    }

    total = round(sum(timings.values()), 3)
    plan_total = round(sum(plan_timings.values()), 3)
    exec_total = round(sum(exec_timings.values()), 3)

    # The driver captures only the last ~2,000 chars of stdout; round 5's
    # 5 KB line (per-query plan/exec splits inline) overflowed it and left
    # BENCH_r05.json with parsed:null. The full per-query plan/exec split
    # now goes to a committed detail file, and the FINAL printed line is a
    # compact JSON (per-query totals at 2 decimals) guaranteed < 1,800
    # bytes so the driver's tail capture always parses it.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(
                {
                    "metric": "headline_queries_total",
                    "value": total,
                    "plan_total": plan_total,
                    "exec_total": exec_total,
                    "unit": "sec",
                    "queries": timings,
                    "plan_queries": plan_timings,
                    "exec_queries": exec_timings,
                    "sf": sf,
                    "runs_per_query": n_passes,
                    "policy": "min_interleaved",
                    "load_start": load_start,
                    "load_end": load_end,
                    "load_passes": load_passes,
                    "cpu_probe": cpu,
                },
                fh,
                indent=1,
            )
            fh.write("\n")
    except OSError:
        pass  # detail file is best-effort; the stdout line is the contract

    # compact load form for the size-bounded stdout line:
    # [load1, load5, load15, visible_busy_co_tenant_procs]
    load_compact = {
        "start": [
            load_start["load1"],
            load_start["load5"],
            load_start["load15"],
            load_start["visible_busy_procs"],
        ],
        "end": [
            load_end["load1"],
            load_end["load5"],
            load_end["load15"],
            load_end["visible_busy_procs"],
        ],
    }
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "plan_total": plan_total,
            "exec_total": exec_total,
            "sf": sf,
            "runs_per_query": n_passes,
            "policy": "min_interleaved",
            "load": load_compact,
            "cpu": cpu,
            "queries": {k: round(v, 2) for k, v in timings.items()},
        },
        separators=(",", ":"),
    )
    if len(line) > 1800:  # hard guard: never overflow the driver tail again
        line = json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "plan_total": plan_total,
                "exec_total": exec_total,
                "sf": sf,
                "runs_per_query": n_passes,
                "policy": "min_interleaved",
                "load": load_compact,
                "cpu": cpu,
            },
            separators=(",", ":"),
        )
    print(line)


if __name__ == "__main__":
    main()
