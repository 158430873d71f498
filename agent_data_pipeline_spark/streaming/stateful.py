"""Custom stateful streaming operators via ``applyInPandasWithState``.

SURVEY.md §2.B (streaming row) declares "stateful running aggregates"
and the north-star calls for custom stateful operators beyond what
``groupBy().agg()`` can express. The reference has no analog (its only
stream is NiFi's file queue, dags/pipeline_orchestrator.py:59-86) — this
is the Spark-native extension point: per-key arbitrary state, updated
once per micro-batch, with Arrow-batched pandas on the hot path.

Scale design:
  * state lives in the executor state store partitioned by key — the
    driver never sees it; key cardinality, not event volume, bounds
    state size.
  * per-key state here is O(1) (count/sum/min/max), so 10^9 keys is
    ~tens of GB across a cluster — fine at 100 TB/day event volume.
  * an optional processing-time timeout evicts idle keys, the knob that
    keeps unbounded-cardinality streams (e.g. session tokens) from
    accreting dead state forever.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_AGG_FIELDS = [
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("min_value", T.DoubleType()),
    T.StructField("max_value", T.DoubleType()),
]

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("mn", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def stateful_running_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key running count/sum/min/max maintained in the state store.

    Each micro-batch emits ONE row per touched key carrying the
    cumulative aggregate over every batch seen so far — the incremental
    shape of ``groupBy(keys).agg(...)``; after the source drains, the
    latest row per key equals the batch aggregate (asserted in
    tests/test_streaming.py).

    Output mode is "update": pair with a sink that upserts (or the
    memory sink in tests, reduced by max ``n_events`` — the counter is
    strictly increasing, so the max row per key IS the latest).

    Idle-key eviction, and why it is absent here (both verified with
    minimal repros in this environment):
      * ``GroupStateTimeout.ProcessingTimeTimeout`` crashes the Arrow
        worker protocol in PySpark 4.1.2 — the timeout MODE alone kills
        the Python worker (EOF mid-stream), with or without a
        ``setTimeoutDuration`` call — so this operator runs NoTimeout.
      * the successor API with native state TTL,
        ``transformWithStateInPandas`` (Spark 4.0+), requires
        ``google.protobuf`` for its driver-worker channel, which this
        container lacks. ``running_agg_tws`` below is the same operator
        on that API, import-gated so it activates where protobuf exists.
    On an unbounded-cardinality production stream, bound state by keying
    on a time-bucketed composite (key, date_trunc(day, ts)) so old
    groups go cold and the job can be restarted on a trimmed checkpoint.
    """
    key_fields = [df.schema[k] for k in keys]
    out_schema = T.StructType(list(key_fields) + _AGG_FIELDS)
    key_names = list(keys)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, mn, mx = state.get
        else:
            n, s, mn, mx = 0, 0.0, None, None
        for pdf in pdfs:
            n += len(pdf)
            v = pdf[value_col].astype("float64").dropna()
            if len(v):
                s += float(v.sum())
                bmn, bmx = float(v.min()), float(v.max())
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
        state.update((n, s, mn, mx))
        row = dict(zip(key_names, key))
        row.update(n_events=n, sum_value=s, min_value=mn, max_value=mx)
        yield pd.DataFrame([row])

    return df.groupBy(*keys).applyInPandasWithState(
        update, out_schema, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def running_agg_tws(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """`stateful_running_agg` on the Spark 4 ``transformWithStateInPandas``
    API: value state with native TTL (``ttl_ms``) evicts idle keys — the
    production answer to unbounded key cardinality.

    ENVIRONMENT-GATED: requires ``google.protobuf`` (the TWS
    driver-worker channel) and the RocksDB state store provider; this
    container has neither protobuf nor a way to install it, so the repro
    in this repo's CI stops at the import guard. The processor logic
    below is the direct translation of ``stateful_running_agg`` and runs
    wherever standard ``pyspark[connect]``-style deps are present.
    """
    try:
        import google.protobuf  # noqa: F401  (TWS channel dependency)
    except ImportError as e:  # pragma: no cover - absent in container
        raise NotImplementedError(
            "transformWithStateInPandas needs google.protobuf, which is "
            "not installed in this environment; use stateful_running_agg"
        ) from e

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    key_fields = [df.schema[k] for k in keys]
    out_schema = T.StructType(list(key_fields) + _AGG_FIELDS)
    key_names = list(keys)

    class _Running(StatefulProcessor):  # pragma: no cover - see gate
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("agg", _STATE_SCHEMA, ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            got = self._st.get()
            n, s, mn, mx = got if got is not None else (0, 0.0, None, None)
            for pdf in rows:
                n += len(pdf)
                v = pdf[value_col].astype("float64").dropna()
                if len(v):
                    s += float(v.sum())
                    bmn, bmx = float(v.min()), float(v.max())
                    mn = bmn if mn is None else min(mn, bmn)
                    mx = bmx if mx is None else max(mx, bmx)
            self._st.update((n, s, mn, mx))
            row = dict(zip(key_names, key))
            row.update(n_events=n, sum_value=s, min_value=mn, max_value=mx)
            yield pd.DataFrame([row])

        def close(self) -> None:
            pass

    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=_Running(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
