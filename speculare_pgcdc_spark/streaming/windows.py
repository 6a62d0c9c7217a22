"""Event-time windowed aggregation + watermarking (T1-T4) and stateful
ops (T5/T7) as reusable stream transformations. Batch-mode twins of the
window forms are oracle-checked (queries/temporal.py); the streaming
semantics (late-data drop, state cleanup, emit-on-watermark) are behavior
tested in tests/test_streaming.py.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from speculare_pgcdc_spark.functions import money_sum


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """T1+T4: watermarked tumbling-window count/sum. In streaming mode
    rows later than (max event time - watermark) are dropped and window
    state is evicted once the watermark passes — the scale property that
    bounds state at 100 TB/day ingest."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return src.groupBy(
        F.window(F.col(ts_col), window).alias("w"), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("c"), money_sum("value", "s"))


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """T2: sliding windows (each row lands in window/slide buckets)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, "2 hours")
    return src.groupBy(
        F.window(F.col(ts_col), window, slide).alias("w"), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("c"))


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """T3: built-in session windows (merge-on-overlap)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, "2 hours")
    return src.groupBy(
        F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("n"))


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """T5: stateful dedup with bounded state — duplicates arriving within
    the watermark horizon are dropped; state evicts beyond it."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    upper_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join (the streaming twin of batch Q14):
    pairs (a, b) of the same key with a.ts < b.ts <= a.ts + upper.

    Both sides carry watermarks and the join condition bounds b.ts
    relative to a.ts, so Spark can evict buffered state once the
    watermark passes a row's join horizon — state is O(rows within the
    interval + watermark window) per key, not O(stream). Inputs must
    have columns (key, ts, event_id); sides are renamed internally."""
    l = (
        left.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("l_key"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("event_a"),
        )
    )
    r = (
        right.withWatermark("ts", watermark)
        .select(
            F.col(key).alias("r_key"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("event_b"),
        )
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (
            F.col("r_ts")
            <= F.col("l_ts") + F.expr(f"INTERVAL {upper_seconds} SECOND")
        )
    )
    return l.join(r, cond).select("event_a", "event_b")


#: output schema of running_counts
_RUNNING_SCHEMA = "user_id bigint, events bigint"
_STATE_SCHEMA = "events bigint"


def running_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """T7: arbitrary stateful op via applyInPandasWithState — a per-key
    running event counter (the reference's ServerState/ID_COUNTER shape:
    driver-free, partitioned, checkpointed state)."""

    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "events": [n]})

    return events.groupBy(F.col(key_col)).applyInPandasWithState(
        update,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts_tws(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """T7 on the MODERN stateful API: transformWithStateInPandas
    (Spark 4) — same per-key running counter as running_counts, but
    with typed value state on the RocksDB state store. This is the API
    a new deployment should prefer: composable state variables
    (value/list/map), timers, and state TTL replace the single
    state-tuple + timeout of applyInPandasWithState; semantics parity
    with running_counts is pinned in tests/test_streaming.py.

    Scale note: state lives per key in RocksDB with changelog
    checkpointing — bounded memory per executor regardless of key
    cardinality (the applyInPandasWithState HDFS-backed store holds
    the working set in heap). Requires
    spark.sql.streaming.stateStore.providerClass =
    RocksDBStateStoreProvider on the session, and the TWS driver
    worker needs the `google.protobuf` package (absent in this
    container — tests/test_streaming.py skips accordingly; on a real
    deployment both ship with the distribution)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "events": [n]})

        def close(self) -> None:
            pass

    return events.groupBy(F.col(key_col)).transformWithStateInPandas(
        statefulProcessor=Processor(),
        outputStructType=_RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def ohlc_bars_windowed(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming-capable OHLC candlestick bars per (series, window):
    open/close are selected by min_by/max_by over the TOTAL
    (ts, event_id) order — the aggregate-function formulation, because
    the batch form's row_number windows (queries q128) do not exist in
    streaming. Both formulations are pinned equal in
    tests/test_streaming.py; state per open window is one (open, high,
    low, close, n) tuple per (series, window) — O(series), evicted by
    the watermark, regardless of event volume."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    key = F.struct(F.col(ts_col), F.col("event_id"))
    return src.groupBy(
        F.window(F.col(ts_col), window).alias("w"), F.col(key_col)
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


_EWMA_OUT_SCHEMA = (
    "user_id bigint, ewma double, n_events bigint"
)
_EWMA_STATE_SCHEMA = "ewma double, n bigint"


def streaming_ewma(
    events: DataFrame,
    key_col: str = "user_id",
    alpha: float = 0.5,
) -> DataFrame:
    """T7 companion to the batch EWMA (queries q114): an UNBOUNDED
    exponentially weighted running mean per key via
    applyInPandasWithState — the formulation a stream needs, because
    the batch form's trailing window frame would require re-reading
    history every trigger. State per key is TWO numbers (current ewma,
    count) no matter how many events flow through — the O(1)-state
    contract that lets this run forever at any volume.

    Within a batch, rows must fold in event order; the caller's source
    must deliver per-key rows ordered (file feeds do; for out-of-order
    streams compose with dedup/watermark sorting upstream). Emits the
    post-batch (key, ewma, n) in update mode. Batch==stream parity vs
    a Python fold is pinned in tests/test_streaming.py."""

    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = 0.0, 0
        # concatenate BEFORE sorting: a key whose batch slice spans
        # multiple Arrow chunks (maxRecordsPerBatch) is not globally
        # ts-ordered across chunks, and EWMA is order-sensitive —
        # same contract as streaming_cusum below
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            ordered = whole.sort_values(["ts", "event_id"])
            for v in ordered["value"]:
                v = float(v)
                ewma = v if n == 0 else alpha * v + (1 - alpha) * ewma
                n += 1
        state.update((ewma, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "ewma": [round(ewma, 10)],
                "n_events": [n],
            }
        )

    return events.groupBy(F.col(key_col)).applyInPandasWithState(
        update,
        outputStructType=_EWMA_OUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def scd2_current(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming current-version view of the SCD Type-2 history
    (the E106/q153 batch build): the latest attribute per key via one
    max_by over a total (ts, event_id) order — works identically on a
    stream (complete/update-mode agg) and a batch frame.

    State is ONE (value, order-key) pair per entity regardless of how
    many changes flow through — the same O(1)-state contract as
    streaming_ewma/OHLC, and the streaming complement to q153: the
    batch build materializes the full interval history, the stream
    maintains its `is_current` slice forever without re-windowing.
    Parity (stream == batch == q153's current rows) is pinned in
    tests/test_streaming.py."""
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return events.groupBy(F.col(key_col)).agg(
        F.max_by("event_type", ordkey).alias("attr_value"),
        F.max("ts").alias("valid_from"),
    )


_CUSUM_STATE_SCHEMA = "c double, minc double, n bigint, alarmed boolean"


def streaming_cusum(
    events: DataFrame,
    target: float,
    threshold: float,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """T7 streaming CUSUM drift detector — the stateful twin of the
    batch q177 changepoint query, via the same closed form
    S_t = C_t - min_{j<=t}(C_j) with C the running sum of deviations
    from a KNOWN target (in a stream the reference level is a given,
    the textbook CUSUM setup; the batch form can estimate it because
    it sees all history). State per key is THREE numbers (cumsum,
    running min, count) forever — the O(1)-state contract — where a
    naive windowed recomputation would re-read the whole series every
    trigger.

    Within a batch, rows fold in (ts, event_id) order like
    streaming_ewma. Emits the post-batch (key, S, C, n, alarm) in
    update mode; `alarm` LATCHES in state: once S has exceeded
    `threshold` the key stays alarmed even if S later recedes —
    drift happened, and a monitor reading the latest row must see it.
    Stream == Python-fold parity is pinned in tests/test_streaming.py.
    """

    # output schema follows the ACTUAL key column (name + type) — a
    # hardcoded "event_type string" would mislabel or fail Arrow
    # conversion for any other key_col
    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, s_stat double, c double,"
        " n bigint, alarm boolean"
    )

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            c, minc, n, alarmed = state.get
        else:
            c, minc, n, alarmed = 0.0, 0.0, 0, False
        # concat BEFORE sorting: a key's microbatch arrives as Arrow
        # chunks (maxRecordsPerBatch); the running min / alarm latch
        # are order-SENSITIVE, so per-chunk sorting would fold a
        # >10k-event batch in the wrong order
        chunks = list(pdfs)
        batch = (
            pd.concat(chunks) if len(chunks) > 1
            else (chunks[0] if chunks else pd.DataFrame())
        )
        if len(batch):
            ordered = batch.sort_values(["ts", "event_id"])
            for v in ordered[value_col]:
                c += float(v) - target
                minc = min(minc, c)
                n += 1
                if c - minc > threshold:
                    alarmed = True  # latch: checked per event, not
                    # per batch, so a within-batch excursion that
                    # recedes before the batch ends still alarms
        state.update((c, minc, n, alarmed))
        s = c - minc
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "s_stat": [round(s, 10)],
                "c": [round(c, 10)],
                "n": [n],
                "alarm": [alarmed],
            }
        )

    return events.groupBy(F.col(key_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
