"""Streaming behavior tests (SURVEY §5.3) — the Oracle=N semantics:
stream==batch parity, at-least-once restart from checkpoint, watermark
late-data drop, stateful dedup, arbitrary state, per-subscriber fan-out.

All tests drive real StreamingQuery instances over file sources with
explicit batch boundaries (write file -> processAllAvailable), so
results are deterministic.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

import pytest
from pyspark.sql import functions as F

from speculare_pgcdc_spark.cdc.feedgen import (
    FEED_TABLES,
    lookup_df,
    write_feed,
)
from speculare_pgcdc_spark.cdc.pipeline import (
    normalize_hypertables,
    parse_wal2json,
    route,
    subscriptions_df,
)
from speculare_pgcdc_spark.streaming.source import file_change_feed
from speculare_pgcdc_spark.streaming.windows import (
    dedup_within_watermark,
    running_counts,
    sliding_counts,
    tumbling_counts,
)

pytestmark = pytest.mark.streaming


def _write_jsonl(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


EVENT_SCHEMA = "ts timestamp, user_id bigint, event_id bigint"


def _event(ts: str, user: int, eid: int) -> dict:
    return {"ts": ts, "user_id": user, "event_id": eid}


# ---------------------------------------------------------------------------


def test_stream_pipeline_matches_batch(spark, sf_dir, tmp_path):
    feed_dir = str(tmp_path / "feed")
    write_feed(spark, sf_dir, feed_dir, num_files=4)

    batch = parse_wal2json(
        spark.read.text(feed_dir).withColumnRenamed("value", "payload")
    )
    expected = batch.count()

    stream = parse_wal2json(
        file_change_feed(spark, feed_dir, max_files_per_trigger=2)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT COUNT(*) n FROM t_parity").first().n
    assert got == expected and expected > 0


def test_fanout_routing_and_outbox(spark, sf_dir, tmp_path):
    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "outbox")
    write_feed(spark, sf_dir, feed_dir, num_files=2)
    subs = subscriptions_df(
        spark,
        [
            (1, "insert,update:events_a:event_type.in.click,view"),
            (2, "*:events_b"),
        ],
        FEED_TABLES,
    )
    lookup = lookup_df(spark)

    from speculare_pgcdc_spark.streaming.fanout import (
        outbox_deliver,
        start_fanout_query,
    )

    stream = normalize_hypertables(
        parse_wal2json(file_change_feed(spark, feed_dir)), lookup
    )
    q = start_fanout_query(
        stream, subs, outbox_deliver(out_dir), str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # expected per-sub counts from the batch path
    batch = normalize_hypertables(
        parse_wal2json(
            spark.read.text(feed_dir).withColumnRenamed("value", "payload")
        ),
        lookup,
    )
    expected = {
        r.sub_id: r.n
        for r in route(batch, subs)
        .groupBy("sub_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert expected, "routing should match some subscribers"
    for sub_id, n in expected.items():
        with open(os.path.join(out_dir, str(sub_id), "outbox.jsonl")) as f:
            lines = [ln for ln in f if ln.strip()]
        assert len(lines) == n
        # delivered payloads are the change objects themselves
        assert all("kind" in json.loads(ln) for ln in lines[:5])


def test_restart_from_checkpoint_no_loss(spark, sf_dir, tmp_path):
    """The at-least-once contract (replication.rs:198-203 analog):
    stop mid-stream, restart from the same checkpoint, nothing is lost
    and nothing already-committed is re-delivered to the memory sink."""
    feed_dir = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)

    _write_jsonl(
        f"{feed_dir}/f1.json",
        [{"payload": None}],  # placeholder replaced below
    )
    # use simple event rows rather than CDC payloads for clarity
    os.remove(f"{feed_dir}/f1.json")
    _write_jsonl(
        f"{feed_dir}/f1.json",
        [
            _event("2024-01-01 00:00:00", 1, 1),
            _event("2024-01-01 00:01:00", 1, 2),
        ],
    )

    out_dir = str(tmp_path / "out")

    def start():
        src = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(feed_dir)
        )
        return (
            src.writeStream.format("json")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = sorted(
        r.event_id
        for r in spark.read.schema(EVENT_SCHEMA).json(out_dir).collect()
    )
    assert first == [1, 2]

    # new data arrives while the query is down
    _write_jsonl(
        f"{feed_dir}/f2.json",
        [
            _event("2024-01-01 00:02:00", 1, 3),
            _event("2024-01-01 00:03:00", 2, 4),
        ],
    )
    q = start()  # restart from the same checkpoint
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        r.event_id
        for r in spark.read.schema(EVENT_SCHEMA).json(out_dir).collect()
    )
    # file sink + commit log: every event exactly once across the restart
    # (no loss, no duplicates — the checkpoint carried the offsets)
    assert rows == [1, 2, 3, 4]


def test_watermark_drops_late_data(spark, tmp_path):
    """T4: a row older than (max event time - watermark) arriving in a
    later batch must not extend any window (withWatermark + append)."""
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)

    src = (
        spark.readStream.schema(EVENT_SCHEMA + ", value double")
        .option("maxFilesPerTrigger", 1)
        .json(feed_dir)
    )
    agg = (
        src.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def ev(ts, eid):
        return {"ts": ts, "user_id": 1, "event_id": eid, "value": 1.0}

    try:
        # batch 1: two rows in window [00:00, 01:00) + one far-future row
        # that advances the watermark beyond that window
        _write_jsonl(
            f"{feed_dir}/f1.json",
            [
                ev("2024-01-01 00:10:00", 1),
                ev("2024-01-01 00:20:00", 2),
                ev("2024-01-01 05:00:00", 3),
            ],
        )
        q.processAllAvailable()
        # batch 2: anything (forces window finalization under the
        # advanced watermark)
        _write_jsonl(f"{feed_dir}/f2.json", [ev("2024-01-01 05:10:00", 4)])
        q.processAllAvailable()
        closed = {
            (r.w.start.isoformat(), r.c)
            for r in spark.sql("SELECT * FROM t_late").collect()
        }
        assert ("2024-01-01T00:00:00", 2) in closed

        # batch 3: LATE row for the closed window -> must be dropped
        _write_jsonl(f"{feed_dir}/f3.json", [ev("2024-01-01 00:30:00", 5)])
        q.processAllAvailable()
        # batch 4: advance again; closed window must NOT be re-emitted
        # with c=3
        _write_jsonl(f"{feed_dir}/f4.json", [ev("2024-01-01 06:10:00", 6)])
        q.processAllAvailable()
        final = {
            (r.w.start.isoformat(), r.c)
            for r in spark.sql("SELECT * FROM t_late").collect()
        }
        assert ("2024-01-01T00:00:00", 2) in final
        assert ("2024-01-01T00:00:00", 3) not in final
    finally:
        q.stop()


def test_dedup_within_watermark(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(feed_dir)
    )
    deduped = dedup_within_watermark(src, ["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _write_jsonl(
            f"{feed_dir}/f1.json",
            [
                _event("2024-01-01 00:00:00", 1, 100),
                _event("2024-01-01 00:05:00", 1, 100),  # same-batch dup
            ],
        )
        q.processAllAvailable()
        _write_jsonl(
            f"{feed_dir}/f2.json",
            [_event("2024-01-01 00:10:00", 1, 100)],  # within-watermark dup
        )
        q.processAllAvailable()
        n = spark.sql(
            "SELECT COUNT(*) n FROM t_dedup WHERE event_id = 100"
        ).first().n
        assert n == 1
    finally:
        q.stop()


def test_apply_in_pandas_with_state_running_count(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(feed_dir)
    )
    counted = running_counts(src)
    q = (
        counted.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _write_jsonl(
            f"{feed_dir}/f1.json",
            [
                _event("2024-01-01 00:00:00", 7, 1),
                _event("2024-01-01 00:01:00", 7, 2),
                _event("2024-01-01 00:02:00", 8, 3),
            ],
        )
        q.processAllAvailable()
        _write_jsonl(
            f"{feed_dir}/f2.json",
            [_event("2024-01-01 00:03:00", 7, 4)],
        )
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, MAX(events) e FROM t_state GROUP BY user_id"
        ).collect()
        got = {r.user_id: r.e for r in rows}
        # state persisted across microbatches: user 7 reached 3 total
        assert got == {7: 3, 8: 1}
    finally:
        q.stop()


def test_streaming_tumbling_window_matches_batch(spark, sf_dir, tmp_path):
    """T1/T6 stream-batch parity: the same tumbling aggregate over the
    events fixture streamed file-by-file equals the batch result."""
    from speculare_pgcdc_spark.catalog import table as t

    events = t(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    )
    stream_dir = str(tmp_path / "events_stream")
    events.coalesce(4).write.mode("overwrite").parquet(stream_dir)

    src = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    agg = tumbling_counts(src, watermark="100 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_tumble")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.w.start, r.event_type): (r.c, r.s)
            for r in spark.sql("SELECT * FROM t_tumble").collect()
        }
    finally:
        q.stop()
    batch = tumbling_counts(events)
    expected = {
        (r.w.start, r.event_type): (r.c, r.s) for r in batch.collect()
    }
    assert got == expected


def test_streaming_sliding_window_matches_batch(spark, sf_dir, tmp_path):
    """T2 stream-batch parity for overlapping windows (1h size / 30min
    slide): every row lands in exactly 2 windows in both modes."""
    from speculare_pgcdc_spark.catalog import table as t

    events = t(spark, sf_dir, "events").select("ts", "event_type")
    stream_dir = str(tmp_path / "events_stream")
    events.coalesce(4).write.mode("overwrite").parquet(stream_dir)

    src = (
        spark.readStream.schema("ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    agg = sliding_counts(src)
    q = (
        agg.writeStream.format("memory")
        .queryName("t_slide")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.w.start, r.event_type): r.c
            for r in spark.sql("SELECT * FROM t_slide").collect()
        }
    finally:
        q.stop()
    expected = {
        (r.w.start, r.event_type): r.c
        for r in sliding_counts(events).collect()
    }
    assert got == expected
    # overlap invariant: total window memberships == 2x row count
    assert sum(got.values()) == 2 * events.count()


def _wal2json_line(kind: str, tbl: str, names: list, values: list) -> dict:
    return {
        "change": [
            {
                "kind": kind,
                "table": tbl,
                "columnnames": names,
                "columnvalues": values,
            }
        ]
    }


def test_subscription_update_across_restart(spark, tmp_path):
    """R17 analog: the subscription registry is the static side of the
    routing join; adding a subscriber means restarting the query from
    the same checkpoint with the rebuilt broadcast side. Committed
    offsets are not reprocessed, so the new subscriber sees only events
    after its registration — exactly the reference's connect semantics
    (ws_connected, api/ws_handler.rs:79-143)."""
    from speculare_pgcdc_spark.streaming.fanout import (
        outbox_deliver,
        start_fanout_query,
    )

    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)

    def payload_file(path, msgs):
        with open(path, "w") as f:
            for m in msgs:
                f.write(json.dumps(m) + "\n")

    payload_file(
        f"{feed_dir}/f1.json",
        [
            _wal2json_line("insert", "events_a", ["id"], [1]),
            _wal2json_line("insert", "events_a", ["id"], [2]),
        ],
    )

    def run(subs_spec):
        subs = subscriptions_df(spark, subs_spec, FEED_TABLES)
        stream = normalize_hypertables(
            parse_wal2json(file_change_feed(spark, feed_dir)),
            lookup_df(spark),
        )
        q = start_fanout_query(stream, subs, outbox_deliver(out_dir), ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run([(1, "insert:events_a")])

    # subscriber 2 registers while the query is down; new events arrive
    payload_file(
        f"{feed_dir}/f2.json",
        [_wal2json_line("insert", "events_a", ["id"], [3])],
    )
    run([(1, "insert:events_a"), (2, "*:events_a")])

    def outbox_lines(sub_id):
        p = os.path.join(out_dir, str(sub_id), "outbox.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [ln for ln in f if ln.strip()]

    # sub 1 saw every event exactly once across the restart
    assert len(outbox_lines(1)) == 3
    # sub 2 only saw events after registration (committed offsets are
    # not replayed to it)
    assert len(outbox_lines(2)) == 1


def test_subscription_applies_mid_stream(spark, tmp_path):
    """Live-registry semantics (api/ws_handler.rs:79-143): the routing
    side is re-read per microbatch, so a subscribe()/unsubscribe() on a
    RUNNING watch() applies on the next batch — no restart. Subscriber 2
    registers mid-stream and sees only post-registration events;
    subscriber 1 is unsubscribed mid-stream and misses the tail."""
    from speculare_pgcdc_spark.engine import Engine

    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)

    def payload_file(name, msgs):
        with open(os.path.join(feed_dir, name), "w") as f:
            for m in msgs:
                f.write(json.dumps(m) + "\n")

    eng = Engine(spark=spark, tables=FEED_TABLES)
    eng.subscribe(1, "insert:events_a")
    payload_file(
        "f1.json",
        [
            _wal2json_line("insert", "events_a", ["id"], [1]),
            _wal2json_line("insert", "events_a", ["id"], [2]),
        ],
    )
    q = eng.watch(feed_dir, out_dir, ckpt, lookup=lookup_df(spark))
    try:
        q.processAllAvailable()

        # registry changes on the LIVE query: 2 joins, 1 leaves
        eng.subscribe(2, "*:events_a")
        eng.unsubscribe(1)
        payload_file(
            "f2.json",
            [_wal2json_line("insert", "events_a", ["id"], [3])],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    def outbox_lines(sub_id):
        p = os.path.join(out_dir, str(sub_id), "outbox.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [ln for ln in f if ln.strip()]

    # sub 1: the pre-change batch only (unsubscribe applied live)
    assert len(outbox_lines(1)) == 2
    # sub 2: only events after its mid-stream registration
    assert len(outbox_lines(2)) == 1


def test_wal_poll_source_end_to_end(spark, tmp_path):
    """R1-R7 realized as a Python Data Source: poll-with-cursor source
    feeds the CDC pipeline; new rows appear in later microbatches; the
    acked LSN advances only after batch commit (at-least-once)."""
    from speculare_pgcdc_spark.streaming import wal_source

    db = str(tmp_path / "pg_standin.sqlite")
    wal_source.ensure_wal_tables(db)
    wal_source.register(spark)

    def insert(lsn, table, rid):
        wal_source.append_wal(
            db, lsn, json.dumps(_wal2json_line("insert", table, ["id"], [rid]))
        )

    insert(10, "events_a", 1)
    insert(20, "events_a", 2)

    src = (
        spark.readStream.format("wal_poll").option("path", db).load()
    )
    parsed = parse_wal2json(src, payload_col="payload")
    q = (
        parsed.writeStream.format("memory")
        .queryName("t_wal")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT COUNT(*) n FROM t_wal").first().n == 2
        # the ack LAGS processing (sent when the next batch commits) —
        # exactly the at-least-once contract: never ahead of delivery
        assert wal_source.acked_lsn(db) <= 20

        insert(30, "events_b", 3)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT table, kind FROM t_wal ORDER BY table"
        ).collect()
        assert [r.table for r in rows] == ["events_a", "events_a", "events_b"]
        # batch 1's offsets are acked once batch 2 has committed
        assert 20 <= wal_source.acked_lsn(db) <= 30
    finally:
        q.stop()


def test_idempotent_outbox_exactly_once_on_replay(spark, tmp_path):
    """Replaying the same batch_id (crash-between-deliver-and-ack) must
    not duplicate deliveries through the idempotent adapter, while the
    plain append outbox shows the duplicate — the at-least-once vs
    exactly-once sink contrast."""
    from speculare_pgcdc_spark.streaming.fanout import (
        fanout_batch,
        idempotent_outbox_deliver,
        outbox_deliver,
        read_outbox,
    )

    routed = spark.createDataFrame(
        [(1, '{"kind":"insert","n":%d}' % i) for i in range(4)],
        "sub_id int, change_json string",
    )
    idem_dir = str(tmp_path / "idem")
    app_dir = str(tmp_path / "app")
    idem, app = idempotent_outbox_deliver(idem_dir), outbox_deliver(app_dir)

    fanout_batch(routed, idem, batch_id=7)
    fanout_batch(routed, app, batch_id=7)
    # crash + replay of the SAME microbatch
    fanout_batch(routed, idem, batch_id=7)
    fanout_batch(routed, app, batch_id=7)
    # next batch proceeds
    nxt = spark.createDataFrame(
        [(1, '{"kind":"insert","n":99}')], "sub_id int, change_json string"
    )
    fanout_batch(nxt, idem, batch_id=8)

    assert len(read_outbox(idem_dir, 1)) == 5   # 4 + 1, no duplicates
    assert len(read_outbox(app_dir, 1)) == 8    # 4 duplicated


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """T6+/J8 streaming twin: a stream-stream self interval join equals
    the batch Q14 pair set (watermarked state-bounded join)."""
    from speculare_pgcdc_spark.catalog import table as t
    from speculare_pgcdc_spark.streaming.windows import interval_stream_join

    events = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .filter(F.col("user_id") < 20)
    )
    stream_dir = str(tmp_path / "events_stream")
    events.coalesce(3).write.mode("overwrite").parquet(stream_dir)

    def src():
        return (
            spark.readStream.schema("user_id bigint, ts timestamp, event_id bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )

    joined = interval_stream_join(src(), src())
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.event_a, r.event_b)
            for r in spark.sql("SELECT * FROM t_ssj").collect()
        }
    finally:
        q.stop()

    a, b = events.alias("a"), events.alias("b")
    expected = {
        (r.event_a, r.event_b)
        for r in a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
        )
        .collect()
    }
    assert expected and got == expected


def test_streaming_session_window_matches_batch(spark, sf_dir, tmp_path):
    """T3 stream-batch parity: session windows (30-min gap) computed
    over the streamed fixture equal the batch session_window result."""
    from speculare_pgcdc_spark.catalog import table as t
    from speculare_pgcdc_spark.streaming.windows import session_counts

    events = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts")
        .filter(F.col("user_id") < 30)
    )
    stream_dir = str(tmp_path / "events_stream")
    events.coalesce(3).write.mode("overwrite").parquet(stream_dir)

    src = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        session_counts(src)
        .writeStream.format("memory")
        .queryName("t_sess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.w.start, r.w.end, r.n)
            for r in spark.sql("SELECT * FROM t_sess").collect()
        }
    finally:
        q.stop()
    expected = {
        (r.user_id, r.w.start, r.w.end, r.n)
        for r in session_counts(events).collect()
    }
    assert expected and got == expected


def test_supervised_restart_resumes_and_delivers_exactly_once(
    spark, tmp_path
):
    """R22: a poison delivery crashes the query; the supervisor backs
    off linearly and restarts from the SAME checkpoint; with the
    idempotent outbox the replayed batch is delivered exactly once."""
    from speculare_pgcdc_spark.streaming.fanout import (
        fanout_batch,
        idempotent_outbox_deliver,
        read_outbox,
    )
    from speculare_pgcdc_spark.streaming.supervise import run_supervised

    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)
    _write_jsonl(
        f"{feed_dir}/f1.json",
        [_event("2024-01-01 00:00:00", 1, i) for i in range(5)],
    )

    deliver = idempotent_outbox_deliver(out_dir)
    crashes = {"left": 1}

    def process(batch_df, batch_id):
        routed = batch_df.selectExpr(
            "1 AS sub_id", "to_json(struct(*)) AS change_json"
        )
        if crashes["left"] > 0:
            crashes["left"] -= 1
            raise RuntimeError("poison delivery (simulated sink crash)")
        fanout_batch(routed, deliver, batch_id)

    def start():
        src = spark.readStream.schema(EVENT_SCHEMA).json(feed_dir)
        return (
            src.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .start()
        )

    backoffs = []
    run_supervised(
        start, backoff_seconds=3.0, sleep=backoffs.append, drain=True
    )
    assert backoffs == [3.0]  # one crash, linear first step
    assert crashes["left"] == 0
    assert len(read_outbox(out_dir, 1)) == 5  # replayed batch, no dupes


def test_read_outbox_numeric_batch_order(tmp_path):
    from speculare_pgcdc_spark.streaming.fanout import (
        idempotent_outbox_deliver,
        read_outbox,
    )

    deliver = idempotent_outbox_deliver(str(tmp_path))
    for b in range(12):
        deliver(1, [f"payload-{b}"], b)
    got = read_outbox(str(tmp_path), 1)
    assert got == [f"payload-{b}" for b in range(12)]  # 10 after 9, not after 1


def test_two_arg_delivery_adapters_still_work(spark, tmp_path):
    """The original Delivery contract (sub_id, payloads) must not break
    now that fanout threads batch_id to batch-aware adapters."""
    from speculare_pgcdc_spark.streaming.fanout import fanout_batch

    seen = []

    def legacy_deliver(sub_id, payloads):
        seen.append((sub_id, tuple(payloads)))

    routed = spark.createDataFrame(
        [(1, "a"), (1, "b")], "sub_id int, change_json string"
    )
    fanout_batch(routed, legacy_deliver, batch_id=3)
    assert seen and seen[0][0] == 1 and sorted(seen[0][1]) == ["a", "b"]


def test_wal_poll_duplicate_lsns_not_skipped(spark, tmp_path):
    """A batch limit cutting inside a run of equal LSNs must not strand
    the remaining duplicates behind the cursor."""
    from speculare_pgcdc_spark.streaming import wal_source

    db = str(tmp_path / "wal.sqlite")
    wal_source.ensure_wal_tables(db)
    for i in range(3):
        wal_source.append_wal(db, 50, f'{{"change":[],"i":{i}}}')
    wal_source.append_wal(db, 60, '{"change":[]}')

    reader = wal_source.WalPollReader({"path": db, "batchlimit": "1"})
    rows1, off1 = reader.read({"lsn": 0})
    rows1 = list(rows1)
    # limit=1 distinct LSN -> ALL THREE lsn=50 rows in one batch
    assert [r[0] for r in rows1] == [50, 50, 50]
    assert off1 == {"lsn": 50}
    rows2, off2 = reader.read(off1)
    assert [r[0] for r in list(rows2)] == [60] and off2 == {"lsn": 60}
    # replay of the first range returns the full range regardless of limit
    replay = list(reader.readBetweenOffsets({"lsn": 0}, {"lsn": 50}))
    assert len(replay) == 3


def test_available_now_drains_and_terminates(spark, tmp_path):
    """Trigger.AvailableNow: the fan-out processes everything committed
    so far and terminates on its own; a second drain resumes from the
    checkpoint and sees only new data."""
    from speculare_pgcdc_spark.streaming.fanout import (
        read_outbox,
        idempotent_outbox_deliver,
        start_fanout_query,
    )

    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)

    def payload_file(path, n0, n):
        with open(path, "w") as f:
            for i in range(n0, n0 + n):
                f.write(
                    json.dumps(
                        _wal2json_line("insert", "events_a", ["id"], [i])
                    )
                    + "\n"
                )

    payload_file(f"{feed_dir}/f1.json", 0, 3)
    subs = subscriptions_df(spark, [(1, "insert:events_a")], FEED_TABLES)

    def drain():
        stream = normalize_hypertables(
            parse_wal2json(file_change_feed(spark, feed_dir)),
            lookup_df(spark),
        )
        q = start_fanout_query(
            stream, subs, idempotent_outbox_deliver(out_dir), ckpt,
            available_now=True,
        )
        assert q.awaitTermination(120)  # terminates by itself

    drain()
    assert len(read_outbox(out_dir, 1)) == 3
    payload_file(f"{feed_dir}/f2.json", 3, 2)
    drain()
    assert len(read_outbox(out_dir, 1)) == 5  # resumed, no reprocessing


def test_fanout_partitions_matches_driver_path(spark, tmp_path):
    """The executor-side fan-out must produce byte-identical outboxes to
    the driver path, without any payload crossing to the driver — collect
    is monkeypatched to raise for the duration of the partition path."""
    from pyspark.sql import DataFrame
    from speculare_pgcdc_spark.streaming.fanout import (
        fanout_batch,
        fanout_partitions,
        idempotent_outbox_deliver,
        read_outbox,
    )

    rows = [
        # (sub_id, seq, chg_idx, change_json) deliberately scrambled
        (2, 20, 1, "s2-b"),
        (1, 10, 0, "s1-a"),
        (2, 10, 0, "s2-a"),
        (1, 20, 1, "s1-c"),
        (1, 20, 0, "s1-b"),
        (3, 10, 0, "s3-a"),
    ]
    routed = spark.createDataFrame(
        rows, "sub_id int, seq bigint, chg_idx int, change_json string"
    ).repartition(5)

    drv_dir, exe_dir = str(tmp_path / "drv"), str(tmp_path / "exe")
    fanout_batch(routed, idempotent_outbox_deliver(drv_dir), batch_id=1)

    real_collect = DataFrame.collect

    def no_collect(self):
        raise AssertionError("fanout_partitions must not collect()")

    DataFrame.collect = no_collect
    try:
        fanout_partitions(
            routed, idempotent_outbox_deliver(exe_dir), batch_id=1
        )
    finally:
        DataFrame.collect = real_collect

    for sub in (1, 2, 3):
        drv = read_outbox(drv_dir, sub)
        exe = read_outbox(exe_dir, sub)
        assert drv == exe, f"sub {sub}: driver {drv} != executor {exe}"
    # and the order is WAL order, not shuffle order
    assert read_outbox(drv_dir, 1) == ["s1-a", "s1-b", "s1-c"]


def test_fanout_modes_through_streaming_query(spark, tmp_path):
    """start_fanout_query(mode='partitions') end-to-end: same routed
    outbox contents as the driver mode over a real StreamingQuery."""
    from speculare_pgcdc_spark.streaming.fanout import (
        idempotent_outbox_deliver,
        read_outbox,
        start_fanout_query,
    )

    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    with open(f"{feed_dir}/f1.json", "w") as f:
        for i in range(6):
            f.write(
                json.dumps(
                    _wal2json_line("insert", "events_a", ["id"], [i])
                )
                + "\n"
            )
    subs = subscriptions_df(spark, [(1, "insert:events_a")], FEED_TABLES)

    outs = {}
    for mode in ("driver", "partitions"):
        out_dir = str(tmp_path / f"out_{mode}")
        stream = normalize_hypertables(
            parse_wal2json(file_change_feed(spark, feed_dir)),
            lookup_df(spark),
        )
        q = start_fanout_query(
            stream,
            subs,
            idempotent_outbox_deliver(out_dir),
            str(tmp_path / f"ckpt_{mode}"),
            available_now=True,
            mode=mode,
        )
        assert q.awaitTermination(120)
        outs[mode] = sorted(read_outbox(out_dir, 1))
    assert outs["driver"] == outs["partitions"] and len(outs["driver"]) == 6

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown fan-out mode"):
        start_fanout_query(
            stream, subs, idempotent_outbox_deliver(str(tmp_path / "x")),
            str(tmp_path / "ckpt_x"), mode="bogus",
        )


def test_watch_db_outbox_in_wal_order(spark, tmp_path):
    """ADVICE r1: per-subscriber delivery order. The wal_poll lsn rides
    through parse (seq) with the intra-message posexplode index
    (chg_idx); the outbox must list changes in (lsn, chg_idx) order even
    though routing shuffles them."""
    from speculare_pgcdc_spark.engine import Engine
    from speculare_pgcdc_spark.streaming import wal_source
    from speculare_pgcdc_spark.streaming.fanout import read_outbox

    db = str(tmp_path / "wal.sqlite")
    wal_source.ensure_wal_tables(db)

    def msg(ids):
        return json.dumps(
            {
                "change": [
                    {
                        "kind": "insert",
                        "table": "events_a",
                        "columnnames": ["id"],
                        "columnvalues": [i],
                    }
                    for i in ids
                ]
            }
        )

    # descending lsn insert order; multi-change messages
    wal_source.append_wal(db, 30, msg([5, 6]))
    wal_source.append_wal(db, 10, msg([1, 2]))
    wal_source.append_wal(db, 20, msg([3, 4]))

    eng = Engine(spark=spark, tables=["events_a", "events_b"])
    eng.subscribe(1, "insert:events_a")
    for mode in ("driver", "partitions"):
        out_dir = str(tmp_path / f"out_{mode}")
        q = eng.watch_db(
            db,
            out_dir,
            str(tmp_path / f"ckpt_{mode}"),
            exactly_once=True,
            available_now=True,
            mode=mode,
        )
        assert q.awaitTermination(120)
        got = [
            json.loads(p)["columnvalues"][0]
            for p in read_outbox(out_dir, 1)
        ]
        assert got == [1, 2, 3, 4, 5, 6], f"{mode}: {got}"


def test_feedgen_escapes_special_content(spark):
    """Fixture content with quotes/backslashes must round-trip the
    wal2json frame (format_string interpolation would emit malformed
    JSON that try_parse_json silently drops)."""
    from speculare_pgcdc_spark.cdc import feedgen

    e = spark.createDataFrame(
        [
            (1, 101, 'say "hi" \\ there', 1.5, "2024-01-01 00:00:00"),
            (3, 102, "plain", float("nan"), "2024-01-01 00:01:00"),
        ],
        "event_id bigint, user_id bigint, event_type string,"
        " value double, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    import unittest.mock as mock

    with mock.patch.object(feedgen, "table", lambda s, sf, n: e):
        feed = feedgen._build_feed(spark, "ignored")
        changes = parse_wal2json(feed)
        got = {
            r["etype"]
            for r in changes.select(
                F.try_element_at(
                    "row_typed", F.lit("event_type")
                ).alias("etype")
            ).collect()
        }
    # both frames parsed: the quoted/backslashed string survived intact
    # and the NaN value became JSON null instead of a malformed frame
    assert got == {'say "hi" \\ there', "plain"}


def test_fanout_partitions_tie_order_deterministic(spark, tmp_path):
    """Rows tying on (seq, chg_idx) — e.g. a seq-less file feed — must
    still deliver in a deterministic order in partitions mode, so a
    crash-replay rewrites an idempotent batch file with IDENTICAL line
    order (consumers may have tailed the first write)."""
    from speculare_pgcdc_spark.streaming.fanout import (
        fanout_partitions,
        idempotent_outbox_deliver,
        read_outbox,
    )

    rows = [(1, 0, 0, f"payload-{i:02d}") for i in (5, 1, 9, 3, 7)]
    outs = []
    for attempt in range(2):
        routed = spark.createDataFrame(
            rows, "sub_id int, seq bigint, chg_idx int, change_json string"
        ).repartition(7)  # scramble physical order differently per run
        out_dir = str(tmp_path / f"o{attempt}")
        fanout_partitions(
            routed, idempotent_outbox_deliver(out_dir), batch_id=1
        )
        outs.append(read_outbox(out_dir, 1))
    assert outs[0] == outs[1] == sorted(p for _, _, _, p in rows)


def test_transform_with_state_running_count(spark, tmp_path):
    """T7 on the modern API: transformWithStateInPandas must reproduce
    running_counts' semantics (state persists across microbatches) on
    the RocksDB state store. Skips only if this build ships no RocksDB
    provider."""
    from speculare_pgcdc_spark.streaming.windows import running_counts_tws

    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(feed_dir)
    )
    try:
        counted = running_counts_tws(src)
        q = (
            counted.writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            _write_jsonl(
                f"{feed_dir}/f1.json",
                [
                    _event("2024-01-01 00:00:00", 7, 1),
                    _event("2024-01-01 00:01:00", 7, 2),
                    _event("2024-01-01 00:02:00", 8, 3),
                ],
            )
            q.processAllAvailable()
            _write_jsonl(
                f"{feed_dir}/f2.json",
                [_event("2024-01-01 00:03:00", 7, 4)],
            )
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT user_id, MAX(events) e FROM t_tws GROUP BY user_id"
            ).collect()
            got = {r.user_id: r.e for r in rows}
            assert got == {7: 3, 8: 1}
        finally:
            q.stop()
    except Exception as ex:
        msg = str(ex)
        if (
            "RocksDB" in msg
            or "UnsatisfiedLink" in msg
            or "protobuf" in msg
            or "STREAMING_PYTHON_RUNNER_INITIALIZATION" in msg
            or "driver worker exited" in msg
        ):
            # the TWS runtime needs google.protobuf (driver worker) and
            # a RocksDB provider — absent in this container; the
            # operator's contract is still its running_counts parity
            pytest.skip(f"transformWithState runtime unavailable: {ex}")
        raise
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_fanout_auto_selects_path_by_batch_size(spark, tmp_path, monkeypatch):
    """Round-3 verdict #3: the default fan-out must not funnel large
    batches through the driver. mode='auto' picks the driver path at or
    below AUTO_DRIVER_MAX_ROWS and the executor path above it, and both
    paths produce identical outboxes."""
    from speculare_pgcdc_spark.streaming import fanout as fo

    rows = [(1, 10, 0, "a"), (2, 10, 0, "b"), (1, 20, 0, "c")]
    routed = spark.createDataFrame(
        rows, "sub_id int, seq bigint, chg_idx int, change_json string"
    )

    calls = []
    real_batch, real_parts = fo.fanout_batch, fo.fanout_partitions
    monkeypatch.setattr(
        fo,
        "fanout_batch",
        lambda *a, **k: (calls.append("driver"), real_batch(*a, **k)),
    )
    monkeypatch.setattr(
        fo,
        "fanout_partitions",
        lambda *a, **k: (calls.append("partitions"), real_parts(*a, **k)),
    )

    out_small = str(tmp_path / "small")
    fo.fanout_auto(routed, fo.outbox_deliver(out_small), batch_id=1)
    assert calls == ["driver"]

    monkeypatch.setattr(fo, "AUTO_DRIVER_MAX_ROWS", 2)  # 3 rows > 2
    out_big = str(tmp_path / "big")
    fo.fanout_auto(routed, fo.outbox_deliver(out_big), batch_id=1)
    assert calls == ["driver", "partitions"]

    assert (
        fo.read_outbox(out_small, 1)
        == fo.read_outbox(out_big, 1)
        == ["a", "c"]
    )


def test_fanout_default_mode_is_auto():
    """Pin the public defaults: Engine.watch / watch_db /
    start_fanout_query all fan out in auto mode unless told otherwise."""
    import inspect

    from speculare_pgcdc_spark.engine import Engine
    from speculare_pgcdc_spark.streaming.fanout import start_fanout_query

    for fn in (Engine.watch, Engine.watch_db, start_fanout_query):
        assert (
            inspect.signature(fn).parameters["mode"].default == "auto"
        ), fn.__qualname__


def test_streaming_cdc_apply_maintains_snapshot(spark, tmp_path):
    """start_apply_query: a parquet snapshot maintained from the change
    stream converges to the batch apply_changes result across multiple
    microbatches, and a second drain with no new input is a no-op."""
    from speculare_pgcdc_spark.cdc.apply import (
        apply_changes,
        start_apply_query,
    )
    from speculare_pgcdc_spark.cdc.pipeline import parse_wal2json

    feed_dir = str(tmp_path / "feed")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)
    cols = {"id": "bigint", "name": "string"}

    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "id bigint, name string"
    )
    base.write.parquet(snap)

    def chg(kind, id_, name=None):
        if kind == "delete":
            return {
                "change": [
                    {
                        "kind": "delete",
                        "table": "t",
                        "oldkeys": {"keynames": ["id"], "keyvalues": [id_]},
                    }
                ]
            }
        return {
            "change": [
                {
                    "kind": kind,
                    "table": "t",
                    "columnnames": ["id", "name"],
                    "columnvalues": [id_, name],
                }
            ]
        }

    batches = [
        [chg("update", 1, "one-v2"), chg("insert", 4, "four")],
        [chg("delete", 2), chg("update", 4, "four-v2")],
    ]
    for i, msgs in enumerate(batches):
        with open(f"{feed_dir}/f{i}.json", "w") as f:
            for m in msgs:
                f.write(json.dumps(m) + "\n")

    def drain():
        stream = parse_wal2json(
            file_change_feed(spark, feed_dir)
        ).withColumn("table_name", F.col("table"))
        q = start_apply_query(stream, snap, ckpt, "id", cols)
        # both files in flight; process everything committed, stop
        q.processAllAvailable()
        q.stop()

    drain()
    got = {
        r["id"]: r["name"] for r in spark.read.parquet(snap).collect()
    }
    assert got == {1: "one-v2", 3: "three", 4: "four-v2"}

    # equivalence with applying the same batches sequentially in batch
    # mode (the file feed carries no seq, so a ONE-shot apply over both
    # files would tie cross-batch changes at (0,0) — per-batch
    # application is the defined order, exactly what the stream did)
    state = base
    for i in range(len(batches)):
        feed_i = spark.createDataFrame(
            [(json.dumps(m),) for m in batches[i]], ["payload"]
        )
        state = apply_changes(
            state,
            parse_wal2json(feed_i).withColumn(
                "table_name", F.col("table")
            ),
            "id",
            cols,
        ).localCheckpoint(eager=True)
    assert got == {r["id"]: r["name"] for r in state.collect()}

    # restart with no new input: checkpoint resumes, snapshot unchanged
    drain()
    again = {
        r["id"]: r["name"] for r in spark.read.parquet(snap).collect()
    }
    assert again == got


def test_streaming_ohlc_bars_match_batch_and_q128(spark, sf_dir, tmp_path):
    """E79 stream parity: the min_by/max_by OHLC formulation streamed
    file-by-file equals its batch run AND the row_number formulation
    registered as q128 (day windows align because the fixture
    timestamps are naive-UTC and F.window('1 day') buckets epoch
    days exactly like date_trunc('day'))."""
    from speculare_pgcdc_spark.catalog import table as t
    from speculare_pgcdc_spark.queries import load_all
    from speculare_pgcdc_spark.streaming.windows import ohlc_bars_windowed

    events = t(spark, sf_dir, "events").select(
        "ts", "event_id", "event_type", "value"
    )
    stream_dir = str(tmp_path / "events_stream")
    events.coalesce(4).write.mode("overwrite").parquet(stream_dir)

    src = (
        spark.readStream.schema(
            "ts timestamp, event_id bigint, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        ohlc_bars_windowed(src, watermark="100 days")
        .writeStream.format("memory")
        .queryName("t_ohlc")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.w.start, r.event_type): (r.open, r.high, r.low, r.close, r.n)
            for r in spark.sql("SELECT * FROM t_ohlc").collect()
        }
    finally:
        q.stop()

    batch = {
        (r.w.start, r.event_type): (r.open, r.high, r.low, r.close, r.n)
        for r in ohlc_bars_windowed(events).collect()
    }
    assert got == batch

    q128 = load_all()["q128_ohlc_bars"].fn(spark, sf_dir)
    via_rownum = {
        (r.day, r.event_type): (r.open, r.high, r.low, r.close, r.n)
        for r in q128.collect()
    }
    assert got == via_rownum


def test_streaming_ewma_matches_python_fold(spark, tmp_path):
    """T7 streaming EWMA: per-key running decay across MULTIPLE
    triggers (state carries between batches) equals a plain Python
    fold over the same events in order."""
    from speculare_pgcdc_spark.streaming.windows import streaming_ewma

    in_dir = str(tmp_path / "ewma_in")
    os.makedirs(in_dir, exist_ok=True)
    batches = [
        [
            {"ts": "2024-01-01 00:00:01", "user_id": 1, "event_id": 1,
             "value": 10.0},
            {"ts": "2024-01-01 00:00:02", "user_id": 1, "event_id": 2,
             "value": 20.0},
            {"ts": "2024-01-01 00:00:03", "user_id": 2, "event_id": 3,
             "value": 5.0},
        ],
        [
            {"ts": "2024-01-01 00:00:04", "user_id": 1, "event_id": 4,
             "value": 40.0},
            {"ts": "2024-01-01 00:00:05", "user_id": 2, "event_id": 5,
             "value": 15.0},
        ],
    ]
    src = (
        spark.readStream.schema(
            "ts timestamp, user_id bigint, event_id bigint, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = (
        streaming_ewma(src)
        .writeStream.format("memory")
        .queryName("t_ewma")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        for i, rows in enumerate(batches):
            _write_jsonl(os.path.join(in_dir, f"b{i}.jsonl"), rows)
            q.processAllAvailable()
        # update mode: last row per user wins
        got = {}
        for r in spark.sql("SELECT * FROM t_ewma").collect():
            got[r.user_id] = (r.ewma, r.n_events)
    finally:
        q.stop()

    # python fold reference, same order, alpha=0.5
    expect = {}
    for rows in batches:
        for r in rows:
            e, n = expect.get(r["user_id"], (0.0, 0))
            e = r["value"] if n == 0 else 0.5 * r["value"] + 0.5 * e
            expect[r["user_id"]] = (e, n + 1)
    expect = {u: (round(e, 10), n) for u, (e, n) in expect.items()}
    assert got == expect


def test_streaming_scd2_current_matches_batch_q153(spark, sf_dir, tmp_path):
    """E106 stream parity: the O(1)-state latest-per-key aggregate
    streamed file-by-file equals the is_current slice of the batch
    SCD2 build (q153) — the stream maintains exactly the rows the
    batch history marks current."""
    from speculare_pgcdc_spark.catalog import table as t
    from speculare_pgcdc_spark.queries import load_all
    from speculare_pgcdc_spark.streaming.windows import scd2_current

    events = t(spark, sf_dir, "events").select(
        "ts", "event_id", "user_id", "event_type"
    )
    stream_dir = str(tmp_path / "scd2_stream")
    events.coalesce(4).write.mode("overwrite").parquet(stream_dir)

    src = (
        spark.readStream.schema(
            "ts timestamp, event_id bigint, user_id bigint,"
            " event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        scd2_current(src)
        .writeStream.format("memory")
        .queryName("t_scd2")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.attr_value, r.valid_from)
            for r in spark.sql("SELECT * FROM t_scd2").collect()
        }
    finally:
        q.stop()

    batch = {
        (r.user_id, r.attr_value, r.valid_from)
        for r in scd2_current(events).collect()
    }
    assert got == batch

    current = load_all()["q153_scd2_history"].fn(spark, sf_dir).filter(
        "is_current"
    )
    via_q153 = {
        (r.user_id, r.attr_value, r.valid_from)
        for r in current.collect()
    }
    assert got == via_q153


def test_observe_changes_batch_counters_ride_the_plan(spark, sf_dir):
    """Observability: the observe() counter set on the parsed change
    frame must equal independently-computed aggregates, and arrive
    from the SAME execution (no second scan)."""
    from speculare_pgcdc_spark.cdc.feedgen import feed_messages
    from speculare_pgcdc_spark.cdc.pipeline import parse_wal2json
    from speculare_pgcdc_spark.streaming.metrics import observe_changes

    changes = parse_wal2json(feed_messages(spark, sf_dir))
    observed, obs = observe_changes(changes)
    total = observed.count()  # the one action; metrics ride along
    got = obs.get
    assert got["n_changes"] == total
    expected = {
        r.kind: r.n
        for r in changes.groupBy("kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got["n_inserts"] == expected.get("insert", 0)
    assert got["n_updates"] == expected.get("update", 0)
    assert got["n_deletes"] == expected.get("delete", 0)
    assert got["n_inserts"] + got["n_updates"] + got["n_deletes"] == total


def test_observe_parse_health_counts_poison_without_dropping(spark):
    """Poison accounting: NULL-variant rows are counted, not filtered
    — the caller keeps its tolerance policy."""
    from speculare_pgcdc_spark.streaming.metrics import (
        observe_parse_health,
    )

    payloads = spark.createDataFrame(
        [
            ('{"change": []}',),
            ("{not json",),
            ('{"change": [{"kind": "insert"}]}',),
        ],
        "payload string",
    ).select(
        "payload", F.try_parse_json("payload").alias("variant")
    )
    observed, obs = observe_parse_health(payloads)
    assert observed.count() == 3  # nothing dropped by observation
    assert obs.get == {"n_messages": 3, "n_poison": 1}


def test_observe_changes_streaming_metrics_in_progress(spark, tmp_path):
    """Streaming: the same observed plan surfaces its counters in each
    microbatch's progress (the forwarder-loop logging analog)."""
    import json as _json

    from speculare_pgcdc_spark.cdc.pipeline import parse_wal2json
    from speculare_pgcdc_spark.streaming.metrics import (
        CDC_METRICS,
        observe_changes,
    )

    in_dir = str(tmp_path / "feed")
    os.makedirs(in_dir, exist_ok=True)
    msg = {
        "change": [
            {"kind": "insert", "table": "events_a",
             "columnnames": ["id"], "columnvalues": ["1"]},
            {"kind": "delete", "table": "events_a"},
        ]
    }
    with open(os.path.join(in_dir, "b0.jsonl"), "w") as f:
        f.write(_json.dumps({"payload": _json.dumps(msg)}) + "\n")

    src = spark.readStream.schema("payload string").json(in_dir)
    q = (
        observe_changes(parse_wal2json(src))
        .writeStream.format("memory")
        .queryName("t_obs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.recentProgress or []
        metrics = [
            p["observedMetrics"][CDC_METRICS]
            for p in progress
            if p.get("observedMetrics", {}).get(CDC_METRICS)
        ]
    finally:
        q.stop()
    totals = {
        k: sum(m[k] for m in metrics)
        for k in ("n_changes", "n_inserts", "n_deletes")
    }
    assert totals == {"n_changes": 2, "n_inserts": 1, "n_deletes": 1}


def test_engine_watch_reports_cdc_metrics_in_progress(spark, tmp_path):
    """Every Engine.watch query carries the observe() counter set in
    its microbatch progress — on by default, no caller opt-in."""
    import json as _json

    from speculare_pgcdc_spark.engine import Engine
    from speculare_pgcdc_spark.streaming.metrics import CDC_METRICS

    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir, exist_ok=True)
    msg = {
        "change": [
            {"kind": "insert", "table": "events_a",
             "columnnames": ["id"], "columnvalues": ["1"]},
            {"kind": "update", "table": "events_b",
             "columnnames": ["id"], "columnvalues": ["2"]},
        ]
    }
    with open(os.path.join(feed_dir, "f0.jsonl"), "w") as f:
        f.write(_json.dumps(msg) + "\n")

    eng = Engine(spark=spark, tables=["events_a", "events_b"])
    eng.subscribe(1, "insert,update:events_a")
    q = eng.watch(
        feed_dir,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    metrics = [
        p["observedMetrics"][CDC_METRICS]
        for p in (q.recentProgress or [])
        if p.get("observedMetrics", {}).get(CDC_METRICS)
    ]
    assert metrics, "watch progress carried no cdc_metrics"
    assert sum(m["n_changes"] for m in metrics) == 2
    assert sum(m["n_inserts"] for m in metrics) == 1
    assert sum(m["n_updates"] for m in metrics) == 1


def test_streaming_cusum_matches_python_fold(spark, tmp_path):
    """T7 streaming CUSUM: state (cumsum, running min, count) carries
    across MULTIPLE triggers and the emitted S equals a plain Python
    fold over the same events in order; the alarm latches when S
    crosses the threshold."""
    import json as _json

    from speculare_pgcdc_spark.streaming.windows import streaming_cusum

    in_dir = str(tmp_path / "cusum_in")
    os.makedirs(in_dir, exist_ok=True)
    batches = [
        [("a", 1, "2024-01-01 00:00:01", 10.0),
         ("a", 2, "2024-01-01 00:00:02", 8.0),
         ("b", 3, "2024-01-01 00:00:03", 12.0)],
        [("a", 4, "2024-01-01 00:00:04", 15.0),
         ("a", 5, "2024-01-01 00:00:05", 16.0),
         ("b", 6, "2024-01-01 00:00:06", 9.0)],
    ]
    for i, rows in enumerate(batches):
        with open(os.path.join(in_dir, f"b{i}.jsonl"), "w") as f:
            for t, eid, ts, v in rows:
                f.write(_json.dumps(
                    {"event_type": t, "event_id": eid, "ts": ts,
                     "value": v}) + "\n")

    target, threshold = 10.0, 5.0
    src = (
        spark.readStream.schema(
            "event_type string, event_id bigint, ts timestamp,"
            " value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(in_dir)
    )
    q = (
        streaming_cusum(src, target=target, threshold=threshold)
        .writeStream.format("memory")
        .queryName("t_cusum")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode: last emitted row per key wins
        rows = spark.sql(
            "SELECT * FROM t_cusum"
        ).collect()
    finally:
        q.stop()
    final = {}
    for r in rows:  # update mode: the row with the highest n is final
        if r.event_type not in final or r.n > final[r.event_type][1]:
            final[r.event_type] = (r.s_stat, r.n, r.alarm)

    # python fold reference (alarm latches on ANY excursion)
    for key in ("a", "b"):
        vals = [v for b in batches for (t, _e, _ts, v) in b if t == key]
        c, minc, ever = 0.0, 0.0, False
        for v in vals:
            c += v - target
            minc = min(minc, c)
            ever = ever or (c - minc > threshold)
        s = c - minc
        got_s, got_n, got_alarm = final[key]
        assert got_n == len(vals)
        assert abs(got_s - s) < 1e-9, (key, got_s, s)
        assert got_alarm == ever, key
    # series "a" drifts +11 above target -> alarmed; "b" does not
    assert final["a"][2] is True and final["b"][2] is False


def test_fanout_auto_flips_paths_mid_stream(spark, tmp_path, monkeypatch):
    """Chaos test (VERDICT r5 #8): mode='auto' must flip driver ->
    executor BETWEEN microbatches when a batch crosses
    AUTO_DRIVER_MAX_ROWS, and the outbox must stay complete and in
    WAL order across the flip."""
    from speculare_pgcdc_spark.streaming import fanout as fo
    from speculare_pgcdc_spark.streaming.fanout import (
        idempotent_outbox_deliver,
        read_outbox,
        start_fanout_query,
    )

    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    # batch 1: 2 changes (<= threshold, driver path); batch 2: 8
    # changes (> threshold, executor path) — maxFilesPerTrigger=1
    # makes each file its own microbatch
    with open(f"{feed_dir}/f1.json", "w") as f:
        for i in range(2):
            f.write(json.dumps(
                _wal2json_line("insert", "events_a", ["id"], [i])
            ) + "\n")
    with open(f"{feed_dir}/f2.json", "w") as f:
        for i in range(2, 10):
            f.write(json.dumps(
                _wal2json_line("insert", "events_a", ["id"], [i])
            ) + "\n")

    monkeypatch.setattr(fo, "AUTO_DRIVER_MAX_ROWS", 3)
    calls = []
    real_batch, real_parts = fo.fanout_batch, fo.fanout_partitions
    monkeypatch.setattr(
        fo, "fanout_batch",
        lambda *a, **k: (calls.append("driver"), real_batch(*a, **k))[1],
    )
    monkeypatch.setattr(
        fo, "fanout_partitions",
        lambda *a, **k: (calls.append("exec"), real_parts(*a, **k))[1],
    )

    subs = subscriptions_df(spark, [(1, "insert:events_a")], FEED_TABLES)
    stream = normalize_hypertables(
        parse_wal2json(file_change_feed(spark, feed_dir)),
        lookup_df(spark),
    )
    out_dir = str(tmp_path / "out_auto")
    q = start_fanout_query(
        stream,
        subs,
        idempotent_outbox_deliver(out_dir),
        str(tmp_path / "ckpt_auto"),
        available_now=True,
        mode="auto",
    )
    assert q.awaitTermination(120)
    # both paths ran, one per batch (file order = batch order)
    assert sorted(calls) == ["driver", "exec"]
    got = read_outbox(out_dir, 1)
    assert len(got) == 10
    ids = [json.loads(p)["columnvalues"][0] for p in got]
    # per-batch WAL order survives the flip (batches may arrive in
    # either order, but each batch's ids are contiguous ascending)
    assert sorted(ids) == list(range(10))
    assert ids.index(0) < ids.index(1) and ids.index(2) < ids.index(9)


def test_streaming_cdc_apply_recovers_from_crashed_swap(
    spark, tmp_path
):
    """Round-6 review: a crash BETWEEN the snapshot swap's two renames
    leaves only <snap>.old on disk; the next batch must restore it and
    proceed (checkpoint replay + idempotent apply converge), never
    PATH_NOT_FOUND forever."""
    from speculare_pgcdc_spark.cdc.apply import start_apply_query
    from speculare_pgcdc_spark.cdc.pipeline import parse_wal2json

    feed_dir = str(tmp_path / "feed")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)
    cols = {"id": "bigint", "name": "string"}

    spark.createDataFrame(
        [(1, "one"), (2, "two")], "id bigint, name string"
    ).write.parquet(snap)
    # simulate the mid-swap crash: live snapshot renamed away, new one
    # never arrived
    os.rename(snap, f"{snap}.old")
    assert not os.path.exists(snap)

    msg = {
        "change": [
            {
                "kind": "insert",
                "table": "t",
                "columnnames": ["id", "name"],
                "columnvalues": [3, "three"],
            }
        ]
    }
    with open(f"{feed_dir}/f0.json", "w") as f:
        f.write(json.dumps(msg) + "\n")

    stream = parse_wal2json(
        file_change_feed(spark, feed_dir)
    ).withColumn("table_name", F.col("table"))
    q = start_apply_query(
        stream, snap, ckpt, "id", cols, available_now=True
    )
    assert q.awaitTermination(120)
    got = {
        r["id"]: r["name"] for r in spark.read.parquet(snap).collect()
    }
    assert got == {1: "one", 2: "two", 3: "three"}
    assert not os.path.exists(f"{snap}.old")


def test_streaming_ewma_multi_chunk_batch_folds_in_order(
    spark, tmp_path
):
    """Round-6 review regression: a key whose single-batch slice spans
    MULTIPLE Arrow chunks (maxRecordsPerBatch below the group size)
    must still fold in global (ts, event_id) order — per-chunk sorting
    would fold later-chunk earlier-ts events after earlier-chunk later
    ones and silently corrupt the order-sensitive EWMA."""
    from speculare_pgcdc_spark.streaming.windows import streaming_ewma

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    in_dir = str(tmp_path / "ewma_chunk_in")
    os.makedirs(in_dir, exist_ok=True)
    # one key, 12 events in one file (one microbatch), written in
    # REVERSE ts order so chunk boundaries scramble event order
    rows = [
        {
            "ts": f"2024-01-01 00:00:{sec:02d}",
            "user_id": 1,
            "event_id": sec,
            "value": float(sec * 7 % 13),
        }
        for sec in range(12, 0, -1)
    ]
    _write_jsonl(os.path.join(in_dir, "b0.jsonl"), rows)
    src = (
        spark.readStream.schema(
            "ts timestamp, user_id bigint, event_id bigint, value double"
        )
        .json(in_dir)
    )
    q = (
        streaming_ewma(src)
        .writeStream.format("memory")
        .queryName("t_ewma_chunk")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_chunk"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.user_id: (r.ewma, r.n_events)
            for r in spark.sql("SELECT * FROM t_ewma_chunk").collect()
        }
    finally:
        q.stop()
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )

    e, n = 0.0, 0
    for sec in range(1, 13):  # true event order
        v = float(sec * 7 % 13)
        e = v if n == 0 else 0.5 * v + 0.5 * e
        n += 1
    assert got == {1: (round(e, 10), n)}


def test_fanout_auto_flips_driver_to_executor_mid_stream(
    spark, tmp_path, monkeypatch
):
    """Chaos: auto mode re-decides the delivery path PER BATCH, so one
    running query can cross the AUTO_DRIVER_MAX_ROWS threshold
    mid-stream (small batch -> driver collect; burst batch ->
    executor-side foreachPartition) with no restart, no loss and no
    duplicate. The threshold is pinned tiny so the flip happens at
    test scale; path selection is attested by wrapping both delivery
    functions (driver-side, inside foreachBatch)."""
    from speculare_pgcdc_spark.streaming import fanout as fo
    from speculare_pgcdc_spark.streaming.fanout import (
        idempotent_outbox_deliver,
        read_outbox,
        start_fanout_query,
    )

    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)

    paths: list[str] = []
    real_batch, real_parts = fo.fanout_batch, fo.fanout_partitions
    monkeypatch.setattr(
        fo, "fanout_batch",
        lambda *a, **k: (paths.append("driver"), real_batch(*a, **k)),
    )
    monkeypatch.setattr(
        fo, "fanout_partitions",
        lambda *a, **k: (
            paths.append("executor"), real_parts(*a, **k)),
    )
    monkeypatch.setattr(fo, "AUTO_DRIVER_MAX_ROWS", 3)

    def payload_file(name, ids):
        _write_jsonl(
            os.path.join(feed_dir, name),
            [
                _wal2json_line("insert", "events_a", ["id"], [i])
                for i in ids
            ],
        )

    subs = subscriptions_df(spark, [(1, "*:events_a")], FEED_TABLES)
    stream = normalize_hypertables(
        parse_wal2json(file_change_feed(spark, feed_dir)),
        lookup_df(spark),
    )
    payload_file("f1.json", [1, 2])  # 2 routed rows <= 3: driver path
    q = start_fanout_query(
        stream, subs, idempotent_outbox_deliver(out_dir), ckpt
    )
    try:
        q.processAllAvailable()
        # burst: 8 routed rows > 3 -> executor path, same query
        payload_file("f2.json", [3, 4, 5, 6, 7, 8, 9, 10])
        q.processAllAvailable()
    finally:
        q.stop()

    assert paths == ["driver", "executor"]
    lines = read_outbox(out_dir, 1)
    ids = sorted(json.loads(ln)["columnvalues"][0] for ln in lines)
    assert ids == list(range(1, 11))  # no loss, no duplicates


def test_fanout_auto_mode_flips_mid_stream(spark, tmp_path, monkeypatch):
    """Chaos test for the one stateful mode switch in the serving path
    (r5-r7 optional item): auto fan-out must flip driver->executor
    BETWEEN microbatches of a LIVE query when a batch crosses
    AUTO_DRIVER_MAX_ROWS, with identical delivery semantics on both
    sides of the flip (exactly-once per subscriber, WAL order
    preserved across the whole outbox).

    Path detection: the delivery adapter increments a driver-local
    counter around the shared-filesystem outbox write. fanout_batch
    calls it on the driver (counter visible); fanout_partitions runs a
    PICKLED COPY inside foreachPartition (counter copy mutates on the
    executor, driver-side stays put) — so the counter moves exactly
    for driver-path batches while the outbox receives rows from both."""
    from speculare_pgcdc_spark.streaming import fanout as fan
    from speculare_pgcdc_spark.streaming.fanout import (
        outbox_deliver,
        start_fanout_query,
    )

    monkeypatch.setattr(fan, "AUTO_DRIVER_MAX_ROWS", 10)

    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)

    driver_calls = []
    base = outbox_deliver(out_dir)

    def deliver(sub_id, payloads, batch_id=-1):
        driver_calls.append((sub_id, len(payloads)))
        base(sub_id, payloads, batch_id)

    subs = subscriptions_df(spark, [(1, "insert:events_a")], FEED_TABLES)
    stream = normalize_hypertables(
        parse_wal2json(file_change_feed(spark, feed_dir)),
        lookup_df(spark),
    )
    q = start_fanout_query(
        stream, subs, deliver, ckpt, query_name="auto-flip", mode="auto"
    )
    try:
        # batch 1: 3 routed rows <= 10 -> driver path
        _write_jsonl(
            f"{feed_dir}/f1.json",
            [
                _wal2json_line("insert", "events_a", ["id"], [i])
                for i in range(3)
            ],
        )
        q.processAllAvailable()
        assert driver_calls == [(1, 3)], "small batch must ride the driver"

        # batch 2: 30 routed rows > 10 -> executor path, same live query
        _write_jsonl(
            f"{feed_dir}/f2.json",
            [
                _wal2json_line("insert", "events_a", ["id"], [i])
                for i in range(3, 33)
            ],
        )
        q.processAllAvailable()
        assert driver_calls == [(1, 3)], (
            "large batch must NOT touch the driver adapter"
        )

        # batch 3: small again -> flips BACK to the driver
        _write_jsonl(
            f"{feed_dir}/f3.json",
            [_wal2json_line("insert", "events_a", ["id"], [33])],
        )
        q.processAllAvailable()
        assert driver_calls == [(1, 3), (1, 1)]
    finally:
        q.stop()

    p = os.path.join(out_dir, "1", "outbox.jsonl")
    with open(p) as f:
        raw = [ln.rstrip("\n") for ln in f if ln.strip()]
    ids = [
        next(
            v
            for n, v in zip(c["columnnames"], c["columnvalues"])
            if n == "id"
        )
        for c in map(json.loads, raw)
    ]
    # exactly-once across BOTH delivery paths, batches in stream order
    assert sorted(ids) == list(range(34))
    assert ids[:3] == [0, 1, 2] and ids[-1] == 33
    # within the executor-path batch the documented order contract is
    # the deterministic change_json tiebreak (the file feed carries no
    # seq), identical to what fanout_batch's struct sort would produce
    assert raw[3:33] == sorted(raw[3:33])
    assert raw[:3] == sorted(raw[:3])


def _json_event_stream(spark, feed_dir):
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("event_id", LongType()),
        ]
    )
    return spark.readStream.schema(schema).json(feed_dir)


def test_stream_stream_interval_join_matches_batch_twin(
    spark, tmp_path
):
    """T-family stream-stream join (q263's live form): two file
    streams joined on user within (0, 15 min] must emit exactly the
    batch twin's pairs, and a row arriving BEHIND the watermark must
    be dropped instead of joined (the state-purge contract that keeps
    stream-stream state bounded)."""
    from speculare_pgcdc_spark.streaming.joins import (
        interval_event_join,
    )

    pur_dir = str(tmp_path / "pur")
    err_dir = str(tmp_path / "err")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(pur_dir)
    os.makedirs(err_dir)

    def ev(uid, minute, eid):
        return {
            "user_id": uid,
            "ts": f"2024-01-01T10:{minute:02d}:00.000Z",
            "event_id": eid,
        }

    # batch 1: u1 purchase at 10:00 -> errors at 10:05 (join), 10:20
    # (outside 15 min); u2 purchase 10:30 with no error
    _write_jsonl(f"{pur_dir}/p1.json", [ev(1, 0, 100), ev(2, 30, 101)])
    _write_jsonl(f"{err_dir}/e1.json", [ev(1, 5, 200), ev(1, 20, 201)])

    joined = interval_event_join(
        _json_event_stream(spark, pur_dir),
        _json_event_stream(spark, err_dir),
        within="15 minutes",
        watermark="10 minutes",
    ).select("user_id", "l_event_id", "r_event_id")

    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            (r.user_id, r.l_event_id, r.r_event_id)
            for r in spark.sql("SELECT * FROM ssj").collect()
        }
        assert got1 == {(1, 100, 200)}

        # batch 2: advance both watermarks far past 10:30, then feed a
        # LATE error (10:02, behind the watermark) plus a fresh pair
        _write_jsonl(f"{pur_dir}/p2.json", [ev(3, 50, 102)])
        _write_jsonl(f"{err_dir}/e2.json", [ev(3, 55, 202)])
        q.processAllAvailable()
        _write_jsonl(f"{err_dir}/e3.json", [ev(1, 2, 203)])
        q.processAllAvailable()
        got2 = {
            (r.user_id, r.l_event_id, r.r_event_id)
            for r in spark.sql("SELECT * FROM ssj").collect()
        }
        # the fresh pair joined; the late error did NOT resurrect the
        # 10:00 purchase even though it is inside its 15-min window
        assert got2 == {(1, 100, 200), (3, 102, 202)}
    finally:
        q.stop()

    # cross-mode parity: the same builder on static frames over the
    # SAME rows equals the stream's on-time output
    rows_p = [ev(1, 0, 100), ev(2, 30, 101), ev(3, 50, 102)]
    rows_e = [ev(1, 5, 200), ev(1, 20, 201), ev(3, 55, 202)]
    _write_jsonl(f"{pur_dir}/all_p.jsonl", rows_p)
    _write_jsonl(f"{err_dir}/all_e.jsonl", rows_e)
    static_p = spark.read.json(
        f"{pur_dir}/all_p.jsonl",
        schema=_json_event_stream(spark, pur_dir).schema,
    )
    static_e = spark.read.json(
        f"{err_dir}/all_e.jsonl",
        schema=_json_event_stream(spark, err_dir).schema,
    )
    batch = {
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in interval_event_join(
            static_p, static_e, within="15 minutes"
        )
        .select("user_id", "l_event_id", "r_event_id")
        .collect()
    }
    assert batch == {(1, 100, 200), (3, 102, 202)}


def test_q279_watermark_picks_drive_real_stream_drops(
    spark, sf_dir, tmp_path
):
    """Close the loop from q279's lateness MEASUREMENT to T4's
    withWatermark SEMANTICS (r9 verdict item 3): the events a real
    watermarked stream drops are exactly the events q279 counts as
    late, on the same modeled-arrival feed.

    Three independent derivations are pinned against each other:
    (1) the registry q279 plan run on the feed subset (Spark md5
    arrival model, banded prefix-max), (2) a pure-Python hashlib
    re-derivation of the same model (also the boundary guard), and
    (3) a real per-event micro-batch stream through
    withWatermark(W) + dropDuplicates.

    Stream mechanics that make the parity EXACT: one file per batch
    in arrival order, each event followed by a heartbeat re-send of
    itself — the engine applies a batch's watermark from stats that
    lag one batch behind, so the heartbeat batch lets the watermark
    absorb event i before event i+1 arrives, making the effective
    watermark exactly q279's running prefix max minus W. Boundary
    convention differs (Spark drops lateness >= W, q279 counts
    > W), so the guard asserts the feed has no exact-boundary
    lateness (the fixture's microsecond-random ts make ties
    measure-zero)."""
    import hashlib

    from speculare_pgcdc_spark.catalog import table
    from speculare_pgcdc_spark.queries import load_all

    N = 70
    rows = (
        table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_micros("ts").alias("t"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("ts_str"),
        )
        .collect()
    )
    # (2) pure-Python arrival model (independent of Spark's md5/conv)
    def delay_s(eid: int) -> int:
        return int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16) % 900

    arr = sorted(
        ((r.t + 1_000_000 * delay_s(r.event_id), r.event_id, r.t, r.ts_str)
         for r in rows)
    )[:N]
    hw = None
    model = []  # (event_id, late_us)
    for _a, eid, t, _s in arr:
        late = max((hw - t), 0) if hw is not None else 0
        model.append((eid, late))
        hw = t if hw is None else max(hw, t)
    for _eid, late in model:
        assert late not in (60_000_000, 300_000_000), "boundary tie"
    exp_1m = {e for e, l in model if l > 60_000_000}
    exp_5m = {e for e, l in model if l > 300_000_000}
    assert exp_5m and len(exp_1m) > len(exp_5m), "vacuous feed prefix"

    # (1) the registry q279 plan on the same subset feed
    subset_dir = tmp_path / "subset"
    subset_ids = [eid for _a, eid, _t, _s in arr]
    (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id").isin(subset_ids))
        .select("event_id", "ts")
        .coalesce(1)
        .write.parquet(str(subset_dir / "events.parquet"))
    )
    q279 = load_all()["q279_watermark_lateness"].fn(
        spark, str(subset_dir)
    ).collect()[0]
    assert q279.n_events == N
    assert q279.n_late_1m == len(exp_1m)
    assert q279.n_late_5m == len(exp_5m)
    assert q279.n_late_1h == 0  # delay bound 900s < 1h, by construction

    # (3) a REAL watermarked stream per candidate pick
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    feed_dir = tmp_path / "feed"
    os.makedirs(feed_dir)
    t0 = 1_700_000_000
    i = 0
    for _a, eid, _t, ts_str in arr:
        for _rep in range(2):  # event batch + heartbeat batch
            p = str(feed_dir / f"{i:05d}.json")
            _write_jsonl(p, [{"ts": ts_str, "event_id": eid}])
            os.utime(p, (t0 + i, t0 + i))
            i += 1
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        for w_s, expected in ((60, exp_1m), (300, exp_5m)):
            src = (
                spark.readStream.schema("ts timestamp, event_id bigint")
                .option("maxFilesPerTrigger", 1)
                .json(str(feed_dir))
            )
            out = src.withWatermark(
                "ts", f"{w_s} seconds"
            ).dropDuplicates(["event_id"])
            q = (
                out.writeStream.format("memory")
                .queryName(f"t_q279_{w_s}")
                .outputMode("append")
                .option(
                    "checkpointLocation", str(tmp_path / f"ck{w_s}")
                )
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            survived = {
                r.event_id
                for r in spark.sql(
                    f"SELECT event_id FROM t_q279_{w_s}"
                ).collect()
            }
            assert set(subset_ids) - survived == expected, (
                f"W={w_s}s: stream dropped "
                f"{sorted(set(subset_ids) - survived)}, "
                f"q279 counted {sorted(expected)} late"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_scd2_incremental_stream_matches_batch_build(
    spark, sf_dir, tmp_path
):
    """SCD2 maintenance closes the CDC-consumer loop (the q281 twin,
    same pattern as q279's stream parity): maintaining the versioned
    dimension INCREMENTALLY — per change batch, through a real
    foreachBatch stream — must yield exactly the state q281's one-shot
    batch build computes over the full history. Also pinned batchwise
    (scd2_apply chained by hand) so a failure localizes to either the
    merge logic or the streaming harness."""
    from speculare_pgcdc_spark.catalog import table as t
    from speculare_pgcdc_spark.cdc.scd2 import STATE_COLS, scd2_apply
    from speculare_pgcdc_spark.queries import load_all

    orders = t(spark, sf_dir, "orders")
    expected = {
        tuple(r)
        for r in load_all()["q281_scd2_intervals"]
        .fn(spark, sf_dir)
        .collect()
    }

    # arrival chunks split on GLOBAL o_orderdate terciles: per key,
    # chunk order == valid_from order (the CDC commit-order contract);
    # equal dates stay in one chunk so in-batch tie ranking matches
    # q281's (o_orderdate, o_orderkey) total order
    dates = sorted(
        r.d
        for r in orders.select(
            F.col("o_orderdate").alias("d")
        ).distinct().collect()
    )
    d1 = dates[len(dates) // 3]
    d2 = dates[2 * len(dates) // 3]
    chunks = [
        orders.filter(F.col("o_orderdate") <= F.lit(d1)),
        orders.filter(
            (F.col("o_orderdate") > F.lit(d1))
            & (F.col("o_orderdate") <= F.lit(d2))
        ),
        orders.filter(F.col("o_orderdate") > F.lit(d2)),
    ]
    assert all(c.count() > 0 for c in chunks)

    # (1) pure-batch incremental chain
    state = None
    for c in chunks:
        state = scd2_apply(state, c)
        state = state.localCheckpoint(eager=True)
    got = {tuple(r) for r in state.select(*STATE_COLS).collect()}
    assert got == expected

    # (2) the same merge driven by a REAL stream, state on disk
    import glob as _glob
    import shutil as _shutil

    feed = tmp_path / "feed"
    os.makedirs(feed)
    t0 = 1_700_000_000
    for i, c in enumerate(chunks):
        tmp_out = str(tmp_path / f"chunk{i}")
        c.coalesce(1).write.parquet(tmp_out)
        part = _glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dst = str(feed / f"{i:05d}.parquet")
        _shutil.copy(part, dst)
        os.utime(dst, (t0 + i, t0 + i))
    state_dir = tmp_path / "scd2_state"
    versions: list[str] = []

    def upsert(batch_df, batch_id):
        prev = (
            batch_df.sparkSession.read.parquet(versions[-1])
            if versions
            else None
        )
        out = str(state_dir / f"v{batch_id}")
        scd2_apply(prev, batch_df).write.parquet(out)
        versions.append(out)

    src = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = (
        src.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    assert len(versions) == 3
    streamed = {
        tuple(r)
        for r in spark.read.parquet(versions[-1])
        .select(*STATE_COLS)
        .collect()
    }
    assert streamed == expected
    # sanity: exactly one open version per key at every checkpoint
    for v in versions:
        s = spark.read.parquet(v)
        assert (
            s.filter(F.col("valid_to").isNull()).count()
            == s.select("o_custkey").distinct().count()
        )


def _orders_frame(spark, rows):
    """Tiny orders-shaped frame for SCD2 contract tests:
    rows = [(orderkey, custkey, 'YYYY-MM-DD', status, totalprice)]."""
    return spark.createDataFrame(
        [
            (int(ok), int(ck), d, st, float(tp))
            for ok, ck, d, st, tp in rows
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderdate string, "
        "o_orderstatus string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))


def test_scd2_cross_batch_equal_valid_from_ties_chain_like_one_shot(
    spark,
):
    """Round-10 advice (medium): a later batch row whose valid_from
    EQUALS the open version's but whose tie key (o_orderkey) is
    SMALLER must slot BEFORE the open row — q281's (valid_from,
    o_orderkey) total order — not after it. The old merge pinned the
    open row at a hardcoded front rank, so exactly this input
    silently diverged from the one-shot build; the state now stores
    each open version's real tie key and re-ranks with it."""
    from speculare_pgcdc_spark.cdc.scd2 import STATE_COLS, scd2_apply

    b1 = _orders_frame(
        spark,
        [
            (10, 1, "2024-01-01", "O", 1.0),
            # open version after batch 1: key 1, orderkey 30
            (30, 1, "2024-02-01", "F", 2.0),
            (40, 2, "2024-03-01", "O", 9.0),
        ],
    )
    b2 = _orders_frame(
        spark,
        [
            # SAME valid_from as key 1's open version, SMALLER tie:
            # one-shot order is 10 < 20 < 30
            (20, 1, "2024-02-01", "P", 5.0),
            (50, 2, "2024-04-01", "F", 7.0),
        ],
    )
    inc = scd2_apply(scd2_apply(None, b1), b2, validate=True)
    one_shot = scd2_apply(None, b1.unionByName(b2))
    got = {tuple(r) for r in inc.select(*STATE_COLS).collect()}
    want = {tuple(r) for r in one_shot.select(*STATE_COLS).collect()}
    assert got == want
    # and the tie really exercised the re-rank: key 1's version 2 is
    # the LATE-arriving orderkey 20, version 3 the old open row
    k1 = {
        r["version"]: (r["status"], r["valid_to"] is None)
        for r in inc.filter(F.col("o_custkey") == 1).collect()
    }
    assert k1[2] == ("P", False)
    assert k1[3] == ("F", True)


def test_scd2_late_batch_violates_contract(spark):
    """Negative precondition test (round-10 verdict item 3): a batch
    row with valid_from STRICTLY EARLIER than the key's open version
    belongs before an already-closed version whose valid_to the merge
    never rewrites. validate=True must raise; without validation the
    documented wrong-output mode is a stale valid_to on that closed
    version (pinned here so the failure mode stays what the module
    docstring says it is)."""
    import pytest as _pytest

    from speculare_pgcdc_spark.cdc.scd2 import STATE_COLS, scd2_apply

    b1 = _orders_frame(
        spark,
        [
            (10, 1, "2024-01-01", "O", 1.0),
            (30, 1, "2024-03-01", "F", 2.0),
        ],
    )
    late = _orders_frame(spark, [(20, 1, "2024-02-01", "P", 5.0)])
    state = scd2_apply(None, b1)
    with _pytest.raises(ValueError, match="strictly earlier"):
        scd2_apply(state, late, validate=True)
    # silent mode diverges exactly as documented: version 1 keeps
    # valid_to = 2024-03-01 (stale), one-shot closes it at 2024-02-01
    silent = scd2_apply(state, late)
    one_shot = scd2_apply(None, b1.unionByName(late))
    got = {tuple(r) for r in silent.select(*STATE_COLS).collect()}
    want = {tuple(r) for r in one_shot.select(*STATE_COLS).collect()}
    assert got != want
    v1_silent = silent.filter(F.col("version") == 1).collect()[0]
    v1_shot = one_shot.filter(F.col("version") == 1).collect()[0]
    assert str(v1_silent["valid_to"]) == "2024-03-01"
    assert str(v1_shot["valid_to"]) == "2024-02-01"


def test_streaming_matview_incremental_refresh(spark, tmp_path):
    """start_matview_query (round-12, the q97 IVM's streaming twin):
    snapshot AND aggregate view maintained per microbatch; after the
    drain the view equals a full recompute of the final snapshot, a
    poisoned untouched-group row proves carry-forward (not recompute),
    and a second drain with no new input is a no-op."""
    from speculare_pgcdc_spark.cdc.apply import start_matview_query
    from speculare_pgcdc_spark.cdc.pipeline import parse_wal2json

    feed_dir = str(tmp_path / "feed")
    snap = str(tmp_path / "snapshot")
    mv = str(tmp_path / "matview")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)
    cols = {"id": "bigint", "grp": "string", "v": "bigint"}

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "id bigint, grp string, v bigint",
    )
    base.write.parquet(snap)

    def aggs():
        return [
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sv"),
        ]

    # the initial view: a full aggregate of the base, with group 'c'
    # POISONED — if the refresh recomputes untouched groups the poison
    # heals and the carry-forward property is disproven
    base.groupBy("grp").agg(*aggs()).withColumn(
        "sv",
        F.when(F.col("grp") == "c", F.lit(999)).otherwise(F.col("sv")),
    ).write.parquet(mv)

    def chg(kind, id_, grp=None, v=None):
        if kind == "delete":
            return {"change": [{
                "kind": "delete", "table": "t",
                "oldkeys": {"keynames": ["id"], "keyvalues": [id_]},
            }]}
        return {"change": [{
            "kind": kind, "table": "t",
            "columnnames": ["id", "grp", "v"],
            "columnvalues": [id_, grp, v],
        }]}

    batches = [
        [chg("update", 1, "a", 11), chg("insert", 5, "b", 50)],
        [chg("delete", 3), chg("update", 5, "b", 55)],
    ]
    for i, msgs in enumerate(batches):
        with open(f"{feed_dir}/f{i}.json", "w") as f:
            for m in msgs:
                f.write(json.dumps(m) + "\n")

    def drain():
        stream = parse_wal2json(
            file_change_feed(spark, feed_dir)
        ).withColumn("table_name", F.col("table"))
        q = start_matview_query(
            stream, snap, mv, ckpt, "id", cols, "grp", aggs
        )
        q.processAllAvailable()
        q.stop()

    drain()
    # final state: 1->(a,11), 2->(a,20), 4->(c,40), 5->(b,55)
    got_mv = {
        r["grp"]: (r["n"], r["sv"])
        for r in spark.read.parquet(mv).collect()
    }
    assert got_mv == {"a": (2, 31), "b": (1, 55), "c": (1, 999)}, got_mv
    # 'c' kept the poison (carried forward, never touched); the other
    # groups equal a full recompute of the final snapshot
    recomputed = {
        r["grp"]: (r["n"], r["sv"])
        for r in spark.read.parquet(snap)
        .groupBy("grp").agg(*aggs()).collect()
    }
    assert recomputed == {"a": (2, 31), "b": (1, 55), "c": (1, 40)}

    drain()  # no new files: both artifacts unchanged
    again = {
        r["grp"]: (r["n"], r["sv"])
        for r in spark.read.parquet(mv).collect()
    }
    assert again == got_mv


def test_start_scd2_query_swaps_state_in_place(spark, sf_dir, tmp_path):
    """start_scd2_query (round-12, the packaged SCD2 streaming
    consumer): the in-place atomically-swapped state dir converges to
    the one-shot q281 build over the full history, and a second drain
    with no new input leaves it unchanged."""
    import glob as _glob
    import shutil as _shutil

    from speculare_pgcdc_spark.catalog import table as t
    from speculare_pgcdc_spark.cdc.scd2 import (
        STATE_COLS,
        start_scd2_query,
    )
    from speculare_pgcdc_spark.queries import load_all

    orders = t(spark, sf_dir, "orders")
    expected = {
        tuple(r)
        for r in load_all()["q281_scd2_intervals"]
        .fn(spark, sf_dir)
        .collect()
    }

    dates = sorted(
        r.d
        for r in orders.select(
            F.col("o_orderdate").alias("d")
        ).distinct().collect()
    )
    d1 = dates[len(dates) // 3]
    d2 = dates[2 * len(dates) // 3]
    chunks = [
        orders.filter(F.col("o_orderdate") <= F.lit(d1)),
        orders.filter(
            (F.col("o_orderdate") > F.lit(d1))
            & (F.col("o_orderdate") <= F.lit(d2))
        ),
        orders.filter(F.col("o_orderdate") > F.lit(d2)),
    ]

    feed = tmp_path / "scd2q_feed"
    os.makedirs(feed)
    t0 = 1_700_000_000
    for i, c in enumerate(chunks):
        tmp_out = str(tmp_path / f"scd2q_chunk{i}")
        c.coalesce(1).write.parquet(tmp_out)
        part = _glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dst = str(feed / f"{i:05d}.parquet")
        _shutil.copy(part, dst)
        os.utime(dst, (t0 + i, t0 + i))

    state_dir = str(tmp_path / "scd2q_state")
    ckpt = str(tmp_path / "scd2q_ck")

    def drain():
        src = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed))
        )
        q = start_scd2_query(
            src, state_dir, ckpt, validate=True, available_now=True
        )
        q.awaitTermination(300)
        q.stop()

    drain()
    got = {
        tuple(r)
        for r in spark.read.parquet(state_dir)
        .select(*STATE_COLS).collect()
    }
    assert got == expected

    drain()  # no new files -> unchanged
    again = {
        tuple(r)
        for r in spark.read.parquet(state_dir)
        .select(*STATE_COLS).collect()
    }
    assert again == expected


# ---------------------------------------------------------------------------
# Round-13: banded (partition-confined) IVM + the two crash-window
# fixes from the round-12 advice. All three consumers share the
# at-least-once foreachBatch model; these tests pin the exact crash
# windows the recovery doctrines claim to cover.
# ---------------------------------------------------------------------------


def _mv_chg(kind, id_, grp=None, v=None):
    if kind == "delete":
        return {"change": [{
            "kind": "delete", "table": "t",
            "oldkeys": {"keynames": ["id"], "keyvalues": [id_]},
        }]}
    return {"change": [{
        "kind": kind, "table": "t",
        "columnnames": ["id", "grp", "v"],
        "columnvalues": [id_, grp, v],
    }]}


def _mv_stream(spark, feed_dir):
    return parse_wal2json(
        file_change_feed(spark, feed_dir)
    ).withColumn("table_name", F.col("table"))


def test_streaming_matview_banded_confined_rewrite(spark, tmp_path):
    """start_matview_query_banded: same end state as the full-rewrite
    consumer (view == recompute, poison proves carry-forward), AND the
    rewrite is physically confined — a band no batch touches keeps its
    exact parquet files (names + mtimes) across the drain."""
    from speculare_pgcdc_spark.cdc.apply import (
        read_banded_snapshot,
        start_matview_query_banded,
        write_banded_snapshot,
    )

    feed_dir = str(tmp_path / "feedb")
    snap = str(tmp_path / "snapb")
    mv = str(tmp_path / "mvb")
    ckpt = str(tmp_path / "ckptb")
    os.makedirs(feed_dir)
    cols = {"id": "bigint", "grp": "string", "v": "bigint"}

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40),
         (100, "c", 400)],
        "id bigint, grp string, v bigint",
    )
    # key range 1..100 over 32 bands -> width 4: ids 1-3 band 0,
    # ids 4-5 band 1, id 100 band 25 (never touched below)
    width = write_banded_snapshot(base, snap, "id", n_bands=32)
    assert width == 4

    def aggs():
        return [
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sv"),
        ]

    base.groupBy("grp").agg(*aggs()).withColumn(
        "sv",
        F.when(F.col("grp") == "c", F.lit(999)).otherwise(F.col("sv")),
    ).write.parquet(mv)

    batches = [
        [_mv_chg("update", 1, "a", 11), _mv_chg("insert", 5, "b", 50)],
        [_mv_chg("delete", 3), _mv_chg("update", 5, "b", 55)],
    ]
    for i, msgs in enumerate(batches):
        with open(f"{feed_dir}/f{i}.json", "w") as f:
            for m in msgs:
                f.write(json.dumps(m) + "\n")

    untouched_band = os.path.join(snap, "band=25")
    before = {
        p: os.path.getmtime(os.path.join(untouched_band, p))
        for p in os.listdir(untouched_band)
    }

    q = start_matview_query_banded(
        _mv_stream(spark, feed_dir), snap, mv, ckpt, "id", cols,
        "grp", aggs, available_now=True,
    )
    q.processAllAvailable()
    q.stop()

    after = {
        p: os.path.getmtime(os.path.join(untouched_band, p))
        for p in os.listdir(untouched_band)
    }
    assert after == before  # band 25 physically untouched

    got_snap = {
        (r["id"], r["grp"], r["v"])
        for r in read_banded_snapshot(spark, snap).collect()
    }
    assert got_snap == {
        (1, "a", 11), (2, "a", 20), (4, "c", 40), (5, "b", 55),
        (100, "c", 400),
    }
    got_mv = {
        r["grp"]: (r["n"], r["sv"])
        for r in spark.read.parquet(mv).collect()
    }
    # 'c' keeps the poison (carried forward — neither c-row changed)
    assert got_mv == {"a": (2, 31), "b": (1, 55), "c": (2, 999)}, got_mv


def test_matview_commit_order_crash_between_commits(
    spark, tmp_path, monkeypatch
):
    """Round-12 advice pin (apply.py): crash AFTER the matview commit
    but BEFORE the snapshot commit, then replay. The view must
    converge — in particular the OLD group of a delete and of a
    group-moving update must disappear, which is exactly what the old
    snapshot-first commit order lost forever."""
    from speculare_pgcdc_spark.cdc import apply as apply_mod
    from speculare_pgcdc_spark.cdc.apply import start_matview_query

    feed_dir = str(tmp_path / "feedc")
    snap = str(tmp_path / "snapc")
    mv = str(tmp_path / "mvc")
    ckpt = str(tmp_path / "ckptc")
    os.makedirs(feed_dir)
    cols = {"id": "bigint", "grp": "string", "v": "bigint"}

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id bigint, grp string, v bigint",
    )
    base.write.parquet(snap)

    def aggs():
        return [
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sv"),
        ]

    base.groupBy("grp").agg(*aggs()).write.parquet(mv)

    # one batch: delete id1 (old group 'a') + move id2 'b' -> 'd'
    with open(f"{feed_dir}/f0.json", "w") as f:
        f.write(json.dumps(_mv_chg("delete", 1)) + "\n")
        f.write(json.dumps(_mv_chg("update", 2, "d", 20)) + "\n")

    real_commit = apply_mod._swap_commit

    def crash_on_snapshot(d, batch_id):
        if d == snap:
            raise RuntimeError("injected crash between commits")
        real_commit(d, batch_id)

    monkeypatch.setattr(apply_mod, "_swap_commit", crash_on_snapshot)
    q = start_matview_query(
        _mv_stream(spark, feed_dir), snap, mv, ckpt, "id", cols,
        "grp", aggs, available_now=True,
    )
    with pytest.raises(Exception, match="injected crash"):
        q.processAllAvailable()
    q.stop()

    # the crash window: view is post-batch, snapshot still pre-batch
    assert {r["id"] for r in spark.read.parquet(snap).collect()} == \
        {1, 2, 3}
    monkeypatch.setattr(apply_mod, "_swap_commit", real_commit)

    q = start_matview_query(
        _mv_stream(spark, feed_dir), snap, mv, ckpt, "id", cols,
        "grp", aggs, available_now=True,
    )
    q.processAllAvailable()
    q.stop()

    got_mv = {
        r["grp"]: (r["n"], r["sv"])
        for r in spark.read.parquet(mv).collect()
    }
    assert got_mv == {"c": (1, 30), "d": (1, 20)}, got_mv
    recomputed = {
        r["grp"]: (r["n"], r["sv"])
        for r in spark.read.parquet(snap)
        .groupBy("grp").agg(*aggs()).collect()
    }
    assert got_mv == recomputed


def test_banded_matview_partial_band_commit_converges(
    spark, tmp_path, monkeypatch
):
    """Banded consumer crash doctrine: view committed, then only SOME
    touched bands swapped before the crash. The replay applies the
    batch against the mixed snapshot — already-swapped bands re-apply
    as no-ops — and both artifacts converge."""
    from speculare_pgcdc_spark.cdc import apply as apply_mod
    from speculare_pgcdc_spark.cdc.apply import (
        read_banded_snapshot,
        start_matview_query_banded,
        write_banded_snapshot,
    )

    feed_dir = str(tmp_path / "feedd")
    snap = str(tmp_path / "snapd")
    mv = str(tmp_path / "mvd")
    ckpt = str(tmp_path / "ckptd")
    os.makedirs(feed_dir)
    cols = {"id": "bigint", "grp": "string", "v": "bigint"}

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (4, "c", 40), (100, "c", 400)],
        "id bigint, grp string, v bigint",
    )
    write_banded_snapshot(base, snap, "id", n_bands=32)  # width 4

    def aggs():
        return [
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sv"),
        ]

    base.groupBy("grp").agg(*aggs()).write.parquet(mv)

    # one batch touching bands 0 (delete id1) and 1 (update id4)
    with open(f"{feed_dir}/f0.json", "w") as f:
        f.write(json.dumps(_mv_chg("delete", 1)) + "\n")
        f.write(json.dumps(_mv_chg("update", 4, "c", 44)) + "\n")

    real_bands = apply_mod._commit_bands

    def partial_commit(root, tmp, bands):
        real_bands(root, tmp, bands[:1])  # band 0 lands, tmp dropped
        raise RuntimeError("injected crash mid-band-commit")

    monkeypatch.setattr(apply_mod, "_commit_bands", partial_commit)
    q = start_matview_query_banded(
        _mv_stream(spark, feed_dir), snap, mv, ckpt, "id", cols,
        "grp", aggs, available_now=True,
    )
    with pytest.raises(Exception, match="injected crash"):
        q.processAllAvailable()
    q.stop()

    mixed = {r["id"] for r in read_banded_snapshot(spark, snap).collect()}
    assert mixed == {2, 4, 100}  # band 0 post-batch, band 1 pre-batch
    monkeypatch.setattr(apply_mod, "_commit_bands", real_bands)

    q = start_matview_query_banded(
        _mv_stream(spark, feed_dir), snap, mv, ckpt, "id", cols,
        "grp", aggs, available_now=True,
    )
    q.processAllAvailable()
    q.stop()

    got_snap = {
        (r["id"], r["grp"], r["v"])
        for r in read_banded_snapshot(spark, snap).collect()
    }
    assert got_snap == {(2, "a", 20), (4, "c", 44), (100, "c", 400)}
    got_mv = {
        r["grp"]: (r["n"], r["sv"])
        for r in spark.read.parquet(mv).collect()
    }
    assert got_mv == {"a": (1, 20), "c": (2, 444)}, got_mv


def test_scd2_replay_after_swap_is_noop(spark, tmp_path, monkeypatch):
    """Round-12 advice pin (scd2.py): scd2_apply is NOT idempotent, so
    a crash after the state swap but before the checkpoint commit used
    to re-merge the batch into the POST-merge state on replay,
    duplicating every version. The _applied_batch_id marker makes the
    replayed batch a no-op; final state equals the one-shot build."""
    import glob as _glob
    import shutil as _shutil

    from speculare_pgcdc_spark.cdc import scd2 as scd2_mod
    from speculare_pgcdc_spark.cdc.scd2 import (
        STATE_COLS,
        scd2_apply,
        start_scd2_query,
    )

    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderdate date, "
        "o_orderstatus string, o_totalprice double"
    )
    c0 = spark.createDataFrame(
        [(1, 7, _dt.date(2024, 1, 1), "O", 10.0),
         (2, 7, _dt.date(2024, 2, 1), "O", 11.0),
         (3, 9, _dt.date(2024, 1, 15), "O", 30.0)],
        schema,
    )
    c1 = spark.createDataFrame(
        [(4, 7, _dt.date(2024, 3, 1), "F", 12.0),
         (5, 9, _dt.date(2024, 2, 15), "F", 31.0)],
        schema,
    )
    one_shot = {
        tuple(r)
        for r in scd2_apply(None, c0.unionByName(c1))
        .select(*STATE_COLS).collect()
    }

    feed = tmp_path / "scd2r_feed"
    os.makedirs(feed)
    t0 = 1_700_000_000
    for i, c in enumerate([c0, c1]):
        tmp_out = str(tmp_path / f"scd2r_chunk{i}")
        c.coalesce(1).write.parquet(tmp_out)
        part = _glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dst = str(feed / f"{i:05d}.parquet")
        _shutil.copy(part, dst)
        os.utime(dst, (t0 + i, t0 + i))

    state_dir = str(tmp_path / "scd2r_state")
    ckpt = str(tmp_path / "scd2r_ck")

    real_swap = scd2_mod._finalize_swap

    def swap_then_crash(sd, tmp):
        real_swap(sd, tmp)
        raise RuntimeError("injected crash after swap")

    def drain():
        src = (
            spark.readStream.schema(c0.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed))
        )
        q = start_scd2_query(src, state_dir, ckpt, available_now=True)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # batch 0: state swaps, THEN the crash lands — Spark never records
    # the batch as committed, so the restart must replay it
    monkeypatch.setattr(scd2_mod, "_finalize_swap", swap_then_crash)
    with pytest.raises(Exception, match="injected crash"):
        drain()
    assert os.path.exists(os.path.join(state_dir, "_applied_batch_id"))

    monkeypatch.setattr(scd2_mod, "_finalize_swap", real_swap)
    drain()  # replays batch 0 (no-op via marker), then batch 1

    got = {
        tuple(r)
        for r in spark.read.parquet(state_dir)
        .select(*STATE_COLS).collect()
    }
    assert got == one_shot
    # no duplicated versions: one row per order
    assert spark.read.parquet(state_dir).count() == 5


def test_banded_matview_partials_mode(spark, tmp_path, monkeypatch):
    """Band-partial maintenance (round-13): the view is merged from
    per-(band, group) partials, touched bands' partials rebuilt from
    the new band content — no snapshot-scale scan. End state equals a
    full recompute (including after an injected mid-band-commit
    crash + replay), untouched bands keep their physical files."""
    from speculare_pgcdc_spark.cdc import apply as apply_mod
    from speculare_pgcdc_spark.cdc.apply import (
        read_banded_snapshot,
        seed_band_partials,
        start_matview_query_banded,
        write_banded_snapshot,
    )

    feed_dir = str(tmp_path / "feedp")
    snap = str(tmp_path / "snapp")
    mv = str(tmp_path / "mvp")
    parts = str(tmp_path / "partsp")
    ckpt = str(tmp_path / "ckptp")
    os.makedirs(feed_dir)
    cols = {"id": "bigint", "grp": "string", "v": "bigint"}

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40),
         (100, "c", 400)],
        "id bigint, grp string, v bigint",
    )
    write_banded_snapshot(base, snap, "id", n_bands=32)  # width 4

    def aggs():
        return [
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sv"),
        ]

    def merges():
        return [
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sv").cast("bigint").alias("sv"),
        ]

    seed_band_partials(spark, snap, "grp", aggs, parts)
    base.groupBy("grp").agg(*aggs()).write.parquet(mv)

    batches = [
        [_mv_chg("update", 1, "a", 11), _mv_chg("insert", 5, "b", 50)],
        [_mv_chg("delete", 3), _mv_chg("update", 5, "d", 55)],
    ]
    for i, msgs in enumerate(batches):
        with open(f"{feed_dir}/f{i}.json", "w") as f:
            for m in msgs:
                f.write(json.dumps(m) + "\n")

    untouched_band = os.path.join(snap, "band=25")
    before = {
        p: os.path.getmtime(os.path.join(untouched_band, p))
        for p in os.listdir(untouched_band)
    }

    # inject a crash after the FIRST band of the first processed
    # batch commits, then let the replay converge everything
    real_bands = apply_mod._commit_bands
    crashed = []

    def partial_commit(root, tmp, bands):
        if not crashed:
            crashed.append(True)
            real_bands(root, tmp, bands[:1])
            raise RuntimeError("injected crash mid-band-commit")
        real_bands(root, tmp, bands)

    monkeypatch.setattr(apply_mod, "_commit_bands", partial_commit)

    def drain():
        return start_matview_query_banded(
            _mv_stream(spark, feed_dir), snap, mv, ckpt, "id", cols,
            "grp", aggs, available_now=True,
            merge_cols_fn=merges, partials_dir=parts,
        )

    q = drain()
    with pytest.raises(Exception, match="injected crash"):
        q.processAllAvailable()
    q.stop()
    q = drain()
    q.processAllAvailable()
    q.stop()

    after = {
        p: os.path.getmtime(os.path.join(untouched_band, p))
        for p in os.listdir(untouched_band)
    }
    assert after == before  # band 25 physically untouched

    final = read_banded_snapshot(spark, snap)
    got_snap = {
        (r["id"], r["grp"], r["v"]) for r in final.collect()
    }
    assert got_snap == {
        (1, "a", 11), (2, "a", 20), (4, "c", 40), (5, "d", 55),
        (100, "c", 400),
    }
    got_mv = {
        r["grp"]: (r["n"], r["sv"])
        for r in spark.read.parquet(mv).collect()
    }
    full = {
        r["grp"]: (r["n"], r["sv"])
        for r in final.groupBy("grp").agg(*aggs()).collect()
    }
    assert got_mv == full == {
        "a": (2, 31), "c": (2, 440), "d": (1, 55),
    }, (got_mv, full)
    # partials state equals a per-band recompute of the final snapshot
    got_parts = {
        (r["band"], r["grp"]): (r["n"], r["sv"])
        for r in spark.read.parquet(parts).collect()
    }
    want_parts = {
        (r["band"], r["grp"]): (r["n"], r["sv"])
        for r in spark.read.parquet(snap)
        .groupBy("band", "grp").agg(*aggs()).collect()
    }
    assert got_parts == want_parts


def test_scd2_banded_state_parity_and_partial_commit(
    spark, sf_dir, tmp_path, monkeypatch
):
    """start_scd2_query_banded (round-13): the key-banded SCD2 state
    converges to the one-shot q281 build over the full history, only
    the bands containing a batch's keys are rewritten, and a crash
    that commits SOME bands (with their per-band _applied_batch_id
    markers) replays to the same parity — the marker skips re-merging
    the already-swapped bands, whose re-merge would duplicate
    versions because scd2_apply is not idempotent."""
    import glob as _glob
    import shutil as _shutil

    from speculare_pgcdc_spark.catalog import table as t
    from speculare_pgcdc_spark.cdc import apply as apply_mod
    from speculare_pgcdc_spark.cdc.apply import write_banded_snapshot
    from speculare_pgcdc_spark.cdc.scd2 import (
        STATE_COLS,
        STORED_COLS,
        scd2_apply,
        start_scd2_query_banded,
    )
    from speculare_pgcdc_spark.queries import load_all

    orders = t(spark, sf_dir, "orders")
    expected = {
        tuple(r)
        for r in load_all()["q281_scd2_intervals"]
        .fn(spark, sf_dir)
        .collect()
    }

    dates = sorted(
        r.d
        for r in orders.select(
            F.col("o_orderdate").alias("d")
        ).distinct().collect()
    )
    d1 = dates[len(dates) // 2]
    chunks = [
        orders.filter(F.col("o_orderdate") <= F.lit(d1)),
        orders.filter(F.col("o_orderdate") > F.lit(d1)),
    ]

    feed = tmp_path / "scd2b_feed"
    os.makedirs(feed)
    t0 = 1_700_000_000
    for i, c in enumerate(chunks):
        tmp_out = str(tmp_path / f"scd2b_chunk{i}")
        c.coalesce(1).write.parquet(tmp_out)
        part = _glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dst = str(feed / f"{i:05d}.parquet")
        _shutil.copy(part, dst)
        os.utime(dst, (t0 + i, t0 + i))

    state_dir = str(tmp_path / "scd2b_state")
    ckpt = str(tmp_path / "scd2b_ck")
    # seed: EMPTY banded state, explicit width over the custkey range
    max_ck = orders.agg(F.max("o_custkey")).first()[0]
    empty = scd2_apply(None, orders).filter(F.lit(False)).select(
        *STORED_COLS
    )
    write_banded_snapshot(
        empty, state_dir, "o_custkey",
        band_width=max(1, int(max_ck) // 8 + 1),
    )

    real_bands = apply_mod._commit_bands
    crashed = []

    def partial_commit(root, tmp, bands):
        if not crashed and len(bands) > 1:
            crashed.append(True)
            real_bands(root, tmp, bands[: len(bands) // 2])
            raise RuntimeError("injected crash mid-band-commit")
        real_bands(root, tmp, bands)

    monkeypatch.setattr(apply_mod, "_commit_bands", partial_commit)

    def drain():
        src = (
            spark.readStream.schema(orders.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed))
        )
        q = start_scd2_query_banded(
            src, state_dir, ckpt, validate=True, available_now=True
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    with pytest.raises(Exception, match="injected crash"):
        drain()
    # crash window: some bands carry batch 0, some are still empty
    drain()  # replay batch 0 (marked bands skipped), then batch 1

    got = {
        tuple(r)
        for r in spark.read.parquet(state_dir)
        .select(*STATE_COLS).collect()
    }
    assert got == expected
    # no duplicated versions anywhere: one row per order
    assert spark.read.parquet(state_dir).count() == orders.count()


def test_scd2_banded_null_keys_dropped_not_wedged(spark, sf_dir, tmp_path):
    """Round-14 advice pin: a batch row with NULL o_custkey used to
    produce band NULL, and sorted([None, int, ...]) raised TypeError
    on EVERY replay — permanently wedging the banded SCD2 stream. The
    single-parse rows frame now drops NULL keys before banding (the
    latest_changes null-key guard), so the stream drains and the
    state equals the non-null one-shot build."""
    import glob as _glob
    import shutil as _shutil

    from speculare_pgcdc_spark.catalog import table as t
    from speculare_pgcdc_spark.cdc.apply import write_banded_snapshot
    from speculare_pgcdc_spark.cdc.scd2 import (
        STATE_COLS,
        STORED_COLS,
        scd2_apply,
        start_scd2_query_banded,
    )

    orders = t(spark, sf_dir, "orders").limit(200).cache()
    # poison 1 in 5 rows with a NULL key
    poisoned = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
            F.col("o_custkey")
        ),
    )
    clean = poisoned.filter(F.col("o_custkey").isNotNull())
    expected = {
        tuple(r)
        for r in scd2_apply(None, clean).select(*STATE_COLS).collect()
    }

    feed = tmp_path / "scd2n_feed"
    os.makedirs(feed)
    tmp_out = str(tmp_path / "scd2n_chunk")
    poisoned.coalesce(1).write.parquet(tmp_out)
    part = _glob.glob(f"{tmp_out}/part-*.parquet")[0]
    _shutil.copy(part, str(feed / "00000.parquet"))

    state_dir = str(tmp_path / "scd2n_state")
    max_ck = orders.agg(F.max("o_custkey")).first()[0]
    empty = scd2_apply(None, orders).filter(F.lit(False)).select(
        *STORED_COLS
    )
    write_banded_snapshot(
        empty, state_dir, "o_custkey",
        band_width=max(1, int(max_ck) // 4 + 1),
    )

    src = (
        spark.readStream.schema(poisoned.schema)
        .parquet(str(feed))
    )
    q = start_scd2_query_banded(
        src, state_dir, str(tmp_path / "scd2n_ck"), available_now=True
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        tuple(r)
        for r in spark.read.parquet(state_dir)
        .select(*STATE_COLS).collect()
    }
    assert got == expected
