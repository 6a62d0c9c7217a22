"""Equivalence between the arithmetic oracle forms (q37/q38) and Spark's
built-in window operators (F.window / F.session_window) — the t2
contract's 'two forms agree' tests (SURVEY Q37/Q38 notes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.queries import load_all
from speculare_pgcdc_spark.streaming.windows import (
    session_counts,
    tumbling_counts,
)

REGISTRY = load_all()


def test_f_window_equals_epoch_arithmetic(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    via_window = (
        tumbling_counts(events)
        .select(
            F.floor(F.col("w.start").cast("double") / 3600.0)
            .cast("bigint")
            .alias("bucket"),
            "event_type",
            "c",
            "s",
        )
    )
    arith = REGISTRY["q37_tumbling_window"].fn(spark, sf_dir)
    a = {(r.bucket, r.event_type): (r.c, r.s) for r in via_window.collect()}
    b = {(r.bucket, r.event_type): (r.c, r.s) for r in arith.collect()}
    assert a == b


def test_session_window_equals_gaps_and_islands(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    built_in = session_counts(events)  # F.session_window, 30 min gap
    gi = REGISTRY["q38_session_window"].fn(spark, sf_dir)
    # compare per-user sorted session sizes and boundaries
    a = sorted(
        (r.user_id, r.w.start, r.w.end, r.n) for r in built_in.collect()
    )
    # session_window end = last ts + gap
    import datetime

    gap = datetime.timedelta(minutes=30)
    b = sorted((r.user_id, r.st, r.en + gap, r.n) for r in gi.collect())
    assert a == b


def test_epoch_arith_both_parquet_timestamp_flavors(spark, tmp_path):
    """Fixture regeneration flipped parquet timestamps from UTC-adjusted
    to naive between rounds 1 and 2 and silently broke every epoch-cast
    query. Pin both flavors: the q37 shape must produce IDENTICAL
    results whether ts is stored isAdjustedToUTC=true or false (UTC
    session => naive == UTC instant)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from speculare_pgcdc_spark.queries import load_all

    base = dt.datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        (i, base + dt.timedelta(minutes=37 * i), i % 3, f"t{i % 2}",
         float(i) + 0.25, "{}")
        for i in range(10)
    ]
    names = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    results = {}
    for flavor, ts_type in (
        ("naive", pa.timestamp("us")),
        ("utc", pa.timestamp("us", tz="UTC")),
    ):
        d = tmp_path / flavor
        d.mkdir()
        cols = list(zip(*rows))
        tbl = pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(cols[1], ts_type),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        )
        pq.write_table(tbl, d / "events.parquet")
        df = load_all()["q37_tumbling_window"].fn(spark, str(d))
        results[flavor] = [tuple(r) for r in df.collect()]
    assert results["naive"] == results["utc"]
    assert len(results["naive"]) > 0


def test_epoch_seconds_survives_ntz_reads(spark, tmp_path):
    """epoch_seconds must stay legal even when a session DOES read naive
    parquet as TIMESTAMP_NTZ (the helper is the seatbelt if the session
    conf regresses)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from speculare_pgcdc_spark.functions import epoch_seconds

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    tbl = pa.table({"ts": pa.array([t0], pa.timestamp("us"))})
    pq.write_table(tbl, tmp_path / "t.parquet")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        df = spark.read.parquet(str(tmp_path / "t.parquet"))
        assert dict(df.dtypes)["ts"] == "timestamp_ntz"
        got = df.select(epoch_seconds("ts").alias("e")).collect()[0].e
        assert got == t0.replace(tzinfo=dt.timezone.utc).timestamp()
    finally:
        spark.conf.set(
            "spark.sql.parquet.inferTimestampNTZ.enabled", "false"
        )
