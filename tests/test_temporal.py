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
