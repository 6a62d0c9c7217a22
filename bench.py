"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Materialization is a noop datasource write (no driver collect — measuring
the engine, not Arrow transfer to Python).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from speculare_pgcdc_spark.queries import load_all
from speculare_pgcdc_spark.session import get_spark

#: second bench tier: heavy joins, window families, time-series, the
#: scale rewrites, CDC v2 — broader coverage whose totals are reported
#: SEPARATELY so "value" (the tier-1 headline total) stays comparable
#: to BASELINE.md and across rounds. q48 (all-pairs embedding baseline)
#: is deliberately absent: quadratic in corpus size, it stops being a
#: benchmark above sf0.01 — q71 is its scale-path representative.
TIER2 = [
    "q56_tpch_q3_shipping_priority",
    "q58_tpch_q10_returned_items",
    "q60_tpch_q18_large_orders",
    "q68_salted_agg",
    "q69_rank_family",
    "q71_srp_neardup",
    "q73_gapfill_interpolate",
    "q79_jaccard_df_capped",
    "q80_range_frame_binned",
    "q81_cdc_pipeline_v2",
    "q83_label_centroids",
    "q87_contamination",
    "q88_chunking",
    "q96_cdc_apply",
    "q104_tpch_q8_market_share",
    "q112_tpch_q21_waiting_suppliers",
    "q114_ewma",
    # round-5 scale shapes: segment-grain corpus dedup, the sliding
    # DISTINCT rewrite, and the bucket-layout join (its timing includes
    # the one-off bucketed write — the amortized cost a warehouse pays
    # at layout time, reported honestly rather than hidden)
    "q143_segment_dedup",
    "q158_rolling_distinct_users",
    "q160_bucketed_join",
    # round-6 corpus-ops: segment-grain leakage audit (the widest new
    # shuffle) and the banded-rank RFM rewrite (3x banded ntile)
    "q191_split_leakage",
    "q130_rfm_segmentation",
    # round-6 late additions: term-filtered BM25 retrieval, the
    # token-grain negative-sampling table, and the union+struct-max
    # replica merge — the heaviest new shapes in their families
    "q201_bm25_topk",
    "q214_negative_sampling",
    "q225_lww_replica_merge",
    # round-7 additions: the keyed full-outer reconciliation join and
    # the prefix-filtered exact similarity join — the widest new
    # shuffles this round
    "q238_snapshot_diff",
    "q241_prefix_filter_join",
    # round-8 additions: the double-median value-grain pass, the 5-way
    # unpivot checksum scan, and the dense-graph wedge join — the
    # heaviest new shapes this round
    "q255_group_mad_outliers",
    "q265_column_checksums",
    "q267_triangle_count",
    # round-11 additions: the distinct-grain audience self-join and the
    # event-grain double-window feature column — the widest new shapes
    # in the feature-engineering batch
    "q295_type_cooccurrence_jaccard",
    "q299_events_since_purchase",
    # round-12 additions: the sessionize + session-key pair join (the
    # widest new shuffle chain) and the 60M-row-at-100x lineitem
    # rollup + orderkey reconciliation join
    "q315_sequential_pattern_support",
    "q309_order_total_audit",
]

#: the tier-2 set as of the PREVIOUS round (r12 verdict item 5):
#: tier-2 grows most rounds, so cross-round comparisons of
#: tier2_total conflate growth with regression. tier2_comparable_total
#: is computed over the intersection of the current set with this
#: snapshot, so a judge can diff it round-over-round; per-query
#: min+median for every tier-2 query ride the BENCH_DETAIL artifact
#: for attribution. INVARIANT: new-round queries are appended via
#: `TIER2 += [...]` BELOW this line, never added to the literal above,
#: so the snapshot always equals the prior round's set.
TIER2_PREV_ROUND = tuple(TIER2)

# round-13 additions: the triple-md5-window dedup waterfall and the
# token-grain OOV coverage audit — the heaviest new shapes this round
TIER2 += [
    "q322_dedup_waterfall",
    "q320_oov_rate",
]

# round-14 additions: the positional duplicate-span mask (gram-DF agg
# + dup-bounded coverage explode, the widest new shuffle chain) and
# the quantized-recall audit (brute-force pair frame + twin rank
# windows) — the heaviest new shapes this round
TIER2 += [
    "q324_duplicate_span_mask",
    "q330_quantized_recall",
]

# round-14 extension batch: the gram-grain novelty window (the one
# corpus-scale shuffle of the batch) and the broadcast-chained copy
# attribution — the two heaviest new shapes
TIER2 += [
    "q339_ngram_novelty",
    "q336_copy_direction",
]

# round-14 extension batch 2: the checkpointed gram frame + df agg +
# broadcast provenance join — the only corpus-scale shuffle of the
# q340-q347 batch
TIER2 += [
    "q343_template_provenance",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _jvm_gc_ms(spark) -> int | None:
    """Total JVM GC time (ms) across collectors — local mode only
    (driver and executors share one JVM, so this IS the engine's GC)."""
    try:
        mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        beans = mf.getGarbageCollectorMXBeans()
        return int(
            sum(
                beans.get(i).getCollectionTime()
                for i in range(beans.size())
            )
        )
    except Exception:  # noqa: BLE001 - diagnostics must never fail a run
        return None


def _host_diag() -> dict:
    """Box-state snapshot for cross-round attribution (round-10 verdict
    item 2: the CDC events/s min AND median moved while the pipeline
    code did not — the artifact must carry enough host context to tell
    environment drift from a real regression without a rerun)."""
    d: dict = {}
    try:
        d["loadavg_1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        mem = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                if k in ("MemTotal", "MemAvailable", "Cached"):
                    mem[k] = int(v.strip().split()[0])
        if mem:
            d["page_cached_mb"] = mem.get("Cached", 0) // 1024
            d["mem_available_mb"] = mem.get("MemAvailable", 0) // 1024
    except OSError:
        pass
    return d


def _best_of(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    tier1 = sorted(n for n, s in registry.items() if s.bench)
    specs = {n: registry[n] for n in tier1 + TIER2}

    spark = get_spark(app_name="speculare-pgcdc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once (not timed), and materialize the
    # CDC feed fixtures — they are INPUT to the q35/q36/q81 pipelines (in
    # production they arrive from the replication connection), so their
    # construction is scaffolding, not engine work
    warm_errors: dict[str, str] = {}
    try:
        registry["q01_scan_count"].fn(spark, sf_dir).collect()
        from speculare_pgcdc_spark.cdc.feedgen import (
            feed_messages,
            feed_messages_v2,
        )

        feed_messages(spark, sf_dir)
        feed_messages_v2(spark, sf_dir)
    except Exception as ex:  # noqa: BLE001 - the line must still print
        warm_errors["warmup"] = f"{type(ex).__name__}: {ex}"[:300]

    # steady-state measurement: one untimed warm run (plan compilation,
    # codegen JIT, broadcast build), then SPARK_GRAFT_BENCH_RUNS (>= 3)
    # timed ROUNDS over the whole suite — round-robin, so each query's
    # samples are spread across the bench's lifetime instead of taken
    # back-to-back, decorrelating the same-process interference that
    # made round-over-round deltas unattributable (round-3 verdict #7:
    # observed up to 1.5-2x run-to-run on a busy 32-core box). Reported
    # per query: MIN (the headline, comparable to BASELINE.md and prior
    # rounds) and MEDIAN (the noise indicator — a real regression moves
    # both; noise moves only the median).
    # Per-query failure ISOLATION: one broken query must cost its own
    # number, never the whole bench (round-2 lesson: a single analysis
    # error aborted the run before the JSON line printed — a round with
    # zero perf signal). Failures time out as null and are listed in
    # "errors"; the JSON line ALWAYS prints.
    runs = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in specs}
    errors: dict[str, str] = dict(warm_errors)
    # q160 split timing (r13 verdict #4): the registry fn pays TWO
    # bucketed layout writes per call, so its per-query number against
    # a join-only DuckDB oracle read as a 93x "regression"
    # (BENCH_DETAIL_r13 footnote). The warm pass below builds the
    # layout once; the timed samples then measure the JOIN leg (the
    # recurring per-query cost the oracle actually compares to), and
    # the layout leg is timed separately as q160_layout_sec.
    from speculare_pgcdc_spark.queries.history import (
        q160_build_layout,
        q160_join_only,
    )

    timing_fn = {n: s.fn for n, s in specs.items()}
    if "q160_bucketed_join" in timing_fn:
        timing_fn["q160_bucketed_join"] = q160_join_only
    layout_samples: list[float] = []
    for name, spec in specs.items():
        try:
            materialize(spec.fn(spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 - isolation is the point
            errors[name] = f"{type(ex).__name__}: {ex}"[:300]
    for _ in range(runs):
        for name, spec in specs.items():
            if name in errors:
                continue
            try:
                t0 = time.perf_counter()
                materialize(timing_fn[name](spark, sf_dir))
                samples[name].append(time.perf_counter() - t0)
            except Exception as ex:  # noqa: BLE001
                errors[name] = f"{type(ex).__name__}: {ex}"[:300]
        if "q160_bucketed_join" not in errors:
            try:
                t0 = time.perf_counter()
                q160_build_layout(spark, sf_dir)
                layout_samples.append(time.perf_counter() - t0)
            except Exception as ex:  # noqa: BLE001
                errors["q160_layout"] = f"{type(ex).__name__}: {ex}"[:300]
    timings = {
        n: round(min(s), 3) if s else None for n, s in samples.items()
    }
    medians = {
        n: round(sorted(s)[len(s) // 2], 3) if s else None
        for n, s in samples.items()
    }

    # same-machine DuckDB per query (the BASELINE.md comparator), so
    # cross-round ratio regressions are attributable to a specific query
    duck: dict[str, float] = {}
    ratio: dict[str, float] = {}
    try:
        import duckdb

        from speculare_pgcdc_spark.catalog import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
    except Exception as ex:  # noqa: BLE001 - comparator is auxiliary
        errors["duckdb_setup"] = f"{type(ex).__name__}: {ex}"[:300]
        con = None
    for name, spec in specs.items():
        if con is None or spec.oracle is None or timings.get(name) is None:
            continue
        try:
            con.execute(spec.oracle).fetchall()  # warm
            duck[name] = round(
                _best_of(lambda: con.execute(spec.oracle).fetchall()), 3
            )
        except Exception as ex:  # noqa: BLE001
            errors[name] = f"duckdb {type(ex).__name__}: {ex}"[:300]
            continue
        if duck[name] > 0:
            ratio[name] = round(timings[name] / duck[name], 2)

    # a broken constituent must yield a NULL total, not a smaller one —
    # summing around the failure would report a phantom speedup in the
    # cross-round/BASELINE.md comparison
    total = (
        None
        if any(timings[n] is None for n in tier1)
        else round(sum(timings[n] for n in tier1), 3)
    )
    tier2_total = (
        None
        if any(timings[n] is None for n in TIER2)
        else round(sum(timings[n] for n in TIER2), 3)
    )
    tier2_comparable = [n for n in TIER2 if n in set(TIER2_PREV_ROUND)]
    tier2_comparable_total = (
        None
        if any(timings[n] is None for n in tier2_comparable)
        else round(sum(timings[n] for n in tier2_comparable), 3)
    )
    # CDC micro-bench: change events through parse->explode->normalize
    # per second (the BASELINE.md ~79k events/s comparator; reference
    # forwards one message at a time on one channel). Measured on the
    # PIPELINE itself (all CHANGE_COLUMNS incl. the change_json payload
    # render, noop-materialized, min of `runs`) — rounds 1-3 derived
    # this from q35's oracle-form timing, which adds a presentation
    # select + global ORDER BY that is no part of the dispatch path the
    # metric is defined over; q35's own timing still appears in
    # "queries". The old basis is kept alongside as
    # cdc_q35_events_per_s for cross-round comparability.
    cdc_events_per_s = None
    cdc_events_per_s_median = None
    cdc_q35_events_per_s = None
    cdc_q35_events_per_s_median = None
    cdc_fanout_events_per_s = None
    cdc_fanout_events_per_s_median = None
    cdc_fanout_routed_rows = None
    cdc_feed_recached = None
    cdc_diag: dict = {}
    cdc_rounds = max(runs, 7)
    try:
        from speculare_pgcdc_spark.cdc.feedgen import (
            ensure_feed_hot,
            feed_messages,
            lookup_df,
        )
        from speculare_pgcdc_spark.cdc.pipeline import (
            normalize_hypertables,
            parse_wal2json,
        )

        def cdc_pipeline():
            return normalize_hypertables(
                parse_wal2json(feed_messages(spark, sf_dir)),
                lookup_df(spark),
            )

        # the metric is defined over a HOT in-memory feed (its
        # construction is scaffolding — in production the feed arrives
        # from the replication connection). The warm-up persist is 40+
        # queries old by now and storage churn can have dropped it,
        # silently turning this micro into a feed-CONSTRUCTION
        # benchmark: BENCH_r07's 27.2k ev/s (vs 83.2k) reproduced
        # exactly as the unpersisted-feed recompute (scripts/
        # cdc_attrib.py; 4.0s vs 1.4s hot at sf0.1, DuckDB anchor
        # flat). Re-assert the cache and RECORD when it had to be
        # rebuilt so the artifact explains itself.
        cdc_feed_recached = ensure_feed_hot(spark, sf_dir)
        n_changes = cdc_pipeline().count()
        materialize(cdc_pipeline())  # warm
        # per-round samples (not _best_of) so BOTH bases report
        # min AND median — the r6 verdict asked for the median to
        # attribute box-load noise vs real regression on the
        # cdc_q35 basis, which had slid across r5->r6 while the
        # pipeline basis stayed in-band.
        # Sample count: a micro round is ~1.4 s hot, so extra rounds
        # are nearly free next to the 40+-query suite — and the r8
        # driver artifact showed min-of-3 still swings +/-20% (68.4k
        # vs 81k same code, recached false both times; BASELINE.md
        # §CDC driver-context re-derivation). min-of-7 tightens the
        # band-edge statistic without redefining the metric.
        cdc_diag.update(_host_diag())
        gc0 = _jvm_gc_ms(spark)
        pipe_samples: list[float] = []
        for _ in range(cdc_rounds):
            t0 = time.perf_counter()
            materialize(cdc_pipeline())
            pipe_samples.append(time.perf_counter() - t0)
        gc1 = _jvm_gc_ms(spark)
        if gc0 is not None and gc1 is not None:
            cdc_diag["gc_ms_during_micro"] = gc1 - gc0
        # the full sample list rides the artifact: a dip whose min and
        # median both move but whose sample SPREAD is also 2x wide is
        # box noise; a tight-but-slower distribution is a regression
        # (BASELINE.md §CDC driver-context band)
        cdc_diag["pipe_samples_sec"] = [round(s, 3) for s in pipe_samples]
        pipe_sec = min(pipe_samples)
        pipe_med = sorted(pipe_samples)[len(pipe_samples) // 2]
        if pipe_sec > 0:
            cdc_events_per_s = round(n_changes / pipe_sec)
            cdc_events_per_s_median = round(n_changes / pipe_med)
        t35 = timings.get("q35_cdc_pipeline")
        t35_med = medians.get("q35_cdc_pipeline")
        if t35:
            cdc_q35_events_per_s = round(n_changes / t35)
        if t35_med:
            cdc_q35_events_per_s_median = round(n_changes / t35_med)
    except Exception as ex:  # noqa: BLE001
        errors["cdc_micro"] = f"{type(ex).__name__}: {ex}"[:300]

    # second dispatch basis (round-10 verdict item 6): the SAME hot
    # feed through parse -> normalize -> route -> EXECUTOR-SIDE fan-out
    # (fanout_partitions) to a real file outbox. This is the 100 TB
    # delivery path (driver memory O(1) in fan-out size); the benched
    # number proves it is not slower than the driver-side fanout_batch
    # the micro above stops short of. Rate numerator stays n_changes so
    # the basis is comparable; the routed (change x subscriber) row
    # count is reported alongside.
    try:
        import shutil
        import tempfile

        from speculare_pgcdc_spark.cdc.feedgen import FEED_TABLES
        from speculare_pgcdc_spark.cdc.pipeline import (
            route,
            subscriptions_df,
        )
        from speculare_pgcdc_spark.streaming.fanout import (
            fanout_partitions,
            idempotent_outbox_deliver,
        )

        subs = subscriptions_df(
            spark,
            [
                (1, "insert,update:events_a"),
                (2, "*:events_b"),
                (3, "insert,update:events_a:event_type.in.click,view"),
                (4, "delete:events_b"),
            ],
            FEED_TABLES,
        )

        def routed():
            return route(cdc_pipeline(), subs)

        cdc_fanout_routed_rows = routed().count()
        out_dir = tempfile.mkdtemp(prefix="bench_fanout_")
        deliver = idempotent_outbox_deliver(out_dir)
        try:
            fanout_partitions(routed(), deliver, batch_id=0)  # warm
            fan_samples: list[float] = []
            for _ in range(cdc_rounds):
                t0 = time.perf_counter()
                # batch_id fixed at 0: the idempotent adapter rewrites
                # the same per-subscriber files, so disk stays bounded
                fanout_partitions(routed(), deliver, batch_id=0)
                fan_samples.append(time.perf_counter() - t0)
            fan_sec = min(fan_samples)
            fan_med = sorted(fan_samples)[len(fan_samples) // 2]
            if fan_sec > 0 and n_changes:
                cdc_fanout_events_per_s = round(n_changes / fan_sec)
                cdc_fanout_events_per_s_median = round(
                    n_changes / fan_med
                )
            cdc_diag["fanout_samples_sec"] = [
                round(s, 3) for s in fan_samples
            ]
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    except Exception as ex:  # noqa: BLE001
        errors["cdc_fanout_micro"] = f"{type(ex).__name__}: {ex}"[:300]

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # two JSON lines, detail first, COMPACT HEADLINE LAST: the driver's
    # tail capture truncated the front of round 5's single fat line
    # (28 tier-2 queries + 3 ratio maps pushed the headline fields off
    # the buffer), so the contract numbers now also ride a short final
    # line that survives any front-truncation. Parsers that read the
    # last JSON line get the headline; parsers that scan all lines get
    # the detail too.
    detail = {
                "metric": "headline_suite_detail",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "bench_runs": runs,
                "cdc_rounds": cdc_rounds,
                "tier1": tier1,
                "tier2_total": tier2_total,
                "duckdb_sec": duck,
                "spark_over_duckdb": ratio,
                "cdc_events_per_s": cdc_events_per_s,
                "cdc_events_per_s_median": cdc_events_per_s_median,
                "cdc_q35_events_per_s": cdc_q35_events_per_s,
                "cdc_q35_events_per_s_median": cdc_q35_events_per_s_median,
                "cdc_fanout_events_per_s": cdc_fanout_events_per_s,
                "cdc_fanout_events_per_s_median":
                    cdc_fanout_events_per_s_median,
                "cdc_fanout_routed_rows": cdc_fanout_routed_rows,
                "cdc_feed_recached": cdc_feed_recached,
                "cdc_diag": cdc_diag,
                "errors": errors,
                "sf": float(sf) if sf else sf_dir,
                "tier2": TIER2,
                "tier2_per_query": {n: timings.get(n) for n in TIER2},
                "tier2_per_query_median": {
                    n: medians.get(n) for n in TIER2
                },
                "tier2_comparable": tier2_comparable,
                "tier2_comparable_total": tier2_comparable_total,
                # q160 split basis (r13 verdict #4): tier2's
                # q160_bucketed_join number is the JOIN leg only from
                # this round on; the layout leg (2 bucketed writes, the
                # once-per-dataset cost) is priced here
                "q160_layout_sec": (
                    round(min(layout_samples), 3)
                    if layout_samples else None
                ),
                "q160_layout_sec_median": (
                    round(sorted(layout_samples)[len(layout_samples) // 2], 3)
                    if layout_samples else None
                ),
                "q160_join_sec": timings.get("q160_bucketed_join"),
    }
    # the stdout detail line gets tail-truncated by the driver's
    # capture (r12 verdict item 4: the ratio map was cut mid-JSON), so
    # the FULL detail dict also lands in a committed file artifact
    detail_out = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
    )
    try:
        with open(detail_out, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError as ex:
        errors["bench_detail_write"] = f"{type(ex).__name__}: {ex}"[:200]
    print(json.dumps(detail))
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": {n: timings.get(n) for n in tier1},
                # medians ride the compact line too so a truncated
                # artifact still supports the min+median regression
                # test BASELINE.md prescribes (r6 verdict item 7)
                "queries_median": {n: medians.get(n) for n in tier1},
                "value_median": (
                    None
                    if any(medians[n] is None for n in tier1)
                    else round(sum(medians[n] for n in tier1), 3)
                ),
                "tier2_total": tier2_total,
                "tier2_comparable_total": tier2_comparable_total,
                "tier2_comparable_n": len(tier2_comparable),
                "cdc_events_per_s": cdc_events_per_s,
                "cdc_events_per_s_median": cdc_events_per_s_median,
                "cdc_q35_events_per_s": cdc_q35_events_per_s,
                "cdc_q35_events_per_s_median": cdc_q35_events_per_s_median,
                "cdc_fanout_events_per_s": cdc_fanout_events_per_s,
                "cdc_fanout_events_per_s_median":
                    cdc_fanout_events_per_s_median,
                "cdc_feed_recached": cdc_feed_recached,
                "cdc_rounds": cdc_rounds,
                "n_errors": len(errors),
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
