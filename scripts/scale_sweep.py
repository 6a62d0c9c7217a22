"""Value-stability sweep at a scaled fixture (the 10x/100x twin of
verify_sim): run the stability-sensitive query list against a
``make_scale_fixture.py`` dir and hash-compare each against its DuckDB
oracle.

Round-12 change (r11 verdict item 2): outputs too large to
``toPandas`` no longer skip value verification — the comparator
auto-switches to the ENGINE-SIDE digest mode
(``tests.conftest.assert_oracle_digest_match``: q196's order-free
48-bit-md5 digest-sum computed executor-side in Spark and inside
DuckDB, one (n, checksum) row per engine crosses into Python). The
full collect compare remains primary wherever the output fits, so the
digest only ever covers what the old mode could not check at all.

Usage:
    python scripts/scale_sweep.py [fixture_dir] [--out ART.json] \
        [--queries q72_gapfill_locf,...]

Default fixture: /tmp/scale100 (make with
``python scripts/make_scale_fixture.py /tmp/scale100 100``).
Default query list: the r11 stability set (every ppm/ln/DECIMAL-
headroom class) — kept inline so the artifact is reproducible without
a prior artifact.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from speculare_pgcdc_spark.catalog import TABLES  # noqa: E402
from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from tests.conftest import (  # noqa: E402
    assert_oracle_digest_match,
    assert_oracle_match,
)

#: Above this output size the comparator switches to digest mode
#: (toPandas on ~10M rows exceeded spark.driver.maxResultSize in r11).
COLLECT_ROW_LIMIT = 2_000_000

#: The r11 stability-sensitive set (SCALE_SWEEP_r11_100x) — every
#: integer-ppm / ln-contract / DECIMAL-headroom / money-rounding class.
STABILITY_QUERIES = [
    "q125_session_assignment", "q72_gapfill_locf",
    "q73_gapfill_interpolate", "q118_distribution_windows",
    "q159_compound_growth", "q169_decay_engagement", "q136_entropy",
    "q144_kl_source_drift", "q185_mutual_information",
    "q211_chi_squared", "q212_js_divergence", "q227_mutual_information",
    "q130_rfm_segmentation", "q15_groupby_agg",
    "q56_tpch_q3_shipping_priority", "q57_tpch_q5_local_supplier",
    "q58_tpch_q10_returned_items", "q60_tpch_q18_large_orders",
    "q102_tpch_q6_forecast_revenue", "q114_ewma",
    "q127_time_weighted_avg", "q194_exact_global_median",
    "q274_trimmed_mean", "q287_poisson_bootstrap_ci",
    "q288_count_min_sketch", "q281_scd2_intervals",
    "q282_last_touch_attribution", "q283_l_diversity",
    "q285_ngram_diversity", "q286_char_bigram_entropy",
    "q289_time_to_convert", "q290_markov_transitions",
    "q291_source_label_gini", "q292_group_ols_trend",
    "q293_balanced_lang_subsample", "q294_freshness_audit",
    "q295_type_cooccurrence_jaccard", "q296_fano_burstiness",
    "q297_hapax_legomena", "q298_embedding_norm_outliers",
    "q299_events_since_purchase", "q300_session_paths",
    "q301_psi_drift", "q302_order_inversions", "q303_coverage_grid",
    "q304_rate_cap_throttle", "q305_interarrival_stats",
    "q306_churn_last_action", "q276_unigram_logprob",
    "q277_quantile_normalize",
]


def main() -> None:
    args = sys.argv[1:]
    out_path = None
    names = list(STABILITY_QUERIES)
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--queries" in args:
        i = args.index("--queries")
        names = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/tmp/scale100"

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .appName("scale-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )

    registry = load_all()
    results: dict[str, dict] = {}
    for name in names:
        spec = registry[name]
        t0 = time.time()
        status, err, mode = "ok", None, "collect"
        try:
            df = spec.fn(spark, sf_dir)
            n = df.count()
            if n > COLLECT_ROW_LIMIT:
                mode = "digest"
                assert_oracle_digest_match(df, con, spec.oracle, name=name)
            else:
                assert_oracle_match(df, con, spec.oracle, name=name)
        except Exception as e:  # noqa: BLE001
            status, err = "FAIL", str(e)[:300]
        results[name] = {
            "status": status,
            "mode": mode,
            "sec": round(time.time() - t0, 2),
            "err": err,
        }
        print(f"{name:36s} {status:5s} {mode:7s} "
              f"{results[name]['sec']:8.2f}s", flush=True)

    ok = sum(1 for r in results.values() if r["status"] == "ok")
    summary = {"ok": ok, "fail": len(results) - ok,
               "digest_mode": [n for n, r in results.items()
                               if r["mode"] == "digest"]}
    print(json.dumps(summary))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "_meta": {
                        "fixture": sf_dir,
                        "purpose": "value-stability sweep; digest mode "
                        "= engine-side order-free row-hash (collect-"
                        "free), collect mode = full row compare",
                        "n": len(results),
                    },
                    "results": results,
                    "summary": summary,
                },
                f,
                indent=1,
            )
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
