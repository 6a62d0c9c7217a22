"""SCD2-under-skew probe (round-10 verdict item 3): drive the
incremental SCD2 maintainer (cdc/scd2.scd2_apply) over a HOT-KEY
change feed derived from the skew01 fixture and record (a) per-batch
window-stage task balance via the Spark status API (the
SKEW_PROBE_r10_ann protocol) and (b) value parity: the incrementally
maintained state must still equal the one-shot build under skew.

Feed construction: skew01's events table carries the bounded-Pareto
user_id (hottest key ~10% of ALL rows at alpha=1.1); each event maps
to an orders-shaped change keyed by that user — so the SCD2 dimension
key inherits the Zipf. Batches split on GLOBAL event-date terciles,
which satisfies the module contract (per key, valid_from
non-decreasing across batches) by construction; event_id is the
unique tie key.

What "balanced" can even mean here: the per-batch re-chain window is
partitioned by the dimension key, and a key's version chain is a
SERIAL dependency — no engine can split one key's chain across tasks.
The inherent bound is therefore worst-task ~= hot-key share x batch
rows. The probe verifies the stage matches that bound (the plan adds
no skew beyond the data's own) rather than some uniform ideal;
SCALING.md records the reading.

Usage: python scripts/scd2_skew_probe.py [skew_dir] [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from speculare_pgcdc_spark.cdc.scd2 import (  # noqa: E402
    STATE_COLS,
    scd2_apply,
)
from speculare_pgcdc_spark.session import get_spark  # noqa: E402

MIN_TASKS = 8


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=30) as r:
        return json.load(r)


def _orders_shaped(ev):
    """events -> orders-shaped changes keyed by the Zipf user_id."""
    return ev.select(
        F.col("event_id").alias("o_orderkey"),
        F.col("user_id").alias("o_custkey"),
        F.to_date("ts").alias("o_orderdate"),
        F.col("event_type").alias("o_orderstatus"),
        F.coalesce(
            F.when(
                ~F.isnan("value") & (F.abs("value") != float("inf")),
                F.col("value"),
            ),
            F.lit(0.0),
        ).alias("o_totalprice"),
    )


def _stage_stats(api: str, seen: set[int]) -> list[dict]:
    out = []
    for s in _api(api, "/stages?status=complete"):
        sid = s["stageId"]
        if sid in seen:
            continue
        seen.add(sid)
        ntasks = s.get("numCompleteTasks", 0)
        if ntasks == 0:
            continue
        try:
            qs = _api(
                api, f"/stages/{sid}/0/taskSummary?quantiles=0.5,1.0"
            )
            med_ms, max_ms = qs["executorRunTime"]
            sh_max = qs.get("shuffleReadMetrics", {}).get(
                "readBytes", [0, 0]
            )[-1]
            sh_med = qs.get("shuffleReadMetrics", {}).get(
                "readBytes", [0, 0]
            )[0]
        except Exception:  # noqa: BLE001 - tiny stages 404 the summary
            continue
        out.append(
            {
                "stage": sid,
                "tasks": ntasks,
                "task_med_ms": round(med_ms),
                "task_max_ms": round(max_ms),
                "ratio": round(max_ms / med_ms, 2) if med_ms else None,
                "shuffle_read_med_b": int(sh_med),
                "shuffle_read_max_b": int(sh_max),
            }
        )
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skew_dir = args[0] if args else "/tmp/skew01"
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark(
        app_name="scd2-skew-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            # cluster-emulation granularity (scale_probe convention):
            # many small tasks so the balance distribution is visible
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    api = f"{base}/api/v1/applications/{app_id}"

    ev = spark.read.parquet(f"{skew_dir}/events.parquet")
    changes = _orders_shaped(ev).localCheckpoint(eager=True)
    n = changes.count()
    hot = (
        changes.groupBy("o_custkey")
        .count()
        .orderBy(F.col("count").desc())
        .limit(1)
        .collect()[0]
    )
    hot_share = hot["count"] / n

    dates = [
        r.d
        for r in changes.select(
            F.col("o_orderdate").alias("d")
        ).distinct().orderBy("d").collect()
    ]
    d1 = dates[len(dates) // 3]
    d2 = dates[2 * len(dates) // 3]
    batches = [
        changes.filter(F.col("o_orderdate") <= F.lit(d1)),
        changes.filter(
            (F.col("o_orderdate") > F.lit(d1))
            & (F.col("o_orderdate") <= F.lit(d2))
        ),
        changes.filter(F.col("o_orderdate") > F.lit(d2)),
    ]

    seen: set[int] = set()
    _stage_stats(api, seen)  # drain setup stages

    report: dict = {
        "_meta": {
            "purpose": (
                "r10 verdict item 3: incremental SCD2 window balance "
                "under a Zipf-hot dimension key + parity vs one-shot"
            ),
            "fixture": skew_dir,
            "n_changes": n,
            "hot_key": int(hot["o_custkey"]),
            "hot_key_share": round(hot_share, 4),
            "contract_bound": (
                "worst window task ~= hot_key_share x batch rows "
                "(a key's version chain is serial by definition)"
            ),
        },
        "batches": [],
    }

    state = None
    for i, b in enumerate(batches):
        nb = b.count()
        _stage_stats(api, seen)  # don't charge the sizing count
        t0 = time.perf_counter()
        state = scd2_apply(state, b, validate=True)
        state = state.localCheckpoint(eager=True)
        wall = round(time.perf_counter() - t0, 2)
        stages = _stage_stats(api, seen)
        big = [s for s in stages if s["tasks"] >= MIN_TASKS]
        worst = max((s["ratio"] for s in big if s["ratio"]), default=None)
        report["batches"].append(
            {
                "batch": i,
                "rows": nb,
                "wall_sec": wall,
                "worst_ratio_big_stages": worst,
                "stages": stages,
            }
        )
        print(
            f"batch {i}: rows={nb} wall={wall}s "
            f"worst max/med={worst} over {len(big)} stages "
            f">= {MIN_TASKS} tasks",
            flush=True,
        )

    # parity under skew: incremental == one-shot
    one_shot = scd2_apply(None, changes)
    diff = (
        state.select(*STATE_COLS)
        .exceptAll(one_shot.select(*STATE_COLS))
        .count()
        + one_shot.select(*STATE_COLS)
        .exceptAll(state.select(*STATE_COLS))
        .count()
    )
    n_state = state.count()
    report["parity"] = {
        "state_rows": n_state,
        "sym_diff_rows": diff,
        "match": diff == 0,
    }
    # the hot key's chain really is the long pole it should be
    hot_versions = state.filter(
        F.col("o_custkey") == int(hot["o_custkey"])
    ).count()
    report["parity"]["hot_key_versions"] = hot_versions
    print(
        f"parity: state={n_state} rows, sym_diff={diff}, "
        f"hot key has {hot_versions} versions",
        flush=True,
    )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")
    if diff != 0:
        raise SystemExit("PARITY FAILURE: incremental != one-shot")


if __name__ == "__main__":
    main()
