"""Attribute the q96_cdc_apply 100x SCAN-stage stragglers (r9 verdict
item 2): SCALE_PROBE_r09_100x saw non-reproducing 6-10x max/median
ratios on 256-task scan stages (shuffle_read_max_b = 0, sub-2s maxima)
that the builder attributed to page-cache jitter. This probe rules that
in or out with the discriminating signal the summary quantiles can't
give: WHICH task (= which input split) is slow, across repeated runs.

- data/layout skew  -> the SAME partition indices are slow every run
  (a fat row group, a hot key) — a real fix target;
- environment jitter -> the slow indices MOVE between runs and the
  ratio itself wobbles — absorbed by speculative execution on a real
  cluster, not a plan defect.

Protocol: pre-touch every fixture byte (page cache hot by
construction), one untimed warm run (codegen + feed persist), then
K measured runs recording per-scan-stage ratio + the top-4 slowest
task indices; finally the same with 16 MB splits (fewer, fatter
tasks) to show the waves-of-tiny-tasks effect. Writes
SCALE_PROBE_r10_q96.json.

Usage: python scripts/q96_straggler_probe.py [fixture] [--json out]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402

RUNS = 4
MIN_TASKS = 64  # only the big scan stages are in question
TOP = 4


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=30) as r:
        return json.load(r)


def pretouch(fixture: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(fixture):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass
            n += 1
    return n


def measured_run(spark, api, fn, fixture, seen_stages):
    t0 = time.perf_counter()
    fn(spark, fixture).write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    stages = []
    for s in _api(api, "/stages?status=complete"):
        sid = s["stageId"]
        if sid in seen_stages:
            continue
        seen_stages.add(sid)
        ntasks = s.get("numCompleteTasks", 0)
        if ntasks < MIN_TASKS:
            continue
        try:
            qs = _api(
                api, f"/stages/{sid}/0/taskSummary?quantiles=0.5,1.0"
            )
            med_ms, max_ms = qs["executorRunTime"]
            sh_max = qs.get("shuffleReadMetrics", {}).get(
                "readBytes", [0, 0]
            )[-1]
            tasks = _api(
                api, f"/stages/{sid}/0/taskList?offset=0&length=1000"
            )
        except Exception:  # noqa: BLE001 - stage evicted from UI store
            continue
        by_rt = sorted(
            (
                (t.get("taskMetrics", {}).get("executorRunTime", 0),
                 t.get("index"))
                for t in tasks
            ),
            reverse=True,
        )
        stages.append(
            {
                "stage": sid,
                "tasks": ntasks,
                "task_med_ms": round(med_ms),
                "task_max_ms": round(max_ms),
                "ratio": round(max_ms / med_ms, 2) if med_ms else None,
                "shuffle_read_max_b": int(sh_max),
                "slowest_task_idx": [i for _rt, i in by_rt[:TOP]],
                "slowest_task_ms": [rt for rt, _i in by_rt[:TOP]],
            }
        )
    return {"wall_sec": wall, "stages": stages}


def main() -> None:
    argv = sys.argv[1:]
    out = "SCALE_PROBE_r10_q96.json"
    if "--json" in argv:
        i = argv.index("--json")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    fixture = argv[0] if argv else "/tmp/scale100"

    spark = get_spark(
        app_name="q96-straggler-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
                2 * 1024 * 1024
            ),
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": str(
                256 * 1024
            ),
            # keep every probe stage inspectable: the default 1000-task
            # retention would evict early runs' task lists
            "spark.ui.retainedStages": "2000",
            "spark.ui.retainedTasks": "2000000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    api = f"{base}/api/v1/applications/{app_id}"

    nf = pretouch(fixture)
    print(f"pre-touched {nf} fixture files under {fixture}", flush=True)

    fn = load_all()["q96_cdc_apply"].fn
    seen: set[int] = {s["stageId"] for s in _api(api, "/stages")}
    # warm: codegen JIT + the feed fixture's persist()
    fn(spark, fixture).write.format("noop").mode("overwrite").save()
    for s in _api(api, "/stages"):
        seen.add(s["stageId"])

    runs = []
    for r in range(RUNS):
        res = measured_run(spark, api, fn, fixture, seen)
        runs.append(res)
        worst = max(
            (st["ratio"] or 0 for st in res["stages"]), default=0
        )
        print(
            f"run {r}: wall={res['wall_sec']}s worst-ratio={worst}",
            flush=True,
        )

    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024)
    )
    coarse = measured_run(spark, api, fn, fixture, seen)
    print(
        f"coarse-splits run: wall={coarse['wall_sec']}s "
        f"worst-ratio="
        f"{max((st['ratio'] or 0 for st in coarse['stages']), default=0)}",
        flush=True,
    )

    # attribution: per large stage POSITION in the run (stages are not
    # comparable by id across runs; compare by order-of-appearance of
    # >2x-ratio scan stages), does the slow task index recur?
    hot_idx: list[set] = []
    for res in runs:
        s = set()
        for st in res["stages"]:
            if (st["ratio"] or 0) > 2 and st["shuffle_read_max_b"] == 0:
                s.update(st["slowest_task_idx"][:2])
        hot_idx.append(s)
    nonempty = [s for s in hot_idx if s]
    recur = set.intersection(*nonempty) if len(nonempty) > 1 else set()
    verdict = {
        "runs_with_gt2_scan_ratio": len(nonempty),
        "slow_task_indices_per_run": [sorted(s) for s in hot_idx],
        "recurring_slow_indices": sorted(recur),
        "attribution": (
            "layout/data skew (same split slow every run)"
            if recur
            else "environment jitter (slow split moves or vanishes "
            "across runs; page cache hot by construction)"
        ),
    }
    print("verdict:", json.dumps(verdict, indent=1), flush=True)

    with open(out, "w") as f:
        json.dump(
            {
                "_meta": {
                    "fixture": fixture,
                    "query": "q96_cdc_apply",
                    "protocol": "pretouch + warm + "
                    f"{RUNS} measured runs @2MB splits + 1 @16MB",
                },
                "runs": runs,
                "coarse_splits_run": coarse,
                "verdict": verdict,
            },
            f,
            indent=1,
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
