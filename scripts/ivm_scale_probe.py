"""Banded-IVM scale demonstration (round 13, r12 verdict item 3).

STREAM_BENCH measures both matview consumers at snapshot == feed
scale (sf0.1: 100k rows, 100k changes), where band confinement's
write savings cancel against its per-band overheads — the two modes
tie (~9.3 s / 4 microbatches). The claim that matters at 100 TB is
different: the LEGACY consumer's per-batch cost grows with SNAPSHOT
size (two snapshot-scale writes per batch) while the banded
consumer's write cost grows only with the TOUCHED-BAND count. This
probe holds the batch fixed and grows the snapshot 10x:

  snapshot = /tmp/scale10 events (10x rows, key range 10x wider)
  feed     = sf0.1-derived changes (keys cover only the low ~10% of
             the key range -> ~10% of bands touched, the WAL-locality
             shape a txn-ordered feed has natively)

Both consumers drain the same 4-microbatch feed; integrity = final
view == full recompute of the final snapshot. Expected: legacy wall
grows ~with the snapshot; banded stays near its sf0.1 number.

Usage: python scripts/ivm_scale_probe.py [snap_src] [feed_sf]
       [--json out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from speculare_pgcdc_spark.catalog import table as cat_table  # noqa: E402
from speculare_pgcdc_spark.cdc.apply import (  # noqa: E402
    read_banded_snapshot,
    seed_band_partials,
    start_matview_query,
    start_matview_query_banded,
    write_banded_snapshot,
)
from speculare_pgcdc_spark.cdc.feedgen import (  # noqa: E402
    FEED_TABLES,
    lookup_df,
    write_feed,
)
from speculare_pgcdc_spark.cdc.pipeline import (  # noqa: E402
    normalize_hypertables,
    parse_wal2json,
)
from speculare_pgcdc_spark.session import get_spark  # noqa: E402
from speculare_pgcdc_spark.streaming.source import (  # noqa: E402
    file_change_feed,
)

IVM_COLS = {"event_id": "bigint", "event_type": "string",
            "value": "double"}
N_FILES = 8
FPT = 2  # 4 microbatches
N_RUNS = 3
N_BANDS = 32


def ivm_aggs():
    return [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("sv"),
    ]


def ivm_merges():
    return [
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sv").cast("decimal(38,6)").alias("sv"),
    ]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    snap_src = args[0] if args else "/tmp/scale10"
    feed_sf = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark(app_name="ivm-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ivm_scale_")
    feed_dir = os.path.join(work, "feed")
    write_feed(spark, feed_sf, feed_dir, num_files=N_FILES,
               contiguous=True)

    base = cat_table(spark, snap_src, "events").select(
        *[F.col(c).cast(t).alias(c) for c, t in IVM_COLS.items()]
    )
    n_snap = base.count()
    report: dict = {
        "_meta": {
            "purpose": (
                "hold the batch fixed, grow the snapshot: legacy "
                "per-batch cost tracks snapshot size (full rewrite), "
                "banded tracks touched bands only"
            ),
            "snapshot_src": snap_src,
            "snapshot_rows": n_snap,
            "feed_sf": feed_sf,
            "n_feed_files": N_FILES,
            "files_per_trigger": FPT,
            "n_bands": N_BANDS,
        },
        "modes": {},
    }

    for mode in ("legacy", "banded", "banded_partials"):
        walls: list[float] = []
        integrity_ok = True
        bands_touched = None
        for run in range(N_RUNS):
            snap = os.path.join(work, f"snap_{mode}_{run}")
            mv = os.path.join(work, f"mv_{mode}_{run}")
            parts = os.path.join(work, f"parts_{mode}_{run}")
            ckpt = os.path.join(work, f"ckpt_{mode}_{run}")
            kwargs = {}
            if mode.startswith("banded"):
                write_banded_snapshot(base, snap, "event_id",
                                      n_bands=N_BANDS)
                start = start_matview_query_banded
                if mode == "banded_partials":
                    seed_band_partials(
                        spark, snap, "event_type", ivm_aggs, parts
                    )
                    kwargs = {"merge_cols_fn": ivm_merges,
                              "partials_dir": parts}
            else:
                base.write.parquet(snap)
                start = start_matview_query
            base.groupBy("event_type").agg(*ivm_aggs()).write.parquet(mv)
            stream = normalize_hypertables(
                parse_wal2json(file_change_feed(
                    spark, feed_dir, max_files_per_trigger=FPT
                ), delete_keys=True),
                lookup_df(spark),
            )
            t0 = time.perf_counter()
            q = start(
                stream, snap, mv, ckpt, "event_id", IVM_COLS,
                "event_type", ivm_aggs, tables=FEED_TABLES,
                available_now=True, **kwargs,
            )
            try:
                q.awaitTermination(1200)
            finally:
                q.stop()
            walls.append(time.perf_counter() - t0)
            final = (read_banded_snapshot(spark, snap)
                     if mode.startswith("banded")
                     else spark.read.parquet(snap))
            got = {r["event_type"]: (r["n"], str(r["sv"])) for r in
                   spark.read.parquet(mv).collect()}
            full = {r["event_type"]: (r["n"], str(r["sv"])) for r in
                    final.groupBy("event_type").agg(*ivm_aggs())
                    .collect()}
            if got != full:
                integrity_ok = False
            if mode.startswith("banded") and bands_touched is None:
                bands_touched = sorted(
                    int(e.split("=")[1])
                    for e in os.listdir(snap)
                    if e.startswith("band=")
                )
            for d in (snap, mv, parts, ckpt):
                shutil.rmtree(d, ignore_errors=True)
        best = min(walls)
        med = sorted(walls)[len(walls) // 2]
        row = {
            "wall_sec": [round(w, 2) for w in walls],
            "best_sec": round(best, 2),
            "median_sec": round(med, 2),
            "view_integrity": integrity_ok,
        }
        if bands_touched is not None:
            row["final_band_dirs"] = len(bands_touched)
        report["modes"][mode] = row
        print(
            f"{mode}: best {best:.2f}s / med {med:.2f}s over "
            f"{n_snap}-row snapshot, integrity="
            f"{'ok' if integrity_ok else 'FAIL'}",
            flush=True,
        )

    lb = report["modes"]["legacy"]["best_sec"]
    bb = report["modes"]["banded"]["best_sec"]
    pb = report["modes"]["banded_partials"]["best_sec"]
    report["legacy_over_banded"] = round(lb / bb, 2) if bb else None
    report["legacy_over_banded_partials"] = (
        round(lb / pb, 2) if pb else None
    )
    print(f"legacy/banded = {report['legacy_over_banded']}  "
          f"legacy/banded_partials = "
          f"{report['legacy_over_banded_partials']}", flush=True)

    shutil.rmtree(work, ignore_errors=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")
    if not all(m["view_integrity"] for m in report["modes"].values()):
        raise SystemExit("VIEW INTEGRITY FAILURE")


if __name__ == "__main__":
    main()
