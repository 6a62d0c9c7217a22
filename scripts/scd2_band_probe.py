"""Banded-SCD2 per-batch cost probe (round 13).

The stream-bench scd2 rows drain the WHOLE history, so state == batch
and banding can't help (custkeys have no range locality within a
date-chunked feed — every chunk touches every band; the banded
consumer degrades gracefully to a full rewrite there). The claim that
matters at scale is the PER-BATCH cost once the state is large and a
microbatch touches few customers: the legacy consumer rewrites the
full versioned history every batch, the banded one only the bands
containing the batch's keys.

Setup: state = one-shot SCD2 build over the 10x orders fixture
(~1.5M versions, ~100k custkeys), batch = ~1k new orders for ~100
customers (custkey % 1499 == 7, dates after the history's max so the
ordering precondition holds). 512 key bands -> ~100 touched.

Measured per mode (3 reps, fresh state each): seconds to produce AND
durably write the post-batch state (full dir write for legacy,
touched-band dirs for banded). Integrity: both modes' final states
agree (count + open-count + version-sum), and equal the one-shot
build over history+batch.

Usage: python scripts/scd2_band_probe.py [src_dir] [--json out.json]
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
    BAND_COL,
    band_of,
    write_banded_snapshot,
)
from speculare_pgcdc_spark.cdc.scd2 import (  # noqa: E402
    STORED_COLS,
    scd2_apply,
)
from speculare_pgcdc_spark.session import get_spark  # noqa: E402

N_BANDS = 512
N_RUNS = 3
KEY_MOD = 1499  # ~1/1499 of custkeys -> ~100 keys at the 10x fixture


def _sig(df):
    """Order-free state signature: (rows, open rows, version sum)."""
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("valid_to").isNull(), 1).otherwise(0)
        ).alias("n_open"),
        F.sum(F.col("version").cast("decimal(38,0)")).alias("vs"),
    ).first()
    return int(r["n"]), int(r["n_open"]), str(r["vs"])


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/tmp/scale10"
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark(app_name="scd2-band-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="scd2_band_")

    orders = cat_table(spark, src, "orders")
    max_date, max_key, max_ck = orders.agg(
        F.max("o_orderdate"), F.max("o_orderkey"), F.max("o_custkey")
    ).first()
    batch = (
        orders.filter(F.col("o_custkey") % KEY_MOD == 7)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "o_custkey",
            (F.date_add(F.lit(max_date), 3)).alias("o_orderdate"),
            F.lit("P").alias("o_orderstatus"),
            (F.col("o_custkey") % 1000 + 100.5).alias("o_totalprice"),
            (F.lit(int(max_key)) + F.col("o_custkey"))
            .alias("o_orderkey"),
        )
        .localCheckpoint(eager=True)
    )
    n_batch_keys = batch.count()
    width = max(1, int(max_ck) // N_BANDS + 1)

    # one-shot state over history (the big pre-existing dimension)
    state = scd2_apply(None, orders).select(*STORED_COLS)
    state_src = os.path.join(work, "state_src")
    state.write.parquet(state_src)
    state = spark.read.parquet(state_src)
    n_state = state.count()
    expected_sig = _sig(
        scd2_apply(state, batch).select(*STORED_COLS)
    )

    report: dict = {
        "_meta": {
            "src": src,
            "state_rows": n_state,
            "batch_rows": n_batch_keys,
            "n_bands": N_BANDS,
            "band_width": width,
            "expected_sig": expected_sig,
        },
        "modes": {},
    }

    # legacy: merge against the FULL state, rewrite the full dir
    walls = []
    sig_ok = True
    for run in range(N_RUNS):
        dst = os.path.join(work, f"legacy_{run}")
        t0 = time.perf_counter()
        out = scd2_apply(state, batch)
        out.select(*STORED_COLS).write.parquet(dst)
        walls.append(time.perf_counter() - t0)
        if _sig(spark.read.parquet(dst)) != expected_sig:
            sig_ok = False
        shutil.rmtree(dst, ignore_errors=True)
    report["modes"]["legacy"] = {
        "wall_sec": [round(w, 2) for w in walls],
        "best_sec": round(min(walls), 2),
        "integrity": sig_ok,
    }
    print(f"legacy: {report['modes']['legacy']}", flush=True)

    # banded: merge against the touched bands only, write only those
    banded_root = os.path.join(work, "banded_state")
    write_banded_snapshot(
        state, banded_root, "o_custkey", band_width=width
    )
    bands = sorted(
        r[0]
        for r in batch.select(band_of("o_custkey", width).alias("b"))
        .distinct()
        .collect()
    )
    walls = []
    sig_ok = True
    for run in range(N_RUNS):
        tmp = os.path.join(work, f"banded_out_{run}")
        t0 = time.perf_counter()
        # targeted read of only the touched band dirs (the consumer's
        # own access path — full-root discovery lists all N_BANDS dirs
        # and dominates once the per-band work is small)
        prev = (
            spark.read.option("basePath", banded_root)
            .parquet(*[
                os.path.join(banded_root, f"{BAND_COL}={b}")
                for b in bands
            ])
            .drop(BAND_COL)
        )
        out = scd2_apply(prev, batch)
        (
            out.select(*STORED_COLS)
            .withColumn(BAND_COL, band_of("o_custkey", width))
            .repartition(max(len(bands), 1), F.col(BAND_COL))
            .write.partitionBy(BAND_COL)
            .mode("overwrite")
            .parquet(tmp)
        )
        walls.append(time.perf_counter() - t0)
        # logical post-state = untouched bands ∪ rewritten bands
        # (full-root read is fine HERE — integrity is untimed)
        merged = (
            spark.read.parquet(banded_root)
            .filter(~F.col(BAND_COL).isin(bands))
            .drop(BAND_COL)
            .unionByName(
                spark.read.parquet(tmp).drop(BAND_COL)
            )
        )
        if _sig(merged) != expected_sig:
            sig_ok = False
        shutil.rmtree(tmp, ignore_errors=True)
    report["modes"]["banded"] = {
        "wall_sec": [round(w, 2) for w in walls],
        "best_sec": round(min(walls), 2),
        "bands_touched": len(bands),
        "integrity": sig_ok,
    }
    print(f"banded: {report['modes']['banded']}", flush=True)

    lb = report["modes"]["legacy"]["best_sec"]
    bb = report["modes"]["banded"]["best_sec"]
    report["legacy_over_banded"] = round(lb / bb, 2) if bb else None
    print(f"legacy/banded = {report['legacy_over_banded']}", flush=True)

    shutil.rmtree(work, ignore_errors=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")
    if not all(m["integrity"] for m in report["modes"].values()):
        raise SystemExit("STATE INTEGRITY FAILURE")


if __name__ == "__main__":
    main()
