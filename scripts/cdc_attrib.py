"""CDC pipeline-basis bench attribution (r7 verdict item 2).

BENCH_r07 recorded cdc_events_per_s (pipeline basis) at 27.2k ev/s,
min == median, vs r6's 83.2k — while the q35-oracle basis stayed flat
and no CDC hot-path code changed. The standing hypotheses:

  H1 (box load): the driver's bench run shared the machine; both
     bases should sag together, and a quiet-box session shows both
     in-band.
  H2 (session-state pollution): round 7 added q238/q241 to tier 2 —
     q241's prefix-filter join localCheckpoints its token frame, and
     localCheckpoint blocks are PINNED in executor storage memory
     until the driver GCs the RDD handle. The CDC micro samples LAST
     in bench.py, so the r7 bench is the first where it runs behind
     a session full of pinned blocks. If true: the micro is fast at
     session start, slows after replaying the tier-2 tail, and
     recovers after an explicit gc + clearCache.

One session, ONE process, >= 3 interleaved rounds per phase (the
verdict's attribution protocol), pipeline basis and q35 basis
alternating within every round so any drift hits both:

  phase "fresh":   interleaved rounds right after warm-up
  phase "polluted": same rounds after replaying the round-7 tier-2
                    additions (q238, q241, q250) twice
  phase "cleaned": same rounds after python-gc + JVM gc + clearCache

A DuckDB run of the q35 oracle anchors machine speed in every phase
(same process, same files — if the box is loaded, duck_sec moves too).

Usage: python scripts/cdc_attrib.py [sf_dir] [rounds] [--json out]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402


def _pinned_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = None
    if "--json" in args:
        i = args.index("--json")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = int(args[1]) if len(args) > 1 else 4

    registry = load_all()
    spark = get_spark(app_name="cdc-attrib")
    spark.sparkContext.setLogLevel("ERROR")

    from speculare_pgcdc_spark.cdc.feedgen import feed_messages, lookup_df
    from speculare_pgcdc_spark.cdc.pipeline import (
        normalize_hypertables,
        parse_wal2json,
    )

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def cdc_pipeline():
        return normalize_hypertables(
            parse_wal2json(feed_messages(spark, sf_dir)),
            lookup_df(spark),
        )

    q35 = registry["q35_cdc_pipeline"]

    import duckdb

    from speculare_pgcdc_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_changes = cdc_pipeline().count()
    materialize(cdc_pipeline())  # warm
    materialize(q35.fn(spark, sf_dir))  # warm

    duck_ok = True
    try:
        con.execute(q35.oracle).fetchall()
    except Exception as ex:  # oracle may need views this probe skips
        duck_ok = False
        print(f"duckdb anchor disabled: {type(ex).__name__}: {ex}"[:200],
              file=sys.stderr)

    def sample_phase(name: str) -> dict:
        rows = []
        for r in range(rounds):
            t0 = time.perf_counter()
            materialize(cdc_pipeline())
            pipe = time.perf_counter() - t0
            t0 = time.perf_counter()
            materialize(q35.fn(spark, sf_dir))
            q35s = time.perf_counter() - t0
            ducks = None
            if duck_ok:
                t0 = time.perf_counter()
                con.execute(q35.oracle).fetchall()
                ducks = round(time.perf_counter() - t0, 3)
            rows.append(
                {"pipe_sec": round(pipe, 3), "q35_sec": round(q35s, 3),
                 "duck_sec": ducks}
            )
            print(f"[{name} r{r}] pipe={pipe:.3f}s q35={q35s:.3f}s "
                  f"duck={ducks}s pinned_rdds={_pinned_rdds(spark)}",
                  flush=True)
        pipes = sorted(x["pipe_sec"] for x in rows)
        q35s = sorted(x["q35_sec"] for x in rows)
        return {
            "rounds": rows,
            "pipe_min_sec": pipes[0],
            "pipe_median_sec": pipes[len(pipes) // 2],
            "q35_min_sec": q35s[0],
            "q35_median_sec": q35s[len(q35s) // 2],
            "ev_s_pipe_min": round(n_changes / pipes[0]),
            "ev_s_pipe_median": round(n_changes / pipes[len(pipes) // 2]),
            "ev_s_q35_min": round(n_changes / q35s[0]),
            "pinned_rdds": _pinned_rdds(spark),
        }

    result = {"sf_dir": sf_dir, "n_changes": n_changes, "rounds": rounds}

    result["fresh"] = sample_phase("fresh")

    # pollute: replay the round-7 tier-2 additions the way bench.py
    # runs them (warm + timed passes), twice
    for _ in range(2):
        for name in ("q238_snapshot_diff", "q241_prefix_filter_join",
                     "q250_minhash_quality"):
            materialize(registry[name].fn(spark, sf_dir))
    result["pinned_after_pollute"] = _pinned_rdds(spark)
    result["polluted"] = sample_phase("polluted")

    # hygiene: drop python handles -> ContextCleaner can release the
    # pinned localCheckpoint blocks; clearCache for SQL-cached plans
    gc.collect()
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    result["pinned_after_gc"] = _pinned_rdds(spark)
    result["cleaned"] = sample_phase("cleaned")

    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
