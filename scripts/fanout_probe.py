"""Fan-out basis probe (round-12, r11 verdict item 3): attribute the
`cdc_fanout_events_per_s` sample spread so the band can be declared
from data and any future dip self-attributes.

Per sample, three timings over the SAME hot feed:
  route_collect_sec  — parse -> normalize -> route -> executor-side
                       count only (no Python delivery, no writes):
                       the pure compute+shuffle path
  fanout_sec         — the full benched path (route -> repartition ->
                       sortWithinPartitions -> foreachPartition ->
                       idempotent outbox)
  delivery_sec       — their difference (Python adapter + file IO +
                       the second shuffle's execution skew)

plus 1-min loadavg and JVM GC-ms delta per sample. Reading rule
(extends BASELINE.md round-11): if an outlier's inflation lives in
route_collect_sec it is compute/box noise (GC, scan jitter); if it
lives in delivery_sec with flat GC it is outbox IO / writeback.

Usage: python scripts/fanout_probe.py [sf_dir] [--rounds N] [--json out]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speculare_pgcdc_spark.cdc.feedgen import (  # noqa: E402
    FEED_TABLES,
    feed_messages,
    lookup_df,
)
from speculare_pgcdc_spark.cdc.pipeline import (  # noqa: E402
    normalize_hypertables,
    parse_wal2json,
    route,
    subscriptions_df,
)
from speculare_pgcdc_spark.session import get_spark  # noqa: E402
from speculare_pgcdc_spark.streaming.fanout import (  # noqa: E402
    fanout_partitions,
    idempotent_outbox_deliver,
)

SUBS = [
    (1, "insert,update:events_a"),
    (2, "*:events_b"),
    (3, "insert,update:events_a:event_type.in.click,view"),
    (4, "delete:events_b"),
]


def _gc_ms(spark) -> int:
    try:
        beans = spark._jvm.java.lang.management.ManagementFactory \
            .getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime()
                   for i in range(beans.size()))
    except Exception:  # noqa: BLE001
        return -1


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = 7
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark(app_name="fanout-probe")
    spark.sparkContext.setLogLevel("ERROR")

    feed = feed_messages(spark, sf_dir)
    changes = normalize_hypertables(parse_wal2json(feed), lookup_df(spark))
    n_changes = changes.count()
    subs = subscriptions_df(spark, SUBS, FEED_TABLES)

    def routed():
        return route(changes, subs)

    n_routed = routed().count()
    out_dir = tempfile.mkdtemp(prefix="fanout_probe_")
    deliver = idempotent_outbox_deliver(out_dir)
    fanout_partitions(routed(), deliver, batch_id=0)  # warm

    samples = []
    try:
        for i in range(rounds):
            g0 = _gc_ms(spark)
            t0 = time.perf_counter()
            routed().count()
            t_route = time.perf_counter() - t0
            t1 = time.perf_counter()
            fanout_partitions(routed(), deliver, batch_id=0)
            t_fan = time.perf_counter() - t1
            samples.append({
                "route_collect_sec": round(t_route, 3),
                "fanout_sec": round(t_fan, 3),
                "delivery_sec": round(t_fan - t_route, 3),
                "loadavg1": round(os.getloadavg()[0], 1),
                "gc_ms_delta": _gc_ms(spark) - g0,
            })
            print(json.dumps(samples[-1]), flush=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    fans = sorted(s["fanout_sec"] for s in samples)
    best, med = fans[0], fans[len(fans) // 2]
    report = {
        "_meta": {
            "sf_dir": sf_dir,
            "n_changes": n_changes,
            "n_routed": n_routed,
            "rounds": rounds,
        },
        "samples": samples,
        "fanout_best_sec": best,
        "fanout_median_sec": med,
        "events_per_s_best": round(n_changes / best),
        "events_per_s_median": round(n_changes / med),
    }
    print(json.dumps({k: v for k, v in report.items() if k != "samples"}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
