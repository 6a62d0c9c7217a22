"""Interleaved same-session A/B of the latest_changes null-key barrier
(r14).

Usage: python scripts/ab_latest.py [qA qB ...] [--rounds N]

Arm A monkeypatches cdc.apply.latest_changes back to the pre-change
shape (filter(key IS NOT NULL) directly above the keyed projection —
Catalyst pushes it below with the key expression substituted, re-running
the full row_str map build per row); arm B is the shipped
Generate-barrier form. Arms alternate which runs first per round in ONE
engine session (ab_spread protocol).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from speculare_pgcdc_spark.cdc import apply as A  # noqa: E402
from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "q96_cdc_apply",
    "q97_cdc_incremental_matview",
]

_NEW = A.latest_changes


def _old_latest_changes(changes, key_col, key_t="string", tables=None):
    rel = changes if tables is None else changes.filter(
        F.col("table_name").isin(tables)
    )
    keyed = rel.select(
        A._change_key(key_col, "_dk_names" in changes.columns)
        .cast(key_t)
        .alias(key_col),
        F.struct("seq", "chg_idx").alias("_ord"),
        F.struct("kind", "row_str").alias("_chg"),
    ).filter(F.col(key_col).isNotNull())
    return keyed.groupBy(key_col).agg(
        F.max_by("_chg", "_ord").alias("_chg")
    )


def _set_arm(new: bool) -> None:
    A.latest_changes = _NEW if new else _old_latest_changes


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 7
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--rounds":
            rounds = int(argv[i + 1])
            names = [n for n in names if n != argv[i + 1]]
    if not names:
        names = DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark(app_name="ab-latest")
    spark.sparkContext.setLogLevel("ERROR")

    from speculare_pgcdc_spark.cdc.feedgen import feed_messages

    feed_messages(spark, sf_dir)
    for new in (False, True):
        _set_arm(new)
        for n in names:
            registry[n].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

    res: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names
    }
    for r in range(rounds):
        first_new = r % 2 == 1
        for n in names:
            for new in ([first_new, not first_new]):
                _set_arm(new)
                spark.sparkContext.setJobDescription(
                    f"ab_latest {'B-new' if new else 'A-old'} {n} r{r}"
                )
                t0 = time.perf_counter()
                registry[n].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                res[n]["B" if new else "A"].append(
                    time.perf_counter() - t0
                )
        print(
            f"round {r}: "
            + " ".join(
                f"{n}: A={res[n]['A'][-1]:.3f} B={res[n]['B'][-1]:.3f}"
                for n in names
            ),
            flush=True,
        )
    _set_arm(True)

    out = {}
    for n in names:
        a, b = res[n]["A"], res[n]["B"]
        ratios = [y / x for x, y in zip(a, b)]
        out[n] = {
            "A_min": round(min(a), 3),
            "B_min": round(min(b), 3),
            "A_median": round(statistics.median(a), 3),
            "B_median": round(statistics.median(b), 3),
            "ratio_median": round(statistics.median(ratios), 3),
            "rounds": rounds,
        }
        print(n, json.dumps(out[n]), flush=True)
    print(json.dumps({"ab_latest": out}))


if __name__ == "__main__":
    main()
