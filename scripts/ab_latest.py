"""Interleaved same-session A/B of the latest_changes reduction shape.

Usage: python scripts/ab_latest.py [qA qB ...] [--rounds N]

Arm A monkeypatches cdc.apply.latest_changes back to the r14-shipped
one-pass form (max_by(_chg, _ord) — SortAggregate, because the
map-typed _chg buffer is not hash-aggregable: per-partition sort of
the full parsed batch); arm B is the shipped r15 join-back form
(HashAggregate max over the packed decimal order key + join the
winner back — guide §8's decide-on-a-proxy shape). Arms alternate
which runs first per round in ONE engine session (ab_spread protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from speculare_pgcdc_spark.catalog import eval_once  # noqa: E402
from speculare_pgcdc_spark.cdc import apply as A  # noqa: E402
from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "q96_cdc_apply",
    "q97_cdc_incremental_matview",
]

_NEW = A.latest_changes


def _old_latest_changes(changes, key_col, key_t="string", tables=None):
    """The r14-shipped form: barrier + one-pass max_by (SortAggregate)."""
    rel = changes if tables is None else changes.filter(
        F.col("table_name").isin(tables)
    )
    keyed = rel.select(
        A._change_key(key_col, "_dk_names" in changes.columns)
        .cast(key_t)
        .alias(key_col),
        F.struct("seq", "chg_idx").alias("_ord"),
        F.struct("kind", "row_str").alias("_chg"),
    )
    keyed = eval_once(keyed, key_col, "_ord", "_chg").filter(
        F.col(key_col).isNotNull()
    )
    return keyed.groupBy(key_col).agg(
        F.max_by("_chg", "_ord").alias("_chg")
    )


def _set_arm(new: bool) -> None:
    A.latest_changes = _NEW if new else _old_latest_changes


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--rounds", type=int, default=7)
    args = ap.parse_args()
    rounds = args.rounds
    names = args.queries or DEFAULT_QUERIES
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
