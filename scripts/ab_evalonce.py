"""Interleaved same-session A/B of the eval_once Generate barrier (r14).

Usage: python scripts/ab_evalonce.py [qA qB ...] [--rounds N]

Arm A monkeypatches catalog.eval_once to a plain ``df.select(*cols)``
(the pre-change shape: the min-length/non-empty filter is pushed below
the projection and re-runs the tokenize per row); arm B is the shipped
barrier. Arms alternate which runs first per round in ONE engine
session (ab_spread protocol: back-to-back arms share warm state, so a
fixed order biases the second arm).
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speculare_pgcdc_spark import catalog  # noqa: E402
from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "q324_duplicate_span_mask",
    "q339_ngram_novelty",
    "q343_template_provenance",
    "q143_segment_dedup",
    "q191_split_leakage",
]

#: modules that bound `eval_once` by name at import time
_BOUND_MODULES = [
    "speculare_pgcdc_spark.queries.dataops3",
    "speculare_pgcdc_spark.queries.dataops4",
    "speculare_pgcdc_spark.queries.dataops5",
    "speculare_pgcdc_spark.queries.curation",
    "speculare_pgcdc_spark.queries.corpus",
]

_REAL = catalog.eval_once


def _plain_select(df, *cols):
    return df.select(*cols)


def _set_arm(new: bool) -> None:
    fn = _REAL if new else _plain_select
    catalog.eval_once = fn
    for mname in _BOUND_MODULES:
        m = importlib.import_module(mname)
        if hasattr(m, "eval_once"):
            m.eval_once = fn


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
    spark = get_spark(app_name="ab-evalonce")
    spark.sparkContext.setLogLevel("ERROR")

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
                    f"ab_evalonce {'B-new' if new else 'A-old'} {n} r{r}"
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
    print(json.dumps({"ab_evalonce": out}))


if __name__ == "__main__":
    main()
