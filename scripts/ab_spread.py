"""Interleaved same-session A/B of catalog.spread_scan (r14).

Usage: python scripts/ab_spread.py qA qB ... [--rounds N]

Arm A monkeypatches spread_scan to identity (the pre-change single-task
scan shape); arm B is the shipped helper. Arms alternate inside each
ROUND (A then B per query, per round) in ONE engine session, so box
drift hits both arms equally and the per-round ratio B/A is the signal
— the round-14 measurement doctrine for a degraded shared box
(OPTIMIZATION_r14.md "Box-state attribution").
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speculare_pgcdc_spark import catalog  # noqa: E402
from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402

#: modules that bound `spread_scan` by name at import time (module-level
#: `from catalog import spread_scan`); function-level importers re-read
#: catalog.spread_scan at call time and need no per-module patch.
_BOUND_MODULES = [
    "speculare_pgcdc_spark.queries.dataops2",
    "speculare_pgcdc_spark.queries.dataops3",
    "speculare_pgcdc_spark.queries.dataops4",
    "speculare_pgcdc_spark.queries.dataops5",
    "speculare_pgcdc_spark.queries.corpus_metrics",
]

_REAL = catalog.spread_scan


def _set_arm(real: bool) -> None:
    fn = _REAL if real else (lambda df: df)
    catalog.spread_scan = fn
    for mname in _BOUND_MODULES:
        m = importlib.import_module(mname)
        if hasattr(m, "spread_scan"):
            m.spread_scan = fn


def _run(spark, fn, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 7
    for a in sys.argv[1:]:
        if a.startswith("--rounds"):
            rounds = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark(app_name="ab-spread")
    spark.sparkContext.setLogLevel("ERROR")
    # one untimed warm pass per arm per query (plan compile, codegen)
    for name in names:
        for real in (False, True):
            _set_arm(real)
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    out: dict = {}
    samples: dict[str, dict[str, list[float]]] = {
        n: {"base": [], "spread": []} for n in names
    }
    for r in range(rounds):
        for name in names:
            fn = registry[name].fn
            # alternate WHICH arm goes first per round: back-to-back
            # arms share warm page cache / shuffle state, so a fixed
            # order biases the second arm (measured on an untouched
            # control query: fixed-order per-round ratio median 0.74)
            order = (False, True) if r % 2 == 0 else (True, False)
            for real in order:
                _set_arm(real)
                arm = "cand" if real else "base"
                spark.sparkContext.setJobDescription(
                    f"ab-spread {arm}:{name}"
                )
                samples[name]["spread" if real else "base"].append(
                    _run(spark, fn, sf_dir)
                )
    _set_arm(True)
    for name in names:
        b = samples[name]["base"]
        s = samples[name]["spread"]
        ratios = sorted(si / bi for si, bi in zip(s, b))
        out[name] = {
            "base_min": round(min(b), 3),
            "base_median": round(sorted(b)[len(b) // 2], 3),
            "spread_min": round(min(s), 3),
            "spread_median": round(sorted(s)[len(s) // 2], 3),
            "per_round_ratio_median": round(ratios[len(ratios) // 2], 3),
            "base_samples": [round(x, 3) for x in b],
            "spread_samples": [round(x, 3) for x in s],
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({"ab_spread": out, "rounds": rounds, "sf": sf_dir}))


if __name__ == "__main__":
    main()
