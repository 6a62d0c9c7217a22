"""Snapshot formatted physical plans per query into plans/<tag>/.

Usage: python scripts/snap_plans.py <suffix> [query ...]

Writes plans/r14/<query>_<suffix>.txt (suffix = "before" / "after")
for each named query, or for the whole benched suite (tier1 + TIER2)
when no query names are given. Explain-only: nothing executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_TAG", "r15"),
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    if not names:
        import bench

        tier1 = sorted(n for n, s in registry.items() if s.bench)
        names = tier1 + [n for n in bench.TIER2 if n not in tier1]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="plan-snap")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = registry[name]
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} [{suffix}]\n\n")
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
