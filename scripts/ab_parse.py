"""Interleaved same-session A/B of the parse-once wal2json change (r14).

Usage: python scripts/ab_parse.py [qA qB ...] [--rounds N]

Arm A monkeypatches parse_wal2json back to the pre-change shape (the
``_msg IS NOT NULL`` filter Catalyst pushes below the parse projection,
re-running the payload parse per predicate reference); arm B is the
shipped parse-once form (v1: no redundant guard; v2: Generate barrier).
Arms alternate WHICH RUNS FIRST per round (the round-14 protocol fix:
back-to-back arms share warm state, so a fixed order biases the second
arm) inside ONE engine session, so box drift hits both arms equally and
the per-round ratio B/A is the signal.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from speculare_pgcdc_spark.cdc import pipeline as P  # noqa: E402
from speculare_pgcdc_spark.queries import load_all  # noqa: E402
from speculare_pgcdc_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "q35_cdc_pipeline",
    "q81_cdc_pipeline_v2",
    "q96_cdc_apply",
    "q97_cdc_incremental_matview",
]

_NEW = P.parse_wal2json


def _old_parse(
    payload_df,
    payload_col: str = "payload",
    seq_col: str | None = None,
    fmt: str = "v1",
    delete_keys: bool = False,
):
    """The pre-change parse shape, verbatim (filter above the parse
    projection, no Generate barrier)."""
    if fmt not in ("v1", "v2"):
        raise ValueError(f"unknown wal2json format: {fmt!r}")
    seq = (
        F.col(seq_col).cast("bigint") if seq_col is not None else F.lit(0)
    ).alias("seq")
    if fmt == "v2":
        v2 = payload_df.select(
            seq,
            F.col(payload_col).alias("_raw"),
            F.try_parse_json(F.col(payload_col)).alias("_msg"),
        ).filter(F.col("_msg").isNotNull())
        return P._changes_v2(v2, delete_keys)
    v = payload_df.select(
        seq, F.try_parse_json(F.col(payload_col)).alias("_msg")
    ).filter(F.col("_msg").isNotNull())
    ch = v.select(
        "seq",
        F.posexplode(
            F.expr("variant_get(_msg, '$.change', 'array<variant>')")
        ).alias("chg_idx", "_c"),
    ).withColumn(
        "_vals",
        F.expr("variant_get(_c, '$.columnvalues', 'array<variant>')"),
    )
    typed_cells, lenient_cells = P._cell_transforms("_vals", "x")
    names = F.expr("variant_get(_c, '$.columnnames', 'array<string>')")
    dk = (
        [
            F.expr(
                "variant_get(_c, '$.oldkeys.keynames', 'array<string>')"
            ).alias("_dk_names"),
            F.expr(
                "variant_get(_c, '$.oldkeys.keyvalues', 'array<string>')"
            ).alias("_dk_vals"),
        ]
        if delete_keys
        else []
    )
    pre = ch.select(
        "seq",
        "chg_idx",
        F.expr("variant_get(_c, '$.table', 'string')").alias("table"),
        F.expr("variant_get(_c, '$.kind', 'string')").alias("kind"),
        names.alias("columnnames"),
        typed_cells.alias("_tc"),
        lenient_cells.alias("_lc"),
        F.expr("to_json(_c)").alias("change_json"),
        *dk,
    ).filter(
        F.col("table").isNotNull()
        & F.col("kind").isNotNull()
        & F.col("kind").isin("insert", "update", "delete")
        & P._valid_names("columnnames")
    )
    return P._with_row_maps(pre, delete_keys)


def _set_arm(new: bool) -> None:
    fn = _NEW if new else _old_parse
    P.parse_wal2json = fn
    import speculare_pgcdc_spark.queries.cdc_q as cdc_q

    cdc_q.parse_wal2json = fn


def _run(spark, fn, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 7
    for i, a in enumerate(sys.argv[1:]):
        if a == "--rounds":
            rounds = int(sys.argv[1:][i + 1])
            names = [n for n in names if n != sys.argv[1:][i + 1]]
    if not names:
        names = DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark(app_name="ab-parse")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: feed fixtures + codegen, both arms once, untimed
    from speculare_pgcdc_spark.cdc.feedgen import (
        feed_messages,
        feed_messages_v2,
    )

    feed_messages(spark, sf_dir)
    feed_messages_v2(spark, sf_dir)
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
        first_new = r % 2 == 1  # alternate which arm runs first
        for n in names:
            for new in ([first_new, not first_new]):
                _set_arm(new)
                spark.sparkContext.setJobDescription(
                    f"ab_parse {'B-new' if new else 'A-old'} {n} r{r}"
                )
                t = _run(spark, registry[n].fn, sf_dir)
                res[n]["B" if new else "A"].append(t)
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
    print(json.dumps({"ab_parse": out}))


if __name__ == "__main__":
    main()
