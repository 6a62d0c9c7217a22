"""Command-line entry point — the reference binary's boot surface
(src/main.rs:24-86: load config -> connect -> spawn CDC loop -> serve
WS) as ``python -m speculare_pgcdc_spark``.

Three commands:

- ``list``: print the registered operator inventory (no Spark session
  — the registry is importable metadata).
- ``run NAME``: execute one registry query against a fixture dir and
  print rows (``--explain`` prints the formatted physical plan
  instead — the plan-inspection loop SCALING.md prescribes).
- ``serve``: the main.rs analog — load the TOML config, start the
  Engine's watch on a change feed, and serve WebSocket subscriptions
  over it until interrupted.
"""

from __future__ import annotations

import argparse
import sys
from typing import Callable, Optional


def _cmd_list(_args) -> int:
    from speculare_pgcdc_spark.queries import load_all

    reg = load_all()
    for name, spec in reg.items():
        kind = "oracle" if spec.oracle else "behavior"
        print(f"{name}\t[{kind}]")
    print(f"# {len(reg)} queries", file=sys.stderr)
    return 0


def _cmd_run(args, spark_factory: Callable) -> int:
    from speculare_pgcdc_spark.queries import load_all

    reg = load_all()
    if args.name not in reg:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    spark = spark_factory()
    df = reg[args.name].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


def _cmd_serve(args, spark_factory: Callable) -> int:
    from speculare_pgcdc_spark.config import load_config
    from speculare_pgcdc_spark.engine import Engine
    from speculare_pgcdc_spark.service.ws_sidecar import (
        run_sidecar_forever,
    )

    cfg = load_config(args.config)
    spark = spark_factory()
    engine = Engine(spark=spark, tables=args.tables.split(","))
    query = engine.watch(
        args.feed_dir,
        args.out_dir,
        args.checkpoint_dir,
    )
    # sidecar_kwargs already splits `binding` into host/port and adds
    # certfile/keyfile when https is on; watch_query ties server
    # lifetime to the stream (a dead watch must stop the server, not
    # leave it serving a stale out_dir)
    run_sidecar_forever(
        engine, args.out_dir, watch_query=query, **cfg.sidecar_kwargs()
    )
    return 0  # pragma: no cover — run_sidecar_forever blocks


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m speculare_pgcdc_spark",
        description="PySpark-native CDC + analytics engine",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="print the registered query inventory")

    runp = sub.add_parser("run", help="run one registry query")
    runp.add_argument("name")
    runp.add_argument(
        "--sf-dir", default="/root/testdata/sf0.001",
        help="fixture directory of parquet tables",
    )
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument(
        "--explain", action="store_true",
        help="print the formatted physical plan instead of rows "
        "(note: layout/interchange queries still execute their "
        "build-time writes and eager checkpoints — --explain skips "
        "only the final action)",
    )

    servep = sub.add_parser(
        "serve", help="start the CDC watch + WebSocket sidecar"
    )
    servep.add_argument("--config", required=True, help="TOML config")
    servep.add_argument("--feed-dir", required=True)
    servep.add_argument("--out-dir", required=True)
    servep.add_argument("--checkpoint-dir", required=True)
    servep.add_argument(
        "--tables", default="events_a,events_b",
        help="comma-separated table catalog for the subscription DSL",
    )
    return p


def main(
    argv: Optional[list] = None,
    spark_factory: Optional[Callable] = None,
) -> int:
    args = build_parser().parse_args(argv)
    if spark_factory is None:
        from speculare_pgcdc_spark.session import get_spark

        spark_factory = get_spark
    if args.cmd == "list":
        return _cmd_list(args)
    if args.cmd == "run":
        return _cmd_run(args, spark_factory)
    return _cmd_serve(args, spark_factory)


if __name__ == "__main__":
    raise SystemExit(main())
