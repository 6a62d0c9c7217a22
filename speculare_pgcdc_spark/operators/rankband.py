"""Banded global rank: exact row_number / ntile over a TOTAL order
without a data-grain single-partition window.

The scale problem: ``row_number() OVER (ORDER BY ...)`` (and ntile,
which is rank arithmetic) forces every row through ONE task.  Fine at
sf0.01; the classic driver-adjacent bottleneck at 100 TB.  The banded
rewrite (the q80/q163/q170 family) decomposes the strictly-before
count into

  (a) a cumulative sum over a BIN-grain aggregate — the only
      unpartitioned window, one row per bin, thousands of rows no
      matter the corpus size — plus
  (b) an in-bin prefix count under a window PARTITIONED by bin,

where the bin key is any coarse expression monotone non-decreasing in
the order's leading key (value ``DIV 10_000``, year*12+month, the
value itself at low cardinality).  ``rn = below_bins + below_in_bin
+ 1`` is exactly the global row_number because the order is TOTAL
(callers must totalize ties with a key column, same as they would for
a deterministic window).

ntile(k) is then pure integer arithmetic on (rn, n): the first
``n % k`` buckets take ``n DIV k + 1`` rows, the rest ``n DIV k`` —
identical to the SQL-standard semantics Spark and DuckDB implement,
so a banded ntile hash-matches an oracle that states plain NTILE.

Reference parity: the reference engine has no window functions at all
(src/ holds a CDC forwarder); this module exists for the §2D
distributional queries (q130 RFM, q184 Lorenz, q187 Zipf) whose naive
forms are the only global-window scale hazards the round-5 audit
found.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["banded_row_number", "banded_ntile"]

#: default value-bin width (shared with q170's RANK_BIN convention)
DEFAULT_BIN = 10_000


def banded_row_number(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    bin_col: Column,
    out: str = "rn",
    *,
    pin: bool = True,
    by: Sequence[str] = (),
) -> DataFrame:
    """Add exact global ``row_number`` (1-based) over a total order.

    ``order_cols`` must define a TOTAL ascending order (add a key
    column to break ties; for descending keys pass ``F.col(c).desc()``
    and a bin expression that is monotone in the DESCENDING key, e.g.
    ``-f``).  ``bin_col`` must be non-null and monotone non-decreasing
    along the order.  ``pin=True`` localCheckpoints the binned frame so
    its two consumers (bin aggregate + in-bin window) share one
    computation.

    ``by`` ranks independently WITHIN each group of the named columns
    (the order restarts at 1 per group): one plan ranks many series at
    once — e.g. q130's three RFM metrics unpivoted to (metric, value)
    rows — instead of one subplan per series, each paying its own bin
    aggregate, window pair, and scheduling overhead. With ``by`` the
    bin-grain cumsum window partitions by the group too, so even the
    band-grain stage is group-parallel.
    """
    _check_reserved(df, out)
    binned = df.withColumn("__b", bin_col)
    if pin:
        binned = binned.localCheckpoint(eager=True)
    return _rank_binned(binned, order_cols, out, by=by)


#: internal working columns — input frames must not collide with them
#: (withColumn would silently overwrite, and the trailing drop would
#: silently delete the caller's data)
_RESERVED = ("__b", "__bcnt", "__below_bins", "__below_in", "__rn", "__n")


def _check_reserved(df: DataFrame, out: str) -> None:
    clash = [c for c in df.columns if c in _RESERVED]
    if clash:
        raise ValueError(
            f"rankband reserves column names {list(_RESERVED)}; "
            f"rename {clash} before calling"
        )
    if out in df.columns:
        # withColumn(out, ...) would silently REPLACE the caller's
        # existing column — refuse instead
        raise ValueError(
            f"output column {out!r} already exists on the input frame; "
            "pass a different `out` name"
        )


def _rank_binned(
    binned: DataFrame,
    order_cols: Sequence[Column | str],
    out: str,
    by: Sequence[str] = (),
) -> DataFrame:
    by = list(by)
    bins = binned.groupBy(*by, "__b").agg(
        F.count(F.lit(1)).alias("__bcnt")
    )
    w_bins = (
        Window.partitionBy(*by)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bins = bins.select(
        *by,
        "__b",
        F.coalesce(F.sum("__bcnt").over(w_bins), F.lit(0)).alias(
            "__below_bins"
        ),
    )
    w_in = (
        Window.partitionBy(*by, "__b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        binned.withColumn("__below_in", F.count(F.lit(1)).over(w_in))
        .join(F.broadcast(bins), [*by, "__b"])
        .withColumn(
            out,
            (F.col("__below_bins") + F.col("__below_in") + F.lit(1))
            .cast("bigint"),
        )
        .drop("__b", "__bcnt", "__below_bins", "__below_in")
    )


def banded_ntile(
    df: DataFrame,
    order_cols: Sequence[Column | str],
    bin_col: Column,
    k: int,
    out: str = "bucket",
    *,
    pin: bool = True,
    by: Sequence[str] = (),
) -> DataFrame:
    """Add exact ``ntile(k)`` over a total order, banded-rank based.

    SQL-standard ntile: with ``n`` rows, buckets ``1..n%k`` hold
    ``n DIV k + 1`` rows and the rest hold ``n DIV k`` — computed here
    as integer arithmetic on the banded row_number, so the result is
    bit-identical to a single-partition NTILE window (which the oracle
    may still state as the spec).  All arithmetic is BIGINT; the
    ``base = 0`` branch (n < k) never divides because rows then always
    fall in the first-``rem`` branch.

    ``by`` computes an independent ntile within each group of the
    named columns (``n`` is then the GROUP's row count) — the
    one-pass multi-series form (see banded_row_number).
    """
    if k < 1:
        raise ValueError(f"banded_ntile needs k >= 1, got {k}")
    _check_reserved(df, out)
    by = list(by)
    binned = df.withColumn("__b", bin_col)
    if pin:
        binned = binned.localCheckpoint(eager=True)
    ranked = _rank_binned(binned, order_cols, out="__rn", by=by)
    # count from the pinned binned frame, not the ranked plan — the
    # broadcast n must not re-execute the join + windows
    bucket = F.expr(
        "CAST(CASE WHEN __rn <= (__n % {k}) * (__n DIV {k} + 1) "
        "THEN (__rn - 1) DIV (__n DIV {k} + 1) + 1 "
        "ELSE (__n % {k}) + (__rn - 1 - (__n % {k}) * (__n DIV {k} + 1)) "
        "DIV (__n DIV {k}) + 1 END AS BIGINT)".format(k=int(k))
    )
    if by:
        n = binned.groupBy(*by).agg(
            F.count(F.lit(1)).cast("bigint").alias("__n")
        )
        joined = ranked.join(F.broadcast(n), by)
    else:
        n = binned.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
        joined = ranked.crossJoin(F.broadcast(n))
    return joined.withColumn(out, bucket).drop("__rn", "__n")
