"""Subscription DSL: ``change_type[,ct]*:table[:col.(eq|in).val[,val]*]``

Faithful re-implementation of the reference's query parser and filter
semantics (/root/reference/src/api/query.rs:10-85,
src/api/ws_utils.rs:38-58, src/utils/specific_filter.rs:17-50), compiled
to a Spark ``Column`` predicate instead of a per-message closure.

Pinned reference quirks (unit-tested in tests/test_dsl.py):
- unknown change type contributes nothing; if ALL types unknown the mask
  is 0 -> error (query.rs:27-31)
- '*' == insert|update|delete (ws_utils.rs:49-53)
- unknown table -> error (query.rs:37-41)
- unknown filter operator -> filter silently dropped, subscription still
  valid (query.rs:71-73)
- filter value may contain dots (splitn(3, '.')); in-list splits on ','
- eq/in match ONLY string-typed JSON cells (specific_filter.rs:36-46);
  absent column -> no match (specific_filter.rs:27-29); delete events
  carry oldkeys, not columnnames -> filtered subscriptions never match
  deletes (specific_filter.rs:19-25)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

INSERT = 1 << 1
UPDATE = 1 << 2
DELETE = 1 << 3
ALL_KINDS = INSERT | UPDATE | DELETE

_FLAG_OF = {"insert": INSERT, "update": UPDATE, "delete": DELETE, "*": ALL_KINDS}


class DslError(ValueError):
    """Equivalent of the reference's ApiError::ExplicitError (HTTP 400)."""


@dataclass(frozen=True)
class SpecificFilter:
    column: str
    op: str  # 'eq' | 'in'
    values: tuple[str, ...]


@dataclass(frozen=True)
class WatchFor:
    change_table: str
    change_flag: int
    specific: Optional[SpecificFilter]


def apply_flag(flag: int, ctype: str) -> int:
    """ws_utils.rs:38-58 — unknown types contribute nothing."""
    return flag | _FLAG_OF.get(ctype, 0)


def kind_flag(kind: str) -> int:
    return _FLAG_OF.get(kind, 0)


def parse_ws_query(query: str, tables: Sequence[str]) -> WatchFor:
    """query.rs:10-85. ``tables`` is the catalog (detect_tables analog)."""
    parts = query.split(":")

    flag = 0
    for ctype in parts[0].split(","):
        flag = apply_flag(flag, ctype)
    if flag == 0:
        raise DslError("the change_type params does not match requirements")

    if len(parts) < 2:
        raise DslError("the change_table params is not present")
    change_table = parts[1]
    if change_table not in tables:
        raise DslError("the table asked for does not exists")

    specific: Optional[SpecificFilter] = None
    if len(parts) >= 3:
        fparts = parts[2].split(".", 2)  # splitn(3, '.') — value keeps dots
        if len(fparts) == 3:
            col, op, val = fparts
            if op == "eq":
                specific = SpecificFilter(col, "eq", (val,))
            elif op == "in":
                specific = SpecificFilter(col, "in", tuple(val.split(",")))
            # unknown operator -> None, silently (query.rs:71-73)

    return WatchFor(change_table, flag, specific)


def filter_predicate(
    specific: Optional[SpecificFilter], row_typed: str = "row_typed"
) -> Column:
    """Compile a SpecificFilter to a Column over the normalized change
    frame (see cdc.pipeline: ``row_typed`` maps column name -> cell value
    ONLY when the original JSON cell was a string).

    Null propagation reproduces every reference quirk at once: absent
    column, non-string cell, and delete events (null map) all yield NULL
    -> filter() drops the row.
    """
    if specific is None:
        return F.lit(True)
    cell = F.try_element_at(F.col(row_typed), F.lit(specific.column))
    if specific.op == "eq":
        return cell == F.lit(specific.values[0])
    return cell.isin(*specific.values)


def subscription_predicate(
    watch: WatchFor,
    table_col: str = "table_name",
    kind_col: str = "kind",
    row_typed: str = "row_typed",
) -> Column:
    """The full standing-query predicate: table + change-type bitmask +
    optional specific filter (forwarder/mod.rs:95-127 + send_message)."""
    kind_bit = (
        F.when(F.col(kind_col) == "insert", F.lit(INSERT))
        .when(F.col(kind_col) == "update", F.lit(UPDATE))
        .when(F.col(kind_col) == "delete", F.lit(DELETE))
        .otherwise(F.lit(0))
    )
    return (
        (F.col(table_col) == F.lit(watch.change_table))
        & (kind_bit.bitwiseAND(F.lit(watch.change_flag)) != 0)
        & filter_predicate(watch.specific, row_typed)
    )
