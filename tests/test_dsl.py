"""Reference-equivalence unit tests for the subscription DSL
(SURVEY §5.2) — each pins a quirk of /root/reference/src/api/query.rs,
ws_utils.rs, or utils/specific_filter.rs."""

from __future__ import annotations

import pytest

from speculare_pgcdc_spark.dsl import (
    ALL_KINDS,
    DELETE,
    INSERT,
    UPDATE,
    DslError,
    parse_ws_query,
)

TABLES = ["cpustats", "test_table0", "test_table1"]


def test_single_type():
    w = parse_ws_query("insert:cpustats", TABLES)
    assert w.change_flag == INSERT
    assert w.change_table == "cpustats"
    assert w.specific is None


def test_multi_type_comma():
    w = parse_ws_query("insert,update:cpustats", TABLES)
    assert w.change_flag == INSERT | UPDATE


def test_star_expands_all():  # ws_utils.rs:49-53
    w = parse_ws_query("*:cpustats", TABLES)
    assert w.change_flag == ALL_KINDS == INSERT | UPDATE | DELETE


def test_unknown_type_ignored_but_known_kept():  # ws_utils.rs:54-57
    w = parse_ws_query("bogus,delete:cpustats", TABLES)
    assert w.change_flag == DELETE


def test_all_unknown_types_rejected():  # query.rs:27-31
    with pytest.raises(DslError):
        parse_ws_query("bogus:cpustats", TABLES)


def test_missing_table_rejected():  # query.rs:44-48
    with pytest.raises(DslError):
        parse_ws_query("insert", TABLES)


def test_unknown_table_rejected():  # query.rs:37-41
    with pytest.raises(DslError):
        parse_ws_query("insert:nope", TABLES)


def test_eq_filter():
    w = parse_ws_query("insert:cpustats:host_uuid.eq.abc", TABLES)
    assert w.specific is not None
    assert w.specific.op == "eq"
    assert w.specific.values == ("abc",)


def test_in_filter_splits_commas():
    w = parse_ws_query("insert:cpustats:name.in.W1,W3", TABLES)
    assert w.specific.op == "in"
    assert w.specific.values == ("W1", "W3")


def test_filter_value_keeps_dots():  # splitn(3, '.')
    w = parse_ws_query("insert:cpustats:ip.eq.10.0.0.1", TABLES)
    assert w.specific.values == ("10.0.0.1",)


def test_unknown_operator_silently_dropped():  # query.rs:71-73
    w = parse_ws_query("insert:cpustats:col.gt.5", TABLES)
    assert w.specific is None
    assert w.change_flag == INSERT


def test_malformed_filter_dropped():  # match arm _ => None
    w = parse_ws_query("insert:cpustats:justacolumn", TABLES)
    assert w.specific is None
