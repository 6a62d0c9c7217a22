"""wal2json change pipeline (reference analog: src/forwarder/mod.rs:75-143).

The reference processes one JSON message at a time off an mpsc channel;
here the same dataflow is a single declarative DataFrame plan that works
identically in batch and Structured Streaming (microbatch = the channel):

    payload -> parse_json (VariantType) -> explode(change) ->
    project/validate -> normalize row maps -> hypertable lookup ->
    route(subscriptions)

VariantType (Spark 4) is the load-bearing choice: it preserves per-cell
JSON types columnar-natively, which is what lets the engine pin the
reference's "eq/in match only string-typed cells" quirk
(src/utils/specific_filter.rs:36-46) without a Python UDF. Everything
below is JVM-side expressions — at 100 TB this pipeline is a single
narrow stage until the (broadcast) routing join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from speculare_pgcdc_spark.dsl import DELETE, INSERT, UPDATE

#: Stable output schema of parse_wal2json.
CHANGE_COLUMNS = [
    "seq",          # WAL position of the enclosing message (0 if unknown)
    "chg_idx",      # index of the change within its message's array
    "table",        # raw table name as emitted by wal2json
    "kind",         # insert | update | delete (others dropped, see below)
    "columnnames",  # array<string> (null for deletes)
    "row_typed",    # map col -> value, ONLY string-typed JSON cells
    "row_str",      # map col -> lenient string-cast of any scalar cell
    "change_json",  # canonical JSON of the change (fan-out payload)
]


def parse_wal2json(
    payload_df: DataFrame,
    payload_col: str = "payload",
    seq_col: str | None = None,
    fmt: str = "v1",
    delete_keys: bool = False,
) -> DataFrame:
    """One row per change event from a frame of wal2json messages
    (R8 parse + R9 explode + R10 project/validate).

    ``fmt`` selects the wal2json output format. "v1" (the reference's
    pin — it creates its slot with plugin defaults,
    src/cdc/replication.rs:35) frames one TRANSACTION per message with
    a ``change`` array. "v2" (format-version 2, what a real PG >= 10
    deployment commonly runs) frames one CHANGE per message:
    ``action`` I/U/D (B/C begin/commit and M/T message/truncate frames
    are dropped, matching v1's kind filter), ``columns`` as
    [{name,type,value}] objects, ``identity`` instead of oldkeys on
    deletes. Both formats produce the identical normalized schema
    (CHANGE_COLUMNS), so everything downstream — normalize, route,
    fan-out — is format-agnostic.

    Messages without a ``change`` array are dropped (forwarder
    mod.rs:85-91 logs + continues); changes missing table/kind are
    dropped (mod.rs:129-134); kinds other than insert/update/delete
    (wal2json 'message'/'truncate') get flag 0 and are skipped
    (mod.rs:125-128).

    ``delete_keys=True`` additionally emits ``_dk_names`` /
    ``_dk_vals`` (array<string>): the delete's REPLICA IDENTITY key
    names/values — v1 ``oldkeys``, v2 ``identity`` — extracted
    DIRECTLY from the in-hand variant. Apply-side consumers
    (cdc.apply._change_key) otherwise have to recover them by
    re-parsing ``change_json``, which keeps the to_json render alive
    in plans that never ship a payload; with the columns present,
    Catalyst prunes the render out of the apply lineage entirely
    (guide §2.3/§4: the render costs more than the rest of the
    parse). Off by default so the dispatch path's schema — and the
    cdc_events_per_s basis defined over it — is unchanged.

    Ordering: the reference forwards changes to each client in WAL
    order over one ordered channel (forwarder/mod.rs:44-72). Here the
    order key is carried as DATA — ``seq`` (the message's WAL position
    from ``seq_col``, e.g. the wal_poll source's ``lsn``; 0 when the
    feed has none) plus ``chg_idx`` (posexplode index within the
    message's change array) — and re-established at the fan-out sink by
    sorting each subscriber's payload list on (seq, chg_idx). Order
    scope: within a microbatch, and only as strong as ``seq`` (a
    seq-less feed orders within each message only).
    """
    # try_parse_json: a malformed payload yields NULL and is dropped —
    # the reference logs the simd-json error and continues
    # (forwarder/mod.rs:83-91); strict parse_json would fail the whole
    # microbatch on one bad frame.
    #
    # Parse-once doctrine (r14, guide §4.4's duplicate-evaluation
    # defect with a JVM expression instead of a UDF): any filter above
    # a Project gets pushed below it with the alias SUBSTITUTED, so a
    # predicate on ``_msg`` re-runs the full payload parse per
    # reference — the v1 ``_msg IS NOT NULL`` guard doubled the parse,
    # and v2's pushed table/kind/valid-names filter ran it ~7x per
    # row. v1 therefore drops the guard outright: it is provably
    # redundant, ``posexplode(variant_get(NULL,'$.change'))`` emits
    # zero rows, the exact drop the filter expressed. v2 has no
    # explode to hide behind, so the parse rides a one-element
    # ``explode(array(...))`` Generate barrier: the generator runs
    # once per row, and Catalyst cannot push a predicate below a
    # Generate whose output it references.
    if fmt not in ("v1", "v2"):
        raise ValueError(f"unknown wal2json format: {fmt!r}")
    seq = (
        F.col(seq_col).cast("bigint") if seq_col is not None else F.lit(0)
    ).alias("seq")
    if fmt == "v2":
        v2 = payload_df.select(
            seq,
            F.col(payload_col).alias("_raw"),
            F.explode(
                F.array(F.try_parse_json(F.col(payload_col)))
            ).alias("_msg"),
        ).filter(F.col("_msg").isNotNull())
        return _changes_v2(v2, delete_keys)
    v = payload_df.select(
        seq, F.try_parse_json(F.col(payload_col)).alias("_msg")
    )
    ch = v.select(
        "seq",
        F.posexplode(
            F.expr("variant_get(_msg, '$.change', 'array<variant>')")
        ).alias("chg_idx", "_c"),
    ).withColumn(
        # materialize the columnvalues array ONCE before the two cell
        # transforms — each variant_get over _c re-walks the variant
        # (the same cost note as the v2 branch's _cols)
        "_vals",
        F.expr("variant_get(_c, '$.columnvalues', 'array<variant>')"),
    )
    typed_cells, lenient_cells = _cell_transforms("_vals", "x")
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
        & _valid_names("columnnames")
    )
    return _with_row_maps(pre, delete_keys)


def _cell_transforms(arr_expr: str, value_acc: str):
    """The typed/lenient cell rule, shared by both wal2json formats and
    parameterized on how the value variant is reached from an array
    element ``x`` (v1: the element IS the value; v2: ``variant_get(x,
    '$.value')``). row_typed keeps ONLY string-typed JSON cells — the
    reference's specific_filter quirk (specific_filter.rs:36-46) —
    while row_str leniently casts any scalar. One definition so the
    quirk cannot silently fork between formats."""
    typed = F.expr(
        f"transform({arr_expr},"
        f" x -> CASE WHEN schema_of_variant({value_acc}) = 'STRING'"
        f"      THEN variant_get({value_acc}, '$', 'string') END)"
    )
    lenient = F.expr(f"transform({arr_expr}, x -> cast({value_acc} AS string))")
    return typed, lenient


def _valid_names(col: str):
    """Drop-malformed guard for the column-name array: a null element
    or a duplicate name would make map_from_arrays throw (NULL_MAP_KEY /
    DUPLICATED_MAP_KEY), turning one bad frame into a poison pill that
    fails the microbatch on every retry. The contract is log-and-
    continue (forwarder/mod.rs:83-91): such changes are dropped. A null
    ARRAY stays valid — deletes carry no columns."""
    c = F.col(col)
    no_null_elem = ~F.exists(c, lambda n: n.isNull())
    no_dupes = F.size(c) == F.size(F.array_distinct(c))
    return c.isNull() | (no_null_elem & no_dupes)


def _with_row_maps(pre: DataFrame, delete_keys: bool = False) -> DataFrame:
    """Build row_typed/row_str AFTER the validity filter (building them
    in the same projection would evaluate map_from_arrays on the very
    rows the filter exists to drop)."""
    return pre.select(
        "seq",
        "chg_idx",
        "table",
        "kind",
        "columnnames",
        F.map_from_arrays("columnnames", "_tc").alias("row_typed"),
        F.map_from_arrays("columnnames", "_lc").alias("row_str"),
        "change_json",
        *(["_dk_names", "_dk_vals"] if delete_keys else []),
    )


def _changes_v2(v: DataFrame, delete_keys: bool = False) -> DataFrame:
    """wal2json format-2 branch: ``v`` is (seq, _raw, _msg variant) with
    one CHANGE per message, so chg_idx is always 0 — WAL order within a
    batch is carried entirely by seq. ``columns`` [{name,type,value}]
    maps onto the same typed/lenient cell rule as v1's columnvalues
    (row_typed keeps only string-typed JSON values — the reference's
    specific_filter quirk); deletes carry ``identity`` only, which like
    v1's oldkeys yields null row maps.

    Cost shape (profiled at sf0.1): the columns array is materialized
    ONCE into ``_cols`` (repeating variant_get(_msg, '$.columns') per
    transform re-walks the variant), the per-cell VALUE variants once
    more into ``_vals`` so the typed/lenient transforms never re-walk
    ``variant_get(x, '$.value')``; and ``change_json`` is the RAW
    payload line verbatim (in
    v2 the message IS the change frame), because to_json on a variant
    costs more than the entire rest of the parse."""
    act = F.expr("variant_get(_msg, '$.action', 'string')")
    kind = (
        F.when(act == "I", "insert")
        .when(act == "U", "update")
        .when(act == "D", "delete")
    )
    w = v.select(
        "seq",
        "_raw",
        "_msg",
        F.expr("variant_get(_msg, '$.columns', 'array<variant>')").alias(
            "_cols"
        ),
    ).withColumn(
        # materialize the VALUE variants once (r14: the typed transform
        # walked variant_get(x, '$.value') twice per cell — inside
        # schema_of_variant and again for the extraction — and the
        # lenient transform a third time; CollapseProject keeps this
        # projection separate because _vals is referenced twice and the
        # transform is non-cheap, so the walk now runs once per cell,
        # mirroring the v1 branch's _vals)
        "_vals",
        F.expr("transform(_cols, x -> variant_get(x, '$.value'))"),
    )
    names = F.expr("transform(_cols, x -> variant_get(x, '$.name', 'string'))")
    typed_cells, lenient_cells = _cell_transforms("_vals", "x")
    dk = (
        [
            F.expr(
                "transform(variant_get(_msg, '$.identity',"
                " 'array<variant>'), x -> variant_get(x, '$.name',"
                " 'string'))"
            ).alias("_dk_names"),
            F.expr(
                "transform(variant_get(_msg, '$.identity',"
                " 'array<variant>'), x -> variant_get(x, '$.value',"
                " 'string'))"
            ).alias("_dk_vals"),
        ]
        if delete_keys
        else []
    )
    pre = w.select(
        "seq",
        F.lit(0).alias("chg_idx"),
        F.expr("variant_get(_msg, '$.table', 'string')").alias("table"),
        kind.alias("kind"),
        names.alias("columnnames"),
        typed_cells.alias("_tc"),
        lenient_cells.alias("_lc"),
        F.col("_raw").alias("change_json"),
        *dk,
    ).filter(
        F.col("table").isNotNull()
        & F.col("kind").isNotNull()
        & _valid_names("columnnames")
    )
    return _with_row_maps(pre, delete_keys)


#: hypertable lookups at or below this many rows inline as a literal
#: map expression; larger catalogs fall back to the broadcast join
LOOKUP_INLINE_MAX_ROWS = 1000


def _hyper_idx():
    idx_str = F.when(
        F.col("table").startswith("_hyper_"),
        F.regexp_extract("table", r"^_hyper_(\d+)_", 1),
    ).otherwise(F.lit(""))
    return F.when(idx_str != "", idx_str.cast("int"))


def normalize_hypertables(
    changes: DataFrame, lookup: DataFrame | None
) -> DataFrame:
    """TimescaleDB chunk-name -> base-table normalization (R11;
    forwarder/mod.rs:15-41 + cdc/mod.rs:12-18).

    ``lookup`` is a small (idx int, table_name string) frame — the
    _timescaledb_catalog.hypertable analog. The reference loads it ONCE
    at startup into an in-process HashMap (cdc/mod.rs:49-72); the
    faithful Spark shape is the same model-to-data move: collect the
    catalog at plan-build time and inline it as a LITERAL map lookup —
    a narrow map, no join, no per-microbatch broadcast exchange
    (profiled ~2x on the q35 pipeline vs the broadcast join). Catalogs
    larger than LOOKUP_INLINE_MAX_ROWS keep the broadcast-join path so
    the plan never embeds an unbounded literal. Fallback-to-raw-name
    on: non-_hyper_ prefix, non-numeric idx, idx missing from the
    lookup. (The reference would panic on a non-numeric idx after
    '_hyper_'; we take the documented fallback branch instead.)

    Adds ``table_name`` (normalized); keeps ``table`` (raw).
    """
    if lookup is None:
        return changes.withColumn("table_name", F.col("table"))
    rows = (
        lookup.select("idx", "table_name")
        .limit(LOOKUP_INLINE_MAX_ROWS + 1)
        .collect()
    )
    if len(rows) > LOOKUP_INLINE_MAX_ROWS:
        with_idx = changes.withColumn("_hyper_idx", _hyper_idx())
        lk = F.broadcast(
            lookup.select(
                F.col("idx").alias("_lk_idx"),
                F.col("table_name").alias("_lk_name"),
            )
        )
        return (
            with_idx.join(lk, with_idx._hyper_idx == lk._lk_idx, "left")
            .withColumn("table_name", F.coalesce("_lk_name", "table"))
            .drop("_hyper_idx", "_lk_idx", "_lk_name")
        )
    # first entry wins on a duplicate idx — the HashMap contract; a
    # join would instead duplicate every change of that chunk
    mapping: dict[int, str] = {}
    for r in rows:
        if r["idx"] is not None and r["idx"] not in mapping:
            mapping[r["idx"]] = r["table_name"]
    if not mapping:
        resolved = F.lit(None).cast("string")
    else:
        pairs: list = []
        for idx, name in mapping.items():
            pairs.append(F.lit(idx))
            pairs.append(F.lit(name))
        resolved = F.try_element_at(F.create_map(*pairs), _hyper_idx())
    return changes.withColumn(
        "table_name", F.coalesce(resolved, F.col("table"))
    )


def subscriptions_df(spark, subs, tables):
    """Parse DSL strings into the standing-subscriptions frame consumed
    by route() (R16+R17: the parsed WsWatchFor registry as data).

    subs: iterable of (sub_id, dsl_query). Invalid queries raise DslError
    exactly like the reference returns HTTP 400.
    """
    from speculare_pgcdc_spark.dsl import parse_ws_query

    rows = []
    for sub_id, q in subs:
        w = parse_ws_query(q, tables)
        rows.append(
            (
                sub_id,
                w.change_table,
                w.change_flag,
                w.specific.column if w.specific else None,
                w.specific.op if w.specific else None,
                list(w.specific.values) if w.specific else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "sub_id bigint, change_table string, change_flag int,"
        " filter_col string, filter_op string, filter_vals array<string>",
    )


def _kind_bit():
    # lazy: building a Column needs an active SparkContext
    return (
        F.when(F.col("kind") == "insert", F.lit(INSERT))
        .when(F.col("kind") == "update", F.lit(UPDATE))
        .when(F.col("kind") == "delete", F.lit(DELETE))
        .otherwise(F.lit(0))
    )


def route(changes: DataFrame, subscriptions: DataFrame) -> DataFrame:
    """Routing + per-subscription filtering (R13 + R14; forwarder
    mod.rs:105-127 and send_message :44-72).

    ``subscriptions`` columns: sub_id, change_table, change_flag,
    filter_col (nullable), filter_op ('eq'|'in', nullable), filter_vals
    (array<string>, nullable). It is the engine's ServerState: the
    reference's three HashMap<table, HashSet<id>> indexes become ONE
    broadcast hash join on table name + bitmask residual + generic
    filter residual — all JVM-side.

    Returns one row per (change, matching subscription).
    """
    subs = F.broadcast(
        subscriptions.select(
            "sub_id",
            F.col("change_table").alias("_s_table"),
            F.col("change_flag").alias("_s_flag"),
            F.col("filter_col").alias("_s_col"),
            F.col("filter_op").alias("_s_op"),
            F.col("filter_vals").alias("_s_vals"),
        )
    )
    cell = F.try_element_at(F.col("row_typed"), F.col("_s_col"))
    filter_ok = (
        F.when(F.col("_s_col").isNull(), F.lit(True))
        .when(
            F.col("_s_op") == "eq",
            cell == F.try_element_at(F.col("_s_vals"), F.lit(1)),
        )
        .when(F.col("_s_op") == "in", F.array_contains("_s_vals", cell))
        .otherwise(F.lit(False))
    )
    cond = (
        (F.col("table_name") == F.col("_s_table"))
        & (_kind_bit().bitwiseAND(F.col("_s_flag")) != 0)
    )
    return (
        changes.join(subs, cond, "inner")
        .filter(filter_ok)
        .drop("_s_table", "_s_flag", "_s_col", "_s_op", "_s_vals")
    )
