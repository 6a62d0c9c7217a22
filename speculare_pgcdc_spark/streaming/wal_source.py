"""A real change-feed streaming source via the Python Data Source API
(Spark 4): poll a database table with a monotonic LSN cursor.

This is the production-shaped realization of R1-R7
(/root/reference/src/cdc/replication.rs): the reference opens a
replication connection, reads WAL frames, and acks consumed LSNs back
to the server; this source polls ``SELECT lsn, payload FROM wal WHERE
lsn > :cursor ORDER BY lsn`` per microbatch, uses the max polled LSN as
the streaming offset (checkpointed by Spark), and on ``commit`` writes
the acked LSN back into the database (``wal_ack`` table) — the standby
status update analog (replication.rs:264-282), recorded only after the
microbatch is durably committed, i.e. the same at-least-once contract
as acking after handoff (replication.rs:198-203).

SQLite stands in for PostgreSQL (the harness ships no DB server; SQLite
is the one store with real cross-process concurrency semantics here).
The SQL is deliberately generic — against real PG you would swap the
connect function and the cursor column for an LSN/serial/commit-ts;
nothing else changes. At scale, one source instance polls per feed
shard; the downstream plan (cdc.pipeline) is unchanged.

SimpleDataSourceStreamReader prefetches on the driver — correct here: a
poll cursor is inherently a single-reader protocol (like the
reference's single replication connection); parallelism comes from
partitioning the feed (multiple shards/slots), not from one cursor.
"""

from __future__ import annotations

import sqlite3
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

SCHEMA = "lsn bigint, payload string"


def _connect(db_path: str) -> sqlite3.Connection:
    con = sqlite3.connect(db_path, timeout=30)
    con.execute("PRAGMA journal_mode=WAL")  # readers never block the writer
    con.execute("PRAGMA busy_timeout=30000")
    return con


def pg_lsn_to_int(lsn: str) -> int:
    """PostgreSQL pg_lsn text ('hi/lo' in hex) -> 64-bit integer.

    The cursor column MUST order numerically: pg_lsn as TEXT sorts
    '0/9' AFTER '0/10', so a text-typed cursor would skip or replay
    ranges. Against real PG, convert at the edge with this helper (or
    use the server-side pg_lsn type, which orders correctly) and keep
    every comparison on the integer form."""
    try:
        hi_s, lo_s = lsn.split("/")
        hi, lo = int(hi_s, 16), int(lo_s, 16)
    except (ValueError, AttributeError) as e:
        raise ValueError(f"not a pg_lsn: {lsn!r}") from e
    if not (0 <= hi <= 0xFFFFFFFF and 0 <= lo <= 0xFFFFFFFF):
        raise ValueError(f"pg_lsn parts out of range: {lsn!r}")
    return (hi << 32) | lo


def int_to_pg_lsn(v: int) -> str:
    """Inverse of :func:`pg_lsn_to_int` (for standby status updates)."""
    if not 0 <= v <= 0xFFFFFFFFFFFFFFFF:
        raise ValueError(f"lsn out of 64-bit range: {v}")
    return f"{v >> 32:X}/{v & 0xFFFFFFFF:X}"


def ensure_wal_tables(db_path: str) -> None:
    """Create the wal + wal_ack tables (test/demo helper). wal_ack is a
    SINGLE-row table (fixed key 0): the ack is a high-water mark, not a
    log — an append-per-microbatch table would grow unboundedly on a
    long-running stream and degrade every ack lookup."""
    con = _connect(db_path)
    try:
        con.execute(
            "CREATE TABLE IF NOT EXISTS wal (lsn INTEGER, payload TEXT)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS wal_ack ("
            "id INTEGER PRIMARY KEY CHECK (id = 0), lsn INTEGER)"
        )
        con.commit()
    finally:
        con.close()


def append_wal(db_path: str, lsn: int, payload: str) -> None:
    con = _connect(db_path)
    try:
        con.execute("INSERT INTO wal VALUES (?, ?)", (lsn, payload))
        con.commit()
    finally:
        con.close()


def acked_lsn(db_path: str) -> int:
    con = _connect(db_path)
    try:
        row = con.execute(
            "SELECT lsn FROM wal_ack WHERE id = 0"
        ).fetchone()
        return row[0] if row and row[0] is not None else 0
    finally:
        con.close()


class WalPollReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.db_path = options["path"]
        self.batch_limit = int(options.get("batchlimit", "10000"))

    def initialOffset(self) -> dict:
        # slot-create analog: the replication start point (0 = from the
        # beginning of retained WAL)
        return {"lsn": 0}

    def _poll(self, after: int) -> list[Tuple[int, str]]:
        """Up to batch_limit DISTINCT LSNs past the cursor — always ALL
        rows of the last included LSN. A plain row LIMIT could cut
        inside a run of equal LSNs; the offset would then point past
        the unsent duplicates and `lsn > cursor` would skip them
        forever (silent loss)."""
        con = _connect(self.db_path)
        try:
            cutoff = con.execute(
                "SELECT MAX(lsn) FROM (SELECT DISTINCT lsn FROM wal "
                "WHERE lsn > ? ORDER BY lsn LIMIT ?)",
                (after, self.batch_limit),
            ).fetchone()[0]
            if cutoff is None:
                return []
            return con.execute(
                "SELECT lsn, payload FROM wal WHERE lsn > ? AND lsn <= ? "
                "ORDER BY lsn",
                (after, cutoff),
            ).fetchall()
        finally:
            con.close()

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        rows = self._poll(start["lsn"])
        if not rows:
            return iter([]), start
        return iter(rows), {"lsn": rows[-1][0]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # replay after restart: fetch the WHOLE checkpointed range —
        # deliberately no batch_limit here, a restart with a smaller
        # limit must not truncate a committed microbatch
        if end["lsn"] < start["lsn"]:
            # a backwards range means corrupted/mixed checkpoints (e.g.
            # a text-ordered cursor upstream); silent empty replay would
            # LOSE the committed batch — fail loudly instead
            raise ValueError(
                f"non-monotonic offset range: start={start['lsn']} "
                f"> end={end['lsn']}"
            )
        con = _connect(self.db_path)
        try:
            rows = con.execute(
                "SELECT lsn, payload FROM wal WHERE lsn > ? AND lsn <= ? "
                "ORDER BY lsn",
                (start["lsn"], end["lsn"]),
            ).fetchall()
        finally:
            con.close()
        return iter(rows)

    def commit(self, end: dict) -> None:
        # standby-status-update analog: persist the acked LSN only after
        # the microbatch committed; a crash before this re-polls the
        # same rows (at-least-once), never skips them. Single-row upsert
        # keeping MAX: the ack is a high-water mark (append-forever grew
        # unboundedly), and a late/replayed commit can never move it
        # backwards.
        con = _connect(self.db_path)
        try:
            con.execute(
                "INSERT INTO wal_ack (id, lsn) VALUES (0, ?) "
                "ON CONFLICT(id) DO UPDATE SET "
                "lsn = MAX(wal_ack.lsn, excluded.lsn)",
                (end["lsn"],),
            )
            con.commit()
        finally:
            con.close()


class WalPollSource(DataSource):
    """spark.readStream.format("wal_poll").option("path", db).load()"""

    @classmethod
    def name(cls) -> str:
        return "wal_poll"

    def schema(self) -> str:
        return SCHEMA

    def simpleStreamReader(self, schema) -> WalPollReader:
        return WalPollReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WalPollSource)
