"""WebSocket sidecar end-to-end: the reference's front door (connect ->
DSL subscription -> receive routed changes live) served from this repo
alone. The client side is hand-rolled RFC 6455 (masked frames) so the
test has zero dependencies beyond the stdlib."""

from __future__ import annotations

import asyncio
import json
import os

from speculare_pgcdc_spark.cdc.feedgen import FEED_TABLES, lookup_df
from speculare_pgcdc_spark.service.ws_sidecar import (
    WsSidecar,
    accept_key,
    read_frame,
)


def test_accept_key_rfc_vector():
    # RFC 6455 §1.3 worked example
    assert (
        accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


def _client_frame(opcode: int, payload: bytes = b"") -> bytes:
    mask = b"\x12\x34\x56\x78"
    data = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
    assert len(payload) < 126
    return bytes([0x80 | opcode, 0x80 | len(payload)]) + mask + data


async def _handshake(port: int, query: str):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    writer.write(
        (
            f"GET /ws?query={query} HTTP/1.1\r\n"
            "Host: localhost\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    await writer.drain()
    status = await reader.readline()
    headers = {}
    while True:
        line = await reader.readline()
        if line in (b"\r\n", b""):
            break
        k, v = line.decode().split(":", 1)
        headers[k.strip().lower()] = v.strip()
    return reader, writer, status.decode(), headers


def _wal2json_line(kind, tbl, names, values):
    return {
        "change": [
            {
                "kind": kind,
                "table": tbl,
                "columnnames": names,
                "columnvalues": values,
            }
        ]
    }


def test_ws_subscribe_receive_and_disconnect(spark, tmp_path):
    """Full loop: client connects with a DSL query (applied LIVE to the
    running watch), receives each routed change as one text frame in
    order, and its disconnect unsubscribes it from the registry."""
    from speculare_pgcdc_spark.engine import Engine

    feed_dir = str(tmp_path / "feed")
    out_dir = str(tmp_path / "outbox")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(feed_dir)

    eng = Engine(spark=spark, tables=FEED_TABLES)
    q = eng.watch(feed_dir, out_dir, ckpt, lookup=lookup_df(spark))

    def produce(name, msgs):
        with open(os.path.join(feed_dir, name), "w") as f:
            for m in msgs:
                f.write(json.dumps(m) + "\n")
        q.processAllAvailable()

    async def scenario():
        sidecar = WsSidecar.for_engine(eng, out_dir)
        port = await sidecar.start()
        try:
            reader, writer, status, headers = await _handshake(
                port, "insert:events_a"
            )
            assert "101" in status
            assert (
                headers["sec-websocket-accept"]
                == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
            )
            assert len(eng._subs) == 1  # registered on connect

            loop = asyncio.get_running_loop()
            await loop.run_in_executor(
                None,
                produce,
                "f1.json",
                [
                    _wal2json_line("insert", "events_a", ["id"], [1]),
                    _wal2json_line("insert", "events_a", ["id"], [2]),
                    # filtered out: wrong kind and wrong table
                    _wal2json_line("update", "events_a", ["id"], [3]),
                    _wal2json_line("insert", "events_b", ["id"], [4]),
                ],
            )
            msgs = []
            while len(msgs) < 2:
                opcode, data = await asyncio.wait_for(
                    read_frame(reader), timeout=15
                )
                if opcode == 0x1:
                    msgs.append(json.loads(data.decode()))
            ids = [m["columnvalues"][0] for m in msgs]
            assert ids == [1, 2]  # routed changes only, in order

            writer.write(_client_frame(0x8))
            await writer.drain()
            # server replies close and unsubscribes
            await asyncio.sleep(0.3)
            assert len(eng._subs) == 0
            writer.close()
        finally:
            await sidecar.stop()

    try:
        asyncio.run(scenario())
    finally:
        q.stop()


def test_ws_bad_and_missing_query_get_400(spark, tmp_path):
    from speculare_pgcdc_spark.engine import Engine

    eng = Engine(spark=spark, tables=FEED_TABLES)

    async def scenario():
        sidecar = WsSidecar.for_engine(eng, str(tmp_path / "out"))
        port = await sidecar.start()
        try:
            # invalid DSL -> 400 before upgrade, nothing registered
            _, writer, status, _ = await _handshake(
                port, "frobnicate:nope"
            )
            assert "400" in status
            writer.close()
            assert len(eng._subs) == 0

            # missing query param entirely -> 400 (ws_handler.rs:36-41)
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", port
            )
            writer.write(
                b"GET /ws HTTP/1.1\r\nHost: x\r\n"
                b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n\r\n"
            )
            await writer.drain()
            status2 = (await reader.readline()).decode()
            assert "400" in status2
            writer.close()
        finally:
            await sidecar.stop()

    asyncio.run(scenario())


def test_ws_auth_gate_403_and_pass(spark, tmp_path):
    """restrict_auth wired at the front door: a non-admin subscription
    whose filter value isn't backed by an api_key row is refused with
    HTTP 403 before the upgrade; an authorized one connects. Mirrors
    the reference's auth feature (auth.rs:126-224 over the cookie
    extract at :100-123); here the header->AuthInfo mapping is a
    pluggable callback."""
    from speculare_pgcdc_spark.cdc.auth import (
        AuthInfo,
        SubscriptionAuthorizer,
        api_keys_df,
    )
    from speculare_pgcdc_spark.engine import Engine

    eng = Engine(spark=spark, tables=FEED_TABLES)
    authorizer = SubscriptionAuthorizer(
        api_keys_df(spark, [("cust1", "host-a", "key-a")])
    )

    def auth_from_headers(headers):
        return AuthInfo(
            customer_id=headers.get("x-customer", ""), is_admin=False
        )

    async def connect(port, query, customer):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(
            (
                f"GET /ws?query={query} HTTP/1.1\r\n"
                f"Host: x\r\nX-Customer: {customer}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n\r\n"
            ).encode()
        )
        await writer.drain()
        status = (await reader.readline()).decode()
        writer.close()
        return status

    async def scenario():
        sidecar = WsSidecar.for_engine(
            eng,
            str(tmp_path / "out"),
            authorizer=authorizer,
            auth_from_headers=auth_from_headers,
        )
        port = await sidecar.start()
        try:
            # unauthorized host filter -> 403, nothing registered
            s = await connect(
                port, "insert:events_a:host_uuid.eq.host-EVIL", "cust1"
            )
            assert "403" in s
            assert len(eng._subs) == 0
            # authorized host filter -> 101 upgrade
            s = await connect(
                port, "insert:events_a:host_uuid.eq.host-a", "cust1"
            )
            assert "101" in s
        finally:
            await sidecar.stop()

    asyncio.run(scenario())


def test_ws_malformed_request_line_gets_400(spark, tmp_path):
    from speculare_pgcdc_spark.engine import Engine

    eng = Engine(spark=spark, tables=FEED_TABLES)

    async def scenario():
        sidecar = WsSidecar.for_engine(eng, str(tmp_path / "out"))
        port = await sidecar.start()
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", port
            )
            writer.write(b"GARBAGE\r\n\r\n")
            await writer.drain()
            status = (await reader.readline()).decode()
            assert "400" in status
            writer.close()
        finally:
            await sidecar.stop()

    asyncio.run(scenario())
