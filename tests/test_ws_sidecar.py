"""WebSocket sidecar end-to-end: the reference's front door (connect ->
DSL subscription -> receive routed changes live) served from this repo
alone. The client side is hand-rolled RFC 6455 (masked frames) so the
test has zero dependencies beyond the stdlib."""

from __future__ import annotations

import asyncio
import json
import os

import pytest

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


class _FakeRegistry:
    """Engine-free subscribe/unsubscribe target so protocol tests don't
    need a SparkSession."""

    def __init__(self):
        self.subs = {}

    def subscribe(self, sub_id, dsl):
        self.subs[sub_id] = dsl

    def unsubscribe(self, sub_id):
        self.subs.pop(sub_id, None)


def _sidecar(tmp_path, **kw):
    reg = _FakeRegistry()
    sidecar = WsSidecar(
        str(tmp_path / "out"),
        subscribe=reg.subscribe,
        unsubscribe=reg.unsubscribe,
        poll_interval=0.01,
        **kw,
    )
    return sidecar, reg


def test_ping_health_route(tmp_path):
    """/ping answers 200 "zpour" to any method (server.rs:27) — no
    upgrade headers required."""

    async def scenario():
        sidecar, _ = _sidecar(tmp_path)
        port = await sidecar.start()
        try:
            for method in ("GET", "POST"):
                reader, writer = await asyncio.open_connection(
                    "127.0.0.1", port
                )
                writer.write(
                    f"{method} /ping HTTP/1.1\r\nHost: x\r\n\r\n".encode()
                )
                await writer.drain()
                status = (await reader.readline()).decode()
                assert "200" in status
                body = await reader.read(1024)
                assert b"zpour" in body
                writer.close()
        finally:
            await sidecar.stop()

    asyncio.run(scenario())


def test_missing_sec_websocket_key_gets_400(tmp_path):
    async def scenario():
        sidecar, reg = _sidecar(tmp_path)
        port = await sidecar.start()
        try:
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", port
            )
            writer.write(
                b"GET /ws?query=insert:events_a HTTP/1.1\r\nHost: x\r\n"
                b"Upgrade: websocket\r\nConnection: Upgrade\r\n\r\n"
            )
            await writer.drain()
            status = (await reader.readline()).decode()
            assert "400" in status
            assert reg.subs == {}  # rejected before registration
            writer.close()
        finally:
            await sidecar.stop()

    asyncio.run(scenario())


async def _upgraded(tmp_path, sidecar_kw=None, query="insert:events_a"):
    sidecar, reg = _sidecar(tmp_path, **(sidecar_kw or {}))
    port = await sidecar.start()
    reader, writer, status, _ = await _handshake(port, query)
    assert "101" in status
    return sidecar, reg, reader, writer


def _read_close_code(data: bytes) -> int:
    return int.from_bytes(data[:2], "big")


def test_unmasked_client_frame_fails_connection_1002(tmp_path):
    """RFC 6455 §5.1: the server must fail the connection on an
    unmasked client frame, not silently decode it with a zero mask."""

    async def scenario():
        sidecar, reg, reader, writer = await _upgraded(tmp_path)
        try:
            # unmasked ping frame (mask bit unset)
            writer.write(bytes([0x89, 0x00]))
            await writer.drain()
            while True:
                opcode, data = await asyncio.wait_for(
                    read_frame(reader), timeout=10
                )
                if opcode == 0x8:
                    assert _read_close_code(data) == 1002
                    break
            await asyncio.sleep(0.05)
            assert reg.subs == {}  # violation unsubscribes
        finally:
            writer.close()
            await sidecar.stop()

    asyncio.run(scenario())


def test_oversized_declared_frame_refused_1009(tmp_path):
    """A client declaring a giant frame must be refused BEFORE the
    payload is buffered (close 1009), not read toward 2^63 bytes."""

    async def scenario():
        sidecar, reg, reader, writer = await _upgraded(tmp_path)
        try:
            # masked frame declaring 2^40 bytes, no payload sent
            writer.write(
                bytes([0x81, 0x80 | 127])
                + (1 << 40).to_bytes(8, "big")
                + b"\x12\x34\x56\x78"
            )
            await writer.drain()
            while True:
                opcode, data = await asyncio.wait_for(
                    read_frame(reader), timeout=10
                )
                if opcode == 0x8:
                    assert _read_close_code(data) == 1009
                    break
        finally:
            writer.close()
            await sidecar.stop()

    asyncio.run(scenario())


def test_ws_ids_skip_registry_entries(tmp_path):
    """ADVICE r3: the WS id counter must not collide with ids
    registered directly via Engine.subscribe — a colliding connect
    would silently overwrite that entry and delete it on disconnect."""

    async def scenario():
        reg = _FakeRegistry()
        reg.subs[1] = "pre-existing"  # registered out-of-band
        reg.subs[2] = "pre-existing-2"
        sidecar = WsSidecar(
            str(tmp_path / "out"),
            subscribe=reg.subscribe,
            unsubscribe=reg.unsubscribe,
            poll_interval=0.01,
            id_taken=lambda i: i in reg.subs,
        )
        port = await sidecar.start()
        try:
            reader, writer, status, _ = await _handshake(
                port, "insert:events_a"
            )
            assert "101" in status
            await asyncio.sleep(0.05)
            # the connect took id 3, not 1
            assert reg.subs[1] == "pre-existing"
            assert reg.subs[2] == "pre-existing-2"
            assert reg.subs[3] == "insert:events_a"
            writer.write(_client_frame(0x8))
            await writer.drain()
            await asyncio.sleep(0.2)
            assert 3 not in reg.subs  # only ITS id removed
            assert 1 in reg.subs and 2 in reg.subs
            writer.close()
        finally:
            await sidecar.stop()

    asyncio.run(scenario())


def test_outbox_tailer_reads_only_appended_bytes(tmp_path):
    """ADVICE r3: the tailer must be incremental — each poll reads only
    appended data, only complete lines, across both outbox layouts."""
    from speculare_pgcdc_spark.service.ws_sidecar import OutboxTailer

    d = tmp_path / "out" / "7"
    os.makedirs(d)
    t = OutboxTailer(str(tmp_path / "out"), 7)

    (d / "outbox.jsonl").write_text("a\nb\n")
    assert t.poll() == ["a", "b"]
    assert t.poll() == []  # nothing new -> nothing re-read

    with open(d / "outbox.jsonl", "a") as f:
        f.write("c\npartial")  # half-appended line stays pending
    assert t.poll() == ["c"]
    with open(d / "outbox.jsonl", "a") as f:
        f.write("-done\n")
    assert t.poll() == ["partial-done"]

    # per-batch files tail in numeric batch order
    (d / "batch-2.jsonl").write_text("x2\n")
    (d / "batch-10.jsonl").write_text("x10\n")
    assert t.poll() == ["x2", "x10"]
    # idempotent replay rewrites identical bytes -> nothing new
    (d / "batch-2.jsonl").write_text("x2\n")
    assert t.poll() == []


def test_wss_tls_handshake_and_frames(tmp_path):
    """TLS termination in the sidecar (server.rs:45-58 rustls analog):
    a wss:// client completes the upgrade and receives outbox frames
    over the encrypted channel. Ephemeral self-signed cert — generated
    in-test, nothing committed."""
    import datetime
    import ssl

    cryptography = pytest.importorskip("cryptography")  # noqa: F841
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.x509.oid import NameOID

    key = ec.generate_private_key(ec.SECP256R1())
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "localhost")]
    )
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(hours=1))
        .sign(key, hashes.SHA256())
    )
    certfile = tmp_path / "cert.pem"
    keyfile = tmp_path / "key.pem"
    certfile.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyfile.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        )
    )

    from speculare_pgcdc_spark.service.ws_sidecar import (
        server_ssl_context,
    )

    out_dir = tmp_path / "out"
    os.makedirs(out_dir / "1")
    (out_dir / "1" / "outbox.jsonl").write_text('{"n":1}\n')

    async def scenario():
        reg = _FakeRegistry()
        sidecar = WsSidecar(
            str(out_dir),
            subscribe=reg.subscribe,
            unsubscribe=reg.unsubscribe,
            poll_interval=0.01,
        )
        port = await sidecar.start(
            ssl_context=server_ssl_context(str(certfile), str(keyfile))
        )
        try:
            client_ctx = ssl.create_default_context()
            client_ctx.check_hostname = False
            client_ctx.verify_mode = ssl.CERT_NONE
            reader, writer = await asyncio.open_connection(
                "127.0.0.1", port, ssl=client_ctx
            )
            assert writer.get_extra_info("ssl_object") is not None
            writer.write(
                (
                    "GET /ws?query=insert:events_a HTTP/1.1\r\n"
                    "Host: localhost\r\n"
                    "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    "Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n\r\n"
                ).encode()
            )
            await writer.drain()
            status = (await reader.readline()).decode()
            assert "101" in status
            while True:
                line = await reader.readline()
                if line in (b"\r\n", b""):
                    break
            opcode, data = await asyncio.wait_for(
                read_frame(reader), timeout=10
            )
            assert opcode == 0x1 and json.loads(data) == {"n": 1}
            writer.write(_client_frame(0x8))
            await writer.drain()
            writer.close()
        finally:
            await sidecar.stop()

    asyncio.run(scenario())


def test_ws_signed_cookie_auth_end_to_end(spark, tmp_path):
    """The reference's full front-door auth: a signed SP-CKS cookie
    identifies the caller (401 without it, 400 if tampered), and
    restrict_auth then gates the subscription filter (403 on an
    unowned host). auth.rs:62-224 end-to-end over the engine."""
    from speculare_pgcdc_spark.cdc.auth import (
        SubscriptionAuthorizer,
        api_keys_df,
        cookie_auth_from_headers,
        sign_cookie,
    )
    from speculare_pgcdc_spark.engine import Engine

    eng = Engine(spark=spark, tables=FEED_TABLES)
    authorizer = SubscriptionAuthorizer(
        api_keys_df(spark, [("cust1", "host-a", "key-a")])
    )

    async def connect(port, query, cookie=None, adm=None):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        extra = ""
        if cookie is not None:
            extra += f"Cookie: SP-CKS={cookie}\r\n"
        if adm is not None:
            extra += f"SP-ADM: {adm}\r\n"
        writer.write(
            (
                f"GET /ws?query={query} HTTP/1.1\r\nHost: x\r\n{extra}"
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
            auth_from_headers=cookie_auth_from_headers(
                "ck-secret", admin_secret="adm-secret"
            ),
        )
        port = await sidecar.start()
        q = "insert:events_a:host_uuid.eq.host-a"
        try:
            assert "401" in await connect(port, q)  # no cookie
            assert "400" in await connect(port, q, cookie="garbage")
            good = sign_cookie("ck-secret", '{"user_id": "cust1"}')
            assert "101" in await connect(port, q, cookie=good)
            evil = "insert:events_a:host_uuid.eq.host-EVIL"
            assert "403" in await connect(port, evil, cookie=good)
            # admin header: no cookie, no filter requirement
            assert "101" in await connect(
                port, "insert:events_a", adm="adm-secret"
            )
        finally:
            await sidecar.stop()

    asyncio.run(scenario())


def test_run_sidecar_forever_dies_with_watch_stream(tmp_path):
    """Supervision contract (main.rs:73-86 analog): a dead CDC watch
    stream must take the sidecar down — never keep serving a stale
    out_dir. Exercises both death modes: stream exception and plain
    stop."""
    import pytest

    from speculare_pgcdc_spark.service.ws_sidecar import (
        run_sidecar_forever,
    )

    class FakeEngine:
        _subs: dict = {}

        def subscribe(self, *a, **k):
            return None

        def unsubscribe(self, *a, **k):
            return None

    class DeadQuery:
        isActive = False

        def exception(self):
            return None

    class FailedQuery:
        isActive = True

        def exception(self):
            return Exception("boom from executor")

    with pytest.raises(RuntimeError, match="stopped"):
        run_sidecar_forever(
            FakeEngine(), str(tmp_path / "out"), port=0,
            watch_query=DeadQuery(), watch_poll_sec=0.01,
        )
    with pytest.raises(RuntimeError, match="boom"):
        run_sidecar_forever(
            FakeEngine(), str(tmp_path / "out"), port=0,
            watch_query=FailedQuery(), watch_poll_sec=0.01,
        )


def test_ws_ids_skip_restored_engine_registry(spark, tmp_path):
    """Restart path (VERDICT r5 #8): a checkpoint-restored Engine
    repopulates `_subs` BEFORE the sidecar starts; `for_engine`'s
    allocator must skip those ids too — it reads `engine._subs` live,
    so pre-populated entries survive a new WS connect/disconnect."""
    from speculare_pgcdc_spark.engine import Engine

    async def scenario():
        eng = Engine(
            spark, "/root/testdata/sf0.001", tables=["events_a"]
        )
        # simulate restore-from-checkpoint: registry rebuilt up front
        eng.subscribe(1, "insert:events_a")
        eng.subscribe(2, "insert:events_a:host_uuid.eq.host-a")
        sidecar = WsSidecar.for_engine(
            eng, str(tmp_path / "out"), poll_interval=0.01
        )
        port = await sidecar.start()
        try:
            reader, writer, status, _ = await _handshake(
                port, "insert:events_a"
            )
            assert "101" in status
            await asyncio.sleep(0.05)
            assert sorted(eng._subs) == [1, 2, 3]
            writer.write(_client_frame(0x8))
            await writer.drain()
            await asyncio.sleep(0.2)
            # only the WS connection's id was removed on disconnect
            assert sorted(eng._subs) == [1, 2]
            writer.close()
        finally:
            await sidecar.stop()

    asyncio.run(scenario())


def test_oversized_ping_fails_connection_1002(tmp_path):
    """RFC 6455 §5.5: control frames cap at 125 payload bytes; a
    200-byte ping must fail the connection with 1002 — echoing it
    would emit a length byte with the MASK bit set (0xC8) and desync
    the client's framing (round-6 review)."""

    async def scenario():
        sidecar, reg, reader, writer = await _upgraded(tmp_path)
        try:
            payload = b"p" * 200
            mask = b"\x12\x34\x56\x78"
            data = bytes(
                c ^ mask[i % 4] for i, c in enumerate(payload)
            )
            # masked ping with 16-bit extended length (200 bytes)
            writer.write(
                bytes([0x89, 0x80 | 126])
                + len(payload).to_bytes(2, "big") + mask + data
            )
            await writer.drain()
            while True:
                opcode, data = await asyncio.wait_for(
                    read_frame(reader), timeout=10
                )
                if opcode == 0x8:  # close, never a corrupt pong
                    assert _read_close_code(data) == 1002
                    break
        finally:
            writer.close()
            await sidecar.stop()

    asyncio.run(scenario())


def test_query_param_is_percent_decoded_exactly_once(tmp_path):
    """Round-6 review: parse_qs already percent-decodes; a filter
    value sent as 'a%2520b' (one encoding of the literal 'a%20b')
    must reach the DSL as 'a%20b', never double-decoded to 'a b' —
    the reference's axum Query extractor decodes once."""

    async def scenario():
        sidecar, reg = _sidecar(tmp_path)
        port = await sidecar.start()
        try:
            reader, writer, status, _ = await _handshake(
                port, "insert:events_a:host_uuid.eq.a%2520b"
            )
            assert "101" in status
            await asyncio.sleep(0.05)
            assert list(reg.subs.values()) == [
                "insert:events_a:host_uuid.eq.a%20b"
            ]
            writer.close()
        finally:
            await sidecar.stop()

    asyncio.run(scenario())
