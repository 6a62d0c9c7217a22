"""WebSocket serving sidecar — the reference's front door
(src/api/server.rs:18-66 + src/api/ws_handler.rs:28-143) realized as a
stdlib-only asyncio server over the engine's outbox contract.

Division of labor (BASELINE.json / SURVEY R21): Spark computes the
routed per-subscriber change feed and writes each subscriber's outbox
(streaming/fanout.py); THIS process owns the client connections. The
two meet at the filesystem: the sidecar registers the subscription in
the Engine's live registry (applied on the watch query's next
microbatch — api/ws_handler.rs live-forwarder semantics) and tails the
subscriber's outbox, pushing each payload line as one text frame — the
reference's exact per-client dataflow (forwarder -> mpsc channel ->
websocket sink), with the outbox as the durable channel.

Protocol behavior mirrored from the reference:

- ``GET <path>?query=<dsl>`` upgrade; a missing/invalid query returns
  HTTP 400 BEFORE the upgrade (ws_handler.rs:35-46 ExplicitError) with
  the DSL error text.
- each accepted client gets a fresh id from a process-wide counter
  (ID_COUNTER analog) used as its subscription id.
- client disconnect (close frame / EOF) unsubscribes it
  (ws_handler.rs ws_disconnected analog); with the live registry the
  routing join stops matching it on the next microbatch.

The WebSocket layer itself is RFC 6455 with no dependencies: HTTP/1.1
upgrade handshake (SHA-1 accept key), unmasked server->client text
frames, masked client->server frames (only close/ping are expected and
handled). Production deployments would terminate WS at any off-the-
shelf gateway instead; this sidecar exists so the full reference
surface — connect, subscribe via DSL, receive routed changes live —
is runnable and tested end-to-end from this repo alone.
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import itertools
import os
from typing import Callable, Optional
from urllib.parse import parse_qs, unquote, urlsplit

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

#: ID_COUNTER analog (monotone per process).
_ids = itertools.count(1)


def accept_key(sec_websocket_key: str) -> str:
    """RFC 6455 §4.2.2 Sec-WebSocket-Accept."""
    digest = hashlib.sha1(
        (sec_websocket_key.strip() + _WS_GUID).encode()
    ).digest()
    return base64.b64encode(digest).decode()


def encode_text_frame(payload: str) -> bytes:
    """One FIN text frame, server->client (never masked)."""
    data = payload.encode("utf-8")
    n = len(data)
    if n < 126:
        head = bytes([0x81, n])
    elif n < (1 << 16):
        head = bytes([0x81, 126]) + n.to_bytes(2, "big")
    else:
        head = bytes([0x81, 127]) + n.to_bytes(8, "big")
    return head + data


def encode_close_frame(code: int = 1000) -> bytes:
    return bytes([0x88, 2]) + code.to_bytes(2, "big")


async def read_frame(reader: asyncio.StreamReader):
    """Decode one client frame -> (opcode, payload bytes). Client
    frames MUST be masked (RFC 6455 §5.1); raises on EOF."""
    b1, b2 = await reader.readexactly(2)
    opcode = b1 & 0x0F
    masked = bool(b2 & 0x80)
    length = b2 & 0x7F
    if length == 126:
        length = int.from_bytes(await reader.readexactly(2), "big")
    elif length == 127:
        length = int.from_bytes(await reader.readexactly(8), "big")
    mask = await reader.readexactly(4) if masked else b"\x00" * 4
    data = await reader.readexactly(length)
    if masked:
        data = bytes(c ^ mask[i % 4] for i, c in enumerate(data))
    return opcode, data


class WsSidecar:
    """Serve WebSocket subscriptions over a live registry + outbox dir.

    subscribe(sub_id, dsl) must raise ValueError-family (DslError) on a
    bad query — mapped to HTTP 400 exactly like the reference's
    ExplicitError; unsubscribe(sub_id) is called on disconnect.
    read_lines(sub_id) returns ALL delivered payload lines so far (the
    fanout.read_outbox contract); the tailer pushes the suffix beyond
    what it already sent, polling every ``poll_interval`` seconds.
    """

    def __init__(
        self,
        out_dir: str,
        subscribe: Callable[[int, str], object],
        unsubscribe: Callable[[int], None],
        read_lines: Optional[Callable[[int], list]] = None,
        poll_interval: float = 0.05,
        path: str = "/ws",
        auth_from_headers: Optional[Callable[[dict], object]] = None,
    ) -> None:
        from speculare_pgcdc_spark.streaming.fanout import read_outbox

        self.out_dir = out_dir
        self.subscribe = subscribe
        self.unsubscribe = unsubscribe
        self.read_lines = read_lines or (
            lambda sid: read_outbox(out_dir, sid)
        )
        self.poll_interval = poll_interval
        self.path = path
        #: optional auth gate (the reference's cookie->AuthInfo extract,
        #: auth.rs:100-123): maps request headers -> an auth object the
        #: subscribe callable understands, raising cdc.auth.AuthError to
        #: refuse the connection with 403 (restrict_auth analog). None
        #: = auth feature off (the reference's non-auth build).
        self.auth_from_headers = auth_from_headers
        self._server: asyncio.AbstractServer | None = None

    @classmethod
    def for_engine(
        cls, engine, out_dir: str, authorizer=None, **kw
    ) -> "WsSidecar":
        """Wire straight onto an Engine's live registry: subscriptions
        registered here apply to a running watch() on its next
        microbatch, and a disconnect stops routing the same way.
        Pass ``authorizer`` (cdc.auth.SubscriptionAuthorizer) together
        with ``auth_from_headers`` to enable the restrict_auth gate."""

        def subscribe(sub_id, dsl, auth=None):
            return engine.subscribe(
                sub_id, dsl, auth=auth, authorizer=authorizer
            )

        return cls(
            out_dir,
            subscribe=subscribe,
            unsubscribe=engine.unsubscribe,
            **kw,
        )

    async def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        self._server = await asyncio.start_server(
            self._handle, host, port
        )
        return self._server.sockets[0].getsockname()[1]

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
            self._server = None

    async def _handle(
        self,
        reader: asyncio.StreamReader,
        writer: asyncio.StreamWriter,
    ) -> None:
        sub_id: int | None = None
        try:
            request = await reader.readuntil(b"\r\n\r\n")
            head = request.decode("latin-1").split("\r\n")
            try:
                method, target, _ = head[0].split(" ", 2)
            except ValueError:
                await self._http_error(writer, 400, "malformed request")
                return
            headers = {}
            for line in head[1:]:
                if ":" in line:
                    k, v = line.split(":", 1)
                    headers[k.strip().lower()] = v.strip()
            url = urlsplit(target)
            if method != "GET" or url.path != self.path:
                await self._http_error(writer, 404, "not found")
                return
            if "websocket" not in headers.get("upgrade", "").lower():
                await self._http_error(writer, 400, "expected upgrade")
                return
            qs = parse_qs(url.query)
            if "query" not in qs:
                # ws_handler.rs:36-41: missing query param -> 400
                await self._http_error(
                    writer, 400, "missing the query params"
                )
                return
            dsl = unquote(qs["query"][0])
            sub_id = next(_ids)
            try:
                if self.auth_from_headers is not None:
                    from speculare_pgcdc_spark.cdc.auth import AuthError

                    try:
                        self.subscribe(
                            sub_id,
                            dsl,
                            auth=self.auth_from_headers(headers),
                        )
                    except AuthError as ex:
                        # restrict_auth rejection -> 403
                        # (AuthorizationError analog, auth.rs:213-224)
                        sub_id = None
                        await self._http_error(writer, 403, str(ex))
                        return
                else:
                    self.subscribe(sub_id, dsl)
            except Exception as ex:  # DslError -> 400, like the 400s
                # the reference's query::parse_ws_query error path
                sub_id = None
                await self._http_error(writer, 400, str(ex))
                return
            key = headers.get("sec-websocket-key", "")
            writer.write(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\n"
                    "Connection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
                ).encode()
            )
            await writer.drain()
            await self._serve_client(reader, writer, sub_id)
        except (
            asyncio.IncompleteReadError,
            asyncio.LimitOverrunError,  # headers beyond the 64 KiB limit
            ConnectionResetError,
            BrokenPipeError,
        ):
            pass
        finally:
            if sub_id is not None:
                # ws_disconnected analog: the live registry drops the
                # client; routing stops on the next microbatch
                self.unsubscribe(sub_id)
            writer.close()

    async def _serve_client(self, reader, writer, sub_id: int) -> None:
        """Push new outbox lines as text frames until the client closes
        (close frame / EOF). One tailer + one reader task per client —
        the reference's per-client forward task + receive loop."""
        stop = asyncio.Event()

        async def recv_loop():
            try:
                while True:
                    opcode, data = await read_frame(reader)
                    if opcode == 0x8:  # close
                        break
                    if opcode == 0x9:  # ping -> pong
                        writer.write(bytes([0x8A, len(data)]) + data)
                        await writer.drain()
            except (asyncio.IncompleteReadError, ConnectionResetError):
                pass
            finally:
                stop.set()

        recv = asyncio.create_task(recv_loop())
        sent = 0
        try:
            while not stop.is_set():
                lines = self.read_lines(sub_id)
                for line in lines[sent:]:
                    writer.write(encode_text_frame(line))
                sent = max(sent, len(lines))
                await writer.drain()
                try:
                    await asyncio.wait_for(
                        stop.wait(), timeout=self.poll_interval
                    )
                except asyncio.TimeoutError:
                    pass
            writer.write(encode_close_frame())
            await writer.drain()
        except (ConnectionResetError, BrokenPipeError):
            pass
        finally:
            recv.cancel()

    @staticmethod
    async def _http_error(writer, code: int, msg: str) -> None:
        body = msg.encode()
        status = {
            400: "Bad Request",
            403: "Forbidden",
            404: "Not Found",
        }.get(code, "Error")
        writer.write(
            (
                f"HTTP/1.1 {code} {status}\r\n"
                "Content-Type: text/plain\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            + body
        )
        await writer.drain()


def run_sidecar_forever(
    engine, out_dir: str, host: str = "127.0.0.1", port: int = 8080
) -> None:
    """Blocking entry point: serve an Engine's subscriptions over WS
    (the `create_server` + `axum::serve` analog, server.rs:18-66)."""

    async def main():
        sidecar = WsSidecar.for_engine(engine, out_dir)
        bound = await sidecar.start(host, port)
        print(f"ws sidecar listening on ws://{host}:{bound}{sidecar.path}")
        await asyncio.Event().wait()

    asyncio.run(main())
