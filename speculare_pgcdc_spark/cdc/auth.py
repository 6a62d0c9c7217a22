"""Subscription authorization — the data-plane analog of the
reference's ``restrict_auth`` (/root/reference/src/api/auth.rs:126-224).

The reference gates each non-admin WebSocket subscription by checking
its specific filter against an api_keys table over a pooled PG
connection, memoized in 1h-TTL moka caches (auth.rs:25-35). The HTTP/
cookie machinery is a service concern (out of engine scope, SURVEY
R20/R21); the authorization SEMANTICS are data-plane and live here:

- admins pass unconditionally (auth.rs:137-141)
- a non-admin subscription MUST carry a specific filter (auth.rs:142-147)
- filter column 'host_uuid' or 'uuid': an api_key row with
  (customer_id = caller, host_uuid = filter value) must exist
  (auth.rs:152-176)
- filter column 'customer_id': the value must equal the caller's own id
  (auth.rs:178-189)
- filter column 'key': an api_key row with (customer_id = caller,
  key = filter value) must exist (auth.rs:191-211)
- any other filter column: denied (auth.rs:213-218)
- 'in'-list filters: REJECTED for non-admins by default, matching the
  reference exactly — restrict_auth reads the filter value with
  ``as_variant::<String>``, which fails on an Array and returns
  InvalidRequestError (auth.rs:152-211). Construct with
  ``allow_in_lists=True`` to opt into the pointwise generalization
  (every value must pass) when reference-parity is not required; both
  behaviors are pinned in tests/test_auth.py.

``api_keys`` is a dimension frame (broadcast-scale at any SF); existence
checks are memoized with a TTL, the moka-cache analog.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from speculare_pgcdc_spark.dsl import WatchFor


class AuthError(ValueError):
    """Equivalent of the reference's auth error responses; ``status``
    is the HTTP code the serving layer should answer with (403 for a
    restrict_auth denial, 401 for a missing credential, 400 for a
    malformed one — the reference's FromRequestParts granularity,
    auth.rs:75-116)."""

    def __init__(self, msg: str, status: int = 403) -> None:
        super().__init__(msg)
        self.status = status


@dataclass(frozen=True)
class AuthInfo:
    customer_id: str
    is_admin: bool = False


class SubscriptionAuthorizer:
    """restrict_auth with a TTL-memoized existence check (moka analog,
    auth.rs:25-35: 1h TTL)."""

    def __init__(
        self,
        api_keys: DataFrame,
        ttl_seconds: int = 3600,
        allow_in_lists: bool = False,
        max_entries: int = 100_000,
    ) -> None:
        self.api_keys = api_keys
        self.ttl = ttl_seconds
        self.allow_in_lists = allow_in_lists
        self.max_entries = max_entries
        self._cache: dict[tuple, tuple[float, bool]] = {}
        self._next_sweep = self._SWEEP_EVERY

    #: eviction sweep cadence: once the cache grows past the next
    #: threshold, drop expired entries — the moka analog EVICTS on
    #: TTL; a grow-only dict would accumulate one entry per distinct
    #: (attacker-chosen) probe value forever. A size THRESHOLD, not a
    #: size modulo: hit/expire churn can make len() skip over an exact
    #: multiple forever, letting the cache overshoot unswept.
    _SWEEP_EVERY = 256

    def _exists(self, col: str, customer_id: str, value: str) -> bool:
        key = (col, customer_id, value)
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None and now - hit[0] < self.ttl:
            return hit[1]
        ok = bool(
            self.api_keys.filter(
                (F.col("customer_id") == customer_id)
                & (F.col(col) == value)
            )
            .limit(1)
            .count()
        )
        self._cache[key] = (now, ok)
        if len(self._cache) >= self._next_sweep:
            expired = [
                k for k, (t, _) in self._cache.items()
                if now - t >= self.ttl
            ]
            for k in expired:
                del self._cache[k]
            # hard cap (moka max_capacity analog): expiry alone can't
            # bound a probe flood faster than the TTL — drop oldest via
            # a heap selection (O(n log k)), not a full O(n log n) sort
            # inside the request path
            if len(self._cache) > self.max_entries:
                import heapq

                drop = len(self._cache) - self.max_entries
                for k, _ in heapq.nsmallest(
                    drop, self._cache.items(), key=lambda kv: kv[1][0]
                ):
                    del self._cache[k]
            self._next_sweep = len(self._cache) + self._SWEEP_EVERY
        return ok

    def restrict(self, auth: AuthInfo, watch: WatchFor) -> WatchFor:
        """Return the watch unchanged if authorized; raise AuthError
        exactly where the reference rejects."""
        if auth.is_admin:
            return watch
        if watch.specific is None:
            raise AuthError(
                "non-admin subscriptions require a specific filter"
            )
        if watch.specific.op == "in" and not self.allow_in_lists:
            # reference parity: restrict_auth's as_variant::<String>
            # fails on an Array value -> InvalidRequestError (400), so
            # an in-list subscription is never authorized for non-admins
            raise AuthError(
                "in-list filters are not authorizable for non-admin "
                "subscriptions (reference parity; construct the "
                "authorizer with allow_in_lists=True to opt out)"
            )
        col = watch.specific.column
        if col in ("host_uuid", "uuid"):
            for v in watch.specific.values:
                if not self._exists("host_uuid", auth.customer_id, v):
                    raise AuthError(f"no api key for host {v!r}")
        elif col == "customer_id":
            for v in watch.specific.values:
                if v != auth.customer_id:
                    raise AuthError("customer_id filter must be your own")
        elif col == "key":
            for v in watch.specific.values:
                if not self._exists("key", auth.customer_id, v):
                    raise AuthError(f"api key {v!r} not owned by caller")
        else:
            raise AuthError(f"filter column {col!r} is not authorizable")
        return watch


def api_keys_df(spark, rows: list[tuple[str, str, str]]) -> DataFrame:
    """(customer_id, host_uuid, key) dimension frame (test/demo helper)."""
    return spark.createDataFrame(
        rows, "customer_id string, host_uuid string, key string"
    )


# -- cookie / admin-header extraction (auth.rs:62-124) -----------------
#
# The reference authenticates a WebSocket connect from either the
# signed "SP-CKS" cookie (SignedCookieJar over CONFIG.cookie_secret; a
# JSON AuthCookie with the caller's user_id) or the "SP-ADM" header
# matching CONFIG.admin_secret. The signing scheme here is the
# documented stdlib analog (HMAC-SHA256 over the payload,
# base64url(payload) + "." + base64url(mac)) — the semantics
# (signed-or-admin, 401 on absence, 400 on tamper) are the parity
# surface, not cookie-rs's private key-derivation bytes.

COOKIE_NAME = "SP-CKS"
ADMIN_HEADER = "sp-adm"


def sign_cookie(secret: str, payload: str) -> str:
    """Signed cookie VALUE for ``payload`` (a JSON document, e.g.
    '{"user_id": "cust1"}')."""
    import base64
    import hmac

    body = base64.urlsafe_b64encode(payload.encode()).decode()
    mac = hmac.new(
        secret.encode(), payload.encode(), "sha256"
    ).digest()
    return body + "." + base64.urlsafe_b64encode(mac).decode()


def verify_cookie(secret: str, value: str) -> str:
    """Payload of a signed cookie value; raises AuthError(400) on any
    malformation or signature mismatch (auth.rs:103-114)."""
    import base64
    import hmac

    try:
        body, mac_b64 = value.split(".", 1)
        payload = base64.urlsafe_b64decode(body.encode()).decode()
        got = base64.urlsafe_b64decode(mac_b64.encode())
    except (ValueError, UnicodeDecodeError) as ex:
        raise AuthError(f"malformed {COOKIE_NAME} cookie", 400) from ex
    want = hmac.new(
        secret.encode(), payload.encode(), "sha256"
    ).digest()
    if not hmac.compare_digest(got, want):
        raise AuthError(f"bad {COOKIE_NAME} signature", 400)
    return payload


def cookie_auth_from_headers(
    cookie_secret: str, admin_secret: str | None = None
):
    """Header->AuthInfo extractor for the sidecar's ``auth_from_headers``
    hook, mirroring the reference's request extraction order
    (auth.rs:88-116): the SP-ADM header matching admin_secret makes an
    admin (no cookie needed); otherwise the signed SP-CKS cookie must
    be present (401) and valid (400) and carry a user_id (400)."""
    import json

    def extract(headers: dict) -> AuthInfo:
        if (
            admin_secret is not None
            and headers.get(ADMIN_HEADER) == admin_secret
        ):
            return AuthInfo(customer_id="", is_admin=True)
        cookies = {}
        for part in headers.get("cookie", "").split(";"):
            if "=" in part:
                k, v = part.split("=", 1)
                cookies[k.strip()] = v.strip()
        value = cookies.get(COOKIE_NAME)
        if value is None:
            raise AuthError(
                f"no `{COOKIE_NAME}` found in cookies", 401
            )
        payload = verify_cookie(cookie_secret, value)
        try:
            data = json.loads(payload)
            user_id = data["user_id"]
        except (ValueError, KeyError, TypeError) as ex:
            raise AuthError(
                "cannot find the user_id inside the cookie", 400
            ) from ex
        return AuthInfo(customer_id=str(user_id), is_admin=False)

    return extract
