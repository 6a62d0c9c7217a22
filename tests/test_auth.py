"""R20 restrict_auth semantics (auth.rs:126-224), branch by branch."""

from __future__ import annotations

import pytest

from speculare_pgcdc_spark.cdc.auth import (
    AuthError,
    AuthInfo,
    SubscriptionAuthorizer,
    api_keys_df,
)
from speculare_pgcdc_spark.dsl import parse_ws_query
from speculare_pgcdc_spark.engine import Engine

TABLES = ["cpustats", "events"]


@pytest.fixture(scope="module")
def authz(spark):
    keys = api_keys_df(
        spark,
        [
            ("cust1", "host-a", "key-1"),
            ("cust1", "host-b", "key-2"),
            ("cust2", "host-c", "key-3"),
        ],
    )
    return SubscriptionAuthorizer(keys)


def _watch(q):
    return parse_ws_query(q, TABLES)


def test_admin_passes_anything(authz):
    admin = AuthInfo("whoever", is_admin=True)
    authz.restrict(admin, _watch("insert:cpustats"))
    authz.restrict(admin, _watch("insert:cpustats:anything.eq.x"))


def test_non_admin_requires_filter(authz):
    with pytest.raises(AuthError, match="specific filter"):
        authz.restrict(AuthInfo("cust1"), _watch("insert:cpustats"))


def test_host_uuid_must_be_owned(authz):
    u = AuthInfo("cust1")
    authz.restrict(u, _watch("insert:cpustats:host_uuid.eq.host-a"))
    authz.restrict(u, _watch("insert:cpustats:uuid.eq.host-b"))
    with pytest.raises(AuthError, match="no api key"):
        authz.restrict(u, _watch("insert:cpustats:host_uuid.eq.host-c"))


def test_in_list_rejected_by_default_reference_parity(authz):
    """The reference's restrict_auth reads the filter value as a String
    variant, which FAILS on an in-list (Array) -> InvalidRequestError —
    so by default an in-list subscription is never authorized for
    non-admins, even when every value would pass pointwise."""
    u = AuthInfo("cust1")
    with pytest.raises(AuthError, match="in-list"):
        authz.restrict(
            u, _watch("insert:cpustats:host_uuid.in.host-a,host-b")
        )
    # admins still bypass the gate entirely
    authz.restrict(
        AuthInfo("root", is_admin=True),
        _watch("insert:cpustats:host_uuid.in.host-a,host-zzz"),
    )


def test_in_list_pointwise_when_opted_in(spark):
    keys = api_keys_df(
        spark, [("cust1", "host-a", "k1"), ("cust1", "host-b", "k2")]
    )
    authz = SubscriptionAuthorizer(keys, allow_in_lists=True)
    u = AuthInfo("cust1")
    authz.restrict(u, _watch("insert:cpustats:host_uuid.in.host-a,host-b"))
    with pytest.raises(AuthError):
        authz.restrict(
            u, _watch("insert:cpustats:host_uuid.in.host-a,host-c")
        )


def test_customer_id_must_be_self(authz):
    authz.restrict(
        AuthInfo("cust2"), _watch("insert:cpustats:customer_id.eq.cust2")
    )
    with pytest.raises(AuthError, match="your own"):
        authz.restrict(
            AuthInfo("cust2"), _watch("insert:cpustats:customer_id.eq.cust1")
        )


def test_key_must_be_owned(authz):
    authz.restrict(AuthInfo("cust1"), _watch("insert:cpustats:key.eq.key-2"))
    with pytest.raises(AuthError, match="not owned"):
        authz.restrict(
            AuthInfo("cust1"), _watch("insert:cpustats:key.eq.key-3")
        )


def test_other_columns_denied(authz):
    with pytest.raises(AuthError, match="not authorizable"):
        authz.restrict(
            AuthInfo("cust1"), _watch("insert:cpustats:hostname.eq.web1")
        )


def test_cache_memoizes_existence(spark):
    keys = api_keys_df(spark, [("c", "h", "k")])
    authz = SubscriptionAuthorizer(keys)
    w = _watch("insert:cpustats:host_uuid.eq.h")
    authz.restrict(AuthInfo("c"), w)
    assert (("host_uuid", "c", "h")) in authz._cache
    # second call served from cache (no recompute — flip the stored
    # verdict and observe it is honored)
    authz._cache[("host_uuid", "c", "h")] = (
        authz._cache[("host_uuid", "c", "h")][0],
        False,
    )
    with pytest.raises(AuthError):
        authz.restrict(AuthInfo("c"), w)


def test_engine_subscribe_with_auth(spark, authz):
    eng = Engine(spark, "/root/testdata/sf0.001", tables=TABLES)
    eng.subscribe(
        1,
        "insert:cpustats:host_uuid.eq.host-a",
        auth=AuthInfo("cust1"),
        authorizer=authz,
    )
    with pytest.raises(AuthError):
        eng.subscribe(
            2,
            "insert:cpustats:host_uuid.eq.host-zzz",
            auth=AuthInfo("cust1"),
            authorizer=authz,
        )
    assert 1 in eng._subs and 2 not in eng._subs


def test_cookie_sign_verify_roundtrip_and_tamper():
    from speculare_pgcdc_spark.cdc.auth import (
        AuthError,
        sign_cookie,
        verify_cookie,
    )

    v = sign_cookie("s3cret", '{"user_id": "cust1"}')
    assert verify_cookie("s3cret", v) == '{"user_id": "cust1"}'

    import pytest as _p

    tampered = v[:-4] + ("AAAA" if v[-4:] != "AAAA" else "BBBB")
    with _p.raises(AuthError) as ei:
        verify_cookie("s3cret", tampered)
    assert ei.value.status == 400
    with _p.raises(AuthError):
        verify_cookie("wrong-secret", v)
    with _p.raises(AuthError):
        verify_cookie("s3cret", "no-dot-separator")


def test_cookie_auth_extraction_matches_reference_order():
    """auth.rs:88-116: SP-ADM admin header short-circuits; otherwise
    SP-CKS must exist (401), verify (400), and carry user_id (400)."""
    import pytest as _p

    from speculare_pgcdc_spark.cdc.auth import (
        AuthError,
        cookie_auth_from_headers,
        sign_cookie,
    )

    extract = cookie_auth_from_headers("ck", admin_secret="adm")

    a = extract({"sp-adm": "adm"})
    assert a.is_admin and a.customer_id == ""

    good = sign_cookie("ck", '{"user_id": "cust7"}')
    a = extract({"cookie": f"other=x; SP-CKS={good}"})
    assert not a.is_admin and a.customer_id == "cust7"

    with _p.raises(AuthError) as ei:
        extract({"sp-adm": "WRONG"})  # bad admin falls through to 401
    assert ei.value.status == 401
    with _p.raises(AuthError) as ei:
        extract({"cookie": "SP-CKS=" + good[:-6]})
    assert ei.value.status == 400
    no_uid = sign_cookie("ck", '{"something": 1}')
    with _p.raises(AuthError) as ei:
        extract({"cookie": f"SP-CKS={no_uid}"})
    assert ei.value.status == 400
