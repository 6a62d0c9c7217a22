"""Config-file surface (utils/config.rs analog): TOML -> typed Config
with the reference's defaults, required fields, and eager validation.
No Spark needed — the config layer is pure Python."""

from __future__ import annotations

import pytest

from speculare_pgcdc_spark.config import (
    DEFAULT_AUTH_MAXCONN,
    DEFAULT_BINDING,
    Config,
    ConfigError,
    config_from_dict,
    load_config,
)

MINIMAL = """
database_host = "db.internal"
database_dbname = "app"
database_user = "cdc"
database_password = "secret"
"""


def _write(tmp_path, text, name="pgcdc.config"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_minimal_config_gets_reference_defaults(tmp_path):
    cfg = load_config(_write(tmp_path, MINIMAL))
    # config.rs:54-69 defaults
    assert cfg.binding == DEFAULT_BINDING == "0.0.0.0:8080"
    assert cfg.https is False
    assert cfg.database_tls is False
    assert cfg.auth_database_max_connection == DEFAULT_AUTH_MAXCONN == 10
    assert cfg.key_cert is None and cfg.key_priv is None
    assert not cfg.auth_enabled


def test_missing_required_field_fails_at_load(tmp_path):
    p = _write(tmp_path, 'database_host = "h"\ndatabase_dbname = "d"\n')
    with pytest.raises(ConfigError, match="database_user"):
        load_config(p)


def test_malformed_toml_and_missing_file_raise_config_error(tmp_path):
    with pytest.raises(ConfigError, match="malformed"):
        load_config(_write(tmp_path, "database_host = [unclosed"))
    with pytest.raises(ConfigError, match="cannot read"):
        load_config(str(tmp_path / "nope.toml"))


def test_https_requires_cert_and_key():
    # field_isset! analog (server.rs:48-55), enforced at load time
    with pytest.raises(ConfigError, match="key_cert and key_priv"):
        config_from_dict(
            {
                "database_host": "h",
                "database_dbname": "d",
                "database_user": "u",
                "database_password": "p",
                "https": True,
            }
        )


def test_full_config_round_trip(tmp_path):
    cfg = load_config(
        _write(
            tmp_path,
            MINIMAL
            + """
database_tls = true
binding = "127.0.0.1:9443"
https = true
key_cert = "/etc/ssl/c.pem"
key_priv = "/etc/ssl/k.pem"
cookie_secret = "cs"
admin_secret = "as"
auth_database_url = "postgres://auth"
auth_database_max_connection = 3
""",
        )
    )
    assert cfg.https and cfg.database_tls
    assert cfg.auth_enabled
    kw = cfg.sidecar_kwargs()
    assert kw == {
        "host": "127.0.0.1",
        "port": 9443,
        "certfile": "/etc/ssl/c.pem",
        "keyfile": "/etc/ssl/k.pem",
    }
    assert (
        cfg.jdbc_url()
        == "jdbc:postgresql://db.internal:5432/app?ssl=true&sslmode=require"
    )
    assert cfg.jdbc_properties()["user"] == "cdc"


def test_bad_binding_and_bad_types_rejected():
    base = {
        "database_host": "h",
        "database_dbname": "d",
        "database_user": "u",
        "database_password": "p",
    }
    with pytest.raises(ConfigError, match="must be a boolean"):
        config_from_dict({**base, "https": "yes"})
    cfg = config_from_dict({**base, "binding": "nonsense"})
    with pytest.raises(ConfigError, match="host:port"):
        cfg.sidecar_kwargs()


def test_unknown_keys_surface_in_extra():
    cfg = config_from_dict(
        {
            "database_host": "h",
            "database_dbname": "d",
            "database_user": "u",
            "database_password": "p",
            "databsae_tls": True,  # typo'd key must be findable
        }
    )
    assert cfg.extra == {"databsae_tls": True}


def test_host_with_explicit_port_kept():
    cfg = config_from_dict(
        {
            "database_host": "h:6432",
            "database_dbname": "d",
            "database_user": "u",
            "database_password": "p",
        }
    )
    assert cfg.jdbc_url() == "jdbc:postgresql://h:6432/d"


def test_cli_list_prints_full_registry(capsys):
    from speculare_pgcdc_spark.__main__ import main
    from speculare_pgcdc_spark.queries import load_all

    assert main(["list"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == len(load_all())
    assert any(ln.startswith("q01_scan_count\t[oracle]") for ln in out)


def test_cli_run_executes_query_with_injected_session(spark, sf_dir, capsys):
    from speculare_pgcdc_spark.__main__ import main

    rc = main(
        ["run", "q01_scan_count", "--sf-dir", sf_dir, "--limit", "5"],
        spark_factory=lambda: spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    # df.show() must actually print the result grid
    assert "+" in out and "|" in out, out


def test_cli_run_explain_prints_physical_plan(spark, sf_dir, capsys):
    from speculare_pgcdc_spark.__main__ import main

    rc = main(
        ["run", "q15_groupby_agg", "--sf-dir", sf_dir, "--explain"],
        spark_factory=lambda: spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "HashAggregate" in out


def test_cli_run_unknown_query_fails_cleanly(capsys):
    from speculare_pgcdc_spark.__main__ import main

    assert main(["run", "q_nope"], spark_factory=lambda: None) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_serve_parser_requires_config():
    import pytest as _pytest

    from speculare_pgcdc_spark.__main__ import build_parser

    with _pytest.raises(SystemExit):
        build_parser().parse_args(["serve", "--feed-dir", "x"])
    args = build_parser().parse_args(
        ["serve", "--config", "c.toml", "--feed-dir", "f",
         "--out-dir", "o", "--checkpoint-dir", "k"]
    )
    assert args.tables == "events_a,events_b"


def test_cli_serve_wires_config_into_sidecar(spark, tmp_path, monkeypatch):
    """Regression: serve must pass sidecar_kwargs() straight through —
    an earlier draft popped a nonexistent 'binding' key and crashed
    before the sidecar ever started."""
    import speculare_pgcdc_spark.service.ws_sidecar as ws
    from speculare_pgcdc_spark.__main__ import main

    cfg = tmp_path / "pgcdc.toml"
    cfg.write_text(
        'database_host = "h"\n'
        'database_dbname = "d"\n'
        'database_user = "u"\n'
        'database_password = "p"\n'
        'binding = "127.0.0.1:9321"\n'
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    got = {}

    def fake_serve(engine, out_dir, **kw):
        got.update(kw, out_dir=out_dir)
        raise SystemExit(0)  # stop before the blocking loop

    monkeypatch.setattr(ws, "run_sidecar_forever", fake_serve)
    before = {q.id for q in spark.streams.active}
    try:
        main(
            [
                "serve", "--config", str(cfg),
                "--feed-dir", str(feed),
                "--out-dir", str(tmp_path / "out"),
                "--checkpoint-dir", str(tmp_path / "ckpt"),
            ],
            spark_factory=lambda: spark,
        )
    except SystemExit:
        pass
    # stop ONLY the stream this test started (the shared session may
    # carry other tests' streams under intra-session concurrency)
    for q in spark.streams.active:
        if q.id not in before:
            q.stop()
    assert got["host"] == "127.0.0.1" and got["port"] == 9321
    assert got["out_dir"] == str(tmp_path / "out")
    # serve must tie server lifetime to the watch stream it started
    assert got["watch_query"] is not None
