"""File-driven configuration — the reference's config surface
(src/utils/config.rs:1-69) for the engine + sidecar.

The reference deserializes a TOML file (default
``/etc/speculare/pgcdc.config``) into a typed Config: PostgreSQL
connection fields, HTTP binding, optional TLS cert/key, and (auth
feature) cookie/admin secrets + an auth-DB URL. Same shape here, parsed
with stdlib ``tomllib`` into a frozen dataclass with the same defaults
(config.rs:54-69) and the same eager validation posture: a missing
required field fails at LOAD time (serde's Deserialize analog), and
https without cert+key paths fails like the reference's
``field_isset!`` unwrap (server.rs:48-55) — at config time rather than
first request.

What consumes it:

- :meth:`Config.jdbc_url` / :meth:`Config.jdbc_properties` feed the
  JDBC scan and the wal_poll JDBC source (sources/__init__.py,
  streaming/wal_source.py) — the database_* fields (config.rs:10-16).
- :meth:`Config.sidecar_kwargs` feeds
  :func:`service.ws_sidecar.run_sidecar_forever` — binding/https/
  key_cert/key_priv (config.rs:18-24).
- ``cookie_secret``/``admin_secret``/``auth_database_url`` are the auth
  feature's fields (config.rs:26-36); the repo's
  cdc.auth.SubscriptionAuthorizer consumes the api-keys frame read
  from ``auth_database_url``.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from typing import Optional


class ConfigError(ValueError):
    """Invalid or incomplete configuration (config::ConfigError analog)."""


#: config.rs defaults (lines 54-69)
DEFAULT_BINDING = "0.0.0.0:8080"
DEFAULT_DBTLS = False
DEFAULT_HTTPS = False
DEFAULT_AUTH_MAXCONN = 10

_REQUIRED = (
    "database_host",
    "database_dbname",
    "database_user",
    "database_password",
)


@dataclass(frozen=True)
class Config:
    # POSTGRESQL DB CONFIGS (config.rs:10-16)
    database_host: str
    database_dbname: str
    database_user: str
    database_password: str
    database_tls: bool = DEFAULT_DBTLS

    # HTTP API CONFIGS (config.rs:18-24)
    binding: str = DEFAULT_BINDING
    https: bool = DEFAULT_HTTPS
    key_priv: Optional[str] = None
    key_cert: Optional[str] = None

    # AUTH FEATURE (config.rs:26-36); None = auth feature off
    cookie_secret: Optional[str] = None
    admin_secret: Optional[str] = None
    auth_database_url: Optional[str] = None
    auth_database_max_connection: int = DEFAULT_AUTH_MAXCONN

    #: fields present in the file but unknown here — surfaced instead
    #: of silently dropped, so a typo'd key is findable
    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.https and not (self.key_cert and self.key_priv):
            # field_isset!(key_cert/key_priv) analog, server.rs:48-55 —
            # but at load time, not first-request time
            raise ConfigError(
                "https = true requires key_cert and key_priv"
            )

    # -- consumers ----------------------------------------------------

    def jdbc_url(self) -> str:
        """JDBC URL for the database_* fields — what the repo's JDBC
        scan and wal_poll JDBC mode take. TLS maps to the PostgreSQL
        driver's ssl flag (connection.rs:19-46 maps it to rustls)."""
        host = self.database_host
        if ":" not in host.rsplit("]", 1)[-1]:
            host = f"{host}:5432"
        url = f"jdbc:postgresql://{host}/{self.database_dbname}"
        if self.database_tls:
            url += "?ssl=true&sslmode=require"
        return url

    def jdbc_properties(self) -> dict:
        return {
            "user": self.database_user,
            "password": self.database_password,
            "driver": "org.postgresql.Driver",
        }

    def sidecar_kwargs(self) -> dict:
        """kwargs for service.ws_sidecar.run_sidecar_forever: host/port
        from ``binding`` (a SocketAddr string, config.rs:67-69) plus
        cert/key when https."""
        host, _, port = self.binding.rpartition(":")
        if not host or not port.isdigit():
            raise ConfigError(
                f"binding is not host:port: {self.binding!r}"
            )
        kw: dict = {"host": host, "port": int(port)}
        if self.https:
            kw["certfile"] = self.key_cert
            kw["keyfile"] = self.key_priv
        return kw

    @property
    def auth_enabled(self) -> bool:
        return self.auth_database_url is not None


def load_config(path: str) -> Config:
    """Parse a TOML config file into :class:`Config`; raises
    :class:`ConfigError` on malformed TOML, a missing required field,
    or an ill-typed value — the Config::new() error contract
    (config.rs:39-51)."""
    try:
        with open(path, "rb") as f:
            data = tomllib.load(f)
    except OSError as ex:
        raise ConfigError(f"cannot read config file {path}: {ex}") from ex
    except tomllib.TOMLDecodeError as ex:
        raise ConfigError(f"malformed TOML in {path}: {ex}") from ex
    return config_from_dict(data)


def config_from_dict(data: dict) -> Config:
    missing = [k for k in _REQUIRED if k not in data]
    if missing:
        raise ConfigError(f"missing required field(s): {missing}")
    known = {f.name for f in Config.__dataclass_fields__.values()} - {
        "extra"
    }
    kwargs = {k: v for k, v in data.items() if k in known}
    extra = {k: v for k, v in data.items() if k not in known}
    for k in ("database_tls", "https"):
        if k in kwargs and not isinstance(kwargs[k], bool):
            raise ConfigError(f"{k} must be a boolean")
    if "auth_database_max_connection" in kwargs and not isinstance(
        kwargs["auth_database_max_connection"], int
    ):
        raise ConfigError("auth_database_max_connection must be an int")
    try:
        return Config(extra=extra, **kwargs)
    except TypeError as ex:
        raise ConfigError(str(ex)) from ex
