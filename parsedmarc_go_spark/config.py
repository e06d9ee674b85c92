"""File-driven configuration (reference: internal/config/config.go:
108-244 + config.yaml.example).

Semantics mirror the viper loader:

- defaults first (config.go setDefaults, 175-244),
- then the YAML file if present (a missing file is NOT an error —
  config.go:119-131 falls through to defaults),
- then environment variables, ``SECTION_KEY`` upper-cased with ``.`` →
  ``_`` (viper AutomaticEnv + SetEnvKeyReplacer, config.go:115-117).

Sections kept 1:1 with the reference: ``logging``, ``parser``, ``imap``,
``http``, ``smtp``, ``kafka``. The reference's ``clickhouse`` section is
replaced by the Spark-native ``engine`` section (landing/output/
checkpoint dirs, streaming trigger) — the engine's storage IS the
partitioned Parquet warehouse, and a JDBC/ClickHouse sink remains
available via sinks.jdbc for deployments that want it.
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass, field, fields
from typing import Any


@dataclass
class LoggingConfig:
    level: str = "info"
    format: str = "json"
    output_path: str = "stdout"


@dataclass
class ParserConfig:
    offline: bool = False
    ip_db_path: str = ""
    reverse_dns_map_path: str = ""
    reverse_dns_map_url: str = ""
    always_use_local_files: bool = False
    nameservers: list[str] = field(default_factory=lambda: ["1.1.1.1", "1.0.0.1"])
    dns_timeout: int = 2


@dataclass
class EngineConfig:
    """Spark-native replacement for the reference's clickhouse section."""

    landing_dir: str = "landing"
    output_dir: str = "warehouse"
    checkpoint_dir: str = "checkpoints"
    trigger_seconds: int = 300  # imap.check_interval analogue for the stream
    max_files_per_trigger: int = 1000
    master: str = ""  # empty → respect spark-submit / existing session
    shuffle_partitions: int = 0  # 0 → leave Spark default
    jdbc_url: str = ""  # optional relational sink (sinks/jdbc.py)
    jdbc_table_prefix: str = "dmarc_"


@dataclass
class IMAPConfig:
    enabled: bool = False
    host: str = ""
    port: int = 993
    username: str = ""
    password: str = ""
    tls: bool = True
    skip_verify: bool = False
    mailbox: str = "INBOX"
    archive_mailbox: str = "DMARC-Archive"
    delete_processed: bool = False
    check_interval: int = 300


@dataclass
class HTTPConfig:
    enabled: bool = False
    host: str = "0.0.0.0"
    port: int = 8080
    tls: bool = False
    cert_file: str = ""
    key_file: str = ""
    rate_limit: int = 60
    rate_burst: int = 10
    max_upload_size: int = 50 * 1024 * 1024


@dataclass
class SMTPSinkConfig:
    enabled: bool = False
    host: str = ""
    port: int = 25
    ssl: bool = False
    username: str = ""
    password: str = ""
    sender: str = ""  # yaml key: from (python keyword)
    to: list[str] = field(default_factory=list)
    subject: str = "parsedmarc report"
    attachment: str = ""
    message: str = ""


@dataclass
class KafkaConfig:
    enabled: bool = False
    hosts: list[str] = field(default_factory=list)
    username: str = ""
    password: str = ""
    ssl: bool = True
    skip_verify: bool = False
    aggregate_topic: str = ""
    forensic_topic: str = ""
    smtp_tls_topic: str = ""


@dataclass
class Config:
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    parser: ParserConfig = field(default_factory=ParserConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    imap: IMAPConfig = field(default_factory=IMAPConfig)
    http: HTTPConfig = field(default_factory=HTTPConfig)
    smtp: SMTPSinkConfig = field(default_factory=SMTPSinkConfig)
    kafka: KafkaConfig = field(default_factory=KafkaConfig)

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


# yaml key → dataclass field where they differ (``from`` is a keyword)
_KEY_ALIASES = {"smtp": {"from": "sender"}}


def _coerce(current: Any, raw: Any) -> Any:
    """Coerce a YAML/env scalar to the field's existing type (viper-like
    loose typing: 'true'/'1' → bool, '300' → int, 'a,b' → list)."""
    if isinstance(current, bool):
        if isinstance(raw, str):
            return raw.strip().lower() in ("1", "true", "yes", "on")
        return bool(raw)
    if isinstance(current, int) and not isinstance(current, bool):
        return int(raw)
    if isinstance(current, list):
        if isinstance(raw, str):
            return [s.strip() for s in raw.split(",") if s.strip()]
        return [str(x) for x in (raw or [])]
    return "" if raw is None else str(raw)


def _apply_section(section_obj: Any, section_name: str, values: dict[str, Any]) -> None:
    aliases = _KEY_ALIASES.get(section_name, {})
    valid = {f.name for f in fields(section_obj)}
    for key, raw in (values or {}).items():
        name = aliases.get(key, key)
        if name not in valid:
            raise ValueError(f"unknown config key: {section_name}.{key}")
        setattr(section_obj, name, _coerce(getattr(section_obj, name), raw))


def load_config(path: str | None = None, env: dict[str, str] | None = None) -> Config:
    """Defaults → YAML file (if it exists) → env overrides.

    ``IMAP_HOST=imap.example.com`` overrides ``imap.host`` exactly like
    the reference's viper env binding (config.go:115-117)."""
    cfg = Config()
    if path and os.path.isfile(path):
        import yaml

        with open(path, encoding="utf-8") as f:
            doc = yaml.safe_load(f) or {}
        if not isinstance(doc, dict):
            raise ValueError(f"config root must be a mapping, got {type(doc).__name__}")
        for section, values in doc.items():
            if section == "clickhouse":
                # reference section accepted but inert: storage here is
                # the Parquet warehouse (+ optional engine.jdbc_url)
                continue
            if not hasattr(cfg, section):
                raise ValueError(f"unknown config section: {section}")
            _apply_section(getattr(cfg, section), section, values)
    environ = os.environ if env is None else env
    for section_field in fields(cfg):
        section_obj = getattr(cfg, section_field.name)
        for f in fields(section_obj):
            env_key = f"{section_field.name}_{f.name}".upper()
            if env_key in environ:
                setattr(section_obj, f.name, _coerce(getattr(section_obj, f.name), environ[env_key]))
    return cfg
