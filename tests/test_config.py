"""Config loader (internal/config/config.go:108-244 parity): defaults,
YAML file, env overrides, loose scalar coercion."""

from __future__ import annotations

import pytest

from parsedmarc_go_spark.config import load_config

YAML = """
parser:
  offline: true
  nameservers:
    - "9.9.9.9"
engine:
  landing_dir: /tmp/land
  trigger_seconds: 5
imap:
  enabled: true
  host: imap.example.com
  check_interval: 60
smtp:
  enabled: true
  from: reports@example.com
  to:
    - a@example.com
    - b@example.com
clickhouse:
  enabled: true
  host: ch.example.com
"""


def test_defaults_without_file(tmp_path):
    cfg = load_config(str(tmp_path / "missing.yaml"), env={})
    # missing file is not an error (config.go:119-131)
    assert cfg.parser.offline is False
    assert cfg.parser.nameservers == ["1.1.1.1", "1.0.0.1"]
    assert cfg.imap.port == 993 and cfg.imap.mailbox == "INBOX"
    assert cfg.http.max_upload_size == 50 * 1024 * 1024
    assert cfg.engine.trigger_seconds == 300


def test_yaml_file_and_aliases(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(YAML)
    cfg = load_config(str(p), env={})
    assert cfg.parser.offline is True
    assert cfg.parser.nameservers == ["9.9.9.9"]
    assert cfg.engine.landing_dir == "/tmp/land" and cfg.engine.trigger_seconds == 5
    assert cfg.imap.enabled and cfg.imap.host == "imap.example.com"
    assert cfg.imap.check_interval == 60
    # yaml `from:` maps to the `sender` field (python keyword)
    assert cfg.smtp.sender == "reports@example.com"
    assert cfg.smtp.to == ["a@example.com", "b@example.com"]
    # the reference's clickhouse section is accepted and inert
    assert not hasattr(cfg, "clickhouse")


def test_env_overrides(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(YAML)
    env = {
        "IMAP_HOST": "other.example.com",
        "IMAP_PORT": "143",
        "PARSER_OFFLINE": "false",
        "SMTP_TO": "x@example.com,y@example.com",
        "HTTP_ENABLED": "true",
    }
    cfg = load_config(str(p), env=env)
    assert cfg.imap.host == "other.example.com" and cfg.imap.port == 143
    assert cfg.parser.offline is False
    assert cfg.smtp.to == ["x@example.com", "y@example.com"]
    assert cfg.http.enabled is True


def test_unknown_keys_rejected(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text("imap:\n  hostt: typo.example.com\n")
    with pytest.raises(ValueError, match="unknown config key: imap.hostt"):
        load_config(str(p), env={})
    p.write_text("imappp:\n  host: x\n")
    with pytest.raises(ValueError, match="unknown config section"):
        load_config(str(p), env={})
