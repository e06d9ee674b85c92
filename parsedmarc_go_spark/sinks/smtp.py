"""K6 — SMTP email sink (SURVEY §2.2; reference: internal/smtp/smtp.go:
31-235): one MIME multipart message per report with the report JSON as
a base64 attachment.

Message construction is pure and tested; delivery is a side effect that
runs via foreachPartition with one smtplib connection per partition —
gated behind the config argument so offline (the default everywhere in
this repo) never opens a socket.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from email.mime.application import MIMEApplication
from email.mime.multipart import MIMEMultipart
from email.mime.text import MIMEText

from pyspark.sql import DataFrame


@dataclass
class SMTPConfig:
    host: str
    port: int = 587
    username: str | None = None
    password: str | None = None
    sender: str = "parsedmarc@localhost"
    recipients: list[str] = field(default_factory=list)
    use_tls: bool = True
    # PEM bundle path for private-CA deployments (and the TLS stub
    # test, which proves the verified STARTTLS handshake against a
    # trust store holding only the test CA). A PATH, not an
    # ssl.SSLContext: the config ships to executors with the
    # foreachPartition closure, and contexts don't pickle — each
    # executor builds its own default-security context from the file.
    # None = the stdlib default trust store.
    tls_cafile: str | None = None


def build_report_message(
    report: dict, kind: str, sender: str, recipients: list[str]
) -> MIMEMultipart:
    """MIME multipart: text summary body + base64 JSON attachment named
    {kind}_report.json (smtp.go message shape)."""
    msg = MIMEMultipart()
    msg["From"] = sender
    msg["To"] = ", ".join(recipients)
    rid = report.get("report_id") or report.get("message_id") or "unknown"
    msg["Subject"] = f"DMARC {kind} report {rid}"
    body = f"Attached: {kind} report {rid}."
    msg.attach(MIMEText(body, "plain"))
    payload = json.dumps(report, default=str, indent=2).encode()
    att = MIMEApplication(payload, _subtype="json")  # base64 CTE by default
    att.add_header(
        "Content-Disposition", "attachment", filename=f"{kind}_report.json"
    )
    msg.attach(att)
    return msg


def send_reports(df: DataFrame, kind: str, config: SMTPConfig | None) -> None:
    """foreachPartition side-effect sink: one SMTP connection per
    partition, one message per report row. config=None (offline) is a
    no-op, mirroring the reference's disabled-sink path."""
    if config is None:
        return
    conf = config  # close over a plain object, not the DataFrame

    def send_partition(rows) -> None:
        import smtplib
        import ssl

        with smtplib.SMTP(conf.host, conf.port, timeout=30) as server:
            if conf.use_tls:
                # verified TLS: smtplib's default context skips cert
                # validation; the reference's net/smtp.SendMail verifies
                server.starttls(
                    context=ssl.create_default_context(cafile=conf.tls_cafile)
                )
            if conf.username:
                server.login(conf.username, conf.password or "")
            for row in rows:
                msg = build_report_message(
                    row.asDict(recursive=True), kind, conf.sender, conf.recipients
                )
                server.sendmail(conf.sender, conf.recipients, msg.as_string())

    df.foreachPartition(send_partition)
