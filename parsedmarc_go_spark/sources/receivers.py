"""Landing-zone receivers (SURVEY S15/S16): the thin out-of-engine
processes that feed the streaming daemon's file-drop directory.

The reference embeds an HTTP server (internal/http/server.go:353-420)
and an IMAP poll loop (internal/imap/client.go:98-171) in its daemon;
in the Spark architecture these are deliberately *outside* the engine —
they land raw payload files, and `streaming.daemon.stream_ingest` owns
parsing with exactly-once semantics (SURVEY §3.2/§3.3 "Spark shape").

- `ReportHTTPReceiver`: stdlib HTTP server; POST/PUT bodies →
  `{landing_dir}/http_{utc-ts}_{sha16}.bin` after the reference's
  content-type whitelist (server.go:424-444) and size cap. Rate
  limiting/auth belong to the fronting proxy at scale.
- `imap_candidate_filter`: the DMARC-mail predicate of
  client.go:174-232 (subject keywords / attachment types), factored
  pure so it is testable without a mailbox; `fetch_imap_once` applies
  it over imaplib and lands `.eml` files (network — gated by caller).
"""

from __future__ import annotations

import hashlib
import os
import threading
import uuid
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

MAX_UPLOAD = 50 * 1024 * 1024  # config.go:219 http.max_upload_size

# server.go:424-444 content-type whitelist
ACCEPTED_CONTENT_TYPES = (
    "application/xml",
    "text/xml",
    "application/zip",
    "application/gzip",
    "application/x-gzip",
    "application/json",
    "application/tlsrpt+json",
    "application/tlsrpt+gzip",
    "message/rfc822",
)

# client.go:174-232: subject keywords marking DMARC candidate mail
DMARC_SUBJECT_KEYWORDS = ("report domain", "dmarc", "tls report", "tlsrpt")
DMARC_ATTACHMENT_SUFFIXES = (".xml", ".xml.gz", ".zip", ".gz", ".json", ".json.gz", ".eml")


def _land(landing_dir: str, prefix: str, payload: bytes, ext: str = "bin") -> str:
    ts = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S_%f")
    sha = hashlib.sha256(payload).hexdigest()[:16]
    # uuid component: identical payloads posted concurrently must each
    # land (at-least-once parity with the reference's HTTP handler) —
    # ts+sha alone collides and would silently overwrite
    path = os.path.join(landing_dir, f"{prefix}_{ts}_{sha}_{uuid.uuid4().hex[:8]}.{ext}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.rename(tmp, path)  # atomic: the stream never sees partial files
    return path


class ReportHTTPReceiver:
    """POST /dmarc/report → landing-zone file. Start/stop for tests and
    small deployments; production fronts many of these behind an LB."""

    def __init__(self, landing_dir: str, host: str = "127.0.0.1", port: int = 0):
        os.makedirs(landing_dir, exist_ok=True)
        landing = landing_dir

        class Handler(BaseHTTPRequestHandler):
            def _handle(self) -> None:
                if self.path not in ("/dmarc/report", "/dmarc/report/"):
                    self.send_error(404)
                    return
                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
                if ctype not in ACCEPTED_CONTENT_TYPES:
                    self.send_error(415, f"unsupported content type {ctype!r}")
                    return
                length = int(self.headers.get("Content-Length") or 0)
                if length <= 0:
                    self.send_error(400, "empty body")
                    return
                if length > MAX_UPLOAD:
                    self.send_error(413, "body exceeds 50 MB limit")
                    return
                body = self.rfile.read(length)
                _land(landing, "http", body)
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"status":"accepted"}')

            do_POST = _handle
            do_PUT = _handle

            def log_message(self, *args) -> None:  # quiet
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()


def imap_candidate_filter(subject: str, attachment_names: list[str]) -> bool:
    """client.go:174-232 semantics: a message is a DMARC candidate if the
    subject carries a report keyword or any attachment looks like a
    report payload."""
    subj = (subject or "").lower()
    if any(k in subj for k in DMARC_SUBJECT_KEYWORDS):
        return True
    return any(
        (name or "").lower().endswith(DMARC_ATTACHMENT_SUFFIXES) for name in attachment_names
    )


def fetch_imap_once(
    host: str,
    username: str,
    password: str,
    landing_dir: str,
    mailbox: str = "INBOX",
    archive_mailbox: str | None = "Archive",
) -> list[str]:
    """One poll cycle: fetch candidate messages, land them as .eml,
    archive (or leave) the originals. Network side effect — callers gate
    it exactly like the reference's offline flag."""
    import email
    import imaplib

    os.makedirs(landing_dir, exist_ok=True)
    landed: list[str] = []
    with imaplib.IMAP4_SSL(host) as conn:
        conn.login(username, password)
        conn.select(mailbox)
        # UNSEEN, not ALL: processed mail is always marked (archived /
        # deleted / \Seen below), so repeated polls never re-land the
        # same message — the reference likewise always archives or
        # deletes what it processed (client.go:363-390)
        _, data = conn.search(None, "UNSEEN")
        for num in data[0].split():
            _, msg_data = conn.fetch(num, "(RFC822)")
            raw = msg_data[0][1]
            msg = email.message_from_bytes(raw)
            names = [p.get_filename() or "" for p in msg.walk()]
            if not imap_candidate_filter(str(msg.get("Subject", "")), names):
                # fetch already set \Seen — non-candidates are simply
                # not revisited on the next poll
                continue
            landed.append(_land(landing_dir, "imap", raw, ext="eml"))
            if archive_mailbox:
                conn.copy(num, archive_mailbox)
                conn.store(num, "+FLAGS", "\\Deleted")
            else:
                # processed-but-kept: mark explicitly so idempotence does
                # not rely on the implicit fetch side effect
                conn.store(num, "+FLAGS", "\\Seen")
        conn.expunge()
    return landed


def watch_imap(
    host: str,
    username: str,
    password: str,
    landing_dir: str,
    mailbox: str = "INBOX",
    archive_mailbox: str | None = "Archive",
    check_interval: float = 300.0,
    stop_event: "threading.Event | None" = None,
    max_polls: int | None = None,
) -> int:
    """Continuous poll loop (client.go:397-409 Watch): fetch_imap_once
    every `check_interval` seconds until `stop_event` is set (or
    `max_polls` cycles, for tests). Network errors are logged and the
    loop continues — one bad poll must not kill the daemon. Returns the
    total number of landed files."""
    import logging

    ev = stop_event or threading.Event()
    total = 0
    polls = 0
    while not ev.is_set():
        try:
            total += len(
                fetch_imap_once(host, username, password, landing_dir, mailbox, archive_mailbox)
            )
        except OSError as exc:  # connection/auth/protocol failures
            logging.getLogger(__name__).warning("imap poll failed: %s", exc)
        polls += 1
        if max_polls is not None and polls >= max_polls:
            break
        ev.wait(check_interval)
    return total
