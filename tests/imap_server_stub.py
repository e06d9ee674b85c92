"""In-process IMAP4 server test double.

Speaks just enough of the public IMAP4rev1 protocol (RFC 3501) for
Python's imaplib client to complete a real poll cycle over a real
socket — CAPABILITY, LOGIN, SELECT, SEARCH, FETCH (RFC822), COPY,
STORE, EXPUNGE, LOGOUT — mirroring how tests/kafka_broker_stub.py
closes the Kafka produce path. Messages live in named mailboxes with
real flag state, so the client's idempotence contract (UNSEEN search +
archive/\\Seen marking) is observable across polls, not assumed.
"""

from __future__ import annotations

import socketserver
import threading


class _Msg:
    def __init__(self, raw: bytes):
        self.raw = raw
        self.flags: set[str] = set()


class ImapServerStub:
    """Threaded single-user IMAP server; `mailboxes` maps name →
    list[_Msg]. Plaintext (the client under test takes use_ssl=False),
    one mailbox selected per connection."""

    def __init__(
        self,
        messages: list[bytes],
        user: str = "u",
        password: str = "p",
        tls_context=None,
    ):
        self.mailboxes: dict[str, list[_Msg]] = {
            "INBOX": [_Msg(m) for m in messages],
            "Archive": [],
        }
        self.user = user
        self.password = password
        self.logins: list[tuple[str, str]] = []
        self.errors: list[str] = []
        self._lock = threading.Lock()
        stub = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                try:
                    self._send("* OK stub IMAP4rev1 server ready")
                    selected: list[str] = []  # mutable holder for mailbox name
                    while True:
                        line = self.rfile.readline()
                        if not line:
                            return
                        if not stub._dispatch(self, line.decode().rstrip("\r\n"), selected):
                            return
                except Exception as exc:  # surface in the test, not stderr
                    with stub._lock:
                        stub.errors.append(repr(exc))

            def _send(self, text: str) -> None:
                self.wfile.write(text.encode() + b"\r\n")

            def _send_raw(self, data: bytes) -> None:
                self.wfile.write(data)

        if tls_context is not None:
            # implicit TLS (the 993-style transport the reference's
            # client.go:37-58 dials): every accepted socket completes a
            # real server-side handshake before any IMAP byte flows
            class _TLSServer(socketserver.ThreadingTCPServer):
                def get_request(self):
                    sock, addr = super().get_request()
                    return tls_context.wrap_socket(sock, server_side=True), addr

            server_cls = _TLSServer
        else:
            server_cls = socketserver.ThreadingTCPServer
        self._server = server_cls(("127.0.0.1", 0), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "ImapServerStub":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # -- protocol ----------------------------------------------------------

    def _dispatch(self, h, line: str, selected: list[str]) -> bool:
        """Handle one tagged command line; False ends the connection."""
        parts = line.split(" ", 2)
        if len(parts) < 2:
            h._send("* BAD malformed")
            return True
        tag, cmd = parts[0], parts[1].upper()
        rest = parts[2] if len(parts) > 2 else ""
        unq = lambda s: s.strip().strip('"')

        if cmd == "CAPABILITY":
            h._send("* CAPABILITY IMAP4rev1")
            h._send(f"{tag} OK CAPABILITY completed")
        elif cmd == "LOGIN":
            u, _, p = rest.partition(" ")
            with self._lock:
                self.logins.append((unq(u), unq(p)))
            if (unq(u), unq(p)) == (self.user, self.password):
                h._send(f"{tag} OK LOGIN completed")
            else:
                h._send(f"{tag} NO LOGIN failed")
        elif cmd == "SELECT":
            name = unq(rest)
            box = self.mailboxes.get(name)
            if box is None:
                h._send(f"{tag} NO no such mailbox")
            else:
                selected[:] = [name]
                h._send(f"* {len(box)} EXISTS")
                h._send("* 0 RECENT")
                h._send(r"* FLAGS (\Seen \Deleted)")
                h._send(f"{tag} OK [READ-WRITE] SELECT completed")
        elif cmd == "SEARCH":
            box = self.mailboxes[selected[0]]
            crit = rest.upper()
            hits = []
            for i, m in enumerate(box, start=1):
                if "UNSEEN" in crit and "\\Seen" in m.flags:
                    continue
                hits.append(str(i))
            h._send("* SEARCH " + " ".join(hits) if hits else "* SEARCH")
            h._send(f"{tag} OK SEARCH completed")
        elif cmd == "FETCH":
            num, _, _items = rest.partition(" ")
            box = self.mailboxes[selected[0]]
            m = box[int(num) - 1]
            m.flags.add("\\Seen")  # RFC 3501: non-.PEEK BODY[]/RFC822 fetch sets \Seen
            h._send_raw(
                f"* {num} FETCH (RFC822 {{{len(m.raw)}}}\r\n".encode()
                + m.raw
                + b")\r\n"
            )
            h._send(f"{tag} OK FETCH completed")
        elif cmd == "COPY":
            num, _, dest = rest.partition(" ")
            box = self.mailboxes[selected[0]]
            with self._lock:
                self.mailboxes[unq(dest)].append(_Msg(box[int(num) - 1].raw))
            h._send(f"{tag} OK COPY completed")
        elif cmd == "STORE":
            num, _, flagspec = rest.partition(" ")
            m = self.mailboxes[selected[0]][int(num) - 1]
            for f in flagspec.split("(", 1)[-1].rstrip(")").split():
                if flagspec.startswith("+FLAGS"):
                    m.flags.add(f)
                elif flagspec.startswith("-FLAGS"):
                    m.flags.discard(f)
            h._send(f"* {num} FETCH (FLAGS ({' '.join(sorted(m.flags))}))")
            h._send(f"{tag} OK STORE completed")
        elif cmd == "EXPUNGE":
            box = self.mailboxes[selected[0]]
            kept, n = [], 0
            for i, m in enumerate(box, start=1):
                if "\\Deleted" in m.flags:
                    h._send(f"* {i - n} EXPUNGE")
                    n += 1
                else:
                    kept.append(m)
            with self._lock:
                self.mailboxes[selected[0]] = kept
            h._send(f"{tag} OK EXPUNGE completed")
        elif cmd == "LOGOUT":
            h._send("* BYE stub closing")
            h._send(f"{tag} OK LOGOUT completed")
            return False
        elif cmd == "NOOP":
            h._send(f"{tag} OK NOOP completed")
        else:
            h._send(f"{tag} BAD unsupported command {cmd}")
        return True
