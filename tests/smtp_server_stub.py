"""In-process SMTP server test double (RFC 5321 subset: EHLO/HELO,
MAIL, RCPT, DATA, RSET, QUIT) — enough for smtplib to complete real
deliveries over a real socket, closing the K6 sink's executed-evidence
gap the way the Kafka and IMAP stubs close K5/S16. Plaintext by
default: the sink under test passes use_tls=False, and STARTTLS is
answered with 454 so a misconfigured test fails loudly rather than
hanging. With ``tls_context`` the stub advertises STARTTLS and
completes a real server-side handshake on it — the verified-TLS
delivery test's transport."""

from __future__ import annotations

import socketserver
import threading


class SmtpServerStub:
    """Threaded SMTP double; `deliveries` collects
    (mail_from, [rcpt_to], data_str) per completed DATA transaction."""

    def __init__(self, tls_context=None):
        self._tls = tls_context
        self.deliveries: list[tuple[str, list[str], str]] = []
        self.errors: list[str] = []
        self._lock = threading.Lock()
        stub = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:
                try:
                    self._send("220 stub SMTP ready")
                    mail_from, rcpts = "", []
                    while True:
                        line = self.rfile.readline()
                        if not line:
                            return
                        cmd = line.decode().rstrip("\r\n")
                        verb = cmd.split(" ", 1)[0].upper()
                        if verb in ("EHLO", "HELO"):
                            self._send("250-stub greets you")
                            if stub._tls is not None:
                                self._send("250-STARTTLS")
                            self._send("250 8BITMIME")
                        elif verb == "STARTTLS":
                            if stub._tls is None:
                                self._send("454 TLS not available on the stub")
                            else:
                                self._send("220 ready for TLS")
                                # real handshake on the live socket, then
                                # fresh buffered files over the TLS channel
                                self.connection = stub._tls.wrap_socket(
                                    self.connection, server_side=True
                                )
                                self.rfile = self.connection.makefile("rb")
                                self.wfile = self.connection.makefile("wb", buffering=0)
                                mail_from, rcpts = "", []
                        elif verb == "MAIL":
                            mail_from = cmd.split(":", 1)[1].strip().strip("<>")
                            self._send("250 OK")
                        elif verb == "RCPT":
                            rcpts.append(cmd.split(":", 1)[1].strip().strip("<>"))
                            self._send("250 OK")
                        elif verb == "DATA":
                            self._send("354 End data with <CR><LF>.<CR><LF>")
                            chunks = []
                            while True:
                                dline = self.rfile.readline()
                                if dline in (b".\r\n", b".\n", b""):
                                    break
                                # transparency: leading dot unstuffing
                                if dline.startswith(b".."):
                                    dline = dline[1:]
                                chunks.append(dline)
                            with stub._lock:
                                stub.deliveries.append(
                                    (mail_from, list(rcpts), b"".join(chunks).decode())
                                )
                            mail_from, rcpts = "", []
                            self._send("250 OK queued")
                        elif verb == "RSET":
                            mail_from, rcpts = "", []
                            self._send("250 OK")
                        elif verb == "QUIT":
                            self._send("221 bye")
                            return
                        else:
                            self._send(f"502 command not implemented: {verb}")
                except Exception as exc:  # surface in the test, not stderr
                    with stub._lock:
                        stub.errors.append(repr(exc))

            def _send(self, text: str) -> None:
                self.wfile.write(text.encode() + b"\r\n")

        self._server = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "SmtpServerStub":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
