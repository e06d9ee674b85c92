"""Self-signed cert fixture for the TLS transport-parity tests.

The reference dials IMAP/SMTP over crypto/tls with default (verifying)
configuration (client.go:37-84, smtp.go). The hermetic equivalent: a
throwaway CA==leaf cert minted by the openssl CLI with a
localhost/127.0.0.1 SAN, a server context serving it, and a CLIENT
context whose ONLY trust anchor is that cert — so the executed tests
complete fully VERIFIED handshakes (check_hostname on, CERT_REQUIRED),
not CERT_NONE theater. No network, no long-lived key material.
"""

from __future__ import annotations

import os
import ssl
import subprocess


def make_cert(tmp_dir: str) -> tuple[str, str]:
    """Mint (cert_pem, key_pem) under tmp_dir; skip-friendly failure."""
    cert = os.path.join(tmp_dir, "cert.pem")
    key = os.path.join(tmp_dir, "key.pem")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", key, "-out", cert, "-days", "2", "-nodes",
            "-subj", "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )
    return cert, key


def server_context(cert: str, key: str) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)
    return ctx


def client_context(cert: str) -> ssl.SSLContext:
    """Default-security client context trusting ONLY the test cert."""
    ctx = ssl.create_default_context(cafile=cert)
    assert ctx.check_hostname and ctx.verify_mode == ssl.CERT_REQUIRED
    return ctx
