"""Payload extraction cascade (SURVEY S3-S5, S8-S13): magic-byte
detection, ZIP/GZIP decompression, MIME attachment extraction, base64
variants, forensic email parsing, report-type sniffing.

This is the engine's one Python stage, deliberately: it is byte-level
container surgery (zipfile/gzip/email stdlib), not relational work. It
runs as an Arrow-batched pandas UDF directly over the `binaryFile`
scan — each input file is touched exactly once, emitting a typed
extraction struct; everything downstream is JVM-side DataFrame ops.

Semantics mirror the reference (cited per function); the MIME walking
uses Python's `email` parser, which is strictly more tolerant than the
reference's hand-rolled boundary scanner (SURVEY §7 hard part 1).
"""

from __future__ import annotations

import base64
import binascii
import email
import email.policy
import gzip
import io
import json
import re
import zipfile
import zlib

import pandas as pd
from pyspark.sql import functions as F

from parsedmarc_go_spark.schemas import EXTRACTED_SCHEMA

MAX_REPORT_SIZE = 100 * 1024 * 1024  # parser.go:208 (100 MB cap)
_MAX_NEST = 8  # containment depth guard (zip-in-gzip-in-base64…)

_B64_RE = re.compile(rb"\A[A-Za-z0-9+/=\s]+\Z")


def _gunzip(data: bytes) -> bytes:
    """GZIP with truncated-stream tolerance: return partial content on
    unexpected EOF (parser.go:297-316)."""
    try:
        return gzip.decompress(data)
    except (EOFError, OSError, zlib.error):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(data)
        except zlib.error as e:  # pragma: no cover - hard corruption
            raise ValueError(f"gzip decompress failed: {e}") from e
        if not out:
            raise ValueError("gzip produced no content")
        return out


def _unzip_first(data: bytes) -> bytes:
    """ZIP: take the first member only (parser.go:318-343)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        names = zf.namelist()
        if not names:
            raise ValueError("zip archive has no members")
        return zf.read(names[0])


def _try_base64(data: bytes) -> bytes | None:
    """Strict, whitespace-cleaned, and no-padding base64 variants
    (utils.go:185-195; parser.go:1533-1546)."""
    if len(data) < 16 or not _B64_RE.match(data):
        return None
    cleaned = re.sub(rb"\s+", b"", data)
    for pad in (b"", b"=" * (-len(cleaned) % 4)):
        try:
            return base64.b64decode(cleaned + pad, validate=True)
        except (binascii.Error, ValueError):
            continue
    return None


def _looks_like_email(data: bytes) -> bool:
    """Email sniff per parser.go:1722-1726: content-type + mime-version
    (case-insensitive), or classic top headers."""
    head = data[:4096].lower()
    if b"content-type:" in head and b"mime-version:" in head:
        return True
    return head.lstrip()[:13].startswith((b"received:", b"return-path:", b"delivered-to:"))


def _decode_part(part) -> bytes:
    try:
        payload = part.get_payload(decode=True)
    except Exception:
        payload = None
    if payload is None:
        raw = part.get_payload()
        if isinstance(raw, list):
            # message/* container parts (e.g. message/rfc822 sample,
            # message/feedback-report): serialize the inner message(s)
            payload = b"".join(p.as_bytes() for p in raw)
            # a base64 CTE on the *container* (Netease) leaves the inner
            # body undecoded in the serialized form — decode it here,
            # like the reference's per-part base64 pass (parser.go:1528-1546)
            if (part.get("Content-Transfer-Encoding", "") or "").strip().lower() == "base64":
                decoded = _try_base64(payload)
                if decoded is not None:
                    payload = decoded
        elif isinstance(raw, str):
            payload = raw.encode("utf-8", "replace")
            # the email parser ignores Content-Transfer-Encoding on
            # message/* parts; some providers (Netease) base64 them anyway
            if (part.get("Content-Transfer-Encoding", "") or "").strip().lower() == "base64":
                decoded = _try_base64(payload)
                if decoded is not None:
                    payload = decoded
        else:
            payload = b""
    return payload


def _walk_email(data: bytes) -> dict:
    """MIME walk covering S8-S11: pick the report-bearing part by
    content type / filename / magic bytes, decompressing as needed."""
    msg = email.message_from_bytes(data, policy=email.policy.compat32)
    parts = list(msg.walk()) if msg.is_multipart() else [msg]

    # 1) SMTP TLS attachment: application/tlsrpt+gzip / +json (parser.go:713-879)
    for part in parts:
        ctype = (part.get_content_type() or "").lower()
        fname = (part.get_filename() or "").lower()
        if "tlsrpt" in ctype or fname.endswith((".json.gz", ".json")):
            payload = _decode_part(part)
            if payload[:2] == b"\x1f\x8b":
                payload = _gunzip(payload)
            return {"kind": "smtp_tls", "payload": payload, "container": "mime"}

    # 2) forensic: message/feedback-report part present (parser.go:1366-1560)
    body_text = data.decode("utf-8", "replace")
    has_fb_part = any(
        "feedback-report" in (p.get_content_type() or "").lower() for p in parts
    )
    if has_fb_part or "Feedback-Type:" in body_text:
        fr = _parse_forensic_email(msg, parts, body_text)
        if fr is not None:
            return {"kind": "forensic", "forensic_json": json.dumps(fr), "container": "mime"}

    # 3) aggregate: zip/gzip/xml attachment (parser.go:411-626)
    for part in parts:
        ctype = (part.get_content_type() or "").lower()
        fname = (part.get_filename() or "").lower()
        payload = _decode_part(part)
        if not payload:
            continue
        if (
            payload[:4] == b"PK\x03\x04"
            or payload[:2] == b"\x1f\x8b"
            or fname.endswith((".zip", ".gz", ".xml"))
            or "zip" in ctype
            or "gzip" in ctype
            or "xml" in ctype
        ):
            return _extract(payload, depth=1)
        # Mimecast-style: base64 body reassembled from text part (parser.go:557-626)
        decoded = _try_base64(payload.strip())
        if decoded is not None and (
            decoded[:4] == b"PK\x03\x04" or decoded[:2] == b"\x1f\x8b" or b"<feedback" in decoded[:512]
        ):
            return _extract(decoded, depth=1)
    raise ValueError("no report attachment found in email")


# --- forensic email parsing (RFC 6591; parser.go:1302-1717) ------------------

_DELIVERY_BUCKETS = ("delivered", "spam", "policy", "reject", "other")


def _parse_dt(value: str) -> str | None:
    """RFC3339 / RFC2822 date parse → ISO string, None on failure."""
    from datetime import datetime
    from email.utils import parsedate_to_datetime

    for fn in (datetime.fromisoformat, parsedate_to_datetime):
        try:
            return fn(value.replace("Z", "+00:00") if fn is datetime.fromisoformat else value).isoformat()
        except (TypeError, ValueError):
            continue
    return None


def _parse_forensic_email(msg, parts, body_text: str) -> dict | None:
    feedback, sample = "", ""
    for part in parts:
        ctype = (part.get_content_type() or "").lower()
        text = _decode_part(part).decode("utf-8", "replace")
        if "message/feedback-report" in ctype or (not feedback and "Feedback-Type:" in text):
            feedback = text
        elif "message/rfc822" in ctype or (
            not sample and ("Received:" in text or "Return-Path:" in text)
        ):
            sample = text
    if not feedback and "Feedback-Type:" in body_text:
        feedback, sample = _split_plain_forensic(body_text)
    if not feedback:
        return None

    report: dict = {
        "feedback_type": None,
        "user_agent": None,
        "version": None,
        "original_envelope_id": None,
        "original_mail_from": None,
        "original_rcpt_to": None,
        "arrival_date": None,
        "subject": str(msg.get("Subject", "") or ""),
        "message_id": str(msg.get("Message-ID", "") or "").strip(),
        "authentication_results": "",
        "dkim_domain": None,
        "source_ip_address": "",
        "delivery_result": "",
        "auth_failure": [],
        "reported_domain": "",
        "authentication_mechanisms": [],
    }

    date_hdr = msg.get("Date")
    if date_hdr:
        try:
            from email.utils import parsedate_to_datetime

            report["arrival_date"] = parsedate_to_datetime(str(date_hdr)).isoformat()
        except (TypeError, ValueError):
            pass

    # key-value block, split on first colon, case-insensitive keys
    # (parser.go:1563-1648)
    for line in feedback.splitlines():
        line = line.strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field, value = field.strip().lower(), value.strip()
        if field == "feedback-type":
            report["feedback_type"] = value
        elif field == "user-agent":
            report["user_agent"] = value
        elif field == "version":
            report["version"] = value
        elif field == "original-envelope-id":
            report["original_envelope_id"] = value
        elif field == "original-mail-from":
            report["original_mail_from"] = value
        elif field == "original-rcpt-to":
            report["original_rcpt_to"] = value
        elif field == "arrival-date":
            # RFC3339 first (parser.go:1600-1604), then RFC2822; keep the
            # Date-header default when unparseable
            parsed = _parse_dt(value)
            if parsed:
                report["arrival_date"] = parsed
        elif field == "source-ip":
            report["source_ip_address"] = value.split()[0] if value.split() else ""
        elif field == "authentication-results":
            report["authentication_results"] = value
        elif field == "dkim-domain":
            report["dkim_domain"] = value
        elif field == "reported-domain":
            report["reported_domain"] = value
        elif field == "delivery-result":
            report["delivery_result"] = value
        elif field == "auth-failure":
            report["auth_failure"] = [v.strip() for v in value.split(",")]
        elif field == "identity-alignment" and value != "none":
            report["authentication_mechanisms"] = [v.strip() for v in value.split(",")]

    # defaults + delivery normalization (parser.go:1649-1671)
    report["feedback_type"] = report["feedback_type"] or "auth-failure"
    dr = (report["delivery_result"] or "").lower()
    report["delivery_result"] = next((b for b in _DELIVERY_BUCKETS if b in dr), "other")
    if not report["auth_failure"]:
        report["auth_failure"] = ["dmarc"]
    if not report["reported_domain"] and report["source_ip_address"]:
        report["reported_domain"] = _domain_from_sample(sample)

    headers_only = "\n\n" not in sample and ("Received:" in sample or "From:" in sample)
    report["sample_headers_only"] = headers_only
    report["sample"] = sample
    report["parsed_sample"] = json.dumps({"headers_only": headers_only, "raw_sample": sample})
    return report


def _split_plain_forensic(body: str) -> tuple[str, str]:
    """Non-MIME fallback: line-scanner splitting the Feedback-Type block
    from the sample headers (parser.go:1373-1424)."""
    fb_lines: list[str] = []
    sample_lines: list[str] = []
    in_fb = in_sample = False
    for raw in body.splitlines():
        line = raw.strip()
        if line.startswith("Feedback-Type:"):
            in_fb, in_sample = True, False
            fb_lines.append(line)
            continue
        if (
            "The original message headers were:" in line
            or line.startswith("Received:")
            or line.startswith("Return-Path:")
        ):
            in_sample, in_fb = True, False
            if "original message headers" not in line:
                sample_lines.append(line)
            continue
        if not line:
            if in_fb and fb_lines:
                in_fb = False
            continue
        if in_fb:
            fb_lines.append(line)
        elif in_sample:
            sample_lines.append(line)
    return "\n".join(fb_lines), "\n".join(sample_lines)


def _domain_from_sample(sample: str) -> str:
    """Extract domain from the sample's From: header (parser.go:1696-1717)."""
    for raw in sample.splitlines():
        line = raw.strip()
        if line.lower().startswith("from:"):
            value = line[5:].strip()
            at = value.rfind("@")
            if at != -1:
                domain = value[at + 1 :]
                for stop in (">", " "):
                    idx = domain.find(stop)
                    if idx != -1:
                        domain = domain[:idx]
                return domain.strip()
    return ""


# --- the cascade -------------------------------------------------------------

def _sniff_kind(text: str) -> str:
    """Report-type sniff (server.go:446-468): feedback-type → forensic,
    <feedback → aggregate, organization-name JSON → smtp_tls."""
    head = text[:2048].lstrip()
    low = head.lower()
    if "feedback-type:" in low:
        return "forensic"
    if "<feedback" in text[:65536] or low.startswith("<?xml"):
        return "aggregate"
    if head.startswith("{"):
        return "smtp_tls"
    return "unknown"


def _extract(data: bytes, depth: int = 0) -> dict:
    if depth > _MAX_NEST:
        raise ValueError("nesting too deep")
    if not data or not data.strip():
        raise ValueError("empty input")  # F2, parser.go:151-155
    if len(data) > MAX_REPORT_SIZE:
        raise ValueError("report exceeds 100 MB cap")  # F3, parser.go:207-216

    if data[:4] == b"PK\x03\x04":
        inner = _extract(_unzip_first(data), depth + 1)
        inner["container"] = "zip" if inner.get("container") == "raw" else f"zip+{inner['container']}"
        return inner
    if data[:2] == b"\x1f\x8b":
        inner = _extract(_gunzip(data), depth + 1)
        inner["container"] = "gzip" if inner.get("container") == "raw" else f"gzip+{inner['container']}"
        return inner
    if _looks_like_email(data):
        return _walk_email(data)

    # reject invalid UTF-8 like the reference's XML/JSON decoders do
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError as e:
        raise ValueError(f"invalid utf-8: {e}") from e

    kind = _sniff_kind(text)
    if kind == "forensic":
        msg = email.message_from_bytes(data, policy=email.policy.compat32)
        fr = _parse_forensic_email(msg, [msg], text)
        if fr is None:
            raise ValueError("no feedback report found")
        return {"kind": "forensic", "forensic_json": json.dumps(fr), "container": "raw"}
    if kind == "unknown":
        decoded = _try_base64(data)
        if decoded is not None:
            inner = _extract(decoded, depth + 1)
            inner["container"] = f"base64+{inner.get('container', 'raw')}"
            return inner
        raise ValueError("unrecognized report format")
    return {"kind": kind, "payload": data, "container": "raw"}


def extract_payload(data: bytes) -> dict:
    """Full extraction for one raw file; never raises."""
    out = {"kind": None, "payload": None, "container": None, "forensic_json": None, "error": None}
    try:
        res = _extract(bytes(data))
        out.update(res)
        payload = out.get("payload")
        if isinstance(payload, bytes):
            out["payload"] = payload.decode("utf-8", "replace")
    except Exception as e:  # per-file error isolation (S2, parser.go:116-132)
        out = dict.fromkeys(out, None)
        out["kind"] = "error"
        out["error"] = str(e)[:500]
    return out


@F.pandas_udf(EXTRACTED_SCHEMA)
def extract_udf(content: pd.Series) -> pd.DataFrame:
    rows = [extract_payload(c) for c in content]
    return pd.DataFrame(rows, columns=[f.name for f in EXTRACTED_SCHEMA.fields])
