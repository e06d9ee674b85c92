"""RFC-mandated defaulting edge cases (parser.go:1145-1261) through the
real pipeline: a minimal synthesized report exercising every missing-
element default at once."""

from __future__ import annotations

import pytest

MINIMAL = b"""<?xml version="1.0"?>
<feedback>
  <report_metadata>
    <org_name>minimal.org</org_name>
    <email>r@minimal.org</email>
    <report_id>minimal-1</report_id>
    <date_range><begin>1700000000</begin><end>1700003600</end></date_range>
  </report_metadata>
  <policy_published>
    <domain>example.com</domain>
    <p>quarantine</p>
  </policy_published>
  <record>
    <row>
      <source_ip>203.0.113.7</source_ip>
      <count>3</count>
      <policy_evaluated>
        <disposition>none</disposition>
        <reason><type></type></reason>
        <reason><type>forwarded</type><comment>fwd</comment></reason>
      </policy_evaluated>
    </row>
    <identifiers>
      <header_from>MiXeD.Example.COM</header_from>
      <envelope_from>UPPER@Example.com</envelope_from>
    </identifiers>
    <auth_results>
      <dkim><domain>example.com</domain></dkim>
      <dkim><domain></domain><result>pass</result></dkim>
      <spf><domain>example.com</domain></spf>
    </auth_results>
  </record>
</feedback>
"""


@pytest.fixture(scope="module")
def parsed(spark, tmp_path_factory):
    from parsedmarc_go_spark.sources.ingest import ingest

    d = tmp_path_factory.mktemp("defaults")
    (d / "minimal.xml").write_bytes(MINIMAL)
    res = ingest(spark, str(d))
    return res.aggregate_reports.collect(), res.aggregate_records.collect()


def test_policy_defaults(parsed):
    reports, _ = parsed
    [r] = reports
    # adkim/aspf default 'r'; sp defaults to p; pct '100'; fo '0'
    assert r.adkim == "r" and r.aspf == "r"
    assert r.sp == "quarantine"  # = p (parser.go:1150)
    assert r.pct == "100" and r.fo == "0"
    assert r.org_extra_contact_info is None


def test_record_defaults(parsed):
    _, records = parsed
    [rec] = records
    # policy dkim/spf missing → 'fail' → not aligned (parser.go:1218-1242)
    assert rec.spf_aligned is False and rec.dkim_aligned is False and rec.dmarc_aligned is False
    # identifiers lowercased; envelope_to absent → null
    assert rec.header_from == "mixed.example.com"
    assert rec.envelope_from == "upper@example.com"
    assert rec.envelope_to is None
    # reason with empty type → 'none'; comment missing → 'none'
    assert rec.policy_override_reasons == ["none", "forwarded"]
    assert rec.policy_override_comments == ["none", "fwd"]
    # dkim with empty domain dropped; selector default 'none'; missing
    # result → 'none'; spf scope default 'mfrom' (parser.go:1247-1265)
    assert rec.dkim_domains == ["example.com"]
    assert rec.dkim_selectors == ["none"]
    assert rec.dkim_results == ["none"]
    assert rec.spf_scopes == ["mfrom"]
    assert rec.spf_results == ["none"]


BAD_COUNT = MINIMAL.replace(b"<count>3</count>", b"<count>abc</count>")
EMPTY_COUNT = MINIMAL.replace(b"<count>3</count>", b"<count></count>")
NO_COUNT = MINIMAL.replace(b"<count>3</count>", b"")


def test_non_integer_count_rejects_report(spark, tmp_path):
    """ADVICE r1: the reference fails xml.Unmarshal on a non-integer
    <count> and rejects the whole report; it must land in the rejects
    quarantine, not be kept with count=0."""
    from parsedmarc_go_spark.sources.ingest import ingest

    d = tmp_path / "badcount"
    d.mkdir()
    (d / "bad.xml").write_bytes(BAD_COUNT)
    (d / "empty.xml").write_bytes(EMPTY_COUNT)
    res = ingest(spark, str(d))
    assert res.aggregate_reports.count() == 0
    assert res.aggregate_records.count() == 0
    assert res.rejects.count() == 2


def test_missing_count_defaults_to_zero(spark, tmp_path):
    """A MISSING <count> element is Go's zero value (no unmarshal error)
    — the report stays accepted with count=0."""
    from parsedmarc_go_spark.sources.ingest import ingest

    d = tmp_path / "nocount"
    d.mkdir()
    (d / "no.xml").write_bytes(NO_COUNT)
    res = ingest(spark, str(d))
    [rec] = res.aggregate_records.collect()
    assert rec["count"] == 0  # rec.count is Row.count(), not the column
    assert res.rejects.count() == 0
