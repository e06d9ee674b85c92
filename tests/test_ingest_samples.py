"""Corpus parity: run the ingest pipeline over the reference's sample
corpus (/root/reference/samples, read-only) and assert the same
accept/reject matrix as the reference's own tests
(internal/parser/parser_test.go:31-272), plus field-level golden checks
on the canonical inline example (parser_test.go:274-355)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SAMPLES = "/root/reference/samples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference sample corpus not available"
)


@pytest.fixture(scope="module")
def result(spark):
    from parsedmarc_go_spark.sources.ingest import ingest

    res = ingest(spark, SAMPLES)
    # materialize once per module
    return {
        "reports": res.aggregate_reports.cache(),
        "records": res.aggregate_records.cache(),
        "forensic": res.forensic_reports.cache(),
        "tls_reports": res.smtp_tls_reports.cache(),
        "tls_failures": res.smtp_tls_failures.cache(),
        "rejects": res.rejects.cache(),
    }


def test_aggregate_accept_matrix(result):
    """Whole-corpus accept/reject matrix (parser_test.go:31-96, 192-235):
    15 valid aggregate payloads under aggregate/ (plain XML, gz, zip,
    3 eml) + 4 under extract_report/ = 19 accepted rows (extract_report
    repeats the same report id — dedup is a query-side concern, matching
    the reference's at-least-once semantics, SURVEY §2.10). Rejected:
    invalid_xml (XML decode), invalid_utf_8 (encoding), upper_cased_pass
    (>48 h date range, the actual reason that file is invalid)."""
    rows = result["reports"].select("report_id", "org_name", "domain").collect()
    assert len(rows) == 19, f"expected 19 accepted aggregate reports, got {len(rows)}"

    rejects = {os.path.basename(r.path): r.error for r in result["rejects"].collect()}
    assert any("invalid_xml" in p for p in rejects), rejects
    assert any("invalid_utf_8" in p for p in rejects), rejects
    assert any("upper_cased_pass" in p and "RFC 7489" in e for p, e in rejects.items()), rejects


def test_empty_input_rejected():
    """F2 (parser.go:151-155): empty payload is an extraction error.
    Zero-byte files never even reach the pipeline (binaryFile skips
    them), so this is asserted at the operator level."""
    from parsedmarc_go_spark.sources.extract import extract_payload

    out = extract_payload(b"")
    assert out["kind"] == "error" and "empty" in out["error"]
    out = extract_payload(b"   \n  ")
    assert out["kind"] == "error"


def test_aggregate_golden_fields(result):
    """Field assertions on !example.com!1538204542!1538463818.xml
    (the reference's golden file, parser_test.go:274-355)."""
    r = (
        result["reports"]
        .filter(F.col("report_id") == "example.com:1538463741")
        .collect()
    )
    assert len(r) == 1
    row = r[0]
    assert row.org_name == ""
    assert row.org_email == "administrator@accurateplastics.com"
    assert row.domain == "example.com"
    assert row.adkim == "r" and row.aspf == "r"
    assert row.p == "none" and row.sp == "reject"  # sp explicitly set
    assert row.pct == "100"
    assert row.fo == "0"  # defaulted
    assert str(row.begin_date) == "2018-10-01 17:07:12"  # epoch 1538413632 UTC

    recs = (
        result["records"].filter(F.col("report_id") == "example.com:1538463741").collect()
    )
    assert len(recs) == 1
    rec = recs[0]
    assert rec.source_ip_address == "12.20.127.122"
    assert rec["count"] == 1  # rec.count is Row.count()
    assert rec.disposition == "none"
    assert rec.spf_aligned is False and rec.dkim_aligned is False and rec.dmarc_aligned is False
    assert rec.header_from == "example.com"
    # spf auth result has empty domain → dropped (parser.go:1259 guard)
    assert rec.spf_domains == []
    assert rec.policy_override_reasons == []


def test_aggregate_defaults_old_draft(result):
    """old_draft_from_wiki.xml: comment preamble + draft schema still
    parses (wrapper strip, parser.go:1062-1073)."""
    r = result["reports"].filter(F.col("report_id") == "9391651994964116463").collect()
    assert len(r) == 1
    assert r[0].org_name == "acme.com"


def test_compressed_variants(result):
    """gz + zip single-file reports parse identically to plain XML
    (parser_test.go:237-272)."""
    reports = {r.report_id: r.org_name for r in result["reports"].collect()}
    assert reports.get("102675056") == "FastMail Pty Ltd"  # .xml.gz sample
    assert reports.get("2940") == "XYZ Corporation"  # .xml.zip sample


def test_large_report_explodes(result):
    """The 909 KB / 2,286-record sample fully explodes (P6 at volume)."""
    n = result["records"].filter(F.col("report_id") == "example.com:1711897200").count()
    assert n == 2286


def test_forensic_accept_matrix(result):
    """4 forensic .eml samples parse (parser_test.go:98-143)."""
    rows = result["forensic"].collect()
    assert len(rows) == 4, [r.subject for r in rows]
    for r in rows:
        assert r.feedback_type == "auth-failure"
        assert r.delivery_result in {"delivered", "spam", "policy", "reject", "other"}
        assert r.auth_failure, "auth_failure must default to ['dmarc']"


def test_smtp_tls_accept_matrix(result):
    """3 JSON + 1 eml smtp_tls samples (parser_test.go:145-190)."""
    rows = result["tls_reports"].collect()
    report_ids = {r.report_id for r in rows}
    assert "5065427c-23d3-47ca-b6e0-946ea0e8c4be" in report_ids
    # rfc8460.json: one policy, 3 failure details
    f = result["tls_failures"].filter(
        F.col("report_id") == "5065427c-23d3-47ca-b6e0-946ea0e8c4be"
    )
    assert f.count() == 3
    kinds = {r.result_type for r in f.collect()}
    assert kinds == {"certificate-expired", "starttls-not-supported", "validation-failure"}
    google = result["tls_reports"].filter(F.col("organization_name") == "Google Inc.").collect()
    assert google, [r.organization_name for r in rows]


def test_rejects_have_reasons(result):
    for r in result["rejects"].collect():
        assert r.error, f"reject without a reason: {r.path}"


def test_forensic_golden_fields(result):
    """Field-level goldens for all forensic samples (values read from
    the samples' feedback-report blocks; the reference asserts only
    accept/reject — we pin the content)."""
    rows = {r.message_id: r for r in result["forensic"].collect()}

    linkedin = rows["<BB.91.26019.C3EA7CC5@mail516.prod.linkedin.com>"]
    assert linkedin.source_ip_address == "10.10.10.10"
    assert linkedin.reported_domain == "example.com"
    assert linkedin.delivery_result == "delivered"
    assert str(linkedin.arrival_date) == "2019-04-30 02:09:00"

    de = rows["<OF587285BA.CB01D107-ONC1258319.00334FCF@LocalDomain>"]
    assert de.reported_domain == "domain.de"
    assert de.delivery_result == "policy"
    assert "dmarc=fail" in de.authentication_results

    netease = rows["<5BADEAEC.AC2A83.17156@m12-184.163.com>"]
    # the feedback block is base64 on a message/* container (the
    # provider-quirk case, SURVEY §7 hard part 1)
    assert netease.source_ip_address == "167.89.69.24"
    assert netease.reported_domain == "cardinal.com"
    assert netease.user_agent == "NtesDmarcReporter/1.0"
    assert netease.original_envelope_id == "N8CowEApcUPo6q1bnXlMAA--.44392S3"
    assert str(netease.arrival_date) == "2018-09-28 08:48:42"  # +0800 → UTC


def test_injected_clock_makes_reingest_reproducible(spark):
    """Round-6 verdict task 6: with the ingest clock pinned, two ingests
    of the same corpus produce IDENTICAL tables — created_at included —
    and created_at equals the injected instant exactly. (Without as_of,
    created_at is wall-clock and re-ingests differ by design.)"""
    import datetime

    from parsedmarc_go_spark.sources.ingest import ingest

    as_of = "2024-09-01 00:00:00"
    path = os.path.join(SAMPLES, "aggregate")
    a, b = ingest(spark, path, as_of=as_of), ingest(spark, path, as_of=as_of)
    for table in ("aggregate_reports", "aggregate_records"):
        ra = sorted(map(str, getattr(a, table).collect()))
        rb = sorted(map(str, getattr(b, table).collect()))
        assert ra == rb, f"{table}: re-ingest not byte-identical"
    stamps = {r["created_at"] for r in a.aggregate_reports.collect()}
    assert stamps == {datetime.datetime(2024, 9, 1, 0, 0)}, stamps
