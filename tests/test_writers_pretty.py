"""K1 pretty-print byte parity (VERDICT r10 task 4; reference
output.go:139-216 json.MarshalIndent of the parser structs).

No Go toolchain exists in this environment, so the goldens are
SEMANTICS-DERIVED, frozen from an audited render: field order follows
the struct declarations in parser/types.go:17-170 verbatim, times are
RFC3339-Z, nil slices/pointers are null, omitempty tags drop their
fields, and the encoder HTML-escapes like Go's. The byte-diff then
pins the writer against drift. The documented injectables (uuid id /
created_at) never appear — the marshaled structs don't carry them."""

from __future__ import annotations

import json
import os

import pytest

from parsedmarc_go_spark.sinks.writers import (
    _go_json,
    pretty_json_reports,
    write_json_pretty,
)

SAMPLES = "/root/reference/samples"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

AGG_SAMPLE = os.path.join(
    SAMPLES, "aggregate", "example.net!example.com!1529366400!1529452799.xml"
)

# parser/types.go declaration order (struct tags)
AGG_KEYS = ["xml_schema", "report_metadata", "policy_published", "records"]
META_KEYS = [
    "org_name", "org_email", "org_extra_contact_info", "report_id",
    "begin_date", "end_date", "errors",
]
POLICY_KEYS = ["domain", "adkim", "aspf", "p", "sp", "pct", "fo"]
RECORD_KEYS = [
    "source", "count", "alignment", "policy_evaluated", "identifiers",
    "auth_results",
]
SOURCE_KEYS = ["ip_address", "country", "reverse_dns", "base_domain", "name", "type"]


def _needs_samples():
    if not os.path.isdir(SAMPLES):
        pytest.skip("reference samples absent")


def test_go_json_encoder_conventions():
    # HTML escaping (Go's default encoder), 2-space indent, ": " kv sep
    s = _go_json({"a": "<b&c>", "n": None, "l": [1, 2]})
    assert '"a": "\\u003cb\\u0026c\\u003e"' in s
    assert s.startswith("{\n  ")
    assert '"n": null' in s
    assert '"l": [\n    1,\n    2\n  ]' in s
    # no trailing newline — the writer adds the per-report one
    assert not s.endswith("\n")


def test_aggregate_pretty_golden_byte_diff(spark):
    _needs_samples()
    from parsedmarc_go_spark.sources.ingest import ingest

    res = ingest(spark, AGG_SAMPLE, as_of="2024-01-15T00:00:00Z")
    text = write_json_pretty(
        "aggregate", res.aggregate_reports, res.aggregate_records
    )
    with open(os.path.join(GOLDEN, "aggregate_example_net_pretty.json")) as fh:
        assert text == fh.read()

    # field ORDER is the parity claim NDJSON can't make: assert the
    # exact Go struct declaration order at every nesting level
    doc = json.loads(text.rsplit("\n", 1)[0], object_pairs_hook=lambda p: p)

    def keys(pairs):
        return [k for k, _ in pairs]

    def val(pairs, key):
        return dict(pairs)[key]

    assert keys(doc) == AGG_KEYS
    assert keys(val(doc, "report_metadata")) == META_KEYS
    assert keys(val(doc, "policy_published")) == POLICY_KEYS
    rec = val(doc, "records")[0]
    assert keys(rec) == RECORD_KEYS
    assert keys(val(rec, "source")) == SOURCE_KEYS
    assert keys(val(rec, "alignment")) == ["spf", "dkim", "dmarc"]
    assert keys(val(rec, "policy_evaluated")) == [
        "disposition", "dkim", "spf", "policy_override_reasons",
    ]
    assert keys(val(rec, "identifiers")) == [
        "header_from", "envelope_from", "envelope_to",
    ]
    # nil-slice -> null (Go marshals nil []T as null, not [])
    assert val(val(rec, "auth_results"), "dkim") is None


def test_smtp_tls_pretty_golden_and_omitempty(spark):
    _needs_samples()
    from parsedmarc_go_spark.sources.ingest import ingest

    res = ingest(spark, os.path.join(SAMPLES, "smtp_tls"), as_of="2024-01-15T00:00:00Z")
    text = write_json_pretty("smtp_tls", res.smtp_tls_reports, res.smtp_tls_failures)
    with open(os.path.join(GOLDEN, "smtp_tls_pretty.json")) as fh:
        assert text == fh.read()
    # omitempty: a no-policy-found policy must NOT carry
    # policy_strings/mx_host_patterns/failure_details keys
    blocks = pretty_json_reports("smtp_tls", res.smtp_tls_reports, res.smtp_tls_failures)
    parsed = [json.loads(b) for b in blocks]
    flat_policies = [p for doc in parsed for p in doc["policies"]]
    no_policy = [p for p in flat_policies if p["policy_type"] == "no-policy-found"]
    assert no_policy and all(
        "policy_strings" not in p and "failure_details" not in p for p in no_policy
    )
    with_strings = [p for p in flat_policies if "policy_strings" in p]
    assert with_strings, "sample corpus has sts policies with policy_strings"


def test_forensic_pretty_shape(spark):
    _needs_samples()
    from parsedmarc_go_spark.sources.ingest import ingest

    res = ingest(spark, os.path.join(SAMPLES, "forensic"), as_of="2024-01-15T00:00:00Z")
    blocks = pretty_json_reports("forensic", res.forensic_reports)
    assert blocks
    doc = json.loads(blocks[0], object_pairs_hook=lambda p: p)
    assert [k for k, _ in doc] == [
        "feedback_type", "user_agent", "version", "original_envelope_id",
        "original_mail_from", "original_rcpt_to", "arrival_date",
        "arrival_date_utc", "subject", "message_id",
        "authentication_results", "dkim_domain", "source",
        "delivery_result", "auth_failure", "reported_domain",
        "authentication_mechanisms", "sample_headers_only", "sample",
        "parsed_sample",
    ]
    # parsed_sample embeds as an OBJECT (RawMessage re-indent parity),
    # never a double-encoded string
    ps = dict(doc)["parsed_sample"]
    assert ps is None or not isinstance(ps, str)


@pytest.mark.slow  # >10 s wall: excluded from the default lane (run -m "")
def test_pretty_report_order_is_plan_independent(spark):
    """ADVICE r11: pretty_json_reports must not inherit partition
    order from toLocalIterator — report framing order has to survive
    an upstream plan change. Scrambling the REPORTS frame's
    partitioning (the records frame is keyed by report, so its
    grouping is order-free at the report level) must leave the
    rendered bytes identical, and the smtp_tls framing must come out
    in natural-key order rather than first-seen order."""
    _needs_samples()
    from parsedmarc_go_spark.sources.ingest import ingest

    res = ingest(spark, os.path.join(SAMPLES, "aggregate"), as_of="2024-01-15T00:00:00Z")
    base = pretty_json_reports("aggregate", res.aggregate_reports, res.aggregate_records)
    assert len(base) > 1, "needs a multi-report corpus to test ordering"
    scrambled = pretty_json_reports(
        "aggregate",
        res.aggregate_reports.repartition(7),
        res.aggregate_records,
    )
    assert scrambled == base

    resf = ingest(spark, os.path.join(SAMPLES, "forensic"), as_of="2024-01-15T00:00:00Z")
    fb = pretty_json_reports("forensic", resf.forensic_reports)
    fs = pretty_json_reports("forensic", resf.forensic_reports.repartition(5))
    assert fs == fb and len(fb) > 1

    rest = ingest(spark, os.path.join(SAMPLES, "smtp_tls"), as_of="2024-01-15T00:00:00Z")
    blocks = pretty_json_reports("smtp_tls", rest.smtp_tls_reports, rest.smtp_tls_failures)
    keys = [
        (doc["organization_name"], doc["report_id"])
        for doc in (json.loads(b) for b in blocks)
    ]
    assert keys == sorted(keys) and len(keys) > 1


def test_pretty_records_keyed_by_full_natural_key(spark):
    """ADVICE r12: two reports sharing (org_name, report_id) but
    covering DIFFERENT date ranges must each render only their own
    records — a (org, report_id)-keyed record map silently gives both
    reports the merged record set."""
    from datetime import datetime

    from parsedmarc_go_spark.schemas import (
        AGGREGATE_RECORDS_SCHEMA,
        AGGREGATE_REPORTS_SCHEMA,
    )

    t1 = datetime(2024, 1, 1)
    t2 = datetime(2024, 2, 1)

    def report(begin):
        d = {f.name: None for f in AGGREGATE_REPORTS_SCHEMA.fields}
        d.update(org_name="acme", report_id="rid-1", begin_date=begin, end_date=begin)
        return d

    # the ingest records frame carries the policy_evaluated columns on
    # top of the base schema
    import pyspark.sql.types as T

    rec_schema = T.StructType(
        list(AGGREGATE_RECORDS_SCHEMA.fields)
        + [
            T.StructField("policy_eval_dkim", T.StringType(), True),
            T.StructField("policy_eval_spf", T.StringType(), True),
        ]
    )

    def record(begin, ip):
        d = {f.name: None for f in rec_schema.fields}
        d.update(
            org_name="acme", report_id="rid-1", begin_date=begin,
            source_ip_address=ip, count=1,
        )
        return d

    reports = spark.createDataFrame(
        [report(t1), report(t2)], AGGREGATE_REPORTS_SCHEMA
    )
    records = spark.createDataFrame(
        [record(t1, "10.0.0.1"), record(t2, "10.0.0.2")], rec_schema
    )
    blocks = pretty_json_reports("aggregate", reports, records)
    assert len(blocks) == 2
    jan, feb = (json.loads(b) for b in blocks)  # natural-key sort: t1 first
    assert [r["source"]["ip_address"] for r in jan["records"]] == ["10.0.0.1"]
    assert [r["source"]["ip_address"] for r in feb["records"]] == ["10.0.0.2"]
