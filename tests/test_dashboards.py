"""Run the complete reference dashboard workload (28 queries) against
the corpus-ingested DMARC tables; sanity-assert the panel semantics."""

from __future__ import annotations

import os

import pytest

from parsedmarc_go_spark.plans.dashboards import (
    DASHBOARD_QUERIES,
    register_views,
    run_dashboard_query,
)

SAMPLES = "/root/reference/samples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLES), reason="reference sample corpus not available"
)

# anchor inside the corpus' date spread: newest aggregate sample dates
# are 2024-06; forensic arrival dates cluster in 2019
AS_OF_AGG = "2024-06-14 00:00:00"
AS_OF_FORENSIC = "2019-05-01 00:00:00"


@pytest.fixture(scope="module")
def views(spark):
    from parsedmarc_go_spark.sources.ingest import ingest

    res = ingest(spark, SAMPLES)
    register_views(
        spark,
        {
            "dmarc_aggregate_reports": res.aggregate_reports,
            "dmarc_aggregate_records": res.aggregate_records,
            "dmarc_forensic_reports": res.forensic_reports,
            "dmarc_smtp_tls_reports": res.smtp_tls_reports,
            "dmarc_smtp_tls_failures": res.smtp_tls_failures,
        },
    )
    return spark


@pytest.mark.parametrize("name", sorted(DASHBOARD_QUERIES))
def test_dashboard_query_runs(views, name):
    as_of = AS_OF_FORENSIC if name.startswith("forensic") else AS_OF_AGG
    df = run_dashboard_query(views, name, as_of=as_of)
    rows = df.collect()  # must execute without error
    assert df.columns, name
    # rate panels must stay in [0, 100]
    for col in df.columns:
        if "rate" in col:
            for r in rows:
                v = r[col]
                assert v is None or 0 <= v <= 100, f"{name}.{col} = {v}"


def test_compliance_panel_value(views):
    df = run_dashboard_query(views, "overview_compliance_rate_7d", as_of=AS_OF_AGG)
    [row] = df.collect()
    assert row.compliance_rate is not None and 0 <= row.compliance_rate <= 100


def test_domain_analysis_joins(views):
    rows = run_dashboard_query(views, "docs_domain_analysis", as_of=AS_OF_AGG).collect()
    assert rows, "domain analysis returned no rows in the 30-day window"
    domains = {r.domain for r in rows}
    assert "example.com" in domains


def test_forensic_panels_have_data(views):
    rows = run_dashboard_query(views, "forensic_feedback_types", as_of=AS_OF_FORENSIC).collect()
    assert rows and rows[0].feedback_type == "auth-failure"
