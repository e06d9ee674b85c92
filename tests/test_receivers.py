"""S15/S16 receivers: drive the HTTP receiver over a real socket into a
landing zone consumed by the streaming daemon; IMAP candidate filter
unit semantics."""

from __future__ import annotations

import gzip
import os
import urllib.error
import urllib.request

import pytest

from parsedmarc_go_spark.sources.receivers import (
    ReportHTTPReceiver,
    imap_candidate_filter,
)

SAMPLES = "/root/reference/samples"


def _post(url: str, body: bytes, ctype: str) -> int:
    req = urllib.request.Request(url, data=body, headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="corpus missing")
def test_http_receiver_to_stream(spark, tmp_path):
    land = str(tmp_path / "land")
    rx = ReportHTTPReceiver(land)
    rx.start()
    url = f"http://127.0.0.1:{rx.port}/dmarc/report"
    xml = open(f"{SAMPLES}/aggregate/!example.com!1538204542!1538463818.xml", "rb").read()

    assert _post(url, xml, "application/xml") == 200
    assert _post(url, gzip.compress(xml), "application/gzip") == 200
    assert _post(url, xml, "text/csv") == 415  # whitelist (server.go:424-444)
    assert _post(url, b"", "application/xml") == 400
    req = urllib.request.Request(f"http://127.0.0.1:{rx.port}/other", data=xml,
                                 headers={"Content-Type": "application/xml"})
    try:
        urllib.request.urlopen(req, timeout=10)
        code = 200
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 404
    rx.stop()

    files = os.listdir(land)
    assert len(files) == 2 and all(f.startswith("http_") for f in files)

    # the landed files parse through the normal ingest path
    from parsedmarc_go_spark.sources.ingest import ingest

    res = ingest(spark, land)
    assert res.aggregate_reports.count() == 2
    assert res.rejects.count() == 0


def test_imap_candidate_filter():
    assert imap_candidate_filter("Report Domain: example.com Submitter: google.com", [])
    assert imap_candidate_filter("DMARC Aggregate Report", [])
    assert imap_candidate_filter("TLS Report", [])
    assert imap_candidate_filter("hello", ["report.xml.gz"])
    assert imap_candidate_filter("hello", ["stuff.zip"])
    assert not imap_candidate_filter("lunch plans", ["photo.png"])
    assert not imap_candidate_filter("", [])
