"""Enrichment operators: base-domain CDN rules (utils.go:116-145),
IPv4→int, GeoIP range join, sender-classification map join."""

from __future__ import annotations

from pyspark.sql import functions as F

from parsedmarc_go_spark.functions.enrich import (
    base_domain,
    classify_sender,
    geoip_enrich,
    ipv4_to_long,
)


def test_base_domain_rules(spark):
    cases = [
        ("mail.example.com", "example.com"),
        ("example.com", "example.com"),
        ("host", "host"),
        ("", ""),
        ("e3191.c.akamaiedge.net", "c.akamaiedge.net"),
        ("d111111abcdef8.cloudfront.net", "d111111abcdef8.cloudfront.net"),
        ("x.y.cloudfront.net", "y.cloudfront.net"),
        ("app.herokuapp.com", "app.herokuapp.com"),
        ("a.b.fastly.com", "b.fastly.com"),
        ("deep.sub.mail.example.org", "example.org"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "host string")
    got = {r.host: r.bd for r in df.select("host", base_domain(F.col("host")).alias("bd")).collect()}
    for host, expected in cases:
        assert got[host] == expected, f"{host}: {got[host]} != {expected}"


def test_ipv4_to_long(spark):
    df = spark.createDataFrame(
        [("0.0.0.0",), ("255.255.255.255",), ("10.0.0.1",), ("::1",), ("999.1.1.1",), ("x",)],
        "ip string",
    )
    got = {r.ip: r.v for r in df.select("ip", ipv4_to_long(F.col("ip")).alias("v")).collect()}
    assert got["0.0.0.0"] == 0
    assert got["255.255.255.255"] == 4294967295
    assert got["10.0.0.1"] == 167772161
    assert got["::1"] is None and got["999.1.1.1"] is None and got["x"] is None


def test_geoip_range_join(spark):
    fact = spark.createDataFrame(
        [("10.0.0.5",), ("192.168.1.1",), ("not-an-ip",)], "source_ip_address string"
    )
    dim = spark.createDataFrame(
        [(167772160, 167772415, "US")],  # 10.0.0.0 - 10.0.0.255
        "start_ip long, end_ip long, country string",
    )
    got = {
        r.source_ip_address: r.source_country
        for r in geoip_enrich(fact, dim).collect()
    }
    assert got == {"10.0.0.5": "US", "192.168.1.1": "Unknown", "not-an-ip": "Unknown"}


def test_classify_sender(spark):
    fact = spark.createDataFrame(
        [("mail-a.google.com",), ("unknown.example.net",), ("",)],
        "source_reverse_dns string",
    )
    dns_map = spark.createDataFrame(
        [("google.com", "Google", "Email Provider")],
        "base_reverse_dns string, name string, type string",
    )
    rows = classify_sender(fact, dns_map).collect()
    got = {r.source_reverse_dns: (r.source_name, r.source_type) for r in rows}
    assert got["mail-a.google.com"] == ("Google", "Email Provider")
    assert got["unknown.example.net"] == ("Unknown", "Unknown")
    assert got[""] == ("Unknown", "Unknown")
