"""IPv6 support: with_ip_hilo parse parity against Python's ipaddress
module (the same RFC 4291 grammar net.ParseIP implements,
utils.go:148-150), and the geoip_enrich6 bucketed interval join."""

from __future__ import annotations

import ipaddress
import random

from pyspark.sql import functions as F

SIGN = 1 << 63


def _bias(u64: int) -> int:
    """Unsigned 64-bit half -> the sign-biased int64 the engine emits."""
    b = u64 ^ SIGN
    return b - (1 << 64) if b >= SIGN else b


def expected_hilo(s: str):
    """Ground truth: ipaddress, with the two deviations the engine
    documents — whitespace-tolerant (trimmed), zone suffixes rejected
    (net.ParseIP parity; Python 3.9+ would accept 'fe80::1%eth0')."""
    s = s.strip()
    if "%" in s:
        return None
    try:
        addr = ipaddress.ip_address(s)
    except ValueError:
        return None
    if isinstance(addr, ipaddress.IPv4Address):
        return (_bias(0), _bias(int(addr)))
    v = int(addr)
    return (_bias(v >> 64), _bias(v & (2**64 - 1)))


def _corpus() -> list[str]:
    rng = random.Random(20260813)
    cases = [
        # hand-picked edges
        "::", "::1", "1::", "0:0:0:0:0:0:0:0", "1:2:3:4:5:6:7:8",
        "1:2:3:4:5:6:7::", "::1:2:3:4:5:6:7", "fe80::1", "2001:db8::",
        "::ffff:1.2.3.4", "::FFFF:255.255.255.255", "::1.2.3.4",
        "1:2:3:4:5:6:1.2.3.4", "1::2.3.4.5", "0.0.0.0", "255.255.255.255",
        "10.0.0.1", " ::1 ", "\t192.168.1.1\n",
        # invalid
        "", " ", ":", ":::", "1:::2", "1::2::3", "1:2:3:4:5:6:7:8:9",
        "1:2:3:4:5:6:7:8::", "::1:2:3:4:5:6:7:8", "1::2:3:4:5:6:7:8",
        "12345::", "g::1", "1:2", "1.2.3", "1.2.3.4.5", "256.1.1.1",
        "01.2.3.4", "1.2.3.04", "::ffff:1.2.3.400", "::ffff1.2.3.4",
        "1:2:3:4:5:6:7:1.2.3.4", "fe80::1%eth0", "fe80::1%25eth0",
        "not-an-ip", "1.2.3.4x", "x1.2.3.4", ":1:2:3:4:5:6:7",
        "1:2:3:4:5:6:7:", "..", "1..2.3.4", "0x1.2.3.4", "-1.2.3.4",
        "1:2:3:4:5:6:1.2.3", "::ffff:1.2.3.4.5", "1:2:3:4:5:1.2.3.4",
    ]
    for _ in range(400):  # random valid v6, varied renderings
        v = rng.getrandbits(128)
        a = ipaddress.IPv6Address(v)
        cases += [str(a), a.exploded, str(a).upper()]
    for _ in range(100):  # sparse values exercise '::' compression
        v = rng.getrandbits(16) << (16 * rng.randrange(8))
        cases.append(str(ipaddress.IPv6Address(v)))
    for _ in range(100):
        cases.append(str(ipaddress.IPv4Address(rng.getrandbits(32))))
    for _ in range(100):  # v4-in-v6 renderings
        v4 = ipaddress.IPv4Address(rng.getrandbits(32))
        cases += [f"::ffff:{v4}", f"64:ff9b::{v4}"]
    for _ in range(300):  # mutate valid strings into mostly-invalid ones
        base = list(cases[rng.randrange(len(cases))])
        if not base:
            continue
        op = rng.randrange(3)
        i = rng.randrange(len(base))
        if op == 0:
            base.insert(i, rng.choice(":.:fg0%"))
        elif op == 1:
            del base[i]
        else:
            base[i] = rng.choice(":.:xyz09")
        cases.append("".join(base))
    return cases


def test_ip_hilo_matches_ipaddress_module(spark):
    from parsedmarc_go_spark.functions.enrich import with_ip_hilo

    cases = _corpus()
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, ip string")
    got = {
        r.i: (None if r.h is None else (r.h.hi, r.h.lo))
        for r in with_ip_hilo(df, "ip", "h").collect()
    }
    mismatches = []
    for i, s in enumerate(cases):
        want = expected_hilo(s)
        if got[i] != want:
            mismatches.append((repr(s), "want", want, "got", got[i]))
    assert not mismatches, f"{len(mismatches)} parse mismatches, first 10: {mismatches[:10]}"


def test_geoip_enrich6_bucketed_join(spark):
    from parsedmarc_go_spark.functions.enrich import geoip_enrich6, with_ip_hilo

    def net_bounds(cidr: str):
        n = ipaddress.ip_network(cidr)
        lo, hi = int(n[0]), int(n[-1])
        return (_bias(lo >> 64), _bias(lo & (2**64 - 1)), _bias(hi >> 64), _bias(hi & (2**64 - 1)))

    dim = spark.createDataFrame(
        [
            (*net_bounds("2001:db8::/32"), "US"),
            (*net_bounds("2a02:26f0::/29"), "DE"),
            # an interval crossing /24 hi-bucket boundaries (16 buckets)
            (*net_bounds("fc00::/20"), "PRIVATE"),
        ],
        "start_hi long, start_lo long, end_hi long, end_lo long, country string",
    )
    facts = spark.createDataFrame(
        [
            ("2001:db8::1", "US"),
            ("2001:db8:ffff:ffff:ffff:ffff:ffff:ffff", "US"),
            ("2a02:26f0:1::9", "DE"),
            ("fc00:fff:34::1", "PRIVATE"),  # lands in the 16th (last) bucket
            ("2607:f8b0::1", "Unknown"),  # valid, no interval
            ("not-an-ip", "Unknown"),
            ("2001:db9::1", "Unknown"),  # one past the /32 upper bound
        ],
        "ip string, want string",
    )
    out = geoip_enrich6(facts, dim, ip_col="ip", out_col="country")
    rows = {r.ip: r.country for r in out.collect()}
    for r in facts.collect():
        assert rows[r.ip] == r.want, (r.ip, rows[r.ip], r.want)

    # scale shape: broadcast HASH join on the bucket key, never a
    # nested-loop scan of the dim per fact row
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan, "IPv6 geo join regressed to BNLJ"


# ---------------------------------------------------------------------------
# v6 MMDB fixture: a real binary-trie mmdb (ip_version 6, record size 24)
# built programmatically, so geo_dim6_from_mmdb is driven end-to-end.
# ---------------------------------------------------------------------------


def _s(text: str) -> bytes:  # mmdb utf8 string
    b = text.encode()
    return bytes([(2 << 5) | len(b)]) + b


def _u(value: int, type_id: int = 6) -> bytes:  # uintN, big-endian minimal
    size = max(1, (value.bit_length() + 7) // 8) if value else 0
    return bytes([(type_id << 5) | size]) + value.to_bytes(size, "big")


def _m(pairs: dict[str, bytes]) -> bytes:  # mmdb map
    out = bytes([(7 << 5) | len(pairs)])
    for k, v in pairs.items():
        out += _s(k) + v
    return out


def _country(name: str) -> bytes:
    return _m({"country": _m({"names": _m({"en": _s(name)})})})


def _build_mmdb6(networks: list[tuple[str, int, str]]) -> bytes:
    """Serialize (cidr, plen, country) networks into an ip_version-6
    mmdb: insert each network's bit path into a trie, then emit 24-bit
    node records (child index / node_count for empty / data pointer)."""
    trie: dict = {}
    blobs: list[bytes] = []
    for cidr, plen, country in networks:
        v = int(ipaddress.IPv6Network(f"{cidr}/{plen}").network_address)
        node = trie
        for i in range(plen):
            bit = (v >> (127 - i)) & 1
            if i == plen - 1:
                node[bit] = len(blobs)  # leaf -> blob index
            else:
                node = node.setdefault(bit, {})
        blobs.append(_country(country))
    offsets, data = [], b""
    for b in blobs:
        offsets.append(len(data))
        data += b
    order: dict[int, int] = {}

    def walk(node: dict) -> None:
        order[id(node)] = len(order)
        for side in (0, 1):
            if isinstance(node.get(side), dict):
                walk(node[side])

    walk(trie)
    node_count = len(order)

    def rec(node: dict, side: int) -> int:
        child = node.get(side)
        if isinstance(child, dict):
            return order[id(child)]
        if child is None:
            return node_count  # empty subtree
        return node_count + 16 + offsets[child]  # data leaf

    tree = b""
    ordered_nodes: list[dict] = [None] * node_count

    def collect(node: dict) -> None:
        ordered_nodes[order[id(node)]] = node
        for side in (0, 1):
            if isinstance(node.get(side), dict):
                collect(node[side])

    collect(trie)
    for node in ordered_nodes:
        tree += rec(node, 0).to_bytes(3, "big") + rec(node, 1).to_bytes(3, "big")
    metadata = _m(
        {
            "node_count": _u(node_count),
            "record_size": _u(24, type_id=5),
            "ip_version": _u(6, type_id=5),
        }
    )
    return tree + b"\x00" * 16 + data + b"\xab\xcd\xefMaxMind.com" + metadata


def test_geo_dim6_from_mmdb_end_to_end(spark, tmp_path):
    from parsedmarc_go_spark.functions.enrich import geoip_enrich6
    from parsedmarc_go_spark.functions.enrichdims import MMDBFile, geo_dim6_from_mmdb

    networks = [
        ("2001:db8::", 32, "United States"),
        ("2a02:26f0::", 29, "Germany"),
        ("::a00:0", 104, "TEN-NET"),  # 10.0.0.0/8 under the ::/96 embedding
    ]
    path = str(tmp_path / "six.mmdb")
    with open(path, "wb") as f:
        f.write(_build_mmdb6(networks))
    db = MMDBFile(path)
    assert db.ip_version == 6
    leaves = list(db.iter_all_leaves())
    assert len(leaves) == 3

    dim = geo_dim6_from_mmdb(spark, path)
    by_country = {r.country: r for r in dim.collect()}
    n = ipaddress.IPv6Network("2001:db8::/32")
    assert by_country["United States"].start_hi == _bias(int(n[0]) >> 64)
    assert by_country["United States"].end_hi == _bias(int(n[-1]) >> 64)

    facts = spark.createDataFrame(
        [
            ("2001:db8::2:3", "United States"),
            ("2a02:26f0:ff::1", "Germany"),
            ("10.20.30.40", "TEN-NET"),  # v4 string resolved via the embed
            ("2607:f8b0::1", "Unknown"),
        ],
        "ip string, want string",
    )
    out = geoip_enrich6(facts, dim, ip_col="ip", out_col="country")
    got = {r.ip: r.country for r in out.collect()}
    for r in facts.collect():
        assert got[r.ip] == r.want, (r.ip, got[r.ip], r.want)


def test_enrich_records_routes_dual_stack(spark, tmp_path):
    """The production pipeline path (daemon.py -> enrich_records) must
    resolve BOTH families against one v6 mmdb, like the reference's
    protocol-agnostic geoip2 lookups (utils.go:41-56): v4 rows through
    the 32-bit bucketed join, v6 rows through the 128-bit one."""
    from types import SimpleNamespace

    from parsedmarc_go_spark.functions.enrich import build_enrichment, enrich_records

    networks = [
        ("2001:db8::", 32, "V6-LAND"),
        ("::a00:0", 104, "TEN-NET"),  # 10.0.0.0/8 under ::/96
    ]
    path = str(tmp_path / "dual.mmdb")
    with open(path, "wb") as f:
        f.write(_build_mmdb6(networks))

    cfg = SimpleNamespace(
        ip_db_path=path, reverse_dns_map_path=None, nameservers=[],
        dns_timeout=2, offline=True,
    )
    ctx = build_enrichment(spark, cfg)
    assert ctx.geo_dim is not None and ctx.geo_dim6 is not None

    df = spark.createDataFrame(
        [
            ("10.1.2.3", "TEN-NET", "r1"),
            ("2001:db8::42", "V6-LAND", "r2"),
            ("8.8.8.8", "Unknown", "r3"),
            ("bogus", "Unknown", "r4"),
            (None, "Unknown", "r5"),  # NULL ip must survive the route split
        ],
        "source_ip_address string, want string, report_id string",
    ).withColumn("source_reverse_dns", F.lit(""))
    out = enrich_records(df, ctx)
    rows = {r.report_id: r for r in out.collect()}
    assert len(rows) == 5, "route split dropped or duplicated rows"
    for r in df.collect():
        assert rows[r.report_id].source_country == r.want, (
            r.source_ip_address, rows[r.report_id].source_country, r.want,
        )


def test_hilo_order_matches_address_order(spark):
    """The sign-bias must make signed (hi, lo) sorting equal to unsigned
    address order — the property the interval residual predicate and
    any future range pruning rely on."""
    from parsedmarc_go_spark.functions.enrich import with_ip_hilo

    rng = random.Random(7)
    addrs = sorted(ipaddress.IPv6Address(rng.getrandbits(128)) for _ in range(200))
    df = spark.createDataFrame([(str(a),) for a in addrs], "ip string")
    got = [
        r.ip
        for r in with_ip_hilo(df, "ip", "h")
        .orderBy(F.col("h.hi"), F.col("h.lo"))
        .collect()
    ]
    assert got == [str(a) for a in addrs]
