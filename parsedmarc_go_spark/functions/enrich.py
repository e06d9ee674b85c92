"""Enrichment layer (SURVEY P9-P12, J2/J3): GeoIP country, base-domain
extraction, sender classification.

The reference does per-row network lookups (MaxMind reader + PTR
queries, utils.go:41-113) guarded by an offline flag (config.go:30-37).
At Spark scale the same semantics become joins against dimension
tables:

- GeoIP: a (start_ip_int, end_ip_int, country) prefix dim, broadcast
  non-equi range join — the one non-equi join in the system (SURVEY J3).
- Sender classification: a (base_reverse_dns, name, type) map (the
  reference ships 1,794 rows), broadcast left join with Unknown fill
  (SURVEY J2).
- Reverse DNS itself is inherently a network side-effect; it stays an
  external batch step that lands a (ip, hostname) dim — the engine
  consumes the dim. Offline mode (the default) skips it, exactly like
  the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def base_domain(col: Column) -> Column:
    """P11 — utils.go:116-145: last two labels, with CDN special cases:
    akamaiedge (3 labels keyed on 2nd-to-last label), cloudfront/fastly/
    herokuapp (3 labels). Pure column expression over split()."""
    parts = F.split(col, r"\.")
    n = F.size(parts)

    def p(i: int) -> Column:
        # try_element_at: when() branches are not reliably short-circuited
        # under ANSI mode, so out-of-range element_at would throw
        return F.try_element_at(parts, F.lit(i))

    last2 = F.concat_ws(".", p(-2), p(-1))
    last3 = F.concat_ws(".", p(-3), p(-2), p(-1))
    return (
        F.when(col.isNull() | (col == ""), col)
        .when(n < 2, col)
        .when((n >= 3) & (p(-2) == "akamaiedge"), last3)
        .when((n >= 3) & last2.isin("cloudfront.net", "fastly.com", "herokuapp.com"), last3)
        .otherwise(last2)
    )


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad IPv4 → int64 (NULL for malformed/IPv6), for the GeoIP
    range join."""
    oct_ = F.split(col, r"\.")

    def o(i: int) -> Column:
        # try_element_at: ANSI mode errors on out-of-bounds element_at,
        # and when() does not short-circuit evaluation of the other branch
        return F.try_element_at(oct_, F.lit(i)).try_cast("long")

    value = o(1) * 16777216 + o(2) * 65536 + o(3) * 256 + o(4)
    ok = (
        (F.size(oct_) == 4)
        & o(1).between(0, 255)
        & o(2).between(0, 255)
        & o(3).between(0, 255)
        & o(4).between(0, 255)
    )
    return F.when(ok, value).otherwise(F.lit(None).cast("long"))


# sign-bit flip: maps unsigned 64-bit order onto signed int64 order, so
# (hi, lo) lexicographic comparisons in the IPv6 interval join are
# correct even for addresses with the top bit set
_SIGN = -(1 << 63)


def _bias(c: Column) -> Column:
    return c.bitwiseXOR(F.lit(_SIGN))


# net.ParseIP-strict dotted quad: 0-255 per octet, no leading zeros
# (ipv4_to_long above stays permissive — its semantics are pinned by the
# f4_ip_validity oracle; this stricter form is the ParseIP-parity path)
_V4_OCTET = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
_V4_STRICT_RE = rf"^({_V4_OCTET}\.){{3}}{_V4_OCTET}$"
_HEX_GROUP_RE = "^[0-9A-Fa-f]{1,4}$"


def with_ip_hilo(df: DataFrame, ip_col: str, out_col: str = "__ip_hilo") -> DataFrame:
    """Parse IPv4/IPv6 strings into a sortable 128-bit key: adds
    ``out_col`` as struct<hi: long, lo: long> (sign-biased, so signed
    (hi, lo) lexicographic order == unsigned address order), NULL for
    anything net.ParseIP (utils.go:148-150) would reject. IPv4 maps to
    hi=0 — the ::/96 embedding the MMDB walker's IPv4 subtree uses.

    Grammar parity with Go's ParseIP / Python's ipaddress (pinned by
    tests/test_ipv6.py against the ipaddress module): '::' at most once
    and expanding >=1 group, 1-4 hex digits per group, optional dotted
    quad occupying the final two groups, strict 0-255 no-leading-zero
    octets, no zone suffixes.

    Built as a chain of narrow projections (not one giant Column): the
    split/regexp intermediates are non-cheap, so CollapseProject keeps
    them as stages and whole-stage codegen evaluates each ONCE per row
    instead of once per reference. All JVM-side — no UDF."""
    # regexp strip, not F.trim: trim removes only ' ' while the
    # whitespace-tolerance contract (and the test oracle's .strip())
    # covers tabs/newlines too
    s = F.regexp_replace(F.col(ip_col), r"^\s+|\s+$", "")
    v4 = F.when(s.rlike(_V4_STRICT_RE), ipv4_to_long(s))
    # a trailing dotted quad ("::ffff:1.2.3.4") is rewritten into its
    # two hex groups; a malformed splice ("::ffff1.2.3.4") simply yields
    # a >4-hex-digit group that fails validation below — no special case
    tail = F.regexp_extract(s, r"((?:[0-9]{1,3}\.){3}[0-9]{1,3})$", 1)
    prefix = s.substr(F.lit(1), F.length(s) - F.length(F.col("__t")))
    hexed = F.when(
        (F.col("__t") != "") & F.col("__t").rlike(_V4_STRICT_RE),
        F.concat(
            prefix,
            F.hex(F.shiftright(ipv4_to_long(F.col("__t")), 16)),
            F.lit(":"),
            F.hex(ipv4_to_long(F.col("__t")).bitwiseAND(F.lit(65535))),
        ),
    ).otherwise(s)

    parts = F.split(F.col("__hexed"), "::", -1)
    grp = lambda side: F.when(side == "", F.array().cast("array<string>")).otherwise(  # noqa: E731
        F.split(side, ":")
    )
    out = (
        df.withColumn("__t", tail)
        .withColumn("__hexed", hexed)
        .withColumn("__parts", parts)
        .withColumn("__lg", grp(F.element_at(F.col("__parts"), 1)))
        .withColumn(
            "__rg",
            F.when(F.size(F.col("__parts")) == 2, grp(F.element_at(F.col("__parts"), 2)))
            .when(F.size(F.col("__parts")) == 1, F.array().cast("array<string>")),
        )
        .withColumn(
            "__g8",
            F.concat(
                F.col("__lg"),
                F.when(
                    F.size(F.col("__parts")) == 2,
                    # greatest(0, …): ANSI mode + when()'s non-short-circuit
                    # evaluation means a negative repeat count would error
                    # for over-long invalid inputs before ok6 rejects them
                    F.array_repeat(
                        F.lit("0"),
                        F.greatest(
                            F.lit(0), 8 - F.size(F.col("__lg")) - F.size(F.col("__rg"))
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
                F.col("__rg"),
            ),
        )
    )
    n_named = F.size(F.col("__lg")) + F.size(F.col("__rg"))
    ok6 = (
        F.col(ip_col).contains(":")
        & F.regexp_replace(F.col(ip_col), r"^\s+|\s+$", "").rlike("^[0-9A-Fa-f:.]+$")
        # '.' must have been consumed by the dotted-quad rewrite
        & ~F.col("__hexed").contains(".")
        & (F.size(F.col("__parts")) <= 2)
        # no '::' -> exactly 8 groups; with '::' -> at most 7 named
        & F.when(F.size(F.col("__parts")) == 2, n_named <= 7).otherwise(n_named == 8)
        & F.forall(F.col("__g8"), lambda g: g.rlike(_HEX_GROUP_RE))
    )

    def word(i: int) -> Column:
        # try_element_at + a '0' fallback for non-hex garbage: both run
        # on EVERY row (when() evaluates all branches), so out-of-bounds
        # access or conv() on junk would throw under ANSI mode even for
        # rows ok6 already rejected
        g = F.try_element_at(F.col("__g8"), F.lit(i + 1))
        return F.conv(F.when(g.rlike(_HEX_GROUP_RE), g).otherwise("0"), 16, 10).cast("long")

    def pack(a: int) -> Column:  # groups a..a+3 -> one 64-bit half
        return (
            F.shiftleft(word(a), 48)
            .bitwiseOR(F.shiftleft(word(a + 1), 32))
            .bitwiseOR(F.shiftleft(word(a + 2), 16))
            .bitwiseOR(word(a + 3))
        )

    hilo = (
        F.when(v4.isNotNull(), F.struct(_bias(F.lit(0)).alias("hi"), _bias(v4).alias("lo")))
        .when(ok6, F.struct(_bias(pack(0)).alias("hi"), _bias(pack(4)).alias("lo")))
        .otherwise(F.lit(None).cast("struct<hi:long,lo:long>"))
    )
    return out.withColumn(out_col, hilo).drop("__t", "__hexed", "__parts", "__lg", "__rg", "__g8")


def geoip_enrich6(
    df: DataFrame,
    geo_dim6: DataFrame,
    ip_col: str = "source_ip_address",
    out_col: str = "source_country",
    bucket_bits: int = 24,
    extra_cols: dict[str, str] | None = None,
) -> DataFrame:
    """IPv6 counterpart of geoip_enrich: interval lookup against a
    (start_hi, start_lo, end_hi, end_lo, country, …) dim of sign-biased
    64-bit halves, as a bucketed broadcast HASH join.

    Scale shape mirrors the IPv4 path: each dim interval explodes to
    the ``bucket_bits``-bit top-of-hi buckets it spans, the join is a
    broadcast equi-join on the fact's bucket with the 128-bit range
    check as a residual predicate. With /24 buckets a coarse RIR /12
    allocation explodes to 4K rows while typical /32-/64 GeoIP leaves
    stay at one row each, so the exploded dim stays broadcastable.
    Route ONLY ':'-containing addresses here: IPv4-embedded rows all
    share hi=0, which would funnel the whole v4 dim into one bucket —
    v4 facts belong to geoip_enrich's 32-bit bucketing (see the routed
    union in plans/enrichops.j3c_geoip6_range_join)."""
    shift = 64 - bucket_bits
    extra_cols = extra_cols or {}
    fact = with_ip_hilo(df, ip_col, "__hilo").withColumn(
        "__bkt", F.shiftright(F.col("__hilo.hi"), shift)
    )
    dim = F.broadcast(
        geo_dim6.select(
            F.col("start_hi").alias("__shi"),
            F.col("start_lo").alias("__slo"),
            F.col("end_hi").alias("__ehi"),
            F.col("end_lo").alias("__elo"),
            F.col("country").alias("__geo_country"),
            *[F.col(src).alias(f"__geo_x_{src}") for src in extra_cols],
        ).withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.shiftright(F.col("__shi"), shift), F.shiftright(F.col("__ehi"), shift)
                )
            ),
        )
    )
    hi, lo = F.col("__hilo.hi"), F.col("__hilo.lo")
    ge_start = (hi > F.col("__shi")) | ((hi == F.col("__shi")) & (lo >= F.col("__slo")))
    le_end = (hi < F.col("__ehi")) | ((hi == F.col("__ehi")) & (lo <= F.col("__elo")))
    joined = fact.join(dim, (fact["__bkt"] == dim["__bkt"]) & ge_start & le_end, "left")
    out = joined.withColumn(out_col, F.coalesce(F.col("__geo_country"), F.lit("Unknown")))
    for src, dst in extra_cols.items():
        out = out.withColumn(dst, F.coalesce(F.col(f"__geo_x_{src}"), F.lit("")))
    return out.drop(
        "__hilo",
        "__bkt",
        "__shi",
        "__slo",
        "__ehi",
        "__elo",
        "__geo_country",
        *[f"__geo_x_{src}" for src in extra_cols],
    )


def geoip_enrich(
    df: DataFrame,
    geo_dim: DataFrame,
    ip_col: str = "source_ip_address",
    out_col: str = "source_country",
    bucket_bits: int = 16,
    extra_cols: dict[str, str] | None = None,
) -> DataFrame:
    """P9/J3 — prefix-interval lookup as a bucketed broadcast HASH join
    (never a nested-loop join). `geo_dim`: (start_ip, end_ip, country)
    as int64 bounds. Unmatched / malformed IPs get 'Unknown'
    (parser.go:1274-1277).

    Scale shape: a naive broadcast range join is a
    BroadcastNestedLoopJoin — O(|fact| × |dim|), a scale-killer against
    the real GeoLite2 dim (~3M intervals). Instead each interval is
    exploded to the /16 buckets it spans and the join becomes a
    broadcast EQUI-join on `ip >> 16` with the range check as a residual
    join predicate. Because real GeoIP intervals are disjoint, the
    exploded dim is bounded by |intervals| + 2^bucket_bits rows total
    (each bucket boundary adds at most one extra row per interval
    crossing it) — ~3M + 65k rows, still broadcastable, and each fact
    row probes a hash table instead of scanning the dim.

    `extra_cols` maps further dim columns to output names (e.g.
    {"city": "source_city", "isp": "source_isp"} against a dim built by
    enrichdims.geo_dim_from_mmdb — the city/ISP fields the reference
    reads at utils.go:58-68); misses fill ''."""
    shift = 32 - bucket_bits
    extra_cols = extra_cols or {}
    fact = df.withColumn("__ip_long", ipv4_to_long(F.col(ip_col))).withColumn(
        "__ip_bkt", F.shiftright(F.col("__ip_long"), shift)
    )
    # internal names so out_col may legally collide with a dim column
    dim = F.broadcast(
        geo_dim.select(
            F.col("start_ip").alias("__geo_lo"),
            F.col("end_ip").alias("__geo_hi"),
            F.col("country").alias("__geo_country"),
            *[F.col(src).alias(f"__geo_x_{src}") for src in extra_cols],
        ).withColumn(
            "__ip_bkt",
            F.explode(
                F.sequence(
                    F.shiftright(F.col("__geo_lo"), shift),
                    F.shiftright(F.col("__geo_hi"), shift),
                )
            ),
        )
    )
    joined = fact.join(
        dim,
        (fact["__ip_bkt"] == dim["__ip_bkt"])
        & (F.col("__ip_long") >= dim["__geo_lo"])
        & (F.col("__ip_long") <= dim["__geo_hi"]),
        "left",
    )
    out = joined.withColumn(out_col, F.coalesce(F.col("__geo_country"), F.lit("Unknown")))
    for src, dst in extra_cols.items():
        out = out.withColumn(dst, F.coalesce(F.col(f"__geo_x_{src}"), F.lit("")))
    return out.drop(
        "__ip_long",
        "__ip_bkt",
        "__geo_lo",
        "__geo_hi",
        "__geo_country",
        *[f"__geo_x_{src}" for src in extra_cols],
    )


def apply_reverse_dns(
    df: DataFrame,
    rdns_dim: DataFrame,
    ip_col: str = "source_ip_address",
    out_col: str = "source_reverse_dns",
) -> DataFrame:
    """P10 consumption side: attach PTR hostnames from a previously
    landed (ip, hostname) dim (built by enrichdims.resolve_ptr_batch
    when online; empty when offline — rows then keep '' exactly like
    parser.go:1289-1296's offline default). Broadcast left join; the
    dim is distinct-by-ip."""
    dim = F.broadcast(
        rdns_dim.select(F.col("ip").alias("__rdns_ip"), F.col("hostname").alias("__rdns_host"))
    )
    joined = df.join(dim, df[ip_col] == dim["__rdns_ip"], "left")
    return joined.withColumn(out_col, F.coalesce(F.col("__rdns_host"), F.lit(""))).drop(
        "__rdns_ip", "__rdns_host"
    )


def classify_sender(
    df: DataFrame,
    dns_map: DataFrame,
    reverse_dns_col: str = "source_reverse_dns",
) -> DataFrame:
    """P12/J2 — sender classification via the reverse-DNS map dim
    (base_reverse_dns, name, type), broadcast left join keyed on the
    base domain of the PTR hostname; misses → 'Unknown'
    (SURVEY J2; fields stored at clickhouse.go:116-117)."""
    fact = df.withColumn("source_base_domain", base_domain(F.lower(F.col(reverse_dns_col))))
    dim = F.broadcast(
        dns_map.select(
            F.lower(F.col("base_reverse_dns")).alias("__brd"),
            F.col("name").alias("__name"),
            F.col("type").alias("__type"),
        )
    )
    joined = fact.join(dim, fact["source_base_domain"] == dim["__brd"], "left")
    return (
        joined.withColumn("source_name", F.coalesce(F.col("__name"), F.lit("Unknown")))
        .withColumn("source_type", F.coalesce(F.col("__type"), F.lit("Unknown")))
        .drop("__brd", "__name", "__type")
    )


@dataclass
class EnrichmentContext:
    """The dims + flags one daemon/CLI run enriches with, built once
    from config.parser (config.go:24-37 ParserConfig) and applied to
    every batch. All dims are small broadcastable DataFrames."""

    geo_dim: DataFrame | None = None
    geo_dim6: DataFrame | None = None  # 128-bit dim when the mmdb is a v6 tree
    dns_map: DataFrame | None = None
    nameservers: list[str] = field(default_factory=list)
    dns_timeout: float = 2.0
    offline: bool = True


def build_enrichment(spark: SparkSession, parser_cfg) -> EnrichmentContext | None:
    """config.parser → EnrichmentContext (parser.go:1272-1299 wiring:
    GeoIP when ip_db_path is set, the sender map always — vendored
    default or reverse_dns_map_path — live PTR only when not offline).
    Returns None when enrichment is fully disabled."""
    from parsedmarc_go_spark.functions.enrichdims import (
        MMDBFile,
        geo_dim6_from_mmdb,
        geo_dim_from_mmdb,
        load_dns_map,
    )

    geo = geo6 = None
    if parser_cfg.ip_db_path:
        geo = geo_dim_from_mmdb(spark, parser_cfg.ip_db_path)
        # v6 tree: also extract the 128-bit dim so IPv6 sources resolve
        # (the reference's geoip2 Reader is protocol-agnostic,
        # utils.go:41-56). Second driver walk of the same file — one-time
        # build cost, same streamed-batch memory bound.
        if MMDBFile(parser_cfg.ip_db_path).ip_version == 6:
            geo6 = geo_dim6_from_mmdb(spark, parser_cfg.ip_db_path)
    dns_map = load_dns_map(spark, parser_cfg.reverse_dns_map_path or None)
    return EnrichmentContext(
        geo_dim=geo,
        geo_dim6=geo6,
        dns_map=dns_map,
        nameservers=list(parser_cfg.nameservers or []),
        dns_timeout=float(parser_cfg.dns_timeout or 2),
        offline=bool(parser_cfg.offline),
    )


def enrich_records(
    df: DataFrame, ctx: EnrichmentContext, ip_col: str = "source_ip_address"
) -> DataFrame:
    """Apply the configured enrichments to a flat table that carries the
    source_* columns (aggregate records / forensic reports). Column
    order is preserved — every enrichment replaces an existing offline
    default in place (parser.go:1274-1296)."""
    out = df
    if ctx.geo_dim is not None and ctx.geo_dim6 is not None:
        # dual-stack route: each family through its own bucketed join —
        # a unified 128-bit join would funnel every v4 row into the
        # single hi=0 bucket and degrade to a linear dim scan per row
        is6 = F.coalesce(F.col(ip_col).contains(":"), F.lit(False))
        out = geoip_enrich(out.filter(~is6), ctx.geo_dim, ip_col=ip_col).unionByName(
            geoip_enrich6(out.filter(is6), ctx.geo_dim6, ip_col=ip_col)
        )
    elif ctx.geo_dim is not None:
        out = geoip_enrich(out, ctx.geo_dim, ip_col=ip_col)
    if not ctx.offline and ctx.nameservers:
        from parsedmarc_go_spark.functions.enrichdims import resolve_ptr_batch

        rdns = resolve_ptr_batch(
            out.select(F.col(ip_col).alias("ip")),
            ctx.nameservers,
            timeout=ctx.dns_timeout,
            offline=False,
        )
        out = apply_reverse_dns(out, rdns, ip_col=ip_col)
    if ctx.dns_map is not None:
        out = classify_sender(out, ctx.dns_map)
    return out
