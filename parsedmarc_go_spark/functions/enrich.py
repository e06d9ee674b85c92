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
    dns_map: DataFrame | None = None
    nameservers: list[str] = field(default_factory=list)
    dns_timeout: float = 2.0
    offline: bool = True


def build_enrichment(spark: SparkSession, parser_cfg) -> EnrichmentContext | None:
    """config.parser → EnrichmentContext (parser.go:1272-1299 wiring:
    GeoIP when ip_db_path is set, the sender map always — vendored
    default or reverse_dns_map_path — live PTR only when not offline).
    Returns None when enrichment is fully disabled."""
    from parsedmarc_go_spark.functions.enrichdims import geo_dim_from_mmdb, load_dns_map

    geo = None
    if parser_cfg.ip_db_path:
        geo = geo_dim_from_mmdb(spark, parser_cfg.ip_db_path)
    dns_map = load_dns_map(spark, parser_cfg.reverse_dns_map_path or None)
    return EnrichmentContext(
        geo_dim=geo,
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
    if ctx.geo_dim is not None:
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
