"""Output sinks K1-K3 + K5 (SURVEY §2.2) with the reference's exact
projections:

- K1 JSON: newline-delimited JSON (the reference pretty-prints and
  concatenates, output.go:129-245; content is identical, framing is
  NDJSON — the Spark-native form).
- K2 CSV: the fixed 24-col aggregate / 16-col forensic / 12-col
  smtp_tls projections (output.go:265-271, 341-346, 406-410), one row
  per record / per failure detail, header row first.
- K3 directory mode: file-per-report naming
  `{type}_{yyyymmdd_HHMMSS}_{id}.{ext}` (output.go:866-904). This is an
  inherently small-output operational sink (per-report files for
  humans); it materializes via toLocalIterator, documented as such.
- K5 Kafka: message-shape projection (key/value/headers columns) ready
  for `.write.format("kafka")`; the connector jar is environment-
  provided, so the projection is the tested surface.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RFC3339 = "yyyy-MM-dd'T'HH:mm:ss'Z'"  # session TZ is UTC


def _rfc3339(col: str) -> Column:
    return F.date_format(col, _RFC3339)


def _first(col: str) -> Column:
    """P8 — element 0 of a string array, '' when empty (output.go:497-516)."""
    return F.coalesce(F.try_element_at(F.col(col), F.lit(1)), F.lit(""))


def aggregate_csv_projection(reports: DataFrame, records: DataFrame) -> DataFrame:
    """K2 aggregate: 24 columns, one row per record, parent fields
    repeated (output.go:265-310). Parent side broadcast — it is always
    orders of magnitude smaller than the fact side."""
    # one parent row per report_id: the reference writes CSV per report
    # object (no join), so a report_id ingested twice must not fan out
    # the fact rows — each record row joins exactly one parent
    rep = reports.dropDuplicates(["report_id"]).select(
        F.col("report_id").alias("__rid"),
        F.col("org_email"),
        _rfc3339("begin_date").alias("begin_date"),
        _rfc3339("end_date").alias("end_date"),
        "domain",
        F.col("adkim").alias("policy_adkim"),
        F.col("aspf").alias("policy_aspf"),
        F.col("p").alias("policy_p"),
        F.col("sp").alias("policy_sp"),
        F.col("pct").alias("policy_pct"),
    )
    fact = records.drop("begin_date", "created_at")  # parent supplies the dates
    return (
        fact.join(F.broadcast(rep), fact["report_id"] == rep["__rid"], "inner")
        .select(
            "report_id",
            "org_name",
            "org_email",
            "begin_date",
            "end_date",
            "domain",
            "policy_adkim",
            "policy_aspf",
            "policy_p",
            "policy_sp",
            "policy_pct",
            F.col("source_ip_address").alias("source_ip"),
            "source_country",
            "source_reverse_dns",
            F.col("count").cast("string").alias("count"),
            "disposition",
            F.col("policy_eval_dkim").alias("dkim_result"),
            F.col("policy_eval_spf").alias("spf_result"),
            F.when(F.col("dmarc_aligned"), "true").otherwise("false").alias("dmarc_aligned"),
            "header_from",
            F.coalesce(F.col("envelope_from"), F.lit("")).alias("envelope_from"),
            _first("dkim_domains").alias("dkim_domain"),
            _first("dkim_selectors").alias("dkim_selector"),
            _first("spf_domains").alias("spf_domain"),
        )
    )


def forensic_csv_projection(forensic: DataFrame) -> DataFrame:
    """K2 forensic: 16 columns (output.go:341-371); auth_failure joined
    with ';'."""
    return forensic.select(
        "feedback_type",
        F.coalesce(F.col("user_agent"), F.lit("")).alias("user_agent"),
        F.coalesce(F.col("version"), F.lit("")).alias("version"),
        F.coalesce(F.col("original_envelope_id"), F.lit("")).alias("original_envelope_id"),
        F.coalesce(F.col("original_mail_from"), F.lit("")).alias("original_mail_from"),
        F.coalesce(F.col("original_rcpt_to"), F.lit("")).alias("original_rcpt_to"),
        _rfc3339("arrival_date").alias("arrival_date"),
        "subject",
        "message_id",
        "authentication_results",
        F.coalesce(F.col("dkim_domain"), F.lit("")).alias("dkim_domain"),
        F.col("source_ip_address").alias("source_ip"),
        "source_country",
        "delivery_result",
        F.array_join("auth_failure", ";").alias("auth_failure"),
        "reported_domain",
    )


def smtp_tls_csv_projection(tls_reports: DataFrame, tls_failures: DataFrame) -> DataFrame:
    """K2 smtp_tls: 12 columns; one row per failure detail, or a single
    row with empty failure columns when a policy has none
    (output.go:399-456)."""
    base = tls_reports.select(
        "organization_name",
        _rfc3339("begin_date").alias("begin_date"),
        _rfc3339("end_date").alias("end_date"),
        "contact_info",
        "report_id",
        "policy_domain",
        "policy_type",
        F.col("successful_session_count").cast("string").alias("successful_session_count"),
        F.col("failed_session_count").cast("string").alias("failed_session_count"),
    )
    fails = tls_failures.select(
        F.col("report_id").alias("__rid"),
        F.col("policy_domain").alias("__pd"),
        F.col("result_type").alias("failure_result_type"),
        F.coalesce(F.col("sending_mta_ip"), F.lit("")).alias("failure_sending_mta_ip"),
        F.coalesce(F.col("receiving_ip"), F.lit("")).alias("failure_receiving_ip"),
    )
    joined = base.join(
        fails,
        (base["report_id"] == fails["__rid"]) & (base["policy_domain"] == fails["__pd"]),
        "left",
    )
    return joined.select(
        "organization_name",
        "begin_date",
        "end_date",
        "contact_info",
        "report_id",
        "policy_domain",
        "policy_type",
        "successful_session_count",
        "failed_session_count",
        F.coalesce(F.col("failure_result_type"), F.lit("")).alias("failure_result_type"),
        F.coalesce(F.col("failure_sending_mta_ip"), F.lit("")).alias("failure_sending_mta_ip"),
        F.coalesce(F.col("failure_receiving_ip"), F.lit("")).alias("failure_receiving_ip"),
    )


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """K2 sink. single_file=True coalesces to one part (header-once
    semantics like the reference's appending writer) — for the
    small operational outputs; partitioned otherwise."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    """K1 sink: newline-delimited JSON."""
    df.write.mode("overwrite").json(path)


def write_directory(
    reports: DataFrame, out_dir: str, kind: str, fmt: str = "json"
) -> list[str]:
    """K3 — one file per report named
    `{kind}_{yyyymmdd_HHMMSS}_{id}.{fmt}` (output.go:866-904); forensic
    id = hex(sha256(message_id))[:16].

    Files are written EXECUTOR-side via mapPartitions (round-4 verdict
    task 3): no report row ever serializes through the driver — the
    driver receives only the written file NAMES, from the same single
    job that wrote them (a second names-only job would disagree with
    the write job under non-deterministic plans like limit/sample).
    `out_dir` must therefore be visible to executors — a shared
    filesystem on a real cluster (the reference writes one node's
    local dir, output.go:518; local mode is equivalent)."""
    os.makedirs(out_dir, exist_ok=True)
    ts_col = {"aggregate": "begin_date", "forensic": "arrival_date", "smtp_tls": "begin_date"}[kind]
    if kind == "forensic":
        id_col = F.substring(F.sha2(F.col("message_id").cast("binary"), 256), 1, 16)
    elif kind == "smtp_tls":
        id_col = F.col("report_id")
    else:
        id_col = F.col("report_id")
    named = reports.withColumn(
        "__fname",
        F.concat_ws(
            "_", F.lit(kind), F.date_format(ts_col, "yyyyMMdd_HHmmss"), id_col
        ),
    )

    def _write_partition(rows):
        import json as _json
        import os as _os

        _os.makedirs(out_dir, exist_ok=True)
        for row in rows:
            d = row.asDict(recursive=True)
            fname = d.pop("__fname") + f".{fmt}"
            with open(_os.path.join(out_dir, fname), "w", encoding="utf-8") as f:
                _json.dump(d, f, indent=2, default=str)
            yield fname

    return [
        os.path.join(out_dir, fname)
        for fname in named.rdd.mapPartitions(_write_partition).collect()
    ]


def kafka_messages(df: DataFrame, kind: str) -> DataFrame:
    """K5 — kafka message projection (kafka.go:33-131): value = JSON of
    the full report; key = report_id (aggregate/smtp_tls) or
    `{message_id}-{unix_ts}` (forensic, kafka.go:48-49); headers carry
    the report type. Feed to `.write.format('kafka')`."""
    if kind == "forensic":
        key = F.concat_ws("-", F.col("message_id"), F.unix_timestamp("arrival_date").cast("string"))
    else:
        key = F.col("report_id")
    return df.select(
        key.alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
        F.array(
            F.struct(F.lit("report_type").alias("key"), F.lit(kind).cast("binary").alias("value"))
        ).alias("headers"),
    )
