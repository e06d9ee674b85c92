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


# --- K1 pretty-print parity (round 11, VERDICT r10 task 4) ----------------
#
# The reference's file/stdout JSON writer emits each report as
# json.MarshalIndent(report, "", "  ") + "\n" (output.go:139/173/207) of
# the NESTED parser struct, not the flat relational projection. Byte
# parity therefore needs three things NDJSON doesn't give: (1) the Go
# struct-tag field ORDER (Go marshals in declaration order,
# parser/types.go:17-170), (2) Go's encoder conventions — RFC3339
# timestamps, nil slices/pointers as null, omitempty fields dropped,
# HTML-unsafe runes escaped (\u003c \u003e \u0026), RawMessage
# re-indented — and (3) re-nesting the flat frames back into the
# report_metadata / policy_published / records tree.
#
# This is the reference's operational per-report output (a human/file
# sink, inherently small); assembly is driver-side via toLocalIterator
# like write_directory, documented as such. The warehouse-scale path
# stays write_json's distributed NDJSON.

_GO_TIME = "%Y-%m-%dT%H:%M:%SZ"


def _go_json(obj) -> str:
    """json.MarshalIndent(obj, "", "  ") parity for the value types the
    report structs contain (strings/ints/bools/null/dict/list)."""
    s = json.dumps(obj, indent=2, ensure_ascii=False)
    # Go's encoder HTML-escapes inside strings; these replacements are
    # safe on the serialized form because <,>,& are never JSON syntax
    return (
        s.replace("&", "\\u0026").replace("<", "\\u003c").replace(">", "\\u003e")
        .replace("\u2028", "\\u2028").replace("\u2029", "\\u2029")
    )


def _go_time(dt) -> str | None:
    return None if dt is None else dt.strftime(_GO_TIME)


def _nil_if_empty(lst):
    """Go's appended-to slices are nil (-> null) when nothing appended."""
    return list(lst) if lst else None


def _nest_aggregate(report: dict, recs: list[dict]) -> dict:
    """AggregateReport tree in parser/types.go:17-112 declaration order."""
    out_records = []
    for r in recs:
        reasons = None
        if r["policy_override_reasons"] or r["policy_override_comments"]:
            types = r["policy_override_reasons"] or []
            comments = r["policy_override_comments"] or []
            width = max(len(types), len(comments))
            reasons = [
                {
                    "type": types[i] if i < len(types) and types[i] != "" else None,
                    "comment": comments[i] if i < len(comments) and comments[i] != "" else None,
                }
                for i in range(width)
            ]
        dkim = _nil_if_empty([
            {"domain": d, "selector": s, "result": res}
            for d, s, res in zip(
                r["dkim_domains"] or [], r["dkim_selectors"] or [], r["dkim_results"] or []
            )
        ])
        spf = _nil_if_empty([
            {"domain": d, "scope": sc, "result": res}
            for d, sc, res in zip(
                r["spf_domains"] or [], r["spf_scopes"] or [], r["spf_results"] or []
            )
        ])
        out_records.append({
            "source": {
                "ip_address": r["source_ip_address"],
                "country": r["source_country"],
                "reverse_dns": r["source_reverse_dns"],
                "base_domain": r["source_base_domain"],
                "name": r["source_name"],
                "type": r["source_type"],
            },
            "count": r["count"],
            "alignment": {
                "spf": r["spf_aligned"],
                "dkim": r["dkim_aligned"],
                "dmarc": r["dmarc_aligned"],
            },
            "policy_evaluated": {
                "disposition": r["disposition"],
                "dkim": r["policy_eval_dkim"],
                "spf": r["policy_eval_spf"],
                "policy_override_reasons": reasons,
            },
            "identifiers": {
                "header_from": r["header_from"],
                "envelope_from": r["envelope_from"],
                "envelope_to": r["envelope_to"],
            },
            "auth_results": {"dkim": dkim, "spf": spf},
        })
    return {
        "xml_schema": report["xml_schema"],
        "report_metadata": {
            "org_name": report["org_name"],
            "org_email": report["org_email"],
            "org_extra_contact_info": report["org_extra_contact_info"],
            "report_id": report["report_id"],
            "begin_date": _go_time(report["begin_date"]),
            "end_date": _go_time(report["end_date"]),
            "errors": _nil_if_empty(report["errors"]),
        },
        "policy_published": {
            "domain": report["domain"],
            "adkim": report["adkim"],
            "aspf": report["aspf"],
            "p": report["p"],
            "sp": report["sp"],
            "pct": report["pct"],
            "fo": report["fo"],
        },
        "records": out_records,
    }


def _nest_forensic(r: dict) -> dict:
    """ForensicReport in types.go:115-136 order; parsed_sample is Go
    json.RawMessage — MarshalIndent re-indents it, so embed the parsed
    object rather than the string."""
    try:
        parsed = json.loads(r["parsed_sample"]) if r["parsed_sample"] else None
    except (ValueError, TypeError):
        parsed = None
    return {
        "feedback_type": r["feedback_type"],
        "user_agent": r["user_agent"],
        "version": r["version"],
        "original_envelope_id": r["original_envelope_id"],
        "original_mail_from": r["original_mail_from"],
        "original_rcpt_to": r["original_rcpt_to"],
        "arrival_date": _go_time(r["arrival_date"]),
        "arrival_date_utc": _go_time(r["arrival_date_utc"]),
        "subject": r["subject"],
        "message_id": r["message_id"],
        "authentication_results": r["authentication_results"],
        "dkim_domain": r["dkim_domain"],
        "source": {
            "ip_address": r["source_ip_address"],
            "country": r["source_country"],
            "reverse_dns": r["source_reverse_dns"],
            "base_domain": r["source_base_domain"],
            "name": r["source_name"],
            "type": r["source_type"],
        },
        "delivery_result": r["delivery_result"],
        "auth_failure": _nil_if_empty(r["auth_failure"]),
        "reported_domain": r["reported_domain"],
        "authentication_mechanisms": _nil_if_empty(r["authentication_mechanisms"]),
        "sample_headers_only": r["sample_headers_only"],
        "sample": r["sample"],
        "parsed_sample": parsed,
    }


def _nest_smtp_tls(policies: list[dict], failures: list[dict]) -> dict:
    """SMTPTLSReport in types.go:139-170 order; the flat frames carry
    one row per policy / per failure detail — re-group them. omitempty
    fields (policy_strings, mx_host_patterns, failure_details, and the
    pointer fields of each failure) are DROPPED when empty/null,
    matching the struct tags."""
    head = policies[0]
    out_policies = []
    for p in policies:
        pol = {"policy_domain": p["policy_domain"], "policy_type": p["policy_type"]}
        if p["policy_strings"]:
            pol["policy_strings"] = list(p["policy_strings"])
        if p["mx_host_patterns"]:
            pol["mx_host_patterns"] = list(p["mx_host_patterns"])
        pol["successful_session_count"] = p["successful_session_count"]
        pol["failed_session_count"] = p["failed_session_count"]
        details = []
        for f in failures:
            if f["policy_domain"] != p["policy_domain"]:
                continue
            d = {
                "result_type": f["result_type"],
                "failed_session_count": f["failed_session_count"],
            }
            for k, col in (
                ("sending_mta_ip", "sending_mta_ip"),
                ("receiving_ip", "receiving_ip"),
                ("receiving_mx_hostname", "receiving_mx_hostname"),
                ("receiving_mx_helo", "receiving_mx_helo"),
                ("additional_info_uri", "additional_info_uri"),
                ("failure_reason_code", "failure_reason_code"),
            ):
                if f[col]:
                    d[k] = f[col]
            details.append(d)
        if details:
            pol["failure_details"] = details
        out_policies.append(pol)
    return {
        "organization_name": head["organization_name"],
        "begin_date": _go_time(head["begin_date"]),
        "end_date": _go_time(head["end_date"]),
        "contact_info": head["contact_info"],
        "report_id": head["report_id"],
        "policies": out_policies,
    }


def pretty_json_reports(
    kind: str,
    reports: DataFrame,
    records: DataFrame | None = None,
) -> list[str]:
    """One MarshalIndent-parity JSON document per report, in the
    reference's per-report framing (each ends WITHOUT the trailing
    newline; the writer joins with '\\n' and appends one, matching the
    Write(data); Write("\\n") sequence).

    REPORT order is made deterministic by a driver-side stable sort
    on the reports' natural keys — toLocalIterator on an unsorted
    frame yields partition order, which silently reorders whenever
    the upstream plan changes (split count, AQE). The reference emits
    reports in directory-walk order, which a distributed scan can't
    reproduce; the stable contract here is natural-key order, pinned
    by the golden byte-diff tests. WITHIN a report, element order is
    the source document's array order: one parent row's exploded
    children stay consecutive and ordered under any narrow plan, and
    the stable sort never reorders ties — a Spark-side orderBy over
    data columns would scramble exactly that source order. The
    intra-report guarantee is therefore SCOPED to ingest-shaped
    inputs: the flat frames carry no element-position column, so a
    reports frame that has been re-shuffled (repartition, a wide
    join) before reaching this writer can interleave one report's
    policy/record rows and their rendered order is then
    arrival-order. Pass ingest()'s frames (or any narrow derivation
    of them) directly."""
    if kind == "aggregate":
        # records key on the FULL natural key the report sort
        # disambiguates by — (org_name, report_id, begin_date) — so
        # two reports sharing org/report_id with different date
        # ranges each get only their own records instead of silently
        # rendering the merged set (ADVICE r12)
        recs_by_key: dict[tuple, list[dict]] = {}
        for row in (records.toLocalIterator() if records is not None else []):
            d = row.asDict(recursive=True)
            recs_by_key.setdefault(
                (d["org_name"], d["report_id"], d["begin_date"]), []
            ).append(d)
        reps = [r.asDict(recursive=True) for r in reports.toLocalIterator()]
        reps.sort(
            key=lambda d: (
                d["org_name"] or "",
                d["report_id"] or "",
                str(d["begin_date"] or ""),
            )
        )
        return [
            _go_json(
                _nest_aggregate(
                    d,
                    recs_by_key.get(
                        (d["org_name"], d["report_id"], d["begin_date"]), []
                    ),
                )
            )
            for d in reps
        ]
    if kind == "forensic":
        reps = [r.asDict(recursive=True) for r in reports.toLocalIterator()]
        reps.sort(
            key=lambda d: (
                str(d["arrival_date_utc"] or ""),
                d["message_id"] or "",
                d["subject"] or "",
                d["sample"] or "",
            )
        )
        return [_go_json(_nest_forensic(d)) for d in reps]
    if kind == "smtp_tls":
        fails_by_rid: dict[str, list[dict]] = {}
        for row in (records.toLocalIterator() if records is not None else []):
            d = row.asDict(recursive=True)
            fails_by_rid.setdefault(d["report_id"], []).append(d)
        pols_by_rid: dict[str, list[dict]] = {}
        order: list[str] = []
        for row in reports.toLocalIterator():
            d = row.asDict(recursive=True)
            if d["report_id"] not in pols_by_rid:
                order.append(d["report_id"])
            pols_by_rid.setdefault(d["report_id"], []).append(d)
        order.sort(
            key=lambda rid: (
                pols_by_rid[rid][0]["organization_name"] or "",
                rid or "",
            )
        )
        return [
            _go_json(_nest_smtp_tls(pols_by_rid[rid], fails_by_rid.get(rid, [])))
            for rid in order
        ]
    raise ValueError(f"unknown report kind: {kind}")


def write_json_pretty(
    kind: str,
    reports: DataFrame,
    records: DataFrame | None = None,
    path: str | None = None,
) -> str:
    """K1 in the reference's exact file/stdout format: pretty-printed
    reports concatenated with newlines (output.go:139-153). Returns the
    text; writes it when ``path`` is given."""
    docs = pretty_json_reports(kind, reports, records)
    text = "\n".join(docs) + ("\n" if docs else "")
    if path:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
    return text
