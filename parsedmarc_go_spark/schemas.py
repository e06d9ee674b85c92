"""Explicit StructTypes for the three report families and the five flat
analytic tables (SURVEY §1.3-1.5). Never inferred — the reference
declares fixed schemas (Go struct tags `internal/parser/types.go`,
ClickHouse DDL `internal/storage/clickhouse/clickhouse.go:79-228`) and
so do we.

Leaf values in the XML schema stay strings: RFC 7489 producers emit
epoch seconds and enums as text, and the defaulting rules
(parser.go:1147-1152, 1218-1219, 1249-1261) operate on empty-string,
so typing happens in the normalize layer where the defaults live.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str) -> T.StructField:
    return T.StructField(name, T.StringType(), True)


def _arr_s(name: str) -> T.StructField:
    return T.StructField(name, T.ArrayType(T.StringType()), True)


# --- RFC 7489 aggregate <feedback> document (parser.go:1075-1130) -----------
AGGREGATE_FEEDBACK_SCHEMA = T.StructType(
    [
        _s("version"),
        T.StructField(
            "report_metadata",
            T.StructType(
                [
                    _s("org_name"),
                    _s("email"),
                    _s("extra_contact_info"),
                    _s("report_id"),
                    T.StructField(
                        "date_range",
                        T.StructType([_s("begin"), _s("end")]),
                        True,
                    ),
                    _arr_s("error"),
                ]
            ),
            True,
        ),
        T.StructField(
            "policy_published",
            T.StructType([_s("domain"), _s("adkim"), _s("aspf"), _s("p"), _s("sp"), _s("pct"), _s("fo")]),
            True,
        ),
        T.StructField(
            "record",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "row",
                            T.StructType(
                                [
                                    _s("source_ip"),
                                    _s("count"),
                                    T.StructField(
                                        "policy_evaluated",
                                        T.StructType(
                                            [
                                                _s("disposition"),
                                                _s("dkim"),
                                                _s("spf"),
                                                T.StructField(
                                                    "reason",
                                                    T.ArrayType(
                                                        T.StructType([_s("type"), _s("comment")])
                                                    ),
                                                    True,
                                                ),
                                            ]
                                        ),
                                        True,
                                    ),
                                ]
                            ),
                            True,
                        ),
                        T.StructField(
                            "identifiers",
                            T.StructType([_s("header_from"), _s("envelope_from"), _s("envelope_to")]),
                            True,
                        ),
                        T.StructField(
                            "auth_results",
                            T.StructType(
                                [
                                    T.StructField(
                                        "dkim",
                                        T.ArrayType(
                                            T.StructType([_s("domain"), _s("selector"), _s("result")])
                                        ),
                                        True,
                                    ),
                                    T.StructField(
                                        "spf",
                                        T.ArrayType(
                                            T.StructType([_s("domain"), _s("scope"), _s("result")])
                                        ),
                                        True,
                                    ),
                                ]
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
        _s("_corrupt_record"),
    ]
)

# --- RFC 8460 SMTP TLS report JSON (hyphenated keys as sent on the wire;
# the reference's underscored struct tags never bind them — we parse the
# RFC shape properly, a documented improvement over parser.go:1752-1767) ----
SMTP_TLS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("organization-name", T.StringType(), True),
        T.StructField(
            "date-range",
            T.StructType(
                [
                    T.StructField("start-datetime", T.StringType(), True),
                    T.StructField("end-datetime", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("contact-info", T.StringType(), True),
        T.StructField("report-id", T.StringType(), True),
        T.StructField(
            "policies",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "policy",
                            T.StructType(
                                [
                                    T.StructField("policy-type", T.StringType(), True),
                                    T.StructField("policy-string", T.ArrayType(T.StringType()), True),
                                    T.StructField("policy-domain", T.StringType(), True),
                                    T.StructField("mx-host-pattern", T.ArrayType(T.StringType()), True),
                                ]
                            ),
                            True,
                        ),
                        T.StructField(
                            "summary",
                            T.StructType(
                                [
                                    T.StructField("total-successful-session-count", T.LongType(), True),
                                    T.StructField("total-failure-session-count", T.LongType(), True),
                                ]
                            ),
                            True,
                        ),
                        T.StructField(
                            "failure-details",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("result-type", T.StringType(), True),
                                        T.StructField("sending-mta-ip", T.StringType(), True),
                                        T.StructField("receiving-ip", T.StringType(), True),
                                        T.StructField("receiving-mx-hostname", T.StringType(), True),
                                        T.StructField("receiving-mx-helo", T.StringType(), True),
                                        T.StructField("failed-session-count", T.LongType(), True),
                                        T.StructField("additional-information", T.StringType(), True),
                                        T.StructField("failure-reason-code", T.StringType(), True),
                                    ]
                                )
                            ),
                            True,
                        ),
                    ]
                )
            ),
            True,
        ),
        _s("_corrupt_record"),
    ]
)

# --- Forensic report struct emitted by the Python MIME parser (RFC 6591
# semantics per parser.go:1302-1693), carried as JSON through the
# extraction UDF and typed here ---------------------------------------------
FORENSIC_JSON_SCHEMA = T.StructType(
    [
        _s("feedback_type"),
        _s("user_agent"),
        _s("version"),
        _s("original_envelope_id"),
        _s("original_mail_from"),
        _s("original_rcpt_to"),
        _s("arrival_date"),  # RFC3339 string or null (typed downstream)
        _s("subject"),
        _s("message_id"),
        _s("authentication_results"),
        _s("dkim_domain"),
        _s("source_ip_address"),
        _s("delivery_result"),
        _arr_s("auth_failure"),
        _s("reported_domain"),
        _arr_s("authentication_mechanisms"),
        T.StructField("sample_headers_only", T.BooleanType(), True),
        _s("sample"),
        _s("parsed_sample"),
    ]
)

# --- extraction UDF output ---------------------------------------------------
EXTRACTED_SCHEMA = T.StructType(
    [
        _s("kind"),  # aggregate | smtp_tls | forensic | unknown
        T.StructField("payload", T.StringType(), True),  # XML / JSON text
        _s("container"),  # raw | zip | gzip | mime | base64 chain
        _s("forensic_json"),
        _s("error"),
    ]
)

# --- flat analytic tables (ClickHouse DDL parity, clickhouse.go:79-228) -----
AGGREGATE_REPORTS_SCHEMA = T.StructType(
    [
        _s("xml_schema"),
        _s("org_name"),
        _s("org_email"),
        _s("org_extra_contact_info"),
        _s("report_id"),
        T.StructField("begin_date", T.TimestampType(), True),
        T.StructField("end_date", T.TimestampType(), True),
        _arr_s("errors"),
        _s("domain"),
        _s("adkim"),
        _s("aspf"),
        _s("p"),
        _s("sp"),
        _s("pct"),
        _s("fo"),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

AGGREGATE_RECORDS_SCHEMA = T.StructType(
    [
        _s("report_id"),
        _s("org_name"),
        _s("source_ip_address"),
        _s("source_country"),
        _s("source_reverse_dns"),
        _s("source_base_domain"),
        _s("source_name"),
        _s("source_type"),
        T.StructField("count", T.IntegerType(), True),
        T.StructField("spf_aligned", T.BooleanType(), True),
        T.StructField("dkim_aligned", T.BooleanType(), True),
        T.StructField("dmarc_aligned", T.BooleanType(), True),
        _s("disposition"),
        _arr_s("policy_override_reasons"),
        _arr_s("policy_override_comments"),
        _s("envelope_from"),
        _s("header_from"),
        _s("envelope_to"),
        _arr_s("dkim_domains"),
        _arr_s("dkim_selectors"),
        _arr_s("dkim_results"),
        _arr_s("spf_domains"),
        _arr_s("spf_scopes"),
        _arr_s("spf_results"),
        T.StructField("begin_date", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)
