"""F5 — validation predicates (internal/validation/validator.go):
email / domain regexes, DMARC policy enum, report-id length + dangerous
chars. Pure boolean column expressions, usable as ingest filters or
data-quality columns."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"  # validator.go:226-229
DOMAIN_RE = r"^([a-zA-Z0-9]([a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?\.)+[a-zA-Z]{2,}$"  # validator.go:232-240
DMARC_POLICIES = ("none", "quarantine", "reject")  # validator.go:246-254
# validator.go containsDangerousChars: control chars + injection-ish
DANGEROUS_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f<>\"'`;]"


def is_valid_email(col: Column) -> Column:
    return col.rlike(EMAIL_RE)


def is_valid_domain(col: Column) -> Column:
    return col.isNotNull() & (col != "") & col.rlike(DOMAIN_RE)


def is_valid_policy(col: Column) -> Column:
    return col.isin(*DMARC_POLICIES)


def is_valid_report_id(col: Column) -> Column:
    return (
        col.isNotNull()
        & (col != "")
        & (F.length(col) <= 255)
        & ~col.rlike(DANGEROUS_RE)
    )
