"""Winnowing fingerprints: Spark implementation must match a direct
pure-Python reference of the algorithm (same hash via a tiny JVM probe
is impractical, so the reference uses Spark's own xxhash64 through a
one-column DataFrame — the comparison checks the windowing/dedup logic,
which is where bugs live)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parsedmarc_go_spark.functions.text import winnowing_fingerprints
from parsedmarc_go_spark.tables import load
from tests.conftest import SF_SMOKE

K, W = 8, 4


def _python_winnow(spark, text: str) -> set[int]:
    norm = " ".join(text.lower().split())
    grams = [norm[i : i + K] for i in range(len(norm) - K + 1)]
    hdf = spark.createDataFrame([(g,) for g in grams], "gram string").select(
        F.xxhash64("gram").alias("h")
    )
    hashes = [r.h for r in hdf.collect()]
    out = set()
    for i in range(len(hashes)):
        out.add(min(hashes[i : i + W]))
    return out


def test_winnowing_matches_reference(spark):
    docs = load(spark, SF_SMOKE, "documents").limit(3)
    got = winnowing_fingerprints(docs, k=K, window=W)
    by_doc = {}
    for r in got.collect():
        by_doc.setdefault(r.doc, set()).add(r.fingerprint)
    for row in docs.collect():
        expected = _python_winnow(spark, row.text)
        assert by_doc[row.doc_id] == expected, f"doc {row.doc_id}"


def test_shared_substring_shares_fingerprint(spark):
    # guarantee: any shared substring of length >= k + window - 1
    # produces at least one common fingerprint
    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, f"AAA {shared} BBB"), (2, f"XXXX {shared} YYYY"), (3, "completely different words")],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df, k=K, window=W)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3] and by_doc[2] & by_doc[3])


def test_ensure_parallelism_flag_is_value_neutral(spark):
    """ADVICE r13: the partition probe/spread is a physical hint only —
    fingerprints with ensure_parallelism=False equal the default."""
    from parsedmarc_go_spark.functions.text import winnowing_fingerprints

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps over the lazy dog") for i in range(8)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, winnowing_fingerprints(docs).collect()))
    b = sorted(map(tuple,
                   winnowing_fingerprints(docs, ensure_parallelism=False).collect()))
    assert a == b
