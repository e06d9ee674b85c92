"""Property-based test (hypothesis) for the PPJoin containment
generator: on random tiny-alphabet corpora and random thresholds, the
prefix+positional-filtered path must equal the exact Σdf² self-join
EXACTLY — including threshold-boundary pairs, where the float-safe
prefix-length and required-overlap roundings matter most. Random
corpora hit boundary geometries (equal sizes, full containment, shared
hot shingles, df-ties in the rarest-first ordering) that planted
fixtures can't enumerate. One hypothesis example = one corpus = one
pair of Spark queries.

A pure-Python exact reference triangulates: Spark-exact, Spark-prefix,
and the reference must agree pairwise, so a bug shared by both Spark
paths (e.g. in the shared shingle pipeline) cannot self-confirm."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# hypothesis fuzz (one Spark query pair per example): excluded from the default (driver-visible) lane — run with -m ""
pytestmark = pytest.mark.slow

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# tiny alphabet + short docs: maximal shingle collision density, so the
# candidate machinery (hot shingles, ties, boundaries) is exercised hard
_token = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_token, min_size=1, max_size=12)


def _py_containment_pairs(texts: dict[int, str], n: int, t: float):
    """Exact reference: distinct word-n-gram sets per doc, containment
    = |A∩B| / min(|A|,|B|), pairs with containment >= t."""
    sets = {}
    for d, text in texts.items():
        toks = text.lower().split(" ")
        grams = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
        if grams:
            sets[d] = grams
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(sets[a] & sets[b])
            if shared and shared / min(len(sets[a]), len(sets[b])) >= t:
                out.add((a, b, len(sets[a]), len(sets[b]), shared))
    return out


@given(
    docs=st.lists(_doc, min_size=2, max_size=12),
    threshold=st.sampled_from([0.5, 0.6, 2 / 3, 0.75, 0.8, 1.0]),
)
@settings(**_SETTINGS)
def test_prefix_equals_exact_and_python_reference(spark, docs, threshold):
    from parsedmarc_go_spark.operators.dedup import (
        containment_pairs_prefix,
        ngram_containment_pairs,
    )

    texts = {i: " ".join(toks) for i, toks in enumerate(docs)}
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    want = _py_containment_pairs(texts, n=2, t=threshold)

    def rows(frame):
        return {
            (r.doc_a, r.doc_b, r.n_a, r.n_b, r.shared) for r in frame.collect()
        }

    exact = rows(ngram_containment_pairs(df, n=2, threshold=threshold))
    assert exact == want, (texts, threshold)
    for bc in (False, True):
        fast = rows(
            containment_pairs_prefix(
                df, n=2, threshold=threshold, broadcast_small_sides=bc
            )
        )
        assert fast == want, (texts, threshold, bc)
