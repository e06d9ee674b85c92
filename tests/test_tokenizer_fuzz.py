"""Property-based tests (hypothesis) for the tokenizer encoders: on
random words and vocabularies, max-munch must reconstruct the word
exactly (or emit [UNK] for the whole word) and match a pure-Python
greedy reference; the unigram Viterbi segmentation must reconstruct
the word and match the pure-Python DP with identical tie-breaks.
One hypothesis example = one generated corpus+vocab = ONE Spark job
over all words (per-row jobs would drown in scheduling overhead)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_ALPHA = "ab"  # tiny alphabet maximizes piece overlap/ambiguity
_word = st.text(alphabet=_ALPHA, min_size=1, max_size=12)
_piece = st.text(alphabet=_ALPHA, min_size=1, max_size=4)


def _py_maxmunch(w, vocab, L):
    toks, p = [], 0
    while p < len(w):
        m = None
        for l in range(min(L, len(w) - p), 0, -1):
            if w[p : p + l] in vocab:
                m = w[p : p + l]
                break
        if m is None:
            return ["[UNK]"]
        toks.append(m)
        p += len(m)
    return toks


@given(
    words=st.lists(_word, min_size=1, max_size=20, unique=True),
    pieces=st.sets(_piece, min_size=1, max_size=12),
)
@settings(**_SETTINGS)
def test_maxmunch_matches_python_and_reconstructs(spark, words, pieces):
    from parsedmarc_go_spark.operators.bpe import maxmunch_encode

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["doc_id", "text"]
    )
    vocab = spark.createDataFrame([(p,) for p in pieces], ["token"])
    got = {
        r["doc_id"]: list(r["pieces"])
        for r in maxmunch_encode(docs, vocab, max_piece_len=4).collect()
    }
    for i, w in enumerate(words):
        want = _py_maxmunch(w, pieces, 4)
        assert got[i] == want, (w, sorted(pieces))
        if want != ["[UNK]"]:
            assert "".join(want) == w


@given(
    words=st.lists(_word, min_size=1, max_size=15, unique=True),
    pieces=st.dictionaries(
        _piece, st.integers(min_value=1, max_value=50), min_size=1, max_size=10
    ),
)
@settings(**_SETTINGS)
def test_unigram_viterbi_matches_python_and_reconstructs(
    spark, words, pieces
):
    from tests.test_unigram import _py_table, _py_viterbi

    from parsedmarc_go_spark.operators.unigram import (
        _piece_map,
        _viterbi_segs,
    )
    from pyspark.sql import functions as F

    # complete the table with single chars so words CAN be segmentable
    counts = dict(pieces)
    for c in _ALPHA:
        counts.setdefault(c, 1)
    table = _py_table(counts)
    pieces_df = spark.createDataFrame(
        [(p, lp) for p, (c, lp) in table.items()], ["piece", "logp_fp"]
    )
    wdf = spark.createDataFrame([(w,) for w in words], ["word"]).crossJoin(
        F.broadcast(_piece_map(pieces_df))
    )
    got = {
        r["word"]: list(r["syms"])
        for r in _viterbi_segs(wdf, 4).select("word", "syms").collect()
    }
    for w in words:
        want = _py_viterbi(w, table, 4)
        assert got[w] == want, (w, table)
        if want:
            assert "".join(want) == w
