"""Unigram-LM tokenizer training (operators/unigram.py) value-pinned
against a pure-Python hard-EM reference: seed counts, every EM round's
piece table (counts AND grid-quantized logps), and the final Viterbi
corpus segmentation must match exactly — the expression DP, the
array_max tie-break (score, then longer piece), and the single-char
floor are all part of the pinned contract."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

SCALE = 10_000.0
NEG_INF = -1.0e15


def _py_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                c[w] += 1
    return c


def _py_seed(words, seed_size, L):
    c = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, min(L, len(w) - i) + 1):
                c[w[i : i + l]] += f
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    out = dict(top)
    for p, n in c.items():
        if len(p) == 1:
            out[p] = max(out.get(p, 0), n)
    return out


def _py_logp_fp(cnt, total):
    return math.floor(math.log(cnt / total) * SCALE + 0.5)


def _py_table(counts):
    total = sum(counts.values())
    return {p: (n, _py_logp_fp(n, total)) for p, n in counts.items()}


def _py_viterbi(w, table, L):
    dp = [(0.0, 0)] + [(NEG_INF, 0)] * len(w)
    for i in range(1, len(w) + 1):
        best = None
        for l in range(1, min(L, i) + 1):
            prev = dp[i - l][0]
            piece = w[i - l : i]
            if prev > NEG_INF / 2 and piece in table:
                cand = (prev + float(table[piece][1]), l)
                if best is None or cand > best:
                    best = cand
        dp[i] = best if best is not None else (NEG_INF, 0)
    if dp[len(w)][1] == 0:
        return []
    toks, p = [], len(w)
    while p > 0:
        l = dp[p][1]
        toks.append(w[p - l : p])
        p -= l
    return list(reversed(toks))


def _py_train(texts, vocab_size, seed_size, L, n_iters):
    words = _py_word_freqs(texts)
    table = _py_table(_py_seed(words, seed_size, L))
    for _ in range(n_iters):
        counts = Counter()
        for w, f in words.items():
            for piece in _py_viterbi(w, table, L):
                counts[piece] += f
        top = dict(
            sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
        )
        # the Spark M-step: every single char from the previous table
        # survives with coalesce(count, 1); union resolved by max
        for p in table:
            if len(p) == 1:
                top[p] = max(top.get(p, 0), counts.get(p, 1))
        table = _py_table(top)
    return table


TEXTS = [
    "abab abab cdcd ab",
    "abab cdcd cd abcd",
    "xyz abab ab cd",
    "abcd abcd xyz ab",
]
L, SEED, VOCAB, ITERS = 4, 24, 10, 2


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )


def test_unigram_seed_matches_python(spark):
    from parsedmarc_go_spark.operators.unigram import unigram_seed

    got = {
        r["piece"]: r["cnt"]
        for r in unigram_seed(_docs(spark), SEED, L).collect()
    }
    assert got == _py_seed(_py_word_freqs(TEXTS), SEED, L)


def test_unigram_train_matches_python_em(spark):
    from parsedmarc_go_spark.operators.unigram import unigram_train

    got = {
        r["piece"]: (r["cnt"], r["logp_fp"])
        for r in unigram_train(
            _docs(spark), VOCAB, SEED, L, n_iters=ITERS
        ).collect()
    }
    want = _py_train(TEXTS, VOCAB, SEED, L, ITERS)
    assert got == want
    # structure sanity: multi-char pieces survived training and every
    # single corpus char is present
    assert any(len(p) > 1 for p in got)
    chars = {c for t in TEXTS for c in t.replace(" ", "")}
    assert chars <= set(got)


def test_unigram_segment_matches_python_viterbi(spark):
    from parsedmarc_go_spark.operators.unigram import (
        unigram_segment,
        unigram_train,
    )

    docs = _docs(spark)
    pieces = unigram_train(docs, VOCAB, SEED, L, n_iters=ITERS)
    table = _py_train(TEXTS, VOCAB, SEED, L, ITERS)
    got = {
        r["doc_id"]: (list(r["pieces"]), r["n_pieces"])
        for r in unigram_segment(docs, pieces, L).collect()
    }
    for i, t in enumerate(TEXTS):
        want = []
        for w in t.lower().split(" "):
            if w:
                want.extend(_py_viterbi(w, table, L))
        assert got[i] == (want, len(want)), f"doc {i}"


def test_unigram_train_deterministic(spark):
    from parsedmarc_go_spark.operators.unigram import unigram_train

    a = sorted(
        tuple(r)
        for r in unigram_train(_docs(spark), VOCAB, SEED, L, 1).collect()
    )
    b = sorted(
        tuple(r)
        for r in unigram_train(_docs(spark), VOCAB, SEED, L, 1).collect()
    )
    assert a == b
