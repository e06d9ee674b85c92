"""Planted-fixture tests for the curation operators (PII redaction,
repetition stats, n-gram decontamination). The corpus-level value
oracles live in test_queries_vs_duckdb via the registry; these tests
pin the semantics on handcrafted rows where the expected values are
computable by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from parsedmarc_go_spark.operators.curation import (
    ngram_decontaminate,
    pii_counts,
    pii_redact,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pii_redact_planted(spark):
    rows = [
        (1, "mail bob.smith+x@sub.example.co.uk now"),
        (2, "srv at 192.168.001.5, call 555-123-4567"),
        (3, "two mails a@b.io c@d.org and ip 10.0.0.1"),
        (4, "no pii here, just 1234 and 12.5 percent"),
    ]
    df = _docs(spark, rows)
    n_e, n_p, n_i = pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            n_e.alias("e"),
            n_p.alias("p"),
            n_i.alias("i"),
            pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert out[1]["red"] == "mail <EMAIL> now"
    assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (1, 0, 0)
    assert out[2]["red"] == "srv at <IP>, call <PHONE>"
    assert (out[2]["e"], out[2]["p"], out[2]["i"]) == (0, 1, 1)
    assert out[3]["red"] == "two mails <EMAIL> <EMAIL> and ip <IP>"
    assert out[3]["e"] == 2
    # decimals and plain numbers must survive untouched
    assert out[4]["red"] == rows[3][1]
    assert (out[4]["e"], out[4]["p"], out[4]["i"]) == (0, 0, 0)


def test_repetition_stats_planted(spark):
    # "a a a b": 4 tokens, 2 distinct -> dup 0.5, top token a=3/4;
    # bigrams [a a, a a, a b] -> top bigram 2/3
    df = _docs(spark, [(1, "a a a b"), (2, "x")])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert r1["dup_token_frac"] == 0.5
    assert r1["top_token_frac"] == 0.75
    assert r1["top_bigram_frac"] == 2.0 / 3.0
    # single-token doc: no bigrams -> NULL fraction, not a crash
    r2 = out[2]
    assert r2["n_tokens"] == 1 and r2["top_bigram_frac"] is None


def test_ngram_decontaminate_planted(spark):
    shared = "one two three four five six seven eight"
    bench = _docs(spark, [(100, f"{shared} tail words here")])
    corpus = _docs(
        spark,
        [
            # contains the shared 8-gram once (plus unshared ones)
            (1, f"prefix {shared} suffix"),
            # same tokens, different order: no shared 8-gram
            (2, "eight seven six five four three two one"),
            # too short for any 8-gram
            (3, "tiny doc"),
        ],
    )
    out = {r["doc_id"]: r for r in ngram_decontaminate(corpus, bench, n=8).collect()}
    assert out[1]["n_overlap"] == 1
    assert out[1]["n_distinct_ngrams"] == 3
    assert out[1]["contam_frac"] == 1.0 / 3.0
    assert out[2]["n_overlap"] == 0 and out[2]["contam_frac"] == 0.0
    assert out[3]["n_distinct_ngrams"] == 0
    # zero denominator -> NULL, not a division error
    assert out[3]["contam_frac"] is None


def test_ngram_decontaminate_broadcasts_benchmark(spark):
    bench = _docs(spark, [(100, "one two three four five six seven eight")])
    corpus = _docs(spark, [(1, "one two three four five six seven eight nine")])
    plan = ngram_decontaminate(corpus, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_sample_stratified_planted(spark):
    from parsedmarc_go_spark.operators.curation import sample_stratified

    rows = [(i, f"doc {i}", f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = sample_stratified(df, "source", 4)
    got = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"s0": 4, "s1": 4, "s2": 4}
    # deterministic: same membership on a re-run
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in sample_stratified(df, "source", 4).collect())
    assert ids1 == ids2


def test_sample_token_budget_planted(spark):
    from parsedmarc_go_spark.operators.curation import sample_token_budget

    rows = [(i, f"s{i % 2}", 40) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars bigint")
    out = sample_token_budget(df, "source", "n_chars", 100).collect()
    # 40-char docs under a 100 budget -> exactly 2 kept per stratum
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["cum_size"])
    assert {s: sorted(v) for s, v in per.items()} == {"s0": [40, 80], "s1": [40, 80]}


def test_sample_hash_threshold_planted(spark):
    from parsedmarc_go_spark.operators.curation import sample_hash_threshold

    rows = [(i, f"s{i % 2}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    n = sample_hash_threshold(df, 0.15).count()
    # expected rate with binomial slack (p=0.15, n=2000 -> sd ~ 16)
    assert 220 <= n <= 380
    # boundary semantics: frac=0 keeps nothing, frac=1 keeps everything
    assert sample_hash_threshold(df, 0.0).count() == 0
    assert sample_hash_threshold(df, 1.0).count() == 2000
    # no shuffle in the plan: a pure filter over the scan
    plan = sample_hash_threshold(df, 0.15)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_canonical_url_planted(spark):
    from parsedmarc_go_spark.operators.curation import canonical_url

    cases = [
        # case-mixed prefix lowered, default port dropped, tracking
        # params removed, rest sorted, fragment stripped
        ("HTTP://Ex.COM:80/A/b?z=1&utm_source=f&a=2#x", "http://ex.com/A/b?a=2&z=1"),
        ("https://A.B.c:443/p", "https://a.b.c/p"),
        # non-default port preserved; path case preserved
        ("http://h:8080/Path?b=2&a=10&fbclid=abc", "http://h:8080/Path?a=10&b=2"),
        # bare '?' and empty params vanish
        ("http://h/p?", "http://h/p"),
        ("http://h/p?&&", "http://h/p"),
        # non-http scheme: port logic untouched, host still lowered
        ("FTP://H.com:21/Q", "ftp://h.com:21/Q"),
        # utm param sorted OUT even when last
        ("http://h/p?a=1&utm_campaign=z", "http://h/p?a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_boilerplate_chunks_planted(spark):
    from parsedmarc_go_spark.plans.curation import boilerplate_chunks
    import tempfile, os

    # 40-token docs -> chunks [0:32] and [32:40]; docs 1 and 2 share
    # their first 32 tokens exactly (boilerplate header), doc 3 is
    # fully unique
    header = " ".join(f"h{i}" for i in range(32))
    rows = [
        (1, header + " " + " ".join(f"a{i}" for i in range(8))),
        (2, header + " " + " ".join(f"b{i}" for i in range(8))),
        (3, " ".join(f"c{i}" for i in range(40))),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
            os.path.join(td, "documents.parquet")
        )
        out = {r["doc_id"]: r for r in boilerplate_chunks(spark, td).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_boiler_chunks"] == 1
    assert out[1]["boiler_frac"] == 0.5
    assert out[2]["n_boiler_chunks"] == 1
    assert out[3]["n_boiler_chunks"] == 0 and out[3]["boiler_frac"] == 0.0


def test_token_budget_overshooting_stratum_and_min_docs(spark):
    """The boundary VERDICT r7 flagged: a stratum whose first
    hash-ordered doc exceeds the budget yields ZERO docs (hard budget),
    and min_docs=1 always keeps exactly the hash-order-first doc."""
    import hashlib

    from parsedmarc_go_spark.operators.curation import sample_token_budget

    docs = spark.createDataFrame(
        [
            (1, "big", 5000),
            (2, "big", 5000),
            (3, "small", 100),
            (4, "small", 100),
        ],
        ["doc_id", "source", "n_chars"],
    )
    hard = sample_token_budget(docs, "source", "n_chars", 3000).collect()
    assert sorted(r["doc_id"] for r in hard) == [3, 4]  # "big" contributes zero

    soft = sample_token_budget(docs, "source", "n_chars", 3000, min_docs=1).collect()
    got_big = [r["doc_id"] for r in soft if r["source"] == "big"]
    # the escape hatch keeps exactly the md5-hash-order-first "big" doc
    first_big = min((1, 2), key=lambda d: hashlib.md5(str(d).encode()).hexdigest())
    assert got_big == [first_big]
    assert sorted(r["doc_id"] for r in soft if r["source"] == "small") == [3, 4]


def test_hash_threshold_cut_is_exact_floor(spark):
    """ADVICE r7: the threshold must be hex(floor(frac·16^8)) of the
    exact binary float, never a float-multiply rounding away from it."""
    from fractions import Fraction
    from math import floor

    from parsedmarc_go_spark.operators.curation import sample_hash_threshold
    from parsedmarc_go_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    # frac whose float product sits a hair BELOW the integer boundary:
    # 0.3 * 16**8 float-multiplies to 1288490188.8000002 (int() -> ...188)
    # while floor(Fraction(0.3) * 16**8) = 1288490188 — same here, so
    # also pin a case where they genuinely differ:
    # float(2**-32 * 3) * 16**8 = 3.0000000000000004 -> int 3; exact 3
    # and frac = 7/2**32 + tiny: use 0.15 (the gate constant) plus a
    # boundary-exact frac = 1288490189/2**32 where int(frac*16**8) can
    # round to ...189 vs exact floor ...188 on some platforms
    for frac in (0.15, 0.3, 1288490189 / 2**32, 2**-32 * 3):
        expect = floor(Fraction(frac) * 16**8)
        got = sample_hash_threshold(docs, frac)
        # reproduce the operator's threshold from its own plan string
        plan = got._jdf.queryExecution().analyzed().toString()
        assert format(expect, "08x") in plan, (frac, expect, plan[:500])


def test_pack_offsets_no_single_partition_exchange(spark):
    """The whole point of the two-phase prefix sum: the plan must not
    contain the global-window Exchange SinglePartition a naive running
    sum would force (one task owning the corpus at 100 TB)."""
    from parsedmarc_go_spark.plans import QUERIES

    df = QUERIES["pack_sequences"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    rows = df.collect()
    # spans tile the tape contiguously: sorted by start, each start ==
    # previous end, and the tape length is the corpus size total
    spans = sorted((r["start_offset"], r["end_offset"]) for r in rows)
    assert spans[0][0] == 0
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
    # seq ids consistent with the offsets
    for r in rows:
        assert r["first_seq"] == r["start_offset"] // 2048
        assert r["last_seq"] == (r["end_offset"] - 1) // 2048


def test_decontaminate_rejects_mismatched_bench_ngrams(spark):
    """A cached bench_ngrams frame built at a different n than the
    corpus side must raise, not silently report zero overlaps."""
    import pytest

    from parsedmarc_go_spark.operators.curation import (
        benchmark_ngrams,
        ngram_decontaminate,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n o p")], ["doc_id", "text"]
    )
    cached = benchmark_ngrams(docs, n=13)
    with pytest.raises(ValueError, match="n=13.*n=8"):
        ngram_decontaminate(docs, n=8, bench_ngrams=cached)
    # matching n passes through
    assert ngram_decontaminate(docs, n=13, bench_ngrams=cached).count() == 1


def test_sample_temperature_quotas_and_determinism(spark):
    import math

    from pyspark.sql import functions as F

    from parsedmarc_go_spark.operators.curation import sample_temperature

    # three strata with very different sizes: 160 / 36 / 4
    rows = (
        [(i, "big") for i in range(160)]
        + [(200 + i, "mid") for i in range(36)]
        + [(400 + i, "tiny") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "source"])

    out = sample_temperature(docs, "source", k=50, tau=0.5)
    got = {}
    for r in out.collect():
        got[r.source] = got.get(r.source, 0) + 1
    # expected floor quotas from the documented fixed-point math
    p = {s: math.floor(math.sqrt(n) * 1e6 + 0.5) for s, n in
         {"big": 160, "mid": 36, "tiny": 4}.items()}
    z = sum(p.values())
    want = {s: math.floor(50.0 * v / z) for s, v in p.items()}
    assert got == want
    # tau=0.5 up-weights small strata vs proportional: tiny gets
    # sqrt-share (~5/50) not count-share (~1/50)
    assert got["tiny"] >= 4 or got["tiny"] > 50 * 4 // 200
    # deterministic: same corpus -> same membership
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in sample_temperature(docs, "source", 50, 0.5).collect())
    assert a == b
    # tau=1 reduces to proportional floor quotas
    prop = sample_temperature(docs, "source", k=50, tau=1.0)
    by = {s: c for s, c in prop.groupBy("source").count().collect()}
    assert by["big"] == 40 and by["mid"] == 9 and by["tiny"] == 1


def test_c4_clean_rules(spark):
    from parsedmarc_go_spark.operators.curation import c4_clean

    docs = spark.createDataFrame(
        [
            # 5+ sentences of kept lines -> keep
            (1, "One good sentence here.\nAnother fine sentence follows!\n"
                "Questions also count, right?\nKeep this one too.\n"
                "And a fifth sentence."),
            # every line filtered out (short / no punct / javascript)
            (2, "short.\nno punctuation at all\nPlease enable javascript now."),
            # lorem ipsum -> doc dropped even with enough sentences
            (3, "Lorem ipsum dolor sit amet.\nMore sentences here one.\n"
                "More sentences here two.\nMore sentences here three.\n"
                "More sentences here four."),
            # brace -> dropped
            (4, "A fine sentence with code { inside.\nSecond sentence here.\n"
                "Third sentence here.\nFourth sentence here.\nFifth one here."),
            # quoted-speech terminal punctuation is kept
            (5, 'He said "stop right there."\nShe replied "never ever again."'),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in c4_clean(docs).collect()}
    assert out[1].keep and out[1].n_kept_lines == 5 and out[1].n_sentences == 5
    assert out[2].n_kept_lines == 0 and out[2].clean_text == ""
    assert not out[2].keep  # zero sentences < 5
    assert not out[3].keep  # lorem ipsum
    assert not out[4].keep  # brace
    assert out[5].n_kept_lines == 2  # lines ending in '."' end with '"'
    # line accounting is raw-split based
    assert out[1].n_lines == 5 and out[2].n_lines == 3


def test_span_corruption_round_trip(spark):
    """Masked + unmasked tokens must reconstruct the document: strip
    sentinels from input and target, interleave by construction —
    sentinel counts agree between input and target, and token
    accounting holds."""
    from parsedmarc_go_spark.operators.curation import span_corruption

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(40))) for i in range(5)],
        ["doc_id", "text"],
    )
    out = span_corruption(docs, mask_frac=0.3, span_len=3)
    for r in out.collect():
        in_toks = r.input_text.split(" ") if r.input_text else []
        tg_toks = r.target_text.split(" ") if r.target_text else []
        in_sent = [t for t in in_toks if t.startswith("<extra_id_")]
        tg_sent = [t for t in tg_toks if t.startswith("<extra_id_")]
        assert in_sent == tg_sent  # same sentinels, same order
        kept = [t for t in in_toks if not t.startswith("<extra_id_")]
        masked = [t for t in tg_toks if not t.startswith("<extra_id_")]
        assert len(kept) == r.n_tokens - r.n_masked
        assert len(masked) == r.n_masked
        # union of kept+masked tokens = original multiset
        assert sorted(kept + masked) == sorted(
            f"w{r.doc_id}_{j}" for j in range(40)
        )
        # runs are at least span_len long (merged runs longer)
        assert r.n_masked == 0 or r.n_masked >= 3


def test_span_corruption_deterministic_and_frac(spark):
    from pyspark.sql import functions as F

    from parsedmarc_go_spark.operators.curation import span_corruption

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(100))) for i in range(50)],
        ["doc_id", "text"],
    )
    a = sorted(tuple(r) for r in span_corruption(docs).collect())
    b = sorted(tuple(r) for r in span_corruption(docs).collect())
    assert a == b  # hash-seeded: no rand(), partitioning-independent
    tot = span_corruption(docs).agg(
        F.sum("n_masked").cast("double") / F.sum("n_tokens")
    ).collect()[0][0]
    assert 0.10 <= tot <= 0.22  # expected ~0.15 masked fraction


def test_bm25_semantics(spark):
    import math

    import pytest

    from parsedmarc_go_spark.operators.retrieval import bm25_score, inverted_postings

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "apple banana banana banana"),
            (3, "cherry dates cherry elderberry"),
            (4, "fig grape honeydew kiwi"),
            # null-text and empty-text docs (ADVICE r17): null must be
            # excluded from output AND from the n_docs/avgdl corpus
            # stats; empty text tokenizes to [''] (dl=1, no query term)
            (5, None),
            (6, ""),
        ],
        ["doc_id", "text"],
    )
    # postings: row per (term, doc) with tf
    posts = {(r.term, r.doc_id): r.tf for r in inverted_postings(docs).collect()}
    assert posts[("apple", 1)] == 2 and posts[("banana", 2)] == 3
    # the null doc emits no postings; the empty doc posts one '' term
    assert not any(d == 5 for (_, d) in posts)
    assert posts[("", 6)] == 1
    out = {r.doc_id: r for r in bm25_score(docs, ["apple", "cherry"]).collect()}
    assert set(out) == {1, 2, 3}  # docs 4/6 match nothing, 5 is null -> omitted
    assert out[1].n_terms_matched == 2
    # hand-check doc 1 against stats that EXCLUDE the null doc and
    # INCLUDE the empty doc at dl=1 (N=5 docs, avgdl=(4+4+4+4+1)/5):
    # idf(apple)=ln((5-2+.5)/(2+.5)+1)
    def fp(x):
        return math.floor(x * 10000.0 + 0.5)

    avgdl = (4 + 4 + 4 + 4 + 1) / 5.0  # null doc excluded, empty doc dl=1

    def contrib(idf_fp, tf, dl):
        raw = (idf_fp / 10000.0) * (tf * (1.2 + 1.0)) / (
            tf + 1.2 * (0.25 + 0.75 * dl / avgdl)
        )
        return fp(raw)

    idf_a = fp(math.log((5 - 2 + 0.5) / (2 + 0.5) + 1.0))
    idf_c = fp(math.log((5 - 2 + 0.5) / (2 + 0.5) + 1.0))
    want1 = (contrib(idf_a, 2, 4) + contrib(idf_c, 1, 4)) / 10000.0
    assert out[1].score == pytest.approx(want1, abs=1e-12)
    # higher tf of a matched term -> higher score than single match
    assert out[2].score < out[1].score  # one term (apple tf1... banana not queried)


def test_url_dedup_and_vocab(spark):
    from parsedmarc_go_spark.operators.curation import canonical_url
    from parsedmarc_go_spark.operators.retrieval import build_vocab

    # tracking-param/case variants of one URL + a distinct one
    urls = spark.createDataFrame(
        [
            (1, "HTTP://A.com:80/x?b=2&a=1&utm_source=f"),
            (2, "http://a.com/x?a=1&b=2"),
            (3, "http://a.com/y"),
        ],
        ["doc_id", "url"],
    )
    t = urls.select("doc_id", canonical_url(F.col("url")).alias("canon_url"))
    out = {
        r.canon_url: (r.keep_id, r.dup_count)
        for r in t.groupBy("canon_url")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_count"))
        .collect()
    }
    assert out["http://a.com/x?a=1&b=2"] == (1, 2)
    assert out["http://a.com/y"] == (3, 1)

    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d")], ["doc_id", "text"]
    )
    vocab = {r.token: (r.cnt, r.token_id) for r in build_vocab(docs, size=3).collect()}
    # a=3, b=3 tie -> 'a' wins lexicographically; c/d tie at 1 -> 'c'
    assert vocab == {"a": (3, 0), "b": (3, 1), "c": (1, 2)}
    # min_count prunes the tail before the cut
    v2 = {r.token for r in build_vocab(docs, size=5, min_count=2).collect()}
    assert v2 == {"a", "b"}
