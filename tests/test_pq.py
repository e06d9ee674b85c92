"""IVF-PQ drives (operators/pq.py): planted-neighbor retrieval through
the persisted index, encode determinism, codes-only vs refine layouts,
and the shortlist/rerank contract. The recall/scan operating points
live in scripts/pq_recall.py → RECALL.json; these tests pin the
invariants."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

# IVF-PQ index build/probe e2e: excluded from the default (driver-visible) lane — run with -m ""
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.fixture(scope="module")
def planted(spark):
    from ann_recall import make_corpus

    corpus_rows, qrows, truth = make_corpus(400, 4)
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, label int, embedding array<double>"
    ).cache()
    corpus.count()
    return corpus, qrows, truth


def test_ivf_pq_finds_planted_neighbors(spark, planted, tmp_path):
    from pyspark.sql import functions as F  # noqa: F401

    from parsedmarc_go_spark.operators.pq import (
        build_ivf_pq_index,
        ivf_pq_topk_indexed,
    )

    corpus, qrows, truth = planted
    idx = str(tmp_path / "pq")
    build_ivf_pq_index(corpus, idx, n_cells=8, m=8, ks=16, max_iters=3)
    for qi, qv in qrows:
        q = spark.createDataFrame([(qv,)], "q array<double>")
        got = {
            r.vec_id
            for r in ivf_pq_topk_indexed(spark, idx, q, k=10, nprobe=8).collect()
        }
        # nprobe = all cells -> no coarse loss; the planted neighbors
        # (cosine .86-.94 vs background ~.5) must all survive PQ + rerank
        assert got == truth[qi]
    # determinism: the probe is a pure function of index + query
    q = spark.createDataFrame([(qrows[0][1],)], "q array<double>")
    a = [tuple(r) for r in ivf_pq_topk_indexed(spark, idx, q, k=10, nprobe=4).collect()]
    b = [tuple(r) for r in ivf_pq_topk_indexed(spark, idx, q, k=10, nprobe=4).collect()]
    assert a == b


def test_pq_codebooks_bit_identical_across_partitionings(spark, planted):
    """Round 15: the PQ Lloyd update sums in exact decimal(38,18), so
    codebooks are byte-identical whether the training frame arrives in
    1 partition or 13 — the float-sum version differed at the last bit
    per merge order, which is the accumulation-order flap ADVICE r14
    flagged on ann_ivf_pq_topk."""
    from parsedmarc_go_spark.operators.pq import train_pq_codebooks

    corpus, _, _ = planted
    a = train_pq_codebooks(corpus.coalesce(1), m=4, ks=8, max_iters=3)
    b = train_pq_codebooks(corpus.repartition(13), m=4, ks=8, max_iters=3)
    assert a == b  # nested float lists: bit equality


def test_pq_codes_layout_and_determinism(spark, planted, tmp_path):
    from parsedmarc_go_spark.operators.pq import (
        build_ivf_pq_index,
        load_pq_codebooks,
        pq_encode,
        train_pq_codebooks,
    )

    corpus, _, _ = planted
    books = train_pq_codebooks(corpus, m=8, ks=16, max_iters=2)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    enc = pq_encode(corpus, books)
    rows = enc.select("vec_id", "pq_codes").orderBy("vec_id").limit(20).collect()
    again = enc.select("vec_id", "pq_codes").orderBy("vec_id").limit(20).collect()
    assert [list(r.pq_codes) for r in rows] == [list(r.pq_codes) for r in again]
    assert all(0 <= c < 16 for r in rows for c in r.pq_codes)
    # tinyint codes on disk; codes-only layout stores NO vector copy
    idx = str(tmp_path / "pq_nr")
    build_ivf_pq_index(corpus, idx, n_cells=4, m=8, ks=16, max_iters=2, refine=False)
    stored = spark.read.parquet(idx)
    assert dict(stored.dtypes)["pq_codes"] == "array<tinyint>"
    assert "embedding" not in stored.columns and "embedding_q" not in stored.columns
    loaded = load_pq_codebooks(spark, idx)
    assert np.allclose(np.array(loaded), np.array(books))


def test_rerank_refines_adc_order(spark, planted, tmp_path):
    """With the refine layout, the final top-k comes from exact int8
    cosine over the ADC shortlist — so against planted truth the
    reranked probe is never worse than raw ADC order."""
    from parsedmarc_go_spark.operators.pq import (
        build_ivf_pq_index,
        ivf_pq_topk_indexed,
    )

    corpus, qrows, truth = planted
    idx = str(tmp_path / "pq_r")
    build_ivf_pq_index(corpus, idx, n_cells=8, m=8, ks=16, max_iters=3)
    adc_hits = rr_hits = 0
    for qi, qv in qrows:
        q = spark.createDataFrame([(qv,)], "q array<double>")
        adc = {
            r.vec_id
            for r in ivf_pq_topk_indexed(
                spark, idx, q, k=10, nprobe=8, rerank=0
            ).collect()
        }
        rr = {
            r.vec_id
            for r in ivf_pq_topk_indexed(
                spark, idx, q, k=10, nprobe=8, rerank=50
            ).collect()
        }
        adc_hits += len(adc & truth[qi])
        rr_hits += len(rr & truth[qi])
    assert rr_hits >= adc_hits


def test_train_guards(spark, planted):
    from parsedmarc_go_spark.operators.pq import train_pq_codebooks

    corpus, _, _ = planted
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(corpus, m=7, ks=16)


def test_pq_append_and_compact_identity(spark, planted, tmp_path):
    """An appended index probes identically to a from-scratch index
    built with the same (frozen) quantizers, and compaction collapses
    the append spray without changing any probe result."""
    from parsedmarc_go_spark.operators.pq import (
        append_to_ivf_pq_index,
        build_ivf_pq_index,
        compact_ivf_pq_index,
        ivf_pq_topk_indexed,
        load_ivf_centroids,
        load_pq_codebooks,
        pq_encode,
    )
    from parsedmarc_go_spark.operators.clustering import assign_cells
    from parsedmarc_go_spark.operators.similarity import quantize_embeddings

    corpus, qrows, _ = planted
    first = corpus.filter("vec_id < 300")
    rest = corpus.filter("vec_id >= 300")
    idx = str(tmp_path / "pq_app")
    build_ivf_pq_index(first, idx, n_cells=8, m=8, ks=16, max_iters=3)
    append_to_ivf_pq_index(rest, idx)

    # reference: encode the FULL corpus with the same persisted
    # quantizers and write a fresh index
    cents = load_ivf_centroids(spark, idx)
    books = load_pq_codebooks(spark, idx)
    ref = str(tmp_path / "pq_ref")
    enc = quantize_embeddings(
        pq_encode(assign_cells(corpus, cents, "embedding", "cell"), books)
    ).select("vec_id", "label", "pq_codes", "cell", "embedding_q", "q_scale")
    enc.write.partitionBy("cell").parquet(ref)
    import shutil

    for side in (".centroids", ".pq"):
        shutil.copytree(idx + side, ref + side)

    q = spark.createDataFrame([(qrows[0][1],)], "q array<double>")
    a = [tuple(r) for r in ivf_pq_topk_indexed(spark, idx, q, k=10, nprobe=4).collect()]
    b = [tuple(r) for r in ivf_pq_topk_indexed(spark, ref, q, k=10, nprobe=4).collect()]
    assert a == b

    before, after = compact_ivf_pq_index(spark, idx, target_file_mb=64)
    assert after <= before
    c = [tuple(r) for r in ivf_pq_topk_indexed(spark, idx, q, k=10, nprobe=4).collect()]
    assert c == a


def test_codebook_guard_uses_ks_times_dim(spark):
    """The literal-plan guard must test ks*dim (pq_encode embeds ks*dim
    literals total across its m subspace expressions — assign_cells'
    k*dim rule), not m*ks: a high-dim input with small m*ks previously
    slipped through at 16x the budget (ADVICE r9)."""
    from parsedmarc_go_spark.operators.pq import train_pq_codebooks

    rows = [(i, [float(i + j) for j in range(8192)]) for i in range(2)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # m*ks = 8*16 = 128 — tiny; ks*dim = 16*8192 = 131072 > 65536
    with pytest.raises(ValueError, match="literal-plan centroid budget"):
        train_pq_codebooks(df, m=8, ks=16)
