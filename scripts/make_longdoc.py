"""Long-DOCUMENT skew stress corpus (round-17): the axis the volume
(r15) and key-skew (r16) passes did not cover — per-ROW size skew.

A web/books/code corpus is heavy-tailed in document LENGTH: most docs
are a few hundred tokens, a few are megabytes. Row-size skew stresses
different machinery than key skew:

- explode fan-out per row (shingles, n-grams, paragraphs) is linear in
  doc length, so one giant doc makes one task's explode output dwarf
  its siblings';
- per-doc aggregation buffers (collect_set shingle sets, minhash
  aggregate state) grow with the doc, not the corpus;
- window/sort partitions keyed by doc hold one huge group;
- Arrow batches to Python UDFs carry whole rows — one 8 MB text blows
  a batch sized for 10 KB rows.

Shape: ``--docs`` documents (default 5,000) at the bench generator's
normal lengths, except ``--giants`` (default 5) documents of
``--giant-kb`` (default 2,048 KiB ≈ 400k tokens) built from the SAME
closed vocabulary (so they join the same shingle/minhash key space),
one of which is duplicated once (its near-dup must be FOUND — recall
under size skew, not just survival). Other tables ride make_sf at the
matching SF so every gate runs unchanged.

Usage: python scripts/make_longdoc.py --out /tmp/spark_graft_longdoc
"""

from __future__ import annotations

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_curve import LANGS, VOCAB  # noqa: E402


def make_longdoc_documents(
    out_dir: str,
    n_docs: int = 5000,
    giants: int = 5,
    giant_kb: int = 2048,
    seed: int = 17,
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    texts: list[str] = []
    for i in range(n_docs):
        if i < giants:
            # one giant: ~giant_kb KiB of vocabulary words with a few
            # unique anchors sprinkled so each giant is distinct
            n_words = giant_kb * 1024 // 6
            words = [VOCAB[rng.randrange(len(VOCAB))] for _ in range(n_words)]
            words[0] = f"giantanchor{i}"
            words[len(words) // 2] = f"giantmid{i}"
            texts.append(" ".join(words))
        else:
            n_words = rng.randint(40, 300)
            texts.append(
                " ".join(VOCAB[rng.randrange(len(VOCAB))] for _ in range(n_words))
            )
    # duplicate giant 0 (new id) with ONE word changed: a true near-dup
    # pair where both members are giants
    dup = texts[0].split(" ")
    dup[1] = "giantdupmarker"
    texts.append(" ".join(dup))

    n = len(texts)
    table = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array([f"src{rng.randrange(10)}" for _ in range(n)]),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n)]),
            "text": pa.array(texts),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    print(f"  documents: {n} rows ({giants} giants of ~{giant_kb} KiB + 1 giant dup)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spark_graft_longdoc")
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--giants", type=int, default=5)
    ap.add_argument("--giant-kb", type=int, default=2048)
    args = ap.parse_args()

    from make_sf import main as _  # noqa: F401  (import check only)
    import subprocess

    os.makedirs(args.out, exist_ok=True)
    make_longdoc_documents(args.out, args.docs, args.giants, args.giant_kb)
    # other tables at sf0.1 shape via make_sf into a tmp dir, then link
    tmp = args.out + ".sf"
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "make_sf.py"),
         "--sf", "0.1", "--out", tmp],
        check=True,
    )
    for f in os.listdir(tmp):
        if f != "documents.parquet":
            os.replace(os.path.join(tmp, f), os.path.join(args.out, f))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(f"longdoc corpus at {args.out}")


if __name__ == "__main__":
    main()
