"""Incremental corpus dedup for the streaming path: each arriving
micro-batch of document shards is deduplicated against a PERSISTED
fingerprint store, then appends its own new fingerprints — so a
continuously-growing corpus stays deduped without ever re-scanning
history.

This is the streaming staple the batch dedup family (exact, paragraph,
minhash — operators/dedup.py) does not cover: batch dedup is
corpus-at-rest math, but shards arrive continuously, and re-running a
batch pass over the whole corpus per arrival is O(corpus) per shard.
Here each batch does O(batch) work plus one digest-keyed join against
the store:

- **store** = a parquet table of paragraph (or whole-document) sha256
  digests under ``<store_dir>/fingerprints``, partitioned by
  ``__batch_id`` — the daemon's idempotent-overwrite unit
  (streaming/daemon.py:54-64). Only digests are stored, never text:
  32 bytes per distinct paragraph regardless of document size.
- **dedup** = the batch operators themselves run per micro-batch with
  the store as ``seen_keys`` (operators/dedup.py:paragraph_dedup), so
  stream-over-shards equals batch-over-the-union EXACTLY — pinned in
  tests/test_streaming_dedup.py on a two-trigger run. A ``minhash``
  mode persists banded MinHash bucket keys instead, extending the
  store to NEAR-dup history at 16 fixed-width keys per retained
  document (see make_dedup_processor for its probabilistic contract),
  and a ``substring`` mode persists k-gram digests for incremental
  ExactSubstr (token-resolution store cost — see its contract).
- **idempotence** = both the output table and the store append are
  dynamic-partition overwrites of the batch's own ``__batch_id``
  partition, and the dedup read EXCLUDES the current batch's own
  partition — so a crash-and-replay of batch N sees exactly the store
  state N saw the first time and rewrites identical files.
- **maintenance** = ``compact_fingerprint_store`` folds old batch
  partitions into a single base partition (``__batch_id = -1``) with
  the crash-safe directory swap (storage.py:swap_directory), bounding
  file and partition counts. Structured Streaming replays at most the
  most recent uncommitted batch, so folding everything older than
  ``keep_last`` batches loses no replay granularity.

100 TB shape: the store join is keyed on the 32-byte digest — uniform,
no null class — and the store side is never collected or broadcast (at
corpus scale it IS the corpus's distinct-paragraph set). Per batch:
one shuffle of the batch's paragraphs on ph, one shuffle-join against
the store, one doc_id re-assembly shuffle. Store growth is
O(distinct new paragraphs), and compaction keeps reads at
O(target_file_mb) granularity.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from parsedmarc_go_spark.functions.text import normalized_text
from parsedmarc_go_spark.operators.dedup import (
    minhash_band_signatures,
    neardup_clusters,
    paragraph_dedup,
    paragraph_keys,
)
from parsedmarc_go_spark.storage import _parquet_file_stats, swap_directory
from parsedmarc_go_spark.streaming.daemon import _write_table

STORE_TABLE = "fingerprints"
DEDUP_TABLES = ("docs_deduped",)
_EMPTY_STORE_SCHEMA = "ph string, __batch_id bigint"


def read_fingerprints(
    spark: SparkSession, store_dir: str, exclude_batch_id: int | None = None
) -> DataFrame:
    """The persisted digest store (columns ``ph, __batch_id``), empty
    if no batch has landed yet. ``exclude_batch_id`` drops that batch's
    own partition — the replay-idempotence filter: a re-run of batch N
    must see the store exactly as the first run of N did."""
    path = os.path.join(store_dir, STORE_TABLE)
    try:
        df = spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], _EMPTY_STORE_SCHEMA)
    if exclude_batch_id is not None:
        df = df.filter(F.col("__batch_id") != exclude_batch_id)
    return df


def make_dedup_processor(
    out_dir: str,
    store_dir: str,
    mode: str = "paragraph",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    normalize: bool = False,
    substring_k: int = 8,
):
    """foreachBatch body for incremental dedup, factored out (the
    curation-stage pattern, streaming/curation.py:45) so idempotence
    and stream-vs-batch parity are directly testable.

    ``mode="paragraph"``: CCNet paragraph dedup — the output table has
    the paragraph_dedup row shape (n_paras / n_kept /
    para_frac_removed / dedup_text) and the store holds paragraph
    digests. ``mode="document"``: whole-document exact dedup on the
    normalized-text sha256 (the exact_dedup_groups key,
    operators/dedup.py:26-60) — the output table keeps the surviving
    input rows and the store holds document digests.

    ``mode="substring"``: incremental ExactSubstr (Lee et al. 2021 —
    operators/substring.py). The store holds k-gram sha256 digests of
    every document seen; an arriving gram colliding with history is
    removable even as a first-in-this-batch occurrence (its true first
    occurrence lives in history), within-batch duplicates follow the
    normal keep-first rule, and the output table carries the stripped
    text (``substring_dedup`` row shape). Store cost is the honest
    caveat: O(distinct grams) ≈ 32 bytes per corpus token position —
    at substring granularity incremental dedup pays for history at
    token resolution, which is why paragraph/minhash modes are the
    default scale paths and this mode suits bounded high-value corpora
    (eval sets, dedup-critical slices). ``substring_k`` sets the gram
    width (default 8; the paper uses 50 tokens).

    ``mode="minhash"``: incremental NEAR-dup dedup. The store holds
    banded MinHash bucket keys (``band:sig`` strings from
    minhash_band_signatures) of the documents RETAINED so far; an
    arriving doc is dropped if ANY of its bands collides with history
    (probabilistic, no exact verify against history — the historical
    text is not stored, only 16 fixed-width keys per doc; with the
    default K=32/b=16/r=2 S-curve a false drop needs a 2-hash
    collision, P ≈ 1e-5 per band for unrelated docs). Within the
    batch, candidate pairs ARE exact-verified (minhash_lsh_pairs) and
    each near-dup component keeps its smallest id. Only SURVIVORS'
    band keys append to the store — a dropped doc's buckets are
    covered by the retained near-duplicate it collided with."""
    if mode not in ("paragraph", "document", "minhash", "substring"):
        raise ValueError(
            "mode must be 'paragraph', 'document', 'minhash' or "
            f"'substring', got {mode!r}"
        )

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            seen = read_fingerprints(spark, store_dir, exclude_batch_id=batch_id)
            batch = batch.persist()  # scanned by both the output and the store append
            extra_persists: list[DataFrame] = []
            if mode == "paragraph":
                out = paragraph_dedup(
                    batch, id_col, text_col, sep=sep,
                    normalize=normalize, seen_keys=seen,
                )
                keys = paragraph_keys(
                    batch, id_col, text_col, sep=sep, normalize=normalize
                )
            elif mode == "substring":
                from parsedmarc_go_spark.operators.substring import (
                    gram_keys,
                    substring_dedup,
                )

                out = substring_dedup(
                    batch,
                    id_col,
                    text_col,
                    k=substring_k,
                    seen_keys=seen.select(F.col("ph").alias("gh")),
                )
                keys = gram_keys(batch, id_col, text_col, k=substring_k).select(
                    F.col("gh").alias("ph")
                )
            elif mode == "minhash":
                from parsedmarc_go_spark.operators.dedup import minhash_lsh_pairs

                # the shingle pipeline reads the column literally named
                # "text" (operators/dedup.py:_shingle_stream)
                mb = (
                    batch
                    if text_col == "text"
                    else batch.withColumnRenamed(text_col, "text")
                )
                sigs = minhash_band_signatures(mb, id_col).select(
                    F.col("doc").alias(id_col),
                    F.concat_ws(":", "band", "sig").alias("ph"),
                )
                near_seen = (
                    sigs.join(seen.select("ph").distinct(), "ph")
                    .select(id_col)
                    .distinct()
                )
                remaining = mb.join(near_seen, id_col, "left_anti").persist()
                extra_persists.append(remaining)
                # within-batch: exact-verified pairs -> components ->
                # keep the smallest id of each near-dup group
                pairs = minhash_lsh_pairs(remaining, id_col)
                dropped = (
                    neardup_clusters(
                        pairs.select(
                            F.col("doc_a").alias("doc_a"),
                            F.col("doc_b").alias("doc_b"),
                        )
                    )
                    .filter(F.col("doc") != F.col("cluster_id"))
                    .select(F.col("doc").alias(id_col))
                )
                out = remaining.join(dropped, id_col, "left_anti")
                if text_col != "text":
                    out = out.withColumnRenamed("text", text_col)
                keys = (
                    sigs.join(
                        out.select(id_col), id_col
                    ).select("ph").distinct()
                )
            else:
                fps = batch.withColumn(
                    "__ph", F.sha2(normalized_text(text_col), 256)
                )
                w = Window.partitionBy("__ph").orderBy(F.col(id_col))
                out = (
                    fps.join(
                        seen.select(F.col("ph").alias("__ph"))
                        .distinct()
                        .withColumn("__seen", F.lit(True)),
                        "__ph",
                        "left",
                    )
                    .withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__seen").isNull() & (F.col("__rn") == 1))
                    .drop("__ph", "__seen", "__rn")
                )
                keys = fps.select(F.col("__ph").alias("ph")).distinct()
            # only digests the store has never seen are appended; the
            # localCheckpoint materializes them BEFORE the store write so
            # the write never overwrites a path its own plan is reading
            new_keys = keys.join(
                seen.select("ph").distinct(), "ph", "left_anti"
            ).localCheckpoint()
            _write_table(out, out_dir, "docs_deduped", batch_id)
            _write_table(new_keys, store_dir, STORE_TABLE, batch_id)
            for df in extra_persists:
                df.unpersist()
            batch.unpersist()
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return process_batch


def stream_dedup(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema,
    mode: str = "paragraph",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    normalize: bool = False,
    substring_k: int = 8,
    max_files_per_trigger: int = 1000,
    available_now: bool = True,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """readStream(parquet document shards) → dedup-against-store →
    foreachBatch writing ``docs_deduped`` and appending the store.
    Same source/trigger knobs as the curation stage."""
    docs = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )
    writer = docs.writeStream.foreachBatch(
        make_dedup_processor(
            out_dir, store_dir, mode, id_col, text_col, sep, normalize,
            substring_k,
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def compact_fingerprint_store(
    spark: SparkSession,
    store_dir: str,
    keep_last: int = 2,
    target_file_mb: int = 128,
) -> tuple[int, int]:
    """Fold every fingerprint partition older than the newest
    ``keep_last`` batches into the single base partition
    ``__batch_id = -1``, rewritten at ``target_file_mb`` granularity
    and swapped in crash-safe (storage.py:swap_directory).

    Safe because Structured Streaming replays at most the most recent
    uncommitted batch: a batch old enough to be folded can never replay,
    so its partition identity is no longer needed for idempotence —
    only its digests' MEMBERSHIP, which the fold preserves exactly.
    Returns ``(files_before, files_after)``; no-op when nothing is old
    enough to fold."""
    path = os.path.join(store_dir, STORE_TABLE)
    df = spark.read.parquet(path)
    # bounded collect: one value per micro-batch partition, not per row
    batches = sorted(
        r[0] for r in df.select("__batch_id").distinct().collect() if r[0] >= 0
    )
    fold = batches[:-keep_last] if keep_last > 0 else batches
    if not fold:
        files_before, _ = _parquet_file_stats(spark, path)
        return files_before, files_before
    files_before, total_bytes = _parquet_file_stats(spark, path)
    n_tasks = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + ".compacting"
    folded = df.withColumn(
        "__batch_id",
        F.when(F.col("__batch_id").isin([-1, *fold]), F.lit(-1)).otherwise(
            F.col("__batch_id")
        ),
    )
    (
        folded.repartition(n_tasks, F.col("__batch_id"))
        .write.mode("overwrite")
        .partitionBy("__batch_id")
        .parquet(tmp)
    )
    swap_directory(spark, tmp, path)
    files_after, _ = _parquet_file_stats(spark, path)
    return files_before, files_after
