"""Incremental near-duplicate detection over a growing corpus.

Batch LSH dedup (operators/text.minhash_lsh_pairs) re-hashes the whole
corpus every run; at 100 TB the corpus grows by small deltas and only the
NEW documents need hashing. This module is the streaming recast:

- Structured Streaming (``Trigger.AvailableNow`` + checkpoint) discovers
  only files not yet seen — identical restart semantics to
  streaming/incremental.py.
- Each micro-batch computes band keys (text.lsh_band_keys) for its new
  documents ONLY, joins them against the PERSISTED band index of all
  previously committed documents (new-vs-old) and against itself
  (new-vs-new), then exact-verifies candidates with
  text.exact_jaccard_for_pairs — the same exact-output contract as the
  batch path; LSH only prunes.
- The batch's band keys are appended to the index and its verified pairs
  to the result, both under ``batch=<id>`` partitions written with
  overwrite — foreachBatch is at-least-once, and per-batch overwrite makes
  replays idempotent (the streaming/incremental.py pattern).

Cost per delta: O(new docs) hashing + an equi-join whose left side is the
delta — the corpus is touched only for verification texts of matched
candidates (a semi-join-sized read), never re-hashed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators import text

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def incremental_near_dups(
    spark: SparkSession,
    docs_dir: str,
    work_dir: str,
    k: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> None:
    """Run one AvailableNow pass: new document files -> verified near-dup
    pairs appended to ``work_dir/pairs``; band index grows under
    ``work_dir/index``."""
    index_dir = os.path.join(work_dir, "index")
    pairs_dir = os.path.join(work_dir, "pairs")
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(docs_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_bands = text.lsh_band_keys(batch_df, k, n_hashes, bands)
        new_a = new_bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
        new_b = new_bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
        # new-vs-new inside the batch
        cand = (
            new_a.join(new_b, ["band", "key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        # new-vs-already-committed (persisted index from prior batches)
        try:
            old = spark.read.parquet(index_dir).filter(
                F.col("batch") != batch_id  # replay safety: exclude own write
            )
        except Exception:  # noqa: BLE001 — first batch: no index yet
            old = None
        if old is not None:
            old_pairs = (
                new_b.join(
                    old.select(F.col("doc_id").alias("doc_a"), "band", "key"),
                    ["band", "key"],
                )
                .filter(F.col("doc_a") != F.col("doc_b"))
                .select(
                    F.least("doc_a", "doc_b").alias("doc_a"),
                    F.greatest("doc_a", "doc_b").alias("doc_b"),
                )
            )
            cand = cand.unionByName(old_pairs)
        cand = cand.distinct()
        # exact verification needs both sides' texts: the delta has them;
        # prior docs come from the corpus store (candidate-sized read)
        corpus = spark.read.schema(DOC_SCHEMA).parquet(docs_dir)
        verified = text.exact_jaccard_for_pairs(cand, corpus, k, threshold)
        verified.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch={batch_id}")
        )
        new_bands.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def near_dup_result(spark: SparkSession, work_dir: str) -> DataFrame:
    """All verified near-dup pairs accumulated so far (distinct across
    batches: a pair can only be emitted by the batch that completed it)."""
    pairs = spark.read.parquet(os.path.join(work_dir, "pairs"))
    return pairs.select("doc_a", "doc_b", "jaccard").distinct()
