"""Text-pipeline operators over the ``documents`` table: dedup families,
token/quality stats, fingerprinting, language scoring.

These are the large-scale training-data operations the engine adds beyond
the reference's raster suite (driver mandate). Everything stays JVM-side
(built-in functions — split/regexp/md5/xxhash64/explode) except MinHash
signature generation, which is a vectorized pandas UDF.

Scale notes: exact dedup is a hash groupBy (one shuffle on the hash);
MinHash-LSH turns O(n^2) near-dup detection into band-bucket equi-joins —
candidate pairs only where a band matches; SimHash is a single map +
self-join on band keys. All join keys are 64-bit ints.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ------------------------------------------------------------- exact dedup


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash (hash-groupBy dedup).

    Returns (text_hash, n_docs, canonical_id) — canonical = min doc_id,
    the standard keep-first policy."""
    return (
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


# ------------------------------------------------------------ token stats


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting + quality scoring (length / punctuation / stopword
    ratios) — whitespace tokenization, all built-in expressions."""
    length = F.length("text")
    tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    the_cnt = (length - F.length(F.regexp_replace("text", F.lit(" the "), F.lit("")))) / 5
    return docs.select(
        "doc_id",
        length.alias("n_chars"),
        tokens.cast("long").alias("n_tokens"),
        (length / tokens).alias("chars_per_token"),
        (punct / length).alias("punct_ratio"),
        (the_cnt / tokens).alias("stopword_ratio"),
    )


# ----------------------------------------------------------- fingerprints


def shingles(docs: DataFrame, k: int = 5) -> DataFrame:
    """Explode documents into k-char shingles (doc_id, pos, shingle)."""
    n = F.greatest(F.length("text") - F.lit(k - 1), F.lit(1))
    return docs.select(
        "doc_id", F.explode(F.sequence(F.lit(1), n)).alias("pos"), "text"
    ).select(
        "doc_id",
        "pos",
        F.expr(f"substring(text, pos, {k})").alias("shingle"),
    )


def doc_fingerprint(docs: DataFrame, k: int = 5) -> DataFrame:
    """Rolling-hash document fingerprint: min(md5(shingle)) per doc — the
    1-permutation MinHash, SQL-checkable."""
    sh = shingles(docs, k)
    return sh.groupBy("doc_id").agg(F.min(F.md5(F.col("shingle").cast("binary"))).alias("fingerprint"))


def minhash_signatures(docs: DataFrame, k: int = 5, n_hashes: int = 32) -> DataFrame:
    """MinHash signatures via xxhash64 with per-permutation seeds — one
    explode + one groupBy; signature as array<long>."""
    sh = shingles(docs, k)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("signature")
    )


def lsh_band_keys(
    docs: DataFrame, k: int = 5, n_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """(doc_id, band, key) LSH band rows — the joinable/persistable form of
    a document's MinHash identity. Shared by the batch pair join below and
    the incremental index in streaming/dedup.py."""
    rows = n_hashes // bands
    sig = minhash_signatures(docs, k, n_hashes)
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col("signature")[i] for i in range(b * rows, (b + 1) * rows)]
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    return banded.selectExpr(
        "doc_id",
        f"stack({bands}, "
        + ", ".join(f"{b}, b{b}" for b in range(bands))
        + ") as (band, key)",
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified by exact
    shingle-set Jaccard: returns (doc_a, doc_b, jaccard) with jaccard >=
    threshold and doc_a < doc_b.

    Plan: signature -> band keys -> self equi-join per band (candidates) ->
    exact Jaccard via shingle-set intersection join (verification, so output
    is exact — LSH only prunes)."""
    bands_long = lsh_band_keys(docs, k, n_hashes, bands)
    cand = (
        bands_long.alias("a")
        .join(
            bands_long.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verification: Jaccard over distinct shingle sets (LSH only
    # prunes candidates; the output contract is exact)
    return exact_jaccard_for_pairs(cand, docs, k, threshold)


def exact_jaccard_for_pairs(
    cand: DataFrame, docs: DataFrame, k: int = 5, threshold: float = 0.5
) -> DataFrame:
    """Exact shingle-set Jaccard for an explicit (doc_a, doc_b) candidate
    list — the verification stage of every LSH dedup path (batch and
    incremental). ``docs`` must contain both sides' texts; only candidate
    documents' shingles flow into the intersection join."""
    sh = shingles(docs, k).select("doc_id", "shingle").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b_sh = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 5, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity join (no LSH pruning) — the oracle
    path for small inputs; shares the shingle machinery."""
    sh = shingles(docs, k).select("doc_id", "shingle").distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash64(docs: DataFrame, k: int = 5) -> DataFrame:
    """64-bit SimHash over k-shingles: sign-sum of per-shingle xxhash64 bits.

    Pure built-in expressions: one groupBy(doc_id) with 64 bit-vote sums
    (whole-stage codegen, map-side partial aggregation — no Python at all),
    then the signed-long bit assembly. At billions of docs this is one
    ordinary aggregate, with none of the per-doc Python-call overhead of an
    applyInPandas formulation."""
    sh = shingles(docs, k).select("doc_id", F.xxhash64("shingle").alias("h"))
    votes = [
        F.sum(
            F.shiftright("h", i).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = sh.groupBy("doc_id").agg(*votes)
    # disjoint powers of two: addition == bitwise OR; shiftleft(1, 63) wraps
    # to the sign bit, matching the int64 (two's complement) simhash value
    val = None
    for i in range(64):
        bit = F.shiftleft((F.col(f"v{i}") > 0).cast("long"), i)
        val = bit if val is None else val + bit
    return agg.select("doc_id", val.alias("simhash"))


_POLY_MOD = 2147483647  # 2^31 - 1: keeps the fold in exact BIGINT range on
# engines with strict (non-wrapping) int64 arithmetic


def _poly_hash(seed: int, mult: int):
    """31-bit polynomial rolling hash of the shingle column — a HASH BOTH
    ENGINES CAN COMPUTE (fold of (a*mult + ascii(char)) % (2^31-1)), unlike
    xxhash64. Exact in int64: max intermediate < 2^31 * mult + 255."""
    return F.expr(
        "aggregate(transform(sequence(1, length(shingle)), "
        "i -> CAST(ascii(substring(shingle, i, 1)) AS BIGINT)), "
        f"{seed}L, (a, c) -> (a * {mult}L + c) % {_POLY_MOD}L)"
    )


def simhash_portable(docs: DataFrame, k: int = 5) -> DataFrame:
    """62-bit SimHash from two independent 31-bit polynomial shingle hashes
    (bits 0-30 from h1, 31-61 from h2) — the same bit-vote aggregation as
    ``simhash64`` but with an engine-portable hash, so the whole pipeline is
    SQL-oracle-checkable. ``simhash64`` (xxhash64) remains the production
    variant; this one exists to put the simhash MACHINERY (multiset shingle
    votes, sign assembly) through the value gate."""
    sh = shingles(docs, k).select(
        "doc_id",
        _poly_hash(17, 31).alias("h1"),
        _poly_hash(29, 37).alias("h2"),
    )
    votes = []
    for i in range(62):
        src, off = ("h1", i) if i < 31 else ("h2", i - 31)
        votes.append(
            F.sum(
                F.shiftright(src, off).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)
            ).alias(f"v{i}")
        )
    agg = sh.groupBy("doc_id").agg(*votes)
    val = None
    for i in range(62):
        bit = F.shiftleft((F.col(f"v{i}") > 0).cast("long"), i)
        val = bit if val is None else val + bit
    return agg.select("doc_id", val.alias("simhash"))


def near_dup_components(pairs: DataFrame, docs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components over the near-dup pair graph: every document
    gets the component id = min doc_id reachable through near-dup edges
    (the canonical-representative assignment of a dedup pipeline; singletons
    are their own component).

    Algorithm: distributed min-label propagation to fixpoint — each round
    joins labels across edges and takes the elementwise min; converges in
    O(graph diameter) rounds (near-dup clusters are tiny, so a handful).
    Each round is one shuffle of (node, label) pairs; the edge list is
    cached. The driver-side loop checks a scalar convergence count only —
    no data ever collects. Each round's labels are ``localCheckpoint``-ed,
    which truncates the logical plan: without it the lineage nests one
    level per round and round-50 analysis/recompute walks the entire
    history — the iterative-algorithm driver blow-up at scale (same fix
    GraphX/GraphFrames apply)."""
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().cache()
    labels = docs.select(F.col("doc_id").alias("node"), F.col("doc_id").alias("comp"))
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()  # materialize AND truncate lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"label propagation did not converge in max_iter={max_iter} "
            f"rounds ({changed} labels still changing) — the pair graph has "
            "diameter > max_iter; raise max_iter"
        )
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"),
        "comp",
        (F.col("node") == F.col("comp")).cast("int").alias("is_canonical"),
    )


def lang_scores(docs: DataFrame) -> DataFrame:
    """n-gram/stopword language-ID heuristic: per-language stopword hit
    counts + predicted language (argmax, ties -> lexicographic)."""
    text = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    scores = {
        "en": [" the ", " and ", " of "],
        "de": [" der ", " und ", " die "],
        "fr": [" le ", " et ", " la "],
    }

    def count_of(token: str):
        return (F.length(text) - F.length(F.regexp_replace(text, F.lit(token), F.lit("")))) / len(token)

    cols = [
        sum(count_of(t) for t in toks).cast("long").alias(f"score_{lang}")
        for lang, toks in scores.items()
    ]
    d = docs.select("doc_id", "lang", *cols)
    pred = (
        F.when(
            (F.col("score_de") > F.col("score_en")) & (F.col("score_de") >= F.col("score_fr")),
            F.lit("de"),
        )
        .when(
            (F.col("score_fr") > F.col("score_en")) & (F.col("score_fr") > F.col("score_de")),
            F.lit("fr"),
        )
        .otherwise(F.lit("en"))
    )
    return d.withColumn("predicted_lang", pred)


def top_docs_by_quality(docs: DataFrame, n: int = 10) -> DataFrame:
    """Ranked quality report (top-k window): longest docs per source."""
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
        .select("source", F.col("rk").cast("int").alias("rk"), "doc_id", "n_chars")
    )
