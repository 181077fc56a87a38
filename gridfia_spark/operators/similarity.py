"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k with all math in built-in JVM
expressions (``transform``/``zip_with``/``aggregate`` — whole-stage codegen,
no Python in the hot path). Scale path: LSH-bucketed ANN via random
hyperplane signatures (SimHash for vectors) — candidates only where a band
matches, then exact re-ranking; recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_l2_norm(emb: DataFrame, col: str = "embedding") -> DataFrame:
    vec = F.transform(F.col(col), lambda x: x.cast("double"))
    return emb.withColumn("l2_norm", F.sqrt(_dot(vec, vec)))


def cosine_topk(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query among targets.

    Both inputs need (vec_id, embedding). Ranking is over the rounded cosine
    (round_dp) with vec_id tie-break, making ranks reproducible across
    engines and summation orders. Query side is broadcast (small); targets
    stream — no shuffle of the big side."""
    q = queries.select(
        F.col("vec_id").alias("q_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("q_vec"),
    )
    t = targets.select(
        F.col("vec_id").alias("t_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("t_vec"),
    )
    pairs = t.join(F.broadcast(q), F.col("q_id") != F.col("t_id"))
    cos = _dot(F.col("q_vec"), F.col("t_vec")) / (
        F.sqrt(_dot(F.col("q_vec"), F.col("q_vec")))
        * F.sqrt(_dot(F.col("t_vec"), F.col("t_vec")))
    )
    scored = pairs.select(
        "q_id", "t_id", F.round(cos, round_dp).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("t_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("rank").cast("int").alias("rank"), "t_id", "cosine")
    )


def hyperplane_signature(
    emb: DataFrame, n_planes: int = 16, seed: int = 42, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH signature as an int64 bitmask column.

    Hyperplanes are a deterministic seeded matrix evaluated with built-in
    expressions: bit_i = (dot(v, h_i) > 0)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    vec = F.transform("embedding", lambda x: x.cast("double"))
    bits = None
    for i in range(n_planes):
        h = F.array(*[F.lit(float(v)) for v in planes[i]])
        bit = (_dot(vec, h) > 0).cast("long") * F.lit(1 << i)
        bits = bit if bits is None else bits + bit
    return emb.withColumn("lsh_sig", bits)


def ann_cosine_topk(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: LSH band match -> exact cosine re-rank.

    Band keys are slices of the hyperplane signature; a pair is a candidate
    iff at least one band matches. Plan: signatures map-side, band explode,
    equi-join on (band, key) — the scalable alternative to the O(n*m)
    crossJoin at 10^12 scale. Candidate dedup is on (q_id, t_id) ONLY —
    embeddings are re-joined after the distinct, so the exchange shuffles
    ids, never the corpus vectors."""
    bits_per = n_planes // bands

    def banded(df: DataFrame, id_alias: str) -> DataFrame:
        sig = hyperplane_signature(df, n_planes, seed, dim)
        mask = (1 << bits_per) - 1
        exprs = [
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("lsh_sig", b * bits_per).bitwiseAND(F.lit(mask)).alias("key"),
            )
            for b in range(bands)
        ]
        return sig.select(
            F.col("vec_id").alias(id_alias),
            F.explode(F.array(*exprs)).alias("bk"),
        ).select(id_alias, "bk.band", "bk.key")

    qb = banded(queries, "q_id")
    tb = banded(targets, "t_id")
    cand = (
        qb.join(tb, ["band", "key"])
        .filter(F.col("q_id") != F.col("t_id"))
        .select("q_id", "t_id")
        .distinct()
    )
    q_emb = queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    t_emb = targets.select(F.col("vec_id").alias("t_id"), F.col("embedding").alias("t_emb"))
    pairs = cand.join(F.broadcast(q_emb), "q_id").join(t_emb, "t_id")
    qv = F.transform("q_emb", lambda x: x.cast("double"))
    tv = F.transform("t_emb", lambda x: x.cast("double"))
    cos = _dot(qv, tv) / (F.sqrt(_dot(qv, qv)) * F.sqrt(_dot(tv, tv)))
    scored = pairs.select("q_id", "t_id", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("t_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("rank").cast("int").alias("rank"), "t_id", "cosine")
    )


def _centroids(n_clusters: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_clusters, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def train_ivf_centroids(
    targets: DataFrame,
    n_clusters: int = 16,
    dim: int = 64,
    seed: int = 7,
    sample_size: int = 2048,
    iters: int = 10,
) -> np.ndarray:
    """Spherical k-means codebook trained on a DETERMINISTIC sample of the
    corpus — the quality upgrade over the seeded random codebook (which
    stays as the fallback when no training pass is affordable).

    Scale shape: the sample is the hash-order top-``sample_size`` rows —
    Spark compiles orderBy+limit to TakeOrderedAndProject (per-partition
    top-k, merged on the driver; no full sort shuffle), so the training
    input is O(sample_size) regardless of corpus size. Training itself is
    driver-side numpy (k-means++ init, Lloyd iterations with cosine
    geometry: unit-normalize, assign by max dot, mean + renormalize;
    empty clusters re-seeded from the worst-assigned point) — O(sample *
    k * dim * iters) flops, milliseconds for any sane codebook. The
    result ships to executors as plan literals like the seeded codebook."""
    rows = (
        targets.select("vec_id", "embedding")
        .orderBy(F.abs(F.hash("vec_id")), F.col("vec_id"))
        .limit(sample_size)
        .collect()
    )
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    if x.shape[0] < n_clusters:
        raise ValueError(
            f"train_ivf_centroids: sample ({x.shape[0]}) smaller than "
            f"n_clusters ({n_clusters})"
        )
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    # k-means++ seeding in cosine distance (1 - dot on unit vectors)
    cents = np.empty((n_clusters, dim))
    cents[0] = x[rng.integers(len(x))]
    d = 1.0 - x @ cents[0]
    for i in range(1, n_clusters):
        p = np.maximum(d, 0)
        tot = p.sum()
        idx = rng.choice(len(x), p=p / tot) if tot > 0 else rng.integers(len(x))
        cents[i] = x[idx]
        d = np.minimum(d, 1.0 - x @ cents[i])
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(n_clusters):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cents[c] = v / n
            else:
                cents[c] = x[sims.max(axis=1).argmin()]
    return cents


def with_ivf_cluster(
    emb: DataFrame,
    n_clusters: int = 16,
    seed: int = 7,
    dim: int = 64,
    col: str = "ivf_cluster",
    nprobe: int = 1,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest IVF centroids (max cosine
    against the codebook) — built-in expressions only. ``centroids`` takes
    a trained codebook (train_ivf_centroids); default is the deterministic
    seeded random codebook.

    nprobe=1 -> a single int column; nprobe>1 -> exploded (vector, cluster)
    rows, the query-side multi-probe of IVF search."""
    cents = centroids if centroids is not None else _centroids(n_clusters, dim, seed)
    n_clusters = len(cents)
    vec = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(_dot(vec, vec))
    scored = F.array(
        *[
            F.struct(
                (_dot(vec, F.array(*[F.lit(float(v)) for v in cents[i]])) / norm).alias("cos"),
                F.lit(i).alias("cid"),
            )
            for i in range(n_clusters)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    if nprobe == 1:
        return emb.withColumn(col, F.element_at(top, 1)["cid"])
    return emb.withColumn(col, F.explode(F.transform(top, lambda s: s["cid"])))


def build_ivf_index(
    targets: DataFrame,
    path: str,
    n_clusters: int = 16,
    seed: int = 7,
    dim: int = 64,
    centroids: np.ndarray | None = None,
) -> None:
    """Materialize the inverted file (``t_id -> cl``) to Parquet once, so
    every later query skips the corpus-wide assignment pass — the
    build-once/query-many split of production ANN serving. Pass the read
    table back to ``ivf_cosine_topk(assignments=...)``.

    A trained ``centroids`` codebook is persisted alongside the file as
    ``_codebook.json`` (underscore-prefixed: invisible to parquet
    listings), so queries against the index probe the SAME codebook —
    load it back with ``load_ivf_codebook(path)``."""
    with_ivf_cluster(
        targets, n_clusters, seed, dim, nprobe=1, centroids=centroids
    ).select(
        F.col("vec_id").alias("t_id"),
        F.col("ivf_cluster").alias("cl"),
    ).write.mode("overwrite").parquet(path)
    if centroids is not None:
        import json
        import os

        with open(os.path.join(path, "_codebook.json"), "w") as fh:
            json.dump(np.asarray(centroids).tolist(), fh)


def load_ivf_codebook(path: str) -> np.ndarray | None:
    """The trained codebook persisted by build_ivf_index, or None if the
    index was built with the seeded fallback."""
    import json
    import os

    p = os.path.join(path, "_codebook.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return np.array(json.load(fh), dtype=np.float64)


def ivf_cosine_topk(
    queries: DataFrame,
    targets: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    dim: int = 64,
    assignments: DataFrame | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: targets bucketed by nearest centroid (the inverted file);
    queries probe their ``nprobe`` nearest centroids; candidates re-ranked by
    exact cosine. The bucket equi-join is the scale path — each query scans
    ~nprobe/n_clusters of the corpus instead of all of it.

    ``assignments`` (from build_ivf_index) replaces the in-flight target
    assignment pass with the persisted inverted file; ``centroids`` probes
    a trained codebook (must be the one the index was built with — use
    ``load_ivf_codebook``) instead of the seeded fallback."""
    t = assignments if assignments is not None else with_ivf_cluster(
        targets, n_clusters, seed, dim, nprobe=1, centroids=centroids
    ).select(
        F.col("vec_id").alias("t_id"),
        F.col("ivf_cluster").alias("cl"),
    )
    qc = with_ivf_cluster(
        queries, n_clusters, seed, dim, nprobe=nprobe, centroids=centroids
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("ivf_cluster").alias("cl"),
    )
    # dedup multi-probe candidates on ids only, then re-join embeddings —
    # the distinct exchange never carries the vectors
    cand = qc.join(t, "cl").filter(F.col("q_id") != F.col("t_id")).select(
        "q_id", "t_id"
    ).distinct()
    q_emb = queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    t_emb = targets.select(F.col("vec_id").alias("t_id"), F.col("embedding").alias("t_emb"))
    pairs = cand.join(F.broadcast(q_emb), "q_id").join(t_emb, "t_id")
    qv = F.transform("q_emb", lambda x: x.cast("double"))
    tv = F.transform("t_emb", lambda x: x.cast("double"))
    cos = _dot(qv, tv) / (F.sqrt(_dot(qv, qv)) * F.sqrt(_dot(tv, tv)))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("t_id"))
    return (
        pairs.select("q_id", "t_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("rank").cast("int").alias("rank"), "t_id", "cosine")
    )


def embedding_cosine_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH band candidates + exact cosine
    verify, NO top-k cap (dedup wants every pair over the threshold).

    Output contract: exact for every pair whose vectors share at least one
    LSH band — identical/near-identical vectors always do (identical
    signatures), so true duplicates cannot be pruned. The candidate
    self-join and the (vec_a, vec_b) distinct carry ids only; embeddings
    re-join afterwards."""
    bits_per = n_planes // bands
    sig = hyperplane_signature(emb, n_planes, seed, dim)
    mask = (1 << bits_per) - 1
    exprs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("lsh_sig", b * bits_per).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "vec_id", F.explode(F.array(*exprs)).alias("bk")
    ).select("vec_id", "bk.band", "bk.key")
    a = banded.select(F.col("vec_id").alias("vec_a"), "band", "key")
    b = banded.select(F.col("vec_id").alias("vec_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = cand.join(ea, "vec_a").join(eb, "vec_b")
    av = F.transform("ea", lambda x: x.cast("double"))
    bv = F.transform("eb", lambda x: x.cast("double"))
    cos = _dot(av, bv) / (F.sqrt(_dot(av, av)) * F.sqrt(_dot(bv, bv)))
    return (
        pairs.select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
