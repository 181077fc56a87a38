"""Training-data pipeline facade: the LLM-corpus operations in one place.

`api.GridFIASpark` fronts the reference-parity raster surface; this class
fronts the engine's large-scale data-pipeline extensions (dedup, similarity,
multimodal, batching) so a corpus curator discovers them without knowing the
operator modules. Every method is a thin delegation — the operators stay
independently importable and tested.

Typical flow (see examples/corpus_dedup_pipeline.py and
examples/multimodal_pipeline.py for runnable versions)::

    p = DataPipeline(spark)
    docs = spark.read.parquet(".../documents.parquet")
    groups = p.exact_dedup_groups(docs)             # hash-groupBy dedup
    pairs = p.near_dup_pairs(docs)                  # MinHash-LSH, exact-verify
    comps = p.near_dup_components(pairs, docs)      # canonical representatives
    splits = p.split(docs)                          # train/val/test hash split
    dirty = p.contamination(docs)                   # benchmark overlap
    packed = p.pack(docs, budget=4096)              # token-budget batches
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class DataPipeline:
    """Facade over the corpus/dedup/similarity/multimodal operator family."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # ------------------------------------------------------------- text
    def exact_dedup_groups(self, docs: DataFrame) -> DataFrame:
        from .operators import text

        return text.exact_dedup_groups(docs)

    def near_dup_pairs(self, docs: DataFrame, k: int = 5, threshold: float = 0.5) -> DataFrame:
        from .operators import text

        return text.minhash_lsh_pairs(docs, k=k, threshold=threshold)

    def near_dup_components(self, pairs: DataFrame, docs: DataFrame) -> DataFrame:
        from .operators import text

        return text.near_dup_components(pairs, docs)

    def quality(self, docs: DataFrame) -> DataFrame:
        from .operators import text

        return text.token_stats(docs)

    def language_id(self, docs: DataFrame) -> DataFrame:
        from .operators import text

        return text.lang_scores(docs)

    # ------------------------------------------------------- embeddings
    def cosine_topk(self, queries: DataFrame, targets: DataFrame, k: int = 5) -> DataFrame:
        from .operators import similarity

        return similarity.cosine_topk(queries, targets, k=k)

    def ann_topk(self, queries: DataFrame, targets: DataFrame, k: int = 5) -> DataFrame:
        from .operators import similarity

        return similarity.ann_cosine_topk(queries, targets, k=k)

    def build_ann_index(self, targets: DataFrame, path: str) -> None:
        from .operators import similarity

        similarity.build_ivf_index(targets, path)

    def ann_topk_indexed(
        self, queries: DataFrame, targets: DataFrame, index_path: str, k: int = 5
    ) -> DataFrame:
        from .operators import similarity

        return similarity.ivf_cosine_topk(
            queries, targets, k=k,
            assignments=self.spark.read.parquet(index_path),
        )

    def embedding_dedup(self, emb: DataFrame, threshold: float = 0.95) -> DataFrame:
        from .operators import similarity

        return similarity.embedding_cosine_dedup(emb, threshold=threshold)

    # -------------------------------------------------------- multimodal
    def image_near_dup(self, media: DataFrame, max_hamming: int = 3) -> DataFrame:
        from .operators import phash

        return phash.near_dup_pairs(
            phash.portable_phash_bands(media), max_hamming=max_hamming
        )

    def extract_features(self, media: DataFrame) -> DataFrame:
        from .operators import multimodal

        return multimodal.extract_features(media)

    def thumbnails(self, media: DataFrame, w: int = 8, h: int = 8) -> DataFrame:
        from .operators import multimodal

        return multimodal.resize(media, w, h)

    def sample_frames(self, media: DataFrame, every_k: int = 2) -> DataFrame:
        from .operators import multimodal

        return multimodal.sample_frames(media, every_k=every_k)

    # ---------------------------------------------------------- batching
    def split(self, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
        """Deterministic 80/10/10 hash split column (reproducible at any
        cluster size)."""
        bucket = (F.col(id_col) * F.lit(2654435761)) % F.lit(2147483648) % 100
        return docs.withColumn(
            "split",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
        )

    def pack(
        self,
        docs: DataFrame,
        budget: int = 4096,
        id_col: str = "doc_id",
        tokens_col: str = "n_chars",
    ) -> DataFrame:
        """Token-budget contiguous packing via the distributed prefix sum."""
        from .functions import prefix

        cum = prefix.prefix_sum(docs, id_col, tokens_col)
        return cum.withColumn(
            "bin",
            F.floor((F.col("cum") - F.col(tokens_col)) / budget).cast("long"),
        )

    def contamination(
        self, docs: DataFrame, k: int = 12, id_col: str = "doc_id"
    ) -> DataFrame:
        """Test-split documents sharing verbatim k-grams with the train
        split (pre-evaluation decontamination)."""
        from .operators import text

        with_split = self.split(docs, id_col)
        tr = text.shingles(with_split.filter(F.col("split") == "train"), k).select(
            F.col(id_col).alias("train_doc"), "shingle"
        ).distinct()
        te = text.shingles(with_split.filter(F.col("split") == "test"), k).select(
            F.col(id_col).alias("test_doc"), "shingle"
        ).distinct()
        ov = tr.join(F.broadcast(te), "shingle")
        return ov.groupBy(F.col("test_doc").alias(id_col)).agg(
            F.countDistinct("shingle").alias("n_shared_shingles"),
            F.countDistinct("train_doc").alias("n_train_docs"),
        )


class RasterPipeline:
    """Facade over the round-5 raster/store analytics family — the
    epoch-lifecycle toolkit (persist, grow, compare, derive) in one
    discoverable place. Every method is a thin delegation; the operator
    modules stay independently importable and tested. Typical lifecycle
    (see examples/raster_analytics.py for a runnable version)::

        rp = RasterPipeline(spark)
        rp.create_store(tiles, "a.zarr")             # epoch A persists
        rp.stream_ingest(drops_dir, "a.zarr", work)  # drops grow it
        fixed = rp.normalize(epoch_b, tiles)         # kill sensor drift
        rp.create_store(fixed, "b.zarr")
        chg = rp.diff("a.zarr", "b.zarr")            # zero-shuffle diff
        tr = rp.trend(["a.zarr", "b.zarr", "c.zarr"])  # N-epoch OLS
        blur = rp.focal("a.zarr")                    # ghost-read stencil
        low = rp.warp(tiles, spec, (2, 1, 0), (2, 1, 0))  # regrid
        cur = rp.compose([tiles, patch])             # latest-wins view
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # ---------------------------------------------------------- storage
    def create_store(self, tiles: DataFrame, path: str, **kw) -> int:
        from .sources import zarrstore

        return zarrstore.write_zarr_store(tiles, path, **kw)

    def create_sharded_store(self, tiles: DataFrame, path: str, **kw) -> int:
        from .sources import zarrstore

        return zarrstore.write_sharded_store(tiles, path, **kw)

    def read_store(self, path: str, **kw) -> DataFrame:
        from .sources import zarrstore

        return zarrstore.read_zarr_store(self.spark, path, **kw)

    def stream_ingest(self, drops_dir: str, store: str, work_dir: str,
                      **kw) -> None:
        from .streaming import storeingest

        storeingest.incremental_store_ingest(
            self.spark, drops_dir, store, work_dir, **kw
        )

    # ----------------------------------------------------- epoch algebra
    def diff(self, path_a: str, path_b: str, **kw) -> DataFrame:
        from .sources import zarrstore

        return zarrstore.diff_stores(self.spark, path_a, path_b, **kw)

    def trend(self, paths: list[str], **kw) -> DataFrame:
        from .sources import zarrstore

        return zarrstore.trend_stores(self.spark, paths, **kw)

    def compose(self, tables: list[DataFrame]) -> DataFrame:
        from .operators import compositing

        return compositing.compose_latest(tables)

    def normalize(self, tiles_src: DataFrame, tiles_ref: DataFrame,
                  **kw) -> DataFrame:
        from .operators import normalize

        return normalize.histogram_match(tiles_src, tiles_ref, **kw)

    # -------------------------------------------------------- derivation
    def focal(self, store: str, stat: str = "sum", **kw) -> DataFrame:
        from .operators import focal

        return focal.focal_sum3x3_store(self.spark, store, stat=stat, **kw)

    def warp(self, tiles: DataFrame, spec, map_x, map_y,
             bilinear: bool = False, **kw) -> DataFrame:
        from .operators import warp

        f = warp.warp_tiles_bilinear if bilinear else warp.warp_tiles
        return f(tiles, spec, map_x, map_y, **kw)

    def overview(self, tiles: DataFrame, spec, factor: int = 2,
                 **kw) -> DataFrame:
        from .operators import pyramid

        return pyramid.build_overview(tiles, spec, factor=factor, **kw)
