"""Extended query registry: remaining metric kernels, relational/window
operators over the driver's TPC-H-ish tables, and the training-data pipeline
ops (dedup / text analysis / similarity search).

Registered into the same registry as queries.py (imported from there)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .constants import spec_for_sf_dir
from .datagen import oracle_sql as osql
from .datagen import tiles as tgen
from .operators import decode, metrics, similarity, text
from .localdf import local_df
from .queries import q


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ===================================================================
# Remaining metric kernels (SURVEY A7-A9, A13-A16, W1, W2)
# ===================================================================


def _o_proportion(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)},
t AS (
  SELECT gx, gy,
         CAST(SUM(v) AS DOUBLE) AS total,
         CAST(SUM(CASE WHEN s = 2 THEN v ELSE 0 END) AS DOUBLE) AS v2,
         CAST(SUM(CASE WHEN s IN (1,2) THEN v ELSE 0 END) AS DOUBLE) AS g12
  FROM val GROUP BY gx, gy
)
SELECT gx, gy,
       ROUND(CASE WHEN total > 0 THEN v2 / total ELSE 0 END, 6) AS prop_s2,
       ROUND(CASE WHEN total > 0 THEN v2 / total * 100.0 ELSE 0 END, 6) AS pct_s2,
       ROUND(CASE WHEN total > 0 THEN g12 / total ELSE 0 END, 6) AS prop_grp12
FROM t"""


@q("proportion_pixel", _o_proportion)
def proportion_pixel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pixel species proportion / percentage / group proportion
    (SURVEY A7/A8/A9)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    specs = [
        metrics.MetricSpec("prop_s2", "species_proportion", {"species_index": 2}, "double"),
        metrics.MetricSpec("pct_s2", "species_percentage", {"species_index": 2}, "double"),
        metrics.MetricSpec("prop_grp12", "species_group_proportion", {"species_indices": [1, 2]}, "double"),
    ]
    out = metrics.metric_layers(tiles, specs)
    return out.select(
        "gx", "gy",
        F.round("prop_s2", 6).alias("prop_s2"),
        F.round("pct_s2", 6).alias("pct_s2"),
        F.round("prop_grp12", 6).alias("prop_grp12"),
    )


def _o_rare_common(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)},
freq AS (
  SELECT s, CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS f
  FROM val GROUP BY s
)
SELECT v.gx AS gx, v.gy AS gy,
       CAST(SUM(CASE WHEN v.v > 0 AND q.f < 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS rare_cnt,
       CAST(SUM(CASE WHEN v.v > 0 AND q.f >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS common_cnt
FROM val v JOIN freq q ON v.s = q.s
GROUP BY v.gx, v.gy"""


@q("rare_common_global", _o_rare_common)
def rare_common_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-scope rare/common species counts (SURVEY A14/A15): two-phase
    distributed frequency aggregate broadcast into the kernel pass."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    return metrics.rare_common_layers(tiles, rare_threshold=0.05, common_threshold=0.5)


def _o_rare_common_t(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)},
freq AS (
  SELECT s, CAST(SUM(CASE WHEN v > 5 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS f
  FROM val GROUP BY s
)
SELECT v.gx AS gx, v.gy AS gy,
       CAST(SUM(CASE WHEN v.v > 5 AND q.f < 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS rare_cnt,
       CAST(SUM(CASE WHEN v.v > 5 AND q.f >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS common_cnt
FROM val v JOIN freq q ON v.s = q.s
GROUP BY v.gx, v.gy"""


@q("rare_common_global_thresholded", _o_rare_common_t)
def rare_common_global_thresholded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-scope rare/common with a non-zero biomass threshold (SURVEY
    A14/A15 at t>0): the census and the per-pixel presence test both use
    v > 5 (species.py:218-234 biomass_threshold semantics)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    return metrics.rare_common_layers(
        tiles, rare_threshold=0.05, common_threshold=0.3, biomass_threshold=5.0
    )


def _o_dominance(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    n_px = spec.gw * spec.gh
    return f"""WITH {osql.val_cte(spec)},
m AS (SELECT gx, gy, MAX(v) AS mx FROM val GROUP BY gx, gy),
dom AS (
  SELECT v.gx, v.gy, CASE WHEN m.mx > 0 THEN MIN(v.s) ELSE 0 END AS d
  FROM val v JOIN m ON v.gx = m.gx AND v.gy = m.gy AND v.v = m.mx
  GROUP BY v.gx, v.gy, m.mx
)
SELECT d AS s, ROUND(COUNT(*) * 100.0 / {n_px}.0, 6) AS dominance_pct
FROM dom WHERE d > 0 GROUP BY d"""


@q("dominance_global", _o_dominance)
def dominance_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global dominance % per species (SURVEY A13, global scope)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    out = metrics.species_dominance_global(tiles)
    return out.select("s", F.round("dominance_pct", 6).alias("dominance_pct"))


def _o_presence_stats(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)}
SELECT s,
       CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
       ROUND(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 6) AS coverage_pct,
       ROUND(CAST(SUM(v) AS DOUBLE) / SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END), 6) AS mean_nonzero,
       CAST(MAX(v) AS DOUBLE) AS max_v
FROM val GROUP BY s"""


@q("species_presence_stats", _o_presence_stats)
def species_presence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-species presence report (SURVEY A16): count/coverage/mean/max,
    from per-tile decode partials."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    st = decode.decode_stats(tiles).filter(F.col("s") > 0)
    return st.groupBy("s").agg(
        F.sum("nonzero").alias("n_present"),
        F.round(F.sum("nonzero") * 100.0 / F.sum("npx"), 6).alias("coverage_pct"),
        F.round(F.sum("vsum") / F.sum("nonzero"), 6).alias("mean_nonzero"),
        F.max("vmax").alias("max_v"),
    )


def _o_top_coverage(sf_dir: str) -> str:
    return f"""WITH base AS ({_o_presence_stats(sf_dir)})
SELECT s, coverage_pct FROM base ORDER BY coverage_pct DESC LIMIT 3"""


@q("top_species_by_coverage", _o_top_coverage)
def top_species_by_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k report (SURVEY W1): species ranked by coverage."""
    return (
        species_presence_stats(spark, sf_dir)
        .select("s", "coverage_pct")
        .orderBy(F.desc("coverage_pct"))
        .limit(3)
    )


def _o_percentile(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)}
SELECT s, ROUND(quantile_cont(v, 0.02), 6) AS p2, ROUND(quantile_cont(v, 0.98), 6) AS p98
FROM val GROUP BY s"""


@q("percentile_stretch", _o_percentile)
def percentile_stretch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-98 percentile normalization bounds per species (SURVEY W2,
    mapper.py:128-158) — exact percentiles, linear interpolation, computed
    from per-tile bincount histogram partials (functions/histpct.py) so no
    reducer buffers a species' pixel population."""
    from .functions.histpct import hist_percentiles

    tiles = tgen.ensure_tiles(spark, sf_dir)
    hist = decode.value_hist(tiles, species=[1, 2, 3, 4, 5])
    pct = hist_percentiles(hist, ["s"], {"p2": 0.02, "p98": 0.98})
    return pct.select(
        "s", F.round("p2", 6).alias("p2"), F.round("p98", 6).alias("p98")
    )


# ===================================================================
# Relational / window operators over driver tables (SURVEY §2.4-2.6)
# ===================================================================


def _o_tpch_q1(sf_dir: str) -> str:
    return """SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*)::BIGINT AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus"""


@q("tpch_q1", _o_tpch_q1)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (multi-aggregate groupBy)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("n"),
    )


def _o_segment_revenue(sf_dir: str) -> str:
    return """SELECT c_mktsegment,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*)::BIGINT AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment"""


@q("segment_revenue", _o_segment_revenue)
def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-dimension broadcast join + aggregate."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return j.groupBy("c_mktsegment").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


def _o_sessions(sf_dir: str) -> str:
    return """WITH s AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(ns) AS BIGINT) AS n_sessions, COUNT(*)::BIGINT AS n_events
FROM s GROUP BY user_id"""


@q("user_sessions", _o_sessions)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag window, 30-min timeout) — the batch
    form of the streaming session operator."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.withColumn(
        "ns",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    return s.groupBy("user_id").agg(
        F.sum("ns").alias("n_sessions"), F.count("*").alias("n_events")
    )


def _o_top_event_users(sf_dir: str) -> str:
    return """WITH c AS (
  SELECT event_type, user_id, COUNT(*)::BIGINT AS n
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id, n, rk::INT AS rk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rk
  FROM c
) WHERE rk <= 3"""


@q("top_event_users", _o_top_event_users)
def top_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k ranking window (SURVEY W1/W4 shape)."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "user_id", "n", F.col("rk").cast("int").alias("rk"))
    )


# ===================================================================
# Training-data pipeline: dedup / text / similarity
# ===================================================================


def _o_dedup_exact(sf_dir: str) -> str:
    return """SELECT md5(text) AS text_hash, COUNT(*)::BIGINT AS n_docs,
       MIN(doc_id) AS canonical_id
FROM documents GROUP BY md5(text)"""


@q("dedup_exact", _o_dedup_exact)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy with keep-first canonical id."""
    return text.exact_dedup_groups(_t(spark, sf_dir, "documents"))


def _o_token_stats(sf_dir: str) -> str:
    return r"""SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_tokens,
       ROUND(length(text)::DOUBLE / len(regexp_split_to_array(trim(text), '\s+')), 6) AS chars_per_token,
       ROUND(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / length(text), 6) AS punct_ratio,
       ROUND(((length(text) - length(replace(text, ' the ', ''))) / 5.0) / len(regexp_split_to_array(trim(text), '\s+')), 6) AS stopword_ratio
FROM documents"""


@q("token_stats", _o_token_stats)
def token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring over documents."""
    out = text.token_stats(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_chars", "n_tokens",
        F.round("chars_per_token", 6).alias("chars_per_token"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
    )


# DuckDB 1.0 can't lateral-join generate_series on a column: cross join a
# fixed series (docs are <600 chars at every sf; 4096 is a safe bound) and
# filter by per-doc length.
_SHINGLE_SERIES = """
  FROM documents d, generate_series(1, 4096) g(i)
  WHERE g.i <= greatest(length(d.text) - 4, 1)"""


def _o_fingerprint(sf_dir: str) -> str:
    return f"""SELECT d.doc_id AS doc_id, MIN(md5(substr(d.text, g.i::INT, 5))) AS fingerprint
{_SHINGLE_SERIES}
GROUP BY d.doc_id"""


@q("doc_fingerprint", _o_fingerprint)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-hash over 5-char shingles (rolling-hash
    fingerprint family)."""
    return text.doc_fingerprint(_t(spark, sf_dir, "documents"))


def _o_ngram_jaccard(sf_dir: str) -> str:
    return f"""WITH sh AS (
  SELECT DISTINCT d.doc_id, substr(d.text, g.i::INT, 5) AS g
{_SHINGLE_SERIES}
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ni
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, ROUND(ni::DOUBLE / (x.n + y.n - ni), 6) AS jaccard
FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
WHERE ni::DOUBLE / (x.n + y.n - ni) >= 0.5"""


@q("ngram_jaccard_pairs", _o_ngram_jaccard)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (threshold 0.5)."""
    return text.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), k=5, threshold=0.5)


@q("minhash_lsh_pairs", _o_ngram_jaccard)
def minhash_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, Jaccard-verified. The output contract is
    EXACT — LSH only prunes candidates, the emitted jaccard is the true
    shingle-set Jaccard — so the exact all-pairs SQL is a valid oracle
    whenever banding recall is 1.0 on the (fixed, deterministic) testdata;
    pytest separately asserts LSH == brute force on engineered near-dups."""
    return text.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), k=5, n_hashes=32, bands=16, threshold=0.5
    )


def _o_simhash_portable(sf_dir: str) -> str:
    return f"""WITH sh AS (
  SELECT d.doc_id, substr(d.text, g.i::INT, 5) AS shingle
{_SHINGLE_SERIES}
),
h AS (
  SELECT doc_id,
    list_reduce(list_prepend(17::BIGINT,
      list_transform(generate_series(1, length(shingle)),
                     i -> ascii(substr(shingle, i::INT, 1))::BIGINT)),
      (a, b) -> (a * 31 + b) % 2147483647) AS h1,
    list_reduce(list_prepend(29::BIGINT,
      list_transform(generate_series(1, length(shingle)),
                     i -> ascii(substr(shingle, i::INT, 1))::BIGINT)),
      (a, b) -> (a * 37 + b) % 2147483647) AS h2
  FROM sh
),
votes AS (
  SELECT doc_id, b.i AS b,
         SUM(CASE WHEN (CASE WHEN b.i < 31 THEN h1 >> b.i::INT
                             ELSE h2 >> (b.i - 31)::INT END) & 1 = 1
                  THEN 1 ELSE -1 END) AS v
  FROM h, generate_series(0, 61) b(i)
  GROUP BY doc_id, b.i
)
SELECT doc_id,
       SUM(CASE WHEN v > 0 THEN 1::BIGINT << b::INT ELSE 0::BIGINT END)::BIGINT
         AS simhash
FROM votes GROUP BY doc_id"""


@q("simhash_portable", _o_simhash_portable)
def simhash_portable_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash bit-vote machinery through the value gate (engine-portable
    polynomial shingle hash; simhash64/xxhash64 stays the production op)."""
    return text.simhash_portable(_t(spark, sf_dir, "documents"))


@q("simhash64", None)  # rows-only
def simhash64_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document."""
    return text.simhash64(_t(spark, sf_dir, "documents"))


def _o_lang(sf_dir: str) -> str:
    def cnt(tok: str) -> str:
        t2 = "' ' || lower(text) || ' '"
        return f"(length({t2}) - length(replace({t2}, '{tok}', ''))) / {len(tok)}"

    en = " + ".join(cnt(t) for t in [" the ", " and ", " of "])
    de = " + ".join(cnt(t) for t in [" der ", " und ", " die "])
    fr = " + ".join(cnt(t) for t in [" le ", " et ", " la "])
    return f"""SELECT doc_id, lang,
       CAST({en} AS BIGINT) AS score_en,
       CAST({de} AS BIGINT) AS score_de,
       CAST({fr} AS BIGINT) AS score_fr,
       CASE WHEN ({de}) > ({en}) AND ({de}) >= ({fr}) THEN 'de'
            WHEN ({fr}) > ({en}) AND ({fr}) > ({de}) THEN 'fr'
            ELSE 'en' END AS predicted_lang
FROM documents"""


@q("lang_id", _o_lang)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-count language-ID heuristic."""
    return text.lang_scores(_t(spark, sf_dir, "documents"))


def _o_emb_norms(sf_dir: str) -> str:
    return """SELECT vec_id,
       ROUND(sqrt(CAST(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) AS DOUBLE)), 6) AS l2_norm,
       label
FROM embeddings"""


@q("embedding_norms", _o_emb_norms)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms via built-in array aggregation (JVM-side)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.with_l2_norm(emb).select(
        "vec_id", F.round("l2_norm", 6).alias("l2_norm"), "label"
    )


def _o_cosine_topk(sf_dir: str) -> str:
    return """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
scored AS (
  SELECT q.vec_id AS q_id, t.vec_id AS t_id,
         ROUND(
           CAST(list_sum(list_transform(list_zip(q.embedding::DOUBLE[], t.embedding::DOUBLE[]),
                                        p -> p[1] * p[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(q.embedding::DOUBLE[], x -> x * x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(t.embedding::DOUBLE[], x -> x * x)) AS DOUBLE))),
         6) AS cosine
  FROM q, embeddings t WHERE t.vec_id <> q.vec_id
)
SELECT q_id, rank::INT AS rank, t_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, t_id) AS rank
  FROM scored
) WHERE rank <= 5"""


@q("cosine_topk", _o_cosine_topk)
def cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k (similarity-search baseline)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb.filter(F.col("vec_id") < 20), emb, k=5)


@q("ann_cosine_topk", None)  # rows-only: hyperplane LSH not SQL-expressible
def ann_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH banding + exact re-rank; recall
    vs brute force measured in pytest."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ann_cosine_topk(emb.filter(F.col("vec_id") < 20), emb, k=5)


def _o_sample_diversity(sf_dir: str) -> str:
    return """WITH counts AS (
  SELECT l_orderkey::VARCHAR AS sample_id, l_partkey, CAST(SUM(l_quantity) AS DOUBLE) AS c
  FROM lineitem GROUP BY l_orderkey, l_partkey
),
tot AS (SELECT sample_id, SUM(c) AS tot FROM counts GROUP BY sample_id),
per AS (
  SELECT c.sample_id,
         CAST(SUM(CASE WHEN c.c > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS obs,
         SUM(CASE WHEN c.c = 1 THEN 1 ELSE 0 END)::DOUBLE AS f1,
         SUM(CASE WHEN c.c = 2 THEN 1 ELSE 0 END)::DOUBLE AS f2,
         SUM(CASE WHEN c.c > 0 THEN -(c.c / t.tot) * ln(c.c / t.tot) ELSE 0 END) AS sh,
         -- rational form: exact integer sums -> one exact division
         SUM(c.c * c.c) / (MAX(t.tot) * MAX(t.tot)) AS dom,
         SUM(CASE WHEN c.c > 0 AND c.c <= 10 THEN 1 ELSE 0 END)::DOUBLE AS n_rare,
         SUM(CASE WHEN c.c > 10 THEN 1 ELSE 0 END)::DOUBLE AS n_abund,
         CAST(SUM(CASE WHEN c.c > 0 AND c.c <= 10 THEN c.c ELSE 0 END) AS DOUBLE) AS nrt,
         CAST(SUM(CASE WHEN c.c >= 1 AND c.c <= 10 AND c.c = floor(c.c)
                       THEN c.c * (c.c - 1) ELSE 0 END) AS DOUBLE) AS ace_num
  FROM counts c JOIN tot t ON c.sample_id = t.sample_id
  GROUP BY c.sample_id
),
per2 AS (
  SELECT *, CASE WHEN nrt > 0 THEN 1.0 - (f1 / nrt) ELSE 1.0 END AS c_ace
  FROM per
),
per3 AS (
  SELECT *, CASE WHEN nrt * (nrt - 1) > 0
                 THEN greatest(0.0, (n_rare / c_ace) * (ace_num / (nrt * (nrt - 1))) - 1)
                 ELSE 0.0 END AS gam
  FROM per2
)
SELECT sample_id,
       obs AS richness,
       ROUND(sh, 6) AS shannon,
       ROUND(1.0 - dom, 6) AS simpson,
       ROUND(CASE WHEN obs > 1 THEN sh / ln(obs) ELSE 0 END, 6) AS evenness,
       ROUND(obs + CASE WHEN f2 > 0 THEN f1 * f1 / (2 * f2)
                        WHEN f1 > 0 THEN f1 * (f1 - 1) / 2
                        ELSE 0 END, 6) AS chao1,
       ROUND(CASE WHEN n_rare = 0 THEN n_abund
                  WHEN c_ace > 0 THEN n_abund + n_rare / c_ace + (f1 / c_ace) * gam
                  ELSE n_abund + n_rare END, 6) AS ace
FROM per3"""


@q("sample_diversity", _o_sample_diversity)
def sample_diversity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-level diversity incl. Chao1 + ACE (SURVEY A18;
    statistical_analysis.py:86-192) — each order is a 'sample', parts are
    'species', quantities are counts."""
    from .functions import sample_stats as ss

    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        F.col("l_orderkey").cast("string").alias("sample_id"),
        F.col("l_partkey").alias("species"),
    ).agg(F.sum("l_quantity").cast("double").alias("count"))
    out = ss.sample_diversity_expr(counts)
    return out.select(
        "sample_id",
        "richness",
        F.round("shannon", 6).alias("shannon"),
        F.round("simpson", 6).alias("simpson"),
        F.round("evenness", 6).alias("evenness"),
        F.round("chao1", 6).alias("chao1"),
        F.round("ace", 6).alias("ace"),
    )


def _o_point_lookup(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1][2:]
    from .datagen import vectors

    n = vectors.N_POINTS.get(sf, 200)
    return f"""WITH {osql.total_cte(spec)},
{osql.points_cte(spec, n)}
SELECT p.point_id AS point_id, CAST(t.v AS DOUBLE) AS v
FROM points p JOIN total t
  ON t.gx = CAST(floor((p.x - {-2000000.0!r}) / 30.0) AS BIGINT)
 AND t.gy = CAST(floor(({-900000.0!r} - p.y) / 30.0) AS BIGINT)"""


@q("point_biomass_lookup", _o_point_lookup)
def point_biomass_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point value lookup (SURVEY S9 / identify_pixel_value): decode only
    the tiles containing query points."""
    spec = spec_for_sf_dir(sf_dir)
    tiles = tgen.ensure_tiles(spark, sf_dir)
    pts = tgen.points_df(spark, sf_dir)
    return decode.point_lookup(pts, tiles, species=0, tile_dims=(spec.tile_w, spec.tile_h))


def _o_bh_fdr(sf_dir: str) -> str:
    return """WITH pv AS (
  SELECT doc_id::VARCHAR AS test_id, ((doc_id * 7919 + 13) % 997) / 997.0 AS p
  FROM documents
),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p, test_id) AS rk, COUNT(*) OVER () AS n FROM pv),
a AS (SELECT *, least(1.0, p * n / rk) AS adj0 FROM r)
SELECT test_id, p,
       ROUND(MIN(adj0) OVER (ORDER BY p, test_id
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 6) AS p_adj
FROM a"""


@q("bh_fdr", _o_bh_fdr)
def bh_fdr_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction (SURVEY W5) over deterministic
    synthetic p-values."""
    from .functions import sample_stats as ss

    docs = _t(spark, sf_dir, "documents")
    pv = docs.select(
        F.col("doc_id").cast("string").alias("test_id"),
        (((F.col("doc_id") * 7919 + 13) % 997) / 997.0).alias("p"),
    )
    out = ss.bh_fdr(pv)
    return out.select("test_id", "p", F.round("p_adj", 6).alias("p_adj"))


def _o_cliffs(sf_dir: str) -> str:
    return """WITH v AS (
  SELECT l_returnflag AS g, l_quantity AS q FROM lineitem
  WHERE l_orderkey < 400 AND l_returnflag <> 'N'
)
SELECT 'A' AS group_a, 'R' AS group_b,
       (SUM(CASE WHEN a.q > b.q THEN 1 ELSE 0 END)
        - SUM(CASE WHEN a.q < b.q THEN 1 ELSE 0 END)) / COUNT(*)::DOUBLE AS delta,
       COUNT(*)::BIGINT AS n_pairs
FROM (SELECT q FROM v WHERE g = 'A') a, (SELECT q FROM v WHERE g = 'R') b"""


@q("cliffs_delta", _o_cliffs)
def cliffs_delta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta effect size via crossJoin pair counting (SURVEY J6)."""
    from .functions import sample_stats as ss

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") < 400) & (F.col("l_returnflag") != "N")
    )
    return ss.cliffs_delta(
        li.select(F.col("l_returnflag").alias("g"), F.col("l_quantity").alias("q")),
        "g",
        "q",
    )


def _o_mann_whitney(sf_dir: str) -> str:
    # identical expression ORDER as the engine: exact-half u1/mu, one
    # division per term, A&S erf polynomial for the normal CDF (DuckDB has
    # no erf); 6dp rounding absorbs engine exp() ulp differences
    return """WITH v AS (
  SELECT l_returnflag AS g, l_quantity AS q FROM lineitem
  WHERE l_orderkey < 400 AND l_returnflag <> 'N'
),
r AS (SELECT g, q, rank() OVER (ORDER BY q) AS rk,
             COUNT(*) OVER (PARTITION BY q) AS tv FROM v),
s AS (SELECT SUM(CASE WHEN g = 'A' THEN rk + (tv - 1) / 2.0 ELSE 0 END) AS r1,
             SUM(CASE WHEN g = 'A' THEN 1 ELSE 0 END)::BIGINT AS n1,
             COUNT(*)::BIGINT AS n
      FROM r),
t AS (SELECT SUM(tv * tv * tv - tv) AS ties
      FROM (SELECT COUNT(*)::DOUBLE AS tv FROM v GROUP BY q)),
u AS (SELECT n1, n - n1 AS n2, n,
             r1 - n1 * (n1 + 1) / 2.0 AS u1,
             n1 * (n - n1) / 2.0 AS mu,
             n1 * (n - n1) / 12.0 * ((n + 1) - t.ties / (n * (n - 1))) AS var
      FROM s, t),
z AS (SELECT n1, n2, u1, n1 * n2 - u1 AS u2,
             CASE WHEN var <= 0 THEN 0.0
                  WHEN u1 > mu THEN (u1 - mu - 0.5) / sqrt(var)
                  WHEN u1 < mu THEN (u1 - mu + 0.5) / sqrt(var)
                  ELSE 0.0 END AS z
      FROM u),
p AS (SELECT *, abs(z) / sqrt(2.0) AS x, 1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))) AS tt
      FROM z)
SELECT 'A' AS group_a, 'R' AS group_b, n1, n2, u1, u2,
       ROUND(z, 6) AS z,
       ROUND(LEAST(1.0, 2.0 * (1.0 - (0.5 * (1.0 + (1.0 - (0.254829592 * tt
             - 0.284496736 * tt * tt + 1.421413741 * tt * tt * tt
             - 1.453152027 * tt * tt * tt * tt
             + 1.061405429 * tt * tt * tt * tt * tt) * exp(-x * x)))))), 6)
         AS p_norm
FROM p"""


@q("mann_whitney", _o_mann_whitney)
def mann_whitney_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between two lineitem return-flag groups
    (ref statistical_analysis.py:340-361) — distributed rank formulation:
    value-histogram ranks, no per-group value buffering."""
    from .functions import sample_stats as ss

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") < 400) & (F.col("l_returnflag") != "N")
    )
    out = ss.mann_whitney_u(
        li.select(F.col("l_returnflag").alias("g"), F.col("l_quantity").alias("q")),
        "g",
        "q",
    )
    return out.select(
        "group_a", "group_b", "n1", "n2", "u1", "u2",
        F.round("z", 6).alias("z"), F.round("p_norm", 6).alias("p_norm"),
    )


def _o_cohens_d(sf_dir: str) -> str:
    return """WITH v AS (
  SELECT l_returnflag AS g, l_quantity AS q FROM lineitem
  WHERE l_orderkey < 400 AND l_returnflag <> 'N'
),
per AS (SELECT g, COUNT(*)::BIGINT AS n, AVG(q) AS mean, VAR_SAMP(q) AS var
        FROM v GROUP BY g),
ab AS (SELECT a.n AS n1, b.n AS n2, a.mean - b.mean AS mean_diff,
              ((a.n - 1) * a.var + (b.n - 1) * b.var) / (a.n + b.n - 2) AS sp2
       FROM (SELECT * FROM per WHERE g = 'A') a,
            (SELECT * FROM per WHERE g = 'R') b)
SELECT 'A' AS group_a, 'R' AS group_b, n1, n2,
       ROUND(mean_diff, 6) AS mean_diff,
       ROUND(CASE WHEN sp2 > 0 THEN mean_diff / sqrt(sp2) ELSE 0.0 END, 6) AS d
FROM ab"""


@q("cohens_d", _o_cohens_d)
def cohens_d_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d pooled-SD effect size (ref statistical_analysis.py:507-540)
    over the same two-group comparison battery as mann_whitney/cliffs_delta."""
    from .functions import sample_stats as ss

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") < 400) & (F.col("l_returnflag") != "N")
    )
    out = ss.cohens_d(
        li.select(F.col("l_returnflag").alias("g"), F.col("l_quantity").alias("q")),
        "g",
        "q",
    )
    return out.select(
        "group_a", "group_b", "n1", "n2",
        F.round("mean_diff", 6).alias("mean_diff"), F.round("d", 6).alias("d"),
    )


def _o_rare_common_tile(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    return f"""WITH {osql.val_cte(spec)},
freq AS (
  SELECT s, gx // {tw} AS tx, gy // {th} AS ty,
         CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS f
  FROM val GROUP BY s, gx // {tw}, gy // {th}
)
SELECT v.gx AS gx, v.gy AS gy,
       CAST(SUM(CASE WHEN v.v > 0 AND q.f < 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS rare_cnt,
       CAST(SUM(CASE WHEN v.v > 0 AND q.f >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS common_cnt
FROM val v JOIN freq q
  ON v.s = q.s AND v.gx // {tw} = q.tx AND v.gy // {th} = q.ty
GROUP BY v.gx, v.gy"""


@q("rare_common_tile_scope", _o_rare_common_tile)
def rare_common_tile_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile-scope rare/common (SURVEY §3.1: the reference computes
    occurrence frequencies per CHUNK — this mode matches it bit-for-bit;
    rare_common_global is the distributed-global variant)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    specs = [
        metrics.MetricSpec("rare_cnt", "rare_species", {"occurrence_threshold": 0.05}, "long"),
        metrics.MetricSpec("common_cnt", "common_species", {"occurrence_threshold": 0.5}, "long"),
    ]
    return metrics.metric_layers(tiles, specs)


def _o_emb_dedup(sf_dir: str) -> str:
    # exact all-pairs verify: valid as the oracle because every organic pair
    # in the testdata has cosine <= 0.61 (measured at all sf) and the seeded
    # duplicates have identical LSH signatures, so the LSH prune provably
    # drops nothing above the 0.9 threshold
    return """WITH e AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 5
),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(
           CAST(list_sum(list_transform(list_zip(a.embedding::DOUBLE[], b.embedding::DOUBLE[]),
                                        z -> z[1] * z[2])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(a.embedding::DOUBLE[], x -> x * x)) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(b.embedding::DOUBLE[], x -> x * x)) AS DOUBLE))),
         6) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.9"""


@q("embedding_cosine_dedup", _o_emb_dedup)
def embedding_cosine_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= 0.9 after LSH candidates).
    The corpus is seeded with five known duplicates (vec_id+1000000 copies),
    so the query provably returns rows and the exact-cosine verify stage is
    oracle-checked against brute-force all-pairs."""
    emb = _t(spark, sf_dir, "embeddings")
    seeded = emb.unionByName(
        emb.filter(F.col("vec_id") < 5).withColumn(
            "vec_id", F.col("vec_id") + 1000000
        )
    )
    return similarity.embedding_cosine_dedup(seeded, threshold=0.9, n_planes=16, bands=8)


def _o_morans(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    return f"""WITH {osql.val_cte(spec)},
tilev AS (
  SELECT gx // {tw} AS tx, gy // {th} AS ty, CAST(SUM(v) AS DOUBLE) AS x
  FROM val GROUP BY gx // {tw}, gy // {th}
),
st AS (SELECT COUNT(*)::DOUBLE AS n, AVG(x) AS m FROM tilev),
zt AS (SELECT tx, ty, x - (SELECT m FROM st) AS z FROM tilev),
offs(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,1),(1,-1),(1,0),(1,1)),
nbp AS (
  SELECT a.tx, a.ty, b.tx AS ntx, b.ty AS nty, a.z AS zi, b.z AS zj
  FROM zt a CROSS JOIN offs o JOIN zt b
    ON b.tx = a.tx + o.dx AND b.ty = a.ty + o.dy
),
deg AS (SELECT tx, ty, COUNT(*)::DOUBLE AS k FROM nbp GROUP BY tx, ty),
wk AS (
  SELECT p.*, di.k AS k, dj.k AS kj
  FROM nbp p JOIN deg di ON p.tx = di.tx AND p.ty = di.ty
             JOIN deg dj ON p.ntx = dj.tx AND p.nty = dj.ty
),
terms AS (
  SELECT SUM(zi * zj / k) AS num, SUM(1.0 / k) AS s0,
         SUM((1.0 / k + 1.0 / kj) * (1.0 / k + 1.0 / kj)) * 0.5 AS s1
  FROM wk
),
cs AS (SELECT tx, ty, SUM(1.0 / kj) AS colsum FROM wk GROUP BY tx, ty),
s2t AS (SELECT SUM((1.0 + colsum) * (1.0 + colsum)) AS s2 FROM cs),
den AS (SELECT SUM(z * z) AS denom FROM zt),
fin AS (
  SELECT (st.n / t.s0) * t.num / d.denom AS i,
         -1.0 / (st.n - 1) AS ei,
         (st.n * st.n * t.s1 - st.n * s2t.s2 + 3 * t.s0 * t.s0)
           / ((st.n * st.n - 1) * t.s0 * t.s0)
           - (-1.0 / (st.n - 1)) * (-1.0 / (st.n - 1)) AS vi
  FROM st, terms t, s2t, den d
)
SELECT ROUND(i, 6) AS morans_i, ROUND(ei, 6) AS expected_i,
       ROUND(vi, 6) AS variance_i, ROUND((i - ei) / sqrt(vi), 6) AS z_score
FROM fin"""


@q("morans_i", _o_morans)
def morans_i_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I of per-tile total biomass (spatial autocorrelation,
    statistical_analysis.py:619-658; Queen weights, row-standardized)."""
    from .functions import spatial_stats

    tiles = tgen.ensure_tiles(spark, sf_dir)
    st = decode.decode_stats(tiles).filter(F.col("s") == 0)
    units = st.select(
        F.regexp_extract("image_id", r"_tx(\d+)_", 1).cast("int").alias("tx"),
        F.regexp_extract("image_id", r"_ty(\d+)$", 1).cast("int").alias("ty"),
        F.col("vsum").alias("value"),
    )
    r = spatial_stats.morans_i(units)
    return local_df(
        spark,
        [(round(r["morans_i"], 6), round(r["expected_i"], 6),
          round(r["variance_i"], 6), round(r["z_score"], 6))],
        "morans_i double, expected_i double, variance_i double, z_score double",
    )


def _o_clip(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    from .datagen import vectors

    c11 = next(p for p in vectors.county_grid(spec) if p.poly_id == "C11")
    xmin, ymin, xmax, ymax = c11.bounds
    return f"""WITH {osql.total_cte(spec)}
SELECT printf('sp0000_tx%03d_ty%03d', (gx // {tw})::INT, (gy // {th})::INT) AS image_id,
       CAST(SUM(CASE WHEN x > {xmin!r} AND x < {xmax!r}
                      AND y > {ymin!r} AND y < {ymax!r} THEN v ELSE 0 END) AS DOUBLE) AS vsum,
       CAST(SUM(CASE WHEN x > {xmin!r} AND x < {xmax!r}
                      AND y > {ymin!r} AND y < {ymax!r} AND v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero
FROM total
GROUP BY gx // {tw}, gy // {th}
HAVING SUM(CASE WHEN x > {xmin!r} AND x < {xmax!r}
                 AND y > {ymin!r} AND y < {ymax!r} THEN 1 ELSE 0 END) > 0"""


@q("clip_tile_sums", _o_clip)
def clip_tile_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary clip to county C11 (SURVEY J3): clipped tile rows ->
    per-tile stats of the clipped raster."""
    from .operators import zonal

    tiles = tgen.ensure_tiles(spark, sf_dir)
    polys = tgen.polygons_df(spark, sf_dir)
    clipped = zonal.clip_to_polygon(tiles, polys, "C11", species=0)
    st = decode.decode_stats(clipped)
    return st.select("image_id", "vsum", "nonzero")


def _o_tpch_q3(sf_dir: str) -> str:
    return """SELECT o_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
ORDER BY revenue DESC, o_orderkey
LIMIT 10"""


@q("tpch_q3", _o_tpch_q3)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + filtered aggregate + top-k
    (ranking on the rounded revenue for cross-engine determinism)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    j = cust.join(orders, cust.c_custkey == orders.o_custkey).join(
        li, li.l_orderkey == orders.o_orderkey
    )
    return (
        j.groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


def _o_tpch_q5(sf_dir: str) -> str:
    return """SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*)::BIGINT AS n_items
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
GROUP BY n_name"""


@q("tpch_q5", _o_tpch_q5)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 5-way star join (broadcast dims) + regional rollup."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


def _o_session_windows(sf_dir: str) -> str:
    return """WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
               OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM s GROUP BY user_id, sid"""


@q("session_windows", _o_session_windows)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows via the built-in session_window aggregation
    — the batch form of the streaming operator (streaming/sessions.py;
    stream==batch equivalence is pytest-verified)."""
    from .streaming import sessions as S

    ev = _t(spark, sf_dir, "events")
    out = S.batch_user_sessions(ev, gap="30 minutes")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


@q("ivf_cosine_topk", None)  # rows-only (IVF bucketing not SQL-expressible)
def ivf_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-k (inverted-file variant; recall vs brute force
    measured in pytest)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_cosine_topk(
        emb.filter(F.col("vec_id") < 20), emb, k=5, n_clusters=16, nprobe=4
    )


def _o_ann_recall(sf_dir: str) -> str:
    # the oracle asserts the CONTRACT (recall >= 0.9 against the exact
    # brute-force top-k, over all 20 probe queries); the engine emits the
    # MEASUREMENT — a recall regression in either ANN index flips the
    # boolean and fails the gate
    return """SELECT 'ann_lsh' AS method, 1::BIGINT AS recall_ge_090, 20::BIGINT AS n_queries
UNION ALL
SELECT 'ivf' AS method, 1::BIGINT AS recall_ge_090, 20::BIGINT AS n_queries
ORDER BY method"""


@q("ann_recall", _o_ann_recall)
def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@1 of both approximate indexes (hyperplane-LSH and IVF
    multi-probe) against the exact cosine top-1, through the value gate —
    converting the rows-only ANN entries into a value-asserted contract.

    Probes are PLANTED near-duplicates (source vector + 8% deterministic
    seeded noise): the testdata embeddings are uniform-random, where true
    top-k neighbors are barely closer than random points — a regime NO
    sublinear index can serve (LSH/IVF recall there measures the data, not
    the index). Planted probes measure the regime ANN exists for: genuinely
    near neighbors. Exact top-1 is computed in-engine as the baseline; the
    oracle asserts the recall>=0.9 contract booleans."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    src = emb.filter(F.col("vec_id") < 20).select("vec_id", "embedding").collect()
    probes = []
    for r in src:
        v = np.asarray(r.embedding, dtype=np.float64)
        noise = np.random.default_rng(int(r.vec_id)).standard_normal(v.size)
        q = v + 0.08 * float(np.linalg.norm(v)) * noise / float(np.linalg.norm(noise))
        probes.append((1_000_000 + int(r.vec_id), [float(x) for x in q]))
    qdf = local_df(spark, probes, "vec_id long, embedding array<double>")
    exact = similarity.cosine_topk(qdf, emb, k=1).select("q_id", "t_id").cache()
    n_q = exact.count()
    rows = []
    for method, topk in (
        ("ann_lsh", similarity.ann_cosine_topk(qdf, emb, k=1)),
        ("ivf", similarity.ivf_cosine_topk(qdf, emb, k=1, n_clusters=16, nprobe=4)),
    ):
        hits = exact.join(topk.select("q_id", "t_id"), ["q_id", "t_id"]).count()
        rows.append((method, int(hits / n_q >= 0.9), n_q))
    exact.unpersist()
    return local_df(
        spark, rows, "method string, recall_ge_090 long, n_queries long"
    )


def _o_ivf_trained(sf_dir: str) -> str:
    # contract booleans: on clustered embeddings the k-means-trained
    # codebook must beat the seeded random codebook by >=0.2 recall AND
    # clear 0.8 absolute (measured margins ~0.46 vs ~0.95, VERDICT r4 #4)
    return """SELECT 16::BIGINT AS n_queries,
       1::BIGINT AS trained_ge_080,
       1::BIGINT AS trained_beats_random_by_020"""


@q("ivf_trained_contract", _o_ivf_trained)
def ivf_trained_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-codebook quality gate (VERDICT r4 #4): spherical-k-means
    centroids (similarity.train_ivf_centroids — deterministic hash-order
    sample, driver-side numpy) must lift IVF recall@5 on CLUSTERED
    embeddings far above the seeded random codebook at nprobe=1, where
    bucket quality is exactly what is measured. Clustered data is the
    regime codebook training exists for — the uniform testdata embeddings
    have no cluster structure to learn. The engine emits the measured
    contract booleans; the oracle asserts them."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    cents = rng.standard_normal((8, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = np.repeat(cents, 40, axis=0) + 0.12 * rng.standard_normal((320, 64))
    pdf = pd.DataFrame(
        {"vec_id": range(320),
         "embedding": [v.tolist() for v in vecs.astype(np.float32)]}
    )
    df = spark.createDataFrame(pdf)
    queries = df.filter(F.col("vec_id") % 40 < 2)  # 2 probes per true cluster
    exact = similarity.cosine_topk(queries, df, k=5).select("q_id", "t_id").cache()
    n_pairs = exact.count()
    n_q = n_pairs // 5

    def recall(topk) -> float:
        return exact.join(topk.select("q_id", "t_id"), ["q_id", "t_id"]).count() / n_pairs

    r_rand = recall(similarity.ivf_cosine_topk(queries, df, k=5, n_clusters=8, nprobe=1))
    trained = similarity.train_ivf_centroids(df, n_clusters=8)
    r_tr = recall(
        similarity.ivf_cosine_topk(queries, df, k=5, nprobe=1, centroids=trained)
    )
    exact.unpersist()
    return local_df(
        spark,
        [(n_q, int(r_tr >= 0.8), int(r_tr >= r_rand + 0.2))],
        "n_queries long, trained_ge_080 long, trained_beats_random_by_020 long",
    )


def _o_perm_test(sf_dir: str) -> str:
    return """WITH base AS (
  SELECT l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR || '-' ||
         l_partkey::VARCHAR || '-' || l_suppkey::VARCHAR || '-' ||
         CAST(l_quantity AS BIGINT)::VARCHAR AS rid,
         CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS is_a,
         l_quantity::DOUBLE AS v
  FROM lineitem WHERE l_orderkey < 200 AND l_returnflag <> 'N'
),
st AS (
  SELECT SUM(is_a) AS n1,
         SUM(v * is_a) / SUM(is_a) - SUM(v * (1 - is_a)) / SUM(1 - is_a) AS obs
  FROM base
),
lab AS (
  SELECT p.perm, b.v,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY p.perm
                ORDER BY md5(p.perm::VARCHAR || '_' || b.rid)
              ) <= (SELECT n1 FROM st) THEN 1 ELSE 0 END AS pa
  FROM base b CROSS JOIN (SELECT i AS perm FROM generate_series(0, 499) t(i)) p
),
per AS (
  SELECT perm,
         SUM(v * pa) / SUM(pa) - SUM(v * (1 - pa)) / SUM(1 - pa) AS diff
  FROM lab GROUP BY perm
)
SELECT ROUND((SELECT obs FROM st), 6) AS obs_diff,
       500::BIGINT AS n_perm,
       CAST(SUM(CASE WHEN abs(diff) >= abs((SELECT obs FROM st)) THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       ROUND((1 + SUM(CASE WHEN abs(diff) >= abs((SELECT obs FROM st)) THEN 1 ELSE 0 END)) / 501.0, 6) AS p_value
FROM per"""


@q("permutation_test", _o_perm_test)
def permutation_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group permutation test with engine-portable md5-ordered label
    shuffles (the reference's ProcessPool permutation machinery,
    parallel_processing.py:414, as one distributed job)."""
    from .functions import sample_stats as ss

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") < 200) & (F.col("l_returnflag") != "N")
    )
    # rid must be UNIQUE: md5 sort-key ties break engine-dependently
    # ((l_orderkey, l_linenumber) alone is not unique in this data)
    df = li.select(
        F.concat_ws(
            "-", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            F.col("l_quantity").cast("long"),
        ).alias("rid"),
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").alias("v"),
    )
    out = ss.permutation_test(df, "g", "v", "rid", n_perm=500)
    return out.select(
        F.round("obs_diff", 6).alias("obs_diff"),
        "n_perm",
        "n_extreme",
        F.round("p_value", 6).alias("p_value"),
    )


def _o_zonal_rollup(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)},
allpx AS (
  SELECT s, gx, gy, v,
         {osql.X0_SQL} + gx*30.0 + 15.0 AS x,
         {osql.Y0_SQL} - gy*30.0 - 15.0 AS y
  FROM val
),
{osql.counties_cte(spec)},
joined AS (
  SELECT c.poly_id, p.s, p.v
  FROM allpx p JOIN counties c
    ON p.x > c.xmin AND p.x < c.xmax AND p.y > c.ymin AND p.y < c.ymax
)
SELECT COALESCE(poly_id, 'ALL') AS poly_id,
       COALESCE(s::VARCHAR, 'ALL') AS s,
       CAST(SUM(v) AS DOUBLE) AS sum_v,
       COUNT(*)::BIGINT AS n_px
FROM joined GROUP BY ROLLUP (poly_id, s)"""


@q("zonal_rollup", _o_zonal_rollup)
def zonal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level zonal aggregation via ROLLUP: per (county, species),
    per-county subtotals, and the grand total in one pass."""
    from .operators import broadcast_join

    tiles = tgen.ensure_tiles(spark, sf_dir)
    polys = tgen.polygons_df(spark, sf_dir).filter(F.col("is_rect"))
    from . import grid
    from .constants import PIX

    res = grid.res_for_size(spec_for_sf_dir(sf_dir).tile_w * PIX * 2)
    # species layers 1..5 only (exclude the precomputed total layer)
    species_tiles = tiles.filter(~F.col("image_id").startswith("sp0000"))
    part = broadcast_join.zonal_stats_fast(species_tiles, polys, species=None, res=res)
    return (
        part.rollup("poly_id", "s")
        .agg(F.sum("sum_v").alias("sum_v"), F.sum("n_px").alias("n_px"))
        .select(
            F.coalesce(F.col("poly_id"), F.lit("ALL")).alias("poly_id"),
            F.coalesce(F.col("s").cast("string"), F.lit("ALL")).alias("s"),
            "sum_v",
            "n_px",
        )
    )


def _o_clean_corpus(sf_dir: str) -> str:
    return r"""WITH stats AS (
  SELECT doc_id, source, text,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g'))::DOUBLE / length(text) AS punct_ratio,
         md5(text) AS h
  FROM documents
),
kept AS (
  SELECT * FROM stats
  WHERE n_tokens >= 20 AND punct_ratio < 0.1
    AND doc_id = (SELECT MIN(doc_id) FROM stats s2 WHERE s2.h = stats.h)
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM kept GROUP BY source"""


@q("clean_corpus", _o_clean_corpus)
def clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning: quality gates (token count, punctuation
    ratio) + exact-dedup keep-first — the composed training-data pipeline."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    stats = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        (
            F.length(F.regexp_replace("text", r"[^.,;:!?]", "")) / F.length("text")
        ).alias("punct_ratio"),
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    w = Window.partitionBy("h")
    kept = (
        stats.withColumn("canon", F.min("doc_id").over(w))
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("punct_ratio") < 0.1)
            & (F.col("doc_id") == F.col("canon"))
        )
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def _o_zonal_pivot(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)},
allpx AS (
  SELECT s, v,
         {osql.X0_SQL} + gx*30.0 + 15.0 AS x,
         {osql.Y0_SQL} - gy*30.0 - 15.0 AS y
  FROM val
),
{osql.counties_cte(spec)}
SELECT c.poly_id AS poly_id,
       CAST(SUM(CASE WHEN s = 1 THEN v ELSE 0 END) AS DOUBLE) AS sp1,
       CAST(SUM(CASE WHEN s = 2 THEN v ELSE 0 END) AS DOUBLE) AS sp2,
       CAST(SUM(CASE WHEN s = 3 THEN v ELSE 0 END) AS DOUBLE) AS sp3,
       CAST(SUM(CASE WHEN s = 4 THEN v ELSE 0 END) AS DOUBLE) AS sp4,
       CAST(SUM(CASE WHEN s = 5 THEN v ELSE 0 END) AS DOUBLE) AS sp5
FROM allpx p JOIN counties c
  ON p.x > c.xmin AND p.x < c.xmax AND p.y > c.ymin AND p.y < c.ymax
GROUP BY c.poly_id"""


@q("zonal_pivot", _o_zonal_pivot)
def zonal_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Species-as-columns zonal matrix via the pivot operator (counties x
    species biomass sums)."""
    from . import grid
    from .constants import PIX
    from .operators import broadcast_join

    tiles = tgen.ensure_tiles(spark, sf_dir)
    polys = tgen.polygons_df(spark, sf_dir).filter(F.col("is_rect"))
    res = grid.res_for_size(spec_for_sf_dir(sf_dir).tile_w * PIX * 2)
    species_tiles = tiles.filter(~F.col("image_id").startswith("sp0000"))
    part = broadcast_join.zonal_stats_fast(species_tiles, polys, species=None, res=res)
    return (
        part.groupBy("poly_id")
        .pivot("s", [1, 2, 3, 4, 5])
        .agg(F.sum("sum_v"))
        .select(
            "poly_id",
            *[F.coalesce(F.col(str(i)), F.lit(0.0)).alias(f"sp{i}") for i in range(1, 6)],
        )
    )


# IO roundtrip registry (ingest/sink/manifest/streaming) — imported last so
# its @q registrations land in the shared registry
from . import queries_io  # noqa: E402,F401
