"""Driver-facing query registry: Spark queries + DuckDB oracle SQL.

Each entry runs one engine operator end-to-end on the deterministic tile
universe (or the driver's TPC-H-ish/documents tables) and has a matching
self-contained DuckDB oracle. Column names/types are aligned on both sides —
the driver hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .constants import SPECIES, spec_for_sf_dir
from .datagen import oracle_sql as osql
from .datagen import tiles as tgen
from .datagen import vectors
from .operators import broadcast_join, decode, knn, metrics, spatial_join, zonal

QueryFn = Callable[[SparkSession, str], DataFrame]
_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, Callable[[str], str] | None] = {}


def q(name: str, oracle: Callable[[str], str] | None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        _ORACLES[name] = oracle
        return fn

    return deco


# Driver-facing ordering: the driver's correctness snapshot samples the
# FIRST 50 registry entries. The head rotates per round so every family
# accumulates fresh driver evidence. Round-6 rotation (VERDICT r5 #2):
# the head is the 50 queries whose last driver row predates the r05
# sample — first the 22 absent from BOTH the r04 and r05 snapshots
# (oldest evidence), then r04-era rows; all oracled. Everything
# r05-sampled slides below the 50-sample boundary.
# scripts/check_correctness.py always runs the full registry, so nothing
# is ever dropped from the local gate.
DRIVER_PRIORITY: list[str] = [
    "minhash_lsh_pairs",
    "lang_id",
    "simhash_portable",
    "ngram_jaccard_pairs",
    "dedup_exact",
    "doc_fingerprint",
    "clean_corpus",
    "percentile_stretch",
    "top_event_users",
    "session_windows",
    "cohens_d",
    "rare_common_global_thresholded",
    "mixture_sample",
    "embedding_norms",
    "embedding_cosine_dedup",
    "ingest_roundtrip",
    "bbox_validation",
    "netcdf_coords",
    "netcdf_variable",
    "moving_avg_events",
    "csv_report_roundtrip",
    "export_manifest",
    "zonal_total_biomass",
    "pip_points",
    "metrics_pixel",
    "tile_decode_stats",
    "zonal_skewed",
    "config_run",
    "netcdf_container",
    "jpeg_tile_stats",
    "webp_tile_stats",
    "png_tile_stats",
    "wav_audio_stats",
    "video_frame_stats",
    "thumbnail_stats",
    "phash_near_dup",
    "audio_fingerprint_dedup",
    "sequence_packing",
    "train_val_split",
    "contamination_check",
    "corpus_validate",
    "streaming_dedup",
    "custom_kernel",
    "zonal_many_polygons",
    "zonal_cube",
    "zonal_percentiles",
    "pip_points_salted",
    "zorder_layout",
    "table_layout_roundtrip",
    "zarr_store_roundtrip",
    # --- 50-sample boundary (green r05 driver rows below; the full
    # local gate still runs every query each round) ---
    "repetition_filter",
    "pii_scrub",
    "c4_line_filter",
    "zarr_v3_roundtrip",
    "zarr_append_layer",
    "zarr_blosc_roundtrip",
    "zarr_multiscale",
    "zarr_sharded_roundtrip",
    "zarr_shard_window",
    "geotiff_strip_scan",
    "edge_energy",
    "overview_stats",
    "warp_regrid",
    "store_diff",
    "focal_store_sum",
    "streaming_store_ingest",
    "epoch_trend",
    "compose_epochs",
    "warp_bilinear",
    "histogram_match",
    "focal_store_max",
    "point_timeseries",
    "knn_points",
    "caption_check",
    "diversity_pixel",
    "proportion_pixel",
    "rare_common_global",
    "rare_common_tile_scope",
    "dominance_global",
    "species_presence_stats",
    "top_species_by_coverage",
    "point_biomass_lookup",
    "clip_tile_sums",
    "zonal_rollup",
    "zonal_pivot",
    "morans_i",
    "sample_diversity",
    "bh_fdr",
    "cliffs_delta",
    "mann_whitney",
    "permutation_test",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "segment_revenue",
    "user_sessions",
    "token_stats",
    "cosine_topk",
    "ann_recall",
    "ivf_trained_contract",
    "zarr_layer_slice",
    "geotiff_roundtrip",
    "geotiff_ingest",
    "sink_roundtrip",
    "streaming_zonal",
    "stateful_monitor",
    "render_layers",
    "threshold_presence_pixel",
    "funnel_stages",
    "dormant_customers",
    "asof_events",
    "range_join_tiers",
    "dedup_components",
    "tpch_q7",
    "bootstrap_ci",
    "min_cost_supplier",
    "big_orders",
    "approx_percentile_contract",
    "json_props_stats",
    "spend_quartiles",
    "event_gaps",
]


def _ordered_names() -> list[str]:
    pri = [n for n in DRIVER_PRIORITY if n in _QUERIES]
    seen = set(pri)
    return pri + [n for n in _QUERIES if n not in seen]


def registry() -> dict[str, QueryFn]:
    return {n: _QUERIES[n] for n in _ordered_names()}


def oracles() -> dict[str, str]:
    # oracle builders are parameterized by sf_dir; the driver runs at sf0.01
    return {
        n: _ORACLES[n]("/root/testdata/sf0.01")
        for n in _ordered_names()
        if _ORACLES[n] is not None
    }


def _rect_polys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tgen.polygons_df(spark, sf_dir).filter(F.col("is_rect"))


def _join_res(sf_dir: str) -> int:
    """Join resolution ~2 tile widths: covering cell counts stay O(10^2) per
    polygon at any dataset extent (see grid.res_for_size)."""
    from . import grid
    from .constants import PIX

    spec = spec_for_sf_dir(sf_dir)
    return grid.res_for_size(spec.tile_w * PIX * 2)


# ===================================================================
# Geospatial engine queries (synthetic tile universe)
# ===================================================================


def _o_zonal(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.total_cte(spec)},
{osql.counties_cte(spec)}
SELECT c.poly_id AS poly_id,
       COUNT(*)::BIGINT AS n_px,
       CAST(SUM(t.v) AS DOUBLE) AS sum_v,
       CAST(MAX(t.v) AS DOUBLE) AS max_v,
       CAST(SUM(CASE WHEN t.v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero_px,
       ROUND(CAST(SUM(t.v) AS DOUBLE) / COUNT(*), 6) AS mean_v
FROM total t JOIN counties c
  ON t.x > c.xmin AND t.x < c.xmax AND t.y > c.ymin AND t.y < c.ymax
GROUP BY c.poly_id"""


@q("zonal_total_biomass", _o_zonal)
def zonal_total_biomass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-county zonal stats of the total-biomass layer
    (SURVEY A19 / M2)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    polys = _rect_polys(spark, sf_dir)
    out = broadcast_join.zonal_stats_fast(tiles, polys, species=0, res=_join_res(sf_dir))
    return out.select(
        "poly_id",
        F.col("n_px").cast("long"),
        F.col("sum_v").cast("double"),
        F.col("max_v").cast("double"),
        F.col("nonzero_px").cast("long"),
        F.round("mean_v", 6).alias("mean_v"),
    )


def _o_tile_assignment(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.tiles_cte(spec)},
{osql.counties_cte(spec)}
SELECT c.poly_id AS poly_id, t.image_id AS image_id
FROM tiles t JOIN counties c
  ON t.xmin < c.xmax AND t.xmax > c.xmin AND t.ymin < c.ymax AND t.ymax > c.ymin"""


@q("tile_assignment", _o_tile_assignment)
def tile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector→raster tile assignment: exact (poly_id, image_id) pairs with
    positive-area overlap (north rule exact-match contract)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    meta = decode.with_tile_meta(tiles)
    polys = _rect_polys(spark, sf_dir)
    return broadcast_join.assign_tiles_fast(meta, polys, res=_join_res(sf_dir))


def _o_pip(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1][2:]
    n = vectors.N_POINTS.get(sf, 200)
    return f"""WITH {osql.points_cte(spec, n)},
{osql.counties_cte(spec)}
SELECT p.point_id AS point_id, c.poly_id AS poly_id
FROM points p JOIN counties c
  ON p.x > c.xmin AND p.x < c.xmax AND p.y > c.ymin AND p.y < c.ymax"""


@q("pip_points", _o_pip)
def pip_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon join via cell-prefix join + ray-casting refinement."""
    pts = tgen.points_df(spark, sf_dir)
    polys = _rect_polys(spark, sf_dir)
    out = spatial_join.join_points_polygons(pts, polys, res=_join_res(sf_dir))
    return out.select("point_id", "poly_id")


def _o_knn(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1][2:]
    n = vectors.N_POINTS.get(sf, 200)
    return f"""WITH {osql.points_cte(spec, n)},
d AS (
  SELECT a.point_id AS point_id, b.point_id AS neighbor_id,
         (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist_sq,
         ROW_NUMBER() OVER (
           PARTITION BY a.point_id
           ORDER BY (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y), b.point_id
         ) AS rank
  FROM points a JOIN points b ON a.point_id <> b.point_id
)
SELECT point_id, rank::INT AS rank, neighbor_id, dist_sq
FROM d WHERE rank <= 5"""


@q("knn_points", _o_knn)
def knn_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN (k=5) via cell k-ring expansion + windowed top-k. Target
    stats (count + extent) come from the fixture spec — pure metadata, so
    the radius-sizing stats job is skipped (the estimate only seeds the
    first ring radius; the completeness proof still gates the result)."""
    from .constants import PIX, X0, Y0

    spec = spec_for_sf_dir(sf_dir)
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1][2:]
    n = vectors.N_POINTS.get(sf, 200)
    gw = spec.tiles_x * spec.tile_w * PIX
    gh = spec.tiles_y * spec.tile_h * PIX
    pts = tgen.points_df(spark, sf_dir)
    out = knn.knn_join(
        pts, pts, k=5, target_stats=(n, X0, X0 + gw, Y0 - gh, Y0)
    )
    return out.select(
        "point_id",
        F.col("rank").cast("int"),
        "neighbor_id",
        F.col("dist_sq").cast("double"),
    )


def _o_decode_stats(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    return f"""WITH {osql.val_cte(spec)},
allpx AS (
  SELECT s, gx, gy, v FROM val
  UNION ALL
  SELECT 0 AS s, gx, gy, SUM(v) AS v FROM val GROUP BY gx, gy
),
{osql.tiles_cte(spec)}
SELECT t.image_id AS image_id, t.s AS s,
       CAST(MIN(p.v) AS DOUBLE) AS vmin,
       CAST(MAX(p.v) AS DOUBLE) AS vmax,
       CAST(SUM(p.v) AS DOUBLE) AS vsum,
       CAST(SUM(CASE WHEN p.v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero,
       COUNT(*)::BIGINT AS npx
FROM allpx p JOIN tiles t
  ON p.s = t.s AND p.gx // {tw} = t.tx AND p.gy // {th} = t.ty
GROUP BY t.image_id, t.s"""


@q("tile_decode_stats", _o_decode_stats)
def tile_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile decode + statistics (SURVEY S10/A17 analogue)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    return decode.decode_stats(tiles).select(
        "image_id", "s", "vmin", "vmax", "vsum", "nonzero", "npx"
    )


def _o_caption(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    names = ",".join(f"({i},'{c}','{n}')" for i, (c, n) in enumerate(SPECIES))
    return f"""WITH {osql.tiles_cte(spec)},
spn(s, code, name) AS (SELECT * FROM (VALUES {names}) v(s, code, name))
SELECT t.image_id AS image_id,
       'species=' || n.code || ';name=' || n.name ||
       ';tile=(' || t.tx || ',' || t.ty || ');crs=ESRI:102039;' ||
       'transform=[-2000000.0,30.0,0.0,-900000.0,0.0,-30.0];units=Mg/ha'
         AS caption
FROM tiles t JOIN spn n ON t.s = n.s"""


@q("caption_check", _o_caption)
def caption_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row caption-equality contract (BASELINE.json input_hint)."""
    return tgen.ensure_tiles(spark, sf_dir).select("image_id", "caption")


def _o_metrics_px(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)},
m AS (
  SELECT gx, gy,
         CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS richness,
         CAST(SUM(v) AS DOUBLE) AS total_v,
         MAX(v) AS mx
  FROM val GROUP BY gx, gy
),
dom AS (
  SELECT v.gx, v.gy, MIN(v.s) AS min_s
  FROM val v JOIN m ON v.gx = m.gx AND v.gy = m.gy AND v.v = m.mx
  GROUP BY v.gx, v.gy
)
SELECT m.gx AS gx, m.gy AS gy, m.richness AS richness, m.total_v AS total_v,
       CAST(CASE WHEN m.mx > 0 THEN dom.min_s ELSE 0 END AS BIGINT) AS dominant
FROM m JOIN dom ON m.gx = dom.gx AND m.gy = dom.gy"""


@q("metrics_pixel", _o_metrics_px)
def metrics_pixel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pixel richness/total/dominant-species in one shared kernel pass
    (SURVEY A1/A5/A11)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    specs = [
        metrics.MetricSpec("richness", "species_richness", {}, "long"),
        metrics.MetricSpec("total_v", "total_biomass", {}, "double"),
        metrics.MetricSpec("dominant", "dominant_species", {}, "long"),
    ]
    return metrics.metric_layers(tiles, specs)


def _o_diversity_px(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)},
t AS (SELECT gx, gy, CAST(SUM(v) AS DOUBLE) AS total,
             SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS rich
      FROM val GROUP BY gx, gy),
sh AS (
  SELECT v.gx, v.gy,
         SUM(CASE WHEN v.v > 0 THEN -(v.v / t.total) * ln(v.v / t.total) ELSE 0 END) AS shannon,
         SUM(CASE WHEN v.v > 0 THEN (v.v / t.total) * (v.v / t.total) ELSE 0 END) AS sumsq
  FROM val v JOIN t ON v.gx = t.gx AND v.gy = t.gy AND t.total > 0
  GROUP BY v.gx, v.gy
)
SELECT t.gx AS gx, t.gy AS gy,
       ROUND(COALESCE(sh.shannon, 0.0), 6) AS shannon,
       -- reference quirk (diversity.py:188-192): empty pixels -> 1.0, not 0
       ROUND(CASE WHEN sh.sumsq IS NOT NULL THEN 1.0 / sh.sumsq ELSE 1.0 END, 6) AS simpson_inv,
       ROUND(CASE WHEN t.rich > 1 THEN sh.shannon / ln(t.rich) ELSE 0.0 END, 6) AS evenness
FROM t LEFT JOIN sh ON t.gx = sh.gx AND t.gy = sh.gy"""


@q("diversity_pixel", _o_diversity_px)
def diversity_pixel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pixel Shannon / inverse-Simpson / Pielou evenness (SURVEY A2-A4)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    specs = [
        metrics.MetricSpec("shannon", "shannon_diversity", {}, "double"),
        metrics.MetricSpec("simpson_inv", "simpson_diversity", {}, "double"),
        metrics.MetricSpec("evenness", "evenness", {}, "double"),
    ]
    out = metrics.metric_layers(tiles, specs)
    return out.select(
        "gx",
        "gy",
        F.round("shannon", 6).alias("shannon"),
        F.round("simpson_inv", 6).alias("simpson_inv"),
        F.round("evenness", 6).alias("evenness"),
    )


def _o_edge_energy(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    gw, gh = spec.gw, spec.gh
    return f"""WITH {osql.val_cte(spec)},
allpx AS (
  SELECT s, gx, gy, v FROM val
  UNION ALL
  SELECT 0 AS s, gx, gy, SUM(v) AS v FROM val GROUP BY gx, gy
),
lap AS (
  SELECT c.s AS s, c.gx AS gx, c.gy AS gy,
         4*c.v - u.v - d.v - l.v - r.v AS lp
  FROM allpx c
  JOIN allpx u ON u.s = c.s AND u.gx = c.gx AND u.gy = c.gy - 1
  JOIN allpx d ON d.s = c.s AND d.gx = c.gx AND d.gy = c.gy + 1
  JOIN allpx l ON l.s = c.s AND l.gx = c.gx - 1 AND l.gy = c.gy
  JOIN allpx r ON r.s = c.s AND r.gx = c.gx + 1 AND r.gy = c.gy
  WHERE c.gx BETWEEN 1 AND {gw - 2} AND c.gy BETWEEN 1 AND {gh - 2}
)
SELECT s::INT AS s, (gy // {th})::INT AS ty, (gx // {tw})::INT AS tx,
       CAST(SUM(lp*lp) AS BIGINT) AS edge_energy,
       COUNT(*)::BIGINT AS n_px
FROM lap GROUP BY 1, 2, 3"""


@q("edge_energy", _o_edge_energy)
def edge_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seamless focal Laplacian edge energy per tile (focal.edge_energy):
    cross-tile neighborhoods via perimeter-only halo exchange — tile bytes
    never shuffle; result identical to a whole-grid single-machine pass."""
    from .operators import focal

    tiles = tgen.ensure_tiles(spark, sf_dir)
    out = focal.edge_energy(tiles, spec_for_sf_dir(sf_dir))
    return out.select("s", "ty", "tx", "edge_energy", "n_px")


def _o_overview(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    codes = ",".join(f"({i},'{c}')" for i, (c, _) in enumerate(SPECIES))
    return f"""WITH {osql.val_cte(spec)},
allpx AS (
  SELECT s, gx, gy, v FROM val
  UNION ALL
  SELECT 0 AS s, gx, gy, SUM(v) AS v FROM val GROUP BY gx, gy
),
blk AS (
  SELECT s, gx // 2 AS bx, gy // 2 AS by, CAST(SUM(v) AS BIGINT) AS v
  FROM allpx GROUP BY 1, 2, 3
),
spn(s, code) AS (SELECT * FROM (VALUES {codes}) v(s, code))
SELECT printf('sp%s_tx%03d_ty%03d', n.code,
              CAST(b.bx // {tw} AS INT), CAST(b.by // {th} AS INT)) AS image_id,
       b.s::INT AS s,
       CAST(MIN(b.v) AS DOUBLE) AS vmin,
       CAST(MAX(b.v) AS DOUBLE) AS vmax,
       CAST(SUM(b.v) AS DOUBLE) AS vsum,
       CAST(SUM(CASE WHEN b.v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero,
       COUNT(*)::BIGINT AS npx
FROM blk b JOIN spn n ON b.s = n.s
GROUP BY 1, 2"""


@q("overview_stats", _o_overview)
def overview_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-2 raster overview (pyramid.build_overview: exact block-sum
    mip level, COG-overview analogue) verified through decode_stats — the
    output is itself a tile table, so the per-tile stats operator composes
    over it unchanged."""
    from .operators import pyramid

    tiles = tgen.ensure_tiles(spark, sf_dir)
    ovr = pyramid.build_overview(tiles, spec_for_sf_dir(sf_dir), factor=2)
    return decode.decode_stats(ovr).select(
        "image_id", "s", "vmin", "vmax", "vsum", "nonzero", "npx"
    )


def _o_focal_store(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    codes = ",".join(f"({i},'{c}')" for i, (c, _) in enumerate(SPECIES))
    offs = ",".join(f"({dx},{dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""WITH {osql.val_cte(spec)},
allpx AS (
  SELECT s, gx, gy, v FROM val
  UNION ALL
  SELECT 0 AS s, gx, gy, SUM(v) AS v FROM val GROUP BY gx, gy
),
d(dx, dy) AS (SELECT * FROM (VALUES {offs}) v(dx, dy)),
blur AS (
  -- join-free formulation: every pixel contributes its value to the 9
  -- positions whose 3x3 window contains it; positions shifted off the
  -- grid drop out (zero-padding semantics). A 9-offset equi-self-join
  -- on computed keys plans as a nested loop in DuckDB 1.0 — O(rows^2).
  SELECT s, gx + dx AS gx, gy + dy AS gy, SUM(v) AS v
  FROM allpx, d
  WHERE gx + dx BETWEEN 0 AND {spec.gw - 1}
    AND gy + dy BETWEEN 0 AND {spec.gh - 1}
  GROUP BY 1, 2, 3
),
spn(s, code) AS (SELECT * FROM (VALUES {codes}) v(s, code))
SELECT printf('sp%s_tx%03d_ty%03d', n.code,
              CAST(b.gx // {tw} AS INT), CAST(b.gy // {th} AS INT)) AS image_id,
       b.s::INT AS s,
       CAST(MIN(b.v) AS DOUBLE) AS vmin,
       CAST(MAX(b.v) AS DOUBLE) AS vmax,
       CAST(SUM(b.v) AS DOUBLE) AS vsum,
       CAST(SUM(CASE WHEN b.v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero,
       COUNT(*)::BIGINT AS npx
FROM blur b JOIN spn n ON n.s = b.s
GROUP BY 1, 2"""


@q("focal_store_sum", _o_focal_store)
def focal_store_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-output focal statistic over a PERSISTED store with zero
    shuffle (focal.focal_sum3x3_store): each task ghost-reads its chunk
    plus the 8 neighbors directly from storage, pads the halo plane, and
    emits the finished 3x3 box-sum tile — the object-store stencil
    pattern (vs edge_energy's halo EXCHANGE, the right plan for in-flight
    tables). Zero-padded at the global boundary; verified through
    decode_stats against the 9-offset self-join oracle."""
    import os as _os
    import shutil as _sh

    from .operators import focal
    from .queries_io import _cache
    from .sources import zarrstore

    store = _cache(sf_dir, "focalstore") + ".zarr"
    marker = _os.path.join(store, "_DONE")
    if not _os.path.exists(marker):
        _sh.rmtree(store, ignore_errors=True)
        tiles = tgen.ensure_tiles(spark, sf_dir)
        zarrstore.write_zarr_store(tiles, store)
        open(marker, "w").close()
    out = focal.focal_sum3x3_store(spark, store)
    return decode.decode_stats(out).select(
        "image_id", "s", "vmin", "vmax", "vsum", "nonzero", "npx"
    )


def _o_focal_max(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    codes = ",".join(f"({i},'{c}')" for i, (c, _) in enumerate(SPECIES))
    offs = ",".join(f"({dx},{dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""WITH {osql.val_cte(spec)},
allpx AS (
  SELECT s, gx, gy, v FROM val
  UNION ALL
  SELECT 0 AS s, gx, gy, SUM(v) AS v FROM val GROUP BY gx, gy
),
d(dx, dy) AS (SELECT * FROM (VALUES {offs}) v(dx, dy)),
blur AS (
  -- existing-neighbors convention falls out of the join-free shift
  -- form: only real pixels contribute to each window
  SELECT s, gx + dx AS gx, gy + dy AS gy, MAX(v) AS v
  FROM allpx, d
  WHERE gx + dx BETWEEN 0 AND {spec.gw - 1}
    AND gy + dy BETWEEN 0 AND {spec.gh - 1}
  GROUP BY 1, 2, 3
),
spn(s, code) AS (SELECT * FROM (VALUES {codes}) v(s, code))
SELECT printf('sp%s_tx%03d_ty%03d', n.code,
              CAST(b.gx // {tw} AS INT), CAST(b.gy // {th} AS INT)) AS image_id,
       b.s::INT AS s,
       CAST(MIN(b.v) AS DOUBLE) AS vmin,
       CAST(MAX(b.v) AS DOUBLE) AS vmax,
       CAST(SUM(b.v) AS DOUBLE) AS vsum,
       CAST(SUM(CASE WHEN b.v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero,
       COUNT(*)::BIGINT AS npx
FROM blur b JOIN spn n ON n.s = b.s
GROUP BY 1, 2"""


@q("focal_store_max", _o_focal_max)
def focal_store_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greyscale DILATION over a persisted store (focal_sum3x3_store
    with stat='max' — the morphological sibling of the box sum, same
    zero-shuffle ghost-read plan): boundary pixels reduce over their
    EXISTING neighbors only (the ESRI focal-statistics edge convention;
    zero-padding is only correct for sums)."""
    import os as _os
    import shutil as _sh

    from .operators import focal
    from .queries_io import _cache
    from .sources import zarrstore

    store = _cache(sf_dir, "focalstore") + ".zarr"
    marker = _os.path.join(store, "_DONE")
    if not _os.path.exists(marker):
        _sh.rmtree(store, ignore_errors=True)
        tiles = tgen.ensure_tiles(spark, sf_dir)
        zarrstore.write_zarr_store(tiles, store)
        open(marker, "w").close()
    out = focal.focal_sum3x3_store(spark, store, stat="max")
    return decode.decode_stats(out).select(
        "image_id", "s", "vmin", "vmax", "vsum", "nonzero", "npx"
    )


_WARP_X = (3, 2, 1)  # downscale x by 3/2: sgx = (tgx*3 + 1) // 2
_WARP_Y = (2, 3, 1)  # upscale  y by 3/2: sgy = (tgy*2 + 1) // 3


def _o_warp(sf_dir: str) -> str:
    from .operators import warp as _w

    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    t_w, t_h = _w.warp_extent(spec, _WARP_X, _WARP_Y)
    nx, dx, ox = _WARP_X
    ny, dy, oy = _WARP_Y
    codes = ",".join(f"({i},'{c}')" for i, (c, _) in enumerate(SPECIES))
    return f"""WITH {osql.val_cte(spec)},
allpx AS (
  SELECT s, gx, gy, v FROM val
  UNION ALL
  SELECT 0 AS s, gx, gy, SUM(v) AS v FROM val GROUP BY gx, gy
),
spn(s, code) AS (SELECT * FROM (VALUES {codes}) v(s, code)),
tgt AS (
  SELECT n.s AS s, n.code AS code, txs.tgx AS tgx, tys.tgy AS tgy,
         (txs.tgx*{nx} + {ox}) // {dx} AS sgx,
         (tys.tgy*{ny} + {oy}) // {dy} AS sgy
  FROM spn n,
       generate_series(0,{t_w - 1}) txs(tgx),
       generate_series(0,{t_h - 1}) tys(tgy)
)
SELECT printf('sp%s_tx%03d_ty%03d', t.code,
              CAST(t.tgx // {tw} AS INT), CAST(t.tgy // {th} AS INT)) AS image_id,
       t.s::INT AS s,
       CAST(MIN(p.v) AS DOUBLE) AS vmin,
       CAST(MAX(p.v) AS DOUBLE) AS vmax,
       CAST(SUM(p.v) AS DOUBLE) AS vsum,
       CAST(SUM(CASE WHEN p.v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero,
       COUNT(*)::BIGINT AS npx
FROM tgt t JOIN allpx p ON p.s = t.s AND p.gx = t.sgx AND p.gy = t.sgy
GROUP BY 1, 2"""


@q("warp_regrid", _o_warp)
def warp_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropic nearest-neighbor regrid (warp.warp_tiles: x downscaled
    3/2, y upscaled 3/2 with a half-pixel shift — pure int64 floor math,
    the engine form of the reference's nearest-interpolation raster
    display, mapper.py:245) verified through decode_stats. The shuffle
    carries exactly the OUTPUT pixels: downscales shed skipped source
    pixels map-side before the exchange."""
    from .operators import warp

    tiles = tgen.ensure_tiles(spark, sf_dir)
    out = warp.warp_tiles(
        tiles, spec_for_sf_dir(sf_dir), _WARP_X, _WARP_Y
    )
    return decode.decode_stats(out).select(
        "image_id", "s", "vmin", "vmax", "vsum", "nonzero", "npx"
    )


def _o_warp_bilinear(sf_dir: str) -> str:
    from .operators import warp as _w

    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    gw, gh = spec.gw, spec.gh
    t_w, t_h = _w.warp_extent(spec, _WARP_X, _WARP_Y)
    nx, dx, ox = _WARP_X
    ny, dy, oy = _WARP_Y
    codes = ",".join(f"({i},'{c}')" for i, (c, _) in enumerate(SPECIES))
    return f"""WITH {osql.val_cte(spec)},
allpx AS (
  SELECT s, gx, gy, v FROM val
  UNION ALL
  SELECT 0 AS s, gx, gy, SUM(v) AS v FROM val GROUP BY gx, gy
),
spn(s, code) AS (SELECT * FROM (VALUES {codes}) v(s, code)),
tgt AS (
  SELECT n.s AS s, n.code AS code, txs.tgx AS tgx, tys.tgy AS tgy,
         (txs.tgx*{nx} + {ox}) // {dx} AS x0,
         LEAST((txs.tgx*{nx} + {ox}) // {dx} + 1, {gw - 1}) AS x1,
         (txs.tgx*{nx} + {ox}) % {dx} AS rx,
         (tys.tgy*{ny} + {oy}) // {dy} AS y0,
         LEAST((tys.tgy*{ny} + {oy}) // {dy} + 1, {gh - 1}) AS y1,
         (tys.tgy*{ny} + {oy}) % {dy} AS ry
  FROM spn n,
       generate_series(0,{t_w - 1}) txs(tgx),
       generate_series(0,{t_h - 1}) tys(tgy)
),
num AS (
  SELECT t.s AS s, t.code AS code, t.tgx AS tgx, t.tgy AS tgy,
         ({dx} - t.rx)*({dy} - t.ry)*p00.v + t.rx*({dy} - t.ry)*p10.v
           + ({dx} - t.rx)*t.ry*p01.v + t.rx*t.ry*p11.v AS num
  FROM tgt t
  JOIN allpx p00 ON p00.s = t.s AND p00.gx = t.x0 AND p00.gy = t.y0
  JOIN allpx p10 ON p10.s = t.s AND p10.gx = t.x1 AND p10.gy = t.y0
  JOIN allpx p01 ON p01.s = t.s AND p01.gx = t.x0 AND p01.gy = t.y1
  JOIN allpx p11 ON p11.s = t.s AND p11.gx = t.x1 AND p11.gy = t.y1
)
SELECT printf('sp%s_tx%03d_ty%03d', b.code,
              CAST(b.tgx // {tw} AS INT), CAST(b.tgy // {th} AS INT)) AS image_id,
       b.s::INT AS s,
       CAST(MIN(b.num) AS DOUBLE) AS vmin,
       CAST(MAX(b.num) AS DOUBLE) AS vmax,
       CAST(SUM(b.num) AS DOUBLE) AS vsum,
       CAST(SUM(CASE WHEN b.num > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero,
       COUNT(*)::BIGINT AS npx
FROM num b
GROUP BY 1, 2"""


@q("warp_bilinear", _o_warp_bilinear)
def warp_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT bilinear regrid (warp.warp_tiles_bilinear): rational source
    positions make the four tap weights integers, so the engine emits the
    interpolation NUMERATOR raster (value = num / (den_x*den_y)) and the
    oracle reproduces every pixel in pure int64 — seams, edge clamps and
    weights all bit-checked. Same anisotropic map as warp_regrid; the one
    shuffle carries <= 4x the output pixels (partial weighted blocks),
    and phase 2 verifies every pixel's weight mass."""
    from .operators import warp

    tiles = tgen.ensure_tiles(spark, sf_dir)
    out = warp.warp_tiles_bilinear(
        tiles, spec_for_sf_dir(sf_dir), _WARP_X, _WARP_Y
    )
    return decode.decode_stats(out).select(
        "image_id", "s", "vmin", "vmax", "vsum", "nonzero", "npx"
    )


# extended registry (metric extras, relational, text/dedup/similarity) —
# imported last so its @q registrations land in this module's registry
from . import queries_ext  # noqa: E402,F401
