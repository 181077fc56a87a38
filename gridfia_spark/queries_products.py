"""Driver-facing product/statistics queries added in round 2: the
rendering-free map product (ref mapper.py:128-158, api.py:503-703),
threshold/presence/total-consistency kernels (SURVEY A6/A10/A12), and the
bootstrap percentile CI (ref parallel_processing.py:352) — all oracle-checked.

Registered into the shared registry (imported from queries_io).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import geom
from .constants import SPECIES, X0, Y0, spec_for_sf_dir
from .datagen import oracle_sql as osql
from .datagen import tiles as tgen
from .operators import decode, metrics, render, zonal
from .queries import _join_res, q
from .queries_ext import _t


# ===================================================================
# Map product: percentile stretch + clip + colormap index (W2/W3/J4)
# ===================================================================


def _o_render(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    tw, th = spec.tile_w, spec.tile_h
    codes = ",".join(f"({i},'{c}')" for i, (c, _) in enumerate(SPECIES) if i > 0)
    return f"""WITH {osql.val_cte(spec)},
b AS (
  SELECT s, ROUND(quantile_cont(v, 0.02), 6) AS p2,
         ROUND(quantile_cont(v, 0.98), 6) AS p98
  FROM val GROUP BY s
),
idx AS (
  SELECT v.s, v.gx, v.gy,
         CASE WHEN b.p98 > b.p2
              THEN floor(least(greatest((v.v - b.p2) / (b.p98 - b.p2), 0.0), 1.0) * 255.0)
              ELSE 0.0 END AS i
  FROM val v JOIN b ON v.s = b.s
),
spn(s, code) AS (SELECT * FROM (VALUES {codes}) t(s, code))
SELECT printf('r_sp%s_tx%03d_ty%03d', n.code,
              (gx // {tw})::INT, (gy // {th})::INT) AS image_id,
       CAST(MIN(i) AS DOUBLE) AS vmin,
       CAST(MAX(i) AS DOUBLE) AS vmax,
       CAST(SUM(i) AS DOUBLE) AS vsum,
       CAST(SUM(CASE WHEN i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero,
       COUNT(*)::BIGINT AS npx
FROM idx JOIN spn n ON idx.s = n.s
GROUP BY n.code, gx // {tw}, gy // {th}"""


@q("render_layers", _o_render)
def render_layers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendering-free map product (ref mapper.py:128-158, api.py:503-703):
    per-species 2-98 percentile stretch -> clip -> 256-level colormap index,
    re-encoded as raster tile rows; per-tile stats of the rendered index."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    bounds = render.stretch_bounds(tiles, species=[1, 2, 3, 4, 5])
    rendered = render.render_layers(tiles, bounds)
    out = decode.decode_stats(rendered)
    return out.select("image_id", "vmin", "vmax", "vsum", "nonzero", "npx")


# ===================================================================
# Threshold / presence / total-consistency kernels (A6/A10/A12)
# ===================================================================


def _o_thresh_presence(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    return f"""WITH {osql.val_cte(spec)}
SELECT gx, gy,
       CAST(CASE WHEN SUM(v) > 10 THEN 1 ELSE 0 END AS BIGINT) AS above_t10,
       CAST(SUM(CASE WHEN s = 3 AND v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pres_s3,
       -- the stored total layer IS the species sum by data contract
       -- (zarr_utils.py:1003-1019); the engine must measure |delta| = 0
       CAST(0.0 AS DOUBLE) AS total_abs_diff
FROM val GROUP BY gx, gy"""


@q("threshold_presence_pixel", _o_thresh_presence)
def threshold_presence_pixel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pixel biomass-threshold mask (A10, biomass.py:257-270),
    single-species presence (A12, species.py:105-114) and stored-total vs
    species-sum |delta| (A6, biomass.py:74-85) in one shared kernel pass."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    specs = [
        metrics.MetricSpec("above_t10", "biomass_threshold", {"threshold": 10.0}, "long"),
        metrics.MetricSpec("pres_s3", "species_presence", {"species_index": 3}, "long"),
        metrics.MetricSpec("total_abs_diff", "total_biomass_comparison", {}, "double"),
    ]
    out = metrics.metric_layers(tiles, specs)
    return out.select(
        "gx", "gy", "above_t10", "pres_s3",
        F.round("total_abs_diff", 6).alias("total_abs_diff"),
    )


# ===================================================================
# Dense-polygon zonal via the fully distributed covering path (J1 at
# large-polygon-side scale)
# ===================================================================

N_SUBGRID = 6


def _subcounty_bounds(sf_dir: str) -> list[tuple[str, float, float, float, float]]:
    """Deterministic NxN rect sub-county grid over the raster extent —
    computed once in float64 so the engine and the oracle share bit-equal
    bounds."""
    spec = spec_for_sf_dir(sf_dir)
    w_m, h_m = spec.gw * 30.0, spec.gh * 30.0
    wc, hc = w_m / N_SUBGRID, h_m / N_SUBGRID
    out = []
    for j in range(N_SUBGRID):
        for i in range(N_SUBGRID):
            out.append(
                (f"S{j}{i}", X0 + i * wc, Y0 - (j + 1) * hc, X0 + (i + 1) * wc, Y0 - j * hc)
            )
    return out


def _o_zonal_many(sf_dir: str) -> str:
    spec = spec_for_sf_dir(sf_dir)
    rows = ",\n    ".join(
        f"('{pid}',{xmin!r},{ymin!r},{xmax!r},{ymax!r})"
        for pid, xmin, ymin, xmax, ymax in _subcounty_bounds(sf_dir)
    )
    return f"""WITH {osql.total_cte(spec)},
subc(poly_id, xmin, ymin, xmax, ymax) AS (
  SELECT * FROM (VALUES
    {rows}
  ) t(poly_id, xmin, ymin, xmax, ymax)
)
SELECT c.poly_id AS poly_id,
       COUNT(*)::BIGINT AS n_px,
       CAST(SUM(t.v) AS DOUBLE) AS sum_v,
       CAST(MAX(t.v) AS DOUBLE) AS max_v,
       CAST(SUM(CASE WHEN t.v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero_px
FROM total t JOIN subc c
  ON t.x > c.xmin AND t.x < c.xmax AND t.y > c.ymin AND t.y < c.ymax
GROUP BY c.poly_id"""


@q("zonal_many_polygons", _o_zonal_many)
def zonal_many_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal stats over a dense polygon grid via the FULLY distributed
    DataFrame path: the polygon covering itself runs in-cluster
    (spatial_join.polygon_cells_dist inside mapInPandas) — no driver-side
    covering or collect — the plan for a large polygon side (millions of
    polygons)."""
    tiles = tgen.ensure_tiles(spark, sf_dir)
    rows = [
        (pid, pid.lower(), bytearray(geom.polygon_to_wkb(
            geom.rect_polygon(xmin, ymin, xmax, ymax))),
         xmin, ymin, xmax, ymax, True)
        for pid, xmin, ymin, xmax, ymax in _subcounty_bounds(sf_dir)
    ]
    polys = spark.createDataFrame(
        rows,
        "poly_id string, name string, geom_wkb binary, "
        "xmin double, ymin double, xmax double, ymax double, is_rect boolean",
    )
    out = zonal.zonal_stats(
        tiles, polys, species=0, res=_join_res(sf_dir), distributed=True
    )
    return out.select(
        "poly_id",
        F.col("n_px").cast("long"),
        F.col("sum_v").cast("double"),
        F.col("max_v").cast("double"),
        F.col("nonzero_px").cast("long"),
    )


# ===================================================================
# Bootstrap percentile CI (ref parallel_processing.py:352)
# ===================================================================


def _o_bootstrap(sf_dir: str) -> str:
    return """WITH base AS (
  SELECT l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR || '-' ||
         l_partkey::VARCHAR || '-' || l_suppkey::VARCHAR || '-' ||
         CAST(l_quantity AS BIGINT)::VARCHAR AS rid,
         l_quantity::DOUBLE AS v
  FROM lineitem WHERE l_orderkey < 300 AND l_returnflag = 'A'
),
nn AS (SELECT COUNT(*) AS n FROM base),
r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY rid) - 1 AS ridx FROM base),
slots AS (
  SELECT b.i AS b, (b.i*104729 + j.i*7919 + 13) % (SELECT n FROM nn) AS ridx
  FROM generate_series(0, 199) b(i), generate_series(0, 4095) j(i)
  WHERE j.i < (SELECT n FROM nn)
),
means AS (
  SELECT s.b, AVG(r.v) AS m FROM slots s JOIN r ON s.ridx = r.ridx GROUP BY s.b
)
SELECT ROUND((SELECT AVG(v) FROM base), 6) AS obs_mean,
       ROUND(quantile_cont(m, 0.025), 6) AS ci_lo,
       ROUND(quantile_cont(m, 0.975), 6) AS ci_hi,
       200::BIGINT AS n_boot
FROM means"""


@q("bootstrap_ci", _o_bootstrap)
def bootstrap_ci_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap percentile CI of the mean quantity with deterministic,
    engine-portable integer-hash resampling (the reference's ProcessPool
    bootstrap, parallel_processing.py:352, as one distributed job)."""
    from .functions import sample_stats as ss

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") < 300) & (F.col("l_returnflag") == "A")
    )
    df = li.select(
        F.concat_ws(
            "-", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            F.col("l_quantity").cast("long"),
        ).alias("rid"),
        F.col("l_quantity").alias("v"),
    )
    # the oracle's fixed generate_series bound caps the resample width
    if df.count() > 4096:
        raise AssertionError("bootstrap base exceeds the oracle's 4096 bound")
    out = ss.bootstrap_ci(df, "v", "rid", n_boot=200)
    return out.select(
        F.round("obs_mean", 6).alias("obs_mean"),
        F.round("ci_lo", 6).alias("ci_lo"),
        F.round("ci_hi", 6).alias("ci_hi"),
        "n_boot",
    )
