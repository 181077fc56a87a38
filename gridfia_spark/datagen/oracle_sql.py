"""DuckDB oracle SQL builders for the synthetic tile universe.

Because tile generation is pure int64 math (datagen/pixels.py), a SQL engine
can regenerate every pixel value with ``generate_series`` and recompute each
engine query independently — no parquet tables needed beyond the driver's
pre-registered views. These CTE builders are the SQL half of the
engine<->oracle contract; any change here must mirror constants.py /
datagen/pixels.py / datagen/vectors.py exactly.
"""

from __future__ import annotations

from ..constants import (
    HASH_MOD,
    HASH_MUL,
    KEY_S,
    KEY_X,
    KEY_Y,
    PIX,
    SPECIES,
    X0,
    Y0,
    GridSpec,
)
from . import vectors


X0_SQL = repr(X0)
Y0_SQL = repr(Y0)


def val_cte(spec: GridSpec) -> str:
    """CTE ``val(s, gx, gy, v)``: biomass of species 1..5 at every pixel."""
    gw, gh = spec.gw, spec.gh
    return f"""
px AS (
  SELECT sp.s AS s, gxs.gx AS gx, gys.gy AS gy,
         ((sp.s*{KEY_S} + gxs.gx*{KEY_X} + gys.gy*{KEY_Y}) * {HASH_MUL}) % {HASH_MOD} AS h
  FROM generate_series(1,5) sp(s),
       generate_series(0,{gw - 1}) gxs(gx),
       generate_series(0,{gh - 1}) gys(gy)
),
val AS (
  SELECT s, gx, gy,
    CASE s
      WHEN 1 THEN CASE WHEN h % 5 <> 0 THEN (h % 100) % 51 ELSE 0 END
      WHEN 2 THEN CASE WHEN h % 2 = 0 THEN (h % 100) % 31 ELSE 0 END
      WHEN 3 THEN CASE WHEN gx >= {(2 * gw) // 5} AND gx < {(3 * gw) // 5}
                        AND gy >= {(2 * gh) // 5} AND gy < {(3 * gh) // 5}
                        AND h % 3 <> 0 THEN (h % 100) % 41 ELSE 0 END
      WHEN 4 THEN CASE WHEN (gy < {gh // 10} OR gy >= {gh - gh // 10})
                        AND h % 2 = 0 THEN (h % 100) % 21 ELSE 0 END
      WHEN 5 THEN CASE WHEN h % 7 = 0 THEN (h % 100) % 16 ELSE 0 END
    END AS v
  FROM px
)"""


def total_cte(spec: GridSpec) -> str:
    """CTE ``total(gx, gy, x, y, v)``: per-pixel total biomass + center coords."""
    return f"""{val_cte(spec)},
total AS (
  SELECT gx, gy,
         {X0!r} + gx*{PIX!r} + {PIX / 2!r} AS x,
         {Y0!r} - gy*{PIX!r} - {PIX / 2!r} AS y,
         SUM(v) AS v
  FROM val GROUP BY gx, gy
)"""


def counties_cte(spec: GridSpec) -> str:
    """CTE ``counties(poly_id, name, xmin, ymin, xmax, ymax)`` — the 9 rect
    counties (the SQL-checkable polygon subset)."""
    rows = []
    for p in vectors.county_grid(spec):
        xmin, ymin, xmax, ymax = p.bounds
        rows.append(
            f"('{p.poly_id}','{p.name}',{xmin!r},{ymin!r},{xmax!r},{ymax!r})"
        )
    return (
        "counties(poly_id, name, xmin, ymin, xmax, ymax) AS (\n  SELECT * FROM (VALUES\n    "
        + ",\n    ".join(rows)
        + "\n  ) AS t(poly_id, name, xmin, ymin, xmax, ymax)\n)"
    )


def points_cte(spec: GridSpec, n: int) -> str:
    """CTE ``points(point_id, x, y)`` — mirrors vectors.points_xy exactly."""
    w_m, h_m = spec.gw * 30, spec.gh * 30
    return f"""points AS (
  SELECT i AS point_id,
         {X0!r} + (i*104729 + 77) % {w_m} + 0.5 AS x,
         {Y0!r} - ((i*7919 + 33) % {h_m}) - 0.5 AS y
  FROM generate_series(0,{n - 1}) t(i)
)"""


def tiles_cte(spec: GridSpec) -> str:
    """CTE ``tiles(image_id, s, tx, ty, xmin, ymin, xmax, ymax)``."""
    codes = ",".join(f"({i},'{c}')" for i, (c, _) in enumerate(SPECIES))
    tw_m, th_m = spec.tile_w * 30, spec.tile_h * 30
    return f"""tiles AS (
  SELECT printf('sp%s_tx%03d_ty%03d', sp.code, txs.tx, tys.ty) AS image_id,
         sp.s AS s, txs.tx AS tx, tys.ty AS ty,
         {X0!r} + txs.tx*{tw_m} AS xmin,
         {Y0!r} - tys.ty*{th_m} - {th_m} AS ymin,
         {X0!r} + txs.tx*{tw_m} + {tw_m} AS xmax,
         {Y0!r} - tys.ty*{th_m} AS ymax
  FROM (VALUES {codes}) sp(s, code),
       generate_series(0,{spec.tiles_x - 1}) txs(tx),
       generate_series(0,{spec.tiles_y - 1}) tys(ty)
)"""
