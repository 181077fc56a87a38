"""Sinks: metric layers back to encoded tile rows, CSV reports.

The reference writes GeoTIFF/Zarr/NetCDF per metric (forest_metrics.py:
547-637). The engine's sink unit is the same as its source unit — an encoded
tile row — so a metric layer round-trips through the identical codec/schema
machinery; CSV covers the reporting path (species_presence.py:169-191).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import codecs
from ..constants import CRS, PIX, UNITS, X0, Y0


def metric_to_tiles(
    metric_px: DataFrame, metric: str, tile_w: int, tile_h: int, fmt: str = "rawz"
) -> DataFrame:
    """Re-encode a per-pixel metric table (gx, gy, <metric>) into encoded
    raster tile rows — the S11/S12 sink recast (metric layer -> raster)."""
    with_tile = metric_px.select(
        (F.col("gx") / tile_w).cast("int").alias("tx"),
        (F.col("gy") / tile_h).cast("int").alias("ty"),
        (F.col("gx") % tile_w).cast("int").alias("px"),
        (F.col("gy") % tile_h).cast("int").alias("py"),
        F.col(metric).cast("double").alias("v"),
    )

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        arr = np.zeros((tile_h, tile_w), dtype=np.float32)
        arr[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = pdf["v"].to_numpy()
        cap = (
            f"metric={metric};tile=({tx},{ty});crs={CRS};"
            f"transform=[{X0:.1f},{PIX:.1f},0.0,{Y0:.1f},0.0,{-PIX:.1f}];units={UNITS}"
        )
        return pd.DataFrame(
            {
                "image_id": [f"m_{metric}_tx{tx:03d}_ty{ty:03d}"],
                "bytes": [codecs.encode(arr, fmt)],
                "w": [tile_w],
                "h": [tile_h],
                "fmt": [fmt],
                "caption": [cap],
            }
        )

    return with_tile.groupBy("tx", "ty").applyInPandas(
        enc, "image_id string, bytes binary, w int, h int, fmt string, caption string"
    )


def netcdf_dataset(
    metric_px: DataFrame, metric: str, width: int, height: int
) -> tuple[DataFrame, DataFrame, dict[str, str]]:
    """S13 NetCDF sink content (ref forest_metrics.py:603-637): the exact
    xarray-Dataset data an engine-side netCDF writer would serialize —

    - coords: (axis, idx, coord) rows with the affine applied to the index
      vectors precisely as the reference does (``transform * (cols, 0)`` →
      x = X0 + col*PIX, y = Y0 - row*PIX — pixel edges, no half-pixel
      shift),
    - the variable as (y, x, <metric>) rows keyed by those coordinates,
    - the global attrs dict ({'crs', 'units'}).

    The physical container write is ``write_netcdf`` below (pure-numpy
    NetCDF-3 classic codec, gridfia_spark/netcdf3.py); this function is the
    distributed-content view the `netcdf_coords`/`netcdf_variable` oracles
    check."""
    spark = metric_px.sparkSession
    xs = spark.range(width).select(
        F.lit("x").alias("axis"),
        F.col("id").alias("idx"),
        (F.lit(X0) + F.col("id") * F.lit(PIX)).alias("coord"),
    )
    ys = spark.range(height).select(
        F.lit("y").alias("axis"),
        F.col("id").alias("idx"),
        (F.lit(Y0) - F.col("id") * F.lit(PIX)).alias("coord"),
    )
    coords = xs.unionByName(ys)
    var = metric_px.select(
        (F.lit(Y0) - F.col("gy") * F.lit(PIX)).alias("y"),
        (F.lit(X0) + F.col("gx") * F.lit(PIX)).alias("x"),
        F.col(metric),
    )
    return coords, var, {"crs": CRS, "units": UNITS}


def write_netcdf(
    metric_px: DataFrame, metric: str, width: int, height: int, path: str
) -> bytes:
    """S13 physical NetCDF container (ref forest_metrics.py:603-637): the
    Dataset content of ``netcdf_dataset`` serialized as genuine NetCDF-3
    classic bytes via the pure-numpy codec (gridfia_spark/netcdf3.py) and
    written to ``path``.

    Single-file export contract, same as write_report_csv (S15): the
    metric grid is assembled on the driver (an exported raster is by
    definition one file; the reference holds the full xarray Dataset in
    memory the same way). Returns the bytes for callers that verify the
    round trip."""
    from .. import netcdf3

    pdf = metric_px.select("gx", "gy", metric).toPandas()
    vals = pdf[metric].to_numpy()
    # integer metrics stage as int64 so netcdf3's validated narrow-to-NC_INT
    # runs (an int32 grid here would wrap out-of-range values silently
    # BEFORE the codec's range check could refuse)
    arr = np.zeros(
        (height, width),
        dtype=np.int64 if np.issubdtype(vals.dtype, np.integer) else np.float64,
    )
    arr[pdf["gy"].to_numpy(), pdf["gx"].to_numpy()] = vals
    x = X0 + np.arange(width, dtype=np.float64) * PIX
    y = Y0 - np.arange(height, dtype=np.float64) * PIX
    blob = netcdf3.write_netcdf3(
        dims={"y": height, "x": width},
        variables={
            "y": (("y",), y),
            "x": (("x",), x),
            metric: (("y", "x"), arr),
        },
        global_attrs={"crs": CRS, "units": UNITS},
        var_attrs={metric: {"units": UNITS, "grid_mapping": CRS}},
    )
    with open(path, "wb") as f:
        f.write(blob)
    return blob


def write_geotiff(
    metric_px: DataFrame, metric: str, width: int, height: int, path: str
) -> bytes:
    """S11 physical GeoTIFF export (ref forest_metrics.py:547-601): the
    metric grid serialized as a genuine single-file GeoTIFF via the
    pure-python codec (gridfia_spark/tiff.py) — deflate-compressed
    float32, affine from the engine's transform, CRS citation in the
    GeoTIFF keys. Single-file export contract like write_netcdf; the
    distributed raster sink remains metric_to_tiles (one container per
    tile row). Returns the bytes for round-trip verification."""
    from .. import tiff

    pdf = metric_px.select("gx", "gy", metric).toPandas()
    arr = np.zeros((height, width), dtype=np.float32)
    arr[pdf["gy"].to_numpy(), pdf["gx"].to_numpy()] = pdf[metric].to_numpy()
    blob = tiff.encode_geotiff(arr, X0, Y0, PIX, CRS)
    with open(path, "wb") as f:
        f.write(blob)
    return blob


def write_report_csv(df: DataFrame, path: str) -> None:
    """CSV report sink (S15) — single-file, header, deterministic order."""
    df.toPandas().sort_values(list(df.columns)).to_csv(path, index=False)
