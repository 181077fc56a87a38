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


def _strip_iter(
    metric_px: DataFrame,
    metric: str,
    width: int,
    height: int,
    strip_h: int,
    dtype,
):
    """Yield dense (rows, width) row-band arrays in ascending row order —
    the sharded single-file export core. EXECUTORS assemble and compress
    each dense strip (groupBy strip -> applyInPandas, one output row per
    strip, transported zlib-packed); the driver receives the tiny
    (n_strips)-row frame in strip order and holds ONE decompressed strip
    at a time, so driver peak memory is O(strip_h * width), never
    O(grid). Strips with no pixels yield zeros (the fill value). Size
    ``strip_h`` so a strip fits executor task memory at the target grid
    width."""
    import zlib

    np_dtype = np.dtype(dtype)
    n_strips = -(-height // strip_h)
    df = metric_px.select(
        F.col("gx").cast("int").alias("gx"),
        F.col("gy").cast("int").alias("gy"),
        F.col(metric).alias("v"),
        (F.col("gy") / strip_h).cast("int").alias("strip"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["strip"].iloc[0])
        rows = min(strip_h, height - s * strip_h)
        a = np.zeros((rows, width), dtype=np_dtype)
        a[pdf["gy"].to_numpy() - s * strip_h, pdf["gx"].to_numpy()] = (
            pdf["v"].to_numpy()
        )
        return pd.DataFrame({"strip": [s], "data": [zlib.compress(a.tobytes(), 1)]})

    strips = (
        df.groupBy("strip")
        .applyInPandas(build, "strip int, data binary")
        .sort("strip")
    )

    def zero(s: int) -> np.ndarray:
        return np.zeros((min(strip_h, height - s * strip_h), width), np_dtype)

    nxt = 0
    for r in strips.toLocalIterator():
        while nxt < r.strip:
            yield zero(nxt)
            nxt += 1
        rows = min(strip_h, height - r.strip * strip_h)
        yield np.frombuffer(zlib.decompress(bytes(r.data)), dtype=np_dtype).reshape(
            rows, width
        )
        nxt += 1
    while nxt < n_strips:
        yield zero(nxt)
        nxt += 1


def write_netcdf(
    metric_px: DataFrame,
    metric: str,
    width: int,
    height: int,
    path: str,
    strip_h: int = 512,
    return_bytes: bool = True,
) -> bytes | None:
    """S13 physical NetCDF container (ref forest_metrics.py:603-637): the
    Dataset content of ``netcdf_dataset`` serialized as genuine NetCDF-3
    classic bytes via the pure-numpy codec (gridfia_spark/netcdf3.py) and
    written to ``path``.

    The export is SHARDED: the metric grid streams to the file in
    ``strip_h``-row bands (distributed strip assembly, one decompressed
    strip on the driver at a time — see _strip_iter), byte-identical to a
    whole-grid write. Integer metrics stage as int64 and are range-checked
    BEFORE the file opens (then re-checked per strip by the codec), so
    out-of-range values refuse loudly instead of wrapping. Returns the
    written bytes for round-trip verification (``return_bytes=False`` at
    scale to skip the read-back)."""
    from .. import netcdf3
    from pyspark.sql.types import IntegralType

    is_int = isinstance(metric_px.schema[metric].dataType, IntegralType)
    stage_dt = np.dtype(np.int64 if is_int else np.float64)
    if is_int:
        mm = metric_px.agg(
            F.min(metric).alias("lo"), F.max(metric).alias("hi")
        ).first()
        if mm.lo is not None and (mm.lo < -(2**31) or mm.hi > 2**31 - 1):
            raise ValueError("int64 values exceed NC_INT range")
    x = X0 + np.arange(width, dtype=np.float64) * PIX
    y = Y0 - np.arange(height, dtype=np.float64) * PIX
    with open(path, "wb") as f:
        netcdf3.write_netcdf3_stream(
            f,
            dims={"y": height, "x": width},
            variables={
                "y": (("y",), y),
                "x": (("x",), x),
                metric: (
                    ("y", "x"),
                    netcdf3.LazyVar(
                        stage_dt,
                        lambda: _strip_iter(
                            metric_px, metric, width, height, strip_h, stage_dt
                        ),
                    ),
                ),
            },
            global_attrs={"crs": CRS, "units": UNITS},
            var_attrs={metric: {"units": UNITS, "grid_mapping": CRS}},
        )
    if not return_bytes:
        return None
    with open(path, "rb") as f:
        return f.read()


def write_geotiff(
    metric_px: DataFrame,
    metric: str,
    width: int,
    height: int,
    path: str,
    strip_h: int = 512,
    return_bytes: bool = True,
    rows_per_strip: int | None = None,
) -> bytes | None:
    """S11 physical GeoTIFF export (ref forest_metrics.py:547-601): the
    metric grid serialized as a genuine single-file GeoTIFF via the
    pure-python codec (gridfia_spark/tiff.py) — deflate-compressed
    float32, affine from the engine's transform, CRS citation in the
    GeoTIFF keys. Sharded like write_netcdf: row bands stream through one
    deflate stream (tiff.encode_geotiff_stream), byte-identical to the
    whole-grid writer, driver peak O(strip). ``rows_per_strip`` writes a
    MULTI-STRIP file instead (each band independently deflated, strip
    offsets in the IFD) — range-readable, and scannable at full cluster
    parallelism via ``ingest.read_geotiff_strips``. The distributed
    raster sink remains metric_to_tiles (one container per tile row).
    Returns the written bytes for round-trip verification."""
    from .. import tiff

    with open(path, "wb") as f:
        tiff.encode_geotiff_stream(
            f,
            _strip_iter(metric_px, metric, width, height, strip_h, np.float32),
            width,
            height,
            np.float32,
            X0,
            Y0,
            PIX,
            CRS,
            rows_per_strip=rows_per_strip,
        )
    if not return_bytes:
        return None
    with open(path, "rb") as f:
        return f.read()


def write_report_csv(df: DataFrame, path: str) -> None:
    """CSV report sink (S15) — single-file, header, deterministic order."""
    df.toPandas().sort_values(list(df.columns)).to_csv(path, index=False)
