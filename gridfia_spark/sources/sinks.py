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


def write_report_csv(df: DataFrame, path: str) -> None:
    """CSV report sink (S15) — single-file, header, deterministic order."""
    df.toPandas().sort_values(list(df.columns)).to_csv(path, index=False)
