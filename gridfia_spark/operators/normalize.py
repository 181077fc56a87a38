"""Radiometric normalization: exact histogram matching across epochs.

Before change detection (``diff_stores``/``trend_stores``) two survey
epochs must be radiometrically comparable — sensor or calibration drift
otherwise reads as fake change. The standard fix is histogram matching:
remap epoch values through the monotone map that makes their per-layer
value distribution match a reference epoch's. The reference engine's
display stretch (``mapper.py:128-158``) is the 2-point special case of
this; the engine implements the full monotone quantile map, EXACTLY:

    map[v] = min { a : cdf_ref(a) * N_src >= cdf_src(v) * N_ref }

— integer-valued pixels, integer histogram counts, cross-multiplied
rational compare, so the whole normalization is reproducible by an
integer SQL oracle (no interpolation, no floats anywhere).

Plan: two ``value_hist`` passes (per-tile ``np.bincount`` partials, one
tiny groupBy each — at most |value domain| rows per layer shuffle
regardless of raster size, the same scale argument as
functions/histpct.py), the <=256-entry-per-layer map built driver-side
and broadcast, then ONE map-only transform of the source tiles. Tile
bytes never shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs
from ..datagen.tiles import TILE_SCHEMA
from .decode import value_hist


def _cdfs(rows) -> dict[int, tuple[list[int], dict[int, int], int]]:
    """Per-layer (sorted values, cumulative counts, total)."""
    by_s: dict[int, dict[int, int]] = {}
    for r in rows:
        by_s.setdefault(int(r.s), {})[int(r.v)] = int(r.cnt)
    out = {}
    for s, h in by_s.items():
        vs = sorted(h)
        c = 0
        cum = {}
        for v in vs:
            c += h[v]
            cum[v] = c
        out[s] = (vs, cum, c)
    return out


def build_match_map(
    tiles_src: DataFrame, tiles_ref: DataFrame
) -> dict[tuple[int, int], int]:
    """The exact monotone quantile map ``(s, v) -> a`` matching each
    source layer's distribution to the reference layer's. Runs the two
    histogram jobs eagerly (they are the tiny part)."""
    src = _cdfs(value_hist(tiles_src).collect())
    ref = _cdfs(value_hist(tiles_ref).collect())
    mapping: dict[tuple[int, int], int] = {}
    for s, (vs_b, cum_b, n_b) in src.items():
        if s not in ref:
            raise ValueError(
                f"histogram_match: source layer {s} absent from reference"
            )
        vs_a, cum_a, n_a = ref[s]
        j = 0
        for v in vs_b:  # ascending -> the two-pointer never rewinds
            target = cum_b[v] * n_a
            while j < len(vs_a) - 1 and cum_a[vs_a[j]] * n_b < target:
                j += 1
            mapping[(s, v)] = vs_a[j]
    return mapping


def histogram_match(
    tiles_src: DataFrame, tiles_ref: DataFrame, fmt: str = "rawz"
) -> DataFrame:
    """Remap ``tiles_src`` through the exact per-layer quantile map onto
    ``tiles_ref``'s distribution; output is a normal TILE_SCHEMA table
    (captions/ids preserved, pixel values remapped)."""
    from .decode import with_tile_meta

    mapping = build_match_map(tiles_src, tiles_ref)
    # per-layer LUTs (value domain is small ints); -1 marks values that
    # were NOT in the source histogram — seeing one in a tile means the
    # inputs changed between the histogram pass and the transform
    luts: dict[int, np.ndarray] = {}
    for (s, v), a in mapping.items():
        lut = luts.setdefault(
            s, np.full(max(v + 1, 256), -1, dtype=np.int64)
        )
        if v >= lut.size:
            lut = np.concatenate(
                [lut, np.full(v + 1 - lut.size, -1, dtype=np.int64)]
            )
            luts[s] = lut
        luts[s][v] = a
    bmap = tiles_src.sparkSession.sparkContext.broadcast(luts)
    meta = with_tile_meta(tiles_src).select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash", "s"
    )

    def xform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..datagen import pixels as pxgen

        local = bmap.value
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(r.bytes, r.w, r.h, r.fmt)
                iv = arr.astype(np.int64)
                if not np.array_equal(iv.astype(np.float32), arr):
                    raise ValueError(
                        "histogram_match requires integer-valued pixels"
                    )
                lut = local[int(r.s)]
                if iv.max(initial=0) >= lut.size or (lut[iv] < 0).any():
                    raise ValueError(
                        f"tile {r.image_id} holds values absent from the "
                        "source histogram — inputs changed mid-job"
                    )
                out = lut[iv].astype(np.float32)
                rows.append(
                    (r.image_id, codecs.encode(out, fmt), r.w, r.h, fmt,
                     r.caption, pxgen.phash64(out))
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "bytes", "w", "h", "fmt",
                             "caption", "phash"],
                )

    return meta.mapInPandas(xform, TILE_SCHEMA)
