"""Raster overview (pyramid / mip-level) builder.

The Cloud-Optimized-GeoTIFF / Zarr-multiscale pattern: a level-``f`` overview
whose pixel (bx, by) is the exact int64 SUM of the f x f input pixel block —
lossless for downstream analytics (block mean = sum / f**2, threshold counts
recomputable), unlike the usual lossy average overview. Reference scope: the
reference engine serves single-resolution rasters only; this is the §2
extension that makes browse/zoom-out queries O(pixels / f**2).

Plan shape (pinned in tests/test_pyramid.py):

  Scan tile table
    -> mapInPandas phase 1: decode + block-sum each tile to a
       (h/f, w/f) quadrant — the shuffle payload shrinks f**2-fold
       map-side, tile bytes themselves never cross the network
    -> ONE Exchange hashpartitioning(s, oty, otx)
    -> applyInPandas phase 2: assemble the f x f quadrant mosaic into one
       output tile, re-encode -> full TILE_SCHEMA row

The output is itself a tile table (same schema, same ``sp<code>_tx_ty``
image-id grammar) at the coarser grid, so decode_stats / metric kernels /
any per-tile operator composes over it unchanged. Output tiles keep the
input (tile_w, tile_h) pixel dims; the coarser level has
(tiles_x / f, tiles_y / f) tiles and ground pixel size PIX * f.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codecs
from ..constants import SPECIES, GridSpec
from ..datagen.tiles import TILE_SCHEMA
from .decode import with_tile_meta

_Q_SCHEMA = (
    "s int, oty int, otx int, qy int, qx int, qh int, qw int, qbytes binary"
)

# float32 holds integers exactly up to 2**24 — block sums beyond that would
# silently lose bits in the re-encoded tile, so refuse loudly instead
_F32_EXACT_MAX = float(1 << 24)


def build_overview(
    tiles: DataFrame, spec: GridSpec, factor: int = 2, fmt: str = "rawz"
) -> DataFrame:
    """Build the level-``factor`` overview tile table (exact block sums).

    Requires ``spec.tile_w % factor == 0 and spec.tile_h % factor == 0``
    (quadrants must tile evenly). The tile GRID may be ragged — edge output
    tiles assemble fewer quadrants and come out smaller — but a quadrant
    missing from the *interior* of an output tile (a hole in the input
    table) raises rather than fabricating zeros.
    """
    if spec.tile_w % factor or spec.tile_h % factor:
        raise ValueError(
            f"tile dims {spec.tile_w}x{spec.tile_h} not divisible by {factor}"
        )
    f = int(factor)
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    codes = [c for c, _ in SPECIES]
    names = [n for _, n in SPECIES]
    meta = with_tile_meta(tiles).select(
        "bytes", "w", "h", "fmt", "s", "tx", "ty"
    )

    def phase1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for row in pdf.itertuples(index=False):
                a = codecs.decode(row.bytes, row.w, row.h, row.fmt).astype(
                    np.int64
                )
                h, w = a.shape
                q = a.reshape(h // f, f, w // f, f).sum(axis=(1, 3))
                if q.max(initial=0) > 0x7FFFFFFF:
                    raise ValueError("block sums overflow the int32 quadrant wire format")
                out.append(
                    (
                        int(row.s),
                        int(row.ty) // f,
                        int(row.tx) // f,
                        int(row.ty) % f,
                        int(row.tx) % f,
                        q.shape[0],
                        q.shape[1],
                        np.ascontiguousarray(q, dtype="<i4").tobytes(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["s", "oty", "otx", "qy", "qx", "qh", "qw", "qbytes"],
            )

    def phase2(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        s, oty, otx = (int(k) for k in key)
        # expected quadrant footprint of this output tile (grid may be ragged)
        nqx = min(f, tiles_x - otx * f)
        nqy = min(f, tiles_y - oty * f)
        got = {(int(r.qy), int(r.qx)): r for r in pdf.itertuples(index=False)}
        missing = [
            (qy, qx)
            for qy in range(nqy)
            for qx in range(nqx)
            if (qy, qx) not in got
        ]
        if missing:
            raise ValueError(
                f"overview tile (s={s}, ty={oty}, tx={otx}) is missing input "
                f"quadrants {missing} — refusing to fabricate pixels"
            )
        qh = int(next(iter(got.values())).qh)
        qw = int(next(iter(got.values())).qw)
        out = np.zeros((nqy * qh, nqx * qw), dtype=np.int64)
        for (qy, qx), r in got.items():
            blk = np.frombuffer(r.qbytes, dtype="<i4").reshape(r.qh, r.qw)
            out[qy * qh : (qy + 1) * qh, qx * qw : (qx + 1) * qw] = blk
        if out.max(initial=0) >= _F32_EXACT_MAX:
            raise ValueError(
                "overview block sums exceed float32 exact-integer range; "
                "use a smaller factor or a wider tile format"
            )
        from ..datagen import pixels as pxgen

        arr = out.astype(np.float32)
        code, name = codes[s], names[s]
        image_id = f"sp{code}_tx{otx:03d}_ty{oty:03d}"
        caption = (
            f"species={code};name={name};tile=({otx},{oty});"
            f"level=overview/{f};units=Mg/ha*px"
        )
        return pd.DataFrame(
            [
                (
                    image_id,
                    codecs.encode(arr, fmt),
                    arr.shape[1],
                    arr.shape[0],
                    fmt,
                    caption,
                    pxgen.phash64(arr),
                )
            ],
            columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
        )

    quads = meta.mapInPandas(phase1, _Q_SCHEMA)
    return quads.groupBy("s", "oty", "otx").applyInPandas(phase2, TILE_SCHEMA)


def overview_spec(spec: GridSpec, factor: int = 2) -> GridSpec:
    """GridSpec of ``build_overview``'s output grid. Defined when the tile
    grid divides evenly by ``factor`` (uniform output tiles) or fits within
    one output tile (terminal levels, where the single tile shrinks);
    mixed-size ragged grids have no uniform GridSpec."""
    f = int(factor)

    def dim(tiles: int, tw: int) -> tuple[int, int]:
        if tiles >= f:
            if tiles % f:
                raise ValueError(
                    f"ragged overview grid ({tiles} tiles / factor {f}) has "
                    "no uniform GridSpec"
                )
            return tiles // f, tw
        return 1, (tiles * tw) // f

    tx, tw = dim(spec.tiles_x, spec.tile_w)
    ty, th = dim(spec.tiles_y, spec.tile_h)
    return GridSpec(tx, ty, tw, th)


def build_pyramid(
    tiles: DataFrame,
    spec: GridSpec,
    factor: int = 2,
    levels: int | None = None,
    fmt: str = "rawz",
) -> list[tuple[GridSpec, DataFrame]]:
    """Successive overview levels (level k pixel = exact ``factor**k`` block
    sum), coarsest last. With ``levels=None`` builds until no further level
    is possible (tile dims no longer divisible — for power-of-two tiles that
    is the 1x1-pixel apex, whose single value is the exact global sum).

    Total pyramid cost is a geometric series — each level reads the previous
    one, so all levels together cost < 1/(factor**2 - 1) of the base scan.
    The returned frames are lazy: at production scale WRITE each level (it is
    a normal tile table) before building the next, or collecting a deep level
    will recompute every level above it.
    """
    out: list[tuple[GridSpec, DataFrame]] = []
    cur, cspec = tiles, spec
    while levels is None or len(out) < levels:
        if cspec.tile_w % factor or cspec.tile_h % factor:
            if levels is not None:
                raise ValueError(
                    f"cannot build {levels} levels: tile dims "
                    f"{cspec.tile_w}x{cspec.tile_h} stop dividing by "
                    f"{factor} after level {len(out)}"
                )
            break
        try:
            nspec = overview_spec(cspec, factor)
        except ValueError:
            # ragged tile grid: no uniform coarser GridSpec — clean stop
            # for auto-depth, an error when an explicit depth was demanded
            if levels is not None:
                raise
            break
        nxt = build_overview(cur, cspec, factor=factor, fmt=fmt)
        out.append((nspec, nxt))
        cur, cspec = nxt, nspec
    return out
