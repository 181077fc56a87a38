"""Deterministic per-pixel biomass generator (numpy side of the contract).

``value(s, gx, gy)`` is a pure function of species index and *global* pixel
coordinates, all in exact int64 arithmetic, so a SQL oracle can regenerate the
same values (see datagen/oracle_sql.py).  The per-species spatial patterns
mirror the reference test fixtures (/root/reference/tests/conftest.py:92-113):
dominant / common / rare-central-patch / edge / scattered, plus layer 0 as the
pixel-wise total (zarr_utils.py:1003-1019).
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    GridSpec,
    HASH_MOD,
    HASH_MUL,
    KEY_S,
    KEY_X,
    KEY_Y,
    N_SPECIES,
)


def _hash_grid(s: int, gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    """int64 hash h(s,gx,gy) = ((s*KEY_S + gx*KEY_X + gy*KEY_Y) * MUL) % 2^31."""
    key = s * KEY_S + gx.astype(np.int64) * KEY_X + gy.astype(np.int64) * KEY_Y
    return (key * HASH_MUL) % HASH_MOD


def species_block(s: int, gx: np.ndarray, gy: np.ndarray, spec: GridSpec) -> np.ndarray:
    """Biomass values (int64) for species index ``s`` (1..5) at global pixel
    coords ``gx, gy`` (broadcastable int arrays)."""
    if not 1 <= s <= 5:
        raise ValueError(f"species_block expects 1..5, got {s}")
    h = _hash_grid(s, gx, gy)
    raw = h % 100
    gw, gh = spec.gw, spec.gh
    if s == 1:  # dominant: widespread, ~20% zero
        v = np.where(h % 5 != 0, raw % 51, 0)
    elif s == 2:  # common: patchy, ~50% zero
        v = np.where(h % 2 == 0, raw % 31, 0)
    elif s == 3:  # rare: central patch only
        in_patch = (
            (gx >= (2 * gw) // 5)
            & (gx < (3 * gw) // 5)
            & (gy >= (2 * gh) // 5)
            & (gy < (3 * gh) // 5)
        )
        v = np.where(in_patch & (h % 3 != 0), raw % 41, 0)
    elif s == 4:  # edge: top/bottom bands only
        band = gh // 10
        on_edge = (gy < band) | (gy >= gh - band)
        v = np.where(on_edge & (h % 2 == 0), raw % 21, 0)
    else:  # s == 5, scattered: sparse ~14% nonzero
        v = np.where(h % 7 == 0, raw % 16, 0)
    return v.astype(np.int64)


def tile_pixels(s: int, tx: int, ty: int, spec: GridSpec) -> np.ndarray:
    """(tile_h, tile_w) float32 array for one tile of one species layer.

    Values are small non-negative integers stored as float32 (exact), so any
    float64 aggregation downstream is order-independent and SQL-matchable.
    """
    ys = ty * spec.tile_h + np.arange(spec.tile_h, dtype=np.int64)
    xs = tx * spec.tile_w + np.arange(spec.tile_w, dtype=np.int64)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    if s == 0:
        v = np.zeros(gx.shape, dtype=np.int64)
        for si in range(1, N_SPECIES):
            v += species_block(si, gx, gy, spec)
    else:
        v = species_block(s, gx, gy, spec)
    return v.astype(np.float32)


def full_cube(spec: GridSpec) -> np.ndarray:
    """(n_species, gh, gw) float32 cube — the single-process oracle's view,
    shaped exactly like the reference's biomass cube (zarr_utils.py:284-301)."""
    cube = np.zeros((N_SPECIES, spec.gh, spec.gw), dtype=np.float32)
    for s in range(N_SPECIES):
        for ty in range(spec.tiles_y):
            for tx in range(spec.tiles_x):
                cube[
                    s,
                    ty * spec.tile_h : (ty + 1) * spec.tile_h,
                    tx * spec.tile_w : (tx + 1) * spec.tile_w,
                ] = tile_pixels(s, tx, ty, spec)
    return cube


def phash64(pixels: np.ndarray) -> int:
    """Deterministic 64-bit perceptual hash: 8x8 block means vs their mean.

    Stands in for the reference's phash column (BASELINE.json input_hint);
    numpy-only, stable across platforms.
    """
    h, w = pixels.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    blocks = np.zeros((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            blk = pixels[i * bh : (i + 1) * bh, j * bw : (j + 1) * bw]
            blocks[i, j] = float(blk.mean()) if blk.size else 0.0
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # two's-complement into int64 range
    return val - (1 << 64) if val >= (1 << 63) else val
