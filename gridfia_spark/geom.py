"""Minimal planar geometry: WKB polygons, ray-casting PIP, cell coverings.

Replaces the reference's GeoPandas/shapely usage
(/root/reference/gridfia/visualization/boundaries.py:30-49,
gridfia/utils/parallel_processing.py:90-91) with numpy + stdlib:

- WKB (ISO, little-endian) polygon encode/decode — the ``geom_wkb`` column of
  the polygon dimension table (FIXTURES.md §2).
- Vectorized even-odd ray-casting point-in-polygon — the exact refinement
  stage of the cell-prefix hash join (north rule).
- Quadtree cell covering of a polygon at res range — the broadcast side of
  the spatial join, the analogue of H3 polyfill.
"""

from __future__ import annotations

import struct

import numpy as np

from . import grid

# ------------------------------------------------------------------ WKB


def polygon_to_wkb(rings: list[np.ndarray]) -> bytes:
    """Encode rings (each an (n,2) float array, unclosed ok) as WKB Polygon."""
    out = [struct.pack("<BII", 1, 3, len(rings))]
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        out.append(struct.pack("<I", len(r)))
        out.append(r.astype("<f8").tobytes())
    return b"".join(out)


def wkb_to_polygon(data: bytes) -> list[np.ndarray]:
    """Decode WKB Polygon -> list of (n,2) closed rings."""
    byte_order, gtype = struct.unpack_from("<BI", data, 0)
    if byte_order != 1 or gtype != 3:
        raise ValueError(f"unsupported WKB (order={byte_order}, type={gtype})")
    (n_rings,) = struct.unpack_from("<I", data, 5)
    off = 9
    rings = []
    for _ in range(n_rings):
        (n_pts,) = struct.unpack_from("<I", data, off)
        off += 4
        pts = np.frombuffer(data, dtype="<f8", count=n_pts * 2, offset=off)
        off += n_pts * 16
        rings.append(pts.reshape(n_pts, 2).copy())
    return rings


def rect_polygon(xmin: float, ymin: float, xmax: float, ymax: float) -> list[np.ndarray]:
    return [
        np.array(
            [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]],
            dtype=np.float64,
        )
    ]


def polygon_bounds(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    pts = np.vstack(rings)
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


# ------------------------------------------------------------------ PIP


def points_in_polygon(
    x: np.ndarray, y: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Vectorized even-odd ray casting. Holes handled by parity.

    This is the exact-refinement kernel of the spatial join (north rule's
    "ray-casting point-in-polygon refinement"); it runs inside pandas UDFs
    over numpy arrays, never per-row Python.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    inside = np.zeros(x.shape, dtype=bool)
    for ring in rings:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        # edge straddles the horizontal ray through y
        straddle = (y1[None, :] > y[:, None]) != (y2[None, :] > y[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1[None, :] + (y[:, None] - y1[None, :]) / (
                y2[None, :] - y1[None, :]
            ) * (x2[None, :] - x1[None, :])
        crossings = (straddle & (x[:, None] < xint)).sum(axis=1)
        inside ^= (crossings % 2).astype(bool)
    return inside


# ------------------------------------------- rect/segment relations


def rect_relation(
    rings: list[np.ndarray], xmin: float, ymin: float, xmax: float, ymax: float
) -> str:
    """'inside' | 'partial' | 'outside' — rectangle vs polygon relation."""
    rel = rect_relation_batch(
        rings, np.array([xmin]), np.array([ymin]), np.array([xmax]), np.array([ymax])
    )[0]
    return ("outside", "partial", "inside")[rel]


def _edges_hit_rects(
    rings: list[np.ndarray],
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
) -> np.ndarray:
    """Vectorized Liang-Barsky: for N rects, does ANY polygon edge intersect?
    Loops over edges (few), vectorized over rects (many)."""
    n = xmin.shape[0]
    hit = np.zeros(n, dtype=bool)
    for ring in rings:
        for (px, py), (qx, qy) in zip(ring[:-1], ring[1:]):
            todo = ~hit
            if not todo.any():
                return hit
            t0 = np.zeros(n)
            t1 = np.ones(n)
            ok = todo.copy()
            for delta, lo, hi, o in (
                (qx - px, xmin, xmax, px),
                (qy - py, ymin, ymax, py),
            ):
                if delta == 0.0:
                    ok &= (o >= lo) & (o <= hi)
                else:
                    ta = (lo - o) / delta
                    tb = (hi - o) / delta
                    lo_t = np.minimum(ta, tb)
                    hi_t = np.maximum(ta, tb)
                    t0 = np.maximum(t0, lo_t)
                    t1 = np.minimum(t1, hi_t)
            ok &= t0 <= t1
            hit |= ok
    return hit


def rect_relation_batch(
    rings: list[np.ndarray],
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
) -> np.ndarray:
    """Vectorized rect-vs-polygon relation for N rects.

    Returns int array: 0=outside, 1=partial, 2=inside. This is the hot path
    of polygon covering (driver-side for small polygon dims, inside pandas
    UDFs for large ones) — all numpy, no per-rect Python."""
    n = xmin.shape[0]
    cx = np.stack([xmin, xmax, xmax, xmin], axis=1).ravel()
    cy = np.stack([ymin, ymin, ymax, ymax], axis=1).ravel()
    corners_in = points_in_polygon(cx, cy, rings).reshape(n, 4)
    all_in = corners_in.all(axis=1)
    any_in = corners_in.any(axis=1)
    edges_hit = _edges_hit_rects(rings, xmin, ymin, xmax, ymax)
    out = np.zeros(n, dtype=np.int8)
    out[any_in | edges_hit] = 1
    out[all_in & ~edges_hit] = 2
    # rect fully containing the polygon: first vertex inside rect
    v = rings[0][0]
    contains = (
        (out == 0) & (xmin <= v[0]) & (v[0] <= xmax) & (ymin <= v[1]) & (v[1] <= ymax)
    )
    out[contains] = 1
    return out


# ------------------------------------------------------------ covering


def polygon_covering(
    rings: list[np.ndarray], res_min: int, res_max: int
) -> tuple[np.ndarray, np.ndarray]:
    """Quadtree covering of a polygon: returns (cell_ids, fully_inside).

    Fully-inside cells skip PIP refinement in the join (exact containment);
    partial cells at res_max are a superset filter refined by PIP. This is the
    H3 polyfill analogue the broadcast side of the join is built from
    (FIXTURES.md §2 ``polygon_cells``).
    """
    xmin, ymin, xmax, ymax = polygon_bounds(rings)
    frontier = grid.cells_in_bbox(xmin, ymin, xmax, ymax, res_min)
    out_cells: list[np.ndarray] = []
    out_full: list[np.ndarray] = []
    res = res_min
    while frontier.size:
        cxmin, cymin, cxmax, cymax = grid.cell_bounds(frontier)
        rel = rect_relation_batch(rings, cxmin, cymin, cxmax, cymax)
        inside = frontier[rel == 2]
        if inside.size:
            out_cells.append(inside)
            out_full.append(np.ones(inside.size, dtype=bool))
        partial = frontier[rel == 1]
        if res >= res_max:
            if partial.size:
                out_cells.append(partial)
                out_full.append(np.zeros(partial.size, dtype=bool))
            break
        # descend: 4 children per partial cell, all vectorized
        ix, iy, _ = grid.decode_cell(partial)
        dx = np.array([0, 1, 0, 1], dtype=np.int64)
        dy = np.array([0, 0, 1, 1], dtype=np.int64)
        frontier = grid.encode_cell(
            (2 * ix[:, None] + dx[None, :]).ravel(),
            (2 * iy[:, None] + dy[None, :]).ravel(),
            res + 1,
        )
        res += 1
    if not out_cells:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=bool)
    return (
        np.concatenate(out_cells).astype(np.int64),
        np.concatenate(out_full),
    )
