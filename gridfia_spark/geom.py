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


def _segments_intersect_rect(
    rings: list[np.ndarray], xmin: float, ymin: float, xmax: float, ymax: float
) -> bool:
    """True if any polygon edge intersects the (closed) rectangle."""
    for ring in rings:
        p = ring[:-1]
        q = ring[1:]
        # trivial reject: both endpoints on the same outside side
        bx = np.maximum(p[:, 0], q[:, 0]) < xmin
        bx |= np.minimum(p[:, 0], q[:, 0]) > xmax
        bx |= np.maximum(p[:, 1], q[:, 1]) < ymin
        bx |= np.minimum(p[:, 1], q[:, 1]) > ymax
        cand = ~bx
        if not cand.any():
            continue
        for i in np.nonzero(cand)[0]:
            if _segment_hits_rect(p[i], q[i], xmin, ymin, xmax, ymax):
                return True
    return False


def _segment_hits_rect(p, q, xmin, ymin, xmax, ymax) -> bool:
    """Liang-Barsky clip: does segment p->q intersect the rectangle?"""
    dx, dy = q[0] - p[0], q[1] - p[1]
    t0, t1 = 0.0, 1.0
    for delta, lo, hi, o in (
        (dx, xmin, xmax, p[0]),
        (dy, ymin, ymax, p[1]),
    ):
        if delta == 0.0:
            if o < lo or o > hi:
                return False
            continue
        ta, tb = (lo - o) / delta, (hi - o) / delta
        if ta > tb:
            ta, tb = tb, ta
        t0, t1 = max(t0, ta), min(t1, tb)
        if t0 > t1:
            return False
    return True


def rect_relation(
    rings: list[np.ndarray], xmin: float, ymin: float, xmax: float, ymax: float
) -> str:
    """'inside' | 'partial' | 'outside' — rectangle vs polygon relation."""
    corners_x = np.array([xmin, xmax, xmax, xmin])
    corners_y = np.array([ymin, ymin, ymax, ymax])
    corners_in = points_in_polygon(corners_x, corners_y, rings)
    edges_hit = _segments_intersect_rect(rings, xmin, ymin, xmax, ymax)
    if corners_in.all() and not edges_hit:
        return "inside"
    if corners_in.any() or edges_hit:
        return "partial"
    # rect may fully contain the polygon
    v = rings[0][0]
    if xmin <= v[0] <= xmax and ymin <= v[1] <= ymax:
        return "partial"
    return "outside"


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
    frontier = list(grid.cells_in_bbox(xmin, ymin, xmax, ymax, res_min))
    out_cells: list[int] = []
    out_full: list[bool] = []
    while frontier:
        cell = frontier.pop()
        cxmin, cymin, cxmax, cymax = (float(v) for v in grid.cell_bounds(cell))
        rel = rect_relation(rings, cxmin, cymin, cxmax, cymax)
        if rel == "outside":
            continue
        _, _, res = grid.decode_cell(np.asarray([cell]))
        if rel == "inside":
            out_cells.append(int(cell))
            out_full.append(True)
        elif int(res[0]) >= res_max:
            out_cells.append(int(cell))
            out_full.append(False)
        else:
            frontier.extend(int(c) for c in grid.children(int(cell)))
    return np.asarray(out_cells, dtype=np.int64), np.asarray(out_full, dtype=bool)
