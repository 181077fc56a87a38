"""Deterministic vector fixtures: polygons ("counties") and query points.

Mirrors FIXTURES.md §2-3: a regular 3x3 county grid covering the raster
extent exactly, two concave polygons, one polygon overlapping nothing, and a
seedless integer-math point set. Rect counties are the SQL-oracle-checkable
subset (a DuckDB oracle can test rectangle containment); concave shapes are
verified against the numpy oracle in pytest and in rows-only driver checks.

All coordinates are exact in float64:
- polygon vertices sit on the 30 m pixel lattice (never on a pixel *center*,
  which sit at lattice+15), so pixel-center PIP is never ambiguous;
- query points carry a +0.5 m offset so they never sit on any polygon edge;
- concave diagonal edges use slope 2 from lattice vertices, which provably
  never pass through pixel centers or +0.5 points.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import PIX, X0, Y0, GridSpec
from .. import geom

COUNTY_NAMES = [
    "Ashe", "Bertie", "Camden", "Dare", "Edgecombe",
    "Franklin", "Gates", "Halifax", "Iredell",
]


@dataclass(frozen=True)
class Polygon:
    poly_id: str
    name: str
    rings: list  # list[np.ndarray], closed
    is_rect: bool

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        return geom.polygon_bounds(self.rings)

    @property
    def wkb(self) -> bytes:
        return geom.polygon_to_wkb(self.rings)


def county_grid(spec: GridSpec) -> list[Polygon]:
    """3x3 rectangular counties exactly tiling the raster extent."""
    w_m, h_m = spec.gw * PIX, spec.gh * PIX
    wc, hc = w_m / 3.0, h_m / 3.0
    polys = []
    for j in range(3):  # row from top
        for i in range(3):
            xmin, xmax = X0 + i * wc, X0 + (i + 1) * wc
            ymax, ymin = Y0 - j * hc, Y0 - (j + 1) * hc
            polys.append(
                Polygon(
                    poly_id=f"C{j}{i}",
                    name=COUNTY_NAMES[j * 3 + i],
                    rings=geom.rect_polygon(xmin, ymin, xmax, ymax),
                    is_rect=True,
                )
            )
    return polys


def concave_polygons(spec: GridSpec) -> list[Polygon]:
    """Two concave shapes inside the extent + one fully-outside polygon."""
    w_m, h_m = spec.gw * PIX, spec.gh * PIX
    u = w_m / 8.0  # lattice-aligned unit (w_m divisible by 8 for all specs)
    v = h_m / 8.0
    # L-shape: 4x4-unit square minus its top-right 2x2 quadrant (CCW).
    ax, ay = X0 + u, Y0 - 6 * v  # bottom-left corner
    lshape = np.array(
        [
            [ax, ay],
            [ax + 4 * u, ay],
            [ax + 4 * u, ay + 2 * v],
            [ax + 2 * u, ay + 2 * v],
            [ax + 2 * u, ay + 4 * v],
            [ax, ay + 4 * v],
            [ax, ay],
        ]
    )
    # Notched rectangle: slope-2 triangular notch cut into the top edge.
    bx, by = X0 + 5 * u, Y0 - 4 * v
    nw, nh = 2 * u, 2 * v
    notch_half = min(nw / 4.0, nh / 4.0)
    cx = bx + nw / 2.0
    notched = np.array(
        [
            [bx, by],
            [bx + nw, by],
            [bx + nw, by + nh],
            [cx + notch_half, by + nh],
            [cx, by + nh - 2 * notch_half],
            [cx - notch_half, by + nh],
            [bx, by + nh],
            [bx, by],
        ]
    )
    # Fully outside the extent (empty-join case).
    ox = X0 - 10 * u
    outside = geom.rect_polygon(ox - 2 * u, Y0 + 2 * v, ox, Y0 + 4 * v)
    return [
        Polygon("L01", "Lshape", [lshape], False),
        Polygon("N01", "Notched", [notched], False),
        Polygon("X01", "Nowhere", outside, False),
    ]


def all_polygons(spec: GridSpec) -> list[Polygon]:
    return county_grid(spec) + concave_polygons(spec)


# ------------------------------------------------------------------ points

N_POINTS = {"0.001": 100, "0.01": 200, "0.1": 500, "mid": 1500}


def points_xy(spec: GridSpec, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(point_id:int64, x, y) — integer-math positions + 0.5 m offset.

    The exact same formula is reproducible in SQL:
      x = X0 + (i*104729 + 77) % (gw*30) + 0.5
      y = Y0 - ((i*7919 + 33) % (gh*30)) - 0.5
    """
    i = np.arange(n, dtype=np.int64)
    w_m = np.int64(spec.gw) * 30
    h_m = np.int64(spec.gh) * 30
    x = X0 + ((i * 104729 + 77) % w_m).astype(np.float64) + 0.5
    y = Y0 - ((i * 7919 + 33) % h_m).astype(np.float64) - 0.5
    return i, x, y
