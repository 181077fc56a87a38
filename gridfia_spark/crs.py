"""Coordinate reference system transforms for the three-CRS location
contract (ref api.py:240-259, location_config.py:274-379).

The reference resolves a state/county location to bounding boxes in three
CRSs — geographic (EPSG:4326), Web Mercator (EPSG:3857) and the USA
Contiguous Albers Equal Area Conic (ESRI:102039, the raster grid's CRS) —
via pyproj. No pyproj exists in the sandbox, so the math is implemented
directly from the published formulas (Snyder, *Map Projections — A Working
Manual*, USGS PP 1395: spherical Mercator pp. 41-44, ellipsoidal Albers
pp. 98-103). Everything is vectorized numpy over float64; the data volume
is a handful of bbox corners, so this stays driver-side by design.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid (NAD83 datum of ESRI:102039)
GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101
GRS80_E2 = GRS80_F * (2.0 - GRS80_F)
GRS80_E = float(np.sqrt(GRS80_E2))

# Web Mercator sphere radius (EPSG:3857 uses the WGS84 semi-major axis)
WEB_R = 6378137.0

# ESRI:102039 (USA Contiguous Albers Equal Area Conic USGS version)
ALBERS_LAT0 = 23.0
ALBERS_LON0 = -96.0
ALBERS_LAT1 = 29.5
ALBERS_LAT2 = 45.5


# ------------------------------------------------------------ Web Mercator


def lonlat_to_webmercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> EPSG:3857 (spherical Mercator, Snyder eq. 7-1/7-2)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = WEB_R * np.radians(lon)
    y = WEB_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 -> EPSG:4326 (Snyder eq. 7-4/7-5)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WEB_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WEB_R)) - np.pi / 2.0)
    return lon, lat


# ------------------------------------------------- ellipsoidal Albers (102039)


def _q(sin_phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12: the Albers authalic q function."""
    e, e2 = GRS80_E, GRS80_E2
    return (1.0 - e2) * (
        sin_phi / (1.0 - e2 * sin_phi * sin_phi)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * sin_phi) / (1.0 + e * sin_phi))
    )


def _m(phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 14-15: m = cos(phi) / sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - GRS80_E2 * s * s)


def _albers_constants() -> tuple[float, float, float]:
    phi1 = np.radians(ALBERS_LAT1)
    phi2 = np.radians(ALBERS_LAT2)
    phi0 = np.radians(ALBERS_LAT0)
    m1, m2 = _m(phi1), _m(phi2)
    q1, q2 = _q(np.sin(phi1)), _q(np.sin(phi2))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)  # Snyder eq. 14-14
    c = m1 * m1 + n * q1  # Snyder eq. 14-13
    rho0 = GRS80_A * np.sqrt(c - n * _q(np.sin(phi0))) / n  # eq. 14-12a
    return float(n), float(c), float(rho0)


_N, _C, _RHO0 = _albers_constants()


def lonlat_to_albers(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> ESRI:102039 (Snyder eq. 14-1..14-4, ellipsoidal)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    theta = _N * np.radians(lon - ALBERS_LON0)
    rho = GRS80_A * np.sqrt(_C - _N * _q(np.sin(np.radians(lat)))) / _N
    x = rho * np.sin(theta)
    y = _RHO0 - rho * np.cos(theta)
    return x, y


def albers_to_lonlat(
    x: np.ndarray, y: np.ndarray, iterations: int = 15
) -> tuple[np.ndarray, np.ndarray]:
    """ESRI:102039 -> EPSG:4326 (Snyder eq. 14-10/14-11 + iteration 3-16)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.sqrt(x * x + (_RHO0 - y) ** 2)
    theta = np.arctan2(x, _RHO0 - y)  # n > 0 for 102039
    qv = (_C - (rho * _N / GRS80_A) ** 2) / _N
    phi = np.arcsin(np.clip(qv / 2.0, -1.0, 1.0))
    e, e2 = GRS80_E, GRS80_E2
    for _ in range(iterations):  # Snyder eq. 3-16
        s = np.sin(phi)
        one = 1.0 - e2 * s * s
        phi = phi + (one * one) / (2.0 * np.cos(phi)) * (
            qv / (1.0 - e2)
            - s / one
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
    lon = ALBERS_LON0 + np.degrees(theta / _N)
    return lon, np.degrees(phi)


# -------------------------------------------------------- bbox resolution


def transform_bounds(
    bounds: tuple[float, float, float, float],
    forward,
    densify: int = 21,
) -> tuple[float, float, float, float]:
    """Transform a (xmin, ymin, xmax, ymax) bbox through ``forward`` by
    densifying every edge with ``densify`` points (curved projections bow
    edges outward; corner-only transforms under-cover — the same reason
    pyproj's transform_bounds densifies, ref location_config.py:274-379)."""
    xmin, ymin, xmax, ymax = bounds
    xs = np.linspace(xmin, xmax, densify)
    ys = np.linspace(ymin, ymax, densify)
    ex = np.concatenate([xs, xs, np.full(densify, xmin), np.full(densify, xmax)])
    ey = np.concatenate([np.full(densify, ymin), np.full(densify, ymax), ys, ys])
    tx, ty = forward(ex, ey)
    return float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max())


def location_bboxes(
    lonlat_bounds: tuple[float, float, float, float],
) -> dict[str, tuple[float, float, float, float]]:
    """The reference's three-CRS location contract (api.py:240-259): a
    geographic bbox resolved to EPSG:4326 / EPSG:3857 / ESRI:102039 bounds."""
    return {
        "EPSG:4326": tuple(float(v) for v in lonlat_bounds),
        "EPSG:3857": transform_bounds(lonlat_bounds, lonlat_to_webmercator),
        "ESRI:102039": transform_bounds(lonlat_bounds, lonlat_to_albers),
    }
