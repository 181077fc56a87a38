"""CRS transform tests (ref api.py:240-259, location_config.py:274-379).

Golden values: published EPSG:3857 constants (the 20037508.342789244 m world
half-width is the textbook Web Mercator bound) plus geometric invariants of
the Albers projection that the published formulas must satisfy (equal-area
scale on the standard parallels, center-line symmetry, round-trip identity).
No Spark needed — the data is a handful of corners by design.
"""

from __future__ import annotations

import numpy as np
import pytest

from gridfia_spark import crs


class TestWebMercator:
    def test_published_world_bound(self):
        x, _ = crs.lonlat_to_webmercator(np.array([180.0]), np.array([0.0]))
        assert x[0] == pytest.approx(20037508.342789244, abs=1e-6)

    def test_square_world_latitude(self):
        # the Web Mercator square: y(85.05112877980659) == x(180)
        _, y = crs.lonlat_to_webmercator(np.array([0.0]), np.array([85.05112877980659]))
        assert y[0] == pytest.approx(20037508.342789244, abs=1e-3)

    def test_equator_origin(self):
        x, y = crs.lonlat_to_webmercator(np.array([0.0]), np.array([0.0]))
        assert x[0] == 0.0 and y[0] == 0.0

    def test_roundtrip(self):
        lon = np.linspace(-179.0, 179.0, 41)
        lat = np.linspace(-84.0, 84.0, 41)
        x, y = crs.lonlat_to_webmercator(lon, lat)
        lon2, lat2 = crs.webmercator_to_lonlat(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)


class TestAlbers102039:
    def test_central_meridian_maps_to_x0(self):
        lon = np.full(5, crs.ALBERS_LON0)
        lat = np.array([23.0, 29.5, 37.0, 45.5, 49.0])
        x, _ = crs.lonlat_to_albers(lon, lat)
        np.testing.assert_allclose(x, 0.0, atol=1e-6)

    def test_latitude_of_origin_maps_to_y0(self):
        x, y = crs.lonlat_to_albers(np.array([crs.ALBERS_LON0]), np.array([23.0]))
        assert abs(y[0]) < 1e-6

    def test_east_west_symmetry(self):
        xw, yw = crs.lonlat_to_albers(np.array([-120.0]), np.array([40.0]))
        xe, ye = crs.lonlat_to_albers(np.array([-72.0]), np.array([40.0]))
        assert xw[0] == pytest.approx(-xe[0], abs=1e-6)
        assert yw[0] == pytest.approx(ye[0], abs=1e-6)

    def test_scale_true_on_standard_parallels(self):
        """On a standard parallel the projected east-west scale equals the
        ellipsoidal parallel arc length (the defining property of Albers)."""
        for lat1 in (crs.ALBERS_LAT1, crs.ALBERS_LAT2):
            dlon = 0.01
            x1, y1 = crs.lonlat_to_albers(np.array([-96.0]), np.array([lat1]))
            x2, y2 = crs.lonlat_to_albers(np.array([-96.0 + dlon]), np.array([lat1]))
            proj_d = float(np.hypot(x2 - x1, y2 - y1))
            # ellipsoidal parallel radius: a*cos(phi)/sqrt(1 - e^2 sin^2 phi)
            phi = np.radians(lat1)
            r_par = crs.GRS80_A * np.cos(phi) / np.sqrt(
                1 - crs.GRS80_E2 * np.sin(phi) ** 2
            )
            true_d = r_par * np.radians(dlon)
            assert proj_d == pytest.approx(true_d, rel=1e-6)

    def test_roundtrip_conus(self):
        lon = np.linspace(-124.0, -67.0, 30)
        lat = np.linspace(24.0, 49.0, 30)
        x, y = crs.lonlat_to_albers(lon, lat)
        lon2, lat2 = crs.albers_to_lonlat(x, y)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_conus_extent_plausible(self):
        """CONUS in 102039: x spans ~±2.4-3 Mm around the central meridian
        and y is entirely north of the latitude of origin (23°N) — the
        published shape of the USGS Albers CONUS extent. (The synthetic tile
        grid's Y0 = -900 km is a fixture value from the reference's own
        tests, deliberately south of real CONUS.)"""
        xmin, ymin, xmax, ymax = crs.transform_bounds(
            (-124.8, 24.4, -66.9, 49.4), crs.lonlat_to_albers
        )
        assert xmin < -2_000_000.0 < xmax  # grid X0 is inside the x span
        assert 0.0 < ymin < ymax < 3_500_000.0  # all north of lat0=23


class TestLocationBboxes:
    def test_three_crs_contract(self):
        # North Carolina-ish bbox (the reference's canonical demo state)
        nc = (-84.32, 33.84, -75.46, 36.59)
        out = crs.location_bboxes(nc)
        assert set(out) == {"EPSG:4326", "EPSG:3857", "ESRI:102039"}
        assert out["EPSG:4326"] == nc
        gx0, gy0, gx1, gy1 = out["EPSG:3857"]
        ax0, ay0, ax1, ay1 = out["ESRI:102039"]
        assert gx0 < gx1 and gy0 < gy1 and ax0 < ax1 and ay0 < ay1

    def test_densified_cover_contains_corner_transform(self):
        """Densified bounds must contain the raw corner transforms (edges of
        a lon/lat rect bow under Albers: parallels project to circular arcs
        concave toward the pole). For a bbox straddling the central meridian
        the BOTTOM edge's lowest point is interior (at lon0), so the
        densified cover must be a strict vertical superset of the corner
        transform there."""
        straddle = (-105.0, 30.0, -85.0, 45.0)
        xmin, ymin, xmax, ymax = crs.transform_bounds(straddle, crs.lonlat_to_albers)
        cx, cy = crs.lonlat_to_albers(
            np.array([straddle[0], straddle[2], straddle[0], straddle[2]]),
            np.array([straddle[1], straddle[1], straddle[3], straddle[3]]),
        )
        assert xmin <= cx.min() and xmax >= cx.max()
        assert ymax >= cy.max()
        assert ymin < cy.min()  # arc low point at lon0, below both corners
