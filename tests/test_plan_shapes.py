"""Plan-shape regression tests: the scale contracts documented in PLANS.md,
pinned so a refactor that silently reintroduces a shuffle or widens a scan
fails CI instead of surviving until a 100x deployment finds it."""

from __future__ import annotations

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    from gridfia_spark import queries as Q

    df = Q.registry()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _hash_exchanges(plan: str) -> int:
    return len(re.findall(r"Exchange hashpartitioning", plan))


class TestPlanShapes:
    def test_tile_assignment_is_zero_shuffle(self, spark):
        """PLANS.md §1: map-only broadcast-covering join — no shuffle
        exchange at all, and `bytes` pruned from the scan."""
        plan = _plan(spark, "tile_assignment")
        assert _hash_exchanges(plan) == 0
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "bytes" not in scan

    def test_metrics_pixel_single_shuffle(self, spark):
        """PLANS.md §3: ALL kernels share one groupBy(tx, ty) exchange."""
        assert _hash_exchanges(_plan(spark, "metrics_pixel")) == 1

    def test_zonal_single_shuffle(self, spark):
        """PLANS.md §2: map-side partials -> one tiny final groupBy."""
        assert _hash_exchanges(_plan(spark, "zonal_total_biomass")) == 1

    def test_media_chains_have_no_exchange(self, spark):
        """PLANS.md §14: container pipelines are fused map-only chains —
        media bytes never cross the network."""
        for name in ("wav_audio_stats", "video_frame_stats"):
            plan = _plan(spark, name)
            assert "Exchange" not in plan, f"{name} plan shuffles: {plan[:400]}"

    def test_distributed_zonal_broadcasts_nothing(self, spark):
        """PLANS.md §2 (scale path): with distributed=True the candidate-pair
        frame is O(tiles × overlapping polys) and the WKB frame is
        O(polygons) — neither may be broadcast. The pair side meets the tile
        bytes in a shuffle-hash join (bytes stream, never sorted)."""
        plan = _plan(spark, "zonal_many_polygons")
        # the only broadcasts allowed are the O(n_species) code-dimension
        # zip-join inside with_tile_meta — never a join keyed on
        # image_id / poly_id / cell_id (the O(tiles)/O(polygons) frames)
        bad = re.findall(r"BroadcastHashJoin \[(?:image_id|poly_id|cell_id)", plan)
        assert not bad, plan[:600]
        assert re.search(r"ShuffledHashJoin \[image_id", plan)

    def test_driver_zonal_still_map_side(self, spark):
        """The small-polygon driver-covering path stays map-side: tile
        bytes never shuffle and no join operator touches them (the polygon
        index rides a SparkContext broadcast inside the kernel; the species
        dimension is a map literal since r6 — so the plan has NO join at
        all, and the only exchange is the final tiny aggregation)."""
        plan = _plan(spark, "zonal_total_biomass")
        assert "Join" not in plan, plan[:400]
        scan = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "bytes" in scan  # the one pass that decodes
        assert _hash_exchanges(plan) == 1  # partials -> final groupBy only

    def test_spend_quartiles_no_global_window(self, spark):
        """PLANS.md §12 addendum: NTILE semantics without a global sort —
        no ntile over an unpartitioned window; every Window operator is
        partitioned, and the only SinglePartition exchange is the 1-row
        scalar count aggregate."""
        plan = _plan(spark, "spend_quartiles")
        assert "ntile" not in plan
        for line in plan.splitlines():
            line = line.strip().lstrip("+-: ")
            if line.startswith("Window "):
                assert not re.search(r"\], \[\s*\], \[", line), line
        assert plan.count("Exchange SinglePartition") <= 1

    def test_container_roundtrips_are_map_only(self, spark):
        """PLANS.md §14 extension: the GeoTIFF transcode chain and the
        Zarr chunk scan are map-only — container bytes never cross a
        shuffle; the only broadcast is the species-code dimension."""
        for name in ("geotiff_roundtrip", "zarr_store_roundtrip"):
            plan = _plan(spark, name)
            assert _hash_exchanges(plan) == 0, name

    def test_zonal_percentiles_has_no_buffering_aggregate(self, spark):
        """PLANS.md §11: histogram percentiles — no `percentile(` aggregate
        (which buffers a group's value population) anywhere in the plan."""
        plan = _plan(spark, "zonal_percentiles")
        assert "percentile(" not in plan
        assert "ObjectHashAggregate" not in plan
