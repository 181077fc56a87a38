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

    def test_zonal_percentiles_has_no_buffering_aggregate(self, spark):
        """PLANS.md §11: histogram percentiles — no `percentile(` aggregate
        (which buffers a group's value population) anywhere in the plan."""
        plan = _plan(spark, "zonal_percentiles")
        assert "percentile(" not in plan
        assert "ObjectHashAggregate" not in plan
