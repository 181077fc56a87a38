"""Latest-wins epoch compositing (operators/compositing.py)."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfia_spark import codecs
from gridfia_spark.datagen import tiles as tgen
from gridfia_spark.datagen.tiles import TILE_SCHEMA
from gridfia_spark.operators import compositing, decode

SF_DIR = "/root/testdata/sf0.001"


def _patched(tiles, pred, cap):
    """Clip the tiles matching ``pred`` at ``cap`` (a sparse patch)."""
    import pandas as pd

    meta = decode.with_tile_meta(tiles)
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]

    def f(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = codecs.decode(r.bytes, r.w, r.h, r.fmt)
                rows.append((r.image_id,
                             codecs.encode(np.minimum(a, np.float32(cap)),
                                           "rawz"),
                             r.w, r.h, "rawz", r.caption, r.phash))
            yield pd.DataFrame(rows, columns=cols)

    return meta.filter(pred).select(*cols).mapInPandas(f, TILE_SCHEMA)


class TestComposeLatest:
    def test_patch_wins_elsewhere_untouched(self, spark):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        patch = _patched(tiles, F.col("tx") == 0, 5)
        out = compositing.compose_latest([tiles, patch])
        src = {r["image_id"]: r for r in tiles.collect()}
        got = {r["image_id"]: r for r in out.collect()}
        assert set(got) == set(src)
        for iid, r in got.items():
            a = codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"])
            b = codecs.decode(src[iid]["bytes"], src[iid]["w"],
                              src[iid]["h"], src[iid]["fmt"])
            tx = int(re.search(r"_tx(\d+)_", iid).group(1))
            want = np.minimum(b, np.float32(5)) if tx == 0 else b
            np.testing.assert_array_equal(a, want)

    def test_three_epochs_latest_wins(self, spark):
        """A later patch overrides an earlier patch on overlap."""
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        p1 = _patched(tiles, F.col("tx") == 0, 5)
        p2 = _patched(tiles, (F.col("tx") == 0) & (F.col("ty") == 0), 2)
        out = compositing.compose_latest([tiles, p1, p2])
        got = {r["image_id"]: r for r in out.collect()}
        a = got["sp0131_tx000_ty000"]
        arr = codecs.decode(a["bytes"], a["w"], a["h"], a["fmt"])
        assert arr.max() <= 2.0  # p2 won
        b = got["sp0131_tx000_ty001"]
        arr2 = codecs.decode(b["bytes"], b["w"], b["h"], b["fmt"])
        assert 2.0 < arr2.max() <= 5.0  # p1 still wins where p2 absent

    def test_plan_one_exchange_partial_combine_no_window(self, spark):
        """The load-bearing shape: ONE hash exchange, a PARTIAL max_by
        aggregate before it (duplicates collapse map-side), and no
        Window operator anywhere."""
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        patch = _patched(tiles, F.col("tx") == 0, 5)
        plan = (
            compositing.compose_latest([tiles, patch])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
        assert "Window" not in plan
        # the partial max_by must sit BELOW the exchange (later in the
        # printed tree): duplicates collapse map-side before the shuffle
        assert "partial_max_by" in plan
        assert plan.index("Exchange hashpartitioning") < plan.index(
            "partial_max_by"
        )

    def test_empty_list_raises(self):
        with pytest.raises(ValueError, match="at least one"):
            compositing.compose_latest([])
