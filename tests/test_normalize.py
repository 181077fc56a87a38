"""Exact histogram matching (operators/normalize.py)."""

from __future__ import annotations

import numpy as np
import pytest

from gridfia_spark import codecs
from gridfia_spark.constants import SPECIES, spec_for_sf_dir
from gridfia_spark.datagen import pixels, tiles as tgen
from gridfia_spark.datagen.tiles import TILE_SCHEMA
from gridfia_spark.operators import normalize

SF_DIR = "/root/testdata/sf0.001"
CLIP = 18


def _clipped(tiles, cap):
    import pandas as pd

    def f(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = codecs.decode(r.bytes, r.w, r.h, r.fmt)
                rows.append((r.image_id,
                             codecs.encode(np.minimum(a, np.float32(cap)),
                                           "rawz"),
                             r.w, r.h, "rawz", r.caption, r.phash))
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash"])

    return tiles.mapInPandas(f, TILE_SCHEMA)


def _numpy_map(src_cube, ref_cube):
    """Per-layer exact quantile map replicated in pure numpy."""
    maps = {}
    for s in range(src_cube.shape[0]):
        b = src_cube[s].astype(np.int64).ravel()
        a = ref_cube[s].astype(np.int64).ravel()
        vs_b, cnt_b = np.unique(b, return_counts=True)
        vs_a, cnt_a = np.unique(a, return_counts=True)
        cum_b, cum_a = cnt_b.cumsum(), cnt_a.cumsum()
        n_b, n_a = b.size, a.size
        m = {}
        j = 0
        for v, cb in zip(vs_b, cum_b):
            while j < len(vs_a) - 1 and cum_a[j] * n_b < cb * n_a:
                j += 1
            m[int(v)] = int(vs_a[j])
        maps[s] = m
    return maps


class TestHistogramMatch:
    def test_self_match_is_identity(self, spark):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        out = normalize.histogram_match(tiles, tiles).collect()
        src = {r["image_id"]: r for r in tiles.collect()}
        for r in out:
            a = codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"])
            o = src[r["image_id"]]
            b = codecs.decode(o["bytes"], o["w"], o["h"], o["fmt"])
            np.testing.assert_array_equal(a, b)

    def test_matches_numpy_twin(self, spark):
        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        drifted = _clipped(tiles, CLIP)
        out = normalize.histogram_match(drifted, tiles).collect()
        cube = pixels.full_cube(spec)
        maps = _numpy_map(np.minimum(cube, CLIP), cube)
        code_to_s = {c: i for i, (c, _) in enumerate(SPECIES)}
        import re

        for r in out:
            m = re.match(r"sp(\d{4})_tx(\d+)_ty(\d+)", r["image_id"])
            s = code_to_s[m.group(1)]
            tx, ty = int(m.group(2)), int(m.group(3))
            got = codecs.decode(r["bytes"], r["w"], r["h"], r["fmt"]).astype(
                np.int64
            )
            src_blk = np.minimum(
                cube[s,
                     ty * spec.tile_h:(ty + 1) * spec.tile_h,
                     tx * spec.tile_w:(tx + 1) * spec.tile_w],
                CLIP,
            ).astype(np.int64)
            want = np.vectorize(maps[s].get)(src_blk)
            np.testing.assert_array_equal(got, want)

    def test_monotone_map(self, spark):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        mp = normalize.build_match_map(_clipped(tiles, CLIP), tiles)
        by_s: dict[int, list[tuple[int, int]]] = {}
        for (s, v), a in mp.items():
            by_s.setdefault(s, []).append((v, a))
        for s, pairs in by_s.items():
            pairs.sort()
            outs = [a for _, a in pairs]
            assert outs == sorted(outs), f"non-monotone map for layer {s}"

    def test_missing_ref_layer_raises(self, spark):
        from pyspark.sql import functions as F

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        ref = tiles.filter(~F.col("image_id").startswith("sp0000"))
        with pytest.raises(ValueError, match="absent from reference"):
            normalize.build_match_map(tiles, ref)

    def test_transform_plan_is_map_only(self, spark):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        plan = (
            normalize.histogram_match(tiles, tiles)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" not in plan
