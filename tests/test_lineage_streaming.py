"""Resumability (lineage) and incremental-streaming tests (M6 + §2.9)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from gridfia_spark.datagen import tiles as tgen
from gridfia_spark.operators import broadcast_join, decode
from gridfia_spark.plans import lineage
from gridfia_spark.streaming import incremental

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


class TestLineage:
    def test_resume_skips_completed_and_output_identical(self, spark, workdir):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        meta = decode.with_tile_meta(tiles)
        pids = ["0", "1"]  # partition by tile row ty

        calls = []

        def job(s, pid):
            calls.append(pid)
            return meta.filter(F.col("ty") == int(pid)).select("image_id", "s", "tx", "ty")

        out1 = os.path.join(workdir, "job1")
        r1 = lineage.run_resumable(spark, pids, job, out1, job_id="t1")
        assert r1["ran"] == pids and r1["skipped"] == []
        full = lineage.read_output(spark, out1).count()

        # resume: nothing re-runs
        r2 = lineage.run_resumable(spark, pids, job, out1, job_id="t2")
        assert r2["ran"] == [] and r2["skipped"] == pids
        assert lineage.read_output(spark, out1).count() == full
        assert calls == pids  # job_fn invoked exactly once per partition

    def test_crash_mid_job_resumes_exactly(self, spark, workdir):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        meta = decode.with_tile_meta(tiles)
        out = os.path.join(workdir, "job2")

        def flaky(s, pid):
            if pid == "1":
                raise RuntimeError("injected crash")
            return meta.filter(F.col("ty") == int(pid)).select("image_id")

        with pytest.raises(RuntimeError):
            lineage.run_resumable(spark, ["0", "1"], flaky, out, job_id="c1")
        # partition 0 committed, 1 absent
        assert lineage.completed_partitions(spark, out) == {"0"}

        def fixed(s, pid):
            return meta.filter(F.col("ty") == int(pid)).select("image_id")

        r = lineage.run_resumable(spark, ["0", "1"], fixed, out, job_id="c2")
        assert r["ran"] == ["1"] and r["skipped"] == ["0"]
        # final output equals a clean run
        got = {r.image_id for r in lineage.read_output(spark, out).collect()}
        want = {r.image_id for r in meta.select("image_id").collect()}
        assert got == want

    def test_metrics_recorded(self, spark, workdir):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        out = os.path.join(workdir, "job3")

        def job(s, pid):
            return decode.with_tile_meta(tiles).filter(F.col("ty") == int(pid)).select("image_id")

        lineage.run_resumable(spark, ["0"], job, out)
        m = lineage.job_metrics(spark, out).first()
        assert m.status == "done" and m.rows > 0 and m.bytes > 0 and m.wall_ms >= 0
        assert m.snapshot_id


class TestIncrementalStreaming:
    def test_stream_equals_batch_and_restarts_incrementally(self, spark, workdir):
        # stage the tile table as a growing directory: first half, then rest
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        polys = tgen.polygons_df(spark, SF_DIR)
        stage = os.path.join(workdir, "tiles")
        work = os.path.join(workdir, "stream")
        half1 = tiles.filter(F.col("image_id") < "sp05")
        half2 = tiles.filter(F.col("image_id") >= "sp05")
        half1.write.mode("overwrite").parquet(stage)

        incremental.incremental_zonal(spark, stage, polys, work, species=0, res=14)
        r1 = {r.poly_id: r.sum_v for r in incremental.zonal_result(spark, work).collect()}

        # append the rest, run the SAME stream again (availableNow restart)
        half2.write.mode("append").parquet(stage)
        incremental.incremental_zonal(spark, stage, polys, work, species=0, res=14)
        r2 = {
            (r.poly_id): (r.n_px, r.sum_v, r.max_v, r.nonzero_px)
            for r in incremental.zonal_result(spark, work).collect()
        }

        batch = {
            r.poly_id: (r.n_px, r.sum_v, r.max_v, r.nonzero_px)
            for r in broadcast_join.zonal_stats_fast(tiles, polys, species=0, res=14).collect()
        }
        assert r2 == batch
        # first pass saw only half the tiles (strictly less than final)
        assert all(r1[p] <= batch[p][1] for p in r1)


class TestIncrementalDedup:
    def test_incremental_equals_batch_lsh(self, spark, tmp_path):
        """Two AvailableNow passes over a growing corpus must accumulate
        exactly the batch LSH pair set over the final corpus — including
        pairs that CROSS the ingest boundary (new doc vs a doc committed in
        an earlier batch) — and a third pass over unchanged input must add
        nothing."""
        from pyspark.sql import functions as F

        from gridfia_spark.operators import text
        from gridfia_spark.streaming import dedup

        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter(F.col("doc_id") < 40)
        )
        first = docs.filter(F.col("doc_id") < 20)
        # second delta: new docs 20..39 PLUS near-copies of batch-1 docs
        # (cross-batch duplicates)
        copies = first.filter(F.col("doc_id") < 5).withColumn(
            "doc_id", F.col("doc_id") + 10_000
        )
        second = docs.filter(F.col("doc_id") >= 20).unionByName(copies)

        corpus_dir = str(tmp_path / "corpus")
        work = str(tmp_path / "dedup")
        first.coalesce(1).write.mode("overwrite").parquet(corpus_dir)
        dedup.incremental_near_dups(spark, corpus_dir, work)
        second.coalesce(1).write.mode("append").parquet(corpus_dir)
        dedup.incremental_near_dups(spark, corpus_dir, work)

        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.near_dup_result(spark, work).collect()
        }
        full = first.unionByName(second)
        want = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in text.minhash_lsh_pairs(full).collect()
        }
        assert got == want
        # the seeded cross-batch exact copies must be present
        assert {(d, d + 10_000, 1.0) for d in range(5)} <= got
        # idempotent third pass: no new files -> no new pairs
        dedup.incremental_near_dups(spark, corpus_dir, work)
        again = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.near_dup_result(spark, work).collect()
        }
        assert again == got
