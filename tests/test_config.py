"""Config-driven run layer (ref config.py:86-102, config_templates.py:59-133,
console.py): template -> save -> load -> validate -> run, with the metric
values checked against the kernel oracle."""

from __future__ import annotations

import json

import numpy as np
import pytest

from gridfia_spark import codecs, config as C
from gridfia_spark.constants import SF_SPECS
from gridfia_spark.datagen import pixels, tiles as tgen
from gridfia_spark.functions import kernels

SF_DIR = "/root/testdata/sf0.001"
SPEC = SF_SPECS["0.001"]


class TestConfigDocument:
    def test_template_roundtrip(self, tmp_path):
        cfg = C.create_config_template(
            "t1", ["species_richness", "shannon_diversity", "simpson_diversity"]
        )
        path = tmp_path / "cfg.json"
        C.save_config(cfg, str(path))
        loaded = C.load_config(str(path))
        assert C.to_dict(loaded) == C.to_dict(cfg)
        assert C.validate_config(loaded) == []
        # document shape matches the reference template fields
        doc = json.loads(path.read_text())
        assert {"name", "description", "output_dir", "calculations"} <= set(doc)
        assert all({"name", "enabled", "parameters"} <= set(c) for c in doc["calculations"])

    def test_yaml_roundtrip_and_twin_parity(self, tmp_path):
        """VERDICT r5 #8: .yaml configs load through the yamlite subset
        parser; the committed YAML twin decodes to the same document as
        the JSON example (modulo the twin-marker description)."""
        import os

        cfg = C.create_config_template(
            "t1", ["species_richness", "shannon_diversity"]
        )
        ypath = tmp_path / "cfg.yaml"
        C.save_config(cfg, str(ypath))
        assert ypath.read_text().startswith("name:")
        loaded = C.load_config(str(ypath))
        assert C.to_dict(loaded) == C.to_dict(cfg)
        ex = os.path.join(os.path.dirname(__file__), "..", "examples")
        jd = C.to_dict(C.load_config(os.path.join(ex, "analysis_config.json")))
        yd = C.to_dict(C.load_config(os.path.join(ex, "analysis_config.yaml")))
        jd.pop("description"), yd.pop("description")
        assert jd == yd

    def test_yamlite_subset_semantics(self):
        """The YAML-subset loader: comments, quoting, flow collections,
        level-indented sequences — and loud rejection of out-of-scope
        constructs (anchors/tags/block scalars/tabs)."""
        from gridfia_spark import yamlite

        doc = yamlite.safe_load(
            "# c\nname: 'a: b'\nbbox: [1, 2.5, -3, 4]\nflags: {x: true, y: null}\n"
            "calcs:\n- name: r1\n  params:\n    t: 0.5\n- name: r2\nempty: {}\n"
        )
        assert doc == {
            "name": "a: b",
            "bbox": [1, 2.5, -3, 4],
            "flags": {"x": True, "y": None},
            "calcs": [{"name": "r1", "params": {"t": 0.5}}, {"name": "r2"}],
            "empty": {},
        }
        assert yamlite.safe_load(yamlite.safe_dump(doc)) == doc
        for bad in ("a: &x 1", "a: *x", "a: !!tag v", "a: |\n  t", "\ta: 1"):
            with pytest.raises(ValueError):
                yamlite.safe_load(bad)

    def test_unknown_template_and_validation_errors(self):
        with pytest.raises(ValueError, match="no template"):
            C.create_config_template("x", ["not_a_calc"])
        bad = C.AnalysisConfig(
            calculations=[
                C.CalculationConfig(name="nope"),
                C.CalculationConfig(name="total_biomass", output_format="geotiff"),
                C.CalculationConfig(name="species_richness", output_name="dup"),
                C.CalculationConfig(name="evenness", output_name="dup"),
            ]
        )
        errs = C.validate_config(bad)
        assert any("unknown calculation" in e for e in errs)
        assert any("output_format" in e for e in errs)
        assert any("duplicate output name" in e for e in errs)


class TestRunAnalysis:
    def test_run_matches_kernels(self, spark, tmp_path):
        cfg = C.create_config_template(
            "run1", ["species_richness", "total_biomass"],
            output_dir=str(tmp_path / "out"),
        )
        cfg.calculations[0].output_format = "tiles_parquet"
        cfg.calculations[1].output_format = "csv_summary"
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        results = C.run_analysis(spark, tiles, cfg)
        # tiles_parquet sink: decode tile (0,0) and compare to the kernel
        rich_rows = spark.read.parquet(results["richness"]).collect()
        cube = pixels.full_cube(SPEC)
        want = kernels.species_richness(cube)
        r0 = next(r for r in rich_rows if r.image_id == "m_richness_tx000_ty000")
        got = codecs.decode(bytes(r0.bytes), SPEC.tile_w, SPEC.tile_h, r0.fmt)
        np.testing.assert_array_equal(
            got, want[: SPEC.tile_h, : SPEC.tile_w].astype(np.float32)
        )
        # csv sink: global stats match the cube
        import pandas as pd

        tb = kernels.total_biomass(cube)
        df = pd.read_csv(results["total_biomass"])
        assert df.loc[0, "vmax"] == pytest.approx(float(tb.max()))
        assert df.loc[0, "n_px"] == SPEC.gw * SPEC.gh

    def test_invalid_config_raises(self, spark):
        cfg = C.AnalysisConfig(calculations=[C.CalculationConfig(name="nope")])
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        with pytest.raises(ValueError, match="invalid config"):
            C.run_analysis(spark, tiles, cfg)


class TestConsole:
    def test_template_and_validate_cli(self, tmp_path, capsys):
        from gridfia_spark import console

        path = str(tmp_path / "c.json")
        assert console.main(["template", path, "--calculations",
                             "species_richness,evenness"]) == 0
        assert console.main(["validate", path]) == 0
        # corrupt it -> validation fails
        doc = json.loads(open(path).read())
        doc["calculations"][0]["name"] = "bogus"
        open(path, "w").write(json.dumps(doc))
        assert console.main(["validate", path]) == 1


class TestLocationBbox:
    def test_bbox_scoped_run(self, spark, tmp_path):
        """Location-config scoping (ref location_config.py:44-102): a bbox
        covering the west half of the grid runs the same calculations over
        only the overlapping tiles."""
        from gridfia_spark import config as C
        from gridfia_spark.constants import PIX, X0, Y0, spec_for_sf_dir
        from gridfia_spark.datagen import tiles as tgen

        sf = "/root/testdata/sf0.001"
        spec = spec_for_sf_dir(sf)
        w_m, h_m = spec.gw * PIX, spec.gh * PIX
        cfg = C.create_config_template("west", ["species_richness"])
        cfg.output_dir = str(tmp_path / "west")
        cfg.bbox = [X0, Y0 - h_m, X0 + w_m / 2, Y0]
        cfg.calculations[0].output_format = "none"
        tiles = tgen.ensure_tiles(spark, sf)
        out = C.run_analysis(spark, tiles, cfg)["richness"]
        # only pixels of the west-half tiles appear
        assert out.count() == (spec.gw // 2) * spec.gh
        assert out.agg({"gx": "max"}).first()[0] == spec.gw // 2 - 1
        # full-grid run for comparison
        cfg2 = C.create_config_template("all", ["species_richness"])
        cfg2.output_dir = str(tmp_path / "all")
        cfg2.calculations[0].output_format = "none"
        full = C.run_analysis(spark, tiles, cfg2)["richness"]
        west = {(r.gx, r.gy): r.richness for r in out.collect()}
        ref = {
            (r.gx, r.gy): r.richness
            for r in full.collect()
            if r.gx < spec.gw // 2
        }
        assert west == ref

    def test_bbox_validation(self):
        from gridfia_spark import config as C

        cfg = C.create_config_template("x", ["species_richness"])
        cfg.bbox = [0.0, 0.0, -1.0, 1.0]
        assert any("bbox" in e for e in C.validate_config(cfg))
        cfg.bbox = [1.0, 2.0, 3.0]
        assert any("bbox" in e for e in C.validate_config(cfg))
        cfg.bbox = [0.0, 0.0, 1.0, 1.0]
        assert not any("bbox" in e for e in C.validate_config(cfg))

    def test_bbox_json_roundtrip(self, tmp_path):
        from gridfia_spark import config as C

        cfg = C.create_config_template("rt", ["species_richness"])
        cfg.bbox = [1.0, 2.0, 3.0, 4.0]
        path = str(tmp_path / "c.json")
        C.save_config(cfg, path)
        assert C.load_config(path).bbox == [1.0, 2.0, 3.0, 4.0]
        cfg.bbox = None
        C.save_config(cfg, path)
        assert C.load_config(path).bbox is None
