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
