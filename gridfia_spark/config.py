"""Config-file-driven analysis runs (ref config.py:86-102 CalculationConfig /
GridFIASettings + config_templates.py:59-133 analysis templates).

The reference validates pydantic YAML configs and loops calculations one at
a time; the engine's config run compiles every ENABLED calculation into ONE
shared applyInPandas kernel pass (operators/metrics.metric_layers) and fans
the results out to the requested sinks — the multi-metric-per-scan plan the
reference approximates per chunk. Configs load from JSON or YAML — the
reference's configs are YAML (location_config.py:36-38 ``yaml.safe_load``);
``.yaml``/``.yml`` paths go through the safe stdlib-only subset loader in
gridfia_spark/yamlite.py, and the document shape matches the reference's
templates 1:1.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .api import _CALC_TABLE

OUTPUT_FORMATS = ("tiles_parquet", "csv_summary", "none")


@dataclass
class CalculationConfig:
    """One calculation entry (ref config.py:86-102)."""

    name: str
    enabled: bool = True
    parameters: dict[str, Any] = field(default_factory=dict)
    output_format: str = "tiles_parquet"
    output_name: str | None = None

    @property
    def out(self) -> str:
        return self.output_name or _CALC_TABLE.get(self.name, ("", self.name))[1]


@dataclass
class AnalysisConfig:
    """A full analysis document (ref config_templates.py:59-133). ``bbox``
    is the location-config scoping (ref location_config.py:44-102 /
    montana_config.py): when set, the run covers only tiles overlapping
    [xmin, ymin, xmax, ymax] in the engine CRS — the P7 rectangle
    prefilter, which Iceberg min-max pruning executes for free."""

    name: str = "custom_analysis"
    description: str = "Custom forest analysis configuration"
    output_dir: str = "output/custom_analysis"
    fmt: str = "rawz"
    bbox: list[float] | None = None
    calculations: list[CalculationConfig] = field(default_factory=list)


# template catalogue mirrors config_templates._create_analysis_template's
# calc_templates block; parameter names follow the ENGINE kernels
# (functions/kernels.py) — 'exclude_total_layer' is structural here (layer 0
# is always excluded by the kernel _species slice) and therefore not a knob
_CALC_TEMPLATES: dict[str, dict[str, Any]] = {
    "species_richness": {"parameters": {"biomass_threshold": 0.0}},
    "total_biomass": {"parameters": {}},
    "shannon_diversity": {"parameters": {"base": "e"}},
    "simpson_diversity": {"parameters": {"inverse": True}},
    "evenness": {"parameters": {}},
    "dominant_species": {"parameters": {}},
}


def create_config_template(
    name: str = "custom_analysis",
    calculations: list[str] | None = None,
    **kwargs: Any,
) -> AnalysisConfig:
    """Analysis template factory (config_templates.py:59-133); unknown
    calculation names raise with the known list."""
    calcs = calculations or ["species_richness", "total_biomass"]
    entries = []
    for c in calcs:
        if c not in _CALC_TEMPLATES:
            raise ValueError(
                f"no template for calculation {c!r}; templates exist for "
                f"{sorted(_CALC_TEMPLATES)}"
            )
        entries.append(CalculationConfig(name=c, **_CALC_TEMPLATES[c]))
    cfg = AnalysisConfig(
        name=name, output_dir=f"output/{name}", calculations=entries
    )
    for k, v in kwargs.items():
        if not hasattr(cfg, k):
            raise ValueError(f"unknown config field {k!r}")
        setattr(cfg, k, v)
    return cfg


def to_dict(cfg: AnalysisConfig) -> dict[str, Any]:
    return {
        "name": cfg.name,
        "description": cfg.description,
        "output_dir": cfg.output_dir,
        "fmt": cfg.fmt,
        "bbox": cfg.bbox,
        "calculations": [
            {
                "name": c.name,
                "enabled": c.enabled,
                "parameters": c.parameters,
                "output_format": c.output_format,
                "output_name": c.output_name,
            }
            for c in cfg.calculations
        ],
    }


def _is_yaml(path: str) -> bool:
    return path.lower().endswith((".yaml", ".yml"))


def save_config(cfg: AnalysisConfig, path: str) -> None:
    """JSON or (by extension) YAML — the reference's config dialect
    (location_config.py:36-38)."""
    with open(path, "w") as fh:
        if _is_yaml(path):
            from . import yamlite

            fh.write(yamlite.safe_dump(to_dict(cfg)))
        else:
            json.dump(to_dict(cfg), fh, indent=2)


def load_config(path: str) -> AnalysisConfig:
    with open(path) as fh:
        if _is_yaml(path):
            from . import yamlite

            doc = yamlite.safe_load(fh.read()) or {}
        else:
            doc = json.load(fh)
    calcs = [
        CalculationConfig(
            name=c["name"],
            enabled=c.get("enabled", True),
            parameters=dict(c.get("parameters", {})),
            output_format=c.get("output_format", "tiles_parquet"),
            output_name=c.get("output_name"),
        )
        for c in doc.get("calculations", [])
    ]
    bbox = doc.get("bbox")
    return AnalysisConfig(
        name=doc.get("name", "custom_analysis"),
        description=doc.get("description", ""),
        output_dir=doc.get("output_dir", "output"),
        fmt=doc.get("fmt", "rawz"),
        bbox=list(bbox) if bbox is not None else None,
        calculations=calcs,
    )


def validate_config(cfg: AnalysisConfig) -> list[str]:
    """Structural validation (ref config.py pydantic validators): returns a
    list of problems, empty when valid."""
    errs = []
    if not cfg.name:
        errs.append("name must be non-empty")
    if cfg.bbox is not None:
        if len(cfg.bbox) != 4:
            errs.append("bbox must be [xmin, ymin, xmax, ymax]")
        elif not (cfg.bbox[0] < cfg.bbox[2] and cfg.bbox[1] < cfg.bbox[3]):
            errs.append("bbox must satisfy xmin < xmax and ymin < ymax")
    if not cfg.calculations:
        errs.append("no calculations configured")
    seen: set[str] = set()
    for c in cfg.calculations:
        if c.name not in _CALC_TABLE:
            errs.append(
                f"unknown calculation {c.name!r}; valid: {sorted(_CALC_TABLE)}"
            )
        if c.output_format not in OUTPUT_FORMATS:
            errs.append(
                f"{c.name}: unknown output_format {c.output_format!r}; "
                f"valid: {OUTPUT_FORMATS}"
            )
        if c.out in seen:
            errs.append(f"duplicate output name {c.out!r}")
        seen.add(c.out)
    return errs


def run_analysis(
    spark: SparkSession, tiles: DataFrame, cfg: AnalysisConfig
) -> dict[str, Any]:
    """Execute a validated config: ALL enabled calculations in one shared
    kernel pass, then each result fans out to its configured sink. Returns
    {calc output name: output path (or the DataFrame for 'none')}.

    The metric frame is computed once and persisted for the duration of the
    fan-out, so N output sinks cost one kernel pass + N cheap writes."""
    from .api import GridFIASpark
    from .sources import sinks

    errs = validate_config(cfg)
    if errs:
        raise ValueError("invalid config: " + "; ".join(errs))
    enabled = [c for c in cfg.calculations if c.enabled]
    if not enabled:
        return {}
    if cfg.bbox is not None:
        # location scoping (P7): keep tiles whose rect overlaps the bbox —
        # pure range predicates on the tile metadata, prunable by storage
        from pyspark.sql import functions as F

        from .operators import decode as _decode

        bx0, by0, bx1, by1 = cfg.bbox
        meta = _decode.with_tile_meta(tiles)
        tiles = meta.filter(
            (F.col("xmin") < bx1)
            & (F.col("xmax") > bx0)
            & (F.col("ymin") < by1)
            & (F.col("ymax") > by0)
        ).select(*tiles.columns)
    api = GridFIASpark(spark)
    calc_args: list[dict[str, Any]] = [
        {"name": c.name, "output_name": c.out, **c.parameters} for c in enabled
    ]
    out = api.calculate_metrics(tiles, calc_args)
    os.makedirs(cfg.output_dir, exist_ok=True)
    results: dict[str, Any] = {}
    needs_persist = sum(c.output_format != "none" for c in enabled) > 1
    if needs_persist:
        out = out.persist()
    try:
        first = tiles.select("w", "h").first()
        tw, th = int(first.w), int(first.h)
        for c in enabled:
            if c.output_format == "none":
                results[c.out] = out
            elif c.output_format == "tiles_parquet":
                path = os.path.join(cfg.output_dir, f"{c.out}.parquet")
                enc = sinks.metric_to_tiles(
                    out.select("gx", "gy", c.out), c.out, tw, th, fmt=cfg.fmt
                )
                enc.write.mode("overwrite").parquet(path)
                results[c.out] = path
            elif c.output_format == "csv_summary":
                path = os.path.join(cfg.output_dir, f"{c.out}.csv")
                from pyspark.sql import functions as F

                summary = out.agg(
                    F.min(c.out).alias("vmin"),
                    F.max(c.out).alias("vmax"),
                    F.avg(c.out).alias("vmean"),
                    F.count("*").alias("n_px"),
                )
                sinks.write_report_csv(summary, path)
                results[c.out] = path
    finally:
        if needs_persist:
            out.unpersist()
    return results
