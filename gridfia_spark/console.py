"""CLI for config-driven runs (ref console.py's typer CLI, recast on
stdlib argparse — no rich/typer in the sandbox).

    python -m gridfia_spark.console template out.json --calculations a,b
    python -m gridfia_spark.console validate cfg.json
    python -m gridfia_spark.console run cfg.json --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    from . import config as C

    p = argparse.ArgumentParser(prog="gridfia-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("template", help="write an analysis config template")
    t.add_argument("path")
    t.add_argument("--name", default="custom_analysis")
    t.add_argument("--calculations", default="species_richness,total_biomass")

    v = sub.add_parser("validate", help="validate a config file")
    v.add_argument("path")

    r = sub.add_parser("run", help="run an analysis config")
    r.add_argument("path")
    r.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    r.add_argument("--cores", default="8")

    args = p.parse_args(argv)
    if args.cmd == "template":
        cfg = C.create_config_template(
            name=args.name, calculations=args.calculations.split(",")
        )
        C.save_config(cfg, args.path)
        print(f"wrote template {args.path}")
        return 0
    if args.cmd == "validate":
        errs = C.validate_config(C.load_config(args.path))
        if errs:
            for e in errs:
                print(f"ERROR: {e}", file=sys.stderr)
            return 1
        print("config valid")
        return 0
    # run
    cfg = C.load_config(args.path)
    from .datagen import tiles as tgen
    from .session import get_spark

    spark = get_spark(cores=args.cores, app_name=f"gridfia-{cfg.name}")
    tiles = tgen.ensure_tiles(spark, args.sf_dir, fmt=cfg.fmt)
    results = C.run_analysis(spark, tiles, cfg)
    print(json.dumps({k: str(v) for k, v in results.items()}, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
