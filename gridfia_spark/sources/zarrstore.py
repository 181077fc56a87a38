"""Genuine Zarr directory store (v2 AND v3): distributed chunk write + scan.

The reference's core storage abstraction IS a Zarr cube — a (species, y, x)
float32 array chunked (1, chunk_h, chunk_w) (zarr_utils.py:259-320, chunks
at :280; the v3 API create path at :698-745). The engine's tile rows map
1:1 to those chunks, so the store can be written and read with nothing but
the public Zarr specs:

- **v2** (zarr-specs v2): ``.zgroup``/``.zarray``/``.zattrs`` JSON + one
  file per chunk named ``s.ty.tx``, raw C-order bytes through the named
  compressor (stdlib zlib here — a first-class registered v2 codec id).
- **v3** (zarr-specs v3, the dialect the reference's ``zarr.open_group``
  writes): a single ``zarr.json`` per node (group and array), chunks under
  the default chunk-key encoding ``c/<s>/<ty>/<tx>`` with ``/`` separator,
  through the spec's ``bytes`` (little-endian) + ``gzip`` codec chain.
  The reference's own stores use the Blosc codec
  (``zarr.codecs.BloscCodec(cname='lz4', shuffle='shuffle')``,
  zarr_utils.py:702-705) — those chunks decode through the pure-python
  Blosc1-LZ4 codec (gridfia_spark/blosc.py), in BOTH dialects (v2
  ``{"id": "blosc"}`` compressors and v3 ``blosc`` codec entries), and
  ``codec='blosc'`` writes them back. Blosc cnames beyond lz4 (zstd,
  snappy, blosclz) and bit-shuffle refuse loudly. The pure-python LZ4 is
  correctness-grade: use blosc for interop with existing reference
  stores, the zlib/gzip defaults for throughput.

- WRITE is fully distributed: every Spark task serializes and writes its
  own chunk files — exactly how Zarr is written to object stores at scale,
  no driver assembly, no shuffle; only the tiny JSON metadata is
  driver-side.
- READ is a distributed ``binaryFile`` scan over the chunk files: chunk
  indices parsed from the file path (a pure projection — partition-prune
  friendly), decoded in the task, re-encoded as engine tile rows.
- Georeferencing is written to the ROOT group attributes in the
  reference's own layout (zarr_utils.py:721-726: ``crs`` string,
  ``transform`` in rasterio Affine order (a,b,c,d,e,f), ``bounds``
  (left,bottom,right,top), ``width``/``height``/``num_species``, with
  ``species_codes``/``species_names`` as the attr fallback the reference
  reads at :324) — so a reference ZarrStore opening this store sees real
  georeferencing, not silent defaults. The engine's array-level ``.zattrs``
  keeps the GDAL-style ``[X0, PIX, 0, Y0, 0, -PIX]`` transform for
  xarray-style consumers; the two layouts are documented here and distinct
  by level.

Round-tripped bit-exact through `zarr_store_roundtrip` (v2) and
`zarr_v3_roundtrip` (v3); in-place layer append through `zarr_append_layer`
(ref append_species_to_zarr, zarr_utils.py:754-818).
"""

from __future__ import annotations

import gzip as _gzip
import json
import os
import zlib
from collections.abc import Iterator
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import codecs
from ..constants import CRS, PIX, SPECIES, UNITS, X0, Y0, caption, image_id
from ..operators import decode

ZARR_FORMAT = 2  # default write dialect (back-compat)


def _root_attrs(n_layers: int, gw: int, gh: int, codes=None, names=None,
                transform: list | None = None) -> dict:
    """Root-group attributes in the REFERENCE's layout (zarr_utils.py:
    721-726): transform is rasterio Affine order (a,b,c,d,e,f) =
    (PIX, 0, X0, 0, -PIX, Y0) — NOT the GDAL-style order the engine uses
    in captions; bounds are (left, bottom, right, top). ``transform``
    overrides the canonical affine (derived products on a DIFFERENT
    grid — e.g. a warped cube — must not claim the source grid's
    georeferencing); bounds follow from it."""
    codes = codes if codes is not None else [c for c, _ in SPECIES[:n_layers]]
    names = names if names is not None else [n for _, n in SPECIES[:n_layers]]
    t = list(transform) if transform is not None else [
        PIX, 0.0, X0, 0.0, -PIX, Y0
    ]
    a, _, c, _, e, f = t
    return {
        "crs": CRS,
        "transform": t,
        "bounds": [c, f + gh * e, c + gw * a, f],
        "width": gw,
        "height": gh,
        "num_species": n_layers,
        "species_codes": codes,
        "species_names": names,
        "units": UNITS,
    }


def _grid_info(tiles: DataFrame):
    """(n_layers, tw, th, gw, gh, meta_df) for a uniform tile table."""
    meta = decode.with_tile_meta(tiles)
    info = meta.agg(
        F.max("s").alias("smax"),
        F.max("tx").alias("txmax"),
        F.max("ty").alias("tymax"),
        F.min("w").alias("w"),
        F.min("h").alias("h"),
        F.max("w").alias("wmax"),
        F.max("h").alias("hmax"),
    ).first()
    if info.w != info.wmax or info.h != info.hmax:
        raise ValueError("zarr chunks require uniform tile dimensions")
    n_layers = int(info.smax) + 1
    tw, th = int(info.w), int(info.h)
    gw, gh = (int(info.txmax) + 1) * tw, (int(info.tymax) + 1) * th
    return n_layers, tw, th, gw, gh, meta


def _default_codec(zarr_format: int) -> str:
    return "gzip" if zarr_format == 3 else "zlib"


def _write_chunks(
    meta: DataFrame,
    adir: str,
    level: int,
    zarr_format: int,
    layer: int | None = None,
    codec: str | None = None,
) -> int:
    """Distributed chunk write: every task serializes and writes its own
    chunk files (v2 ``s.ty.tx`` flat names; v3 ``c/s/ty/tx`` nested keys;
    gzip written with mtime=0 so bytes are deterministic). ``codec`` is
    ``zlib``/``gzip``/``blosc`` (default per dialect); ``layer`` overrides
    the layer index for single-layer appends. Returns the chunk count."""
    v3 = zarr_format == 3
    codec = codec or _default_codec(zarr_format)
    os.makedirs(adir, exist_ok=True)

    def wchunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import blosc as _blosc

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = codecs.decode(r.bytes, int(r.w), int(r.h), r.fmt)
                buf = np.ascontiguousarray(arr, dtype="<f4").tobytes()
                s = int(r.s) if layer is None else layer
                if codec == "blosc":
                    blob = _blosc.encode_chunk(buf, typesize=4)
                elif codec == "gzip":
                    blob = _gzip.compress(buf, compresslevel=level, mtime=0)
                else:
                    blob = zlib.compress(buf, level)
                if v3:
                    cdir = os.path.join(adir, "c", str(s), str(int(r.ty)))
                    os.makedirs(cdir, exist_ok=True)
                    name = os.path.join(cdir, str(int(r.tx)))
                else:
                    name = os.path.join(adir, f"{s}.{int(r.ty)}.{int(r.tx)}")
                with open(name, "wb") as fh:
                    fh.write(blob)
                out.append((int(s), int(r.tx), int(r.ty), int(r.w), int(r.h)))
            if out:
                yield pd.DataFrame(
                    out, columns=["s", "tx", "ty", "w", "h"]
                )

    manifest = meta.select("s", "tx", "ty", "bytes", "w", "h", "fmt").mapInPandas(
        wchunks, "s int, tx int, ty int, w int, h int"
    )
    return int(manifest.agg(F.count("*").alias("n")).first().n)


def _write_array_meta(
    path: str, array: str, shape: list[int], chunks: list[int],
    level: int, zarr_format: int, root_attrs: dict, codec: str | None = None,
    codecs_doc: list[dict] | None = None,
) -> None:
    """Driver-side metadata documents for either dialect. ``codecs_doc``
    (v3 only) overrides the codec chain verbatim — the sharding_indexed
    path passes its shard codec document and ``chunks`` is then the OUTER
    shard shape."""
    codec = codec or _default_codec(zarr_format)
    adir = os.path.join(path, array)
    os.makedirs(adir, exist_ok=True)
    if zarr_format == 3:
        if codec == "blosc":
            comp_entry = {
                "name": "blosc",
                "configuration": {
                    "cname": "lz4", "clevel": 5, "shuffle": "shuffle",
                    "typesize": 4, "blocksize": 0,
                },
            }
        else:
            comp_entry = {"name": "gzip", "configuration": {"level": level}}
        with open(os.path.join(path, "zarr.json"), "w") as fh:
            json.dump(
                {"zarr_format": 3, "node_type": "group", "attributes": root_attrs},
                fh,
            )
        with open(os.path.join(adir, "zarr.json"), "w") as fh:
            json.dump(
                {
                    "zarr_format": 3,
                    "node_type": "array",
                    "shape": shape,
                    "data_type": "float32",
                    "chunk_grid": {
                        "name": "regular",
                        "configuration": {"chunk_shape": chunks},
                    },
                    "chunk_key_encoding": {
                        "name": "default",
                        "configuration": {"separator": "/"},
                    },
                    "fill_value": 0.0,
                    "codecs": codecs_doc
                    or [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        comp_entry,
                    ],
                    "attributes": {"units": UNITS},
                    "dimension_names": ["species", "y", "x"],
                },
                fh,
            )
        return
    with open(os.path.join(path, ".zgroup"), "w") as fh:
        json.dump({"zarr_format": 2}, fh)
    with open(os.path.join(path, ".zattrs"), "w") as fh:
        json.dump(root_attrs, fh)
    if codec == "blosc":
        comp_doc = {"id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1}
    else:
        comp_doc = {"id": "zlib", "level": level}
    with open(os.path.join(adir, ".zarray"), "w") as fh:
        json.dump(
            {
                "zarr_format": 2,
                "shape": shape,
                "chunks": chunks,
                "dtype": "<f4",
                "compressor": comp_doc,
                "fill_value": 0.0,
                "order": "C",
                "filters": None,
            },
            fh,
        )
    # array-level transform stays in the GDAL-style order documented in
    # the module docstring — DERIVED from the root affine so stores on a
    # non-canonical grid (warped cubes) stay self-consistent
    ra, _, rc, _, re_, rf = root_attrs["transform"]
    array_attrs = {
        "crs": CRS,
        "units": UNITS,
        "transform": [rc, ra, 0.0, rf, 0.0, re_],
        "species_codes": root_attrs["species_codes"],
        "_ARRAY_DIMENSIONS": ["species", "y", "x"],
    }
    with open(os.path.join(adir, ".zattrs"), "w") as fh:
        json.dump(array_attrs, fh)
    # consolidated metadata (zarr v2 convention): one .zmetadata document
    # holding every metadata key — xarray's open_zarr(consolidated=True)
    # fast path, one read instead of a directory walk on object stores
    with open(os.path.join(adir, ".zarray")) as fh:
        zarray_doc = json.load(fh)
    with open(os.path.join(path, ".zmetadata"), "w") as fh:
        json.dump(
            {
                "zarr_consolidated_format": 1,
                "metadata": {
                    ".zgroup": {"zarr_format": 2},
                    ".zattrs": root_attrs,
                    f"{array}/.zarray": zarray_doc,
                    f"{array}/.zattrs": array_attrs,
                },
            },
            fh,
        )


def write_zarr_store(
    tiles: DataFrame,
    path: str,
    array: str = "biomass",
    level: int = 6,
    zarr_format: int = ZARR_FORMAT,
    codec: str | None = None,
    transform: list | None = None,
) -> int:
    """Write engine tile rows as a genuine Zarr group ``path`` holding one
    float32 array ``array`` of shape (n_layers, gh, gw), chunked
    (1, tile_h, tile_w). ``zarr_format=2`` (default) writes the classic
    ``.zgroup``/``.zarray`` + ``s.ty.tx`` layout through zlib;
    ``zarr_format=3`` writes the reference's dialect — per-node
    ``zarr.json`` + ``c/s/ty/tx`` chunk keys through the spec's
    bytes+gzip codec chain (zarr_utils.py:698-745). ``codec='blosc'``
    (either dialect) writes Blosc1-LZ4 chunks — the reference's own
    compressor (zarr_utils.py:702-705), readable by any c-blosc build;
    the pure-python LZ4 is correctness-grade, so keep the zlib/gzip
    defaults on throughput paths. Chunk files are written BY THE TASKS
    (one file per tile row, no driver assembly); returns the number of
    chunks."""
    if zarr_format not in (2, 3):
        raise ValueError(f"unsupported zarr_format {zarr_format} (2 or 3)")
    if codec not in (None, "zlib", "gzip", "blosc"):
        raise ValueError(f"unsupported codec {codec!r} (zlib/gzip/blosc)")
    # Validation (uniform dims, known species) must precede any chunk file
    # landing on disk — the error contract pinned by
    # test_non_uniform_tiles_rejected — so the grid-info scan stays a
    # separate (cheap, bytes-pruned) job; the chunk write then aggregates
    # its count in the same action instead of a second pass.
    n_layers, tw, th, gw, gh, meta = _grid_info(tiles)
    _write_array_meta(
        path, array, [n_layers, gh, gw], [1, th, tw], level, zarr_format,
        _root_attrs(n_layers, gw, gh, transform=transform), codec,
    )
    return _write_chunks(
        meta, os.path.join(path, array), level, zarr_format, codec=codec
    )


def write_sharded_store(
    tiles: DataFrame,
    path: str,
    array: str = "biomass",
    shard_tiles: tuple[int, int] = (2, 2),
    level: int = 6,
    codec: str | None = "gzip",
) -> int:
    """Write tile rows as a Zarr v3 array through the spec's
    ``sharding_indexed`` codec: stored objects each pack a
    ``shard_tiles = (ks_y, ks_x)`` block of chunks with a crc32c-guarded
    binary index footer (sources/sharding.py) — ``ks_y * ks_x`` fewer
    objects to list, open, and schedule than the flat chunk layout, the
    difference between 10^8 and 10^6 objects at a true 100 TB cube.
    Any v3-sharding-aware zarr reader opens the result; chunk-level
    partial reads survive via the index (footer GET + ranged chunk GETs).

    The write is ONE hash shuffle keyed by (layer, shard_y, shard_x) —
    the minimum movement that co-locates a shard's tiles — then tasks
    write their own shard objects; the driver writes only JSON metadata.
    ``codec`` compresses each INNER chunk (gzip/blosc/None-raw). Returns
    the number of shard objects written."""
    from . import sharding as _sh

    if codec not in (None, "gzip", "blosc"):
        raise ValueError(f"unsupported inner codec {codec!r} (gzip/blosc/raw)")
    ks_y, ks_x = int(shard_tiles[0]), int(shard_tiles[1])
    if ks_y < 1 or ks_x < 1:
        raise ValueError(f"shard_tiles must be >= 1, got {shard_tiles}")
    n_layers, tw, th, gw, gh, meta = _grid_info(tiles)
    _write_array_meta(
        path, array, [n_layers, gh, gw], [1, th * ks_y, tw * ks_x], level, 3,
        _root_attrs(n_layers, gw, gh), codec,
        codecs_doc=[_sh.shard_codec_doc(tw, th, codec, level)],
    )
    return _sh.write_shards(
        meta, os.path.join(path, array), tw, th, ks_y, ks_x, codec, level
    )


def write_multiscale_store(
    tiles: DataFrame,
    spec,
    path: str,
    n_levels: int | None = None,
    factor: int = 2,
    zarr_format: int = ZARR_FORMAT,
    codec: str | None = None,
    level: int = 6,
) -> int:
    """Genuine Zarr MULTISCALE group in the OME-NGFF layout pattern: level
    arrays ``0`` (full resolution), ``1``, ``2``, ... where level k's pixel
    is the exact int64 block sum over ``factor**k`` base pixels
    (operators/pyramid.build_overview), plus a root ``multiscales``
    attribute listing each dataset with its per-level scale transform —
    any zarr reader opens each level as an ordinary array, and
    OME-NGFF-aware tooling discovers the pyramid from the attrs.

    Each level is built FROM THE PERSISTED CHUNKS of the previous one
    (write, then ``read_zarr_store`` back), so levels are sums of sums with
    no lazy recompute chain. ``n_levels=None`` builds until the level grid
    collapses to a single tile. Requires grids that divide evenly by
    ``factor`` at every level (uniform chunks). Returns total chunk count.
    """
    from ..operators import pyramid as _pyr

    spark = tiles.sparkSession
    total = write_zarr_store(
        tiles, path, array="0", level=level, zarr_format=zarr_format, codec=codec
    )
    # base-level root attrs, captured before coarser writes overwrite them
    attrs0 = _read_root_attrs(path, zarr_format)
    datasets = [("0", 1)]
    cur, cspec, k = tiles, spec, 0
    while True:
        if n_levels is not None and k >= n_levels:
            break
        if n_levels is None and cspec.tiles_x == 1 and cspec.tiles_y == 1:
            break
        if cspec.tile_w % factor or cspec.tile_h % factor:
            if n_levels is not None:
                raise ValueError(
                    f"cannot build {n_levels} levels: tile dims stop dividing "
                    f"by {factor} after level {k}"
                )
            break
        try:
            nspec = _pyr.overview_spec(cspec, factor)
        except ValueError:
            # ragged tile grid (e.g. 3x3 at factor 2): no uniform coarser
            # level exists — a clean stop for auto-depth, an error when the
            # caller demanded a depth we can't reach
            if n_levels is not None:
                raise
            break
        k += 1
        lvl_df = _pyr.build_overview(cur, cspec, factor=factor, fmt="raw32")
        total += write_zarr_store(
            lvl_df, path, array=str(k), level=level,
            zarr_format=zarr_format, codec=codec,
        )
        datasets.append((str(k), factor**k))
        cur, cspec = read_zarr_store(spark, path, array=str(k)), nspec
    # restore base-level root attrs and attach the multiscales document
    attrs0["multiscales"] = [
        {
            "version": "0.4",
            "name": "biomass_pyramid",
            "axes": [
                {"name": "species", "type": "channel"},
                {"name": "y", "type": "space", "unit": "metre"},
                {"name": "x", "type": "space", "unit": "metre"},
            ],
            "datasets": [
                {
                    "path": p,
                    "coordinateTransformations": [
                        {"type": "scale", "scale": [1.0, PIX * f, PIX * f]}
                    ],
                }
                for p, f in datasets
            ],
            "type": "sum",
            "metadata": {"factor": factor, "method": "exact int64 block sum"},
        }
    ]
    if zarr_format == 3:
        with open(os.path.join(path, "zarr.json"), "w") as fh:
            json.dump(
                {"zarr_format": 3, "node_type": "group", "attributes": attrs0},
                fh,
            )
    else:
        with open(os.path.join(path, ".zattrs"), "w") as fh:
            json.dump(attrs0, fh)
        # rebuild consolidated metadata over ALL level arrays (each
        # write_zarr_store left only its own array in .zmetadata)
        meta_doc: dict = {".zgroup": {"zarr_format": 2}, ".zattrs": attrs0}
        for p, _ in datasets:
            for doc_name in (".zarray", ".zattrs"):
                fp = os.path.join(path, p, doc_name)
                with open(fp) as fh:
                    meta_doc[f"{p}/{doc_name}"] = json.load(fh)
        with open(os.path.join(path, ".zmetadata"), "w") as fh:
            json.dump(
                {"zarr_consolidated_format": 1, "metadata": meta_doc}, fh
            )
    return total


# the reference's array-locating fallbacks (forest_metrics.py:118-196:
# "biomass", then "data", then "species")
ARRAY_FALLBACKS = ("biomass", "data", "species")


def detect_zarr_format(path: str) -> int:
    """3 if the group has a ``zarr.json`` document, 2 if ``.zgroup``."""
    if os.path.exists(os.path.join(path, "zarr.json")):
        return 3
    if os.path.exists(os.path.join(path, ".zgroup")):
        return 2
    raise ValueError(f"{path} is not a zarr group (no zarr.json or .zgroup)")


def _is_data_array(adir: str) -> bool:
    if os.path.exists(os.path.join(adir, ".zarray")):
        return True
    zj = os.path.join(adir, "zarr.json")
    if os.path.exists(zj):
        with open(zj) as fh:
            doc = json.load(fh)
        # v3 groups hold 1-D species_codes/names arrays too — the data
        # array is the 3-D one (ref _load_zarr_array shape contract)
        return doc.get("node_type") == "array" and len(doc.get("shape", ())) == 3
    return False


def find_array(path: str) -> str:
    """Locate the data array inside a zarr group (v2 or v3) the way the
    reference's _load_zarr_array does: try the known names in order, else
    the first child directory holding an array document."""
    for name in ARRAY_FALLBACKS:
        if _is_data_array(os.path.join(path, name)):
            return name
    for name in sorted(os.listdir(path)):
        if _is_data_array(os.path.join(path, name)):
            return name
    raise ValueError(f"no zarr array found under {path}")


def read_zarr_array_meta(path: str, array: str = "biomass") -> tuple[dict, dict]:
    """(.zarray, .zattrs) JSON documents of a v2 array, validated for the
    supported subset (v2, C order, <f4, zlib-or-raw)."""
    adir = os.path.join(path, array)
    with open(os.path.join(adir, ".zarray")) as fh:
        zarray = json.load(fh)
    if zarray.get("zarr_format") != 2:
        raise ValueError("not a Zarr v2 array")
    if zarray.get("order") != "C" or zarray.get("dtype") != "<f4":
        raise ValueError("unsupported zarr array layout (need C-order <f4)")
    comp = zarray.get("compressor")
    if comp is not None and comp.get("id") not in ("zlib", "blosc"):
        raise ValueError(
            f"unsupported zarr compressor {comp!r} (zlib, blosc-lz4, or raw)"
        )
    if comp is not None and comp.get("id") == "blosc":
        # the pure-python blosc codec covers LZ4 (+byte-shuffle) only —
        # the reference's default; other cnames refuse loudly
        if comp.get("cname", "lz4") not in ("lz4", "lz4hc"):
            raise ValueError(
                f"unsupported blosc cname {comp.get('cname')!r} (lz4 only)"
            )
    attrs = {}
    zattrs = os.path.join(adir, ".zattrs")
    if os.path.exists(zattrs):
        with open(zattrs) as fh:
            attrs = json.load(fh)
    return zarray, attrs


class ZarrMeta(NamedTuple):
    version: int
    shape: list[int]
    chunks: list[int]  # INNER chunk shape (== stored-object shape if unsharded)
    compressor: str | None  # "zlib" | "gzip" | "blosc" | None (raw)
    attrs: dict  # root attrs overlaid with array attrs
    # chunk-key encoding: ("v2", ".") flat i.j.k names (all v2 stores),
    # ("default", "/") nested c/i/j/k (v3 default), ("default", ".")
    # flat c.i.j.k, ("v2", "/") nested i/j/k
    key_enc: tuple[str, str] = ("v2", ".")
    # sharding_indexed: outer shard shape (the chunk_grid shape; stored
    # objects pack chunks//shard inner chunks each) + index codec chain
    shard: list[int] | None = None
    index_codecs: tuple[str, ...] = ()


def zarr_meta(path: str, array: str | None = None) -> ZarrMeta:
    """Version-normalized array metadata: auto-detects v2/v3, validates the
    supported layout subset, merges root-group attrs (reference layout,
    zarr_utils.py:721-726) with array-level attrs (array wins)."""
    version = detect_zarr_format(path)
    if array is None:
        array = find_array(path)
    if version == 2:
        zarray, attrs = read_zarr_array_meta(path, array)
        root_attrs = {}
        rz = os.path.join(path, ".zattrs")
        if os.path.exists(rz):
            with open(rz) as fh:
                root_attrs = json.load(fh)
        comp = zarray.get("compressor")
        return ZarrMeta(
            2, list(zarray["shape"]), list(zarray["chunks"]),
            comp.get("id") if comp else None, {**root_attrs, **attrs},
        )
    with open(os.path.join(path, array, "zarr.json")) as fh:
        doc = json.load(fh)
    if doc.get("zarr_format") != 3 or doc.get("node_type") != "array":
        raise ValueError(f"{array}/zarr.json is not a Zarr v3 array document")
    if doc.get("data_type") != "float32":
        raise ValueError("unsupported v3 data_type (float32 only)")
    grid = doc.get("chunk_grid", {})
    if grid.get("name") != "regular":
        raise ValueError("unsupported v3 chunk grid (regular only)")
    enc = doc.get("chunk_key_encoding", {"name": "default"})
    enc_name = enc.get("name", "default")
    sep = enc.get("configuration", {}).get("separator",
                                           "/" if enc_name == "default" else ".")
    # "default": keys are c<sep>i<sep>j<sep>k; "v2": bare i.j.k names
    if enc_name not in ("default", "v2") or sep not in ("/", "."):
        raise ValueError(
            f"unsupported v3 chunk key encoding {enc_name!r} sep {sep!r}"
        )
    chain = doc.get("codecs", [])
    names = [c.get("name") for c in chain]
    shard_shape: list[int] | None = None
    index_codecs: tuple[str, ...] = ()
    if names == ["sharding_indexed"]:
        # many-chunks-per-object layout: the chunk_grid shape is the SHARD
        # shape; the real chunk shape and codec chain live in the shard
        # codec's configuration (sources/sharding.py holds the binary IO)
        cfg = chain[0].get("configuration", {})
        shard_shape = list(grid["configuration"]["chunk_shape"])
        inner_shape = list(cfg.get("chunk_shape", ()))
        if len(inner_shape) != 3 or any(
            s % i for s, i in zip(shard_shape, inner_shape)
        ):
            raise ValueError(
                f"sharding: inner chunk shape {inner_shape} must divide "
                f"shard shape {shard_shape}"
            )
        if cfg.get("index_location", "end") != "end":
            raise ValueError("sharding: only index_location 'end' supported")
        index_codecs = tuple(
            c.get("name") for c in cfg.get("index_codecs", [])
        )
        if index_codecs not in (("bytes",), ("bytes", "crc32c")):
            raise ValueError(
                f"sharding: unsupported index codecs {index_codecs!r}"
            )
        chain = cfg.get("codecs", [])
        names = [c.get("name") for c in chain]
        grid = {"name": "regular", "configuration": {"chunk_shape": inner_shape}}
    if not chain or names[0] != "bytes":
        raise ValueError("unsupported v3 codec chain (must start with 'bytes')")
    if chain[0].get("configuration", {}).get("endian", "little") != "little":
        raise ValueError("unsupported v3 byte order (little-endian only)")
    if names[1:] not in ([], ["gzip"], ["blosc"]):
        raise ValueError(
            f"unsupported v3 codec chain {names!r} (bytes[+gzip|+blosc-lz4])"
        )
    if "blosc" in names:
        # the reference's own compressor (zarr_utils.py:702-705), decoded
        # by the pure-python blosc-lz4 codec (gridfia_spark/blosc.py);
        # cnames beyond lz4 refuse loudly
        bcfg = chain[names.index("blosc")].get("configuration", {})
        if bcfg.get("cname", "lz4") not in ("lz4", "lz4hc"):
            raise ValueError(
                f"unsupported blosc cname {bcfg.get('cname')!r} (lz4 only)"
            )
    root_attrs = {}
    with open(os.path.join(path, "zarr.json")) as fh:
        root_attrs = json.load(fh).get("attributes", {})
    comp = "gzip" if "gzip" in names else ("blosc" if "blosc" in names else None)
    return ZarrMeta(
        3, list(doc["shape"]), list(grid["configuration"]["chunk_shape"]),
        comp,
        {**root_attrs, **doc.get("attributes", {})},
        (enc_name, sep),
        shard_shape,
        index_codecs,
    )


def _read_root_attrs(path: str, version: int) -> dict:
    """Root-GROUP attributes only (what the reference's ZarrStore reads
    for georeferencing, zarr_utils.py:721-726) — no array-level overlay."""
    if version == 3:
        with open(os.path.join(path, "zarr.json")) as fh:
            return json.load(fh).get("attributes", {})
    rz = os.path.join(path, ".zattrs")
    if os.path.exists(rz):
        with open(rz) as fh:
            return json.load(fh)
    return {}


def read_zarr_store(
    spark: SparkSession,
    path: str,
    array: str | None = None,
    species: list[int] | None = None,
) -> DataFrame:
    """Distributed Zarr scan (v2 or v3, auto-detected) -> engine tile rows
    (image_id, bytes, w, h, fmt, caption, phash). Chunk indices come from
    the file PATH (a pure projection; an object-store listing prunes the
    same way). ``array=None`` locates the data array via the reference's
    fallback order (biomass -> data -> species). ``species=[...]`` prunes
    at the LISTING level — v2 via a chunk-name glob, v3 via the ``c/<s>/``
    key-prefix DIRECTORIES (the Zarr analogue of partition pruning:
    non-matching chunk files are never opened, the P1/P2 layer slice for
    free)."""
    from ..datagen import pixels as pxgen
    from ..datagen.tiles import TILE_SCHEMA

    if array is None:
        array = find_array(path)
    m = zarr_meta(path, array)
    _, th, tw = (int(c) for c in m.chunks)
    compressor = m.compressor
    stored_codes = m.attrs.get("species_codes")
    stored_names = m.attrs.get("species_names")
    names = dict(SPECIES)
    codes = {}
    for i, c in enumerate(stored_codes or [c for c, _ in SPECIES]):
        nm = (
            stored_names[i]
            if stored_names and i < len(stored_names)
            else names.get(c, c)
        )
        codes[i] = (c, nm)
    reader = spark.read.format("binaryFile")
    enc_name, sep = m.key_enc
    adir = os.path.join(path, array)
    wanted = sorted({int(s) for s in species}) if species is not None else None
    if sep == ".":
        # flat names in the array dir: i.j.k (v2 encoding) or c.i.j.k
        pre = "c." if enc_name == "default" else ""
        if wanted is None:
            glob = f"{pre}[0-9]*"
        elif len(wanted) == 1:
            glob = f"{pre}{wanted[0]}.*"
        else:
            glob = pre + "{" + ",".join(str(s) for s in wanted) + "}.*"
        files = reader.option("pathGlobFilter", glob).load(adir)
    else:
        # nested keys: c/i/j/k (v3 default) or i/j/k (v2 encoding) —
        # species pruning happens at the DIRECTORY listing level
        base = os.path.join(adir, "c") if enc_name == "default" else adir
        reader = reader.option("recursiveFileLookup", "true").option(
            "pathGlobFilter", "[0-9]*"  # leaf is the tx index; skips zarr.json
        )
        if wanted is None:
            files = reader.load(base)
        else:
            files = reader.load([os.path.join(base, str(s)) for s in wanted])
    files = files.select("path", "content")
    # chunk files are tiny (a compressed tile each) but the default
    # open-cost packing schedules ~one file per task — at 10^5 chunks that
    # is pure scheduler overhead. A NARROW coalesce (no shuffle, plan stays
    # map-only) packs many chunks per task; 4x parallelism keeps AQE-free
    # balance even with skewed chunk sizes.
    # coalesce() never INCREASES partition count, so no need to probe the
    # current count first (the .rdd round-trip built a full RDD conversion
    # plan just to ask); a no-op coalesce costs nothing
    target = spark.sparkContext.defaultParallelism * 4
    files = files.coalesce(target)
    nested = sep == "/"
    strip_c = enc_name == "default" and not nested

    if m.shard is not None:
        # sharding_indexed objects: each stored file packs ks_y x ks_x
        # chunks behind an index footer — parse the index, decode the
        # present inner chunks, emit one tile row per chunk. Same scan
        # plan as the flat layout, ks**2 fewer files.
        from . import sharding as _sh

        ks_y, ks_x = m.shard[1] // th, m.shard[2] // tw
        index_codecs = m.index_codecs

        def rds(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for r in pdf.itertuples(index=False):
                    if nested:
                        s, sy, sx = (int(x) for x in r.path.rsplit("/", 3)[-3:])
                    else:
                        parts = r.path.rsplit("/", 1)[-1].split(".")
                        if strip_c:
                            parts = parts[1:]
                        s, sy, sx = (int(x) for x in parts)
                    chunks = _sh.read_shard(
                        bytes(r.content), ks_y, ks_x, compressor, index_codecs
                    )
                    code, nm = codes[s]
                    for (cy, cx), raw in chunks.items():
                        ty, tx = sy * ks_y + cy, sx * ks_x + cx
                        arr = np.frombuffer(raw, dtype="<f4").reshape(th, tw)
                        rows.append(
                            (
                                image_id(code, tx, ty),
                                codecs.encode(arr, "rawz"),
                                tw,
                                th,
                                "rawz",
                                caption(code, nm, tx, ty),
                                pxgen.phash64(arr),
                            )
                        )
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "image_id", "bytes", "w", "h", "fmt",
                            "caption", "phash",
                        ],
                    )

        return files.mapInPandas(rds, TILE_SCHEMA)

    def rd(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import blosc as _blosc

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if nested:
                    s, cy, cx = (int(x) for x in r.path.rsplit("/", 3)[-3:])
                else:
                    name = r.path.rsplit("/", 1)[-1]
                    parts = name.split(".")
                    if strip_c:
                        parts = parts[1:]
                    s, cy, cx = (int(x) for x in parts)
                raw = bytes(r.content)
                if compressor == "zlib":
                    raw = zlib.decompress(raw)
                elif compressor == "gzip":
                    raw = _gzip.decompress(raw)
                elif compressor == "blosc":
                    raw = _blosc.decode_chunk(raw)
                arr = np.frombuffer(raw, dtype="<f4").reshape(th, tw)
                code, nm = codes[s]
                rows.append(
                    (
                        image_id(code, cx, cy),
                        codecs.encode(arr, "rawz"),
                        tw,
                        th,
                        "rawz",
                        caption(code, nm, cx, cy),
                        pxgen.phash64(arr),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                    ],
                )

    return files.mapInPandas(rd, TILE_SCHEMA)


def read_shard_window(
    spark: SparkSession,
    path: str,
    tx_range: tuple[int, int],
    ty_range: tuple[int, int],
    array: str | None = None,
    species: list[int] | None = None,
    include_read_bytes: bool = False,
) -> DataFrame:
    """Windowed PARTIAL read of a sharded store — the object-store access
    pattern the shard index exists for: each task seeks to its shard's
    footer (one ranged GET), parses the crc32c-guarded index, then reads
    ONLY the byte ranges of inner chunks inside the tile window
    ``tx_range x ty_range`` (inclusive). Bytes outside the window are
    never read — unlike the full ``binaryFile`` scan, a small window on
    a huge shard touches O(window) bytes + a 16·ks²-byte footer per
    shard. ``include_read_bytes=True`` appends a per-row ``read_bytes``
    column (that chunk's stored byte count; add ``sharding.index_nbytes``
    once per shard touched for the footer) so tests and gate queries can
    assert the partial-read contract from the actual IO accounting."""
    from ..datagen import pixels as pxgen
    from ..datagen.tiles import TILE_SCHEMA
    from . import sharding as _sh

    if array is None:
        array = find_array(path)
    m = zarr_meta(path, array)
    if m.shard is None:
        raise ValueError("read_shard_window requires a sharding_indexed array")
    _, th, tw = (int(c) for c in m.chunks)
    ks_y, ks_x = m.shard[1] // th, m.shard[2] // tw
    index_codecs = m.index_codecs
    compressor = m.compressor
    tx0, tx1 = int(tx_range[0]), int(tx_range[1])
    ty0, ty1 = int(ty_range[0]), int(ty_range[1])
    if tx0 > tx1 or ty0 > ty1:
        raise ValueError(f"empty window {tx_range} x {ty_range}")
    stored_codes = m.attrs.get("species_codes") or [c for c, _ in SPECIES]
    stored_names = m.attrs.get("species_names") or [
        dict(SPECIES).get(c, c) for c in stored_codes
    ]
    codes = {
        i: (c, stored_names[i] if i < len(stored_names) else c)
        for i, c in enumerate(stored_codes)
    }
    n_layers = int(m.shape[0])
    layers = (
        sorted({int(s) for s in species}) if species is not None
        else list(range(n_layers))
    )
    adir = os.path.join(path, array)
    items = []
    for s in layers:
        for sy in range(ty0 // ks_y, ty1 // ks_y + 1):
            for sx in range(tx0 // ks_x, tx1 // ks_x + 1):
                f = os.path.join(adir, "c", str(s), str(sy), str(sx))
                if os.path.exists(f):
                    items.append((f, s, sy, sx))
    if not items:
        return spark.createDataFrame([], TILE_SCHEMA)
    from ..localdf import local_df

    work = local_df(
        spark, items, "path string, s int, sy int, sx int"
    ).repartition(min(len(items), spark.sparkContext.defaultParallelism * 2))
    n_inner = ks_y * ks_x
    idx_nb = _sh.index_nbytes(n_inner, index_codecs)
    if include_read_bytes:
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType(
            TILE_SCHEMA.fields + [StructField("read_bytes", LongType())]
        )
    else:
        schema = TILE_SCHEMA

    def rdw(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for it in pdf.itertuples(index=False):
                size = os.path.getsize(it.path)
                with open(it.path, "rb") as fh:
                    fh.seek(size - idx_nb)
                    idx = _sh.parse_index_tail(
                        fh.read(idx_nb), n_inner, index_codecs, size
                    )
                    code, nm = codes[it.s]
                    for cy in range(ks_y):
                        ty = it.sy * ks_y + cy
                        if not ty0 <= ty <= ty1:
                            continue
                        for cx in range(ks_x):
                            tx = it.sx * ks_x + cx
                            if not tx0 <= tx <= tx1:
                                continue
                            off, nb = idx[cy * ks_x + cx]
                            if off == _sh.MAX_U64:
                                continue
                            fh.seek(off)
                            raw = _sh._decode_inner(fh.read(nb), compressor)
                            arr = np.frombuffer(raw, dtype="<f4").reshape(th, tw)
                            row = (
                                image_id(code, tx, ty),
                                codecs.encode(arr, "rawz"),
                                tw,
                                th,
                                "rawz",
                                caption(code, nm, tx, ty),
                                pxgen.phash64(arr),
                            )
                            rows.append(
                                row + (nb,) if include_read_bytes else row
                            )
            if rows:
                cols = [
                    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                ]
                if include_read_bytes:
                    cols.append("read_bytes")
                yield pd.DataFrame(rows, columns=cols)

    return work.mapInPandas(rdw, schema)


def _chunk_file(adir: str, key_enc: tuple[str, str],
                s: int, cy: int, cx: int) -> str:
    """On-disk path of chunk (s, cy, cx) under the array dir for any of
    the supported chunk-key encodings."""
    enc_name, sep = key_enc
    if sep == ".":
        pre = "c." if enc_name == "default" else ""
        return os.path.join(adir, f"{pre}{s}.{cy}.{cx}")
    parts = [str(s), str(cy), str(cx)]
    if enc_name == "default":
        parts.insert(0, "c")
    return os.path.join(adir, *parts)


def _decode_chunk_bytes(raw: bytes, compressor: str | None) -> bytes:
    from .. import blosc as _blosc

    if compressor == "zlib":
        return zlib.decompress(raw)
    if compressor == "gzip":
        return _gzip.decompress(raw)
    if compressor == "blosc":
        return _blosc.decode_chunk(raw)
    return raw


def _affine_order(t: list | None) -> list | None:
    """Normalize a 6-element transform to rasterio Affine order
    (a,b,c,d,e,f): v2 array-level .zattrs carry the GDAL order
    [X0, PIX, 0, Y0, 0, -PIX]; v3/root attrs carry Affine
    [PIX, 0, X0, 0, -PIX, Y0] (same dual layout append_layer accepts)."""
    if t is None or len(t) != 6:
        return t
    if t[2] == 0 and t[1] != 0:  # GDAL order
        return [t[1], 0.0, t[0], 0.0, t[5], t[3]]
    return list(t)


def _aligned_meta(
    op: str, path: str, array: str | None, ref: ZarrMeta | None,
    allow_sharded: bool = False,
) -> tuple[ZarrMeta, str]:
    """Load a store's meta for a multi-store op and validate it against a
    reference meta: shape, INNER chunk grid, and georeferencing
    (Affine-normalized, ``np.allclose``) must agree. With
    ``allow_sharded`` the stores may pack chunks into shard objects —
    ``zarr_meta`` normalizes ``chunks`` to the inner chunk shape, so a
    flat epoch and a sharded epoch stay comparable chunk-for-chunk."""
    m = zarr_meta(path, array)
    if array is None:
        array = find_array(path)
    if m.shard is not None and not allow_sharded:
        raise ValueError(
            f"{op} supports flat chunk layouts; scan sharded stores "
            "with read_zarr_store and join the tile tables instead"
        )
    if ref is not None:
        if list(m.shape) != list(ref.shape):
            raise ValueError(
                f"{op}: shape mismatch {ref.shape} vs {m.shape}"
            )
        if list(m.chunks) != list(ref.chunks):
            raise ValueError(
                f"{op}: chunk-grid mismatch {ref.chunks} vs {m.chunks}"
            )
        ta = _affine_order(ref.attrs.get("transform"))
        tb = _affine_order(m.attrs.get("transform"))
        if ta is not None and tb is not None and not np.allclose(
            ta, tb, rtol=1e-5
        ):
            raise ValueError(
                f"{op}: georeferencing mismatch ({ta} vs {tb})"
            )
    return m, array


class _ChunkReader:
    """Uniform per-chunk random access over a FLAT or SHARDED store for
    the store-zip operators (diff / trend). Flat: one file open per
    chunk. Sharded: the shard object is opened once, its crc32c-guarded
    index parsed, and the decoded inner chunks cached — iterating the
    work list in (s, cy, cx) order means consecutive chunks usually hit
    the cached shard, so the decode amplification stays ~1x. Instances
    are closure-captured with an empty cache; each task mutates only its
    own copy."""

    def __init__(self, path: str, array: str, m: ZarrMeta):
        self.adir = os.path.join(path, array)
        self.enc = m.key_enc
        self.comp = m.compressor
        self.shard = m.shard
        if m.shard is not None:
            _, th, tw = (int(c) for c in m.chunks)
            self.ks_y, self.ks_x = m.shard[1] // th, m.shard[2] // tw
            self.index_codecs = m.index_codecs
        self._cache: dict = {}

    def load(self, s: int, cy: int, cx: int,
             th: int, tw: int) -> np.ndarray | None:
        if self.shard is None:
            p = _chunk_file(self.adir, self.enc, s, cy, cx)
            if not os.path.exists(p):
                return None
            with open(p, "rb") as fh:
                raw = _decode_chunk_bytes(fh.read(), self.comp)
            return np.frombuffer(raw, dtype="<f4").reshape(th, tw)
        from . import sharding as _sh

        key = (s, cy // self.ks_y, cx // self.ks_x)
        if key not in self._cache:
            if len(self._cache) >= 8:
                self._cache.clear()
            p = _chunk_file(self.adir, self.enc, *key)
            if not os.path.exists(p):
                self._cache[key] = {}
            else:
                with open(p, "rb") as fh:
                    self._cache[key] = _sh.read_shard(
                        fh.read(), self.ks_y, self.ks_x,
                        self.comp, self.index_codecs,
                    )
        raw = self._cache[key].get((cy % self.ks_y, cx % self.ks_x))
        if raw is None:
            return None
        return np.frombuffer(raw, dtype="<f4").reshape(th, tw)


def chunk_grid_df(
    spark: SparkSession, layers: list[int], n_cy: int, n_cx: int
) -> DataFrame:
    """Distributed (s, cy, cx) chunk-grid work list via ``spark.range`` +
    column arithmetic — nothing is materialized on the driver (a Python
    list of every chunk tuple is ~25 M objects / GBs of driver memory at
    100 TB with (1,1000,1000) chunks). ``spark.range(n, numPartitions=p)``
    hands each task a CONTIGUOUS id slice, exactly like the old
    order-preserving ``parallelize`` slicing, so consecutive chunks stay
    in one task and sharded reads keep hitting the per-task shard cache."""
    per_layer = n_cy * n_cx
    n = len(layers) * per_layer
    parts = max(1, min(n, spark.sparkContext.defaultParallelism * 4))
    smap = F.array(*[F.lit(int(s)) for s in layers])
    return spark.range(0, n, 1, parts).select(
        F.element_at(smap, (F.col("id") / per_layer).cast("int") + 1).alias("s"),
        ((F.col("id") % per_layer) / n_cx).cast("int").alias("cy"),
        (F.col("id") % n_cx).cast("int").alias("cx"),
    )


DIFF_SCHEMA = (
    "image_id string, s int, n_diff bigint, max_abs double, "
    "sum_a double, sum_b double, delta_sum double"
)


def diff_stores(
    spark: SparkSession,
    path_a: str,
    path_b: str,
    array_a: str | None = None,
    array_b: str | None = None,
    species: list[int] | None = None,
) -> DataFrame:
    """Chunk-aligned comparison of two stores with ZERO shuffle — the
    temporal change-detection / regression-check primitive (two survey
    epochs, a re-run pipeline vs its last output). The reference can only
    do this by loading both cubes into memory; the engine joins at the
    FILE level instead: the driver enumerates the chunk grid from
    metadata alone (no listing), every task opens its chunk pair directly
    and emits one diff-stats row — the plan is a single map stage, no
    bytes ever cross the network. The two stores may use DIFFERENT
    dialects (v2 zlib vs v3 gzip/blosc — metadata normalization makes
    them comparable), but must agree on shape, chunk grid, and
    georeferencing (``np.allclose``, same contract as ``append_layer``).
    A chunk absent from one side diffs against the Zarr fill value
    (zeros) — spec semantics, not an error; a chunk absent from BOTH is
    skipped (identical by definition). Either epoch may also use the
    ``sharding_indexed`` packed layout (or both, or mixed flat/sharded):
    alignment is on the INNER chunk grid, and tasks read packed chunks
    through the shard index (one object open per shard, cached)."""
    ma, array_a = _aligned_meta(
        "diff_stores", path_a, array_a, None, allow_sharded=True
    )
    mb, array_b = _aligned_meta(
        "diff_stores", path_b, array_b, ma, allow_sharded=True
    )
    n_layers, gh, gw = (int(x) for x in ma.shape)
    _, th, tw = (int(c) for c in ma.chunks)
    n_cy, n_cx = -(-gh // th), -(-gw // tw)
    stored_codes = ma.attrs.get("species_codes") or [c for c, _ in SPECIES]
    layers = (
        sorted({int(s) for s in species}) if species is not None
        else list(range(n_layers))
    )
    reader_a = _ChunkReader(path_a, array_a, ma)
    reader_b = _ChunkReader(path_b, array_b, mb)
    # chunk grid straight off spark.range — no driver-side work list; the
    # contiguous id slices keep the per-task shard cache hitting
    work = chunk_grid_df(spark, layers, n_cy, n_cx)
    codes = {i: c for i, c in enumerate(stored_codes)}

    def dd(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                # Zarr stores edge chunks PADDED to the full chunk shape
                # (same contract as the read_zarr_store reshape)
                a = reader_a.load(int(r.s), int(r.cy), int(r.cx), th, tw)
                b = reader_b.load(int(r.s), int(r.cy), int(r.cx), th, tw)
                if a is None and b is None:
                    continue
                if a is None:
                    a = np.zeros_like(b)
                if b is None:
                    b = np.zeros_like(a)
                d = a.astype(np.float64) - b.astype(np.float64)
                rows.append(
                    (
                        image_id(codes[int(r.s)], int(r.cx), int(r.cy)),
                        int(r.s),
                        int((d != 0).sum()),
                        float(np.abs(d).max(initial=0.0)),
                        float(a.sum(dtype=np.float64)),
                        float(b.sum(dtype=np.float64)),
                        float(d.sum()),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "image_id", "s", "n_diff", "max_abs",
                        "sum_a", "sum_b", "delta_sum",
                    ],
                )

    return work.mapInPandas(dd, DIFF_SCHEMA)


TREND_SCHEMA = (
    "image_id string, s int, n_epochs int, den bigint, "
    "sum_num bigint, min_num bigint, max_num bigint, n_rising bigint"
)


def trend_stores(
    spark: SparkSession,
    paths: list[str],
    arrays: list[str] | None = None,
    species: list[int] | None = None,
) -> DataFrame:
    """Per-pixel temporal TREND across N aligned store epochs, zero
    shuffle — the time-series extension of ``diff_stores``: the driver
    enumerates the shared chunk grid once, and each task opens its N
    chunk files (one per epoch, ranged GETs on an object store), stacks
    them, and reduces the per-pixel ordinary-least-squares slope
    numerator in EXACT int64:

        num(px) = n * sum(t * v_t) - sum(t) * sum(v_t)
        slope(px) = num / den,   den = n * sum(t^2) - sum(t)^2

    ``den`` is a constant of n alone, so per-tile aggregates of ``num``
    (sum / min / max, plus the count of strictly-rising pixels) carry
    the full trend information without a float in sight — the DuckDB
    oracle reproduces every value bit-for-bit, and mean slope is
    ``sum_num / (npx * den)`` on either side. Epochs may mix dialects
    AND layouts (flat or ``sharding_indexed`` — alignment is on the
    inner chunk grid);
    alignment is validated pairwise (same contract as ``diff_stores``).
    Absent chunks read as the fill value (zeros) for that epoch."""
    if len(paths) < 2:
        raise ValueError("trend_stores needs at least 2 epochs")
    arrays = list(arrays) if arrays is not None else [None] * len(paths)
    m0, a0 = _aligned_meta(
        "trend_stores", paths[0], arrays[0], None, allow_sharded=True
    )
    metas = [(m0, a0)]
    for p, a in zip(paths[1:], arrays[1:]):
        metas.append(
            _aligned_meta("trend_stores", p, a, m0, allow_sharded=True)
        )
    n_layers, gh, gw = (int(x) for x in m0.shape)
    _, th, tw = (int(c) for c in m0.chunks)
    n_cy, n_cx = -(-gh // th), -(-gw // tw)
    n = len(paths)
    t = np.arange(n, dtype=np.int64)
    st, stt = int(t.sum()), int((t * t).sum())
    den = n * stt - st * st
    stored_codes = m0.attrs.get("species_codes") or [c for c, _ in SPECIES]
    layers = (
        sorted({int(s) for s in species}) if species is not None
        else list(range(n_layers))
    )
    readers = [
        _ChunkReader(p, a, m) for p, (m, a) in zip(paths, metas)
    ]
    codes = {i: c for i, c in enumerate(stored_codes)}
    # chunk grid straight off spark.range — no driver-side work list; the
    # contiguous id slices keep the per-task shard cache hitting
    work = chunk_grid_df(spark, layers, n_cy, n_cx)

    def tr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                s, cy, cx = int(r.s), int(r.cy), int(r.cx)
                stack = np.zeros((n, th, tw), dtype=np.int64)
                for e in range(n):
                    arr = readers[e].load(s, cy, cx, th, tw)
                    if arr is not None:
                        stack[e] = arr.astype(np.int64)
                sv = stack.sum(axis=0)
                stv = (stack * t[:, None, None]).sum(axis=0)
                num = n * stv - st * sv
                rows.append(
                    (
                        image_id(codes[s], cx, cy),
                        s,
                        n,
                        den,
                        int(num.sum()),
                        int(num.min()),
                        int(num.max()),
                        int((num > 0).sum()),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "image_id", "s", "n_epochs", "den",
                        "sum_num", "min_num", "max_num", "n_rising",
                    ],
                )

    return work.mapInPandas(tr, TREND_SCHEMA)


TS_SCHEMA = "point_id long, s int, epoch int, v double"


def extract_timeseries(
    spark: SparkSession,
    paths: list[str],
    points: DataFrame,
    species: list[int] | None = None,
) -> DataFrame:
    """Per-point value TIME SERIES across N aligned store epochs — the
    monitoring-site drill-through (plot networks, calibration targets,
    eddy-flux towers): for each point and layer, the pixel value at
    every epoch, long-format ``(point_id, s, epoch, v)``. The plan
    inverts the access pattern of a full scan: points map to their
    chunk key via the store affine (column expressions), ONE tiny
    shuffle groups the ~16-byte point rows by chunk, and each task
    ghost-reads its chunk across all epochs through the cached shard
    index — raster bytes never move, and the cost scales with
    |points| x N, not with the cube. Epochs may mix dialects and
    layouts (same alignment contract as ``trend_stores``)."""
    if not paths:
        raise ValueError("extract_timeseries needs at least 1 epoch")
    m0, a0 = _aligned_meta(
        "extract_timeseries", paths[0], None, None, allow_sharded=True
    )
    metas = [(m0, a0)]
    for p in paths[1:]:
        metas.append(
            _aligned_meta("extract_timeseries", p, None, m0,
                          allow_sharded=True)
        )
    n_layers, gh, gw = (int(x) for x in m0.shape)
    _, th, tw = (int(c) for c in m0.chunks)
    t = _affine_order(m0.attrs.get("transform")) or [
        PIX, 0.0, X0, 0.0, -PIX, Y0
    ]
    a, _, c, _, e, f = (float(v) for v in t)
    layers = (
        sorted({int(s) for s in species}) if species is not None
        else list(range(n_layers))
    )
    readers = [_ChunkReader(p, arr, m) for p, (m, arr) in zip(paths, metas)]
    n_epochs = len(paths)
    pts = (
        points.select("point_id", "x", "y")
        .withColumn("gx", F.floor((F.col("x") - F.lit(c)) / F.lit(a)).cast("long"))
        .withColumn("gy", F.floor((F.col("y") - F.lit(f)) / F.lit(e)).cast("long"))
        .filter(
            (F.col("gx") >= 0) & (F.col("gx") < gw)
            & (F.col("gy") >= 0) & (F.col("gy") < gh)
        )
        .withColumn("cy", (F.col("gy") / th).cast("int"))
        .withColumn("cx", (F.col("gx") / tw).cast("int"))
    )

    def ex(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        cy, cx = (int(k) for k in key)
        ids = pdf["point_id"].to_numpy()
        ly = (pdf["gy"].to_numpy() % th).astype(np.int64)
        lx = (pdf["gx"].to_numpy() % tw).astype(np.int64)
        out_id, out_s, out_e, out_v = [], [], [], []
        for s in layers:
            for ep in range(n_epochs):
                arr = readers[ep].load(s, cy, cx, th, tw)
                vals = (
                    arr[ly, lx] if arr is not None
                    else np.zeros(len(ids), dtype=np.float32)
                )
                out_id.append(ids)
                out_s.append(np.full(len(ids), s, dtype=np.int32))
                out_e.append(np.full(len(ids), ep, dtype=np.int32))
                out_v.append(vals.astype(np.float64))
        return pd.DataFrame(
            {
                "point_id": np.concatenate(out_id),
                "s": np.concatenate(out_s),
                "epoch": np.concatenate(out_e),
                "v": np.concatenate(out_v),
            }
        )

    return pts.groupBy("cy", "cx").applyInPandas(ex, TS_SCHEMA)


def validate_store(path: str, array: str | None = None) -> dict:
    """Validate and summarize an on-disk store, either dialect — the
    engine form of the reference's ``validate_zarr_store``
    (zarr_utils.py:1028-1065): same summary keys (path/shape/chunks/
    dtype/compression/num_species/crs/bounds/species) plus a chunk-file
    census (expected vs found per layer) and an ``errors`` list; purely
    driver-side metadata + listing work, no chunk is opened."""
    info: dict = {"path": path, "errors": []}
    try:
        version = detect_zarr_format(path)
        if array is None:
            array = find_array(path)
        m = zarr_meta(path, array)
    except (OSError, ValueError, KeyError) as exc:
        info["errors"].append(str(exc))
        info["valid"] = False
        return info
    n_layers, gh, gw = (int(x) for x in m.shape)
    _, th, tw = (int(c) for c in m.chunks)
    root = _read_root_attrs(path, version)
    info.update(
        shape=tuple(m.shape),
        chunks=tuple(m.chunks),
        dtype="float32",
        compression=m.compressor,
        num_species=int(m.attrs.get("num_species", n_layers)),
        crs=root.get("crs"),
        bounds=root.get("bounds"),
        species=[],
    )
    codes = m.attrs.get("species_codes", [])
    names_l = m.attrs.get("species_names", [])
    for i in range(min(info["num_species"], len(codes))):
        nm = names_l[i] if i < len(names_l) else dict(SPECIES).get(codes[i], codes[i])
        info["species"].append({"index": i, "code": str(codes[i]), "name": str(nm)})
    # chunk-file census per layer (listing only — no chunk opened);
    # sharded stores list SHARD objects, so expect the coarse grid
    if m.shard is not None:
        info["shard_chunks"] = (m.shard[1] // th, m.shard[2] // tw)
        per_layer = (-(-gh // m.shard[1])) * (-(-gw // m.shard[2]))
    else:
        per_layer = (-(-gh // th)) * (-(-gw // tw))
    enc_name, sep = m.key_enc
    adir = os.path.join(path, array)
    found: dict[int, int] = {}
    if sep == ".":
        pre = "c." if enc_name == "default" else ""
        for name in os.listdir(adir):
            if pre and not name.startswith(pre):
                continue
            parts = name[len(pre):].split(".")
            if len(parts) == 3 and all(p.isdigit() for p in parts):
                found[int(parts[0])] = found.get(int(parts[0]), 0) + 1
    else:
        base = os.path.join(adir, "c") if enc_name == "default" else adir
        if os.path.isdir(base):
            for s in os.listdir(base):
                if not s.isdigit():
                    continue
                n = sum(
                    len(files)
                    for _, _, files in os.walk(os.path.join(base, s))
                )
                found[int(s)] = n
    info["chunks_per_layer_expected"] = per_layer
    info["chunks_per_layer_found"] = dict(sorted(found.items()))
    for s, n in found.items():
        if s >= n_layers:
            info["errors"].append(f"layer {s} outside declared shape {n_layers}")
        elif n > per_layer:
            info["errors"].append(f"layer {s}: {n} chunks > expected {per_layer}")
    info["valid"] = not info["errors"]
    return info


def append_layer(
    tiles: DataFrame,
    path: str,
    species_code: str,
    species_name: str,
    array: str | None = None,
    level: int = 6,
    validate_alignment: bool = True,
) -> int:
    """In-place append of ONE species layer to an EXISTING on-disk store —
    the engine form of the reference's ``append_species_to_zarr``
    (zarr_utils.py:754-818): chunk writes for the new layer are fully
    distributed (tasks write only the new layer's chunk files; existing
    chunks are untouched), the driver updates only the JSON metadata, and
    ``validate_alignment`` mirrors the reference's ``np.allclose`` checks
    on transform/bounds (:792-806) plus the chunk-dimension contract.
    Works on both v2 and v3 stores (auto-detected). Returns the layer
    index the species was written at."""
    version = detect_zarr_format(path)
    if array is None:
        array = find_array(path)
    m = zarr_meta(path, array)
    n_layers, gh, gw = (int(x) for x in m.shape)
    _, th, tw = (int(c) for c in m.chunks)
    meta = decode.with_tile_meta(tiles)
    info = meta.agg(
        F.min("w").alias("w"), F.max("w").alias("wmax"),
        F.min("h").alias("h"), F.max("h").alias("hmax"),
        F.max("tx").alias("txmax"), F.max("ty").alias("tymax"),
        F.count("*").alias("n"),
        F.count_distinct("tx", "ty").alias("nxy"),
    ).first()
    if info.n == 0:
        raise ValueError("append_layer: empty tile set")
    if info.w != info.wmax or info.h != info.hmax:
        raise ValueError("append_layer: tiles must have uniform dimensions")
    if (int(info.w), int(info.h)) != (tw, th):
        raise ValueError(
            f"append_layer: tile dims ({info.w}, {info.h}) != store chunks "
            f"({tw}, {th})"
        )
    if (int(info.txmax) + 1) * tw > gw or (int(info.tymax) + 1) * th > gh:
        raise ValueError("append_layer: tile extent exceeds the store grid")
    if info.nxy != info.n:
        raise ValueError("append_layer: duplicate (tx, ty) tiles in append set")
    if validate_alignment:
        # the reference rejects stores whose georeferencing doesn't match
        # the incoming raster (allclose, rtol=1e-5); the engine's rasters
        # live on the canonical grid, so the check runs against it
        affine_t = [PIX, 0.0, X0, 0.0, -PIX, Y0]  # root attrs (ref layout)
        gdal_t = [X0, PIX, 0.0, Y0, 0.0, -PIX]  # array-level .zattrs layout
        want_b = [X0, Y0 - gh * PIX, X0 + gw * PIX, Y0]
        root = _read_root_attrs(path, version)
        got_t = root.get("transform", m.attrs.get("transform", affine_t))
        got_b = root.get("bounds", m.attrs.get("bounds", want_b))
        if len(got_t) != 6 or not (
            np.allclose(got_t, affine_t, rtol=1e-5)
            or np.allclose(got_t, gdal_t, rtol=1e-5)
        ):
            raise ValueError(
                f"append_layer: transform mismatch (store {got_t}, grid {affine_t})"
            )
        if len(got_b) != 4 or not np.allclose(got_b, want_b, rtol=1e-5):
            raise ValueError(
                f"append_layer: bounds mismatch (store {got_b}, grid {want_b})"
            )
    if m.compressor is None and m.shard is None:
        raise ValueError(
            "append_layer: uncompressed stores are not supported for "
            "in-place append (both engine write dialects compress)"
        )
    # reference semantics: num_species tracks the filled prefix of a
    # possibly pre-allocated array; dense engine stores have it == shape[0]
    idx = int(m.attrs.get("num_species", n_layers))
    new_n = max(n_layers, idx + 1)
    if m.shard is not None:
        # sharded store: the new layer arrives as new shard objects under
        # c/<idx>/ — existing shards untouched, same one-shuffle write
        from . import sharding as _sh

        ks_y, ks_x = m.shard[1] // th, m.shard[2] // tw
        _sh.write_shards(
            meta, os.path.join(path, array), tw, th, ks_y, ks_x,
            m.compressor, level, layer=idx,
            index_codecs=m.index_codecs or ("bytes", "crc32c"),
        )
    else:
        _write_chunks(
            meta, os.path.join(path, array), level, version, layer=idx,
            codec=m.compressor,
        )
    codes = list(m.attrs.get("species_codes", [c for c, _ in SPECIES[:n_layers]]))
    names = list(m.attrs.get("species_names", [n for _, n in SPECIES[:n_layers]]))
    codes, names = codes[:idx] + [species_code], names[:idx] + [species_name]
    if m.shard is not None:
        _write_array_meta(
            path, array, [new_n, gh, gw], [1, m.shard[1], m.shard[2]], level,
            version, _root_attrs(new_n, gw, gh, codes, names), m.compressor,
            codecs_doc=[
                _sh.shard_codec_doc(
                    tw, th, m.compressor, level,
                    m.index_codecs or ("bytes", "crc32c"),
                )
            ],
        )
    else:
        _write_array_meta(
            path, array, [new_n, gh, gw], [1, th, tw], level, version,
            _root_attrs(new_n, gw, gh, codes, names), m.compressor,
        )
    return idx
