"""Zarr v2 store: metadata layout, chunk bytes verifiable by hand, and
distributed write -> scan round trip (sources/zarrstore.py)."""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from gridfia_spark import codecs
from gridfia_spark.datagen import pixels as pxgen
from gridfia_spark.datagen import tiles as tgen
from gridfia_spark.sources import zarrstore

SF_DIR = "/root/testdata/sf0.001"


class TestZarrStore:
    def test_store_layout_and_chunk_bytes(self, spark, tmp_path):
        """The store must be readable with nothing but the v2 spec: JSON
        docs + zlib chunks whose raw bytes equal the tile pixels."""
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "t.zarr")
        n = zarrstore.write_zarr_store(tiles, store)
        assert n == tiles.count()
        assert json.load(open(os.path.join(store, ".zgroup"))) == {"zarr_format": 2}
        zarray = json.load(open(os.path.join(store, "biomass", ".zarray")))
        assert zarray["dtype"] == "<f4" and zarray["order"] == "C"
        assert zarray["compressor"] == {"id": "zlib", "level": 6}
        # hand-decode one chunk with stdlib only and compare to the codec
        row = tiles.filter(F.col("image_id").contains("tx000_ty000")).first()
        s = 0 if row.image_id.startswith("sp0000") else None
        # find this row's layer via the stored species_codes
        attrs = json.load(open(os.path.join(store, "biomass", ".zattrs")))
        code = row.image_id[2:6]
        s = attrs["species_codes"].index(code)
        raw = zlib.decompress(
            open(os.path.join(store, "biomass", f"{s}.0.0"), "rb").read()
        )
        got = np.frombuffer(raw, "<f4").reshape(row.h, row.w)
        want = codecs.decode(bytes(row.bytes), row.w, row.h, row.fmt)
        np.testing.assert_array_equal(got, want)
        assert attrs["_ARRAY_DIMENSIONS"] == ["species", "y", "x"]

    def test_roundtrip_tile_rows_bit_identical(self, spark, tmp_path):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "rt.zarr")
        zarrstore.write_zarr_store(tiles, store)
        back = zarrstore.read_zarr_store(spark, store)
        a = {
            r.image_id: (r.phash, r.caption, r.w, r.h)
            for r in tiles.select("image_id", "phash", "caption", "w", "h").collect()
        }
        b = {
            r.image_id: (r.phash, r.caption, r.w, r.h)
            for r in back.select("image_id", "phash", "caption", "w", "h").collect()
        }
        assert a == b

    def test_raw_uncompressed_store_reads(self, spark, tmp_path):
        """compressor: null is valid v2 — the scan must handle raw chunks."""
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "raw.zarr")
        zarrstore.write_zarr_store(tiles, store)
        adir = os.path.join(store, "biomass")
        zarray = json.load(open(os.path.join(adir, ".zarray")))
        for name in os.listdir(adir):
            if name[0].isdigit():
                p = os.path.join(adir, name)
                raw = zlib.decompress(open(p, "rb").read())
                open(p, "wb").write(raw)
        zarray["compressor"] = None
        json.dump(zarray, open(os.path.join(adir, ".zarray"), "w"))
        back = zarrstore.read_zarr_store(spark, store)
        assert back.count() == tiles.count()

    def test_unsupported_layouts_rejected(self, spark, tmp_path):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "bad.zarr")
        zarrstore.write_zarr_store(tiles, store)
        adir = os.path.join(store, "biomass")
        zarray = json.load(open(os.path.join(adir, ".zarray")))
        zarray["compressor"] = {"id": "zstd", "level": 3}
        json.dump(zarray, open(os.path.join(adir, ".zarray"), "w"))
        with pytest.raises(ValueError, match="compressor"):
            zarrstore.read_zarr_array_meta(store)
        # blosc IS supported, but only the lz4 cname
        zarray["compressor"] = {"id": "blosc", "cname": "zstd"}
        json.dump(zarray, open(os.path.join(adir, ".zarray"), "w"))
        with pytest.raises(ValueError, match="cname"):
            zarrstore.read_zarr_array_meta(store)

    def test_non_uniform_tiles_rejected(self, spark):
        a = pxgen.tile_pixels(1, 0, 0, tgen.spec_for_sf_dir(SF_DIR))
        rows = [
            ("sp0001_tx000_ty000", bytearray(codecs.encode(a, "rawz")),
             a.shape[1], a.shape[0], "rawz", "c", 0),
            ("sp0001_tx001_ty000", bytearray(codecs.encode(a[:16, :16], "rawz")),
             16, 16, "rawz", "c", 0),
        ]
        df = spark.createDataFrame(rows, tgen.TILE_SCHEMA)
        with pytest.raises(ValueError, match="uniform"):
            zarrstore.write_zarr_store(df, "/tmp/never.zarr")


class TestArrayDiscovery:
    def test_fallback_names(self, spark, tmp_path):
        """read_zarr_store(array=None) locates the data array via the
        reference's fallback order (biomass -> data -> species)."""
        import shutil

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "f.zarr")
        zarrstore.write_zarr_store(tiles, store)
        assert zarrstore.find_array(store) == "biomass"
        shutil.move(os.path.join(store, "biomass"), os.path.join(store, "data"))
        assert zarrstore.find_array(store) == "data"
        n = zarrstore.read_zarr_store(spark, store).count()
        assert n == tiles.count()
        shutil.move(os.path.join(store, "data"), os.path.join(store, "custom0"))
        assert zarrstore.find_array(store) == "custom0"
        with pytest.raises(ValueError, match="no zarr array"):
            zarrstore.find_array(str(tmp_path))


class TestZarrV3:
    def test_v3_layout_and_chunk_bytes(self, spark, tmp_path):
        """The v3 store must be readable with nothing but the v3 spec:
        per-node zarr.json + c/s/ty/tx chunk keys + gzip members, and the
        ROOT attrs must be in the reference's layout (Affine-order
        transform, bounds, num_species, species lists)."""
        import gzip

        from gridfia_spark.constants import PIX, SPECIES, X0, Y0

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "v3.zarr")
        n = zarrstore.write_zarr_store(tiles, store, zarr_format=3)
        assert n == tiles.count()
        root = json.load(open(os.path.join(store, "zarr.json")))
        assert root["zarr_format"] == 3 and root["node_type"] == "group"
        ra = root["attributes"]
        assert ra["transform"] == [PIX, 0.0, X0, 0.0, -PIX, Y0]
        assert ra["bounds"][0] == X0 and ra["bounds"][3] == Y0
        assert ra["num_species"] == len(SPECIES)
        assert ra["species_names"][0] == "Total Biomass"
        arr = json.load(open(os.path.join(store, "biomass", "zarr.json")))
        assert arr["node_type"] == "array" and arr["data_type"] == "float32"
        assert [c["name"] for c in arr["codecs"]] == ["bytes", "gzip"]
        assert arr["chunk_key_encoding"]["configuration"]["separator"] == "/"
        # hand-decode one chunk with stdlib only
        row = tiles.filter(F.col("image_id").contains("tx000_ty000")).first()
        s = ra["species_codes"].index(row.image_id[2:6])
        raw = gzip.decompress(
            open(os.path.join(store, "biomass", "c", str(s), "0", "0"), "rb").read()
        )
        got = np.frombuffer(raw, "<f4").reshape(row.h, row.w)
        want = codecs.decode(bytes(row.bytes), row.w, row.h, row.fmt)
        np.testing.assert_array_equal(got, want)

    def test_v3_roundtrip_and_pruning(self, spark, tmp_path):
        from gridfia_spark.constants import spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "v3rt.zarr")
        zarrstore.write_zarr_store(tiles, store, zarr_format=3)
        assert zarrstore.detect_zarr_format(store) == 3
        assert zarrstore.find_array(store) == "biomass"
        back = zarrstore.read_zarr_store(spark, store)
        a = {
            r.image_id: (r.phash, r.caption)
            for r in tiles.select("image_id", "phash", "caption").collect()
        }
        b = {
            r.image_id: (r.phash, r.caption)
            for r in back.select("image_id", "phash", "caption").collect()
        }
        assert a == b
        # species filter prunes at the c/<s>/ DIRECTORY level
        per_layer = spec.tiles_x * spec.tiles_y
        two = zarrstore.read_zarr_store(spark, store, species=[1, 3])
        assert len(two.inputFiles()) == 2 * per_layer
        assert two.count() == 2 * per_layer

    @pytest.mark.parametrize("enc,sep", [("default", "."), ("v2", "."), ("v2", "/")])
    def test_v3_alternate_chunk_key_encodings(self, spark, tmp_path, enc, sep):
        """v3 stores configured with the '.' separator or the 'v2'
        chunk-key encoding (both spec-legal) must read back identically,
        including species pruning."""
        import shutil

        from gridfia_spark.constants import spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "enc.zarr")
        zarrstore.write_zarr_store(tiles, store, zarr_format=3)
        adir = os.path.join(store, "biomass")
        # rewrite the chunk tree into the target encoding
        cdir = os.path.join(adir, "c")
        for s in os.listdir(cdir):
            for ty in os.listdir(os.path.join(cdir, s)):
                for tx in os.listdir(os.path.join(cdir, s, ty)):
                    src = os.path.join(cdir, s, ty, tx)
                    if sep == ".":
                        pre = "c." if enc == "default" else ""
                        dst = os.path.join(adir, f"{pre}{s}.{ty}.{tx}")
                    else:
                        dst = os.path.join(adir, s, ty, tx)
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.move(src, dst)
        shutil.rmtree(cdir)
        zj = os.path.join(adir, "zarr.json")
        doc = json.load(open(zj))
        doc["chunk_key_encoding"] = {"name": enc, "configuration": {"separator": sep}}
        json.dump(doc, open(zj, "w"))
        m = zarrstore.zarr_meta(store)
        assert m.key_enc == (enc, sep)
        back = zarrstore.read_zarr_store(spark, store)
        a = {r.image_id: r.phash for r in tiles.select("image_id", "phash").collect()}
        b = {r.image_id: r.phash for r in back.select("image_id", "phash").collect()}
        assert a == b
        per_layer = spec.tiles_x * spec.tiles_y
        one = zarrstore.read_zarr_store(spark, store, species=[2])
        assert len(one.inputFiles()) == per_layer
        assert one.count() == per_layer

    def test_v3_unsupported_codecs_rejected_loudly(self, spark, tmp_path):
        """Codec chains outside bytes[+gzip|+blosc-lz4] must refuse,
        never silently misdecode."""
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "bl.zarr")
        zarrstore.write_zarr_store(tiles, store, zarr_format=3)
        p = os.path.join(store, "biomass", "zarr.json")
        doc = json.load(open(p))
        doc["codecs"] = [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "zstd", "configuration": {"level": 0}},
        ]
        json.dump(doc, open(p, "w"))
        with pytest.raises(ValueError, match="codec chain"):
            zarrstore.zarr_meta(store)
        doc["codecs"] = [
            {"name": "bytes", "configuration": {"endian": "little"}},
            {"name": "blosc", "configuration": {"cname": "zstd"}},
        ]
        json.dump(doc, open(p, "w"))
        with pytest.raises(ValueError, match="cname"):
            zarrstore.zarr_meta(store)

    def test_v2_consolidated_metadata(self, spark, tmp_path):
        """v2 stores carry .zmetadata (zarr_consolidated_format 1) whose
        entries byte-match the per-key documents — the
        open_zarr(consolidated=True) fast path; append keeps it current."""
        from gridfia_spark.constants import SPECIES

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "cm.zarr")
        zarrstore.write_zarr_store(tiles, store)
        cm = json.load(open(os.path.join(store, ".zmetadata")))
        assert cm["zarr_consolidated_format"] == 1
        md = cm["metadata"]
        assert md[".zgroup"] == json.load(open(os.path.join(store, ".zgroup")))
        assert md[".zattrs"] == json.load(open(os.path.join(store, ".zattrs")))
        assert md["biomass/.zarray"] == json.load(
            open(os.path.join(store, "biomass", ".zarray"))
        )
        # in-place append refreshes the consolidated document too
        code, name = "9999", "Synthetic"
        extra = tiles.filter(F.col("image_id").startswith("sp0131")).selectExpr(
            "regexp_replace(image_id, 'sp0131', 'sp9999') AS image_id",
            "bytes", "w", "h", "fmt", "caption", "phash",
        )
        idx = zarrstore.append_layer(extra, store, code, name)
        cm2 = json.load(open(os.path.join(store, ".zmetadata")))
        assert cm2["metadata"]["biomass/.zarray"]["shape"][0] == len(SPECIES) + 1
        assert cm2["metadata"][".zattrs"]["species_codes"][idx] == code

    def test_v2_root_attrs_reference_layout(self, spark, tmp_path):
        """ADVICE r4: the reference's ZarrStore reads georeferencing from
        the ROOT group attrs in rasterio Affine order — the v2 store must
        carry them there (the array-level GDAL-order .zattrs stays for
        xarray consumers)."""
        from gridfia_spark.constants import PIX, X0, Y0

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "ra.zarr")
        zarrstore.write_zarr_store(tiles, store)
        ra = json.load(open(os.path.join(store, ".zattrs")))
        assert ra["transform"] == [PIX, 0.0, X0, 0.0, -PIX, Y0]
        assert ra["crs"] and ra["species_codes"] and ra["species_names"]
        assert len(ra["bounds"]) == 4 and ra["num_species"] > 0


class TestBloscStores:
    """The reference's ACTUAL compressor (BloscCodec lz4+shuffle,
    zarr_utils.py:702-705) through the pure-python blosc codec — read,
    write, and append, both dialects."""

    @pytest.mark.parametrize("vfmt", [2, 3])
    def test_blosc_store_roundtrip(self, spark, tmp_path, vfmt):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / f"b{vfmt}.zarr")
        zarrstore.write_zarr_store(tiles, store, zarr_format=vfmt, codec="blosc")
        m = zarrstore.zarr_meta(store)
        assert m.compressor == "blosc"
        back = zarrstore.read_zarr_store(spark, store)
        a = {
            r.image_id: (r.phash, r.caption)
            for r in tiles.select("image_id", "phash", "caption").collect()
        }
        b = {
            r.image_id: (r.phash, r.caption)
            for r in back.select("image_id", "phash", "caption").collect()
        }
        assert a == b

    def test_blosc_chunk_is_self_describing_c_blosc_layout(self, spark, tmp_path):
        """Hand-parse one chunk with nothing but the public c-blosc layout:
        header fields + LZ4 flag + shuffle flag must be present, and the
        module's decoder must invert it to the exact tile pixels."""
        import struct

        from gridfia_spark import blosc as B

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "bh.zarr")
        zarrstore.write_zarr_store(tiles, store, codec="blosc")
        attrs = json.load(open(os.path.join(store, "biomass", ".zattrs")))
        row = tiles.filter(F.col("image_id").contains("tx000_ty000")).first()
        s = attrs["species_codes"].index(row.image_id[2:6])
        buf = open(os.path.join(store, "biomass", f"{s}.0.0"), "rb").read()
        version, _vlz, flags, typesize = buf[0], buf[1], buf[2], buf[3]
        nbytes, _bs, cbytes = struct.unpack_from("<III", buf, 4)
        assert version >= 1 and typesize == 4
        assert flags & B.FLAG_SHUFFLE or flags & B.FLAG_MEMCPY
        assert nbytes == row.w * row.h * 4 and cbytes == len(buf)
        got = np.frombuffer(B.decode_chunk(buf), "<f4").reshape(row.h, row.w)
        want = codecs.decode(bytes(row.bytes), row.w, row.h, row.fmt)
        np.testing.assert_array_equal(got, want)

    def test_append_to_blosc_store_keeps_codec(self, spark, tmp_path):
        from gridfia_spark.constants import SPECIES

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        code, name = SPECIES[-1]
        base = tiles.filter(~F.col("image_id").startswith(f"sp{code}"))
        extra = tiles.filter(F.col("image_id").startswith(f"sp{code}"))
        store = str(tmp_path / "ab.zarr")
        zarrstore.write_zarr_store(base, store, zarr_format=3, codec="blosc")
        idx = zarrstore.append_layer(extra, store, code, name)
        m = zarrstore.zarr_meta(store)
        assert m.compressor == "blosc" and m.shape[0] == len(SPECIES)
        back = zarrstore.read_zarr_store(spark, store, species=[idx])
        assert {r.image_id[2:6] for r in back.collect()} == {code}


class TestValidateStore:
    @pytest.mark.parametrize("vfmt", [2, 3])
    def test_summary_shape_matches_reference(self, spark, tmp_path, vfmt):
        """ref validate_zarr_store (zarr_utils.py:1028-1065) summary keys
        + chunk census; listing-only (no chunk opened)."""
        from gridfia_spark.constants import SPECIES, spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / f"v{vfmt}.zarr")
        zarrstore.write_zarr_store(tiles, store, zarr_format=vfmt)
        info = zarrstore.validate_store(store)
        assert info["valid"] and info["errors"] == []
        assert info["shape"] == (len(SPECIES), spec.gh, spec.gw)
        assert info["chunks"] == (1, spec.tile_h, spec.tile_w)
        assert info["num_species"] == len(SPECIES)
        assert info["crs"] == "ESRI:102039" and len(info["bounds"]) == 4
        assert [s["code"] for s in info["species"]] == [c for c, _ in SPECIES]
        per = spec.tiles_x * spec.tiles_y
        assert info["chunks_per_layer_expected"] == per
        assert info["chunks_per_layer_found"] == {
            i: per for i in range(len(SPECIES))
        }
        # a stray out-of-shape chunk flips valid
        if vfmt == 2:
            open(os.path.join(store, "biomass", "9.0.0"), "wb").write(b"x")
        else:
            d = os.path.join(store, "biomass", "c", "9", "0")
            os.makedirs(d)
            open(os.path.join(d, "0"), "wb").write(b"x")
        bad = zarrstore.validate_store(store)
        assert not bad["valid"] and "outside declared shape" in bad["errors"][0]

    def test_broken_store_reports_errors(self, tmp_path):
        info = zarrstore.validate_store(str(tmp_path))
        assert not info["valid"] and info["errors"]


class TestAppendLayer:
    @pytest.mark.parametrize("vfmt", [2, 3])
    def test_append_lifecycle(self, spark, tmp_path, vfmt):
        """create -> in-place append -> full scan equals the all-layer
        table; the appended layer is reachable via pruned scan (ref
        append_species_to_zarr, zarr_utils.py:754-818)."""
        from gridfia_spark.constants import SPECIES

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        code, name = SPECIES[-1]
        base = tiles.filter(~F.col("image_id").startswith(f"sp{code}"))
        extra = tiles.filter(F.col("image_id").startswith(f"sp{code}"))
        store = str(tmp_path / f"ap{vfmt}.zarr")
        zarrstore.write_zarr_store(base, store, zarr_format=vfmt)
        idx = zarrstore.append_layer(extra, store, code, name)
        assert idx == len(SPECIES) - 1
        m = zarrstore.zarr_meta(store)
        assert m.shape[0] == len(SPECIES)
        assert m.attrs["num_species"] == len(SPECIES)
        assert m.attrs["species_codes"][-1] == code
        assert m.attrs["species_names"][-1] == name
        back = zarrstore.read_zarr_store(spark, store)
        a = {
            r.image_id: (r.phash, r.caption)
            for r in tiles.select("image_id", "phash", "caption").collect()
        }
        b = {
            r.image_id: (r.phash, r.caption)
            for r in back.select("image_id", "phash", "caption").collect()
        }
        assert a == b
        only = zarrstore.read_zarr_store(spark, store, species=[idx])
        assert {r.image_id[2:6] for r in only.collect()} == {code}

    def test_append_rejects_misaligned(self, spark, tmp_path):
        from gridfia_spark.constants import SPECIES, spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        code, name = SPECIES[-1]
        base = tiles.filter(~F.col("image_id").startswith(f"sp{code}"))
        extra = tiles.filter(F.col("image_id").startswith(f"sp{code}"))
        store = str(tmp_path / "bad.zarr")
        zarrstore.write_zarr_store(base, store)
        # wrong tile dims
        a = pxgen.tile_pixels(1, 0, 0, spec)[:16, :16]
        wrong = spark.createDataFrame(
            [(f"sp{code}_tx000_ty000", bytearray(codecs.encode(a, "rawz")),
              16, 16, "rawz", "c", 0)],
            tgen.TILE_SCHEMA,
        )
        with pytest.raises(ValueError, match="dims"):
            zarrstore.append_layer(wrong, store, code, name)
        # duplicate (tx, ty)
        dup = extra.unionByName(extra)
        with pytest.raises(ValueError, match="duplicate"):
            zarrstore.append_layer(dup, store, code, name)
        # transform mismatch in the persisted store (reference allclose)
        ra_path = os.path.join(store, ".zattrs")
        ra = json.load(open(ra_path))
        ra["transform"] = [60.0, 0.0, 0.0, 0.0, -60.0, 0.0]
        json.dump(ra, open(ra_path, "w"))
        with pytest.raises(ValueError, match="transform mismatch"):
            zarrstore.append_layer(extra, store, code, name)


class TestLayerPruning:
    def test_species_filter_prunes_files_at_listing(self, spark, tmp_path):
        """species=[...] is the Zarr analogue of partition pruning: chunk
        files of other layers are never even opened."""
        from gridfia_spark.constants import spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "p.zarr")
        zarrstore.write_zarr_store(tiles, store)
        one = zarrstore.read_zarr_store(spark, store, species=[1])
        per_layer = spec.tiles_x * spec.tiles_y
        assert len(one.inputFiles()) == per_layer  # pruned at listing
        from gridfia_spark.constants import SPECIES

        rows = one.collect()
        assert len(rows) == per_layer
        assert all(r.image_id.startswith(f"sp{SPECIES[1][0]}") for r in rows)
        two = zarrstore.read_zarr_store(spark, store, species=[2, 4])
        assert len(two.inputFiles()) == 2 * per_layer
        assert {r.image_id[:6] for r in two.collect()} == {
            f"sp{SPECIES[2][0]}", f"sp{SPECIES[4][0]}"
        }


class TestMultiscaleStore:
    """write_multiscale_store: OME-NGFF-pattern pyramid group — every level
    an ordinary Zarr array, level-k pixels exact block sums of level 0."""

    @pytest.mark.parametrize("vfmt", [2, 3])
    def test_auto_depth_roundtrip_and_attrs(self, spark, tmp_path, vfmt):
        from gridfia_spark.constants import SPECIES, spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)  # 2x2 tiles of 32x32
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / f"ms{vfmt}.zarr")
        n = zarrstore.write_multiscale_store(
            tiles, spec, store, zarr_format=vfmt
        )
        # auto depth stops at the single-tile level: levels 0 (4 chunks)
        # and 1 (1 chunk) per species
        assert n == len(SPECIES) * 5
        # level 1 pixels are the exact 2x2 block sums of the full cube
        back1 = zarrstore.read_zarr_store(spark, store, array="1")
        got = {
            r.image_id: codecs.decode(bytes(r.bytes), r.w, r.h, r.fmt)
            for r in back1.collect()
        }
        cube = pxgen.full_cube(spec).astype(np.int64)
        for s, (code, _) in enumerate(SPECIES):
            a = cube[s]
            ref = a.reshape(32, 2, 32, 2).sum(axis=(1, 3))
            arr = got[f"sp{code}_tx000_ty000"]
            assert arr.shape == (32, 32)
            assert np.array_equal(arr.astype(np.int64), ref)
        # multiscales document lives in the ROOT attrs next to the
        # georeferencing keys, one dataset entry per level
        attrs = zarrstore._read_root_attrs(store, vfmt)
        assert "crs" in attrs and "transform" in attrs
        ms = attrs["multiscales"][0]
        assert [d["path"] for d in ms["datasets"]] == ["0", "1"]
        scales = [
            d["coordinateTransformations"][0]["scale"][1]
            for d in ms["datasets"]
        ]
        assert scales == [30.0, 60.0]

    def test_v2_consolidated_metadata_covers_all_levels(self, spark, tmp_path):
        from gridfia_spark.constants import spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "msc.zarr")
        zarrstore.write_multiscale_store(tiles, spec, store, zarr_format=2)
        meta = json.load(open(os.path.join(store, ".zmetadata")))["metadata"]
        for p in ("0", "1"):
            assert f"{p}/.zarray" in meta and f"{p}/.zattrs" in meta
        assert "multiscales" in meta[".zattrs"]

    def test_explicit_depth_shrinks_single_tile_and_apex_sum(
        self, spark, tmp_path
    ):
        """n_levels past the single-tile collapse keeps halving the one
        tile; every level's total equals the exact global sum."""
        from gridfia_spark.constants import SPECIES, spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        store = str(tmp_path / "msd.zarr")
        n = zarrstore.write_multiscale_store(
            tiles, spec, store, n_levels=3, zarr_format=2
        )
        assert n == len(SPECIES) * (4 + 1 + 1 + 1)
        cube = pxgen.full_cube(spec).astype(np.int64)
        back3 = zarrstore.read_zarr_store(spark, store, array="3")
        rows = back3.collect()
        assert all((r.w, r.h) == (8, 8) for r in rows)
        for r in rows:
            s = next(
                i for i, (c, _) in enumerate(SPECIES)
                if r.image_id.startswith(f"sp{c}")
            )
            arr = codecs.decode(bytes(r.bytes), r.w, r.h, r.fmt)
            assert int(arr.astype(np.int64).sum()) == int(cube[s].sum())

    def test_ragged_grid_stops_cleanly_and_explicit_depth_raises(
        self, spark, tmp_path
    ):
        from gridfia_spark.constants import GridSpec, SPECIES

        spec = GridSpec(3, 3, 32, 32)
        tiles = tgen.generate_tiles(spark, spec)
        store = str(tmp_path / "msr.zarr")
        # auto depth: 3x3 has no uniform coarser level -> base level only
        n = zarrstore.write_multiscale_store(
            tiles, spec, store, zarr_format=2
        )
        assert n == len(SPECIES) * 9
        attrs = zarrstore._read_root_attrs(store, 2)
        assert [d["path"] for d in attrs["multiscales"][0]["datasets"]] == ["0"]
        with pytest.raises(ValueError, match="ragged"):
            zarrstore.write_multiscale_store(
                tiles, spec, str(tmp_path / "msr2.zarr"), n_levels=2,
                zarr_format=2,
            )


class TestDiffStores:
    def _stores(self, spark, tmp_path, mutate=None):
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        a = str(tmp_path / "a.zarr")
        b = str(tmp_path / "b.zarr")
        zarrstore.write_zarr_store(tiles, a, zarr_format=2)
        src = tiles if mutate is None else mutate(tiles)
        zarrstore.write_zarr_store(src, b, zarr_format=3)
        return a, b

    def test_identical_cross_dialect_all_zero(self, spark, tmp_path):
        """v2/zlib vs v3/gzip of the same raster: every chunk identical —
        the dialect normalization must make them comparable."""
        a, b = self._stores(spark, tmp_path)
        rows = zarrstore.diff_stores(spark, a, b).collect()
        from gridfia_spark.constants import SPECIES, spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        assert len(rows) == len(SPECIES) * spec.tiles_x * spec.tiles_y
        assert all(r.n_diff == 0 and r.delta_sum == 0.0 for r in rows)
        assert all(r.sum_a == r.sum_b for r in rows)

    def test_work_list_is_not_driver_side(self, spark, tmp_path):
        """VERDICT r5 #1: the chunk-grid work list comes from spark.range +
        column arithmetic — no driver-materialized O(chunks) Python list
        (at 100 TB that list is ~25 M tuples of driver memory). The plan
        must show a Range source, never a parallelized collection."""
        a, b = self._stores(spark, tmp_path)
        for df in (
            zarrstore.diff_stores(spark, a, b),
            zarrstore.trend_stores(spark, [a, b]),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "Range (" in plan, plan[:400]
            assert "ParallelCollectionRDD" not in plan
            assert "Scan ExistingRDD" not in plan, plan[:400]

    def test_reference_reader_interop_both_dialects(self, spark, tmp_path):
        """VERDICT r5 #8: parse the engine's store with a minimal
        reimplementation of the reference ZarrStore's attr-reading logic
        (zarr_utils.py:354-433 property fallbacks over the root attrs
        written at :721-726 / :965-969) and assert crs / transform /
        species metadata round-trip WITHOUT hitting any silent default."""
        import json as _json

        from gridfia_spark.constants import PIX, SPECIES, X0, Y0, spec_for_sf_dir

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        spec = spec_for_sf_dir(SF_DIR)
        gw, gh = spec.gw, spec.gh

        def reference_open(path, version):
            # root-attrs read path of the reference's ZarrStore.__init__
            if version == 2:
                attrs = _json.load(open(os.path.join(path, ".zattrs")))
            else:
                attrs = _json.load(open(os.path.join(path, "zarr.json")))[
                    "attributes"
                ]
            # property logic verbatim: every .get default is a SENTINEL we
            # must never see (the silent-default failure mode)
            crs = attrs.get("crs", "EPSG:3857")
            transform = attrs.get("transform", [1, 0, 0, 0, -1, 0])[:6]
            bounds = attrs.get("bounds", [0, 0, 1, 1])[:4]
            codes = list(attrs.get("species_codes", []))
            names = list(attrs.get("species_names", []))
            n = attrs.get("num_species", None)
            return crs, transform, bounds, codes, names, n

        for fmt in (2, 3):
            store = str(tmp_path / f"interop_v{fmt}.zarr")
            zarrstore.write_zarr_store(tiles, store, zarr_format=fmt)
            crs, t, bounds, codes, names, n = reference_open(store, fmt)
            assert crs == "ESRI:102039", crs  # not the EPSG:3857 default
            # rasterio Affine order (a, b, c, d, e, f)
            assert t == [PIX, 0.0, X0, 0.0, -PIX, Y0], t
            assert bounds == [X0, Y0 - gh * PIX, X0 + gw * PIX, Y0], bounds
            assert codes == [c for c, _ in SPECIES]
            assert names == [nm for _, nm in SPECIES]
            assert n == len(SPECIES)

    def test_chunk_grid_df_enumerates_grid_in_order(self, spark):
        """spark.range arithmetic reproduces the old nested-loop (s, cy, cx)
        enumeration exactly, including non-contiguous layer subsets."""
        got = zarrstore.chunk_grid_df(spark, [0, 2, 5], 3, 4).collect()
        want = [(s, cy, cx) for s in (0, 2, 5) for cy in range(3)
                for cx in range(4)]
        assert [(r.s, r.cy, r.cx) for r in got] == want

    def test_absent_chunk_diffs_against_fill(self, spark, tmp_path):
        """A chunk deleted from epoch B diffs against zeros (Zarr fill
        semantics); deleted from BOTH, the pair is skipped."""
        a, b = self._stores(spark, tmp_path)
        os.remove(os.path.join(b, "biomass", "c", "1", "0", "1"))
        rows = {r.image_id: r for r in zarrstore.diff_stores(spark, a, b).collect()}
        from gridfia_spark.constants import SPECIES

        hit = rows[f"sp{SPECIES[1][0]}_tx001_ty000"]
        from gridfia_spark.constants import spec_for_sf_dir

        arr = pxgen.tile_pixels(1, 1, 0, spec_for_sf_dir(SF_DIR))
        assert hit.n_diff == int((arr != 0).sum())
        assert hit.sum_b == 0.0 and hit.delta_sum == hit.sum_a
        # drop the pair entirely
        os.remove(os.path.join(a, "biomass", "1.0.1"))
        rows2 = zarrstore.diff_stores(spark, a, b).collect()
        assert len(rows2) == len(rows) - 1

    def test_mutated_values_localized(self, spark, tmp_path):
        """Clipping epoch B at 10 shows up as exactly the clipped mass."""
        import pandas as pd

        from gridfia_spark.datagen.tiles import TILE_SCHEMA

        def mutate(tiles):
            def f(batches):
                for pdf in batches:
                    rows = []
                    for r in pdf.itertuples(index=False):
                        arr = codecs.decode(r.bytes, r.w, r.h, r.fmt)
                        arr = np.minimum(arr, np.float32(10))
                        rows.append((r.image_id, codecs.encode(arr, "rawz"),
                                     r.w, r.h, "rawz", r.caption, r.phash))
                    yield pd.DataFrame(rows, columns=[
                        "image_id", "bytes", "w", "h", "fmt", "caption",
                        "phash"])
            return tiles.mapInPandas(f, TILE_SCHEMA)

        a, b = self._stores(spark, tmp_path, mutate)
        from gridfia_spark.constants import SPECIES, spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        for r in zarrstore.diff_stores(spark, a, b).collect():
            import re as _re

            m = _re.match(r"sp(\d{4})_tx(\d+)_ty(\d+)", r.image_id)
            s = [c for c, _ in SPECIES].index(m.group(1))
            arr = (pxgen.tile_pixels(s, int(m.group(2)), int(m.group(3)), spec)
                   .astype(np.float64))
            over = arr - np.minimum(arr, 10.0)
            assert r.n_diff == int((over != 0).sum())
            assert r.delta_sum == float(over.sum())
            assert r.max_abs == float(over.max(initial=0.0))

    def test_mixed_flat_vs_sharded_diff(self, spark, tmp_path):
        """A flat epoch diffs against a SHARDED epoch of the same raster
        (alignment is on the inner chunk grid): all-zero diff, full row
        count — packed layouts are first-class zip citizens."""
        from gridfia_spark.constants import SPECIES, spec_for_sf_dir

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        a = str(tmp_path / "a.zarr")
        zarrstore.write_zarr_store(tiles, a)
        sh = str(tmp_path / "s.zarr")
        zarrstore.write_sharded_store(tiles, sh, shard_tiles=(2, 2))
        spec = spec_for_sf_dir(SF_DIR)
        for x, y in ((a, sh), (sh, a)):
            rows = zarrstore.diff_stores(spark, x, y).collect()
            assert len(rows) == len(SPECIES) * spec.tiles_x * spec.tiles_y
            assert all(r.n_diff == 0 and r.delta_sum == 0.0 for r in rows)

    def test_plan_is_map_only(self, spark, tmp_path):
        a, b = self._stores(spark, tmp_path)
        plan = (
            zarrstore.diff_stores(spark, a, b)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" not in plan


class TestTrendStores:
    CAPS = (10, 20, 30)

    def _epochs(self, spark, tmp_path):
        import pandas as pd

        from gridfia_spark.datagen.tiles import TILE_SCHEMA

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        paths = []
        for e, cap in enumerate(self.CAPS):
            p = str(tmp_path / f"e{e}.zarr")

            def f(batches, cap=float(cap)):
                for pdf in batches:
                    rows = []
                    for r in pdf.itertuples(index=False):
                        a = codecs.decode(r.bytes, r.w, r.h, r.fmt)
                        rows.append((r.image_id,
                                     codecs.encode(np.minimum(a, np.float32(cap)), "rawz"),
                                     r.w, r.h, "rawz", r.caption, r.phash))
                    yield pd.DataFrame(rows, columns=[
                        "image_id", "bytes", "w", "h", "fmt", "caption",
                        "phash"])

            zarrstore.write_zarr_store(
                tiles.mapInPandas(f, TILE_SCHEMA), p,
                zarr_format=3 if e == 1 else 2,
            )
            paths.append(p)
        return paths

    def _numpy_nums(self):
        from gridfia_spark.constants import spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        cube = pxgen.full_cube(spec).astype(np.int64)
        stack = np.stack([np.minimum(cube, c) for c in self.CAPS])
        t = np.arange(3, dtype=np.int64)
        num = 3 * (stack * t[:, None, None, None]).sum(axis=0) - 3 * stack.sum(axis=0)
        return spec, num  # (layers, gh, gw)

    def test_matches_whole_grid_numpy(self, spark, tmp_path):
        from gridfia_spark.constants import SPECIES

        paths = self._epochs(spark, tmp_path)
        spec, num = self._numpy_nums()
        rows = {r.image_id: r for r in
                zarrstore.trend_stores(spark, paths).collect()}
        assert len(rows) == len(SPECIES) * spec.tiles_x * spec.tiles_y
        for iid, r in rows.items():
            import re as _re

            m = _re.match(r"sp(\d{4})_tx(\d+)_ty(\d+)", iid)
            s = [c for c, _ in SPECIES].index(m.group(1))
            tx, ty = int(m.group(2)), int(m.group(3))
            blk = num[s, ty * spec.tile_h:(ty + 1) * spec.tile_h,
                      tx * spec.tile_w:(tx + 1) * spec.tile_w]
            assert r.den == 6 and r.n_epochs == 3
            assert r.sum_num == int(blk.sum())
            assert r.min_num == int(blk.min())
            assert r.max_num == int(blk.max())
            assert r.n_rising == int((blk > 0).sum())

    def test_absent_epoch_chunk_is_fill(self, spark, tmp_path):
        paths = self._epochs(spark, tmp_path)
        os.remove(os.path.join(paths[0], "biomass", "2.0.0"))
        spec, num = self._numpy_nums()
        # recompute tile (0,0) layer 2 with epoch 0 zeroed there
        cube = pxgen.full_cube(spec).astype(np.int64)
        th, tw = spec.tile_h, spec.tile_w
        stack = np.stack([np.minimum(cube[2, 0:th, 0:tw], c)
                          for c in self.CAPS])
        stack[0] = 0
        t = np.arange(3, dtype=np.int64)
        blk = 3 * (stack * t[:, None, None]).sum(axis=0) - 3 * stack.sum(axis=0)
        from gridfia_spark.constants import SPECIES

        rows = {r.image_id: r for r in
                zarrstore.trend_stores(spark, paths, species=[2]).collect()}
        r = rows[f"sp{SPECIES[2][0]}_tx000_ty000"]
        assert r.sum_num == int(blk.sum()) and r.max_num == int(blk.max())

    def test_validation_and_sharded_epoch(self, spark, tmp_path):
        paths = self._epochs(spark, tmp_path)
        with pytest.raises(ValueError, match="at least 2"):
            zarrstore.trend_stores(spark, paths[:1])
        # a sharded UNCLIPPED epoch appended after the clipped ones:
        # trend over [clip10, clip20, clip30, raw-sharded] must equal the
        # numpy OLS over those four stacks (mixed layouts first-class)
        sh = str(tmp_path / "s.zarr")
        zarrstore.write_sharded_store(
            tgen.ensure_tiles(spark, SF_DIR), sh, shard_tiles=(2, 2)
        )
        from gridfia_spark.constants import spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        cube = pxgen.full_cube(spec).astype(np.int64)
        stack = np.stack(
            [np.minimum(cube, c) for c in self.CAPS] + [cube]
        )
        t = np.arange(4, dtype=np.int64)
        st, stt = int(t.sum()), int((t * t).sum())
        num = 4 * (stack * t[:, None, None, None]).sum(axis=0) - st * stack.sum(axis=0)
        rows = {r.image_id: r for r in
                zarrstore.trend_stores(spark, paths + [sh]).collect()}
        from gridfia_spark.constants import SPECIES

        th, tw = spec.tile_h, spec.tile_w
        r = rows[f"sp{SPECIES[1][0]}_tx001_ty000"]
        blk = num[1, 0:th, tw : 2 * tw]
        assert r.den == 4 * stt - st * st
        assert r.sum_num == int(blk.sum())
        assert r.n_rising == int((blk > 0).sum())

    def test_plan_is_map_only(self, spark, tmp_path):
        paths = self._epochs(spark, tmp_path)
        plan = (zarrstore.trend_stores(spark, paths)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange hashpartitioning" not in plan


class TestExtractTimeseries:
    def test_matches_cube_values_across_epochs(self, spark, tmp_path):
        """Every (point, layer, epoch) value equals the cube pixel —
        epoch 1 sharded to prove mixed layouts."""
        from gridfia_spark.constants import SPECIES, PIX, X0, Y0, spec_for_sf_dir

        spec = spec_for_sf_dir(SF_DIR)
        tiles = tgen.ensure_tiles(spark, SF_DIR)
        a = str(tmp_path / "a.zarr")
        b = str(tmp_path / "b.zarr")
        zarrstore.write_zarr_store(tiles, a)
        zarrstore.write_sharded_store(tiles, b, shard_tiles=(2, 2))
        pts = tgen.points_df(spark, SF_DIR)
        rows = zarrstore.extract_timeseries(spark, [a, b], pts).collect()
        cube = pxgen.full_cube(spec)
        coords = {
            r["point_id"]: (
                int((r["x"] - X0) // PIX), int((Y0 - r["y"]) // PIX)
            )
            for r in pts.collect()
        }
        n_in = sum(
            1 for gx, gy in coords.values()
            if 0 <= gx < spec.gw and 0 <= gy < spec.gh
        )
        assert len(rows) == n_in * len(SPECIES) * 2
        for r in rows:
            gx, gy = coords[r.point_id]
            assert r.v == float(cube[r.s, gy, gx]), (r, gx, gy)

    def test_out_of_grid_points_dropped(self, spark, tmp_path):
        from gridfia_spark.constants import SPECIES, X0, Y0

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        a = str(tmp_path / "a.zarr")
        zarrstore.write_zarr_store(tiles, a)
        pts = spark.createDataFrame(
            [(1, X0 + 15.0, Y0 - 15.0), (2, X0 - 999.0, Y0 + 999.0)],
            "point_id long, x double, y double",
        )
        rows = zarrstore.extract_timeseries(spark, [a], pts).collect()
        assert {r.point_id for r in rows} == {1}
        assert len(rows) == len(SPECIES)

    def test_plan_shuffles_points_not_bytes(self, spark, tmp_path):
        import re as _re

        tiles = tgen.ensure_tiles(spark, SF_DIR)
        a = str(tmp_path / "a.zarr")
        zarrstore.write_zarr_store(tiles, a)
        pts = tgen.points_df(spark, SF_DIR)
        plan = (
            zarrstore.extract_timeseries(spark, [a], pts)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1
        m = _re.search(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        assert m and "bytes" not in m.group(1)
