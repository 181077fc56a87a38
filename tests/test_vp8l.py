"""Unit tests for the pure-python WebP-lossless (VP8L) codec (vp8l.py)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gridfia_spark import vp8l


def _rt(arr: np.ndarray) -> np.ndarray:
    return vp8l.decode_gray(vp8l.encode_gray(arr))


class TestVp8l:
    def test_container_layout(self):
        blob = vp8l.encode_gray(np.zeros((2, 2), np.uint8))
        assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
        assert blob[12:16] == b"VP8L"
        payload = vp8l._unwrap_riff(blob)
        assert payload[0] == 0x2F  # VP8L signature byte

    def test_header_dimensions(self):
        blob = vp8l.encode_gray(np.zeros((37, 101), np.uint8))
        br = vp8l.BitReader(vp8l._unwrap_riff(blob))
        assert br.read(8) == 0x2F
        assert br.read(14) + 1 == 101  # width
        assert br.read(14) + 1 == 37  # height

    def test_roundtrip_shapes_and_contents(self):
        rng = np.random.default_rng(3)
        cases = [
            np.zeros((1, 1), np.uint8),
            np.full((5, 3), 255, np.uint8),
            np.arange(256, dtype=np.uint8).reshape(16, 16),
            rng.integers(0, 256, (48, 48)).astype(np.uint8),
            (rng.integers(0, 3, (64, 64)) * 100).astype(np.uint8),
            np.pad(np.full((8, 8), 9, np.uint8), 28),  # long zero runs
        ]
        for a in cases:
            assert np.array_equal(_rt(a), a)

    def test_run_compression_beats_raw(self):
        # a tile that is mostly a constant run must compress well below raw
        a = np.zeros((64, 64), np.uint8)
        a[:4, :4] = 17
        assert len(vp8l.encode_gray(a)) < a.size // 8

    def test_alpha_is_opaque_argb(self):
        argb = vp8l.decode(vp8l.encode_gray(np.full((4, 4), 9, np.uint8)))
        assert argb.shape == (4, 4, 4)
        assert (argb[..., 0] == 255).all()
        assert (argb[..., 1] == 9).all()

    def test_prefix_value_coding_inverse(self):
        bw = vp8l.BitWriter()
        vals = [1, 2, 3, 4, 5, 7, 8, 120, 121, 4096, 1 << 19]
        for v in vals:
            c, extra, ebits = vp8l._prefix_encode(v)
            bw.write_code(0, 0)  # no-op
            bw.write(extra, ebits)
            br = vp8l.BitReader(bw.bytes())
        # decode each against a fresh stream
        for v in vals:
            c, extra, ebits = vp8l._prefix_encode(v)
            w = vp8l.BitWriter()
            w.write(extra, ebits)
            assert vp8l._prefix_decode(c, vp8l.BitReader(w.bytes() or b"\0")) == v

    def test_limited_lengths_kraft_complete(self):
        rng = np.random.default_rng(11)
        for trial in range(30):
            n = int(rng.integers(2, 280))
            freqs = {s: int(rng.integers(1, 10_000)) for s in range(n)}
            for lim in (7, 15):
                if n > (1 << lim):
                    continue
                lens = vp8l.limited_code_lengths(freqs, lim)
                assert max(lens.values()) <= lim
                assert sum(2.0 ** -l for l in lens.values()) == 1.0

    def test_decoder_rejects_unsupported_features(self):
        with pytest.raises(ValueError, match="RIFF"):
            vp8l.decode(b"nope")
        # a stream claiming a transform must be rejected loudly
        bw = vp8l.BitWriter()
        bw.write(0x2F, 8)
        bw.write(0, 14)
        bw.write(0, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(1, 1)  # transform present
        with pytest.raises(ValueError, match="transform"):
            vp8l.decode(vp8l._wrap_riff(bw.bytes()))

    def test_media_registry_webp_builtin_and_stub_contract(self):
        from gridfia_spark.operators import multimodal

        a = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3).astype(np.uint8)
        got = multimodal._decode_media(vp8l.encode_gray(a), "webp", 8, 8)
        assert np.array_equal(got, a.astype(np.float32))
        # mp3/h264 remain the documented permanent stub with a clean error
        for fmt in ("mp3", "h264"):
            with pytest.raises(NotImplementedError, match="register_decoder"):
                multimodal._decode_media(b"xx", fmt, 1, 1)

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        nvals=st.integers(1, 8),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_roundtrip_hypothesis(self, h, w, nvals, seed):
        rng = np.random.default_rng(seed)
        palette = rng.integers(0, 256, nvals)
        arr = palette[rng.integers(0, nvals, (h, w))].astype(np.uint8)
        assert np.array_equal(_rt(arr), arr)


def test_truncation_raises_valueerror_only():
    blob = vp8l.encode_gray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for k in range(len(blob)):
        try:
            vp8l.decode(blob[:k])
        except ValueError:
            pass  # the only acceptable failure mode
