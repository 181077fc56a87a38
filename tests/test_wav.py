"""Pure-python WAV codec: round-trips, chunk-walking robustness, and the
multimodal registry decoding genuine RIFF/PCM16 bytes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gridfia_spark import wav
from gridfia_spark.operators import multimodal


def test_roundtrip_mono():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=1234, dtype=np.int16)
    out, rate = wav.decode_wav(wav.encode_wav(s, 22_050))
    assert rate == 22_050
    np.testing.assert_array_equal(out[:, 0], s)


def test_roundtrip_stereo():
    rng = np.random.default_rng(8)
    s = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    out, rate = wav.decode_wav(wav.encode_wav(s, 44_100))
    assert rate == 44_100
    assert out.shape == (500, 2)
    np.testing.assert_array_equal(out, s)


def test_unknown_chunks_skipped():
    """Real writers put LIST/fact chunks before data; the chunk walk must
    skip them by declared size (including the odd-size pad byte)."""
    s = np.arange(-5, 6, dtype=np.int16)
    raw = wav.encode_wav(s, 8000)
    # splice a LIST chunk (odd payload size -> pad byte) after 'WAVE'
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"
    spliced = raw[:12] + extra + raw[12:]
    size = len(spliced) - 8
    spliced = b"RIFF" + struct.pack("<I", size) + spliced[8:]
    out, rate = wav.decode_wav(spliced)
    np.testing.assert_array_equal(out[:, 0], s)


def test_rejects_non_pcm():
    s = np.zeros(4, dtype=np.int16)
    raw = bytearray(wav.encode_wav(s, 8000))
    raw[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError, match="unsupported WAV audio format"):
        wav.decode_wav(bytes(raw))
    with pytest.raises(ValueError, match="not a RIFF"):
        wav.decode_wav(b"OggS" + bytes(20))


def test_registry_decodes_wav():
    """'wav' is a built-in decoder — no longer a NotImplementedError stub —
    and the metadata width check fires on mismatch."""
    s = (np.arange(64, dtype=np.int64) * 1000 - 32000).astype(np.int16)
    data = wav.encode_wav(s, 16_000)
    arr = multimodal._decode_media(data, "wav", 64, 1)
    assert arr.shape == (1, 64)
    np.testing.assert_allclose(arr[0], s.astype(np.float32))
    with pytest.raises(ValueError, match="!= metadata"):
        multimodal._decode_media(data, "wav", 63, 1)


def test_stereo_mixdown():
    left = np.full(10, 100, dtype=np.int16)
    right = np.full(10, 300, dtype=np.int16)
    data = wav.encode_wav(np.stack([left, right], axis=1), 16_000)
    arr = multimodal._decode_media(data, "wav", 10, 1)
    np.testing.assert_allclose(arr[0], np.full(10, 200.0, dtype=np.float32))


def test_unregister_restores_builtin_wav():
    multimodal.register_decoder("wav", lambda b, w, h: np.zeros((1, 1)))
    multimodal.unregister_decoder("wav")
    s = np.ones(8, dtype=np.int16)
    arr = multimodal._decode_media(wav.encode_wav(s, 8000), "wav", 8, 1)
    assert arr.shape == (1, 8)


def test_pngseq_roundtrip_and_split():
    from gridfia_spark import png

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 251, size=(6, 9), dtype=np.uint8) for _ in range(4)]
    data = multimodal.encode_pngseq(frames)
    parts = multimodal.split_pngseq(data)
    assert len(parts) == 4
    for f, p in zip(frames, parts):
        np.testing.assert_array_equal(png.decode_png(p), f)
    with pytest.raises(ValueError, match="not a pngseq"):
        multimodal.split_pngseq(b"RIFF" + data[4:])
    with pytest.raises(ValueError, match="trailing bytes"):
        multimodal.split_pngseq(data + b"\0")


def test_sample_frames_pngseq(spark):
    """The video explode path on a genuine intra-frame container: every 2nd
    frame decodes via the registry png codec; unsampled frames never decode."""
    from gridfia_spark import codecs

    frames = [np.full((3, 4), 10 * f, dtype=np.uint8) for f in range(5)]
    media = spark.createDataFrame(
        [("m1", bytearray(multimodal.encode_pngseq(frames)), "video",
          "pngseq", 4, 3, 5, 0, "")],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {
        r.frame_idx: r
        for r in multimodal.sample_frames(media, every_k=2, fmt="raw32").collect()
    }
    assert sorted(rows) == [0, 2, 4]
    for fi, r in rows.items():
        arr = codecs.decode(bytes(r.bytes), r.w, r.h, r.fmt)
        np.testing.assert_allclose(arr, np.full((3, 4), 10.0 * fi))
    # metadata mismatch must fail loudly, not silently truncate
    bad = spark.createDataFrame(
        [("m2", bytearray(multimodal.encode_pngseq(frames)), "video",
          "pngseq", 4, 3, 7, 0, "")],
        multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="frames != metadata"):
        multimodal.sample_frames(bad, every_k=2).collect()


def test_truncated_containers_fail_loudly():
    s = np.arange(16, dtype=np.int16)
    raw = wav.encode_wav(s, 8000)
    with pytest.raises(ValueError, match="truncated"):
        wav.decode_wav(raw[:-3])
    frames = [np.zeros((2, 2), dtype=np.uint8)]
    seq = multimodal.encode_pngseq(frames)
    with pytest.raises(ValueError, match="truncated"):
        multimodal.split_pngseq(seq[:-1])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @given(
        arrays(np.int16, st.tuples(st.integers(1, 300), st.integers(1, 3))),
        st.sampled_from([8000, 16_000, 44_100]),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_roundtrip_property(samples, rate):
        out, r = wav.decode_wav(wav.encode_wav(samples, rate))
        assert r == rate
        np.testing.assert_array_equal(out, samples)

    @given(
        st.lists(
            arrays(np.uint8, st.tuples(st.integers(1, 12), st.integers(1, 12))),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=25, deadline=None)
    def test_pngseq_roundtrip_property(frames):
        from gridfia_spark import png

        parts = multimodal.split_pngseq(multimodal.encode_pngseq(frames))
        assert len(parts) == len(frames)
        for f, p in zip(frames, parts):
            np.testing.assert_array_equal(png.decode_png(p), f)

except ImportError:  # pragma: no cover — hypothesis is in the sandbox
    pass
