"""Pure-python Blosc1-LZ4 codec (gridfia_spark/blosc.py): chunk layout,
LZ4 block coding, shuffle inversion, and loud-refusal hardening."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gridfia_spark import blosc


class TestLZ4:
    def test_known_answer_match_copy(self):
        # 4 literals 'abcd', match offset 4 len 8, then 5 trailing literals
        src = bytes([0x44, 97, 98, 99, 100, 0x04, 0x00, 0x50]) + b"tail!"
        assert blosc.lz4_decompress_block(src, 17) == b"abcdabcdabcdtail!"

    def test_overlapping_match_repeats_pattern(self):
        # 1 literal 'x', match offset 1 len 9 -> 'x' * 10
        src = bytes([0x15, 120, 0x01, 0x00])
        assert blosc.lz4_decompress_block(src, 10) == b"x" * 10

    def test_extended_lengths(self):
        data = b"A" * 300 + b"unique-tail-bytes"
        comp = blosc.lz4_compress_block(data)
        assert blosc.lz4_decompress_block(comp, len(data)) == data
        assert len(comp) < len(data) // 2  # the run actually compressed

    def test_compressor_roundtrip_structured(self):
        rng = np.random.default_rng(3)
        for n in (0, 1, 12, 13, 100, 4096):
            data = (np.arange(n, dtype=np.uint8) % 11).tobytes()
            comp = blosc.lz4_compress_block(data)
            assert blosc.lz4_decompress_block(comp, n) == data
            rnd = rng.bytes(n)
            comp = blosc.lz4_compress_block(rnd)
            assert blosc.lz4_decompress_block(comp, n) == rnd

    def test_bad_streams_raise(self):
        with pytest.raises(ValueError):
            blosc.lz4_decompress_block(bytes([0x10]), 1)  # truncated literal
        with pytest.raises(ValueError):  # offset 0
            blosc.lz4_decompress_block(bytes([0x04, 65, 0x00, 0x00]), 9)
        with pytest.raises(ValueError):  # offset beyond output
            blosc.lz4_decompress_block(bytes([0x14, 65, 0x09, 0x00]), 9)
        with pytest.raises(ValueError):  # wrong expected size
            blosc.lz4_decompress_block(bytes([0x20, 65, 66]), 5)


class TestShuffle:
    @given(
        st.binary(min_size=0, max_size=400),
        st.sampled_from([1, 2, 4, 8]),
    )
    @settings(max_examples=40, deadline=None)
    def test_inverse(self, data, ts):
        assert blosc.unshuffle(blosc.shuffle(data, ts), ts) == data

    def test_layout_matches_c_blosc(self):
        # 3 elements of typesize 2: bytes a0 a1 b0 b1 c0 c1 ->
        # a0 b0 c0 a1 b1 c1 (all byte-0s first, then byte-1s)
        assert blosc.shuffle(bytes([1, 2, 3, 4, 5, 6]), 2) == bytes(
            [1, 3, 5, 2, 4, 6]
        )
        # 7 bytes at typesize 2: trailing odd byte stays in place
        assert blosc.shuffle(bytes([1, 2, 3, 4, 5, 6, 9]), 2) == bytes(
            [1, 3, 5, 2, 4, 6, 9]
        )


class TestChunk:
    @given(
        st.integers(min_value=0, max_value=3000),
        st.sampled_from([1, 2, 4, 8]),
        st.booleans(),
        st.sampled_from([0, 257, 1024]),
        st.booleans(),
    )
    @settings(max_examples=60, deadline=None)
    def test_roundtrip(self, n, ts, use_shuffle, blocksize, structured):
        if structured:
            data = (np.arange(n, dtype=np.uint8) % 13).tobytes()
        else:
            data = np.random.default_rng(n).bytes(n)
        c = blosc.encode_chunk(data, typesize=ts, use_shuffle=use_shuffle,
                               blocksize=blocksize)
        assert blosc.decode_chunk(c) == data

    def test_memcpy_flag(self):
        mc = struct.pack("<BBBBIII", 1, 1, blosc.FLAG_MEMCPY, 1, 5, 5, 21) + b"hello"
        assert blosc.decode_chunk(mc) == b"hello"

    def test_unsupported_layouts_raise(self):
        with pytest.raises(ValueError, match="bit-shuffle"):
            blosc.decode_chunk(
                struct.pack("<BBBBIII", 1, 1, blosc.FLAG_BITSHUFFLE, 4, 8, 8, 16)
            )
        with pytest.raises(ValueError, match="compressor"):
            blosc.decode_chunk(struct.pack("<BBBBIII", 1, 1, 4 << 5, 4, 8, 8, 16))
        with pytest.raises(ValueError, match="version"):
            blosc.decode_chunk(struct.pack("<BBBBIII", 9, 1, 1 << 5, 4, 8, 8, 16))

    def test_every_truncation_prefix_raises_valueerror(self):
        """Same hardening contract as the other container codecs: a
        truncated chunk must raise ValueError, never hang or fabricate."""
        data = (np.arange(777, dtype=np.uint8) % 29).tobytes()
        chunk = blosc.encode_chunk(data, typesize=4, blocksize=256)
        for k in range(len(chunk)):
            with pytest.raises(ValueError):
                blosc.decode_chunk(chunk[:k])
