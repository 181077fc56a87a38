"""Pure-python Blosc1 chunk codec (LZ4 + byte-shuffle subset).

The reference's Zarr stores compress chunks with
``zarr.codecs.BloscCodec(cname='lz4', shuffle='shuffle')``
(zarr_utils.py:702-705) — the store format the engine previously
rejected as a documented read gap. This module implements the
public c-blosc chunk layout (README_CHUNK_FORMAT.rst) and the public
LZ4 block format, stdlib+numpy only, so those stores decode without any
external codec library:

    chunk  = header(16) | [bstarts] | blocks
    header = version u8, versionlz u8, flags u8, typesize u8,
             nbytes u32le, blocksize u32le, cbytes u32le
    flags  = bit0 byte-shuffle, bit1 pure-memcpy, bit2 bit-shuffle,
             bits5-7 compressor code (1 = LZ4/LZ4HC)
    block  = csize i32le, payload (payload raw iff csize == block's
             uncompressed size)

Byte-shuffle is applied PER BLOCK (transpose of typesize-strided bytes),
matching c-blosc; a trailing remainder shorter than one element stays
unshuffled. Bit-shuffle, snappy/zlib/zstd/blosclz compressor codes, and
malformed streams raise ``ValueError`` — refuse loudly, never misdecode.

``encode_chunk`` writes the same subset (real greedy-match LZ4, so the
output is readable by any c-blosc build) — it exists so stores written
here are readable by the reference and so the decoder is testable
against independently-constructed chunks. Pure-python LZ4 is
correctness-grade, not speed-grade: use it for interop, keep gzip/zlib
for throughput paths (documented in DEPLOYMENT.md).
"""

from __future__ import annotations

import struct

import numpy as np

FLAG_SHUFFLE = 0x1
FLAG_MEMCPY = 0x2
FLAG_BITSHUFFLE = 0x4
CODEC_LZ4 = 1  # flags bits 5-7


# ------------------------------------------------------------------ LZ4
def lz4_decompress_block(src: bytes, expected: int) -> bytes:
    """Decode one LZ4 BLOCK (the raw format, no frame) of known
    decompressed size ``expected``."""
    out = bytearray()
    pos, n = 0, len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while pos < n and src[pos] == 255:
                lit += 255
                pos += 1
            if pos >= n:
                raise ValueError("lz4: truncated literal length")
            lit += src[pos]
            pos += 1
        if pos + lit > n:
            raise ValueError("lz4: literal run past end of input")
        out += src[pos : pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence is literals-only
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"lz4: invalid match offset {offset}")
        mlen = token & 0xF
        if mlen == 15:
            while pos < n and src[pos] == 255:
                mlen += 255
                pos += 1
            if pos >= n:
                raise ValueError("lz4: truncated match length")
            mlen += src[pos]
            pos += 1
        mlen += 4
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            pattern = out[start:]
            out += (pattern * (mlen // offset + 1))[:mlen]
    if len(out) != expected:
        raise ValueError(f"lz4: decoded {len(out)} bytes, expected {expected}")
    return bytes(out)


def lz4_compress_block(src: bytes) -> bytes:
    """Greedy hash-chain-free LZ4 block encoder (4-byte matches, 64 KB
    window) — valid against any LZ4 decoder; used by ``encode_chunk``."""
    n = len(src)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = pos = 0

    def emit(lit_len: int, lit_start: int, mlen: int, offset: int) -> None:
        ml = mlen - 4 if mlen else 0
        token = (min(lit_len, 15) << 4) | (min(ml, 15) if mlen else 0)
        out.append(token)
        if lit_len >= 15:
            rest = lit_len - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(src[lit_start : lit_start + lit_len])
        if mlen:
            out.extend(struct.pack("<H", offset))
            if ml >= 15:
                rest = ml - 15
                while rest >= 255:
                    out.append(255)
                    rest -= 255
                out.append(rest)

    # the format requires the block to END with >=5 literal bytes and the
    # last match to start >=12 bytes from the end — stop matching early
    limit = n - 12
    while pos < limit:
        key = src[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF and src[cand : cand + 4] == key:
            mlen = 4
            max_m = n - 5 - pos
            while mlen < max_m and src[cand + mlen] == src[pos + mlen]:
                mlen += 1
            emit(pos - anchor, anchor, mlen, pos - cand)
            pos += mlen
            anchor = pos
        else:
            pos += 1
    emit(n - anchor, anchor, 0, 0)  # trailing literals
    return bytes(out)


# -------------------------------------------------------------- shuffle
def shuffle(data: bytes, typesize: int) -> bytes:
    """c-blosc byte-shuffle: transpose element bytes; a tail shorter than
    one element is left in place."""
    if typesize <= 1:
        return data
    n_el = len(data) // typesize
    cut = n_el * typesize
    a = np.frombuffer(data[:cut], dtype=np.uint8).reshape(n_el, typesize)
    return a.T.tobytes() + data[cut:]


def unshuffle(data: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return data
    n_el = len(data) // typesize
    cut = n_el * typesize
    a = np.frombuffer(data[:cut], dtype=np.uint8).reshape(typesize, n_el)
    return a.T.tobytes() + data[cut:]


# ---------------------------------------------------------------- chunk
def decode_chunk(buf: bytes) -> bytes:
    """One Blosc1 chunk -> original bytes (the zarr chunk payload)."""
    if len(buf) < 16:
        raise ValueError("blosc: truncated header")
    version, _versionlz, flags, typesize = buf[0], buf[1], buf[2], buf[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<III", buf, 4)
    if version < 1 or version > 2:
        raise ValueError(f"blosc: unsupported chunk version {version}")
    if flags & FLAG_BITSHUFFLE:
        raise ValueError("blosc: bit-shuffle is not supported (byte-shuffle only)")
    if cbytes > len(buf):
        raise ValueError("blosc: chunk shorter than header cbytes")
    if flags & FLAG_MEMCPY:
        if len(buf) < 16 + nbytes:
            raise ValueError("blosc: truncated memcpy chunk")
        return bytes(buf[16 : 16 + nbytes])
    codec = (flags >> 5) & 0x7
    if codec != CODEC_LZ4:
        raise ValueError(
            f"blosc: compressor code {codec} not supported (LZ4 only; "
            "snappy/zlib/zstd/blosclz are out of scope)"
        )
    if nbytes == 0:
        return b""
    if blocksize == 0:
        raise ValueError("blosc: zero blocksize")
    nblocks = -(-nbytes // blocksize)
    starts = struct.unpack_from(f"<{nblocks}i", buf, 16)
    out = bytearray()
    for i, st in enumerate(starts):
        neblock = min(blocksize, nbytes - i * blocksize)
        if st < 16 or st + 4 > len(buf):
            raise ValueError("blosc: block start out of range")
        (csize,) = struct.unpack_from("<i", buf, st)
        if csize < 0 or st + 4 + csize > len(buf):
            raise ValueError("blosc: block payload out of range")
        payload = buf[st + 4 : st + 4 + csize]
        if csize == neblock:
            block = bytes(payload)  # stored raw
        else:
            block = lz4_decompress_block(payload, neblock)
        if flags & FLAG_SHUFFLE:
            block = unshuffle(block, typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"blosc: decoded {len(out)} bytes, header says {nbytes}")
    return bytes(out)


def encode_chunk(
    data: bytes,
    typesize: int = 4,
    use_shuffle: bool = True,
    blocksize: int = 0,
) -> bytes:
    """Bytes -> one Blosc1 LZ4 chunk readable by any c-blosc build (and by
    ``decode_chunk``). ``blocksize=0`` auto-picks 64 KB-aligned blocks."""
    nbytes = len(data)
    if blocksize <= 0:
        blocksize = min(max(typesize, 1 << 16), nbytes) or 1
    blocksize -= blocksize % max(typesize, 1)
    blocksize = max(blocksize, max(typesize, 1))
    nblocks = max(1, -(-nbytes // blocksize))
    flags = (CODEC_LZ4 << 5) | (FLAG_SHUFFLE if use_shuffle and typesize > 1 else 0)
    blocks = []
    for i in range(nblocks):
        raw = data[i * blocksize : (i + 1) * blocksize]
        if flags & FLAG_SHUFFLE:
            raw = shuffle(raw, typesize)
        comp = lz4_compress_block(raw)
        if len(comp) >= len(raw):
            comp = raw  # store raw: csize == neblock marks it
        blocks.append(comp)
    bstart = 16 + 4 * nblocks
    starts, off = [], bstart
    for b in blocks:
        starts.append(off)
        off += 4 + len(b)
    body = b"".join(
        struct.pack("<i", len(b)) + b for b in blocks
    )
    header = struct.pack(
        "<BBBBIII", 1, 1, flags, min(typesize, 255), nbytes, blocksize, off
    )
    return header + struct.pack(f"<{nblocks}i", *starts) + body
