"""Pure-python WebP-lossless (VP8L) codec — grayscale tiles in, real
RIFF/WEBP/VP8L bytes out, and back.

Written from the public WebP Lossless Bitstream Specification (RFC 9649 /
the libwebp format doc), the same precedent as the repo's PNG/JPEG/WAV
codecs: spec structure, own entropy coding, no third-party code.

Encoder (``encode_gray``) emits a conformant stream using a deliberately
small slice of the format:

- no transforms, no color cache, no meta prefix (entropy) image;
- one prefix-code group: green+length, red, blue, alpha, distance;
- literals for pixel values (A=255, R=G=B=v) and greedy run-length LZ77
  back-references with distance 1 (``dist_code = 1 + 120`` — the "plain"
  distance range, spec §4.2.2) for the long constant runs raster tiles
  are full of;
- canonical length-limited Huffman codes (15-bit data codes, 7-bit
  code-length codes), simple two-symbol codes where the alphabet allows.

Decoder (``decode`` / ``decode_gray``) handles every stream the encoder
can produce plus the general literal/LZ77 paths: normal and simple prefix
codes, the RLE 16/17/18 code-length coding, the ``max_symbol`` early-stop
variant, and the full 120-entry near-distance map. Color cache and
transforms are rejected with a clear error (the encoder never writes
them) — that subset boundary is documented, not silent.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_ALLOWED_CODE_LENGTH = 15
CL_MAX_LENGTH = 7  # code-length-code lengths are stored in 3-bit fields

# spec: order in which code-length-code lengths are stored
K_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# spec §4.2.2: 2D near-distance map for dist codes 1..120 (dx, dy)
K_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]
assert len(K_DIST_MAP) == 120


# ------------------------------------------------------------------ bit IO
class BitWriter:
    """LSB-first bit packer (the DEFLATE/VP8L convention)."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc |= (value & ((1 << nbits) - 1)) << self._nbits
        self._nbits += nbits
        while self._nbits >= 8:
            self._buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes are emitted MSB-of-code first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self._buf)
        if self._nbits:
            out.append(self._acc & 0xFF)
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def read(self, nbits: int) -> int:
        if self._pos + nbits > len(self._data) * 8:
            raise ValueError("truncated VP8L stream")
        v = 0
        for i in range(nbits):
            byte = self._data[(self._pos + i) >> 3]
            v |= ((byte >> ((self._pos + i) & 7)) & 1) << i
        self._pos += nbits
        return v

    def read_bit(self) -> int:
        if self._pos >= len(self._data) * 8:
            raise ValueError("truncated VP8L stream")
        byte = self._data[self._pos >> 3]
        bit = (byte >> (self._pos & 7)) & 1
        self._pos += 1
        return bit


# ------------------------------------------------------- canonical Huffman
def limited_code_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Length-limited Huffman code lengths (symbol -> length, length >= 1),
    Kraft-complete (sum 2^-len == 1). Single-symbol alphabets return
    {sym: 0} (a zero-bit code, per spec)."""
    syms = sorted(s for s, f in freqs.items() if f > 0)
    if not syms:
        raise ValueError("empty alphabet")
    if len(syms) == 1:
        return {syms[0]: 0}
    # heap-free O(n log n) Huffman on sorted frequencies (two-queue method)
    import heapq

    heap: list[tuple[int, int, tuple]] = []
    for i, s in enumerate(syms):
        heapq.heappush(heap, (freqs[s], i, (s,)))
    counter = len(syms)
    depth = dict.fromkeys(syms, 0)
    while len(heap) > 1:
        fa, _, ga = heapq.heappop(heap)
        fb, _, gb = heapq.heappop(heap)
        for s in ga + gb:
            depth[s] += 1
        counter += 1
        heapq.heappush(heap, (fa + fb, counter, ga + gb))
    # clamp + Kraft repair to max_len
    for s in syms:
        if depth[s] > max_len:
            depth[s] = max_len
    unit = 1 << max_len
    kraft = sum(1 << (max_len - depth[s]) for s in syms)
    while kraft > unit:
        # deepen the deepest symbol still above 1-bit headroom
        cand = max((s for s in syms if depth[s] < max_len), key=lambda s: depth[s])
        kraft -= 1 << (max_len - depth[cand] - 1)
        depth[cand] += 1
    while kraft < unit:
        # shorten the cheapest symbol that still fits
        for s in sorted(syms, key=lambda s: -depth[s]):
            gain = 1 << (max_len - depth[s])
            if depth[s] > 1 and kraft + gain <= unit:
                depth[s] -= 1
                kraft += gain
                break
        else:
            raise AssertionError("kraft repair failed")
    assert kraft == unit
    return {s: depth[s] for s in syms}


def canonical_codes(lengths: dict[int, int]) -> dict[int, int]:
    """DEFLATE-style canonical codes: codes assigned in symbol order within
    each length, lengths ascending (RFC 1951 §3.2.2 — VP8L uses the same
    construction)."""
    max_len = max((l for l in lengths.values()), default=0)
    bl_count = [0] * (max_len + 1)
    for l in lengths.values():
        if l > 0:
            bl_count[l] += 1
    next_code = [0] * (max_len + 2)
    c = 0
    for l in range(1, max_len + 1):
        c = (c + bl_count[l - 1]) << 1
        next_code[l] = c
    codes = {}
    for sym in sorted(lengths):
        l = lengths[sym]
        if l > 0:
            codes[sym] = next_code[l]
            next_code[l] += 1
        else:
            codes[sym] = 0  # zero-bit code: write_code emits nothing
    return codes


class CanonicalDecoder:
    """Bit-serial canonical decoder; 0-bit codes return their only symbol."""

    def __init__(self, lengths: dict[int, int]) -> None:
        nz = {s: l for s, l in lengths.items() if l > 0}
        if not nz:
            # single-symbol (length 0) code
            only = [s for s, l in lengths.items() if l == 0]
            if len(only) != 1:
                raise ValueError("invalid code: no lengths")
            self._only: int | None = only[0]
            return
        self._only = None
        max_len = max(nz.values())
        self._bl_count = [0] * (max_len + 1)
        for l in nz.values():
            self._bl_count[l] += 1
        # symbols sorted by (length, symbol): canonical order
        self._syms = [s for l, s in sorted((l, s) for s, l in nz.items())]
        self._max_len = max_len
        # Kraft completeness check (spec requires complete codes)
        if sum(1 << (max_len - l) for l in nz.values()) != (1 << max_len):
            raise ValueError("incomplete prefix code")

    def read(self, br: BitReader) -> int:
        if self._only is not None:
            return self._only
        code = 0
        first = 0
        index = 0
        for length in range(1, self._max_len + 1):
            code = (code << 1) | br.read_bit()
            count = self._bl_count[length]
            if code - first < count:
                return self._syms[index + code - first]
            index += count
            first = (first + count) << 1
        raise ValueError("corrupt prefix stream")


# --------------------------------------------------- prefix (LZ77) values
def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix_code, extra_value, extra_bits) (spec §4.2.1)."""
    if value <= 4:
        return value - 1, 0, 0
    vm = value - 1
    for c in range(4, 40):
        eb = (c - 2) >> 1
        off = (2 + (c & 1)) << eb
        if off <= vm < off + (1 << eb):
            return c, vm - off, eb
    raise ValueError(f"value {value} out of prefix-code range")


def _prefix_decode(code: int, br: BitReader) -> int:
    if code < 4:
        return code + 1
    eb = (code - 2) >> 1
    off = (2 + (code & 1)) << eb
    return off + br.read(eb) + 1


# --------------------------------------------------- code write/read paths
def _write_code_lengths(bw: BitWriter, lengths: dict[int, int], alphabet: int) -> None:
    """Emit one 'normal' prefix code: RLE code-length stream + its 7-bit
    limited code-length code (spec §4.2.4)."""
    full = [lengths.get(s, 0) for s in range(alphabet)]
    # RLE tokens: (symbol, extra_value, extra_bits)
    tokens: list[tuple[int, int, int]] = []
    i = 0
    prev_nz = 8
    while i < alphabet:
        l = full[i]
        if l == 0:
            run = 1
            while i + run < alphabet and full[i + run] == 0:
                run += 1
            left = run
            while left >= 11:
                n = min(left, 138)
                tokens.append((18, n - 11, 7))
                left -= n
            while left >= 3:
                n = min(left, 10)
                tokens.append((17, n - 3, 3))
                left -= n
            tokens.extend((0, 0, 0) for _ in range(left))
            i += run
        else:
            tokens.append((l, 0, 0))
            prev_nz = l
            run = 1
            while i + run < alphabet and full[i + run] == l:
                run += 1
            left = run - 1
            while left >= 3:
                n = min(left, 6)
                tokens.append((16, n - 3, 2))
                left -= n
            tokens.extend((l, 0, 0) for _ in range(left))
            i += run
    cl_freq: dict[int, int] = {}
    for sym, _, _ in tokens:
        cl_freq[sym] = cl_freq.get(sym, 0) + 1
    if len(cl_freq) == 1:
        # pad with an unused symbol so the cl code is Kraft-complete
        pad = 0 if 0 not in cl_freq else 15
        cl_len = {next(iter(cl_freq)): 1, pad: 1}
    else:
        cl_len = limited_code_lengths(cl_freq, CL_MAX_LENGTH)
    cl_codes = canonical_codes(cl_len)
    # store lengths in K_CL_ORDER, trimming trailing zeros (min 4 entries)
    order_lens = [cl_len.get(s, 0) for s in K_CL_ORDER]
    n_codes = max(4, max(i + 1 for i, l in enumerate(order_lens) if l > 0))
    bw.write(n_codes - 4, 4)
    for l in order_lens[:n_codes]:
        bw.write(l, 3)
    bw.write(0, 1)  # no max_symbol shortcut: the RLE stream covers everything
    for sym, extra, ebits in tokens:
        bw.write_code(cl_codes[sym], cl_len[sym])
        if ebits:
            bw.write(extra, ebits)


def _write_prefix_code(bw: BitWriter, freqs: dict[int, int], alphabet: int) -> tuple[dict[int, int], dict[int, int]]:
    """Write one of the five prefix codes; returns (lengths, codes)."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]
        freqs = {0: 1}
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple code
        bw.write(len(used) - 1, 1)
        if used[0] <= 1 and len(used) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)  # 8-bit first symbol
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        if len(used) == 1:
            lengths = {used[0]: 0}
        else:
            lengths = {used[0]: 1, used[1]: 1}
        return lengths, canonical_codes(lengths)
    bw.write(0, 1)  # normal code
    lengths = limited_code_lengths(freqs, MAX_ALLOWED_CODE_LENGTH)
    _write_code_lengths(bw, lengths, alphabet)
    return lengths, canonical_codes(lengths)


def _read_code_lengths(br: BitReader, alphabet: int) -> dict[int, int]:
    n_codes = br.read(4) + 4
    cl_len = {}
    for i in range(n_codes):
        l = br.read(3)
        if l:
            cl_len[K_CL_ORDER[i]] = l
    dec = CanonicalDecoder(cl_len)
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    symbol = 0
    prev = 8
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = dec.read(br)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code:
                prev = code
        elif code == 16:
            n = 3 + br.read(2)
            for _ in range(n):
                lengths[symbol] = prev
                symbol += 1
        elif code == 17:
            n = 3 + br.read(3)
            symbol += n
        else:  # 18
            n = 11 + br.read(7)
            symbol += n
    return {s: l for s, l in enumerate(lengths) if l > 0}


def _read_prefix_code(br: BitReader, alphabet: int) -> CanonicalDecoder:
    if br.read_bit():  # simple
        num_symbols = br.read(1) + 1
        first_8 = br.read_bit()
        s0 = br.read(8 if first_8 else 1)
        if num_symbols == 2:
            s1 = br.read(8)
            return CanonicalDecoder({s0: 1, s1: 1})
        return CanonicalDecoder({s0: 0})
    return CanonicalDecoder(_read_code_lengths(br, alphabet))


# --------------------------------------------------------------- container
def _wrap_riff(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _unwrap_riff(data: bytes) -> bytes:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP RIFF container")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if tag == b"VP8L":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    raise ValueError("no VP8L chunk (lossy/extended WebP not supported)")


# ------------------------------------------------------------------ encode
MIN_RUN = 4  # literal + backref(length>=3)
MAX_COPY = 4096  # longest length expressible with the 24 length prefixes


def encode_gray(arr: np.ndarray) -> bytes:
    """uint8 grayscale (h, w) -> lossless WebP bytes (A=255, R=G=B=v)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError("encode_gray expects uint8")
    h, w = arr.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("dimensions out of VP8L range")
    px = arr.ravel()
    n = px.size
    # run-length tokenization (numpy segment boundaries)
    bounds = np.flatnonzero(np.diff(px)) + 1
    starts = np.concatenate(([0], bounds))
    runlens = np.diff(np.concatenate((starts, [n])))
    tokens: list[tuple[str, int]] = []  # ('lit', v) | ('copy', length)
    for s, rl in zip(starts.tolist(), runlens.tolist()):
        v = int(px[s])
        if rl >= MIN_RUN:
            tokens.append(("lit", v))
            left = rl - 1
            while left > 0:
                c = min(left, MAX_COPY)
                if c < 3:
                    tokens.extend(("lit", v) for _ in range(c))
                    break
                tokens.append(("copy", c))
                left -= c
        else:
            tokens.extend(("lit", v) for _ in range(rl))
    # frequencies
    gfreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    for kind, v in tokens:
        if kind == "lit":
            gfreq[v] = gfreq.get(v, 0) + 1
        else:
            c, _, _ = _prefix_encode(v)
            gfreq[256 + c] = gfreq.get(256 + c, 0) + 1
            dc, _, _ = _prefix_encode(1 + 120)  # distance 1 -> plain code 121
            dfreq[dc] = dfreq.get(dc, 0) + 1
    litfreq = {v: f for v, f in gfreq.items() if v < 256}
    if not dfreq:
        dfreq = {0: 1}

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    glen, gcodes = _write_prefix_code(bw, gfreq, 256 + 24)
    rlen, rcodes = _write_prefix_code(bw, litfreq or {0: 1}, 256)
    blen, bcodes = _write_prefix_code(bw, litfreq or {0: 1}, 256)
    alen, acodes = _write_prefix_code(bw, {255: 1}, 256)
    dlen, dcodes = _write_prefix_code(bw, dfreq, 40)
    for kind, v in tokens:
        if kind == "lit":
            bw.write_code(gcodes[v], glen[v])
            bw.write_code(rcodes[v], rlen[v])
            bw.write_code(bcodes[v], blen[v])
            bw.write_code(acodes[255], alen[255])
        else:
            c, extra, ebits = _prefix_encode(v)
            bw.write_code(gcodes[256 + c], glen[256 + c])
            if ebits:
                bw.write(extra, ebits)
            dc, dextra, debits = _prefix_encode(121)
            bw.write_code(dcodes[dc], dlen[dc])
            if debits:
                bw.write(dextra, debits)
    return _wrap_riff(bw.bytes())


# ------------------------------------------------------------------ decode
def decode(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 4) uint8 ARGB (no-transform, no-cache subset)."""
    br = BitReader(_unwrap_riff(data))
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    if br.read_bit():
        raise ValueError("VP8L transforms not supported by this decoder")
    if br.read_bit():
        raise ValueError("VP8L color cache not supported by this decoder")
    if br.read_bit():
        raise ValueError("VP8L meta prefix image not supported by this decoder")
    green = _read_prefix_code(br, 256 + 24)
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    dist = _read_prefix_code(br, 40)
    n = w * h
    out = np.zeros((n, 4), dtype=np.uint8)  # A R G B
    i = 0
    while i < n:
        s = green.read(br)
        if s < 256:
            g = s
            r = red.read(br)
            b = blue.read(br)
            a = alpha.read(br)
            out[i] = (a, r, g, b)
            i += 1
        else:
            length = _prefix_decode(s - 256, br)
            dcode = _prefix_decode(dist.read(br), br)
            if dcode > 120:
                d = dcode - 120
            else:
                dx, dy = K_DIST_MAP[dcode - 1]
                d = max(1, dx + dy * w)
            if d > i:
                raise ValueError("backward reference before image start")
            for _ in range(length):
                if i >= n:
                    raise ValueError("backward reference overruns image")
                out[i] = out[i - d]
                i += 1
    return out.reshape(h, w, 4)


def decode_gray(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w) uint8, asserting the gray contract R==G==B."""
    argb = decode(data)
    if not (
        np.array_equal(argb[..., 1], argb[..., 2])
        and np.array_equal(argb[..., 2], argb[..., 3])
    ):
        raise ValueError("not a grayscale WebP (R, G, B differ)")
    return argb[..., 2].copy()
