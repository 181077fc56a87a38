"""Pure numpy+struct WAV (RIFF/PCM) codec — no audio libraries in the
sandbox.

Legitimate, spec-complete support for the PCM subset an analytics pipeline
meets: 16-bit little-endian PCM, mono or interleaved multi-channel, proper
RIFF chunk walking on decode (unknown chunks are skipped by their declared
size, as the spec requires — many real writers emit LIST/fact chunks before
``data``). This un-stubs the 'wav' entry in operators/multimodal.py the same
way png.py un-stubbed 'png': the registry decoder is backed by this module,
so audio rows flow through genuine container bytes end-to-end.

Reference behavior analogue: the reference treats rasters as opaque
containers decoded at the task (zarr_utils.py:684-694); audio columns get
the identical treatment here — encode/decode at the executor, never on the
driver.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 array (n,) mono or (n, ch) interleaved -> RIFF/WAVE PCM16
    bytes."""
    a = np.asarray(samples)
    if a.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16 samples, got {a.dtype}")
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, ch), got {a.shape}")
    n, ch = a.shape
    data = a.astype("<i2").tobytes()
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> (int16 array (n, ch), sample_rate).

    Walks the chunk list (padding to even offsets per the RIFF spec) and
    skips chunks it does not know, so files with LIST/fact/cue chunks decode
    fine. Raises on non-PCM or non-16-bit streams."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    channels = sample_rate = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > len(data):
            raise ValueError(f"truncated {tag!r} chunk")
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_format, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_format != 1:
                raise ValueError(f"unsupported WAV audio format {audio_format}")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif tag == b"data":
            pcm = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    arr = np.frombuffer(pcm, dtype="<i2")
    if len(arr) % channels:
        raise ValueError("data chunk not a whole number of frames")
    return arr.reshape(-1, channels), int(sample_rate)
