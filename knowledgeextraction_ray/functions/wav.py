"""Pure-stdlib WAV (RIFF PCM) codec.

De-stubs the real audio format in the multimodal stages
(``stages/multimodal.AudioFeatures``): no audio libraries ship in this
container, but canonical WAV is just RIFF chunk framing around raw PCM
(public spec: RIFF/WAVE, fmt chunk per Microsoft/IBM 1991; same container
the reference's serving stack would receive from a client upload).

Scope (asserted loudly): integer PCM (format tag 1) at 8/16/32-bit depth,
any channel count, plus IEEE float32 (format tag 3). Unknown chunks (LIST,
fact, ...) are skipped per the RIFF rules, including the odd-length pad
byte. Anything else raises ``ValueError`` naming the unsupported field.
"""

from __future__ import annotations

import struct

import numpy as np

# (format tag, bits) -> numpy dtype of the stored samples
_DTYPES = {
    (1, 8): np.uint8,        # 8-bit PCM is unsigned, midpoint 128
    (1, 16): np.dtype("<i2"),
    (1, 32): np.dtype("<i4"),
    (3, 32): np.dtype("<f4"),
}


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ``((n_samples, channels) float32 in [-1, 1], rate)``."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    riff_len = struct.unpack("<I", data[4:8])[0]
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos, fmt, frames = 12, None, None
    while pos + 8 <= min(len(data), riff_len + 8):
        cid, clen = struct.unpack("<4sI", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            frames = body
        pos += 8 + clen + (clen & 1)   # RIFF pads odd chunks to even
    if fmt is None or frames is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    dtype = _DTYPES.get((tag, bits))
    if dtype is None:
        raise ValueError(f"unsupported format tag {tag} at {bits}-bit")
    if channels < 1:
        raise ValueError("channel count must be >= 1")
    width = np.dtype(dtype).itemsize
    if block_align != width * channels:
        raise ValueError(f"block_align {block_align} != "
                         f"{width}x{channels} for {bits}-bit PCM")
    n = len(frames) // block_align
    raw = np.frombuffer(frames[:n * block_align], dtype=dtype)
    raw = raw.reshape(n, channels)
    if tag == 3:
        samples = raw.astype(np.float32)
    elif bits == 8:
        samples = (raw.astype(np.float32) - 128.0) / 128.0
    else:
        samples = raw.astype(np.float32) / float(2 ** (bits - 1))
    return samples, int(rate)


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """``(n, channels)`` or ``(n,)`` float in [-1, 1] → WAV bytes."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    n, channels = a.shape
    a = np.clip(a, -1.0, 1.0)
    # scale by the full 2^(bits-1) (decode's inverse), clipping the one
    # unreachable code at +1.0 full scale
    if bits == 8:
        raw = np.minimum(np.round(a * 128.0 + 128.0), 255.0).astype(np.uint8)
        tag = 1
    elif bits in (16, 32):
        scale = float(2 ** (bits - 1))
        raw = np.minimum(np.round(a * scale),
                         scale - 1).astype(f"<i{bits // 8}")
        tag = 1
    else:
        raise ValueError(f"unsupported bit depth {bits} (8/16/32)")
    frames = raw.tobytes()
    width = bits // 8
    fmt = struct.pack("<HHIIHH", tag, channels, rate,
                      rate * width * channels, width * channels, bits)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(frames)) + frames)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
