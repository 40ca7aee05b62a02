"""Pure-stdlib PNG codec (zlib inflate/deflate + PNG filter types 0-4).

De-stubs one real image format in the multimodal stages
(``stages/multimodal.DecodeImage``): no codec libraries ship in this
container, but PNG's compression IS stdlib zlib, and the rest of the format
(chunk framing, CRC-32, scanline filters None/Sub/Up/Average/Paeth) is
small enough to implement from the public spec (RFC 2083 / W3C PNG).

Scope (asserted loudly): 8-bit depth, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), no interlacing, no palette. That covers the
common ML-pipeline case; anything else raises ``ValueError`` naming the
unsupported field.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → ``(H, W, C)`` uint8 array (C per color type)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        length, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk body")
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if ctype_n not in _CHANNELS:
        raise ValueError(f"unsupported color type {ctype_n}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    c = _CHANNELS[ctype_n]
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride,
                             y * (stride + 1) + 1).copy()
        if ftype == 0:                                  # None
            cur = line
        elif ftype == 1:                                # Sub
            cur = line
            for x in range(c, stride):
                cur[x] = (int(cur[x]) + int(cur[x - c])) & 0xFF
        elif ftype == 2:                                # Up
            cur = (line.astype(np.uint16) + prev) .astype(np.uint8)
        elif ftype == 3:                                # Average
            cur = line
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                cur[x] = (int(line[x]) + (a + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:                                # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa_ <= pb and pa_ <= pc else \
                    (b if pb <= pc else cc)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype} on row {y}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w, c)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body +
            struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, level: int = 9) -> bytes:
    """``(H, W)`` or ``(H, W, C)`` uint8 array → PNG bytes (filter None)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype_n = {1: 0, 3: 2, 2: 4, 4: 6}.get(c)
    if ctype_n is None:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_n, 0, 0, 0)
    flat = a.reshape(h, w * c)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr) +
            _chunk(b"IDAT", zlib.compress(raw, level)) +
            _chunk(b"IEND", b""))
