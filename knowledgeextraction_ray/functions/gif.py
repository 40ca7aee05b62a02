"""Pure-stdlib GIF codec (LZW from the public GIF89a specification).

Second REAL image format for the multimodal stages (after
``functions/png.py``): no codec libraries ship in this container, but GIF
is small enough to implement from the public spec — logical screen +
color tables, sub-block framing, variable-width LSB-first LZW, the
4-pass interlace order, and GCE transparency.

Scope (asserted loudly): decodes the FIRST image frame composited onto
the logical screen (background-filled, frame offset honored, transparent
pixels leave the background) and returns ``(H, W, 3)`` uint8 RGB.
Anything malformed raises ``ValueError`` naming the failure. The encoder
exists for tests: single frame, global color table, real LZW, optional
interlace.

Reference note: the reference repo has no media path at all — this module
serves the multimodal operator family the build brief adds on top
(image decode → feature-extract as actor-pool ``map_batches`` stages).
"""

from __future__ import annotations

import struct

import numpy as np

_SIGS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in _SIGS


def _read_color_table(data: bytes, pos: int, size: int):
    end = pos + 3 * size
    if end > len(data):
        raise ValueError("truncated color table")
    tab = np.frombuffer(data, np.uint8, 3 * size, pos).reshape(size, 3)
    return tab, end


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("truncated sub-block")
        out.extend(data[pos:pos + n])
        pos += n


def _lzw_decode(buf: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width LSB-first LZW (GIF89a spec appendix F)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    # dictionary as parent-pointer arrays: entry = (prefix code, tail byte)
    max_codes = 1 << 12
    prefix = np.zeros(max_codes, np.int32)
    tail = np.zeros(max_codes, np.uint8)
    out = np.empty(n_pixels, np.uint8)
    n_out = 0

    bitpos = 0
    nbits = len(buf) * 8

    def _reset():
        return end + 1, min_code_size + 1

    next_code, width = _reset()
    prev = -1
    stack = bytearray()
    while n_out < n_pixels:
        if bitpos + width > nbits:
            raise ValueError("LZW stream exhausted before image complete")
        byte0 = bitpos >> 3
        chunk = int.from_bytes(buf[byte0:byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            next_code, width = _reset()
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:                       # first code after clear
            if code >= clear:
                raise ValueError("LZW: first code not a literal")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code > next_code:   # end/clear were consumed above
            raise ValueError("LZW: code out of range")
        # expand `code` (or prev+prev[0] for the not-yet-defined code)
        stack.clear()
        c = code
        if code == next_code:              # KwKwK case
            c = prev
            first_missing = True
        else:
            first_missing = False
        while c >= clear:                  # walk parent chain
            stack.append(tail[c])
            c = int(prefix[c])
        stack.append(c)                    # the root literal
        first = c
        if first_missing:
            stack.insert(0, first)         # appended char = first of prev
        n = len(stack)
        if n_out + n > n_pixels:
            raise ValueError("LZW output exceeds image size")
        out[n_out:n_out + n] = np.frombuffer(bytes(stack), np.uint8)[::-1]
        n_out += n
        if next_code < max_codes:
            prefix[next_code] = prev
            tail[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out != n_pixels:
        raise ValueError(f"LZW produced {n_out} of {n_pixels} pixels")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    rows = np.empty(h, np.int64)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        rows[start:h:step] = np.arange(src, src + n)
        src += n
    return idx[rows]


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → first frame composited on the logical screen,
    ``(H, W, 3)`` uint8 RGB."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated header")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, 2 << (flags & 7))
    transparent = -1
    while True:
        if pos >= len(data):
            raise ValueError("no image descriptor before EOF")
        block = data[pos]
        pos += 1
        if block == 0x3B:                  # trailer
            raise ValueError("no image frame in GIF")
        if block == 0x21:                  # extension
            if pos >= len(data):
                raise ValueError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4 and body[0] & 1:
                transparent = body[3]      # GCE transparent index
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            table, pos = _read_color_table(data, pos, 2 << (iflags & 7))
        if table is None:
            raise ValueError("no color table for image frame")
        if pos >= len(data):
            raise ValueError("missing LZW min code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(lzw, mcs, w * h).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx, h)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("pixel index outside color table")
        if left + w > sw or top + h > sh:
            raise ValueError("frame exceeds logical screen")
        canvas = np.full((sh, sw, 3),
                         table[bg] if gct is not None and bg < len(gct)
                         else 0, dtype=np.uint8)
        frame = table[idx]                 # (h, w, 3)
        if transparent >= 0:
            keep = idx != transparent
            region = canvas[top:top + h, left:left + w]
            region[keep] = frame[keep]
            canvas[top:top + h, left:left + w] = region
        else:
            canvas[top:top + h, left:left + w] = frame
        return canvas


def _lzw_encode(indexes: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    emit(clear)
    cur = b""
    for px in indexes.tobytes():
        nxt = cur + bytes([px])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code < (1 << 12):
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:                               # table full: reset (spec-legal)
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        cur = bytes([px])
    if cur:
        emit(table[cur])
    emit(end)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """``(H, W, 3)`` uint8 → single-frame GIF89a (global color table built
    from the image's distinct colors — must be ≤ 256)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("need (H, W, 3) uint8")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} distinct colors (max 256)")
    depth = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    size = 1 << depth
    table = np.zeros((size, 3), np.uint8)
    table[:len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate([np.arange(s, h, t)
                                for s, t in _INTERLACE_PASSES])
        idx = idx[order]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    mcs = max(2, depth)
    out.append(mcs)
    lzw = _lzw_encode(idx.ravel(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)                           # sub-block terminator
    out.append(0x3B)                        # trailer
    return bytes(out)
