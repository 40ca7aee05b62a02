"""Pure-stdlib Y4M (YUV4MPEG2) video codec.

De-stubs the real video format in the multimodal stages
(``stages/multimodal.SampleFrames``): no video libraries ship in this
container, but YUV4MPEG2 is a plain-text header plus concatenated raw
planar frames (public spec: the mjpegtools ``yuv4mpeg(5)`` man page; the
uncompressed interchange format ffmpeg/x264 consume), so it decodes with
byte arithmetic alone.

Scope (asserted loudly): progressive planar colorspaces C420 (and its
siting variants C420jpeg/C420mpeg2/C420paldv — identical plane sizes),
C422, C444 and Cmono, 8-bit. Per-frame parameter strings are tolerated and
skipped. Anything else raises ``ValueError`` naming the unsupported field.

Scale note: ``frame_offsets``/``sample_frames_payloads`` locate frames by
pointer arithmetic over the fixed plane size (one tiny ``FRAME`` line scan
per frame, no pixel decode), so sampling every k-th frame of a long video
touches O(selected) pixel bytes, not O(all).
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2 "

# colorspace tag -> (x subsample shift, y subsample shift) of the U/V planes
_CHROMA_SHIFTS = {
    b"420": (1, 1), b"420jpeg": (1, 1), b"420mpeg2": (1, 1),
    b"420paldv": (1, 1), b"422": (1, 0), b"444": (0, 0),
}


def is_y4m(data: bytes) -> bool:
    return data[:len(_MAGIC)] == _MAGIC


def parse_header(data: bytes) -> tuple[dict, int]:
    """Y4M bytes → (meta dict, offset just past the header newline).

    meta: ``width height fps_num fps_den colorspace`` plus the raw
    ``header`` bytes (reused verbatim when re-emitting single-frame
    payloads, so siting/aspect/X params survive sampling)."""
    if not is_y4m(data):
        raise ValueError("not a Y4M stream (bad YUV4MPEG2 signature)")
    end = data.find(b"\n")
    if end < 0:
        raise ValueError("unterminated Y4M stream header")
    meta = {"width": None, "height": None, "fps_num": 25, "fps_den": 1,
            "colorspace": b"420", "header": data[:end + 1]}
    for tok in data[len(_MAGIC):end].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            meta["width"] = int(val)
        elif tag == b"H":
            meta["height"] = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            meta["fps_num"], meta["fps_den"] = int(num), int(den)
        elif tag == b"C":
            meta["colorspace"] = val
        elif tag == b"I":
            if val not in (b"p", b"?"):
                raise ValueError(f"unsupported interlacing {val!r} "
                                 "(progressive only)")
        # A (aspect) and X (extensions) tolerated via the raw header
    if not meta["width"] or not meta["height"]:
        raise ValueError("Y4M header missing W or H")
    cs = meta["colorspace"]
    if cs != b"mono" and cs not in _CHROMA_SHIFTS:
        raise ValueError(f"unsupported colorspace C{cs.decode()!r}")
    return meta, end + 1


def plane_shapes(meta: dict) -> list[tuple[int, int]]:
    """[(h, w)] of the Y (and U, V unless mono) planes."""
    w, h, cs = meta["width"], meta["height"], meta["colorspace"]
    if cs == b"mono":
        return [(h, w)]
    sx, sy = _CHROMA_SHIFTS[cs]
    if (sx and w % 2) or (sy and h % 2):
        raise ValueError(f"odd dimensions {w}x{h} invalid for C{cs.decode()}")
    return [(h, w), (h >> sy, w >> sx), (h >> sy, w >> sx)]


def frame_data_size(meta: dict) -> int:
    return sum(h * w for h, w in plane_shapes(meta))


def frame_offsets(data: bytes, meta: dict, hdr_end: int) -> list[tuple[int, int]]:
    """[(pixel_data_start, frame_line_start)] per frame — FRAME-line scan +
    fixed-size stride, no pixel reads."""
    size = frame_data_size(meta)
    out = []
    pos = hdr_end
    while pos < len(data):
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        nl = data.find(b"\n", pos)
        if nl < 0 or nl + 1 + size > len(data):
            raise ValueError("truncated Y4M frame")
        out.append((nl + 1, pos))
        pos = nl + 1 + size
    return out


def decode_y4m(data: bytes):
    """Y4M bytes → (planes, meta): ``planes`` is a list per frame of
    [Y] or [Y, U, V] uint8 arrays shaped per :func:`plane_shapes`."""
    meta, hdr_end = parse_header(data)
    shapes = plane_shapes(meta)
    frames = []
    for start, _ in frame_offsets(data, meta, hdr_end):
        planes, pos = [], start
        for h, w in shapes:
            planes.append(np.frombuffer(data[pos:pos + h * w],
                                        dtype=np.uint8).reshape(h, w))
            pos += h * w
        frames.append(planes)
    return frames, meta


def sample_frame_payloads(data: bytes, every_k: int):
    """Every k-th frame re-emitted as a STANDALONE single-frame Y4M payload
    (original stream header + that frame's bytes) → [(frame_index,
    payload, (byte_lo, byte_hi))]. Selected frames are the only bytes
    copied; the range locates the frame (FRAME line through pixel end) in
    the SOURCE stream."""
    meta, hdr_end = parse_header(data)
    offs = frame_offsets(data, meta, hdr_end)
    size = frame_data_size(meta)
    out = []
    for fi in range(0, len(offs), every_k):
        start, line = offs[fi]
        out.append((fi, meta["header"] + data[line:start + size],
                    (line, start + size)))
    return out


def encode_y4m(frames, width: int, height: int, colorspace: bytes = b"420",
               fps: tuple[int, int] = (25, 1)) -> bytes:
    """[[Y] or [Y, U, V] uint8 planes per frame] → Y4M bytes (the test /
    synthetic-corpus encoder; inverse of :func:`decode_y4m`)."""
    meta = {"width": width, "height": height, "colorspace": colorspace}
    shapes = plane_shapes(meta)
    head = (b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C%s\n"
            % (width, height, fps[0], fps[1], colorspace))
    parts = [head]
    for planes in frames:
        if len(planes) != len(shapes):
            raise ValueError(f"expected {len(shapes)} planes per frame")
        parts.append(b"FRAME\n")
        for arr, (h, w) in zip(planes, shapes):
            a = np.ascontiguousarray(arr, dtype=np.uint8)
            if a.shape != (h, w):
                raise ValueError(f"plane shape {a.shape} != {(h, w)}")
            parts.append(a.tobytes())
    return b"".join(parts)
