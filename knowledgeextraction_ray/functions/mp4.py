"""Pure-stdlib MP4 (ISO base media file format) MJPEG demuxer/muxer.

De-stubs the mp4 CONTAINER integration point in the multimodal stages
(``stages/multimodal.SampleFrames``): the container layer of MP4 — box
framing plus the ``stbl`` sample tables (``stsd stts stsc stsz stco``)
that map every sample to an absolute byte range — is public ISO/IEC
14496-12 structure and needs no codec library. With those ranges, frame
sampling is pointer arithmetic exactly like the Y4M path: sampling every
k-th frame of a long video touches O(selected) bytes, not O(all).

The DECODABLE payload this unlocks is Motion-JPEG (sample entry
``jpeg``/``mjpa``): each sample is a complete baseline JPEG image, which
``functions/jpeg.py`` (r5) decodes natively — so mp4(mjpeg) video flows
container → sample ranges → JPEG frames → pixels end-to-end with no
stub. Other codecs inside mp4 (h264/h265/av1) still raise
``NotImplementedError`` at decode time — the container demux is real for
them too (ranges extract fine), only the bitstream decode is the
ffmpeg integration point.

Scope (asserted loudly): unfragmented files (no ``moof``), one video
track, 32-bit ``stco`` or 64-bit ``co64`` chunk offsets, ``stsz`` with
per-sample or constant sizes. Fragmented/encrypted files raise
``ValueError`` naming the unsupported box.
"""

from __future__ import annotations

import struct

_FTYP_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"qt  ", b"M4V ")


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in data[start:end]."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack(">I4s", data[pos:pos + 8])
        body = pos + 8
        if size == 1:                               # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:                             # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r}")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _iter_boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def _full(data: bytes, body: int) -> int:
    """Skip a FullBox's version+flags; returns offset of the payload."""
    return body + 4


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes → video-track meta: ``width height n_samples codec
    sample_ranges`` where sample_ranges[i] = (abs_offset, size)."""
    if not is_mp4(data):
        raise ValueError("not an MP4 (no ftyp box)")
    for t, _b, _e in _iter_boxes(data, 0, len(data)):
        if t == b"moof":
            raise ValueError("fragmented MP4 (moof) not supported")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("missing moov box")
    for t, tb, te in _iter_boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[_full(data, hdlr[0]) + 4:
                                _full(data, hdlr[0]) + 8] != b"vide":
            continue
        minf = _find(data, *mdia, b"minf")
        stbl = minf and _find(data, *minf, b"stbl")
        if not stbl:
            raise ValueError("video trak missing minf/stbl")
        return _parse_stbl(data, *stbl)
    raise ValueError("no video track found")


def _parse_stbl(data: bytes, sb: int, se: int) -> dict:
    boxes = {t: (b, e) for t, b, e in _iter_boxes(data, sb, se)}
    for need in (b"stsd", b"stsz", b"stsc"):
        if need not in boxes:
            raise ValueError(f"stbl missing {need!r}")
    # stsd: first sample entry's format 4CC + visual width/height
    p = _full(data, boxes[b"stsd"][0])
    (n_entries,) = struct.unpack(">I", data[p:p + 4])
    if n_entries < 1:
        raise ValueError("empty stsd")
    entry = p + 4
    codec = data[entry + 4:entry + 8].decode("latin1")
    w, h = struct.unpack(">HH", data[entry + 32:entry + 36])
    # stsz: per-sample sizes (or constant)
    p = _full(data, boxes[b"stsz"][0])
    const_size, n_samples = struct.unpack(">II", data[p:p + 8])
    if const_size:
        sizes = [const_size] * n_samples
    else:
        sizes = list(struct.unpack(f">{n_samples}I",
                                   data[p + 8:p + 8 + 4 * n_samples]))
    # stco / co64: chunk offsets
    if b"stco" in boxes:
        p = _full(data, boxes[b"stco"][0])
        (n_chunks,) = struct.unpack(">I", data[p:p + 4])
        offsets = list(struct.unpack(f">{n_chunks}I",
                                     data[p + 4:p + 4 + 4 * n_chunks]))
    elif b"co64" in boxes:
        p = _full(data, boxes[b"co64"][0])
        (n_chunks,) = struct.unpack(">I", data[p:p + 4])
        offsets = list(struct.unpack(f">{n_chunks}Q",
                                     data[p + 4:p + 4 + 8 * n_chunks]))
    else:
        raise ValueError("stbl missing stco/co64")
    # stsc: sample-to-chunk runs → per-chunk sample counts
    p = _full(data, boxes[b"stsc"][0])
    (n_runs,) = struct.unpack(">I", data[p:p + 4])
    runs = [struct.unpack(">III", data[p + 4 + 12 * i:p + 16 + 12 * i])
            for i in range(n_runs)]
    ranges: list[tuple[int, int]] = []
    si = 0
    for ri, (first_chunk, per_chunk, _desc) in enumerate(runs):
        last_chunk = runs[ri + 1][0] - 1 if ri + 1 < n_runs else len(offsets)
        for ci in range(first_chunk - 1, last_chunk):
            off = offsets[ci]
            for _ in range(per_chunk):
                if si >= n_samples:
                    break
                ranges.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    if si != n_samples:
        raise ValueError(f"sample tables inconsistent: placed {si} of "
                         f"{n_samples} samples")
    return {"width": int(w), "height": int(h), "codec": codec,
            "n_samples": int(n_samples), "sample_ranges": ranges}


def extract_sample(data: bytes, meta: dict, i: int) -> bytes:
    off, size = meta["sample_ranges"][i]
    if off + size > len(data):
        raise ValueError(f"sample {i} range runs past end of file")
    return data[off:off + size]


def sample_jpeg_payloads(data: bytes, every_k: int):
    """Every k-th sample of an MJPEG mp4 as (frame_index, jpeg_bytes) —
    pointer arithmetic over the sample table, only selected samples are
    copied. Non-JPEG codecs raise NotImplementedError naming the codec
    (the container ranges ARE valid; the bitstream needs ffmpeg)."""
    meta = parse_mp4(data)
    if meta["codec"] not in ("jpeg", "mjpa"):
        raise NotImplementedError(
            f"mp4 codec {meta['codec']!r} not decodable in this "
            "environment (container demux works; integrate ffmpeg for "
            "the bitstream)")
    from .jpeg import is_jpeg
    for fi in range(0, meta["n_samples"], every_k):
        payload = extract_sample(data, meta, fi)
        if not is_jpeg(payload):
            raise ValueError(f"MJPEG sample {fi} is not a JPEG stream")
        yield fi, payload


# ---------------------------------------------------------------------------
# muxer (fixtures + the synthetic media gate)
# ---------------------------------------------------------------------------

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", len(body) + 8, btype) + body


def _fullbox(btype: bytes, body: bytes, version: int = 0,
             flags: int = 0) -> bytes:
    return _box(btype, struct.pack(">B3s", version,
                                   flags.to_bytes(3, "big")) + body)


def encode_mp4_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                     fps: int = 25) -> bytes:
    """JPEG sample list → unfragmented MP4 with one MJPEG video track
    (``jpeg`` sample entry), mdat-before-moov layout."""
    n = len(jpeg_frames)
    if n == 0:
        raise ValueError("need at least one frame")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_payload = b"".join(jpeg_frames)
    mdat = _box(b"mdat", mdat_payload)
    first_off = len(ftyp) + 8                      # into mdat payload
    duration = n                                    # 1 tick per frame
    mvhd = _fullbox(b"mvhd", struct.pack(
        ">IIII", 0, 0, fps, duration) + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _fullbox(b"tkhd", struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16), flags=7)
    mdhd = _fullbox(b"mdhd", struct.pack(">IIIIHH", 0, 0, fps, duration,
                                         0x55C4, 0))
    hdlr = _fullbox(b"hdlr", struct.pack(">I4s", 0, b"vide") + b"\x00" * 12
                    + b"MJPEGHandler\x00")
    vmhd = _fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _fullbox(b"dref", struct.pack(">I", 1)
                    + _fullbox(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    entry = (b"\x00" * 6 + struct.pack(">H", 1)           # data_ref_index
             + struct.pack(">HH", 0, 0) + b"\x00" * 12
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1)
             + b"\x05mjpeg" + b"\x00" * 26                # compressorname
             + struct.pack(">Hh", 24, -1))
    stsd = _fullbox(b"stsd", struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _fullbox(b"stts", struct.pack(">III", 1, n, 1))
    stsc = _fullbox(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fullbox(b"stsz", struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", len(f))
                               for f in jpeg_frames))
    stco = _fullbox(b"stco", struct.pack(">II", 1, first_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
