"""MP4 (ISO-BMFF) MJPEG demux/mux tests (r5, ``functions/mp4.py``).

The multi-chunk sample table is assembled BY HAND from the ISO/IEC
14496-12 box layout (not via this module's muxer), so the stsc
run-expansion and stco chunk walk are pinned against spec-derived bytes
rather than round-tripping a shared bug.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from knowledgeextraction_ray.functions.jpeg import decode_jpeg, encode_jpeg
from knowledgeextraction_ray.functions.mp4 import (encode_mp4_mjpeg,
                                                   extract_sample, is_mp4,
                                                   parse_mp4,
                                                   sample_jpeg_payloads)

_ONES = (np.ones(64, np.int64), np.ones(64, np.int64))


def _jpeg_frames(n=8, k=23):
    bx = np.arange(16) // 8
    by = np.arange(12) // 8
    return [encode_jpeg(((37 * bx[None, :] + 41 * by[:, None] + k * f)
                         % 256).astype(np.uint8),
                        qtables=_ONES, subsample=False) for f in range(n)]


def test_mux_demux_roundtrip():
    frames = _jpeg_frames()
    data = encode_mp4_mjpeg(frames, 16, 12)
    assert is_mp4(data)
    meta = parse_mp4(data)
    assert (meta["codec"], meta["n_samples"]) == ("jpeg", 8)
    assert (meta["width"], meta["height"]) == (16, 12)
    for i, f in enumerate(frames):
        assert extract_sample(data, meta, i) == f
    got = list(sample_jpeg_payloads(data, 3))
    assert [fi for fi, _ in got] == [0, 3, 6]
    for fi, jpg in got:
        img = decode_jpeg(jpg)
        assert img.shape == (12, 16, 1)


def _box(btype, body):
    return struct.pack(">I4s", len(body) + 8, btype) + body


def _full(btype, body, flags=0):
    return _box(btype, struct.pack(">B3s", 0, flags.to_bytes(3, "big"))
                + body)


def test_hand_built_multichunk_sample_table():
    """5 samples over 3 chunks with a 2-run stsc (chunks 1-2 hold 2
    samples each, chunk 3 holds 1), co64 offsets, constant stsz — every
    table variant the parser must walk, assembled by hand."""
    samples = [bytes([0xFF, 0xD8, 0xFF] + [i] * 5) for i in range(5)]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat = _box(b"mdat", b"".join(samples))
    base = len(ftyp) + 8
    sz = len(samples[0])
    chunk_offsets = [base, base + 2 * sz, base + 4 * sz]
    stsd_entry = (b"\x00" * 6 + struct.pack(">H", 1)
                  + struct.pack(">HH", 0, 0) + b"\x00" * 12
                  + struct.pack(">HH", 4, 2)
                  + struct.pack(">II", 0x480000, 0x480000)
                  + struct.pack(">I", 0) + struct.pack(">H", 1)
                  + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(b"jpeg", stsd_entry))
    stts = _full(b"stts", struct.pack(">III", 1, 5, 1))
    stsc = _full(b"stsc", struct.pack(">I", 2)
                 + struct.pack(">III", 1, 2, 1)      # chunks 1-2: 2 samples
                 + struct.pack(">III", 3, 1, 1))     # chunk 3: 1 sample
    stsz = _full(b"stsz", struct.pack(">II", sz, 5))  # constant size
    co64 = _full(b"co64", struct.pack(">I", 3)
                 + b"".join(struct.pack(">Q", o) for o in chunk_offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + co64)
    minf = _box(b"minf", _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0),
                               flags=1) + stbl)
    hdlr = _full(b"hdlr", struct.pack(">I4s", 0, b"vide") + b"\x00" * 12
                 + b"h\x00")
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 25, 5, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", _full(b"tkhd", struct.pack(
        ">IIIII", 0, 0, 1, 0, 5) + b"\x00" * 60, flags=7) + mdia)
    moov = _box(b"moov", trak)
    data = ftyp + mdat + moov
    meta = parse_mp4(data)
    assert meta["n_samples"] == 5 and (meta["width"], meta["height"]) == (4, 2)
    for i, s in enumerate(samples):
        assert extract_sample(data, meta, i) == s


def test_rejects_unsupported_and_corrupt():
    data = encode_mp4_mjpeg(_jpeg_frames(2), 16, 12)
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"not an mp4 file at all")
    with pytest.raises(ValueError, match="moof"):
        parse_mp4(data + _box(b"moof", b""))
    with pytest.raises(ValueError):
        parse_mp4(data[:len(data) // 2])            # truncated moov


def test_non_jpeg_codec_demuxes_but_refuses_decode():
    """An avc1 (h264) track: the container demux must return REAL sample
    ranges while sample_jpeg_payloads refuses loudly by codec name."""
    data = bytearray(encode_mp4_mjpeg(_jpeg_frames(4), 16, 12))
    idx = bytes(data).find(b"jpeg", len(data) // 2)  # stsd sample entry 4CC
    data[idx:idx + 4] = b"avc1"
    meta = parse_mp4(bytes(data))
    assert meta["codec"] == "avc1" and meta["n_samples"] == 4
    with pytest.raises(NotImplementedError, match="avc1"):
        list(sample_jpeg_payloads(bytes(data), 2))


def test_sample_frames_mp4_and_fallback_no_amplification():
    """SampleFrames: MP4/MJPEG rows sample REAL JPEG frame payloads with
    exact byte ranges; unknown containers emit EMPTY payloads + the
    source range (the r4 k-fold payload-amplification fix); non-JPEG mp4
    emits empty payloads with REAL per-sample ranges."""
    import ray.data as rd

    from knowledgeextraction_ray.stages.multimodal import (DecodeImage,
                                                           sample_frames)
    frames = _jpeg_frames()
    mp4 = encode_mp4_mjpeg(frames, 16, 12)
    opaque = b"WEBM" + bytes(range(200))
    avc = bytearray(mp4)
    idx = bytes(avc).find(b"jpeg", len(avc) // 2)
    avc[idx:idx + 4] = b"avc1"
    media = pa.table({
        "media_id": ["m-mp4", "m-opaque", "m-avc"],
        "kind": ["video"] * 3,
        "payload": [mp4, opaque, bytes(avc)],
        "meta_width": pa.array([16] * 3, pa.int32()),
        "meta_height": pa.array([12] * 3, pa.int32()),
        "meta_sample_rate": pa.array([0] * 3, pa.int32()),
        "meta_n_frames": pa.array([8] * 3, pa.int32()),
    })
    out = sample_frames(rd.from_arrow(media), every_k=3).to_pandas()
    mj = out[out["media_id"] == "m-mp4"].sort_values("frame_index")
    assert mj["frame_index"].tolist() == [0, 3, 6]
    ranges = parse_mp4(mp4)["sample_ranges"]
    for _, row in mj.iterrows():
        lo, size = ranges[row["frame_index"]]
        assert (row["byte_lo"], row["byte_hi"]) == (lo, lo + size)
        assert bytes(row["payload"]) == frames[row["frame_index"]]
    # composed decode: frame rows straight into DecodeImage, exact pixels
    dec = DecodeImage(fake=False)(pa.table({
        "media_id": [f"f{i}" for i in mj["frame_index"]],
        "payload": [bytes(p) for p in mj["payload"]],
        "meta_width": pa.array([16] * 3, pa.int32()),
        "meta_height": pa.array([12] * 3, pa.int32()),
    }))
    bx, by = np.arange(16) // 8, np.arange(12) // 8
    for i, fi in enumerate(mj["frame_index"]):
        want = ((37 * bx[None, :] + 41 * by[:, None] + 23 * fi) % 256)
        assert dec["pixel_mean"][i].as_py() == float(want.mean())
    # unknown container: no payload copies, whole-source range carried
    op = out[out["media_id"] == "m-opaque"]
    assert len(op) == 3 and all(len(p) == 0 for p in op["payload"])
    assert set(zip(op["byte_lo"], op["byte_hi"])) == {(0, len(opaque))}
    # decodable-container/undecodable-bitstream: real ranges, empty bytes
    av = out[out["media_id"] == "m-avc"].sort_values("frame_index")
    av_ranges = parse_mp4(bytes(avc))["sample_ranges"]
    assert all(len(p) == 0 for p in av["payload"])
    for _, row in av.iterrows():
        lo, size = av_ranges[row["frame_index"]]
        assert (row["byte_lo"], row["byte_hi"]) == (lo, lo + size)
