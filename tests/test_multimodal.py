"""Multimodal plumbing tests: schema, actor signature, fan-out, stub gate."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from knowledgeextraction_ray.stages.multimodal import (DecodeImage,
                                                       decode_images,
                                                       make_fake_media,
                                                       sample_frames)


def test_decode_stub_raises_without_fake():
    dec = DecodeImage(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode_one(b"xx", 4, 4)


def _gradient():
    y, x = np.mgrid[0:24, 0:32]
    return np.stack([(x * 8) % 256, (y * 10) % 256,
                     (x * 3 + y * 5) % 256], axis=2).astype(np.uint8)


def test_png_codec_roundtrip_and_filters():
    """Pure-stdlib PNG codec (r4): encode→decode byte-exact for every
    supported channel count, and all five spec filter types decode
    correctly from an INDEPENDENTLY crafted stream (filters computed from
    the spec's math here, not via encode_png)."""
    import struct
    import zlib

    from knowledgeextraction_ray.functions.png import (_SIG, _chunk,
                                                       decode_png,
                                                       encode_png)
    rs = np.random.RandomState(5)
    for c in (1, 2, 3, 4):
        a = rs.randint(0, 256, (13, 17, c), np.uint8)
        assert np.array_equal(decode_png(encode_png(a)), a)

    h, w, c = 5, 7, 3
    a = rs.randint(0, 256, (h, w, c), np.uint8)
    stride = w * c
    flat = a.reshape(h, stride).astype(int)
    raw = bytearray()
    prev = np.zeros(stride, int)
    z = np.zeros(c, int)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        left = np.concatenate([z, cur[:-c]])
        ul = np.concatenate([z, prev[:-c]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - left
        elif ft == 2:
            enc = cur - prev
        elif ft == 3:
            enc = cur - (left + prev) // 2
        else:
            p = left + prev - ul
            pred = np.where((abs(p - left) <= abs(p - prev)) &
                            (abs(p - left) <= abs(p - ul)), left,
                            np.where(abs(p - prev) <= abs(p - ul),
                                     prev, ul))
            enc = cur - pred
        raw.append(ft)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (_SIG + _chunk(b"IHDR", ihdr) +
           _chunk(b"IDAT", zlib.compress(bytes(raw))) +
           _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(png), a)


def test_png_codec_rejects_corruption():
    import pytest as _pytest

    from knowledgeextraction_ray.functions.png import decode_png, encode_png
    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    good = bytearray(encode_png(_gradient()))
    good[40] ^= 0xFF                    # flip a byte inside IDAT
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))


def test_decode_image_real_png_fixture():
    """The committed PNG fixture decodes byte-exact to its generating
    formula, and DecodeImage(fake=False) runs REAL decode on it — the
    de-stubbed path (payload → pixels → features) with no fake anywhere."""
    import os

    from knowledgeextraction_ray.functions.png import decode_png
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "knowledgeextraction_ray", "fixtures",
        "gradient_24x32.png")
    payload = open(p, "rb").read()
    img = decode_png(payload)
    assert np.array_equal(img, _gradient())

    import pyarrow as pa
    batch = pa.table({
        "media_id": ["png-0"], "kind": ["image"], "payload": [payload],
        "meta_width": pa.array([32], pa.int32()),
        "meta_height": pa.array([24], pa.int32()),
        "meta_sample_rate": pa.array([0], pa.int32()),
        "meta_n_frames": pa.array([0], pa.int32()),
    })
    out = DecodeImage(fake=False)(batch)
    assert out["pixel_mean"][0].as_py() == float(_gradient().mean())
    assert len(out["thumbnail"][0].as_py()) == 64


def test_decode_images_pipeline_fake():
    media = make_fake_media(20, "image")
    ds = rd.from_arrow(media)
    out = decode_images(ds, fake=True).to_pandas()
    assert len(out) == 20
    assert set(out.columns) == {"media_id", "pixel_mean", "thumbnail"}
    assert all(len(t) == 64 for t in out["thumbnail"])
    # deterministic: same payload → same decode
    out2 = decode_images(rd.from_arrow(media), fake=True).to_pandas()
    a = out.sort_values("media_id")["pixel_mean"].values
    b = out2.sort_values("media_id")["pixel_mean"].values
    assert np.array_equal(a, b)


def test_sample_frames_fanout():
    media = make_fake_media(5, "video")
    out = sample_frames(rd.from_arrow(media), every_k=4).to_pandas()
    n_frames = dict(zip(media["media_id"].to_pylist(),
                        media["meta_n_frames"].to_pylist()))
    counts = out.groupby("media_id").size().to_dict()
    for mid, n in n_frames.items():
        assert counts[mid] == len(range(0, n, 4))
    assert (out["frame_index"] % 4 == 0).all()


def test_audio_features_pipeline_fake():
    from knowledgeextraction_ray.stages.multimodal import AudioFeatures
    media = make_fake_media(10, "audio")
    ds = rd.from_arrow(media)
    out = ds.map_batches(AudioFeatures, fn_constructor_kwargs={"fake": True},
                         batch_format="pyarrow", batch_size=4,
                         concurrency=(1, 2)).to_pandas()
    assert len(out) == 10
    assert all(len(f) == 16 for f in out["frame_energy"])
    with pytest.raises(NotImplementedError):
        AudioFeatures(fake=False)._decode_one(b"x", 16000)


def _sine():
    t = np.arange(4000) / 8000.0
    return 0.5 * np.sin(2 * np.pi * 440.0 * t)


def test_wav_codec_roundtrip_and_stdlib_parity():
    """encode_wav/decode_wav round-trip within quantization error at every
    supported depth/channel shape, and the encoded bytes parse identically
    through the INDEPENDENT stdlib ``wave`` reader (container parity)."""
    import io
    import struct
    import wave as stdlib_wave

    from knowledgeextraction_ray.functions.wav import (decode_wav,
                                                       encode_wav, is_wav)
    rs = np.random.RandomState(7)
    # half a quantization step; 32-bit adds float32 mantissa error
    for bits, tol in [(8, 0.5 / 128), (16, 0.5 / 32768), (32, 1e-7)]:
        for channels in (1, 2):
            a = rs.uniform(-0.95, 0.95, size=(200, channels))
            payload = encode_wav(a, 16000, bits=bits)
            assert is_wav(payload)
            out, rate = decode_wav(payload)
            assert rate == 16000 and out.shape == (200, channels)
            assert np.abs(out - a).max() <= tol * 1.01
            w = stdlib_wave.open(io.BytesIO(payload))
            assert (w.getnchannels(), w.getframerate(),
                    w.getsampwidth() * 8, w.getnframes()) == (
                        channels, 16000, bits, 200)
            raw = w.readframes(200)
            assert raw == payload[-len(raw):]

    # IEEE float32 (format tag 3) decodes exactly — build the container
    # by hand since encode_wav writes integer PCM only
    f = rs.standard_normal((50, 1)).astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    frames = f.tobytes()
    payload = (b"RIFF"
               + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(frames))
               + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(frames)) + frames)
    out, rate = decode_wav(payload)
    assert rate == 8000 and np.array_equal(out, f.astype(np.float32))


def test_wav_codec_skips_unknown_chunks_and_rejects_garbage():
    import struct

    from knowledgeextraction_ray.functions.wav import decode_wav, encode_wav
    good = encode_wav(_sine(), 8000, bits=16)
    # splice an odd-length LIST chunk (with its RIFF pad byte) before fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = (good[:12] + extra + good[12:])
    spliced = (spliced[:4]
               + struct.pack("<I", struct.unpack("<I", good[4:8])[0]
                             + len(extra)) + spliced[8:])
    a, rate = decode_wav(spliced)
    b, _ = decode_wav(good)
    assert np.array_equal(a, b) and rate == 8000

    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"not audio")
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:100])
    bad_bits = bytearray(good)
    bad_bits[34] = 24                       # 24-bit: unsupported, loud
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad_bits))


def test_audio_features_real_wav_fixture():
    """The committed WAV fixture decodes to its generating formula and
    AudioFeatures(fake=False) runs REAL decode on it — payload → samples →
    frame energies with no fake anywhere (stereo exercises the mixdown)."""
    import os

    import pyarrow as pa

    from knowledgeextraction_ray.functions.wav import decode_wav, encode_wav
    from knowledgeextraction_ray.stages.multimodal import AudioFeatures
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "knowledgeextraction_ray", "fixtures",
        "sine440_8k.wav")
    payload = open(p, "rb").read()
    samples, rate = decode_wav(payload)
    assert rate == 8000 and samples.shape == (4000, 1)
    assert np.abs(samples[:, 0] - _sine()).max() < 1 / 32000

    stereo = encode_wav(np.stack([_sine(), -_sine()], axis=1), 8000)
    batch = pa.table({
        "media_id": ["wav-0", "wav-1"], "kind": ["audio"] * 2,
        "payload": [payload, stereo],
        "meta_width": pa.array([0, 0], pa.int32()),
        "meta_height": pa.array([0, 0], pa.int32()),
        "meta_sample_rate": pa.array([8000, 8000], pa.int32()),
        "meta_n_frames": pa.array([0, 0], pa.int32()),
    })
    out = AudioFeatures(fake=False, n_frames=16)(batch)
    energies = out["frame_energy"][0].as_py()
    expect = [float(np.sqrt((f ** 2).mean()))
              for f in np.array_split(samples[:, 0], 16)]
    assert np.allclose(energies, expect)
    # stereo mixdown of (sig, -sig) is ~silence
    assert max(out["frame_energy"][1].as_py()) < 1e-4


def _video_frames(n=10, w=12, h=8, seed=5):
    rs = np.random.RandomState(seed)
    return [[rs.randint(0, 256, size=(h, w), dtype=np.uint8),
             rs.randint(0, 256, size=(h // 2, w // 2), dtype=np.uint8),
             rs.randint(0, 256, size=(h // 2, w // 2), dtype=np.uint8)]
            for _ in range(n)]


def test_y4m_codec_roundtrip_all_colorspaces():
    """encode/decode round-trip byte-exact for C420/C422/C444/mono, and the
    header survives re-parse (fps, dims, colorspace)."""
    from knowledgeextraction_ray.functions.y4m import (decode_y4m,
                                                       encode_y4m,
                                                       parse_header,
                                                       plane_shapes)
    rs = np.random.RandomState(9)
    for cs in (b"420", b"420jpeg", b"422", b"444", b"mono"):
        meta0 = {"width": 12, "height": 8, "colorspace": cs}
        shapes = plane_shapes(meta0)
        frames = [[rs.randint(0, 256, size=s, dtype=np.uint8)
                   for s in shapes] for _ in range(4)]
        data = encode_y4m(frames, 12, 8, colorspace=cs, fps=(30, 1))
        got, meta = decode_y4m(data)
        assert meta["width"] == 12 and meta["height"] == 8
        assert meta["colorspace"] == cs
        assert (meta["fps_num"], meta["fps_den"]) == (30, 1)
        assert len(got) == 4
        for fg, fw in zip(got, frames):
            for pg, pw in zip(fg, fw):
                assert np.array_equal(pg, pw)


def test_y4m_codec_rejects_corruption():
    from knowledgeextraction_ray.functions.y4m import decode_y4m, encode_y4m
    with pytest.raises(ValueError):
        decode_y4m(b"not a y4m")
    good = encode_y4m(_video_frames(2), 12, 8)
    with pytest.raises(ValueError):          # truncated last frame
        decode_y4m(good[:-5])
    with pytest.raises(ValueError):          # corrupt FRAME marker
        bad = bytearray(good)
        bad[good.index(b"FRAME")] = ord(b"X")
        decode_y4m(bytes(bad))
    with pytest.raises(ValueError):          # interlaced refused loudly
        decode_y4m(b"YUV4MPEG2 W4 H4 It C420\nFRAME\n" + b"\0" * 24)
    with pytest.raises(ValueError):          # odd dims under 420 sampling
        decode_y4m(b"YUV4MPEG2 W5 H4 C420\nFRAME\n" + b"\0" * 30)


def test_sample_frames_real_y4m_and_compose_with_decode():
    """Y4M videos sample REAL standalone frame payloads: every k-th frame,
    each a valid single-frame Y4M decoding to exactly the source planes;
    composed sample_frames → DecodeImage yields the true per-frame luma
    mean end-to-end decoded."""
    from knowledgeextraction_ray.functions.y4m import decode_y4m, encode_y4m
    from knowledgeextraction_ray.stages.multimodal import DecodeImage

    frames = _video_frames(n=10)
    payload = encode_y4m(frames, 12, 8)
    media = pa.Table.from_pydict({
        "media_id": pa.array(["vid-0"], pa.string()),
        "kind": pa.array(["video"], pa.string()),
        "payload": pa.array([payload], pa.binary()),
        "meta_width": pa.array([12], pa.int32()),
        "meta_height": pa.array([8], pa.int32()),
        "meta_sample_rate": pa.array([0], pa.int32()),
        "meta_n_frames": pa.array([10], pa.int32()),
    })
    out = sample_frames(rd.from_arrow(media), every_k=3).to_pandas()
    assert out["frame_index"].tolist() == [0, 3, 6, 9]
    for _, row in out.iterrows():
        got, meta = decode_y4m(row["payload"])
        assert len(got) == 1 and meta["colorspace"] == b"420"
        for pg, pw in zip(got[0], frames[row["frame_index"]]):
            assert np.array_equal(pg, pw)
    # composition: frame rows straight into the image decoder (luma path)
    fb = pa.Table.from_pydict({
        "media_id": pa.array([f"vid-0/f{i}" for i in out["frame_index"]],
                             pa.string()),
        "payload": pa.array(out["payload"].tolist(), pa.binary()),
        "meta_width": pa.array([12] * len(out), pa.int32()),
        "meta_height": pa.array([8] * len(out), pa.int32()),
    })
    dec = DecodeImage(fake=False)(fb)
    for i, fi in enumerate(out["frame_index"]):
        assert dec["pixel_mean"][i].as_py() == float(frames[fi][0].mean())


# --------------------------------------------------------------------------
# GIF codec (r4 late: second real image format, functions/gif.py)
# --------------------------------------------------------------------------

def test_gif_codec_roundtrip_and_interlace():
    """encode→decode identity for several shapes/palettes, plain and
    interlaced (the 4-pass row order must invert exactly), and 12-bit
    table growth (a 256-color image forces LZW width to climb)."""
    from knowledgeextraction_ray.functions.gif import decode_gif, encode_gif
    rs = np.random.RandomState(3)
    for shape in ((1, 1), (3, 2), (16, 16), (37, 23)):
        img = (rs.randint(0, 6, shape + (3,)) * 40).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif(img)), img)
        assert np.array_equal(
            decode_gif(encode_gif(img, interlace=True)), img)
    wide = rs.randint(0, 256, (64, 64, 1)).astype(np.uint8).repeat(3, axis=2)
    assert np.array_equal(decode_gif(encode_gif(wide)), wide)


def test_gif_lzw_matches_spec_walkthrough():
    """EXTERNAL pin: the public GIF89a spec walkthrough's worked example —
    a 10×10 image whose LZW byte stream was encoded by hand in the spec
    tutorial, NOT by this module's encoder — must decode to its documented
    index pattern, wrapped in a hand-assembled GIF container."""
    import struct

    from knowledgeextraction_ray.functions.gif import (_lzw_decode,
                                                       decode_gif)
    data = bytes([0x8C, 0x2D, 0x99, 0x87, 0x2A, 0x1C, 0xDC, 0x33, 0xA0,
                  0x02, 0x75, 0xEC, 0x95, 0xFA, 0xA8, 0xDE, 0x60, 0x8C,
                  0x04, 0x91, 0x4C, 0x01])
    idx = _lzw_decode(data, 2, 100).reshape(10, 10)
    want = np.array([[1] * 5 + [2] * 5] * 3 +
                    [[1] * 3 + [0] * 4 + [2] * 3] * 2 +
                    [[2] * 3 + [0] * 4 + [1] * 3] * 2 +
                    [[2] * 5 + [1] * 5] * 3)
    assert np.array_equal(idx, want)
    # container: 10x10 screen, 4-color GCT (white, red, blue, black)
    gct = bytes([255, 255, 255, 255, 0, 0, 0, 0, 255, 0, 0, 0])
    gif = (b"GIF89a" + struct.pack("<HHBBB", 10, 10, 0x81, 0, 0) + gct +
           struct.pack("<BHHHHB", 0x2C, 0, 0, 10, 10, 0) + bytes([2]) +
           bytes([len(data)]) + data + bytes([0, 0x3B]))
    img = decode_gif(gif)
    colors = np.array([[255, 255, 255], [255, 0, 0], [0, 0, 255]])
    assert np.array_equal(img, colors[want])


def test_gif_transparency_and_offset_composite():
    """A frame smaller than the logical screen with a GCE-transparent
    index composites onto the background color, offset honored."""
    import struct

    from knowledgeextraction_ray.functions.gif import _lzw_encode, decode_gif
    # 2x2 frame at (1,1) on a 4x3 screen; index 3 transparent, bg = 0
    frame = np.array([[1, 3], [3, 2]], np.uint8)
    gct = bytes([10, 10, 10, 255, 0, 0, 0, 255, 0, 0, 0, 0])
    lzw = _lzw_encode(frame.ravel(), 2)
    gif = (b"GIF89a" + struct.pack("<HHBBB", 4, 3, 0x81, 0, 0) + gct +
           bytes([0x21, 0xF9, 4, 0x01, 0, 0, 3, 0]) +      # GCE: transp=3
           struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0) + bytes([2]) +
           bytes([len(lzw)]) + lzw + bytes([0, 0x3B]))
    img = decode_gif(gif)
    bg = [10, 10, 10]
    assert np.array_equal(img[0], [bg, bg, bg, bg])           # above frame
    assert np.array_equal(img[1, 1], [255, 0, 0])             # index 1
    assert np.array_equal(img[1, 2], bg)                      # transparent
    assert np.array_equal(img[2, 1], bg)                      # transparent
    assert np.array_equal(img[2, 2], [0, 255, 0])             # index 2


def test_gif_codec_rejects_corruption():
    from knowledgeextraction_ray.functions.gif import decode_gif, encode_gif
    img = (np.arange(48).reshape(4, 4, 3) * 5).astype(np.uint8)
    good = encode_gif(img)
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError):
        decode_gif(good[:20])                    # truncated
    with pytest.raises(ValueError):
        decode_gif(good[:6] + good[6:].replace(b"\x2C", b"\x7C", 1))
    # image-less GIF (header straight to trailer)
    import struct
    empty = (b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x3B")
    with pytest.raises(ValueError):
        decode_gif(empty)


def test_decode_image_real_gif():
    """DecodeImage(fake=False) runs REAL GIF decode: payload → pixels →
    features with no fake anywhere, alongside the PNG path."""
    from knowledgeextraction_ray.functions.gif import encode_gif
    img = _gradient()[:, :, :3].copy()
    img = (img // 32) * 32                       # ≤ 256 distinct colors
    payload = encode_gif(img)
    batch = pa.table({
        "media_id": ["gif-0"], "kind": ["image"], "payload": [payload],
        "meta_width": pa.array([32], pa.int32()),
        "meta_height": pa.array([24], pa.int32()),
        "meta_sample_rate": pa.array([0], pa.int32()),
        "meta_n_frames": pa.array([0], pa.int32()),
    })
    out = DecodeImage(fake=False)(batch)
    assert out["pixel_mean"][0].as_py() == float(img.mean())
    assert len(out["thumbnail"][0].as_py()) == 64


def test_audio_features_flac_equals_wav():
    """The SAME waveform through the WAV and FLAC containers yields
    IDENTICAL frame energies from AudioFeatures(fake=False) — both
    codecs are lossless, so the production decode dispatch must agree
    bit-for-bit (r5: FLAC de-stub)."""
    import pyarrow as pa

    from knowledgeextraction_ray.functions.flac import encode_flac
    from knowledgeextraction_ray.functions.wav import encode_wav
    from knowledgeextraction_ray.stages.multimodal import AudioFeatures
    rs = np.random.RandomState(11)
    x = rs.randint(-32768, 32768, size=(4096, 2)).astype(np.int64)
    wav = encode_wav(x / 32768.0, 16000, bits=16)
    flac = encode_flac(x, 16000, bits=16, block_size=1024, mode="ms")
    batch = pa.table({
        "media_id": ["a", "b"], "kind": ["audio"] * 2,
        "payload": [wav, flac],
        "meta_width": pa.array([0, 0], pa.int32()),
        "meta_height": pa.array([0, 0], pa.int32()),
        "meta_sample_rate": pa.array([16000, 16000], pa.int32()),
        "meta_n_frames": pa.array([0, 0], pa.int32()),
    })
    out = AudioFeatures(fake=False, n_frames=16)(batch)
    assert out["frame_energy"][0].as_py() == out["frame_energy"][1].as_py()
