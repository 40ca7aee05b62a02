"""Baseline JPEG codec tests (r5, ``functions/jpeg.py``).

The external pins matter: encoder and decoder could share a compensating
bug (wrong zigzag both sides still round-trips), so the zigzag order, the
IDCT, and one full entropy-coded stream are each checked against values
derived from the T.81 spec BY HAND here, not via the module's encoder.
"""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from knowledgeextraction_ray.functions.jpeg import (_AC_LUMA, _DC_LUMA,
                                                    ZIGZAG, decode_jpeg,
                                                    encode_jpeg, is_jpeg)

# T.81 Figure A.6 zigzag sequence, hardcoded from the spec (external pin
# for the generated table)
_SPEC_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _gradient():
    y, x = np.mgrid[0:24, 0:32]
    return np.stack([(x * 8) % 256, (y * 10) % 256,
                     (x * 3 + y * 5) % 256], axis=2).astype(np.uint8)


_ONES = (np.ones(64, np.int64), np.ones(64, np.int64))


def test_zigzag_matches_spec_table():
    assert ZIGZAG.tolist() == _SPEC_ZIGZAG


def test_idct_matches_textbook_reference():
    """The decoder's vectorized einsum IDCT vs the T.81 A.3.3 double-loop
    cosine sum, on random coefficient blocks — independent math path."""
    from knowledgeextraction_ray.functions.jpeg import _A
    rs = np.random.RandomState(11)
    F = rs.randint(-200, 200, (3, 8, 8)).astype(np.float64)
    fast = np.einsum("ux,nuv,vy->nxy", _A, F, _A)
    slow = np.zeros_like(fast)
    c = np.where(np.arange(8) == 0, 1 / np.sqrt(2), 1.0)
    for n in range(3):
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        s += (c[u] * c[v] * F[n, u, v]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                slow[n, x, y] = s / 4.0
    assert np.abs(fast - slow).max() < 1e-9


def test_hand_assembled_stream_decodes():
    """EXTERNAL pin of huffman code construction + entropy decode + DC
    IDCT: a single 8×8 constant-130 gray block, entropy bits computed BY
    HAND from the Annex-K tables (DC cat5 = '110', 16 = '10000', EOB =
    '1010', 1-padded → 0xD0 0xAF), wrapped in a hand-built container."""
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = (b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
           + struct.pack(">HHB", 8, 8, 1) + bytes([1, 0x11, 0]))
    dht_dc = (b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 12)
              + b"\x00" + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1]))
    dht_ac = (b"\xff\xc4"
              + struct.pack(">H", 2 + 1 + 16 + len(_AC_LUMA[1]))
              + b"\x10" + bytes(_AC_LUMA[0]) + bytes(_AC_LUMA[1]))
    sos = (b"\xff\xda" + struct.pack(">H", 8)
           + bytes([1, 1, 0x00, 0, 63, 0]))
    jpg = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
           + bytes([0xD0, 0xAF]) + b"\xff\xd9")
    img = decode_jpeg(jpg)
    assert img.shape == (8, 8, 1)
    assert (img == 130).all()


def test_block_constant_gray_exact_roundtrip():
    """Constant 8×8 blocks have only an integer DC coefficient, so unit
    quant tables make baseline JPEG exactly lossless — the property the
    media_decode_stats JPEG arm's closed form relies on."""
    bx = np.arange(16) // 8
    by = np.arange(12) // 8
    for k in (0, 5, 78):
        img = ((37 * bx[None, :] + 41 * by[:, None] + 19 * k)
               % 256).astype(np.uint8)
        data = encode_jpeg(img, qtables=_ONES, subsample=False)
        assert is_jpeg(data)
        dec = decode_jpeg(data)
        assert dec.shape == (12, 16, 1)
        assert np.array_equal(dec[:, :, 0], img)


def test_gray_and_rgb_roundtrip_bounds():
    rs = np.random.RandomState(0)
    g = _gradient()[:, :, 0]
    d = decode_jpeg(encode_jpeg(g, quality=90))
    assert np.abs(d[:, :, 0].astype(int) - g.astype(int)).max() <= 2

    rgb = rs.randint(0, 256, (17, 23, 3), np.uint8)   # non-multiple-of-8
    d3 = decode_jpeg(encode_jpeg(rgb, qtables=_ONES, subsample=False))
    assert d3.shape == rgb.shape
    # unit tables: only YCbCr round-trip rounding remains
    assert np.abs(d3.astype(int) - rgb.astype(int)).max() <= 3

    smooth = _gradient()
    d4 = decode_jpeg(encode_jpeg(smooth, quality=95, subsample=True))
    assert d4.shape == smooth.shape
    # 4:2:0 loses half the chroma resolution; the gradient's ~4/px chroma
    # slope × (2×2 box mean + replicate upsample) bounds the error at
    # ~2×slope: measured max 9, mean ~2
    assert np.abs(d4.astype(int) - smooth.astype(int)).max() <= 10


def test_restart_interval_parity():
    g = _gradient()[:, :, 1]
    a = decode_jpeg(encode_jpeg(g, quality=80, restart_interval=2))
    b = decode_jpeg(encode_jpeg(g, quality=80))
    assert np.array_equal(a, b)


def test_rejects_unsupported_and_corrupt():
    good = encode_jpeg(_gradient(), quality=85)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # flip SOF0 to SOF2 (progressive): refused loudly by marker name
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_jpeg(good[:60])                       # truncated segment
    with pytest.raises(ValueError):
        decode_jpeg(good[:-40])                      # truncated entropy


def test_committed_fixture_pinned():
    """The committed real-JPEG fixture (quality 85, 4:2:0, DRI=2) decodes
    to pinned integer stats and stays within JPEG loss of its generating
    formula — decoder regression pin independent of the encoder."""
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "knowledgeextraction_ray", "fixtures",
        "gradient_24x32.jpg")
    payload = open(p, "rb").read()
    assert is_jpeg(payload)
    dec = decode_jpeg(payload)
    assert dec.shape == (24, 32, 3)
    assert int(dec.astype(np.int64).sum()) == 263271
    assert dec[0, 0].tolist() == [0, 1, 0]
    assert dec[23, 31].tolist() == [249, 229, 208]
    assert np.abs(dec.astype(int) - _gradient().astype(int)).max() <= 9


def test_decode_image_real_jpeg_and_media_gate_arm():
    """DecodeImage(fake=False) routes JPEG through the real decoder, and
    the media_decode_stats JPEG arm equals its closed form in numpy (the
    DuckDB restatement is hash-gated in the oracle-parity suite)."""
    from knowledgeextraction_ray.stages.multimodal import (MediaDecodeStats,
                                                           synth_media_batch)
    g = ((np.arange(16)[None, :] // 8 * 37
          + np.arange(12)[:, None] // 8 * 41) % 256).astype(np.uint8)
    payload = encode_jpeg(g, qtables=_ONES, subsample=False)
    batch = pa.table({
        "media_id": ["jpg-0"], "kind": ["image"], "payload": [payload],
        "meta_width": pa.array([16], pa.int32()),
        "meta_height": pa.array([12], pa.int32()),
        "meta_sample_rate": pa.array([0], pa.int32()),
        "meta_n_frames": pa.array([0], pa.int32()),
    })
    from knowledgeextraction_ray.stages.multimodal import DecodeImage
    out = DecodeImage(fake=False)(batch)
    assert out["pixel_mean"][0].as_py() == float(g.mean())

    docs = pa.table({"doc_id": pa.array([2, 5, 11, 30, 31, 32], pa.int64())})
    stats = MediaDecodeStats()(synth_media_batch(docs)).to_pandas()
    X, Y = np.meshgrid(np.arange(16), np.arange(12))
    for _, row in stats.iterrows():
        did = row["doc_id"]
        if did % 3 == 0:
            want = sum(int(((7 * X + 13 * Y + 29 * c + 31 * (did % 97))
                            % 256).sum()) for c in range(3))
            assert row["codec"] == "png"
        elif did % 3 == 1:
            want = 3 * int(((11 * X + 17 * Y + 23 * (did % 89))
                            % 256).sum())
            assert row["codec"] == "gif"
        else:
            want = 3 * int(((37 * (X // 8) + 41 * (Y // 8)
                             + 19 * (did % 79)) % 256).sum())
            assert row["codec"] == "jpeg"
        assert row["pixel_sum"] == want
