"""FLAC codec tests.

Round-trips make every decoder path load-bearing through the fixture
encoder; the hand-assembled bitstreams pin the decoder against RFC 9639
INDEPENDENTLY of the encoder (bit strings written out from the spec, CRCs
computed by a bitwise shift-register reimplementation, expected sample
values derived by plain-Python loops in the test).
"""

import numpy as np
import pytest

from knowledgeextraction_ray.functions.flac import (
    crc8, crc16, decode_flac, decode_flac_int, encode_flac, is_flac)


# ------------------------------------------------------- helpers (independent)

def _bits(s: str) -> bytes:
    """'0100 0001 ...' → bytes; must land on a byte boundary."""
    s = s.replace(" ", "").replace("\n", "")
    assert len(s) % 8 == 0, f"{len(s)} bits is not byte-aligned"
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def _crc_bitwise(data: bytes, poly: int, width: int) -> int:
    """Shift-register CRC, bit by bit — independent of the codec's tables."""
    reg, top, mask = 0, 1 << (width - 1), (1 << width) - 1
    for byte in data:
        for i in range(7, -1, -1):
            feed = ((byte >> i) & 1) ^ (1 if reg & top else 0)
            reg = ((reg << 1) & mask) ^ (poly if feed else 0)
    return reg


def _streaminfo(rate: int, ch: int, bps: int, total: int,
                min_bs: int = 16, max_bs: int = 65535) -> bytes:
    packed = (rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | total
    body = (min_bs.to_bytes(2, "big") + max_bs.to_bytes(2, "big")
            + b"\0" * 6 + packed.to_bytes(8, "big") + b"\0" * 16)
    assert len(body) == 34
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + body


def _frame(header_no_crc: bytes, subframe_bits: str) -> bytes:
    """header bytes (pre-CRC8) + subframe bit string → full frame with CRCs."""
    h = header_no_crc + bytes([_crc_bitwise(header_no_crc, 0x07, 8)])
    pad = (-len(subframe_bits.replace(" ", ""))) % 8
    body = h + _bits(subframe_bits + "0" * pad)
    return body + _crc_bitwise(body, 0x8005, 16).to_bytes(2, "big")


# FF F8: sync+reserved+fixed-blocking; 60: blocksize code 6 (explicit 8-bit)
# + rate code 0 (streaminfo); then chan(4) bps(3) res(1); frame number 0;
# explicit blocksize-1 byte
def _mono8_header(block_size: int) -> bytes:
    return bytes([0xFF, 0xF8, 0x60, 0x02, 0x00, block_size - 1])


# ------------------------------------------------------------------ roundtrips

@pytest.mark.parametrize("shape,bits,bs,mode", [
    ((1024, 2), 16, 1024, "independent"),
    ((1024, 2), 16, 1024, "ms"),
    ((3001, 1), 16, 1024, "independent"),   # multi-frame + odd tail
    ((777, 2), 8, 256, "ms"),
    ((64, 3), 16, 4096, "independent"),
    ((500, 1), 24, 512, "independent"),
])
def test_roundtrip_exact(shape, bits, bs, mode):
    rs = np.random.RandomState(hash((shape, bits)) & 0xFFFF)
    lim = 1 << (bits - 1)
    x = rs.randint(-lim, lim, size=shape).astype(np.int64)
    x[: shape[0] // 2] = (np.arange(shape[0] // 2)[:, None] * 3) % (lim // 2)
    enc = encode_flac(x, 16000, bits=bits, block_size=bs, mode=mode)
    assert is_flac(enc)
    dec, rate, dbps = decode_flac_int(enc)
    assert (rate, dbps, dec.shape) == (16000, bits, shape)
    np.testing.assert_array_equal(dec, x)


def test_float_decode_matches_wav_convention():
    x = np.array([[-32768], [16384], [0], [32767]], dtype=np.int64)
    enc = encode_flac(x, 8000, bits=16, block_size=192)
    f, rate = decode_flac(enc)
    assert rate == 8000 and f.dtype == np.float32
    np.testing.assert_allclose(
        f[:, 0], np.array([-1.0, 0.5, 0.0, 32767 / 32768], np.float32))


def test_crc_tables_match_bitwise_reference():
    for data in (b"", b"\x00", b"123456789", bytes(range(256))):
        assert crc8(data) == _crc_bitwise(data, 0x07, 8)
        assert crc16(data) == _crc_bitwise(data, 0x8005, 16)


# ------------------------------------------------- hand-assembled decoder pins

def test_hand_assembled_verbatim_frame():
    samples = [12, -5, 100, -128]
    sub = "0 000001 0 " + " ".join(f"{v & 0xFF:08b}" for v in samples)
    stream = _streaminfo(8000, 1, 8, 4) + _frame(_mono8_header(4), sub)
    dec, rate, bps = decode_flac_int(stream)
    assert (rate, bps) == (8000, 8)
    assert dec[:, 0].tolist() == samples


def test_hand_assembled_fixed_order1_rice():
    # warmup [10]; residuals [1,-1,2,0] rice-coded with p=1 (method 0,
    # partition order 0): zigzag 2,1,4,0 → 01|0, 1|1, 001|0, 1|0
    sub = ("0 001001 0 00001010 "        # fixed order 1, warmup 10
           "00 0000 0001 "               # method 0, porder 0, param 1
           "010 11 0010 10")
    stream = _streaminfo(8000, 1, 8, 5) + _frame(_mono8_header(5), sub)
    dec, _, _ = decode_flac_int(stream)
    sig, res = [10], [1, -1, 2, 0]
    for r in res:
        sig.append(sig[-1] + r)          # independent order-1 restore
    assert dec[:, 0].tolist() == sig


def test_hand_assembled_lpc_frame():
    # LPC order 1: warmup [4], precision 4 (code 0011), shift 1,
    # coefficient [3]; residuals [1,-2,3] rice p=0 → zigzag 2,3,6
    sub = ("0 100000 0 00000100 "
           "0011 00001 0011 "
           "00 0000 0000 "
           "001 0001 0000001")
    stream = _streaminfo(8000, 1, 8, 4) + _frame(_mono8_header(4), sub)
    dec, _, _ = decode_flac_int(stream)
    sig = [4]
    for r in (1, -2, 3):
        sig.append(((3 * sig[-1]) >> 1) + r)
    assert dec[:, 0].tolist() == sig


def test_hand_assembled_escape_partition():
    # fixed order 0, escape partition (param 1111), 3-bit raw residuals
    vals = [-1, 2, -4, 3]
    sub = ("0 001000 0 00 0000 1111 00011 "
           + " ".join(f"{v & 0b111:03b}" for v in vals))
    stream = _streaminfo(8000, 1, 8, 4) + _frame(_mono8_header(4), sub)
    dec, _, _ = decode_flac_int(stream)
    assert dec[:, 0].tolist() == vals


def test_hand_assembled_wasted_bits():
    # constant subframe, wasted=1 (flag 1 + unary 0 zeros), 7-bit value 5
    sub = "0 000000 1 1 0000101"
    stream = _streaminfo(8000, 1, 8, 3) + _frame(_mono8_header(3), sub)
    dec, _, _ = decode_flac_int(stream)
    assert dec[:, 0].tolist() == [10, 10, 10]   # 5 << 1


@pytest.mark.parametrize("assign,ch0_bits,ch1_bits,expect", [
    # left/side: left=5, side=3 → right = 5-3 = 2 (side channel is 9-bit)
    ("1000", "0 000000 0 00000101", "0 000000 0 000000011", [5, 2]),
    # right/side: side=3, right=2 → left = 3+2 = 5
    ("1001", "0 000000 0 000000011", "0 000000 0 00000010", [5, 2]),
    # mid/side: mid=3, side=3 (odd) → l=((3<<1)|1 +3)>>1=5, r=2
    ("1010", "0 000000 0 00000011", "0 000000 0 000000011", [5, 2]),
])
def test_hand_assembled_stereo_decorrelation(assign, ch0_bits, ch1_bits,
                                             expect):
    hdr = bytes([0xFF, 0xF8, 0x60]) + _bits(assign + "001" + "0") \
        + bytes([0x00, 0x01])            # blocksize-1 = 1 → 2 samples
    stream = (_streaminfo(8000, 2, 8, 2)
              + _frame(hdr, ch0_bits + " " + ch1_bits))
    dec, _, _ = decode_flac_int(stream)
    assert dec.tolist() == [expect, expect]


# ------------------------------------------------------------------- rejection

def test_rejects_corruption():
    x = np.arange(64, dtype=np.int64)[:, None] * 17 % 1000
    enc = bytearray(encode_flac(x, 16000, bits=16, block_size=64))
    with pytest.raises(ValueError):
        decode_flac_int(b"RIFF" + bytes(enc[4:]))      # bad magic
    flipped = bytearray(enc)
    flipped[-10] ^= 0x40                                # payload bit flip
    with pytest.raises(ValueError):
        decode_flac_int(bytes(flipped))
    with pytest.raises(ValueError):
        decode_flac_int(bytes(enc[:-3]))                # truncated


def test_md5_verification_is_load_bearing():
    x = (np.arange(32, dtype=np.int64)[:, None] * 31) % 100
    enc = bytearray(encode_flac(x, 16000, bits=16, block_size=32))
    # STREAMINFO md5 is the last 16 bytes of the 34-byte block at offset 8
    md5_off = 4 + 4 + 18
    enc[md5_off] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac_int(bytes(enc))
