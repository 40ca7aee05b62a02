"""Pure-stdlib FLAC codec (decoder + fixture encoder).

De-stubs the lossless audio format named in the multimodal stage's stub
list (``stages/multimodal.AudioFeatures`` — "mp3/flac/ogg"): no audio
libraries ship in this container, but FLAC is implementable honestly from
the public spec (RFC 9639 / xiph.org format docs) because — unlike MP3,
whose Huffman and synthesis-window tables live in the SPEC rather than
the stream — every FLAC parameter (rice parameters, predictor choice,
LPC coefficients and shifts) travels inside the file. Losslessness means
decoded samples are exact integers, so the decoder extends the DuckDB
closed-form gate ``media_audio_stats`` (see ``stages/multimodal``).

Decoder scope (asserted loudly): STREAMINFO + frame parsing with CRC-8 /
CRC-16 verification, blocking-strategy/blocksize/sample-rate/sample-size
header codes, UTF-8-style coded frame numbers, wasted bits, all four
subframe types (constant, verbatim, fixed orders 0-4, LPC orders 1-32),
4- and 5-bit rice-partition residuals with escape partitions, and the
four channel assignments (independent, left/side, right/side, mid/side).
STREAMINFO's MD5 is verified when present. Anything else raises
``ValueError`` naming the unsupported field.

The encoder exists for fixtures and tests: constant / verbatim / fixed
(orders 0-2) subframes chosen by cost, per-frame rice parameter search,
optional mid/side stereo — enough to make every decoder path above
load-bearing in round-trip tests, while hand-assembled bitstreams in
``tests/test_flac.py`` pin the decoder against the spec independently of
the encoder.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

# frame-header blocksize codes (RFC 9639 §9.1.1): value for codes 1-5 and
# 8-15; 6/7 mean an explicit 8/16-bit (value-1) field follows
_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
# sample-rate codes (§9.1.2): 0 = from STREAMINFO; 12/13/14 = explicit
# field follows (8-bit kHz / 16-bit Hz / 16-bit Hz÷10); 15 invalid
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
# sample-size codes (§9.1.4): 0 = from STREAMINFO; 3 reserved
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor coefficients by order (§9.2.2); order o predicts
# s[i] from the previous o samples
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _crc_table(poly: int, width: int) -> list[int]:
    top, mask = 1 << (width - 1), (1 << width) - 1
    table = []
    for byte in range(256):
        reg = byte << (width - 8)
        for _ in range(8):
            reg = ((reg << 1) ^ poly) & mask if reg & top else (reg << 1) & mask
        table.append(reg)
    return table


_CRC8 = _crc_table(0x07, 8)       # frame-header CRC (§9.1.8)
_CRC16 = _crc_table(0x8005, 16)   # frame-footer CRC (§9.3)


def crc8(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = _CRC8[reg ^ b]
    return reg


def crc16(data: bytes) -> int:
    reg = 0
    for b in data:
        reg = _CRC16[((reg >> 8) ^ b) & 0xFF] ^ ((reg << 8) & 0xFFFF)
    return reg


def is_flac(data: bytes) -> bool:
    return data[:4] == _MAGIC


class _BitReader:
    """MSB-first bit reader over bytes (accumulator form)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = self.acc >> self.nbits
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.nbits == 0:
                if self.pos >= len(self.data):
                    raise ValueError("truncated FLAC stream (unary)")
                self.acc = self.data[self.pos]
                self.pos += 1
                self.nbits = 8
            if self.acc == 0:
                q += self.nbits
                self.nbits = 0
                continue
            top = self.acc.bit_length()
            q += self.nbits - top
            self.nbits = top - 1          # consume the terminating 1 bit
            self.acc &= (1 << self.nbits) - 1
            return q

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


def _read_coded_number(r: _BitReader) -> int:
    """UTF-8-style frame/sample number (§9.1.5; up to 36 bits)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("bad UTF-8-coded frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad continuation in coded frame number")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    """Rice-partitioned residual (§9.2.7), both 4- and 5-bit methods."""
    method = r.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits, escape = (4, 15) if method == 0 else (5, 31)
    porder = r.read(4)
    nparts = 1 << porder
    if block_size % nparts:
        raise ValueError("partition order does not divide block size")
    out: list[int] = []
    for part in range(nparts):
        count = (block_size >> porder) - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("predictor order exceeds first partition")
        param = r.read(pbits)
        if param == escape:
            nbits = r.read(5)
            out.extend(r.read_signed(nbits) if nbits else 0
                       for _ in range(count))
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << param) | r.read(param) if param else q
                out.append((u >> 1) ^ -(u & 1))   # zigzag → signed
    return out


def _restore_fixed(warmup: list[int], res: list[int], order: int) -> np.ndarray:
    """Invert the order-`order` difference (fixed predictor, §9.2.2)."""
    if order == 0:
        return np.asarray(res, dtype=np.int64)
    lvl = [np.asarray(warmup, dtype=np.int64)]
    for _ in range(order):
        lvl.append(np.diff(lvl[-1]))
    x = np.asarray(res, dtype=np.int64)
    for k in range(order, 0, -1):
        x = lvl[k - 1][-1] + np.cumsum(x)
    return np.concatenate([lvl[0], x])


def _restore_lpc(warmup: list[int], res: list[int], coefs: list[int],
                 shift: int) -> np.ndarray:
    """QLP restore: s[i] = (Σ c[j]·s[i-1-j] >> shift) + r[i] (§9.2.3).

    Python ints keep the accumulator exact; ``>>`` on negative ints is
    the arithmetic shift the spec requires."""
    sig = list(warmup)
    order = len(coefs)
    for rv in res:
        acc = 0
        for j, c in enumerate(coefs):
            acc += c * sig[-1 - j]
        sig.append((acc >> shift) + rv)
    return np.asarray(sig, dtype=np.int64)


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        raise ValueError("wasted bits exceed sample size")
    if stype == 0:                       # constant
        sig = np.full(block_size, r.read_signed(ebps), dtype=np.int64)
    elif stype == 1:                     # verbatim
        sig = np.fromiter((r.read_signed(ebps) for _ in range(block_size)),
                          dtype=np.int64, count=block_size)
    elif 8 <= stype <= 12:               # fixed, order 0-4
        order = stype - 8
        warmup = [r.read_signed(ebps) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        sig = _restore_fixed(warmup, res, order)
    elif stype >= 32:                    # LPC, order 1-32
        order = (stype & 31) + 1
        warmup = [r.read_signed(ebps) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision code 15")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        sig = _restore_lpc(warmup, res, coefs, shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return sig << wasted if wasted else sig


def _parse_streaminfo(body: bytes) -> dict:
    if len(body) != 34:
        raise ValueError("STREAMINFO must be 34 bytes")
    min_bs, max_bs = struct.unpack(">HH", body[0:4])
    packed = int.from_bytes(body[10:18], "big")
    return {
        "min_block": min_bs, "max_block": max_bs,
        "rate": packed >> 44,
        "channels": ((packed >> 41) & 0x7) + 1,
        "bps": ((packed >> 36) & 0x1F) + 1,
        "total": packed & ((1 << 36) - 1),
        "md5": body[18:34],
    }


def decode_flac_int(data: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes → ``((n_samples, channels) int32 exact, rate, bps)``."""
    if not is_flac(data):
        raise ValueError("not a FLAC stream (bad fLaC signature)")
    pos, info = 4, None
    while True:                           # metadata blocks
        if pos + 4 > len(data):
            raise ValueError("truncated metadata block header")
        last, btype = data[pos] >> 7, data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated metadata block body")
        if btype == 0:
            info = _parse_streaminfo(body)
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    chans, out, rate = info["channels"], [], info["rate"]
    while pos < len(data):                # frames
        frame_start = pos
        r = _BitReader(data, pos)
        if r.read(14) != 0x3FFE:
            raise ValueError("bad frame sync code")
        if r.read(1):
            raise ValueError("frame header reserved bit set")
        r.read(1)                         # blocking strategy
        bs_code, rate_code = r.read(4), r.read(4)
        chan_assign, bps_code = r.read(4), r.read(3)
        if r.read(1):
            raise ValueError("frame header reserved bit set")
        _read_coded_number(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code 0")
        elif bs_code == 6:
            block_size = r.read(8) + 1
        elif bs_code == 7:
            block_size = r.read(16) + 1
        else:
            block_size = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 0:
            rate = info["rate"]
        elif rate_code == 12:
            rate = r.read(8) * 1000
        elif rate_code == 13:
            rate = r.read(16)
        elif rate_code == 14:
            rate = r.read(16) * 10
        elif rate_code == 15:
            raise ValueError("invalid sample rate code 15")
        else:
            rate = _RATE_CODES[rate_code]
        if bps_code == 0:
            bps = info["bps"]
        elif bps_code == 3:
            raise ValueError("reserved sample size code 3")
        else:
            bps = _BPS_CODES[bps_code]
        if chan_assign <= 7:
            nch, side_idx = chan_assign + 1, None
        elif chan_assign <= 10:
            nch = 2
            side_idx = {8: 1, 9: 0, 10: 1}[chan_assign]
        else:
            raise ValueError(f"reserved channel assignment {chan_assign}")
        if nch != chans:
            raise ValueError("frame channel count != STREAMINFO")
        if crc8(data[frame_start:r.pos]) != r.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        subs = [_read_subframe(r, block_size,
                               bps + (1 if ch == side_idx else 0))
                for ch in range(nch)]
        r.align()
        if crc16(data[frame_start:r.pos]) != r.read(16):
            raise ValueError("frame CRC-16 mismatch")
        pos = r.pos
        if chan_assign == 8:              # left/side: right = left − side
            subs = [subs[0], subs[0] - subs[1]]
        elif chan_assign == 9:            # right/side: left = right + side
            subs = [subs[1] + subs[0], subs[1]]
        elif chan_assign == 10:           # mid/side (§9.2.1)
            mid2 = (subs[0] << 1) | (subs[1] & 1)
            subs = [(mid2 + subs[1]) >> 1, (mid2 - subs[1]) >> 1]
        out.append(np.stack(subs, axis=1))
    samples = (np.concatenate(out, axis=0) if out
               else np.zeros((0, chans), dtype=np.int64))
    if info["total"] and len(samples) != info["total"]:
        raise ValueError("decoded sample count != STREAMINFO total")
    if info["md5"] != b"\0" * 16 and info["md5"] != _md5_samples(
            samples, info["bps"]):
        raise ValueError("decoded audio MD5 mismatch")
    return samples.astype(np.int32), rate, info["bps"]


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → ``((n_samples, channels) float32 in [-1, 1], rate)``
    (same convention as ``wav.decode_wav``)."""
    samples, rate, bps = decode_flac_int(data)
    return (samples.astype(np.float32) / float(1 << (bps - 1))), rate


def _md5_samples(samples: np.ndarray, bps: int) -> bytes:
    """STREAMINFO MD5: interleaved little-endian signed samples (§8.2)."""
    nbytes = (bps + 7) // 8
    flat = samples.astype(np.int64).ravel()          # row-major interleave
    if nbytes == 2:
        raw = flat.astype("<i2").tobytes()
    elif nbytes == 1:
        raw = flat.astype("<i1").tobytes()
    elif nbytes == 4:
        raw = flat.astype("<i4").tobytes()
    else:                                            # 20/24-bit
        le4 = flat.astype("<i4").tobytes()
        raw = b"".join(le4[i:i + nbytes] for i in range(0, len(le4), 4))
    return hashlib.md5(raw).digest()


# ---------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _rice_cost(u: np.ndarray, p: int) -> int:
    return int((u >> p).sum()) + len(u) * (p + 1)


def _encode_residual(w: _BitWriter, res: np.ndarray) -> None:
    u = (np.abs(res.astype(np.int64)) << 1) - (res < 0)   # zigzag
    costs = [_rice_cost(u, p) for p in range(31)]
    p = int(np.argmin(costs))
    method = 0 if p <= 14 else 1
    w.write(method, 2)
    w.write(0, 4)                         # partition order 0
    w.write(p, 4 if method == 0 else 5)
    for uv in u.tolist():
        w.write_unary(uv >> p)
        if p:
            w.write(uv, p)


def _encode_subframe(w: _BitWriter, sig: np.ndarray, bps: int) -> None:
    sig = sig.astype(np.int64)
    w.write(0, 1)                         # padding
    if len(sig) and (sig == sig[0]).all():
        w.write(0, 6)                     # constant
        w.write(0, 1)                     # no wasted bits
        w.write(int(sig[0]), bps)
        return
    best_order, best_cost, best_res = None, None, None
    for order in range(3):
        if order >= len(sig):
            break
        res = np.diff(sig, n=order) if order else sig
        u = (np.abs(res) << 1) - (res < 0)
        cost = min(_rice_cost(u, p) for p in range(31)) + order * bps
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_res = order, cost, res
    verb_cost = len(sig) * bps
    if best_cost is None or verb_cost <= best_cost:
        w.write(1, 6)                     # verbatim
        w.write(0, 1)
        for v in sig.tolist():
            w.write(v, bps)
        return
    order = best_order
    w.write(8 + order, 6)                 # fixed, order
    w.write(0, 1)
    for v in sig[:order].tolist():
        w.write(v, bps)
    _encode_residual(w, best_res)


def encode_flac(samples: np.ndarray, rate: int, bits: int = 16,
                block_size: int = 4096, mode: str = "independent") -> bytes:
    """Integer samples ``(n, ch)`` (or ``(n,)``) → FLAC bytes.

    ``mode='ms'`` encodes 2-channel input as mid/side so the decoder's
    inter-channel path is load-bearing in round-trip tests."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, chans = samples.shape
    lim = 1 << (bits - 1)
    if samples.min(initial=0) < -lim or samples.max(initial=0) >= lim:
        raise ValueError(f"samples exceed {bits}-bit range")
    if mode == "ms" and chans != 2:
        raise ValueError("mid/side needs exactly 2 channels")
    out = bytearray(_MAGIC)
    packed = (rate << 44) | ((chans - 1) << 41) | ((bits - 1) << 36) | n
    streaminfo = (struct.pack(">HH", block_size, block_size)
                  + b"\0\0\0" * 2
                  + packed.to_bytes(8, "big")
                  + _md5_samples(samples, bits))
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    bs_code = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
               1024: 10, 2048: 11, 4096: 12}.get(block_size)
    rate_code = {v: k for k, v in _RATE_CODES.items()}.get(rate, 0)
    bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits]
    for fno, start in enumerate(range(0, n, block_size)):
        chunk = samples[start:start + block_size]
        bs = len(chunk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 2)                     # reserved + fixed blocking
        w.write(bs_code if bs == block_size and bs_code else 7, 4)
        w.write(rate_code, 4)
        chan_assign = 10 if mode == "ms" else chans - 1
        w.write(chan_assign, 4)
        w.write(bps_code, 3)
        w.write(0, 1)
        _write_coded_number(w, fno)
        if not (bs == block_size and bs_code):
            w.write(bs - 1, 16)
        w.align()
        header = bytes(w.buf)
        w.write(crc8(header), 8)
        if mode == "ms":
            left, right = chunk[:, 0], chunk[:, 1]
            _encode_subframe(w, (left + right) >> 1, bits)       # mid
            _encode_subframe(w, left - right, bits + 1)          # side
        else:
            for ch in range(chans):
                _encode_subframe(w, chunk[:, ch], bits)
        w.align()
        frame = bytes(w.buf)
        w.write(crc16(frame), 16)
        out += bytes(w.buf)
    return bytes(out)


def _write_coded_number(w: _BitWriter, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    for nbytes in range(2, 8):            # smallest width that fits
        if v < (1 << ((7 - nbytes) + 6 * (nbytes - 1))):
            break
    else:
        raise ValueError("coded number exceeds 36 bits")
    ones = (0xFF << (8 - nbytes)) & 0xFF
    w.write(ones | (v >> (6 * (nbytes - 1))), 8)
    for i in range(nbytes - 2, -1, -1):
        w.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)
