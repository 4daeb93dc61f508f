"""FLAC codec — from-scratch (numpy + stdlib; no libFLAC/libav in this
container), extending the multimodal audio story beyond WAV/PCM to a
real compressed archive format (VERDICT r5 item 7; no reference
counterpart — GeoIO has no media axis, scope is the brief's
LLM-pipeline multimodal column contract).

Decode covers the full subframe surface of the public spec
(xiph.org/flac/format): CONSTANT, VERBATIM, FIXED orders 0-4 and LPC
orders 1-32 with rice-coded residuals (both 4- and 5-bit parameter
methods, partition orders, escape-to-raw partitions), all four channel
assignments (independent, left/side, right/side, mid/side with the +1
side-channel bit depth), wasted-bits shifts, UTF-8-coded frame numbers,
and CRC-8 / CRC-16 verification.  The encoder emits CONSTANT /
FIXED(0-4) / LPC(Levinson-Durbin) subframes with rice residuals over
any partition order and any channel assignment — lossless by
construction, so round-trips are bit-exact regardless of predictor
quality (asserted in tests, plus the STREAMINFO MD5 of the decoded
PCM).

Like the other codecs this is a driver-side interchange layer; the
distributed path ships decoded samples as parquet columns and the
Arrow-batched ``audio_features`` operator dispatches on magic bytes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    __slots__ = ("d", "pos", "acc", "bits")

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.bits = 0

    def read(self, n: int) -> int:
        while self.bits < n:
            self.acc = (self.acc << 8) | self.d[self.pos]
            self.pos += 1
            self.bits += 8
        v = (self.acc >> (self.bits - n)) & ((1 << n) - 1)
        self.bits -= n
        self.acc &= (1 << self.bits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self) -> None:
        self.bits = 0
        self.acc = 0

    def byte_pos(self) -> int:
        return self.pos - self.bits // 8


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.bits += n
        while self.bits >= 8:
            self.out.append((self.acc >> (self.bits - 8)) & 0xFF)
            self.bits -= 8
        self.acc &= (1 << self.bits) - 1

    def unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)

    def align(self) -> None:
        if self.bits:
            self.write(0, 8 - self.bits)


def _utf8_num(w: _BitWriter, n: int) -> None:
    """FLAC's UTF-8-style variable-length frame/sample number."""
    if n < 0x80:
        w.write(n, 8)
        return
    for nbytes in range(2, 8):
        if n < (1 << (nbytes * 5 + 1)) or nbytes == 7:
            break
    # lead byte carries `nbytes` leading ones then a zero: 0xC0 for 2
    # bytes, 0xE0 for 3, ... 0xFE for 7.  (8 - nbytes), not (7 - nbytes):
    # the r6 code emitted 0xE0 for a 2-byte sequence, so any stream with
    # >= 128 frames wrote an undecodable frame number (ADVICE r7, high).
    w.write((0xFF << (8 - nbytes)) & 0xFF | (n >> (6 * (nbytes - 1))), 8)
    for i in range(nbytes - 2, -1, -1):
        w.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)


def _read_utf8_num(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x40
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    n = b0 & (mask - 1)
    for _ in range(nbytes):
        n = (n << 6) | (br.read(8) & 0x3F)
    return n


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _read_residual(br: _BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if block_size % nparts:
        raise ValueError("partition order does not divide block size")
    res: list[int] = []
    for p in range(nparts):
        cnt = block_size // nparts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            if raw == 0:
                res.extend([0] * cnt)
            else:
                res.extend(br.read_signed(raw) for _ in range(cnt))
        else:
            for _ in range(cnt):
                q = br.unary()
                u = (q << param) | br.read(param) if param else q
                res.append((u >> 1) ^ -(u & 1))
    return res


def _read_subframe(br: _BitReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    bps -= wasted
    if sf_type == 0:        # CONSTANT
        out = [br.read_signed(bps)] * block_size
    elif sf_type == 1:      # VERBATIM
        out = [br.read_signed(bps) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type - 8
        out = [br.read_signed(bps) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        coef = _FIXED_COEF[order]
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef))
            out.append(r + pred)
    elif sf_type >= 32:     # LPC
        order = (sf_type & 31) + 1
        out = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = br.read_signed(5)
        coef = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        for r in res:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coef)) >> shift
            out.append(r + pred)
    else:
        raise ValueError(f"reserved subframe type {sf_type}")
    if wasted:
        out = [v << wasted for v in out]
    return out


_BLOCKSIZE_TBL = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                  8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                  13: 8192, 14: 16384, 15: 32768}
_RATE_TBL = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
             7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_TBL = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_raw(buf: bytes, verify_md5: bool = True
               ) -> tuple[np.ndarray, int, int]:
    """FLAC bytes → (int32 samples (n, channels), sample_rate, bps)."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC file")
    pos = 4
    info = None
    while True:
        hdr = buf[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        ln = int.from_bytes(buf[pos + 1:pos + 4], "big")
        body = buf[pos + 4:pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16)  # min block size
            br.read(16)
            br.read(24)  # min frame size
            br.read(24)
            rate = br.read(20)
            nch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            info = (rate, nch, bps, total, md5)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO block")
    rate, nch, bps, total, md5 = info

    chans: list[list[int]] = [[] for _ in range(nch)]
    got = 0
    while (total == 0 or got < total) and pos < len(buf) - 1:
        frame_start = pos
        br = _BitReader(buf, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync at byte {frame_start}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_num(br)
        if bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZE_TBL[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code != 0:
            _RATE_TBL[sr_code]  # noqa: B018 — validity check
        fbps = bps if bps_code == 0 else _BPS_TBL[bps_code]
        hdr_end = br.byte_pos()
        crc8 = br.read(8)
        calc = _crc8(buf[frame_start:hdr_end])
        if crc8 != calc:
            raise ValueError(f"frame header CRC-8 mismatch at {frame_start}")

        if ch_code < 8:
            subs = [_read_subframe(br, block_size, fbps)
                    for _ in range(ch_code + 1)]
        else:
            # stereo decorrelation: the side channel carries +1 bit
            extra = {8: (0, 1), 9: (1, 0), 10: (0, 1)}[ch_code]
            subs = [_read_subframe(br, block_size, fbps + extra[c])
                    for c in range(2)]
            a, b = subs
            if ch_code == 8:        # left/side: R = L - side
                subs = [a, [x - y for x, y in zip(a, b)]]
            elif ch_code == 9:      # right/side: L = side + R
                subs = [[x + y for x, y in zip(a, b)], b]
            else:                   # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        br.align()
        crc_end = br.byte_pos()
        crc16 = br.read(16)
        if crc16 != _crc16(buf[frame_start:crc_end]):
            raise ValueError(f"frame CRC-16 mismatch at {frame_start}")
        pos = br.byte_pos()
        for c, s in enumerate(subs):
            chans[c].extend(s)
        got += block_size

    n = total if total else got
    out = np.array([c[:n] for c in chans], np.int32).T
    if verify_md5 and md5 != b"\x00" * 16:
        if hashlib.md5(_pcm_bytes(out, bps)).digest() != md5:
            raise ValueError("decoded PCM fails the STREAMINFO MD5")
    return out, rate, bps


def decode(buf: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (float64 samples (n, ch) in [-1, 1], rate) — the
    same convention as ``multimodal.decode_wav``."""
    a, rate, bps = decode_raw(buf)
    return a.astype(np.float64) / float(1 << (bps - 1)), rate


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian PCM, the byte stream STREAMINFO's MD5
    covers (8/16/24/32-bit)."""
    nbytes = (bps + 7) // 8
    flat = samples.astype(np.int64).reshape(-1)
    out = bytearray()
    mask = (1 << (8 * nbytes)) - 1
    for v in flat.tolist():
        out += int(v & mask).to_bytes(nbytes, "little")
    return bytes(out)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res) + 1e-9
    k = max(0, int(np.ceil(np.log2(mean))))
    return min(k, 14)


def _write_residual(w: _BitWriter, res: list[int], order: int,
                    block_size: int, partition_order: int) -> None:
    # Clamp to an order the block actually supports: the spec's
    # partition layout needs nparts | block_size and a non-empty first
    # partition (block_size/nparts > order).  Without the clamp, a final
    # partial block whose length is not divisible by 2^partition_order
    # silently dropped residuals and produced a corrupt stream
    # (ADVICE r7, medium).
    while partition_order > 0 and (
            block_size % (1 << partition_order)
            or block_size // (1 << partition_order) <= order):
        partition_order -= 1
    w.write(0, 2)                      # method 0: 4-bit rice params
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    i = 0
    for p in range(nparts):
        cnt = block_size // nparts - (order if p == 0 else 0)
        part = res[i:i + cnt]
        i += cnt
        param = _rice_param(part)
        w.write(param, 4)
        for v in part:
            u = (abs(v) << 1) - (1 if v < 0 else 0)   # zigzag
            w.unary(u >> param)
            if param:
                w.write(u & ((1 << param) - 1), param)


def _lpc_coeffs(x: np.ndarray, order: int, prec: int = 12
                ) -> tuple[list[int], int]:
    """Levinson-Durbin + uniform quantization → (coefficients, shift)."""
    xf = x.astype(np.float64)
    ac = np.array([float(np.dot(xf[: len(xf) - k], xf[k:]))
                   for k in range(order + 1)])
    if ac[0] == 0:
        return [0] * order, 0
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        k = (ac[i + 1] - np.dot(a[:i], ac[i:0:-1])) / err
        new = a[:i] - k * a[:i][::-1]
        a[:i] = new
        a[i] = k
        err *= (1 - k * k)
        if err <= 0:
            break
    cmax = float(np.abs(a).max()) or 1.0
    shift = min(15, max(1, prec - 1 - int(np.floor(np.log2(cmax))) - 1))
    q = [int(np.clip(round(c * (1 << shift)),
                     -(1 << (prec - 1)), (1 << (prec - 1)) - 1)) for c in a]
    return q, shift


def _diff_residual(x: list[int], order: int) -> list[int]:
    cur = list(x)
    for _ in range(order):
        cur = [cur[i + 1] - cur[i] for i in range(len(cur) - 1)]
    return cur


def _write_subframe(w: _BitWriter, x: list[int], bps: int,
                    partition_order: int, method: str) -> None:
    if all(v == x[0] for v in x):
        w.write(0, 1)
        w.write(0, 6)       # CONSTANT
        w.write(0, 1)
        w.write(x[0], bps)
        return
    if method == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write(v, bps)
        return
    if method == "lpc" and len(x) > 16:
        order = 8
        coef, shift = _lpc_coeffs(np.array(x), order)
        w.write(0, 1)
        w.write(32 | (order - 1), 6)
        w.write(0, 1)
        for v in x[:order]:
            w.write(v, bps)
        w.write(12 - 1, 4)  # precision 12
        w.write(shift, 5)
        for c in coef:
            w.write(c, 12)
        res = [x[i] - (sum(coef[j] * x[i - 1 - j]
                           for j in range(order)) >> shift)
               for i in range(order, len(x))]
        _write_residual(w, res, order, len(x), partition_order)
        return
    # fixed-order predictor, order by min sum(|residual|)
    costs = {}
    for order in range(5):
        if order >= len(x):
            break
        costs[order] = sum(abs(v) for v in _diff_residual(x, order))
    order = min(costs, key=costs.get)
    # the order-th difference has exactly len(x) - order entries — the
    # residuals for every sample past the warmup
    res = _diff_residual(x, order)
    w.write(0, 1)
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in x[:order]:
        w.write(v, bps)
    _write_residual(w, res, order, len(x), partition_order)


def encode(samples: np.ndarray, rate: int = 16000, bps: int = 16,
           block_size: int = 4096, partition_order: int = 0,
           method: str = "fixed", stereo: str = "independent") -> bytes:
    """(n, ch) int samples → FLAC bytes.  ``method``: fixed | lpc |
    verbatim; ``stereo``: independent | left_side | right_side |
    mid_side (2-channel input only).  Lossless for any choice — the
    knobs only trade size, which is what makes every decode path
    round-trip-testable."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, nch = a.shape
    if stereo != "independent" and nch != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    a = a.astype(np.int64)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if a.min() < lo or a.max() > hi:
        raise ValueError(f"samples exceed {bps}-bit range")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = bytes(si.out) + hashlib.md5(
        _pcm_bytes(a.astype(np.int32), bps)).digest()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    ch_code = {"independent": nch - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[stereo]
    for fi, start in enumerate(range(0, n, block_size)):
        blk = a[start:start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)       # fixed blocking
        w.write(7, 4)       # 16-bit block size at end
        w.write(0, 4)       # rate from STREAMINFO
        w.write(ch_code, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        w.write(0, 1)
        _utf8_num(w, fi)
        w.write(bs - 1, 16)
        hdr = bytes(w.out)
        assert w.bits == 0
        w.write(_crc8(hdr), 8)

        if ch_code < 8:
            for c in range(nch):
                _write_subframe(w, blk[:, c].tolist(), bps,
                                partition_order, method)
        else:
            left, right = blk[:, 0].tolist(), blk[:, 1].tolist()
            side = [x - y for x, y in zip(left, right)]
            if ch_code == 8:
                chans = [(left, bps), (side, bps + 1)]
            elif ch_code == 9:
                chans = [(side, bps + 1), (right, bps)]
            else:
                mid = [(x + y) >> 1 for x, y in zip(left, right)]
                chans = [(mid, bps), (side, bps + 1)]
            for x, cbps in chans:
                _write_subframe(w, x, cbps, partition_order, method)
        w.align()
        frame = bytes(w.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)
