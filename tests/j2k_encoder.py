"""Independent lossless JPEG 2000 encoder — test scaffolding only.

Written separately from geoio_jl_spark/sources/j2k.py (shares only the
published Annex C probability table, re-typed here) so the decoder is
exercised differentially: encoder bugs and decoder bugs would have to be
symmetric across two implementations to cancel.  Emits the same subset
NCEP's g2clib/Jasper produce for GRIB2 template 5.40: raw codestream,
single tile/component, reversible 5/3, no quantization, one layer, no
precincts, default code-block style.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ISO/IEC 15444-1 Table C.2 (Qe, NMPS, NLPS, SWITCH)
_TBL = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

_RL, _UNI = 17, 18


class MQEncoder:
    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray([0])      # index 0 = the pre-buffer byte
        self.I = [0] * 19
        self.mps = [0] * 19
        self.I[0], self.I[_RL], self.I[_UNI] = 4, 3, 46

    def _byteout(self):
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.out[-1] += 1
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self):
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, cx: int, d: int):
        qe, nmps, nlps, sw = _TBL[self.I[cx]]
        if d == self.mps[cx]:
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c = (self.c + qe) & 0xFFFFFFFF
                self.I[cx] = nmps
                self._renorm()
            else:
                self.c = (self.c + qe) & 0xFFFFFFFF
        else:
            self.a -= qe
            if self.a < qe:
                self.c = (self.c + qe) & 0xFFFFFFFF
            else:
                self.a = qe
            if sw:
                self.mps[cx] ^= 1
            self.I[cx] = nlps
            self._renorm()

    def flush(self) -> bytes:
        # SETBITS: fill the low bits with 1s (the decoder feeds 1s past
        # the end of the segment) without leaving the [C, C+A) interval
        tempc = (self.c + self.a) & 0xFFFFFFFF
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if self.out[-1] == 0xFF:
            self.out.pop()
        return bytes(self.out[1:])


class HdrWriter:
    """Packet-header bit writer with 0xFF bit-stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.val = 0
        self.n = 0

    def _cap(self) -> int:
        return 7 if (self.out and self.out[-1] == 0xFF) else 8

    def bit(self, b: int):
        self.val = (self.val << 1) | (b & 1)
        self.n += 1
        if self.n == self._cap():
            self.out.append(self.val)
            self.val = 0
            self.n = 0

    def bits(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.val << (self._cap() - self.n))
            self.val = 0
            self.n = 0
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


class _TTNode:
    __slots__ = ("value", "low", "known")

    def __init__(self):
        self.value = 0
        self.low = 0
        self.known = False


class TagTreeEnc:
    def __init__(self, w: int, h: int, leaf_values):
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2
        self.levels = [[_TTNode() for _ in range(wd * hd)]
                       for wd, hd in self.dims]
        w0, h0 = self.dims[0]
        for y in range(h0):
            for x in range(w0):
                self.levels[0][y * w0 + x].value = leaf_values[y][x]
        for lev in range(1, len(self.dims)):
            wd, hd = self.dims[lev]
            wc, hc = self.dims[lev - 1]
            for y in range(hd):
                for x in range(wd):
                    vals = [self.levels[lev - 1][cy * wc + cx].value
                            for cy in range(2 * y, min(2 * y + 2, hc))
                            for cx in range(2 * x, min(2 * x + 2, wc))]
                    self.levels[lev][y * wd + x].value = min(vals)

    def encode(self, wr: HdrWriter, x: int, y: int, threshold: int):
        low = 0
        for lev in range(len(self.dims) - 1, -1, -1):
            wd, _ = self.dims[lev]
            nd = self.levels[lev][(y >> lev) * wd + (x >> lev)]
            if nd.low < low:
                nd.low = low
            while nd.low < threshold:
                if nd.low < nd.value:
                    wr.bit(0)
                    nd.low += 1
                else:
                    if not nd.known:
                        wr.bit(1)
                        nd.known = True
                    break
            if not nd.known:
                return
            low = nd.value

    def encode_value(self, wr: HdrWriter, x: int, y: int):
        wd, _ = self.dims[0]
        v = self.levels[0][y * wd + x].value
        t = 1
        while True:
            self.encode(wr, x, y, t)
            if self.levels[0][y * wd + x].known:
                break
            t += 1


# --------------------------------------------------------------------------
# forward reversible 5/3 (vertical then horizontal per level)

def _fwd1d(x: np.ndarray):
    n = x.shape[-1]
    if n == 1:
        return x.astype(np.int64, copy=True), x[..., :0].astype(np.int64)
    xe = x[..., 0::2].astype(np.int64)
    xo = x[..., 1::2].astype(np.int64)
    ns, nd = xe.shape[-1], xo.shape[-1]
    xep = xe[..., np.clip(np.arange(nd) + 1, 0, ns - 1)]
    d = xo - ((xe[..., :nd] + xep) >> 1)
    dm = d[..., np.clip(np.arange(ns) - 1, 0, nd - 1)]
    dp = d[..., np.clip(np.arange(ns), 0, nd - 1)]
    s = xe + ((dm + dp + 2) >> 2)
    return s, d


def _fwd2d(a: np.ndarray):
    H, W = a.shape
    s, d = _fwd1d(a.T)                       # vertical (columns)
    ver = np.concatenate([s.T, d.T], axis=0)
    s2, d2 = _fwd1d(ver)                     # horizontal (rows)
    lr = (H + 1) // 2
    return s2[:lr], d2[:lr], s2[lr:], d2[lr:]   # ll, hl, lh, hh


_SC = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


def _zc(band: int, hh: int, vv: int, dd: int) -> int:
    if band == 1:
        hh, vv = vv, hh
    if band != 3:
        if hh == 2:
            return 8
        if hh == 1:
            return 7 if vv >= 1 else (6 if dd >= 1 else 5)
        if vv == 2:
            return 4
        if vv == 1:
            return 3
        return 2 if dd >= 2 else dd
    hv = hh + vv
    if dd >= 3:
        return 8
    if dd == 2:
        return 7 if hv >= 1 else 6
    if dd == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else hv


def _encode_cblk(coefs: np.ndarray, band: int, numbps: int) -> bytes:
    h, w = coefs.shape
    mq = MQEncoder()
    sig = np.zeros((h + 2, w + 2), np.bool_)
    vis = np.zeros((h + 2, w + 2), np.bool_)
    neg = np.zeros((h + 2, w + 2), np.bool_)
    ref = np.zeros((h + 2, w + 2), np.bool_)
    mag = np.zeros((h + 2, w + 2), np.int64)
    mag[1:h + 1, 1:w + 1] = np.abs(coefs)
    neg[1:h + 1, 1:w + 1] = coefs < 0

    def nbhd(y, x):
        return (int(sig[y, x - 1]) + int(sig[y, x + 1])
                + int(sig[y - 1, x]) + int(sig[y + 1, x])
                + int(sig[y - 1, x - 1]) + int(sig[y - 1, x + 1])
                + int(sig[y + 1, x - 1]) + int(sig[y + 1, x + 1]))

    def zc_here(y, x):
        hh = int(sig[y, x - 1]) + int(sig[y, x + 1])
        vv = int(sig[y - 1, x]) + int(sig[y + 1, x])
        dd = (int(sig[y - 1, x - 1]) + int(sig[y - 1, x + 1])
              + int(sig[y + 1, x - 1]) + int(sig[y + 1, x + 1]))
        return _zc(band, hh, vv, dd)

    def enc_sign(y, x):
        hc = 0
        for xx in (x - 1, x + 1):
            if sig[y, xx]:
                hc += -1 if neg[y, xx] else 1
        hc = max(-1, min(1, hc))
        vc = 0
        for yy in (y - 1, y + 1):
            if sig[yy, x]:
                vc += -1 if neg[yy, x] else 1
        vc = max(-1, min(1, vc))
        ctx, xor = _SC[(hc, vc)]
        mq.encode(ctx, int(neg[y, x]) ^ xor)

    def spp(p):
        for ys in range(1, h + 1, 4):
            for x in range(1, w + 1):
                for y in range(ys, min(ys + 4, h + 1)):
                    if not sig[y, x] and nbhd(y, x):
                        bit = int((mag[y, x] >> p) & 1)
                        mq.encode(zc_here(y, x), bit)
                        if bit:
                            sig[y, x] = True
                            enc_sign(y, x)
                        vis[y, x] = True

    def mrp(p):
        for ys in range(1, h + 1, 4):
            for x in range(1, w + 1):
                for y in range(ys, min(ys + 4, h + 1)):
                    if sig[y, x] and not vis[y, x]:
                        ctx = 16 if ref[y, x] else (15 if nbhd(y, x) else 14)
                        mq.encode(ctx, int((mag[y, x] >> p) & 1))
                        ref[y, x] = True

    def cp(p):
        for ys in range(1, h + 1, 4):
            y_end = min(ys + 4, h + 1)
            for x in range(1, w + 1):
                start = ys
                if (y_end - ys == 4
                        and not any(sig[y, x] or vis[y, x] or nbhd(y, x)
                                    for y in range(ys, y_end))):
                    bits = [int((mag[y, x] >> p) & 1)
                            for y in range(ys, y_end)]
                    if not any(bits):
                        mq.encode(_RL, 0)
                        continue
                    mq.encode(_RL, 1)
                    r = bits.index(1)
                    mq.encode(_UNI, (r >> 1) & 1)
                    mq.encode(_UNI, r & 1)
                    y = ys + r
                    sig[y, x] = True
                    enc_sign(y, x)
                    start = y + 1
                for y in range(start, y_end):
                    if sig[y, x] or vis[y, x]:
                        continue
                    bit = int((mag[y, x] >> p) & 1)
                    mq.encode(zc_here(y, x), bit)
                    if bit:
                        sig[y, x] = True
                        enc_sign(y, x)
        vis[:] = False

    for p in range(numbps - 1, -1, -1):
        if p != numbps - 1:
            spp(p)
            mrp(p)
        cp(p)
    return mq.flush()


def _w_npasses(wr: HdrWriter, n: int):
    if n == 1:
        wr.bit(0)
        return
    wr.bit(1)
    if n == 2:
        wr.bit(0)
        return
    wr.bit(1)
    if n <= 5:
        wr.bits(n - 3, 2)
        return
    wr.bits(3, 2)
    if n <= 36:
        wr.bits(n - 6, 5)
        return
    wr.bits(31, 5)
    wr.bits(n - 37, 7)


def encode_j2k_lossless(img: np.ndarray, depth: int, levels: int = 2,
                        cb_exp: int = 6) -> bytes:
    """img: (h, w) unsigned ints < 2**depth → raw J2K codestream."""
    H, W = img.shape
    guard = 2
    cbw = cbh = 1 << cb_exp

    a = img.astype(np.int64) - (1 << (depth - 1))   # DC level shift
    subbands = []        # list per resolution: res0=[(type, arr)], then 3
    ll = a
    per_level = []
    for _ in range(levels):
        ll, hl, lh, hh = _fwd2d(ll)
        per_level.append((hl, lh, hh))
    subbands.append([(0, ll)])
    for lev in range(levels, 0, -1):
        hl, lh, hh = per_level[lev - 1]
        subbands.append([(1, hl), (2, lh), (3, hh)])

    gains = {0: 0, 1: 1, 2: 1, 3: 2}
    exps = []
    body = bytearray()
    for bands in subbands:
        # packet header
        wr = HdrWriter()
        cbs = []        # (bytes, numbps, npasses) in band/raster order
        any_cb = any(b.size for _, b in bands)
        wr.bit(1 if any_cb else 0)
        if any_cb:
            for btype, arr in bands:
                if arr.size == 0:
                    continue
                bh, bw = arr.shape
                ncx = (bw + cbw - 1) // cbw
                ncy = (bh + cbh - 1) // cbh
                mb = guard + (depth + gains[btype]) - 1
                incl, zbps = [], []
                for cy in range(ncy):
                    ir, zr = [], []
                    for cx in range(ncx):
                        blk = arr[cy * cbh:(cy + 1) * cbh,
                                  cx * cbw:(cx + 1) * cbw]
                        nb = int(np.abs(blk).max()).bit_length()
                        assert nb <= mb, "coefficient overflows Mb"
                        ir.append(0 if nb > 0 else 1)
                        zr.append(mb - nb if nb > 0 else mb)
                    incl.append(ir)
                    zbps.append(zr)
                itree = TagTreeEnc(ncx, ncy, incl)
                ztree = TagTreeEnc(ncx, ncy, zbps)
                for cy in range(ncy):
                    for cx in range(ncx):
                        itree.encode(wr, cx, cy, 1)
                        if incl[cy][cx] != 0:
                            continue
                        ztree.encode_value(wr, cx, cy)
                        blk = arr[cy * cbh:(cy + 1) * cbh,
                                  cx * cbw:(cx + 1) * cbw]
                        nb = int(np.abs(blk).max()).bit_length()
                        npass = 3 * nb - 2
                        data = _encode_cblk(blk, btype, nb)
                        _w_npasses(wr, npass)
                        lblock = 3
                        need = len(data).bit_length()
                        avail = lblock + int(math.floor(math.log2(npass)))
                        k = max(0, need - avail)
                        for _ in range(k):
                            wr.bit(1)
                        wr.bit(0)
                        lblock += k
                        wr.bits(len(data),
                                lblock + int(math.floor(math.log2(npass))))
                        cbs.append(data)
        body += wr.flush()
        for data in cbs:
            body += data

    # subband exponent order must match the packet order: LL then
    # (HL, LH, HH) per resolution
    exps = [depth + 0]
    for _ in range(levels):
        exps += [depth + 1, depth + 1, depth + 2]

    out = bytearray()
    out += struct.pack(">H", 0xFF4F)                       # SOC
    siz = struct.pack(">HIIIIIIIIH", 0, W, H, 0, 0, W, H, 0, 0, 1)
    siz += bytes([depth - 1, 1, 1])
    out += struct.pack(">HH", 0xFF51, 2 + len(siz)) + siz
    cod = bytes([0]) + struct.pack(">BHB", 0, 1, 0)        # LRCP, 1 layer
    cod += bytes([levels, cb_exp - 2, cb_exp - 2, 0, 1])
    out += struct.pack(">HH", 0xFF52, 2 + len(cod)) + cod
    qcd = bytes([guard << 5]) + bytes(e << 3 for e in exps)
    out += struct.pack(">HH", 0xFF5C, 2 + len(qcd)) + qcd
    psot = 12 + 2 + len(body)
    out += struct.pack(">HHHIBB", 0xFF90, 10, 0, psot, 0, 1)   # SOT
    out += struct.pack(">H", 0xFF93)                       # SOD
    out += body
    out += struct.pack(">H", 0xFFD9)                       # EOC
    return bytes(out)
