"""Minimal JPEG 2000 Part-1 (ISO/IEC 15444-1) lossless codestream decoder.

Purpose: GRIB2 data-representation template 5.40 (JPEG 2000 packing, the
other packing NCEP archives use besides PNG 5.41).  The reference reaches
this template through eccodes/GRIBDatasets (src/extra/cdm.jl:5); this
repo decodes it natively, mirroring how the TIFF/PNG/JPEG/HDF5 codecs are
hand-rolled (no imaging libraries in the sandbox).

Scope — the subset the GRIB encoders (Jasper / OpenJPEG driven by NCEP's
g2clib `jpcpack`) emit for lossless fields, enforced with named errors:

- raw codestream (SOC…EOC), no JP2 container boxes
- single tile, single component, all offsets zero, no subsampling
- reversible 5/3 wavelet (Annex F), no quantization (Annex E, style 0)
- one quality layer, no precinct partition (maximal precincts), default
  code-block style (no bypass/reset/termall/causal/predictable/segsym)
- any progression order (under the above constraints every order reduces
  to packets in increasing-resolution order)

All structure follows the published spec text: MQ coder tables and
flowcharts (Annex C), tag trees and packet headers (Annex B), EBCOT
coefficient-bit modelling (Annex D), reversible filter and boundary
extension (Annex F).  Independently-written encoder used for
differential tests lives in tests/j2k_encoder.py.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# Annex C, Table C.2 — probability state machine:
# (Qe, next-state MPS, next-state LPS, switch-MPS flag)
MQ_TABLE = (
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

# Tier-1 context numbering used here: 0-8 zero coding, 9-13 sign coding,
# 14-16 magnitude refinement, 17 run-length (aggregation), 18 uniform.
CTX_RL = 17
CTX_UNI = 18
N_CTX = 19


def _init_ctx_states() -> list[list[int]]:
    """Initial (state, MPS) per context — Annex D: all zero except the
    all-zero-neighbourhood ZC context (state 4), run-length (state 3)
    and uniform (state 46)."""
    I = [0] * N_CTX
    mps = [0] * N_CTX
    I[0] = 4
    I[CTX_RL] = 3
    I[CTX_UNI] = 46
    return [I, mps]


class MQDecoder:
    """MQ arithmetic decoder (Annex C.3 software conventions).

    Reads past the end of the segment as 0xFF/marker bytes (the spec's
    1-feeding termination), so any legal encoder termination works."""

    def __init__(self, data: bytes):
        self.d = data
        self.bp = 0
        ctx = _init_ctx_states()
        self.I, self.mps = ctx[0], ctx[1]
        self.c = self._byte(0) << 16
        self.ct = 0
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.d[i] if i < len(self.d) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:      # marker: feed 1s
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8
        self.c &= 0xFFFFFFFF

    def decode(self, cx: int) -> int:
        qe, nmps, nlps, sw = MQ_TABLE[self.I[cx]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange (Annex C.3.2)
            if self.a < qe:
                d = self.mps[cx]
                self.I[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if sw:
                    self.mps[cx] ^= 1
                self.I[cx] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                # MPS exchange
                if self.a < qe:
                    d = 1 - self.mps[cx]
                    if sw:
                        self.mps[cx] ^= 1
                    self.I[cx] = nlps
                else:
                    d = self.mps[cx]
                    self.I[cx] = nmps
                self._renorm()
            else:
                d = self.mps[cx]
        return d

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break


class HdrReader:
    """Packet-header bit reader with 0xFF bit-stuffing (Annex B.10.1):
    the byte following a 0xFF carries only 7 bits."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.buf = 0
        self.ct = 0

    def bit(self) -> int:
        if self.ct == 0:
            prev = self.buf & 0xFF
            b = self.d[self.pos]
            self.pos += 1
            self.buf = ((self.buf << 8) | b) & 0xFFFF
            self.ct = 7 if prev == 0xFF else 8
        self.ct -= 1
        return (self.buf >> self.ct) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        """End of packet header: byte-align; a header whose final byte is
        0xFF is followed by a stuffed byte that belongs to the header."""
        self.ct = 0
        if (self.buf & 0xFF) == 0xFF:
            self.buf = ((self.buf << 8) | self.d[self.pos]) & 0xFFFF
            self.pos += 1


class _Node:
    __slots__ = ("low", "value", "known")

    def __init__(self):
        self.low = 0
        self.value = 0
        self.known = False


class TagTree:
    """Tag tree (Annex B.10.2) — decoder side; state persists across
    decode calls as the threshold grows packet by packet."""

    def __init__(self, w: int, h: int):
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        self.levels = [[_Node() for _ in range(wd * hd)]
                       for wd, hd in self.dims]

    def _path(self, x: int, y: int):
        for lev in range(len(self.dims) - 1, -1, -1):
            w, _ = self.dims[lev]
            yield self.levels[lev][(y >> lev) * w + (x >> lev)]

    def decode(self, rdr: HdrReader, x: int, y: int, threshold: int) -> bool:
        """True iff the leaf value is determined to be < threshold."""
        low = 0
        node = None
        for node in self._path(x, y):
            if node.low < low:
                node.low = low
            while not node.known and node.low < threshold:
                if rdr.bit():
                    node.known = True
                    node.value = node.low
                else:
                    node.low += 1
            if not node.known:
                return False
            low = node.value
        return node.value < threshold

    def decode_value(self, rdr: HdrReader, x: int, y: int) -> int:
        t = 1
        while not self.decode(rdr, x, y, t):
            t += 1
        w, _ = self.dims[0]
        return self.levels[0][y * w + x].value


# ---------------------------------------------------------------------------
# Tier-1: EBCOT coefficient-bit decoding (Annex D)

_BAND_LL, _BAND_HL, _BAND_LH, _BAND_HH = 0, 1, 2, 3

# Sign-coding contexts, Table D.3: (Hc, Vc) in {-1,0,1}² → (ctx, XOR bit)
_SC_TABLE = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


def _zc_ctx(band: int, hh: int, vv: int, dd: int) -> int:
    """Zero-coding context, Table D.1.  LL/LH use horizontal-primary,
    HL swaps the roles, HH is diagonal-primary."""
    if band == _BAND_HL:
        hh, vv = vv, hh
    if band != _BAND_HH:
        if hh == 2:
            return 8
        if hh == 1:
            if vv >= 1:
                return 7
            return 6 if dd >= 1 else 5
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
        if hv >= 2:
            return 5
        return 4 if hv == 1 else 3
    return 2 if hv >= 2 else hv


def decode_codeblock(mq: MQDecoder, w: int, h: int, band: int,
                     numbps: int, npasses: int) -> np.ndarray:
    """Decode one code-block's coefficient bits → signed int64 (h, w).

    Arrays are padded one sample on every side so neighbourhood reads
    need no bounds checks; (y, x) below are padded coordinates."""
    sig = np.zeros((h + 2, w + 2), np.bool_)
    vis = np.zeros((h + 2, w + 2), np.bool_)
    neg = np.zeros((h + 2, w + 2), np.bool_)
    ref = np.zeros((h + 2, w + 2), np.bool_)
    mag = np.zeros((h + 2, w + 2), np.int64)
    dec = mq.decode

    def nbhd(y, x):
        return (int(sig[y, x - 1]) + int(sig[y, x + 1])
                + int(sig[y - 1, x]) + int(sig[y + 1, x])
                + int(sig[y - 1, x - 1]) + int(sig[y - 1, x + 1])
                + int(sig[y + 1, x - 1]) + int(sig[y + 1, x + 1]))

    def zc(y, x):
        hh = int(sig[y, x - 1]) + int(sig[y, x + 1])
        vv = int(sig[y - 1, x]) + int(sig[y + 1, x])
        dd = (int(sig[y - 1, x - 1]) + int(sig[y - 1, x + 1])
              + int(sig[y + 1, x - 1]) + int(sig[y + 1, x + 1]))
        return _zc_ctx(band, hh, vv, dd)

    def decode_sign(y, x):
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
        ctx, xor = _SC_TABLE[(hc, vc)]
        return dec(ctx) ^ xor

    def spp(p):
        bit = np.int64(1) << p
        for ys in range(1, h + 1, 4):
            for x in range(1, w + 1):
                for y in range(ys, min(ys + 4, h + 1)):
                    if not sig[y, x] and nbhd(y, x):
                        if dec(zc(y, x)):
                            s = decode_sign(y, x)
                            sig[y, x] = True
                            neg[y, x] = bool(s)
                            mag[y, x] |= bit
                        vis[y, x] = True

    def mrp(p):
        bit_p = p
        for ys in range(1, h + 1, 4):
            for x in range(1, w + 1):
                for y in range(ys, min(ys + 4, h + 1)):
                    if sig[y, x] and not vis[y, x]:
                        if ref[y, x]:
                            ctx = 16
                        else:
                            ctx = 15 if nbhd(y, x) else 14
                        mag[y, x] |= np.int64(dec(ctx)) << bit_p
                        ref[y, x] = True

    def cp(p):
        bit = np.int64(1) << p
        for ys in range(1, h + 1, 4):
            y_end = min(ys + 4, h + 1)
            for x in range(1, w + 1):
                start = ys
                if (y_end - ys == 4
                        and not any(sig[y, x] or vis[y, x] or nbhd(y, x)
                                    for y in range(ys, y_end))):
                    if dec(CTX_RL) == 0:
                        continue
                    r = (dec(CTX_UNI) << 1) | dec(CTX_UNI)
                    y = ys + r
                    s = decode_sign(y, x)
                    sig[y, x] = True
                    neg[y, x] = bool(s)
                    mag[y, x] |= bit
                    start = y + 1
                for y in range(start, y_end):
                    if sig[y, x] or vis[y, x]:
                        continue
                    if dec(zc(y, x)):
                        s = decode_sign(y, x)
                        sig[y, x] = True
                        neg[y, x] = bool(s)
                        mag[y, x] |= bit
        vis[:] = False

    done = 0
    for p in range(numbps - 1, -1, -1):
        if p != numbps - 1:
            if done >= npasses:
                break
            spp(p)
            done += 1
            if done >= npasses:
                break
            mrp(p)
            done += 1
        if done >= npasses:
            break
        cp(p)
        done += 1

    out = mag[1:h + 1, 1:w + 1].copy()
    out[neg[1:h + 1, 1:w + 1]] *= -1
    return out


# ---------------------------------------------------------------------------
# Inverse reversible 5/3 wavelet (Annex F), origin-0 signals

def _syn1d(s: np.ndarray, d: np.ndarray, n: int) -> np.ndarray:
    """1D synthesis along the last axis; whole-sample symmetric extension
    (clamped mirror indices)."""
    if n == 1:
        return s.astype(np.int64, copy=True)
    ns, nd = s.shape[-1], d.shape[-1]
    dm = d[..., np.clip(np.arange(ns) - 1, 0, nd - 1)]
    dp = d[..., np.clip(np.arange(ns), 0, nd - 1)]
    out = np.empty(s.shape[:-1] + (n,), np.int64)
    out[..., 0::2] = s - ((dm + dp + 2) >> 2)
    xe = out[..., 0::2]
    xp = xe[..., np.clip(np.arange(nd) + 1, 0, ns - 1)]
    out[..., 1::2] = d + ((xe[..., :nd] + xp) >> 1)
    return out


def _syn2d(ll: np.ndarray, hl: np.ndarray, lh: np.ndarray,
           hh: np.ndarray) -> np.ndarray:
    """One level of 2D synthesis: horizontal then vertical (2D_SR,
    Annex F.3.4 — the forward transform runs vertical-then-horizontal)."""
    H = ll.shape[0] + lh.shape[0]
    W = ll.shape[1] + hl.shape[1]
    lo = _syn1d(ll, hl, W)               # rows of the low-pass half
    hi = _syn1d(lh, hh, W)               # rows of the high-pass half
    a = _syn1d(lo.T, hi.T, H).T
    return a


# ---------------------------------------------------------------------------
# Codestream parsing (Annex A) + Tier-2 packet decoding (Annex B)

_SOC, _SIZ, _COD, _QCD, _SOT, _SOD, _EOC = (
    0xFF4F, 0xFF51, 0xFF52, 0xFF5C, 0xFF90, 0xFF93, 0xFFD9)
_SOP, _EPH = 0xFF91, 0xFF92
# Safe to skip: COM, TLM, PLM, PLT, CRG (informational), and POC — under
# the 1-layer/1-component/no-precinct constraint every progression order
# yields the same resolution-ordered packet sequence.  COC/QCC/RGN/PPM/PPT
# change decoding and fall through to the unsupported-marker error.
_SKIPPABLE = {0xFF64, 0xFF55, 0xFF57, 0xFF58, 0xFF63, 0xFF5F}


class J2KError(ValueError):
    pass


def _read_npasses(r: HdrReader) -> int:
    if r.bit() == 0:
        return 1
    if r.bit() == 0:
        return 2
    v = r.bits(2)
    if v < 3:
        return 3 + v
    v = r.bits(5)
    if v < 31:
        return 6 + v
    return 37 + r.bits(7)


class _Cblk:
    __slots__ = ("x0", "y0", "w", "h", "lblock", "numbps", "npasses",
                 "nbytes", "band")

    def __init__(self, x0, y0, w, h, band):
        self.x0, self.y0, self.w, self.h = x0, y0, w, h
        self.band = band
        self.lblock = 3
        self.numbps = 0
        self.npasses = 0
        self.nbytes = 0


class _Band:
    def __init__(self, btype: int, w: int, h: int, mb: int,
                 cbw: int, cbh: int):
        self.btype, self.w, self.h, self.mb = btype, w, h, mb
        self.coefs = np.zeros((h, w), np.int64)
        ncx = (w + cbw - 1) // cbw if w else 0
        ncy = (h + cbh - 1) // cbh if h else 0
        self.ncx, self.ncy = ncx, ncy
        self.cblks = []
        for cy in range(ncy):
            for cx in range(ncx):
                x0, y0 = cx * cbw, cy * cbh
                self.cblks.append(_Cblk(
                    x0, y0, min(cbw, w - x0), min(cbh, h - y0), self))
        if ncx and ncy:
            self.itree = TagTree(ncx, ncy)
            self.ztree = TagTree(ncx, ncy)


def decode_j2k(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode a raw lossless J2K codestream → (values (h, w) int64, info).

    Values are the original component samples (DC level shift undone).
    All failures — including truncated/malformed input — surface as
    :class:`J2KError`."""
    try:
        return _decode_j2k_inner(data)
    except J2KError:
        raise
    except (struct.error, IndexError) as exc:
        raise J2KError(f"truncated or malformed codestream: {exc}") from exc


def _decode_j2k_inner(data: bytes) -> tuple[np.ndarray, dict]:
    if len(data) < 4 or struct.unpack_from(">H", data, 0)[0] != _SOC:
        raise J2KError("not a JPEG 2000 codestream (no SOC)")
    pos = 2
    siz = cod = qcd = None
    tile = None
    while pos < len(data):
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == _EOC:
            break
        ln = struct.unpack_from(">H", data, pos + 2)[0]
        seg = data[pos + 4:pos + 2 + ln]
        if marker == _SIZ:
            siz = seg
        elif marker == _COD:
            cod = seg
        elif marker == _QCD:
            qcd = seg
        elif marker == _SOT:
            isot, psot, tpsot, tnsot = struct.unpack_from(">HIBB", seg, 0)
            if isot != 0 or tpsot != 0 or (tnsot not in (0, 1)):
                raise J2KError("multi-tile / multi-tile-part codestream "
                               "unsupported")
            # scan for SOD within the tile-part header; only harmless
            # markers may appear here — a tile-part PPT/COD/QCD/COC/QCC/
            # RGN would change decoding parameters, so skipping one
            # silently would mis-decode (review finding)
            tp = pos + 2 + ln
            while True:
                m2 = struct.unpack_from(">H", data, tp)[0]
                if m2 == _SOD:
                    break
                if m2 not in _SKIPPABLE:
                    raise J2KError(
                        f"unsupported tile-part header marker 0x{m2:04X}")
                l2 = struct.unpack_from(">H", data, tp + 2)[0]
                tp += 2 + l2
            body0 = tp + 2
            body1 = pos + psot if psot else len(data) - 2
            tile = data[body0:body1]
            pos = body1
            continue
        elif marker not in _SKIPPABLE:
            raise J2KError(f"unsupported marker 0x{marker:04X}")
        pos += 2 + ln
    if siz is None or cod is None or qcd is None or tile is None:
        raise J2KError("missing SIZ/COD/QCD/tile data")

    (_rsiz, xs, ys, xo, yo, xts, yts, xto, yto, ncomp
     ) = struct.unpack_from(">HIIIIIIIIH", siz, 0)
    if ncomp != 1:
        raise J2KError(f"{ncomp} components; GRIB 5.40 carries one")
    if xo or yo or xto or yto:
        raise J2KError("nonzero image/tile offsets unsupported")
    if xts < xs or yts < ys:
        raise J2KError("multiple tiles unsupported")
    ssiz, xrs, yrs = siz[36], siz[37], siz[38]
    if xrs != 1 or yrs != 1:
        raise J2KError("component subsampling unsupported")
    depth = (ssiz & 0x7F) + 1
    signed = bool(ssiz & 0x80)
    W, H = xs, ys

    scod = cod[0]
    if scod & 0x01:
        raise J2KError("precinct partition unsupported")
    use_sop, use_eph = bool(scod & 0x02), bool(scod & 0x04)
    nlayers = struct.unpack_from(">H", cod, 2)[0]
    if nlayers != 1:
        raise J2KError(f"{nlayers} quality layers; lossless GRIB uses 1")
    nlev = cod[5]
    cbw = 1 << ((cod[6] & 0xF) + 2)
    cbh = 1 << ((cod[7] & 0xF) + 2)
    if cod[8] != 0:
        raise J2KError(f"code-block style 0x{cod[8]:02X} unsupported "
                       "(bypass/reset/termall/causal/segsym)")
    if cod[9] != 1:
        raise J2KError("irreversible 9/7 wavelet — GRIB 5.40 lossless "
                       "requires the 5/3 filter")

    if (qcd[0] & 0x1F) != 0:
        raise J2KError("quantization present — expected reversible "
                       "(no quantization)")
    guard = qcd[0] >> 5
    exps = [b >> 3 for b in qcd[1:]]
    if len(exps) < 3 * nlev + 1:
        raise J2KError("QCD too short for decomposition levels")

    # geometry: dims[l] = LL size after l decompositions
    dims = [(W, H)]
    for _ in range(nlev):
        w0, h0 = dims[-1]
        dims.append(((w0 + 1) // 2, (h0 + 1) // 2))

    resolutions = []
    ei = 0
    llw, llh = dims[nlev]
    mb = guard + exps[ei] - 1
    ei += 1
    resolutions.append([_Band(_BAND_LL, llw, llh, mb, cbw, cbh)])
    for r in range(1, nlev + 1):
        lev = nlev - r + 1
        pw, ph = dims[lev - 1]
        lw, lh = dims[lev]
        hw, hh_ = pw - lw, ph - lh
        bands = []
        for btype, bw, bh in ((_BAND_HL, hw, lh), (_BAND_LH, lw, hh_),
                              (_BAND_HH, hw, hh_)):
            mb = guard + exps[ei] - 1
            ei += 1
            bands.append(_Band(btype, bw, bh, mb, cbw, cbh))
        resolutions.append(bands)

    # Tier-2: one packet per resolution (single layer/component/precinct)
    pos = 0
    for bands in resolutions:
        if use_sop:
            if struct.unpack_from(">H", tile, pos)[0] == _SOP:
                pos += 6
        rdr = HdrReader(tile, pos)
        incl: list[_Cblk] = []
        if rdr.bit():
            for band in bands:
                if not (band.ncx and band.ncy):
                    continue
                for cb in band.cblks:
                    cx = cb.x0 // cbw
                    cy = cb.y0 // cbh
                    if not band.itree.decode(rdr, cx, cy, 1):
                        continue
                    zbp = band.ztree.decode_value(rdr, cx, cy)
                    cb.numbps = band.mb - zbp
                    cb.npasses = _read_npasses(rdr)
                    while rdr.bit():
                        cb.lblock += 1
                    nbits = cb.lblock + int(math.floor(
                        math.log2(cb.npasses)))
                    cb.nbytes = rdr.bits(nbits)
                    incl.append(cb)
        rdr.align()
        pos = rdr.pos
        if use_eph:
            if struct.unpack_from(">H", tile, pos)[0] == _EPH:
                pos += 2
        for cb in incl:
            seg = tile[pos:pos + cb.nbytes]
            pos += cb.nbytes
            mq = MQDecoder(seg)
            band = cb.band
            band.coefs[cb.y0:cb.y0 + cb.h, cb.x0:cb.x0 + cb.w] = \
                decode_codeblock(mq, cb.w, cb.h, band.btype,
                                 cb.numbps, cb.npasses)

    # inverse DWT
    ll = resolutions[0][0].coefs
    for r in range(1, nlev + 1):
        hl, lh, hh = (b.coefs for b in resolutions[r])
        ll = _syn2d(ll, hl, lh, hh)

    if not signed:
        ll = ll + (1 << (depth - 1))     # undo DC level shift
    info = {"width": W, "height": H, "depth": depth, "signed": signed,
            "levels": nlev}
    return ll, info
