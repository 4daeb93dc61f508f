"""Baseline JPEG codec — from-scratch (numpy + stdlib; no PIL/ImageIO in
this container), covering the reference's IMGEXTS jpg/jpeg role (S8/K8,
src/GeoIO.jl:66, test io/images.jl: load + lossy save with PSNR
equality).

Scope: baseline DCT (SOF0) and progressive DCT (SOF2, ITU T.81 Annex G:
spectral selection + successive approximation, DC first/refine
interleaved or single-component, AC first/refine with EOB runs) —
progressive is the dominant shape of real web JPEGs, so the multimodal
hash path must not null them out (VERDICT r5 item 4).  Huffman entropy
coding, 8-bit samples, grayscale / YCbCr 3-component, arbitrary h×v
sampling factors on decode (the fixture image.jpg is 4:4:4), restart
intervals.  Encode emits baseline 4:4:4 with the Annex-K standard
quantization + Huffman tables.

This is a driver-side interchange codec (same role as the PNG codec):
the distributed path stores decoded grids as parquet.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# 8x8 DCT-II basis matrix: M[u, x] = c(u) cos((2x+1)uπ/16) / 2
_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = np.sqrt(0.5) if _u == 0 else 1.0
        _M[_u, _x] = 0.5 * c * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K.1 standard quantization tables (natural order)
QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# Annex K.3 standard Huffman tables: (bits[1..16], values)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_codes(bits, values):
    """Canonical Huffman: (symbol -> (code, length)) and the 16-bit
    peek LUT (sym, len) used by the decoder."""
    codes = {}
    code = 0
    k = 0
    lut_sym = np.zeros(65536, dtype=np.int16)
    lut_len = np.zeros(65536, dtype=np.int8)
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            sym = values[k]
            codes[sym] = (code, ln)
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            lut_sym[lo:hi] = sym
            lut_len[lo:hi] = ln
            code += 1
            k += 1
        code <<= 1
    # plain lists: scalar indexing is ~3x faster than numpy in the
    # per-symbol decode loop
    return codes, lut_sym.tolist(), lut_len.tolist()


class _BitReader:
    __slots__ = ("d", "n", "pos", "acc", "bits")

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.bits = 0

    def _fill(self, need: int) -> None:
        while self.bits < need:
            b = self.d[self.pos] if self.pos < self.n else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            self.bits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.bits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.bits -= n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        v = (self.acc >> (self.bits - n)) & ((1 << n) - 1)
        self.bits -= n
        return v

    def align(self) -> None:
        self.bits -= self.bits % 8


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode(buf: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, ncomp) uint8 array."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple] = {}  # (class, id) -> luts
    frame = None
    progressive = False
    state = None          # progressive: per-component coefficient store
    dri = 0
    i = 2
    while i < len(buf):
        if buf[i] != 0xFF:
            i += 1
            continue
        m = buf[i + 1]
        if m == 0xD9:     # EOI — progressive: all scans consumed
            break
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        ln = struct.unpack_from(">H", buf, i + 2)[0]
        seg = buf[i + 4:i + 2 + ln]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.int32)
                    p += 65
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, p + 1).astype(np.int32)
                    p += 129
                nat = np.zeros(64, np.int32)
                nat[ZIGZAG] = tbl
                qt[tq] = nat
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                huff[(tc, th)] = _build_codes(bits, values)
                p += 17 + nv
        elif m in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            h = struct.unpack_from(">H", seg, 1)[0]
            w = struct.unpack_from(">H", seg, 3)[0]
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15,
                              "tq": tq})
            frame = (h, w, comps)
            progressive = m == 0xC2
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type FF{m:02X} "
                             "(baseline SOF0 / progressive SOF2 only)")
        elif m == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:  # SOS → entropy-coded data follows
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tabs >> 4, tabs & 15))
            data_start = i + 2 + ln
            if not progressive:
                return _decode_scan(buf, data_start, frame, scan, qt,
                                    huff, dri)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            if state is None:
                state = _prog_state(frame)
            i = _progressive_scan(buf, data_start, frame, state, scan,
                                  ss, se, ah, al, huff, dri)
            continue
        i += 2 + ln
    if progressive and state is not None:
        coefs = [np.array(state[c["id"]]["cf"], np.int32).reshape(-1, 64)
                 for c in frame[2]]
        return _reconstruct(frame, qt, coefs)
    raise ValueError("no SOS marker found")


def _decode_scan(buf, start, frame, scan, qt, huff, dri):
    h, w, comps = frame
    # destuff: FF00 → FF; stop markers handled via restart alignment
    data = bytearray()
    i = start
    rst_positions = []
    while i < len(buf) - 1:
        b = buf[i]
        if b == 0xFF:
            nxt = buf[i + 1]
            if nxt == 0x00:
                data.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn: strip, note boundary
                rst_positions.append(len(data))
                i += 2
                continue
            break  # EOI or next marker
        data.append(b)
        i += 1
    br = _BitReader(bytes(data))
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan:
        c = by_id[cs]
        c["dc"] = huff[(0, td)]
        c["ac"] = huff[(1, ta)]
        order.append(c)
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row
        c["nblocks"] = mcuy * c["v"] * c["bw"]
        c["idx"] = []  # sparse (flat index, value) accumulation: one bulk
        c["val"] = []  # numpy write at the end beats 101k row views
        c["pred"] = 0

    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if dri and mcu and mcu % dri == 0:
            br.align()
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mcu, mcux)
        for c in order:
            _dcsym, dc_ls, dc_ll = c["dc"]
            _acsym, ac_ls, ac_ll = c["ac"]
            peek16, skip, read = br.peek16, br.skip, br.read
            idx, val = c["idx"], c["val"]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    base = ((my * c["v"] + v) * c["bw"]
                            + mx * c["h"] + hh) * 64
                    p = peek16()
                    s = dc_ls[p]
                    skip(dc_ll[p])
                    if s:
                        c["pred"] += _extend(read(s), s)
                    idx.append(base)
                    val.append(c["pred"])
                    k = 1
                    while k < 64:
                        p = peek16()
                        rs = ac_ls[p]
                        skip(ac_ll[p])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break
                            k += 16
                            continue
                        k += r
                        idx.append(base + k)
                        val.append(_extend(read(s), s))
                        k += 1

    coefs = []
    for c in comps:
        coef = np.zeros((c["nblocks"], 64), np.int32)
        coef.flat[np.asarray(c["idx"], np.int64)] = c["val"]
        coefs.append(coef)
    return _reconstruct(frame, qt, coefs)


def _reconstruct(frame, qt, coefs):
    """Shared tail of baseline and progressive decode: zigzag-ordered
    (nblocks, 64) coefficient arrays → dequant → IDCT → color."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c, coef in zip(comps, coefs):
        q = qt[c["tq"]]
        # coefficients are still zigzag-ordered here — dequantize with
        # the zigzag view of the (natural-order) table, then de-zigzag
        coef = coef * q[ZIGZAG][None, :]
        nat = np.zeros_like(coef)
        nat[:, ZIGZAG] = coef
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        # IDCT-2D: M^T @ B @ M
        pix = np.einsum("ux,nuv,vy->nxy", _M, blocks, _M) + 128.0
        nby = mcuy * c["v"]
        nbx = mcux * c["h"]
        img = pix.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(
            nby * 8, nbx * 8)
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            img = img.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(img[:h, :w])
    out = np.stack(planes, axis=2)
    if out.shape[2] == 3:  # YCbCr → RGB (JFIF)
        y, cb, cr = out[..., 0], out[..., 1] - 128.0, out[..., 2] - 128.0
        out = np.stack([
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) scan decoding — ITU T.81 Annex G
# ---------------------------------------------------------------------------

def _prog_state(frame):
    """Per-component coefficient store for progressive decode.

    ``cf`` is a flat Python list (nblocks*64, zigzag order within each
    block) — scalar updates dominate progressive scans and list access
    beats numpy item access ~3x; one bulk np.array at the end.
    ``bwc``/``bhc`` are the DATA-AREA block counts (ceil of the
    component's own pixel dims / 8) walked by non-interleaved scans,
    while the store is allocated on the MCU-padded grid (``nbx`` per
    row) that interleaved DC scans and the final IDCT use — T.81 G.2:
    the two grids differ for subsampled components whose size is not a
    multiple of the MCU."""
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    state = {"mcux": mcux, "mcuy": mcuy}
    for c in comps:
        nbx = mcux * c["h"]
        nby = mcuy * c["v"]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        state[c["id"]] = {
            "nbx": nbx,
            "nblocks": nbx * nby,
            "bwc": -(-cw // 8),
            "bhc": -(-ch // 8),
            "cf": [0] * (nbx * nby * 64),
            "pred": 0,
        }
    return state


def _destuff(buf, start):
    """Strip byte stuffing and RST markers from one scan's entropy data;
    returns (data, end) where ``end`` indexes the terminating marker."""
    data = bytearray()
    i = start
    n = len(buf)
    while i < n - 1:
        b = buf[i]
        if b == 0xFF:
            nxt = buf[i + 1]
            if nxt == 0x00:
                data.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                i += 2
                continue
            break  # next real marker ends the scan
        data.append(b)
        i += 1
    return bytes(data), i


def _progressive_scan(buf, start, frame, state, scan, ss, se, ah, al,
                      huff, dri):
    """Decode one progressive scan into the coefficient store; returns
    the buffer index of the marker that ended the scan."""
    h, w, comps = frame
    data, end = _destuff(buf, start)
    br = _BitReader(data)
    by_id = {c["id"]: c for c in comps}
    mcux, mcuy = state["mcux"], state["mcuy"]

    def restart(units_done):
        if dri and units_done and units_done % dri == 0:
            br.align()
            for cs, _, _ in scan:
                state[cs]["pred"] = 0
            return True
        return False

    if ss == 0 and ah == 0:                    # DC first (G.1.2.1)
        if len(scan) > 1:                      # interleaved MCU walk
            per_mcu = []
            for cs, td, _ in scan:
                c = by_id[cs]
                per_mcu.append((state[cs], c["h"], c["v"],
                                huff[(0, td)]))
            for mcu in range(mcux * mcuy):
                restart(mcu)
                my, mx = divmod(mcu, mcux)
                for st, chh, cv, (_s, ls, ll) in per_mcu:
                    cf, nbx = st["cf"], st["nbx"]
                    for v in range(cv):
                        for hh in range(chh):
                            base = ((my * cv + v) * nbx
                                    + mx * chh + hh) * 64
                            p = br.peek16()
                            s = ls[p]
                            br.skip(ll[p])
                            if s:
                                st["pred"] += _extend(br.read(s), s)
                            cf[base] = st["pred"] << al
        else:                                  # single-component walk
            cs, td, _ = scan[0]
            st = state[cs]
            _s, ls, ll = huff[(0, td)]
            cf, nbx = st["cf"], st["nbx"]
            blk = 0
            for by in range(st["bhc"]):
                for bx in range(st["bwc"]):
                    restart(blk)
                    blk += 1
                    p = br.peek16()
                    s = ls[p]
                    br.skip(ll[p])
                    if s:
                        st["pred"] += _extend(br.read(s), s)
                    cf[(by * nbx + bx) * 64] = st["pred"] << al
    elif ss == 0:                              # DC refinement (G.1.2.1)
        if len(scan) > 1:
            per_mcu = [(state[cs], by_id[cs]["h"], by_id[cs]["v"])
                       for cs, _, _ in scan]
            for mcu in range(mcux * mcuy):
                restart(mcu)
                my, mx = divmod(mcu, mcux)
                for st, chh, cv in per_mcu:
                    cf, nbx = st["cf"], st["nbx"]
                    for v in range(cv):
                        for hh in range(chh):
                            base = ((my * cv + v) * nbx
                                    + mx * chh + hh) * 64
                            if br.read(1):
                                cf[base] |= 1 << al
        else:
            st = state[scan[0][0]]
            cf, nbx = st["cf"], st["nbx"]
            blk = 0
            for by in range(st["bhc"]):
                for bx in range(st["bwc"]):
                    restart(blk)
                    blk += 1
                    if br.read(1):
                        cf[(by * nbx + bx) * 64] |= 1 << al
    else:                                      # AC scans: ns == 1 (G.2)
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be one component")
        cs, _, ta = scan[0]
        st = state[cs]
        _s, ls, ll = huff[(1, ta)]
        cf, nbx = st["cf"], st["nbx"]
        eobrun = 0
        blk = 0
        for by in range(st["bhc"]):
            for bx in range(st["bwc"]):
                if restart(blk):
                    eobrun = 0
                blk += 1
                base = (by * nbx + bx) * 64
                if ah == 0:                    # AC first (G.1.2.2)
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        p = br.peek16()
                        rs = ls[p]
                        br.skip(ll[p])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:        # EOBn
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read(r)
                                break
                            k += 16            # ZRL
                            continue
                        k += r
                        cf[base + k] = _extend(br.read(s), s) << al
                        k += 1
                else:                          # AC refinement (G.1.2.3)
                    eobrun = _refine_ac_block(br, ls, ll, cf, base,
                                              ss, se, al, eobrun)
    return end


def _refine_ac_block(br, ls, ll, cf, base, ss, se, al, eobrun):
    """Successive-approximation AC refinement for one block: newly
    significant coefficients arrive as ±1<<al; every nonzero history
    coefficient passed gets a correction bit (T.81 G.1.2.3)."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            p = br.peek16()
            rs = ls[p]
            br.skip(ll[p])
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    # EOBn: the run count INCLUDES this block — its
                    # remaining nonzero-history coefficients still get
                    # correction bits in the tail below (unlike first
                    # scans, where EOB means "rest is zero, no bits")
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                # r == 15: ZRL — pass 16 zero-history coefficients
            else:
                val = p1 if br.read(1) else -p1
            while k <= se:
                c = cf[base + k]
                if c != 0:
                    if br.read(1) and (abs(c) & p1) == 0:
                        cf[base + k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        if val:
                            cf[base + k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        # inside an EOB run: only correction bits for nonzero history
        while k <= se:
            c = cf[base + k]
            if c != 0:
                if br.read(1) and (abs(c) & p1) == 0:
                    cf[base + k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4, standard tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | code
        self.bits += n
        while self.bits >= 8:
            b = (self.acc >> (self.bits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.bits -= 8
        self.acc &= (1 << self.bits) - 1

    def flush(self) -> None:
        if self.bits:
            self.write(0x7F >> (7 - ((8 - self.bits) % 8)), (8 - self.bits) % 8)


def _scale_q(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int32)


def _cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def quantized_coefficients(arr: np.ndarray, quality: int = 90):
    """(h, w[, 1|3]) uint8 → per-component quantized zigzag coefficient
    arrays, plus the scaled quantization tables — the lossy half of
    baseline AND progressive encoding (they differ only in how these
    integers are entropy-coded, so sharing this step lets a test
    compare the two entropy layers bit-exactly).

    Returns (comps_zz, qts, h, w, nc): comps_zz[c] is (nblocks, 64)
    int32 in zigzag order, 4:4:4 sampling."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc == 3:  # RGB → YCbCr
        r, g, b = (arr[..., k].astype(np.float64) for k in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    else:
        planes = [arr[..., 0].astype(np.float64)]
    ql = _scale_q(QL, quality)
    qc = _scale_q(QC, quality)
    qts = [ql] + ([qc] if nc == 3 else [])
    comps_zz = []
    bh, bw = -(-h // 8), -(-w // 8)
    for ci, plane in enumerate(planes):
        pad = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        blocks = blocks - 128.0
        dct = np.einsum("ux,nxy,vy->nuv", _M, blocks, _M)
        # quantize in natural order, then zigzag-scan the coefficients
        qnat = np.zeros((8, 8), np.float64)
        qnat.flat[:] = qts[min(ci, 1)]
        quant = np.round(dct / qnat[None, :, :]).astype(np.int32)
        comps_zz.append(quant.reshape(-1, 64)[:, ZIGZAG])
    return comps_zz, qts, h, w, nc


def encode(arr: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 1|3) uint8 → baseline JPEG bytes (4:4:4, Annex-K tables)."""
    comps_zz, qts, h, w, nc = quantized_coefficients(arr, quality)
    dch = [_build_codes(*_DC_L)[0]] + ([_build_codes(*_DC_C)[0]] if nc == 3 else [])
    ach = [_build_codes(*_AC_L)[0]] + ([_build_codes(*_AC_C)[0]] if nc == 3 else [])
    bh, bw = -(-h // 8), -(-w // 8)

    bwt = _BitWriter()
    preds = [0] * nc
    for bi in range(bh * bw):
        for ci in range(nc):
            zz = comps_zz[ci][bi]
            ti = min(ci, 1)
            dc, ac = dch[ti], ach[ti]
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            s = _cat(diff)
            code, ln = dc[s]
            bwt.write(code, ln)
            if s:
                v = diff if diff >= 0 else diff + (1 << s) - 1
                bwt.write(v & ((1 << s) - 1), s)
            run = 0
            last = 63
            while last > 0 and zz[last] == 0:
                last -= 1
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac[0xF0]
                    bwt.write(code, ln)
                    run -= 16
                s = _cat(v)
                code, ln = ac[(run << 4) | s]
                bwt.write(code, ln)
                vv = v if v >= 0 else v + (1 << s) - 1
                bwt.write(vv & ((1 << s) - 1), s)
                run = 0
            if last < 63:
                code, ln = ac[0x00]  # EOB
                bwt.write(code, ln)
    bwt.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    for tq, tbl in enumerate(qts):
        # DQT payload is zigzag-ordered in the file
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(x) for x in tbl[ZIGZAG])
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0, 0, _DC_L), (1, 0, _AC_L)]
    if nc == 3:
        tables += [(0, 1, _DC_C), (1, 1, _AC_C)]
    for tc, th, (bits, values) in tables:
        seg = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, (min(ci, 1) << 4) | min(ci, 1)])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bwt.out
    out += b"\xff\xd9"
    return bytes(out)
