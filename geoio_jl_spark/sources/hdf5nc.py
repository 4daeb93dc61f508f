"""Minimal from-scratch HDF5 reader for NetCDF-4 files (S9,
src/extra/cdm.jl semantics; no netCDF4/h5py in this container).

Implements the subset of the public HDF5 file-format spec that
netCDF-4 writers actually produce (all six reference fixtures
``test*.nc`` confirmed in this shape):

- superblock v0/v2/v3
- object headers v1 and v2 ("OHDR"), with continuation blocks
- group links via Link messages (0x06) and old-style symbol tables
  (v1 B-tree + local heap)
- dataspace v1/v2, datatype classes fixed-point / float / string /
  vlen / reference, attribute messages v1/v2/v3
- data layout v3: compact, contiguous, and chunked (v1 B-tree index)
  with deflate (filter 1) + shuffle (filter 2)
- global heap collections ("GCOL") for vlen attribute values — needed
  for the netCDF ``DIMENSION_LIST`` dimension mapping

The public surface is :func:`read_raw`, which returns the same
``{dims, gatts, vars}`` dict as ``netcdf3.read_raw`` so the CDM grid
assembly (cdm.jl:61-80) is shared between classic and HDF5 files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


class H5File:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        b = self.buf
        if b[:8] != b"\x89HDF\r\n\x1a\n":
            raise ValueError("not an HDF5 file")
        ver = b[8]
        if ver in (2, 3):
            self.offsz, self.lensz = b[9], b[10]
            self.root = self._u(36, self.offsz)
        elif ver in (0, 1):
            self.offsz, self.lensz = b[13], b[14]
            # root group symbol-table entry follows the driver info addr
            ste = 24 + 4 * self.offsz + (4 if ver == 1 else 0)
            self.root = self._u(ste + self.offsz, self.offsz)
        else:
            raise ValueError(f"unsupported superblock v{ver}")

    def _u(self, pos: int, n: int) -> int:
        return int.from_bytes(self.buf[pos:pos + n], "little")

    # -- object headers ----------------------------------------------------

    def messages(self, oh: int):
        """Yield (type, payload_pos, size) for a v1 or v2 object header."""
        b = self.buf
        if b[oh:oh + 4] == b"OHDR":
            flags = b[oh + 5]
            pos = oh + 6
            if flags & 0x20:
                pos += 16
            if flags & 0x10:
                pos += 4
            szb = 1 << (flags & 0x3)
            chunk0 = self._u(pos, szb)
            pos += szb
            yield from self._msgs_v2(pos, pos + chunk0, bool(flags & 0x4))
        else:  # v1: ver(1) res(1) nmsgs(2) refcount(4) hdrsize(4) pad(4)
            nmsgs = self._u(oh + 2, 2)
            size = self._u(oh + 8, 4)
            yield from self._msgs_v1(oh + 16, size, nmsgs)

    def _msgs_v1(self, start: int, size: int, nmsgs: int):
        # nmsgs counts messages ACROSS all blocks; messages after a
        # continuation message in the same block still belong, so blocks
        # are processed as a queue with one shared counter
        blocks = [(start, start + size)]
        seen = 0
        while blocks and seen < nmsgs:
            pos, end = blocks.pop(0)
            while seen < nmsgs and pos + 8 <= end:
                mtype = self._u(pos, 2)
                msize = self._u(pos + 2, 2)
                pos += 8
                seen += 1
                if mtype == 0x10:  # continuation: addr + len
                    caddr = self._u(pos, self.offsz)
                    clen = self._u(pos + self.offsz, self.lensz)
                    blocks.append((caddr, caddr + clen))
                else:
                    yield mtype, pos, msize
                pos += msize

    def _msgs_v2(self, start: int, end: int, corder: bool):
        b = self.buf
        pos = start
        while pos + 4 <= end - 4:  # chunk ends with a 4-byte checksum
            mtype = b[pos]
            msize = self._u(pos + 1, 2)
            pos += 4
            if corder:
                pos += 2
            if pos + msize > end:
                break
            if mtype == 0x10:
                caddr = self._u(pos, self.offsz)
                clen = self._u(pos + self.offsz, self.lensz)
                if self.buf[caddr:caddr + 4] == b"OCHK":
                    yield from self._msgs_v2(caddr + 4, caddr + clen, corder)
            else:
                yield mtype, pos, msize
            pos += msize

    # -- groups --------------------------------------------------------------

    def links(self, oh: int) -> dict[str, int]:
        """name → object-header address for a group."""
        out: dict[str, int] = {}
        for t, p, sz in self.messages(oh):
            if t == 0x06:  # link message
                b = self.buf
                fl = b[p + 1]
                q = p + 2
                ltype = 0
                if fl & 0x8:
                    ltype = b[q]
                    q += 1
                if fl & 0x4:
                    q += 8
                if fl & 0x10:
                    q += 1
                lsz = 1 << (fl & 0x3)
                nlen = self._u(q, lsz)
                q += lsz
                name = b[q:q + nlen].decode()
                q += nlen
                if ltype == 0:
                    out[name] = self._u(q, self.offsz)
            elif t == 0x02:  # link info — dense storage unsupported
                fl = self.buf[p + 1]
                q = p + 2 + (8 if fl & 1 else 0)
                if self._u(q, self.offsz) != UNDEF:
                    raise ValueError("dense (fractal-heap) links unsupported")
            elif t == 0x11:  # old-style symbol table: btree + local heap
                btree = self._u(p, self.offsz)
                heap = self._u(p + self.offsz, self.offsz)
                out.update(self._symbol_table(btree, heap))
        return out

    def _local_heap_data(self, heap: int) -> int:
        assert self.buf[heap:heap + 4] == b"HEAP"
        return self._u(heap + 8 + 2 * self.lensz, self.offsz)

    def _symbol_table(self, btree: int, heap: int) -> dict[str, int]:
        out: dict[str, int] = {}
        data = self._local_heap_data(heap)
        b = self.buf

        def walk(node: int):
            if b[node:node + 4] == b"TREE":
                level = b[node + 5]
                n = self._u(node + 6, 2)
                # keys/children interleaved after two sibling pointers
                q = node + 8 + 2 * self.offsz
                for k in range(n):
                    child = self._u(q + self.lensz, self.offsz)
                    walk(child)
                    q += self.lensz + self.offsz
            elif b[node:node + 4] == b"SNOD":
                n = self._u(node + 6, 2)
                q = node + 8
                for _ in range(n):
                    name_off = self._u(q, self.offsz)
                    addr = self._u(q + self.offsz, self.offsz)
                    name = b[data + name_off:
                             b.index(b"\0", data + name_off)].decode()
                    out[name] = addr
                    q += 2 * self.offsz + 8 + 16

        walk(btree)
        return out

    # -- dataspace / datatype / attributes ------------------------------------

    def dataspace(self, p: int) -> list[int]:
        ver, nd = self.buf[p], self.buf[p + 1]
        q = p + (8 if ver == 1 else 4)
        return [self._u(q + i * self.lensz, self.lensz) for i in range(nd)]

    def datatype(self, p: int) -> dict:
        b = self.buf
        cls = b[p] & 0xF
        bits0 = b[p + 1]
        size = self._u(p + 4, 4)
        d = {"cls": cls, "size": size, "le": not (bits0 & 1)}
        if cls == 0:
            d["signed"] = bool(bits0 & 0x8)
        elif cls == 9:
            d["vtype"] = bits0 & 0xF  # 0 sequence, 1 string
            d["base"] = self.datatype(p + 8)
        return d

    def _np_dtype(self, dt: dict) -> np.dtype:
        e = "<" if dt["le"] else ">"
        if dt["cls"] == 0:
            return np.dtype(f"{e}{'i' if dt.get('signed') else 'u'}{dt['size']}")
        if dt["cls"] == 1:
            return np.dtype(f"{e}f{dt['size']}")
        if dt["cls"] == 3:
            return np.dtype(f"S{dt['size']}")
        raise ValueError(f"unsupported datatype class {dt['cls']}")

    def attribute(self, p: int):
        b = self.buf
        ver = b[p]
        nsz, dtsz, dssz = (self._u(p + 2, 2), self._u(p + 4, 2),
                           self._u(p + 6, 2))
        if ver == 1:
            q = p + 8
            pad = lambda n: (n + 7) & ~7  # noqa: E731
            name = b[q:q + nsz].split(b"\0")[0].decode()
            q += pad(nsz)
            dtp, q = q, q + pad(dtsz)
            dsp, q = q, q + pad(dssz)
        else:  # v2/v3
            q = p + 8 + (1 if ver == 3 else 0)
            name = b[q:q + nsz].split(b"\0")[0].decode()
            q += nsz
            dtp, q = q, q + dtsz
            dsp, q = q, q + dssz
        dt = self.datatype(dtp)
        dims = self.dataspace(dsp)
        n = int(np.prod(dims)) if dims else 1
        if dt["cls"] == 3:
            val = b[q:q + dt["size"] * n].split(b"\0")[0].decode(
                "utf-8", "replace")
        elif dt["cls"] in (0, 1):
            arr = np.frombuffer(b, self._np_dtype(dt), n, q)
            val = arr if dims else arr[0]
        elif dt["cls"] == 9:
            # vlen: per element (count u4, gheap addr, gheap index u4)
            step = 4 + self.offsz + 4
            val = []
            for i in range(n):
                cnt = self._u(q + i * step, 4)
                gaddr = self._u(q + i * step + 4, self.offsz)
                gidx = self._u(q + i * step + 4 + self.offsz, 4)
                raw = self._gheap(gaddr, gidx)
                if dt["base"]["cls"] == 7:  # object references
                    val.append([int.from_bytes(raw[k * 8:k * 8 + 8], "little")
                                for k in range(cnt)])
                elif dt["base"]["cls"] == 3 or dt["vtype"] == 1:
                    val.append(raw.split(b"\0")[0].decode("utf-8", "replace"))
                else:
                    val.append(np.frombuffer(
                        raw, self._np_dtype(dt["base"]), cnt))
            if not dims:
                val = val[0]
        else:
            val = None  # compound (REFERENCE_LIST etc.) — not needed
        return name, val

    def _gheap(self, addr: int, idx: int) -> bytes:
        b = self.buf
        assert b[addr:addr + 4] == b"GCOL", b[addr:addr + 4]
        size = self._u(addr + 8, self.lensz)
        q = addr + 8 + self.lensz
        end = addr + size
        while q < end:
            oidx = self._u(q, 2)
            osize = self._u(q + 8, self.lensz)
            if oidx == 0:
                break
            if oidx == idx:
                return b[q + 8 + self.lensz:q + 8 + self.lensz + osize]
            q += 8 + self.lensz + ((osize + 7) & ~7)
        raise KeyError(f"global heap object {idx} at {addr:#x}")

    # -- dataset data ----------------------------------------------------------

    def dataset(self, oh: int):
        """→ (shape, attrs, numpy array or None)."""
        shape, dt, layout, filters, attrs = None, None, None, [], {}
        for t, p, sz in self.messages(oh):
            if t == 0x01:
                shape = self.dataspace(p)
            elif t == 0x03:
                dt = self.datatype(p)
            elif t == 0x08:
                layout = (p, sz)
            elif t == 0x0B:
                filters = self._filters(p)
            elif t == 0x0C:
                k, v = self.attribute(p)
                attrs[k] = v
        arr = None
        if layout is not None and dt is not None and dt["cls"] in (0, 1, 3):
            arr = self._read_layout(layout[0], shape or [], dt, filters)
        return shape or [], attrs, arr

    def _filters(self, p: int) -> list[tuple[int, list[int]]]:
        b = self.buf
        ver, nf = b[p], b[p + 1]
        q = p + (8 if ver == 1 else 2)
        out = []
        for _ in range(nf):
            fid = self._u(q, 2)
            if ver == 1 or fid >= 256:
                namelen = self._u(q + 2, 2)
                flags = self._u(q + 4, 2)
                ncdv = self._u(q + 6, 2)
                q += 8 + namelen
            else:
                flags = self._u(q + 2, 2)
                ncdv = self._u(q + 4, 2)
                q += 6
            cdv = [self._u(q + 4 * i, 4) for i in range(ncdv)]
            q += 4 * ncdv
            if ver == 1 and ncdv % 2:
                q += 4
            out.append((fid, cdv))
        return out

    def _read_layout(self, p: int, shape: list[int], dt: dict,
                     filters) -> np.ndarray | None:
        b = self.buf
        ver = b[p]
        npdt = self._np_dtype(dt)
        n = int(np.prod(shape)) if shape else 1
        if ver not in (3, 4):
            raise ValueError(f"unsupported layout message v{ver}")
        cls = b[p + 1]
        if cls == 0:  # compact
            size = self._u(p + 2, 2)
            return np.frombuffer(b, npdt, n, p + 4).reshape(shape)
        if cls == 1:  # contiguous
            addr = self._u(p + 2, self.offsz)
            if addr == UNDEF:
                return None
            return np.frombuffer(b, npdt, n, addr).reshape(shape)
        if cls == 2 and ver == 3:  # chunked, v1 B-tree index
            nd = b[p + 2]
            btree = self._u(p + 3, self.offsz)
            cdims = [self._u(p + 3 + self.offsz + 4 * i, 4)
                     for i in range(nd - 1)]
            if btree == UNDEF:
                return None
            out = np.zeros(shape, npdt.newbyteorder("="))
            self._walk_chunks(btree, nd, cdims, npdt, filters, out, shape)
            return out
        raise ValueError(f"unsupported data layout class {cls} v{ver}")

    def _walk_chunks(self, node: int, nd: int, cdims, npdt, filters,
                     out: np.ndarray, shape) -> None:
        b = self.buf
        assert b[node:node + 4] == b"TREE"
        level = b[node + 5]
        nkeys = self._u(node + 6, 2)
        q = node + 8 + 2 * self.offsz
        keysz = 8 + 8 * nd  # chunk size u4 + filter mask u4 + nd offsets u8
        for k in range(nkeys):
            csize = self._u(q, 4)
            offs = [self._u(q + 8 + 8 * i, 8) for i in range(nd - 1)]
            child = self._u(q + keysz, self.offsz)
            if level > 0:
                self._walk_chunks(child, nd, cdims, npdt, filters, out, shape)
            else:
                raw = b[child:child + csize]
                for fid, cdv in reversed(filters):
                    if fid == 1:
                        raw = zlib.decompress(raw)
                    elif fid == 2:  # shuffle: byte-plane transpose
                        it = npdt.itemsize
                        a = np.frombuffer(raw, np.uint8)
                        raw = a.reshape(it, len(a) // it).T.tobytes()
                    elif fid == 3:  # fletcher32: strip trailing checksum
                        raw = raw[:-4]
                    else:
                        raise ValueError(f"unsupported filter {fid}")
                chunk = np.frombuffer(raw, npdt,
                                      int(np.prod(cdims))).reshape(cdims)
                sel = tuple(slice(o, min(o + c, s))
                            for o, c, s in zip(offs, cdims, shape))
                src = tuple(slice(0, sl.stop - sl.start) for sl in sel)
                out[sel] = chunk[src]
            q += keysz + self.offsz


def read_raw(path: str) -> dict:
    """NetCDF-4/HDF5 file → the netcdf3.read_raw dict shape:
    {dims: [(name, size)...], gatts, vars: {name: (dimnames, atts, arr)}}.

    Dimension mapping follows the netCDF-4 convention: coordinate
    datasets carry CLASS="DIMENSION_SCALE" and data variables point at
    them through the DIMENSION_LIST vlen-of-object-references attribute
    (resolved through the global heap).
    """
    h = H5File(path)
    links = h.links(h.root)
    addr_to_name = {a: n for n, a in links.items()}
    gatts: dict = {}
    for t, p, sz in h.messages(h.root):
        if t == 0x0C:
            k, v = h.attribute(p)
            gatts[k] = v
    dims: list[tuple[str, int]] = []
    vars_: dict = {}
    scales: dict[str, int] = {}
    raw = {}
    for name, addr in links.items():
        shape, attrs, arr = h.dataset(addr)
        raw[name] = (shape, attrs, arr)
        if attrs.get("CLASS") == "DIMENSION_SCALE":
            dimid = attrs.get("_Netcdf4Dimid")
            scales[name] = (int(np.asarray(dimid).ravel()[0])
                            if dimid is not None else len(scales))
    for name in sorted(scales, key=scales.get):
        dims.append((name, raw[name][0][0] if raw[name][0] else 1))
    for name, (shape, attrs, arr) in raw.items():
        if name in scales:
            dimnames = [name]
        elif "DIMENSION_LIST" in attrs and attrs["DIMENSION_LIST"]:
            dimnames = [addr_to_name.get(refs[0], f"dim{i}")
                        for i, refs in enumerate(attrs["DIMENSION_LIST"])]
        else:
            dimnames = [f"dim{i}" for i in range(len(shape))]
        vars_[name] = (dimnames, attrs, arr)
    return {"dims": dims, "gatts": gatts, "vars": vars_}
