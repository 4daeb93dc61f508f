"""Minimal from-scratch HDF5 writer for NetCDF-4 files (K9 twin of
``hdf5nc.py``; no netCDF4/h5py in this container).

Emits exactly the object shape the six reference fixtures use and the
repo's reader consumes: superblock v2, OHDR v2 objects with compact
link messages for the root group, dataspace v2 / datatype v1,
contiguous v3 layouts, attribute v3 messages, one GCOL global-heap
collection carrying the ``DIMENSION_LIST`` vlen-of-object-references,
and dimension-scale datasets (`CLASS="DIMENSION_SCALE"`,
``_Netcdf4Dimid``) — the netCDF-4 dimension convention.

Checksums are real Jenkins lookup3 (`_lookup3` reproduces the stored
superblock + every OHDR checksum of the reference fixtures bit-exactly,
asserted in tests), so the files are spec-conformant, not just
self-readable.

Public surface: :func:`write_raw(path, dims, variables, gatts)` — the
inverse of ``hdf5nc.read_raw``'s ``{dims, gatts, vars}`` dict.
"""

from __future__ import annotations

import struct
import warnings
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF
_M = 0xFFFFFFFF


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & _M


def _lookup3(data: bytes, init: int = 0) -> int:
    """Bob Jenkins lookup3 hashlittle() — the HDF5 metadata checksum."""
    length = len(data)
    a = b = c = (0xDEADBEEF + length + init) & _M
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i:i + 4], "little")) & _M
        b = (b + int.from_bytes(data[i + 4:i + 8], "little")) & _M
        c = (c + int.from_bytes(data[i + 8:i + 12], "little")) & _M
        a = (a - c) & _M; a ^= _rot(c, 4); c = (c + b) & _M       # noqa: E702
        b = (b - a) & _M; b ^= _rot(a, 6); a = (a + c) & _M       # noqa: E702
        c = (c - b) & _M; c ^= _rot(b, 8); b = (b + a) & _M       # noqa: E702
        a = (a - c) & _M; a ^= _rot(c, 16); c = (c + b) & _M      # noqa: E702
        b = (b - a) & _M; b ^= _rot(a, 19); a = (a + c) & _M      # noqa: E702
        c = (c - b) & _M; c ^= _rot(b, 4); b = (b + a) & _M       # noqa: E702
        i += 12
        length -= 12
    if length == 0:
        return c
    tail = data[i:i + length] + b"\x00" * (12 - length)
    a = (a + int.from_bytes(tail[0:4], "little")) & _M
    b = (b + int.from_bytes(tail[4:8], "little")) & _M
    c = (c + int.from_bytes(tail[8:12], "little")) & _M
    c ^= b; c = (c - _rot(b, 14)) & _M                            # noqa: E702
    a ^= c; a = (a - _rot(c, 11)) & _M                            # noqa: E702
    b ^= a; b = (b - _rot(a, 25)) & _M                            # noqa: E702
    c ^= b; c = (c - _rot(b, 16)) & _M                            # noqa: E702
    a ^= c; a = (a - _rot(c, 4)) & _M                             # noqa: E702
    b ^= a; b = (b - _rot(a, 14)) & _M                            # noqa: E702
    c ^= b; c = (c - _rot(b, 24)) & _M                            # noqa: E702
    return c


# -- datatype / dataspace encodings -----------------------------------------

def _dt_for(arr_dtype: np.dtype) -> bytes:
    dt = np.dtype(arr_dtype)
    if dt.kind in "iu":
        bits = 0x08 if dt.kind == "i" else 0x00
        return (bytes([0x10, bits, 0, 0])
                + struct.pack("<I", dt.itemsize)
                + struct.pack("<HH", 0, 8 * dt.itemsize))
    if dt.kind == "f":
        if dt.itemsize == 4:
            exploc, expsz, mansz, bias, sign = 23, 8, 23, 127, 31
        else:
            exploc, expsz, mansz, bias, sign = 52, 11, 52, 1023, 63
        return (bytes([0x11, 0x20, sign, 0])
                + struct.pack("<I", dt.itemsize)
                + struct.pack("<HHBBBBI", 0, 8 * dt.itemsize,
                              exploc, expsz, 0, mansz, bias))
    if dt.kind == "S":
        return (bytes([0x13, 0, 0, 0]) + struct.pack("<I", dt.itemsize))
    raise ValueError(f"unsupported dtype {dt}")


def _dt_str(n: int) -> bytes:
    return bytes([0x13, 0, 0, 0]) + struct.pack("<I", n)


_DT_REF = bytes([0x17, 0, 0, 0]) + struct.pack("<I", 8)
_DT_VLEN_REF = (bytes([0x19, 0, 0, 0]) + struct.pack("<I", 16) + _DT_REF)


def _ds(shape) -> bytes:
    nd = len(shape)
    out = bytes([2, nd, 0, 1 if nd else 0])
    for s in shape:
        out += struct.pack("<Q", s)
    return out


def _msg(mtype: int, payload: bytes) -> bytes:
    if len(payload) > 0xFFFF:
        raise ValueError(
            f"header message payload {len(payload)} bytes exceeds the "
            "64 KiB v2 object-header message limit")
    return bytes([mtype]) + struct.pack("<H", len(payload)) + b"\x00" \
        + payload


def _attr(name: str, dt: bytes, ds: bytes, value: bytes) -> bytes:
    nb = name.encode() + b"\x00"
    head = bytes([3, 0]) + struct.pack("<HHH", len(nb), len(dt), len(ds)) \
        + bytes([0])
    return _msg(0x0C, head + nb + dt + ds + value)


def _attr_of(name: str, v) -> bytes:
    """Generic attribute from a python/numpy value."""
    if isinstance(v, str):
        vb = v.encode() + b"\x00"
        return _attr(name, _dt_str(len(vb)), _ds(()), vb)
    arr = np.asarray(v)
    if arr.shape == ():
        a0 = arr.astype(arr.dtype.newbyteorder("<"))
        return _attr(name, _dt_for(a0.dtype), _ds(()), a0.tobytes())
    a = np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("<")))
    return _attr(name, _dt_for(a.dtype), _ds(a.shape), a.tobytes())


def _ohdr(messages: bytes) -> bytes:
    head = b"OHDR" + bytes([2, 0x01]) + struct.pack("<H", len(messages))
    body = head + messages
    return body + struct.pack("<I", _lookup3(body))


def _btree_chunk_node(shape, csize: int, data_addr: int) -> bytes:
    """v1 B-tree (type 1, level 0) indexing ONE chunk covering the whole
    dataset — the chunked layout the reader walks; keys are
    (chunk bytes u4, filter mask u4, nd offsets u8) with the element
    dimension appended."""
    nd = len(shape) + 1
    key0 = struct.pack("<II", csize, 0) + b"\x00" * (8 * nd)
    key1 = struct.pack("<II", 0, 0)
    for s in shape:
        key1 += struct.pack("<Q", s)
    key1 += struct.pack("<Q", 0)
    node = (b"TREE" + bytes([1, 0]) + struct.pack("<H", 1)
            + struct.pack("<QQ", UNDEF, UNDEF)
            + key0 + struct.pack("<Q", data_addr) + key1)
    return node


def write_raw(path: str, dims: list[tuple[str, int]],
              variables: dict, gatts: dict | None = None,
              compress: bool = False) -> None:
    """variables: name → (dimnames, atts, np.ndarray); a variable whose
    name matches a dim is its coordinate (dimension-scale) dataset;
    dims without a matching variable get an empty scale.

    ``compress=True`` stores every dataset as a single deflate chunk
    (chunked v3 layout + v1 B-tree index + filter pipeline) — the
    compressed NetCDF-4 shape the reference fixtures themselves use."""
    gatts = gatts or {}
    dim_sizes = dict(dims)
    order: list[str] = [d for d, _ in dims]
    for name in variables:
        if name not in dim_sizes:
            order.append(name)

    def _arr_of(name):
        if name in variables:
            a = np.asarray(variables[name][2])
        else:
            a = np.zeros(dim_sizes[name], np.float32)
        return np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<")))

    arrays = {name: _arr_of(name) for name in order}
    chunked = {name: bool(compress and arrays[name].ndim >= 1
                          and arrays[name].size)
               for name in order}
    data_bytes = {
        name: (zlib.compress(arrays[name].tobytes(), 4)
               if chunked[name] else arrays[name].tobytes())
        for name in order}

    # Attributes whose values _attr_of cannot encode (e.g. numpy unicode
    # arrays, lists of strings) must not vanish silently from a round
    # trip — collect their names across both build passes and surface
    # them once at the end (ADVICE r5: silent drop loses metadata).
    skipped_attrs: set[str] = set()

    # pass structure: [superblock][var OHDRs...][GCOL][data blocks...]
    def build(addr: dict[str, int], gcol_addr: int,
              gcol_index: dict[str, int], data_addr: dict[str, int],
              btree_addr: dict[str, int]):
        objs: dict[str, bytes] = {}
        for name in order:
            if name in variables:
                dimnames, atts, _ = variables[name]
            else:
                dimnames, atts = [name], {}
            arr = arrays[name]
            msgs = b""
            msgs += _msg(0x01, _ds(arr.shape))
            msgs += _msg(0x03, _dt_for(arr.dtype))
            if chunked[name]:
                nd = arr.ndim + 1
                lay = bytes([3, 2, nd]) \
                    + struct.pack("<Q", btree_addr.get(name, 0))
                for s in arr.shape:
                    lay += struct.pack("<I", s)
                lay += struct.pack("<I", arr.dtype.itemsize)
                msgs += _msg(0x08, lay)
                filt = bytes([1, 1]) + b"\x00" * 6 \
                    + struct.pack("<HHHH", 1, 0, 1, 1) \
                    + struct.pack("<I", 4) + b"\x00" * 4
                msgs += _msg(0x0B, filt)
            else:
                msgs += _msg(0x08, bytes([3, 1])
                             + struct.pack("<QQ", data_addr.get(name, 0),
                                           arr.nbytes))
            if name in dim_sizes:
                msgs += _attr_of("CLASS", "DIMENSION_SCALE")
                msgs += _attr_of("_Netcdf4Dimid",
                                 np.int32(order.index(name)))
            elif dimnames:
                val = b""
                for dn in dimnames:
                    if dn not in dim_sizes:
                        raise ValueError(
                            f"variable {name!r} references undeclared "
                            f"dimension {dn!r}")
                    val += struct.pack("<IQI", 1, gcol_addr,
                                       gcol_index.get(dn, 1))
                msgs += _attr("DIMENSION_LIST", _DT_VLEN_REF,
                              _ds((len(dimnames),)), val)
            for k, v in atts.items():
                if k in ("CLASS", "_Netcdf4Dimid", "DIMENSION_LIST",
                         "REFERENCE_LIST", "NAME"):
                    continue
                try:
                    msgs += _attr_of(k, v)
                except (ValueError, TypeError):
                    skipped_attrs.add(f"{name}:{k}")
                    continue
            objs[name] = _ohdr(msgs)

        root_msgs = b""
        for name in order:
            nb = name.encode()
            if len(nb) > 255:
                raise ValueError(
                    f"variable name {name!r} exceeds 255 encoded bytes")
            root_msgs += _msg(0x06, bytes([1, 0, len(nb)]) + nb
                              + struct.pack("<Q", addr.get(name, 0)))
        for k, v in gatts.items():
            try:
                root_msgs += _attr_of(k, v)
            except (ValueError, TypeError):
                skipped_attrs.add(f"<global>:{k}")
                continue
        root = _ohdr(root_msgs)

        gobjs = b""
        for i, name in enumerate(order):
            if name in dim_sizes:
                gobjs += struct.pack("<HHIQ", gcol_index.get(name, 1), 1,
                                     0, 8)
                gobjs += struct.pack("<Q", addr.get(name, 0))
        # collection size includes the 16-byte header (sig+ver+res+size);
        # the spec minimum collection size is 4096 — pad with a final
        # free-space object (index 0) so conformant readers see a valid
        # layout (review finding)
        total = max(4096, 16 + len(gobjs) + 16)
        rem = total - 16 - len(gobjs)
        free = struct.pack("<HHIQ", 0, 0, 0, rem) + b"\x00" * (rem - 16)
        gcol = b"GCOL" + bytes([1, 0, 0, 0]) \
            + struct.pack("<Q", total) + gobjs + free
        return root, objs, gcol

    # pass 1: sizes with dummy addresses
    root, objs, gcol = build({}, 0, {}, {}, {})
    pos = 48
    root_addr = pos
    pos += len(root)
    addr: dict[str, int] = {}
    for name in order:
        addr[name] = pos
        pos += len(objs[name])
    gcol_addr = pos
    pos += len(gcol)
    gcol_index = {}
    i = 1
    for name in order:
        if name in dim_sizes:
            gcol_index[name] = i
            i += 1
    data_addr: dict[str, int] = {}
    btree_addr: dict[str, int] = {}
    btrees: dict[str, bytes] = {}
    for name in order:
        pos = (pos + 7) & ~7
        if chunked[name]:
            btree_addr[name] = pos
            # placeholder with dummy data addr; rebuilt below
            node = _btree_chunk_node(arrays[name].shape,
                                     len(data_bytes[name]), 0)
            pos += len(node)
            pos = (pos + 7) & ~7
        data_addr[name] = pos
        pos += len(data_bytes[name])
    eof = pos
    for name in order:
        if chunked[name]:
            btrees[name] = _btree_chunk_node(
                arrays[name].shape, len(data_bytes[name]),
                data_addr[name])

    # pass 2: real addresses (all fields fixed-width → sizes identical)
    root2, objs2, gcol2 = build(addr, gcol_addr, gcol_index, data_addr,
                                btree_addr)
    assert len(root2) == len(root) and len(gcol2) == len(gcol)

    sb = (b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0])
          + struct.pack("<QQQQ", 0, UNDEF, eof, root_addr))
    sb += struct.pack("<I", _lookup3(sb))

    out = bytearray(eof)
    out[0:48] = sb
    out[root_addr:root_addr + len(root2)] = root2
    for name in order:
        out[addr[name]:addr[name] + len(objs2[name])] = objs2[name]
    out[gcol_addr:gcol_addr + len(gcol2)] = gcol2
    for name in order:
        if chunked[name]:
            out[btree_addr[name]:btree_addr[name] + len(btrees[name])] = \
                btrees[name]
        db = data_bytes[name]
        out[data_addr[name]:data_addr[name] + len(db)] = db
    with open(path, "wb") as f:
        f.write(bytes(out))
    if skipped_attrs:
        warnings.warn(
            "hdf5write: dropped attributes with unencodable values: "
            + ", ".join(sorted(skipped_attrs)),
            stacklevel=2)
