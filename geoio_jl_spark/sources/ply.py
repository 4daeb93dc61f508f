"""PLY source/sink (reference S13/K10, src/extra/ply.jl).

The reference maps PLY vertex properties beyond x/y/z into the per-vertex
table and face properties into the per-element table (ply.jl:6-30); same
two-table mesh shape here. Reads ascii 1.0 AND binary_little_endian /
binary_big_endian 1.0 (typed scalar + list properties); writes ascii or
binary_little_endian.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_TYPES = {
    "char": "b", "int8": "b", "uchar": "B", "uint8": "B",
    "short": "h", "int16": "h", "ushort": "H", "uint16": "H",
    "int": "i", "int32": "i", "uint": "I", "uint32": "I",
    "float": "f", "float32": "f", "double": "d", "float64": "d",
}


def _parse_header(buf: bytes):
    # fixtures use both LF and CRLF (beethoven.ply is CRLF)
    marker = buf.index(b"end_header")
    end = buf.index(b"\n", marker) + 1
    header = buf[:end].decode("ascii", "replace").splitlines()
    assert header[0].strip() == "ply", "not a PLY file"
    fmt = None
    elements = []  # (name, count, [(prop, is_list, count_t, val_t)])
    for ln in header[1:]:
        toks = ln.split()
        if not toks:
            continue
        if toks[0] == "format":
            fmt = toks[1]
        elif toks[0] == "element":
            elements.append((toks[1], int(toks[2]), []))
        elif toks[0] == "property":
            if toks[1] == "list":
                elements[-1][2].append((toks[-1], True, toks[2], toks[3]))
            else:
                elements[-1][2].append((toks[-1], False, None, toks[1]))
    return fmt, elements, end


def read(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    with open(path, "rb") as f:
        buf = f.read()
    fmt, elements, body = _parse_header(buf)
    if fmt == "ascii":
        tables = _read_ascii(buf[body:].decode(), elements)
    elif fmt in ("binary_little_endian", "binary_big_endian"):
        tables = _read_binary(buf, body, elements,
                              "<" if fmt.endswith("little_endian") else ">")
    else:
        raise ValueError(f"unsupported PLY format {fmt!r}")
    vpdf = tables.get("vertex", pd.DataFrame())
    vpdf.insert(0, "vid", range(1, len(vpdf) + 1))
    epdf = tables.get("face", pd.DataFrame())
    if "vertex_indices" in epdf.columns:
        epdf = epdf.rename(columns={"vertex_indices": "vids"})
    if "vids" in epdf.columns:
        epdf["vids"] = epdf["vids"].apply(lambda xs: [x + 1 for x in xs])
    epdf.insert(0, "eid", range(1, len(epdf) + 1))
    return spark.createDataFrame(vpdf), spark.createDataFrame(epdf)


def _read_ascii(text: str, elements) -> dict[str, pd.DataFrame]:
    lines = [ln for ln in text.splitlines() if ln.strip()]
    tables = {}
    i = 0
    for name, count, props in elements:
        rows = []
        for _ in range(count):
            toks = lines[i].split()
            i += 1
            vals, p = [], 0
            for pname, is_list, _ct, _vt in props:
                if is_list:
                    n = int(toks[p])
                    vals.append([int(x) for x in toks[p + 1:p + 1 + n]])
                    p += 1 + n
                else:
                    vals.append(float(toks[p]))
                    p += 1
            rows.append(vals)
        tables[name] = pd.DataFrame(rows, columns=[p[0] for p in props])
    return tables


def _read_binary(buf: bytes, pos: int, elements, e: str) -> dict:
    tables = {}
    for name, count, props in elements:
        all_scalar = all(not p[1] for p in props)
        if all_scalar:  # fast path: one structured-dtype frombuffer
            dt = np.dtype([(p[0], e + _TYPES[p[3]]) for p in props])
            arr = np.frombuffer(buf, dt, count, pos)
            pos += dt.itemsize * count
            tables[name] = pd.DataFrame(
                {p[0]: arr[p[0]].astype(np.float64) for p in props})
            continue
        rows = []
        for _ in range(count):
            vals = []
            for pname, is_list, ct, vt in props:
                if is_list:
                    cf = e + _TYPES[ct]
                    n = struct.unpack_from(cf, buf, pos)[0]
                    pos += struct.calcsize(cf)
                    vf = e + str(n) + _TYPES[vt]
                    vals.append([int(x) for x in
                                 struct.unpack_from(vf, buf, pos)])
                    pos += struct.calcsize(vf)
                else:
                    vf = e + _TYPES[vt]
                    vals.append(float(struct.unpack_from(vf, buf, pos)[0]))
                    pos += struct.calcsize(vf)
            rows.append(vals)
        tables[name] = pd.DataFrame(rows, columns=[p[0] for p in props])
    return tables


def write(vertices: DataFrame, elements: DataFrame, path: str,
          fmt: str = "ascii") -> None:
    v = vertices.orderBy("vid").toPandas()
    el = elements.orderBy("eid").toPandas()
    vprops = [c for c in v.columns if c != "vid"]
    eprops = [c for c in el.columns if c not in ("eid", "vids")]
    header = f"ply\nformat {fmt} 1.0\n"
    header += f"element vertex {len(v)}\n"
    for c in vprops:
        header += f"property float {c}\n"
    header += f"element face {len(el)}\n"
    header += "property list uchar int vertex_indices\n"
    for c in eprops:
        header += f"property float {c}\n"
    header += "end_header\n"
    if fmt == "ascii":
        with open(path, "w") as f:
            f.write(header)
            for _, r in v.iterrows():
                f.write(" ".join(repr(float(r[c])) for c in vprops) + "\n")
            for _, r in el.iterrows():
                vids = [int(x) - 1 for x in r["vids"]]
                line = f"{len(vids)} " + " ".join(map(str, vids))
                for c in eprops:
                    line += f" {float(r[c])!r}"
                f.write(line + "\n")
        return
    if fmt != "binary_little_endian":
        raise ValueError(f"unsupported PLY write format {fmt!r}")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if vprops:
            f.write(np.ascontiguousarray(
                v[vprops].to_numpy(np.float32)).astype("<f4").tobytes())
        for _, r in el.iterrows():
            vids = [int(x) - 1 for x in r["vids"]]
            f.write(struct.pack("<B" + str(len(vids)) + "i",
                                len(vids), *vids))
            for c in eprops:
                f.write(struct.pack("<f", float(r[c])))
