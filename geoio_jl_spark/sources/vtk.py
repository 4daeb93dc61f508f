"""VTK XML source/sink (reference S15/K12, src/extra/vtk/) — .vti
(ImageData), .vtu (UnstructuredGrid), .vtp (PolyData), .vtr, .vts via
stdlib xml.etree. Reads ascii, inline-base64 and appended-raw DataArrays,
including vtkZLibDataCompressor block streams (the encoding every actual
reference fixture uses); writes ascii.

Semantics carried over:
- cell-type map (vtk/read.jl:5-15): 3 line, 5 triangle, 9 quad, 10 tetra,
  12 hexahedron, 14 pyramid, plus 8 PIXEL / 11 VOXEL whose connectivity is
  reordered to quad/hexahedron order (F26, vtk/read.jl:243-251)
- .vti mask column → SubGrid view on read (P6, vtk/read.jl:32-48); on
  write a masked subdomain is NaN-filled onto the parent grid with a mask
  column (K12, vtk/write.jl:76-97) — the operators live in
  operators/raster.py; this codec moves the bytes
"""

from __future__ import annotations

import base64
import xml.etree.ElementTree as ET
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VTK_KINDS = {3: "segment", 5: "triangle", 9: "quad", 10: "tetrahedron",
             12: "hexahedron", 14: "pyramid", 8: "pixel", 11: "voxel"}
KIND_TO_VTK = {"segment": 3, "triangle": 5, "quad": 9, "tetrahedron": 10,
               "hexahedron": 12, "pyramid": 14}
# F26: VTK_PIXEL/VOXEL → quad/hexahedron vertex order (vtk/read.jl:243-251)
_PIXEL_ORDER = [0, 1, 3, 2]
_VOXEL_ORDER = [0, 1, 3, 2, 4, 5, 7, 6]


def _data_array(parent, name: str, values, ncomp: int = 1) -> None:
    el = ET.SubElement(parent, "DataArray", {
        "type": "Float64", "Name": name, "format": "ascii",
        **({"NumberOfComponents": str(ncomp)} if ncomp > 1 else {})})
    el.text = " ".join(repr(float(v)) for v in np.asarray(values).ravel())


_VTK_DTYPES = {"Float32": "f4", "Float64": "f8", "Int8": "i1", "UInt8": "u1",
               "Int16": "i2", "UInt16": "u2", "Int32": "i4", "UInt32": "u4",
               "Int64": "i8", "UInt64": "u8"}


class _VTKDoc:
    """Parsed VTK XML file + its appended-raw byte stream.

    Handles the three DataArray encodings of the VTK XML spec: ascii,
    inline base64 ("binary"), and appended raw — with or without
    vtkZLibDataCompressor block framing (header_type UInt32/UInt64).
    The raw appended bytes are not valid XML, so the document is split
    at <AppendedData> before parsing.
    """

    def __init__(self, path: str):
        with open(path, "rb") as f:
            buf = f.read()
        ap = buf.find(b"<AppendedData")
        if ap >= 0:
            self.root = ET.fromstring(buf[:ap] + b"</VTKFile>")
            start = buf.index(b"_", buf.index(b">", ap)) + 1
            end = buf.rindex(b"</AppendedData>")
            self.appended = buf[start:end]
        else:
            self.root = ET.fromstring(buf)
            self.appended = b""
        self.byte = ("<" if self.root.get("byte_order", "LittleEndian")
                     == "LittleEndian" else ">")
        ht = self.root.get("header_type", "UInt32")
        self.hdt = np.dtype(self.byte + ("u8" if ht == "UInt64" else "u4"))
        self.compressed = self.root.get("compressor") is not None

    def _decode(self, raw: bytes) -> bytes:
        h = self.hdt.itemsize
        if self.compressed:
            nb = int(np.frombuffer(raw, self.hdt, 1)[0])
            sizes = np.frombuffer(raw, self.hdt, 3 + nb)[3:]
            pos = h * (3 + nb)
            out = []
            for s in sizes:
                out.append(zlib.decompress(raw[pos:pos + int(s)]))
                pos += int(s)
            return b"".join(out)
        n = int(np.frombuffer(raw, self.hdt, 1)[0])
        return raw[h:h + n]

    def array(self, el) -> np.ndarray:
        fmt = el.get("format", "ascii")
        dt = np.dtype(self.byte + _VTK_DTYPES[el.get("type", "Float64")])
        ncomp = int(el.get("NumberOfComponents", "1"))
        if fmt == "ascii":
            vals = np.array([float(x) for x in el.text.split()])
        elif fmt == "appended":
            off = int(el.get("offset", "0"))
            vals = np.frombuffer(self._decode(self.appended[off:]), dt)
        else:  # inline base64
            vals = np.frombuffer(self._decode(
                base64.b64decode("".join(el.text.split()))), dt)
        return vals.reshape(-1, ncomp) if ncomp > 1 else vals


# ---------------------------------------------------------------------------
# .vtu — UnstructuredGrid ↔ (vertices, elements)
# ---------------------------------------------------------------------------

def read_vtu(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    doc = _VTKDoc(path)
    piece = doc.root.find(".//Piece")
    pts = doc.array(piece.find("Points/DataArray"))
    arrays = {a.get("Name"): a for a in piece.findall("Cells/DataArray")}
    conn = doc.array(arrays["connectivity"]).astype(np.int64)
    offsets = doc.array(arrays["offsets"]).astype(np.int64)
    types = doc.array(arrays["types"]).astype(np.int64)
    vpdf = pd.DataFrame({
        "vid": np.arange(1, len(pts) + 1),
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    erows, start = [], 0
    for eid, (end, t) in enumerate(zip(offsets, types), start=1):
        vids = (conn[start:end] + 1).tolist()
        start = end
        t = int(t)
        if t == 8:  # VTK_PIXEL → quad order (F26)
            vids = [vids[k] for k in _PIXEL_ORDER]
            kind = "quad"
        elif t == 11:  # VTK_VOXEL → hexahedron order
            vids = [vids[k] for k in _VOXEL_ORDER]
            kind = "hexahedron"
        else:
            kind = VTK_KINDS.get(t, f"type{t}")
        erows.append((eid, kind, vids))
    # per-vertex / per-cell data arrays → vtable/etable columns
    _attach_data(vpdf, piece, "PointData", doc)
    epdf = pd.DataFrame(erows, columns=["eid", "kind", "vids"])
    _attach_data(epdf, piece, "CellData", doc)
    return spark.createDataFrame(vpdf), spark.createDataFrame(epdf)


def _attach_data(pdf: pd.DataFrame, piece, section: str, doc: _VTKDoc) -> None:
    """PointData/CellData arrays → columns; multi-component arrays become
    one list column (reference _asvector, vtk/read.jl:221-238)."""
    for a in piece.findall(f"{section}/DataArray"):
        vals = doc.array(a)
        if vals.dtype.kind == "u":  # Arrow rejects unsigned ints
            vals = vals.astype(np.int64)
        if vals.ndim == 2:
            pdf[a.get("Name")] = list(map(list, vals.astype(float)))
        else:
            pdf[a.get("Name")] = vals


def read_vtp(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """PolyData → (vertices, elements); Polys connect as N-gons
    (reference _vtpconnec, vtk/read.jl:173-186, fixture spiral.vtp)."""
    doc = _VTKDoc(path)
    piece = doc.root.find(".//Piece")
    pts = doc.array(piece.find("Points/DataArray"))
    arrays = {a.get("Name"): a for a in piece.findall("Polys/DataArray")}
    conn = doc.array(arrays["connectivity"]).astype(np.int64)
    offsets = doc.array(arrays["offsets"]).astype(np.int64)
    vpdf = pd.DataFrame({
        "vid": np.arange(1, len(pts) + 1),
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    _NGON = {3: "triangle", 4: "quad", 5: "pentagon", 6: "hexagon"}
    erows, start = [], 0
    for eid, end in enumerate(offsets, start=1):
        vids = (conn[start:end] + 1).tolist()
        start = end
        erows.append((eid, _NGON.get(len(vids), f"ngon{len(vids)}"), vids))
    _attach_data(vpdf, piece, "PointData", doc)
    epdf = pd.DataFrame(erows, columns=["eid", "kind", "vids"])
    _attach_data(epdf, piece, "CellData", doc)
    return spark.createDataFrame(vpdf), spark.createDataFrame(epdf)


def write_vtp(vertices: DataFrame, elements: DataFrame, path: str) -> None:
    """(vertices, elements) → ascii PolyData; every element is emitted
    as a Poly (reference write.jl polydata branch)."""
    v = vertices.orderBy("vid").toPandas()
    e = elements.orderBy("eid").toPandas()
    root = ET.Element("VTKFile", {"type": "PolyData", "version": "1.0",
                                  "byte_order": "LittleEndian"})
    pg = ET.SubElement(root, "PolyData")
    piece = ET.SubElement(pg, "Piece", {
        "NumberOfPoints": str(len(v)), "NumberOfPolys": str(len(e)),
        "NumberOfVerts": "0", "NumberOfLines": "0", "NumberOfStrips": "0"})
    points = ET.SubElement(piece, "Points")
    _data_array(points, "Points",
                v[["x", "y", "z"]].to_numpy() if "z" in v.columns
                else np.column_stack([v["x"], v["y"], np.zeros(len(v))]), 3)
    pdata = ET.SubElement(piece, "PointData")
    for c in v.columns:
        if c not in ("vid", "x", "y", "z", "tag"):
            _data_array(pdata, c, v[c].fillna(np.nan))
    polys = ET.SubElement(piece, "Polys")
    conn, offs, acc = [], [], 0
    for _, r in e.iterrows():
        vids = [int(x) - 1 for x in r["vids"]]
        conn.extend(vids)
        acc += len(vids)
        offs.append(acc)
    _data_array(polys, "connectivity", conn)
    _data_array(polys, "offsets", offs)
    cdata = ET.SubElement(piece, "CellData")
    for c in e.columns:
        if c not in ("eid", "kind", "vids"):
            _data_array(cdata, c, e[c].fillna(np.nan))
    ET.ElementTree(root).write(path, xml_declaration=True)


def write_vtu(vertices: DataFrame, elements: DataFrame, path: str) -> None:
    v = vertices.orderBy("vid").toPandas()
    e = elements.orderBy("eid").toPandas()
    root = ET.Element("VTKFile", {"type": "UnstructuredGrid", "version": "1.0",
                                  "byte_order": "LittleEndian"})
    ug = ET.SubElement(root, "UnstructuredGrid")
    piece = ET.SubElement(ug, "Piece", {"NumberOfPoints": str(len(v)),
                                        "NumberOfCells": str(len(e))})
    points = ET.SubElement(piece, "Points")
    _data_array(points, "Points",
                v[["x", "y", "z"]].to_numpy() if "z" in v.columns
                else np.column_stack([v["x"], v["y"], np.zeros(len(v))]), 3)
    pdata = ET.SubElement(piece, "PointData")
    for c in v.columns:
        if c not in ("vid", "x", "y", "z", "tag"):
            _data_array(pdata, c, v[c].fillna(np.nan))
    cells = ET.SubElement(piece, "Cells")
    conn, offs, types, acc = [], [], [], 0
    for _, r in e.iterrows():
        vids = [int(x) - 1 for x in r["vids"]]
        conn.extend(vids)
        acc += len(vids)
        offs.append(acc)
        types.append(KIND_TO_VTK.get(r.get("kind", "triangle"), 5))
    _data_array(cells, "connectivity", conn)
    _data_array(cells, "offsets", offs)
    _data_array(cells, "types", types)
    cdata = ET.SubElement(piece, "CellData")
    for c in e.columns:
        if c not in ("eid", "kind", "vids"):
            _data_array(cdata, c, e[c].fillna(np.nan))
    ET.ElementTree(root).write(path, xml_declaration=True)


# ---------------------------------------------------------------------------
# .vtr — RectilinearGrid ↔ long cell table (per-axis coordinate vectors,
#        the cdm.jl:61-67 / vtk/read.jl:83-98 shape)
# ---------------------------------------------------------------------------

def read_vtr(spark: SparkSession, path: str) -> DataFrame:
    doc = _VTKDoc(path)
    piece = doc.root.find("RectilinearGrid/Piece")
    coords = piece.find("Coordinates")
    arrays = coords.findall("DataArray")
    xs = doc.array(arrays[0])
    ys = doc.array(arrays[1])
    # point coordinates delimit cells: nx = len(xs)-1 cells per row
    nx, ny = max(len(xs) - 1, 1), max(len(ys) - 1, 1)
    cell = np.arange(nx * ny, dtype=np.int64)
    i = cell % nx
    j = cell // nx
    pdf = pd.DataFrame({
        "cell_id": cell, "i": i, "j": j,
        "x": (xs[i] + xs[i + 1]) / 2.0 if len(xs) > 1 else xs[i],
        "y": (ys[j] + ys[j + 1]) / 2.0 if len(ys) > 1 else ys[j],
    })
    _attach_data(pdf, piece, "CellData", doc)
    return spark.createDataFrame(pdf)


def write_vtr(df: DataFrame, path: str, xs: list, ys: list,
              value_cols: list[str] | None = None) -> None:
    pdf = df.toPandas().sort_values("cell_id")
    nx, ny = len(xs) - 1, len(ys) - 1
    if len(pdf) != nx * ny:
        raise ValueError("write_vtr needs the complete rectilinear grid")
    if value_cols is None:
        value_cols = [c for c in pdf.columns
                      if c not in ("cell_id", "i", "j", "x", "y")]
    root = ET.Element("VTKFile", {"type": "RectilinearGrid", "version": "1.0",
                                  "byte_order": "LittleEndian"})
    grid = ET.SubElement(root, "RectilinearGrid",
                         {"WholeExtent": f"0 {nx} 0 {ny} 0 0"})
    piece = ET.SubElement(grid, "Piece", {"Extent": f"0 {nx} 0 {ny} 0 0"})
    coords = ET.SubElement(piece, "Coordinates")
    _data_array(coords, "x", xs)
    _data_array(coords, "y", ys)
    _data_array(coords, "z", [0.0])
    cdata = ET.SubElement(piece, "CellData")
    for c in value_cols:
        _data_array(cdata, c, pdf[c])
    ET.ElementTree(root).write(path, xml_declaration=True)


# ---------------------------------------------------------------------------
# .vts — StructuredGrid (full point-coordinate arrays, curvilinear;
#        vtk/read.jl:100-116)
# ---------------------------------------------------------------------------

def read_vts(spark: SparkSession, path: str) -> DataFrame:
    doc = _VTKDoc(path)
    piece = doc.root.find("StructuredGrid/Piece")
    extent = [int(x) for x in piece.get("Extent").split()]
    npx = extent[1] - extent[0] + 1  # points per row
    pts = doc.array(piece.find("Points/DataArray"))
    vid = np.arange(len(pts), dtype=np.int64)
    pdf = pd.DataFrame({
        "point_id": vid,
        "i": vid % npx, "j": vid // npx,
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
    })
    _attach_data(pdf, piece, "PointData", doc)
    return spark.createDataFrame(pdf)


def write_vts(df: DataFrame, path: str, npx: int, npy: int,
              value_cols: list[str] | None = None) -> None:
    pdf = df.toPandas().sort_values("point_id")
    if len(pdf) != npx * npy:
        raise ValueError("write_vts needs the complete structured grid")
    if value_cols is None:
        value_cols = [c for c in pdf.columns
                      if c not in ("point_id", "i", "j", "x", "y", "z")]
    root = ET.Element("VTKFile", {"type": "StructuredGrid", "version": "1.0",
                                  "byte_order": "LittleEndian"})
    grid = ET.SubElement(root, "StructuredGrid",
                         {"WholeExtent": f"0 {npx - 1} 0 {npy - 1} 0 0"})
    piece = ET.SubElement(grid, "Piece",
                          {"Extent": f"0 {npx - 1} 0 {npy - 1} 0 0"})
    points = ET.SubElement(piece, "Points")
    _data_array(points, "Points",
                pdf[["x", "y", "z"]].to_numpy() if "z" in pdf.columns
                else np.column_stack([pdf["x"], pdf["y"],
                                      np.zeros(len(pdf))]), 3)
    pdata = ET.SubElement(piece, "PointData")
    for c in value_cols:
        _data_array(pdata, c, pdf[c])
    ET.ElementTree(root).write(path, xml_declaration=True)


# ---------------------------------------------------------------------------
# .vti — ImageData ↔ long cell table (+ optional mask)
# ---------------------------------------------------------------------------

def read_vti(spark: SparkSession, path: str, apply_mask_col: bool = True):
    doc = _VTKDoc(path)
    image = doc.root.find("ImageData")
    extent = [int(x) for x in image.get("WholeExtent").split()]
    origin = [float(x) for x in image.get("Origin", "0 0 0").split()]
    spacing = [float(x) for x in image.get("Spacing", "1 1 1").split()]
    nx = extent[1] - extent[0]
    ny = extent[3] - extent[2]
    nz = max(extent[5] - extent[4], 1)  # 3D fixture: maskedgrid.vti
    cell = np.arange(nx * ny * nz, dtype=np.int64)
    i = cell % nx
    j = (cell // nx) % ny
    k = cell // (nx * ny)
    pdf = pd.DataFrame({
        "cell_id": cell, "i": i, "j": j,
        "x": origin[0] + spacing[0] * (i + 0.5),
        "y": origin[1] + spacing[1] * (j + 0.5)})
    if extent[5] - extent[4] > 0:
        pdf["k"] = k
        pdf["z"] = origin[2] + spacing[2] * (k + 0.5)
    piece = image.find("Piece")
    _attach_data(pdf, piece, "CellData", doc)
    df = spark.createDataFrame(pdf)
    if apply_mask_col and "mask" in pdf.columns:
        # mask → SubGrid view (P6, vtk/read.jl:32-48)
        from geoio_jl_spark.operators.raster import apply_mask
        df = apply_mask(df.withColumn(
            "mask", df["mask"].cast("int")))
    return df


def write_vti(df: DataFrame, path: str, nx: int, ny: int,
              origin=(0.0, 0.0), spacing=(1.0, 1.0),
              value_cols: list[str] | None = None) -> None:
    """Full-grid write; for subdomains run raster.fill_to_parent first
    (K12 NaN-fill + mask), then pass the filled frame here."""
    pdf = df.toPandas().sort_values("cell_id")
    if len(pdf) != nx * ny:
        raise ValueError("write_vti needs the complete grid — use "
                         "raster.fill_to_parent for subdomains (K12)")
    if value_cols is None:
        value_cols = [c for c in pdf.columns
                      if c not in ("cell_id", "i", "j", "x", "y")]
    root = ET.Element("VTKFile", {"type": "ImageData", "version": "1.0",
                                  "byte_order": "LittleEndian"})
    image = ET.SubElement(root, "ImageData", {
        "WholeExtent": f"0 {nx} 0 {ny} 0 0",
        "Origin": f"{origin[0]} {origin[1]} 0",
        "Spacing": f"{spacing[0]} {spacing[1]} 1"})
    piece = ET.SubElement(image, "Piece", {"Extent": f"0 {nx} 0 {ny} 0 0"})
    cdata = ET.SubElement(piece, "CellData")
    for c in value_cols:
        _data_array(cdata, c, pdf[c])
    ET.ElementTree(root).write(path, xml_declaration=True)
