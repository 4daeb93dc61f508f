"""NetCDF-3 (classic) source/sink — from-scratch binary codec (struct/
numpy; no netCDF4 lib in this container) implementing the reference's CDM
semantics (S9/K9, src/extra/cdm.jl):

- dimension-name sniffing for axes: x/X/lon/longitude, y/Y/lat/latitude,
  t/time (cdm.jl:178-203)
- RectilinearGrid from coordinate variables → long-form cell table
- data variables whose dims == (y, x) become columns; variables with a
  leading time dimension become array<double> columns per cell
  (cdm.jl:73-80, test io/netcdf.jl:8-11)
- geographic axis order: lat/lon swapped on write for geographic CRS
  (cdm.jl:110-114) is surfaced via the axis metadata

Classic format: magic 'CDF\\x01', numrecs, dim_list, gatt_list, var_list
(each var: name, dimids, atts, type, vsize, begin), then data. Types:
1 byte, 2 char, 3 short, 4 int, 5 float, 6 double.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_DTYPES = {NC_BYTE: np.dtype(">i1"), NC_CHAR: np.dtype("S1"),
           NC_SHORT: np.dtype(">i2"), NC_INT: np.dtype(">i4"),
           NC_FLOAT: np.dtype(">f4"), NC_DOUBLE: np.dtype(">f8")}
_SIZES = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4,
          NC_DOUBLE: 8}

X_NAMES = ["x", "X", "lon", "longitude"]
Y_NAMES = ["y", "Y", "lat", "latitude"]
T_NAMES = ["t", "time", "TIME"]


class _R:
    def __init__(self, buf):
        self.b = buf
        self.p = 0

    def i4(self):
        v = struct.unpack_from(">i", self.b, self.p)[0]
        self.p += 4
        return v

    def name(self):
        n = self.i4()
        s = self.b[self.p:self.p + n].decode()
        self.p += n + (-n) % 4
        return s

    def values(self, nc_type, n):
        dt = _DTYPES[nc_type]
        nbytes = n * dt.itemsize
        arr = np.frombuffer(self.b, dt, n, self.p)
        self.p += nbytes + (-nbytes) % 4
        if nc_type == NC_CHAR:
            return arr.tobytes().decode("latin1")
        return arr

    def atts(self):
        tag = self.i4()
        n = self.i4()
        assert tag in (0, 12)
        out = {}
        for _ in range(n):
            nm = self.name()
            t = self.i4()
            cnt = self.i4()
            out[nm] = self.values(t, cnt)
        return out


def read_raw(path: str) -> dict:
    """Parse a netCDF file → {dims, gatts, vars: {name: (dims, atts,
    array)}}. Dispatches on magic: classic CDF parsed here, NetCDF-4
    (HDF5, the format of every reference ``test*.nc`` fixture) via the
    from-scratch reader in sources/hdf5nc.py."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:8] == b"\x89HDF\r\n\x1a\n":
        from geoio_jl_spark.sources import hdf5nc
        return hdf5nc.read_raw(path)
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file")
    r = _R(buf)
    r.p = 4
    numrecs = r.i4()  # noqa: F841 (no record vars supported)
    tag = r.i4()
    ndims = r.i4()
    dims = []
    if tag == 10:
        for _ in range(ndims):
            dims.append((r.name(), r.i4()))
    gatts = r.atts()
    tag = r.i4()
    nvars = r.i4()
    variables = {}
    order = []
    for _ in range(nvars if tag == 11 else 0):
        nm = r.name()
        nd = r.i4()
        dimids = [r.i4() for _ in range(nd)]
        atts = r.atts()
        t = r.i4()
        _vsize = r.i4()
        begin = r.i4()
        variables[nm] = (dimids, atts, t, begin)
        order.append(nm)
    out_vars = {}
    for nm in order:
        dimids, atts, t, begin = variables[nm]
        shape = tuple(dims[d][1] for d in dimids)
        n = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(buf, _DTYPES[t], n, begin).reshape(shape)
        out_vars[nm] = ([dims[d][0] for d in dimids], atts, arr)
    return {"dims": dims, "gatts": gatts, "vars": out_vars}


def _pick(names, candidates):
    for c in candidates:
        if c in names:
            return c
    return None


def read(spark: SparkSession, path: str, x: str | None = None,
         y: str | None = None, t: str | None = None) -> DataFrame:
    """→ long-form cell table (cell_id, i, j, x, y, var..., tvar:
    array<double>). Explicit x/y/t override the name sniffing, the
    GeoIO.load(file, x="lon_x", y="lat_y", t="time_t") keyword path
    (cdm.jl:183-186, test io/netcdf.jl test_kw.nc)."""
    raw = read_raw(path)
    vars_ = raw["vars"]
    dim_names = [d for d, _ in raw["dims"]]
    xn = x or _pick(vars_.keys(), X_NAMES) or _pick(dim_names, X_NAMES)
    yn = y or _pick(vars_.keys(), Y_NAMES) or _pick(dim_names, Y_NAMES)
    tn = t or _pick(vars_.keys(), T_NAMES) or _pick(dim_names, T_NAMES)
    if xn is None or yn is None:
        raise ValueError(f"no x/y axes found among {list(vars_)}")
    xs = vars_[xn][2].astype(np.float64) if xn in vars_ else np.arange(
        dict(raw["dims"])[xn])
    ys = vars_[yn][2].astype(np.float64) if yn in vars_ else np.arange(
        dict(raw["dims"])[yn])
    nx, ny = len(xs), len(ys)
    cell = np.arange(nx * ny, dtype=np.int64)
    i = cell % nx
    j = cell // nx
    pdf = pd.DataFrame({"cell_id": cell, "i": i, "j": j,
                        "x": xs[i], "y": ys[j]})
    for nm, (dnames, atts, arr) in vars_.items():
        if nm in (xn, yn, tn) or arr is None:
            continue
        fill = atts.get("_FillValue")
        if fill is not None and np.asarray(arr).dtype.kind == "f":
            arr = np.where(arr == np.asarray(fill).ravel()[0], np.nan, arr)
        if set(dnames) == {yn, xn}:  # per-cell scalar (P7: dims match grid)
            a = arr if dnames == [yn, xn] else arr.T
            pdf[nm] = a.astype(np.float64).reshape(ny, nx)[j, i]
        elif tn is not None and set(dnames) == {tn, yn, xn}:
            # time-series per cell → array column (cdm.jl:73-80)
            a = arr.astype(np.float64)
            axes = [dnames.index(tn), dnames.index(yn), dnames.index(xn)]
            a = np.transpose(a, axes)
            pdf[nm] = [a[:, jj, ii].tolist() for jj, ii in zip(j, i)]
    return spark.createDataFrame(pdf)


def read_crs(path: str) -> tuple[dict | None, str | None]:
    """F14: locate the CF grid-mapping variable (referenced by a data
    variable's ``grid_mapping`` attribute, cdm.jl:220-231) and convert
    its attributes → (CRS descriptor, EPSG code or None)."""
    from geoio_jl_spark.functions import cfgrid
    raw = read_raw(path)
    vars_ = raw["vars"]
    gm_name = None
    for nm, (_d, atts, _a) in vars_.items():
        gm = atts.get("grid_mapping")
        if isinstance(gm, str) and gm in vars_:
            gm_name = gm
            break
    if gm_name is None:  # fall back: any var carrying grid_mapping_name
        for nm, (_d, atts, _a) in vars_.items():
            if "grid_mapping_name" in atts:
                gm_name = nm
                break
    if gm_name is None:
        return None, None
    desc = cfgrid.gm_to_crs(vars_[gm_name][1])
    return desc, cfgrid.crs_code(desc)


def _pad(b: bytes) -> bytes:
    return b + b"\x00" * ((-len(b)) % 4)


def _w_name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">i", len(b)) + _pad(b)


def _w_atts(atts: dict | None) -> bytes:
    """Attribute list encoder (classic format: tag 12, NC_CHAR strings,
    NC_DOUBLE numerics)."""
    if not atts:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", 12, len(atts))
    for k, v in atts.items():
        out += _w_name(k)
        if isinstance(v, str):
            b = v.encode()
            out += struct.pack(">ii", NC_CHAR, len(b)) + _pad(b)
        else:
            arr = np.asarray(v, ">f8").ravel()
            out += struct.pack(">ii", NC_DOUBLE, arr.size) + arr.tobytes()
    return out


def write(df: DataFrame, path: str, x: str = "x", y: str = "y",
          value_cols: list[str] | None = None,
          crs_desc: dict | None = None, fmt: str = "classic") -> None:
    """Rectilinear/regular grids only (cdm.jl:100-102 constraint): the
    frame must be a complete (i, j) grid. ``crs_desc`` (F14) emits a
    scalar ``crs`` variable holding the CF grid-mapping attributes and
    tags every value variable with grid_mapping="crs" (cdm.jl:282-306).

    ``fmt="netcdf4"`` writes the same grid as an HDF5/NetCDF-4 file
    through sources/hdf5write.py (the reference's NCDatasets default
    format); ``"classic"`` keeps the CDF-1 codec below."""
    pdf = df.toPandas().sort_values(["j", "i"])
    xs = np.sort(pdf[x].unique())
    ys = np.sort(pdf[y].unique())
    nx, ny = len(xs), len(ys)
    if len(pdf) != nx * ny:
        raise ValueError("NetCDF write requires a complete grid "
                         "(cdm.jl:100-102 grid-only constraint)")
    if value_cols is None:
        value_cols = [c for c in pdf.columns
                      if c not in (x, y, "i", "j", "cell_id", "k", "z")]
    # list columns = per-cell time series → (t, y, x) variables, the
    # reference's save shape (cdm.jl:139-146: dnames = [tname, cnames...];
    # the t dim gets no coordinate variable, matching the reference)
    scalar_cols = [c for c in value_cols if pdf[c].dtype != object]
    array_cols = [c for c in value_cols
                  if pdf[c].dtype == object
                  and isinstance(pdf[c].iloc[0], (list, np.ndarray))]
    nt = len(pdf[array_cols[0]].iloc[0]) if array_cols else 0
    from geoio_jl_spark.functions import cfgrid
    gm_atts = cfgrid.crs_to_gm(crs_desc) if crs_desc else None
    val_atts = {"grid_mapping": "crs"} if gm_atts else None
    if fmt == "netcdf4":
        from geoio_jl_spark.sources.hdf5write import write_raw
        dims = [(y, ny), (x, nx)] + ([("t", nt)] if array_cols else [])
        variables = {
            y: ([y], {}, np.asarray(ys, np.float64)),
            x: ([x], {}, np.asarray(xs, np.float64)),
        }
        for c in scalar_cols:
            variables[c] = ([y, x], dict(val_atts or {}),
                            np.asarray(pdf[c], np.float64).reshape(ny, nx))
        for c in array_cols:
            cube = np.array([np.asarray(v, np.float64) for v in pdf[c]]) \
                .reshape(ny, nx, nt).transpose(2, 0, 1)
            variables[c] = (["t", y, x], dict(val_atts or {}), cube)
        if gm_atts:
            variables["crs"] = ([], dict(gm_atts), np.int32(0))
        write_raw(path, dims, variables, {})
        return
    if fmt != "classic":
        raise ValueError(f"fmt must be 'classic' or 'netcdf4', got {fmt!r}")
    ndims = 2 + (1 if array_cols else 0)
    header = b"CDF\x01" + struct.pack(">i", 0)
    header += struct.pack(">ii", 10, ndims)  # dim_list
    header += _w_name(y) + struct.pack(">i", ny)
    header += _w_name(x) + struct.pack(">i", nx)
    if array_cols:
        header += _w_name("t") + struct.pack(">i", nt)
    header += struct.pack(">ii", 0, 0)  # no gatts
    nvars = 2 + len(scalar_cols) + len(array_cols) + (1 if gm_atts else 0)
    var_list = struct.pack(">ii", 11, nvars)
    # layout: header then data blocks in order y, x, value vars[, crs]
    def var_entry(nm, dimids, begin, vsize, nc_type, atts):
        e = _w_name(nm)
        e += struct.pack(">i", len(dimids))
        for d in dimids:
            e += struct.pack(">i", d)
        e += _w_atts(atts)
        e += struct.pack(">iii", nc_type, vsize, begin)
        return e

    # (name, dimids, vsize, nc_type, atts)
    entries = [(y, [0], ny * 8, NC_DOUBLE, None),
               (x, [1], nx * 8, NC_DOUBLE, None)]
    entries += [(c, [0, 1], ny * nx * 8, NC_DOUBLE, val_atts)
                for c in scalar_cols]
    entries += [(c, [2, 0, 1], nt * ny * nx * 8, NC_DOUBLE, val_atts)
                for c in array_cols]
    if gm_atts:
        entries.append(("crs", [], 4, NC_INT, gm_atts))
    # compute header size first with dummy begins, then fix up
    dummy = b"".join(var_entry(nm, d, 0, vs, t, a)
                     for nm, d, vs, t, a in entries)
    begin0 = len(header) + len(var_list) + len(dummy)
    begins, pos = [], begin0
    for _nm, _d, vs, _t, _a in entries:
        begins.append(pos)
        pos += vs
    body = var_list + b"".join(
        var_entry(nm, d, b, vs, t, a)
        for (nm, d, vs, t, a), b in zip(entries, begins))
    with open(path, "wb") as f:
        f.write(header + body)
        f.write(np.asarray(ys, ">f8").tobytes())
        f.write(np.asarray(xs, ">f8").tobytes())
        for c in scalar_cols:
            grid = np.asarray(pdf[c], np.float64).reshape(ny, nx)
            f.write(grid.astype(">f8").tobytes())
        for c in array_cols:
            # rows sorted (j, i); stack → (ny*nx, nt) → (t, y, x)
            cube = np.array([np.asarray(v, np.float64)
                             for v in pdf[c]]).reshape(ny, nx, nt)
            f.write(cube.transpose(2, 0, 1).astype(">f8").tobytes())
        if gm_atts:
            f.write(struct.pack(">i", 0))  # crs scalar placeholder value
