"""Format registry + load/save dispatch (reference S1/K1/S17/S18).

The reference dispatches on file extension in a fixed order
(src/load.jl:88-158, src/save.jl:76-134); here a dict registry.  ``load``
returns (DataFrame, GeoSchema); mesh formats return the two-table mesh
pair.  ``loadvalues`` reproduces load.jl:189-215: attributes-only scan
with ``rows=:all`` (drop geometry) or ``rows=:invalid`` (only rows whose
geometry is missing — the anti-filter P4).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoio_jl_spark.geoschema import GeoSchema, detect_geometry_column
from geoio_jl_spark.sources import (
    csvgeo, geojson, geoparquet, geotiff, gpkg, grib2, gslib, img, meshtext,
    msh, netcdf3, ply, shapefile, stl, vtk, warc,
)

# extension → (reader, writer, kind, notes)
FORMATS = {
    ".csv": (csvgeo.read, csvgeo.write, "table", "point coords columns"),
    ".parquet": (geoparquet.read, geoparquet.write, "table", "WKB geometry + geo metadata"),
    ".geoparquet": (geoparquet.read, geoparquet.write, "table", "alias of .parquet"),
    ".geojson": (geojson.read, geojson.write, "table", "FeatureCollection (driver-side)"),
    ".geojsonl": (geojson.read_seq, geojson.write_seq, "table", "newline-delimited (distributed)"),
    ".gpkg": (gpkg.read, gpkg.write, "table", "GeoPackage (sqlite, R-tree index)"),
    ".shp": (shapefile.read, shapefile.write, "table", "shp/shx/dbf/prj (from scratch)"),
    ".gslib": (gslib.read, gslib.write, "table", "header-driven text table"),
    ".tif": (geotiff.read, geotiff.write, "grid", "baseline TIFF + GeoKeys (from scratch)"),
    ".tiff": (geotiff.read, geotiff.write, "grid", "alias of .tif"),
    ".nc": (netcdf3.read, netcdf3.write, "grid", "NetCDF classic + HDF5/NetCDF-4 (from scratch)"),
    ".grib": (grib2.read, None, "grid", "GRIB2 (simple packing, latlon/gaussian)"),
    ".grib2": (grib2.read, None, "grid", "alias of .grib"),
    ".png": (img.read, img.write, "grid", "PNG via stdlib zlib (from scratch)"),
    ".jpg": (img.read, img.write, "grid", "baseline JPEG (from scratch)"),
    ".jpeg": (img.read, img.write, "grid", "alias of .jpg"),
    ".gif": (img.read, None, "grid", "GIF87a/89a incl. LZW (from scratch)"),
    ".bmp": (img.read, None, "grid", "uncompressed DIB (from scratch)"),
    ".ico": (img.read, None, "grid", "favicon (PNG/DIB entries)"),
    ".obj": (meshtext.read_obj, meshtext.write_obj, "mesh", "vertices+faces"),
    ".off": (meshtext.read_off, meshtext.write_off, "mesh", "vertices+faces+colors"),
    ".stl": (stl.read, stl.write, "mesh", "binary/ascii, vertex dedup"),
    ".ply": (ply.read, ply.write, "mesh", "ascii, vtable+etable props"),
    ".msh": (msh.read, msh.write, "mesh", "Gmsh 4.1, tag remap + data cols"),
    ".vtu": (vtk.read_vtu, vtk.write_vtu, "mesh", "VTK XML unstructured (+pixel/voxel reorder)"),
    ".vtp": (vtk.read_vtp, vtk.write_vtp, "mesh", "VTK XML polydata (Polys as N-gons)"),
    ".vti": (vtk.read_vti, vtk.write_vti, "grid", "VTK XML image (mask -> SubGrid)"),
    ".vtr": (vtk.read_vtr, vtk.write_vtr, "grid", "VTK XML rectilinear (axis vectors)"),
    ".vts": (vtk.read_vts, vtk.write_vts, "grid", "VTK XML structured (curvilinear)"),
    ".warc": (warc.read, warc.write, "table", "ISO 28500 web archive (+.warc.gz members)"),
}


def formats() -> pd.DataFrame:
    """Capability catalog (GeoIO.formats analog, src/GeoIO.jl:101-115),
    sorted by extension (W1)."""
    rows = [
        (ext, rd is not None, wr is not None, kind, notes)
        for ext, (rd, wr, kind, notes) in FORMATS.items()
    ]
    return pd.DataFrame(
        rows, columns=["extension", "load", "save", "kind", "notes"]
    ).sort_values("extension").reset_index(drop=True)


def _dispatch(path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".gz" and path.lower().endswith(".warc.gz"):
        ext = ".warc"   # Common Crawl convention: per-record gzip members
    if ext not in FORMATS:
        raise ValueError(
            f"unsupported format {ext!r}; supported: {sorted(FORMATS)}"
        )
    return FORMATS[ext]


def load(spark: SparkSession, path: str, **kw):
    reader, _, kind, _ = _dispatch(path)
    if reader is None:
        raise ValueError(f"no reader for {path}")
    return reader(spark, path, **kw)


def save(df, path: str, **kw) -> None:
    _, writer, kind, _ = _dispatch(path)
    if writer is None:
        raise ValueError(f"no writer for {path}")
    if kind == "mesh":
        vertices, elements = df  # mesh saves take the two-table pair
        writer(vertices, elements, path, **kw)
    else:
        writer(df, path, **kw)


def loadvalues(spark: SparkSession, path: str, rows: str = "all", **kw) -> DataFrame:
    """Attributes-only scan (load.jl:189-215). rows='all' drops the
    geometry column (P2); rows='invalid' returns only rows with missing
    geometry (P4)."""
    df = load(spark, path, **kw)
    gcol = detect_geometry_column(df.columns)
    if rows == "all":
        return df.drop(gcol)
    if rows == "invalid":
        return df.filter(F.col(gcol).isNull()).drop(gcol)
    raise ValueError(f"rows must be 'all' or 'invalid', got {rows!r}")


def filter_missing_geometry(df: DataFrame, geometry_column: str | None = None):
    """Missing-geometry split with count (P3, gis.jl:76-88): returns
    (valid_df, invalid_count_df). The count comes from an ``observe``
    metric so it costs no extra pass."""
    gcol = geometry_column or detect_geometry_column(df.columns)
    from pyspark.sql import Observation
    obs = Observation(f"missing_{gcol}")
    observed = df.observe(
        obs, F.sum(F.when(F.col(gcol).isNull(), 1).otherwise(0)).alias("n_missing")
    )
    return observed.filter(F.col(gcol).isNotNull()), obs
