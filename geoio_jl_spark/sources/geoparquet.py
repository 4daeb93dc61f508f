"""GeoParquet source/sink (reference S5/K5, gis.jl:40-42,56-57).

Geometry travels as WKB binary — natively scannable by ``spark.read
.parquet`` (column pruning + predicate pushdown on attribute columns come
free).  CRS/metadata handling:

- **read**: look for the GeoParquet ``geo`` key in the parquet footer of
  the first file (spec-compliant files written by pyarrow/GDAL), falling
  back to a ``_geo_metadata.json`` sidecar (our distributed writes), then
  to name-convention detection (gis.jl:104-114).
- **write**: ``df.write.parquet`` (distributed) + sidecar JSON carrying
  the GeoParquet-style metadata (Spark cannot inject custom footer
  key-values from the DataFrame writer).  ``write_single`` produces a
  spec-compliant single .parquet with a real ``geo`` footer via pyarrow —
  the interchange path for files the reference's ecosystem would read.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession

from geoio_jl_spark.geoschema import GeoSchema, detect_geometry_column, with_geo_metadata

GEO_KEY = b"geo"
SIDECAR = "_geo_metadata.json"
SPEC_VERSION = "1.0.0"


def _geo_meta_dict(schema: GeoSchema, spec: bool = False) -> dict:
    """GeoParquet ``geo`` metadata. ``spec=True`` (real parquet footers)
    emits ``crs`` as a PROJJSON object as the 1.0.0 spec requires —
    GDAL/GeoPandas reject plain "EPSG:xxxx" strings there — or omits the
    key entirely (spec default OGC:CRS84) for codes outside the corpus.
    The internal sidecar keeps the compact string form."""
    col: dict = {"encoding": "WKB", "geometry_types": []}
    if spec:
        code = None
        if isinstance(schema.crs, str) and schema.crs.upper().startswith("EPSG:"):
            try:
                code = int(schema.crs.split(":")[1])
            except ValueError:
                code = None
        if code is not None:
            from geoio_jl_spark.functions.wkt2_corpus import projjson_for
            doc = projjson_for(code)
            if doc is not None:
                col["crs"] = doc
    else:
        col["crs"] = schema.crs
    return {
        "version": SPEC_VERSION,
        "primary_column": schema.geometry_column,
        "columns": {schema.geometry_column: col},
    }


def _read_footer_geo(path: str) -> dict | None:
    import pyarrow.parquet as pq
    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or [path]
    try:
        meta = pq.read_schema(files[0]).metadata or {}
    except Exception:
        return None
    if GEO_KEY in meta:
        return json.loads(meta[GEO_KEY].decode())
    return None


def read(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    geo = _read_footer_geo(path)
    if geo is None:
        sidecar = os.path.join(path, SIDECAR)
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                geo = json.load(f)
    if geo:
        gcol = geo.get("primary_column", "geometry")
        crs = geo.get("columns", {}).get(gcol, {}).get("crs", "OGC:CRS84")
        if crs is None:
            crs = "OGC:CRS84"  # spec default when crs is null/omitted
        elif not isinstance(crs, str):  # PROJJSON object → authority code
            from geoio_jl_spark.functions.crsstrings import projjson_code
            try:
                crs = projjson_code(crs)
            except ValueError:
                crs = json.dumps(crs)
        return with_geo_metadata(df, GeoSchema(geometry_column=gcol, crs=crs))
    gcol = detect_geometry_column(df.columns)
    return with_geo_metadata(df, GeoSchema(geometry_column=gcol))


def write(df: DataFrame, path: str, schema: GeoSchema | None = None,
          mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    schema = schema or GeoSchema.from_df(df)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    with open(os.path.join(path, SIDECAR), "w") as f:
        json.dump(_geo_meta_dict(schema), f)


def write_single(df: DataFrame, path: str, schema: GeoSchema | None = None) -> None:
    """Spec-compliant single-file GeoParquet with a real ``geo`` footer
    (collects to driver — interchange/fixture path, not the scale path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = schema or GeoSchema.from_df(df)
    table = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
    meta = dict(table.schema.metadata or {})
    meta[GEO_KEY] = json.dumps(_geo_meta_dict(schema, spec=True)).encode()
    pq.write_table(table.replace_schema_metadata(meta), path)
