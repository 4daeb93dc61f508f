"""GeoJSON source/sink (reference S4/K4, gis.jl:28-39,54-55).

Two layouts:

- ``.geojsonl`` (newline-delimited features) — the **distributed** path:
  ``spark.read.text`` → Arrow-batched parse kernel (json → WKB), and the
  mirror-image distributed write.  This is the layout a 100-TB pipeline
  uses; plain .geojson is a single unsplittable document.
- ``.geojson`` (FeatureCollection) — driver-side parse/serialize, matching
  the reference's single-file delegate role.

Write applies the reference's **auto-reproject-with-warning** semantics
(gis.jl:29-38): GeoJSON requires WGS84 lon/lat, so a differing GeoSchema
CRS is reprojected via the built-in transforms (functions.crs) with a
warning, or rejected when no transform is known.
"""

from __future__ import annotations

import json
import warnings

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.functions.geojson_geom import geojson_to_geom, geom_to_geojson
from geoio_jl_spark.geoschema import GeoSchema, with_geo_metadata

WGS84 = "EPSG:4326"


@F.pandas_udf(BinaryType())
def _feature_to_wkb(lines: pd.Series) -> pd.Series:
    def conv(line):
        if line is None or not line.strip():
            return None
        feat = json.loads(line)
        g = feat.get("geometry")
        return None if g is None else W.encode_wkb(geojson_to_geom(g))
    return lines.apply(conv)


@F.pandas_udf(StringType())
def _feature_props(lines: pd.Series) -> pd.Series:
    def conv(line):
        if line is None or not line.strip():
            return None
        return json.dumps(json.loads(line).get("properties") or {})
    return lines.apply(conv)


def read_seq(spark: SparkSession, path: str) -> DataFrame:
    """Distributed GeoJSONSeq scan: text → (properties json, WKB)."""
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(spark)
    txt = spark.read.text(path)
    out = txt.select(
        _feature_props(F.col("value")).alias("properties"),
        _feature_to_wkb(F.col("value")).alias("geometry"),
    )
    return with_geo_metadata(out, GeoSchema(crs=WGS84))


def read(spark: SparkSession, path: str) -> DataFrame:
    """Single FeatureCollection document (driver-side parse, like the
    reference's GJS.read delegate)."""
    with open(path) as f:
        doc = json.load(f)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
    rows, keys = [], []
    for ft in feats:
        props = ft.get("properties") or {}
        for k in props:
            if k not in keys:
                keys.append(k)
    for ft in feats:
        props = ft.get("properties") or {}
        geom = ft.get("geometry")
        wkb = None if geom is None else W.encode_wkb(geojson_to_geom(geom))
        rows.append(tuple(props.get(k) for k in keys) + (wkb,))
    pdf = pd.DataFrame(rows, columns=keys + ["geometry"])
    df = spark.createDataFrame(pdf)
    return with_geo_metadata(df, GeoSchema(crs=WGS84))


def _require_wgs84(df: DataFrame, schema: GeoSchema) -> DataFrame:
    if schema.crs in (WGS84, "OGC:CRS84"):
        return df
    # gis.jl:29-38: GeoJSON only supports WGS84 — reproject with a warning
    from geoio_jl_spark.functions.crs import transform_wkb_udf
    warnings.warn(
        f"GeoJSON requires WGS84 lon/lat; reprojecting geometries from "
        f"{schema.crs} (reference behavior, gis.jl:29-38)"
    )
    g = schema.geometry_column
    return df.withColumn(g, transform_wkb_udf(schema.crs, WGS84)(F.col(g)))


def write_seq(df: DataFrame, path: str, schema: GeoSchema | None = None,
              mode: str = "overwrite") -> None:
    """Distributed GeoJSONSeq write: one feature per line."""
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(df.sparkSession)
    schema = schema or GeoSchema.from_df(df)
    df = _require_wgs84(df, schema)
    g = schema.geometry_column
    attrs = [c for c in df.columns if c != g]

    @F.pandas_udf(StringType())
    def to_feature(wkbs: pd.Series, props_json: pd.Series) -> pd.Series:
        out = []
        for blob, pj in zip(wkbs, props_json):
            geom = None if blob is None else geom_to_geojson(W.decode_wkb(bytes(blob)))
            out.append(json.dumps(
                {"type": "Feature", "properties": json.loads(pj), "geometry": geom},
                separators=(",", ":"), default=str,
            ))
        return pd.Series(out)

    props = F.to_json(F.struct(*[F.col(c) for c in attrs])) if attrs else F.lit("{}")
    df.select(to_feature(F.col(g), props).alias("value")).write.mode(mode).text(path)


def write(df: DataFrame, path: str, schema: GeoSchema | None = None) -> None:
    """Single FeatureCollection document (collects — fixture/interchange)."""
    schema = schema or GeoSchema.from_df(df)
    df = _require_wgs84(df, schema)
    g = schema.geometry_column
    attrs = [c for c in df.columns if c != g]
    feats = []
    for row in df.collect():
        blob = row[g]
        feats.append({
            "type": "Feature",
            "properties": {k: row[k] for k in attrs},
            "geometry": None if blob is None
            else geom_to_geojson(W.decode_wkb(bytes(blob))),
        })
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f, default=str)
