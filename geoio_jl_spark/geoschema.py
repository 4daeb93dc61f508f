"""GeoSchema — the engine-level descriptor replacing the reference's
type-level CRS/domain information (SURVEY.md §1.3).

The reference attaches CRS to the geometry *type* (gi.jl:63-68) and finds
the geometry column by a name convention (gis.jl:104-114).  Spark columns
carry no rich types, so the engine stores
``{crs, axis_order, unit, encoding}`` in ``StructField.metadata`` (survives
select/filter/join) plus this descriptor object at the API layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# priority order of the reference's geometry-column discovery
# (gis.jl:104-114): geometry, geom, shape — any case — then empty name
GEOM_NAMES = ["geometry", "geom", "shape", ""]


class GeoColumnNotFound(ValueError):
    pass


def detect_geometry_column(columns: list[str]) -> str:
    """Replicates the `geometry|geom|shape` (+case variants, +"") priority
    order of the reference (gis.jl:104-114)."""
    lower = {c.lower(): c for c in reversed(columns)}  # first occurrence wins
    for name in GEOM_NAMES:
        if name in lower:
            return lower[name]
    raise GeoColumnNotFound(
        f"geometry column not found in {columns}; expected one of {GEOM_NAMES}"
    )


def uniquename(names: set[str], name: str) -> str:
    """Append '_' until unique (utils.jl:13-26)."""
    while name in names:
        name = name + "_"
    return name


def uniquenames(existing: list[str], wanted: list[str]) -> list[str]:
    """Collision-free names for new columns (csv.jl:50 usage)."""
    taken = set(existing)
    out = []
    for w in wanted:
        u = uniquename(taken, w)
        taken.add(u)
        out.append(u)
    return out


@dataclass
class GeoSchema:
    """Column-level geo metadata for a DataFrame."""

    geometry_column: str = "geometry"
    crs: str = "EPSG:4326"          # authority:code / WKT2 / PROJJSON
    axis_order: str = "lonlat"      # WKB stores (lon, lat) — wkb.jl:81-92
    unit: str = "m"                 # canonical length unit (utils.jl:6-10)
    encoding: str = "WKB"           # geometry column encoding
    extra: dict = field(default_factory=dict)

    def to_metadata(self) -> dict:
        return {
            "crs": self.crs, "axis_order": self.axis_order,
            "unit": self.unit, "encoding": self.encoding, **self.extra,
        }

    @classmethod
    def from_df(cls, df: DataFrame, geometry_column: str | None = None) -> "GeoSchema":
        gcol = geometry_column or detect_geometry_column(df.columns)
        md = {}
        for f in df.schema.fields:
            if f.name == gcol:
                md = dict(f.metadata or {})
        return cls(
            geometry_column=gcol,
            crs=md.get("crs", "EPSG:4326"),
            axis_order=md.get("axis_order", "lonlat"),
            unit=md.get("unit", "m"),
            encoding=md.get("encoding", "WKB"),
        )


def with_geo_metadata(df: DataFrame, schema: GeoSchema) -> DataFrame:
    """Attach the GeoSchema to the geometry column's StructField metadata."""
    from pyspark.sql import functions as F
    g = schema.geometry_column
    return df.withColumn(g, F.col(g).alias(g, metadata=schema.to_metadata()))
