"""geoio_jl_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query / data-processing capabilities of JuliaEarth/GeoIO.jl
(reference at /root/reference, v1.22.6) as idiomatic Spark: the reference's
GeoTable (attribute columns + geometry domain, src/extra/gis.jl:66-101)
becomes a plain DataFrame with a WKB geometry column + GeoSchema metadata;
its single-machine format adapters become Spark sources/sinks; its R-tree
spatial index (src/extra/gpkg.jl:411-448) becomes an integer cell index used
as an equi-join key so Catalyst's own join machinery (broadcast / sort-merge
/ AQE skew splitting) executes the spatial joins.
"""

__version__ = "0.1.0"

from geoio_jl_spark.session import get_spark  # noqa: F401
