"""Ship the package to Python workers (spark-submit --py-files analog).

Pandas UDFs defined in this package are pickled *by reference*: workers
re-import ``geoio_jl_spark``.  When the driver process was started outside
the repo root (or on a real cluster), workers can't see the package — so
every UDF-bearing operator calls ``ensure_pyfiles(spark)`` first, which
zips the package once and distributes it via ``SparkContext.addPyFile``
(idempotent per context).  On a real multi-executor deployment this is
exactly what ``spark-submit --py-files geoio_jl_spark.zip`` does; this
helper makes library usage self-carrying.
"""

from __future__ import annotations

import os
import zipfile

_FLAG = "_geoio_jl_spark_shipped"


def package_zip_path() -> str:
    import geoio_jl_spark
    pkg_dir = os.path.dirname(os.path.abspath(geoio_jl_spark.__file__))
    out = os.path.join("/tmp", f"geoio_jl_spark_{os.getpid()}.zip")
    if not os.path.exists(out):
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        "geoio_jl_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    return out


def ensure_pyfiles(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    sc.addPyFile(package_zip_path())
    setattr(sc, _FLAG, True)
