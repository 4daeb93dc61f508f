"""Build geoio_jl_spark.zip for spark-submit --py-files."""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoio_jl_spark.shipping import package_zip_path

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "geoio_jl_spark.zip"
    shutil.copy(package_zip_path(), out)
    print(out)
