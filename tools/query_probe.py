"""Per-query interleaved best-of probe in a fresh process (one fixed
core count) — the per-level half of bench.py's noise-controlled
protocol.  Usage: query_probe.py <cores> <sf_dir> <rounds>."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores, sf_dir, rounds = sys.argv[1], sys.argv[2], sys.argv[3]
    from bench import time_queries
    from geoio_jl_spark.session import get_spark
    spark = get_spark("query_probe", cores=int(cores), driver_memory="24g",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    q = time_queries(spark, sf_dir, int(rounds))
    spark.stop()
    print(json.dumps({"cores": int(cores), "queries": q}))


if __name__ == "__main__":
    main()
