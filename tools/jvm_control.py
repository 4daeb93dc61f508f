"""Pure-JVM Spark control: a fixed whole-stage-codegen range aggregation
(no Python workers, no Arrow, no I/O) at a given local[N] — isolates
"does a single Spark JVM scale on this host" from everything this repo's
operators do.  Run under the same taskset pin as the flagship probe so
the two are comparable.

Usage: python tools/jvm_control.py <cores> [trials]
"""

import json
import sys
import time

from pyspark.sql import SparkSession

_ROWS = 2_000_000_000


def main():
    cores = int(sys.argv[1])
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .appName(f"jvmctl{cores}")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def probe():
        t0 = time.time()
        spark.range(0, _ROWS, 1, cores * 4).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s").collect()
        return time.time() - t0

    probe()  # warm (JIT + codegen)
    times = [round(probe(), 3) for _ in range(trials)]
    spark.stop()
    print(json.dumps({"cores": cores, "rows": _ROWS, "times": times,
                      "best_sec": min(times),
                      "rows_per_sec": round(_ROWS / min(times), 0)}))


if __name__ == "__main__":
    main()
