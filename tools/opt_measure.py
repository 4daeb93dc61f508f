"""Round-8 optimization measurement harness (measurement-only; the
driver's frozen bench.py is untouched — guide §1).

Usage:
  python tools/opt_measure.py <sf_dir> q1 q2 ...      # time + plan each query
  python tools/opt_measure.py <sf_dir> --rounds 2 q1  # best-of rounds

Per query: one warm pass (collect), then best-of timed passes using the
same .collect() methodology as bench.py so numbers are comparable, plus
.explain('formatted') written to plans/r08/<query>_current.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    rounds = 2
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    save_plans = "--plans" in args
    if save_plans:
        args.remove("--plans")
    sf_dir = args[0]
    names = args[1:]

    from geoio_jl_spark import queries as Q
    from geoio_jl_spark.session import get_spark

    spark = get_spark("opt_measure", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    reg = Q.registry()
    out: dict[str, float] = {}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r08")
    os.makedirs(plan_dir, exist_ok=True)
    for name in names:
        fn = reg[name][0]
        spark.sparkContext.setJobDescription(f"opt_measure:{name}")
        df = fn(spark, sf_dir)
        if save_plans:
            with open(os.path.join(plan_dir, f"{name}_current.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        n = len(df.collect())  # warm
        best = float("inf")
        for _ in range(rounds):
            t0 = time.time()
            fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(json.dumps({"q": name, "sec": out[name], "rows": n}),
              flush=True)
    print(json.dumps({"sf_dir": sf_dir, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    main()
