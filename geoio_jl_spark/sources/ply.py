"""PLY (ascii) source/sink (reference S13/K10, src/extra/ply.jl).

The reference maps PLY vertex properties beyond x/y/z into the per-vertex
table and face properties into the per-element table (ply.jl:6-30); same
two-table mesh shape here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    with open(path) as f:
        lines = [ln.rstrip("\n") for ln in f]
    assert lines[0].strip() == "ply", "not a PLY file"
    assert "ascii" in lines[1], "only ascii PLY supported"
    elements = []  # (name, count, [(prop_name, is_list)])
    i = 2
    while lines[i].strip() != "end_header":
        toks = lines[i].split()
        if toks[0] == "element":
            elements.append((toks[1], int(toks[2]), []))
        elif toks[0] == "property":
            if toks[1] == "list":
                elements[-1][2].append((toks[-1], True))
            else:
                elements[-1][2].append((toks[-1], False))
        i += 1
    i += 1
    tables = {}
    for name, count, props in elements:
        rows = []
        for r in range(count):
            toks = lines[i].split()
            i += 1
            vals, p = [], 0
            for pname, is_list in props:
                if is_list:
                    n = int(toks[p])
                    vals.append([int(x) for x in toks[p + 1:p + 1 + n]])
                    p += 1 + n
                else:
                    vals.append(float(toks[p]))
                    p += 1
            rows.append(vals)
        tables[name] = pd.DataFrame(rows, columns=[p[0] for p in props])
    vpdf = tables.get("vertex", pd.DataFrame())
    vpdf.insert(0, "vid", range(1, len(vpdf) + 1))
    epdf = tables.get("face", pd.DataFrame())
    if "vertex_indices" in epdf.columns:
        epdf = epdf.rename(columns={"vertex_indices": "vids"})
    if "vids" in epdf.columns:
        epdf["vids"] = epdf["vids"].apply(lambda xs: [x + 1 for x in xs])
    epdf.insert(0, "eid", range(1, len(epdf) + 1))
    return spark.createDataFrame(vpdf), spark.createDataFrame(epdf)


def write(vertices: DataFrame, elements: DataFrame, path: str) -> None:
    v = vertices.orderBy("vid").toPandas()
    e = elements.orderBy("eid").toPandas()
    vprops = [c for c in v.columns if c != "vid"]
    eprops = [c for c in e.columns if c not in ("eid", "vids")]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(v)}\n")
        for c in vprops:
            f.write(f"property float {c}\n")
        f.write(f"element face {len(e)}\n")
        f.write("property list uchar int vertex_indices\n")
        for c in eprops:
            f.write(f"property float {c}\n")
        f.write("end_header\n")
        for _, r in v.iterrows():
            f.write(" ".join(repr(float(r[c])) for c in vprops) + "\n")
        for _, r in e.iterrows():
            vids = [int(x) - 1 for x in r["vids"]]
            line = f"{len(vids)} " + " ".join(map(str, vids))
            for c in eprops:
                line += f" {float(r[c])!r}"
            f.write(line + "\n")
