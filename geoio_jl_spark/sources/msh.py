"""Gmsh 4.1 MSH source/sink (reference S10/K10, src/extra/msh.jl).

Read: $Nodes / $Elements blocks; node tags may be sparse, so element
connectivity is remapped tag → dense index via a join — the Spark
re-expression of the reference's `nodetag → position` dict (J2,
msh.jl:37-40). $NodeData / $ElementData become columns aligned to tags
with null fill (A7, msh.jl:235-242).

Element type map mirrors msh.jl:125-126 / vtk cell table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# gmsh element type → (name, n_nodes)
ELEM_TYPES = {1: ("segment", 2), 2: ("triangle", 3), 3: ("quad", 4),
              4: ("tetrahedron", 4), 5: ("hexahedron", 8), 7: ("pyramid", 5)}


def read(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    i = 0

    def section(name: str) -> int:
        try:
            return lines.index(f"${name}")
        except ValueError:
            return -1

    # $Nodes
    i = section("Nodes")
    assert i >= 0, "no $Nodes section"
    nblocks = int(lines[i + 1].split()[0])
    pos = i + 2
    node_rows = []
    for _ in range(nblocks):
        _dim, _tag, _param, nnodes = (int(x) for x in lines[pos].split())
        pos += 1
        tags = [int(lines[pos + k]) for k in range(nnodes)]
        pos += nnodes
        for k in range(nnodes):
            x, y, z = (float(v) for v in lines[pos + k].split()[:3])
            node_rows.append((tags[k], x, y, z))
        pos += nnodes
    nodes_pdf = pd.DataFrame(node_rows, columns=["tag", "x", "y", "z"])

    # $Elements
    i = section("Elements")
    assert i >= 0, "no $Elements section"
    nblocks = int(lines[i + 1].split()[0])
    pos = i + 2
    elem_rows = []
    for _ in range(nblocks):
        _dim, _etag, etype, nelems = (int(x) for x in lines[pos].split())
        pos += 1
        name, nn = ELEM_TYPES.get(etype, (f"type{etype}", None))
        for k in range(nelems):
            toks = [int(x) for x in lines[pos + k].split()]
            elem_rows.append((toks[0], name, toks[1:]))
        pos += nelems
    elems_pdf = pd.DataFrame(elem_rows, columns=["etag", "kind", "node_tags"])

    # $NodeData → column aligned to node tags, null fill (A7)
    i = section("NodeData")
    data_col = None
    if i >= 0:
        nstr = int(lines[i + 1])
        name = lines[i + 2].strip('"') if nstr else "nodedata"
        pos = i + 2 + nstr
        nreal = int(lines[pos]); pos += 1 + nreal
        nints = int(lines[pos]); pos += 1
        ints = [int(lines[pos + k]) for k in range(nints)]
        pos += nints
        nentries = ints[2] if len(ints) >= 3 else 0
        vals = {}
        for k in range(nentries):
            toks = lines[pos + k].split()
            vals[int(toks[0])] = float(toks[1])
        data_col = (name, vals)

    nodes = spark.createDataFrame(nodes_pdf)
    # dense vertex ids ordered by tag — two-phase distributed rank, not
    # a single-partition global Window (r8, VERDICT r7 item 5)
    from geoio_jl_spark.operators.packing import global_row_ids
    nodes = global_row_ids(nodes, ["tag"], out="vid")
    if data_col is not None:
        name, vals = data_col
        mapping = spark.createDataFrame(
            pd.DataFrame(list(vals.items()), columns=["tag", name]))
        nodes = nodes.join(mapping, "tag", "left")  # null fill for gaps
    elems = spark.createDataFrame(elems_pdf)
    # J2: remap node tags → dense vids via explode + join + reassemble
    tagmap = nodes.select("tag", "vid")
    remapped = (
        elems.select("etag", "kind",
                     F.posexplode("node_tags").alias("pos", "tag"))
        .join(tagmap, "tag")
        .groupBy("etag", "kind")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "vid"))).alias("pv"))
        .select("etag", "kind", F.expr("transform(pv, s -> s.vid)").alias("vids"))
    )
    return nodes.select("vid", "tag", "x", "y", "z",
                        *([data_col[0]] if data_col else [])), remapped


def write(vertices: DataFrame, elements: DataFrame, path: str) -> None:
    v = vertices.orderBy("vid").toPandas()
    e = elements.orderBy("etag" if "etag" in elements.columns else "eid").toPandas()
    if "kind" not in e.columns:  # infer from arity (meshes without kinds)
        arity_kind = {2: "segment", 3: "triangle", 4: "quad",
                      5: "pyramid", 8: "hexahedron"}
        e["kind"] = e["vids"].apply(lambda xs: arity_kind.get(len(xs), "triangle"))
    name2type = {name: t for t, (name, _n) in ELEM_TYPES.items()}
    with open(path, "w") as f:
        f.write("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n")
        f.write("$Nodes\n")
        f.write(f"1 {len(v)} 1 {len(v)}\n")
        f.write(f"3 1 0 {len(v)}\n")
        for vid in v["vid"]:
            f.write(f"{int(vid)}\n")
        for _, r in v.iterrows():
            f.write(f"{r['x']} {r['y']} {r['z']}\n")
        f.write("$EndNodes\n$Elements\n")
        groups = e.groupby("kind", sort=False)
        f.write(f"{len(groups)} {len(e)} 1 {len(e)}\n")
        tag = 1
        for kind, grp in groups:
            etype = name2type.get(kind, 2)
            f.write(f"3 1 {etype} {len(grp)}\n")
            for _, r in grp.iterrows():
                f.write(f"{tag} " + " ".join(str(int(x)) for x in r["vids"]) + "\n")
                tag += 1
        f.write("$EndElements\n")
