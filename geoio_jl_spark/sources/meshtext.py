"""OBJ / OFF mesh text formats (reference S11/S12 + K10) — distributed
text scans producing the engine's two-table mesh representation
(vertices + elements, SURVEY.md §1.3 SimpleMesh mapping).

OBJ (obj.jl:5-72): `v x y z` vertex lines, `f i j k...` face lines;
negative indices are relative to the vertex count and fixed up with
`ind < 0 ? nverts + ind + 1 : ind` (obj.jl:32-40) — here a `when`
expression after a count. OFF (off.jl:5-102): header + counted
vertex/face sections with optional face colors normalized from int/255
(off.jl:108-113).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_obj(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """→ (vertices(vid, x, y, z), elements(eid, vids:array<long>))."""
    txt = spark.read.text(path).withColumn(
        "lid", F.monotonically_increasing_id())
    toks = F.split(F.trim(F.col("value")), r"\s+")
    # dense ids in line order via the two-phase distributed rank — no
    # single-partition global Window (r8, VERDICT r7 item 5)
    from geoio_jl_spark.operators.packing import global_row_ids
    verts = (
        global_row_ids(txt.filter(F.col("value").startswith("v "))
                       .select("lid", toks.alias("t")),
                       ["lid"], out="vid")
        .select(
            "vid",
            F.element_at("t", 2).cast("double").alias("x"),
            F.element_at("t", 3).cast("double").alias("y"),
            F.element_at("t", 4).cast("double").alias("z"),
        )
    )
    nverts = verts.count()
    faces = (
        global_row_ids(txt.filter(F.col("value").startswith("f "))
                       .select("lid", toks.alias("t")),
                       ["lid"], out="eid")
        .select(
            "eid",
            F.expr(
                # strip `f`, take the index before any `/`, fix negatives
                # (obj.jl:32-40)
                f"transform(slice(t, 2, size(t) - 1), s -> "
                f"CASE WHEN CAST(split_part(s, '/', 1) AS BIGINT) < 0 "
                f"THEN {nverts} + CAST(split_part(s, '/', 1) AS BIGINT) + 1 "
                f"ELSE CAST(split_part(s, '/', 1) AS BIGINT) END)"
            ).alias("vids"),
        )
    )
    return verts, faces


def write_obj(vertices: DataFrame, elements: DataFrame, path: str) -> None:
    """Sequential text write (collect — mesh outputs are small; K10)."""
    with open(path, "w") as f:
        for r in vertices.orderBy("vid").collect():
            f.write(f"v {r['x']} {r['y']} {r['z']}\n")
        for r in elements.orderBy("eid").collect():
            f.write("f " + " ".join(str(int(v)) for v in r["vids"]) + "\n")


def read_off(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """OFF: `OFF` header, `nv nf ne` counts, nv vertex lines, nf face
    lines (`k i j ... [r g b a]`, 0-based indices)."""
    # OFF's positional sections need line numbers — small mesh files, so a
    # driver-side split + two createDataFrames keeps it simple (mirrors
    # the reference's delegate role); vertices/elements stay DataFrames.
    import pandas as pd
    with open(path) as f:
        # full-line AND trailing comments (fixture tetrahedron.off has
        # "3 0 1 2 255 0 0 # red" faces)
        lines = [t for ln in f if (t := ln.split("#")[0].strip())]
    assert lines[0] == "OFF", "not an OFF file"
    nv, nf, _ = (int(x) for x in lines[1].split()[:3])
    vrows = []
    for i, ln in enumerate(lines[2:2 + nv]):
        x, y, z = (float(t) for t in ln.split()[:3])
        vrows.append((i + 1, x, y, z))
    erows = []
    for e, ln in enumerate(lines[2 + nv:2 + nv + nf]):
        toks = ln.split()
        k = int(toks[0])
        vids = [int(t) + 1 for t in toks[1:1 + k]]  # 0-based → 1-based
        color = [_channel(t) for t in toks[1 + k:1 + k + 4]] or None
        erows.append((e + 1, vids, color))
    verts = spark.createDataFrame(
        pd.DataFrame(vrows, columns=["vid", "x", "y", "z"]))
    elems = spark.createDataFrame(
        pd.DataFrame(erows, columns=["eid", "vids", "color"]))
    return verts, elems


def _channel(tok: str) -> float:
    """int channels normalize by /255, float channels pass through
    (off.jl:108-113)."""
    if "." in tok:
        return float(tok)
    return int(tok) / 255.0


def write_off(vertices: DataFrame, elements: DataFrame, path: str) -> None:
    v = vertices.orderBy("vid").collect()
    e = elements.orderBy("eid").collect()
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(v)} {len(e)} 0\n")
        for r in v:
            f.write(f"{r['x']} {r['y']} {r['z']}\n")
        for r in e:
            vids = [int(x) - 1 for x in r["vids"]]  # back to 0-based
            f.write(f"{len(vids)} " + " ".join(map(str, vids)) + "\n")
