"""GeoPackage source/sink (reference S6/K6, src/extra/gpkg.jl — rewritten
from scratch on python's stdlib sqlite3 + the engine's WKB codec).

Read (gpkg.jl:5-161 semantics):
- integrity PRAGMAs, layer metadata via the 3-way equi-join
  gpkg_geometry_columns ⋈ gpkg_contents ⋈ gpkg_spatial_ref_sys filtered to
  data_type='features' with LIMIT/OFFSET layer selection (J1, gpkg.jl:57-96)
- GPKG binary header decode (F5, gpkg.jl:187-215): magic `GP`, version,
  flags byte → byte order + envelope code → skip envelope → inner WKB kept
  authoritative
- srs_id sentinel rules (F10, gpkg.jl:163-182): 0/99999 → undefined
  geographic, -1 → undefined cartesian, else `<organization>:<id>`

Write (gpkg.jl:217-479 semantics):
- write PRAGMAs (synchronous=OFF, journal=MEMORY — gpkg.jl:224-233)
- gpkg_spatial_ref_sys / gpkg_contents (with A1 extent) /
  gpkg_geometry_columns metadata; feature table with prepared INSERTs in
  ONE transaction (gpkg.jl:246-257, 419-434)
- R-tree spatial index: `rtree_<table>_<geom>` virtual table populated
  per feature bbox (J4, gpkg.jl:411-448) + gpkg_extensions registry rows

GPKG is a single-file interchange format → driver-side adapter by design;
the engine's scale path is GeoParquet + cell index (SURVEY.md §2.4 J4).
"""

from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.geoschema import GeoSchema, with_geo_metadata

_GPKG_APP_ID = 0x47504B47  # 'GPKG'

# envelope code → number of doubles (gpkg.jl:187-215)
_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def decode_gpkg_blob(blob: bytes) -> tuple[bytes, int]:
    """GPKG geometry blob → (inner WKB, srs_id). F5 read path."""
    if blob[:2] != b"GP":
        raise ValueError("not a GPKG geometry blob (magic != 'GP')")
    flags = blob[3]
    little = bool(flags & 1)
    env_code = (flags >> 1) & 0b111
    if env_code not in _ENVELOPE_DOUBLES:
        raise ValueError(f"invalid envelope code {env_code}")
    srs_id = struct.unpack_from("<i" if little else ">i", blob, 4)[0]
    offset = 8 + 8 * _ENVELOPE_DOUBLES[env_code]
    return blob[offset:], srs_id


def encode_gpkg_blob(wkb: bytes, srs_id: int = 4326,
                     envelope: tuple | None = None) -> bytes:
    """WKB → GPKG blob with envelope code 1 (minx maxx miny maxy). F5
    write path (gpkg.jl:481-520)."""
    if envelope is None:
        b = W.wkb_bounds_batch([wkb])[0]
        envelope = (b[0], b[2], b[1], b[3])  # minx, maxx, miny, maxy
    flags = 0b00000011  # little endian + envelope code 1
    header = b"GP" + bytes([0, flags]) + struct.pack("<i", srs_id)
    header += struct.pack("<4d", *envelope)
    return header + wkb


def resolve_srs(srs_id: int, organization: str = "EPSG",
                org_id: int | None = None) -> str:
    """Sentinel rules from gpkgcrs (gpkg.jl:163-182, F10): sentinels
    check srs_id first; the organization code is used when defined,
    falling back to srs_id when the org code is 0/-1."""
    if srs_id in (0, 99999):
        return "GEOGRAPHIC:undefined"
    if srs_id == -1:
        return "CARTESIAN:undefined"
    if org_id is None or org_id in (0, -1):
        return f"EPSG:{srs_id}"
    return f"{(organization or 'EPSG').upper()}:{org_id}"


def list_layers(path: str) -> list[dict]:
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            """
            SELECT c.table_name, g.column_name, g.geometry_type_name,
                   s.srs_id, s.organization, s.organization_coordsys_id
            FROM gpkg_geometry_columns g
            JOIN gpkg_contents c ON c.table_name = g.table_name
            JOIN gpkg_spatial_ref_sys s ON s.srs_id = g.srs_id
            WHERE c.data_type = 'features'
            ORDER BY c.table_name
            """
        ).fetchall()
    finally:
        con.close()
    return [
        {"table": r[0], "geometry_column": r[1], "geometry_type": r[2],
         "srs_id": r[3], "organization": r[4], "org_id": r[5]}
        for r in rows
    ]


def read(spark: SparkSession, path: str, layer: int = 1,
         warn: bool = True) -> DataFrame:
    con = sqlite3.connect(path)
    try:
        ok = con.execute("PRAGMA integrity_check").fetchone()[0]
        if ok != "ok":
            raise ValueError(f"GeoPackage failed integrity check: {ok}")
        layers = list_layers(path)
        if not layers:
            raise ValueError("no feature layers in GeoPackage")
        if warn and len(layers) > 1:
            import warnings
            warnings.warn(
                f"GeoPackage has {len(layers)} layers; reading layer {layer} "
                f"({layers[layer - 1]['table']})"  # multi-layer warning parity
            )
        meta = layers[layer - 1]  # LIMIT 1 OFFSET layer-1 (gpkg.jl:94)
        tbl, gcol = meta["table"], meta["geometry_column"]
        table_info = con.execute(f'PRAGMA table_info("{tbl}")').fetchall()
        # chunked decode: GPKG blobs → WKB in bounded driver batches
        chunks = []
        for pdf in pd.read_sql_query(f'SELECT * FROM "{tbl}"', con,
                                     chunksize=100_000):
            pdf[gcol] = [
                None if blob is None else decode_gpkg_blob(bytes(blob))[0]
                for blob in pdf[gcol]
            ]
            chunks.append(pdf)
    finally:
        con.close()
    srs = resolve_srs(meta["srs_id"], meta["organization"], meta["org_id"])
    # one explicit schema from the SQLite declared types: all-NULL chunks
    # and empty layers otherwise infer NullType and break the read
    from pyspark.sql import types as T

    _GEOM_DECLS = ("GEOMETRY", "POINT", "LINESTRING", "POLYGON",
                   "MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON",
                   "GEOMETRYCOLLECTION", "CURVE", "SURFACE")

    def _spark_type(name: str, decl: str | None):
        d = (decl or "").upper()
        # geometry type names first: 'POINT'/'MULTIPOINT' contain 'INT'
        # and would otherwise be typed LongType, breaking the blob read
        if name == gcol or "BLOB" in d or d in _GEOM_DECLS:
            return T.BinaryType()
        if "INT" in d:
            return T.LongType()
        if any(k in d for k in ("REAL", "FLOA", "DOUB")):
            return T.DoubleType()
        return T.StringType()

    fields = [(r[1], _spark_type(r[1], r[2])) for r in table_info]
    sp_schema = T.StructType(
        [T.StructField(n, t, True) for n, t in fields])
    pdf_all = (pd.concat(chunks, ignore_index=True) if chunks
               else pd.DataFrame({n: [] for n, _ in fields}))
    for n, t in fields:  # nullable ints arrive as float64-with-NaN
        if isinstance(t, T.LongType):
            pdf_all[n] = pdf_all[n].astype("Int64")
    df = spark.createDataFrame(pdf_all, schema=sp_schema)
    return with_geo_metadata(df, GeoSchema(geometry_column=gcol, crs=srs))


def write(df: DataFrame, path: str, table: str = "features",
          srs_id: int = 4326, geometry_column: str | None = None) -> None:
    schema = GeoSchema.from_df(df, geometry_column)
    gcol = schema.geometry_column
    attrs = [c for c in df.columns if c != gcol]
    rows = df.collect()

    # per-feature bounds (also feeds the dataset extent, A1 gpkg.jl:522-534)
    blobs = [None if r[gcol] is None else bytes(r[gcol]) for r in rows]
    bounds = W.wkb_bounds_batch(blobs)
    finite = bounds[~np.isnan(bounds[:, 0])]
    extent = (finite[:, 0].min(), finite[:, 1].min(),
              finite[:, 2].max(), finite[:, 3].max()) if len(finite) else (None,) * 4

    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA synchronous=OFF")     # gpkg.jl:224-233
        con.execute("PRAGMA journal_mode=MEMORY")
        con.execute(f"PRAGMA application_id={_GPKG_APP_ID}")
        con.execute("PRAGMA user_version=10300")
        cur = con.cursor()
        cur.execute("""CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL, description TEXT)""")
        # real WKT2 definition when the corpus knows the code (the GPKG
        # spec wants a definition; readers without the corpus still get
        # the EPSG org+code pair)
        defn = "undefined"
        try:
            from geoio_jl_spark.functions.wkt2_corpus import wkt2_for
            defn = wkt2_for(srs_id)
        except Exception:
            pass
        cur.executemany(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [  # required defaults (gpkg.jl:259-300)
                ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
                ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
                (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id, defn, None),
            ])
        cur.execute("""CREATE TABLE IF NOT EXISTS gpkg_contents (
            table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
            min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
            srs_id INTEGER)""")
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
            "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
            (table, "features", table, *extent, srs_id))
        cur.execute("""CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
            table_name TEXT NOT NULL, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL,
            CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")
        kinds = {W.decode_wkb(b).kind_name for b in blobs if b is not None}
        gtype = kinds.pop() if len(kinds) == 1 else "GEOMETRY"
        cur.execute("INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
                    (table, gcol, gtype, srs_id))
        # feature table + one-transaction prepared inserts (gpkg.jl:389-434)
        # declared SQLite types from the Spark schema — the read side
        # types columns from PRAGMA table_info, so untyped attribute
        # columns would come back as TEXT (caught by the gisissues
        # cross-format mirror suite)
        from pyspark.sql import types as T

        def _decl(dt) -> str:
            if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType,
                               T.ByteType, T.BooleanType)):
                return "INTEGER"
            if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
                return "REAL"  # SQLite has no decimal; REAL round-trips
                               # as DoubleType (the reference's GPKG
                               # driver makes the same narrowing)
            if isinstance(dt, T.BinaryType):
                return "BLOB"
            return "TEXT"

        dtypes = {f.name: f.dataType for f in df.schema.fields}
        ddl = ", ".join(f'"{c}" {_decl(dtypes[c])}' for c in attrs)
        cols_ddl = ", ".join(f'"{c}"' for c in attrs)
        cur.execute(
            f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY AUTOINCREMENT'
            + (f", {ddl}" if attrs else "")
            + f', "{gcol}" BLOB)')
        placeholders = ",".join("?" * (len(attrs) + 1))
        stmt = (f'INSERT INTO "{table}" ({cols_ddl}{"," if attrs else ""}'
                f'"{gcol}") VALUES ({placeholders})')
        # R-tree spatial index (J4, gpkg.jl:411-448)
        rtree = f"rtree_{table}_{gcol}"
        cur.execute(f'CREATE VIRTUAL TABLE "{rtree}" USING rtree('
                    "id, minx, maxx, miny, maxy)")
        for fid, (r, blob, bb) in enumerate(zip(rows, blobs, bounds), start=1):
            gp = None if blob is None else encode_gpkg_blob(
                blob, srs_id, (bb[0], bb[2], bb[1], bb[3]))
            cur.execute(stmt, tuple(r[c] for c in attrs) + (gp,))
            if blob is not None:
                cur.execute(f'INSERT INTO "{rtree}" VALUES (?,?,?,?,?)',
                            (fid, bb[0], bb[2], bb[1], bb[3]))
        cur.execute("""CREATE TABLE IF NOT EXISTS gpkg_extensions (
            table_name TEXT, column_name TEXT, extension_name TEXT NOT NULL,
            definition TEXT NOT NULL, scope TEXT NOT NULL)""")
        cur.execute("INSERT INTO gpkg_extensions VALUES (?,?,?,?,?)",
                    (table, gcol, "gpkg_rtree_index",
                     "http://www.geopackage.org/spec120/#extension_rtree",
                     "write-only"))
        con.commit()
        con.execute("PRAGMA optimize")
    finally:
        con.close()
