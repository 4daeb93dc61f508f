"""Build /tmp/sfbig — a 10x-tiled copy of sf0.1 used ONLY for local
optimization measurements (the driver generates its own sf1.0; this
proxy reproduces the same row counts and the ~10x-denser key/shingle
distributions so superlinear effects show up locally).  Never read by
any query path or by bench.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SFBIG_DIR", "/tmp/sfbig")
K = int(os.environ.get("SFBIG_K", "10"))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({K})) AS c")

    def tile(table: str, sql: str) -> None:
        out = f"{DST}/{table}.parquet"
        if os.path.exists(out):
            return
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        print(table, con.execute(
            f"SELECT count(*) FROM '{out}'").fetchone()[0])

    n_docs = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    tile("documents", f"""
        SELECT doc_id + c * {n_docs} AS doc_id, text, lang, source, n_chars
        FROM '{SRC}/documents.parquet', copies""")
    n_ev = con.execute(
        f"SELECT count(*), max(user_id) FROM '{SRC}/events.parquet'"
    ).fetchone()
    tile("events", f"""
        SELECT event_id + c * {n_ev[0]} AS event_id,
               ts + INTERVAL (c) SECOND AS ts,
               user_id + c * {n_ev[1] + 1} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet', copies""")
    n_vec = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    # perturb one coordinate per copy so cross-copy rows are not exact
    # duplicates (mimics fresh draws, keeps near-dup structure per copy)
    tile("embeddings", f"""
        SELECT vec_id + c * {n_vec} AS vec_id,
               list_transform(embedding, x -> x * (1.0 + c * 0.013)) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', copies""")
    n_li = con.execute(
        f"SELECT count(*), max(l_orderkey) FROM '{SRC}/lineitem.parquet'"
    ).fetchone()
    tile("lineitem", f"""
        SELECT l_orderkey + c * {n_li[1] + 1} AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', copies""")
    n_ord = con.execute(
        f"SELECT count(*), max(o_orderkey) FROM '{SRC}/orders.parquet'"
    ).fetchone()
    tile("orders", f"""
        SELECT o_orderkey + c * {n_ord[1] + 1} AS o_orderkey,
               * EXCLUDE (o_orderkey)
        FROM '{SRC}/orders.parquet', copies""")
    for small in ("nation", "region", "customer", "supplier", "part"):
        out = f"{DST}/{small}.parquet"
        if not os.path.exists(out):
            con.execute(f"COPY (SELECT * FROM '{SRC}/{small}.parquet') "
                        f"TO '{out}' (FORMAT PARQUET)")
    print("done:", DST)


if __name__ == "__main__":
    main()
