"""Custom stateful streaming operator: sessionization via
applyInPandasWithState, checked against a pandas reference."""

import pandas as pd
from pyspark.sql import functions as F

from geoio_jl_spark.streaming.pipeline import sessionize

GAP_S = 1800


def _reference_sessions(pdf: pd.DataFrame):
    """All sessions per user (incl. the trailing open one)."""
    out = []
    for user, grp in pdf.groupby("user_id"):
        ts = sorted(int(t.value // 1000) for t in pd.to_datetime(grp["ts"]))
        cur = None
        for us in ts:
            if cur is None:
                cur = [us, us, 1]
            elif us - cur[1] > GAP_S * 1_000_000:
                out.append((user, *cur))
                cur = [us, us, 1]
            else:
                cur = [cur[0], us, cur[2] + 1]
        if cur is not None:
            out.append((user, *cur, "open"))
    closed = {(u, a, b, n) for (u, a, b, n, *rest) in
              [row if len(row) == 5 else (*row, None) for row in out]
              if not rest or rest[0] != "open"}
    return out


def test_sessionize_matches_reference(spark, sf_dir, tmp_path):
    import os
    src = f"{sf_dir}/events.parquet"
    d = tmp_path / "events_dir"
    d.mkdir()
    os.symlink(src, d / "events.parquet")
    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).parquet(str(d))
    out = sessionize(stream, gap_seconds=GAP_S)
    q = (
        out.writeStream.format("memory").queryName("sessions")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    got = {(r["user_id"], r["session_start_us"], r["session_end_us"],
            r["n_events"])
           for r in spark.sql("SELECT * FROM sessions").collect()}

    pdf = spark.read.parquet(src).toPandas()
    all_sessions = _reference_sessions(pdf)
    closed = set()
    trailing = set()
    for row in all_sessions:
        if len(row) == 5 and row[4] == "open":
            trailing.add((row[0], row[1], row[2], row[3]))
        else:
            closed.add(tuple(row[:4]))
    # one availableNow batch: every closed session is emitted; trailing
    # (still-open) sessions stay in state awaiting the timeout
    assert got == closed
    assert len(trailing) > 0  # sanity: state actually holds something


def test_batch_session_rollup_matches_streaming(spark, sf_dir, tmp_path):
    """The oracle-checked batch sessionization (q_session_rollup) and
    the stateful streaming operator must carve identical sessions:
    closed streaming sessions ∪ trailing open state == batch sessions."""
    from geoio_jl_spark import queries as Q
    from geoio_jl_spark.streaming.pipeline import sessionize

    batch = {(r["user_id"], r["start_us"], r["end_us"], r["n_events"])
             for r in Q.q_session_rollup(spark, sf_dir).collect()}

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "ev_stream")
    ev.coalesce(1).write.parquet(src)
    stream = (spark.readStream.schema(ev.schema).parquet(src)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    out = sessionize(stream)
    q = (out.writeStream.format("memory").queryName("sess_batch_parity")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination(180)
    closed = {(r["user_id"], r["session_start_us"], r["session_end_us"],
               r["n_events"])
              for r in spark.sql(
                  "SELECT * FROM sess_batch_parity").collect()}
    # trailing sessions stay in state at end-of-stream; every closed
    # streaming session must be a batch session, and the remainder must
    # be exactly one trailing (last) session per user
    assert closed <= batch
    remaining = batch - closed
    per_user = {}
    for u, s, e, n in remaining:
        per_user.setdefault(u, []).append((s, e, n))
    assert all(len(v) == 1 for v in per_user.values())
    # and each user's remaining session is their LAST batch session
    last_by_user = {}
    for u, s, e, n in batch:
        if u not in last_by_user or s > last_by_user[u][0]:
            last_by_user[u] = (s, e, n)
    for u, v in per_user.items():
        assert v[0] == last_by_user[u]
