"""Incremental crawl ingestion as a spark-submit job — new WARC
segments upsert into the log-structured corpus store
(``geoio_jl_spark/plans/store.py``), the refresh loop a production
corpus actually runs:

    WARC segments → html→text extraction (byte-identical Arrow kernel)
    → CDC diff vs the resolved store (content_hash on url)
    → delta write (ONLY new/changed rows) → manifest update

    python tools/make_zip.py
    spark-submit --py-files geoio_jl_spark.zip jobs/ingest_job.py \
        --warc /data/crawl-2026-33 --store /data/corpus_store \
        --epoch 33 [--compact-after 8]

Retryability: an epoch already in the store manifest is a no-op, so a
failed/duplicated submit is safe to re-run; downstream trainers tail
``store.changes(spark, store_dir, since_epoch)`` for exactly the rows
that moved.  At 10^12 docs the base is never rewritten per crawl —
ingest cost is O(batch) + one key join against the resolved view.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def extract_pages(spark: SparkSession, warc_path: str):
    """WARC records → (url, warc_ts, html, text) pages — the input_hint
    table shape, with the byte-identical extraction kernel producing
    the text column the store's change detection hashes."""
    from geoio_jl_spark.functions.textkernels import html_to_text
    from geoio_jl_spark.sources import warc
    recs = warc.read(spark, warc_path)
    return (recs
            .filter(F.col("warc_type") == "response")
            .select(F.col("target_uri").alias("url"),
                    F.col("warc_date").alias("warc_ts"),
                    F.col("payload").alias("html"),
                    html_to_text(F.col("payload")).alias("text")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--epoch", type=int, required=True)
    ap.add_argument("--compact-after", type=int, default=0,
                    help="fold deltas into the base when the tail "
                         "reaches this many epochs (0 = never)")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("geoio-ingest").getOrCreate()
    from geoio_jl_spark.plans import store
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(spark)

    pages = extract_pages(spark, args.warc)
    stats = store.ingest(spark, args.store, pages, epoch=args.epoch,
                         key_col="url", content_cols=("text",))
    if (args.compact_after
            and len(store.read_manifest(args.store)["epochs"])
            >= args.compact_after):
        stats["compaction"] = store.compact(spark, args.store)
    man = store.read_manifest(args.store)
    print(json.dumps({"ingest": stats,
                      "store_epochs": man["epochs"],
                      "base_epoch": man["base_epoch"]}))
    spark.stop()


if __name__ == "__main__":
    main()