"""Web-text curation pipeline as a spark-submit job — the engine's
LLM-data-pipeline operators composed end-to-end over raw WARC segments
(the shape a training-data refresh actually runs):

    WARC ingest → html→text extraction → language/Gopher quality gates
    → PII redaction → exact + MinHash near-dup removal (keepers)
    → benchmark decontamination → per-source mixing → corpus stats

    python tools/make_zip.py
    spark-submit --py-files geoio_jl_spark.zip jobs/webtext_job.py \
        --warc /data/crawl-segments --bench /data/eval_docs.parquet \
        --output /tmp/corpus_out --checkpoints /tmp/ckpt --job-id run1

Stages checkpoint via plans.checkpoint (parquet snapshots + lineage
manifest), so re-submitting with the same --job-id resumes after the
last committed stage; each stage's plan shape is documented in
docs/PLANS.md.  On a cluster the same command line works with
``--master yarn``/k8s — WARC ingest parallelism is one task per archive
segment, everything downstream shuffles on content keys only.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", required=True,
                    help="directory of .warc / .warc.gz segments")
    ap.add_argument("--bench", default=None,
                    help="parquet of eval docs (doc_id, text) to "
                         "decontaminate against")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoints", required=True)
    ap.add_argument("--job-id", default="webtext")
    ap.add_argument("--mix-weights", default="{}",
                    help='JSON {"domain": weight} per registered domain')
    ap.add_argument("--ngram", type=int, default=8)
    args = ap.parse_args()

    # Stage resume matches on (job id, stage name) only, so changing
    # --bench/--ngram/--mix-weights under the same id would silently
    # reuse stale stage output (review finding): fold a fingerprint of
    # the semantics-bearing arguments into the effective job id, so a
    # parameter change starts a fresh lineage while an identical
    # re-submit still resumes.
    import hashlib
    fp = hashlib.md5(
        f"{args.bench}|{args.ngram}|{args.mix_weights}".encode()
    ).hexdigest()[:8]
    args.job_id = f"{args.job_id}-{fp}"

    spark = SparkSession.builder.appName("geoio-webtext").getOrCreate()
    from geoio_jl_spark.functions.textkernels import (html_to_text,
                                                      quality_columns,
                                                      tokens_col)
    from geoio_jl_spark.functions.urls import canonical_url_sql, domain_sql, host_sql
    from geoio_jl_spark.operators.components import (connected_components,
                                                     dedup_keepers)
    from geoio_jl_spark.operators.decontaminate import decontaminate
    from geoio_jl_spark.operators.dedup import minhash_star_edges
    from geoio_jl_spark.operators.mixer import weighted_sample
    from geoio_jl_spark.operators.pii import redact_pii
    from geoio_jl_spark.plans.checkpoint import CheckpointedJob
    from geoio_jl_spark.queries import _GOPHER
    from geoio_jl_spark.sources import warc

    job = CheckpointedJob(spark, args.checkpoints, args.job_id)

    def ingest():
        recs = warc.read(spark, args.warc)
        pages = recs.filter(
            (F.col("warc_type") == "response")
            & F.col("http_status").eqNullSafe(200))
        return pages.select(
            F.xxhash64("record_id", "target_uri").alias("doc_id"),
            F.expr(canonical_url_sql("target_uri", "spark")).alias("url"),
            F.expr(domain_sql(host_sql("target_uri", "spark"),
                              "spark")).alias("domain"),
            html_to_text(F.col("payload")).alias("text"))

    docs = job.stage("ingest", ingest)

    def clean():
        toked = docs.withColumn("_toks", tokens_col(F.col("text")))
        qcols = quality_columns(F.col("text"), toks=F.col("_toks"))
        flagged = toked.select(
            "*", *(c.alias(n) for n, c in qcols.items()))
        kept = flagged.filter(_GOPHER).select(docs.columns)
        return redact_pii(kept).drop("text") \
            .withColumnRenamed("clean_text", "text")

    cleaned = job.stage("clean", clean)

    def dedup():
        edges = minhash_star_edges(cleaned)
        comp = connected_components(edges)
        keep = dedup_keepers(cleaned.select("doc_id"), comp) \
            .filter("keep").select("doc_id")
        return cleaned.join(keep, "doc_id", "left_semi")

    unique = job.stage("dedup", dedup)

    def decontam():
        if not args.bench:
            return unique.withColumn("contaminated", F.lit(0))
        bench = spark.read.parquet(args.bench)
        flags = decontaminate(unique, bench, n=args.ngram)
        return unique.join(flags.filter(F.col("contaminated") == 0)
                           .select("doc_id"), "doc_id", "left_semi") \
                     .withColumn("contaminated", F.lit(0))

    decontaminated = job.stage("decontam", decontam)

    def mix():
        weights = json.loads(args.mix_weights)
        return weighted_sample(decontaminated, weights,
                               strat_col="domain", key_col="doc_id")

    mixed = job.stage("mix", mix)
    mixed.drop("contaminated").write.mode("overwrite").parquet(args.output)

    stats = mixed.groupBy("domain").agg(
        F.count("*").alias("docs"),
        F.sum(F.length("text")).alias("chars"),
        F.sum("n_emails").alias("emails_redacted")).collect()
    print(json.dumps({
        "stages": [m["stage"] for m in job.manifest()],
        "domains": {r["domain"]: {"docs": r["docs"], "chars": r["chars"]}
                    for r in stats},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
