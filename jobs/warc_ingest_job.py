#!/usr/bin/env python
"""Production entry point: WARC archives → training-ready corpus.

    zip -r sketchlib.zip sketchlib            # once, repo root
    spark-submit --py-files sketchlib.zip jobs/warc_ingest_job.py \
        --input  /data/crawl/*.warc.gz        \
        --output /data/corpus_out             \
        --shards 256

The north-star pipeline end-to-end: Common-Crawl-style archives are
parsed with the bounded-memory streaming WARC source (one task per
archive, incremental gzip, corrupt-record resync), pages flow through
the single-shuffle corpus-prepare shape (PII scrub → xxhash64 text
dedup via min-of-struct, no join-back → token-count quality floor →
deterministic hash split), and the deduplicated url set additionally
builds a sharded cuckoo membership table for downstream
contains/delete queries.

Outputs under --output:
  corpus/                parquet: (url, warc_ts, text, lang, n_tokens,
                         split) — deduplicated, scrubbed, split
  shards/                parquet: sharded cuckoo filter over kept urls
  metrics.json           page/doc counts, dedup ratio, timings
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="WARC file/glob/dir (.warc/.warc.gz)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--fingerprint-bits", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("sketchlib-warc-ingest").getOrCreate()

    from sketchlib.config import CuckooConfig
    from sketchlib.spark.shard import build_sharded
    from sketchlib.spark.text import hash_split, scrub_pii, token_count
    from sketchlib.spark.warc import read_warc

    t0 = time.time()
    pages = read_warc(spark, args.input)
    # ONE shuffle end-to-end: scrub/tokens are scan-side projections;
    # min(struct) picks the winner per text digest with its metadata
    # attached, so no winners->corpus join-back (q_corpus_prepare shape)
    scrubbed = pages.select(
        "url", "warc_ts", "lang", scrub_pii().alias("text")
    ).select(
        F.xxhash64("text").alias("_th"),
        F.struct(
            "url", "warc_ts", "lang", "text", token_count("text").alias("n_tokens")
        ).alias("m"),
    )
    corpus = (
        scrubbed.groupBy("_th")
        .agg(F.min("m").alias("m"))
        .select("m.url", "m.warc_ts", "m.text", "m.lang", "m.n_tokens")
        .where(F.col("n_tokens") >= args.min_tokens)
        .withColumn("split", hash_split("url"))
    )
    corpus.write.mode("overwrite").parquet(os.path.join(args.output, "corpus"))
    kept = spark.read.parquet(os.path.join(args.output, "corpus"))
    n_pages = pages.count()
    n_kept = kept.count()

    cfg = CuckooConfig(
        capacity=max(int(n_kept * 1.1), 1024),
        fingerprint_bits=args.fingerprint_bits,
        hash_strategy="xx",
    )
    shard_df = build_sharded(kept.select("url"), "url", args.shards, cfg=cfg)
    shard_df.write.mode("overwrite").parquet(os.path.join(args.output, "shards"))
    total_sec = time.time() - t0

    metrics = {
        "pages_in": n_pages,
        "docs_kept": n_kept,
        "dedup_and_quality_drop": n_pages - n_kept,
        "total_sec": round(total_sec, 2),
        "pages_per_sec": round(n_pages / total_sec) if total_sec else None,
        "shards": args.shards,
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=2)
    print("WARC_INGEST_RESULT " + json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
