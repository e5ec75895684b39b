"""Minimal cluster-submit job for the --py-files packaging check.

Run as::

    spark-submit --master local[4] --py-files sketchlib.zip \
        tools/pyfiles_job.py

from a directory that does NOT contain the sketchlib source tree, so
the import below can only resolve from the shipped zip — exactly how a
multi-executor cluster receives the library (north rule: "run via
spark-submit --py-files"). Builds a sharded cuckoo filter over a
synthetic key table, probes it, and prints one machine-readable verdict
line."""

import json

from pyspark.sql import SparkSession, functions as F

from sketchlib import CuckooConfig
from sketchlib.spark.shard import build_sharded, probe_sharded


def main() -> None:
    spark = SparkSession.builder.getOrCreate()
    keys = spark.range(2000).select(F.concat(F.lit("k"), F.col("id")).alias("key"))
    cfg = CuckooConfig(capacity=8192, fingerprint_bits=16, hash_strategy="xx")
    shards = build_sharded(keys, "key", num_shards=4, cfg=cfg).persist()
    hits = probe_sharded(keys, "key", shards, num_shards=4).where("member").count()
    absent = spark.range(2000).select(
        F.concat(F.lit("zz"), F.col("id")).alias("key")
    )
    fp = probe_sharded(absent, "key", shards, num_shards=4).where("member").count()
    # driver + one entry per executor JVM (local[n] -> 1): lets the
    # two-cluster-size submit test prove multi-executor really engaged
    n_jvms = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    print("PYFILES_RESULT " + json.dumps(
        {"hits": int(hits), "false_pos": int(fp), "executors_plus_driver": int(n_jvms)}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
