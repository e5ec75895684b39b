"""Edge-case robustness: empty inputs, single rows, null-heavy columns
through every distributed operator (driver surprises die here)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib import CuckooConfig, CuckooFilter
from sketchlib.sketches import CountMinSketch, HyperLogLog, KLLSketch


def test_empty_batch_operations():
    f = CuckooFilter(CuckooConfig(capacity=64, fingerprint_bits=16))
    assert f.insert_batch([]).shape == (0,)
    assert f.lookup_batch([]).shape == (0,)
    assert f.delete_batch([]).shape == (0,)
    assert f.count() == 0


def test_empty_sketch_updates():
    h = HyperLogLog(10)
    h.update([])
    assert h.estimate() == 0.0
    c = CountMinSketch(width=64, depth=3)
    c.update([])
    assert c.total == 0
    k = KLLSketch()
    k.update([])
    assert np.isnan(k.quantile(0.5)[0])


def test_spark_build_empty_df(spark):
    from sketchlib.spark import build_sketches, tree_merge

    empty = spark.createDataFrame([], "key string")
    merged = tree_merge(build_sketches(empty, "key", lambda: HyperLogLog(10)))
    # zero-partition or empty-partition input still yields a sketch (or None)
    assert merged is None or merged.estimate() == 0.0


def test_spark_build_single_row(spark):
    from sketchlib.spark import build_sketches, membership_udf, tree_merge

    one = spark.createDataFrame([("only",)], "key string")
    merged = tree_merge(
        build_sketches(one, "key", lambda: CuckooFilter(CuckooConfig(capacity=64, fingerprint_bits=16)))
    )
    assert merged.count() == 1
    member = membership_udf(spark, merged)
    assert one.withColumn("m", member("key")).first().m


def test_nulls_in_key_column(spark):
    from sketchlib.spark import build_sketches, tree_merge

    df = spark.createDataFrame([("a",), (None,), ("b",), (None,)], "key string")
    merged = tree_merge(build_sketches(df, "key", lambda: HyperLogLog(10)))
    # nulls hash as empty strings (bytesview contract): distinct = {a, b, ""}
    assert round(merged.estimate()) == 3


def test_dedup_empty_and_null_text(spark):
    from sketchlib.spark.dedup import dedup_exact, minhash_signatures

    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "x"), (4, "")], "doc_id long, text string"
    )
    d = dedup_exact(df)
    # "" and NULL are distinct group keys in both Spark and SQL
    assert d.count() == 3
    sigs = minhash_signatures(df, num_perm=16)
    assert sigs.count() == 4


def test_sharded_build_empty(spark):
    from sketchlib.spark.shard import build_sharded

    empty = spark.createDataFrame([], "key string")
    cfg = CuckooConfig(capacity=256, fingerprint_bits=16)
    rows = build_sharded(empty, "key", num_shards=2, cfg=cfg).collect()
    assert rows == []


def test_text_ops_null_and_empty(spark):
    from sketchlib.spark.text import lang_id, token_count

    df = spark.createDataFrame([(1, None), (2, ""), (3, "  ")], "id long, text string")
    rows = df.select(
        "id", token_count("text").alias("n"), lang_id("text").alias("lang")
    ).collect()
    got = {r.id: (r.n, r.lang) for r in rows}
    assert got[2] == (0, "und")
    assert got[3] == (0, "und")
    # NULL text: token_count of NULL is NULL in SQL semantics (size(NULL))
    assert got[1][0] in (0, None, -1)
