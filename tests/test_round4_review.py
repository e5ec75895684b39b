"""Regression tests for the late-round-4 review pass: boundary and
null-input bugs in the text / sampling / heavy-hitter / bloom-join
operators that the driver corpus (no nulls, no short docs) can never
exercise — exactly the inputs a real web corpus is full of."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
    ]
)


# --------------------------------------------------------------- hash_split


def test_hash_split_no_test_split(spark):
    """train+val == 1.0 (the common no-test split): format() renders
    int(1.0*65536) as the 5-char '10000', and 4-char hashes compare
    lexicographically BELOW it only when they start with '0' — ~94% of
    val rows silently became 'test' before the boundary clamp."""
    from sketchlib.spark.text import hash_split

    df = spark.range(5000).select(F.col("id").cast("string").alias("k"))
    counts = dict(
        df.select(hash_split("k", train=0.8, val=0.2).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert counts.get("test", 0) == 0
    val_frac = counts["val"] / 5000
    assert 0.15 < val_frac < 0.25, counts


def test_hash_split_all_train(spark):
    from sketchlib.spark.text import hash_split

    df = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    counts = dict(
        df.select(hash_split("k", train=1.0, val=0.0).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert counts == {"train": 1000}


def test_hash_split_existing_boundaries_unchanged(spark):
    """The 0.8/0.1 default boundaries must keep truncating to
    'cccc'/'e666' — the doc_split oracle pins those exact strings."""
    from sketchlib.spark.text import hash_split

    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    got = dict(
        df.select(hash_split("k").alias("s")).groupBy("s").count().collect()
    )
    want = dict(
        df.select(
            F.when(F.substring(F.md5("k"), 1, 4) < "cccc", "train")
            .when(F.substring(F.md5("k"), 1, 4) < "e666", "val")
            .otherwise("test")
            .alias("s")
        )
        .groupBy("s")
        .count()
        .collect()
    )
    assert got == want


def test_hash_split_invalid_fractions_raise():
    from sketchlib.spark.text import hash_split

    with pytest.raises(ValueError):
        hash_split("k", train=0.9, val=0.2)
    with pytest.raises(ValueError):
        hash_split("k", train=-0.1, val=0.5)


# ------------------------------------------------- null-text hardening


def test_token_counts_null_text_zero(spark):
    """F.size over a null array is -1 (sizeOfNull): before the
    coalesce, every NULL text scored -1 tokens and poisoned n_tokens
    filters/means; the DuckDB oracles always computed 0."""
    from sketchlib.spark.text import token_count, word_token_count

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "two words"), (4, "  \t ")], DOCS_SCHEMA
    )
    rows = {
        r.doc_id: (r.t, r.w)
        for r in df.select(
            "doc_id",
            token_count("text").alias("t"),
            word_token_count("text").alias("w"),
        ).collect()
    }
    assert rows[1] == (0, 0)
    assert rows[2] == (0, 0)
    assert rows[3] == (2, 2)
    assert rows[4] == (0, 0)


def test_quality_score_null_text_all_zero(spark):
    from sketchlib.spark.text import quality_score

    out = quality_score(
        spark.createDataFrame([(1, None)], DOCS_SCHEMA)
    ).collect()[0]
    assert (out.n_chars_q, out.n_tokens, out.n_punct, out.n_stopwords) == (
        0,
        0,
        0,
        0,
    )
    assert out.mean_token_len == 0.0


# ---------------------------------------------- n-gram short-text fix


def test_ngram_repetition_short_text_zero_grams(spark):
    """A text with fewer than n words has NO n-grams: the old
    unconditional sequence(0, greatest(size-n, 0)) emitted one
    truncated bogus gram, reporting (1, 1) for every short doc."""
    from sketchlib.spark.text import ngram_repetition_cols

    total, distinct = ngram_repetition_cols()
    df = spark.createDataFrame(
        [
            (1, "hello"),
            (2, "two words"),
            (3, None),
            (4, "one two three"),
            (5, "a b c d"),
            (6, "x x x x x"),
        ],
        DOCS_SCHEMA,
    )
    rows = {
        r.doc_id: (r.t, r.d)
        for r in df.select(
            "doc_id", total.alias("t"), distinct.alias("d")
        ).collect()
    }
    assert rows[1] == (0, 0)
    assert rows[2] == (0, 0)
    assert rows[3] == (0, 0)
    assert rows[4] == (1, 1)
    assert rows[5] == (2, 2)
    assert rows[6] == (3, 1)  # 'x x x' three times, one distinct


def test_ngram_repetition_matches_duckdb_oracle_formula(spark):
    """The fixed Spark expression and the fixed DuckDB range formula
    must agree on the short-doc boundary, not just on the driver
    corpus (which has no short docs)."""
    import duckdb

    from sketchlib.spark.text import ngram_repetition_cols

    data = [
        (1, "hello"),
        (2, "two words"),
        (3, "one two three"),
        (4, "a b c d e"),
    ]
    total, distinct = ngram_repetition_cols()
    got = {
        r.doc_id: (r.t, r.d)
        for r in spark.createDataFrame(data, DOCS_SCHEMA)
        .select("doc_id", total.alias("t"), distinct.alias("d"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR);"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", data)
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            "WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs), "
            "grams AS (SELECT doc_id, list_transform(range(1, greatest(len(w) - 1, 1)), "
            "i -> concat_ws(' ', w[i], w[i+1], w[i+2])) AS g FROM words) "
            "SELECT doc_id, len(g), len(list_distinct(g)) FROM grams"
        ).fetchall()
    }
    assert got == want


def test_ngram_jaccard_short_docs_no_bogus_pairs(spark):
    """Two identical 2-word docs have EMPTY 3-gram sets — Jaccard is
    0/0, not the 1.0 the one-bogus-gram bug used to report; and short
    docs must not appear in any candidate pair at all."""
    from sketchlib.spark.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "same pair"),
            (2, "same pair"),
            (3, "a real document with enough words to gram"),
            (4, "a real document with enough words to gram"),
        ],
        DOCS_SCHEMA,
    )
    pairs = ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(3, 4)}


# --------------------------------------------------- null-id sampling


def test_hash_sample_excludes_null_ids(spark):
    """md5(NULL) is NULL and Spark sorts nulls FIRST ascending: before
    the filter, any null contingent deterministically monopolized the
    sample (and DuckDB sorts nulls LAST, so the oracle diverged)."""
    from sketchlib.spark.sampling import hash_sample, stratified_hash_sample

    rows = [(None, "src") for _ in range(50)] + [
        (i, "src") for i in range(100)
    ]
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("source", StringType(), True),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = [r.doc_id for r in hash_sample(df, 10).collect()]
    assert len(got) == 10 and all(v is not None for v in got)
    strat = [
        r.doc_id for r in stratified_hash_sample(df, 5, "source").collect()
    ]
    assert len(strat) == 5 and all(v is not None for v in strat)


# ------------------------------------------------ heavy hitters nulls


def test_cms_heavy_hitters_null_keys(spark):
    """Null keys are excluded, not crashed on: Arrow value_counts
    yields null as a value, and a None candidate made every sorted()
    in the merge path raise TypeError."""
    from sketchlib.spark.udfs import cms_heavy_hitters

    schema = StructType([StructField("key", StringType(), True)])
    rows = (
        [("hot",)] * 40
        + [(None,)] * 60  # null is the true plurality "value"
        + [(f"k{i}",) for i in range(20)]
    )
    df = spark.createDataFrame(rows, schema).repartition(4)
    hh = cms_heavy_hitters(df, "key", k=3)
    assert hh[0][0] == "hot" and hh[0][1] >= 40
    assert all(k is not None for k, _ in hh)


# ------------------------------------------------ bloom join type guard


def test_bloom_semi_join_type_mismatch_raises(spark):
    """String-cast hashing vs native join coercion disagree across key
    types (int 1 -> '1', double 1.0 -> '1.0'): the pre-filter would
    silently drop coerced-equal matches, so mismatched types refuse."""
    from sketchlib.spark.udfs import bloom_semi_join

    left = spark.range(10).select(F.col("id").alias("k"))
    right = spark.range(10).select(F.col("id").cast("double").alias("k"))
    with pytest.raises(ValueError, match="key types must match"):
        bloom_semi_join(left, right, "k")


# ----------------------------------------------------- KLL return shape


def test_kll_quantile_returns_array_for_scalar_q():
    from sketchlib.sketches import KLLSketch

    sk = KLLSketch(200)
    sk.update(np.arange(1000.0))
    out = sk.quantile(0.5)
    assert isinstance(out, np.ndarray) and out.shape == (1,)
    assert abs(float(out[0]) - 500.0) < 50


# ------------------------------------------------- lang_id pinned ties


def test_lang_id_tie_priority_and_nonoverlapping_counts(spark):
    """Pin the documented semantics: positive-vote ties resolve
    en > de > fr > es, and adjacent repeats count non-overlapping
    (split-on-' w ' consumes the shared space: 'the the the' -> 2)."""
    from sketchlib.spark.text import lang_id, quality_score

    df = spark.createDataFrame(
        [(1, "der the"), (2, "xyzzy plugh"), (3, None)], DOCS_SCHEMA
    )
    rows = {r.doc_id: r.lang for r in df.select(
        "doc_id", lang_id("text").alias("lang")).collect()}
    assert rows[1] == "en"  # 1-1 tie with de -> en by priority
    assert rows[2] == "und"
    assert rows[3] == "und"

    stop = (
        quality_score(spark.createDataFrame([(1, "the the the")], DOCS_SCHEMA))
        .collect()[0]
        .n_stopwords
    )
    assert stop == 2  # non-overlapping: deliberate, oracle-exact
