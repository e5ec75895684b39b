"""Driver-contract smoke tests for __spark_entry__.py: entry() runs at
sf0.001 with a stable schema; queries()/oracle_sql() keys are
consistent; a fast subset of queries returns rows at sf0.001."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_registry_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 20
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # round 3: every registered query is oracle-backed (the two former
    # rows-only recall demos are now gated verdicts with exact oracles)
    assert set(qs) == set(oracles)
    # the driver's correctness artifact covers the FIRST 50 names —
    # every name whose code path changed in round 4 (plus the names the
    # round-2 artifact missed) must sit inside that window. The late
    # round-4 review pass touched text.py (token_count /
    # word_token_count null coalesce, hash_split boundary, ngram
    # short-text) and sampling.py (null-id exclusion), so token_count,
    # word_token_count and hash_sample are back IN the window;
    # hash_indices_contract, hll_distinct_check and
    # streaming_incremental (untouched all round, multi-round
    # driver-green) hold the tail instead.
    first50 = list(qs)[:50]
    for name in (
        "ann_cosine_topk", "ann_lsh_recall", "ann_ivf_recall", "ann_index",
        "lsh_index", "simhash_buckets", "warc_source", "multimodal_decode",
        "multimodal_audio_real", "multimodal_frame_sample",
        "streaming_sharded", "streaming_windowed",
        "stratified_sample", "hll_set_ops", "kmv_set_ops", "source_similarity",
        "sharded_bloom_membership", "cuckoo_membership", "cuckoo_delete",
        "cuckoo_count", "bloom_join_pruning",
        "cms_frequency_check", "minhash_identical", "minhash_near_dups",
        "ngram_jaccard", "dedup_components", "sharded_membership",
        "sharded_delete",
        "token_count", "word_token_count", "hash_sample",
        "quality_score", "doc_split", "repetition_ratio",
        "corpus_prepare", "heavy_hitters",
    ):
        assert name in first50, name


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs > 0
    assert r.no_false_negatives
    assert abs(r.hll_estimate - r.distinct_text) / r.distinct_text < 0.1


@pytest.mark.parametrize(
    "name",
    [
        "web_sketch_family",
        "cuckoo_membership",
        "bloom_membership",
        "pricing_summary",
        "dedup_exact",
        "token_count",
        "ann_cosine_topk",
    ],
)
def test_query_returns_rows(spark, name):
    fn = entry_mod.queries()[name]
    assert fn(spark, SF).count() > 0
