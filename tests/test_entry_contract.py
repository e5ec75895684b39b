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
    # the driver's correctness artifact covers the FIRST 50 names.
    # Final round-4 rotation (see the queries() comment): (a) one-plus
    # in-window query per round-4-changed code path, (b) the 14 names
    # whose last driver-green row was round 2 all rotate IN so no query
    # goes two full rounds unchecked; the tail holds only
    # CORRECTNESS_r03-green names whose round-4 module deltas are
    # covered by a sibling window query.
    first50 = list(qs)[:50]
    for name in (
        # (a) round-4-changed paths
        "ann_cosine_topk", "ann_lsh_recall", "ann_index", "lsh_index",
        "embedding_knn", "embedding_knn_recall",
        "warc_source", "multimodal_decode",
        "multimodal_audio_real", "multimodal_frame_sample",
        "streaming_sharded", "streaming_stateful", "streaming_incremental",
        "sharded_bloom_membership", "sharded_membership", "sharded_delete",
        "cuckoo_membership", "cuckoo_delete", "cuckoo_lifecycle",
        "bloom_join_pruning",
        "minhash_identical", "minhash_near_dups",
        "ngram_jaccard", "simhash_near_dups",
        "dedup_components", "dedup_exact_hash",
        "token_count", "word_token_count", "hash_sample",
        "doc_split", "repetition_ratio", "corpus_prepare",
        "heavy_hitters", "quantile_sketches_check", "grouped_quantiles",
        "per_source_distinct", "top_tokens", "lang_id",
        "web_sketch_family",
        # (b) last driver-green in round 2
        "membership_semi_join", "membership_anti_join", "sessionization",
        "set_ops", "pricing_summary", "top_revenue_orders",
        "shipping_priority", "region_nation_rollup",
        "top_customer_per_nation", "events_window_counts", "sql_interface",
    ):
        assert name in first50, name
    # tail names must all have a round-3 driver-green row
    r03_green = {
        "cuckoo_count", "bloom_membership", "cms_frequency_check",
        "stratified_sample", "hll_set_ops", "kmv_set_ops",
        "source_similarity", "streaming_windowed", "dedup_exact",
        "dedup_canonical", "quality_score", "top_tokens_per_source",
        "pii_scrub", "doc_fingerprint", "ann_ivf_recall",
        "simhash_buckets", "hash_indices_contract", "hll_distinct_check",
    }
    assert set(list(qs)[50:]) <= r03_green


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
