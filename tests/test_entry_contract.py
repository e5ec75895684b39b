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
    # the documented non-SQL (rows-only) queries are the only ones
    # allowed to omit an oracle
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"ann_lsh_recall", "ann_ivf_recall"}


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
