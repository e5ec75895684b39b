"""Per-key grouped sketch builds with explicit salting (north rule).

One sketch PER GROUP (per host, per source, per language...) differs
from the global builds in webbuild/build: the shuffle key is the group
column, and web-host-like keys are Zipf-skewed — the top key can carry
30%+ of all rows, so a plain ``groupBy(key).applyInPandas`` puts 30% of
the corpus in one task. AQE's skew handling does not split
applyInPandas groups (SURVEY.md §4.2), so salting is explicit:

  stage 1: groupBy(key, salt) — each hot key splits into
           ``salt_buckets`` bounded subgroups, each building a partial
           sketch (vectorized fold);
  stage 2: groupBy(key) over the (key, salt) partials — merges
           ``salt_buckets``-many KB-sized states per key; the shuffle
           carries states, not rows.

Both stages are associative-merge applications, so results are
identical to an unsalted build (property-tested).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..serde import loads
from .salt import salt_grouped

GROUP_SKETCH_SCHEMA = "group_key string, n_rows long, state binary"


def build_grouped_sketches(
    df: DataFrame,
    group_col: str,
    key_col: str,
    factory: Callable[[], object],
    salt_buckets: int = 8,
    row_key: str | None = None,
) -> DataFrame:
    """→ one row per group (GROUP_SKETCH_SCHEMA) via salted two-stage
    build. ``row_key`` feeds the salt hash (defaults to ``key_col``).

    Pass a distinct ``row_key`` (e.g. the url column) when ``key_col``
    values repeat heavily inside a hot group: salting on the value
    column sends every copy of a hot value to the SAME salt bucket,
    defeating the salt — a row-unique column spreads them. The column
    is projected through for the salt hash and dropped after."""
    proj = [
        F.col(group_col).cast("string").alias("group_key"),
        F.col(key_col).alias("key"),
    ]
    if row_key is not None and row_key != key_col:
        # row_key must survive the projection or salt_grouped's
        # xxhash64(row_key) hits a dropped column (AnalysisException)
        proj.append(F.col(row_key).alias("_salt_row_key"))
        salt_col = "_salt_row_key"
    else:
        salt_col = "key"
    salted = salt_grouped(df.select(*proj), "group_key", salt_buckets, row_key=salt_col)
    if salt_col == "_salt_row_key":
        # only needed to compute _salt — shipping a full row-key column
        # (urls) through the stage-1 shuffle would roughly double its
        # volume; the docstring's "dropped after" happens HERE
        salted = salted.drop("_salt_row_key")

    def build_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = factory()
        sk.update(pdf["key"])
        return pd.DataFrame(
            {
                "group_key": [pdf["group_key"].iloc[0]],
                "n_rows": [len(pdf)],
                "state": [sk.to_bytes()],
            }
        )

    partials = salted.groupBy("group_key", "_salt").applyInPandas(
        build_partial, GROUP_SKETCH_SCHEMA
    )

    def merge_partials(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = loads(pdf["state"].iloc[0])
        for blob in pdf["state"].iloc[1:]:
            sk.merge(loads(blob))
        return pd.DataFrame(
            {
                "group_key": [pdf["group_key"].iloc[0]],
                "n_rows": [int(pdf["n_rows"].sum())],
                "state": [sk.to_bytes()],
            }
        )

    return partials.groupBy("group_key").applyInPandas(
        merge_partials, GROUP_SKETCH_SCHEMA
    )


def grouped_estimates(grouped_df: DataFrame) -> DataFrame:
    """(group_key, n_rows, estimate) for estimate-bearing sketches
    (HLL distinct; t-digest/KLL expose quantiles via mapInPandas
    variants). Runs executor-side over the tiny state rows."""

    def est(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            sk = loads(row["state"])
            out.append((row["group_key"], int(row["n_rows"]), float(sk.estimate())))
        return pd.DataFrame(out, columns=["group_key", "n_rows", "estimate"])

    return grouped_df.mapInPandas(
        lambda it: (est(pdf) for pdf in it),
        "group_key string, n_rows long, estimate double",
    )
