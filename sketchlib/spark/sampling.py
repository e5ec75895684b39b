"""Deterministic distributed sampling operators.

Training-data pipelines need samples that are (a) uniform over the
keyspace, (b) reproducible across engines, runs, and partitionings,
and (c) cheap at 100 TB. Bottom-k by a cryptographic hash of the key
gives all three:

* ``ORDER BY md5(key) LIMIT k`` compiles to a per-partition top-k tree
  reduction in Spark (``TakeOrderedAndProject`` — no global sort, no
  data shuffle; only k rows per partition reach the driver-side
  merge), so cost is one scan regardless of table size;
* md5 is engine-portable (Spark and DuckDB produce the identical
  lowercase hex), so the sample is EXACTLY mirrorable in SQL — unlike
  ``df.sample(seed)``, whose output depends on partition layout;
* changing k only extends/truncates the sample (nested samples), the
  property consistent-hash samplers are chosen for in production
  pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hash_key(id_col: str):
    return F.md5(F.col(id_col).cast("string"))


def hash_sample(df: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic uniform k-sample: bottom-k rows by md5(id).

    Plan shape: TakeOrderedAndProject (per-partition heap + tree
    merge) — asserted in tests; never a full sort or shuffle.

    NULL ids are excluded: md5(NULL) is NULL, which Spark's default
    nulls-first ascending sort would rank BEFORE every real hash —
    any null contingent would deterministically monopolize the sample
    (and DuckDB sorts nulls last, so the oracle would diverge too).
    A null id has no position in the keyspace being sampled."""
    return (
        df.where(F.col(id_col).isNotNull())
        .orderBy(_hash_key(id_col), F.col(id_col))
        .limit(k)
    )


def stratified_hash_sample(
    df: DataFrame, k_per_group: int, group_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic k-per-group sample: row_number over md5(id) within
    each group. One hash shuffle on ``group_col``, then a per-group
    sort — the standard window shape; a pathologically hot group sorts
    on one task (same skew story as any per-group window; salt the
    group upstream if one group is data-scale). NULL ids are excluded
    for the same nulls-first reason as hash_sample."""
    from pyspark.sql.window import Window

    # collision-safe internal name: withColumn would silently REPLACE a
    # user column named "_rk" and the final drop would delete it
    rk = "_rk"
    while rk in df.columns:
        rk = "_" + rk
    w = Window.partitionBy(group_col).orderBy(_hash_key(id_col), F.col(id_col))
    return (
        df.where(F.col(id_col).isNotNull())
        .withColumn(rk, F.row_number().over(w))
        .where(F.col(rk) <= k_per_group)
        .drop(rk)
    )
