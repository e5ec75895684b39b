"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §2.2).

At 100 TB the dominant join cost is the exchange. Writing both sides
bucketed by the join key with the same bucket count lets Spark plan a
SortMergeJoin with NO Exchange on either side — the co-location is
durable table metadata, amortized across every future join/aggregation
on that key. The helpers below wrap the saveAsTable plumbing and verify
the plan shape (tests assert the absence of Exchange operators).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a dangling location (crashed prior run) blocks managed-table create
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), table.split(".")[-1])
    shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a SHUFFLE exchange (broadcast
    exchanges don't repartition data and don't count)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan
