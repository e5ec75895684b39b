"""Two-level associative merge of per-partition sketch rows.

The Spark analogue of ``treeAggregate`` (SURVEY.md §3.4 step 5):
level 1 groups partition rows by ``part_id % fanout`` and merges each
group executor-side (applyInPandas — the explicit partial/final UDAF
pattern, since PySpark exposes no Python UDAF); level 2 merges the
≤fanout survivors on the driver. Merge order within a group is
whatever the shuffle delivers — safe because every sketch's merge is
associative + commutative (property-tested, north-rule gate).

Shuffle volume: fanout × state_size — KBs–MBs, never data-scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..serde import loads
from .build import SKETCH_ROW_SCHEMA, sketch_metrics


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    sk = loads(pdf["state"].iloc[0])
    for blob in pdf["state"].iloc[1:]:
        sk.merge(loads(blob))
    items, fails, load = sketch_metrics(sk)
    return pd.DataFrame(
        {
            "part_id": [int(pdf["part_id"].min())],
            "n_rows": [int(pdf["n_rows"].sum())],
            "item_count": [items],
            "fail_count": [fails],
            "load_factor": [load],
            "state": [sk.to_bytes()],
        }
    )


def tree_merge_df(sketch_df, fanout: int = 16):
    """Level-1 merge: p partition rows → ≤fanout rows, executor-side."""
    return (
        sketch_df.withColumn("merge_group", F.col("part_id") % fanout)
        .groupBy("merge_group")
        .applyInPandas(_merge_group, SKETCH_ROW_SCHEMA)
    )


def tree_merge(sketch_df, fanout: int = 16):
    """Full two-level merge → one sketch object on the driver."""
    rows = tree_merge_df(sketch_df, fanout).select("state").collect()
    if not rows:
        return None
    sk = loads(rows[0].state)
    for r in rows[1:]:
        sk.merge(loads(r.state))
    return sk
