"""Sharded cuckoo filters — the 10^12-key scale path.

A single merged filter needs global geometry in every task (2 bytes ×
total slots), which stops scaling around 10^9 capacity. Sharding keeps
per-task memory constant at any scale:

* build: repartition rows by ``pmod(xxhash64(key), num_shards)``; each
  shard builds ONE filter of capacity/num_shards (mapInArrow fold);
  the result table (shard_id, state, metrics) is the filter.
* probe: repartition probes by the same function, join shard states by
  shard_id (broadcast when the shard table is small; co-partitioned
  sort-merge join when not), answer each probe batch vectorized.

No cross-shard merge exists or is needed — the shard table is the
distributed filter, and per-shard merge (same geometry) still works
for combining incremental builds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..config import CuckooConfig
from ..cuckoo import CuckooFilter
from ..serde import loads

SHARD_SCHEMA = (
    "shard_id int, n_rows long, item_count long, fail_count long, "
    "load_factor double, state binary"
)


def _shard_col(key_col: str, num_shards: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_shards)).cast("int")


def build_sharded(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    cfg: CuckooConfig | None = None,
    factory=None,
) -> DataFrame:
    """→ one row per shard (SHARD_SCHEMA). Exactly one task per shard.

    ``factory``: optional zero-arg callable building the per-shard
    sketch (any membership sketch with update/lookup_batch-or-contains);
    default builds a CuckooFilter with capacity/num_shards geometry —
    total state across shards stays ~capacity × 2 bytes regardless of
    shard count, the property that makes this the 10^12-key path."""
    if factory is None:
        if cfg is None:
            raise ValueError("need cfg or factory")
        shard_cfg = CuckooConfig(
            capacity=max(cfg.capacity // num_shards, 64),
            bucket_size=cfg.bucket_size,
            fingerprint_bits=cfg.fingerprint_bits,
            max_kicks=cfg.max_kicks,
            hash_strategy=cfg.hash_strategy,
            seed=cfg.seed,
        )
        factory = lambda: CuckooFilter(shard_cfg)  # noqa: E731
    keyed = df.select(F.col(key_col).alias("key")).withColumn(
        "shard_id", _shard_col("key", num_shards)
    )
    # one shuffle, keyed exactly by shard
    keyed = keyed.repartition(num_shards, "shard_id")

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        filters: dict[int, CuckooFilter] = {}
        counts: dict[int, int] = {}
        for rb in batches:
            keys = rb.column("key")
            shards = rb.column("shard_id").to_numpy()
            # a task normally owns one shard; group defensively anyway
            import numpy as np

            for sid in np.unique(shards):
                mask = shards == sid
                f = filters.setdefault(int(sid), factory())
                f.insert_batch(keys.filter(pa.array(mask)))
                counts[int(sid)] = counts.get(int(sid), 0) + int(mask.sum())
        out_schema = pa.schema(
            [
                ("shard_id", pa.int32()),
                ("n_rows", pa.int64()),
                ("item_count", pa.int64()),
                ("fail_count", pa.int64()),
                ("load_factor", pa.float64()),
                ("state", pa.binary()),
            ]
        )
        for sid, f in filters.items():
            yield pa.RecordBatch.from_pydict(
                {
                    "shard_id": [sid],
                    "n_rows": [counts[sid]],
                    "item_count": [int(getattr(f, "num_items", 0))],
                    "fail_count": [int(getattr(f, "insert_failures", 0))],
                    "load_factor": [float(f.load_factor()) if hasattr(f, "load_factor") else 0.0],
                    "state": [f.to_bytes()],
                },
                schema=out_schema,
            )

    return keyed.mapInArrow(fold, SHARD_SCHEMA)


def delete_sharded(
    shard_df: DataFrame, deletes: DataFrame, key_col: str, num_shards: int
) -> DataFrame:
    """Distributed delete against a sharded filter: deletes route to
    their shard by the build's hash, each touched shard applies one
    vectorized ``delete_batch`` and emits its updated row; untouched
    shards pass through. No driver-side key collection — the delete set
    can be any size.

    Returns the updated shard table (same SHARD_SCHEMA)."""
    import pandas as pd

    spark = shard_df.sparkSession
    states = {r.shard_id: r for r in shard_df.collect()}
    bc = spark.sparkContext.broadcast(
        {sid: (r.state, r.n_rows) for sid, r in states.items()}
    )
    keyed = deletes.select(F.col(key_col).alias("key")).withColumn(
        "shard_id", _shard_col("key", num_shards)
    )

    def apply_deletes(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["shard_id"].iloc[0])
        blob, n_rows = bc.value[sid]
        f = loads(blob)
        f.delete_batch(pdf["key"])
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "n_rows": [int(n_rows)],
                "item_count": [int(getattr(f, "num_items", 0))],
                "fail_count": [int(getattr(f, "insert_failures", 0))],
                "load_factor": [float(f.load_factor()) if hasattr(f, "load_factor") else 0.0],
                "state": [f.to_bytes()],
            }
        )

    updated = keyed.groupBy("shard_id").applyInPandas(apply_deletes, SHARD_SCHEMA)
    untouched = shard_df.join(updated.select("shard_id"), "shard_id", "left_anti")
    return untouched.unionByName(updated)


def probe_sharded(
    probes: DataFrame, key_col: str, shard_df: DataFrame, num_shards: int
) -> DataFrame:
    """→ probes + boolean ``member`` column.

    Broadcast-join the shard table (KB-MB per shard) onto probes
    grouped by shard, answering each group with one vectorized lookup.
    """
    import pandas as pd

    keyed = probes.withColumn("shard_id", _shard_col(key_col, num_shards))
    joined = keyed.join(F.broadcast(shard_df.select("shard_id", "state")), "shard_id")

    def lookup(pdf: pd.DataFrame) -> pd.DataFrame:
        f = loads(pdf["state"].iloc[0])
        fn = getattr(f, "lookup_batch", None) or f.contains
        out = pdf.drop(columns=["state"])
        out["member"] = fn(pdf[key_col])
        return out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in keyed.schema.fields
    ) + ", member boolean"
    return joined.groupBy("shard_id").applyInPandas(lookup, out_schema)
