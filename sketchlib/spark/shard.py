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


_SHARD_COLS = ["shard_id", "n_rows", "item_count", "fail_count", "load_factor", "state"]


def delete_sharded(
    shard_df: DataFrame, deletes: DataFrame, key_col: str, num_shards: int
) -> DataFrame:
    """Distributed delete against a sharded filter, fully executor-side.

    Deletes route to their shard by the build's hash; a COGROUP on
    shard_id hands each task exactly (that shard's delete keys, that
    shard's single state row) — one co-partitioned shuffle, no driver
    collection of keys OR states, per-task memory = one shard. Untouched
    shards pass through (empty delete group); delete keys routed to a
    shard that never emitted a row (key was never inserted) are dropped —
    there is nothing to delete in a nonexistent shard.

    Matches the reference delete contract (``internal/filter/
    filter.go:116-133``) at any delete-set and filter size.

    Returns the updated shard table (same SHARD_SCHEMA)."""
    import pandas as pd

    keyed = deletes.select(F.col(key_col).alias("key")).withColumn(
        "shard_id", _shard_col("key", num_shards)
    )

    def apply_deletes(dels: pd.DataFrame, state: pd.DataFrame) -> pd.DataFrame:
        if state.empty:
            # deletes hashed to a shard with no row: nothing was ever
            # inserted there, so there is nothing to delete
            return pd.DataFrame({c: [] for c in _SHARD_COLS})
        if dels.empty:
            return state[_SHARD_COLS]  # untouched shard passes through
        f = loads(state["state"].iloc[0])
        f.delete_batch(dels["key"])
        return pd.DataFrame(
            {
                "shard_id": [int(state["shard_id"].iloc[0])],
                "n_rows": [int(state["n_rows"].iloc[0])],
                "item_count": [int(getattr(f, "num_items", 0))],
                "fail_count": [int(getattr(f, "insert_failures", 0))],
                "load_factor": [float(f.load_factor()) if hasattr(f, "load_factor") else 0.0],
                "state": [f.to_bytes()],
            }
        )

    return (
        keyed.groupBy("shard_id")
        .cogroup(shard_df.groupBy("shard_id"))
        .applyInPandas(apply_deletes, SHARD_SCHEMA)
    )


def probe_sharded(
    probes: DataFrame,
    key_col: str,
    shard_df: DataFrame,
    num_shards: int,
    broadcast_threshold_bytes: int = 64 << 20,
    state_bytes: int | None = None,
) -> DataFrame:
    """→ probes + boolean ``member`` column.

    Probes are grouped by their shard and answered with one vectorized
    lookup per group. The shard table joins in by one of two plans:

    * total state ≤ ``broadcast_threshold_bytes``: broadcast-hash join
      (no shuffle of the shard table, probes keep their partitioning).
    * larger (the 10^12-key regime, where total state is ~2 bytes/key):
      co-partitioned shuffle-hash join on shard_id — each task receives
      only its own shard's state, never the whole table.

    ``state_bytes``: caller-known total state size; when None it is
    measured with one tiny aggregation over ``shard_df`` (persist the
    shard table first — it is the filter, you will probe it repeatedly).

    LEFT join semantics: probes hashing to a shard with no row (nothing
    was ever inserted there) come back ``member = false`` instead of
    being dropped."""
    import pandas as pd

    if state_bytes is None:
        state_bytes = (
            shard_df.select(F.sum(F.length("state")).alias("b")).first().b or 0
        )
    states = shard_df.select("shard_id", "state")
    if state_bytes <= broadcast_threshold_bytes:
        states = F.broadcast(states)
    else:
        # shuffle-hash: hash the (small-per-partition) state side, never
        # sort data-scale probes; co-partitioned on shard_id
        states = states.hint("shuffle_hash")
    keyed = probes.withColumn("shard_id", _shard_col(key_col, num_shards))
    joined = keyed.join(states, "shard_id", "left")

    def lookup(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = pdf["state"].iloc[0]
        out = pdf.drop(columns=["state"])
        if blob is None:
            out["member"] = False  # empty shard: key was never inserted
            return out
        f = loads(blob)
        fn = getattr(f, "lookup_batch", None) or f.contains
        out["member"] = fn(pdf[key_col])
        return out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in keyed.schema.fields
    ) + ", member boolean"
    return joined.groupBy("shard_id").applyInPandas(lookup, out_schema)
