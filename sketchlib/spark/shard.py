"""Sharded cuckoo filters — the 10^12-key scale path.

A single merged filter needs global geometry in every task (2 bytes ×
total slots), which stops scaling around 10^9 capacity. Sharding keeps
per-task memory constant at any scale:

* build: repartition rows by ``pmod(xxhash64(key), num_shards)``; each
  shard builds ONE filter of capacity/num_shards (mapInArrow fold);
  the result table (shard_id, state, metrics) is the filter.
* probe: zero-shuffle broadcast lookup while total state fits the
  broadcast budget (blobs broadcast once per executor, probes answered
  on their scan partitions); above it, a cogroup on shard_id — probes
  shuffle once (key bytes only), each shard's state moves exactly
  once. State bytes are NEVER attached per probe row (a join would
  shuffle |probes| × |shard state| bytes).

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


# shard routing keys are a pure function of (num_shards) — Spark's
# murmur3 is fixed — so the tiny discovery job runs once per size
_ROUTE_KEYS: dict[int, list[int]] = {}


def _identity_route_keys(spark, n: int) -> list[int]:
    """Routing keys k_0..k_{n-1} with ``pmod(hash(k_i), n) == i``.

    ``repartition(n, "shard_id")`` hash-partitions the shard id with
    murmur3, which is NOT the identity: several shards collide into one
    task while others sit empty, so a task holds 2-3 full per-shard
    filters at once — breaking the 'exactly one task per shard /
    per-task memory = one shard' contract this module exists for.
    Routing through a key whose murmur3 pmod IS the shard id restores
    the 1:1 layout. Keys are discovered with one tiny driver job
    (coupon-collector over spark.range; murmur3 evaluated by Spark
    itself so it can never drift from the engine's partitioner)."""
    cached = _ROUTE_KEYS.get(n)
    if cached is not None:
        return cached
    found: dict[int, int] = {}
    start, step = 0, max(64 * n, 1024)
    while len(found) < n:
        # engine-side reduction: min(id) per residue, so the driver
        # collects AT MOST n rows per round instead of the whole 64·n
        # probe window (at 10^5 shards that was ~6.4M longs pulled to
        # the driver once per session). min-of-window == the
        # first-encountered id of the old scan, so the discovered keys
        # are unchanged.
        rows = (
            spark.range(start, start + step)
            .select(F.pmod(F.hash("id"), F.lit(n)).alias("p"), F.col("id"))
            .groupBy("p")
            .agg(F.min("id").alias("id"))
            .collect()
        )
        for r in rows:
            found.setdefault(int(r.p), int(r.id))
        start += step
    keys = [found[i] for i in range(n)]
    _ROUTE_KEYS[n] = keys
    return keys


def _route_by_shard(keyed: DataFrame, num_shards: int) -> DataFrame:
    """Exchange into EXACTLY one partition per shard (see
    _identity_route_keys); the helper column is dropped after."""
    route = _identity_route_keys(keyed.sparkSession, num_shards)
    mapping = F.create_map(
        *[x for i, k in enumerate(route) for x in (F.lit(i), F.lit(k))]
    )
    return (
        # cast matters: murmur3 hashes int32 and int64 differently, and
        # the discovery job hashed LONGs (spark.range ids) — an int32
        # literal here would re-collide the routing
        keyed.withColumn("_route", mapping[F.col("shard_id").cast("int")].cast("long"))
        .repartition(num_shards, "_route")
        .drop("_route")
    )


def build_sharded(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    cfg: CuckooConfig | None = None,
    factory=None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """→ one row per shard (SHARD_SCHEMA). Exactly one task per shard.

    ``factory``: optional zero-arg callable building the per-shard
    sketch (any membership sketch with update/lookup_batch-or-contains);
    default builds a CuckooFilter with capacity/num_shards geometry —
    total state across shards stays ~capacity × 2 bytes regardless of
    shard count, the property that makes this the 10^12-key path.

    ``checkpoint_dir``: per-shard resume lineage (north rule), same
    contract as build_sketches — each task atomically publishes its
    finished shard row (``shard-{id}.arrow``); a resumed run re-emits
    published rows instead of re-folding those shards. Valid because
    the shard→rows assignment is the build's own hash partitioner
    (stable for a given key set and num_shards, unlike scan-partition
    ids)."""
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
    # one shuffle, EXACTLY one partition per shard (identity routing —
    # plain repartition on shard_id murmur3-collides shards into shared
    # tasks, multiplying per-task filter memory; see _identity_route_keys)
    keyed = _route_by_shard(keyed, num_shards)

    if checkpoint_dir:
        # shard→rows assignment is the key hash (stable across input
        # partitioning), so the fingerprint pins kind/shards/key —
        # but NOT partition count, which may legitimately change
        from .checkpoint import ensure_checkpoint_meta

        ensure_checkpoint_meta(
            df.sparkSession,
            checkpoint_dir,
            {
                "op": "build_sharded",
                "kind": type(factory()).__name__,
                "key_col": key_col,
                "num_shards": int(num_shards),
            },
        )

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from . import taskfs

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
        filters: dict[int, CuckooFilter] = {}
        counts: dict[int, int] = {}
        resumed: dict[int, pa.Table] = {}

        # executor-side IO via pyarrow.fs (tasks have no JVM; os.path on
        # an hdfs://-s3a:// dir writes executor-LOCAL files and resume
        # silently never fires) — see sketchlib/spark/taskfs.py
        ck_fs = ck_base = None
        if checkpoint_dir:
            ck_fs, ck_base = taskfs.task_fs(checkpoint_dir)

        def ckpt_path(sid: int) -> str:
            return f"{ck_base.rstrip('/')}/shard-{sid:06d}.arrow"

        for rb in batches:
            keys = rb.column("key")
            shards = rb.column("shard_id").to_numpy()
            # a task normally owns one shard; group defensively anyway
            import numpy as np

            for sid in np.unique(shards):
                sid_i = int(sid)
                if checkpoint_dir and sid_i not in resumed and sid_i not in filters:
                    p = ckpt_path(sid_i)
                    if taskfs.exists(ck_fs, p):
                        resumed[sid_i] = taskfs.read_ipc_table(ck_fs, p)
                if sid_i in resumed:
                    continue  # shard already published: skip the fold
                mask = shards == sid
                # NOT setdefault(sid_i, factory()): setdefault evaluates
                # its default eagerly, allocating (and discarding) a
                # full-size filter table per Arrow batch on the hot path
                f = filters.get(sid_i)
                if f is None:
                    f = filters[sid_i] = factory()
                # factory protocol: cuckoo-style insert_batch, else the
                # MergeableSketch update (Bloom/HLL/... shard the same way)
                ins = getattr(f, "insert_batch", None) or f.update
                ins(keys.filter(pa.array(mask)))
                counts[sid_i] = counts.get(sid_i, 0) + int(mask.sum())
        for table in resumed.values():
            yield from table.to_batches()
        for sid, f in filters.items():
            out = pa.RecordBatch.from_pydict(
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
            if checkpoint_dir:
                import uuid

                # attempt-unique tmp + move = atomic publish; identical
                # bytes per attempt make last-writer-wins safe; dead
                # attempts' orphaned tmps are GC'd inside
                taskfs.publish_ipc_batch(
                    ck_fs,
                    ck_base,
                    f".shard-{sid:06d}.tmp-{uuid.uuid4().hex[:8]}",
                    f"shard-{sid:06d}.arrow",
                    out_schema,
                    out,
                )
            yield out

    return keyed.mapInArrow(fold, SHARD_SCHEMA)


_SHARD_COLS = ["shard_id", "n_rows", "item_count", "fail_count", "load_factor", "state"]

# worker-level deserialized-shard cache for the broadcast probe path:
# the docstring promises 'each worker deserializes a shard at most once
# per call', but a per-task dict re-deserializes every shard for every
# input partition (200 probe partitions × 8 shards = 1600 multi-MB
# loads). Keyed by (JVM broadcast id, shard id) — broadcast ids are
# unique per context and never reused, so a destroyed index can't alias
# a later one. Bounded so destroyed indexes can't pin worker memory.
_PROBE_DESER_CACHE: dict[tuple[int, int], object] = {}
_PROBE_DESER_CACHE_MAX = 512


def _shard_from(bid: int, sid: int, blob: bytes) -> object:
    f = _PROBE_DESER_CACHE.get((bid, sid))
    if f is None:
        f = loads(blob)
        while len(_PROBE_DESER_CACHE) >= _PROBE_DESER_CACHE_MAX:
            _PROBE_DESER_CACHE.pop(next(iter(_PROBE_DESER_CACHE)))
        _PROBE_DESER_CACHE[(bid, sid)] = f
    return f


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
        if len(state) > 1:
            # a well-formed shard table has exactly one row per shard;
            # duplicates (unioned shard tables, a double-emitting build)
            # must fail loudly — applying deletes to only one of the
            # rows would silently drop the others' filter state
            raise ValueError(
                f"shard {int(state['shard_id'].iloc[0])} has {len(state)} state "
                "rows; merge duplicate shard rows (merge_sharded) before delete"
            )
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


def merge_sharded(shard_df: DataFrame) -> DataFrame:
    """ONE row per shard from a union of same-geometry shard tables
    (incremental builds, streaming micro-batches): per shard_id, the
    duplicate filter states merge associatively and the row counts add.
    One applyInPandas group per shard — per-task memory is the handful
    of duplicate states of a single shard, never the whole table."""
    import pandas as pd

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        f = loads(pdf["state"].iloc[0])
        for blob in pdf["state"].iloc[1:]:
            f.merge(loads(blob))
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "n_rows": [int(pdf["n_rows"].sum())],
                "item_count": [int(getattr(f, "num_items", 0))],
                "fail_count": [int(getattr(f, "insert_failures", 0))],
                "load_factor": [
                    float(f.load_factor()) if hasattr(f, "load_factor") else 0.0
                ],
                "state": [f.to_bytes()],
            }
        )

    return shard_df.groupBy("shard_id").applyInPandas(merge_group, SHARD_SCHEMA)


class ShardedProbeIndex:
    """Reusable broadcast handle for probing in a loop: the shard blobs
    are collected and broadcast ONCE; every ``probe_sharded`` call that
    passes the handle reuses the broadcast — no per-call collect, no
    state-size re-measure aggregation, no leaked broadcasts. Call
    ``destroy()`` when the probing loop is done (after materializing
    the last probe result)."""

    def __init__(self, spark, blobs: dict[int, bytes]):
        self.state_bytes = sum(len(b) for b in blobs.values())
        self.broadcast = spark.sparkContext.broadcast(blobs)

    @classmethod
    def from_shards(cls, shard_df: DataFrame) -> "ShardedProbeIndex":
        rows = shard_df.select("shard_id", "state").collect()
        blobs: dict[int, bytes] = {}
        for r in rows:
            sid = int(r.shard_id)
            if sid in blobs:
                # a well-formed shard table has exactly one row per
                # shard; silently keeping one of the duplicates (a
                # unioned/unmerged table) would probe against partial
                # state — false negatives with no error
                raise ValueError(
                    f"shard {sid} has duplicate state rows; merge duplicate "
                    "shard rows (merge_sharded) before probing"
                )
            blobs[sid] = bytes(r.state)
        return cls(shard_df.sparkSession, blobs)

    def destroy(self) -> None:
        self.broadcast.destroy()


def probe_sharded(
    probes: DataFrame,
    key_col: str,
    shard_df: DataFrame | None = None,
    num_shards: int = 0,
    broadcast_threshold_bytes: int = 64 << 20,
    state_bytes: int | None = None,
    index: ShardedProbeIndex | None = None,
) -> DataFrame:
    """→ probes + boolean ``member`` column.

    Two plans, picked by total filter size (``state_bytes``; measured
    with one tiny aggregation when not supplied — persist the shard
    table, it is the filter):

    * ≤ ``broadcast_threshold_bytes``: ZERO-SHUFFLE — the shard blobs
      broadcast once per executor (each worker deserializes a shard at
      most once per call; the cache is bounded by the broadcast budget),
      probes stay on their scan partitions and each Arrow batch is
      answered in place, vectorized per shard group. Never attaches
      state to probe rows: attaching via join would shuffle
      |probes| × |shard state| bytes — data-scale × state-scale.
      The broadcast lives as long as the returned DataFrame (callers
      probing in a loop should materialize promptly).
    * larger (the 10^12-key regime): COGROUP on shard_id — probes
      shuffle once (key bytes only), each shard's state moves exactly
      once to meet its probe group, per-task memory = one shard.

    Probes hashing to a shard with no state row (nothing was inserted
    there) come back ``member = false`` — never dropped.

    ``index``: a prebuilt ``ShardedProbeIndex`` — ALWAYS takes the
    broadcast path, skipping both the per-call collect+broadcast and
    the state-size measuring aggregation. The recommended handle for
    probe loops (one broadcast for the whole loop, explicitly
    destroyable); without it each call creates a broadcast that lives
    until the returned DataFrame is garbage-collected."""
    import numpy as np
    import pandas as pd

    if index is None and shard_df is None:
        raise ValueError("need shard_df or a prebuilt ShardedProbeIndex")
    if num_shards <= 0:
        raise ValueError("num_shards must match the build's shard count")
    if index is None and state_bytes is None:
        state_bytes = (
            shard_df.select(F.sum(F.length("state")).alias("b")).first().b or 0
        )
    keyed = probes.withColumn("shard_id", _shard_col(key_col, num_shards))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in keyed.schema.fields
    ) + ", member boolean"

    if index is not None or state_bytes <= broadcast_threshold_bytes:
        bc = (
            index.broadcast
            if index is not None
            else ShardedProbeIndex.from_shards(shard_df).broadcast
        )
        # driver-side JVM broadcast id: the worker-level deser cache key
        # (unique per context, never reused — the same contract as
        # udfs._DESER_CACHE; id(bc) would alias after GC address reuse)
        bid = bc._jbroadcast.id()

        def probe_batches(batches):
            for pdf in batches:
                member = np.zeros(len(pdf), bool)
                if len(pdf):
                    for sid, idx in pdf.groupby("shard_id").indices.items():
                        blob = bc.value.get(int(sid))
                        if blob is None:
                            continue  # empty shard: member stays False
                        f = _shard_from(bid, int(sid), blob)
                        fn = getattr(f, "lookup_batch", None) or f.contains
                        member[idx] = np.asarray(fn(pdf[key_col].iloc[idx]), bool)
                out = pdf.copy()
                out["member"] = member
                yield out

        return keyed.mapInPandas(probe_batches, out_schema)

    def lookup(probe_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if probe_pdf.empty:
            return pd.DataFrame({c: [] for c in list(probe_pdf.columns) + ["member"]})
        out = probe_pdf.copy()
        if state_pdf.empty:
            out["member"] = False  # empty shard: key was never inserted
            return out
        if len(state_pdf) > 1:
            # mirror delete_sharded's loud guard: probing only the first
            # of several duplicate state rows (unioned/unmerged shard
            # tables) returns silent false negatives
            raise ValueError(
                f"shard {int(state_pdf['shard_id'].iloc[0])} has "
                f"{len(state_pdf)} state rows; merge duplicate shard rows "
                "(merge_sharded) before probing"
            )
        f = loads(state_pdf["state"].iloc[0])
        fn = getattr(f, "lookup_batch", None) or f.contains
        out["member"] = np.asarray(fn(probe_pdf[key_col]), bool)
        return out

    return (
        keyed.groupBy("shard_id")
        .cogroup(shard_df.groupBy("shard_id"))
        .applyInPandas(lookup, out_schema)
    )
