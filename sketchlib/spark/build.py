"""Distributed sketch build: per-partition fold + metrics, zero shuffle.

The Spark-first shape (SURVEY.md §3.4): ``df.mapInArrow`` folds each
input partition's Arrow batches into ONE sketch via the vectorized
numpy kernels, emitting a single metrics row per partition — no
groupBy, no shuffle, no per-row Python. The merge tree
(sketchlib.spark.merge) then combines the per-partition states.

Scale notes (100 TB / 10^12 docs):
* HLL/CMS/KLL/t-digest/Bloom states are KBs–MBs regardless of input
  size, so per-partition build + tree merge is the whole story.
* A *merged* cuckoo filter must carry global geometry in every
  partition (2 bytes/slot), so the merged strategy is for capacities
  up to ~10^8-10^9; beyond that use ``sharded`` builds
  (sketchlib.spark.shard): repartition by key-hash, one
  capacity/num_shards filter per shard, probes routed by the same
  partitioner — no cross-shard merge needed, memory per task constant.
* Checkpoint/resume is per-partition (north-rule lineage): each task
  writes its finished sketch row to ``checkpoint_dir/part-{pid}``;
  a resumed run re-emits stored rows instead of recomputing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pyarrow as pa

from ..serde import loads

SKETCH_ROW_SCHEMA = (
    "part_id int, n_rows long, item_count long, fail_count long, "
    "load_factor double, state binary"
)

_SKETCH_PA_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("n_rows", pa.int64()),
        ("item_count", pa.int64()),
        ("fail_count", pa.int64()),
        ("load_factor", pa.float64()),
        ("state", pa.binary()),
    ]
)


def sketch_metrics(sk) -> tuple[int, int, float]:
    """(item_count, fail_count, load_factor) for any sketch kind."""
    item_count = getattr(sk, "num_items", None)
    if item_count is None:
        item_count = getattr(sk, "n", None)
    if item_count is None:
        item_count = int(getattr(sk, "total", 0) or getattr(sk, "total_weight", 0))
    fail = int(getattr(sk, "insert_failures", 0))
    load = float(sk.load_factor()) if hasattr(sk, "load_factor") else 0.0
    return int(item_count), fail, load


def _row_batch(pid: int, n_rows: int, sk) -> pa.RecordBatch:
    items, fails, load = sketch_metrics(sk)
    return pa.RecordBatch.from_pydict(
        {
            "part_id": [pid],
            "n_rows": [n_rows],
            "item_count": [items],
            "fail_count": [fails],
            "load_factor": [load],
            "state": [sk.to_bytes()],
        },
        schema=_SKETCH_PA_SCHEMA,
    )


def build_sketches(
    df,
    key_col: str,
    factory: Callable[[], object],
    checkpoint_dir: str | None = None,
    numeric: bool = False,
):
    """``df`` → one sketch row per partition (SKETCH_ROW_SCHEMA).

    ``factory`` runs once per task on the executor and must be a
    picklable zero-arg callable returning a fresh sketch — in
    particular it must NOT close over DataFrames or the SparkSession
    (hoist e.g. ``capacity=df.count()`` into a local first, or the
    closure capture fails with CONTEXT_ONLY_VALID_ON_DRIVER).
    ``numeric`` converts the key column to float64 (KLL/t-digest
    inputs).
    """

    if checkpoint_dir:
        # resume is only valid against the SAME build: sketch kind, key
        # column, value dtype AND partition count (partition ids are
        # the lineage key — a changed maxPartitionBytes remaps rows to
        # ids, silently double-counting/dropping on resume). Fingerprint
        # the dir once, loudly reject mismatches.
        from .checkpoint import ensure_checkpoint_meta

        sel = df.select(key_col)
        ensure_checkpoint_meta(
            df.sparkSession,
            checkpoint_dir,
            {
                "op": "build_sketches",
                "kind": type(factory()).__name__,
                "key_col": key_col,
                "numeric": bool(numeric),
                "partitions": sel.rdd.getNumPartitions(),
            },
        )

    def fold(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        from . import taskfs

        pid = TaskContext.get().partitionId()
        if checkpoint_dir:
            # executor-side IO goes through pyarrow.fs — tasks have no
            # JVM, and os.path on an hdfs://-s3a:// dir silently writes
            # executor-LOCAL files (resume would never fire). See
            # sketchlib/spark/taskfs.py.
            fs, base = taskfs.task_fs(checkpoint_dir)
            done = f"{base.rstrip('/')}/part-{pid:05d}.arrow"
            if taskfs.exists(fs, done):
                for rb in taskfs.read_ipc_table(fs, done).to_batches():
                    yield rb
                return
        sk = factory()
        n = 0
        for rb in batches:
            col = rb.column(0)
            if numeric:
                sk.update(col.to_numpy(zero_copy_only=False))
            else:
                sk.update(col)
            n += rb.num_rows
        out = _row_batch(pid, n, sk)
        if checkpoint_dir:
            import uuid

            # attempt-unique tmp + move = atomic publish (lineage
            # record); orphaned tmps of dead attempts are GC'd inside
            taskfs.publish_ipc_batch(
                fs,
                base,
                f".part-{pid:05d}.tmp-{uuid.uuid4().hex[:8]}",
                f"part-{pid:05d}.arrow",
                _SKETCH_PA_SCHEMA,
                out,
            )
        yield out

    return df.select(key_col).mapInArrow(fold, SKETCH_ROW_SCHEMA)


def collect_sketch(sketch_df, empty_factory: Callable[[], object] | None = None):
    """Small-result terminal: pull partition rows and merge on the driver.

    Use tree_merge (sketchlib.spark.merge) first when partition counts
    are large; this is the final ≤fanout-row collect."""
    rows = sketch_df.select("state").collect()
    if not rows:
        return empty_factory() if empty_factory else None
    sk = loads(rows[0].state)
    for r in rows[1:]:
        sk.merge(loads(r.state))
    return sk
