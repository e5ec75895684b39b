"""Structured-Streaming SHARDED filter build — streaming ingestion for
the 10^12-key path.

``IncrementalSketchBuilder`` merges one GLOBAL sketch per batch, which
caps out where a single merged filter does (~10^9 keys of state on one
machine). This module routes every micro-batch through the same
hash-sharded layout as ``spark.shard.build_sharded`` and folds the
batch's delta shard table into the running shard table PER SHARD
(``merge_sharded`` — same-geometry associative merge), so streaming
state scales exactly like the batch path: per-task memory = one shard,
total state = the on-disk shard table, never a driver-held blob.

State layout under ``state_dir``::

    epoch-{batch_id}/   shard table (SHARD_SCHEMA parquet) AFTER batch
    CURRENT             pointer file: "{batch_id}" of the last applied
                        batch (written atomically via os.replace)

Exactly-once across failures rides foreachBatch's epoch replay: a
replayed batch_id ≤ CURRENT is skipped (its merge already published),
and a crash between the epoch write and the pointer swap just
recomputes the epoch from the previous pointer — the merge is
deterministic, so the overwrite is byte-stable. This is the standard
idempotent-foreachBatch recipe from the Structured Streaming guide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..config import CuckooConfig
from ..spark.shard import build_sharded, merge_sharded


class ShardedStreamBuilder:
    """foreachBatch sink: shard_table(t+1) = merge_sharded(
    shard_table(t) ∪ build_sharded(batch))."""

    def __init__(
        self,
        key_col: str,
        num_shards: int,
        state_dir: str,
        cfg: CuckooConfig | None = None,
        factory=None,
    ):
        self.key_col = key_col
        self.num_shards = num_shards
        self.state_dir = state_dir
        self.cfg = cfg
        self.factory = factory
        os.makedirs(state_dir, exist_ok=True)

    # ------------------------------------------------------------ state io

    def _pointer(self) -> int | None:
        p = os.path.join(self.state_dir, "CURRENT")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return int(fh.read().strip())

    def current_shards(self, spark) -> DataFrame | None:
        """The shard table after the last applied batch (None before
        the first batch). This IS the filter — probe it with
        ``spark.shard.probe_sharded``."""
        cur = self._pointer()
        if cur is None:
            return None
        return spark.read.parquet(os.path.join(self.state_dir, f"epoch-{cur}"))

    # ------------------------------------------------------------- folding

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        cur = self._pointer()
        if cur is not None and batch_id <= cur:
            return  # replayed epoch: merge already published, skip
        spark = batch_df.sparkSession
        delta = build_sharded(
            batch_df, self.key_col, self.num_shards, cfg=self.cfg, factory=self.factory
        )
        prev = self.current_shards(spark)
        merged = merge_sharded(delta.unionByName(prev)) if prev is not None else delta
        epoch_dir = os.path.join(self.state_dir, f"epoch-{batch_id}")
        merged.write.mode("overwrite").parquet(epoch_dir)
        tmp = os.path.join(self.state_dir, f".CURRENT.tmp-{batch_id}")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(self.state_dir, "CURRENT"))  # atomic publish

    def attach(self, stream_df, checkpoint_dir: str, trigger_once: bool = True):
        writer = (
            stream_df.writeStream.outputMode("update")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
