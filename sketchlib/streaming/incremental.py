"""Structured-Streaming incremental sketch builds.

The reference is batch-only; this is the streaming surface the events
table backs (SURVEY.md §2.4): a ``foreachBatch`` loop folds each
micro-batch into the running sketches via the same vectorized build
path, checkpointing merged state per batch — an incremental,
resumable filter build. Watermarked windowed distinct counts ride on
the same HLL merge.
"""

from __future__ import annotations

import os

from ..serde import loads
from ..spark.build import build_sketches
from ..spark.merge import tree_merge


class IncrementalSketchBuilder:
    """foreachBatch sink: state(t+1) = merge(state(t), build(batch)).

    Replay-idempotent: foreachBatch is at-least-once (a crash between
    the state write and Spark committing the batch's offsets replays
    the batch on restart), and sketch merges are NOT idempotent under
    re-application (CMS counts and KLL n would double, a cuckoo filter
    would double-insert every fingerprint). The last applied batch_id
    is therefore persisted in the same atomic write as the state, and
    a replayed (<= last) batch id is a no-op — same recipe as the
    sharded streaming sink's epoch check."""

    _MAGIC = b"ISB1"  # state-file header: magic + 8-byte last batch id

    def __init__(self, factory, key_col: str, state_path: str):
        self.factory = factory
        self.key_col = key_col
        self.state_path = state_path

    def _read(self):
        """→ (last_applied_batch_id, sketch). Legacy headerless files
        (pre-batch-id format) load as batch −1: replay protection
        starts from the next write."""
        if os.path.exists(self.state_path):
            with open(self.state_path, "rb") as fh:
                raw = fh.read()
            if raw[:4] == self._MAGIC:
                bid = int.from_bytes(raw[4:12], "little", signed=True)
                return bid, loads(raw[12:])
            return -1, loads(raw)
        return -1, self.factory()

    def current(self):
        return self._read()[1]

    def last_batch_id(self) -> int:
        return self._read()[0]

    def process_batch(self, batch_df, batch_id: int) -> None:
        last, state = self._read()
        if batch_id <= last:
            return  # replayed micro-batch: already folded into state
        delta = tree_merge(build_sketches(batch_df, self.key_col, self.factory))
        if delta is not None:
            state = state.merge(delta)
        # even for an empty delta, persist the advanced batch id so a
        # replay of THIS batch after a later crash stays a no-op
        tmp = f"{self.state_path}.tmp-{batch_id}"
        with open(tmp, "wb") as fh:
            fh.write(
                self._MAGIC
                + batch_id.to_bytes(8, "little", signed=True)
                + state.to_bytes()
            )
        os.replace(tmp, self.state_path)  # atomic per-batch checkpoint

    def attach(self, stream_df, checkpoint_dir: str, trigger_once: bool = True):
        writer = (
            stream_df.writeStream.outputMode("update")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def windowed_distinct_stream(stream_df, ts_col: str, key_col: str, window: str = "1 hour",
                             watermark: str = "2 hours", rsd: float = 0.05):
    """Watermarked tumbling-window approx distinct (native HLL++ path:
    approx_count_distinct is Spark's own HLL — the built-in we
    cross-check our HLL against). ``rsd``: relative standard deviation
    target; smaller = more registers per window's state."""
    from pyspark.sql import functions as F

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(F.approx_count_distinct(key_col, rsd).alias("approx_distinct"))
    )
