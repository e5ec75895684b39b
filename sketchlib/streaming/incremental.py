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
    """foreachBatch sink: state(t+1) = merge(state(t), build(batch))."""

    def __init__(self, factory, key_col: str, state_path: str):
        self.factory = factory
        self.key_col = key_col
        self.state_path = state_path

    def current(self):
        if os.path.exists(self.state_path):
            with open(self.state_path, "rb") as fh:
                return loads(fh.read())
        return self.factory()

    def process_batch(self, batch_df, batch_id: int) -> None:
        delta = tree_merge(build_sketches(batch_df, self.key_col, self.factory))
        if delta is None:
            return
        state = self.current().merge(delta)
        tmp = f"{self.state_path}.tmp-{batch_id}"
        with open(tmp, "wb") as fh:
            fh.write(state.to_bytes())
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
