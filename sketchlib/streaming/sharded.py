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

State layout under ``state_dir`` (any Hadoop-visible filesystem —
``hdfs://``, ``s3a://``, or a local path; ALL state I/O, including the
pointer file, goes through the Hadoop FileSystem API of the session,
never the driver's local ``os`` module, so the layout works wherever
the executors' parquet writes land)::

    epoch-{batch_id}/   shard table (SHARD_SCHEMA parquet) AFTER batch
    CURRENT             pointer file: "{batch_id}" of the last applied
                        batch (written to a temp name + atomic rename)

Exactly-once across failures rides foreachBatch's epoch replay: a
replayed batch_id ≤ CURRENT is skipped (its merge already published),
and a crash between the epoch write and the pointer swap just
recomputes the epoch from the previous pointer — the merge is
deterministic, so the overwrite is byte-stable. This is the standard
idempotent-foreachBatch recipe from the Structured Streaming guide.

Disk ceiling: each batch writes a full new shard-table copy (merge
output), so after the pointer swap every epoch older than the
PREVIOUS one is deleted — steady-state footprint is 2× the filter
(current + one predecessor for crash recovery), not batches × filter.
"""

from __future__ import annotations

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
        self.state_dir = state_dir.rstrip("/")
        self.cfg = cfg
        self.factory = factory

    # ---------------------------------------------------- hadoop fs helpers

    def _fs(self, spark):
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        path = jvm.org.apache.hadoop.fs.Path(self.state_dir)
        return jvm, path.getFileSystem(conf)

    def _pointer(self, spark) -> int | None:
        jvm, fs = self._fs(spark)
        p = jvm.org.apache.hadoop.fs.Path(f"{self.state_dir}/CURRENT")
        if not fs.exists(p):
            # CURRENT can be missing mid-swap (the delete+rename pair in
            # _publish_pointer is not atomic on every FS): recover from
            # the newest COMPLETE epoch dir (Spark's _SUCCESS marker —
            # the epoch write always finishes before the pointer swap
            # starts, so the max complete epoch IS the last published
            # state; partial writes lack _SUCCESS and are ignored).
            best = None
            base = jvm.org.apache.hadoop.fs.Path(self.state_dir)
            if fs.exists(base):
                for status in fs.listStatus(base):
                    name = status.getPath().getName()
                    if name.startswith("epoch-"):
                        try:
                            eid = int(name.removeprefix("epoch-"))
                        except ValueError:
                            continue
                        ok = jvm.org.apache.hadoop.fs.Path(
                            f"{self.state_dir}/{name}/_SUCCESS"
                        )
                        if fs.exists(ok) and (best is None or eid > best):
                            best = eid
            if best is not None:
                # heal the pointer file now: otherwise EVERY subsequent
                # _pointer call (current_shards, replay skips, probes)
                # repeats this full epoch listing + _SUCCESS scan —
                # O(listing) per call on object stores — until the next
                # new batch happens to publish. BEST-EFFORT: the heal is
                # an optimization on a read path, so a concurrent healer
                # losing the rename race, a writer mid-publish, or a
                # read-only consumer without write permission must all
                # degrade to "list again next call", never to an error.
                try:
                    self._publish_pointer(spark, best)
                except Exception:
                    pass
            return best
        stream = fs.open(p)
        try:
            # byte-at-a-time read: the pointer is < 20 bytes and this
            # avoids a classpath dependency for bulk reads via py4j
            data = bytearray()
            b = stream.read()
            while b != -1:
                data.append(b)
                b = stream.read()
        finally:
            stream.close()
        return int(bytes(data).decode().strip())

    def _publish_pointer(self, spark, batch_id: int) -> None:
        import uuid

        jvm, fs = self._fs(spark)
        Path = jvm.org.apache.hadoop.fs.Path
        # unique tmp name: a recovery heal (reader side, best-effort)
        # can race the writer or another healer — shared tmp names would
        # make one participant rename the other's file out from under it
        tmp = Path(f"{self.state_dir}/.CURRENT.tmp-{batch_id}-{uuid.uuid4().hex}")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(str(batch_id).encode()))
        finally:
            out.close()
        dst = Path(f"{self.state_dir}/CURRENT")
        if fs.exists(dst):
            fs.delete(dst, False)
        # the delete+rename pair is NOT one atomic step (and on object
        # stores rename is copy+delete) — a crash in the gap is healed
        # by _pointer()'s newest-complete-epoch recovery above, so the
        # window can lose the pointer FILE but never published STATE.
        # A rename refused because dst reappeared (a healer republished
        # in the gap) is retried once after re-deleting; pointer values
        # only ever move forward, so whichever write wins is safe — the
        # reader recovery path tolerates a stale-but-present pointer.
        if not fs.rename(tmp, dst):
            if fs.exists(dst):
                fs.delete(dst, False)
            if not fs.rename(tmp, dst):
                raise OSError(f"pointer rename failed: {tmp} -> {dst}")

    def _prune_epochs(self, spark, keep_from: int) -> None:
        """Delete epoch dirs older than ``keep_from`` (the predecessor
        of CURRENT stays for crash recovery)."""
        jvm, fs = self._fs(spark)
        Path = jvm.org.apache.hadoop.fs.Path
        base = Path(self.state_dir)
        if not fs.exists(base):
            return
        for status in fs.listStatus(base):
            name = status.getPath().getName()
            if name.startswith("epoch-"):
                try:
                    eid = int(name.removeprefix("epoch-"))
                except ValueError:
                    continue
                if eid < keep_from:
                    fs.delete(status.getPath(), True)

    # ------------------------------------------------------------ state io

    def current_shards(self, spark) -> DataFrame | None:
        """The shard table after the last applied batch (None before
        the first batch). This IS the filter — probe it with
        ``spark.shard.probe_sharded``."""
        cur = self._pointer(spark)
        if cur is None:
            return None
        return spark.read.parquet(f"{self.state_dir}/epoch-{cur}")

    # ------------------------------------------------------------- folding

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = self._pointer(spark)
        if cur is not None and batch_id <= cur:
            return  # replayed epoch: merge already published, skip
        delta = build_sharded(
            batch_df, self.key_col, self.num_shards, cfg=self.cfg, factory=self.factory
        )
        prev = self.current_shards(spark)
        merged = merge_sharded(delta.unionByName(prev)) if prev is not None else delta
        merged.write.mode("overwrite").parquet(f"{self.state_dir}/epoch-{batch_id}")
        self._publish_pointer(spark, batch_id)
        if cur is not None:
            self._prune_epochs(spark, keep_from=cur)

    def attach(self, stream_df, checkpoint_dir: str, trigger_once: bool = True):
        writer = (
            stream_df.writeStream.outputMode("update")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        return writer.start()
