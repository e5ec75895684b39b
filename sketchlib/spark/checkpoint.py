"""Checkpoint-resumable build lineage (north-rule requirement).

Two granularities:
* partition-level: build_sketches(checkpoint_dir=...) — each task
  atomically publishes its finished sketch row as
  ``part-{pid}.arrow``; a rerun re-emits stored rows instead of
  recomputing (the anti-join on completed lineage happens implicitly
  by file existence, with identical input partitioning guaranteed by
  deterministic parquet splits under fixed maxPartitionBytes).
* run-level: ``run_with_lineage`` — stage results land in a parquet
  dir + manifest; a resumed run short-circuits completed stages.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame


def _delete_fs_path(session, path: str) -> None:
    """Recursively delete ``path`` through the Hadoop FileSystem API
    (hdfs://-capable, exists-guarded no-op)."""
    jvm = session.sparkContext._jvm
    conf = session.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if fs.exists(p):
        fs.delete(p, True)


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Eagerly materialize an intermediate result, truncating lineage.

    ``checkpoint_dir=None`` → ``localCheckpoint(eager=True)``: blocks
    live in executor storage — fast (no FS round-trip), auto-released
    when the frame is garbage-collected, but on a real cluster an
    executor loss AFTER this point is unrecoverable mid-query (the
    truncated lineage cannot recompute lost blocks). Right default for
    single-box runs and short-lived intermediates.

    ``checkpoint_dir=<path>`` → a parquet round-trip into a unique
    ``mat-*`` subdirectory of that (HDFS / object-store) path: survives
    executor loss at the cost of one distributed write + read.
    Deliberately NOT ``df.checkpoint()``: that would require mutating
    the SparkContext-GLOBAL checkpoint directory, so two concurrent
    jobs with different ``checkpoint_dir``s would silently write into
    each other's directory (and clobber any application-configured
    one). The written path is recorded on the returned frame as
    ``_materialize_path``; callers that fully consume the result should
    pass it to ``drop_materialized`` — nothing is auto-deleted, because
    the files ARE the frame's storage.

    Tradeoff vs ``df.checkpoint``: the frame must be parquet-writable —
    no ``NullType`` columns (e.g. a bare ``F.lit(None)``) or
    parquet-illegal column names — and the round-trip reads back with
    all columns nullable. Every frame this library materializes is
    concrete-typed pair/label output, so this never binds internally;
    cast ``lit(None)`` placeholders before passing external frames.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    import uuid

    path = f"{checkpoint_dir.rstrip('/')}/mat-{uuid.uuid4().hex}"
    try:
        df.write.mode("error").parquet(path)
    except BaseException:
        # failed/aborted write: remove the partial dir (the caller gets
        # no handle to it through the exception); best-effort — cleanup
        # failure must not mask the original error
        try:
            _delete_fs_path(df.sparkSession, path)
        except Exception:
            pass
        raise
    out = df.sparkSession.read.parquet(path)
    out._materialize_path = path
    return out


def propagate_materialized(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Carry ``_materialize_path`` from a materialized frame onto a
    frame DERIVED from it (select/filter/join wrappers), so the public
    return value of an operator remains drop_materialized-able. The
    derived frame reads the same parquet files — drop only after fully
    consuming it."""
    dst._materialize_path = getattr(src, "_materialize_path", None)
    return dst


def drop_materialized(df: DataFrame) -> None:
    """Delete the parquet files behind a frame returned by
    ``materialize(..., checkpoint_dir=...)`` (no-op for the
    localCheckpoint flavor). Call only when the frame — and everything
    lazily derived from it — is fully consumed."""
    path = getattr(df, "_materialize_path", None)
    if path is None:
        return
    _delete_fs_path(df.sparkSession, path)


def lineage_manifest(checkpoint_dir: str) -> dict:
    path = os.path.join(checkpoint_dir, "_lineage.json")
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return {"stages": {}}


def mark_stage_done(checkpoint_dir: str, stage: str, meta: dict | None = None) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    m = lineage_manifest(checkpoint_dir)
    m["stages"][stage] = {"done_at": time.time(), **(meta or {})}
    tmp = os.path.join(checkpoint_dir, "_lineage.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(m, fh)
    os.replace(tmp, os.path.join(checkpoint_dir, "_lineage.json"))


def stage_done(checkpoint_dir: str, stage: str) -> bool:
    return stage in lineage_manifest(checkpoint_dir)["stages"]


def completed_partitions(checkpoint_dir: str) -> list[int]:
    if not os.path.isdir(checkpoint_dir):
        return []
    return sorted(
        int(f[len("part-") : -len(".arrow")])
        for f in os.listdir(checkpoint_dir)
        if f.startswith("part-") and f.endswith(".arrow")
    )
