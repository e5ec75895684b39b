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


def materialize(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Eagerly materialize an intermediate result, truncating lineage.

    ``checkpoint_dir=None`` → ``localCheckpoint(eager=True)``: blocks
    live in executor storage — fast (no FS round-trip), but on a real
    cluster an executor loss AFTER this point is unrecoverable
    mid-query (the truncated lineage cannot recompute lost blocks).
    Right default for single-box runs and short-lived intermediates.

    ``checkpoint_dir=<path>`` → reliable ``checkpoint(eager=True)`` to
    that (HDFS / object-store) directory: survives executor loss at the
    cost of one distributed write + read. Pass this on long multi-stage
    cluster jobs where re-running the upstream stages is expensive.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


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
