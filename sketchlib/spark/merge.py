"""Two-level associative merge of per-partition sketch rows.

The Spark analogue of ``treeAggregate`` (SURVEY.md §3.4 step 5):
level 1 routes partition rows round-robin to ≤fanout groups and
STREAMS each group through a running merge executor-side; level 2
merges the ≤fanout survivors on the driver. Merge order within a
group is whatever the shuffle delivers — safe because every sketch's
merge is associative + commutative (property-tested, north-rule gate).

Level 1 is a deliberate RDD ``mapPartitions`` — one of the rare spots
where the imperative per-partition escape hatch is the *correct* tool:
the rows are KB–MB sketch blobs (never data rows), and an RDD iterator
hands them over ONE AT A TIME, so task memory is exactly
running_state + one incoming blob no matter how many scan partitions
fed the group. Both dataframe-native shapes materialize multi-blob
batches the UDF can't refuse: ``groupBy().applyInPandas`` builds the
whole group as one pandas frame (~P/fanout blobs), and ``mapInArrow``
materializes ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows
(default 10k) per input batch — with MB-scale CMS states that is tens
of GB per task at the 100 TB / 128 MB-partition scale this library
targets (and no byte-capped batch conf exists for mapInArrow in
Spark 4.1; ``maxBytesPerBatch`` only applies to transformWithState).

Shuffle volume: fanout × state_size — KBs–MBs, never data-scale.
"""

from __future__ import annotations

from ..serde import loads
from .build import SKETCH_ROW_SCHEMA, sketch_metrics


def _fold_rows(rows):
    """Streaming fold of one merge group's (part_id, n_rows, state)
    tuples: the running sketch plus ONE incoming blob resident at a
    time — memory is 2 × state_size regardless of group size."""
    sk = None
    part_id = 0
    n_rows = 0
    for pid, nr, blob in rows:
        other = loads(bytes(blob))
        if sk is None:
            sk, part_id, n_rows = other, int(pid), int(nr)
        else:
            sk.merge(other)
            part_id = min(part_id, int(pid))
            n_rows += int(nr)
    if sk is not None:
        items, fails, load = sketch_metrics(sk)
        yield (part_id, n_rows, items, fails, load, sk.to_bytes())


def fold_groups_rdd(rdd, k: int, fold):
    """Round-robin routing of an RDD's rows to ``k`` merge groups +
    streaming per-group ``fold`` (shared by tree_merge and
    webbuild.merge_web_sketches — keep the routing in ONE place).

    Keyed by ``(source_partition_index + row_index) % k`` — balanced
    for ANY input, independent of the part_id column's diversity. A
    ``part_id % k`` key (an earlier shape) collapses whenever part_id
    is constant or low-cardinality — e.g. re-merging a frame that
    already went through level 1 (its part_id is each group's minimum:
    ≤k distinct values), or unioned/synthesized rows sharing part_id=0
    — routing everything to a few tasks while the rest idle. The
    grouping itself is arbitrary: every fold is associative +
    commutative, so only balance matters. Keys are 0..k-1 ints and
    ``partitionBy``'s portable_hash is the identity on small
    non-negative ints, so group j lands in partition j — exactly one
    group per task."""

    def route(idx, it):
        for i, row in enumerate(it):
            yield ((idx + i) % k, row)

    return rdd.mapPartitionsWithIndex(route).partitionBy(k).values().mapPartitions(fold)


def _direct_collect(frame):
    """Collect a blob frame for a direct (driver-side) fold, turning a
    ``spark.driver.maxResultSize`` rejection into actionable guidance.

    The direct path gates on PARTITION count — a fine proxy for
    build_sketches/build_web_sketches outputs (a handful of rows per
    partition) but not for a blob table re-read from storage or
    coalesced after a union, where few partitions can hold many
    MB-scale rows. maxResultSize (default 1g) is the loud backstop for
    that shape; the remedy is the executor-level path."""
    try:
        return frame.collect()
    except Exception as e:  # pragma: no cover - env-sized threshold
        if "maxResultSize" in str(e):
            raise RuntimeError(
                "direct merge collect exceeded spark.driver.maxResultSize — "
                "this blob frame packs many rows per partition (re-read or "
                "coalesced blob table?); pass direct_partitions=0 to use the "
                "bounded executor-level merge instead"
            ) from e
        raise


def _tree_fold_rdd(sketch_df, fanout: int):
    return fold_groups_rdd(
        sketch_df.select("part_id", "n_rows", "state").rdd, fanout, _fold_rows
    )


def tree_merge_df(sketch_df, fanout: int = 16):
    """Level-1 merge: p partition rows → ≤fanout rows, executor-side."""
    return sketch_df.sparkSession.createDataFrame(
        _tree_fold_rdd(sketch_df, fanout), SKETCH_ROW_SCHEMA
    )


def state_bytes_hint(*factories) -> int:
    """Driver-side estimate of ONE partition row group's serialized
    state size: serialize one empty instance of each factory. Costs ~ms
    and no Spark job. Exact for array-backed sketches (CMS, HLL,
    cuckoo, Bloom — their state arrays are config-sized, identical
    empty or full); an UNDER-estimate for growing sketches (KLL,
    t-digest), which are KB-scale where the array-backed ones are the
    MB-scale states the byte gate exists for."""
    return sum(len(fac().to_bytes()) for fac in factories)


def tree_merge(
    sketch_df,
    fanout: int = 16,
    direct_partitions: int = 256,
    state_bytes: int | None = None,
    direct_bytes: int = 256 << 20,
):
    """Full merge → one sketch object on the driver.

    Adaptive depth: when the blob frame has ≤ ``direct_partitions``
    partitions, the executor level is SKIPPED — one ``collect`` of the
    partition blobs, folded driver-side one at a time. The driver
    transient is p × state_size (≤ 256 × ~0.5 MB ≈ 128 MB at the
    flagship's CMS geometry), and the build stage keeps its full scan
    parallelism because ``collect`` is a plain job over the existing
    partitions. Measured on the 800k-doc bench corpus (65 blob rows):
    the level-1 RDD route+partitionBy+fold costs 1.7 s of pure
    task/python-shuffle overhead where the direct collect-fold costs
    0.6 s — two extra stages buy nothing until the blob count is large
    enough that a single driver pull would be GBs.

    Past the threshold (100 TB ⇒ ~10^5-10^6 scan partitions) the
    two-level shape engages: level 1 routes blobs round-robin to
    ≤fanout streaming folds executor-side, so the driver never pulls
    more than fanout blobs.

    ``state_bytes`` makes the gate BYTE-aware: when the caller knows
    the per-partition state size (``state_bytes_hint(factory)`` —
    exact for array-backed sketches, no Spark job), the direct path
    additionally requires p × state_bytes ≤ ``direct_bytes`` (default
    256 MB of driver transient). Without it the gate counts partitions
    only, which a 2 MB-wide CMS at the 256-partition threshold turns
    into a silent ~0.5 GB driver pull — maxResultSize is the loud
    backstop, but the byte cap avoids tripping it at all. For
    unusually large per-partition states with no hint available
    (an unsharded CuckooFilter sized for 10^8+ keys is ~2 B/key PER
    PARTIAL) pass ``direct_partitions=0``, or better, use
    ``shard.build_sharded`` (the intended giant-membership path:
    total state 2 B/key across ALL shards, nothing merges globally)."""
    p = sketch_df.rdd.getNumPartitions()
    fits_bytes = state_bytes is None or p * state_bytes <= direct_bytes
    if p <= direct_partitions and fits_bytes:
        sk = None
        for r in _direct_collect(sketch_df.select("state")):
            other = loads(bytes(r[0]))
            if sk is None:
                sk = other
            else:
                sk.merge(other)
        return sk
    rows = _tree_fold_rdd(sketch_df, fanout).collect()
    if not rows:
        return None
    sk = loads(bytes(rows[0][5]))
    for r in rows[1:]:
        sk.merge(loads(bytes(r[5])))
    return sk
