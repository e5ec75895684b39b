"""Round-5 fixes: SpaceSaving prune floor in cms_heavy_hitters, legacy
lineage handling in IncrementalSketchBuilder, session-scoped
partition_sizes diagnostic."""

import pytest

# ------------------------------------------ SpaceSaving candidate floor


def _ss_run(batches, prune_at, prune_keep):
    from sketchlib.spark.udfs import _spacesaving_fold

    counts: dict = {}
    floor = 0
    for vals, cnts in batches:
        floor = _spacesaving_fold(counts, floor, vals, cnts, prune_at, prune_keep)
    return counts, floor


def test_spacesaving_never_understates_true_count():
    """Maintained count >= true count for every surviving key, for an
    adversarial churn stream that evicts keys repeatedly."""
    import random

    rng = random.Random(5)
    true: dict = {}
    batches = []
    for b in range(60):
        vals = [f"churn-{b}-{i}" for i in range(20)] + ["heavy"]
        cnts = [rng.randint(1, 5) for _ in range(20)] + [2]
        for v, c in zip(vals, cnts):
            true[v] = true.get(v, 0) + c
        batches.append((vals, cnts))
    counts, floor = _ss_run(batches, prune_at=32, prune_keep=8)
    assert len(counts) <= 32 + 21  # bounded (prune_at + one batch's vocab)
    for k, maintained in counts.items():
        assert maintained >= true[k], (k, maintained, true[k])


def test_spacesaving_superset_bound_keys_above_floor_survive():
    """Any key whose true count exceeds the final floor is in the final
    dict — the restored superset guarantee (ADVICE r4 medium)."""
    batches = []
    # heavy key: 3 per batch, always below the per-batch filler count,
    # so the OLD prune (no floor seeding) evicted it every round and it
    # finished with count 3 — out-ranked by any surviving filler.
    for b in range(40):
        vals = [f"f{b}-{i}" for i in range(40)] + ["HEAVY"]
        cnts = [4] * 40 + [3]
        batches.append((vals, cnts))
    counts, floor = _ss_run(batches, prune_at=32, prune_keep=8)
    true_heavy = 3 * 40
    for k, v in counts.items():
        if k != "HEAVY":
            assert v <= floor + 4  # fillers never accumulate past one batch
    # the floor-seeded count of HEAVY tracks the floor up, so whenever
    # its true count clears the floor it must be present
    if true_heavy > floor:
        assert "HEAVY" in counts
    # and regardless of the floor, the invariant holds for survivors
    if "HEAVY" in counts:
        assert counts["HEAVY"] >= true_heavy or counts["HEAVY"] >= floor


def test_spacesaving_old_prune_would_lose_reappearing_key():
    """Discriminating case: a key seen once per batch with moderate
    vocabulary churn. The old prune reset it to its raw per-batch count
    (1); floor seeding keeps it at floor+1, ahead of every earlier
    evictee. Assert the new behavior: its maintained count stays within
    one batch of the floor instead of collapsing to 1."""
    batches = []
    for b in range(30):
        vals = [f"x{b}-{i}" for i in range(50)] + ["flicker"]
        cnts = [2] * 50 + [1]
        batches.append((vals, cnts))
    counts, floor = _ss_run(batches, prune_at=32, prune_keep=8)
    assert floor > 10  # churn drove the floor well past any raw count
    if "flicker" in counts:
        assert counts["flicker"] > 1  # old scheme: exactly 1


def test_heavy_hitters_end_to_end_still_exact_at_test_scale(spark):
    """The floor changes candidate RANKING inputs only; CMS supplies
    estimates — top-k on a skewed column is unchanged."""
    from pyspark.sql import functions as F

    from sketchlib.spark.udfs import cms_heavy_hitters

    df = spark.range(20000).select(
        F.when(F.col("id") % 100 < 60, F.lit("alpha"))
        .when(F.col("id") % 100 < 90, F.lit("beta"))
        .otherwise(F.concat(F.lit("tail"), F.col("id")))
        .alias("tok")
    )
    top = cms_heavy_hitters(df, "tok", k=2)
    assert [t[0] for t in top] == ["alpha", "beta"]
    assert top[0][1] >= 12000 and top[1][1] >= 6000


# --------------------------------------- legacy lineage = changed lineage


def test_incremental_legacy_state_under_new_lineage_folds(spark, tmp_path):
    """A legacy (ISB1/headerless) state file re-attached under a NEW
    checkpoint must treat lineage as CHANGED: the new query's batch ids
    restart at 0, and skipping them against the legacy file's numbering
    silently discards fresh data (ADVICE r4)."""
    from sketchlib.sketches import HyperLogLog
    from sketchlib.streaming.incremental import IncrementalSketchBuilder

    state = str(tmp_path / "legacy.bin")
    legacy = HyperLogLog(12)
    legacy.update([f"old{i}" for i in range(200)])
    with open(state, "wb") as fh:
        fh.write(
            IncrementalSketchBuilder._MAGIC
            + (57).to_bytes(8, "little", signed=True)
            + legacy.to_bytes()
        )

    b = IncrementalSketchBuilder(lambda: HyperLogLog(12), "key", state)
    b._lineage = b._lineage_hash("/ckpt/fresh")
    df = spark.createDataFrame([(f"new{i}",) for i in range(200)], "key string")
    b.process_batch(df, 0)  # id 0 < legacy 57: MUST fold, not skip
    est = b.current().estimate()
    assert est > 300  # ~400 distinct: legacy + fresh both present
    # the fold stamped the new lineage: replay of batch 0 is a no-op
    b.process_batch(df, 0)
    assert b.current().estimate() == est
    assert b.last_batch_id() == 0


def test_incremental_headerless_under_new_lineage_folds(spark, tmp_path):
    """Same contract for raw headerless blobs (lineage reads as 0)."""
    from sketchlib.sketches import HyperLogLog
    from sketchlib.streaming.incremental import IncrementalSketchBuilder

    state = str(tmp_path / "raw.bin")
    old = HyperLogLog(12)
    old.update([f"o{i}" for i in range(100)])
    with open(state, "wb") as fh:
        fh.write(old.to_bytes())  # no header: loads as batch -1/lineage 0

    b = IncrementalSketchBuilder(lambda: HyperLogLog(12), "key", state)
    b._lineage = b._lineage_hash("/ckpt/other")
    df = spark.createDataFrame([(f"n{i}",) for i in range(100)], "key string")
    b.process_batch(df, 0)
    assert b.current().estimate() > 150


# ---------------------------------------- partition_sizes conf isolation


def test_partition_sizes_leaves_caller_conf_untouched(spark):
    """The AQE-coalescing override must be scoped to the cloned
    measurement session: a concurrently-planned query in the caller's
    session must never see it flipped (ADVICE r4)."""
    from pyspark.sql import functions as F

    from sketchlib.spark.salt import partition_sizes, salted_repartition

    key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(key, "true")
    df = salted_repartition(
        spark.range(5000).select(F.concat(F.lit("u"), F.col("id")).alias("url")), 16
    )
    sizes = partition_sizes(df)
    assert len(sizes) == 16 and sum(sizes) == 5000
    assert spark.conf.get(key) == "true"
    spark.conf.unset(key)


def test_partition_sizes_reports_empty_partitions(spark):
    from pyspark.sql import functions as F

    from sketchlib.spark.salt import partition_sizes

    # constant key: every row lands in ONE of 8 partitions
    df = spark.range(1000).select(F.lit("same").alias("k")).repartition(8, "k")
    sizes = partition_sizes(df)
    assert len(sizes) == 8
    assert sorted(sizes)[-1] == 1000 and sum(sizes) == 1000
