#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Runs the flagship queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the north-rule
sketch-build throughput over a cached deterministic web-page table
(FIXTURES.md §1 shape; generated once into .bench/).

Usage:
  python bench.py                 # driver mode: one JSON line to stdout
  python bench.py --scaling      # extra: local[8] vs local[32] build
                                  # throughput + scaling efficiency
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)
if REPO not in os.environ["PYTHONPATH"].split(os.pathsep):
    os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ["PYTHONPATH"]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "200000"))
DOCS_PARQUET = os.path.join(REPO, ".bench", f"docs_{BENCH_DOCS}.parquet")


def ensure_bench_docs() -> str:
    if not os.path.exists(DOCS_PARQUET):
        os.makedirs(os.path.dirname(DOCS_PARQUET), exist_ok=True)
        from sketchlib.datagen import write_documents_parquet

        tmp = DOCS_PARQUET + ".tmp"
        write_documents_parquet(tmp, BENCH_DOCS, seed=7)
        os.replace(tmp, DOCS_PARQUET)
    return DOCS_PARQUET


def make_session(cpus: str):
    from sketchlib.spark.session import get_spark

    return get_spark(app=f"sketchlib-bench-{cpus}", master=f"local[{cpus}]",
                     shuffle_partitions=int(cpus))


def build_throughput(spark, docs_path: str, partitions: int, trials: int = 3) -> dict:
    """Flagship one-pass 5-sketch build (webbuild): cuckoo + Bloom +
    HLL over url, CMS over tokens, KLL over page sizes — zero input
    shuffle, scan-partitioned. Reports best-of-N docs/sec (first trial
    pays page-cache + Python-worker warmup, which a long-running
    cluster job would amortize)."""
    from sketchlib import CuckooConfig, CuckooFilter
    from sketchlib.sketches import BloomFilter, CountMinSketch, HyperLogLog, KLLSketch
    from sketchlib.spark.webbuild import build_web_sketches, merge_web_sketches

    sz = os.path.getsize(docs_path)
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(max(sz // partitions, 1 << 20))
    )
    docs = spark.read.parquet(docs_path)
    n = docs.count()  # warms the footer read; not part of the timed section
    cfg = CuckooConfig(capacity=int(n * 1.1), fingerprint_bits=16, hash_strategy="xx")
    factories = {
        "cuckoo": lambda: CuckooFilter(cfg),
        "bloom": lambda: BloomFilter(capacity=n, fp_rate=0.001),
        "hll": lambda: HyperLogLog(14),
        "cms": lambda: CountMinSketch(width=1 << 16, depth=4),
        "kll": lambda: KLLSketch(200),
    }
    times = []
    merged = None
    for _ in range(trials):
        t0 = time.perf_counter()
        merged = merge_web_sketches(build_web_sketches(docs, factories))
        times.append(time.perf_counter() - t0)
    best = min(times)
    cuckoo, hll = merged["cuckoo"], merged["hll"]
    return {
        "rows": n,
        "sketches": sorted(factories),
        "build_sec_best": round(best, 3),
        "build_sec_all": [round(t, 3) for t in times],
        "docs_per_sec": round(n / best),
        "cuckoo_count": cuckoo.count(),
        "cuckoo_fail": cuckoo.insert_failures,
        "cuckoo_load_factor": round(cuckoo.load_factor(), 4),
        "hll_rel_err": round(abs(hll.estimate() - n) / n, 5),
    }


HEADLINE = [
    "cuckoo_membership",
    "sharded_membership",
    "hll_distinct_check",
    "cms_frequency_check",
    "quantile_sketches_check",
    "pricing_summary",
    "top_revenue_orders",
    "events_window_counts",
    "sessionization",
    "dedup_exact_hash",
    "minhash_identical",
    "token_count",
    "quality_score",
    "top_tokens",
    "ann_cosine_topk",
]


def run_headline(spark) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.count()  # force full execution
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def scaling_report(docs_path: str) -> dict:
    """North-rule two-parallelism evidence: same job, same input at
    local[8] vs local[32]; efficiency = (t8/t32)/4 for the 4x cores."""
    results = {}
    for cpus in ("8", "32"):
        spark = make_session(cpus)
        try:
            # fixed 64-way partitioning at both levels: same work units,
            # only the executor-slot count changes (the N vs 4N analogue)
            results[cpus] = build_throughput(spark, docs_path, 64)
        finally:
            spark.stop()
    t8 = results["8"]["build_sec_best"]
    t32 = results["32"]["build_sec_best"]
    return {
        "local8": results["8"],
        "local32": results["32"],
        "speedup_8_to_32": round(t8 / t32, 3),
        "scaling_efficiency": round((t8 / t32) / 4.0, 3),
    }


def main() -> None:
    docs_path = ensure_bench_docs()

    if "--scaling" in sys.argv:
        print(json.dumps(scaling_report(docs_path), indent=2))
        return

    spark = make_session(CPUS)
    try:
        queries = run_headline(spark)
        thr = build_throughput(spark, docs_path, int(CPUS) * 2)
    finally:
        spark.stop()
    total = round(sum(queries.values()), 3)
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else SF_DIR)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "throughput": thr,
            }
        )
    )


if __name__ == "__main__":
    main()
