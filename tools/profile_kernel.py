#!/usr/bin/env python
"""Single-process breakdown of the build fold's per-batch cost:
tokenize / value_counts / CMS / HLL / KLL / cuckoo on one Arrow batch
of the bench corpus. Diagnostic only."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from bench import ensure_bench_docs


def t(label, fn, n=3):
    best = min(min((lambda s: (fn(), time.perf_counter() - s)[1])(time.perf_counter()) for _ in range(n)), 99)
    print(f"{label:30s} {best*1000:8.1f} ms")
    return best


def main():
    path = ensure_bench_docs()
    tbl = pq.read_table(path, columns=["url", "text"])
    batch = tbl.slice(0, 10000).combine_chunks()
    urls = batch.column("url").chunk(0)
    texts = batch.column("text").chunk(0)
    print("batch rows:", batch.num_rows, "text bytes:", pc.utf8_length(texts).to_numpy(zero_copy_only=False).sum())

    from sketchlib.sketches import CountMinSketch, HyperLogLog, KLLSketch

    toks = pc.utf8_split_whitespace(texts)
    flat0 = pc.list_flatten(toks)
    flat = flat0.filter(pc.not_equal(flat0, ""))
    vc = flat.value_counts()
    tok_vals = vc.field("values")
    tok_counts = vc.field("counts").to_numpy(zero_copy_only=False)
    print("tokens:", len(flat), "uniques:", len(tok_vals))

    t("tokenize (split_whitespace)", lambda: pc.utf8_split_whitespace(texts))
    t("list_flatten+filter", lambda: pc.list_flatten(pc.utf8_split_whitespace(texts)))
    t("value_counts", lambda: flat.value_counts())
    t("utf8_length sizes", lambda: pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64))

    cms = CountMinSketch(width=1 << 14, depth=4)
    t("cms.update(uniq,weights)", lambda: cms.update(tok_vals, weights=tok_counts))
    hll = HyperLogLog(14)
    t("hll.update(urls)", lambda: hll.update(urls))
    kll = KLLSketch(200)
    sizes = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    t("kll.update(sizes)", lambda: kll.update(sizes))

    # cuckoo shard-side fold cost for comparison
    from sketchlib import CuckooFilter
    from sketchlib.config import CuckooConfig

    cfg = CuckooConfig(capacity=20000, fingerprint_bits=16, hash_strategy="xx")
    def cuckoo_ins():
        f = CuckooFilter(cfg)
        f.insert_batch(urls)
    t("cuckoo insert 10k urls", cuckoo_ins)


if __name__ == "__main__":
    main()
