"""Shared sketch protocol: update / merge / estimate / serde.

Every sketch in this package is an associative, commutative monoid
state (north-rule requirement: merge associativity is property-tested
in tests/test_sketches.py). States are fixed-size-ish numpy arrays so
they serialize into BinaryType columns for Spark shuffle + checkpoint.

Serialization is numpy-savez based (no pickle — blobs cross the JVM
boundary and must be safe to load from untrusted shuffle files).
"""

from __future__ import annotations

import io
import json

import numpy as np

from ..hashing import kernels

U64 = np.uint64


def hash_column(values, strategy: str = "xx") -> np.ndarray:
    """Column of str/bytes → uint64 hashes via the vectorized kernels."""
    return kernels.hash64_batch(values, strategy)


def split_hash(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two 32-bit halves for double hashing (Kirsch-Mitzenmacher)."""
    return h & U64(0xFFFFFFFF), h >> U64(32)


def save_arrays(meta: dict, **arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, __meta__=np.frombuffer(json.dumps(meta).encode(), np.uint8), **arrays)
    return buf.getvalue()


def load_arrays(blob: bytes) -> tuple[dict, dict]:
    with np.load(io.BytesIO(blob), allow_pickle=False) as z:
        meta = json.loads(z["__meta__"].tobytes().decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    return meta, arrays


class MergeableSketch:
    """Interface contract (duck-typed; see subclasses)."""

    def update(self, values) -> None:  # pragma: no cover - interface
        raise NotImplementedError

    def merge(self, other):  # pragma: no cover - interface
        raise NotImplementedError

    def to_bytes(self) -> bytes:  # pragma: no cover - interface
        raise NotImplementedError
