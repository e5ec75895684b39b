"""Column-level sketch UDFs: broadcast membership, frequency, hashing.

Pattern: the merged sketch blob is broadcast once; each executor
deserializes it once (process-level cache) and every Arrow batch is
answered by one vectorized numpy call — the distributed analogue of
"query a built filter" (SURVEY.md §2.2 joins row).

The exact-oracle equivalents (used by the driver correctness gate):
membership ↔ left-semi join, post-delete membership ↔ left-anti join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, LongType

from ..serde import loads

_DESER_CACHE: dict[int, object] = {}


def _sketch_from(bc) -> object:
    key = id(bc)
    sk = _DESER_CACHE.get(key)
    if sk is None:
        sk = loads(bc.value)
        _DESER_CACHE[key] = sk
    return sk


def membership_udf(spark, sketch_or_blob):
    """pandas UDF col→bool: cuckoo/bloom membership (no false negatives)."""
    blob = sketch_or_blob if isinstance(sketch_or_blob, (bytes, bytearray)) else sketch_or_blob.to_bytes()
    bc = spark.sparkContext.broadcast(bytes(blob))

    @F.pandas_udf(BooleanType())
    def contains(col: pd.Series) -> pd.Series:
        sk = _sketch_from(bc)
        fn = getattr(sk, "lookup_batch", None) or sk.contains
        return pd.Series(fn(col))

    return contains


def cms_estimate_udf(spark, sketch_or_blob):
    """pandas UDF col→long: count-min frequency estimate (never under)."""
    blob = sketch_or_blob if isinstance(sketch_or_blob, (bytes, bytearray)) else sketch_or_blob.to_bytes()
    bc = spark.sparkContext.broadcast(bytes(blob))

    @F.pandas_udf(LongType())
    def estimate(col: pd.Series) -> pd.Series:
        sk = _sketch_from(bc)
        return pd.Series(sk.estimate(col))

    return estimate


def hash_indices_udf(num_buckets: int, strategy: str = "fnv", bits: int = 8):
    """Debug/test surface: col → struct(i1, i2, fp) via the kernels
    (the reference's GetIndices exposed as a column function)."""
    from ..hashing import kernels

    @F.pandas_udf("i1 long, i2 long, fp int")
    def indices(col: pd.Series) -> pd.DataFrame:
        i1, i2, fp = kernels.indices_batch(col, num_buckets, strategy, bits)
        return pd.DataFrame(
            {"i1": i1.astype("int64"), "i2": i2.astype("int64"), "fp": fp.astype("int32")}
        )

    return indices
