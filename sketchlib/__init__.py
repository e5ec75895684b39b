"""sketchlib — a PySpark-native distributed sketch / approximate-aggregation library.

From-scratch re-expression of the capabilities of shaia/SIMDCuckooFilter
(reference at /root/reference, read-only) as an idiomatic Spark library:
mergeable cuckoo filters plus Bloom / HLL / count-min / KLL / t-digest
sketches, built per-partition with Arrow-vectorized numpy kernels and
merged associatively (SURVEY.md is the blueprint).
"""

from .config import CuckooConfig, next_power_of_2
from .cuckoo import CuckooFilter
from .version import __version__

__all__ = ["CuckooConfig", "CuckooFilter", "next_power_of_2", "__version__"]
