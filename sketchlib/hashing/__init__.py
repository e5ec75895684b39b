"""Hash subsystem: scalar Python references + vectorized numpy kernels.

Three strategies, matching the reference's factory
(/root/reference/internal/hash/factory.go:13-26):

* ``"fnv"``    — canonical FNV-1a 64 (reference default, options.go:23)
* ``"crc32c"`` — CRC32C / Castagnoli
* ``"xx"``     — the reference's simplified XXHash64 variant
                 (xxhash_safe.go:4-37; NOT canonical XXH64)
"""

from .kernels import (
    alt_index_batch,
    fingerprint_batch,
    hash64_batch,
    indices_batch,
)
from .scalar import alt_index, fingerprint, get_indices, hash64

__all__ = [
    "alt_index",
    "alt_index_batch",
    "fingerprint",
    "fingerprint_batch",
    "get_indices",
    "hash64",
    "hash64_batch",
    "indices_batch",
]
