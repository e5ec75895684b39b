"""Cuckoo-filter configuration.

Semantics parity with /root/reference/options.go:18-41 (defaults and
validation matrix) and /root/reference/internal/filter/helpers.go:15-32
(``next_power_of_2``). Differences, by design (SURVEY.md §4.1):

* we add a deterministic ``seed`` (the reference seeds its per-filter
  PCG from global randomness, filter.go:47; we need reproducible,
  checkpoint-resumable builds),
* ``batch_size`` defaults to 1<<14 Arrow-batch rows rather than the
  reference's SIMD-era 32 (filter.go:184-186 / SURVEY.md §2.1 #13),
* SIMD toggles (WithSIMD/WithAVX2) are dropped — numpy vectorization
  is unconditional.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .errors import (
    InvalidBucketSizeError,
    InvalidCapacityError,
    InvalidFingerprintSizeError,
    InvalidHashStrategyError,
)

VALID_BUCKET_SIZES = (2, 4, 8, 16, 32, 64)
HASH_STRATEGIES = ("fnv", "crc32c", "xx")

_MAX_POW2 = 1 << 63


def next_power_of_2(n: int) -> int:
    """Round up to the next power of two, with the reference's edge cases.

    Golden cases (/root/reference/internal/filter/filter_test.go:426-459):
    0→1, 1→1, 3→4, 1000→1024, and anything above 2^62 caps at 2^63.
    """
    if n <= 1:
        return 1
    if n > (_MAX_POW2 >> 1):
        return _MAX_POW2
    return 1 << (n - 1).bit_length()


@dataclass(frozen=True)
class CuckooConfig:
    """Validated cuckoo-filter geometry + strategy.

    capacity: requested minimum item capacity; actual slot capacity is
        ``num_buckets * bucket_size`` where
        ``num_buckets = next_power_of_2(ceil(capacity / bucket_size))``
        (/root/reference/internal/filter/filter.go:28-31).
    """

    capacity: int
    bucket_size: int = 4
    fingerprint_bits: int = 8
    max_kicks: int = 500
    hash_strategy: str = "fnv"
    batch_size: int = 1 << 14
    seed: int = 42

    num_buckets: int = field(init=False)

    def __post_init__(self) -> None:
        if self.capacity <= 0:
            raise InvalidCapacityError()
        if self.bucket_size not in VALID_BUCKET_SIZES:
            raise InvalidBucketSizeError()
        if not (1 <= self.fingerprint_bits <= 16):
            raise InvalidFingerprintSizeError()
        if self.hash_strategy not in HASH_STRATEGIES:
            raise InvalidHashStrategyError(self.hash_strategy)
        nb = next_power_of_2(
            (self.capacity + self.bucket_size - 1) // self.bucket_size
        )
        object.__setattr__(self, "num_buckets", max(nb, 1))

    @property
    def slot_capacity(self) -> int:
        """Total fingerprint slots (reference Capacity(), filter.go:153-155)."""
        return self.num_buckets * self.bucket_size

    @property
    def memory_bytes(self) -> int:
        """Published memory formula (/root/reference/README.md:152-162)."""
        return self.num_buckets * self.bucket_size * 2  # uint16 storage

    def geometry_key(self) -> tuple:
        """Fields that must agree for two filters to be mergeable."""
        return (
            self.num_buckets,
            self.bucket_size,
            self.fingerprint_bits,
            self.hash_strategy,
        )
