"""Config validation matrix + next_power_of_2 goldens.

Mirrors /root/reference options.go:31-41 validation and
internal/filter/filter_test.go:426-483 geometry goldens (FIXTURES.md §3).
"""

import pytest

from sketchlib import CuckooConfig, next_power_of_2
from sketchlib.errors import (
    InvalidBucketSizeError,
    InvalidCapacityError,
    InvalidFingerprintSizeError,
    InvalidHashStrategyError,
)

NP2_GOLDENS = [
    (0, 1),
    (1, 1),
    (3, 4),
    (5, 8),
    (9, 16),
    (17, 32),
    (1000, 1024),
    ((1 << 62) + 1, 1 << 63),
    ((1 << 63) + 1, 1 << 63),
    ((1 << 64) - 1, 1 << 63),
]


@pytest.mark.parametrize("n,expected", NP2_GOLDENS)
def test_next_power_of_2_goldens(n, expected):
    assert next_power_of_2(n) == expected


def test_default_options():
    # defaults mirror options.go:18-28 (except batch_size, documented divergence)
    cfg = CuckooConfig(capacity=1000)
    assert cfg.bucket_size == 4
    assert cfg.fingerprint_bits == 8
    assert cfg.max_kicks == 500
    assert cfg.hash_strategy == "fnv"


@pytest.mark.parametrize("cap,b,expected_buckets", [(1000, 4, 256), (1000, 8, 128)])
def test_geometry(cap, b, expected_buckets):
    cfg = CuckooConfig(capacity=cap, bucket_size=b)
    assert cfg.num_buckets == expected_buckets
    assert cfg.slot_capacity == expected_buckets * b
    # power of 2 is load-bearing for the XOR alt-index trick
    assert cfg.num_buckets & (cfg.num_buckets - 1) == 0


@pytest.mark.parametrize("b", [2, 4, 8, 16, 32, 64])
def test_valid_bucket_sizes(b):
    assert CuckooConfig(capacity=100, bucket_size=b).bucket_size == b


@pytest.mark.parametrize("bits", [1, 2, 4, 8, 12, 16])
def test_valid_fingerprint_bits(bits):
    assert CuckooConfig(capacity=100, fingerprint_bits=bits).fingerprint_bits == bits


def test_invalid_capacity():
    with pytest.raises(InvalidCapacityError):
        CuckooConfig(capacity=0)
    with pytest.raises(InvalidCapacityError):
        CuckooConfig(capacity=-5)


def test_invalid_bucket_size():
    with pytest.raises(InvalidBucketSizeError):
        CuckooConfig(capacity=100, bucket_size=3)


@pytest.mark.parametrize("bits", [0, 17])
def test_invalid_fingerprint_bits(bits):
    with pytest.raises(InvalidFingerprintSizeError):
        CuckooConfig(capacity=100, fingerprint_bits=bits)


def test_invalid_strategy():
    with pytest.raises(InvalidHashStrategyError):
        CuckooConfig(capacity=100, hash_strategy="md5")


def test_memory_formula():
    # README.md:152-162: numBuckets * bucketSize * 2 bytes (uint16 storage)
    cfg = CuckooConfig(capacity=10000, bucket_size=4, fingerprint_bits=8)
    assert cfg.memory_bytes == cfg.num_buckets * 4 * 2
