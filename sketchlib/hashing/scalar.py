"""Pure-Python scalar reference hashes.

These are the *semantic oracles* for the vectorized numpy kernels in
``sketchlib.hashing.kernels`` — the analogue of the reference repo's
scalar Go paths, which define semantics there too (SURVEY.md §4.1).
They are deliberately slow and simple; production code never calls
them outside tests.

Algorithms (all verified against the reference's own test vectors):

* FNV-1a 64-bit — canonical (/root/reference/internal/hash/fnv/hash_fnv.go:64-74,
  oracle'd against Go stdlib in hash_fnv_test.go:56-83).
* CRC32C (Castagnoli, reflected, CRC-32/ISCSI parameters) —
  /root/reference/internal/hash/crc32/crc32.go:67-81 uses Go stdlib
  crc32.Checksum with the Castagnoli table.
* "xx" — the reference's *simplified* XXHash64 variant
  (/root/reference/internal/hash/xxhash/xxhash_safe.go:4-37). This is
  NOT canonical XXH64 (no 4-lane state, different tail mixing); do not
  substitute a real xxhash library.

Index derivation (per strategy ``get_indices``/``get_alt_index``):
fp = low ``bits`` of the hash, 0 mapped to 1
(xxhash.go:177-184 and twins); i1 = hash mod num_buckets; i2 differs
per strategy (xxhash.go:107-119, hash_fnv.go:109-120, crc32.go:115-129).
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1

FNV_OFFSET64 = 0xCBF29CE484222325
FNV_PRIME64 = 0x100000001B3

# xx-variant primes (shared with canonical XXH64 constants,
# /root/reference/internal/hash/xxhash/xxhash.go:28-34)
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261

CRC32C_POLY_REFLECTED = 0x82F63B78


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def fnv1a64(data: bytes) -> int:
    h = FNV_OFFSET64
    for b in data:
        h = ((h ^ b) * FNV_PRIME64) & MASK64
    return h


def _make_crc32c_table() -> list[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ CRC32C_POLY_REFLECTED if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def xxvariant64(data: bytes) -> int:
    """The reference's simplified XXH64 variant (xxhash_safe.go:4-37)."""
    n = len(data)
    h = (P5 + n) & MASK64
    pos = 0
    while n - pos >= 8:
        k = int.from_bytes(data[pos : pos + 8], "little")
        k = (k * P2) & MASK64
        k = _rotl64(k, 31)
        k = (k * P1) & MASK64
        h ^= k
        h = (_rotl64(h, 27) * P1 + P4) & MASK64
        pos += 8
    while pos < n:
        h ^= (data[pos] * P5) & MASK64
        h = (_rotl64(h, 11) * P1) & MASK64
        pos += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    return h


def fingerprint(hash_val: int, bits: int) -> int:
    """Low ``bits`` of the hash; 0 maps to 1 (empty-slot sentinel).

    Matches the reference's extraction (xxhash.go:177-184) given the
    caller supplies the fingerprint *source* bits — see ``fp_source``.
    """
    fp = hash_val & ((1 << bits) - 1)
    return fp if fp != 0 else 1


def fp_source(hash_val: int, strategy: str) -> int:
    """Bits the fingerprint is extracted from.

    DELIBERATE DIVERGENCE from the reference (documented, load-bearing):
    the reference takes both ``fp`` (low ``bits`` of h, xxhash.go:178)
    and ``i1`` (h mod 2^k buckets, xxhash.go:67) from the SAME low bits,
    which makes fp a deterministic function of i1 whenever
    ``fingerprint_bits <= log2(num_buckets)`` — every probe whose
    primary bucket is non-empty then false-positives, and measured FPR
    collapses to ~bucket-occupancy (≈73% at load 0.30 in our
    repro; the reference's own examples/custom_config/main.go:52-64
    harness would print its "⚠ higher than expected" branch). The
    north-rule gate is FPR ≤ 2b/2^f (Fan et al. 2014), which requires
    the fingerprint to be independent of the primary index, so we take
    fp from the TOP 16 bits (64-bit strategies) / top 16 of 32 (crc32c)
    while i1 keeps the low bits. Self-inverse alt-index rules are
    unchanged. crc32c therefore supports ≤ 2^16 buckets before fp/i1
    bits overlap again — acceptable for an optional strategy.
    """
    return hash_val >> (16 if strategy == "crc32c" else 48)


def _fp_bytes(fp: int, bits: int) -> bytes:
    """1 LE byte when bits<=8 else 2 (hash_fnv.go:112-117, crc32.go:119-125)."""
    return bytes([fp & 0xFF]) if bits <= 8 else bytes([fp & 0xFF, fp >> 8])


def alt_index(index: int, fp: int, num_buckets: int, strategy: str, bits: int) -> int:
    """Strategy-specific self-inverse alternate index (SURVEY.md §2.1 #15)."""
    if strategy == "xx":
        h = fp * 0x5BD1E995
        if num_buckets > 1:
            h |= 1
        return (index ^ h) % num_buckets
    if strategy == "fnv":
        return (index ^ fnv1a64(_fp_bytes(fp, bits))) % num_buckets
    if strategy == "crc32c":
        return (index ^ crc32c(_fp_bytes(fp, bits))) % num_buckets
    raise ValueError(strategy)


def hash64(data: bytes, strategy: str) -> int:
    if strategy == "xx":
        return xxvariant64(data)
    if strategy == "fnv":
        return fnv1a64(data)
    if strategy == "crc32c":
        return crc32c(data)  # 32-bit value, used as-is (crc32.go:69-75)
    raise ValueError(strategy)


def get_indices(
    data: bytes, num_buckets: int, strategy: str, bits: int
) -> tuple[int, int, int]:
    """(i1, i2, fp) triple — the scalar contract every kernel must match."""
    h = hash64(data, strategy)
    fp = fingerprint(fp_source(h, strategy), bits)
    i1 = h % num_buckets
    i2 = alt_index(i1, fp, num_buckets, strategy, bits)
    return i1, i2, fp
