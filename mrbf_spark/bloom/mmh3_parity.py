"""Bit-parity mode with the reference's Spark flavor
(spark-bloom-filter/bloomfilters_util.py:79): `mmh3.hash(value, seed=i)
% m` for seeds 0..k-1, signed 32-bit murmur3 with Python floor-mod.

The `mmh3` C extension is not baked into this environment, so the UDF
falls back to a vendored pure-Python MurmurHash3 x86_32 (public
algorithm, Austin Appleby, public domain) that is bit-identical to
`mmh3.hash` — pinned by the published SMHasher test vectors in
tests/test_mmh3_parity.py. With mmh3 installed the C extension is used
for speed; either way `hash_indexes_mmh3_udf` reproduces the
reference's bit patterns exactly (per-seed signed murmur3, floor-mod).
The engine default remains the JVM family (bloom/core.hash_indexes_col)
— statistically equivalent and codegen-fast (SURVEY.md §1.4); this
module exists so exact cross-engine parity is testable and available.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

try:
    import mmh3  # noqa: F401

    HAS_MMH3 = True
except ImportError:
    HAS_MMH3 = False

_MASK = 0xFFFFFFFF


def murmur3_32(data: bytes | str, seed: int = 0) -> int:
    """Pure-Python MurmurHash3 x86_32, signed output — bit-identical to
    `mmh3.hash(data, seed)` (strings are UTF-8 encoded, like mmh3)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _MASK
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * c2) & _MASK
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK
        h = (h * 5 + 0xE6546B64) & _MASK
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * c2) & _MASK
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def reference_indexes(value: str, k: int, m: int) -> list[int]:
    """The reference's k bloom indexes for one key: signed murmur3 per
    seed 0..k-1 with Python floor-mod (bloomfilters_util.py:79)."""
    hasher = mmh3.hash if HAS_MMH3 else murmur3_32
    return [hasher(value, i) % m for i in range(k)]


def hash_indexes_mmh3_udf(k: int):
    """pandas UDF (value: string, m: long) → array<long> of the
    reference's k hash indexes. Uses the mmh3 C extension when present,
    else the vendored pure-Python murmur3_32 (bit-identical)."""
    hasher = mmh3.hash if HAS_MMH3 else murmur3_32

    @F.pandas_udf("array<long>")
    def udf(values: pd.Series, ms: pd.Series) -> pd.Series:
        out = []
        for v, m in zip(values, ms):
            m = int(m)
            # signed 32-bit murmur3; Python % gives floor-mod — both
            # exactly as bloomfilters_util.py:79
            out.append([hasher(v, i) % m for i in range(k)])
        return pd.Series(out)

    return udf
