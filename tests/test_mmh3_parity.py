"""Bit-parity with the reference's hash family
(spark-bloom-filter/bloomfilters_util.py:79: `mmh3.hash(v, seed=i) % m`).

The vendored pure-Python murmur3_32 is pinned to the published SMHasher
test vectors, so parity holds in this environment even without the mmh3
C extension; when mmh3 IS installed, the cross-check test also runs.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from mrbf_spark.bloom.mmh3_parity import (
    HAS_MMH3,
    hash_indexes_mmh3_udf,
    murmur3_32,
    reference_indexes,
)

# Published MurmurHash3 x86_32 vectors (SMHasher / Wikipedia), as the
# signed 32-bit ints mmh3.hash returns.
VECTORS = [
    (b"", 0, 0x00000000),
    (b"", 1, 0x514E28B7),
    (b"", 0xFFFFFFFF, 0x81F16F39 - 0x100000000),
    (b"hello", 0, 0x248BFA47),
    (b"The quick brown fox jumps over the lazy dog", 0, 0x2E4FF723),
]


def test_murmur3_32_published_vectors():
    for data, seed, expect in VECTORS:
        assert murmur3_32(data, seed) == expect, (data, seed)


def test_murmur3_32_all_tail_lengths():
    # exercise every tail branch (len % 4 in 0..3) + a multi-block key
    for s in ["", "a", "ab", "abc", "abcd", "abcde", "abcdefghij" * 5]:
        out = murmur3_32(s, 7)
        assert -(2**31) <= out < 2**31


@pytest.mark.skipif(not HAS_MMH3, reason="mmh3 C extension not installed")
def test_murmur3_32_matches_mmh3_extension():
    import mmh3

    for s in ["", "a", "ab", "abc", "abcd", "order-12345", "ключ", "🙂x"]:
        for seed in range(8):
            assert murmur3_32(s, seed) == mmh3.hash(s, seed)


def test_reference_indexes_floor_mod_semantics():
    # signed hash + Python floor-mod → indexes always in [0, m)
    for v in ["foo", "bar", "order-999", ""]:
        idx = reference_indexes(v, k=7, m=1009)
        assert len(idx) == 7
        assert all(0 <= i < 1009 for i in idx)
    # a key whose hash is negative must still floor-mod into range
    neg = next(v for v in (f"key{i}" for i in range(100)) if murmur3_32(v, 0) < 0)
    assert 0 <= murmur3_32(neg, 0) % 1009 < 1009


def test_udf_index_parity_with_reference(spark):
    """The Spark-side UDF reproduces bloomfilters_util.py:79 exactly."""
    k, m = 5, 4999
    keys = [f"order-{i}" for i in range(200)] + ["", "🙂", "ключ"]
    df = spark.createDataFrame(
        [(v, m) for v in keys], "value string, m long"
    ).withColumn("idx", hash_indexes_mmh3_udf(k)(F.col("value"), F.col("m")))
    got = {r["value"]: r["idx"] for r in df.collect()}
    for v in keys:
        assert got[v] == reference_indexes(v, k, m), v
