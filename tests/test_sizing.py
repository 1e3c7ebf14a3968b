"""Exact-math unit tests for the Bloom geometry — vectors pinned to
the reference's formulas (bloomfilters_util.py:15,27; FIXTURES.md A3)."""

import math

import pytest

from mrbf_spark.bloom.sizing import num_bits, num_hashes


@pytest.mark.parametrize("p,k", [(0.2, 3), (0.1, 4), (0.05, 5), (0.01, 7)])
def test_num_hashes_reference_vectors(p, k):
    assert num_hashes(p) == k


def test_num_bits_reference_vector():
    assert num_bits(1000, 0.01) == 9586


def test_num_bits_formula():
    for n in (1, 10, 12345):
        for p in (0.3, 0.01, 0.001):
            assert num_bits(n, p) == math.ceil(-n * math.log(p) / math.log(2) ** 2)


@pytest.mark.parametrize("bad", [0.0, 1.0, -0.5, 2.0])
def test_num_hashes_rejects_bad_p(bad):
    with pytest.raises(ValueError):
        num_hashes(bad)


def test_num_bits_rejects_bad_n():
    with pytest.raises(ValueError):
        num_bits(0, 0.01)
