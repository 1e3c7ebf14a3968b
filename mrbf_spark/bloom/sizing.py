"""Bloom filter geometry — the standard sizing formulas.

Same math as the reference (spark-bloom-filter/bloomfilters_util.py:15,27
and hadoop .../util/BloomFilterUtils.java:111-133): both implementations
use identical formulas, reproduced here verbatim in Python.
"""

from __future__ import annotations

import math


def num_hashes(p: float) -> int:
    """k = ceil(-ln(p) / ln(2)).  p=0.2→3, p=0.1→4, p=0.05→5, p=0.01→7."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"false-positive probability must be in (0,1), got {p}")
    return math.ceil(-math.log(p) / math.log(2))


def num_bits(n: int, p: float) -> int:
    """m = ceil(-n·ln(p) / ln(2)²).  n=1000,p=0.01 → 9586."""
    if n <= 0:
        raise ValueError(f"cardinality must be positive, got {n}")
    if not 0.0 < p < 1.0:
        raise ValueError(f"false-positive probability must be in (0,1), got {p}")
    return math.ceil(-n * math.log(p) / (math.log(2) ** 2))
