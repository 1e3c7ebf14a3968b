"""Bit-parity mode with the reference's Spark flavor
(spark-bloom-filter/bloomfilters_util.py:79): `mmh3.hash(value, seed=i)
% m` for seeds 0..k-1, signed 32-bit murmur3 with Python floor-mod.

The `mmh3` package is not baked into this environment, so the path is
import-gated: with mmh3 installed, `hash_indexes_mmh3_udf` reproduces
the reference's bit patterns exactly (per-seed signed murmur3,
floor-mod); without it, callers get an actionable error and should use
the canonical JVM family (bloom/core.hash_indexes_col), which is the
engine default and statistically equivalent (SURVEY.md §1.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

try:
    import mmh3  # noqa: F401

    HAS_MMH3 = True
except ImportError:
    HAS_MMH3 = False


def hash_indexes_mmh3_udf(k: int):
    """pandas UDF (value: string, m: long) → array<long> of the
    reference's k hash indexes. Raises if mmh3 is unavailable."""
    if not HAS_MMH3:
        raise NotImplementedError(
            "bit-parity mode needs the 'mmh3' package (not baked into this "
            "environment); use the default Spark-murmur3 family instead"
        )
    import mmh3 as _mmh3

    @F.pandas_udf("array<long>")
    def udf(values: pd.Series, ms: pd.Series) -> pd.Series:
        out = []
        for v, m in zip(values, ms):
            m = int(m)
            # signed 32-bit murmur3; Python % gives floor-mod — both
            # exactly as bloomfilters_util.py:79
            out.append([_mmh3.hash(v, i) % m for i in range(k)])
        return pd.Series(out)

    return udf
