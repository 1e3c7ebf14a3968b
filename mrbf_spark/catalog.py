"""The engine's query catalog: importing this module registers every
operator query; `queries()`/`oracle_sql()` feed __spark_entry__.py."""

from __future__ import annotations

from .registry import ORACLES, QUERIES

# Import for registration side effects. ORDER MATTERS: the driver's
# CORRECTNESS run walks registration order (and covered only the first
# 50 in r1), so the north-star LLM-pipeline families register FIRST —
# defensive even now that the whole catalog is ≤ 48 entries.
from .functions import text as _text  # noqa: F401
from .functions import quality_rules as _quality_rules  # noqa: F401
from .functions import dedup as _dedup  # noqa: F401
from .functions import curate as _curate  # noqa: F401
from .functions import bpe as _bpe  # noqa: F401
from .functions import substring_dedup as _substring_dedup  # noqa: F401
from .functions import decontam as _decontam  # noqa: F401
from .functions import lm as _lm  # noqa: F401
from .functions import packing as _packing  # noqa: F401
from .functions import retrieval as _retrieval  # noqa: F401
from .functions import data_ops as _data_ops  # noqa: F401
from .functions import similarity as _similarity  # noqa: F401
from .functions import multimodal as _multimodal  # noqa: F401
from .functions import sampling as _sampling  # noqa: F401
from .streaming import windows as _windows  # noqa: F401
from .operators import sinks as _sinks  # noqa: F401
from .operators import skew as _skew  # noqa: F401
from .operators import bloom_queries as _bloom_queries  # noqa: F401
from .operators import relational as _relational  # noqa: F401


def queries():
    return dict(QUERIES)


def oracle_sql():
    return dict(ORACLES)
