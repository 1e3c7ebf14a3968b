"""The engine's query catalog: importing this module registers every
operator query; `queries()`/`oracle_sql()` feed __spark_entry__.py."""

from __future__ import annotations

from .registry import ORACLES, QUERIES, SCALE_ORACLES

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


def scale_oracle_sql():
    """Cost-aware second oracle formulations for the sf≥1 gate (see
    registry.SCALE_ORACLES); semantics-equal to oracle_sql() entries
    (test-pinned), never shipped to the driver's t2 gate."""
    return dict(SCALE_ORACLES)


# Per-entry part map (r8, VERDICT r7 next-round #8): the 50 catalog
# entries hide ~120 part-tagged ops; this map makes the containment
# machine-readable (it rides in bench_full.json so per-part scope
# growth is attributable round over round). Entries absent here emit
# no part/q tag column — they are single-op entries. The map is
# DECLARED (zero runtime cost for consumers) and VERIFIED: a test
# regenerates it from the live frames at smoke scale and asserts
# equality (tests/test_catalog_parts.py).
PARTS: dict[str, list[str]] = {
    "agg_join_filters": ["having", "outer_urgent"],
    "bloom_split_fp_report": ["fp_report", "split"],
    "bm25_topk": ["bm25", "dense", "rrf"],
    "bpe_suite": ["encode", "merge", "vocab"],
    "curate_corpus": ["census", "doc"],
    "data_ops_suite": [
        "diff_detail", "diff_summary", "merge", "profile", "rollup",
        "validate",
    ],
    "decontaminate": ["cut", "ngram", "semantic"],
    "dedup_simhash": ["degree", "hamming_census", "survivor"],
    "distinct_aggs": ["events", "lineitem"],
    "embedding_dedup_suite": [
        "kmeans", "mining", "pair", "semdedup", "textdedup",
    ],
    "grouped_ratio_metrics": ["halfup", "ratio"],
    "grouping_family": ["cube", "gsets", "pivot", "rollup"],
    "json_null_ops": ["json_agg", "null_sem"],
    "lm_suite": ["bucket", "dsir", "frozen", "qlr", "qlr_eval", "score"],
    "multimodal_decode": ["audio", "features", "frames"],
    "multimodal_meta_stats": ["meta", "stats"],
    "packing_suite": ["chunk", "contig", "layout"],
    "projection_union_scan": ["proj", "union"],
    "sampling_suite": [
        "consistent_k", "mixture", "shard", "stratified", "temp",
    ],
    "scalar_string_funcs": ["math", "string"],
    "semi_anti_join": ["anti", "semi"],
    "set_ops": ["bag", "except", "intersect"],
    "skew_ops": ["salted_agg", "salted_join"],
    "stats_aggregates": ["approx", "cms", "hh", "kmv", "median", "qtl"],
    "stream_windows": ["session", "sliding", "tumbling"],
    "subquery_family": ["correlated", "scalar"],
    "substring_dedup_spans": ["cut", "spans"],
    "temporal_joins": ["asof", "interval", "range", "trunc"],
    "topk_order_limit": ["order_limit", "topk"],
    "window_funcs": ["moving", "rank"],
    # tpch_suite tags its shapes in a `q` column, not `part`. q7/q21
    # need cross-nation / multi-supplier-F-order coincidences that the
    # sf0.001 smoke slice doesn't contain — they appear from sf0.01 up
    # (r9: q2/q8/q11 joined the smoke-live set when the region-name
    # constants were fixed and the q11 threshold became data-relative).
    "tpch_suite": [
        "q2", "q3", "q4", "q5", "q6", "q8", "q9", "q10", "q11", "q12",
        "q13", "q14", "q15", "q16", "q17", "q18", "q19", "q20", "q22",
    ],
}


def parts() -> dict[str, list[str]]:
    """{entry: [part, ...]} for every part-tagged catalog entry;
    single-op entries are reported with their own name as the sole
    part so the map covers the whole catalog."""
    out = {}
    for name in QUERIES:
        out[name] = list(PARTS.get(name, [name]))
    return out
