"""Benchmark decontamination (north-star extension): flag training
documents that share word n-grams with a held-out evaluation set —
the standard contamination check an LLM data pipeline runs before
training (n-gram overlap, as popularized by the GPT-3 and PaLM
appendix procedures; public methodology).

This is the engine's Bloom machinery (SURVEY.md §2, the reference's
build→probe pipeline, spark-bloom-filter/bloomfilters_builder.py:29
semantics) applied to its flagship use case at 100 TB scale:

  1. Extract distinct word n-grams per eval document (pure JVM
     expressions: split → transform(sequence) → explode — no Python
     in the row path).
  2. Build ONE Bloom filter over all eval n-grams
     (`build_bloom_filters`, single key) — eval sets are tiny
     (thousands of docs) relative to the corpus, so the filter is
     megabytes and broadcastable.
  3. Probe every corpus n-gram against the broadcast filter
     (codegen'd hash + bit-test, zero shuffle of the corpus).
  4. Exact-verify the ~p-sized survivor set with a broadcast
     semi-join against the true eval n-gram set, removing false
     positives — so the final result is EXACTLY the n-gram
     intersection and hash-family-independent (same prune+verify
     shape as `bloom_semijoin_prune`), which is what makes the
     query DuckDB-oracle-checkable despite the Bloom stage.
  5. Per-document contamination rate + threshold flag.

Scale shape: the corpus (the 100 TB side) is scanned once, never
shuffled until the survivor set (≈ p × corpus n-grams + true hits);
the only broadcast is eval-set-sized. A hot document cannot skew
anything: grams are distinct-per-doc and the aggregations key on
doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..bloom.core import build_bloom_filters, num_hashes, probe_bloom_filters
from ..registry import register, scoped_cache
from ..tables import load_table

NGRAM_N = 3
# Deterministic eval split: doc_id % EVAL_MOD == 0 stands in for "the
# benchmark set" (TESTDATA has no separate eval table); any DataFrame
# of (doc_id, text) works for `eval_docs` in the library API.
EVAL_MOD = 97
FLAG_THRESHOLD = 0.05
P = 0.01  # bloom FP target: 1% of surviving grams pay the exact join


def ngrams_col(tokens: Column, n: int = NGRAM_N) -> Column:
    """array<string> tokens → array<string> of space-joined word
    n-grams. Guarded: < n tokens ⇒ empty array (F.sequence would
    descend on a negative stop and fabricate grams)."""
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    make = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)))
    return F.when(F.size(tokens) >= n, make).otherwise(
        F.array_repeat(F.lit(""), 0)
    )


def doc_ngrams(docs: DataFrame, n: int = NGRAM_N) -> DataFrame:
    """(doc_id, text) → distinct (doc_id, g) word-n-gram pairs.

    Distinctness is per document, so it's computed INSIDE the row
    (array_distinct before explode) — zero shuffle, versus a
    .distinct() over the exploded corpus grams which would shuffle
    the whole 100 TB side."""
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id", F.explode(F.array_distinct(ngrams_col(toks, n))).alias("g")
    )


def decontaminate_docs(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = NGRAM_N,
    p: float = P,
    threshold: float = FLAG_THRESHOLD,
) -> DataFrame:
    """Library API: per-corpus-document eval-overlap report.

    Returns (doc_id, n_grams, n_contaminated, contamination_rate,
    flagged) — exact n-gram intersection counts (bloom prune + exact
    verify; FP-free by construction).
    """
    corpus_grams = doc_ngrams(corpus, n)
    eval_grams = doc_ngrams(eval_docs, n).select("g").distinct()

    # scoped_cache, not .cache(): released when the next catalog query
    # starts instead of pinning executor storage for the session
    # (the r3 ADVICE leak pattern, fixed here as in bloom_queries).
    filters = scoped_cache(
        build_bloom_filters(eval_grams.withColumn("__g", F.lit("eval")), "__g", "g", p)
    )
    survivors = probe_bloom_filters(
        corpus_grams.withColumn("__g", F.lit("eval")),
        "__g",
        "g",
        filters,
        k=num_hashes(p),
        broadcast=True,
    ).filter(F.col("bloom_hit") == 1)
    # Exact verify: broadcast semi-join against the true eval gram set
    # removes bloom false positives; only the survivor set (not the
    # corpus) reaches this join.
    hits = survivors.join(F.broadcast(eval_grams), "g", "left_semi")

    # Per-doc gram totals come from the array length at scan time —
    # no explode, no shuffle (docs with zero grams are excluded, same
    # as the exploded-groupBy form they replace). The exclusion filter
    # is `tokens >= n` (⟺ n_grams > 0) on purpose: filtering on
    # `n_grams > 0` directly would make Catalyst push the whole
    # gram-transform expression into the scan filter and evaluate it a
    # second time in the projection.
    toks = F.split(F.col("text"), " ")
    totals = corpus.filter(F.size(toks) >= n).select(
        "doc_id",
        F.size(F.array_distinct(ngrams_col(toks, n))).cast("long").alias("n_grams"),
    )
    contaminated = hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    rate = F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double")
    return (
        totals.join(contaminated, "doc_id", "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0).cast("long")))
        .withColumn("contamination_rate", rate)
        .withColumn("flagged", (rate >= threshold).cast("int"))
    )


_GRAMS_CTE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[u.i + 1 : u.i + {n}], ' ') AS g
  FROM toks, LATERAL UNNEST(range(greatest(len(t) - {n1}, 0))) AS u(i)
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % {mod} = 0),
corpus AS (SELECT doc_id, g FROM grams WHERE doc_id % {mod} <> 0),
tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_contaminated
  FROM corpus c
  WHERE EXISTS (SELECT 1 FROM ev WHERE ev.g = c.g)
  GROUP BY c.doc_id)
""".format(n=NGRAM_N, n1=NGRAM_N - 1, mod=EVAL_MOD)


@register(
    "decontaminate",
    _GRAMS_CTE
    + f"""
SELECT t.doc_id, t.n_grams,
       COALESCE(h.n_contaminated, CAST(0 AS BIGINT)) AS n_contaminated,
       CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
         AS contamination_rate,
       CAST(CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
              / CAST(t.n_grams AS DOUBLE) >= {FLAG_THRESHOLD} AS INT) AS flagged
FROM tot t LEFT JOIN hits h USING (doc_id)
""",
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: documents with doc_id % EVAL_MOD == 0 play the
    eval set; the rest are the training corpus."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = d.filter(F.col("doc_id") % EVAL_MOD == 0)
    corpus = d.filter(F.col("doc_id") % EVAL_MOD != 0)
    return decontaminate_docs(corpus, eval_docs)
