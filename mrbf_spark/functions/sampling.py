"""Corpus sampling / mixture operators (north-star extension): the
dataset-mixing step of a training-data pipeline — upweight scarce
sources by integer replication (deterministic, oracle-checked) and
downsample by per-stratum Bernoulli fractions (seeded, rows-only).

Generalizes the reference's P5 random split (util/split-dataset.py:36,
a single unweighted Bernoulli partition) to per-stratum control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table

# Sources upweighted 3x in the mixture (scarce-but-valuable strata).
UPWEIGHTED = ("src0", "src1", "src2")
UPWEIGHT = 3

SAMPLE_SEED = 42
SAMPLE_FRACTIONS = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.25}


def replicate_by_weight(df: DataFrame, weight_col) -> DataFrame:
    """One output row per input row per unit of integer weight —
    explode(array_repeat) keeps it a single codegen'd Generate, no
    join, no shuffle; at 100 TB the blow-up factor is exactly the
    mixture weight, applied streamingly per partition."""
    return df.withColumn(
        "__rep", F.explode(F.array_repeat(F.lit(1), weight_col.cast("int")))
    ).drop("__rep")


# --- deterministic mixture: upweight selected sources 3x; the oracle
# reproduces the replication with a LATERAL generate_series.
@register(
    "corpus_mixture",
    f"""
    SELECT source, COUNT(*) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT d.source, d.n_chars,
             UNNEST(range(CASE WHEN d.source IN {UPWEIGHTED}
                          THEN {UPWEIGHT} ELSE 1 END))
      FROM documents d)
    GROUP BY source
    """,
)
def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = F.when(F.col("source").isin(*UPWEIGHTED), F.lit(UPWEIGHT)).otherwise(F.lit(1))
    mixed = replicate_by_weight(d.select("source", "n_chars"), w)
    return mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# --- seeded stratified Bernoulli sample per language (sampleBy) —
# kept as the library form; row membership is RNG-partition-dependent,
# so its invariants (rate ≈ fraction, subset) are pinned in tests.
def stratified_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sampled = d.sampleBy("lang", SAMPLE_FRACTIONS, seed=SAMPLE_SEED)
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


# --- registered form (hash-matched, r2 VERDICT #4): systematic
# stratified sampling — keep a row iff doc_id % 100 < rate·100 for its
# stratum. Content-deterministic membership is reproducible from SQL
# (so the oracle is exact, not rows-only) and is what a 100 TB corpus
# pipeline wants anyway: the sample survives re-reads, repartitioning,
# and engine swaps, unlike partition-order-dependent Bernoulli RNG.
_PCT = {lang: int(frac * 100) for lang, frac in SAMPLE_FRACTIONS.items()}


@register(
    "stratified_sample",
    f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled
    FROM documents
    WHERE doc_id % 100 < CASE lang
        WHEN 'en' THEN {_PCT['en']} WHEN 'de' THEN {_PCT['de']}
        WHEN 'fr' THEN {_PCT['fr']} WHEN 'es' THEN {_PCT['es']}
        WHEN 'zh' THEN {_PCT['zh']} ELSE 0 END
    GROUP BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    thr = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in _PCT.items() for x in kv]), F.col("lang")
        ),
        F.lit(0),
    )
    sampled = d.filter(F.col("doc_id") % 100 < thr)
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
