"""Deduplication operators over `documents` (north-star extension):
exact, MinHash+LSH, SimHash, and n-gram Jaccard — the staples of a
training-data pipeline, each designed so the candidate-generation step
is a bounded equi-join (never an O(n²) cross join) at 100 TB.

Exact dedup is fully oracle-checked. The hash-family-dependent ops
(minhash/simhash) are rows-only, but their *verification* stage
computes exact Jaccard on the candidates, so correctness reduces to
set algebra that tests pin down separately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import load_table
from .text import FINGERPRINT_SQL, fingerprint_col

# ---------------------------------------------------------------- exact


# Exact dedup: group by normalized-text fingerprint, keep min doc_id.
# The groupBy is a hash shuffle on the digest — uniform keys, no skew;
# at 100 TB this is the cheapest possible full-corpus dedup.
@register(
    "dedup_exact",
    f"""
    SELECT {FINGERPRINT_SQL.format(e='text')} AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint_col(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# Survivor set (the actual dedup output a pipeline consumes).
# Unregistered builder: the registered `dedup_exact` already carries
# the survivor ids as keep_id (this is its doc_id projection), and
# `curation_pipeline` exercises the semi-join consumption path.
def dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(fingerprint_col(F.col("text")).alias("fingerprint"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


# ------------------------------------------------------------- shingles

# Word n-gram shingles as a JVM expression: tokens → sliding windows.
def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>), pure SQL exprs."""
    tokens = F.split(F.lower(text), " ")
    return F.array_distinct(
        F.transform(
            # start positions 0..T-n inclusive (sequence() is inclusive;
            # greatest(...,0) keeps docs shorter than n as one short shingle)
            F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        )
    )


def jaccard_col(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------- minhash/LSH

MINHASH_PERMS = 64
LSH_BANDS = 16  # 16 bands × 4 rows: catches jaccard ≳ 0.5 w.h.p.


def shingle_hashes_col(token_hashes: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as 64-bit hashes (array<long>):
    combine n consecutive token hashes per position — O(tokens)
    fixed-width integer work instead of building every shingle
    *string* (slice+concat_ws allocates ~n× the document text again).
    Collision odds at 64 bits are negligible next to minhash noise:
    the combiner is xxhash64 over the n token hashes (a true 64-bit
    space — F.hash is 32-bit murmur3, whose ~2^32 space would collide
    thousands of times across a 50k-doc corpus's ~5M shingles and
    slightly inflate estimated Jaccard in the verify stage).

    `token_hashes` MUST be a materialized column (array<long> of
    per-token hashes), not an inline expression: it is referenced n+1
    times here, and inlining it re-evaluates the token pass per
    reference (and per array element inside the lambda — O(T²)/doc,
    measured 15× slower at sf0.1). Use shingled_docs() which stages
    the two projections so CollapseProject keeps them apart."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(token_hashes) - n, F.lit(0))),
            lambda i: F.xxhash64(
                *[F.element_at(token_hashes, i + j + 1) for j in range(n)]
            ),
        )
    )


def shingled_docs(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingles: array<long>) — tokenize+hash in one
    projection, shingle-combine in a second (see shingle_hashes_col)."""
    return docs.select(
        "doc_id",
        F.transform(F.split(F.lower(F.col("text")), " "), lambda t: F.xxhash64(t)).alias(
            "__th"
        ),
    ).select("doc_id", shingle_hashes_col(F.col("__th"), n).alias("shingles"))


def minhash_signatures(docs_shingled: DataFrame, num_perm: int = MINHASH_PERMS) -> DataFrame:
    """MinHash signatures as 64 columns h0..h{63}: explode shingles
    once, take per-permutation mins with plain aggregates.

    This shape matters for both engines and scale: the per-row
    alternative (array_min over transform, ×64) materializes 64
    arrays per document; the explode+agg form hashes each shingle 64
    ways in one codegen'd projection and the mins partial-aggregate
    map-side — shuffle is 64×8 B per (doc, partition), not the
    shingle sets. Works for string or hashed-long shingle arrays
    (murmur3 has a fast fixed-width path for longs).

    NB: the per-perm hash must come from a plain expression, never a
    default-arg lambda in transform() — PySpark treats `lambda s,
    i=i:` as the two-parameter (element, index) form and binds i to
    the array index column (silent wrong results).

    explode_outer, NOT explode: plain explode makes the optimizer
    infer a `size(shingles) > 0` filter (InferFiltersFromGenerate)
    and push it below the shingle projections, INLINING the whole
    shingle expression into the filter — the corpus pays the token
    pass twice (plan-verified; this filter dominated the stage at
    sf0.1). Our shingle arrays are never empty by construction
    (greatest(...,0) keeps one shingle even for short docs), so outer
    explode is semantically identical and infers nothing.
    """
    ex = docs_shingled.select("doc_id", F.explode_outer("shingles").alias("sh"))
    return ex.groupBy("doc_id").agg(
        *[F.min(F.hash("sh", F.lit(i))).alias(f"h{i}") for i in range(num_perm)]
    )


def _banded(sigs: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """(doc_id, band_id, band_hash) bucket keys from h0..h63 columns;
    rows/band = num_perm/bands."""
    rows_per_band = MINHASH_PERMS // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.hash(
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select("doc_id", F.explode(band_cols).alias("band")).select(
        "doc_id", "band.band_id", "band.band_hash"
    )


def minhash_candidates(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → signature → band →
    bucket self-join → exact-Jaccard verify. The self-join is on
    (band_id, band_hash) — a bounded equi-join: only docs sharing a
    bucket ever pair, so no cross join at any scale.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥
    threshold, deduped across bands.

    Plan shape: shingles are hashed longs (shingle_hashes_col), and the
    signature table — 64 longs per doc, ~0.1% of corpus bytes — is
    cached before the bucket self-join. Without the cache the self-join
    broadcasts one alias and re-executes the whole explode+min-agg
    subplan for BOTH sides (no ReusedExchange across a broadcast);
    measured 2× the signature cost at sf0.1, and at 100 TB it would be
    two extra corpus scans. The exact-Jaccard verify re-scans documents
    twice, but each join's other side is the tiny candidate-pair set
    (broadcast), so no corpus shuffle anywhere.
    """
    shingled = shingled_docs(docs)
    banded = _banded(minhash_signatures(shingled).cache())
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_a = shingled.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sh_b = shingled.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    return (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", jaccard_col(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


@register("dedup_minhash_lsh")  # rows-only: hash-family-dependent
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates verified by exact word-3-gram Jaccard, at
    the LOWER 0.2 threshold: the output carries the exact jaccard per
    pair, so it subsumes both the r1 `dedup_minhash_lsh` (≥ 0.5 —
    filter the jaccard column) and the r1 `dedup_ngram_jaccard`
    precision pass (≥ 0.2) in one registration."""
    return minhash_candidates(load_table(spark, sf_dir, "documents"), threshold=0.2)


# -------------------------------------------------------------- simhash


def simhash_signatures(docs: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, simhash) — 64-bit Charikar SimHash: per bit, the sign
    of the sum of ±1 across token hashes.

    Shape: explode tokens → one xxhash64 per token → 64 conditional-sum
    aggregates → fold signs into one long. The per-row alternative (64
    F.aggregate passes over an inline token-hash array) re-evaluates
    the tokenize+hash pass once per bit — 64 corpus scans' worth of
    work fused into one stage; measured 12 s vs ~1 s at sf0.1. The
    explode form hashes each token once and the ±1 sums partial-agg
    map-side (shuffle = 64×8 B per doc per partition)."""
    one = F.lit(1).cast("long")
    toks = docs.select(
        "doc_id", F.explode_outer(F.split(F.lower(F.col("text")), " ")).alias("t")
    ).select("doc_id", F.xxhash64("t").alias("h"))
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(one) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    word = F.lit(0).cast("long")
    for i in range(bits):
        word = word.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(one, i)).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("doc_id", word.alias("simhash"))


@register("dedup_simhash")  # rows-only: hash-family-dependent
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup buckets: docs sharing any 16-bit quarter of
    their simhash (hamming ≤ 3 over 64 bits is caught by ≥1 equal
    quarter w.h.p. — the standard Charikar banding)."""
    d = load_table(spark, sf_dir, "documents")
    sh = simhash_signatures(d).cache()
    quarters = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright("simhash", q * 16)
                        .bitwiseAND(F.lit(0xFFFF).cast("long"))
                        .alias("qh"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.q", "b.qh")
    a, b = quarters.alias("a"), quarters.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qh") == F.col("b.qh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
    )


# ------------------------------------------------------- n-gram jaccard


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard over LSH candidates at a lower
    threshold — the precision pass after minhash recall. Unregistered
    builder: identical to the registered `dedup_minhash_lsh` (which
    runs at threshold 0.2 and carries exact jaccard per pair)."""
    return minhash_candidates(load_table(spark, sf_dir, "documents"), threshold=0.2)
