"""End-to-end corpus curation: the materializing big brother of the
`curation_pipeline` catalog entry. That entry computes per-source
SURVIVOR STATS in one Catalyst plan; this module actually BUILDS the
curated training set, chaining every cleaning family the engine
implements, each stage composed from the already-tested library ops:

    input
      → exact dedup          (fingerprint, keep min doc_id)
      → quality / lang gate  (lang, token floor, chars-per-token cap)
      → near-dup removal     (exact n-gram Jaccard ≥ τ pairs, drop
                              any doc with a smaller-id partner)
      → semantic dedup       (text_semdedup: hashed-bigram vectors →
                              SemDeDup keeper rule)
      → decontamination      (optional: exact eval n-gram overlap via
                              bloom prune + exact verify)

and returns the surviving documents plus a per-stage census. This is
the `curate` CLI job (python -m mrbf_spark curate …) — optionally
followed by the reproducible shuffle-shard export.

Every stage is deterministic (md5 fingerprints, integer Jaccard,
fixed-point cosines), so two runs over the same corpus emit the same
training set — the property that makes a 100 TB data build auditable.
Scale shape: each stage is one of the already-ledgered plans
(SCALING.md); the chain materializes only doc_id survivor sets
between stages (scoped-cached), never a second copy of the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..registry import release_scoped_caches, scoped_cache
from .decontam import FLAG_THRESHOLD, decontaminate_docs
from .dedup import exact_jaccard_pairs
from .similarity import semdedup_verdicts
from .text import fingerprint_col, token_count_col
from .text_embedding import TEXT_SEM_TAU, text_hash_embeddings


def curate_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    *,
    lang: str | None = "en",
    min_tokens: int = 5,
    max_chars_per_token: float = 15.0,
    jaccard_tau: float = 0.5,
    jaccard_max_df: int | None = 200,
    semantic: bool = True,
    sem_tau: float = TEXT_SEM_TAU,
    contam_threshold: float = FLAG_THRESHOLD,
) -> tuple[DataFrame, list[tuple[str, int]]]:
    """Run the full curation chain; returns (curated_docs, census)
    where census = [(stage, docs_surviving_after_stage), ...].

    The returned DataFrame carries the input's full schema (rows are
    only ever filtered, never rewritten). Caller owns releasing the
    scoped caches after consuming the result
    (`registry.release_scoped_caches()`).

    Near-dup stage semantics: a doc drops when ANY smaller-id doc is
    Jaccard-≥τ similar — deliberately lossy on chains (see the stage-3
    comment; cluster-keeper election is the less-lossy alternative)."""
    census: list[tuple[str, int]] = []
    cur = scoped_cache(docs)
    census.append(("input", cur.count()))
    t = F.col("text")

    # 1 — exact dedup: one fingerprint shuffle, survivors carry ids only
    survivors = (
        cur.groupBy(fingerprint_col(t).alias("fingerprint"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    cur = scoped_cache(cur.join(survivors, "doc_id", "left_semi"))
    census.append(("exact_dedup", cur.count()))

    # 2 — quality / language gate: map-only predicates
    n_tok = token_count_col(t)
    gate = (n_tok >= min_tokens) & (
        F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double") / n_tok
        <= max_chars_per_token
    )
    if lang is not None:
        gate = (F.col("lang") == lang) & gate
    cur = scoped_cache(cur.filter(gate))
    census.append(("quality_gate", cur.count()))

    # 3 — near-dup removal: complete Jaccard-≥τ pairs (bounded by the
    # df cap), drop every doc that has a smaller-id partner — keeps
    # exactly the docs with no earlier near-duplicate.
    # Trade-off (ADVICE r5): the drop rule is transitive-lossy. For a
    # chain A~B~C with A≁C, both B and C drop even though C's only
    # partner (B) is itself dropped — a deliberate one-join rule that
    # over-deletes relative to per-cluster keeper election. If
    # cluster-keeper semantics are wanted, run dedup.assign_clusters
    # over the pair edges and keep min doc_id per component instead.
    pairs = exact_jaccard_pairs(cur, jaccard_tau, max_df=jaccard_max_df)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    cur = scoped_cache(cur.join(losers, "doc_id", "left_anti"))
    census.append(("neardup_jaccard", cur.count()))

    # 4 — semantic dedup over hashed-bigram embeddings
    if semantic:
        emb = scoped_cache(text_hash_embeddings(cur))
        emb.count()
        keep = (
            semdedup_verdicts(emb, tau=sem_tau)
            .filter(F.col("keep"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        cur = scoped_cache(cur.join(keep, "doc_id", "left_semi"))
        census.append(("semantic_dedup", cur.count()))

    # 5 — decontamination against an eval set (exact overlap; docs too
    # short to produce an n-gram have no report row = clean)
    if eval_docs is not None:
        report = decontaminate_docs(cur, eval_docs, threshold=contam_threshold)
        # flagged is INT (0/1 — the NULL-portable oracle convention)
        flagged = report.filter(F.col("flagged") == 1).select("doc_id")
        cur = scoped_cache(cur.join(flagged, "doc_id", "left_anti"))
        census.append(("decontaminate", cur.count()))

    return cur, census


__all__ = ["curate_corpus", "release_scoped_caches"]
