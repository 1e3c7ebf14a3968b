"""Exact-substring duplicate SPAN detection (the Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better" signal,
re-expressed relationally): a K-token window that appears in more than
one document marks every position it covers as duplicated text; merged
runs of flagged positions are the spans a curation pipeline would cut.

Differs from the module's other dedup ops in granularity: minhash /
exact_jaccard_pairs judge WHOLE documents similar; this finds the
exact duplicated REGIONS inside otherwise-distinct documents
(boilerplate headers, licence blocks, quoted passages).

The suffix-array machinery of the paper collapses, in the bounded
K-window form, to three relational steps — each a standard
partial-aggregating shuffle:
  1. window extraction: positions 1..T−K+1 per doc, one projection;
  2. cross-doc window census: GROUP BY window HAVING
     COUNT(DISTINCT doc_id) ≥ 2 (two-level agg, map-side partial);
  3. span assembly: flagged positions → gaps-and-islands (lag +
     running sum — one window function over (doc, pos)).

100 TB: the window census shuffles (window, doc_id) pairs — columns
pruned, hot boilerplate windows ride AQE skew; span assembly shuffles
only flagged positions (ints). Windows travel as 8-byte xxhash64
combined token hashes, NOT the K-token strings (measured 1.8× at 50k
docs: the strings are ~100 B each across a 4M-row census shuffle),
gated on the corpus injectivity certificate exactly as the Jaccard
engine's shingle hashing is — and because the OUTPUT carries only
positions and counts, never window values, the hashed run is
bit-identical to the string-based DuckDB oracle whenever the
certificate holds (string fallback otherwise).

Output (docs with ≥1 duplicated span only):
  (doc_id, n_dup_windows, n_spans, dup_tokens)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..registry import register
from ..tables import load_table

SUBSTR_K = 16  # window width in tokens (the paper uses 50-token spans
# at web scale; 16 matches the testdata's ~100-token documents)


def _windows(docs: DataFrame, k: int, hashed: bool) -> DataFrame:
    """(doc_id, pos, w): every K-token window with its 1-based start
    position; `w` is the window string (hashed=False) or the xxhash64
    combination of the K token hashes (hashed=True — identical
    grouping whenever the injectivity certificate holds). Docs shorter
    than K emit nothing — guarded with when(): Spark's
    sequence(1, stop) DESCENDS for stop < 1 (sequence(1,0) = [1,0]),
    it does not return empty."""
    toks = F.split(F.lower(F.col("text")), " ")
    n = F.size(toks)
    positions = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.array().cast("array<int>")
    )
    if hashed:
        # stage the per-token hash array in its own projection (same
        # CollapseProject care as shingled_docs: inlining re-evaluates
        # the token pass per element_at reference)
        staged = docs.select(
            "doc_id",
            positions.alias("__pos"),
            F.transform(toks, lambda t: F.xxhash64(t)).alias("__th"),
        )
        wins = F.transform(
            F.col("__pos"),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(
                    *[F.element_at("__th", i + j) for j in range(k)]
                ).alias("w"),
            ),
        )
        gen = staged.select("doc_id", F.explode_outer(wins).alias("x"))
    else:
        wins = F.transform(
            positions,
            lambda i: F.struct(
                i.alias("pos"), F.concat_ws(" ", F.slice(toks, i, k)).alias("w")
            ),
        )
        gen = docs.select("doc_id", F.explode_outer(wins).alias("x"))
    return gen.filter(F.col("x").isNotNull()).select("doc_id", "x.pos", "x.w")


def _dup_census(docs: DataFrame, k: int) -> tuple[DataFrame, DataFrame]:
    """(wins, dup): the shared heart of the span detector AND the cut
    step — wins = every K-window with position, cached hash-partitioned
    by w (the jaccard engine's repartition-at-cache pattern, r5: the
    census groupBy and the join probe side both consume the cached
    partitioning, so the corpus-sized window extraction runs ONCE and
    the 5M-row (w, doc_id, pos) table crosses the wire once — measured
    3.1 s → 2.2 s at sf0.1); dup = (w, __keep) for every window seen
    in ≥2 docs, __keep = lowest doc_id (the canonical copy's owner)."""
    from ..registry import scoped_cache
    from .dedup import _hash_injectivity_certified

    wins = _windows(docs, k, hashed=_hash_injectivity_certified(docs, k))
    wins = scoped_cache(wins.repartition("w"))
    wins.count()  # materialize: a lazy cache is raced by the consumers
    dup = (
        wins.groupBy("w")
        .agg(
            F.countDistinct("doc_id").alias("__nd"),
            F.min("doc_id").alias("__keep"),
        )
        .filter(F.col("__nd") >= 2)
        .select("w", "__keep")
    )
    return wins, scoped_cache(dup)


def substring_dup_spans(
    docs: DataFrame,
    k: int = SUBSTR_K,
    _census: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    wins, dup = _census if _census is not None else _dup_census(docs, k)
    flagged = wins.join(dup.select("w"), "w", "left_semi").select("doc_id", "pos")
    ord_w = W.partitionBy("doc_id").orderBy("pos")
    # gaps-and-islands: window [p, p+K−1] connects to the previous one
    # iff p ≤ prev_p + K (overlap or adjacency); a larger gap starts a
    # new span. span_id = running count of breaks.
    brk = F.when(
        F.col("pos") > F.lag("pos").over(ord_w) + F.lit(k), F.lit(1)
    ).otherwise(F.lit(0))
    spans = (
        flagged.withColumn("__brk", brk)
        .withColumn(
            "__span",
            F.sum("__brk").over(ord_w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "__span")
        .agg(
            F.count(F.lit(1)).alias("__n_pos"),
            F.min("pos").alias("__s"),
            (F.max("pos") + F.lit(k - 1)).alias("__e"),
        )
    )
    return spans.groupBy("doc_id").agg(
        F.sum("__n_pos").cast("long").alias("n_dup_windows"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("__e") - F.col("__s") + 1).cast("long").alias("dup_tokens"),
    )


# The registered catalog entry (r4; part-tagged since late r5): the
# 'spans' detector AND the 'cut' rewriter as one union over ONE shared
# window census — remove_dup_spans gains an independent driver
# hash-check (including the rewritten text) without a second catalog
# slot, and the corpus-sized window extraction runs exactly once.
_SUBSTR_SUITE_SQL = f"""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
    wins AS (SELECT doc_id, u.pos AS pos, u.w AS w
             FROM (SELECT doc_id,
                          unnest([struct_pack(pos := i,
                                              w := array_to_string(t[i:i+{SUBSTR_K - 1}], ' '))
                                  for i in generate_series(1, len(t) - {SUBSTR_K} + 1)]) AS u
                   FROM toks WHERE len(t) >= {SUBSTR_K})),
    dupk AS (SELECT w, MIN(doc_id) AS keep FROM wins
             GROUP BY w HAVING COUNT(DISTINCT doc_id) >= 2),
    flagged AS (SELECT doc_id, pos FROM wins WHERE w IN (SELECT w FROM dupk)),
    marked AS (SELECT doc_id, pos,
                      CASE WHEN pos > LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                                     + {SUBSTR_K} THEN 1 ELSE 0 END AS brk
               FROM flagged),
    islands AS (SELECT doc_id, pos,
                       SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS span_id
                FROM marked),
    spans AS (SELECT doc_id, span_id, COUNT(*) AS n_pos,
                     MIN(pos) AS s, MAX(pos) + {SUBSTR_K - 1} AS e
              FROM islands GROUP BY 1, 2),
    spans_part AS (SELECT doc_id,
                          CAST(SUM(n_pos) AS BIGINT) AS n_dup_windows,
                          COUNT(*) AS n_spans,
                          CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
                   FROM spans GROUP BY doc_id),
    cut_pos AS (SELECT DISTINCT doc_id, idx
                FROM (SELECT wins.doc_id,
                             unnest(generate_series(wins.pos, wins.pos + {SUBSTR_K - 1})) AS idx
                      FROM wins JOIN dupk USING (w)
                      WHERE wins.doc_id <> dupk.keep)),
    tokpos AS (SELECT doc_id, u.idx AS idx, u.tok AS tok
               FROM (SELECT doc_id,
                            unnest([struct_pack(idx := i, tok := t[i])
                                    for i in generate_series(1, len(t))]) AS u
                     FROM toks)),
    kept AS (SELECT tp.doc_id, tp.idx, tp.tok FROM tokpos tp
             ANTI JOIN cut_pos cp ON tp.doc_id = cp.doc_id AND tp.idx = cp.idx),
    rebuilt AS (SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY idx) AS text,
                       CAST(COUNT(*) AS BIGINT) AS n_tokens
                FROM kept GROUP BY doc_id)
    SELECT 'spans' AS part, doc_id, n_dup_windows, n_spans, dup_tokens,
           CAST(NULL AS VARCHAR) AS text, CAST(NULL AS BIGINT) AS n_tokens,
           CAST(NULL AS BIGINT) AS n_removed
    FROM spans_part
    UNION ALL
    SELECT 'cut' AS part, b.doc_id,
           CAST(NULL AS BIGINT) AS n_dup_windows,
           CAST(NULL AS BIGINT) AS n_spans,
           CAST(NULL AS BIGINT) AS dup_tokens,
           COALESCE(r.text, '') AS text,
           COALESCE(r.n_tokens, 0) AS n_tokens,
           CAST(len(b.t) - COALESCE(r.n_tokens, 0) AS BIGINT) AS n_removed
    FROM toks b LEFT JOIN rebuilt r USING (doc_id)
    """


@register("substring_dedup_spans", _SUBSTR_SUITE_SQL)
def substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span census ('spans' part) + the Lee et al.
    cut step's rewritten corpus ('cut' part) from ONE shared window
    census (catalog entry since r4, part-tagged since late r5; DuckDB
    parity also asserted in-suite by tests/test_substring_dedup.py)."""
    docs = load_table(spark, sf_dir, "documents")
    census = _dup_census(docs, SUBSTR_K)
    part_spans = substring_dup_spans(docs, _census=census).select(
        F.lit("spans").alias("part"),
        "doc_id",
        "n_dup_windows",
        "n_spans",
        "dup_tokens",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("long").alias("n_tokens"),
        F.lit(None).cast("long").alias("n_removed"),
    )
    part_cut = remove_dup_spans(docs, _census=census).select(
        F.lit("cut").alias("part"),
        "doc_id",
        F.lit(None).cast("long").alias("n_dup_windows"),
        F.lit(None).cast("long").alias("n_spans"),
        F.lit(None).cast("long").alias("dup_tokens"),
        "text",
        "n_tokens",
        "n_removed",
    )
    return part_spans.unionByName(part_cut)


# ----------------------------------------------------- span REMOVAL

def remove_dup_spans(
    docs: DataFrame,
    k: int = SUBSTR_K,
    _census: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """The cut step of Lee et al. 2022 — actually REMOVE duplicated
    text with PER-WINDOW lowest-doc_id keeper election: for every
    K-token window seen in ≥2 documents, the lowest doc_id containing
    it keeps that window's tokens; every other document has them cut,
    with overlapping cuts merging into spans exactly as
    substring_dup_spans assembles them.

    NB (ADVICE r5): keeper election is per WINDOW, independently — NOT
    a corpus-wide per-passage canonical copy. When overlapping
    duplicated windows elect different keepers, the keeper of window w
    can still lose w's tokens through an overlapping window w' owned
    by another doc, so a duplicated passage may be cut from every
    document. The behavior is deterministic and oracle-matched; choose
    K ≥ the passage lengths you care about if one full surviving copy
    per passage matters.

    Returns one row per input document:
      (doc_id, text, n_tokens, n_removed) — `text` rewritten from the
      surviving tokens (may be '' when everything was duplicated),
      n_tokens = surviving count.

    100 TB shape: reuses the window census (hashed 8-byte windows
    behind the injectivity certificate, partial-agg min-keeper); the
    only new shuffles carry (doc_id, token_index) INT pairs for cut
    positions and the final per-doc reassembly groupBy. The rewritten
    text is produced from each doc's OWN token array — the corpus text
    crosses the wire once, in the reassembly shuffle.

    Intra-document repeats (a window recurring only inside one doc)
    are NOT cut — the census is cross-document, matching the span
    detector's semantics.
    """
    wins, keeper = _census if _census is not None else _dup_census(docs, k)
    cut_pos = (
        wins.join(keeper, "w")
        .filter(F.col("doc_id") != F.col("__keep"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
            ).alias("idx"),
        )
        .distinct()
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("idx0", "tok"),
    ).select("doc_id", (F.col("idx0") + 1).alias("idx"), "tok")
    kept = toks.join(cut_pos, ["doc_id", "idx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("idx", "tok"))).tok, " "
        ).alias("text"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
    )
    base = docs.select(
        "doc_id", F.size(F.split(F.lower(F.col("text")), " ")).alias("__orig")
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            (F.col("__orig") - F.coalesce(F.col("n_tokens"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def remove_dup_spans_sql(k: int = SUBSTR_K, src: str = "documents") -> str:
    """DuckDB twin of remove_dup_spans (string windows — identical
    grouping whenever the injectivity certificate holds)."""
    return f"""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM {src}),
    wins AS (SELECT doc_id, u.pos AS pos, u.w AS w
             FROM (SELECT doc_id,
                          unnest([struct_pack(pos := i,
                                              w := array_to_string(t[i:i+{k - 1}], ' '))
                                  for i in generate_series(1, len(t) - {k} + 1)]) AS u
                   FROM toks WHERE len(t) >= {k})),
    keeper AS (SELECT w, MIN(doc_id) AS keep FROM wins
               GROUP BY w HAVING COUNT(DISTINCT doc_id) >= 2),
    cut_pos AS (SELECT DISTINCT doc_id, idx
                FROM (SELECT wins.doc_id,
                             unnest(generate_series(wins.pos, wins.pos + {k - 1})) AS idx
                      FROM wins JOIN keeper USING (w)
                      WHERE wins.doc_id <> keeper.keep)),
    tokpos AS (SELECT doc_id, u.idx AS idx, u.tok AS tok
               FROM (SELECT doc_id,
                            unnest([struct_pack(idx := i, tok := t[i])
                                    for i in generate_series(1, len(t))]) AS u
                     FROM toks)),
    kept AS (SELECT tp.doc_id, tp.idx, tp.tok FROM tokpos tp
             ANTI JOIN cut_pos cp ON tp.doc_id = cp.doc_id AND tp.idx = cp.idx),
    rebuilt AS (SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY idx) AS text,
                       CAST(COUNT(*) AS BIGINT) AS n_tokens
                FROM kept GROUP BY doc_id)
    SELECT b.doc_id,
           COALESCE(r.text, '') AS text,
           COALESCE(r.n_tokens, 0) AS n_tokens,
           CAST(len(b.t) - COALESCE(r.n_tokens, 0) AS BIGINT) AS n_removed
    FROM toks b LEFT JOIN rebuilt r USING (doc_id)
    """
