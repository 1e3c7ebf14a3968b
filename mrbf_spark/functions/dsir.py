"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every document of a RAW corpus by how
target-like it is under two hashed-n-gram bag models (one fit on a
TARGET split, one on the raw split), then keep the top fraction by
importance weight. The standard "make the web corpus look like the
quality corpus" selection step in LLM training-data pipelines —
complements the corpus-intrinsic signals (lm.py perplexity, Gopher
rules) with a *comparative* signal against a reference distribution.

Reference scope: the reference engine has no data-selection operator;
this extends the documents-table curation family. Paper fidelity: the
paper uses hashed unigram+bigram counts into B buckets and importance
weight log w(x) = Σ_b c_b(x)·(log p_b − log q_b) with smoothed
per-bucket categorical models — exactly what is computed here. The
paper then Gumbel-top-k resamples; the deterministic variant
implemented (rank by weight, keep the top fraction, doc_id
tie-break) is the reproducible-pipeline choice, like the systematic
split in sampling.py.

Determinism / oracle design: the per-bucket log-ratio is an EXACT
INTEGER from the libm-free fixed-point log2 kernel (intlog.py, r9) —
lrq_b = (L2Q(ct+1) − L2Q(Nt+B)) − (L2Q(cr+1) − L2Q(Nr+B)) in 2^-24
log2 units — so each doc's weight is an exact integer sum,
bit-identical however Spark partitions the aggregation, and the DuckDB
oracle replays the whole pipeline (md5 bucket hash → models →
log-ratio → weights → rank) value-for-value with zero libm anywhere
on the comparison path (through r8 this used trunc(1e9·ln p) and
carried lm.py's documented truncation-boundary risk).

100 TB shape: one corpus scan to hashed features; (doc_id, bucket,
cnt) INT rows are all that shuffles (text never does). Both models
partial-aggregate map-side into ≤B rows, so the model join is a
broadcast of a ~B-row table whatever the corpus size. The global rank
is the 3-phase _distributed_rank (range partition → per-partition
row_number → broadcast offsets) — no single-task stage. A hot
document (verbatim copies) costs its share of (doc, bucket) rows only:
bucket keys are text-independent mod-B hashes, so the feature groupBy
is bounded at docs×B and cannot skew onto one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import builder, scoped_cache
from ..tables import load_table
from .intlog import FBITS, LN2, l2q_int, l2q_sql_ctes, with_l2q
from .sketches import _h60, _h60_sql

DSIR_BUCKETS = 256
DSIR_SALT = "dsir"
DSIR_SCALE = 1 << FBITS  # 2^24 fixed-point log2 units, matches lm.LM_SCALE
# deterministic top-fraction kept: k = ceil(n_raw / 4)
DSIR_KEEP_NUM, DSIR_KEEP_DEN = 1, 4


def _hashed_features(docs: DataFrame, target: Column, b: int) -> DataFrame:
    """(doc_id, is_t, b, c): per-doc hashed unigram+bigram counts.
    Tokens are the whitespace split of lower(text) (the lm.py
    tokenizer); features are every token plus every adjacent pair
    joined by one space, bucketed by the portable 60-bit md5 hash
    mod b. A 1-token doc contributes just its unigram.

    A NULL target predicate (e.g. `lang = 'en'` on a NULL lang) is
    coalesced to FALSE — the doc counts as raw and gets scored/ranked
    rather than silently vanishing from both sides (ADVICE r5)."""
    # token array projected once as its own column (r9): inlining the
    # split() into the bigram lambda re-tokenized the doc per
    # element_at reference — O(len²) per doc (see lm._doc_bigrams)
    toks = F.col("__toks")
    bigrams = F.transform(
        # greatest(...) guards sequence() against the descending
        # [1, 0] a 1-token doc would produce; the when() below never
        # consumes that branch's value
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    feats = F.when(F.size(toks) >= 2, F.concat(toks, bigrams)).otherwise(toks)
    return (
        docs.select(
            "doc_id",
            F.coalesce(target, F.lit(False)).alias("is_t"),
            F.split(F.lower(F.col("text")), " ").alias("__toks"),
        )
        .select(
            "doc_id",
            "is_t",
            F.explode(feats).alias("feat"),
        )
        .groupBy(
            "doc_id",
            "is_t",
            F.pmod(_h60(F.col("feat"), DSIR_SALT), F.lit(b)).alias("b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def dsir_select(
    docs: DataFrame, target: Column, b: int = DSIR_BUCKETS
) -> DataFrame:
    """(doc_id, n_feats, weight_q, avg_log_ratio, rank, selected) for
    every document NOT matching `target` (the raw side; a NULL
    predicate counts as not-matching — see _hashed_features).

    p_b = (ct_b + 1)/(Nt + B), q_b = (cr_b + 1)/(Nr + B) with bucket
    counts ct/cr from the target/raw splits; lrq_b = (L2Q(ct+1) −
    L2Q(Nt+B)) − (L2Q(cr+1) − L2Q(Nr+B)) in exact 2^-24 log2 units
    (intlog.py); weight_q = Σ_b c_b·lrq_b (exact BIGINT); rank is
    (weight_q DESC, doc_id) and selected=1 for the top ceil(n·1/4)."""
    from .lm import _distributed_rank

    spark = docs.sparkSession
    # localCheckpoint (r9): one materialization pass (same as the old
    # cache+count) AND a leaf plan — the model/log-ratio/rank
    # machinery below makes many DataFrame calls over this frame, and
    # re-analyzing the tokenize+explode lineage per call dominated
    # driver time (~15 s at sf0.1, see intlog.with_l2q)
    feats = _hashed_features(docs, target, b).localCheckpoint()
    totals = {
        bool(r["is_t"]): int(r["n"])
        for r in feats.groupBy("is_t").agg(F.sum("c").alias("n")).collect()
        if r["is_t"] is not None
    }
    nt, nr = totals.get(True, 0), totals.get(False, 0)
    tm = feats.filter("is_t").groupBy("b").agg(F.sum("c").cast("long").alias("ct"))
    rm = (
        feats.filter(~F.col("is_t"))
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("cr"))
    )
    # libm-free log-ratio: L2Q over the ≤B-row bucket table, model
    # totals as plan-time constants through the exact Python twin
    lr = (
        spark.range(b)
        .select(F.col("id").alias("b"))
        .join(tm, "b", "left")
        .join(rm, "b", "left")
        .withColumn("__ct1", F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1))
        .withColumn("__cr1", F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1))
    )
    lr = with_l2q(lr, "__ct1", "__l2t")
    lr = with_l2q(lr, "__cr1", "__l2r")
    lp = F.col("__l2t") - F.lit(l2q_int(nt + b))
    lq = F.col("__l2r") - F.lit(l2q_int(nr + b))
    lr = lr.select("b", (lp - lq).alias("lrq"))
    docw = (
        feats.filter(~F.col("is_t"))
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("lrq")).cast("long").alias("weight_q"),
        )
    )
    ranked, n = _distributed_rank(
        docw.withColumn("__negw", -F.col("weight_q")), ["__negw", "doc_id"]
    )
    k = (n * DSIR_KEEP_NUM + DSIR_KEEP_DEN - 1) // DSIR_KEEP_DEN
    return ranked.select(
        "doc_id",
        "n_feats",
        "weight_q",
        (
            F.col("weight_q").cast("double")
            / F.lit(float(DSIR_SCALE))
            / F.col("n_feats").cast("double")
            * F.lit(LN2)
        ).alias("avg_log_ratio"),
        "rank",
        F.when(F.col("rank") <= F.lit(k), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("selected"),
    )


def dsir_duckdb_sql(
    target_pred: str = "lang = 'en'",
    b: int = DSIR_BUCKETS,
    src: str = "documents",
) -> str:
    """DuckDB twin of dsir_select (same fixed-point pipeline)."""
    return f"""
    WITH RECURSIVE feats AS (
      SELECT doc_id, is_t, {_h60_sql('feat', DSIR_SALT)} % {b} AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, COALESCE(({target_pred}), FALSE) AS is_t,
                   UNNEST(CASE WHEN len(t) >= 2
                          THEN list_concat(t, [t[i] || ' ' || t[i+1]
                                               for i in generate_series(1, len(t) - 1)])
                          ELSE t END) AS feat
            FROM (SELECT *, string_split(lower(text), ' ') AS t FROM {src}))
      GROUP BY 1, 2, 3),
    tm AS (SELECT b, CAST(SUM(c) AS BIGINT) AS ct FROM feats WHERE is_t GROUP BY 1),
    rm AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cr FROM feats WHERE NOT is_t GROUP BY 1),
    nt AS (SELECT COALESCE(CAST(SUM(ct) AS BIGINT), 0) AS n FROM tm),
    nr AS (SELECT COALESCE(CAST(SUM(cr) AS BIGINT), 0) AS n FROM rm),
    {l2q_sql_ctes(
        "SELECT DISTINCT v FROM ("
        "SELECT ct + 1 AS v FROM tm"
        " UNION ALL SELECT cr + 1 FROM rm"
        " UNION ALL SELECT 1"
        f" UNION ALL SELECT (SELECT n FROM nt) + {b}"
        f" UNION ALL SELECT (SELECT n FROM nr) + {b})"
    )},
    lr AS (SELECT gs.i AS b,
             (lt.l2q - (SELECT l2q FROM l2 WHERE v = (SELECT n FROM nt) + {b}))
           - (lrr.l2q - (SELECT l2q FROM l2 WHERE v = (SELECT n FROM nr) + {b}))
             AS lrq
           FROM generate_series(0, {b - 1}) gs(i)
           LEFT JOIN tm ON tm.b = gs.i LEFT JOIN rm ON rm.b = gs.i
           JOIN l2 lt ON lt.v = COALESCE(tm.ct, 0) + 1
           JOIN l2 lrr ON lrr.v = COALESCE(rm.cr, 0) + 1),
    docw AS (SELECT f.doc_id, CAST(SUM(f.c) AS BIGINT) AS n_feats,
                    CAST(SUM(f.c * lr.lrq) AS BIGINT) AS weight_q
             FROM feats f JOIN lr ON f.b = lr.b
             WHERE NOT f.is_t GROUP BY 1),
    ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY weight_q DESC, doc_id)
                              AS BIGINT) AS rank,
                      COUNT(*) OVER () AS n
               FROM docw)
    SELECT doc_id, n_feats, weight_q,
           CAST(weight_q AS DOUBLE) / {float(DSIR_SCALE)}
             / CAST(n_feats AS DOUBLE) * CAST('{LN2!r}' AS DOUBLE) AS avg_log_ratio,
           rank,
           CAST(CASE WHEN rank <= (n * {DSIR_KEEP_NUM} + {DSIR_KEEP_DEN - 1})
                               // {DSIR_KEEP_DEN}
                     THEN 1 ELSE 0 END AS INT) AS selected
    FROM ranked
    """


_DSIR_ORACLE = dsir_duckdb_sql()


@builder("dsir_selection", _DSIR_ORACLE)
def dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR over the documents table with target = the English split
    (the 'quality corpus' stand-in): every non-en doc scored and the
    most-en-like quarter selected. Driver hash-checked as the 'dsir'
    part of lm_suite."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_select(docs, F.col("lang") == "en")
