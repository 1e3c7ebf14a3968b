"""Model-based quality classification: logistic regression over
hashed text features — the classifier tier of an LLM data pipeline
(GPT-3 / CCNet style: train on a REFERENCE distribution vs raw crawl,
score every document, filter or re-weight by the score; Brown et al.
2020 §A; Wenzek et al. 2020). The heuristic tiers already in the
engine (quality_rules' Gopher battery, lm_suite's n-gram LM, DSIR's
importance weights) each hard-code their signal; this tier LEARNS the
signal from labeled examples over the same deterministic
feature-hashing frontend the semantic family uses
(text_embedding.text_hash_embeddings — Weinberger et al. 2009).

ALL-INTEGER TRAINING. The classic cross-engine hazard for an
iterative model is libm (exp in the sigmoid): a 1-ulp disagreement in
iteration 1 compounds into different weights by iteration k. This
trainer has NO float anywhere in the loop:

  * features x are the hashed signed bigram counts — int64 by
    construction (bias term x_0 = 1);
  * weights w are int64 at scale S = 1e9;
  * the activation is the HARD sigmoid σ̂(z) = clamp(z/4 + 1/2, 0, 1)
    (the standard piecewise-linear logistic surrogate), kept at scale
    4S so it is clamp(m + 2S, 0, 4S) — two comparisons, no division;
  * the update divides by (4·n·LR_DEN) with integer division, which
    truncates toward zero in BOTH engines (Spark `DIV`, DuckDB `//` —
    probed, not assumed).

Every quantity is therefore bit-identical on any engine that replays
the definition — a STRONGER portability argument than the kmeans /
BPE twins (which rely on exactly-representable IEEE divisions); here
there is no IEEE op at all until the final display-only probability.

Overflow budget (int64): |gradient_j| ≤ 4S · Σ_i |x_ij| ≤
4e9 · n_train · max|x|. The trainer measures Σ|x| once and raises
loudly past 2^62 — at that point shard the gradient (sum per
partition, then combine), which composes without changing semantics.

Scale shape (100 TB): features are two bounded shuffles of (doc,
slot, count) ints (the embedding module's ledger); each training
iteration is ONE aggregate over the cached feature frame producing
dim+1 int64 sums (the kmeans_fit collect pattern — bounded driver
traffic); scoring is map-only against broadcast weight literals.

Registered as lm_suite part=qlr (train on the doc_id %% 5 == 0 slice
against the lang=='en' reference label — the CCNet shape; score the
whole corpus with frozen weights); the DuckDB twin replays training
as chained MATERIALIZED CTE iterations (the kmeans/bpe technique).
Learning itself (not just replay) is pinned by a planted two-vocab
separable corpus test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..registry import scoped_cache
from .text_embedding import TE_DIM, text_embeddings_sql, text_hash_embeddings

S = 1_000_000_000  # weight scale (shared with the fixed-point family)
QLR_ITERS = 8
QLR_LR_DEN = 4  # learning rate 1/4 (of the mean hard-sigmoid gradient)
QLR_TRAIN_MOD = 5  # registered part trains on doc_id % 5 == 0
_GRAD_BUDGET = 2**62


def qlr_features(docs: DataFrame, dim: int = TE_DIM) -> DataFrame:
    """(doc_id, x array<long> of dim+1): bias 1 followed by the hashed
    signed bigram counts — exact integers end to end."""
    emb = text_hash_embeddings(docs, dim)
    x = F.concat(
        F.array(F.lit(1).cast("long")),
        F.transform("embedding", lambda v: v.cast("long")),
    )
    return emb.select(F.col("vec_id").alias("doc_id"), x.alias("x"))


def _margin_col(w: list[int]) -> Column:
    """Σ_j w_j·x_j as one int64 expression (w are plan literals —
    dim+1 of them, the broadcast-weights deployment shape)."""
    m = F.lit(0).cast("long")
    for j, wj in enumerate(w):
        if wj:
            m = m + F.lit(int(wj)).cast("long") * F.element_at("x", j + 1)
    return m


def qlr_train(
    docs: DataFrame,
    y: Column,
    *,
    dim: int = TE_DIM,
    iters: int = QLR_ITERS,
    lr_den: int = QLR_LR_DEN,
) -> list[int]:
    """Train hard-sigmoid logistic regression on `docs` with binary
    label expression `y` (evaluated against docs' columns; cast to
    0/1). Returns the dim+1 int64 weight vector at scale S — replayed
    bit-exactly by qlr_train_sql."""
    feats = scoped_cache(
        qlr_features(docs, dim).join(
            docs.select("doc_id", y.cast("long").alias("y")), "doc_id"
        )
    )
    stats = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.aggregate(
                "x", F.lit(0).cast("long"), lambda a, v: a + F.abs(v)
            )
        ).alias("sx"),
    ).collect()[0]
    n = int(stats["n"])
    if n == 0:
        raise ValueError("qlr_train: empty training set")
    if 4 * S * int(stats["sx"]) >= _GRAD_BUDGET:
        raise ValueError(
            "qlr_train: gradient accumulator would exceed the int64 "
            "budget (4e9 * sum|x|); shard the gradient sum per "
            "partition and combine (same semantics), or reduce the "
            "training slice"
        )
    w = [0] * (dim + 1)
    step_den = 4 * n * lr_den
    spark = docs.sparkSession
    for _ in range(iters):
        # weights ride as a ONE-ROW broadcast array column, never as
        # plan literals (the kmeans/with_matrix lesson): literal
        # weights change the plan text every iteration, forcing a
        # fresh WholeStageCodegen compile per iteration — measured
        # ~2 s/iteration of pure JIT at sf0.1. With the broadcast
        # column the 8 iterations share ONE compiled plan. Integer
        # mults/sums are order-exact, so the margin is unchanged.
        wdf = spark.createDataFrame([([int(x) for x in w],)], "w array<bigint>")
        m = F.aggregate(
            F.zip_with("w", "x", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        # hard sigmoid at scale 4S, residual against 4S·y
        u = F.least(F.greatest(m + F.lit(2 * S), F.lit(0).cast("long")), F.lit(4 * S))
        r = u - F.lit(4 * S) * F.col("y")
        row = (
            feats.crossJoin(F.broadcast(wdf))
            .select(r.alias("r"), "x")
            .agg(
                *[
                    F.sum(F.col("r") * F.element_at("x", j + 1)).alias(f"g{j}")
                    for j in range(dim + 1)
                ]
            )
            .collect()[0]
        )
        # integer division truncating toward zero — Spark DIV and
        # DuckDB // agree on this (probed: -7 DIV 2 == -3 on both)
        w = [
            wj - _trunc_div(int(row[f"g{j}"]), step_den)
            for j, wj in enumerate(w)
        ]
    return w


def _trunc_div(a: int, b: int) -> int:
    """Python's // floors; Spark DIV / DuckDB // truncate toward
    zero. Replay their semantics exactly."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def qlr_score(docs: DataFrame, w: list[int], dim: int = TE_DIM) -> DataFrame:
    """(doc_id, logit_fx, prob, pred): logit_fx = Σ w·x (int64, scale
    S), prob = the hard-sigmoid value as a display double (exact:
    integer/4e9), pred = prob ≥ 1/2 (integer comparison)."""
    feats = qlr_features(docs, dim)
    m = _margin_col(w)
    u = F.least(F.greatest(m + F.lit(2 * S), F.lit(0).cast("long")), F.lit(4 * S))
    return feats.select(
        "doc_id",
        m.alias("logit_fx"),
        (u.cast("double") / F.lit(float(4 * S))).alias("prob"),
        (u >= F.lit(2 * S)).cast("int").alias("pred"),
    )


# ------------------------------------------------------- DuckDB twins


def _feats_sql(src: str = "documents", dim: int = TE_DIM) -> str:
    """(doc_id, pos, x) long rows: pos 0 = bias, 1..dim = the hashed
    embedding slots (text_embeddings_sql replayed)."""
    return f"""
    SELECT vec_id AS doc_id, 0 AS pos, CAST(1 AS BIGINT) AS x
    FROM (SELECT DISTINCT doc_id AS vec_id FROM {src})
    UNION ALL
    SELECT vec_id AS doc_id, u.pos, CAST(u.x AS BIGINT) AS x
    FROM (SELECT vec_id,
                 unnest([struct_pack(pos := i, x := embedding[i])
                         for i in generate_series(1, len(embedding))]) AS u
          FROM ({text_embeddings_sql(dim, src)}))
    """


def qlr_suite_sql(
    src: str = "documents",
    *,
    dim: int = TE_DIM,
    iters: int = QLR_ITERS,
    lr_den: int = QLR_LR_DEN,
    train_mod: int = QLR_TRAIN_MOD,
    label_sql: str = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
) -> str:
    """DuckDB twin of the registered part: replay training (chained
    MATERIALIZED CTE iterations — integer margins, hard-sigmoid
    residuals, truncating-division steps) on the train slice, then
    score the whole corpus with the final weights."""
    ctes = [
        f"qfe AS MATERIALIZED ({_feats_sql(src, dim)})",
        f"""qtr AS MATERIALIZED (
        SELECT f.doc_id, f.pos, f.x, l.y
        FROM qfe f JOIN (SELECT doc_id, CAST({label_sql} AS BIGINT) AS y
                         FROM {src}) l USING (doc_id)
        WHERE f.doc_id % {train_mod} = 0)""",
        "qn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM qtr)",
        f"""qw0 AS (SELECT i AS pos, CAST(0 AS BIGINT) AS val
        FROM generate_series(0, {dim}) t(i))""",
    ]
    for t in range(1, iters + 1):
        p = f"qw{t - 1}"
        ctes.append(
            f"""qm{t} AS MATERIALIZED (
        SELECT e.doc_id, ANY_VALUE(e.y) AS y,
               CAST(SUM(w.val * e.x) AS BIGINT) AS m
        FROM qtr e JOIN {p} w USING (pos)
        GROUP BY e.doc_id)"""
        )
        ctes.append(
            f"""qg{t} AS (
        SELECT e.pos,
               CAST(SUM((LEAST(GREATEST(m.m + {2 * S}, 0), {4 * S})
                         - {4 * S} * m.y) * e.x) AS BIGINT) AS g
        FROM qtr e JOIN qm{t} m USING (doc_id)
        GROUP BY e.pos)"""
        )
        ctes.append(
            f"""qw{t} AS MATERIALIZED (
        SELECT w.pos, CAST(w.val - g.g // (4 * qn.n * {lr_den}) AS BIGINT) AS val
        FROM {p} w JOIN qg{t} g USING (pos) CROSS JOIN qn)"""
        )
    body = ",\n    ".join(ctes)
    return f"""WITH {body},
    qsc AS (SELECT f.doc_id, CAST(SUM(w.val * f.x) AS BIGINT) AS m
            FROM qfe f JOIN qw{iters} w USING (pos)
            GROUP BY f.doc_id)
    SELECT doc_id, m AS logit_fx,
           CAST(LEAST(GREATEST(m + {2 * S}, 0), {4 * S}) AS DOUBLE)
             / {float(4 * S)} AS prob,
           CAST(LEAST(GREATEST(m + {2 * S}, 0), {4 * S}) >= {2 * S}
                AS INTEGER) AS pred
    FROM qsc"""


def lm_qlr_part(docs: DataFrame) -> DataFrame:
    """The registered lm_suite part=qlr frame: train on the
    doc_id % QLR_TRAIN_MOD == 0 slice against the lang=='en'
    reference label, score everything with the frozen weights."""
    w = qlr_train(
        docs.filter(F.col("doc_id") % QLR_TRAIN_MOD == 0),
        (F.col("lang") == "en"),
    )
    return qlr_score(docs, w)
