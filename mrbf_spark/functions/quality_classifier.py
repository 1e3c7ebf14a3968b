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
4e9 · n_train · max|x|. The trainer measures Σ|x| riding the FIRST
gradient aggregate (one pass, r9) and raises loudly past 2^62 before
applying any update — at that point shard the gradient (sum per
partition, then combine), which composes without changing semantics.
The fused check stays sound: iteration 1 runs at w=0 where |r| = 2S
exactly, so its sums are exact in any regime where the check could
pass.

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
    dim+1 of them, the broadcast-weights deployment shape). Built as
    ONE SQL string (r9): the per-term Column-object form cost ~4 py4j
    roundtrips per dimension of pure driver chatter."""
    terms = [
        f"{int(wj)}L * element_at(x, {j + 1})"
        for j, wj in enumerate(w)
        if wj
    ]
    if not terms:
        return F.expr("CAST(0 AS BIGINT)")
    return F.expr(" + ".join(terms)).cast("long")


def qlr_labeled_features(
    docs: DataFrame, y: Column, dim: int = TE_DIM
) -> DataFrame:
    """(doc_id, x, y): the hashed feature vector joined with the
    binary label (NULL label coalesced to 0 — the trainer's
    convention). The shared frame train/score/eval all slice (r9):
    computing it ONCE over the full corpus and filtering per consumer
    replaces three separate explode+groupBy feature derivations."""
    return qlr_features(docs, dim).join(
        docs.select("doc_id", F.coalesce(y.cast("long"), F.lit(0)).alias("y")),
        "doc_id",
    )


def qlr_train(
    docs: DataFrame | None,
    y: Column | None = None,
    *,
    dim: int = TE_DIM,
    iters: int = QLR_ITERS,
    lr_den: int = QLR_LR_DEN,
    grad_budget: int = _GRAD_BUDGET,
    feats: DataFrame | None = None,
) -> list[int]:
    """Train hard-sigmoid logistic regression on `docs` with binary
    label expression `y` (evaluated against docs' columns; a NULL
    label — e.g. `lang == 'en'` on a NULL lang — coalesces to 0, the
    same negative-example semantics the DuckDB twin's CASE gives, so
    NULL-label rows cannot silently desynchronize the bit-identical-
    weights guarantee; ADVICE r8). Returns the dim+1 int64 weight
    vector at scale S — replayed bit-exactly by qlr_train_sql.

    `grad_budget` is the int64 overflow ceiling for 4S·Σ|x|
    (injectable so the guard's arithmetic is testable; ADVICE r8).

    `feats` (r9): optional precomputed qlr_labeled_features slice (the
    TRAINING rows), already cache-materialized by the caller — skips
    this function's own feature build so a suite sharing one corpus-
    wide feature frame pays the derivation once."""
    if feats is None:
        if docs is None or y is None:
            raise ValueError(
                "qlr_train: pass either feats= (precomputed labeled "
                "features) or both docs and y"
            )
        # localCheckpoint (r9): the 8 training iterations each build a
        # fresh aggregate plan over this frame — a leaf keeps those
        # per-iteration plan constructions O(1) instead of re-analyzing
        # the feature-derivation lineage every time
        feats = qlr_labeled_features(docs, y, dim).localCheckpoint()
    w = [0] * (dim + 1)
    n = step_den = None
    spark = feats.sparkSession
    # Expressions ride as TWO F.expr SQL strings (r9): the per-column
    # Column-object form (65 sums × ~4 py4j calls each, rebuilt every
    # iteration) cost ~0.7 s/iteration of pure driver-side expression
    # construction; one string parses JVM-side in milliseconds. The
    # gradient lands as ONE array<long> so the driver still collects
    # exactly dim+1 sums.
    rexpr = (
        f"least(greatest(aggregate(zip_with(w, x, (a, b) -> a * b),"
        f" CAST(0 AS BIGINT), (acc, v) -> acc + v) + {2 * S}L,"
        f" CAST(0 AS BIGINT)), {4 * S}L) - {4 * S}L * y AS r"
    )
    gexpr = (
        "array("
        + ", ".join(f"sum(r * element_at(x, {j + 1}))" for j in range(dim + 1))
        + ") AS g"
    )
    for it in range(iters):
        # weights ride as a ONE-ROW broadcast array column, never as
        # plan literals (the kmeans/with_matrix lesson): literal
        # weights change the plan text every iteration, forcing a
        # fresh WholeStageCodegen compile per iteration — measured
        # ~2 s/iteration of pure JIT at sf0.1. With the broadcast
        # column the 8 iterations share ONE compiled plan. Integer
        # mults/sums are order-exact, so the margin is unchanged.
        wdf = spark.createDataFrame([([int(x) for x in w],)], "w array<bigint>")
        aggs = [F.expr(gexpr)]
        if it == 0:
            # The n / Σ|x| stats ride the FIRST gradient pass instead
            # of a separate full scan over the cached features (r9,
            # VERDICT r8 next-round #8 — one fewer action). Guard
            # soundness is preserved: at it=0 the weights are all
            # zero, so |r| = 2S exactly and |g_j| ≤ 2S·Σ|x| — these
            # sums are exact whenever 4S·Σ|x| < 2^63·2, i.e. anywhere
            # the budget check below could possibly pass — and the
            # check raises BEFORE any g is applied.
            aggs += [
                F.expr("count(1) AS __n"),
                F.expr(
                    "sum(aggregate(x, CAST(0 AS BIGINT),"
                    " (a, v) -> a + abs(v))) AS __sx"
                ),
            ]
        row = (
            feats.crossJoin(F.broadcast(wdf))
            .selectExpr(rexpr, "x")
            .agg(*aggs)
            .collect()[0]
        )
        if it == 0:
            n = int(row["__n"])
            if n == 0:
                raise ValueError("qlr_train: empty training set")
            if 4 * S * int(row["__sx"]) >= grad_budget:
                raise ValueError(
                    "qlr_train: gradient accumulator would exceed the int64 "
                    "budget (4e9 * sum|x|); shard the gradient sum per "
                    "partition and combine (same semantics), or reduce the "
                    "training slice"
                )
            step_den = 4 * n * lr_den
        # integer division truncating toward zero — Spark DIV and
        # DuckDB // agree on this (probed: -7 DIV 2 == -3 on both)
        g = row["g"]
        w = [
            wj - _trunc_div(int(g[j]), step_den) for j, wj in enumerate(w)
        ]
    return w


def _trunc_div(a: int, b: int) -> int:
    """Python's // floors; Spark DIV / DuckDB // truncate toward
    zero. Replay their semantics exactly."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def qlr_score(
    docs: DataFrame | None,
    w: list[int],
    dim: int = TE_DIM,
    *,
    feats: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, logit_fx, prob, pred): logit_fx = Σ w·x (int64, scale
    S), prob = the hard-sigmoid value as a display double (exact:
    integer/4e9), pred = prob ≥ 1/2 (integer comparison).

    `feats` (r9): optional precomputed (doc_id, x) frame — scoring is
    then a pure map over it (no feature re-derivation)."""
    if feats is None:
        if docs is None:
            raise ValueError("qlr_score: pass either feats= or docs")
        feats = qlr_features(docs, dim)
    m = _margin_col(w)
    u = F.least(F.greatest(m + F.lit(2 * S), F.lit(0).cast("long")), F.lit(4 * S))
    return feats.select(
        "doc_id",
        m.alias("logit_fx"),
        (u.cast("double") / F.lit(float(4 * S))).alias("prob"),
        (u >= F.lit(2 * S)).cast("int").alias("pred"),
    )


# ------------------------------------------------ evaluation metrics

# Threshold sweep over the hard-sigmoid activation u ∈ [0, 4S]:
# θ_k = k·S/2 for k = 0..8 (probability 0, 1/8, …, 1) — all integer
# comparisons, so the confusion counts are trivially cross-engine.
QLR_EVAL_STEPS = 8


def qlr_eval(
    docs: DataFrame | None,
    w: list[int],
    y: Column | None = None,
    dim: int = TE_DIM,
    *,
    feats: DataFrame | None = None,
) -> DataFrame:
    """Classifier quality report over `docs` under frozen weights
    (VERDICT r8 next-round #7 — the number a pipeline operator tunes
    against): one row per (threshold k, outcome) with integer
    confusion counts, plus one exact-AUC row.

    (k, thr, outcome, cnt, auc_num, auc_den, auc):
      * sweep rows: outcome ∈ tp/fp/fn/tn, cnt = docs where
        pred_k = (u ≥ k·S/2) vs label y (NULL y → 0, the trainer's
        convention); auc_* NULL.
      * AUC row (k = −1): the exact Mann-Whitney statistic with
        midrank tie handling, as an INTEGER rational — auc_num =
        Σ_pos 2·midrank − P(P+1), auc_den = 2·P·N, auc = the display
        double (NULL when a class is absent). Ranks come from the
        3-phase _distributed_rank over (logit, doc_id) — no
        single-partition window — and midranks per tie group are
        (min+max)/2, carried doubled so everything stays integral.

    `feats` (r9): optional precomputed qlr_labeled_features slice (the
    EVAL rows) — skips this function's own feature build.
    """
    from .lm import _distributed_rank  # runtime import: lm imports us

    if feats is None:
        if docs is None or y is None:
            raise ValueError(
                "qlr_eval: pass either feats= (precomputed labeled "
                "features) or both docs and y"
            )
        feats = qlr_labeled_features(docs, y, dim)
    scored = (
        feats.select(
            "doc_id",
            "y",
            _margin_col(w).alias("m"),
        )
        .withColumn(
            "u",
            F.least(
                F.greatest(F.col("m") + F.lit(2 * S), F.lit(0).cast("long")),
                F.lit(4 * S),
            ),
        )
        .localCheckpoint()
    )
    nb = F.lit(None).cast("long")
    nd = F.lit(None).cast("double")
    # --- threshold sweep: explode docs × 9 thresholds, count outcomes
    ks = F.explode(
        F.array(*[F.lit(k) for k in range(QLR_EVAL_STEPS + 1)])
    ).alias("k")
    sweep = (
        scored.select("u", "y", ks)
        .withColumn("thr", F.col("k").cast("long") * F.lit(S // 2))
        .withColumn("pred", (F.col("u") >= F.col("thr")).cast("long"))
        .groupBy("k", "thr")
        .agg(
            F.sum(F.col("pred") * F.col("y")).alias("tp"),
            F.sum(F.col("pred") * (1 - F.col("y"))).alias("fp"),
            F.sum((1 - F.col("pred")) * F.col("y")).alias("fn"),
            F.sum((1 - F.col("pred")) * (1 - F.col("y"))).alias("tn"),
        )
    )
    parts = []
    for outcome in ("tp", "fp", "fn", "tn"):
        parts.append(
            sweep.select(
                F.col("k").cast("long").alias("k"),
                F.col("thr").cast("long").alias("thr"),
                F.lit(outcome).alias("outcome"),
                F.col(outcome).cast("long").alias("cnt"),
                nb.alias("auc_num"),
                nb.alias("auc_den"),
                nd.alias("auc"),
            )
        )
    # --- exact AUC
    ranked, _ = _distributed_rank(scored.select("doc_id", "y", "m"), ["m", "doc_id"])
    grp = ranked.groupBy("m").agg(
        (F.min("rank") + F.max("rank")).alias("two_mid")
    )
    agg = (
        ranked.join(grp, "m")
        .agg(
            F.sum(F.col("y")).alias("p"),
            F.sum(1 - F.col("y")).alias("nn"),
            F.sum(F.col("y") * F.col("two_mid")).alias("s2r"),
        )
        .select(
            (F.col("s2r") - F.col("p") * (F.col("p") + 1)).alias("auc_num"),
            (F.lit(2) * F.col("p") * F.col("nn")).alias("auc_den"),
        )
    )
    auc_row = agg.select(
        F.lit(-1).cast("long").alias("k"),
        nb.alias("thr"),
        F.lit("auc").alias("outcome"),
        nb.alias("cnt"),
        F.col("auc_num").cast("long").alias("auc_num"),
        F.col("auc_den").cast("long").alias("auc_den"),
        F.when(
            F.col("auc_den") > 0,
            F.col("auc_num").cast("double") / F.col("auc_den").cast("double"),
        ).alias("auc"),
    )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out.unionByName(auc_row)


def qlr_eval_suite_sql(
    src: str = "documents",
    *,
    dim: int = TE_DIM,
    iters: int = QLR_ITERS,
    lr_den: int = QLR_LR_DEN,
    train_mod: int = QLR_TRAIN_MOD,
    label_sql: str = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
) -> str:
    """DuckDB twin of the registered eval part: replay training on the
    doc_id %% train_mod == 0 slice (the shared CTE chain), then emit
    the qlr_eval report over the HELD complement."""
    eval_src = f"(SELECT * FROM {src} WHERE doc_id % {train_mod} <> 0)"
    ctes = _qlr_train_ctes(src, dim, iters, lr_den, train_mod, label_sql)
    body = ",\n    ".join(ctes)
    steps = ", ".join(str(k) for k in range(QLR_EVAL_STEPS + 1))
    return f"""
    WITH {body},
    efe AS ({_feats_sql(eval_src, dim)}),
    esc AS (
      SELECT f.doc_id, CAST(SUM(w.val * f.x) AS BIGINT) AS m
      FROM efe f JOIN qw{iters} w USING (pos)
      GROUP BY f.doc_id),
    ebase AS (
      SELECT s.doc_id, s.m,
             LEAST(GREATEST(s.m + {2 * S}, 0), {4 * S}) AS u,
             CAST(COALESCE(l.y, 0) AS BIGINT) AS y
      FROM esc s JOIN (SELECT doc_id, {label_sql} AS y FROM {eval_src}) l
        USING (doc_id)),
    esweep AS (
      SELECT k.k, CAST(k.k AS BIGINT) * {S // 2} AS thr,
             CAST(SUM(CASE WHEN u >= CAST(k.k AS BIGINT) * {S // 2} THEN y ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN u >= CAST(k.k AS BIGINT) * {S // 2} THEN 1 - y ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN u < CAST(k.k AS BIGINT) * {S // 2} THEN y ELSE 0 END)
                  AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN u < CAST(k.k AS BIGINT) * {S // 2} THEN 1 - y ELSE 0 END)
                  AS BIGINT) AS tn
      FROM ebase CROSS JOIN (SELECT UNNEST([{steps}]) AS k) k
      GROUP BY 1, 2),
    eranked AS (
      SELECT doc_id, m, y,
             CAST(ROW_NUMBER() OVER (ORDER BY m, doc_id) AS BIGINT) AS rank
      FROM ebase),
    egrp AS (SELECT m, MIN(rank) + MAX(rank) AS two_mid
             FROM eranked GROUP BY m),
    eauc AS (
      SELECT CAST(SUM(r.y * g.two_mid) - SUM(r.y) * (SUM(r.y) + 1)
                  AS BIGINT) AS auc_num,
             CAST(2 * SUM(r.y) * SUM(1 - r.y) AS BIGINT) AS auc_den
      FROM eranked r JOIN egrp g USING (m))
    SELECT CAST(k AS BIGINT) AS k, thr, outcome, cnt,
           CAST(NULL AS BIGINT) AS auc_num, CAST(NULL AS BIGINT) AS auc_den,
           CAST(NULL AS DOUBLE) AS auc
    FROM (
      SELECT k, thr, 'tp' AS outcome, tp AS cnt FROM esweep
      UNION ALL SELECT k, thr, 'fp', fp FROM esweep
      UNION ALL SELECT k, thr, 'fn', fn FROM esweep
      UNION ALL SELECT k, thr, 'tn', tn FROM esweep)
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS k, CAST(NULL AS BIGINT) AS thr,
           'auc' AS outcome, CAST(NULL AS BIGINT) AS cnt,
           auc_num, auc_den,
           CASE WHEN auc_den > 0
                THEN CAST(auc_num AS DOUBLE) / CAST(auc_den AS DOUBLE)
                ELSE NULL END AS auc
    FROM eauc
    """


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


def _qlr_train_ctes(
    src: str,
    dim: int,
    iters: int,
    lr_den: int,
    train_mod: int,
    label_sql: str,
) -> list[str]:
    """The shared training replay as a CTE list ending in
    qw{iters}(pos, val) — composed by both the score twin
    (qlr_suite_sql) and the eval twin (qlr_eval_suite_sql)."""
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
    return ctes


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
    ctes = _qlr_train_ctes(src, dim, iters, lr_den, train_mod, label_sql)
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
    reference label, score everything with the frozen weights.

    One corpus-wide feature frame serves both the training slice and
    the frozen scoring pass (r9 — previously each derived its own
    explode+groupBy feature pipeline; per-doc features commute with
    the doc_id filter, so the sliced frame is bit-identical)."""
    feats = qlr_labeled_features(docs, (F.col("lang") == "en")).localCheckpoint()
    w = qlr_train(
        None, feats=feats.filter(F.col("doc_id") % QLR_TRAIN_MOD == 0)
    )
    return qlr_score(None, w, feats=feats)
