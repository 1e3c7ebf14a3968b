"""BM25 lexical retrieval over the documents table — the keyword-side
complement of the similarity module's embedding ANN (a training-data /
RAG pipeline needs both: dense recall AND exact lexical ranking) —
plus dense-cosine retrieval over hashed text embeddings and hybrid
Reciprocal Rank Fusion of the two branches (Cormack, Clarke &
Buettcher 2009: score(d) = Σ_branches 1/(k0 + rank_b(d)), k0=60 —
the standard production hybrid-retrieval combiner).

Okapi BM25 (Robertson & Walker / the standard k1-b form):
  score(d, q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))

Determinism / parity design (the lm_cross_entropy pattern): each
per-(doc, term) score is computed as ONE double expression with a
fixed association order — mirrored token-for-token in the DuckDB twin
(tests/test_extensions.py::test_bm25_matches_duckdb) — then
fixed-pointed (trunc(1e9·score) → BIGINT) so the per-doc sum is exact
integer arithmetic, order-independent across partitionings and
engines. dl/avgdl is computed as dl·N/total (integers into one double
division) so no engine ever materializes a rounded avgdl. The idf is
libm-free (r9, the intlog.py kernel): 1 + (N−df+0.5)/(df+0.5) ≡
(2N+2)/(2df+1) exactly, so idf = (L2Q(2N+2) − L2Q(2df+1))/2^24·LN2 —
an exact integer difference converted to nats by IEEE-exact double
ops. Every remaining double op in the score is +,−,×,÷ on
deterministic operands (correctly rounded per IEEE 754), so no
cross-engine trunc-boundary risk remains (through r8 the idf came
from each engine's libm ln()).

100 TB shape: one corpus scan → per-doc term frequencies for the
QUERY TERMS only (the IN filter prunes before the tf aggregation, so
the shuffle carries |query| × matching docs, not the corpus vocab);
df/N/total are broadcast scalars (collected as one tiny row); the
final per-doc sum partial-aggregates map-side; top-k is the standard
rank-filter (WindowGroupLimit pushes the limit into the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register, scoped_cache
from ..tables import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_SCALE = 1_000_000_000  # 1e9 fixed point, matches the lm scorer
BM25_TOPK = 10


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, n_hit_terms, score_q, score, rnk) — top-k docs for the
    bag of query terms. score_q is the exact BIGINT fixed-point sum
    (the cross-engine comparable); score = score_q/1e9."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs, total = int(stats["n_docs"]), int(stats["total"])
    tf = (
        toks.filter(F.col("t").isin(*query_terms))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    # One double expression, association order mirrored in the DuckDB
    # twin (see module docstring): idf(t) ≡ ln((2N+2)/(2df+1)) via the
    # integer-exact L2Q kernel (intlog.py)
    # * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl*N/total)).
    from .intlog import FBITS, LN2, l2q_int, with_l2q

    df_ = with_l2q(
        df_.withColumn("__dfv", F.lit(2) * F.col("df") + F.lit(1)), "__dfv", "l2_df"
    ).drop("__dfv")
    dd = lambda c: c.cast("double")  # noqa: E731
    idf = (
        (F.lit(l2q_int(2 * n_docs + 2)) - F.col("l2_df")).cast("double")
        / F.lit(float(1 << FBITS))
        * F.lit(LN2)
    )
    norm = dd(F.col("tf")) + F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * dd(F.col("dl")) * F.lit(float(n_docs)) / F.lit(float(total))
    )
    term_q = (
        idf * (dd(F.col("tf")) * F.lit(k1 + 1.0)) / norm * F.lit(float(BM25_SCALE))
    ).cast("long")
    scored = (
        tf.join(F.broadcast(df_), "t")
        .join(dl, "doc_id")
        .select("doc_id", term_q.alias("q"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_terms"), F.sum("q").alias("score_q"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition
    # top-k then a k-row driver merge, no single-partition Window (a
    # global row_number would funnel every scored doc through one
    # task). rnk is then a row_number over just the k survivors.
    top = scored.orderBy(F.col("score_q").desc(), "doc_id").limit(k)
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("score_q").desc(), "doc_id")
    return top.select(
        "doc_id",
        "n_hit_terms",
        "score_q",
        (F.col("score_q").cast("double") / F.lit(float(BM25_SCALE))).alias("score"),
        F.row_number().over(w).alias("rnk"),
    )


def bm25_duckdb_sql(query_terms: list[str], k: int = BM25_TOPK) -> str:
    """The DuckDB twin of bm25_topk over the `documents` view —
    association order mirrored expression-for-expression."""
    from .intlog import FBITS, LN2, l2q_sql_ctes

    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""
    WITH RECURSIVE
    toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                  FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dl),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) AS total FROM dl),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks
           WHERE t IN ({terms}) GROUP BY 1, 2),
    dfs AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    {l2q_sql_ctes(
        "SELECT DISTINCT v FROM ("
        "SELECT 2 * df + 1 AS v FROM dfs"
        " UNION ALL SELECT 2 * (SELECT n FROM nd) + 2)"
    )},
    term AS (SELECT tf.doc_id,
                    -- TRUNC before the cast: DuckDB's double->BIGINT
                    -- cast ROUNDS, Spark's truncates toward zero
                    CAST(TRUNC(CAST((SELECT l2q FROM l2
                                     WHERE v = 2 * (SELECT n FROM nd) + 2)
                                    - l2d.l2q AS DOUBLE)
                                 / {float(1 << FBITS)} * CAST('{LN2!r}' AS DOUBLE)
                               * (CAST(tf.tf AS DOUBLE) * {BM25_K1 + 1.0})
                               / (CAST(tf.tf AS DOUBLE)
                                  + {BM25_K1} * ({1.0 - BM25_B}
                                                 + {BM25_B} * CAST(dl.dl AS DOUBLE)
                                                   * s.n_docs / s.total))
                               * {float(BM25_SCALE)}) AS BIGINT) AS q
             FROM tf JOIN dfs USING (t) JOIN dl USING (doc_id) CROSS JOIN stats s
             JOIN l2 l2d ON l2d.v = 2 * dfs.df + 1),
    scored AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_terms,
                      CAST(SUM(q) AS BIGINT) AS score_q
               FROM term GROUP BY doc_id)
    SELECT doc_id, n_hit_terms, score_q,
           CAST(score_q AS DOUBLE) / {float(BM25_SCALE)} AS score, rnk
    FROM (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id) AS INT)
                      AS rnk
          FROM scored) ranked
    WHERE rnk <= {k}
    """


# --- dense branch: cosine retrieval over hashed-bigram text
# embeddings (text_embedding.py) for a literal query string. 100 TB
# shape: the one-row query embedding broadcasts; the corpus embeds in
# one scan (text never shuffles); top-k is TakeOrderedAndProject.
RRF_K0 = 60  # the Cormack et al. constant
K_BRANCH = 20  # candidates per branch fed into the fusion
RRF_TOPK = 10


def dense_topk(docs: DataFrame, query_text: str, k: int = K_BRANCH) -> DataFrame:
    """(doc_id, cosine, rnk) — top-k docs by hashed-embedding cosine
    to the query string. Deterministic: fixed-point decimal dots, ties
    by doc_id."""
    from .similarity import _decimal_dot
    from .text_embedding import text_hash_embeddings

    spark = docs.sparkSession
    qdf = spark.createDataFrame([(-1, query_text)], "doc_id long, text string")
    q = text_hash_embeddings(qdf).select(
        F.col("embedding").alias("q_emb"),
        _decimal_dot(F.col("embedding"), F.col("embedding")).alias("q_nrm"),
    )
    c = text_hash_embeddings(docs).select(
        F.col("vec_id").alias("doc_id"),
        "embedding",
        _decimal_dot(F.col("embedding"), F.col("embedding")).alias("c_nrm"),
    )
    cosine = _decimal_dot(F.col("embedding"), F.col("q_emb")) / (
        F.sqrt(F.col("c_nrm")) * F.sqrt(F.col("q_nrm"))
    )
    scored = c.crossJoin(F.broadcast(q)).select("doc_id", cosine.alias("cosine"))
    top = scored.orderBy(F.col("cosine").desc(), "doc_id").limit(k)
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("cosine").desc(), "doc_id")
    return top.select("doc_id", "cosine", F.row_number().over(w).alias("rnk"))


# --- dense branch, production shape (r7, VERDICT r6 next-round #1):
# the batch `dense_topk` above embeds the WHOLE corpus inside every
# query — right for the self-contained catalog entry, wrong for
# repeated queries at 100 TB, where the corpus is embedded + PQ-encoded
# ONCE (build_dense_pq_index) and each query embeds only ITSELF and
# probes the persisted codes table (ann_index.pq_index_probe: broadcast
# LUT → integer ADC over the ~32×-smaller codes scan → exact decimal
# re-rank over the vec_id-IN-pushed-down vectors read). Per-query cost
# is then independent of corpus (re-)embedding — the bench row
# `dense_topk_indexed` times exactly the probe.
# Operating point (measured, sf0.01, query=QUERY_TEXT, k=20 — the
# sweep is in SCALING.md's PQ recall table): flat Forgy codebooks give
# recall 0.70/0.90/1.00 at cand=160/320/640; KMEANS-refined codebooks
# give 0.95/1.00/1.00 with a ~2× one-time build cost and identical
# probe cost. Defaults below (kmeans build, cand=16·k) sit at measured
# recall 1.00 with a factor-2 cand margin over the 0.95 point.
DENSE_IDX_CAND_FACTOR = 16  # ADC survivors per requested result


def build_dense_pq_index(docs: DataFrame, path: str, use_kmeans: bool = True):
    """Embed the corpus (hashed-bigram text embeddings) and persist the
    PQ index at `path` (codes + vectors + codebook); returns the
    codebook matrix. Build-once: every subsequent dense_topk_indexed
    probe reads only the persisted tables. use_kmeans=True (default)
    refines the per-subspace codebooks with the distributed Lloyd loop
    — measured recall 0.95→1.00 vs 0.70→1.00 flat across the cand
    sweep, for ~2× one-time build cost."""
    from .ann_index import write_pq_index
    from .text_embedding import text_hash_embeddings

    return write_pq_index(text_hash_embeddings(docs), path, use_kmeans=use_kmeans)


def dense_topk_indexed(
    spark: SparkSession,
    path: str,
    query_text: str,
    k: int = K_BRANCH,
    cand: int | None = None,
) -> DataFrame:
    """(doc_id, cosine, rnk) — the dense branch served from the
    persisted PQ index at `path`: embeds ONLY the query string (one
    row), never touches corpus text. `cand` is the ADC survivor count
    fed to the exact re-rank (default DENSE_IDX_CAND_FACTOR·k; the
    re-rank makes every returned cosine EXACT, so approximation shows
    up only as missing tail members, never as a wrong score —
    recall-floor-tested against the exact dense_topk in
    tests/test_extensions.py)."""
    from .ann_index import pq_index_probe
    from .text_embedding import text_hash_embeddings

    if cand is None:
        cand = DENSE_IDX_CAND_FACTOR * k
    qdf = spark.createDataFrame([(-1, query_text)], "doc_id long, text string")
    q = text_hash_embeddings(qdf).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = pq_index_probe(spark, path, q, topk=k, cand=cand, exclude_self=False)
    return res.select(F.col("vec_id").alias("doc_id"), "cosine", "rnk")


def rrf_fuse(
    branches: list[DataFrame], k0: int = RRF_K0, topk: int = RRF_TOPK
) -> DataFrame:
    """(doc_id, n_branches, fused_q, rnk) — Reciprocal Rank Fusion of
    (doc_id, rnk) branch rankings. Each branch contributes the exact
    BIGINT trunc(1e9/(k0+rnk)), so the fused score is integer
    arithmetic (order-independent, engine-portable); final order is
    (fused_q desc, doc_id)."""
    contrib = (
        F.lit(1_000_000_000.0)
        / (F.lit(float(k0)) + F.col("rnk").cast("double"))
    ).cast("long")
    rows = branches[0].select("doc_id", contrib.alias("c"))
    for b in branches[1:]:
        rows = rows.unionAll(b.select("doc_id", contrib.alias("c")))
    fused = rows.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_branches"), F.sum("c").alias("fused_q")
    )
    top = fused.orderBy(F.col("fused_q").desc(), "doc_id").limit(topk)
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("fused_q").desc(), "doc_id")
    return top.select(
        "doc_id", "n_branches", "fused_q", F.row_number().over(w).alias("rnk")
    )


# The registered catalog entry (r5, VERDICT r4 next-round #1): a fixed
# representative keyword query over the documents corpus — promoted
# from in-suite parity to an independent driver hash-check. The terms
# are common corpus vocabulary so every BM25 ingredient (idf spread,
# tf>1, length normalization, the top-k cut) is exercised.
# Since late r6 the entry is the three-part retrieval suite: 'bm25'
# (lexical top-K_BRANCH), 'dense' (hashed-embedding cosine
# top-K_BRANCH for the same query text), 'rrf' (their Reciprocal Rank
# Fusion, top-RRF_TOPK). Normalized columns: n1 = n_hit_terms /
# NULL / n_branches; score_q = BM25 fixed-point / NULL / fused_q.
BM25_QUERY_TERMS = ["table", "scan", "fast"]
QUERY_TEXT = " ".join(BM25_QUERY_TERMS)


def _retrieval_suite_oracle() -> str:
    from .text_embedding import text_embeddings_sql

    q_src = f"(SELECT -1 AS doc_id, '{QUERY_TEXT}' AS text)"
    fixsum = (
        "CAST(CAST(SUM(CAST(TRUNC(CAST({a} AS DOUBLE) * CAST({b} AS DOUBLE)"
        " * 1000000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000000.0"
    )
    rrf_c = f"CAST(TRUNC(1000000000.0 / ({float(RRF_K0)} + CAST(rnk AS DOUBLE))) AS BIGINT)"
    return f"""
    WITH lex AS ({bm25_duckdb_sql(BM25_QUERY_TERMS, K_BRANCH)}),
    dense AS (
      WITH qe AS ({text_embeddings_sql(src=q_src)}),
      de AS ({text_embeddings_sql()}),
      qn AS (SELECT vec_id, {fixsum.format(a='x', b='x')} AS nrm
             FROM (SELECT vec_id, UNNEST(embedding) AS x FROM qe) GROUP BY vec_id),
      dn AS (SELECT vec_id, {fixsum.format(a='x', b='x')} AS nrm
             FROM (SELECT vec_id, UNNEST(embedding) AS x FROM de) GROUP BY vec_id),
      ddots AS (
        SELECT doc_id, {fixsum.format(a='xa', b='xb')} AS dot
        FROM (SELECT d.vec_id AS doc_id,
                     UNNEST(d.embedding) AS xa, UNNEST(q.embedding) AS xb
              FROM de d, qe q)
        GROUP BY doc_id),
      dcos AS (SELECT t.doc_id,
                      t.dot / (SQRT(dn.nrm) * SQRT(qn.nrm)) AS cosine
               FROM ddots t
               JOIN dn ON dn.vec_id = t.doc_id
               CROSS JOIN qn)
      SELECT doc_id, cosine, rnk FROM (
        SELECT doc_id, cosine,
               CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS rnk
        FROM dcos) r
      WHERE rnk <= {K_BRANCH}),
    contrib AS (
      SELECT doc_id, {rrf_c} AS c FROM lex
      UNION ALL
      SELECT doc_id, {rrf_c} AS c FROM dense),
    fused AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_branches,
                     CAST(SUM(c) AS BIGINT) AS fused_q
              FROM contrib GROUP BY doc_id),
    rrf AS (SELECT doc_id, n_branches, fused_q, rnk FROM (
              SELECT doc_id, n_branches, fused_q,
                     CAST(ROW_NUMBER() OVER (ORDER BY fused_q DESC, doc_id) AS INT)
                       AS rnk
              FROM fused) r
            WHERE rnk <= {RRF_TOPK})
    SELECT 'bm25' AS part, rnk, doc_id, n_hit_terms AS n1, score_q, score
    FROM lex
    UNION ALL
    SELECT 'dense' AS part, rnk, doc_id, CAST(NULL AS BIGINT) AS n1,
           CAST(NULL AS BIGINT) AS score_q, cosine AS score
    FROM dense
    UNION ALL
    SELECT 'rrf' AS part, rnk, doc_id, n_branches AS n1, fused_q AS score_q,
           CAST(fused_q AS DOUBLE) / 1000000000.0 AS score
    FROM rrf
    """


@register("bm25_topk", _retrieval_suite_oracle())
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval suite: lexical BM25 ∪ dense cosine ∪ RRF hybrid
    for one representative query (see the comment above)."""
    docs = load_table(spark, sf_dir, "documents")
    nb = F.lit(None).cast("long")
    # each branch feeds BOTH its own part and the fusion — cache the
    # K_BRANCH-row results so the corpus-scan lineage runs once per
    # branch, not twice
    lex = scoped_cache(bm25_topk(docs, BM25_QUERY_TERMS, k=K_BRANCH))
    dense = scoped_cache(dense_topk(docs, QUERY_TEXT, k=K_BRANCH))
    fused = rrf_fuse([lex.select("doc_id", "rnk"), dense.select("doc_id", "rnk")])
    return (
        lex.select(
            F.lit("bm25").alias("part"), "rnk", "doc_id",
            F.col("n_hit_terms").alias("n1"), "score_q", "score",
        )
        .unionByName(
            dense.select(
                F.lit("dense").alias("part"), "rnk", "doc_id",
                nb.alias("n1"), nb.alias("score_q"),
                F.col("cosine").alias("score"),
            )
        )
        .unionByName(
            fused.select(
                F.lit("rrf").alias("part"), "rnk", "doc_id",
                F.col("n_branches").alias("n1"),
                F.col("fused_q").alias("score_q"),
                (F.col("fused_q").cast("double") / F.lit(1e9)).alias("score"),
            )
        )
    )
