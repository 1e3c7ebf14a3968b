"""BM25 lexical retrieval over the documents table — the keyword-side
complement of the similarity module's embedding ANN (a training-data /
RAG pipeline needs both: dense recall AND exact lexical ranking).

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
division) so no engine ever materializes a rounded avgdl. Residual
cross-engine risk is the <1-ulp libm ln() landing exactly on a trunc
boundary — the same accepted, test-pinned risk as the LM scorer.

100 TB shape: one corpus scan → per-doc term frequencies for the
QUERY TERMS only (the IN filter prunes before the tf aggregation, so
the shuffle carries |query| × matching docs, not the corpus vocab);
df/N/total are broadcast scalars (collected as one tiny row); the
final per-doc sum partial-aggregates map-side; top-k is the standard
rank-filter (WindowGroupLimit pushes the limit into the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
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
    # twin (see module docstring): ln(1 + (N - df + 0.5)/(df + 0.5))
    # * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl*N/total)).
    dd = lambda c: c.cast("double")  # noqa: E731
    idf = F.ln(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - dd(F.col("df")) + F.lit(0.5))
        / (dd(F.col("df")) + F.lit(0.5))
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
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return f"""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                  FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) AS total FROM dl),
    tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks
           WHERE t IN ({terms}) GROUP BY 1, 2),
    dfs AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    term AS (SELECT tf.doc_id,
                    -- TRUNC before the cast: DuckDB's double->BIGINT
                    -- cast ROUNDS, Spark's truncates toward zero
                    CAST(TRUNC(LN(1.0 + (s.n_docs - CAST(dfs.df AS DOUBLE) + 0.5)
                                         / (CAST(dfs.df AS DOUBLE) + 0.5))
                               * (CAST(tf.tf AS DOUBLE) * {BM25_K1 + 1.0})
                               / (CAST(tf.tf AS DOUBLE)
                                  + {BM25_K1} * ({1.0 - BM25_B}
                                                 + {BM25_B} * CAST(dl.dl AS DOUBLE)
                                                   * s.n_docs / s.total))
                               * {float(BM25_SCALE)}) AS BIGINT) AS q
             FROM tf JOIN dfs USING (t) JOIN dl USING (doc_id) CROSS JOIN stats s),
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


# The registered catalog entry (r5, VERDICT r4 next-round #1): a fixed
# representative keyword query over the documents corpus — promoted
# from in-suite parity to an independent driver hash-check. The terms
# are common corpus vocabulary so every BM25 ingredient (idf spread,
# tf>1, length normalization, the top-k cut) is exercised.
BM25_QUERY_TERMS = ["table", "scan", "fast"]


@register("bm25_topk", bm25_duckdb_sql(BM25_QUERY_TERMS))
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load_table(spark, sf_dir, "documents"), BM25_QUERY_TERMS)
