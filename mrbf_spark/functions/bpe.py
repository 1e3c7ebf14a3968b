"""Distributed BPE tokenizer training and encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").
The tokenizer-training step of an LLM data pipeline: learn the merge
table FROM the corpus, then encode the corpus with it — completing
the token family (token_stats counts whitespace/BPE-ish regex tokens
with a FIXED notion of token; this learns the subword vocabulary).

Reference scope: the reference engine has no tokenizer training; this
extends the documents-table curation family.

Algorithm fidelity: classic BPE on word frequencies — initial symbols
are the word's characters plus an end-of-word marker; each round
counts adjacent symbol pairs weighted by word frequency, merges the
most frequent pair everywhere (greedy left-to-right, non-overlapping),
and records it. Deterministic tie-break (count DESC, pair lexicographic
ASC) makes the learned merge table a pure function of the corpus.

100 TB shape — the standard two-level trick (what HF tokenizers does
single-node, distributed here):
- the corpus is scanned ONCE into a (word, count) table; every
  training iteration runs on that table, whose size is the corpus
  VOCABULARY (~100M rows at web scale), not the corpus;
- per-iteration pair counts partial-aggregate map-side (bounded by
  distinct pairs per task), and the arg-max is a TakeOrderedAndProject
  returning ONE row to the driver — driver traffic per merge is one
  (pair, count) tuple;
- the merge rewrite is a map-only higher-order fold over each word's
  symbol array (no shuffle), localCheckpoint-truncated so iteration i
  does not replay i−1 predecessor rewrites (the dedup_clusters CC
  lesson, dedup.py:940);
- encoding reuses the same fold per merge over the DISTINCT words of
  the corpus, then one join maps words back to documents — the corpus
  text itself is never rewritten N times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import register, scoped_cache
from ..tables import load_table

EOW = "</w>"  # end-of-word marker symbol
# truncate the encode plan's lineage every N chained fold rewrites
_CHECKPOINT_EVERY = 8


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): whitespace-token frequencies over lower(text) —
    the one corpus-sized scan of BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """+ syms: the word's characters followed by the end-of-word
    marker (['l','o','w','</w>'])."""
    chars = F.split(F.col("word"), "")  # Spark: 'low' -> ['l','o','w']
    return words.withColumn("syms", F.concat(chars, F.array(F.lit(EOW))))


def _merge_fold(syms: Column, a: str, bsym: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of the
    adjacent pair (a, b) with concat(a, b) — a single JVM higher-order
    fold, no Python. Equivalent to the scan-and-skip reference walk:
    the just-merged product can never itself equal `a` (it is strictly
    longer), so the fold never re-merges across a fresh product."""
    merged = a + bsym
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(bsym)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, n): adjacent symbol-pair frequencies weighted by word
    count. Words reduced to one symbol contribute nothing."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.size("syms") - 1),
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        words.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("n"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn up to num_merges BPE merges from the corpus; returns
    [(rank, a, b, pair_count)] in merge order. Stops early when the
    best remaining pair occurs fewer than min_pair_count times."""
    words = _initial_symbols(scoped_cache(word_counts(docs, text_col)))
    words = words.localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or int(best[0]["n"]) < min_pair_count:
            break
        a, bsym, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((rank, a, bsym, n))
        words = words.withColumn(
            "syms", _merge_fold(F.col("syms"), a, bsym)
        ).localCheckpoint()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, tokens): every document segmented by the
    learned merge table. The merges are applied to the corpus's
    DISTINCT words (each a chained map-only fold, lineage truncated
    every _CHECKPOINT_EVERY rewrites), then one equi-join maps words
    back to document positions — the document text is segmented via
    the word table, never rewritten once per merge."""
    toks = docs.select(
        id_col,
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos", "word"
        ),
    ).filter(F.col("word") != "")
    vocab = _initial_symbols(toks.select("word").distinct())
    for i, (_, a, bsym, _n) in enumerate(merges, start=1):
        vocab = vocab.withColumn("syms", _merge_fold(F.col("syms"), a, bsym))
        if i % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return (
        toks.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "syms"))
                ).syms
            ).alias("tokens")
        )
        .select(
            id_col,
            F.size("tokens").cast("long").alias("n_tokens"),
            "tokens",
        )
    )


def bpe_vocab(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """(token, cnt): the corpus token frequencies under the learned
    merge table (characters + EOW + merged subwords actually used)."""
    words = _initial_symbols(word_counts(docs, text_col))
    for i, (_, a, bsym, _n) in enumerate(merges, start=1):
        words = words.withColumn("syms", _merge_fold(F.col("syms"), a, bsym))
        if i % _CHECKPOINT_EVERY == 0:
            words = words.localCheckpoint()
    return (
        words.select("cnt", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


# --------------------------- the driver-checked entry + DuckDB twin
#
# r6 (VERDICT r5 next-round #4): the TRAIN loop itself gets a DuckDB
# twin — K chained recursive-CTE stages, each (1) counting adjacent
# symbol pairs weighted by word frequency from the previous fold
# state, (2) taking the deterministic argmax (n DESC, a, b), and
# (3) folding the merge through every word by iterated string
# replace to a fixpoint. The fold state is the word's symbol array
# rendered as '|sym|sym|…|' — '|' occurs in no corpus token
# (whitespace-split words; guarded by a test) — and
# replace(seq, '|a|b|', '|ab|') is exactly one greedy left-to-right
# non-overlapping pass EXCEPT that a match consumes the next
# occurrence's leading separator; iterating to fixpoint restores the
# missed adjacent matches (only possible when a == b, e.g. 'l l l l'),
# converging to the same result as the scan-and-skip reference walk:
# repeated leftmost-merge IS the greedy fold, and a merge can never
# create a new (a, b) occurrence because the product 'ab' is a single
# separator-free symbol. Early stop (best pair < min_count) is
# replicated by a WHERE on the argmax: an empty argmax leaves the
# fold state unchanged, so every later stage's argmax is empty too.

BPE_K = 12  # merges learned by the registered entry
BPE_MIN_COUNT = 2


def _bpe_oracle(k: int = BPE_K, min_count: int = BPE_MIN_COUNT, src: str = "documents") -> str:
    eow = EOW
    ctes = [
        f"""wc AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM {src})
           WHERE word <> '' GROUP BY word)""",
        f"""ff0 AS MATERIALIZED (SELECT word, cnt,
                  '|' || array_to_string(
                     [word[i] for i in generate_series(1, length(word))]
                       || ['{eow}'], '|') || '|' AS seq
           FROM wc)""",
    ]
    for r in range(1, k + 1):
        prev = f"ff{r - 1}"
        ctes.append(
            f"""p{r} AS MATERIALIZED (
          SELECT u.a AS a, u.b AS b, CAST(SUM(cnt) AS BIGINT) AS n
          FROM (SELECT cnt,
                       unnest([struct_pack(a := L[i], b := L[i+1])
                               for i in generate_series(1, len(L) - 1)]) AS u
                FROM (SELECT cnt,
                             list_filter(string_split(seq, '|'), x -> x <> '') AS L
                      FROM {prev})
                WHERE len(L) >= 2)
          GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""b{r} AS MATERIALIZED (
          SELECT ma, mb, mn FROM (SELECT 1 AS one)
          LEFT JOIN (SELECT a AS ma, b AS mb, n AS mn FROM p{r}
                     WHERE n >= {min_count}
                     ORDER BY n DESC, a, b LIMIT 1) ON TRUE)"""
        )
        ctes.append(
            f"""f{r}(word, cnt, seq, act) AS (
          SELECT word, cnt,
                 CASE WHEN ma IS NOT NULL
                       AND contains(seq, '|' || ma || '|' || mb || '|')
                      THEN replace(seq, '|' || ma || '|' || mb || '|',
                                   '|' || ma || mb || '|')
                      ELSE seq END,
                 ma IS NOT NULL
                   AND contains(seq, '|' || ma || '|' || mb || '|')
          FROM {prev}, b{r}
          UNION ALL
          SELECT word, cnt,
                 CASE WHEN contains(seq, '|' || ma || '|' || mb || '|')
                      THEN replace(seq, '|' || ma || '|' || mb || '|',
                                   '|' || ma || mb || '|')
                      ELSE seq END,
                 contains(seq, '|' || ma || '|' || mb || '|')
          FROM f{r}, b{r}
          WHERE act)"""
        )
        ctes.append(
            f"ff{r} AS MATERIALIZED (SELECT word, cnt, seq FROM f{r} WHERE NOT act)"
        )
    merge_rows = "\n    UNION ALL ".join(
        f"""SELECT 'merge' AS part, ma AS k1, mb AS k2,
               CAST({r} AS BIGINT) AS id, mn AS n, CAST(NULL AS VARCHAR) AS s
        FROM b{r} WHERE ma IS NOT NULL"""
        for r in range(1, k + 1)
    )
    nv, nb = "CAST(NULL AS VARCHAR)", "CAST(NULL AS BIGINT)"
    cte_block = ",\n    ".join(ctes)
    return f"""
    WITH RECURSIVE
    {cte_block},
    toklists AS (SELECT word,
                        list_filter(string_split(seq, '|'), x -> x <> '') AS tokL
                 FROM ff{k}),
    dtoks AS (SELECT doc_id, u.pos AS pos, u.w AS word
              FROM (SELECT doc_id,
                           unnest([struct_pack(pos := i, w := t[i])
                                   for i in generate_series(1, len(t))]) AS u
                    FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
                          FROM {src}))
              WHERE u.w <> '')
    {merge_rows}
    UNION ALL
    SELECT 'vocab' AS part, token AS k1, {nv} AS k2, {nb} AS id,
           CAST(SUM(cnt) AS BIGINT) AS n, {nv} AS s
    FROM (SELECT cnt, unnest(tokL) AS token
          FROM ff{k} JOIN toklists USING (word))
    GROUP BY token
    UNION ALL
    SELECT 'encode' AS part, {nv} AS k1, {nv} AS k2,
           CAST(doc_id AS BIGINT) AS id,
           CAST(SUM(len(tokL)) AS BIGINT) AS n,
           string_agg(array_to_string(tokL, ' '), ' ' ORDER BY pos) AS s
    FROM dtoks JOIN toklists USING (word)
    GROUP BY doc_id
    """


@register("bpe_suite", _bpe_oracle())
def bpe_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE, driver hash-checked end to end: learn BPE_K
    merges from the corpus ('merge' part: rank, pair, count — the
    TRAIN loop's argmax sequence), then the corpus token frequencies
    under them ('vocab' part) and every document's segmentation
    ('encode' part: token count + the space-joined token stream)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=BPE_K, min_pair_count=BPE_MIN_COUNT)
    nv = F.lit(None).cast("string")
    nb = F.lit(None).cast("long")
    merge_part = spark.createDataFrame(
        [(a, b, r, n) for r, a, b, n in merges],
        "k1 string, k2 string, id long, n long",
    ).select(F.lit("merge").alias("part"), "k1", "k2", "id", "n", nv.alias("s"))
    vocab_part = bpe_vocab(docs, merges).select(
        F.lit("vocab").alias("part"),
        F.col("token").alias("k1"),
        nv.alias("k2"),
        nb.alias("id"),
        F.col("cnt").alias("n"),
        nv.alias("s"),
    )
    encode_part = bpe_encode(docs, merges).select(
        F.lit("encode").alias("part"),
        nv.alias("k1"),
        nv.alias("k2"),
        F.col("doc_id").cast("long").alias("id"),
        F.col("n_tokens").alias("n"),
        F.array_join(F.col("tokens"), " ").alias("s"),
    )
    return merge_part.unionByName(vocab_part).unionByName(encode_part)
