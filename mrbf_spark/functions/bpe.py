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

from pyspark.sql import Column, DataFrame, functions as F

from ..registry import scoped_cache

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
