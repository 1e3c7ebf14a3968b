"""BPE tokenizer training (functions/bpe.py): exact equality with a
pure-Python reference implementation (merges, encoding, vocab),
determinism under repartitioning, and the classic Sennrich corpus
shape."""

from __future__ import annotations

import collections

import pytest

from mrbf_spark.functions.bpe import EOW, bpe_encode, bpe_train, bpe_vocab
from mrbf_spark.tables import load_table

from conftest import SF_SMOKE


def ref_bpe(texts, num_merges, min_count=2):
    """Reference BPE: word frequencies, greedy left-to-right
    non-overlapping merge, tie-break (count desc, pair asc)."""
    wc = collections.Counter(w for t in texts for w in t.lower().split() if w)
    words = {w: list(w) + [EOW] for w in wc}
    merges = []
    for rank in range(1, num_merges + 1):
        pc = collections.Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < min_count:
            break
        merges.append((rank, a, b, n))
        m = a + b
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


SENNRICH = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest widest widest widest"),
]


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(SENNRICH, "doc_id long, text string")
    exp, _ = ref_bpe([t for _, t in SENNRICH], 10)
    got = bpe_train(docs, num_merges=10)
    assert got == exp
    # the first learned merges are the 'est'/'low' subwords the corpus
    # is built to teach
    assert [(a, b) for _, a, b, _ in got[:3]] == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
    ]


def test_bpe_encode_and_vocab_match_reference(spark):
    docs = spark.createDataFrame(SENNRICH, "doc_id long, text string")
    merges = bpe_train(docs, num_merges=10)
    _, ref_words = ref_bpe([t for _, t in SENNRICH], 10)
    enc = {
        r["doc_id"]: (r["n_tokens"], list(r["tokens"]))
        for r in bpe_encode(docs, merges).collect()
    }
    for doc_id, text in SENNRICH:
        exp_toks = [s for w in text.lower().split() if w for s in ref_words[w]]
        assert enc[doc_id] == (len(exp_toks), exp_toks)
    vocab = {r["token"]: r["cnt"] for r in bpe_vocab(docs, merges).collect()}
    exp_vocab = collections.Counter()
    for _, text in SENNRICH:
        for w in text.lower().split():
            exp_vocab.update(ref_words[w])
    assert vocab == dict(exp_vocab)


def test_bpe_min_pair_count_stops_early(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id long, text string"
    )
    # 'a b' occurs twice, everything after the first two merges ('a b'
    # then 'ab </w>') is a singleton pair
    merges = bpe_train(docs, num_merges=50, min_pair_count=2)
    assert [(a, b) for _, a, b, _ in merges] == [("a", "b"), ("ab", EOW)]


@pytest.mark.slow
def test_bpe_partition_invariant_on_testdata(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    m1 = bpe_train(docs.coalesce(1), num_merges=12)
    m2 = bpe_train(docs.repartition(17), num_merges=12)
    assert m1 == m2 and len(m1) == 12
    e1 = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(docs.coalesce(1), m1).collect()
    }
    e2 = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(docs.repartition(17), m1).collect()
    }
    assert e1 == e2
    # encoding is a segmentation: concatenating a doc's tokens minus
    # EOW markers reproduces the whitespace-joined lowered text
    row = docs.selectExpr("doc_id", "lower(text) AS t").first()
    joined = "".join(e1[row["doc_id"]]).replace(EOW, " ").strip()
    assert joined == " ".join(row["t"].split())


def test_merge_fold_equals_greedy_scan_randomized(spark):
    """The JVM fold used for merge application must equal the
    reference greedy left-to-right non-overlapping scan on arbitrary
    symbol sequences — including overlap runs (b b b b), products
    re-adjacent to the pair, and absent pairs. 400 seeded random
    sequences across 4 planted pairs, one Spark job per pair."""
    import numpy as np
    from pyspark.sql import functions as F

    from mrbf_spark.functions.bpe import _merge_fold

    rng = np.random.RandomState(7)
    alphabet = ["a", "b", "ab", "ba", "c"]

    def greedy(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    for a, b in [("a", "b"), ("b", "b"), ("a", "a"), ("ab", "a")]:
        seqs = [
            [alphabet[j] for j in rng.randint(0, len(alphabet), size=n)]
            for n in rng.randint(1, 12, size=100)
        ]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(seqs)], "i long, syms array<string>"
        )
        got = {
            r["i"]: list(r["m"])
            for r in df.select(
                "i", _merge_fold(F.col("syms"), a, b).alias("m")
            ).collect()
        }
        for i, s in enumerate(seqs):
            assert got[i] == greedy(s, a, b), (a, b, s, got[i])
