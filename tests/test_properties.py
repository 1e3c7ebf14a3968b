"""Property-based tests (hypothesis): the engine's scalar semantics
pinned against their reference definitions over generated inputs."""

from __future__ import annotations

import pytest

import math

from hypothesis import given, settings, strategies as st

from mrbf_spark.bloom.sizing import num_bits, num_hashes


@given(st.floats(min_value=1e-9, max_value=0.999999))
def test_sizing_formulas_match_reference_math(p):
    # bloomfilters_util.py:15 — k = ceil(-ln p / ln 2)
    assert num_hashes(p) == math.ceil(-math.log(p) / math.log(2))


@given(st.integers(min_value=1, max_value=10**12), st.floats(min_value=1e-9, max_value=0.5))
def test_num_bits_positive_and_monotone_in_n(n, p):
    m = num_bits(n, p)
    assert m >= 1
    assert num_bits(n + 1, p) >= m  # more elements never shrink the filter


@given(st.floats(min_value=0.0, max_value=1e6, allow_nan=False))
def test_half_up_matches_reference_python(x):
    # the reference's int(float(x) + 0.5) (bloomfilters_util.py:98)
    # vs our floor(x + 0.5) — identical for the non-negative domain
    # IMDb ratings live in; property-checked rather than assumed.
    assert math.floor(x + 0.5) == int(x + 0.5)


# ---- engine-level properties on small generated corpora (one Spark
# round per example is too slow; batch the examples into one DataFrame).


def test_bloom_no_false_negatives_random_corpus(spark):
    """Any corpus: every inserted value probes positive (spec hard
    invariant) — checked over a hypothesis-generated corpus batch."""
    import pyspark.sql.functions as F

    from mrbf_spark.bloom import build_bloom_filters, probe_bloom_filters

    corpus = st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.text(min_size=0, max_size=40),
        ),
        min_size=1,
        max_size=300,
    ).example()
    df = spark.createDataFrame(corpus, "k string, v string")
    filters = build_bloom_filters(df, "k", "v", 0.05)
    probed = probe_bloom_filters(df, "k", "v", filters, k=num_hashes(0.05))
    assert probed.filter(F.col("bloom_hit") == 0).count() == 0


@given(
    st.lists(st.text(alphabet="ab ", min_size=1, max_size=30), min_size=1, max_size=8)
)
@settings(max_examples=10, deadline=None)
def test_fingerprint_whitespace_invariance(texts):
    """doc_fingerprint must be invariant to repeated spaces and case —
    its two normalization axes (checked via the same md5 the query
    computes, python-side to avoid a Spark round per example)."""
    import hashlib
    import re

    for t in texts:
        norm = lambda s: hashlib.md5(re.sub(" +", " ", s.lower()).encode()).hexdigest()
        assert norm(t) == norm(t.upper())
        assert norm(t) == norm(t.replace(" ", "  "))


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=14),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=6, deadline=None)
def test_exact_jaccard_pairs_match_python_bruteforce(spark, token_lists):
    """exact_jaccard_pairs (the registered dedup engine) against a
    pure-Python all-pairs reference on random tiny-alphabet corpora —
    the 4-token alphabet forces heavy shingle collisions, exercising
    the co-count join's correctness where it is hardest (ties, shared
    shingles everywhere, sub-n-gram short docs)."""
    from mrbf_spark.functions.dedup import exact_jaccard_pairs

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]

    def shingles(toks):
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 3, 0) + 1)}

    expected = {}
    for i, (ida, ta) in enumerate(docs):
        for idb, tb in docs[i + 1 :]:
            sa, sb = shingles(ta.split(" ")), shingles(tb.split(" "))
            c = len(sa & sb)
            j = c / (len(sa) + len(sb) - c)
            if j >= 0.2:
                expected[(ida, idb)] = j
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in exact_jaccard_pairs(df, 0.2).collect()
    }
    assert got == expected  # identical pair set AND bit-identical doubles


@given(st.binary(min_size=0, max_size=64), st.integers(min_value=0, max_value=2**31 - 1))
def test_murmur2_transcriptions_agree_on_arbitrary_bytes(data, seed):
    """Hypothesis sweep of the vendored Hadoop-murmur2 against the
    independent transcription in test_hadoop_flavor — arbitrary byte
    content exercises every tail length and the sign-extension path."""
    from mrbf_spark.bloom.hadoop_flavor import murmur2_32
    from test_hadoop_flavor import _murmur2_reference

    assert murmur2_32(data, seed) == _murmur2_reference(data, seed)


def test_incremental_dedup_matches_python_reference(spark):
    """Random corpus with planted duplicate structure, split into
    history/increment: incremental_dedup's statuses and keep_ids must
    equal a direct Python computation of the same semantics (history
    min-id per fingerprint, batch min-id, status precedence)."""
    import hashlib
    import re

    import pyspark.sql.functions as F

    from mrbf_spark.functions.dedup import incremental_dedup
    from mrbf_spark.functions.text import fingerprint_col

    corpus = st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=20), min_size=4, max_size=60
    ).example()
    rows = [(i, t) for i, t in enumerate(corpus)]
    hist = [(i, t) for i, t in rows if i % 3 == 0]
    inc = [(i, t) for i, t in rows if i % 3 != 0]

    fp = lambda s: hashlib.md5(re.sub(" +", " ", s.lower()).encode()).hexdigest()
    hist_min: dict[str, int] = {}
    for i, t in hist:
        hist_min[fp(t)] = min(hist_min.get(fp(t), i), i)
    batch_min: dict[str, int] = {}
    for i, t in inc:
        batch_min[fp(t)] = min(batch_min.get(fp(t), i), i)
    want = {}
    for i, t in inc:
        f = fp(t)
        if f in hist_min:
            want[i] = ("dup_of_history", hist_min[f])
        elif i > batch_min[f]:
            want[i] = ("dup_in_batch", batch_min[f])
        else:
            want[i] = ("new", i)

    hist_df = spark.createDataFrame(hist, "doc_id long, text string")
    inc_df = spark.createDataFrame(inc, "doc_id long, text string")
    index = (
        hist_df.select(fingerprint_col(F.col("text")).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("hist_id"))
    )
    got = {
        r["doc_id"]: (r["status"], r["keep_id"])
        for r in incremental_dedup(index, inc_df).collect()
    }
    assert got == want


def test_shard_key_balance_and_determinism(spark):
    """global shuffle-shard keys: deterministic across evaluations and
    uniform enough that no shard exceeds 2x the mean over a generated
    id set (including negative and huge ids)."""
    import pyspark.sql.functions as F

    from mrbf_spark.functions.sampling import N_SHARDS, shard_key_col

    # seeded, not hypothesis .example(): a fresh random draw each run
    # made the 2×-mean balance bound a coin flip at small n (observed
    # flaking in full-suite runs). The fixed draw keeps the intent —
    # huge magnitudes, both signs, unique — and a large-enough n that
    # the bound tests the hash, not multinomial luck.
    import numpy as np

    rng = np.random.RandomState(1234)
    ids = list(
        {int(x) for x in rng.randint(-(2**62), 2**62, size=2048, dtype=np.int64)}
    )
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = df.select(
        "doc_id",
        shard_key_col(F.col("doc_id")).alias("k"),
        F.pmod(shard_key_col(F.col("doc_id")), F.lit(N_SHARDS)).alias("shard"),
    )
    a = {r["doc_id"]: (r["k"], r["shard"]) for r in out.collect()}
    b = {r["doc_id"]: (r["k"], r["shard"]) for r in out.collect()}
    assert a == b
    counts: dict[int, int] = {}
    for _, s in a.values():
        counts[s] = counts.get(s, 0) + 1
        assert 0 <= s < N_SHARDS
    assert max(counts.values()) <= 2 * (len(ids) / N_SHARDS) + 1


def test_consistent_sample_k_monotone_and_deterministic(spark):
    """Bottom-k consistent sample: deterministic across repartition,
    monotone in k (k=20 ⊂ k=50), exactly k rows, and equal to the
    DuckDB twin (ORDER BY the same md5 key LIMIT k)."""
    import duckdb
    import pyspark.sql.functions as F

    from mrbf_spark.functions.sampling import SHARD_SEED, consistent_sample_k
    from mrbf_spark.tables import load_table

    SF = "/root/testdata/sf0.001"
    d = load_table(spark, SF, "documents")
    s50 = {r["doc_id"] for r in consistent_sample_k(d, "doc_id", 50).collect()}
    s20 = {r["doc_id"] for r in consistent_sample_k(d, "doc_id", 20).collect()}
    again = {
        r["doc_id"]
        for r in consistent_sample_k(d.repartition(13), "doc_id", 50).collect()
    }
    assert len(s50) == 50 and len(s20) == 20
    assert s20 <= s50
    assert again == s50

    duck = duckdb.connect().execute(
        f"""SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
            ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{SHARD_SEED}'),
                                     1, 15))::BIGINT, doc_id LIMIT 50"""
    ).fetchall()
    assert {r[0] for r in duck} == s50


def test_top_run_count_matches_counter(spark):
    """The sorted-array max-run fold behind repetition_stats must equal
    collections.Counter's most_common on random token arrays (tokens
    drawn from a small alphabet to force repeats and ties)."""
    import random
    from collections import Counter

    import pyspark.sql.functions as F

    from mrbf_spark.functions.text import _top_run_count

    rng = random.Random(11)
    arrays = [
        [rng.choice("abcdef") for _ in range(rng.randint(1, 40))] for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i int, arr array<string>"
    )
    got = {
        r["i"]: r["top"]
        for r in df.select("i", _top_run_count(F.col("arr")).alias("top")).collect()
    }
    for i, a in enumerate(arrays):
        assert got[i] == Counter(a).most_common(1)[0][1], (i, a)


def test_kmv_sketch_matches_python_reference(spark):
    """Any corpus: the KMV sketch equals the Python-computed k smallest
    distinct md5-60 hashes per group, and the estimator is exact below
    k — checked over a hypothesis-generated corpus batch (one Spark
    round; per-example rounds are too slow)."""
    import hashlib

    from mrbf_spark.functions.sketches import (
        KMV_K,
        SKETCH_SEED,
        kmv_estimate,
        kmv_sketch,
    )

    corpus = st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 500)),
        min_size=1,
        max_size=400,
    ).example()
    df = spark.createDataFrame(corpus, "grp string, item long")

    def h60(salt, v):
        return int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16)

    want = {}
    for grp in {g for g, _ in corpus}:
        hs = sorted({h60(f"kmv{SKETCH_SEED}", i) for g, i in corpus if g == grp})
        want.update({(grp, r + 1): h for r, h in enumerate(hs[:KMV_K])})
    got = {
        (r["grp"], r["rnk"]): r["h"]
        for r in kmv_sketch(df, "grp", "item").collect()
    }
    assert got == want
    est = {r["grp"]: r for r in kmv_estimate(kmv_sketch(df, "grp", "item")).collect()}
    for grp in est:
        n_true = len({i for g, i in corpus if g == grp})
        if n_true < KMV_K:
            assert est[grp]["est"] == float(n_true)


def test_cms_counts_match_python_reference(spark):
    """Any corpus: every count-min grid cell equals the Python-computed
    bucket census, and probes of every distinct item never
    underestimate its true frequency."""
    import hashlib
    from collections import Counter

    from mrbf_spark.functions.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        SKETCH_SEED,
        cms_counters,
        cms_probe,
    )

    items = st.lists(st.integers(0, 60), min_size=1, max_size=400).example()
    df = spark.createDataFrame([(str(i),) for i in items], "item string")

    def bucket(d, v):
        return (
            int(hashlib.md5(f"cms{SKETCH_SEED}d{d}:{v}".encode()).hexdigest()[:15], 16)
            % CMS_WIDTH
        )

    want = Counter((d, bucket(d, str(v))) for v in items for d in range(CMS_DEPTH))
    got = {
        (r["i"], r["bucket"]): r["cnt"] for r in cms_counters(df, "item").collect()
    }
    assert got == dict(want)
    truth = Counter(str(v) for v in items)
    probes = spark.createDataFrame([(k,) for k in truth], "item string")
    est = {
        r["item"]: r["cms_n"]
        for r in cms_probe(cms_counters(df, "item"), probes).collect()
    }
    assert all(est[k] >= truth[k] for k in truth)


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "cc"]), min_size=1, max_size=9),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=2, max_value=7),
)
@settings(max_examples=12, deadline=None)
@pytest.mark.slow
def test_contiguous_sequences_match_python_reference(spark, token_lists, seq_len):
    """contiguous_sequences against a pure-Python stream builder on
    random corpora and sequence lengths: identical sequence set,
    texts, token counts, AND doc_starts boundary lists — exercises
    every boundary case (doc exactly filling a row, multi-row docs,
    final short row, boundary-straddling EOS)."""
    from mrbf_spark.functions.packing import contiguous_sequences

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    stream, starts = [], []
    for _, text in docs:
        starts.append(len(stream))
        stream.extend(text.split(" ") + ["<eos>"])
    expected = {}
    n_seqs = (len(stream) + seq_len - 1) // seq_len
    for s in range(n_seqs):
        chunk = stream[s * seq_len : (s + 1) * seq_len]
        bounds = [str(p - s * seq_len) for p in starts if s * seq_len <= p < (s + 1) * seq_len]
        expected[s] = (len(chunk), " ".join(chunk), ",".join(bounds))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["seq_id"]: (r["seq_tokens"], r["seq_text"], r["doc_starts"])
        for r in contiguous_sequences(df, seq_len=seq_len).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.lists(
            st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0]), min_size=16, max_size=16
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=10, deadline=None)
def test_pq_codes_match_python_on_random_vectors(spark, vecs):
    """PQ encode on random tie-heavy vectors (coordinates from a tiny
    grid force exact fixed-point score ties) against a pure-Python
    replay — pins the argmax rule and the lowest-code tie-break where
    they are hardest."""
    import numpy as np

    import pyspark.sql.functions as F

    from mrbf_spark.functions.similarity import (
        FIXED_SCALE,
        K_CODES,
        M_SUB,
        _flat_centroids,
        _pq_cnorm_fixed,
        pq_codes_col,
        with_matrix,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    cb = _flat_centroids(df, K_CODES)
    sub = cb.shape[1] // M_SUB
    cn = _pq_cnorm_fixed(cb, sub)
    cnorm = F.array(*[F.array(*[F.lit(v).cast("long") for v in row]) for row in cn])
    got = {
        r["vec_id"]: r["codes"]
        for r in with_matrix(df, spark, cb)
        .select(
            "vec_id",
            pq_codes_col(F.col("embedding"), F.col("mat"), cnorm, sub).alias("codes"),
        )
        .collect()
    }
    for i, v in enumerate(vecs):
        x = np.array(v, dtype=np.float64)
        want = []
        for s in range(M_SUB):
            xs = x[s * sub : (s + 1) * sub]
            sc = [
                2
                * int(
                    np.trunc(
                        xs * cb[j, s * sub : (s + 1) * sub] * float(FIXED_SCALE)
                    )
                    .astype(np.int64)
                    .sum()
                )
                - cn[j][s]
                for j in range(cb.shape[0])
            ]
            want.append(int(np.argmax(sc)))
        assert got[i] == want, (i, got[i], want)


# ---- portable double aggregation (r7, the sf1-gate bug's guard) ----
#
# The sf1 scale gate caught `CAST(double AS DECIMAL(38,s))` rounding
# via Spark's SHORTEST decimal repr vs DuckDB's exact binary
# expansion — divergent for ~1-in-1e6 rows. dsum/dsum_sql now
# truncate the same IEEE double on both sides; this property test
# feeds ADVERSARIAL boundary values (multiples of 10^-s, half-ulp
# neighbors, shortest-repr traps like 0.1+0.2) and asserts exact
# cross-engine equality of the aggregate AND the per-row fixed-point.

def _boundary_doubles():
    from hypothesis import strategies as st

    plain = st.floats(
        min_value=-1e8, max_value=1e8, allow_nan=False, allow_infinity=False
    )
    # values engineered to sit at/near the scale-4 truncation boundary
    near_grid = st.integers(min_value=-10**12, max_value=10**12).map(
        lambda n: n / 10000.0
    )
    eps = st.sampled_from([0.0, 5e-13, -5e-13, 1e-10, -1e-10])
    gridish = st.tuples(near_grid, eps).map(lambda t: t[0] + t[1])
    return st.one_of(plain, gridish)


@settings(max_examples=20, deadline=None)
@given(st.lists(_boundary_doubles(), min_size=1, max_size=50))
def test_dsum_matches_duckdb_exactly_on_boundary_values(spark, xs):
    import duckdb

    from mrbf_spark.exprs import dfix, dfix_sql, dsum, dsum_sql

    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got_sum = df.agg(dsum("x").alias("s")).collect()[0]["s"]
    got_fix = [r["f"] for r in df.select(dfix("x").alias("f")).collect()]

    # Parameterized inserts, NOT inline literals: DuckDB parses an
    # unquoted numeric literal as DECIMAL, and its DECIMAL→DOUBLE cast
    # is not correctly rounded once the scaled integer exceeds 2^53
    # (CAST(90071992.99999999 AS DOUBLE) → 90071993.0, one ulp off the
    # correctly-rounded parse) — a literal-authoring trap, not a data
    # path: real tables arrive via parquet with exact doubles, which
    # is what the parameterized insert reproduces.
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(x),) for x in xs])
    want_sum = con.sql(f"SELECT {dsum_sql('x')} AS s FROM t").fetchone()[0]
    want_fix = [
        r[0] for r in con.sql(f"SELECT {dfix_sql('x')} FROM t").fetchall()
    ]
    assert got_fix == want_fix  # per-row truncation bit-identical
    # the sums are the same exact integer divided by the same power of
    # ten in the same IEEE op — equality is exact, not approximate
    assert got_sum == want_sum
