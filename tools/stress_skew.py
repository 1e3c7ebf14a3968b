"""Skew stress bench (VERDICT r3 → r4 item #3): measure, don't argue.

Builds two 10×-blown-up twins of the sf0.1 tables under
``stress_data/`` (gitignored, regenerable):

  uniform/  same rows replicated 10× with fresh ids — no hot key
  skew/     identical row counts, but a planted hot key per table:
            30% of documents share ONE text (hot fingerprint),
            30% of events hit ONE user_id,
            30% of lineitem rows hit ONE l_orderkey,
            50% of orders carry ONE o_orderpriority,
            30% of embeddings carry ONE label

then times the skew-relevant operators on both and prints a markdown
table (pasted into SCALING.md §Measured) plus one JSON line. The claim
under test: no operator is >1.5× slower per input row on the skewed
twin — the salting / adaptive-grid / partial-agg designs absorb the
hot key rather than serializing on it.

Usage:  python tools/stress_skew.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "stress_data")
REPL = 10
HOT_TEXT = (
    "the same boilerplate paragraph repeated across the corpus exactly as crawl "
    "duplicates would be repeated across shards of a web scrape pipeline"
)


def _replicate(df, id_col):
    from pyspark.sql import functions as F

    r = F.explode(F.array(*[F.lit(i) for i in range(REPL)])).alias("__r")
    return (
        df.select("*", r)
        .withColumn(id_col, F.col(id_col) * REPL + F.col("__r"))
        .drop("__r")
    )


def _hot(df, id_col, pct):
    from pyspark.sql import functions as F

    return F.pmod(F.hash(F.col(id_col)), F.lit(100)) < pct


def build_datasets(spark) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(BASE, ignore_errors=True)
    for mode in ("uniform", "skew"):
        os.makedirs(os.path.join(BASE, mode), exist_ok=True)

    def write(df, mode, name):
        df.write.mode("overwrite").parquet(os.path.join(BASE, mode, f"{name}.parquet"))

    docs = _replicate(spark.read.parquet(f"{SF}/documents.parquet"), "doc_id")
    write(docs, "uniform", "documents")
    write(
        docs.withColumn(
            "text",
            F.when(_hot(docs, "doc_id", 30), F.lit(HOT_TEXT)).otherwise(F.col("text")),
        ),
        "skew",
        "documents",
    )

    ev = _replicate(spark.read.parquet(f"{SF}/events.parquet"), "event_id")
    write(ev, "uniform", "events")
    write(
        ev.withColumn(
            "user_id",
            F.when(_hot(ev, "event_id", 30), F.lit(1).cast("long")).otherwise(
                F.col("user_id")
            ),
        ),
        "skew",
        "events",
    )

    li = _replicate(
        spark.read.parquet(f"{SF}/lineitem.parquet").withColumn(
            "__rid", F.monotonically_increasing_id()
        ),
        "__rid",
    )
    li = li.withColumn("l_orderkey", F.col("l_orderkey") * REPL)
    hot_key = 10  # orderkey 1 × REPL — exists in the replicated orders
    write(li.drop("__rid"), "uniform", "lineitem")
    write(
        li.withColumn(
            "l_orderkey",
            F.when(_hot(li, "__rid", 30), F.lit(hot_key).cast("long")).otherwise(
                F.col("l_orderkey")
            ),
        ).drop("__rid"),
        "skew",
        "lineitem",
    )

    o = _replicate(spark.read.parquet(f"{SF}/orders.parquet"), "o_orderkey")
    write(o, "uniform", "orders")
    write(
        o.withColumn(
            "o_orderpriority",
            F.when(_hot(o, "o_orderkey", 50), F.lit("1-URGENT")).otherwise(
                F.col("o_orderpriority")
            ),
        ),
        "skew",
        "orders",
    )

    emb = _replicate(spark.read.parquet(f"{SF}/embeddings.parquet"), "vec_id")
    write(emb, "uniform", "embeddings")
    write(
        emb.withColumn(
            "label",
            F.when(_hot(emb, "vec_id", 30), F.lit(2).cast("long")).otherwise(
                F.col("label")
            ),
        ),
        "skew",
        "embeddings",
    )

    # semdedup's skew axis is a hot CELL (labels are ignored): bias
    # 30% of vectors strongly toward the first corpus vector's
    # direction (embedding + 3·v0) so they all quantize to its cell
    # while keeping distinct noise components — hot-cell occupancy
    # without the separate data property of an exploding dup-pair
    # OUTPUT (identical vectors would measure output volume, not
    # skew handling).
    v0 = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .first()["embedding"]
    )
    v0_lit = F.array(*[F.lit(float(x)) for x in v0])
    hot_emb = F.zip_with(
        F.col("embedding"), v0_lit, lambda x, y: (x + 3.0 * y).cast("float")
    )
    write(emb, "uniform", "embeddings_sem")
    write(
        emb.withColumn(
            "embedding",
            F.when(_hot(emb, "vec_id", 30), hot_emb).otherwise(F.col("embedding")),
        ),
        "skew",
        "embeddings_sem",
    )

    # text-SemDeDup's skew axis is likewise a hot CELL (r6): the
    # min-doc_id text becomes a PURE anchor phrase (so hashed-bigram
    # centroid 0 IS the anchor direction) and the skew twin appends
    # the anchor to 30% of docs — their vectors gain a strong shared
    # anchor component (argmax → cell 0) while pairwise cosines stay
    # ~0.3 ≪ τ=0.8 (the anchor is ~⅓ of each hot doc's bigram mass),
    # so the measurement is hot-cell OCCUPANCY, not a quadratic
    # identical-text dup-pair OUTPUT (verbatim 30% duplication makes
    # the τ-pair SET itself quadratic for any correct implementation —
    # the pipeline answer there is exact-dedup first, curate stage 1).
    mn = docs.agg(F.min("doc_id")).first()[0]
    anchored = docs.withColumn(
        "text", F.when(F.col("doc_id") == mn, F.lit(HOT_TEXT)).otherwise(F.col("text"))
    )
    write(anchored, "uniform", "documents_sem")
    write(
        anchored.withColumn(
            "text",
            F.when(
                (F.col("doc_id") != mn) & _hot(anchored, "doc_id", 30),
                F.concat_ws(" ", F.col("text"), F.lit(HOT_TEXT)),
            ).otherwise(F.col("text")),
        ),
        "skew",
        "documents_sem",
    )

    # contiguous_sequences' skew axis is ONE GIANT DOCUMENT (r6): the
    # skew twin moves the hot 30%'s entire token mass into a single
    # doc (the donors shrink to one token), so total volume matches
    # the uniform twin while one input row holds ~30% of the stream.
    # The op's claim: that row becomes many ≤SEQ_LEN slices, never one
    # giant reduce key. The giant row rides createDataFrame (not a
    # plan literal — a multi-MB literal would bloat every plan
    # stringification; see the curate checkpoint note).
    write(docs, "uniform", "documents_giant")
    hot = _hot(docs, "doc_id", 30)
    giant_txt = (
        docs.filter(hot)
        .agg(F.concat_ws(" ", F.collect_list("text")).alias("t"))
        .first()["t"]
    )
    mn_row = docs.orderBy("doc_id").first()
    giant_row = spark.createDataFrame(
        [
            (
                int(mn_row["doc_id"]),
                giant_txt,
                mn_row["lang"],
                mn_row["source"],
                len(giant_txt),
            )
        ],
        docs.schema.simpleString().replace("struct<", "").rstrip(">").replace(":", " "),
    )
    write(
        docs.filter(F.col("doc_id") != mn_row["doc_id"])
        .withColumn("text", F.when(hot, F.lit("x")).otherwise(F.col("text")))
        .unionByName(giant_row),
        "skew",
        "documents_giant",
    )


def queries():
    """name -> (callable(spark, sf_dir) -> row count, input-row table)."""
    from pyspark.sql import functions as F

    from mrbf_spark.bloom.core import build_bloom_filters
    from mrbf_spark.functions.similarity import neardup_pairs
    from mrbf_spark.operators.relational import sessionization
    from mrbf_spark.operators.skew import skew_ops
    from mrbf_spark.functions.dedup import (
        dedup_exact,
        dedup_incremental,
        exact_jaccard_pairs,
    )
    from mrbf_spark.functions.lm import lm_score, perplexity_buckets
    from mrbf_spark.functions.sketches import (
        cms_counters,
        cms_heavy_hitters,
        kmv_estimate,
        kmv_sketch,
    )
    from mrbf_spark.functions.retrieval import bm25_topk
    from mrbf_spark.functions.sampling import global_shuffle_shard
    from mrbf_spark.functions.substring_dedup import substring_dup_spans
    from mrbf_spark.tables import load_table

    def bloom_build(spark, sf_dir):
        orders = load_table(spark, sf_dir, "orders")
        return build_bloom_filters(orders, "o_orderpriority", "o_orderkey", 0.01)

    def neardup(spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        # cap chosen so the hot 30% label (≈6k rows) stays on the exact
        # path with a fully-engaged B_eff=16 salt grid — the machinery
        # under test (LSH fallback is a different algorithm; comparing
        # it against the uniform exact path would measure nothing).
        return neardup_pairs(emb, exact_cap=6000, salt_b=16)

    def jaccard_capped(spark, sf_dir):
        # max_df is the machinery under test: the skew twin's hot text
        # (30% of 50k docs verbatim-identical) would otherwise drive
        # the co-count join to ~C(15k,2)·|shingles| ≈ 10^10 rows — the
        # documented boilerplate relaxation must absorb it. df cap 50
        # keeps the uniform twin's 10×-replicated docs (df=10) exact.
        docs = load_table(spark, sf_dir, "documents")
        return exact_jaccard_pairs(docs, 0.2, max_df=50)

    def lm_entropy(spark, sf_dir):
        # hot-bigram stress (VERDICT r4 #6): the skew twin's hot text
        # puts 30% of all corpus bigrams on ~20 (prev, cur) keys; the
        # per-bigram count aggregates partial-agg those away and the
        # model join's hot keys ride AQE — expect ~1×.
        return lm_score(load_table(spark, sf_dir, "documents"))

    def ppl_buckets(spark, sf_dir):
        # tie-dense stress: 30% of docs share ONE text, hence ONE
        # cross-entropy value. The (score, doc_id) total-order rank
        # breaks ties deterministically without a single-task window;
        # range repartitioning must still spread the tied run.
        return perplexity_buckets(load_table(spark, sf_dir, "documents"))

    def bm25_hot_term(spark, sf_dir):
        # hot-query-term stress: "boilerplate"/"pipeline" appear in
        # 30% of the skew twin's docs, so those postings lists are
        # corpus-scale; the tf groupBy partial-aggregates per doc and
        # top-k is TakeOrderedAndProject — expect ~1×.
        return bm25_topk(
            load_table(spark, sf_dir, "documents"),
            ["boilerplate", "pipeline", "data"],
        )

    def kmv(spark, sf_dir):
        # hot-user stress: the 30%-hot user is ONE distinct item — the
        # per-(grp, h) partial-agg dedup collapses it map-side.
        return kmv_estimate(
            kmv_sketch(load_table(spark, sf_dir, "events"), "event_type", "user_id")
        )

    def cms(spark, sf_dir):
        # the hottest possible item just increments one counter per
        # grid row — partial agg bounds every map task at depth×width.
        return cms_counters(load_table(spark, sf_dir, "events"), "user_id")

    def cms_hh(spark, sf_dir):
        # the planted hot user IS a heavy hitter: the sketch prune
        # must keep its rows (never-underestimates) while the tail
        # dies map-side; the exact count's hot key partial-aggregates.
        ev = load_table(spark, sf_dir, "events")
        return cms_heavy_hitters(ev, "user_id", 2000)

    def semdedup_hotcell(spark, sf_dir):
        # hot-CELL stress (embeddings_sem twin): 30% of vectors are
        # biased into centroid 0's cell. cap=6000/salt_b=16 engages
        # the full salted grid on the ~6k-row hot cell, so its pair
        # space lands on 256 shuffle cells instead of one task; the
        # keeper join's hot vec_ids partial-aggregate in the distinct.
        from mrbf_spark.functions.similarity import semdedup_verdicts

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings_sem.parquet"))
        return semdedup_verdicts(emb, exact_cap=6000, salt_b=16)

    def dsir(spark, sf_dir):
        # hot-text stress: 30% of docs share ONE text, so ~30% of all
        # (bucket, count) feature mass lands on that text's ~2·len
        # buckets — but the feature groupBy keys on (doc_id, bucket)
        # (bounded at docs×B) and the model tables partial-agg to ≤B
        # rows before the broadcast join, so no reducer sees the hot
        # text's mass concentrated — expect ~1×.
        from mrbf_spark.functions.dsir import dsir_select

        docs = load_table(spark, sf_dir, "documents")
        return dsir_select(docs, F.col("lang") == "en")

    def bpe(spark, sf_dir):
        # hot-text stress: the hot words carry 30% of corpus token
        # mass, but word_counts is the classic partial-agg word count
        # (map-side combine collapses the hot words per task) and all
        # iterations run on the tiny (word, cnt) table.
        from mrbf_spark.functions.bpe import bpe_train

        docs = load_table(spark, sf_dir, "documents")
        merges = bpe_train(docs, num_merges=8)
        return spark.createDataFrame(
            merges, "rank int, a string, b string, n long"
        )

    def substr_spans(spark, sf_dir):
        # never pairs docs (window census + per-doc islands), so the
        # hot text must cost only its share of flagged positions.
        return substring_dup_spans(load_table(spark, sf_dir, "documents"))

    def repetition(spark, sf_dir):
        # every shuffle key carries doc_id (unit counts, top-k window,
        # coverage positions), so 30% of docs sharing ONE text creates
        # identical per-doc multisets, never a hot shuffle key —
        # expect ~1x.
        from mrbf_spark.functions.repetition import repetition_signals

        return repetition_signals(load_table(spark, sf_dir, "documents"))

    def merge(spark, sf_dir):
        # payload-skew stress (r6, VERDICT r5 #5): the full-outer
        # MERGE join keys on the UNIQUE pk, so key skew is impossible
        # by construction; the skew twin's 30%-hot user_id payload
        # rides the same uniform pk shuffle and the null-safe column
        # comparison is per-row — expect ~1×. (The partition-scoped
        # variant's hot-BUCKET increment touches FEWER partitions, a
        # pruning win, not a skew risk — plan-tested separately.)
        from mrbf_spark.functions.diffing import merge_upsert

        ev = load_table(spark, sf_dir, "events")
        old = ev.filter(F.pmod(F.col("event_id"), F.lit(97)) != 3)
        new = ev.filter(F.pmod(F.col("event_id"), F.lit(89)) != 7).withColumn(
            "value",
            F.when(
                F.pmod(F.col("event_id"), F.lit(11)) == 0, F.col("value") * 2
            ).otherwise(F.col("value")),
        )
        return merge_upsert(old, new, "event_id", delete_missing=True)

    def safe_split(spark, sf_dir):
        # giant-dup-cluster stress (r6): the skew twin's hot text is a
        # ~30%-of-corpus verbatim component. The r6 star-edge
        # sparsification keeps its edge set LINEAR (group-min stars;
        # the old fingerprint self-join would materialize ~10^8 edge
        # rows from this one text) and the Jaccard stage sees ONE
        # survivor for the whole group; CC then iterates over
        # edge-incident nodes and the split layer is map-only.
        from mrbf_spark.functions.dedup import leakage_safe_split

        return leakage_safe_split(load_table(spark, sf_dir, "documents"))

    def qsk_const(spark, sf_dir):
        # hot-group + constant-value stress (r6): user 1 holds 30% of
        # the skew twin's rows and its value column is forced constant
        # — the bottom-k sample's rank window must rewrite to the
        # map-side Partial WindowGroupLimit (no single-task sort of
        # the hot group) and the median's hash tie-break must absorb
        # the all-equal values. Uniform twin: user 1 is ordinary.
        from mrbf_spark.functions.sketches import bottomk_sample, sample_median

        ev = load_table(spark, sf_dir, "events").withColumn(
            "value",
            F.when(F.col("user_id") == 1, F.lit(0.5)).otherwise(F.col("value")),
        )
        return sample_median(bottomk_sample(ev, "user_id", "value", F.col("event_id")))

    def text_sem_hotcell(spark, sf_dir):
        # hot-cell stress over RAW TEXT (r6): 30% of docs carry the
        # anchor suffix and quantize to centroid 0's cell (see
        # build_datasets) — the textdedup twin of the measured
        # semdedup[hot-cell] row; the anchor adds ~⅓ extra bigram mass
        # to hot docs, so a ratio ≲1.2 already means the hot cell cost
        # only its share of rows.
        from mrbf_spark.functions.similarity import semdedup_verdicts
        from mrbf_spark.functions.text_embedding import (
            TEXT_SEM_TAU,
            text_hash_embeddings,
        )
        from mrbf_spark.registry import scoped_cache

        docs = spark.read.parquet(os.path.join(sf_dir, "documents_sem.parquet"))
        emb = scoped_cache(text_hash_embeddings(docs))
        emb.count()
        return semdedup_verdicts(emb, tau=TEXT_SEM_TAU)

    def contig_giant(spark, sf_dir):
        # one-giant-doc stress (r6): ~30% of the stream in ONE input
        # row. contiguous_sequences slices every doc per intersected
        # sequence (each piece ≤ SEQ_LEN tokens), so the giant doc
        # becomes ~n/SEQ_LEN bounded rows and every reduce key owns
        # exactly SEQ_LEN tokens — no giant key exists by construction.
        from mrbf_spark.functions.packing import contiguous_sequences

        return contiguous_sequences(
            spark.read.parquet(os.path.join(sf_dir, "documents_giant.parquet"))
        )

    def pq_hotcell(spark, sf_dir):
        # hot-code stress (r6): 30% of vectors share centroid 0's
        # direction (embeddings_sem), collapsing their PQ codes to the
        # same codewords. Per-row encode work is constant (K×M fixed
        # dots) and ADC candidate pruning is a map-side
        # WindowGroupLimit per query — identical codes change neither,
        # so the claim is data-independence of the scan cost.
        from mrbf_spark.functions.similarity import pq_topk

        return pq_topk(
            spark.read.parquet(os.path.join(sf_dir, "embeddings_sem.parquet"))
        )

    return {
        "dedup_exact": (dedup_exact, "documents"),
        # hot fingerprint joins ONE index row (min-agg collapses the
        # hot group); batch_min partial-aggregates — expect ~1×.
        "dedup_incremental": (dedup_incremental, "documents"),
        # md5-keyed layout is text-independent — the export must be
        # skew-immune by construction.
        "global_shuffle_shard": (global_shuffle_shard, "documents"),
        "skew_ops": (skew_ops, "lineitem"),
        "embedding_neardup[cap=6k]": (neardup, "embeddings"),
        "semdedup[hot-cell,cap=6k]": (semdedup_hotcell, "embeddings_sem"),
        "bloom_build(orders,p=.01)": (bloom_build, "orders"),
        "sessionization": (sessionization, "events"),
        "exact_jaccard[max_df=50]": (jaccard_capped, "documents"),
        "substring_dedup_spans": (substr_spans, "documents"),
        "repetition_signals[hot-text]": (repetition, "documents"),
        "lm_cross_entropy": (lm_entropy, "documents"),
        "perplexity_buckets": (ppl_buckets, "documents"),
        "bm25[hot_term]": (bm25_hot_term, "documents"),
        "dsir_select": (dsir, "documents"),
        "bpe_train[8 merges]": (bpe, "documents"),
        "kmv_distinct": (kmv, "events"),
        "cms_grid_build": (cms, "events"),
        "cms_heavy_hitters[T=2000]": (cms_hh, "events"),
        "merge_upsert[pk-unique]": (merge, "events"),
        "leakage_safe_split[giant-cluster]": (safe_split, "documents"),
        "quantile_sketch[hot-grp,const-val]": (qsk_const, "events"),
        "text_semdedup[hot-cell]": (text_sem_hotcell, "documents_sem"),
        "contiguous_sequences[giant-doc]": (contig_giant, "documents_giant"),
        "pq_topk[hot-code]": (pq_hotcell, "embeddings_sem"),
    }


def main() -> int:
    from mrbf_spark.registry import release_scoped_caches
    from mrbf_spark.session import get_spark

    spark = get_spark("stress-skew", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    if (
        "--rebuild" in sys.argv[1:]
        or not os.path.isdir(os.path.join(BASE, "skew"))
        # r6 added the documents_sem twin — rebuild older layouts
        or not os.path.exists(os.path.join(BASE, "skew", "documents_sem.parquet"))
        # late r6 added the giant-doc twin
        or not os.path.exists(os.path.join(BASE, "skew", "documents_giant.parquet"))
    ):
        t0 = time.time()
        build_datasets(spark)
        print(f"built stress datasets in {time.time() - t0:.1f}s", file=sys.stderr)

    only = {a for a in sys.argv[1:] if a != "--rebuild"}
    results = {}
    print("| query | rows | uniform s | skew s | ratio |")
    print("|---|---|---|---|---|")
    for name, (fn, table) in queries().items():
        if only and name.split("[")[0] not in only and name not in only:
            continue
        times, rows = {}, {}
        for mode in ("uniform", "skew"):
            d = os.path.join(BASE, mode)
            best = None
            for _ in range(2):  # warm twice, keep the best
                t0 = time.time()
                n = fn(spark, d).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                # ops that scoped_cache internally (exact_jaccard,
                # substring census, cms buckets) rely on the NEXT
                # registered query to release; this loop never runs
                # one, so release explicitly or the copies accumulate
                # in executor storage and skew later timings
                release_scoped_caches()
            times[mode], rows[mode] = best, n
        nrows = spark.read.parquet(os.path.join(BASE, "skew", f"{table}.parquet")).count()
        ratio = times["skew"] / times["uniform"]
        results[name] = {
            "rows": nrows,
            "uniform_s": round(times["uniform"], 2),
            "skew_s": round(times["skew"], 2),
            "ratio": round(ratio, 2),
        }
        print(
            f"| {name} | {nrows:,} | {times['uniform']:.2f} | {times['skew']:.2f} "
            f"| {ratio:.2f}× |"
        )
    print(json.dumps({"skew_stress": results}))
    worst = max(r["ratio"] for r in results.values())
    # Bound 1.5 since r5: the old 2.2 accommodated exact_jaccard's df
    # census shuffling the PRE-cap index by shingle (hot key included);
    # the broadcast-anti cap + repartition-at-cache fix measures 1.23×.
    # The bound guards against a hot-key BLOWUP (quadratic join,
    # single-task serialization — those measure 10-1000×), not noise
    # (±0.1-0.2 run to run on this box).
    print(f"worst skew/uniform ratio: {worst:.2f}× (bound: 1.5)", file=sys.stderr)
    return 0 if worst <= 1.5 else 1


if __name__ == "__main__":
    raise SystemExit(main())
