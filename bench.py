"""Per-round benchmark: ALL catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`queries` carries a per-query wall time for every registered catalog
entry (so round-over-round regressions are visible per operator), plus
the r01 headline names that were consolidated into merged entries —
kept as importable builders so the bench key set only ever grows.
`value` stays the 17-query headline total (same key set as r01) for a
comparable top-line number. NB r4: the headline key dedup_minhash_lsh
computes strictly more than in r1-r3 (the exact Jaccard-≥0.2 pair set
with a hash-matched oracle, vs τ=0.5 LSH candidates) — the headline
absorbs that by-design cost; `dedup_minhash_lsh_scalepath` times the
r3-comparable probabilistic path. NB late r5: `lm_suite` additionally
computes the DSIR part (its own hashed-feature pipeline) and
`substring_dedup_spans` additionally computes the cut part (corpus
rewrite) — both grew on purpose when those ops were promoted into the
driver-checked window; round-over-round increases on those two keys
price the added semantics, not a regression. NB r6: `lm_suite` further
adds the frozen-model part, `data_ops_suite` the merge part,
`sampling_suite` the shard part, `quality_signals` the PII columns,
`dedup_clusters` the split layer, and `curate_corpus` / `bpe_suite`
are newly timed end-to-end entries — priced scope growth again.
NB r8: `lm_suite` additionally computes the
part=qlr learned quality classifier (8 all-integer training
iterations over hashed-bigram features + a frozen-weights scoring
pass) — increases on that key price the added part, not a regression
of the LM paths. NB late r6: `decontaminate` adds the SEMANTIC part (hashed-embedding
nearest-eval cosine, a second contamination channel) AFTER the r6
noise adjudication pinned its r4-identical plan (SCALING.md) — any
increase on that key vs the adjudicated [4.38..5.24] window prices
the new part (timed standalone as `semantic_decontam`), not a
regression of the ngram path. Also late r6: `bm25_topk` becomes the
retrieval SUITE (lexical top-20 + dense hashed-embedding top-20 + RRF
fusion) — the r4-comparable lexical-only cost stays visible as
`bm25_lexical`. Also late r6: `packing_suite` adds the GPT-style
contiguous-sequence part and `ann_approx_topk` adds the PQ
(product-quantization) index — both timed standalone
(`contiguous_sequences`, `ann_pq_topk`) and contained; increases on
the suite keys price the added parts. Likewise `sampling_suite` adds
part=temp (temperature mixture, standalone `temperature_mixture`) and
`dedup_exact` adds the source-priority keeper column (same single
aggregate — a column, not a pass).

MEASUREMENT (r6, VERDICT r5 what's-wrong #1; r7 adds the discarded
sweep — see N_DISCARD): per-query MEDIAN of N_ROUNDS=3 INTERLEAVED
steady-state sweeps (after 1 warm-up pass + 1 discarded timed sweep),
with the (max−min) spread emitted per query — same-round repeats on this host differ by up to 1.5× in
noisy-neighbor bursts, so a round-over-round delta is only a
regression when it exceeds the measured spread. Interleaving (a full
sweep between repeats) keeps the three draws independent of any one
burst.

CONTAINED ROWS: the standalone keys in CONTAINED re-time work a suite
key already contains (kept only so the bench key set never shrinks);
their cost must NOT be added to their suite's — the engine runs that
work once. They are excluded from the headline by construction.

Each query executes its full plan into the noop sink (no driver-side
collect cost) after a warm-up of the session.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship bloom pipeline + one representative of
# each operator family — the same 17 keys as BENCH_r01, so `value` is
# comparable round over round.
HEADLINE = [
    "bloom_fp_report",
    "bloom_semijoin_prune",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "broadcast_join_agg",
    "topk_per_group",
    "sessionization",
    "grouped_count_halfup",
    "json_extract_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "curation_pipeline",
    "ann_bruteforce_topk",
    "window_tumbling",
    "token_stats",
    "skew_salted_join",
]

# Standalone rows whose work is contained in a suite row — see the
# module docstring. Mapping: standalone key -> containing suite key.
CONTAINED = {
    "lm_cross_entropy": "lm_suite",
    "perplexity_buckets": "lm_suite",
    "text_semdedup": "embedding_dedup_suite",
    "semdedup": "embedding_dedup_suite",
    "embedding_neardup": "embedding_dedup_suite",
    "quality_rules": "quality_signals",
    "quality_lang": "quality_signals",
    "pii_redaction": "quality_signals",
    "repetition_stats": "token_stats",
    "validate_events": "data_ops_suite",
    "profile_events": "data_ops_suite",
    "snapshot_diff": "data_ops_suite",
    "corpus_mixture": "sampling_suite",
    "stratified_sample": "sampling_suite",
    "global_shuffle_shard": "sampling_suite",
    "kmv_distinct": "stats_aggregates",
    "cms_frequencies": "stats_aggregates",
    "quantile_sketch": "stats_aggregates",
    "cms_heavy_hitters": "stats_aggregates",
    "leakage_safe_split": "dedup_clusters",
    "semantic_decontam": "decontaminate",
    "bm25_lexical": "bm25_topk",
    "contiguous_sequences": "packing_suite",
    "ann_pq_topk": "ann_approx_topk",
    "temperature_mixture": "sampling_suite",
    # r7: mining rides the suite (shared near-dup pair scan, part=mining)
    "contrastive_triplets": "embedding_dedup_suite",
    # r8: the learned quality tier rides lm_suite as part=qlr
    "quality_classifier": "lm_suite",
}

N_ROUNDS = 3  # KEPT interleaved sweeps per query; median reported
# r7 (VERDICT r6 what's-wrong #1 / next-round #4): one extra timed
# sweep that is DISCARDED from the median/spread statistics. The r6
# samples showed the first timed sweep running 2-4× slow on the
# embedding-heavy entries in SOME environments (bench_full.json r6:
# ann_approx_topk [17.9, 3.8, 4.6]) even though the warm-up pass had
# already executed every plan once — a second cold surface (page
# cache / code cache after the ~90-query warm-up walked the whole
# suite) that median-of-3 absorbed but that inflated the spread field
# to useless. The discarded sweep is still interleaved and still
# recorded in bench_full.json samples (index 0) for full disclosure;
# the stats are computed over the N_ROUNDS steady-state sweeps only.
N_DISCARD = 1
# r8 (VERDICT r7 what's-wrong #1 / next-round #3): the recorded
# artifact must be stable regardless of WHEN the driver snapshots —
# r7's final bench landed in a contention window and 18 queries
# recorded spreads > 50% of their median (json_extract_agg: 0.52 s
# median, 17.7 s spread), making round-over-round deltas unreadable.
# Retry policy: after the base sweeps, any query whose (max−min)
# spread exceeds RETRY_SPREAD_FRAC × median gets up to
# MAX_RETRY_ROUNDS additional interleaved sweeps; each retry round
# also trims one more sample off EACH end (lowest and highest) before
# the stats — SYMMETRIC, so a burst cannot dominate the recorded
# number but the trim itself cannot bias the median downward either
# (r8 trimmed only the high end, which — combined with the retries
# running in a quieter flagged-only context — could only LOWER the
# recorded medians of exactly the unstable keys; ADVICE r8). Retried
# keys are disclosed as reduced-comparability in the headline
# artifact; all raw samples stay in bench_full.json.
RETRY_SPREAD_FRAC = 0.5
MAX_RETRY_ROUNDS = 3


def legacy_builders() -> dict:
    """r01 bench names whose catalog entries were consolidated away —
    still importable builders, timed so BENCH keys stay a superset."""
    from mrbf_spark import tables as _tables
    from mrbf_spark.functions import dedup as _dedup
    from mrbf_spark.functions import lm as _lm
    from mrbf_spark.functions import packing as _packing
    from mrbf_spark.functions import quality_rules as _quality_rules
    from mrbf_spark.functions import validation as _validation
    from mrbf_spark.functions import decontam as _decontam
    from mrbf_spark.functions import diffing as _diffing
    from mrbf_spark.functions import retrieval as _retrieval
    from mrbf_spark.functions import sampling as _sampling
    from mrbf_spark.functions import similarity as _similarity
    from mrbf_spark.functions import text_embedding as _text_embedding
    from mrbf_spark.functions import sketches as _sketches
    from mrbf_spark.functions import text as _text
    from mrbf_spark.operators import bloom_queries, relational, skew
    from mrbf_spark.streaming import windows

    return {
        "bloom_fp_report": bloom_queries.bloom_fp_report_q,
        "q5_local_supplier_volume": relational.q5_local_supplier_volume,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "json_extract_agg": relational.json_extract_agg,
        "window_tumbling": windows.window_tumbling,
        "skew_salted_join": skew.skew_salted_join,
        # consolidated into `topk_order_limit` in r2; keys kept
        "topk_per_group": relational.topk_per_group,
        "order_limit": relational.order_limit,
        # consolidated in r4 (slots freed for the promoted LLM-pipeline
        # entries); keys kept so BENCH timings stay comparable
        "grouped_count_halfup": relational.grouped_count_halfup,
        "ratio_metric": relational.ratio_metric,
        "projection_filter": relational.projection_filter,
        "union_scan": relational.union_scan,
        "date_trunc_month": relational.date_trunc_month,
        "approx_aggregates": relational.approx_aggregates,
        "median_stats": relational.median_stats,
        # consolidated later in r4 (slots freed for global_shuffle_shard
        # and dedup_incremental); keys kept
        "corpus_mixture": _sampling.corpus_mixture,
        "stratified_sample": _sampling.stratified_sample,
        "doc_fingerprint": _text.doc_fingerprint,
        # consolidated in r5 (slots freed to promote the library tier
        # into the driver-checked catalog); keys kept so BENCH timings
        # stay comparable round over round
        "repetition_stats": _text.repetition_stats,
        "quality_lang": _text.quality_lang,
        "session_window_agg": windows.session_window_agg,
        "lm_cross_entropy": _lm.lm_cross_entropy,
        "sequence_packing": _packing.sequence_packing,
        # NOT a consolidation: the catalog's dedup_minhash_lsh computes
        # the EXACT Jaccard-≥0.2 pair set since r4 (hash-matched oracle,
        # strictly more work than r3's τ=0.5 LSH candidates). This key
        # times the probabilistic MinHash+LSH scale path at the r3
        # operating point so the speed-comparable number stays in BENCH.
        "dedup_minhash_lsh_scalepath": lambda spark, sf_dir: _dedup.minhash_candidates(
            _tables.load_table(spark, sf_dir, "documents"),
            threshold=0.5,
            guaranteed=False,
        ),
        # r4 library-tier ops (in-suite DuckDB parity instead of a
        # catalog slot) — timed so BENCH covers the whole surface.
        "bm25_topk": lambda spark, sf_dir: _retrieval.bm25_topk(
            _tables.load_table(spark, sf_dir, "documents"), ["table", "scan", "fast"]
        ),
        "chunk_documents": lambda spark, sf_dir: _packing.chunk_documents(
            _tables.load_table(spark, sf_dir, "documents")
        ),
        "perplexity_buckets": lambda spark, sf_dir: _lm.perplexity_buckets(
            _tables.load_table(spark, sf_dir, "documents")
        ),
        "quality_rules": lambda spark, sf_dir: _quality_rules.quality_rules(
            _tables.load_table(spark, sf_dir, "documents")
        ),
        "validate_events": lambda spark, sf_dir: _validation.validate_events(
            _tables.load_table(spark, sf_dir, "events"),
            _tables.load_table(spark, sf_dir, "customer"),
        ),
        "profile_events": lambda spark, sf_dir: _validation.profile_table(
            _tables.load_table(spark, sf_dir, "events")
        ),
        "snapshot_diff": _diffing.diff_events,
        # consolidated late r5 into embedding_dedup_suite; keys kept so
        # BENCH timings stay comparable round over round
        "embedding_neardup": _similarity.embedding_neardup,
        "semdedup": _similarity.semdedup,
        "text_semdedup": _text_embedding.text_semdedup,
        # distributed full-corpus Lloyd (late r5): the timed action is
        # the fit's per-iteration corpus passes; the returned 16-row
        # centroid frame only carries the result to the noop sink
        "kmeans_fit": lambda spark, sf_dir: spark.createDataFrame(
            [
                (i, [float(x) for x in row])
                for i, row in enumerate(
                    _similarity.kmeans_fit(
                        _tables.load_table(spark, sf_dir, "embeddings")
                    )
                )
            ],
            "cid int, centroid array<double>",
        ),
        # r5 deterministic sketch family (registered via
        # stats_aggregates parts; timed standalone here)
        "kmv_distinct": _sketches.kmv_distinct,
        "cms_frequencies": _sketches.cms_frequencies,
        "quantile_sketch": _sketches.quantile_sketch,
        "cms_heavy_hitters": _sketches.cms_heavy_hitters_q,
        "leakage_safe_split": lambda spark, sf_dir: _dedup.leakage_safe_split(
            _tables.load_table(spark, sf_dir, "documents")
        ),
        # consolidated r6 (slots freed to promote curate_corpus and
        # bpe_suite); keys kept so BENCH timings stay comparable
        "pii_redaction": _text.pii_redaction,
        "global_shuffle_shard": _sampling.global_shuffle_shard,
        # late r6: the semantic contamination channel, timed standalone
        # (contained in the `decontaminate` entry)
        "semantic_decontam": _decontam.semantic_decontam,
        # r7: the IVF-pruned semantic channel (the large-eval-suite
        # scale path) — NOT contained in any entry; its cost tracks
        # what cell routing buys vs the exact cross above
        "semantic_decontam_pruned": _decontam.semantic_decontam_pruned,
        # r7 (VERDICT r6 next-round #1 done criterion): the dense
        # retrieval branch served from the persisted PQ index. The
        # index builds ONCE per sf (on the warm-up pass — build cost
        # excluded by the discarded-sweep design, exactly the
        # build-once/probe-many deployment shape); the timed number is
        # the per-query probe, whose cost is independent of corpus
        # embedding (compare: the contained `bm25_topk` dense branch
        # embeds the corpus per call).
        "dense_topk_indexed": _dense_indexed_builder(),
        # r8 (VERDICT r7 next-round #5): incremental index append —
        # the timed plan is the increment's encode against the FROZEN
        # centroids of a once-built base index (built on the warm-up
        # pass, like dense_topk_indexed), i.e. the work
        # ann_index_append does per append; cost ∝ |increment| (a
        # fixed 10% tail slice here), never the corpus. The parquet
        # write is the same noop-replaced sink every bench row skips.
        "ann_index_append": _ann_append_builder(),
        # r9 (VERDICT r8 next-round #4): incremental curation against
        # the PERSISTED history index — the history artifacts
        # (fingerprints, shingle index, shingle census) build ONCE on
        # the 90% slice (warm-up pass, cost excluded like the other
        # build-once rows); the timed number is one curate_increment
        # call over the 10% increment reading only the columnar
        # artifacts — cost ∝ increment, history text never re-read.
        "curate_increment_indexed": _curate_inc_indexed_builder(),
        # r7: contrastive (anchor, positive, hard-negative) mining —
        # the IVF-routed scale path over the embeddings table
        "contrastive_triplets": lambda spark, sf_dir: __import__(
            "mrbf_spark.functions.mining", fromlist=["contrastive_triplets"]
        ).contrastive_triplets(
            _tables.load_table(spark, sf_dir, "embeddings"), method="ivf"
        ),
        # r8: the learned quality tier, timed standalone (contained
        # in lm_suite part=qlr): all-integer LR train on the %5 slice
        # + frozen scoring of the corpus
        "quality_classifier": lambda spark, sf_dir: __import__(
            "mrbf_spark.functions.quality_classifier",
            fromlist=["lm_qlr_part"],
        ).lm_qlr_part(_tables.load_table(spark, sf_dir, "documents")),
        # late r6: the r4-comparable lexical-only BM25 cost (the
        # catalog's bm25_topk key now times the full retrieval suite)
        "bm25_lexical": lambda spark, sf_dir: _retrieval.bm25_topk(
            _tables.load_table(spark, sf_dir, "documents"),
            ["table", "scan", "fast"],
            k=_retrieval.K_BRANCH,
        ),
        # late r6: the new packing/ANN parts, timed standalone
        # (contained in packing_suite / ann_approx_topk)
        "contiguous_sequences": _packing.contiguous_sequences_q,
        "ann_pq_topk": _similarity.ann_pq_topk,
        "temperature_mixture": _sampling.temperature_mixture,
        # r9: incremental rollup maintenance (contained in
        # data_ops_suite part=rollup) — the base rollup computes ONCE
        # on the warm-up pass (cached frame, the persisted-artifact
        # stand-in); the timed plan is one refresh: pk-digest diff +
        # delta-sized merge + dirty-key min/max rescan.
        "rollup_maintain": _rollup_maintain_builder(),
    }


def _rollup_maintain_builder():
    """Closure giving rollup_maintain a build-once base rollup (over
    the data_ops snapshot derivation's OLD side, localCheckpointed on
    the warm-up pass so the timed refresh never recomputes it)."""
    cache: dict[str, object] = {}

    def q(spark, sf_dir):
        from pyspark.sql import functions as F

        from mrbf_spark import tables as _t
        from mrbf_spark.functions import rollup as _ru
        from mrbf_spark.functions.diffing import BUMP_NEW, DROP_NEW, DROP_OLD

        vm = F.floor(F.col("value").cast("double") * F.lit(1e6)).cast("long")
        bucket = F.pmod(F.col("user_id"), F.lit(101)).cast("string")
        events = _t.load_table(spark, sf_dir, "events")
        old = events.filter(
            F.pmod(F.col("event_id"), F.lit(DROP_OLD[0])) != DROP_OLD[1]
        ).select(
            "event_id", "event_type", bucket.alias("k2"), vm.alias("v")
        )
        new = (
            events.filter(
                F.pmod(F.col("event_id"), F.lit(DROP_NEW[0])) != DROP_NEW[1]
            )
            .withColumn(
                "value",
                F.when(
                    F.pmod(F.col("event_id"), F.lit(BUMP_NEW[0]))
                    == BUMP_NEW[1],
                    F.col("value") * 2,
                ).otherwise(F.col("value")),
            )
            .select(
                "event_id", "event_type", bucket.alias("k2"), vm.alias("v")
            )
        )
        base = cache.get(sf_dir)
        if base is None:
            base = _ru.rollup_base(
                old, ["event_type", "k2"], "v"
            ).localCheckpoint()
            cache[sf_dir] = base
        return _ru.rollup_maintain(
            old, new, "event_id", ["event_type", "k2"], "v", base=base
        )

    return q


def _dense_indexed_builder():
    """Closure giving dense_topk_indexed a build-once/probe-many index
    under the repo's gitignored .tmp/ scratch (keyed by sf dir)."""
    cache: dict[str, str] = {}

    def q(spark, sf_dir):
        from mrbf_spark import tables as _t
        from mrbf_spark.functions import retrieval as _r

        path = cache.get(sf_dir)
        if path is None:
            base = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".tmp"
            )
            os.makedirs(base, exist_ok=True)
            path = os.path.join(
                base, "dense_idx_" + sf_dir.strip("/").replace("/", "_")
            )
            _r.build_dense_pq_index(
                _t.load_table(spark, sf_dir, "documents"), path
            )
            cache[sf_dir] = path
        return _r.dense_topk_indexed(spark, path, "table scan fast")

    return q


def _curate_inc_indexed_builder():
    """Closure giving curate_increment_indexed a build-once history
    index (the doc_id % 10 != 0 slice) under .tmp/; the timed call
    curates the % 10 == 0 increment against the persisted artifacts."""
    cache: dict[str, str] = {}

    def q(spark, sf_dir):
        from pyspark.sql import functions as F

        from mrbf_spark import tables as _t
        from mrbf_spark.functions import curate as _c

        docs = _t.load_table(spark, sf_dir, "documents")
        path = cache.get(sf_dir)
        if path is None:
            base = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".tmp"
            )
            os.makedirs(base, exist_ok=True)
            path = os.path.join(
                base, "curate_idx_" + sf_dir.strip("/").replace("/", "_")
            )
            _c.curate_index_build(docs.filter(F.col("doc_id") % 10 != 0), path)
            cache[sf_dir] = path
        inc = docs.filter(F.col("doc_id") % 10 == 0)
        return _c.curate_increment(inc, history_index=path)[0]

    return q


def _ann_append_builder():
    """Closure giving ann_index_append a build-once base index (first
    90% of vec_ids) under .tmp/; the timed plan encodes the remaining
    10% against the frozen centroids — the append-path work."""
    cache: dict[str, tuple[str, int]] = {}

    def q(spark, sf_dir):
        from pyspark.sql import functions as F

        from mrbf_spark import tables as _t
        from mrbf_spark.functions import ann_index as _ai
        from mrbf_spark.functions.similarity import _decimal_dot, kmeans_assign

        emb = _t.load_table(spark, sf_dir, "embeddings")
        got = cache.get(sf_dir)
        if got is None:
            base = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".tmp"
            )
            os.makedirs(base, exist_ok=True)
            path = os.path.join(
                base, "ivf_idx_" + sf_dir.strip("/").replace("/", "_")
            )
            n = emb.count()
            cut = int(n * 0.9)
            _ai.write_ann_index(emb.filter(F.col("vec_id") < cut), path)
            cache[sf_dir] = (path, cut)
            got = (path, cut)
        path, cut = got
        cent = _ai.read_ann_centroids(spark, path)
        inc = emb.filter(F.col("vec_id") >= cut)
        return kmeans_assign(inc.select("vec_id", "embedding"), cent).withColumn(
            "nrm", _decimal_dot(F.col("embedding"), F.col("embedding"))
        )

    return q


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from mrbf_spark.session import get_spark
    from mrbf_spark import catalog

    spark = get_spark("mrbf-bench")
    qs = dict(catalog.queries())
    for name, fn in legacy_builders().items():
        if fn is not None and name not in qs:
            qs[name] = fn
    names = list(qs)
    # Optional subset (r7): SPARK_GRAFT_BENCH_ONLY="headline" or a
    # comma list — used for one-off large-SF runs (e.g. the sf1
    # scale-timing table in SCALING.md) where the full ~98-query
    # sweep would take hours. The driver's per-round run leaves this
    # unset and times everything.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only:
        want = set(HEADLINE) if only == "headline" else set(only.split(","))
        names = [n for n in names if n in want]
    # Warm up the JVM + parquet footers, and the Arrow Python workers
    # (they're forked lazily per core on first pandas-UDF use — a
    # fixed startup cost, not query throughput).
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    spark.range(10_000).mapInPandas(lambda it: it, "id long").count()
    # Steady-state warm-up: run every plan once at SF_DIR ITSELF (r6;
    # previously sf0.001). WholeStageCodegen caches compiled classes
    # by source text, but AQE picks DIFFERENT physical plans at
    # different SFs (broadcast-vs-SMJ thresholds, coalesced partition
    # counts), so a tiny-SF warm-up left round 0 paying sf0.1-shaped
    # JIT — the r6 sample logs showed round-0 up to 3-4× rounds 1-2 on
    # exactly the plan-heavy entries. Warming at the timed SF makes
    # all N_ROUNDS samples steady-state (cold-start remains a fixed
    # per-JVM cost, amortized to zero on a long-lived cluster).
    from mrbf_spark.registry import release_scoped_caches

    for name in names:
        try:
            t0 = time.time()
            run_query(qs[name](spark, SF_DIR))
            release_scoped_caches()
            # per-query warm-up progress (r9): a silent multi-minute
            # warm-up gap is unattributable from the log; one stderr
            # line per query makes a hung/slow warm-up diagnosable
            print(
                f"bench warmup {name} {time.time() - t0:.2f}s",
                file=sys.stderr,
                flush=True,
            )
        except Exception as e:
            # a silent warm-up miss would leave that query's timed
            # run paying JIT cost — make it attributable
            print(
                f"warmup failed for {name}: {type(e).__name__}",
                file=sys.stderr,
            )

    # Median of N_ROUNDS INTERLEAVED sweeps per query: the host VM
    # shows multi-second noisy-neighbor stalls in bursts (GC-log
    # verified: JVM pauses ≤131 ms, so the stalls are outside the
    # engine). Back-to-back repeats land all runs inside one burst; a
    # full sweep between repeats makes the draws independent, so the
    # median resists a single burst and the (max−min) spread tells a
    # reader whether a round-over-round delta clears the noise floor.
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rnd in range(N_DISCARD + N_ROUNDS):
        for name in names:
            t0 = time.time()
            run_query(qs[name](spark, SF_DIR))
            dt = time.time() - t0
            # builder-tier entries bypass the registered-query release
            # hook — free their scoped caches so they don't accumulate
            # across the ~90-query sweep
            release_scoped_caches()
            samples[name].append(dt)
            # per-query progress on stderr: makes a slow/hung query
            # attributable from a partial log (stdout stays one JSON line)
            tag = " (discarded)" if rnd < N_DISCARD else ""
            print(
                f"bench r{rnd} {name} {dt:.2f}s{tag}", file=sys.stderr, flush=True
            )
        # Inter-sweep storage release (r7): localCheckpoint blocks from
        # checkpoint-heavy queries (curate/packing/dedup_clusters) are
        # freed only when their DataFrames are garbage-collected —
        # across a 98-query sweep the dangling blocks pressure executor
        # storage and surface as multi-second localized stalls in the
        # NEXT sweep's samples. Collect both heaps at the sweep
        # boundary so each sweep starts with clean storage.
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass  # JVM gc is best-effort; the Python collect is the lever
    kept = {n: v[N_DISCARD:] for n, v in samples.items()}

    def _stats(v: list[float], n_drop: int) -> tuple[float, float]:
        s = sorted(v)
        # symmetric trim (ADVICE r8): n_drop off EACH end, clamped so
        # at least one sample survives
        while n_drop and len(s) - 2 * n_drop < 1:
            n_drop -= 1
        if n_drop:
            s = s[n_drop : len(s) - n_drop]
        return round(s[len(s) // 2], 3), round(s[-1] - s[0], 3)

    dropped: dict[str, int] = {n: 0 for n in names}
    timings, spread = {}, {}
    for n, v in kept.items():
        timings[n], spread[n] = _stats(v, 0)

    # High-variance retry (r8): re-sweep the supra-50%-spread queries,
    # interleaved, discarding one more worst sample per retry round.
    retried: dict[str, int] = {}
    for retry in range(MAX_RETRY_ROUNDS):
        flagged = [
            n for n in names
            if spread[n] > RETRY_SPREAD_FRAC * max(timings[n], 1e-9)
        ]
        if not flagged:
            break
        for name in flagged:
            t0 = time.time()
            run_query(qs[name](spark, SF_DIR))
            dt = time.time() - t0
            release_scoped_caches()
            samples[name].append(dt)
            kept[name].append(dt)
            retried[name] = retried.get(name, 0) + 1
            print(
                f"bench retry{retry} {name} {dt:.2f}s", file=sys.stderr,
                flush=True,
            )
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        for n in flagged:
            dropped[n] += 1
            timings[n], spread[n] = _stats(kept[n], dropped[n])

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    headline = [n for n in HEADLINE if n in timings]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings[n] for n in headline), 3),
        # r1-r5 reported min-of-N (best case); `value` is now the
        # median (typical case) — value_best is the min-statistic
        # twin, directly comparable to BENCH_r01..r05 values.
        "value_best": round(sum(min(kept[n]) for n in headline), 3),
        "unit": "sec",
        # stdout carries the 17 headline queries only: the driver's
        # tail capture is ~2 KB and the full ~90-key map overflowed it
        # (BENCH_r04 parsed: null) — the complete per-query map goes to
        # bench_full.json + stderr instead.
        "queries": {n: timings[n] for n in headline},
        "spread": {n: spread[n] for n in headline},
        "stat": f"median_of_{N_ROUNDS}_interleaved_after_{N_DISCARD}_discarded",
        "n_queries_total": len(timings),
        "queries_full": "bench_full.json",
        # r8: high-variance retry disclosure (stdout stays compact —
        # the full retry/parts maps ride in bench_full.json)
        "n_retried": len(retried),
        # r9 (ADVICE r8): retried HEADLINE keys carry reduced
        # round-over-round comparability (their medians come from a
        # symmetric-trimmed, partly flagged-only-resampled series)
        "retried_headline": sorted(n for n in retried if n in HEADLINE),
        # r8 (VERDICT r7 #8): total part-tagged ops behind the catalog
        # entries; the {entry: [part,...]} map is in bench_full.json
        "n_parts_total": sum(len(v) for v in catalog.parts().values()),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    full = dict(out)
    full["queries"] = timings
    full["spread"] = spread
    full["samples"] = {n: [round(x, 3) for x in v] for n, v in samples.items()}
    full["samples_discarded_prefix"] = N_DISCARD
    full["contained_rows"] = CONTAINED
    full["retried"] = retried
    full["samples_trimmed_each_end"] = {
        n: d for n, d in dropped.items() if d
    }
    full["parts"] = catalog.parts()
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(json.dumps(full), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
