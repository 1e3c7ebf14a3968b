"""Gopher repetition signals over the documents table — the second
half of the Rae et al. 2021 rule battery (App. A, Table A1): documents
dominated by repeated lines, paragraphs, or n-grams are low-quality
crawl artifacts (boilerplate, SEO spam, scraper loops) that rule-based
curation drops before training.

Signals per document (all 1e6 fixed-point BIGINT ratios, -1 on an
empty denominator, matching functions/quality_rules.py conventions):

  dup_line_frac_q   fraction of lines whose exact text occurs >= 2
                    times in the doc (every occurrence counts)
  dup_line_char_q   same, weighted by line character length
  dup_para_frac_q / dup_para_char_q — the paragraph versions
  top{2,3,4}_char_q  occurrences(most frequent word n-gram) x its
                    word-character length / total word characters
                    (can exceed 1e6 when occurrences overlap — the
                    paper's definition has the same property)
  dup{5..10}_char_q  word characters covered by >=2x n-grams / total
                    word characters — computed as a POSITION-SET UNION
                    over covered word slots, so overlapping duplicate
                    spans are never double-counted

plus one boolean per paper threshold (r_dup_line <= 0.30,
r_dup_line_char <= 0.20, r_dup_para <= 0.30, r_dup_para_char <= 0.20,
r_top2 <= 0.20, r_top3 <= 0.18, r_top4 <= 0.16, r_dup5 <= 0.15 ...
r_dup10 <= 0.10) and rep_pass = AND of all thirteen. Every threshold
is an exact integer cross-multiplication (DEN * num <= NUM * den) —
no float ever enters a rule, so the DuckDB twin agrees bit-for-bit.
Empty denominators pass vacuously, exactly as in quality_rules.

Words/lines use the same definitions as quality_rules (_WS split,
non-blank after trim); paragraphs split on a blank line ('\\n\\n').
N-gram keys are words joined by a single space; their word-character
length is length(key) - (n-1) since words contain no whitespace.
The most-frequent tie breaks (count DESC, key ASC) — a pure function
of the table.

100 TB shape: one documents scan explodes to per-doc units (lines,
paragraphs, n=2..10 grams — ~9x the token count), then every shuffle
is keyed by (doc_id, kind, key) or (doc_id, position): state never
exceeds one document's own unit multiset, so parallelism is per-doc
and skew is bounded by max document length, not corpus size. No
driver collects, no cross-document joins. This is deliberately NOT
the O(L^2) higher-order-function formulation — a million-line doc
would quadratically stall a single task there; the explode+groupBy
form stays linear-ish (hash-aggregate) per doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# NOTE: quality_rules is imported lazily inside each function —
# quality_rules' registered quality_signals entry imports THIS module
# at registration time, so a top-level import here would be circular.

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)

# thresholds: metric <= NUM/DEN (Rae et al. 2021, Table A1)
LINE_FRAC_MAX = (3, 10)
LINE_CHAR_MAX = (1, 5)
PARA_FRAC_MAX = (3, 10)
PARA_CHAR_MAX = (1, 5)
TOP_MAX = {2: (1, 5), 3: (9, 50), 4: (4, 25)}
DUP_MAX = {5: (3, 20), 6: (7, 50), 7: (13, 100), 8: (3, 25), 9: (11, 100), 10: (1, 10)}


def _base(docs: DataFrame) -> DataFrame:
    from .quality_rules import _WS

    words = F.filter(F.split(F.col("text"), _WS), lambda x: x != F.lit(""))
    lines = F.filter(F.split(F.col("text"), "\\n"), lambda l: F.trim(l) != F.lit(""))
    paras = F.filter(
        F.split(F.col("text"), "\\n\\n"), lambda p: F.trim(p) != F.lit("")
    )
    return docs.select(
        "doc_id",
        words.alias("w"),
        lines.alias("ln"),
        paras.alias("pa"),
        # coalesce mirrors the twin's COALESCE(list_sum(...), 0): a
        # NULL text must yield swl=0 (vacuous rule passes) on BOTH
        # engines, not NULL-on-one/0-on-the-other
        F.coalesce(
            F.aggregate(
                F.transform(words, lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ),
            F.lit(0).cast("long"),
        ).alias("swl"),
    )


def _unit_structs(arr: Column, kind: str, n: int) -> Column:
    """array<struct<kind,n,pos,key,wlen>> over the unit strings in
    `arr` (two-arg transform lambda supplies the position)."""
    return F.transform(
        arr,
        lambda x, i: F.struct(
            F.lit(kind).alias("kind"),
            F.lit(n).cast("int").alias("n"),
            i.cast("long").alias("pos"),
            x.alias("key"),
            (F.length(x) - (n - 1)).cast("long").alias("wlen"),
        ),
    )


def _exploded_units(base: DataFrame) -> DataFrame:
    """(doc_id, kind, n, pos, key, wlen) for EVERY unit — lines,
    paragraphs, single tokens (kind='tk', the coverage lookup side),
    and n-grams for all configured n.

    Construction cost drove this design (measured at sf0.1): building
    n-gram keys with per-element `slice`+`array_join` lambdas runs
    INTERPRETED (higher-order functions never enter whole-stage
    codegen) at ~2 µs/unit — 5 s for 2.5 M units. Instead the tokens
    are exploded once and every n-gram key is a codegen'd
    `concat_ws(word, lead(word,1), …)` — all nine n values ride ONE
    doc-keyed window sort (the `_with_stream_starts` one-sort-many-
    expressions trick), and the per-row struct array explodes with a
    null-gate for positions too close to the document end. Lines and
    paragraphs stay HOF-built (a handful of units per doc — noise).
    The shuffle introduced by the window is doc-keyed, same bound as
    every other shuffle in this module."""
    toks = base.select("doc_id", F.posexplode("w")).select(
        "doc_id",
        F.col("pos").cast("long").alias("wp"),
        F.col("col").alias("word"),
    )
    all_ns = (*TOP_NS, *DUP_NS)
    max_n = max(all_ns)
    wspec = W.partitionBy("doc_id").orderBy("wp")
    leads = toks.select(
        "*",
        *[
            F.lead("word", j).over(wspec).alias(f"_w{j}")
            for j in range(1, max_n)
        ],
    )

    def g_struct(n: int) -> Column:
        key = F.concat_ws(
            " ", F.col("word"), *[F.col(f"_w{j}") for j in range(1, n)]
        )
        # valid iff the (n-1)-ahead token exists in the same doc; the
        # window lead is partition-bounded so this is exactly wp <= W-n
        return F.when(
            F.col(f"_w{n - 1}").isNotNull(),
            F.struct(
                F.lit(f"g{n}").alias("kind"),
                F.lit(n).cast("int").alias("n"),
                F.col("wp").alias("pos"),
                key.alias("key"),
                (F.length(key) - (n - 1)).cast("long").alias("wlen"),
            ),
        )

    ng = (
        leads.select(
            "doc_id",
            F.explode(F.array(*[g_struct(n) for n in all_ns])).alias("u"),
        )
        .filter(F.col("u").isNotNull())
        .select("doc_id", "u.*")
    )
    tk = toks.select(
        "doc_id",
        F.lit("tk").alias("kind"),
        F.lit(1).cast("int").alias("n"),
        F.col("wp").alias("pos"),
        F.col("word").alias("key"),
        F.length("word").cast("long").alias("wlen"),
    )
    lnpa = base.select(
        "doc_id",
        F.explode(
            F.concat(
                _unit_structs(F.col("ln"), "ln", 1),
                _unit_structs(F.col("pa"), "pa", 1),
            )
        ).alias("u"),
    ).select("doc_id", "u.*")
    return ng.unionByName(tk).unionByName(lnpa)


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Per-doc repetition metrics + per-threshold booleans + rep_pass.
    Input needs (doc_id, text); output keyed by doc_id (one row per
    input row, including zero-word docs)."""
    from ..registry import scoped_cache
    from .quality_rules import FIXED

    base = _base(docs)
    # cache the one-scan unit explosion: five consumers (counts, the
    # coverage occurrence join, the token lookup, and their branches)
    # would otherwise each re-derive every unit kind. Scoped — the
    # caller (driver harness / stream step) releases.
    ex = scoped_cache(_exploded_units(base))
    # ... and MATERIALIZE it (r10, VERDICT r9 next-round #4): the
    # consumers all sit under ONE action, so a lazy cache is raced —
    # each branch independently re-runs the tokenize+window explode
    # until some task's partition lands in storage (the measured ~2×
    # cost simhash_pairs documents for the same shape). One count()
    # makes every branch read cached units.
    ex.count()
    units = ex.filter(F.col("kind") != "tk")
    cnts = units.groupBy("doc_id", "kind", "n", "key").agg(
        F.count("*").alias("c"), F.min("wlen").alias("wlen")
    )

    # lines/paragraphs: dup multiset fractions by count and by chars
    dup = F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0).cast("long"))
    dupch = F.when(F.col("c") >= 2, F.col("c") * F.col("wlen")).otherwise(
        F.lit(0).cast("long")
    )
    lp = (
        cnts.filter(F.col("kind").isin("ln", "pa"))
        .groupBy("doc_id", "kind")
        .agg(
            F.sum("c").alias("tot_u"),
            F.sum(dup).alias("dup_u"),
            F.sum(F.col("c") * F.col("wlen")).alias("tot_ch"),
            F.sum(dupch).alias("dup_ch"),
        )
    )
    pick = lambda k, c: F.max(F.when(F.col("kind") == k, F.col(c)))  # noqa: E731
    lpw = lp.groupBy("doc_id").agg(
        *[
            pick(k, c).alias(f"{k}_{c}")
            for k in ("ln", "pa")
            for c in ("tot_u", "dup_u", "tot_ch", "dup_ch")
        ]
    )

    # top n-gram coverage (n in TOP_NS): occurrences x word-char length
    # of the (count DESC, key ASC) winner
    win = W.partitionBy("doc_id", "kind").orderBy(F.col("c").desc(), "key")
    top = (
        cnts.filter(F.col("kind").isin(*[f"g{n}" for n in TOP_NS]))
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("kind") == f"g{n}", F.col("c") * F.col("wlen"))
                ).alias(f"top{n}_cover")
                for n in TOP_NS
            ],
        )
    )

    # duplicated n-gram coverage (n in DUP_NS): union of covered word
    # positions, then sum of those words' lengths
    dupk = cnts.filter(
        (F.col("n") >= min(DUP_NS)) & (F.col("c") >= 2)
    ).select("doc_id", "kind", "n", "key")
    occ = (
        units.join(dupk, ["doc_id", "kind", "n", "key"])
        .select(
            "doc_id",
            "kind",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
            ).alias("wp"),
        )
        .distinct()
    )
    toks = ex.filter(F.col("kind") == "tk").select(
        "doc_id",
        F.col("pos").alias("wp"),
        F.col("wlen").alias("wordlen"),
    )
    cov = (
        occ.join(toks, ["doc_id", "wp"])
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("kind") == f"g{n}", F.col("wordlen")).otherwise(
                        F.lit(0).cast("long")
                    )
                ).alias(f"dup{n}_cover")
                for n in DUP_NS
            ]
        )
    )

    out = (
        base.select("doc_id", "swl")
        .join(lpw, "doc_id", "left")
        .join(top, "doc_id", "left")
        .join(cov, "doc_id", "left")
    )
    z = lambda c: F.coalesce(F.col(c), F.lit(0).cast("long"))  # noqa: E731
    fixq = lambda num, den: F.coalesce(  # noqa: E731
        F.expr(f"(({num}) * {FIXED}) div nullif({den}, 0)"),
        F.lit(-1).cast("long"),
    )
    # rule: DEN * num <= NUM * den, vacuous pass on den = 0
    rule = lambda num, den, nd: (den == 0) | (  # noqa: E731
        nd[1] * num <= nd[0] * den
    )
    cols: dict[str, Column] = {}
    rules: dict[str, Column] = {}
    for k, label, fr_nd, ch_nd in (
        ("ln", "line", LINE_FRAC_MAX, LINE_CHAR_MAX),
        ("pa", "para", PARA_FRAC_MAX, PARA_CHAR_MAX),
    ):
        cols[f"dup_{label}_frac_q"] = fixq(f"{k}_dup_u", f"{k}_tot_u")
        cols[f"dup_{label}_char_q"] = fixq(f"{k}_dup_ch", f"{k}_tot_ch")
        rules[f"r_dup_{label}"] = rule(z(f"{k}_dup_u"), z(f"{k}_tot_u"), fr_nd)
        rules[f"r_dup_{label}_char"] = rule(
            z(f"{k}_dup_ch"), z(f"{k}_tot_ch"), ch_nd
        )
    for n in TOP_NS:
        cols[f"top{n}_char_q"] = fixq(f"coalesce(top{n}_cover, 0)", "swl")
        rules[f"r_top{n}"] = rule(z(f"top{n}_cover"), F.col("swl"), TOP_MAX[n])
    for n in DUP_NS:
        cols[f"dup{n}_char_q"] = fixq(f"coalesce(dup{n}_cover, 0)", "swl")
        rules[f"r_dup{n}"] = rule(z(f"dup{n}_cover"), F.col("swl"), DUP_MAX[n])

    res = out.select(
        "doc_id",
        *[v.alias(k) for k, v in cols.items()],
        *[v.alias(k) for k, v in rules.items()],
    )
    return res.withColumn("rep_pass", F.expr(" AND ".join(rules)))


def repetition_duckdb_sql(src: str = "documents") -> str:
    """The DuckDB twin: same unit definitions, same position-union
    coverage, same integer cross-multiplied thresholds."""
    from .quality_rules import FIXED, _WS

    ngram_units = "\n      UNION ALL\n".join(
        f"""      SELECT doc_id, 'g{n}' AS kind, {n} AS n,
             CAST(i - 1 AS BIGINT) AS pos,
             array_to_string(list_slice(w, i, i + {n} - 1), ' ') AS key,
             CAST(length(array_to_string(list_slice(w, i, i + {n} - 1), ' ')) - {n - 1} AS BIGINT) AS wlen
      FROM (SELECT doc_id, w, UNNEST(generate_series(1, len(w) - {n} + 1)) AS i
            FROM rbase WHERE len(w) >= {n})"""
        for n in (*TOP_NS, *DUP_NS)
    )
    top_cols = ",\n             ".join(
        f"MAX(CASE WHEN kind = 'g{n}' THEN cover END) AS top{n}_cover"
        for n in TOP_NS
    )
    cov_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN kind = 'g{n}' THEN wordlen ELSE 0 END) AS BIGINT) AS dup{n}_cover"
        for n in DUP_NS
    )
    fixq = (
        lambda num, den: f"coalesce((({num}) * {FIXED}) // nullif({den}, 0), "
        f"CAST(-1 AS BIGINT))"
    )
    rule = lambda num, den, nd: f"({den} = 0 OR {nd[1]} * ({num}) <= {nd[0]} * ({den}))"  # noqa: E731
    z = lambda c: f"coalesce({c}, 0)"  # noqa: E731
    qcols, rcols = [], []
    for k, label, fr_nd, ch_nd in (
        ("ln", "line", LINE_FRAC_MAX, LINE_CHAR_MAX),
        ("pa", "para", PARA_FRAC_MAX, PARA_CHAR_MAX),
    ):
        qcols.append(
            f"{fixq(f'{k}_dup_u', f'{k}_tot_u')} AS dup_{label}_frac_q"
        )
        qcols.append(
            f"{fixq(f'{k}_dup_ch', f'{k}_tot_ch')} AS dup_{label}_char_q"
        )
        rcols.append(
            f"{rule(z(f'{k}_dup_u'), z(f'{k}_tot_u'), fr_nd)} AS r_dup_{label}"
        )
        rcols.append(
            f"{rule(z(f'{k}_dup_ch'), z(f'{k}_tot_ch'), ch_nd)} AS r_dup_{label}_char"
        )
    for n in TOP_NS:
        qcols.append(f"{fixq(z(f'top{n}_cover'), 'swl')} AS top{n}_char_q")
        rcols.append(f"{rule(z(f'top{n}_cover'), 'swl', TOP_MAX[n])} AS r_top{n}")
    for n in DUP_NS:
        qcols.append(f"{fixq(z(f'dup{n}_cover'), 'swl')} AS dup{n}_char_q")
        rcols.append(f"{rule(z(f'dup{n}_cover'), 'swl', DUP_MAX[n])} AS r_dup{n}")
    rule_names = (
        [f"r_dup_{lb}{sfx}" for lb in ("line", "para") for sfx in ("", "_char")]
        + [f"r_top{n}" for n in TOP_NS]
        + [f"r_dup{n}" for n in DUP_NS]
    )
    sep = ",\n             "
    qcols_sql = sep.join(qcols)
    rcols_sql = sep.join(rcols)
    return f"""
    WITH rbase AS MATERIALIZED (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '{_WS}'), x -> x <> '') AS w,
             list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS ln,
             list_filter(string_split(text, chr(10) || chr(10)), p -> trim(p) <> '') AS pa
      FROM {src}),
    rswl AS MATERIALIZED (
      SELECT doc_id,
             CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS BIGINT) AS swl
      FROM rbase),
    runits AS MATERIALIZED (
      SELECT doc_id, 'ln' AS kind, 1 AS n, CAST(u.i - 1 AS BIGINT) AS pos,
             u.x AS key, CAST(length(u.x) AS BIGINT) AS wlen
      FROM (SELECT doc_id,
                   unnest([struct_pack(i := i, x := ln[i])
                           for i in generate_series(1, len(ln))]) AS u
            FROM rbase)
      UNION ALL
      SELECT doc_id, 'pa' AS kind, 1 AS n, CAST(u.i - 1 AS BIGINT) AS pos,
             u.x AS key, CAST(length(u.x) AS BIGINT) AS wlen
      FROM (SELECT doc_id,
                   unnest([struct_pack(i := i, x := pa[i])
                           for i in generate_series(1, len(pa))]) AS u
            FROM rbase)
      UNION ALL
{ngram_units}),
    rcnts AS MATERIALIZED (
      SELECT doc_id, kind, n, key, CAST(COUNT(*) AS BIGINT) AS c,
             MIN(wlen) AS wlen
      FROM runits GROUP BY 1, 2, 3, 4),
    rlp AS (
      SELECT doc_id,
             CAST(MAX(CASE WHEN kind = 'ln' THEN tot_u END) AS BIGINT) AS ln_tot_u,
             CAST(MAX(CASE WHEN kind = 'ln' THEN dup_u END) AS BIGINT) AS ln_dup_u,
             CAST(MAX(CASE WHEN kind = 'ln' THEN tot_ch END) AS BIGINT) AS ln_tot_ch,
             CAST(MAX(CASE WHEN kind = 'ln' THEN dup_ch END) AS BIGINT) AS ln_dup_ch,
             CAST(MAX(CASE WHEN kind = 'pa' THEN tot_u END) AS BIGINT) AS pa_tot_u,
             CAST(MAX(CASE WHEN kind = 'pa' THEN dup_u END) AS BIGINT) AS pa_dup_u,
             CAST(MAX(CASE WHEN kind = 'pa' THEN tot_ch END) AS BIGINT) AS pa_tot_ch,
             CAST(MAX(CASE WHEN kind = 'pa' THEN dup_ch END) AS BIGINT) AS pa_dup_ch
      FROM (SELECT doc_id, kind,
                   CAST(SUM(c) AS BIGINT) AS tot_u,
                   CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_u,
                   CAST(SUM(c * wlen) AS BIGINT) AS tot_ch,
                   CAST(SUM(CASE WHEN c >= 2 THEN c * wlen ELSE 0 END) AS BIGINT) AS dup_ch
            FROM rcnts WHERE kind IN ('ln', 'pa') GROUP BY 1, 2)
      GROUP BY doc_id),
    rtop AS (
      SELECT doc_id,
             {top_cols}
      FROM (SELECT doc_id, kind, c * wlen AS cover,
                   ROW_NUMBER() OVER (PARTITION BY doc_id, kind
                                      ORDER BY c DESC, key) AS rn
            FROM rcnts WHERE kind IN ({", ".join(f"'g{n}'" for n in TOP_NS)}))
      WHERE rn = 1 GROUP BY doc_id),
    rdupk AS (
      SELECT doc_id, kind, n, key FROM rcnts
      WHERE n >= {min(DUP_NS)} AND c >= 2),
    rocc AS MATERIALIZED (
      SELECT DISTINCT doc_id, kind, wp
      FROM (SELECT u.doc_id, u.kind,
                   UNNEST(generate_series(u.pos, u.pos + u.n - 1)) AS wp
            FROM runits u JOIN rdupk d USING (doc_id, kind, n, key))),
    rtoks AS MATERIALIZED (
      SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS wp,
             CAST(length(u.x) AS BIGINT) AS wordlen
      FROM (SELECT doc_id,
                   unnest([struct_pack(i := i, x := w[i])
                           for i in generate_series(1, len(w))]) AS u
            FROM rbase)),
    rcov AS (
      SELECT doc_id,
             {cov_cols}
      FROM rocc JOIN rtoks USING (doc_id, wp)
      GROUP BY doc_id),
    rfin AS (
      SELECT rswl.doc_id,
             {qcols_sql},
             {rcols_sql}
      FROM rswl
      LEFT JOIN rlp USING (doc_id)
      LEFT JOIN rtop USING (doc_id)
      LEFT JOIN rcov USING (doc_id))
    SELECT *, {" AND ".join(rule_names)} AS rep_pass FROM rfin
    """
