"""Schema-compatible testdata generator for scale-robustness gates
(r7, VERDICT r6 next-round #5).

The driver's /root/testdata is read-only and stops at sf0.1; the
oracle gate is SELF-consistent (Spark vs DuckDB over the SAME
parquet), so proving the catalog holds at sf1 (100× the gate) only
needs data with the same schemas, key relationships, and value
shapes — not the driver's exact rows. This mirrors the observed
tables (types incl. timestamp[us] no-tz, FK ranges like events.user_id
⊂ customer keys, the documents vocab/length/duplication structure,
label-clustered unit embeddings) at any sf, deterministically
(seed 42).

Usage: python tools/gen_testdata.py [sf] [out_dir] [--vocab-size N]
Default sf=1, out_dir=<repo>/.testdata/sf{sf}. Never writes outside
the repo.

Vocab (r8, VERDICT r7 next-round #4): documents draw from a
Zipfian-weighted vocabulary of `--vocab-size` words (default 10,000;
the observed 31 driver-vocab words form the Zipf head, the rest are
deterministic syllable words). The r7 generator reused only the
31-word vocab, which at sf1 made every doc share n-grams with any
eval slice — curate's decontam stage degenerated to an empty
survivor set (SCALING.md r7), so the 100× gate exercised the
degenerate path. Pass --vocab-size 31 to reproduce the old shape.
Duplication planting and length distribution are unchanged.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["O", "F", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "red", "small", "dark", "pale", "slow"]
PNOUN = ["ring", "bolt", "screw", "nut", "cog", "gear", "pin", "cap"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.14, 0.15, 0.15, 0.15]
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()

DAY_US = 86_400_000_000

VOCAB_SIZE = 10_000  # default rich vocab (--vocab-size overrides)
ZIPF_S = 1.1  # Zipf exponent for word frequencies


def _make_vocab(size: int) -> list[str]:
    """Deterministic vocabulary: the observed 31 words first (the
    Zipf head — keeps the driver-data token shapes present), then
    2-/3-syllable consonant-vowel words in construction order."""
    words = list(dict.fromkeys(VOCAB))[:size]
    syl = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiou"]
    seen = set(words)
    for a in syl:
        for b in syl:
            if len(words) >= size:
                return words
            w = a + b
            if w not in seen:
                seen.add(w)
                words.append(w)
    for a in syl:
        for b in syl:
            for c in syl:
                if len(words) >= size:
                    return words
                w = a + b + c
                if w not in seen:
                    seen.add(w)
                    words.append(w)
    if len(words) < size:
        raise ValueError(f"vocab_size {size} exceeds the generator space")
    return words


def _ts_array(us: np.ndarray) -> pa.Array:
    return pa.array(us.astype("int64"), type=pa.timestamp("us"))


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"wrote {path} ({table.num_rows} rows)")


def generate(sf: float, out_dir: str, vocab_size: int = VOCAB_SIZE) -> None:
    rng = np.random.RandomState(SEED)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(
        out_dir,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": REGIONS,
            }
        ),
    )
    _write(
        out_dir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )
    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust, dtype="int64")),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.randint(0, 25, n_cust).astype("int32")
                ),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": [
                    SEGMENTS[i] for i in rng.randint(0, 5, n_cust)
                ],
            }
        ),
    )
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp, dtype="int64")),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.randint(0, 25, n_supp).astype("int32")
                ),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            }
        ),
    )
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part, dtype="int64")),
                "p_name": [
                    f"{PADJ[i % 8]} {PNOUN[(i // 8) % 8]}" for i in range(n_part)
                ],
                "p_brand": [f"Brand#{i}" for i in rng.randint(0, 25, n_part)],
                "p_type": [PTYPES[i] for i in rng.randint(0, 6, n_part)],
                "p_size": pa.array(rng.randint(1, 51, n_part).astype("int32")),
                "p_retailprice": np.round(
                    900.0 + 0.1 * np.arange(n_part, dtype="float64"), 2
                ),
            }
        ),
    )

    # partsupp (r9, VERDICT r8 next-round #6): the SAME deterministic
    # derivation mrbf_spark.operators.tpch_ext computes in-query
    # (dbgen-style stride over suppliers, availqty/supplycost as
    # integer formulas of the keys) — materialized so local datasets
    # carry the full TPC-H table set; equality with the in-query
    # derivation is pinned in tests/test_tpch_ext.py. Integer division
    # replicates Spark DIV / DuckDB // (truncate toward zero), not
    # numpy's floor.
    def _tdiv(a, b):
        return np.sign(a) * (np.abs(a) // b)

    ps_pk = np.repeat(np.arange(n_part, dtype="int64"), 4)
    ps_i = np.tile(np.arange(4, dtype="int64"), n_part)
    ps_sk = (
        (ps_pk + ps_i * (n_supp // 4 + _tdiv(ps_pk - 1, n_supp))) % n_supp
    ) + 1
    ps_pairs = np.unique(np.stack([ps_pk, ps_sk], axis=1), axis=0)
    ps_pk, ps_sk = ps_pairs[:, 0], ps_pairs[:, 1]
    _write(
        out_dir,
        "partsupp",
        pa.table(
            {
                "ps_partkey": pa.array(ps_pk),
                "ps_suppkey": pa.array(ps_sk),
                "ps_availqty": pa.array((ps_pk * 7 + ps_sk * 13) % 9999 + 1),
                "ps_supplycost": (
                    ((ps_pk * 31 + ps_sk * 17) % 100000).astype("float64")
                    / 100.0
                    + 1.0
                ),
            }
        ),
    )

    # orders: dates over 1995-01-01 .. 2001-08-01 at day granularity
    o_epoch = np.datetime64("1995-01-01").astype("datetime64[us]").astype("int64")
    o_days = rng.randint(0, 2405, n_orders).astype("int64")
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders, dtype="int64")),
                "o_custkey": pa.array(
                    rng.randint(0, max(n_cust, 1), n_orders).astype("int64")
                ),
                "o_orderstatus": [
                    STATUSES[i] for i in rng.randint(0, 3, n_orders)
                ],
                "o_totalprice": np.round(
                    rng.uniform(1000, 500_000, n_orders), 2
                ),
                "o_orderdate": _ts_array(o_epoch + o_days * DAY_US),
                "o_orderpriority": [
                    PRIORITIES[i] for i in rng.randint(0, 5, n_orders)
                ],
            }
        ),
    )

    li_days = rng.randint(1, 2500, n_li).astype("int64")
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(
                    rng.randint(0, max(n_orders, 1), n_li).astype("int64")
                ),
                "l_partkey": pa.array(
                    rng.randint(0, max(n_part, 1), n_li).astype("int64")
                ),
                "l_suppkey": pa.array(
                    rng.randint(0, max(n_supp, 1), n_li).astype("int64")
                ),
                "l_linenumber": pa.array(
                    rng.randint(1, 8, n_li).astype("int32")
                ),
                "l_quantity": rng.randint(1, 51, n_li).astype("float64"),
                "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
                "l_discount": np.round(rng.randint(0, 11, n_li) * 0.01, 2),
                "l_tax": np.round(rng.randint(0, 9, n_li) * 0.01, 2),
                "l_returnflag": [RETFLAGS[i] for i in rng.randint(0, 3, n_li)],
                "l_linestatus": [LINESTATUS[i] for i in rng.randint(0, 2, n_li)],
                "l_shipdate": _ts_array(o_epoch + li_days * DAY_US),
            }
        ),
    )

    # events: Jan 2024, user_id ⊂ first tenth of customer keys (the
    # observed FK shape), value skewed-positive, props tiny JSON
    e_epoch = np.datetime64("2024-01-01").astype("datetime64[us]").astype("int64")
    e_us = np.sort(rng.randint(0, 30 * DAY_US, n_events).astype("int64"))
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_events, dtype="int64")),
                "ts": _ts_array(e_epoch + e_us),
                "user_id": pa.array(
                    rng.randint(0, max(n_cust // 10, 1), n_events).astype(
                        "int64"
                    )
                ),
                "event_type": [
                    EVENT_TYPES[i] for i in rng.randint(0, 5, n_events)
                ],
                "value": np.round(rng.exponential(60, n_events), 2),
                "props": [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_events)],
            }
        ),
    )

    # documents: Zipfian word-salad over a `vocab_size` vocabulary
    # (31 observed words at the head + syllable words), 10-100 tokens,
    # ~1.5‰ planted verbatim duplicates + ~1‰ near-duplicates (one
    # token appended) so every dedup family has real work
    lang_idx = rng.choice(len(LANGS), n_docs, p=LANG_W)
    lens = rng.randint(10, 101, n_docs)
    vocab = _make_vocab(vocab_size)
    zipf_p = 1.0 / np.arange(1, len(vocab) + 1, dtype="float64") ** ZIPF_S
    zipf_p /= zipf_p.sum()
    draws = rng.choice(len(vocab), int(lens.sum()), p=zipf_p)
    texts: list[str] = []
    off = 0
    for i in range(n_docs):
        texts.append(" ".join(vocab[j] for j in draws[off : off + lens[i]]))
        off += int(lens[i])
    n_dup = max(4, n_docs // 650)
    for j in range(n_dup):
        src = int(rng.randint(0, n_docs // 2))
        dst = n_docs // 2 + int(rng.randint(0, n_docs // 2))
        texts[dst] = texts[src]  # verbatim duplicate
    for j in range(max(2, n_docs // 1000)):
        src = int(rng.randint(0, n_docs - 1))
        dst = (src + n_docs // 3) % n_docs
        texts[dst] = texts[src] + " extra"  # near-duplicate
    _write(
        out_dir,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs, dtype="int64")),
                "text": texts,
                "lang": [LANGS[i] for i in lang_idx],
                "source": [f"src{i}" for i in rng.randint(0, 20, n_docs)],
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype="int64")
                ),
            }
        ),
    )

    # embeddings: 10 label clusters on the unit sphere (center pull +
    # noise, L2-normalized float32), a few exact-duplicate vectors
    dim = 64
    centers = rng.randn(10, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, 10, n_emb)
    x = centers[labels] * 0.6 + rng.randn(n_emb, dim) * 0.35
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    for j in range(max(2, n_emb // 500)):
        src = int(rng.randint(0, n_emb // 2))
        dst = n_emb // 2 + int(rng.randint(0, n_emb // 2))
        x[dst] = x[src]
        labels[dst] = labels[src]
    emb32 = x.astype("float32")
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb, dtype="int64")),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb32.ravel(), pa.float32()), dim
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(labels.astype("int32")),
            }
        ),
    )


if __name__ == "__main__":
    args = list(sys.argv[1:])
    vocab_size = VOCAB_SIZE
    if "--vocab-size" in args:
        i = args.index("--vocab-size")
        vocab_size = int(args[i + 1])
        del args[i : i + 2]
    sf = float(args[0]) if len(args) > 0 else 1.0
    sf_name = f"{sf:g}"
    out = (
        args[1]
        if len(args) > 1
        else os.path.join(REPO, ".testdata", f"sf{sf_name}")
    )
    generate(sf, out, vocab_size=vocab_size)
