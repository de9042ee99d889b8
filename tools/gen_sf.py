#!/usr/bin/env python3
"""Dev-only scale-factor data generator (sf1 and beyond).

The driver ships deterministic synthetic testdata at sf0.001/0.01/0.1
(TESTDATA.md, read-only). Every scale claim above sf0.1 was, through
round 7, an extrapolation from plan shape; this generator closes that
gap by producing SCHEMA- AND DISTRIBUTION-COMPATIBLE tables at any sf
so the full Verify + DuckDB-oracle loop and Bench can run at 10x bench
scale. It does NOT reproduce the driver's exact rows (its generator is
not published); it reproduces the statistical shape, which is all the
oracle gate needs — tools/check.py compares Spark vs DuckDB over the
SAME generated files.

Distribution contract (measured from /root/testdata/sf0.1, seed 42):
  region/nation   constant 5/25 rows — copied verbatim from sf0.1
  customer  150k/sf  uniform nation 0-24, acctbal U(-1000,10000),
                     5 uniform mktsegments, name Customer#%09d
  supplier  10k/sf   same shape, name Supplier#%09d
  part      200k/sf  name = adj+noun (8x8), Brand#{0..24}, 6 types,
                     size U{1..50}, retailprice = 900 + 0.1*(key%1000)
  orders    1.5M/sf  custkey uniform, status U{F,O,P}, totalprice
                     U(1000,500000), date U[1995-01-01,2001-08-01),
                     5 uniform priorities
  lineitem  ~6M/sf   1+Poisson(3) lines per order (measured mean 4.0),
                     part/supp uniform, qty U{1..50}, extprice
                     U(900,105000), disc U{0..0.10 by .01}, tax
                     U{0..0.08 by .01}, rf U{A,N,R}, ls U{O,F},
                     shipdate U[1995-01-02,2001-11-04) independent of
                     orderdate (measured diff range -2399..+2496)
  events    1M/sf    15k users/sf, ts U over 2024-01 (DENSITY grows
                     with sf, span fixed — matches driver behavior),
                     file ordered by ts with event_id in ts order
                     (measured: zero inversions), type uniform over
                     {signup,purchase,view,click,error}, value
                     Exp(mean 50), props = {"k": U{0..99}},
                     parquet TIMESTAMP(MICROS) (round-7+ layout)
  documents 50k/sf   10..100 words uniform from the 31-word vocab,
                     lang en 40% / zh,es,fr,de 15%, source src0..19
  embeddings 20k/sf  64-d unit vectors = normalize(N(0,1) + 0.1 *
                     label_centroid)  (measured intra-label cosine
                     +0.008 vs inter -0.002 => weight ~ 0.1), label
                     uniform 0..9

Usage: python3 tools/gen_sf.py <sf> <outDir> [--vocab-growth] [--skew]
       [--hot-shingle]
       e.g. 1 /tmp/sf1

Modes (round-9 verdict tasks 1 and 6):

  --vocab-growth  NATURAL-CORPUS documents + embeddings. The default
      corpus reuses the driver's fixed 31-word vocabulary, which
      saturates the trigram space at 31^3: posting lists then grow
      ~linearly with SF and any lossless candidate enumeration
      (d11's PPJoin) pays ~SF^2 — a corpus artifact, not a plan
      property. This mode grows the vocabulary by Heaps' law
      (V = 8 * N_tokens^0.55, so 10x data => ~3.5x vocab) with a
      Zipf(1.1) rank distribution — the empirical shape of natural
      text — and scales embedding cluster count with corpus size
      (1 centroid per 200 vectors) instead of 10 fixed centroids,
      de-saturating d05's signature space the same way. Planted
      near-duplicates (3%, tail-perturbed) are kept so the near-dup
      family stays non-vacuous. Measuring d02/d05/d11 at sf0.1 and
      sf1 on THIS corpus is the test of the PLANS.md claim that the
      plans are linear-class on realistic data.

  --hot-shingle  (round 15) d11's adversarial corpus: 20% of docs are
      4-word docs sharing ONE word-3-gram (plus a unique tail), so a
      single near-universal trigram floods the prefix index with a
      C(n/5, 2) candidate set on one h60 key while cross-pair Jaccard
      stays 1/3 < 1/2 (the true pair set stays organic). Probes the
      bitmap + positional residual and the single-key join skew path.

  --skew  One hot customer owns ~20% of orders AND one hot user owns
      ~20% of events (the rest uniform). Every sf1 scale measurement
      through round 8 ran on near-uniform keys; this probes the AQE
      skew-join and salting paths (q36/q53), the grouped-agg hot-key
      behavior (q01/q79), per-key window chains (q40/q41/q56/q59),
      and the per-user bucketed range joins (q37/q82) under a
      realistic power-law key. Round 9 found q41's
      O(probes × versions) hot-key hang with exactly this corpus.
"""
import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/testdata/sf0.1"  # constant-table source + distribution reference

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ETYPES = ["signup", "purchase", "view", "click", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]

DAY_US = 86_400_000_000


def write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def ts_col(us):
    return pa.array(us, type=pa.timestamp("us"))


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2]
    vocab_growth = "--vocab-growth" in sys.argv[3:]
    skew = "--skew" in sys.argv[3:]
    hot_shingle = "--hot-shingle" in sys.argv[3:]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    k = sf / 0.1  # multiplier vs the reference sf0.1 row counts

    # constant dims: verbatim copies
    for t in ["region", "nation"]:
        shutil.copy(f"{REF}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"  {t}: copied")

    n_cust = int(15000 * k)
    n_supp = int(1000 * k)
    n_part = int(20000 * k)
    n_ord = int(150000 * k)
    n_evt = int(100000 * k)
    n_user = int(1500 * k)
    n_doc = int(5000 * k)
    n_vec = int(2000 * k)

    ck = np.arange(n_cust, dtype=np.int64)
    write(out, "customer", pa.table({
        "c_custkey": ck,
        "c_name": [f"Customer#{i:09d}" for i in ck],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust),
    }))

    sk = np.arange(n_supp, dtype=np.int64)
    write(out, "supplier", pa.table({
        "s_suppkey": sk,
        "s_name": [f"Supplier#{i:09d}" for i in sk],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    pk = np.arange(n_part, dtype=np.int64)
    write(out, "part", pa.table({
        "p_partkey": pk,
        "p_name": [f"{rng.choice(ADJ)} {rng.choice(NOUN)}" for _ in pk],
        "p_brand": [f"Brand#{rng.integers(0, 25)}" for _ in pk],
        "p_type": rng.choice(PTYPES, n_part),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * (pk % 1000), 1),
    }))

    ok = np.arange(n_ord, dtype=np.int64)
    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    d1 = np.datetime64("2001-08-01").astype("datetime64[us]").astype(np.int64)
    odate = d0 + rng.integers(0, (d1 - d0) // DAY_US + 1, n_ord) * DAY_US
    o_cust = rng.integers(0, n_cust, n_ord)
    if skew:
        # one hot key: ~20% of all orders land on customer 0
        o_cust[rng.random(n_ord) < 0.2] = 0
        print(f"  skew: customer 0 owns {(o_cust == 0).mean():.1%} of orders")
    write(out, "orders", pa.table({
        "o_orderkey": ok,
        "o_custkey": o_cust,
        "o_orderstatus": rng.choice(["F", "O", "P"], n_ord),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": ts_col(odate),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord),
    }))

    lines = 1 + rng.poisson(3.0, n_ord)
    lok = np.repeat(ok, lines)
    n_li = lok.size
    lno = np.concatenate([np.arange(1, c + 1) for c in lines]).astype(np.int32)
    s0 = np.datetime64("1995-01-02").astype("datetime64[us]").astype(np.int64)
    s1 = np.datetime64("2001-11-04").astype("datetime64[us]").astype(np.int64)
    write(out, "lineitem", pa.table({
        "l_orderkey": lok,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": lno,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": ts_col(
            s0 + rng.integers(0, (s1 - s0) // DAY_US + 1, n_li) * DAY_US),
    }))

    e0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ets = np.sort(e0 + rng.integers(0, 30 * DAY_US, n_evt))
    e_user = rng.integers(0, n_user, n_evt)
    if skew:
        # one hot key here too: ~20% of all events land on user 0
        e_user[rng.random(n_evt) < 0.2] = 0
        print(f"  skew: user 0 owns {(e_user == 0).mean():.1%} of events")
    write(out, "events", pa.table({
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": ts_col(ets),
        "user_id": e_user,
        "event_type": rng.choice(ETYPES, n_evt),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": [json.dumps({"k": int(x)})
                  for x in rng.integers(0, 100, n_evt)],
    }))

    # ~3% of docs are PLANTED near-duplicates of an earlier doc (the
    # driver's corpus has these too: sf0.1 yields 25 J>=0.5 pairs for
    # d11): copy a prior doc and perturb the tail ~10% of words, so
    # Jaccard over word-3-grams stays well above 1/2. Purely random
    # 31-token word salads essentially never share half their shingle
    # sets, which would leave the near-dup family (d02/d07/d11)
    # vacuously green at generated SFs.
    texts = []
    if vocab_growth:
        # Heaps' law: V = 8 * N^0.55 over the expected token count
        # (mean 55 words/doc), Zipf(1.1) rank distribution — natural
        # text grows its vocabulary with corpus size, which keeps
        # shingle posting lists short and bounded instead of packing
        # the whole corpus into 31^3 trigram keys.
        n_tok = n_doc * 55
        v_size = max(len(VOCAB), int(8 * n_tok ** 0.55))
        ranks = np.arange(1, v_size + 1, dtype=np.float64)
        zipf_p = ranks ** -1.1
        zipf_p /= zipf_p.sum()
        vocab = np.array([f"w{r}" for r in range(v_size)])
        print(f"  vocab-growth: {v_size} words over ~{n_tok} tokens")

        def draw_words(n_w):
            return vocab[rng.choice(v_size, n_w, p=zipf_p)]
    else:
        vocab = np.array(VOCAB)

        def draw_words(n_w):
            return vocab[rng.integers(0, len(vocab), n_w)]
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.03:
            src_i = rng.integers(0, i)
            w = texts[src_i].split(" ")
            n_mut = max(1, len(w) // 10)
            for _ in range(n_mut):
                w[rng.integers(0, len(w))] = str(draw_words(1)[0])
            texts.append(" ".join(w))
        else:
            n_w = rng.integers(10, 101)
            texts.append(" ".join(draw_words(n_w)))
    if hot_shingle:
        # --hot-shingle (round-15 verdict #5): the adversarial corpus
        # for d11's prefix index. Prefix filtering is self-defending
        # for LONG docs — a token only enters a doc's (rarest-first)
        # prefix when the doc's other tokens are even more common —
        # so the worst case is SHORT docs: a 4-word doc has exactly
        # TWO distinct word-3-grams and its prefix holds BOTH of them
        # regardless of df. 20% of docs become "hotprefa hotprefb
        # hotprefc uq<i>": one trigram shared by every hot doc (a
        # prefix posting list of n_doc/5 — the near-universal prefix
        # token) plus one globally-unique tail trigram. Cross pairs
        # have J = 1/3 < 1/2 (share only the hot trigram), so the
        # TRUE pair set stays the organic one — the probe measures
        # purely whether the residual filters absorb the C(n/5, 2)
        # candidate flood on a single h60 key.
        n_hot = 0
        for i in range(n_doc):
            if i % 5 == 2:
                texts[i] = f"hotprefa hotprefb hotprefc uq{i}"
                n_hot += 1
        print(f"  hot-shingle: {n_hot} docs ({n_hot / n_doc:.0%}) share "
              f"one prefix trigram -> ~{n_hot * (n_hot - 1) // 2} "
              f"candidate pairs on one key")
    write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, n_doc, p=[0.4, 0.15, 0.15, 0.15, 0.15]),
        "source": [f"src{rng.integers(0, 20)}" for _ in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    # default: the driver's 10 fixed centroids; vocab-growth mode
    # scales cluster count with corpus size (1 per 200 vectors) so
    # the embedding signature space grows with the data instead of
    # saturating — same schema (int32 label), just more groups
    n_cent = max(10, n_vec // 200) if vocab_growth else 10
    if vocab_growth:
        print(f"  vocab-growth: {n_cent} embedding centroids")
    cent = rng.standard_normal((n_cent, 64))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    labels = rng.integers(0, n_cent, n_vec)
    vecs = rng.standard_normal((n_vec, 64)) + 0.1 * cent[labels]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": pa.array([v.astype(np.float32) for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": labels.astype(np.int32),
    }))
    print(f"done: sf{sf} at {out}")


if __name__ == "__main__":
    main()
