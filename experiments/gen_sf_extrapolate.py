#!/usr/bin/env python
"""Extrapolate the driver's deterministic testdata family to a larger scale
factor, for LOCAL driver-scale validation runs only.

The driver generates /root/testdata/sf{0.001,0.01,0.1} (TESTDATA.md;
read-only) and, at measurement time, may generate a larger SF itself
(BENCH_r05.json recorded sf=1.0). That sf1.0 directory is not persisted
between sessions, so this script rebuilds a STATISTICALLY EQUIVALENT
dataset by extrapolating the observed sf0.01/sf0.1 family: same schemas,
same dtypes, same per-table scaling (10x rows per SF step; nation/region
fixed; events keep their fixed 30-day span and densify), same categorical
sets and value ranges, and the same plant structure that the dedup/ANN
operators exercise (5%% of documents in near-dup pairs marked with the
'dup' token at ~0.98 shingle-Jaccard, ~0.16%% exact text dups, ~4%% of
embeddings in planted pairs at cos 0.45-0.64 on unit vectors).

It is NOT byte-identical to the driver's own generator output (seed
streams differ), so numbers from it are comparable across local runs but
not bit-comparable to driver boards. Row-group sizing mirrors the driver
family: one row group per ~1M rows (sf1.0 lineitem = 6M rows / 6 groups).

Usage: python experiments/gen_sf_extrapolate.py [--sf 1.0] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import numpy as np
import pandas as pd

VOCAB = (
    "a agg batch big column customer data fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJS = "blue cold hot large new old red small".split()
NOUNS = "anvil bolt gear gizmo plate ring rod widget".split()
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]

US = 1_000_000


def _days(rng, n, lo, hi):
    lo, hi = np.datetime64(lo), np.datetime64(hi)
    span = (hi - lo).astype("timedelta64[D]").astype(int)
    return (lo + rng.integers(0, span + 1, n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def _write(df, out, name, row_group_rows=1_000_000):
    df.to_parquet(
        os.path.join(out, f"{name}.parquet"), index=False, row_group_size=row_group_rows
    )


def gen(sf: float, out: str, base: str = "/root/testdata") -> None:
    rng = np.random.default_rng(42)
    os.makedirs(out, exist_ok=True)
    mult = sf / 0.1  # extrapolate from the sf0.1 member

    # fixed dimension tables: copy verbatim from the driver family
    for t in ("region", "nation"):
        shutil.copy(os.path.join(base, "sf0.1", f"{t}.parquet"), out)

    n_cust = int(15_000 * mult)
    n_supp = int(1_000 * mult)
    n_part = int(20_000 * mult)
    n_ord = int(150_000 * mult)
    n_li = int(600_000 * mult)
    n_ev = int(100_000 * mult)
    n_doc = int(5_000 * mult)
    n_emb = int(2_000 * mult)

    _write(
        pd.DataFrame(
            {
                "c_custkey": np.arange(n_cust, dtype=np.int64),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
            }
        ),
        out,
        "customer",
    )

    _write(
        pd.DataFrame(
            {
                "s_suppkey": np.arange(n_supp, dtype=np.int64),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
        out,
        "supplier",
    )

    pk = np.arange(n_part, dtype=np.int64)
    _write(
        pd.DataFrame(
            {
                "p_partkey": pk,
                "p_name": [
                    f"{ADJS[a]} {NOUNS[b]}"
                    for a, b in zip(
                        rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
                    )
                ],
                "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
                "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
                "p_size": rng.integers(1, 51, n_part, dtype=np.int32),
                "p_retailprice": 900.0 + (pk % 1000) / 10.0,
            }
        ),
        out,
        "part",
    )

    _write(
        pd.DataFrame(
            {
                "o_orderkey": np.arange(n_ord, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, n_ord),
                "o_orderstatus": np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)],
                "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": _days(rng, n_ord, "1995-01-01", "2001-08-01"),
                "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
            }
        ),
        out,
        "orders",
    )

    _write(
        pd.DataFrame(
            {
                "l_orderkey": rng.integers(0, n_ord, n_li),
                "l_partkey": rng.integers(0, n_part, n_li),
                "l_suppkey": rng.integers(0, n_supp, n_li),
                "l_linenumber": rng.integers(1, 8, n_li, dtype=np.int32),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": rng.integers(0, 11, n_li) / 100.0,
                "l_tax": rng.integers(0, 9, n_li) / 100.0,
                "l_returnflag": np.array(["N", "R", "A"])[rng.integers(0, 3, n_li)],
                "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
                "l_shipdate": _days(rng, n_li, "1995-01-02", "2001-11-04"),
            }
        ),
        out,
        "lineitem",
    )

    # events: fixed 30-day window at every SF (observed sf0.01 and sf0.1);
    # users track the customer count of the NEXT-smaller family member
    n_users = n_cust // 10
    span_us = 30 * 24 * 3600 * US
    _write(
        pd.DataFrame(
            {
                "event_id": np.arange(n_ev, dtype=np.int64),
                "ts": (
                    np.datetime64("2024-01-01", "us")
                    + np.sort(rng.integers(0, span_us, n_ev)).astype("timedelta64[us]")
                ),
                "user_id": rng.integers(0, n_users, n_ev),
                "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
                "value": np.round(rng.exponential(50.0, n_ev), 2),
                "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
            }
        ),
        out,
        "events",
    )

    # documents: iid draws over the 30-word vocab, 10-100 words; plants:
    # 5% of docs form near-dup pairs (one token swapped to 'dup' in each
    # copy -> ~0.98 shingle jaccard), 0.16% exact text dups
    lens = rng.integers(10, 101, n_doc)
    draws = rng.integers(0, len(VOCAB), int(lens.sum()))
    offs = np.concatenate(([0], np.cumsum(lens)))
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[draws[offs[i] : offs[i + 1]]]) for i in range(n_doc)]
    n_pairs = int(n_doc * 0.025)
    pair_ids = rng.choice(n_doc, 2 * n_pairs, replace=False)
    for a, b in zip(pair_ids[:n_pairs], pair_ids[n_pairs:]):
        w = texts[a].split()
        wa, wb = w[:], w[:]
        wa[rng.integers(0, len(w))] = "dup"
        wb[rng.integers(0, len(w))] = "dup"
        texts[a], texts[b] = " ".join(wa), " ".join(wb)
    exact_src = rng.choice(n_doc, int(n_doc * 0.0016) * 2, replace=False)
    half = len(exact_src) // 2
    for a, b in zip(exact_src[:half], exact_src[half:]):
        texts[b] = texts[a]
    _write(
        pd.DataFrame(
            {
                "doc_id": np.arange(n_doc, dtype=np.int64),
                "text": texts,
                "lang": np.array(LANGS)[
                    rng.choice(len(LANGS), n_doc, p=np.array(LANG_P) / sum(LANG_P))
                ],
                "source": [f"src{i % 20}" for i in range(n_doc)],
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        ),
        out,
        "documents",
    )

    # embeddings: 64-dim unit float32 vectors; 4% in planted pairs at
    # cos 0.45-0.64 (lam in [1.2, 2.0]: cos = 1/sqrt(1+lam^2))
    V = rng.standard_normal((n_emb, 64))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    n_ep = int(n_emb * 0.02)
    eids = rng.choice(n_emb, 2 * n_ep, replace=False)
    for a, b in zip(eids[:n_ep], eids[n_ep:]):
        # unit noise at weight lam gives cos(V[a], V[b]) = 1/sqrt(1+lam^2)
        lam = rng.uniform(1.2, 2.0)
        g = rng.standard_normal(64)
        g /= np.linalg.norm(g)
        v = V[a] + lam * g
        V[b] = v / np.linalg.norm(v)
    _write(
        pd.DataFrame(
            {
                "vec_id": np.arange(n_emb, dtype=np.int64),
                "embedding": list(V.astype(np.float32)),
                "label": rng.integers(0, 10, n_emb, dtype=np.int32),
            }
        ),
        out,
        "embeddings",
    )

    with open(os.path.join(out, "_DONE"), "w"):
        pass
    meta = {t: int(v) for t, v in [
        ("customer", n_cust), ("supplier", n_supp), ("part", n_part),
        ("orders", n_ord), ("lineitem", n_li), ("events", n_ev),
        ("documents", n_doc), ("embeddings", n_emb)]}
    print(json.dumps({"sf": sf, "out": out, "rows": meta}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or f"/root/sf{args.sf}_local"
    gen(args.sf, out)
