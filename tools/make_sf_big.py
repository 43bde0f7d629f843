"""Deterministic sf1-scale synthetic tables for the heavy-family soak.

The driver ships sf{0.001,0.01,0.1}; the round-4 verdict (next #6) asks
for one measured row per heavy operator at ~10x the driver gate's
scale, to catch fixed-constant cliffs before they are structural.  This
generator mimics the sf tables' shapes and distributions (same schemas,
same 31-word document vocabulary, 10-100 tokens/doc, 20 sources, dim-64
embeddings, TPC-H-ish fact tables at 10x sf0.1 row counts) with a fixed
seed — soak/benchmark input only, never a correctness oracle input.

    python tools/make_sf_big.py [--scale 10] [--out /tmp/erex_sf1]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

# the sf tables' actual document vocabulary (31 words)
VOCAB = ("a agg batch big column customer data dup fast filter group "
         "hash join key line merge order part query row scan slow small "
         "sort spark stream table the value vector window").split()
assert len(VOCAB) == 31


def gen(out: str, scale: int, seed: int = 2024) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    base = "/root/testdata/sf0.1"

    # --- documents -----------------------------------------------------
    # Template mixing matters: the driver's sf tables have ~9% duplicate
    # 8-gram positions and real minhash near-dup pairs; pure uniform
    # draws would make every k-gram unique and under-exercise the dedup
    # machinery, so half of each document is drawn from a fixed pool of
    # 8-word sentences (shared across documents) and half is random.
    n_docs = 5000 * scale
    words = np.array(VOCAB)
    pool = [" ".join(words[rng.integers(0, 31, 8)]) for _ in range(3000)]
    texts = []
    for _ in range(n_docs):
        n_sent = int(rng.integers(2, 13))   # 16-96 tokens
        parts = [pool[int(rng.integers(0, len(pool)))]
                 if rng.random() < 0.5
                 else " ".join(words[rng.integers(0, 31, 8)])
                 for _ in range(n_sent)]
        texts.append(" ".join(parts))
    pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": np.array(["en", "zh", "es", "fr", "de"])[
            rng.integers(0, 5, n_docs)],
        "source": np.array([f"src{i}" for i in range(20)])[
            rng.integers(0, 20, n_docs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }).to_parquet(f"{out}/documents.parquet", index=False)

    # --- embeddings ----------------------------------------------------
    n_vec = 2000 * scale
    M = rng.standard_normal((n_vec, 64)).astype(np.float64)
    pd.DataFrame({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": list(M),
        "label": rng.integers(0, 10, n_vec).astype(np.int64),
    }).to_parquet(f"{out}/embeddings.parquet", index=False)

    # --- TPC-H-ish facts -----------------------------------------------
    n_orders = 150_000 * scale
    n_cust = 15_000 * scale
    n_part = 20_000 * scale
    n_supp = 1_000 * scale
    n_li = 600_000 * scale
    for small in ("region", "nation"):
        pd.read_parquet(f"{base}/{small}.parquet").to_parquet(
            f"{out}/{small}.parquet", index=False)
    pd.DataFrame({
        "c_custkey": np.arange(1, n_cust + 1, dtype=np.int64),
        "c_name": [f"Customer#{i}" for i in range(1, n_cust + 1)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int64),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(
            ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
             "FURNITURE"])[rng.integers(0, 5, n_cust)],
    }).to_parquet(f"{out}/customer.parquet", index=False)
    pd.DataFrame({
        "s_suppkey": np.arange(1, n_supp + 1, dtype=np.int64),
        "s_name": [f"Supplier#{i}" for i in range(1, n_supp + 1)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int64),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }).to_parquet(f"{out}/supplier.parquet", index=False)
    pd.DataFrame({
        "p_partkey": np.arange(1, n_part + 1, dtype=np.int64),
        "p_name": [f"part {i}" for i in range(1, n_part + 1)],
        "p_brand": np.array([f"Brand#{i}{j}" for i in range(1, 6)
                             for j in range(1, 6)])[
            rng.integers(0, 25, n_part)],
        "p_type": np.array(["STANDARD", "SMALL", "MEDIUM", "LARGE",
                            "ECONOMY", "PROMO"])[
            rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int64),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }).to_parquet(f"{out}/part.parquet", index=False)
    odate = (np.datetime64("1992-01-01") +
             rng.integers(0, 2405, n_orders).astype("timedelta64[D]"))
    pd.DataFrame({
        "o_orderkey": np.arange(1, n_orders + 1, dtype=np.int64),
        "o_custkey": rng.integers(1, n_cust + 1, n_orders)
        .astype(np.int64),
        "o_orderstatus": np.array(["F", "O", "P"])[
            rng.integers(0, 3, n_orders)],
        "o_totalprice": np.round(rng.uniform(800, 500_000, n_orders), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"])[rng.integers(0, 5, n_orders)],
    }).to_parquet(f"{out}/orders.parquet", index=False)
    okey = rng.integers(1, n_orders + 1, n_li).astype(np.int64)
    okey.sort()
    sdate = (np.datetime64("1992-01-02") +
             rng.integers(0, 2500, n_li).astype("timedelta64[D]"))
    pd.DataFrame({
        "l_orderkey": okey,
        "l_partkey": rng.integers(1, n_part + 1, n_li).astype(np.int64),
        "l_suppkey": rng.integers(1, n_supp + 1, n_li).astype(np.int64),
        "l_linenumber": np.ones(n_li, dtype=np.int64),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": sdate.astype("datetime64[us]"),
    }).to_parquet(f"{out}/lineitem.parquet", index=False)
    # events (schema parity; user_id range matches sf0.1's)
    n_ev = 100_000 * scale
    ts = (np.datetime64("2024-01-01") +
          rng.integers(0, 30 * 86_400_000, n_ev)
          .astype("timedelta64[ms]"))
    pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": rng.integers(0, 500 * scale, n_ev).astype(np.int64),
        "event_type": np.array(["view", "click", "purchase", "error",
                                "login"])[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 100, n_ev), 2),
        "props": [f'{{"k": {int(v)}}}' for v in
                  rng.integers(0, 100, n_ev)],
    }).to_parquet(f"{out}/events.parquet", index=False)
    print(f"wrote {out}: docs={n_docs} vecs={n_vec} lineitem={n_li} "
          f"orders={n_orders} events={n_ev}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--out", default="/tmp/erex_sf1")
    a = ap.parse_args()
    gen(a.out, a.scale)
