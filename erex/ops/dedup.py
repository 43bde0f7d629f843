"""Deduplication operators over the `documents` table.

- exact: content-hash groupby (hash-partition + per-group min/count);
- n-gram Jaccard: exact pairwise similarity via shingle explosion +
  co-occurrence counting (the SQL-checkable baseline);
- MinHash + LSH: shingle -> 128 minhashes -> 32x4 bands -> bucket
  groupby -> candidate pairs -> exact-Jaccard verification (the scale
  path: cost is linear in documents + candidates, never all-pairs);
- SimHash: 64-bit fingerprints, 4x16-bit band buckets, Hamming<=k verify;
- embedding near-dup lives in erex.ops.similarity.

All hashing is explicit and deterministic (md5-derived) so results are
reproducible across the Ray pipeline, the pytest oracle, and reruns.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .._env import remote_args
from ray.data.aggregate import Count, Min, Sum

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def _tokens(text: str) -> list:
    return TOKEN_RE.findall(text.lower())


def shingle_set(text: str, n: int = 3) -> set:
    toks = _tokens(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """(text_hash, keep_id=min doc_id, n_dups) — hash-partitioned
    groupby; md5 matches DuckDB's md5()."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode()).hexdigest()
              for x in t.column("text").to_pylist()]
        return pa.table({"text_hash": pa.array(hs, pa.string()),
                         "doc_id": t.column("doc_id")})

    out = (ds.map_batches(f, batch_format="pyarrow", **remote_args())
             .groupby("text_hash")
             .aggregate(Min("doc_id", alias_name="keep_id"),
                        Count(alias_name="n_dups")))
    return out.to_pandas().sort_values("text_hash").reset_index(drop=True)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (SQL-checkable)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(sf_dir: str, n: int = 3,
                        threshold_milli: int = 200) -> pd.DataFrame:
    """All doc pairs with Jaccard(3-gram shingle sets) >= threshold.
    Distributed shape: explode distinct shingles -> groupby(shingle)
    emits co-occurring pairs -> groupby(pair) counts intersections ->
    broadcast set sizes -> filter. Returns (doc_a, doc_b,
    jaccard_milli)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids, shs, sizes_id, sizes_n = [], [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            ss = shingle_set(x, n)
            sizes_id.append(d)
            sizes_n.append(len(ss))
            for s in ss:
                ids.append(d)
                shs.append(s)
        return pa.table({"shingle": pa.array(shs, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow", **remote_args())

    # shard-then-local-groupby (see minhash_lsh_pairs): one coarse
    # shuffle key, vectorized per-shard pair counting
    def add_shard(t: pa.Table) -> pa.Table:
        sh = [int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % 64
              for s in t.column("shingle").to_pylist()]
        return t.append_column("shard", pa.array(sh, pa.int32()))

    def shard_pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        agg: dict = {}
        for _s, docs in g.groupby("shingle")["doc_id"]:
            u = sorted(docs.unique())
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    k = (u[i], u[j])
                    agg[k] = agg.get(k, 0) + 1
        return pd.DataFrame(
            {"doc_a": [k[0] for k in agg], "doc_b": [k[1] for k in agg],
             "inter": np.fromiter(agg.values(), dtype=np.int64,
                                  count=len(agg))})

    pairs = (exploded.map_batches(add_shard, batch_format="pyarrow", **remote_args())
             .groupby("shard")
             .map_groups(shard_pair_counts, batch_format="pandas", **remote_args())
             .groupby(["doc_a", "doc_b"])
             .aggregate(Sum("inter", alias_name="inter")))

    # set sizes: small enough to collect (one row per doc)
    sizes_df = pd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    sizes = {d: len(shingle_set(x, n))
             for d, x in zip(sizes_df["doc_id"], sizes_df["text"])}
    df = pairs.to_pandas()
    na = df["doc_a"].map(sizes)
    nb = df["doc_b"].map(sizes)
    union = na + nb - df["inter"]
    df["jaccard_milli"] = np.floor(
        1000 * df["inter"] / union.clip(lower=1)).astype(np.int64)
    df = df[df["jaccard_milli"] >= threshold_milli]
    return df[["doc_a", "doc_b", "jaccard_milli"]].sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
N_PERM = 128
N_BANDS = 64        # 64 bands x 2 rows: ~93% candidate recall at J=0.2
ROWS_PER_BAND = N_PERM // N_BANDS
_P31 = (1 << 31) - 1          # Mersenne prime; a*x+b stays < 2^63
_rng = np.random.RandomState(1234567)
_A = _rng.randint(1, _P31, size=N_PERM).astype(np.int64)
_B = _rng.randint(0, _P31, size=N_PERM).astype(np.int64)


def minhash_signature(text: str, n: int = 3) -> np.ndarray:
    ss = shingle_set(text, n)
    if not ss:
        return np.full(N_PERM, _P31, dtype=np.int64)
    xs = np.fromiter((_h64(s) for s in ss), dtype=np.uint64, count=len(ss))
    xs = (xs % _P31).astype(np.int64)
    # (a*x + b) mod p, vectorized perms x shingles, min over shingles
    prod = (_A[:, None] * xs[None, :] + _B[:, None]) % _P31
    return np.min(prod, axis=1).astype(np.int64)


class MinHasher:
    """Actor-pool stage: permutation constants are module state; kept as
    a class to document the stateful-stage shape."""

    def __init__(self, n: int = 3):
        self.n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            sig = minhash_signature(x, self.n)
            for b in range(N_BANDS):
                chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
                key = hashlib.md5(
                    chunk.tobytes() + bytes([b])).hexdigest()[:16]
                ids.append(d)
                bands.append(b)
                keys.append(key)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band": pa.array(bands, pa.int32()),
                         "bucket": pa.array(keys, pa.string())})


def minhash_lsh_pairs(sf_dir: str, n: int = 3,
                      threshold_milli: int = 200) -> pd.DataFrame:
    """Candidates from LSH band buckets, verified with exact Jaccard.
    Returns (doc_a, doc_b, jaccard_milli) for verified pairs."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    buckets = ds.map_batches(MinHasher(n), batch_format="pyarrow",
                             batch_size=512, **remote_args())

    # shard-then-local-groupby: grouping by a coarse shard key keeps the
    # shuffle but avoids per-tiny-group task overhead (32k band-buckets
    # -> 64 shards, each doing a vectorized pandas groupby locally)
    def add_shard(t: pa.Table) -> pa.Table:
        sh = [int(b[:4], 16) % 64 for b in t.column("bucket").to_pylist()]
        return t.append_column("shard", pa.array(sh, pa.int32()))

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = [], []
        for (_band, _bucket), docs in g.groupby(["band", "bucket"])["doc_id"]:
            u = sorted(docs.unique())
            for i in range(len(u)):
                for j in range(i + 1, len(u)):
                    a.append(u[i])
                    b.append(u[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = (buckets.map_batches(add_shard, batch_format="pyarrow", **remote_args())
            .groupby("shard")
            .map_groups(shard_pairs, batch_format="pandas", **remote_args()))
    cand_df = cand.to_pandas().drop_duplicates()

    # verification against exact shingle Jaccard (small candidate set)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    sets = {d: shingle_set(x, n) for d, x in zip(docs["doc_id"],
                                                 docs["text"])}
    out = []
    for da, db in cand_df.itertuples(index=False):
        sa, sb = sets[da], sets[db]
        union = len(sa | sb)
        jm = int(1000 * len(sa & sb) / max(1, union))
        if jm >= threshold_milli:
            out.append((da, db, jm))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard_milli"])\
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash64(text: str) -> int:
    toks = _tokens(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in set(toks):
        h = _h64(w)
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8))
        acc += np.where(bits == 1, 1, -1)
    return int("".join("1" if v > 0 else "0" for v in acc), 2)


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash: 4x16-bit band bucketing (any pair
    within Hamming<=3 of a 64-bit hash shares at least one exact 16-bit
    quarter), then Hamming verification."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        ids, bands, keys, hashes = [], [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            h = simhash64(x)
            for b in range(4):
                ids.append(d)
                bands.append(b)
                keys.append((h >> (16 * b)) & 0xFFFF)
                hashes.append(h)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int64()),
                         "simhash": pa.array(
                             [v - (1 << 63) for v in hashes], pa.int64())})

    buckets = ds.map_batches(f, batch_format="pyarrow", **remote_args())

    def add_shard(t: pa.Table) -> pa.Table:
        sh = [int(k) % 64 for k in t.column("key").to_pylist()]
        return t.append_column("shard", pa.array(sh, pa.int32()))

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (_b, _k), sub in g.groupby(["band", "key"]):
            recs = sorted(set(zip(sub["doc_id"], sub["simhash"])))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    (da, ha), (db, hb) = recs[i], recs[j]
                    ham = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
                    rows.append((da, db, ham))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    cand = (buckets.map_batches(add_shard, batch_format="pyarrow", **remote_args())
            .groupby("shard")
            .map_groups(shard_pairs, batch_format="pandas", **remote_args()))
    df = cand.to_pandas().drop_duplicates()
    df = df[df["hamming"] <= max_hamming]
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
