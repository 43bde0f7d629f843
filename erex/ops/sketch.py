"""Sketch operators — the approximate, fixed-memory scale path for
corpus statistics that would otherwise need an all-to-all exchange
over every distinct value:

- HyperLogLog distinct counting (register merge is a tiny
  groupby().max over <= m rows, independent of corpus size), and
- count-min-sketch heavy hitters (two streaming passes + one
  constant-size sketch broadcast, never a full-vocabulary shuffle).

Both are defined over md5-derived integer hashes and pure integer
estimator arithmetic, so — unusually for sketches — their outputs are
EXACTLY reproducible by a DuckDB oracle (__ray_entry__ registers full
SQL replicas): the sketch math itself is hash-checked, not just
bounded by a recall test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .._env import remote_args
from .dedup import _h64
from .text import LOWER_TOKEN_RE as _TOK

# --- HyperLogLog parameters (m = 2^P registers) -------------------------
HLL_P = 10
HLL_M = 1 << HLL_P                 # 1024 registers
_SUFFIX_BITS = 64 - HLL_P          # 54
_SUFFIX_MASK = (1 << _SUFFIX_BITS) - 1
_RHO_EMPTY = _SUFFIX_BITS + 1      # 55: suffix is all zeros
# alpha_m = 0.7213 / (1 + 1.079/m) for m=1024, as an exact rational so
# the estimate is integer-reproducible (no float in the estimator)
_ALPHA_NUM = 72054
_ALPHA_DEN = 100000


def _shingles(text: str, n: int = 3):
    ws = _TOK.findall(text.lower())
    return (" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1))


def distinct_shingles(sf_dir: str, n: int = 3) -> pd.DataFrame:
    """Exact corpus-wide distinct 3-gram shingle count: per-batch
    distinct explode -> groupby(shingle) -> group count. This is the
    operator HLL replaces at scale — the groupby key cardinality IS
    the answer, so the exchange grows with the vocabulary."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        seen = set()
        for x in t.column("text").to_pylist():
            seen.update(_shingles(x, n))
        return pa.table({"shingle": pa.array(sorted(seen), pa.string())})

    n_distinct = (ds.map_batches(explode, batch_format="pyarrow",
                                 **remote_args())
                  .groupby("shingle").count().count())
    return pd.DataFrame({"n_distinct": pd.array([n_distinct],
                                                dtype="int64")})


def hll_register(value: str) -> tuple:
    """(bucket, rho) for one value: bucket = top HLL_P hash bits, rho =
    1-based position of the first set bit in the remaining suffix."""
    h = _h64(value)
    suffix = h & _SUFFIX_MASK
    rho = _RHO_EMPTY if suffix == 0 else _SUFFIX_BITS - suffix.bit_length() + 1
    return h >> _SUFFIX_BITS, rho


def distinct_shingles_hll(sf_dir: str, n: int = 3) -> pd.DataFrame:
    """HLL distinct-shingle estimate. Distributed shape: each batch
    folds its shingles into <= m (bucket, rho) rows; one
    groupby(bucket).max(rho) merges every batch's registers (<= m
    groups regardless of corpus size); the m-row register table plus
    the integer estimator produce (m, zero_buckets, est_distinct).
    Register max-merge is associative/commutative, so the result is
    independent of batching."""
    from ray.data.aggregate import Max
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def fold(t: pa.Table) -> pa.Table:
        reg: dict = {}
        for x in t.column("text").to_pylist():
            for s in _shingles(x, n):
                b, r = hll_register(s)
                if r > reg.get(b, 0):
                    reg[b] = r
        return pa.table({"bucket": pa.array(list(reg.keys()), pa.int64()),
                         "rho": pa.array(list(reg.values()), pa.int64())})

    merged = (ds.map_batches(fold, batch_format="pyarrow", **remote_args())
              .groupby("bucket").aggregate(Max("rho", alias_name="rho"))
              .to_pandas())
    s_pow = _RHO_EMPTY
    nz = len(merged)
    total = int(sum(1 << (s_pow - int(r)) for r in merged["rho"])) \
        + (HLL_M - nz) * (1 << s_pow)
    est = (_ALPHA_NUM * HLL_M * HLL_M * (1 << s_pow)) // (_ALPHA_DEN * total)
    return pd.DataFrame({"m": pd.array([HLL_M], dtype="int64"),
                         "zero_buckets": pd.array([HLL_M - nz],
                                                  dtype="int64"),
                         "est_distinct": pd.array([est], dtype="int64")})


# --- count-min sketch parameters ----------------------------------------
CMS_D = 4
CMS_W = 8192
_CMS_P = 2147483647                       # 2^31 - 1
CMS_A = (1000003, 999983, 1299709, 15485863)
CMS_B = (12345, 67891, 3141592, 2718281)
# heavy-hitter threshold = max(1, total_occurrences // HH_FRAC)
HH_FRAC = 600


def _cms_cols(value: str) -> list:
    hv = _h64(value) % _CMS_P
    return [((CMS_A[i] * hv + CMS_B[i]) % _CMS_P) % CMS_W
            for i in range(CMS_D)]


def heavy_hitter_ngrams(sf_dir: str) -> pd.DataFrame:
    """Heavy-hitter bigrams via count-min sketch, the fixed-memory
    alternative to topk_ngrams' full-vocabulary groupby. Pass 1: each
    batch folds its bigram counts into sketch cells (<= D*W rows per
    batch); groupby(cell).sum merges them into ONE constant-size
    sketch, collected driver-side (32k rows however big the corpus).
    Pass 2: the merged sketch is broadcast back; each batch estimates
    its distinct bigrams (min over the D hashed cells — the classic
    overestimate-only bound) and emits those above threshold
    T = max(1, total // HH_FRAC). Estimates are a pure function of the
    merged sketch, so duplicates across batches are identical rows and
    the final dedup is output-scale. Deterministic under any batching;
    exact SQL replica registered in __ray_entry__."""
    import ray
    from ray.data.aggregate import Sum
    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["text"])

    def fold(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for x in t.column("text").to_pylist():
            ws = _TOK.findall(x.lower())
            c.update(a + " " + b for a, b in zip(ws, ws[1:]))
        if not c:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        # one md5 per distinct bigram (the oracle pins the hash), then
        # the D rows' cells and the bincount fold are pure numpy —
        # a*hv+b < 2^55 so the int64 arithmetic is exact
        ks = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        hv = (np.fromiter((_h64(g) for g in c), dtype=np.uint64,
                          count=len(c))
              % np.uint64(_CMS_P)).astype(np.int64)
        acc = np.zeros(CMS_D * CMS_W, dtype=np.int64)
        for i in range(CMS_D):
            cols = (CMS_A[i] * hv + CMS_B[i]) % _CMS_P % CMS_W
            np.add.at(acc, i * CMS_W + cols, ks)
        nz = np.nonzero(acc)[0]
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "cnt": pa.array(acc[nz], pa.int64())})

    sk_rows = (ds.map_batches(fold, batch_format="pyarrow", **remote_args())
               .groupby("cell").aggregate(Sum("cnt", alias_name="cnt"))
               .to_pandas())
    sketch = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    sketch[sk_rows["cell"].to_numpy()] = sk_rows["cnt"].to_numpy()
    # every occurrence lands once in every row: row 0's sum = total
    total = int(sketch[:CMS_W].sum())
    threshold = max(1, total // HH_FRAC)
    sk_ref = ray.put(sketch)

    def probe(t: pa.Table) -> pa.Table:
        import ray as _ray
        sk = _ray.get(sk_ref)
        seen = set()
        for x in t.column("text").to_pylist():
            ws = _TOK.findall(x.lower())
            seen.update(a + " " + b for a, b in zip(ws, ws[1:]))
        if not seen:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "est_count": pa.array([], pa.int64())})
        grams = list(seen)
        hv = (np.fromiter((_h64(g) for g in grams), dtype=np.uint64,
                          count=len(grams))
              % np.uint64(_CMS_P)).astype(np.int64)
        est = np.min(np.stack(
            [sk[i * CMS_W + (CMS_A[i] * hv + CMS_B[i]) % _CMS_P % CMS_W]
             for i in range(CMS_D)]), axis=0)
        keep = np.nonzero(est >= threshold)[0]
        return pa.table({"ngram": pa.array([grams[i] for i in keep],
                                           pa.string()),
                         "est_count": pa.array(est[keep], pa.int64())})

    cand = rd.read_parquet(path, columns=["text"])\
        .map_batches(probe, batch_format="pyarrow", **remote_args())\
        .to_pandas()
    if cand.empty:
        # no bigram clears the threshold (a legitimate outcome on a
        # flat distribution) — keep the schema for the oracle compare
        return pd.DataFrame({"ngram": pd.Series([], dtype=object),
                             "est_count": pd.Series([], dtype="int64")})
    return cand.drop_duplicates()\
        .sort_values(["est_count", "ngram"], ascending=[False, True])\
        .reset_index(drop=True)


# --- fixed-bin histogram quantiles --------------------------------------
HISTQ_BINS = 1024
HISTQ_PCTS = (50, 95, 99)


def histogram_quantiles(sf_dir: str, bins: int = HISTQ_BINS,
                        pcts: tuple = HISTQ_PCTS) -> pd.DataFrame:
    """Approximate per-group quantiles from a fixed-width histogram —
    the O(bins) scale path next to group_quantiles' exact sort: pass 1
    finds each event_type's (min, max) in integer cents (per-batch
    partial min/max, tiny combine); pass 2 folds each batch into
    <= types x bins partial bin counts before one bounded groupby-sum.
    The quantile walk runs on the result-scale (types x bins) table.
    All arithmetic is non-negative integer (half-up cents, truncating
    division == floor), so the DuckDB replica matches bit-for-bit:
    bin = min(bins-1, (cents-mn)*bins // (mx-mn)), rank = ceil(q*n/100)
    as (q*n+99)//100, answer = mn + bin*(mx-mn) // bins. Returns
    (event_type, q_pct, approx_cents) ordered by (event_type, q_pct)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Min, Sum

    path = f"{sf_dir}/events.parquet"

    def cents_tbl(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(t.column("value"), pa.float64()), 100.0), 0.5)),
            pa.int64())
        return pa.table({"event_type": t.column("event_type"),
                         "cents": cents})

    def mm_partial(t: pa.Table) -> pa.Table:
        g = cents_tbl(t).group_by("event_type").aggregate(
            [("cents", "min"), ("cents", "max"), ([], "count_all")])
        return pa.table({"event_type": g.column("event_type"),
                         "mn": g.column("cents_min"),
                         "mx": g.column("cents_max"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    mm = (rd.read_parquet(path, columns=["event_type", "value"])
          .map_batches(mm_partial, batch_format="pyarrow",
                       **remote_args())
          .groupby("event_type")
          .aggregate(Min("mn", alias_name="mn"),
                     Max("mx", alias_name="mx"),
                     Sum("n", alias_name="n"))
          .to_pandas())
    stats = {r.event_type: (int(r.mn), int(r.mx), int(r.n))
             for r in mm.itertuples()}
    import ray as _ray
    sref = _ray.put(stats)

    def bin_partial(t: pa.Table, _s=sref) -> pa.Table:
        st = _ray.get(_s)
        tt = cents_tbl(t)
        et = tt.column("event_type").to_pylist()
        cents = tt.column("cents").to_numpy(zero_copy_only=False)
        mn = np.array([st[e][0] for e in et], np.int64)
        mx = np.array([st[e][1] for e in et], np.int64)
        width = mx - mn
        b = np.where(width == 0, 0,
                     np.minimum(bins - 1,
                                (cents - mn) * bins
                                // np.where(width == 0, 1, width)))
        g = pa.table({"event_type": tt.column("event_type"),
                      "bin": pa.array(b, pa.int64())})\
            .group_by(["event_type", "bin"])\
            .aggregate([([], "count_all")])
        return pa.table({"event_type": g.column("event_type"),
                         "bin": g.column("bin"),
                         "cnt": pc.cast(g.column("count_all"),
                                        pa.int64())})

    hist = (rd.read_parquet(path, columns=["event_type", "value"])
            .map_batches(bin_partial, batch_format="pyarrow",
                         **remote_args())
            .groupby(["event_type", "bin"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())

    out = []
    for et, g in hist.groupby("event_type", sort=True):
        g = g.sort_values("bin")
        mn, mx, n = stats[et]
        cum = g["cnt"].cumsum().to_numpy(np.int64)
        bvals = g["bin"].to_numpy(np.int64)
        for q in pcts:
            rank = (q * n + 99) // 100
            b = int(bvals[int(np.searchsorted(cum, rank))])
            out.append((et, q, mn + b * (mx - mn) // bins))
    return pd.DataFrame(out, columns=["event_type", "q_pct",
                                      "approx_cents"])\
        .astype({"q_pct": "int64", "approx_cents": "int64"})


# --- Bloom-filter decontamination ----------------------------------------
BLOOM_BITS = 1 << 20            # 2^20-bit filter (128 KiB packed)
BLOOM_K = 4                     # 4 disjoint 20-bit md5 slices


def _bloom_positions(gram: str) -> list:
    """k=4 bit positions: disjoint 5-hex-digit (20-bit) slices of
    md5(gram) — replicated in SQL as
    CAST(concat('0x', substr(md5(g), 1+5*i, 5)) AS BIGINT)."""
    import hashlib
    h = hashlib.md5(gram.encode()).hexdigest()
    return [int(h[5 * i:5 * i + 5], 16) for i in range(BLOOM_K)]


def bloom_contamination(sf_dir: str, n: int = 8,
                        bench_max_id: int = 20) -> pd.DataFrame:
    """Benchmark decontamination behind a Bloom filter — the
    constant-memory scale path next to text.ngram_contamination's
    exact broadcast set: whatever the benchmark size, the shipped
    state is a fixed 2^20-bit array (128 KiB packed), built once from
    the benchmark n-grams and broadcast via ray.put; the corpus
    streams through one shuffle-free map_batches. False positives are
    part of the contract (a hit means 'maybe contaminated, verify');
    the md5-slice hash layout is integer-exact, so even the false
    positives reproduce bit-for-bit in the DuckDB replica. Returns
    (doc_id, n_bloom_hits, flagged) for corpus docs ordered by
    doc_id."""
    import ray
    path = f"{sf_dir}/documents.parquet"
    tok = _TOK

    def grams(text: str) -> set:
        ws = tok.findall(text.lower())
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    bench = rd.read_parquet(path, columns=["doc_id", "text"])\
        .filter(expr=f"doc_id < {bench_max_id}").take_all()
    bits = np.zeros(BLOOM_BITS, dtype=bool)
    for row in bench:
        for g in grams(row["text"]):
            bits[_bloom_positions(g)] = True
    bref = ray.put(np.packbits(bits))

    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    def check(t: pa.Table, _b=bref) -> pa.Table:
        import ray as _ray
        packed = _ray.get(_b)
        bv = np.unpackbits(packed).view(bool)
        ids, hits, flag = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            if d < bench_max_id:
                continue
            k = sum(1 for g in grams(x)
                    if bv[_bloom_positions(g)].all())
            ids.append(d)
            hits.append(k)
            flag.append(k > 0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_bloom_hits": pa.array(hits, pa.int64()),
                         "flagged": pa.array(flag, pa.bool_())})

    return ds.map_batches(check, batch_format="pyarrow",
                          **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def daily_unique_users_hll(sf_dir: str) -> pd.DataFrame:
    """GROUPED HyperLogLog — per-day approximate unique users, the
    canonical streaming-analytics shape (one constant-size sketch per
    group key, merged across batches) exercised alongside the exact
    count so the estimator error is visible. Each batch ships its
    distinct (day, user) pairs (a per-batch combiner: duplicate events
    of a user within a batch collapse before the exchange); the single
    day-keyed exchange co-locates a day's users, and the per-day pass
    computes BOTH the exact distinct count and the 1024-register
    integer HLL estimate from the same rows. Day count is calendar-
    bounded, so the groupby is never the tiny-group pathology; at 100
    TB the (day, user) distinct stream is the dominant cost and is
    exactly the pre-aggregated minimum. Returns
    (day, n_exact, est_distinct, err_milli) ordered by day."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        day = pc.floor_temporal(t.column("ts"), unit="day")
        g = pa.table({"day": day, "user_id": t.column("user_id")})
        return g.group_by(["day", "user_id"]).aggregate([])

    def per_day(g: pd.DataFrame) -> pd.DataFrame:
        users = g["user_id"].drop_duplicates()
        n_exact = len(users)
        reg: dict = {}
        for u in users:
            b, r = hll_register(str(int(u)))
            if r > reg.get(b, 0):
                reg[b] = r
        nz = len(reg)
        s_pow = _RHO_EMPTY
        total = int(sum(1 << (s_pow - r) for r in reg.values())) \
            + (HLL_M - nz) * (1 << s_pow)
        est = (_ALPHA_NUM * HLL_M * HLL_M * (1 << s_pow)) \
            // (_ALPHA_DEN * total)
        # standard small-range correction: with mostly-empty registers
        # the raw estimator overshoots badly; linear counting
        # m * ln(m / zero_registers) is the HLL-paper branch (floored
        # at +0.5 so the float ln is micro-deterministic)
        zeros = HLL_M - nz
        if zeros > 0 and est <= (5 * HLL_M) // 2:
            est = int(np.floor(HLL_M * np.log(HLL_M / zeros) + 0.5))
        err = abs(est - n_exact) * 1000 // max(1, n_exact)
        return pd.DataFrame({"day": [g["day"].iloc[0]],
                             "n_exact": pd.Series([n_exact],
                                                  dtype="int64"),
                             "est_distinct": pd.Series([est],
                                                       dtype="int64"),
                             "err_milli": pd.Series([err],
                                                    dtype="int64")})

    out = (ds.map_batches(prep, batch_format="pyarrow", **remote_args())
           .groupby("day")
           .map_groups(per_day, batch_format="pandas",
                       **remote_args()))
    return out.to_pandas().sort_values("day").reset_index(drop=True)
