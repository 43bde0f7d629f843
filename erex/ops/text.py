"""Text analysis operators over the `documents` table: token counting,
quality scoring, language-ID, document fingerprinting.

All scoring is defined over the token regex ``[A-Za-z0-9]+`` and integer
(milli) arithmetic so the DuckDB oracles hash-match exactly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .._env import pool_size, remote_args, stable_shard64

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
# the dedup/sketch family tokenizer: lowercase word runs (applied to
# lower()ed text); ONE definition so every operator and its DuckDB
# oracle (regexp_extract_all(lower(text), '[a-z0-9]+')) stay in sync
LOWER_TOKEN_RE = re.compile(r"[a-z0-9]+")
_ALPHA = re.compile(r"[A-Za-z]")
_DIGIT = re.compile(r"[0-9]")
_SPACE = re.compile(r" ")

# tiny per-language stopword inventories (n-gram-free heuristic langid);
# priority order breaks ties deterministically
LANG_STOPWORDS = (
    ("en", ("the", "and", "of", "a", "to", "in", "is")),
    ("de", ("der", "die", "das", "und", "ist", "nicht", "ein")),
    ("es", ("el", "la", "los", "que", "y", "es", "un")),
    ("fr", ("le", "la", "les", "et", "est", "un", "une")),
    ("zh", ("de", "shi", "zai", "le", "wo", "ni", "ta")),
)


# GPT-2-style pre-tokenizer pattern, restricted to constructs with
# identical semantics in Python re and RE2 (no \p classes, no
# lookahead) so the DuckDB oracle can run the SAME pattern:
# contractions | space?-letters | space?-digits | space?-punct | spaces
BPE_RE_PATTERN = (r"'(?:s|t|re|ve|ll|d|m)| ?[A-Za-z]+| ?[0-9]+"
                  r"| ?[^A-Za-z0-9\s]+|\s+")
BPE_RE = re.compile(BPE_RE_PATTERN)


def token_count_bpe(sf_dir: str, as_dataset: bool = False):
    """(doc_id, n_tokens) under the BPE-ish pre-tokenizer split — the
    token count an LLM-training pipeline budgets by, as opposed to
    token_count's plain word runs."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = [len(BPE_RE.findall(x)) for x in texts]
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    out = ds.map_batches(f, batch_format="pyarrow",
                         **remote_args())
    if as_dataset:   # streaming sink path: no driver frame
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
             "it", "that", "for", "on", "with", "as", "at", "by", "from")


def stopword_ratio(sf_dir: str, as_dataset: bool = False):
    """(doc_id, n_tokens, n_stopwords, stopword_milli) — the classic
    quality-filter signal: too-low ratios indicate non-prose (tables,
    code, boilerplate).  Integer milli ratio for exact oracle compare."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    sw = frozenset(STOPWORDS)

    def f(t: pa.Table) -> pa.Table:
        nt, ns, ratio = [], [], []
        for x in t.column("text").to_pylist():
            toks = TOKEN_RE.findall(x.lower())
            k = sum(1 for w in toks if w in sw)
            nt.append(len(toks))
            ns.append(k)
            ratio.append(1000 * k // max(1, len(toks)))
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "n_stopwords": pa.array(ns, pa.int64()),
                         "stopword_milli": pa.array(ratio, pa.int64())})

    out = ds.map_batches(f, batch_format="pyarrow",
                         **remote_args())
    if as_dataset:   # streaming sink path: no driver frame
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def token_count(sf_dir: str, as_dataset: bool = False):
    """(doc_id, n_tokens) with tokens = [A-Za-z0-9]+ runs."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = [len(TOKEN_RE.findall(x)) for x in texts]
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    out = ds.map_batches(f, batch_format="pyarrow",
                         **remote_args())
    if as_dataset:   # streaming sink path: no driver frame
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def quality_milli(text: str) -> int:
    """round(1000 * alpha_chars / max(1, n_chars)) — THE quality
    milli-score, shared by quality_score, quality_filter's input and
    dedup_keep_best (and replicated in their SQL oracles)."""
    a = len(_ALPHA.findall(text))
    c = max(1, len(text))
    return int(1000 * a // c + (1 if (1000 * a % c) * 2 >= c else 0))


def quality_score(sf_dir: str, as_dataset: bool = False):
    """Char-class ratios as integer milli-scores:
    quality_milli = round(1000 * alpha_chars / max(1, n_chars))."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        alpha = [len(_ALPHA.findall(x)) for x in texts]
        digit = [len(_DIGIT.findall(x)) for x in texts]
        space = [len(_SPACE.findall(x)) for x in texts]
        nchars = [max(1, len(x)) for x in texts]
        q = [int(1000 * a // c + (1 if (1000 * a % c) * 2 >= c else 0))
             for a, c in zip(alpha, nchars)]
        return pa.table({"doc_id": t.column("doc_id"),
                         "alpha_chars": pa.array(alpha, pa.int64()),
                         "digit_chars": pa.array(digit, pa.int64()),
                         "space_chars": pa.array(space, pa.int64()),
                         "quality_milli": pa.array(q, pa.int64())})

    out = ds.map_batches(f, batch_format="pyarrow",
                         **remote_args())
    if as_dataset:   # streaming sink path: no driver frame
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


class LangId:
    """Stateful stage pattern: stopword regexes compiled once per actor
    (__init__), batches scored vectorized-ish in __call__."""

    def __init__(self):
        self.pats = [(lang, re.compile(
            r"\b(" + "|".join(words) + r")\b"))
            for lang, words in LANG_STOPWORDS]

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        preds = []
        for x in texts:
            low = x.lower()
            counts = [(lang, len(p.findall(low))) for lang, p in self.pats]
            best = max(counts, key=lambda lc: lc[1])
            # ties resolve to the earliest language in priority order
            preds.append(next(l for l, c in counts if c == best[1]))
        return pa.table({"doc_id": t.column("doc_id"),
                         "lang_pred": pa.array(preds, pa.string())})


def lang_id(sf_dir: str, as_dataset: bool = False):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(LangId, batch_format="pyarrow", batch_size=1024,
                         concurrency=pool_size(), **remote_args())
    if as_dataset:      # streaming sink path: no driver frame
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def repetition_stats(sf_dir: str, as_dataset: bool = False):
    """Gopher-style repetition quality signals per document:
    (doc_id, n_tokens, n_distinct_tokens, dup_token_milli,
    top_bigram_milli) where dup_token_milli is the fraction of token
    occurrences that are repeats and top_bigram_milli the fraction of
    bigram occurrences claimed by the single most frequent bigram —
    the two strongest template/boilerplate detectors in published
    pretraining-data quality stacks (cf. Gopher Rule filters). Integer
    milli arithmetic for exact oracle compare; tokens are the dedup
    family's lowercase [a-z0-9]+ runs."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tok = LOWER_TOKEN_RE

    def f(t: pa.Table) -> pa.Table:
        from collections import Counter
        nt, nd, dupm, topm = [], [], [], []
        for x in t.column("text").to_pylist():
            ws = tok.findall(x.lower())
            n = len(ws)
            d = len(set(ws))
            nt.append(n)
            nd.append(d)
            dupm.append(1000 * (n - d) // max(1, n))
            if n >= 2:
                c = Counter(zip(ws, ws[1:]))
                topm.append(1000 * max(c.values()) // (n - 1))
            else:
                topm.append(0)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "n_distinct_tokens": pa.array(nd, pa.int64()),
                         "dup_token_milli": pa.array(dupm, pa.int64()),
                         "top_bigram_milli": pa.array(topm, pa.int64())})

    out = ds.map_batches(f, batch_format="pyarrow",
                         **remote_args())
    if as_dataset:   # streaming sink path: no driver frame
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def topk_ngrams(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Corpus-wide top-k most frequent word bigrams — the vocabulary /
    boilerplate census a pretraining pipeline runs before writing
    filters. Shape for scale: each batch pre-aggregates its bigram
    counts into a local Counter (the combiner), so the global
    groupby(ngram).sum shuffle moves per-batch partial counts, not one
    row per bigram occurrence. Ties at the cut break by ngram text."""
    from ray.data.aggregate import Sum
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    tok = LOWER_TOKEN_RE

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for x in t.column("text").to_pylist():
            ws = tok.findall(x.lower())
            c.update(a + " " + b for a, b in zip(ws, ws[1:]))
        return pa.table({"ngram": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow", **remote_args())
             .groupby("ngram")
             .aggregate(Sum("cnt", alias_name="cnt"))
             .sort(["cnt", "ngram"], descending=[True, False])
             .limit(k))
    return out.to_pandas().reset_index(drop=True)


# keep-threshold = floor(0.15 * 2^32): a document survives when the
# first 8 hex digits of md5(str(doc_id)) fall below it
SAMPLE_THRESHOLD_32 = 644245094


def hash_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic ~15% corpus sample: keep doc_id iff
    int(md5(str(doc_id))[:8], 16) < floor(0.15 * 2^32). Hash-based
    sampling (not random_shuffle + limit) is the scale pattern — a
    pure stateless filter that needs no shuffle, is reproducible
    across runs/machines, and composes with resumable partitioned
    output."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source"])

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        keep = [int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
                < SAMPLE_THRESHOLD_32 for d in ids]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow", **remote_args()).to_pandas()\
        .sort_values("doc_id").reset_index(drop=True)


MOD = (1 << 61) - 1
BASE = 1_000_003


def rolling_fingerprint(tokens, window: int = 5) -> int:
    """Rabin-Karp rolling hash over token hashes; fingerprint = min
    window-hash (winnowing-style document fingerprint). Deterministic,
    order-sensitive, whitespace-insensitive."""
    hs = [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
          for w in tokens]
    if not hs:
        return 0
    if len(hs) < window:
        window = len(hs)
    poww = pow(BASE, window - 1, MOD)
    cur = 0
    for h in hs[:window]:
        cur = (cur * BASE + h) % MOD
    best = cur
    for i in range(window, len(hs)):
        cur = ((cur - hs[i - window] * poww) * BASE + hs[i]) % MOD
        if cur < best:
            best = cur
    return best


def doc_fingerprint(sf_dir: str, as_dataset: bool = False):
    """(doc_id, fingerprint) via min rolling hash; hash-checked against
    a DuckDB replica (modular window power sums — __ray_entry__
    _fingerprint_sql) and the pytest oracle."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        fps = [rolling_fingerprint(TOKEN_RE.findall(x))
               for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "fingerprint": pa.array(fps, pa.int64())})

    out = ds.map_batches(f, batch_format="pyarrow",
                         **remote_args())
    if as_dataset:   # streaming sink path: no driver frame
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


# deterministic production-filter thresholds (integer milli units)
QF_MIN_TOKENS = 20
QF_MIN_STOPWORD_MILLI = 10
QF_MAX_DUP_MILLI = 900


def quality_filter(sf_dir: str, as_dataset: bool = False):
    """Composite keep/drop decision — the operator a pretraining
    pipeline actually runs, composing the individual signals: reject
    'short' (< QF_MIN_TOKENS tokens), then 'low_stopword'
    (stopword_milli < QF_MIN_STOPWORD_MILLI; non-prose), then
    'repetitive' (dup_token_milli > QF_MAX_DUP_MILLI; boilerplate).
    First matching rule wins; one pruned-read map_batches computes all
    signals per batch — composition happens inside the stage, not as
    three dataset passes."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    sw = frozenset(STOPWORDS)
    tok = LOWER_TOKEN_RE

    def f(t: pa.Table) -> pa.Table:
        reasons, keeps = [], []
        for x in t.column("text").to_pylist():
            ws = tok.findall(x.lower())
            n = len(ws)
            stop_m = 1000 * sum(1 for w in ws if w in sw) // max(1, n)
            dup_m = 1000 * (n - len(set(ws))) // max(1, n)
            if n < QF_MIN_TOKENS:
                r = "short"
            elif stop_m < QF_MIN_STOPWORD_MILLI:
                r = "low_stopword"
            elif dup_m > QF_MAX_DUP_MILLI:
                r = "repetitive"
            else:
                r = ""
            reasons.append(r)
            keeps.append(r == "")
        return pa.table({"doc_id": t.column("doc_id"),
                         "keep": pa.array(keeps, pa.bool_()),
                         "reject_reason": pa.array(reasons, pa.string())})

    out = ds.map_batches(f, batch_format="pyarrow",
                         **remote_args())
    if as_dataset:   # streaming sink path: no driver frame
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


DECON_N = 8               # benchmark n-gram order
DECON_BENCH_MAX_ID = 20   # doc_id < 20 plays the held-out benchmark


def ngram_contamination(sf_dir: str, n: int = DECON_N,
                        bench_max_id: int = DECON_BENCH_MAX_ID
                        ) -> pd.DataFrame:
    """Train/benchmark decontamination — the overlap check every LLM
    pretraining pipeline runs before training: flag corpus documents
    sharing any word n-gram with a held-out benchmark set (here: the
    docs with doc_id < bench_max_id). Shape for scale: the benchmark
    side is small BY DEFINITION, so its n-gram set is read with a
    pushed-down predicate and broadcast once (ray.put); the corpus
    streams through one map_batches computing per-doc distinct-overlap
    counts — no shuffle at all."""
    import ray
    tok = LOWER_TOKEN_RE
    path = f"{sf_dir}/documents.parquet"

    def grams(text: str) -> set:
        ws = tok.findall(text.lower())
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    bench = rd.read_parquet(path, columns=["doc_id", "text"])\
        .filter(expr=f"doc_id < {bench_max_id}").take_all()
    bench_set = set()
    for row in bench:
        bench_set.update(grams(row["text"]))
    bref = ray.put(bench_set)

    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    def check(t: pa.Table, _b=bref) -> pa.Table:
        import ray as _ray
        bs = _ray.get(_b)
        ids, hits, flag = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            if d < bench_max_id:
                continue
            k = len(grams(x) & bs)
            ids.append(d)
            hits.append(k)
            flag.append(k > 0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_hits": pa.array(hits, pa.int64()),
                         "contaminated": pa.array(flag, pa.bool_())})

    return ds.map_batches(check, batch_format="pyarrow", **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


PACK_SEQ_LEN = 2048


def sequence_pack(sf_dir: str, seq_len: int = PACK_SEQ_LEN) -> pd.DataFrame:
    """GPT-style sequence packing: concatenate documents in doc_id
    order and split the token stream into fixed seq_len training
    bins; report each doc's global token offset and the bins it
    lands in. The global offset is a DISTRIBUTED PREFIX SCAN — the
    one primitive this engine had not needed yet: pass 1 computes
    per-block token sums (block-count-sized, collected), the driver
    prefix-sums those tiny partials, and pass 2 broadcasts each
    block's starting offset so every batch computes exact global
    offsets locally. Two streaming passes, no shuffle; the oracle is
    a window-function cumulative sum."""
    path = f"{sf_dir}/documents.parquet"
    # blocks must align with a deterministic doc order for the scan:
    # sort by doc_id once (the only exchange), then scan in order
    ds = rd.read_parquet(path, columns=["doc_id", "text"])\
        .sort("doc_id").materialize()

    def block_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_doc": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        n = [len(TOKEN_RE.findall(x))
             for x in t.column("text").to_pylist()]
        return pa.table({
            "first_doc": pa.array([t.column("doc_id")[0].as_py()],
                                  pa.int64()),
            "n": pa.array([int(sum(n))], pa.int64())})

    parts = ds.map_batches(block_sum, batch_format="pyarrow",
                           batch_size=None, **remote_args()).to_pandas()
    parts = parts.sort_values("first_doc").reset_index(drop=True)
    starts = dict(zip(parts["first_doc"].astype(int),
                      np.concatenate([[0], parts["n"].to_numpy()
                                      .cumsum()[:-1]]).astype(int)))

    def offsets(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("doc_id", "n_tokens", "tok_offset",
                              "bin_start", "bin_end")})
        ids = t.column("doc_id").to_pylist()
        n = np.array([len(TOKEN_RE.findall(x))
                      for x in t.column("text").to_pylist()],
                     dtype=np.int64)
        if ids[0] not in starts:
            # both passes map over the SAME materialized dataset with
            # batch_size=None (one batch == one block), so pass-2
            # batches must start exactly where pass-1 blocks did; if a
            # Ray version ever re-chunks between passes, fail loudly
            # rather than emit wrong offsets
            raise RuntimeError(
                f"sequence_pack pass-2 batch starts at doc {ids[0]}, "
                f"which is not a pass-1 block boundary — block "
                f"structure changed between passes")
        base = starts[ids[0]]
        off = base + np.concatenate([[0], n.cumsum()[:-1]])
        bin_start = off // seq_len
        last = off + np.maximum(n, 1) - 1     # empty docs sit in one bin
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64()),
                         "tok_offset": pa.array(off, pa.int64()),
                         "bin_start": pa.array(bin_start, pa.int64()),
                         "bin_end": pa.array(last // seq_len, pa.int64())})

    return ds.map_batches(offsets, batch_format="pyarrow",
                          batch_size=None, **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def inverted_index(sf_dir: str) -> pd.DataFrame:
    """Retrieval-side primitive: the inverted index (token -> document
    frequency + comma-joined sorted posting list) a corpus search or
    RAG pipeline builds before serving. Distributed shape: per-batch
    DISTINCT (token, doc) explode, then token-hash shards co-locate
    each token's postings for one bulk per-shard assembly — the same
    shard-then-local pattern as the dedup family (a per-token
    map_groups would be the tiny-group pathology at web vocabulary
    sizes). Postings are strings here for the exact SQL compare; a
    production sink would write list<int64> parquet instead."""
    import pyarrow.parquet as pq
    from .._env import default_shard_count
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    # token-shard count sized to corpus scale (distinct tokens per doc
    # is the fan-out; ~100/doc is a generous web-text estimate)
    nsh = default_shard_count(
        pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows * 100)
    tok = LOWER_TOKEN_RE

    def explode(t: pa.Table) -> pa.Table:
        toks, docs = [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            for w in set(tok.findall(x.lower())):
                toks.append(w)
                docs.append(d)
        tbl = pa.table({"token": pa.array(toks, pa.string()),
                        "doc_id": pa.array(docs, pa.int64())})
        sh = [stable_shard64(w, nsh) for w in toks]
        return tbl.append_column("tshard", pa.array(sh, pa.int32()))

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for w, sub in g.groupby("token"):
            ids = sorted(set(int(d) for d in sub["doc_id"]))
            rows.append((w, len(ids), ",".join(str(d) for d in ids)))
        return pd.DataFrame({
            "token": pd.Series([r[0] for r in rows], dtype=object),
            "df": pd.Series([r[1] for r in rows], dtype="int64"),
            "postings": pd.Series([r[2] for r in rows], dtype=object)})

    return (ds.map_batches(explode, batch_format="pyarrow",
                           **remote_args())
            .groupby("tshard")
            .map_groups(assemble, batch_format="pandas",
                        **remote_args())
            .to_pandas().sort_values("token").reset_index(drop=True))


TFIDF_BROADCAST_MAX_VOCAB = 2_000_000


def tfidf_top_terms(sf_dir: str, top: int = 3,
                    mode: str = "auto") -> pd.DataFrame:
    """Per-document top TF-IDF terms — the keyword/term-weighting step
    of retrieval and topic-labeling pipelines. Score is
    floor(tf * ln(N/df) * 1e6 + 0.5) with the float64 ops ordered as
    in the DuckDB oracle (ln parity verified value-for-value), top
    `top` terms by (score desc, token asc).

    Two execution modes with identical output (tested):

    - 'broadcast' (auto below TFIDF_BROADCAST_MAX_VOCAB distinct
      tokens): document frequencies via per-batch distinct-token
      partial counts -> one vocabulary-sized groupby-sum, broadcast
      back as a dict; one scoring pass over the corpus. Right while
      the vocabulary fits comfortably on every worker.
    - 'join' (auto above the threshold): the DF table STAYS a
      token-keyed Dataset; per-doc (doc_id, token, tf) rows hash-join
      against it, scores compute vectorized post-join, and per-doc
      top-k runs in doc-shard groups — nothing vocabulary-sized ever
      lands on the driver or in a worker heap. At web-corpus
      vocabularies (1e8-1e9 tokens) the broadcast dict would be a
      multi-GB object per worker; this is the scale path."""
    import ray
    from ray.data.aggregate import Sum
    path = f"{sf_dir}/documents.parquet"
    tok = LOWER_TOKEN_RE
    import pyarrow.parquet as pq
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    # row count from parquet footer metadata — no Ray job
    n_docs = pq.read_metadata(path).num_rows

    def df_partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for x in t.column("text").to_pylist():
            c.update(set(tok.findall(x.lower())))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "d": pa.array(list(c.values()), pa.int64())})

    dfs_ds = (ds.map_batches(df_partial, batch_format="pyarrow",
                             **remote_args())
              .groupby("token").aggregate(Sum("d", alias_name="d")))
    if mode == "auto":
        dfs_ds = dfs_ds.materialize()
        mode = "broadcast" if dfs_ds.count() <= TFIDF_BROADCAST_MAX_VOCAB \
            else "join"
    if mode == "join":
        return _tfidf_join(ds, dfs_ds, n_docs, top)
    if mode != "broadcast":
        raise ValueError(f"mode must be auto/broadcast/join: {mode}")
    import math
    dfs = dfs_ds.to_pandas()
    df_ref = ray.put(dict(zip(dfs["token"], dfs["d"].astype(int))))

    def score(t: pa.Table, _df=df_ref) -> pa.Table:
        import ray as _ray
        from collections import Counter
        dfm = _ray.get(_df)
        ids, ranks, terms, scores = [], [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            tf = Counter(tok.findall(x.lower()))
            scored = sorted(
                ((-(math.floor(c * math.log(n_docs / dfm[w])
                               * 1_000_000 + 0.5)), w)
                 for w, c in tf.items()))[:top]
            for i, (neg, w) in enumerate(scored):
                ids.append(d)
                ranks.append(i + 1)
                terms.append(w)
                scores.append(-neg)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "rank": pa.array(ranks, pa.int64()),
                         "token": pa.array(terms, pa.string()),
                         "tfidf_micro": pa.array(scores, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow", **remote_args())\
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)


def _tfidf_join(ds: "rd.Dataset", dfs_ds: "rd.Dataset", n_docs: int,
                top: int) -> pd.DataFrame:
    """Join-mode TF-IDF: (doc_id, token, tf) explode -> hash join with
    the DF Dataset on token -> vectorized scoring -> doc-shard groupby
    for the per-doc top-k. math.log and np.log resolve to the same
    libm values for float64, so the two modes score identically
    (asserted in tests value-for-value)."""
    from .._env import default_join_partitions, default_shard_count, \
        drop_schemaless_blocks
    tok = LOWER_TOKEN_RE
    npart = default_join_partitions()
    # the DF aggregate emits schema-less empty blocks when the
    # vocabulary is smaller than its partition count — fatal inside the
    # pyarrow hash join below
    dfs_ds = drop_schemaless_blocks(
        dfs_ds, empty_schema={"token": pa.string(), "d": pa.int64()})

    def tf_explode(t: pa.Table) -> pa.Table:
        from collections import Counter
        ids, toks, tfs = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            for w, c in Counter(tok.findall(x.lower())).items():
                ids.append(d)
                toks.append(w)
                tfs.append(c)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    joined = ds.map_batches(tf_explode, batch_format="pyarrow",
                            **remote_args())\
        .join(dfs_ds, "inner", npart, on=("token",))

    nsh = default_shard_count(n_docs)

    def score_shard(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy().astype(np.float64)
        d = t.column("d").to_numpy().astype(np.float64)
        s = np.floor(tf * np.log(n_docs / d) * 1_000_000 + 0.5)\
            .astype(np.int64)
        ids = t.column("doc_id").to_numpy()
        out = pa.table({"doc_id": t.column("doc_id"),
                        "token": t.column("token"),
                        "tfidf_micro": pa.array(s, pa.int64()),
                        "dshard": pa.array(
                            (ids & (nsh - 1)).astype(np.int32))})
        return out

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tfidf_micro", "token"],
                          ascending=[True, False, True])
        h = g.groupby("doc_id", sort=True).head(top).copy()
        h["rank"] = h.groupby("doc_id").cumcount().astype("int64") + 1
        return h[["doc_id", "rank", "token", "tfidf_micro"]]

    out = (joined.map_batches(score_shard, batch_format="pyarrow",
                              **remote_args())
           .groupby("dshard")
           .map_groups(shard_topk, batch_format="pandas",
                       **remote_args()))
    return out.to_pandas().sort_values(["doc_id", "rank"])\
        .reset_index(drop=True)


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(sf_dir: str, query: str = "hash join order",
              k: int = 10) -> pd.DataFrame:
    """BM25 retrieval: top-k documents for a query string — the
    lexical-retrieval primitive behind RAG corpus serving and search
    eval. Two streaming passes, no shuffle: (1) per-batch partials for
    document frequencies of the query terms + total token count gather
    to the driver (query-term-scale rows); (2) scoring map_batches with
    the tiny (df, N, avgdl) state broadcast, per-batch partial top-k by
    (score desc, doc_id), driver merges k rows.

    Float64 ops are ordered EXACTLY as in the SQL oracle (idf =
    ln((N - df + 0.5) / (df + 0.5) + 1.0); per-term contributions added
    in query-term order; absent terms contribute an exact 0.0), so the
    micro-rounded scores hash-match. Returns (rank, doc_id,
    score_micro)."""
    import math
    import ray
    import pyarrow.parquet as pq
    tok = LOWER_TOKEN_RE
    path = f"{sf_dir}/documents.parquet"
    terms = list(dict.fromkeys(tok.findall(query.lower())))
    if not terms:
        return pd.DataFrame(columns=["rank", "doc_id", "score_micro"])
    n_docs = pq.read_metadata(path).num_rows
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    terms_ref = ray.put(terms)

    def stats_partial(t: pa.Table, _t=terms_ref) -> pa.Table:
        ts = ray.get(_t)
        df_c = [0] * len(ts)
        dl_sum = 0
        for x in t.column("text").to_pylist():
            ws = tok.findall(x.lower())
            dl_sum += len(ws)
            s = set(ws)
            for i, term in enumerate(ts):
                if term in s:
                    df_c[i] += 1
        return pa.table({"term": pa.array(ts + ["__DL__"], pa.string()),
                         "v": pa.array(df_c + [dl_sum], pa.int64())})

    df_map = {t: 0 for t in terms}
    total_dl = 0
    for b in ds.map_batches(stats_partial, batch_format="pyarrow",
                            **remote_args())\
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for term, v in zip(b.column("term").to_pylist(),
                           b.column("v").to_pylist()):
            if term == "__DL__":
                total_dl += v
            else:
                df_map[term] += v
    avgdl = total_dl / n_docs
    idf = [math.log((n_docs - df_map[t] + 0.5) / (df_map[t] + 0.5)
                    + 1.0) for t in terms]
    state_ref = ray.put((terms, idf, avgdl))
    k1, b_ = BM25_K1, BM25_B

    def score_partial(t: pa.Table, _s=state_ref) -> pa.Table:
        from collections import Counter
        ts, idf_, avg = ray.get(_s)
        rows = []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            tf = Counter(tok.findall(x.lower()))
            dl = sum(tf.values())
            score = 0.0
            hit = False
            for i, term in enumerate(ts):
                f = tf.get(term, 0)
                if not f:
                    continue
                hit = True
                score += idf_[i] * (f * (k1 + 1.0)) \
                    / (f + k1 * (1.0 - b_ + b_ * dl / avg))
            if hit:
                rows.append((int(math.floor(score * 1_000_000 + 0.5)),
                             d))
        rows.sort(key=lambda r: (-r[0], r[1]))
        rows = rows[:k]
        return pa.table({
            "score_micro": pa.array([r[0] for r in rows], pa.int64()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64())})

    parts = ds.map_batches(score_partial, batch_format="pyarrow",
                           **remote_args()).to_pandas()
    parts = parts.sort_values(["score_micro", "doc_id"],
                              ascending=[False, True]).head(k)
    parts = parts.reset_index(drop=True)
    parts.insert(0, "rank", np.arange(1, len(parts) + 1, dtype=np.int64))
    return parts[["rank", "doc_id", "score_micro"]]


def stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Language-balanced deterministic sample — the rebalancing step of
    multilingual pretraining mixes: every lang stratum is downsampled
    to (approximately) the SMALLEST stratum's size with the same
    hash-filter machinery as hash_sample (reproducible, shuffle-free,
    composes with resumable output). Per-stratum threshold =
    (2^32 * min_count) // count in EXACT integer arithmetic (the float
    form loses precision past 2^53 at web-corpus counts); keep iff
    md5_32(doc_id) < threshold(lang). Pass 1 gathers stratum counts
    (strata-scale rows); pass 2 is a stateless broadcast filter.
    Returns kept (doc_id, lang)."""
    import ray
    from ray.data.aggregate import Count
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    cnt = ds.groupby("lang").aggregate(Count(alias_name="n")).to_pandas()
    mn = int(cnt["n"].min())
    thr = {lang: (4294967296 * mn) // int(n)
           for lang, n in zip(cnt["lang"], cnt["n"])}
    tref = ray.put(thr)

    def f(t: pa.Table, _t=tref) -> pa.Table:
        th = ray.get(_t)
        keep = [int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
                < th[lg]
                for d, lg in zip(t.column("doc_id").to_pylist(),
                                 t.column("lang").to_pylist())]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow", **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def unigram_logprob(sf_dir: str, mode: str = "auto") -> pd.DataFrame:
    """Per-document unigram-LM surprisal — the cheap perplexity proxy
    CCNet-style pipelines use to quality-rank web documents before the
    expensive KenLM pass (Wenzek et al. 2020). Two streaming passes:
    (1) corpus unigram counts via per-batch partial Counters -> one
    vocabulary-scale groupby-sum; (2) score every document as
    sum(tf(w) * floor(ln(N / count(w)) * 1e6 + 0.5)) over its token
    TYPES — the per-type surprisal is micro-rounded to an int64 BEFORE
    the weighted sum, so the result is exact integer arithmetic,
    independent of summation order, and hash-identical to the DuckDB
    oracle.

    Modes mirror tfidf_top_terms (same scale reasoning, tested equal):

    - 'broadcast' (auto below TFIDF_BROADCAST_MAX_VOCAB distinct
      tokens): the count table collapses to a token -> surprisal int
      dict broadcast via ray.put; one scoring pass.
    - 'join' (auto above): counts STAY a token-keyed Dataset;
      per-doc (doc_id, token, tf) rows hash-join against it and the
      per-doc sums reduce by doc-shard groupby — nothing
      vocabulary-sized on the driver or in a worker heap.

    Returns (doc_id, n_tokens, surprisal_micro) for docs with >= 1
    token, ordered by doc_id."""
    import ray
    from ray.data.aggregate import Sum
    if mode not in ("auto", "broadcast", "join"):
        # validate BEFORE the count passes execute — a typo'd mode must
        # not cost two full Ray jobs (tfidf_top_terms has the same
        # fail-fast property because its dataset stays lazy)
        raise ValueError(f"mode must be auto/broadcast/join: {mode}")
    tok = LOWER_TOKEN_RE
    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"])

    def cnt_partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for x in t.column("text").to_pylist():
            c.update(tok.findall(x.lower()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "c": pa.array(list(c.values()), pa.int64())})

    cnt_ds = (ds.map_batches(cnt_partial, batch_format="pyarrow",
                             **remote_args())
              .groupby("token").aggregate(Sum("c", alias_name="c")))
    cnt_ds = cnt_ds.materialize()
    # total corpus tokens: one tiny aggregate over the count table
    n_total = int(cnt_ds.aggregate(Sum("c", alias_name="n"))["n"])
    if mode == "auto":
        mode = "broadcast" if cnt_ds.count() <= TFIDF_BROADCAST_MAX_VOCAB \
            else "join"
    if mode == "join":
        return _unigram_logprob_join(ds, cnt_ds, n_total)
    cnt = cnt_ds.to_pandas()
    # per-type surprisal micro-rounded ONCE, driver-side, with the same
    # np.log the join mode applies post-join (identical float64 path)
    sm = np.floor(np.log(n_total / cnt["c"].to_numpy(np.float64))
                  * 1_000_000 + 0.5).astype(np.int64)
    sm_ref = ray.put(dict(zip(cnt["token"], (int(v) for v in sm))))

    def score(t: pa.Table, _s=sm_ref) -> pa.Table:
        import ray as _ray
        from collections import Counter
        smap = _ray.get(_s)
        ids, ntok, surp = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            tf = Counter(tok.findall(x.lower()))
            if not tf:
                continue
            ids.append(d)
            ntok.append(sum(tf.values()))
            surp.append(sum(c * smap[w] for w, c in tf.items()))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(ntok, pa.int64()),
                         "surprisal_micro": pa.array(surp, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow", **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def _unigram_logprob_join(ds: "rd.Dataset", cnt_ds: "rd.Dataset",
                          n_total: int) -> pd.DataFrame:
    """Join-mode unigram surprisal: (doc_id, token, tf) explode ->
    hash join with the count Dataset on token -> vectorized int64
    scoring -> per-doc integer sums via doc-shard groupby (partial
    sums are exact, so shard-local aggregation then a doc-scale merge
    loses nothing)."""
    from .._env import drop_schemaless_blocks
    from .._env import default_join_partitions
    tok = LOWER_TOKEN_RE
    npart = default_join_partitions()
    cnt_ds = drop_schemaless_blocks(
        cnt_ds, empty_schema={"token": pa.string(), "c": pa.int64()})

    def tf_explode(t: pa.Table) -> pa.Table:
        from collections import Counter
        ids, toks, tfs = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            for w, c in Counter(tok.findall(x.lower())).items():
                ids.append(d)
                toks.append(w)
                tfs.append(c)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    joined = ds.map_batches(tf_explode, batch_format="pyarrow",
                            **remote_args())\
        .join(cnt_ds, "inner", npart, on=("token",))

    def score_shard(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy()
        c = t.column("c").to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        s = np.floor(np.log(n_total / c) * 1_000_000 + 0.5)\
            .astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(tf, pa.int64()),
                         "surprisal_micro": pa.array(tf * s, pa.int64())})

    from ray.data.aggregate import Sum
    out = (joined.map_batches(score_shard, batch_format="pyarrow",
                              **remote_args())
           .groupby("doc_id")
           .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                      Sum("surprisal_micro",
                          alias_name="surprisal_micro")))
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def weighted_sample(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, A-ES) — the data-mixing primitive for upweighting long/high-
    quality documents: each doc draws key = -ln(u) / w (w = n_chars,
    u deterministic from md5(doc_id), so the sample is reproducible
    and shuffle-free) and the k SMALLEST keys are the weighted sample.
    Shape: per-batch partial top-k (k rows per batch leave the worker),
    driver merges k*batches rows — the ann_cosine_topk pattern; no
    shuffle, no materialization. Keys are nano-rounded with doc_id
    tie-break so the total order (and the SQL replica) is exact.
    Returns (rank, doc_id, lang, key_nano) ordered by rank."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("n_chars").to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        # A-ES semantics: zero/negative weight is never sampled — and
        # -ln(u)/0 would be inf (int64 garbage, SQL error), so filter
        pos = w > 0
        d, w = d[pos], w[pos]
        t = t.filter(pa.array(pos))
        h = np.fromiter(
            (int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)
             for x in d), dtype=np.float64, count=len(d))
        u = (h + 0.5) / 4294967296.0          # in (0, 1), never 0 or 1
        key = np.floor(-np.log(u) / w * 1_000_000_000 + 0.5)\
            .astype(np.int64)
        order = np.lexsort((d, key))[:k]
        return pa.table({"doc_id": pa.array(d[order].astype(np.int64)),
                         "lang": t.column("lang").take(
                             pa.array(order)),
                         "key_nano": pa.array(key[order])})

    df = ds.map_batches(partial, batch_format="pyarrow",
                        **remote_args()).to_pandas()
    df = df.sort_values(["key_nano", "doc_id"]).head(k)\
        .reset_index(drop=True)
    df.insert(0, "rank", np.arange(1, len(df) + 1, dtype=np.int64))
    return df[["rank", "doc_id", "lang", "key_nano"]]


def _bigram_counts_partial(t: pa.Table) -> pa.Table:
    """Per-batch (w1, w2, count) bigram partial — the ONE definition
    shared by bigram_logprob and pmi_topk so their bigram universes
    can never drift apart."""
    from collections import Counter
    tok = LOWER_TOKEN_RE
    c: Counter = Counter()
    for x in t.column("text").to_pylist():
        ws = tok.findall(x.lower())
        c.update(zip(ws, ws[1:]))
    w1, w2 = zip(*c.keys()) if c else ((), ())
    return pa.table({"w1": pa.array(list(w1), pa.string()),
                     "w2": pa.array(list(w2), pa.string()),
                     "c": pa.array(list(c.values()), pa.int64())})


def bigram_logprob(sf_dir: str, mode: str = "auto") -> pd.DataFrame:
    """Per-document BIGRAM conditional surprisal — the next step up
    from unigram_logprob in the CCNet-style LM-quality ladder:
    s(w1,w2) = ln(c(w1,*) / c(w1,w2)) summed over the doc's bigram
    occurrences (per-TYPE surprisal micro-rounded BEFORE the
    tf-weighted integer sum, the same order-independent convention).
    Modes mirror unigram_logprob: 'broadcast' ships a bigram->int
    dict; 'join' keeps counts as a (w1,w2)-keyed Dataset and
    hash-joins the per-doc explode against it — the scale path when
    the bigram vocabulary outgrows worker heaps. Returns (doc_id,
    n_bigrams, surprisal_micro) for docs with >= 2 tokens, ordered by
    doc_id."""
    import ray
    from ray.data.aggregate import Sum
    if mode not in ("auto", "broadcast", "join"):
        raise ValueError(f"mode must be auto/broadcast/join: {mode}")
    tok = LOWER_TOKEN_RE
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    cnt_ds = (ds.map_batches(_bigram_counts_partial,
                             batch_format="pyarrow", **remote_args())
              .groupby(["w1", "w2"]).aggregate(Sum("c", alias_name="c"))
              .materialize())
    if mode == "auto":
        mode = "broadcast" if cnt_ds.count() <= TFIDF_BROADCAST_MAX_VOCAB \
            else "join"
    if mode == "join":
        return _bigram_logprob_join(ds, cnt_ds)
    bc = cnt_ds.to_pandas()
    cw = bc.groupby("w1")["c"].transform("sum").to_numpy(np.float64)
    s = np.floor(np.log(cw / bc["c"].to_numpy(np.float64))
                 * 1_000_000 + 0.5).astype(np.int64)
    sm_ref = ray.put({(a, b): int(v) for a, b, v
                      in zip(bc["w1"], bc["w2"], s)})

    def score(t: pa.Table, _s=sm_ref) -> pa.Table:
        import ray as _ray
        from collections import Counter
        smap = _ray.get(_s)
        ids, nbg, surp = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            ws = tok.findall(x.lower())
            tf = Counter(zip(ws, ws[1:]))
            if not tf:
                continue
            ids.append(d)
            nbg.append(sum(tf.values()))
            surp.append(sum(c * smap[k] for k, c in tf.items()))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_bigrams": pa.array(nbg, pa.int64()),
                         "surprisal_micro": pa.array(surp, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow", **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def _bigram_logprob_join(ds: "rd.Dataset",
                         cnt_ds: "rd.Dataset") -> pd.DataFrame:
    """Join-mode bigram surprisal: the (w1,w2) count Dataset first
    hash-joins a w1-keyed totals Dataset (both stay distributed), the
    per-doc (doc_id, w1, w2, tf) explode then joins the scored table on
    the composite key, and per-doc integer sums reduce by groupby."""
    from .._env import drop_schemaless_blocks
    from .._env import default_join_partitions
    from ray.data.aggregate import Sum
    tok = LOWER_TOKEN_RE
    npart = default_join_partitions()
    cnt_ds = drop_schemaless_blocks(
        cnt_ds, empty_schema={"w1": pa.string(), "w2": pa.string(),
                              "c": pa.int64()})
    totals = cnt_ds.groupby("w1").aggregate(Sum("c", alias_name="cw"))
    totals = drop_schemaless_blocks(
        totals, empty_schema={"w1": pa.string(), "cw": pa.int64()})
    scored = cnt_ds.join(totals, "inner", npart, on=("w1",))

    def add_s(t: pa.Table) -> pa.Table:
        cw = t.column("cw").to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        c = t.column("c").to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        s = np.floor(np.log(cw / c) * 1_000_000 + 0.5).astype(np.int64)
        return pa.table({"w1": t.column("w1"), "w2": t.column("w2"),
                         "s": pa.array(s)})

    scored = scored.map_batches(add_s, batch_format="pyarrow",
                                **remote_args())
    scored = drop_schemaless_blocks(
        scored, empty_schema={"w1": pa.string(), "w2": pa.string(),
                              "s": pa.int64()})

    def tf_explode(t: pa.Table) -> pa.Table:
        from collections import Counter
        ids, a, b, tfs = [], [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            ws = tok.findall(x.lower())
            for (w1, w2), c in Counter(zip(ws, ws[1:])).items():
                ids.append(d)
                a.append(w1)
                b.append(w2)
                tfs.append(c)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "w1": pa.array(a, pa.string()),
                         "w2": pa.array(b, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    joined = ds.map_batches(tf_explode, batch_format="pyarrow",
                            **remote_args())\
        .join(scored, "inner", npart, on=("w1", "w2"))

    def fold(t: pa.Table) -> pa.Table:
        tf = t.column("tf").to_numpy()
        s = t.column("s").to_numpy()
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_bigrams": pa.array(tf, pa.int64()),
                         "surprisal_micro": pa.array(tf * s, pa.int64())})

    out = (joined.map_batches(fold, batch_format="pyarrow",
                              **remote_args())
           .groupby("doc_id")
           .aggregate(Sum("n_bigrams", alias_name="n_bigrams"),
                      Sum("surprisal_micro",
                          alias_name="surprisal_micro")))
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def pmi_topk(sf_dir: str, k: int = 20, min_count: int = 5) -> pd.DataFrame:
    """Corpus-wide top-k PMI collocations — the phrase-mining /
    tokenizer-merge-candidate primitive: pmi(w1,w2) =
    ln(c12 * Nb / (c1s * c2e)) over bigram occurrences, where c1s/c2e
    are the first-/second-position margins and Nb the total bigram
    count. Everything stays distributed: the bigram count Dataset
    hash-joins its two margin Datasets (w1- and w2-keyed groupby
    sums), scoring + per-batch partial top-k run inside map_batches,
    and the driver merges k rows per batch. `min_count` drops
    singleton noise pairs BEFORE the joins. Micro-rounded score with
    (w1, w2) tie-break = one total order shared with the SQL replica.
    Returns (rank, w1, w2, c12, pmi_micro)."""
    from .._env import drop_schemaless_blocks
    from ray.data.aggregate import Sum
    tok = LOWER_TOKEN_RE
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    bc = (ds.map_batches(_bigram_counts_partial,
                         batch_format="pyarrow", **remote_args())
          .groupby(["w1", "w2"]).aggregate(Sum("c", alias_name="c"))
          .materialize())
    bc = drop_schemaless_blocks(
        bc, empty_schema={"w1": pa.string(), "w2": pa.string(),
                          "c": pa.int64()})
    n_b = int(bc.aggregate(Sum("c", alias_name="n"))["n"])
    m1 = bc.groupby("w1").aggregate(Sum("c", alias_name="c1s"))
    m1 = drop_schemaless_blocks(
        m1, empty_schema={"w1": pa.string(), "c1s": pa.int64()})
    m2 = bc.groupby("w2").aggregate(Sum("c", alias_name="c2e"))
    m2 = drop_schemaless_blocks(
        m2, empty_schema={"w2": pa.string(), "c2e": pa.int64()})
    from .._env import default_join_partitions
    npart = default_join_partitions()
    def freq_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.greater_equal(t.column("c"), min_count))

    freq = bc.map_batches(freq_filter, batch_format="pyarrow",
                          **remote_args())
    joined = freq.join(m1, "inner", npart, on=("w1",))\
        .join(m2, "inner", npart, on=("w2",))

    def partial_topk(t: pa.Table) -> pa.Table:
        c12 = t.column("c").to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        c1 = t.column("c1s").to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        c2 = t.column("c2e").to_numpy(zero_copy_only=False)\
            .astype(np.float64)
        pmi = np.floor(np.log((c12 * n_b) / (c1 * c2))
                       * 1_000_000 + 0.5).astype(np.int64)
        w1 = np.asarray(t.column("w1").to_pylist())
        w2 = np.asarray(t.column("w2").to_pylist())
        order = np.lexsort((w2, w1, -pmi))[:k]
        return pa.table({
            "w1": pa.array(w1[order]), "w2": pa.array(w2[order]),
            "c12": pa.array(c12[order].astype(np.int64)),
            "pmi_micro": pa.array(pmi[order])})

    df = joined.map_batches(partial_topk, batch_format="pyarrow",
                            **remote_args()).to_pandas()
    df = df.sort_values(["pmi_micro", "w1", "w2"],
                        ascending=[False, True, True]).head(k)\
        .reset_index(drop=True)
    df.insert(0, "rank", np.arange(1, len(df) + 1, dtype=np.int64))
    return df[["rank", "w1", "w2", "c12", "pmi_micro"]]


def pretrain_mix(sf_dir: str) -> pd.DataFrame:
    """The end-to-end pretraining-data mix — the three stages a real
    corpus actually flows through, COMPOSED as one streaming pipeline
    (not three dataset passes): (1) the composite quality keep rule
    (quality_filter's exact semantics) fused with md5 content hashing
    in a single map_batches; (2) exact dedup over the survivors
    (groupby(text_hash) min doc_id, keeper rows recovered by a
    distributed hash join — no driver state); (3) language-stratified
    downsampling of the keepers with stratified_sample's exact
    integer thresholds (strata-scale state only). Every stage reuses
    the SAME constants/semantics as its standalone operator, so the
    chained SQL oracle is exact. Returns the final kept (doc_id,
    lang), ordered by doc_id."""
    import ray
    from .._env import drop_schemaless_blocks
    from ray.data.aggregate import Count, Min
    sw = frozenset(STOPWORDS)
    tok = LOWER_TOKEN_RE
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])

    def survivors(t: pa.Table) -> pa.Table:
        ids, langs, hs = [], [], []
        for d, lg, x in zip(t.column("doc_id").to_pylist(),
                            t.column("lang").to_pylist(),
                            t.column("text").to_pylist()):
            ws = tok.findall(x.lower())
            n = len(ws)
            stop_m = 1000 * sum(1 for w in ws if w in sw) // max(1, n)
            dup_m = 1000 * (n - len(set(ws))) // max(1, n)
            if (n < QF_MIN_TOKENS or stop_m < QF_MIN_STOPWORD_MILLI
                    or dup_m > QF_MAX_DUP_MILLI):
                continue
            ids.append(d)
            langs.append(lg)
            hs.append(hashlib.md5(x.encode()).hexdigest())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "lang": pa.array(langs, pa.string()),
                         "text_hash": pa.array(hs, pa.string())})

    surv = ds.map_batches(survivors, batch_format="pyarrow",
                          **remote_args()).materialize()
    if surv.count() == 0:
        # every document failed the quality rule — the oracle returns
        # zero rows, so must the engine (the hash join below cannot
        # take an all-empty input)
        return pd.DataFrame(columns=["doc_id", "lang"])
    keep_ids = surv.groupby("text_hash")\
        .aggregate(Min("doc_id", alias_name="doc_id"))
    keep_ids = drop_schemaless_blocks(
        keep_ids, empty_schema={"text_hash": pa.string(),
                                "doc_id": pa.int64()})
    from .._env import default_join_partitions
    npart = default_join_partitions()
    keepers = surv.select_columns(["doc_id", "lang"])\
        .join(keep_ids.select_columns(["doc_id"]), "inner", npart,
              on=("doc_id",)).materialize()
    cnt = keepers.groupby("lang").aggregate(Count(alias_name="n"))\
        .to_pandas()
    mn = int(cnt["n"].min())
    thr = {lang: (4294967296 * mn) // int(n)
           for lang, n in zip(cnt["lang"], cnt["n"])}
    tref = ray.put(thr)

    def sample(t: pa.Table, _t=tref) -> pa.Table:
        th = ray.get(_t)
        keep = [int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
                < th[lg]
                for d, lg in zip(t.column("doc_id").to_pylist(),
                                 t.column("lang").to_pylist())]
        return t.filter(pa.array(keep, pa.bool_()))

    return keepers.map_batches(sample, batch_format="pyarrow",
                               **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def token_freq_histogram(sf_dir: str) -> pd.DataFrame:
    """Zipf-curve census: bucket the corpus vocabulary by
    floor(log2(token frequency)) and report how many distinct tokens
    and total occurrences land in each power-of-two frequency band —
    the one-page fingerprint of a corpus' head/tail balance that
    pretraining filters are tuned against. Shape for scale: per-batch
    partial token counts (combiner) -> groupby(token).sum is the only
    vocabulary-sized exchange; the bucket fold then reduces each
    count-table block to <= 64 partial rows before a constant-size
    final groupby. The bucket rule is pure integer bit-length so the
    SQL oracle (length(bin(cnt)) - 1) matches exactly. Returns
    (bucket, n_tokens, total_occ) ordered by bucket."""
    from collections import Counter

    from ray.data.aggregate import Sum
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    tok = LOWER_TOKEN_RE

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for x in t.column("text").to_pylist():
            c.update(tok.findall(x.lower()))
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             **remote_args())
              .groupby("token")
              .aggregate(Sum("cnt", alias_name="cnt")))

    def bucket_fold(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cnt = t.column("cnt").to_numpy(zero_copy_only=False)\
            .astype(np.int64)
        # floor(log2(cnt)) via bit length: exact for all positive ints
        # (np.log2 would misround near 2^53); buckets 0..63
        b = np.frompyfunc(int.bit_length, 1, 1)(cnt).astype(np.int64) - 1
        g = pa.table({"bucket": pa.array(b, pa.int64()),
                      "cnt": pa.array(cnt, pa.int64())})\
            .group_by("bucket")\
            .aggregate([([], "count_all"), ("cnt", "sum")])
        return pa.table({"bucket": g.column("bucket"),
                         "n_tokens": pc.cast(g.column("count_all"),
                                             pa.int64()),
                         "total_occ": pc.cast(g.column("cnt_sum"),
                                              pa.int64())})

    out = (counts.map_batches(bucket_fold, batch_format="pyarrow",
                              **remote_args())
           .groupby("bucket")
           .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                      Sum("total_occ", alias_name="total_occ")))
    return out.to_pandas().sort_values("bucket").reset_index(drop=True)


# deterministic split fences: md5(doc_id) 32-bit prefix under
# floor(0.8*2^32) -> train, under floor(0.9*2^32) -> val, else test
SPLIT_TRAIN_32 = 3435973836     # floor(0.80 * 2^32)
SPLIT_VAL_32 = 3865470566       # floor(0.90 * 2^32)


def dataset_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by document
    hash — the split every training pipeline needs to be reproducible
    across runs, machines and corpus growth (a doc's split never
    changes when neighbors are added, unlike position- or
    shuffle-based splits). Pure stateless map + a bounded groupby of
    per-batch partial counts. Returns (lang, split, n_docs) ordered by
    (lang, split)."""
    from ray.data.aggregate import Sum
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = t.column("doc_id").to_pylist()
        h = np.array([int(hashlib.md5(str(d).encode()).hexdigest()[:8],
                          16) for d in ids], np.uint64)
        split = np.where(h < SPLIT_TRAIN_32, "train",
                         np.where(h < SPLIT_VAL_32, "val", "test"))
        g = pa.table({"lang": t.column("lang"),
                      "split": pa.array(split.tolist(), pa.string())})\
            .group_by(["lang", "split"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"),
                         "split": g.column("split"),
                         "n_docs": pc.cast(g.column("count_all"),
                                           pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          **remote_args())
           .groupby(["lang", "split"])
           .aggregate(Sum("n_docs", alias_name="n_docs")))
    return out.to_pandas().sort_values(["lang", "split"])\
        .reset_index(drop=True)


def dq_checks(sf_dir: str) -> pd.DataFrame:
    """Declarative data-quality expectations over `documents` — the
    ingest gate a production pipeline runs before anything else. Each
    check is evaluated per batch as a (check, n_rows, n_fail) partial
    and combined in one bounded groupby, so the audit is a single
    streaming pass whatever the corpus size. Checks: doc_id not null /
    unique-ready (non-negative), text non-empty, lang in the known
    inventory, n_chars == length(text). Returns
    (check_name, n_rows, n_fail) ordered by check_name."""
    from ray.data.aggregate import Sum
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "n_chars"])
    langs = {"en", "de", "es", "fr", "zh"}

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_
        n = len(t)
        ids = t.column("doc_id")
        text = t.column("text")
        lang = t.column("lang").to_pylist()
        nchars = t.column("n_chars")
        fails = {
            "doc_id_not_null": ids.null_count,
            "doc_id_non_negative": int(pc_.sum(pc_.cast(
                pc_.less(ids, 0), pa.int64())).as_py() or 0),
            "text_non_empty": int(pc_.sum(pc_.cast(pc_.or_kleene(
                pc_.is_null(text),
                pc_.equal(pc_.utf8_length(text), 0)),
                pa.int64())).as_py() or 0),
            "lang_known": sum(1 for v in lang if v not in langs),
            "n_chars_matches_text": int(pc_.sum(pc_.cast(
                pc_.not_equal(pc_.utf8_length(text),
                              pc_.cast(nchars, pa.int32())),
                pa.int64())).as_py() or 0),
        }
        return pa.table({
            "check_name": pa.array(list(fails.keys()), pa.string()),
            "n_rows": pa.array([n] * len(fails), pa.int64()),
            "n_fail": pa.array([int(v) for v in fails.values()],
                               pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          **remote_args())
           .groupby("check_name")
           .aggregate(Sum("n_rows", alias_name="n_rows"),
                      Sum("n_fail", alias_name="n_fail")))
    return out.to_pandas().sort_values("check_name")\
        .reset_index(drop=True)


BUDGET_PERMILLE = 250


def token_budget_select(sf_dir: str,
                        budget_permille: int = BUDGET_PERMILLE
                        ) -> pd.DataFrame:
    """Token-budget curation: order the corpus by quality (quality_milli
    DESC, doc_id ASC) and keep the best documents until the cumulative
    token count reaches `budget_permille`/1000 of the corpus total —
    the "take the best N tokens" selection step of a pretraining-data
    pipeline. Distributed shape: one metadata pass shrinks each doc to
    three ints, a single sort is the only exchange, and the cumulative
    sum is the same two-pass distributed prefix scan as sequence_pack
    (per-block partials -> driver prefix over block-count-sized list ->
    broadcast offsets). The budget itself falls out of the pass-1
    partials for free. Returns (doc_id, quality_milli, n_tokens,
    cum_tokens) for the selected docs, ordered by doc_id; cum_tokens is
    the inclusive cumulative sum in global quality order."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def meta(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = [len(TOKEN_RE.findall(x)) for x in texts]
        q = [quality_milli(x) for x in texts]
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64()),
                         "quality_milli": pa.array(q, pa.int64())})

    ordered = ds.map_batches(meta, batch_format="pyarrow",
                             **remote_args())\
        .sort(["quality_milli", "doc_id"],
              descending=[True, False]).materialize()

    def block_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_doc": pa.array([], pa.int64()),
                             "first_q": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "first_doc": pa.array([t.column("doc_id")[0].as_py()],
                                  pa.int64()),
            "first_q": pa.array([t.column("quality_milli")[0].as_py()],
                                pa.int64()),
            "n": pa.array([int(pa.compute.sum(
                t.column("n_tokens")).as_py())], pa.int64())})

    parts = ordered.map_batches(block_sum, batch_format="pyarrow",
                                batch_size=None, **remote_args())\
        .to_pandas().sort_values(["first_q", "first_doc"],
                                 ascending=[False, True])\
        .reset_index(drop=True)
    total = int(parts["n"].sum())
    budget = total * int(budget_permille) // 1000
    starts = dict(zip(parts["first_doc"].astype(int),
                      np.concatenate([[0], parts["n"].to_numpy()
                                      .cumsum()[:-1]]).astype(int)))

    def select(t: pa.Table) -> pa.Table:
        cols = ("doc_id", "quality_milli", "n_tokens", "cum_tokens")
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        ids = t.column("doc_id").to_pylist()
        if ids[0] not in starts:
            # same block-stability contract as sequence_pack: both
            # passes map the one materialized sorted dataset with
            # batch_size=None, so pass-2 batches must start on pass-1
            # block boundaries — fail loudly if Ray ever re-chunks
            raise RuntimeError(
                f"token_budget_select pass-2 batch starts at doc "
                f"{ids[0]}, not a pass-1 block boundary")
        n = t.column("n_tokens").to_numpy()
        cum = starts[ids[0]] + n.cumsum()
        keep = cum <= budget
        out = pa.table({"doc_id": t.column("doc_id"),
                        "quality_milli": t.column("quality_milli"),
                        "n_tokens": t.column("n_tokens"),
                        "cum_tokens": pa.array(cum, pa.int64())})
        return out.filter(pa.array(keep, pa.bool_()))

    return ordered.map_batches(select, batch_format="pyarrow",
                               batch_size=None, **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


SOURCE_CAP = 10


def source_cap_sample(sf_dir: str, cap: int = SOURCE_CAP) -> pd.DataFrame:
    """Per-source quota sampling: keep at most `cap` documents per
    source, chosen by a deterministic md5(doc_id) order (the same
    uniform 32-bit key as hash_sample) so the quota sample is
    reproducible across runs and machines — the domain-balancing step
    that stops one crawl domain from dominating a pretraining mix.
    Distributed shape: each batch pre-prunes to its own per-source
    top-`cap` (so the exchange carries <= cap rows per (source, block)),
    then source-hash shards finish the selection in one bulk pandas
    pass per shard — no per-source tiny-group pathology at web-scale
    domain counts. Returns (source, rank, doc_id, hash32) ordered by
    (source, rank)."""
    from .._env import default_shard_count
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    # post-prune rows per shard <= cap x sources; CPU-based count is
    # plenty (the exchange already carries only block-local winners)
    nsh = default_shard_count()

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # typed-empty rebuild: list-comp assignment on an empty
            # frame would yield (source: null, hash32/sshard: double)
            # and break the groupby exchange's schema agreement
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string()),
                             "hash32": pa.array([], pa.int64()),
                             "sshard": pa.array([], pa.int64())})
        df = t.to_pandas()
        df["hash32"] = [
            int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16)
            for d in df["doc_id"]]
        df = df.sort_values(["source", "hash32", "doc_id"])\
            .groupby("source", sort=False).head(cap)
        df["sshard"] = [stable_shard64(s, nsh) for s in df["source"]]
        # strip the pandas schema metadata: its dict payload defeats
        # Ray's schema-dedup hash in the groupby exchange (log spam)
        return pa.Table.from_pandas(df, preserve_index=False)\
            .replace_schema_metadata(None)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "hash32", "doc_id"])
        g = g.groupby("source", sort=False).head(cap).copy()
        g["rank"] = g.groupby("source", sort=False).cumcount() + 1
        return g[["source", "rank", "doc_id", "hash32"]].astype(
            {"rank": "int64", "doc_id": "int64", "hash32": "int64"})

    return (ds.map_batches(prune, batch_format="pyarrow",
                           **remote_args())
            .groupby("sshard")
            .map_groups(pick, batch_format="pandas", **remote_args())
            .to_pandas().sort_values(["source", "rank"])
            .reset_index(drop=True))


def logprob_buckets(sf_dir: str, mode: str = "auto") -> pd.DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): each
    document lands in the head / middle / tail tercile of the corpus
    by per-token unigram surprisal — the split CCNet publishes and
    LLaMA-era pipelines sample from (head = most fluent). Scoring is
    the proven unigram_logprob pass (distributed, integer-exact in
    both broadcast and join modes); the per-token score is the floor
    division surprisal_micro // n_tokens, so bucketing is pure integer
    compare. Tercile thresholds use percentile_disc semantics (the
    value at position ceil(f*n), 1-indexed, of the ascending scores
    — same rule as event_anomalies' median); equal scores share a
    bucket. Threshold discovery here sorts the collected per-doc
    table the operator contract already returns; at extreme corpus
    scale the thresholds would come from the O(bins) fixed-bin
    histogram (histogram_quantiles) and the assignment would be one
    more map_batches with the two ints broadcast. Returns
    (doc_id, per_tok_micro, bucket) ordered by doc_id."""
    import math
    lp = unigram_logprob(sf_dir, mode=mode)
    if lp.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "per_tok_micro": pd.Series([],
                                                        dtype="int64"),
                             "bucket": pd.Series([], dtype=object)})
    spt = (lp["surprisal_micro"].astype("int64")
           // lp["n_tokens"].astype("int64"))
    srt = np.sort(spt.to_numpy(np.int64))
    n = len(srt)
    t1 = int(srt[math.ceil(n / 3) - 1])
    t2 = int(srt[math.ceil(2 * n / 3) - 1])
    bucket = np.where(spt <= t1, "head",
                      np.where(spt <= t2, "middle", "tail"))
    return pd.DataFrame({"doc_id": lp["doc_id"].astype("int64"),
                         "per_tok_micro": spt.astype("int64"),
                         "bucket": bucket})\
        .sort_values("doc_id").reset_index(drop=True)


def dsir_weights(sf_dir: str, target_lang: str = "en",
                 n_buckets: int = 1024) -> pd.DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection via
    Importance Resampling"): each document scores the log likelihood
    ratio of a hashed-unigram model of the TARGET domain (here the
    target_lang slice standing in for the high-quality domain) against
    the raw-corpus model — the weight importance resampling then
    samples by. The whole estimator is CONSTANT-SIZE state: tokens
    hash into n_buckets md5 buckets, so both count passes ship
    <= n_buckets partial rows per batch, the bucket score table
    broadcast back is n_buckets int64s, and no stage ever holds
    vocabulary- or corpus-scale state. Per-bucket scores are
    s = floor(ln(((ct+1)/(Nt+B)) / ((cr+1)/(Nr+B))) * 1e6 + 0.5)
    (Laplace-smoothed, micro-rounded BEFORE the tf-weighted integer
    sum — the unigram_logprob convention, so the result is exact and
    batch-invariant). Returns (doc_id, n_tokens, dsir_micro) for docs
    with >= 1 token, ordered by doc_id; positive = more target-like.
    """
    import ray
    from ray.data.aggregate import Sum

    from .dedup import _h64
    tok = LOWER_TOKEN_RE
    B = n_buckets
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])

    def cnt_partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        raw = np.zeros(B, dtype=np.int64)
        tgt = np.zeros(B, dtype=np.int64)
        for lg, x in zip(t.column("lang").to_pylist(),
                         t.column("text").to_pylist()):
            for w, c in Counter(tok.findall(x.lower())).items():
                bk = _h64(w) % B
                raw[bk] += c
                if lg == target_lang:
                    tgt[bk] += c
        nz = np.nonzero(raw)[0]
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "c_raw": pa.array(raw[nz], pa.int64()),
                         "c_tgt": pa.array(tgt[nz], pa.int64())})

    cnt = (ds.map_batches(cnt_partial, batch_format="pyarrow",
                          **remote_args())
           .groupby("bucket")
           .aggregate(Sum("c_raw", alias_name="c_raw"),
                      Sum("c_tgt", alias_name="c_tgt"))
           .to_pandas())
    cr = np.zeros(B, dtype=np.int64)
    ct = np.zeros(B, dtype=np.int64)
    cr[cnt["bucket"].to_numpy(np.int64)] = cnt["c_raw"].to_numpy(np.int64)
    ct[cnt["bucket"].to_numpy(np.int64)] = cnt["c_tgt"].to_numpy(np.int64)
    nr, nt = int(cr.sum()), int(ct.sum())
    # per-bucket log ratio micro-rounded once, driver-side (B doubles)
    a = (ct + 1) / float(nt + B)
    b = (cr + 1) / float(nr + B)
    s = np.floor(np.log(a / b) * 1_000_000 + 0.5).astype(np.int64)
    s_ref = ray.put(s)

    def score(t: pa.Table, _s=s_ref) -> pa.Table:
        import ray as _ray
        from collections import Counter
        sm = _ray.get(_s)
        ids, ntok, wts = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            tf = Counter(tok.findall(x.lower()))
            if not tf:
                continue
            ids.append(d)
            ntok.append(sum(tf.values()))
            wts.append(sum(c * int(sm[_h64(w) % B])
                           for w, c in tf.items()))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(ntok, pa.int64()),
                         "dsir_micro": pa.array(wts, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def span_corruption_stats(sf_dir: str, span_len: int = 3,
                          rate_mod: int = 20) -> pd.DataFrame:
    """T5-style span-corruption prep report: a deterministic noise
    mask (position p of doc d starts a span iff
    md5-hash(d:p) % rate_mod == 0; each span covers span_len tokens,
    truncated at the doc end; touching spans merge into one sentinel
    run — ~span_len/rate_mod of tokens corrupted) and the per-document
    stats a pretraining job sanity-checks before launch: token count,
    merged-run count (== sentinel count) and masked-token count. The
    mask is a pure per-doc function, so the whole operator is ONE
    stateless map_batches pass — no exchange anywhere; determinism
    makes it reproducible across reruns and the SQL oracle. Returns
    (doc_id, n_tokens, n_spans, n_masked, corrupt_milli) for docs
    with >= 1 token, ordered by doc_id."""
    from .dedup import _h64
    tok = LOWER_TOKEN_RE
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        ids, ntok, nsp, nmask = [], [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            n = len(tok.findall(x.lower()))
            if n == 0:
                continue
            starts = [p for p in range(n)
                      if _h64(f"{d}:{p}") % rate_mod == 0]
            spans = 0
            masked = 0
            run_end = -2        # -1 would swallow a run starting at p=0
            for p in starts:
                e = min(p + span_len - 1, n - 1)
                if p > run_end + 1:
                    spans += 1
                    masked += e - p + 1
                    run_end = e
                elif e > run_end:
                    masked += e - run_end
                    run_end = e
            ids.append(d)
            ntok.append(n)
            nsp.append(spans)
            nmask.append(masked)
        nm = np.asarray(nmask, dtype=np.int64)
        nt = np.asarray(ntok, dtype=np.int64)
        cm = np.zeros(len(ids), dtype=np.int64) if not ids else \
            1000 * nm // nt
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "n_spans": pa.array(nsp, pa.int64()),
                         "n_masked": pa.array(nm, pa.int64()),
                         "corrupt_milli": pa.array(cm, pa.int64())})

    return ds.map_batches(stats, batch_format="pyarrow",
                          **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def alpha_mix_weights(sf_dir: str, alpha_milli: int = 300,
                      by: str = "lang") -> pd.DataFrame:
    """Temperature-scaled mixture weights (the mT5 / XLM-R alpha
    sampling rule, alpha = alpha_milli/1000): a group's sampling
    weight is (n_g / N) ** alpha renormalized, which upsamples
    low-resource groups. One tiny distributed groupby gets the group
    counts; each raw weight is micro-rounded BEFORE the normalizing
    sum so the normalization is pure integer arithmetic — order-free,
    hence batch- and SQL-replica-stable (a float sum's value would
    depend on DuckDB's unspecified aggregation order). Returns
    (group, n_docs, raw_micro, weight_milli) ordered by group, with
    weight_milli = floor(1000 * raw_micro / sum(raw_micro))."""
    from ray.data.aggregate import Count
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=[by])
    cnt = ds.groupby(by).aggregate(Count(alias_name="n_docs"))\
        .to_pandas().sort_values(by).reset_index(drop=True)
    n = cnt["n_docs"].to_numpy(np.int64)
    total = int(n.sum())
    raw = np.floor(np.power(n / float(total), alpha_milli / 1000.0)
                   * 1_000_000 + 0.5).astype(np.int64)
    s = int(raw.sum())
    out = pd.DataFrame({"group": cnt[by].astype(str),
                        "n_docs": pd.Series(n, dtype="int64"),
                        "raw_micro": pd.Series(raw, dtype="int64"),
                        "weight_milli": pd.Series(
                            1000 * raw // max(1, s), dtype="int64")})
    return out.sort_values("group").reset_index(drop=True)


def doc_chunk_stats(sf_dir: str, chunk: int = 32,
                    overlap: int = 8) -> pd.DataFrame:
    """Fixed-size token chunking with overlap — the sequence-prep step
    that turns documents into training windows (stride = chunk -
    overlap; the final window keeps whatever remains).  Emits the
    per-document summary a chunking run publishes: n_chunks =
    1 + ceil((n - chunk) / stride) for n > chunk else 1 (0 for empty
    docs) and the last window's token count.  Pure integer arithmetic,
    one map_batches pass, no exchange.  Returns (doc_id, n_tokens,
    n_chunks, last_chunk_tokens) ordered by doc_id."""
    assert 0 <= overlap < chunk
    stride = chunk - overlap
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n = np.array([len(TOKEN_RE.findall(x))
                      for x in t.column("text").to_pylist()], np.int64)
        extra = np.maximum(n - chunk, 0)
        nchunks = np.where(n == 0, 0,
                           1 + (extra + stride - 1) // stride)
        last = np.where(n == 0, 0, n - (nchunks - 1) * stride)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_tokens": pa.array(n),
                         "n_chunks": pa.array(nchunks.astype(np.int64)),
                         "last_chunk_tokens": pa.array(
                             last.astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow", **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID audit: confusion counts of the stopword-argmax
    predictor (the lang_id actor pool) against the table's labeled
    lang column — the sanity table any lang-filter deployment publishes
    before trusting the classifier at corpus scale.  Per-batch partial
    (lang, lang_pred) counts fold before one languages^2-scale
    groupby-sum.  Returns (lang, lang_pred, n) ordered by (lang,
    lang_pred)."""
    from ray.data.aggregate import Sum
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    scorer = LangId()

    def partial(t: pa.Table) -> pa.Table:
        pred = scorer(t).column("lang_pred").to_pylist()
        agg: dict = {}
        for lab, p in zip(t.column("lang").to_pylist(), pred):
            agg[(lab, p)] = agg.get((lab, p), 0) + 1
        return pa.table({
            "lang": pa.array([k[0] for k in agg], pa.string()),
            "lang_pred": pa.array([k[1] for k in agg], pa.string()),
            "n": pa.array(list(agg.values()), pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          **remote_args())
           .groupby(["lang", "lang_pred"])
           .aggregate(Sum("n", alias_name="n")))
    return out.to_pandas().sort_values(["lang", "lang_pred"])\
        .reset_index(drop=True)


def token_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document token-distribution entropy — the repetitiveness
    signal complementing repetition_stats: ent_sum_micro =
    sum over token types of c * floor(ln(n/c) * 1e6 + 0.5), i.e.
    n * H(doc) in integer micro-nats (0 for single-type docs; the
    per-type term is micro-rounded BEFORE the weighted sum, the
    unigram_logprob convention, so the result is exact integer
    arithmetic and hash-identical to the DuckDB oracle).  One
    map_batches pass, no exchange.  Returns (doc_id, n_tokens,
    ent_sum_micro) for docs with >= 1 token, ordered by doc_id."""
    tok = LOWER_TOKEN_RE
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        from collections import Counter
        ids, nt, ent = [], [], []
        for d, x in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            c = Counter(tok.findall(x.lower()))
            n = sum(c.values())
            if n == 0:
                continue
            cv = np.fromiter(c.values(), np.int64, count=len(c))
            s = np.floor(np.log(n / cv.astype(np.float64)) * 1_000_000
                         + 0.5).astype(np.int64)
            ids.append(d)
            nt.append(n)
            ent.append(int((cv * s).sum()))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "ent_sum_micro": pa.array(ent, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow", **remote_args())\
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def gopher_quality_flags(sf_dir: str, min_words: int = 50,
                         max_words: int = 100_000,
                         min_len_milli: int = 3000,
                         max_len_milli: int = 10_000,
                         min_stop_distinct: int = 2,
                         as_dataset: bool = False):
    """Gopher-style document quality gate (Rae et al. 2021 §A1.1, the
    rule set most corpus pipelines start from): word-count bounds,
    mean-word-length band, and the >=2-distinct-stopwords prose test —
    all in exact integer arithmetic so the DuckDB oracle hashes
    identically.  One map_batches pass over a 2-column pruned read, no
    exchange; tokens are the file-wide [a-z0-9]+ runs and the stopword
    inventory is the shared STOPWORDS tuple (same set as
    stopword_ratio), so the flags compose with the other text signals.
    Returns (doc_id, n_words, mean_word_len_milli, n_stop_distinct,
    flag_word_count, flag_mean_len, flag_stop, keep) with flags as
    int64 0/1, ordered by doc_id."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    sw = frozenset(STOPWORDS)

    def f(t: pa.Table) -> pa.Table:
        nw, ml, nsd = [], [], []
        for x in t.column("text").to_pylist():
            toks = LOWER_TOKEN_RE.findall(x.lower())
            n = len(toks)
            nw.append(n)
            ml.append(1000 * sum(map(len, toks)) // n if n else 0)
            nsd.append(len(sw.intersection(toks)))
        nw_a = np.asarray(nw, np.int64)
        ml_a = np.asarray(ml, np.int64)
        ns_a = np.asarray(nsd, np.int64)
        f_wc = ((nw_a >= min_words) & (nw_a <= max_words))\
            .astype(np.int64)
        f_ml = ((ml_a >= min_len_milli) & (ml_a <= max_len_milli))\
            .astype(np.int64)
        f_st = (ns_a >= min_stop_distinct).astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_words": pa.array(nw_a),
                         "mean_word_len_milli": pa.array(ml_a),
                         "n_stop_distinct": pa.array(ns_a),
                         "flag_word_count": pa.array(f_wc),
                         "flag_mean_len": pa.array(f_ml),
                         "flag_stop": pa.array(f_st),
                         "keep": pa.array(f_wc & f_ml & f_st)})

    out = ds.map_batches(f, batch_format="pyarrow", **remote_args())
    if as_dataset:   # streaming sink path: no driver frame
        return out
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def source_quality_report(sf_dir: str) -> pd.DataFrame:
    """Per-source corpus report card — the table a curation run
    publishes per ingest feed before deciding mix weights: document
    and character volume, the summed alpha-ratio quality signal
    (quality_milli, the shared formula), and how many docs survive the
    Gopher gate (gopher_quality_flags' keep, same bounds).  Everything
    folds per batch to source-cardinality partials before one
    sources-scale groupby — at 100 TB the exchange moves
    #batches x #sources rows, never documents.  mean_quality_milli is
    exact integer floor(sum/n).  Returns (source, n_docs, sum_chars,
    mean_quality_milli, n_keep, keep_milli) ordered by source."""
    from ray.data.aggregate import Sum
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source",
                                  "n_chars"])
    sw = frozenset(STOPWORDS)

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            # typed empty block: an all-empty from_pandas object
            # column would be null-typed and break block unification
            # (the hard_negatives empty-path convention)
            return pa.table({
                "source": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "sum_chars": pa.array([], pa.int64()),
                "sum_quality_milli": pa.array([], pa.int64()),
                "n_keep": pa.array([], pa.int64())})
        srcs = t.column("source").to_pylist()
        qual, keep = [], []
        for x in t.column("text").to_pylist():
            qual.append(quality_milli(x))
            toks = LOWER_TOKEN_RE.findall(x.lower())
            n = len(toks)
            ml = 1000 * sum(map(len, toks)) // n if n else 0
            keep.append(int(50 <= n <= 100_000
                            and 3000 <= ml <= 10_000
                            and len(sw.intersection(toks)) >= 2))
        df = pd.DataFrame({
            "source": srcs,
            "n_docs": np.ones(len(srcs), np.int64),
            "sum_chars": t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "sum_quality_milli": np.asarray(qual, np.int64),
            "n_keep": np.asarray(keep, np.int64)})
        g = df.groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          **remote_args())
           .groupby("source")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("sum_chars", alias_name="sum_chars"),
                      Sum("sum_quality_milli",
                          alias_name="sum_quality_milli"),
                      Sum("n_keep", alias_name="n_keep")))
    df = out.to_pandas().sort_values("source").reset_index(drop=True)
    for c in df.columns[1:]:
        df[c] = df[c].astype("int64")
    df["mean_quality_milli"] = df["sum_quality_milli"] // df["n_docs"]
    df["keep_milli"] = 1000 * df["n_keep"] // df["n_docs"]
    return df[["source", "n_docs", "sum_chars", "mean_quality_milli",
               "n_keep", "keep_milli"]]
