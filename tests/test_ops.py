"""Training-data operators: Ray implementations vs in-process oracles."""

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_dedup_exact_matches_pandas(ray_session):
    from erex.ops.dedup import dedup_exact
    out = dedup_exact(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    docs["text_hash"] = [hashlib.md5(t.encode()).hexdigest()
                         for t in docs["text"]]
    ref = docs.groupby("text_hash").agg(
        keep_id=("doc_id", "min"), n_dups=("doc_id", "size")).reset_index()
    ref = ref.sort_values("text_hash").reset_index(drop=True)
    assert list(out["text_hash"]) == list(ref["text_hash"])
    assert list(out["keep_id"]) == list(ref["keep_id"])
    assert list(out["n_dups"]) == list(ref["n_dups"])


def test_minhash_finds_planted_near_dups(ray_session):
    """LSH candidates + verification recover the exact-Jaccard pairs."""
    from erex.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    exact = ngram_jaccard_pairs(SF, threshold_milli=300)
    lsh = minhash_lsh_pairs(SF, threshold_milli=300)
    exact_pairs = set(zip(exact["doc_a"], exact["doc_b"]))
    lsh_pairs = set(zip(lsh["doc_a"], lsh["doc_b"]))
    # verification guarantees precision; recall high at J>=0.3
    assert lsh_pairs <= exact_pairs
    assert len(lsh_pairs) >= 0.8 * len(exact_pairs)
    # values agree where both found
    m = exact.merge(lsh, on=["doc_a", "doc_b"], suffixes=("_e", "_l"))
    assert (m["jaccard_milli_e"] == m["jaccard_milli_l"]).all()


def test_simhash_near_dups_have_small_hamming(ray_session):
    from erex.ops.dedup import simhash64, simhash_pairs
    out = simhash_pairs(SF, max_hamming=3)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    hmap = {d: simhash64(t) for d, t in zip(docs["doc_id"], docs["text"])}
    for da, db, ham in out.itertuples(index=False):
        want = bin(hmap[da] ^ hmap[db]).count("1")
        assert want == ham and ham <= 3


def test_ann_exact_topk_is_true_topk(ray_session):
    from erex.ops.similarity import ann_cosine_topk
    out = ann_cosine_topk(SF, n_queries=4, k=5)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    for qid in range(4):
        qv = M[ids == qid][0]
        sims = M @ qv
        cand = [(int(np.floor(s * 1e6 + 0.5)), int(i))
                for s, i in zip(sims, ids) if i != qid]
        cand.sort(key=lambda t: (-t[0], t[1]))
        want = [i for _s, i in cand[:5]]
        got = list(out[out["query_id"] == qid].sort_values("rank")["vec_id"])
        assert got == want


def test_ann_lsh_recall(ray_session):
    from erex.ops.similarity import ann_cosine_topk, ann_lsh_topk
    exact = ann_cosine_topk(SF, n_queries=8, k=5)
    approx = ann_lsh_topk(SF, n_queries=8, k=5)
    hits = tot = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.2  # coarse buckets: non-trivial recall


def test_doc_fingerprint_stability_and_sensitivity(ray_session):
    from erex.ops.text import rolling_fingerprint
    toks = "the quick brown fox jumps over the lazy dog".split()
    a = rolling_fingerprint(toks)
    assert a == rolling_fingerprint(list(toks))        # deterministic
    other = "a completely different stream of words entirely".split()
    assert a != rolling_fingerprint(other)             # discriminative
    # min-sampling: dropping a token NOT in the min window keeps it
    assert rolling_fingerprint([]) == 0


def test_multimodal_decode_roundtrip(ray_session):
    from erex.ops.multimodal import (FakeImageCodec, image_meta,
                                     synth_payload)
    codec = FakeImageCodec()
    w, h, c = codec.decode(synth_payload(123))
    assert (w, h, c) == (64 + 123 % 512, 48 + (123 * 7) % 384, 1 + 123 % 3)
    with pytest.raises(ValueError):
        codec.decode(b"notavalidblob")
    out = image_meta(SF)
    assert len(out) == 500
    assert (out["width"] == 64 + out["doc_id"] % 512).all()


def test_catena_eval_aggregates(ray_session):
    from erex.evalx import confusion_counts, prf_from_confusion
    from erex.corpus import corpus_parquet
    from erex.pipeline import run_extraction

    ds = run_extraction(corpus_parquet(20, seed=5))
    conf = confusion_counts(ds)
    assert (conf["n"] > 0).all()
    prf = prf_from_confusion(conf)
    assert set(prf.columns) == {"label", "tp", "fp", "fn", "precision",
                                "recall", "f1"}
    # tp+fn per label equals gold count
    df = ds.to_pandas()
    gold = df[(df["kind"] == "edge") & (df["gold"] != "NONE")
              & df["gold"].notna()]
    for lbl, n_gold in gold.groupby("gold").size().items():
        row = prf[prf["label"] == lbl]
        if len(row):
            assert int(row["tp"].iloc[0] + row["fn"].iloc[0]) == n_gold


def test_closure_aware_prf(ray_session):
    from erex.corpus import corpus_parquet
    from erex.evalx import closure_aware_prf
    from erex.pipeline import run_extraction
    res = closure_aware_prf(run_extraction(corpus_parquet(20, seed=5)))
    assert 0.0 <= res["precision"] <= 1.0
    assert 0.0 <= res["recall"] <= 1.0
    assert res["n_sys"] > 0 and res["n_gold"] > 0


def test_embedding_dup_lsh_recall(ray_session):
    """The banded scale path must recover almost all exact near-dup
    pairs (4 bands x 4 bits => ~98.5% expected recall at cos>=0.95) and
    never report a pair below threshold (verification is exact)."""
    from erex.ops.similarity import embedding_dup_pairs, \
        embedding_dup_pairs_lsh
    thr = 400_000
    exact = embedding_dup_pairs(SF, threshold_micro=thr)
    approx = embedding_dup_pairs_lsh(SF, threshold_micro=thr)
    e = set(zip(exact["vec_a"], exact["vec_b"]))
    a = set(zip(approx["vec_a"], approx["vec_b"]))
    assert a <= e                       # no false positives
    assert len(e) > 0
    assert len(a & e) / len(e) >= 0.5   # cos 0.4 pairs collide less
                                        # often than true near-dups
    # scores of recovered pairs match the exact computation
    em = {(r.vec_a, r.vec_b): r.cos_micro
          for r in exact.itertuples(index=False)}
    for r in approx.itertuples(index=False):
        assert em[(r.vec_a, r.vec_b)] == r.cos_micro


def test_ngram_jaccard_df_cap(ray_session):
    """df_cap only removes pair contributions from high-DF shingles;
    with a cap above every DF the result is unchanged."""
    from erex.ops.dedup import ngram_jaccard_pairs
    base = ngram_jaccard_pairs(SF, threshold_milli=200)
    capped_hi = ngram_jaccard_pairs(SF, threshold_milli=200, df_cap=10**9)
    pd.testing.assert_frame_equal(base, capped_hi)
    capped = ngram_jaccard_pairs(SF, threshold_milli=200, df_cap=8)
    # capping can only lower intersection counts => subset of pairs
    b = set(zip(base["doc_a"], base["doc_b"]))
    c = set(zip(capped["doc_a"], capped["doc_b"]))
    assert c <= b


def test_ann_ivf_recall(ray_session):
    """IVF-Flat with nprobe=4 of 16 lists recovers a solid fraction of
    the exact top-k; results it does return carry exact scores."""
    from erex.ops.similarity import ann_cosine_topk, ann_ivf_topk
    exact = ann_cosine_topk(SF, n_queries=8, k=5)
    approx = ann_ivf_topk(SF, n_queries=8, k=5)
    hits = tot = 0
    em = {}
    for r in exact.itertuples(index=False):
        em[(r.query_id, r.vec_id)] = r.cos_micro
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.4
    for r in approx.itertuples(index=False):
        if (r.query_id, r.vec_id) in em:
            assert em[(r.query_id, r.vec_id)] == r.cos_micro


def test_phrase_embed_feats_query(ray_session):
    """F14 driver query: one row per document with >=2 events, three
    deterministic micro-checksums; tokenChunk always embeds (no zero
    branch) so its checksum is almost surely nonzero."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q = m.queries()["phrase_embed_feats"]
    df = q(SF)
    assert list(df.columns) == ["doc_path", "subj", "obj",
                                "tempmark_micro", "causmark_micro",
                                "tokenchunk_micro"]
    assert len(df) > 0
    assert (df["tokenchunk_micro"] != 0).any()
    assert df.equals(q(SF))    # deterministic


def test_mln_merge_stats_query(ray_session):
    """J5 driver query: per-(pred, source) counts; the synthetic
    inferred side must produce mln-sourced rows, and the output must
    be independent of batching (doc-hash sharding)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q = m.queries()["mln_merge_stats"]
    df = q(SF)
    assert set(df.columns) == {"pred", "source", "n"}
    assert (df["source"] == "mln").any()
    assert (df["source"] == "classifier").any()
    assert df.equals(q(SF))    # deterministic


def test_repetition_stats_matches_pandas(ray_session):
    from erex.ops.text import repetition_stats
    from collections import Counter
    out = repetition_stats(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    for _, r in docs.sample(10, random_state=7).iterrows():
        ws = tok.findall(r["text"].lower())
        row = out[out["doc_id"] == r["doc_id"]].iloc[0]
        assert row["n_tokens"] == len(ws)
        assert row["n_distinct_tokens"] == len(set(ws))
        assert row["dup_token_milli"] == \
            1000 * (len(ws) - len(set(ws))) // max(1, len(ws))
        if len(ws) >= 2:
            top = max(Counter(zip(ws, ws[1:])).values())
            assert row["top_bigram_milli"] == 1000 * top // (len(ws) - 1)
        else:
            assert row["top_bigram_milli"] == 0


def test_topk_ngrams_matches_serial_count(ray_session):
    from erex.ops.text import topk_ngrams
    from collections import Counter
    out = topk_ngrams(SF, k=10)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    tok = re.compile(r"[a-z0-9]+")
    c: Counter = Counter()
    for x in docs["text"]:
        ws = tok.findall(x.lower())
        c.update(a + " " + b for a, b in zip(ws, ws[1:]))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["ngram"], out["cnt"]))
    assert got == want


def test_hash_sample_is_deterministic_rule(ray_session):
    from erex.ops.text import hash_sample, SAMPLE_THRESHOLD_32
    out = hash_sample(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    want = sorted(
        int(d) for d in docs["doc_id"]
        if int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
        < SAMPLE_THRESHOLD_32)
    assert list(out["doc_id"]) == want
    assert 0 < len(out) < len(docs)          # non-trivial sample
    assert out.equals(hash_sample(SF))       # reproducible


def _uf_reference(pairs, nodes):
    # brute-force components by BFS for the test oracle
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    comp = {}
    for n in nodes:
        if n in comp:
            continue
        seen, stack = {n}, [n]
        while stack:
            x = stack.pop()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(seen)
        for x in seen:
            comp[x] = m
    return comp


def test_union_find_and_hash_min_agree_on_random_graphs(ray_session):
    from erex.ops.dedup import union_find_components, cc_hash_min_labels
    rng = np.random.RandomState(42)
    for trial in range(3):
        n_nodes = 40
        edges = rng.randint(0, n_nodes, size=(30, 2))
        edges = edges[edges[:, 0] != edges[:, 1]]
        a = np.minimum(edges[:, 0], edges[:, 1])
        b = np.maximum(edges[:, 0], edges[:, 1])
        pairs = pd.DataFrame({"doc_a": a, "doc_b": b}).drop_duplicates()
        nodes = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
        want = _uf_reference(list(zip(pairs["doc_a"], pairs["doc_b"])),
                             nodes)
        uf = union_find_components(pairs)
        assert {n: uf.get(n, n) for n in nodes} == want
        lab = cc_hash_min_labels(pairs, num_partitions=4)
        got = dict(zip(lab["node"].astype(int), lab["label"].astype(int)))
        assert got == want


def test_union_find_pair_guard():
    from erex.ops.dedup import union_find_components
    pairs = pd.DataFrame({"doc_a": [1, 2], "doc_b": [2, 3]})
    with pytest.raises(ValueError):
        union_find_components(pairs, max_pairs=1)


def test_dedup_components_distributed_matches_driver(ray_session):
    from erex.ops.dedup import dedup_components
    base = dedup_components(SF)
    dist = dedup_components(SF, distributed=True)
    assert base.equals(dist)
    # every component id is a member of its own component (the min)
    comp = dict(zip(base["doc_id"], base["component_id"]))
    assert all(comp[c] == c for c in set(base["component_id"]))


def test_audio_chunks_cover_payload_exactly(ray_session):
    from erex.ops.multimodal import audio_chunks, FakeAudioCodec, \
        synth_audio_payload
    out = audio_chunks(SF)
    codec = FakeAudioCodec()
    for d in out["doc_id"].unique()[:10]:
        sr, total = codec.probe(synth_audio_payload(int(d)))
        sub = out[out["doc_id"] == d].sort_values("chunk_idx")
        assert list(sub["chunk_idx"]) == list(range(len(sub)))
        assert list(sub["start_sample"]) == [i * sr for i in range(len(sub))]
        assert sub["n_samples"].sum() == total        # exact coverage
        assert (sub["n_samples"].iloc[:-1] == sr).all()   # full chunks


def test_range_join_matches_pandas(ray_session):
    from erex.ops.relational import q_range_join_orders
    out = q_range_join_orders(SF, n_users=50, window_days=30)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_custkey", "o_orderdate"])
    ev = ev[ev["user_id"] < 50]
    win = pd.Timedelta(days=30)
    for _, r in ev.sample(min(20, len(ev)), random_state=3).iterrows():
        mine = od[(od["o_custkey"] == r["user_id"])
                  & (od["o_orderdate"] <= r["ts"])
                  & (od["o_orderdate"] >= r["ts"] - win)]
        got = out[out["event_id"] == r["event_id"]]["n_orders"].iloc[0]
        assert got == len(mine)
    assert len(out) == len(ev)


def test_quality_filter_composes_signals(ray_session):
    from erex.ops.text import (quality_filter, stopword_ratio,
                               repetition_stats, QF_MIN_TOKENS,
                               QF_MIN_STOPWORD_MILLI, QF_MAX_DUP_MILLI)
    qf = quality_filter(SF).set_index("doc_id")
    sw = stopword_ratio(SF).set_index("doc_id")
    rep = repetition_stats(SF).set_index("doc_id")
    for d in qf.index[:50]:
        n = rep.loc[d, "n_tokens"]
        if n < QF_MIN_TOKENS:
            want = "short"
        elif sw.loc[d, "stopword_milli"] < QF_MIN_STOPWORD_MILLI:
            want = "low_stopword"
        elif rep.loc[d, "dup_token_milli"] > QF_MAX_DUP_MILLI:
            want = "repetitive"
        else:
            want = ""
        assert qf.loc[d, "reject_reason"] == want
        assert qf.loc[d, "keep"] == (want == "")


def test_hll_estimate_close_to_exact(ray_session):
    from erex.ops.sketch import distinct_shingles, distinct_shingles_hll
    exact = int(distinct_shingles(SF)["n_distinct"].iloc[0])
    hll = distinct_shingles_hll(SF)
    est = int(hll["est_distinct"].iloc[0])
    assert exact > 100                      # corpus is non-degenerate
    # raw HLL with m=1024: ~3.2% typical error; allow 12%
    assert abs(est - exact) / exact < 0.12
    assert hll.equals(distinct_shingles_hll(SF))   # deterministic


def test_cms_heavy_hitters_overestimate_and_cover(ray_session):
    from erex.ops.sketch import heavy_hitter_ngrams, HH_FRAC
    from collections import Counter
    out = heavy_hitter_ngrams(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    tok = re.compile(r"[a-z0-9]+")
    c: Counter = Counter()
    for x in docs["text"]:
        ws = tok.findall(x.lower())
        c.update(a + " " + b for a, b in zip(ws, ws[1:]))
    total = sum(c.values())
    threshold = max(1, total // HH_FRAC)
    got = dict(zip(out["ngram"], out["est_count"]))
    # CMS never underestimates, so every TRUE heavy hitter is found
    for g, k in c.items():
        if k >= threshold:
            assert g in got and got[g] >= k
    # and every reported estimate bounds the true count from above
    for g, e in got.items():
        assert e >= c[g]
    assert out.equals(heavy_hitter_ngrams(SF))     # deterministic


def test_cms_empty_result_keeps_schema(ray_session, monkeypatch):
    import erex.ops.sketch as sk
    monkeypatch.setattr(sk, "HH_FRAC", 1)   # threshold = total: nothing passes
    out = sk.heavy_hitter_ngrams(SF)
    assert len(out) == 0
    assert list(out.columns) == ["ngram", "est_count"]


def test_copurchase_degree_matches_pandas(ray_session):
    from erex.ops.graph import copurchase_degree
    out = copurchase_degree(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    adj = {}
    for _o, parts in li.groupby("l_orderkey")["l_partkey"]:
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                adj.setdefault(ps[i], set()).add(ps[j])
                adj.setdefault(ps[j], set()).add(ps[i])
    want = {p: len(ns) for p, ns in adj.items()}
    got = dict(zip(out["part"].astype(int), out["degree"].astype(int)))
    assert got == want


def test_copurchase_pagerank_modes_agree(ray_session):
    from erex.ops.graph import copurchase_pagerank
    bc = copurchase_pagerank(SF, mode="broadcast")
    jn = copurchase_pagerank(SF, mode="join")
    assert bc.equals(jn)
    # the rule gives every node at least the base rank, and a
    # well-connected node more than an isolated one
    assert (bc["rank_micro"] >= 150_000).all()
    assert bc["rank_micro"].max() > 150_000


def test_copurchase_triangles_match_bruteforce(ray_session):
    from erex.ops.graph import copurchase_triangles
    from itertools import combinations
    got = int(copurchase_triangles(SF)["n_triangles"].iloc[0])
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    edges = set()
    for _o, parts in li.groupby("l_orderkey")["l_partkey"]:
        for a, b in combinations(sorted(set(parts)), 2):
            edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    want = sum(1 for (a, b) in edges
               for c in adj.get(b, ()) if c in adj.get(a, ()))
    assert got == want and got > 0
    # join mode (no node-sized broadcast) counts identically
    joined = int(copurchase_triangles(SF, mode="join")
                 ["n_triangles"].iloc[0])
    assert joined == want


def test_ngram_contamination_matches_bruteforce(ray_session):
    from erex.ops.text import ngram_contamination, DECON_N, \
        DECON_BENCH_MAX_ID
    out = ngram_contamination(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")

    def grams(x):
        ws = tok.findall(x.lower())
        return {" ".join(ws[i:i + DECON_N])
                for i in range(len(ws) - DECON_N + 1)}

    bench = set()
    for _, r in docs[docs["doc_id"] < DECON_BENCH_MAX_ID].iterrows():
        bench |= grams(r["text"])
    rest = docs[docs["doc_id"] >= DECON_BENCH_MAX_ID]
    assert len(out) == len(rest)
    for _, r in rest.sample(15, random_state=5).iterrows():
        k = len(grams(r["text"]) & bench)
        row = out[out["doc_id"] == r["doc_id"]].iloc[0]
        assert row["n_hits"] == k
        assert row["contaminated"] == (k > 0)


def test_embedding_quantize_roundtrip(ray_session):
    from erex.ops.similarity import embedding_quantize
    out = embedding_quantize(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    d = len(emb["embedding"].iloc[0])
    assert len(out) == len(emb) * d
    assert out["q"].abs().max() <= 127
    # dequantized values stay within half a quantization step
    for _, r in emb.sample(5, random_state=11).iterrows():
        v = np.asarray(r["embedding"], dtype=np.float64)
        s = np.abs(v).max()
        q = out[out["vec_id"] == r["vec_id"]].sort_values("dim")["q"]\
            .to_numpy()
        assert np.abs(q * s / 127.0 - v).max() <= s / 127.0 * 0.5 + 1e-9


def test_sequence_pack_is_contiguous_token_stream(ray_session):
    from erex.ops.text import sequence_pack, PACK_SEQ_LEN
    out = sequence_pack(SF)
    # offsets are exactly the prefix sums of token counts in doc order
    assert (out["tok_offset"].to_numpy()
            == np.concatenate([[0], out["n_tokens"].to_numpy()
                               .cumsum()[:-1]])).all()
    # bin bounds consistent with the offset arithmetic
    assert (out["bin_start"] == out["tok_offset"] // PACK_SEQ_LEN).all()
    last = out["tok_offset"] + out["n_tokens"].clip(lower=1) - 1
    assert (out["bin_end"] == last // PACK_SEQ_LEN).all()
    assert (out["bin_end"] >= out["bin_start"]).all()


def test_cc_hash_min_raises_on_non_convergence(ray_session):
    from erex.ops.dedup import cc_hash_min_labels
    # a chain propagates the min one hop per round: 6 nodes need 5
    # rounds, so max_iters=2 must fail loudly, never mislabel
    chain = pd.DataFrame({"doc_a": [0, 1, 2, 3, 4],
                          "doc_b": [1, 2, 3, 4, 5]})
    with pytest.raises(RuntimeError, match="did not converge"):
        cc_hash_min_labels(chain, num_partitions=2, max_iters=2)
    lab = cc_hash_min_labels(chain, num_partitions=2, max_iters=16)
    assert set(lab["label"]) == {0}


def test_sketches_invariant_under_block_size(ray_session):
    # register max-merge (HLL) and cell-sum merge (CMS) are
    # associative/commutative, so results must not depend on how Ray
    # chunks the input — force a much finer block structure and compare
    from ray.data import DataContext
    from erex.ops.sketch import (distinct_shingles_hll,
                                 heavy_hitter_ngrams)
    from erex.ops.text import topk_ngrams
    base_hll = distinct_shingles_hll(SF)
    base_hh = heavy_hitter_ngrams(SF)
    base_topk = topk_ngrams(SF)
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    from erex.ops.dedup import dedup_keep_best
    base_kb = dedup_keep_best(SF)
    try:
        ctx.target_max_block_size = 16 * 1024   # ~tiny blocks
        assert distinct_shingles_hll(SF).equals(base_hll)
        assert heavy_hitter_ngrams(SF).equals(base_hh)
        assert topk_ngrams(SF).equals(base_topk)
        # keep_best's per-batch partial max must be batching-invariant
        assert dedup_keep_best(SF).equals(base_kb)
    finally:
        ctx.target_max_block_size = old


def test_new_ops_invariant_under_block_size(ray_session):
    """The round-4-closing operators' partial combines (k-gram hash
    shards, CMS-style bucket counts, per-batch distinct key counts,
    stateless masks) must not depend on Ray's block structure."""
    from ray.data import DataContext
    from erex.ops.dedup import dup_span_mask
    from erex.ops.relational import event_props_stats, fk_integrity
    from erex.ops.text import dsir_weights, span_corruption_stats
    base = [dup_span_mask(SF), dsir_weights(SF),
            span_corruption_stats(SF), event_props_stats(SF),
            fk_integrity(SF)]
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024
        redo = [dup_span_mask(SF), dsir_weights(SF),
                span_corruption_stats(SF), event_props_stats(SF),
                fk_integrity(SF)]
        for b, r in zip(base, redo):
            assert r.equals(b)
    finally:
        ctx.target_max_block_size = old


def test_knn_graph_mutual_properties(ray_session):
    from erex.ops.similarity import knn_graph_mutual
    out = knn_graph_mutual(SF, k=5)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    cm = np.floor(M @ M.T * 1_000_000 + 0.5).astype(np.int64)
    # serial mutual-kNN oracle
    knn = {}
    for i, v in enumerate(ids):
        order = np.lexsort((ids, -cm[i]))
        knn[v] = [ids[j] for j in order if ids[j] != v][:5]
    want = sorted((a, b) for a in ids for b in knn[a]
                  if a < b and a in knn[b])
    got = sorted(zip(out["vec_a"], out["vec_b"]))
    assert got == want and len(got) > 0
    assert (out["vec_a"] < out["vec_b"]).all()


def test_inverted_index_roundtrip(ray_session):
    from erex.ops.text import inverted_index
    out = inverted_index(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    want = {}
    for _, r in docs.iterrows():
        for w in set(tok.findall(r["text"].lower())):
            want.setdefault(w, set()).add(int(r["doc_id"]))
    assert len(out) == len(want)
    for _, row in out.iterrows():
        ids = want[row["token"]]
        assert row["df"] == len(ids)
        assert row["postings"] == ",".join(str(d) for d in sorted(ids))


def test_tfidf_top_terms_matches_serial(ray_session):
    import math
    from collections import Counter
    from erex.ops.text import tfidf_top_terms
    out = tfidf_top_terms(SF, top=3)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    n = len(docs)
    dfm: Counter = Counter()
    for x in docs["text"]:
        dfm.update(set(tok.findall(x.lower())))
    for _, r in docs.sample(10, random_state=13).iterrows():
        tf = Counter(tok.findall(r["text"].lower()))
        want = sorted(
            ((-math.floor(c * math.log(n / dfm[w]) * 1e6 + 0.5), w)
             for w, c in tf.items()))[:3]
        sub = out[out["doc_id"] == r["doc_id"]].sort_values("rank")
        assert list(sub["token"]) == [w for _s, w in want]
        assert list(sub["tfidf_micro"]) == [-s for s, _w in want]


def test_tfidf_join_mode_identical(ray_session):
    """Broadcast and token-hash-join modes are value-identical —
    including the micro-rounded scores (math.log vs np.log agree
    bit-for-bit on float64)."""
    from erex.ops.text import tfidf_top_terms
    a = tfidf_top_terms(SF, top=3, mode="broadcast")
    b = tfidf_top_terms(SF, top=3, mode="join")
    pd.testing.assert_frame_equal(a, b)


def test_drop_schemaless_blocks_unpoisons_joins(ray_session):
    """A groupby().aggregate() with fewer keys than sort partitions
    emits zero-column empty blocks that crash pyarrow hash joins
    ('No match or multiple matches for key field'); map_batches never
    sees those blocks, so drop_schemaless_blocks rebuilds the dataset
    without them. This is the seam the tfidf join mode and the graph
    join modes sit on."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum
    from erex._env import drop_schemaless_blocks

    # 3 distinct keys, forced through a many-partition aggregate
    src = rd.from_items([{"k": str(i % 3), "v": 1} for i in range(900)])\
        .repartition(24)
    agg = src.groupby("k").aggregate(Sum("v", alias_name="v"))
    clean = drop_schemaless_blocks(agg)
    left = rd.from_items([{"k": str(i % 3), "x": i} for i in range(30)])
    out = left.join(clean, "inner", 16, on=("k",)).to_pandas()
    assert len(out) == 30
    assert set(out["v"]) == {300}


def test_rolling_window_matches_bruteforce(ray_session):
    from erex.ops.relational import q_rolling_window
    out = q_rolling_window(SF, n_users=100, window_hours=24)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    ev = ev[ev["user_id"] < 100]
    assert len(out) == len(ev)
    win = pd.Timedelta(hours=24)
    for _, r in ev.sample(min(20, len(ev)), random_state=17).iterrows():
        mine = ev[(ev["user_id"] == r["user_id"])
                  & (ev["ts"] <= r["ts"])
                  & (ev["ts"] >= r["ts"] - win)]
        got = out[out["event_id"] == r["event_id"]]["n_in_window"].iloc[0]
        assert got == len(mine) >= 1      # each event sees itself


def test_profile_table_matches_pandas(ray_session):
    from erex.ops.relational import profile_table, _canon_int
    out = profile_table(SF, table="orders").set_index("column")
    od = pd.read_parquet(f"{SF}/orders.parquet")
    assert (out["n_nulls"] == 0).all()
    assert out.loc["o_orderkey", "min_val"] == \
        _canon_int(od["o_orderkey"].min())
    assert out.loc["o_orderkey", "max_val"] == \
        _canon_int(od["o_orderkey"].max())
    assert out.loc["o_orderstatus", "min_val"] == od["o_orderstatus"].min()
    assert out.loc["o_totalprice", "max_val"] == \
        _canon_int(round(od["o_totalprice"].max() * 100))
    assert out.loc["o_orderdate", "min_val"] == \
        od["o_orderdate"].min().strftime("%Y-%m-%d %H:%M:%S")


def test_profile_canonical_encoding_orders_negatives():
    from erex.ops.relational import _canon_int, _round_half_away
    vals = [-10, -5, -1, 0, 1, 5, 10, 2**40, -(2**40)]
    canon = [_canon_int(v) for v in vals]
    assert sorted(canon) == [c for _v, c in sorted(zip(vals, canon))]
    # DuckDB ROUND is half-away-from-zero, not banker's
    a = _round_half_away(np.array([12.5, -12.5, 12.4, -12.6, 0.0]))
    assert list(a) == [13, -13, 12, -13, 0]
    with pytest.raises(ValueError):
        _canon_int(2 ** 63)


def test_dataops_cli_list_and_validation():
    # both paths exit before ray.init, so they are subprocess-fast
    import subprocess
    import sys as _sys
    r = subprocess.run([_sys.executable, "-m", "erex", "dataops", "list"],
                       capture_output=True, text=True,
                       cwd="/root/repo", timeout=120)
    ops = r.stdout.split()
    assert r.returncode == 0
    assert "dedup_minhash" in ops and "profile_table" in ops
    r2 = subprocess.run([_sys.executable, "-m", "erex", "dataops",
                         "no_such_op"],
                        capture_output=True, text=True,
                        cwd="/root/repo", timeout=120)
    assert r2.returncode == 2
    assert "unknown op" in r2.stderr


def test_dedup_keep_best_semantics(ray_session):
    """Each component keeps exactly one doc: its highest quality_milli,
    ties to the lowest doc_id; singletons keep themselves."""
    from erex.ops.dedup import dedup_keep_best
    out = dedup_keep_best(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id"])
    assert len(out) == len(docs)
    for comp, g in out.groupby("component_id"):
        kept = g[g["keep"]]
        assert len(kept) == 1
        want = g.sort_values(["quality_milli", "doc_id"],
                             ascending=[False, True]).iloc[0]
        assert int(kept["doc_id"].iloc[0]) == int(want["doc_id"])
    # at least one multi-doc component exercises the decision
    sizes = out.groupby("component_id").size()
    assert (sizes > 1).any()


def test_bm25_topk_matches_bruteforce(ray_session):
    import math
    from collections import Counter
    from erex.ops.text import BM25_B, BM25_K1, bm25_topk
    out = bm25_topk(SF, query="hash join order", k=10)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    terms = ["hash", "join", "order"]
    tfs = {d: Counter(tok.findall(x.lower()))
           for d, x in zip(docs["doc_id"], docs["text"])}
    n = len(docs)
    dls = {d: sum(c.values()) for d, c in tfs.items()}
    avgdl = sum(dls.values()) / n
    dfm = {t: sum(1 for c in tfs.values() if c[t] > 0) for t in terms}
    rows = []
    for d, c in tfs.items():
        score, hit = 0.0, False
        for t in terms:
            f = c.get(t, 0)
            if not f:
                continue
            hit = True
            idf = math.log((n - dfm[t] + 0.5) / (dfm[t] + 0.5) + 1.0)
            score += idf * (f * (BM25_K1 + 1.0)) \
                / (f + BM25_K1 * (1.0 - BM25_B
                                  + BM25_B * dls[d] / avgdl))
        if hit:
            rows.append((int(math.floor(score * 1e6 + 0.5)), int(d)))
    rows.sort(key=lambda r: (-r[0], r[1]))
    want = rows[:10]
    got = list(zip(out["score_micro"], out["doc_id"]))
    assert got == want
    assert list(out["rank"]) == list(range(1, len(want) + 1))


def test_stratified_sample_balances_strata(ray_session):
    from erex.ops.text import stratified_sample
    out = stratified_sample(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    counts = docs.groupby("lang").size()
    mn = int(counts.min())
    # brute-force replay of the per-stratum hash filter
    thr = {lg: (4294967296 * mn) // int(n) for lg, n in counts.items()}
    keep = [int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
            < thr[lg]
            for d, lg in zip(docs["doc_id"], docs["lang"])]
    want = docs[keep].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)
    # each stratum lands near the smallest stratum's size
    got_counts = out.groupby("lang").size()
    assert (got_counts <= mn + 3).all()
    assert len(out) > 0


def test_unigram_logprob_matches_serial(ray_session):
    """Broadcast-mode unigram surprisal == a serial Counter
    recomputation with the same micro-round-then-weighted-sum rule."""
    import math
    from collections import Counter
    from erex.ops.text import unigram_logprob
    out = unigram_logprob(SF, mode="broadcast")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    corpus = Counter()
    per_doc = {}
    for d, x in zip(docs["doc_id"], docs["text"]):
        tf = Counter(tok.findall(x.lower()))
        per_doc[int(d)] = tf
        corpus.update(tf)
    n = sum(corpus.values())
    sm = {w: math.floor(math.log(n / c) * 1_000_000 + 0.5)
          for w, c in corpus.items()}
    assert len(out) == sum(1 for tf in per_doc.values() if tf)
    for _, r in out.head(50).iterrows():
        tf = per_doc[int(r["doc_id"])]
        assert int(r["n_tokens"]) == sum(tf.values())
        assert int(r["surprisal_micro"]) == \
            sum(c * sm[w] for w, c in tf.items())


def test_unigram_logprob_join_mode_identical(ray_session):
    from erex.ops.text import unigram_logprob
    a = unigram_logprob(SF, mode="broadcast").reset_index(drop=True)
    b = unigram_logprob(SF, mode="join").reset_index(drop=True)
    assert a.equals(b)


def test_semantic_dedup_matches_serial(ray_session):
    """The distributed cluster-sharded prune == a serial numpy
    recomputation from the SAME deterministic centroids; basic
    SemDeDup invariants hold (lowest vec_id per cluster always kept)."""
    from erex.ops.similarity import (_kmeans_centroids, _normalize,
                                     semantic_dedup)
    out = semantic_dedup(SF, threshold_micro=300_000)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .sort_values("vec_id")
    C = _kmeans_centroids(SF, k=16)
    X = _normalize(np.stack(emb["embedding"].to_numpy())
                   .astype(np.float64))
    assign = np.argmax(X @ C.T, axis=1)
    vid = emb["vec_id"].to_numpy()
    keep = np.ones(len(vid), dtype=bool)
    for c in np.unique(assign):
        idx = np.nonzero(assign == c)[0]  # vid-sorted already
        cm = np.floor(X[idx] @ X[idx].T * 1_000_000 + 0.5)
        dup = np.tril(cm >= 300_000, -1).any(axis=1)
        keep[idx] = ~dup
    got = out.sort_values("vec_id")
    assert (got["vec_id"].to_numpy() == vid).all()
    assert (got["cid"].to_numpy() == assign).all()
    assert (got["keep"].to_numpy().astype(bool) == keep).all()
    # per cluster, the lowest vec_id is never a duplicate
    first = got.groupby("cid", sort=False).first()
    assert (first["keep"] == 1).all()
    assert 0 < int(got["keep"].sum()) < len(got)


def test_semantic_dedup_cluster_guard(ray_session, monkeypatch):
    from erex.ops import similarity
    monkeypatch.setattr(similarity, "_SEMDEDUP_MAX_CLUSTER", 3)
    with pytest.raises(Exception, match="exceeds"):
        similarity.semantic_dedup(SF)


def test_group_quantiles_matches_pandas(ray_session):
    """Histogram-walk quantiles == pandas' 'inverted_cdf'
    (= percentile_disc) per group."""
    from erex.ops.relational import group_quantiles
    out = group_quantiles(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    for _, r in out.iterrows():
        vals = np.sort(
            docs.loc[docs["lang"] == r["lang"], "n_chars"].to_numpy())
        assert int(r["n_rows"]) == len(vals)
        import math
        for p, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            assert int(r[col]) == int(vals[math.ceil(p * len(vals)) - 1])


def test_source_overlap_matches_serial(ray_session):
    """Distributed shingle-shard pair counts == a serial set
    recomputation; Jaccard stays exact integer math."""
    from erex.ops.dedup import shingle_set, source_overlap
    out = source_overlap(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    sets: dict = {}
    for src, x in zip(docs["source"], docs["text"]):
        sets.setdefault(src, set()).update(shingle_set(x, 3))
    srcs = sorted(sets)
    want = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                un = len(sets[a] | sets[b])
                want.append((a, b, inter, un, 1000 * inter // un))
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == want


def test_embedding_project_matches_serial(ray_session):
    """The projection is one broadcast matmul: distributed output ==
    driver-side numpy on the full matrix, and it preserves rough
    neighborhood structure (JL property sanity: self-dot dominates)."""
    from erex.ops.similarity import _RP_SEED, embedding_project
    out = embedding_project(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    R = np.random.RandomState(_RP_SEED).normal(size=(16, 64))
    Y = np.floor(X @ R.T * 1_000_000 + 0.5).astype(np.int64)
    assert (out["vec_id"].to_numpy() == emb["vec_id"].to_numpy()).all()
    got = out[[f"p{j}" for j in range(16)]].to_numpy()
    assert (got == Y).all()


def test_jsonl_roundtrip_stats_match_parquet(ray_session):
    """The JSONL write->read round-trip preserves every byte: the
    checksum aggregate equals the same aggregate computed straight off
    the parquet."""
    from erex.ops.io import documents_jsonl_stats
    out = documents_jsonl_stats(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = []
    for lang, g in docs.groupby("lang", sort=True):
        cs = sum(int(hashlib.md5(x.encode()).hexdigest()[:8], 16)
                 for x in g["text"])
        want.append((lang, len(g), int(g["n_chars"].sum()), cs))
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == want


def test_user_retention_matches_serial(ray_session):
    """Shard-local day-transition scan == a serial set recomputation
    over distinct (user, day) pairs."""
    from erex.ops.relational import q_user_retention
    out = q_user_retention(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    ev["day"] = ev["ts"].dt.floor("D")
    ad = ev.drop_duplicates(["user_id", "day"])
    byday = {d: set(g["user_id"]) for d, g in ad.groupby("day")}
    one = pd.Timedelta(days=1)
    want = []
    for d in sorted(byday):
        act = byday[d]
        ret = len(act & byday.get(d + one, set()))
        want.append((d, len(act), ret, 1000 * ret // len(act)))
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == want
    assert (out["n_retained"] <= out["n_active"]).all()


def test_weighted_sample_matches_serial_and_biases_long_docs(ray_session):
    """Distributed partial top-k == the serial A-ES computation, and
    the sample is genuinely weight-biased: mean n_chars of the sample
    exceeds the corpus mean (n_chars IS the weight)."""
    import math
    from erex.ops.text import weighted_sample
    out = weighted_sample(SF, k=50)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    keys = []
    for d, lg, w in zip(docs["doc_id"], docs["lang"], docs["n_chars"]):
        h = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        keys.append((math.floor(-math.log(u) / w * 1_000_000_000 + 0.5),
                     int(d), lg))
    keys.sort()
    want = [(i + 1, d, lg, kn) for i, (kn, d, lg)
            in enumerate(keys[:50])]
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == want
    sampled = docs[docs["doc_id"].isin(out["doc_id"])]
    assert sampled["n_chars"].mean() > docs["n_chars"].mean()


def test_bigram_logprob_matches_serial_and_modes_agree(ray_session):
    """Both execution modes == a serial Counter recomputation of the
    bigram conditional surprisal."""
    import math
    from collections import Counter
    from erex.ops.text import bigram_logprob
    a = bigram_logprob(SF, mode="broadcast").reset_index(drop=True)
    b = bigram_logprob(SF, mode="join").reset_index(drop=True)
    assert a.equals(b)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    corpus: Counter = Counter()
    per_doc = {}
    for d, x in zip(docs["doc_id"], docs["text"]):
        ws = tok.findall(x.lower())
        tf = Counter(zip(ws, ws[1:]))
        per_doc[int(d)] = tf
        corpus.update(tf)
    w1tot: Counter = Counter()
    for (w1, _), c in corpus.items():
        w1tot[w1] += c
    sm = {k: math.floor(math.log(w1tot[k[0]] / c) * 1_000_000 + 0.5)
          for k, c in corpus.items()}
    assert len(a) == sum(1 for tf in per_doc.values() if tf)
    for _, r in a.head(40).iterrows():
        tf = per_doc[int(r["doc_id"])]
        assert int(r["n_bigrams"]) == sum(tf.values())
        assert int(r["surprisal_micro"]) == \
            sum(c * sm[k] for k, c in tf.items())


def test_neardup_contamination_matches_pair_filter(ray_session):
    """The candidate-filtered run == post-filtering the full verified
    pair set (the filter only prunes work, never results), and every
    contaminated doc is corpus-side."""
    from erex.ops.dedup import minhash_lsh_pairs, neardup_contamination
    out = neardup_contamination(SF, n_bench=100)
    full = minhash_lsh_pairs(SF)
    bc = full[(full["doc_a"] < 100) & (full["doc_b"] >= 100)]
    want = bc.groupby("doc_b").agg(
        n=("doc_a", "size"), mx=("jaccard_milli", "max"))
    got = out.set_index("doc_id")
    assert (out["doc_id"] >= 100).all()
    assert sorted(got.index) == sorted(want.index)
    assert (got["n_bench_matches"].sort_index().to_numpy()
            == want["n"].sort_index().to_numpy()).all()
    assert (got["max_jaccard_milli"].sort_index().to_numpy()
            == want["mx"].sort_index().to_numpy()).all()


def test_pmi_topk_matches_serial(ray_session):
    """Distributed margin joins + partial top-k == a serial Counter
    recomputation of the PMI ranking."""
    import math
    from collections import Counter
    from erex.ops.text import pmi_topk
    out = pmi_topk(SF, k=10, min_count=5)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"])
    tok = re.compile(r"[a-z0-9]+")
    bc: Counter = Counter()
    for x in docs["text"]:
        ws = tok.findall(x.lower())
        bc.update(zip(ws, ws[1:]))
    nb = sum(bc.values())
    m1: Counter = Counter()
    m2: Counter = Counter()
    for (w1, w2), c in bc.items():
        m1[w1] += c
        m2[w2] += c
    scored = sorted(
        ((-math.floor(math.log((c * nb) / (m1[w1] * m2[w2]))
                      * 1_000_000 + 0.5), w1, w2, c)
         for (w1, w2), c in bc.items() if c >= 5))[:10]
    want = [(i + 1, w1, w2, c, -neg)
            for i, (neg, w1, w2, c) in enumerate(scored)]
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == want


def test_pretrain_mix_composes_standalone_stages(ray_session):
    """The fused pipeline == chaining the three standalone operators'
    semantics serially (quality keep -> min-doc_id exact dedup ->
    per-lang integer-threshold sampling)."""
    from erex.ops.text import (QF_MAX_DUP_MILLI, QF_MIN_STOPWORD_MILLI,
                               QF_MIN_TOKENS, STOPWORDS, pretrain_mix)
    out = pretrain_mix(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "text"])
    tok = re.compile(r"[a-z0-9]+")
    sw = frozenset(STOPWORDS)
    surv = []
    for d, lg, x in docs.itertuples(index=False):
        ws = tok.findall(x.lower())
        n = len(ws)
        if n < QF_MIN_TOKENS:
            continue
        if 1000 * sum(1 for w in ws if w in sw) // max(1, n) \
                < QF_MIN_STOPWORD_MILLI:
            continue
        if 1000 * (n - len(set(ws))) // max(1, n) > QF_MAX_DUP_MILLI:
            continue
        surv.append((int(d), lg, hashlib.md5(x.encode()).hexdigest()))
    keep_of = {}
    for d, lg, h in surv:
        if h not in keep_of or d < keep_of[h][0]:
            keep_of[h] = (d, lg)
    kd = sorted(keep_of.values())
    from collections import Counter
    cnt = Counter(lg for _, lg in kd)
    mn = min(cnt.values())
    thr = {lg: (4294967296 * mn) // n for lg, n in cnt.items()}
    want = [(d, lg) for d, lg in kd
            if int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
            < thr[lg]]
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == want
    assert 0 < len(got) < len(docs)


def test_weighted_sample_excludes_zero_weight(ray_session, tmp_path):
    """A-ES: zero-weight rows are never sampled (and never poison the
    key computation with inf)."""
    from erex.ops.text import weighted_sample
    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "lang": ["en"] * 10,
        "n_chars": np.array([0, 0] + [100] * 8, dtype=np.int64),
        "text": ["x"] * 10, "source": ["s"] * 10})
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = weighted_sample(str(tmp_path), k=10)
    assert len(out) == 8
    assert not set(out["doc_id"]) & {0, 1}
    assert (out["key_nano"] > 0).all()


def test_pretrain_mix_empty_survivors(ray_session, tmp_path):
    """All docs failing the quality rule yields an empty frame, not a
    crash (matches the oracle's zero rows)."""
    from erex.ops.text import pretrain_mix
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "lang": ["en"] * 5,
        "text": ["too short"] * 5,
        "n_chars": np.array([9] * 5, dtype=np.int64),
        "source": ["s"] * 5})
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = pretrain_mix(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "lang"]


def test_embedding_clusters_consistent_with_semantic_dedup(ray_session):
    """Assignment output == semantic_dedup's (same quantizer), and the
    winning similarity is the row's max over the centroid matrix."""
    from erex.ops.similarity import (_kmeans_centroids, _normalize,
                                     embedding_clusters, semantic_dedup)
    out = embedding_clusters(SF)
    sd = semantic_dedup(SF)
    assert (out["cid"].to_numpy()
            == sd.sort_values("vec_id")["cid"].to_numpy()).all()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .sort_values("vec_id")
    C = _kmeans_centroids(SF, k=16)
    X = _normalize(np.stack(emb["embedding"].to_numpy())
                   .astype(np.float64))
    sims = X @ C.T
    want = np.floor(sims.max(axis=1) * 1_000_000 + 0.5).astype(np.int64)
    assert (out["cos_micro"].to_numpy() == want).all()


def test_event_transitions_matches_serial(ray_session):
    """Shard-local adjacent-pair scan == serial per-user recount."""
    from collections import Counter
    from erex.ops.relational import event_transitions
    out = event_transitions(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    c: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        et = g["event_type"].to_list()
        c.update(zip(et, et[1:]))
    want = sorted((a, b, n) for (a, b), n in c.items())
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == want


def test_event_anomalies_matches_serial(ray_session):
    """Distributed daily counts + integer-median spike rule == serial
    pandas recount (percentile_disc median semantics)."""
    import math
    from erex.ops.relational import event_anomalies
    out = event_anomalies(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"])
    ev["day"] = ev["ts"].dt.floor("D")
    dc = ev.groupby(["event_type", "day"]).size().reset_index(name="n")
    for et, g in dc.groupby("event_type"):
        ns = np.sort(g["n"].to_numpy())
        med = int(ns[math.ceil(0.5 * len(ns)) - 1])
        sub = out[out["event_type"] == et].set_index("day")
        for _, r in g.iterrows():
            row = sub.loc[r["day"]]
            assert int(row["n"]) == int(r["n"])
            assert int(row["median_n"]) == med
            assert int(row["is_spike"]) == int(r["n"] >= 2 * med)


def test_q_running_total_matches_pandas(ray_session):
    """Sharded cumulative scan == pandas window over sorted orders."""
    from erex.ops.relational import q_running_total
    out = q_running_total(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")
    od["cents"] = np.floor(od["o_totalprice"] * 100 + 0.5).astype("int64")
    od = od.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    od["run_cents"] = od.groupby("o_custkey")["cents"].cumsum()
    ref = od[["o_orderkey", "run_cents"]]\
        .sort_values("o_orderkey").reset_index(drop=True)
    assert list(out["o_orderkey"]) == list(ref["o_orderkey"])
    assert list(out["run_cents"]) == list(ref["run_cents"])


def test_q_order_gaps_matches_pandas(ray_session):
    """Sharded LAG-diff == serial per-customer gap recount."""
    from erex.ops.relational import q_order_gaps
    out = q_order_gaps(SF)
    od = pd.read_parquet(f"{SF}/orders.parquet")\
        .sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    rows = {}
    for ck, g in od.groupby("o_custkey"):
        ts = g["o_orderdate"].to_numpy("datetime64[us]")
        if len(ts) < 2:
            continue
        gaps = ((ts[1:] - ts[:-1]) // np.timedelta64(1, "s"))\
            .astype(np.int64)
        rows[ck] = (len(gaps), int(gaps.sum()), int(gaps.max()))
    assert {int(r.o_custkey): (int(r.n_gaps), int(r.sum_gap_sec),
                               int(r.max_gap_sec))
            for r in out.itertuples()} == rows


def test_q_hopping_window_covers_width(ray_session):
    """Every event lands in exactly 3 windows; totals and a spot
    window recount agree with a serial pass."""
    from erex.ops.relational import q_hopping_window
    out = q_hopping_window(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    assert out["n_events"].sum() == 3 * len(ev)
    hours = ev["ts"].dt.floor("h")
    w0 = hours.value_counts()
    spot = w0.index[0]
    want = int(sum(w0.get(spot + pd.Timedelta(hours=k), 0)
                   for k in range(3)))
    got = int(out.loc[out["window_start"] == spot, "n_events"].iloc[0])
    assert got == want


def test_rollup_counts_levels(ray_session):
    """Leaf rows sum to per-source rows sum to the grand total."""
    from erex.ops.relational import rollup_counts
    out = rollup_counts(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "lang", "n_chars"])
    total = out[(out["source"] == "(all)") & (out["lang"] == "(all)")]
    assert int(total["n_docs"].iloc[0]) == len(docs)
    assert int(total["sum_chars"].iloc[0]) == int(docs["n_chars"].sum())
    leafs = out[(out["source"] != "(all)") & (out["lang"] != "(all)")]
    assert int(leafs["n_docs"].sum()) == len(docs)
    per_src = out[(out["source"] != "(all)") & (out["lang"] == "(all)")]
    assert int(per_src["n_docs"].sum()) == len(docs)
    one = docs.groupby(["source", "lang"]).size()
    for r in leafs.itertuples():
        assert int(r.n_docs) == int(one[(r.source, r.lang)])


def test_token_freq_histogram_matches_serial(ray_session):
    """Distributed Zipf buckets == serial Counter + bit_length."""
    from collections import Counter

    from erex.ops.text import LOWER_TOKEN_RE, token_freq_histogram
    out = token_freq_histogram(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    c = Counter()
    for x in docs["text"]:
        c.update(LOWER_TOKEN_RE.findall(x.lower()))
    buckets = Counter()
    occ = Counter()
    for _, n in c.items():
        b = n.bit_length() - 1
        buckets[b] += 1
        occ[b] += n
    got = {int(r.bucket): (int(r.n_tokens), int(r.total_occ))
           for r in out.itertuples()}
    assert got == {b: (buckets[b], occ[b]) for b in buckets}


def test_histogram_quantiles_bounds_exact(ray_session):
    """The histogram quantile's bin lower edge is <= the exact
    quantile and within one bin width of it, per event type."""
    import math
    from erex.ops.sketch import HISTQ_BINS, histogram_quantiles
    out = histogram_quantiles(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    ev["cents"] = np.floor(ev["value"] * 100 + 0.5).astype("int64")
    for et, g in ev.groupby("event_type"):
        cents = np.sort(g["cents"].to_numpy())
        mn, mx = int(cents[0]), int(cents[-1])
        width = max(1, (mx - mn + HISTQ_BINS - 1) // HISTQ_BINS)
        sub = out[out["event_type"] == et]
        for r in sub.itertuples():
            exact = int(cents[math.ceil(r.q_pct / 100 * len(cents)) - 1])
            assert r.approx_cents <= exact
            assert exact - r.approx_cents <= width + 1


def test_normalized_dedup_catches_case_variants(ray_session):
    """Normalization groups case/punctuation variants that exact
    dedup keeps apart; group counts match a serial recount."""
    from erex.ops.dedup import normalized_dedup
    out = normalized_dedup(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    norm = re.compile(r"[^a-z0-9]+")
    key = [norm.sub(" ", t.lower()).strip() for t in docs["text"]]
    ref = pd.DataFrame({"k": key, "doc_id": docs["doc_id"]})\
        .groupby("k").agg(keep_id=("doc_id", "min"),
                          n_dups=("doc_id", "size"))
    assert len(out) == len(ref)
    assert int(out["n_dups"].sum()) == len(docs)
    assert sorted(out["keep_id"]) == sorted(ref["keep_id"])


def test_incremental_dedup_matches_serial(ray_session):
    """Sharded snapshot match == serial prefix-key join."""
    from erex.ops.dedup import _tokens, incremental_dedup
    out = incremental_dedup(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    docs["pre"] = [" ".join(_tokens(t)[:10]) for t in docs["text"]]
    old = docs[docs["doc_id"] % 2 == 0]
    new = docs[docs["doc_id"] % 2 == 1]
    snap = old.groupby("pre")["doc_id"].min()
    want = {int(r.doc_id): int(snap[r.pre]) for r in new.itertuples()
            if r.pre in snap.index}
    assert {int(r.doc_id): int(r.dup_of)
            for r in out.itertuples()} == want


def test_dup_shingle_fraction_matches_serial(ray_session):
    """Sharded cross-doc duplicate-shingle fraction == serial set
    arithmetic over all documents."""
    from collections import Counter

    from erex.ops.dedup import _tokens, dup_shingle_fraction
    out = dup_shingle_fraction(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    sets = {}
    for r in docs.itertuples():
        toks = _tokens(r.text)
        if len(toks) >= 3:
            sets[int(r.doc_id)] = {" ".join(toks[i:i + 3])
                                   for i in range(len(toks) - 2)}
    df = Counter()
    for ss in sets.values():
        df.update(ss)
    got = {int(r.doc_id): (int(r.n_shingles), int(r.n_dup),
                           int(r.dup_milli)) for r in out.itertuples()}
    want = {}
    for d, ss in sets.items():
        nd = sum(1 for s in ss if df[s] > 1)
        want[d] = (len(ss), nd, 1000 * nd // len(ss))
    assert got == want


def test_dup_span_mask_matches_serial(ray_session):
    """Sharded exact-substring span masking == serial k-gram counting
    + interval merge over all documents."""
    from collections import Counter

    from erex.ops.dedup import _tokens, dup_span_mask
    k = 8
    out = dup_span_mask(SF, k=k)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    grams = {}
    for r in docs.itertuples():
        toks = _tokens(r.text)
        grams[int(r.doc_id)] = [" ".join(toks[p:p + k])
                                for p in range(len(toks) - k + 1)]
    cnt = Counter(g for gs in grams.values() for g in gs)
    want = []
    for d in sorted(grams):
        dup_pos = [p for p, g in enumerate(grams[d]) if cnt[g] > 1]
        run = []
        for p in dup_pos:
            if run and p - run[-1] <= k:
                run.append(p)
            else:
                if run:
                    want.append((d, run[0], run[-1] + k - 1, len(run)))
                run = [p]
        if run:
            want.append((d, run[0], run[-1] + k - 1, len(run)))
    got = [(int(r.doc_id), int(r.span_start), int(r.span_end),
            int(r.n_dup_pos)) for r in out.itertuples()]
    assert got == want
    assert len(got) > 0  # non-trivially exercised at sf0.001


def test_daily_unique_users_hll_matches_serial(ray_session):
    """Per-day grouped HLL == serial register simulation (including
    the linear-counting branch), exact counts exact."""
    from erex.ops.sketch import (HLL_M, _ALPHA_DEN, _ALPHA_NUM,
                                 _RHO_EMPTY, daily_unique_users_hll,
                                 hll_register)
    out = daily_unique_users_hll(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "user_id"])
    ev["day"] = ev["ts"].dt.floor("D")
    got = {r.day: (r.n_exact, r.est_distinct, r.err_milli)
           for r in out.itertuples()}
    for day, g in ev.groupby("day"):
        users = g["user_id"].drop_duplicates()
        reg: dict = {}
        for u in users:
            b, r = hll_register(str(int(u)))
            reg[b] = max(reg.get(b, 0), r)
        nz = len(reg)
        total = sum(1 << (_RHO_EMPTY - r) for r in reg.values()) \
            + (HLL_M - nz) * (1 << _RHO_EMPTY)
        est = (_ALPHA_NUM * HLL_M * HLL_M * (1 << _RHO_EMPTY)) \
            // (_ALPHA_DEN * total)
        zeros = HLL_M - nz
        if zeros > 0 and est <= (5 * HLL_M) // 2:
            est = int(np.floor(HLL_M * np.log(HLL_M / zeros) + 0.5))
        err = abs(est - len(users)) * 1000 // max(1, len(users))
        assert got[day] == (len(users), est, err)
    assert len(got) == ev["day"].nunique()


def test_alpha_mix_weights_upsamples_low_resource(ray_session):
    """Weights match the serial alpha rule; the majority lang's share
    shrinks vs its raw frequency and minorities grow."""
    from erex.ops.text import alpha_mix_weights
    out = alpha_mix_weights(SF, alpha_milli=300)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["lang"])
    cnt = docs["lang"].value_counts().sort_index()
    n = cnt.to_numpy(np.int64)
    raw = np.floor(np.power(n / float(n.sum()), 0.3)
                   * 1_000_000 + 0.5).astype(np.int64)
    assert list(out["group"]) == list(cnt.index)
    assert list(out["raw_micro"]) == list(raw)
    assert list(out["weight_milli"]) == list(1000 * raw // raw.sum())
    freq_milli = 1000 * n // n.sum()
    big = int(np.argmax(n))
    assert out["weight_milli"].iloc[big] < freq_milli[big]
    small = int(np.argmin(n))
    assert out["weight_milli"].iloc[small] > freq_milli[small]


def test_mmr_select_properties(ray_session):
    """First pick is the pure-relevance argmax; no repeats; each later
    pick maximizes the integer MMR objective over the remaining pool;
    diversity actually binds (some pick is not the next-by-relevance)."""
    from erex.ops.similarity import (_normalize, ann_cosine_topk,
                                     mmr_select)
    out = mmr_select(SF, k=5, pool=16, lambda_milli=500)
    top = ann_cosine_topk(SF, n_queries=1, k=16)
    assert out.loc[0, "vec_id"] == top.loc[0, "vec_id"]
    assert out["vec_id"].is_unique
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").set_index(
        "vec_id")
    P = _normalize(np.stack(
        emb.loc[top["vec_id"], "embedding"].to_numpy())
        .astype(np.float64))
    sims = np.floor((P @ P.T) * 1_000_000 + 0.5).astype(np.int64)
    pool_ids = top["vec_id"].to_numpy(np.int64)
    rel = top["cos_micro"].to_numpy(np.int64)
    pos = {int(v): i for i, v in enumerate(pool_ids)}
    chosen = [pos[int(v)] for v in out["vec_id"]]
    for t in range(1, len(chosen)):
        sel = chosen[:t]
        scores = {i: 500 * int(rel[i]) - 500 * int(sims[i, sel].max())
                  for i in range(len(pool_ids)) if i not in sel}
        best = min(scores, key=lambda i: (-scores[i], pool_ids[i]))
        assert chosen[t] == best
        assert out.loc[t, "mmr_score"] == scores[best]
    assert list(out["vec_id"]) != list(top["vec_id"].head(5))


def test_span_corruption_stats_matches_serial(ray_session):
    """Deterministic mask == serial position-set arithmetic (masked
    set built explicitly, runs counted as contiguous blocks) —
    including the p=0 run and end-truncation edges."""
    from erex.ops.dedup import _h64
    from erex.ops.text import LOWER_TOKEN_RE, span_corruption_stats
    L, MOD = 3, 20
    out = span_corruption_stats(SF, span_len=L, rate_mod=MOD)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = {int(r.doc_id): (r.n_tokens, r.n_spans, r.n_masked,
                           r.corrupt_milli) for r in out.itertuples()}
    for r in docs.itertuples():
        n = len(LOWER_TOKEN_RE.findall(r.text.lower()))
        if n == 0:
            assert r.doc_id not in got
            continue
        masked = set()
        for p in range(n):
            if _h64(f"{r.doc_id}:{p}") % MOD == 0:
                masked.update(range(p, min(p + L, n)))
        runs = sum(1 for q in masked if q - 1 not in masked)
        assert got[int(r.doc_id)] == (n, runs, len(masked),
                                      1000 * len(masked) // n)


def test_split_by_component_leakage_free(ray_session):
    """Every near-dup component lands wholly in one split; the hash
    rule matches dataset_split's thresholds on the component id."""
    import hashlib

    from erex.ops.dedup import split_by_component
    from erex.ops.text import SPLIT_TRAIN_32, SPLIT_VAL_32
    out = split_by_component(SF)
    assert (out.groupby("component_id")["split"].nunique() == 1).all()
    for r in out.head(50).itertuples():
        h = int(hashlib.md5(str(r.component_id).encode())
                .hexdigest()[:8], 16)
        want = ("train" if h < SPLIT_TRAIN_32 else
                "val" if h < SPLIT_VAL_32 else "test")
        assert r.split == want
    assert set(out["split"]) == {"train", "val", "test"}


def test_hard_negatives_excludes_query_label(ray_session):
    """Every mined negative has a different label than its query, the
    ranking is (cos desc, vec_id), and results agree with serial."""
    from erex.ops.similarity import _normalize, hard_negatives
    out = hard_negatives(SF, n_queries=8, k=5)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values(
        "vec_id")
    ids = emb["vec_id"].to_numpy(np.int64)
    labs = emb["label"].to_numpy(np.int64)
    M = _normalize(np.stack(emb["embedding"].to_numpy())
                   .astype(np.float64))
    for qid in range(8):
        qlab = labs[np.searchsorted(ids, qid)]
        g = out[out["query_id"] == qid]
        assert (g["neg_label"] != qlab).all()
        cm = np.floor((M @ M[np.searchsorted(ids, qid)])
                      * 1_000_000 + 0.5).astype(np.int64)
        mask = (labs != qlab) & (ids != qid)
        c_ids, c_cm = ids[mask], cm[mask]
        want = c_ids[np.lexsort((c_ids, -c_cm))[:5]]
        assert list(g["vec_id"]) == list(want)


def test_knn_label_vote_matches_serial(ray_session):
    """Distributed vote == serial numpy all-pairs with the same
    micro-rounded ranking and smallest-label tie-break."""
    from erex.ops.similarity import _normalize, knn_label_vote
    out = knn_label_vote(SF, k=5)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values(
        "vec_id")
    ids = emb["vec_id"].to_numpy(np.int64)
    labs = emb["label"].to_numpy(np.int64)
    M = _normalize(np.stack(emb["embedding"].to_numpy())
                   .astype(np.float64))
    cm = np.floor((M @ M.T) * 1_000_000 + 0.5).astype(np.int64)
    for i in (0, 7, 123, len(ids) - 1):
        mask = ids != ids[i]
        c_ids, c_cm = ids[mask], cm[i][mask]
        top = c_ids[np.lexsort((c_ids, -c_cm))[:5]]
        nl = labs[np.searchsorted(ids, top)]
        u, n = np.unique(nl, return_counts=True)
        want = u[np.argmax(n)]
        row = out[out["vec_id"] == ids[i]].iloc[0]
        assert row["pred_label"] == want
        assert row["correct"] == int(want == labs[i])
    assert len(out) == len(ids)


def test_fk_integrity_matches_serial(ray_session):
    """Distributed FK audit == serial set arithmetic over the tables,
    including the intact-FK zero-orphan invariant and the nonzero
    unreferenced-orders count."""
    from erex.ops.relational import fk_integrity
    out = fk_integrity(SF)
    got = {r.relationship: (r.n_child, r.n_orphan, r.n_ref_keys,
                            r.n_unref_parent) for r in out.itertuples()}
    for ct, ck, pt, pk in [("lineitem", "l_orderkey", "orders",
                            "o_orderkey"),
                           ("lineitem", "l_partkey", "part",
                            "p_partkey"),
                           ("lineitem", "l_suppkey", "supplier",
                            "s_suppkey"),
                           ("orders", "o_custkey", "customer",
                            "c_custkey")]:
        c = pd.read_parquet(f"{SF}/{ct}.parquet", columns=[ck])[ck]
        p = set(pd.read_parquet(f"{SF}/{pt}.parquet",
                                columns=[pk])[pk])
        ref = set(c) & p
        want = (len(c), int((~c.isin(p)).sum()), len(ref),
                len(p) - len(ref))
        assert got[f"{ct}.{ck}->{pt}.{pk}"] == want
    assert got["lineitem.l_orderkey->orders.o_orderkey"][3] > 0


def test_dedup_report_consistent_with_components(ray_session):
    """Report integers == reductions of the components table."""
    from erex.ops.dedup import dedup_components, dedup_report
    rep = dict(zip(*[dedup_report(SF)[c] for c in ("metric", "value")]))
    comp = dedup_components(SF)
    sizes = comp.groupby("component_id").size()
    assert rep["n_docs"] == len(comp)
    assert rep["n_clusters"] == len(sizes)
    assert rep["n_dup_docs"] == len(comp) - len(sizes)
    assert rep["max_cluster"] == int(sizes.max())
    assert rep["n_multi_clusters"] == int((sizes > 1).sum())
    assert rep["kept_milli"] == 1000 * len(sizes) // len(comp)
    assert rep["n_dup_docs"] > 0  # non-trivially exercised


def test_dsir_weights_matches_serial(ray_session):
    """Distributed hashed-bucket DSIR == serial Counter pass with the
    same md5 buckets and FP op order; target-lang docs rank higher on
    average (the estimator discriminates)."""
    from collections import Counter

    from erex.ops.dedup import _h64
    from erex.ops.text import LOWER_TOKEN_RE, dsir_weights
    B = 1024
    out = dsir_weights(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "text"])
    raw = np.zeros(B, np.int64)
    tgt = np.zeros(B, np.int64)
    toks = {}
    for r in docs.itertuples():
        tf = Counter(LOWER_TOKEN_RE.findall(r.text.lower()))
        toks[int(r.doc_id)] = tf
        for w, c in tf.items():
            bk = _h64(w) % B
            raw[bk] += c
            if r.lang == "en":
                tgt[bk] += c
    a = (tgt + 1) / float(tgt.sum() + B)
    b = (raw + 1) / float(raw.sum() + B)
    s = np.floor(np.log(a / b) * 1_000_000 + 0.5).astype(np.int64)
    got = {int(r.doc_id): (r.n_tokens, r.dsir_micro)
           for r in out.itertuples()}
    for d, tf in toks.items():
        if not tf:
            assert d not in got
            continue
        want = sum(c * int(s[_h64(w) % B]) for w, c in tf.items())
        assert got[d] == (sum(tf.values()), want)
    m = out.merge(docs[["doc_id", "lang"]], on="doc_id")
    per_tok = m["dsir_micro"] / m["n_tokens"]
    en = per_tok[m["lang"] == "en"].mean()
    rest = per_tok[m["lang"] != "en"].mean()
    assert en > rest


def test_logprob_buckets_terciles(ray_session):
    """Buckets respect the disc-percentile thresholds; per-token score
    is the floor division of the proven unigram scores; modes agree."""
    import math

    from erex.ops.text import logprob_buckets, unigram_logprob
    out = logprob_buckets(SF)
    lp = unigram_logprob(SF)
    spt = (lp["surprisal_micro"] // lp["n_tokens"]).to_numpy()
    srt = sorted(spt)
    n = len(srt)
    t1, t2 = srt[math.ceil(n / 3) - 1], srt[math.ceil(2 * n / 3) - 1]
    assert list(out["per_tok_micro"]) == list(spt)
    for r in out.itertuples():
        want = ("head" if r.per_tok_micro <= t1 else
                "middle" if r.per_tok_micro <= t2 else "tail")
        assert r.bucket == want
    assert set(out["bucket"]) == {"head", "middle", "tail"}
    assert out.equals(logprob_buckets(SF, mode="join"))


def test_hybrid_rrf_topk_matches_serial(ray_session):
    """Fusion == serial RRF over the two constituent rankings, and a
    doc in both lists outranks equal single-list contributions."""
    from collections import Counter

    from erex.ops.similarity import ann_cosine_topk, hybrid_rrf_topk
    from erex.ops.text import bm25_topk
    out = hybrid_rrf_topk(SF, k=10, depth=50)
    lex = bm25_topk(SF, k=50)
    sem = ann_cosine_topk(SF, n_queries=1, k=50)
    sc = Counter()
    for r in lex.itertuples():
        sc[int(r.doc_id)] += 1_000_000 // (60 + int(r.rank))
    for r in sem.itertuples():
        sc[int(r.vec_id)] += 1_000_000 // (60 + int(r.rank))
    want = sorted(sc.items(), key=lambda x: (-x[1], x[0]))[:10]
    got = [(int(r.doc_id), int(r.rrf_micro)) for r in out.itertuples()]
    assert got == want
    assert list(out["rank"]) == list(range(1, len(out) + 1))


def test_event_props_stats_matches_serial(ray_session):
    """Batch-partial JSON extraction == serial json.loads pass,
    including null handling for absent/malformed k."""
    import json

    from erex.ops.relational import event_props_stats
    out = event_props_stats(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "props"])
    want = {}
    for r in ev.itertuples():
        n, nk, s = want.get(r.event_type, (0, 0, 0))
        try:
            v = json.loads(r.props).get("k")
        except (ValueError, AttributeError):
            v = None
        if isinstance(v, int):
            want[r.event_type] = (n + 1, nk + 1, s + v)
        else:
            want[r.event_type] = (n + 1, nk, s)
    got = {r.event_type: (r.n_events, r.n_with_k, r.sum_k,
                          r.avg_k_milli) for r in out.itertuples()}
    for et, (n, nk, s) in want.items():
        avg = 1000 * s // nk if nk else 0
        assert got[et] == (n, nk, s, avg)
    assert set(got) == set(want)


def test_dup_span_clean_consistent_with_mask(ray_session):
    """Per-doc masked totals == sum of dup_span_mask span lengths;
    every document appears; kept_milli is the floor millifraction."""
    from erex.ops.dedup import _tokens, dup_span_clean, dup_span_mask
    out = dup_span_clean(SF)
    spans = dup_span_mask(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    want_masked = spans.assign(
        length=spans.span_end - spans.span_start + 1)\
        .groupby("doc_id")["length"].sum()
    for r in out.itertuples():
        assert r.n_masked == int(want_masked.get(r.doc_id, 0))
    tok = {int(r.doc_id): len(_tokens(r.text)) for r in docs.itertuples()}
    for r in out.itertuples():
        assert r.n_tokens == tok[r.doc_id]
        want = 1000 if r.n_tokens == 0 else \
            1000 * (r.n_tokens - r.n_masked) // r.n_tokens
        assert r.kept_milli == want
    assert (out["n_masked"] > 0).any()


def test_q5_matches_duckdb(ray_session):
    """Distributed 6-table Q5 == DuckDB on the same parquet."""
    import duckdb
    from erex.ops.relational import q5_local_supplier_volume
    out = q5_local_supplier_volume(SF)
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "nation",
              "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    ref = con.sql("""
        SELECT n_name,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                   * 1000 + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_milli
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY n_name""").df()
    assert list(out["n_name"]) == list(ref["n_name"])
    assert list(out["revenue_milli"]) == list(ref["revenue_milli"])


def test_q_funnel_matches_serial(ray_session):
    """Sharded funnel scan == serial per-user first-touch walk."""
    from erex.ops.relational import q_funnel
    steps = ("view", "click", "purchase")
    out = q_funnel(SF, steps=steps)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type", "ts"])
    counts = []
    prev = None
    for s in steps:
        sub = ev[ev["event_type"] == s]
        if prev is not None:
            p = sub["user_id"].map(prev)
            sub = sub[p.notna() & (sub["ts"] > p)]
        prev = sub.groupby("user_id")["ts"].min()
        counts.append(len(prev))
    assert list(out["step"]) == [1, 2, 3]
    assert list(out["step_name"]) == list(steps)
    assert list(out["n_users"]) == counts
    # funnel counts are monotone non-increasing
    assert counts[0] >= counts[1] >= counts[2]


def test_entity_resolution_matches_serial(ray_session):
    """Blocked distributed ER == serial union-find with the same
    blocking rule, over the sf corpus' canonical nodes."""
    import ray.data as rd

    from erex.canonical import (_char3, _er_norm, canonical_nodes,
                                entity_resolution)
    from erex.corpus import corpus_parquet
    from erex.pipeline import run_extraction_auto
    path = corpus_parquet(120, seed=42)
    merged = run_extraction_auto(path)
    nodes_df = canonical_nodes(merged).to_pandas()
    out = entity_resolution(rd.from_pandas(nodes_df))
    # serial oracle: same blocks, all-pairs jaccard, union-find
    nodes_df["norm"] = [_er_norm(s) for s in nodes_df["surface"]]
    nodes_df["block"] = nodes_df["node_kind"] + "|" \
        + nodes_df["norm"].str[:2]
    want = {}
    for _b, g in nodes_df.groupby("block"):
        keys = g["node_key"].tolist()
        sets = [_char3(n) for n in g["norm"]]
        parent = list(range(len(keys)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                a, b = sets[i], sets[j]
                if a and b and 1000 * len(a & b) // len(a | b) >= 600:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        ent = {}
        for i in range(len(keys)):
            r = find(i)
            ent.setdefault(r, min(keys[k] for k in range(len(keys))
                                  if find(k) == r))
        for i in range(len(keys)):
            want[keys[i]] = ent[find(i)]
    got = dict(zip(out["node_key"], out["entity_id"]))
    assert got == want
    # every entity id is a member of its own cluster
    assert set(out["entity_id"]) <= set(out["node_key"])
    # linking is non-trivial on this corpus (some cluster > 1)
    assert len(set(out["entity_id"])) < len(out)


def test_dataset_split_deterministic_fences(ray_session):
    """Split assignment matches a serial hash recount; proportions
    are near 80/10/10; stable across runs."""
    from erex.ops.text import (SPLIT_TRAIN_32, SPLIT_VAL_32,
                               dataset_split)
    out = dataset_split(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    h = docs["doc_id"].map(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16))
    docs["split"] = np.where(h < SPLIT_TRAIN_32, "train",
                             np.where(h < SPLIT_VAL_32, "val", "test"))
    ref = docs.groupby(["lang", "split"]).size()
    got = {(r.lang, r.split): int(r.n_docs) for r in out.itertuples()}
    assert got == {k: int(v) for k, v in ref.items()}
    tr = sum(v for (_l, s), v in got.items() if s == "train")
    assert abs(tr / len(docs) - 0.8) < 0.06


def test_dq_checks_clean_and_dirty(ray_session):
    """All expectations pass on the generated corpus; each counts the
    full row count."""
    from erex.ops.text import dq_checks
    out = dq_checks(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert set(out["check_name"]) == {
        "doc_id_not_null", "doc_id_non_negative", "text_non_empty",
        "lang_known", "n_chars_matches_text"}
    assert (out["n_rows"] == len(docs)).all()
    assert (out["n_fail"] == 0).all()


def test_bloom_contamination_superset_of_exact(ray_session):
    """Bloom hits are a superset of exact n-gram contamination (no
    false negatives), and the exact hit count is a lower bound."""
    from erex.ops.sketch import bloom_contamination
    from erex.ops.text import ngram_contamination
    bl = bloom_contamination(SF)
    ex = ngram_contamination(SF)
    m = ex.merge(bl, on="doc_id")
    assert (m.loc[m["contaminated"], "flagged"]).all()
    assert (m["n_bloom_hits"] >= m["n_hits"]).all()


def test_compact_parquet_lossless(ray_session, tmp_path):
    """Compaction to N blocks preserves every row (checksum equality
    vs the source) and actually bounds the file count."""
    from erex.ops.io import compact_parquet
    out = compact_parquet(SF, out_dir=str(tmp_path / "c"),
                          target_blocks=3)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "lang"])
    docs["cs"] = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                  for t in docs["text"]]
    ref = docs.groupby("lang").agg(n_docs=("cs", "size"),
                                   checksum=("cs", "sum"))
    got = {r.lang: (int(r.n_docs), int(r.checksum))
           for r in out.itertuples()}
    assert got == {lg: (int(r.n_docs), int(r.checksum))
                   for lg, r in ref.iterrows()}
    assert (out["n_files"] <= 3).all()


def test_token_budget_select_matches_serial(ray_session):
    """Selection equals the serial quality-ordered greedy prefix and is
    maximal: the next doc in quality order would bust the budget."""
    from erex.ops.text import TOKEN_RE, quality_milli, token_budget_select
    out = token_budget_select(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    docs["n_tokens"] = [len(TOKEN_RE.findall(t)) for t in docs["text"]]
    docs["quality_milli"] = [quality_milli(t) for t in docs["text"]]
    docs = docs.sort_values(["quality_milli", "doc_id"],
                            ascending=[False, True]).reset_index(drop=True)
    docs["cum_tokens"] = docs["n_tokens"].cumsum()
    budget = int(docs["n_tokens"].sum()) * 250 // 1000
    ref = docs[docs["cum_tokens"] <= budget]\
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == list(ref["doc_id"])
    assert list(out["cum_tokens"]) == list(ref["cum_tokens"])
    assert list(out["quality_milli"]) == list(ref["quality_milli"])
    # maximal prefix: adding the first excluded doc would exceed budget
    excluded = docs[docs["cum_tokens"] > budget]
    if len(excluded):
        assert int(excluded["cum_tokens"].iloc[0]) > budget
    assert int(out["n_tokens"].sum()) <= budget


def test_source_cap_sample_matches_serial(ray_session):
    """Per-source quota equals the serial md5-ordered head(cap); every
    source is capped and ranks are 1..n within each source."""
    from erex.ops.text import source_cap_sample
    cap = 3
    out = source_cap_sample(SF, cap=cap)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])
    docs["hash32"] = docs["doc_id"].map(
        lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16))
    ref = docs.sort_values(["source", "hash32", "doc_id"])\
        .groupby("source", sort=False).head(cap)
    ref = ref.sort_values(["source", "hash32", "doc_id"])
    ref["rank"] = ref.groupby("source", sort=False).cumcount() + 1
    ref = ref.sort_values(["source", "rank"]).reset_index(drop=True)
    assert list(out["doc_id"]) == list(ref["doc_id"])
    assert list(out["rank"]) == list(ref["rank"])
    assert list(out["hash32"]) == list(ref["hash32"])
    assert out.groupby("source")["rank"].max().le(cap).all()


def test_embedding_outliers_matches_serial(ray_session):
    """Integer kilo-quantized centroid distance and mean-rule flag
    equal a numpy recount; scores are block-layout invariant by
    construction (pure integer sums)."""
    from erex.ops.similarity import embedding_outliers
    out = embedding_outliers(SF)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(1000.0 * X + 0.5).astype(np.int64)
    c = np.floor(q.sum(axis=0) / len(q)).astype(np.int64)
    d2 = ((q - c) ** 2).sum(axis=1)
    ref = pd.DataFrame({"vec_id": emb["vec_id"], "dist2_kilo": d2})\
        .sort_values("vec_id").reset_index(drop=True)
    mean_d2 = int(d2.sum()) // len(q)
    assert list(out["vec_id"]) == list(ref["vec_id"])
    assert list(out["dist2_kilo"]) == list(ref["dist2_kilo"])
    assert list(out["is_outlier"]) == list(ref["dist2_kilo"] > mean_d2)
    assert out["is_outlier"].any() and not out["is_outlier"].all()


def test_hard_negatives_k_beyond_partial_cut(ray_session):
    """k > 64 must be exact (round-4 verdict What's-wrong #2 / ADVICE:
    the per-batch candidate cut is max(64, k), not a silent 64):
    compare against a full brute-force mining pass."""
    from erex.ops.similarity import _normalize, hard_negatives
    k = 100
    out = hard_negatives(SF, n_queries=4, k=k)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    X = _normalize(np.stack(emb["embedding"].to_numpy())
                   .astype(np.float64))
    vid = emb["vec_id"].to_numpy(np.int64)
    lab = emb["label"].to_numpy(np.int64)
    for qi in range(4):
        q = int(vid[qi])
        cm = np.floor((X @ X[qi]) * 1_000_000 + 0.5).astype(np.int64)
        cand = pd.DataFrame({"vec_id": vid, "neg_label": lab,
                             "cos_micro": cm})
        cand = cand[(cand["neg_label"] != lab[qi]) & (cand["vec_id"] != q)]
        cand = cand.sort_values(["cos_micro", "vec_id"],
                                ascending=[False, True]).head(k)
        got = out[out["query_id"] == q]
        assert len(got) == len(cand) > 64
        assert list(got["vec_id"]) == list(cand["vec_id"])
        assert list(got["cos_micro"]) == list(cand["cos_micro"])


def test_event_props_policy_matches_oracle(ray_session, tmp_path):
    """Engine and DuckDB oracle agree on NON-integer JSON payloads:
    booleans, floats, strings and beyond-int64 ints all null out
    (round-5 ADVICE #2)."""
    import duckdb
    import importlib.util
    from erex.ops.relational import event_props_stats
    props = ['{"k": 5}', '{"k": true}', '{"k": 2.5}', '{"k": "7"}',
             '{}', '{"k": 99999999999999999999999}', None,
             'not json', '{"k": -3}', '{"k": 18446744073709551615}']
    df = pd.DataFrame({
        "event_type": ["a", "a", "a", "b", "b", "b", "b", "a", "b",
                       "a"],
        "props": props})
    df.to_parquet(tmp_path / "events.parquet", index=False)
    eng = event_props_stats(str(tmp_path))
    spec = importlib.util.spec_from_file_location(
        "entry_eps", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    ora = con.execute(m.oracle_sql()["event_props_stats"]).df()
    assert list(eng["event_type"]) == list(ora["event_type"])
    for c in ("n_events", "n_with_k", "sum_k", "avg_k_milli"):
        assert list(eng[c]) == list(ora[c].astype("int64")), c


@pytest.mark.parametrize("op", ["token_count", "quality_score",
                                "dup_span_mask", "dup_span_clean",
                                "lang_id"])
def test_streaming_sink_matches_dataframe(ray_session, tmp_path, op):
    """The as_dataset sink path (write_parquet, never a driver frame)
    yields exactly the DataFrame query's rows (round-4 verdict next
    #8)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry_sink", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out_dir = str(tmp_path / op)
    m.streaming_sinks()[op](SF, out_dir)
    got = pd.read_parquet(out_dir)
    want = m.queries()[op](SF)
    sort_cols = [c for c in ("doc_id", "span_start") if c in want.columns]
    got = got[list(want.columns)].sort_values(sort_cols)\
        .reset_index(drop=True)
    want = want.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_categorical=False)


def test_doc_chunk_stats_matches_serial(ray_session):
    from erex.ops.text import TOKEN_RE, doc_chunk_stats
    chunk, overlap = 32, 8
    stride = chunk - overlap
    out = doc_chunk_stats(SF, chunk=chunk, overlap=overlap)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    for r in docs.sample(50, random_state=0).itertuples():
        n = len(TOKEN_RE.findall(r.text))
        row = out[out["doc_id"] == r.doc_id].iloc[0]
        assert row["n_tokens"] == n
        if n == 0:
            assert row["n_chunks"] == 0
        else:
            # every token covered, windows overlap by `overlap`
            nch = int(row["n_chunks"])
            starts = [i * stride for i in range(nch)]
            assert starts[-1] < n and (nch == 1 or
                                       starts[-1] + chunk >= n)
            assert row["last_chunk_tokens"] == n - starts[-1]


def test_lang_confusion_sums_to_corpus(ray_session):
    from erex.ops.text import lang_confusion, lang_id
    conf = lang_confusion(SF)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    assert conf["n"].sum() == len(docs)
    # the confusion table aggregates exactly the lang_id predictions
    pred = lang_id(SF).merge(docs, on="doc_id")
    want = pred.groupby(["lang", "lang_pred"]).size()
    for r in conf.itertuples():
        assert want[(r.lang, r.lang_pred)] == r.n


def test_token_entropy_matches_serial(ray_session):
    import math
    from collections import Counter
    from erex.ops.text import LOWER_TOKEN_RE, token_entropy
    out = token_entropy(SF).set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    for r in docs.sample(50, random_state=1).itertuples():
        c = Counter(LOWER_TOKEN_RE.findall(r.text.lower()))
        n = sum(c.values())
        if n == 0:
            assert r.doc_id not in out.index
            continue
        ent = sum(v * math.floor(math.log(n / v) * 1_000_000 + 0.5)
                  for v in c.values())
        assert out.loc[r.doc_id, "n_tokens"] == n
        assert out.loc[r.doc_id, "ent_sum_micro"] == ent
        # single-type docs have zero entropy
        if len(c) == 1:
            assert ent == 0


def test_ops_invariant_under_shard_count(ray_session, monkeypatch):
    """Round-5 shard parameterization: every shard-then-local reduction
    must give identical output at any shard count (same key -> same
    shard is the only requirement)."""
    import erex.ops.dedup as dd
    import erex.ops.graph as gg
    import erex.ops.relational as rr
    base = [dd.dup_span_mask(SF), dd.minhash_lsh_pairs(SF),
            dd.dup_shingle_fraction(SF), gg.copurchase_degree(SF),
            rr.q_sessionize(SF), rr.fk_integrity(SF)]
    for mod in (dd, gg, rr):
        monkeypatch.setattr(mod, "default_shard_count",
                            lambda est_rows=None, **kw: 8, raising=False)
    monkeypatch.setattr(dd, "_doc_shards", lambda sf, fanout=1: 8)
    monkeypatch.setattr(gg, "_shards", lambda sf: 8)
    monkeypatch.setattr(rr, "_shards", lambda sf, table: 8)
    redo = [dd.dup_span_mask(SF), dd.minhash_lsh_pairs(SF),
            dd.dup_shingle_fraction(SF), gg.copurchase_degree(SF),
            rr.q_sessionize(SF), rr.fk_integrity(SF)]
    for b, r in zip(base, redo):
        assert r.equals(b)


def test_q6_q10_q14_match_duckdb(ray_session):
    """The round-5 TPC-H additions (Q6 scan-filter-sum, Q10 returned
    items, Q14 promo share) == their registered DuckDB oracles on the
    same parquet — engine and oracle loaded from __ray_entry__ so the
    test pins exactly what the driver compares."""
    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "re_entry_t", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    q, o = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "part", "nation",
              "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name in ("q6_revenue_forecast", "q10_returned_items",
                 "q14_promo_revenue"):
        out = q[name](SF)
        ref = con.sql(o[name]).df()
        assert list(out.columns) == list(ref.columns), name
        assert len(out) == len(ref), name
        for c in out.columns:
            assert list(out[c]) == list(ref[c]), (name, c)
    # Q6/Q14 must not be vacuous at sf0.001
    assert int(q["q6_revenue_forecast"](SF)["revenue_milli"][0]) > 0
    r14 = q["q14_promo_revenue"](SF)
    assert int(r14["total_rev_milli"][0]) > 0


def test_gopher_quality_flags(ray_session):
    """Gopher gate == its registered DuckDB oracle; flags must vary
    (a gate that passes or fails everything is vacuous)."""
    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "re_entry_g", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = m.queries()["gopher_quality_flags"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    ref = con.sql(m.oracle_sql()["gopher_quality_flags"]).df()
    assert list(out.columns) == list(ref.columns)
    for c in out.columns:
        assert list(out[c]) == list(ref[c]), c
    assert 0 < out["keep"].sum() < len(out)
    assert 0 < out["flag_word_count"].sum() < len(out)


def test_source_quality_report(ray_session):
    """Per-source report card == its registered DuckDB oracle."""
    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "re_entry_s", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = m.queries()["source_quality_report"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    ref = con.sql(m.oracle_sql()["source_quality_report"]).df()
    assert list(out.columns) == list(ref.columns)
    for c in out.columns:
        assert list(out[c]) == list(ref[c]), c
    assert len(out) > 1
    assert (out["n_docs"] > 0).all()


def test_ann_recall_audit(ray_session):
    """LSH recall@k audit == its composed DuckDB oracle; recall must
    be in (0, 1000] and not uniformly 1000 OR the LSH would be
    indistinguishable from exact here."""
    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "re_entry_a", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = m.queries()["ann_recall_audit"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{SF}/embeddings.parquet'")
    ref = con.sql(m.oracle_sql()["ann_recall_audit"]).df()
    assert list(out.columns) == list(ref.columns)
    for c in out.columns:
        assert list(out[c]) == list(ref[c]), c
    assert len(out) == 8
    assert (out["recall_milli"] > 0).all()


def test_ivf_recall_audit(ray_session):
    """IVF recall@k audit == its composed DuckDB oracle."""
    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "re_entry_i", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = m.queries()["ivf_recall_audit"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{SF}/embeddings.parquet'")
    ref = con.sql(m.oracle_sql()["ivf_recall_audit"]).df()
    assert list(out.columns) == list(ref.columns)
    for c in out.columns:
        assert list(out[c]) == list(ref[c]), c
    assert (out["recall_milli"] > 0).all()


def test_neardup_recall_audit(ray_session):
    """LSH pair-recall audit == its composed DuckDB oracle; precision
    is 1000 by construction (candidates are exact-verified)."""
    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "re_entry_n", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = m.queries()["neardup_recall_audit"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    ref = con.sql(m.oracle_sql()["neardup_recall_audit"]).df()
    assert list(out.columns) == list(ref.columns)
    for c in out.columns:
        assert list(out[c]) == list(ref[c]), c
    assert int(out["precision_milli"][0]) == 1000
    assert int(out["n_exact"][0]) > 0


def test_round5_late_ops_invariant_under_block_size(ray_session):
    """The late-round-5 operators (Q6/Q10/Q14 partial sums and joins,
    the Gopher gate, the per-source report) must not depend on Ray's
    block structure."""
    from ray.data import DataContext
    from erex.ops.relational import (q6_revenue_forecast,
                                     q10_returned_items,
                                     q14_promo_revenue)
    from erex.ops.text import gopher_quality_flags, source_quality_report
    fns = [q6_revenue_forecast, q10_returned_items, q14_promo_revenue,
           gopher_quality_flags, source_quality_report]
    base = [f(SF) for f in fns]
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024
        redo = [f(SF) for f in fns]
        for b, r in zip(base, redo):
            assert r.equals(b)
    finally:
        ctx.target_max_block_size = old


def test_simhash_recall_audit(ray_session):
    """SimHash recall/precision audit == its composed DuckDB oracle."""
    import duckdb
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "re_entry_sh", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    out = m.queries()["simhash_recall_audit"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    ref = con.sql(m.oracle_sql()["simhash_recall_audit"]).df()
    assert list(out.columns) == list(ref.columns)
    for c in out.columns:
        assert list(out[c]) == list(ref[c]), c
    assert int(out["n_exact"][0]) > 0
