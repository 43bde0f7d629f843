"""Ray pipeline vs single-process oracle (the correctness gate)."""

import pandas as pd
import pytest

from erex.corpus import corpus_parquet


@pytest.fixture(scope="module")
def corpus(ray_session):
    return corpus_parquet(30, seed=77)


def test_pipeline_matches_oracle_exactly(corpus):
    from erex.oracle import oracle_edges, triple_prf
    from erex.pipeline import run_extraction

    df = run_extraction(corpus).to_pandas()
    sys_edges = df[df["kind"] == "edge"]
    ref = oracle_edges(corpus)
    prf = triple_prf(sys_edges, ref)
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0, prf
    # stages and consistency flags match too, not just triples.
    # dictionary-encoded Arrow columns arrive as pandas categoricals —
    # cast BEFORE sorting (categorical sort order is code order)
    sys_edges = sys_edges.copy()
    for c in sys_edges.columns:
        if str(sys_edges[c].dtype) == "category":
            sys_edges[c] = sys_edges[c].astype(str)
    key = ["doc_sha", "subj", "pred", "obj"]
    a = sys_edges.sort_values(key)[key + ["pair_class", "stage",
                                          "consistent"]]
    b = ref.sort_values(key)[key + ["pair_class", "stage", "consistent"]]
    a = a.astype({"consistent": bool}).reset_index(drop=True)
    b = b.astype({"consistent": bool}).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_sha256_invariant(corpus):
    """Per-row content sha256 carried through the pipeline (input_hint)."""
    import hashlib
    import pyarrow.parquet as pq
    from erex.pipeline import run_extraction

    t = pq.read_table(corpus, columns=["content"])
    want = {hashlib.sha256(c.encode()).hexdigest()
            for c in t.column("content").to_pylist()}
    df = run_extraction(corpus).to_pandas()
    assert set(df["doc_sha"]) == want


def test_canonical_nodes_match_oracle(corpus):
    from erex.canonical import canonical_nodes
    from erex.oracle import oracle_nodes
    from erex.pipeline import run_extraction

    nodes = canonical_nodes(run_extraction(corpus)).to_pandas()
    ref = oracle_nodes(corpus)
    a = nodes.sort_values("node_key").reset_index(drop=True)
    b = ref.sort_values("node_key").reset_index(drop=True)
    assert len(a) == len(b)
    assert list(a["node_key"]) == list(b["node_key"])
    assert list(a["mentions"].astype(int)) == list(b["mentions"])
    assert int(a["mentions"].sum()) == int(b["mentions"].sum())


def test_resumable_run_skips_done_fragments(corpus, tmp_path):
    from erex.pipeline import run_flagship_resumable

    out = tmp_path / "edges"
    m1 = run_flagship_resumable(corpus, str(out))
    assert m1["fragments_total"] == 1
    assert m1["fragments_skipped"] == 0
    m2 = run_flagship_resumable(corpus, str(out))
    assert m2["fragments_skipped"] == 1  # second run is a no-op

    # crash-recovery: stale parquet without a manifest marker (crash
    # between write and marker) must be REPLACED on rerun, not appended
    import pandas as pd
    frag_dirs = [d for d in out.iterdir() if d.name.startswith("frag=")]
    assert len(frag_dirs) == 1
    n_before = len(pd.read_parquet(frag_dirs[0]))
    marker = next((out / "_manifest").glob("*.json"))
    marker.unlink()                      # simulate lost marker
    m3 = run_flagship_resumable(corpus, str(out))
    assert m3["fragments_skipped"] == 0  # reprocessed
    assert len(pd.read_parquet(frag_dirs[0])) == n_before  # no dupes


def test_closure_consistency_of_output(corpus):
    """Property: the consistent edges of each document re-close with no
    violations (closure(closure(x)) == closure(x))."""
    from erex.pipeline import run_extraction
    from erex.timegraph import closure_filter

    df = run_extraction(corpus).to_pandas()
    edges = df[(df["kind"] == "edge") & df["consistent"]
               & (df["pair_class"] != "causal")]
    for sha, g in edges.groupby("doc_sha"):
        links = list(zip(g["subj"], g["obj"], g["pred"]))
        final, violated = closure_filter(links)
        assert not violated, (sha, violated[:3])


def test_reference_example_docs_through_ray(ray_session, tmp_path):
    """The reference's own shipped example documents run through the
    full Ray pipeline and match the oracle exactly."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from erex.oracle import oracle_edges, triple_prf
    from erex.pipeline import run_extraction

    paths = ["/root/reference/data/example_TXP/wsj_1014.tml.txp",
             "/root/reference/data/example_TXP/bbc_20130322_721.tml.txp"]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return
    contents = [open(p).read() for p in paths]
    t = pa.table({"repo": ["ref"] * len(paths),
                  "path": [os.path.basename(p) for p in paths],
                  "commit": ["c"] * len(paths),
                  "lang": ["en"] * len(paths),
                  "content": contents})
    corpus = str(tmp_path / "ref.parquet")
    pq.write_table(t, corpus)
    df = run_extraction(corpus).to_pandas()
    edges = df[df["kind"] == "edge"]
    assert len(edges) > 300
    prf = triple_prf(edges, oracle_edges(corpus))
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0
    # the closure kept a consistent majority
    assert edges["consistent"].astype(bool).mean() > 0.5


def test_actor_pool_scorer_mode(corpus):
    """scorer_mode='actors' (classic actor pool) matches task mode."""
    from erex.pipeline import run_extraction
    key = ["doc_sha", "subj", "pred", "obj"]

    def norm(df):
        df = df[df["kind"] == "edge"].copy()
        for c in key:
            df[c] = df[c].astype(str)
        return df.sort_values(key)[key].reset_index(drop=True)

    a = norm(run_extraction(corpus).to_pandas())
    b = norm(run_extraction(corpus, scorer_mode="actors",
                            scorer_concurrency=2).to_pandas())
    assert len(a) > 0 and a.equals(b)


def test_actor_pool_scorer_dense_config(corpus):
    """Actors mode must honor config.dense through
    fn_constructor_kwargs: dense task-mode output == dense actors-mode
    output, and both differ from the standard heads."""
    from erex.extract import PipelineConfig
    from erex.pipeline import run_extraction
    key = ["doc_sha", "subj", "pred", "obj"]

    def norm(df):
        df = df[(df["kind"] == "edge") & (df["stage"] == "classifier")]
        df = df.copy()
        for c in key:
            df[c] = df[c].astype(str)
        return df.sort_values(key)[key].reset_index(drop=True)

    cfg = PipelineConfig(dense=True)
    a = norm(run_extraction(corpus, cfg).to_pandas())
    b = norm(run_extraction(corpus, cfg, scorer_mode="actors",
                            scorer_concurrency=2).to_pandas())
    assert len(a) > 0 and a.equals(b)
    std = norm(run_extraction(corpus).to_pandas())
    # dense heads use the 6-label TimeBank-Dense vocabulary => the
    # classifier predictions cannot all coincide with the standard heads
    assert not a.equals(std)


def test_fused_merge_guard_detects_split_document():
    """A document split across two batches must raise loudly in the
    fused merge (never be merged as two half-documents); the regroup
    path handles the same rows correctly."""
    import pytest as _pytest
    from erex.corpus import generate_txp
    from erex.extract import DEFAULT_CONFIG
    from erex.pipeline import extract_pairs_batch, merge_batch, merge_shard
    import pyarrow as _pa

    batch = _pa.table({"content": [generate_txp(3)],
                       "path": ["doc_3.txp"]})
    staged = extract_pairs_batch(batch, DEFAULT_CONFIG)
    assert staged.num_rows > 4
    half = staged.slice(0, staged.num_rows // 2)
    with _pytest.raises(RuntimeError, match="split document"):
        merge_batch(half, DEFAULT_CONFIG)
    # whole batch passes the guard and merges
    merged = merge_batch(staged, DEFAULT_CONFIG)
    assert merged.num_rows > 0
    # regroup-style merge of the same rows gives identical output
    assert merge_shard(staged, DEFAULT_CONFIG).num_rows == merged.num_rows


def test_run_extraction_auto_falls_back_on_forced_split(corpus):
    """Force an execution plan that re-chunks between the fused stages
    (_inject_rechunk splits documents across batch boundaries): the
    plain fused run must trip the guard, and run_extraction_auto must
    recover through the regroup shuffle with EXACT output and no user
    intervention."""
    from erex.pipeline import run_extraction, run_extraction_auto

    def norm(df):
        df = df.drop(columns=[c for c in ("feats",) if c in df.columns])
        for c in df.columns:
            if str(df[c].dtype) in ("category", "object"):
                # null handling differs between the fused and regroup
                # encodings (None vs NaN) — normalize for the compare
                df[c] = df[c].astype(object).where(df[c].notna(), "")\
                    .astype(str)
        return df.sort_values(list(df.columns))\
            .reset_index(drop=True)

    want = norm(run_extraction(corpus).to_pandas())
    # the injected rechunk provably splits documents (guard trips)...
    with pytest.raises(Exception, match="split document"):
        run_extraction(corpus, _inject_rechunk=7).to_pandas()
    # ...and the auto wrapper recovers with identical output
    got = norm(run_extraction_auto(corpus, _inject_rechunk=7).to_pandas())
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_decode_pylist_matches_to_pylist():
    """_decode_pylist (merge hot path) must be value-identical to
    to_pylist across every shape it dispatches on: short columns
    (direct path), long low-cardinality strings (dictionary path),
    null-bearing columns (sentinel slot), high-cardinality strings
    (fallback), and non-string types (direct path)."""
    import pyarrow as _pa
    from erex.pipeline import _decode_pylist

    def chunked(values, typ):
        a = _pa.chunked_array([values[: len(values) // 2],
                               values[len(values) // 2:]], type=typ)
        return a

    short = chunked(["a", None, "b"] * 10, _pa.string())
    low_card = chunked((["x", "y", None, "z"] * 1024), _pa.string())
    # high cardinality: distinct value per row -> fallback branch
    high_card = chunked([f"v{i}" for i in range(4096)], _pa.string())
    ints = chunked(list(range(4096)), _pa.int64())
    all_null = chunked([None] * 4096, _pa.string())
    for col in (short, low_card, high_card, ints, all_null):
        assert _decode_pylist(col) == col.to_pylist()


def test_merge_invariant_under_doc_aligned_splits():
    """The fused merge assumes only that blocks are document-aligned:
    ANY partition of the scored rows along document boundaries must
    produce exactly the rows of the whole-batch merge (order-free).
    This is the positive counterpart of the split-document guard test."""
    import pyarrow as _pa
    from erex.corpus import generate_txp
    from erex.extract import DEFAULT_CONFIG
    from erex.pipeline import (extract_pairs_batch, merge_batch,
                               _score_batch_task)

    batch = _pa.table({"content": [generate_txp(s) for s in (3, 5, 8, 13)],
                       "path": [f"doc_{s}.txp" for s in (3, 5, 8, 13)]})
    scored = _score_batch_task(extract_pairs_batch(batch, DEFAULT_CONFIG))
    whole = merge_batch(scored, DEFAULT_CONFIG).to_pandas()

    shas = scored.column("doc_sha").to_pylist()
    bounds = [0] + [i for i in range(1, len(shas)) if shas[i] != shas[i - 1]]
    # several distinct doc-aligned chunkings: per-doc, pairs, 1+rest
    for split_at in ([1, 2, 3], [2], [1], [3]):
        cuts = [bounds[i] for i in split_at if i < len(bounds)]
        parts, prev = [], 0
        for c in cuts + [scored.num_rows]:
            parts.append(scored.slice(prev, c - prev))
            prev = c
        got = _pa.concat_tables(
            [merge_batch(p, DEFAULT_CONFIG) for p in parts]).to_pandas()
        key = sorted(whole.columns)
        a = whole[key].sort_values(key).reset_index(drop=True)
        b = got[key].sort_values(key).reset_index(drop=True)
        assert a.equals(b), f"split {split_at} diverged"


def test_read_lineage_backfills_legacy_manifests(corpus, tmp_path):
    """Manifests written before the rows field are backfilled from the
    partition's parquet footers (old checkpoints are a supported
    state)."""
    import json
    from erex.pipeline import read_lineage, run_flagship_resumable
    out = tmp_path / "edges"
    run_flagship_resumable(corpus, str(out))
    recs = read_lineage(str(out))
    assert all(r["rows"] > 0 for r in recs)
    # strip the rows field as a pre-change manifest would have it
    man = next((out / "_manifest").glob("*.json"))
    legacy = json.loads(man.read_text())
    legacy.pop("rows")
    man.write_text(json.dumps(legacy))
    recs2 = read_lineage(str(out))
    assert recs2 == recs
