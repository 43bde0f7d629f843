"""Long-document skew: a giant document mixed with small ones."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from erex.corpus import generate_txp


@pytest.fixture(scope="module")
def skewed_corpus(ray_session, tmp_path_factory):
    docs = [generate_txp(800 + i) for i in range(10)]
    giant = generate_txp(12999, n_sentences=120)   # ~10x normal size
    docs.append(giant)
    d = tmp_path_factory.mktemp("skew")
    t = pa.table({
        "repo": ["r"] * len(docs),
        "path": ["docs/d%02d.txp" % i for i in range(len(docs))],
        "commit": ["c"] * len(docs),
        "lang": ["en"] * len(docs),
        "content": docs,
    })
    path = str(d / "corpus.parquet")
    pq.write_table(t, path)
    return path, hashlib.sha256(giant.encode()).hexdigest()


def test_giant_doc_processes_and_matches_regroup(skewed_corpus):
    from erex.pipeline import run_extraction
    path, giant_sha = skewed_corpus
    key = ["doc_sha", "subj", "pred", "obj", "pair_class", "stage"]

    def norm(df):
        df = df[df["kind"] == "edge"].copy()
        for c in df.columns:
            if str(df[c].dtype) == "category":
                df[c] = df[c].astype(str)
        return df.sort_values(key).reset_index(drop=True)

    a = norm(run_extraction(path).to_pandas())
    b = norm(run_extraction(path, regroup=True).to_pandas())
    assert len(a) == len(b) and len(a) > 0
    assert a[key].equals(b[key])
    # the giant document dominates the edge count but completed fine
    giant_edges = (a["doc_sha"] == giant_sha).sum()
    assert giant_edges > 0.5 * len(a)


def test_giant_doc_matches_oracle(skewed_corpus):
    from erex.oracle import oracle_edges, triple_prf
    from erex.pipeline import run_extraction
    path, _ = skewed_corpus
    df = run_extraction(path).to_pandas()
    prf = triple_prf(df[df["kind"] == "edge"], oracle_edges(path))
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0


def test_salted_path_matches_default(skewed_corpus):
    """run_extraction_salted (explicit pair-block salting + shuffle
    repartition + regrouped merge) produces exactly the default
    pipeline's edges; the giant document actually got salted."""
    import pyarrow.dataset as pds
    from erex.pipeline import run_extraction, run_extraction_salted
    path, giant_sha = skewed_corpus
    key = ["doc_sha", "subj", "pred", "obj", "pair_class", "stage"]

    def norm(df):
        df = df[df["kind"] == "edge"].copy()
        for c in df.columns:
            if str(df[c].dtype) == "category":
                df[c] = df[c].astype(str)
        return df.sort_values(key).reset_index(drop=True)

    a = norm(run_extraction(path).to_pandas())
    # threshold low enough that the giant doc splits into many blocks
    b = norm(run_extraction_salted(path, salt_threshold=50).to_pandas())
    assert len(a) == len(b) > 0
    assert a[key].equals(b[key])
    assert list(a["consistent"].astype(bool)) == \
        list(b["consistent"].astype(bool))


def test_salted_extreme_threshold_matches_default(ray_session):
    """Boundary: salt_threshold=1 splits EVERY multi-pair document into
    one block per candidate pair — the most hostile topology (causal
    pairs and closure spread across maximal block count) — and the
    output must still be identical to the unsalted pipeline."""
    from erex.corpus import corpus_parquet
    from erex.pipeline import run_extraction, run_extraction_salted
    corpus = corpus_parquet(12, seed=77)
    key = ["doc_sha", "subj", "pred", "obj", "pair_class", "stage"]

    def norm(df):
        df = df[df["kind"] == "edge"].copy()
        for c in df.columns:
            if str(df[c].dtype) == "category":
                df[c] = df[c].astype(str)
        return df.sort_values(key).reset_index(drop=True)

    a = norm(run_extraction(corpus).to_pandas())
    b = norm(run_extraction_salted(corpus, salt_threshold=1).to_pandas())
    assert len(a) == len(b) > 0
    assert a[key].equals(b[key])
    assert list(a["consistent"].astype(bool)) == \
        list(b["consistent"].astype(bool))
    # the fixture is only meaningful if closure-bearing causal pairs
    # actually crossed block boundaries
    assert (a["pair_class"].astype(str) == "causal").any()


def test_fused_merge_rejects_salted_rows():
    """The guard's structural negative path: salted stage-1 rows are
    stamped doc_rows=-1 and the fused merge must refuse them OUTRIGHT —
    even a lucky batch containing every block of a salted document is
    rejected, because salt rows carry no per-doc completeness stamp."""
    import pyarrow as _pa
    import pytest as _pytest
    from erex.corpus import generate_txp
    from erex.extract import DEFAULT_CONFIG
    from erex.pipeline import (LinearScorer, expand_salt_batch,
                               extract_salted_batch, merge_batch,
                               merge_shard)

    batch = _pa.table({"content": [generate_txp(5)],
                       "path": ["doc_5.txp"]})
    salted = extract_salted_batch(batch, 3, DEFAULT_CONFIG)
    assert (salted.column("kind").to_pylist().count("salt") >= 2), \
        "fixture doc must actually salt"
    expanded = expand_salt_batch(salted, 3, DEFAULT_CONFIG)
    scored = LinearScorer()(expanded)
    with _pytest.raises(RuntimeError, match="salted rows"):
        merge_batch(scored, DEFAULT_CONFIG)
    # the regroup-style merge handles the same rows fine
    merged = merge_shard(scored, DEFAULT_CONFIG)
    assert merged.num_rows > 0


def test_salted_dense_regroup_combo(ray_session):
    """Config combinations compose: dense labels + salted topology."""
    from erex.corpus import corpus_parquet
    from erex.extract import PipelineConfig
    from erex.labels import TLINK_DENSE_LABELS
    from erex.pipeline import run_extraction, run_extraction_salted
    corpus = corpus_parquet(25, seed=21)
    cfg = PipelineConfig(dense=True)
    a = run_extraction(corpus, config=cfg).to_pandas()
    b = run_extraction_salted(corpus, config=cfg,
                              salt_threshold=30).to_pandas()
    for df in (a, b):
        cls = df[(df["kind"] == "edge") & (df["stage"] == "classifier")
                 & (df["pair_class"] != "causal")]
        assert set(cls["pred"].astype(str)) <= set(TLINK_DENSE_LABELS)
    key = ["doc_sha", "subj", "pred", "obj"]

    def norm(df):
        df = df[df["kind"] == "edge"].copy()
        for c in key:
            df[c] = df[c].astype(str)
        return df.sort_values(key)[key].reset_index(drop=True)

    assert norm(a).equals(norm(b))
