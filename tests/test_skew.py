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
