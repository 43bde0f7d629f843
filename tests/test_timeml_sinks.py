import os

from erex.timeml import parse_timeml, render_timeml
from erex.sinks import csv_line, libsvm_line

REF_TML = "/root/reference/data/example_TML/wsj_1014.tml"


def test_parse_reference_timeml():
    """Reader parity on the reference's shipped gold TimeML."""
    if not os.path.exists(REF_TML):
        return
    with open(REF_TML) as f:
        out = parse_timeml(f.read())
    assert out["dct_value"] == "1989-10-26"
    assert len(out["events"]) > 20
    assert out["instances"]  # eiid -> eid resolution happened
    # every tlink endpoint is an eid or tmx id (eiids resolved)
    for src, tgt, rel, _d in out["tlinks"]:
        assert not src.startswith("ei") and not tgt.startswith("ei")
        assert rel
    # timeID renamed t<j> -> tmx<j> (TimeMLParser.java:158-165)
    assert any(s.startswith("tmx") or t.startswith("tmx")
               for s, t, _r, _d in out["tlinks"])


def test_render_roundtrip():
    triples = [("e1", "tmx2", "IS_INCLUDED", "et"),
               ("e1", "e2", "BEFORE", "ee"),
               ("e2", "e1", "CLINK", "causal")]
    xml = render_timeml("doc.txp", triples)
    out = parse_timeml(xml)
    assert ("e1", "tmx2", "IS_INCLUDED", False) in out["tlinks"]
    assert ("e1", "e2", "BEFORE", False) in out["tlinks"]
    assert ("e2", "e1") in out["clinks"]
    assert set(out["instances"].values()) == {"e1", "e2"}


def test_libsvm_and_csv_lines():
    # 1-based indices, zeros skipped (PairFeatureVector.java:214-225)
    assert libsvm_line(3, [0.0, 1.0, 0.0, 0.5]) == "3 2:1 4:0.5"
    assert csv_line("BEFORE", ['a,b', 'c"d', 1.0]) == \
        "aCOMMAb,cQUOTd,1.0,BEFORE"


def test_cli_gen_and_run(ray_session, tmp_path):
    from erex.__main__ import main
    from erex.corpus import corpus_parquet
    corpus = corpus_parquet(20, seed=3)
    out = tmp_path / "edges"
    rc = main(["run", "--corpus", corpus, "--out", str(out)])
    assert rc == 0
    import pyarrow.dataset as pds
    t = pds.dataset(str(out), partitioning="hive").to_table()
    assert t.num_rows > 0
    assert "bucket" in t.schema.names  # partitioned layout


def test_triples_sink(ray_session, tmp_path):
    from erex.corpus import corpus_parquet
    from erex.pipeline import run_extraction
    from erex.sinks import write_triples_tsv
    corpus = corpus_parquet(15, seed=4)
    out = tmp_path / "triples"
    write_triples_tsv(run_extraction(corpus), str(out))
    import pyarrow.dataset as pds
    t = pds.dataset(str(out)).to_table()
    lines = t.column("line").to_pylist()
    assert lines and all(len(l.split("\t")) == 3 for l in lines)


def test_gold_candidate_mode():
    """goldCandidate=true parity: candidates come from a paired gold
    TimeML instead of the TXP candidate cells."""
    from erex.corpus import generate_txp
    from erex.extract import extract_document
    from erex.timeml import render_timeml

    content = generate_txp(777)
    base = extract_document(content)
    # gold TimeML proposing only a single E-E candidate pair
    events = sorted({t["src"] for t in base["triples"]
                     if t["src"].startswith("e")})[:2]
    assert len(events) == 2
    gold = render_timeml("g.tml", [(events[0], events[1], "BEFORE", "ee")])
    out = extract_document(content, gold_timeml=gold)
    non_tt = [t for t in out["triples"]
              if t["pair_class"] in ("ee", "et", "dct")]
    assert len(non_tt) == 1
    assert (non_tt[0]["src"], non_tt[0]["tgt"]) == (events[0], events[1])
    assert non_tt[0]["gold"] == "BEFORE"
    # T-T grid is unaffected (it never comes from candidates)
    assert sum(t["pair_class"] == "tt" for t in out["triples"]) == \
        sum(t["pair_class"] == "tt" for t in base["triples"])


def test_mln_and_arff_sinks(ray_session):
    import pyarrow as pa
    from erex.corpus import corpus_parquet
    from erex.pipeline import run_extraction
    from erex.sinks import arff_document, mln_evidence_batch

    ds = run_extraction(corpus_parquet(10, seed=6))
    atoms = ds.map_batches(mln_evidence_batch,
                           batch_format="pyarrow").to_pandas()
    assert len(atoms) > 0
    assert atoms["atom"].str.match(
        r"Rel(TT|ET|EE)\([a-z0-9]+, [a-z0-9]+, [A-Z_-]+\)").all()

    arff = arff_document("ee", ["f1", "f2", "wnSim", "label"],
                         [([1, 0, 0.25], "BEFORE"), ([0, 1, 1.0], "AFTER")])
    assert "@relation ee" in arff
    assert "@attribute wnSim {0.0,0.25,0.75,1.0}" in arff
    assert arff.splitlines()[-1] == "0,1,1.0,AFTER"
