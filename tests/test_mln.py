"""J5: MLN inferred-TLINK merge (erex/mln.py) — semantics transcribed
from TimeBankDenseExperiments.java:1233-1460 (experiment-only flow; the
reference ships the flag off and the reasoner binary is external, so
the reasoner-output file format is the contract under test)."""

import pyarrow as pa
import pytest

from erex.javamap import java_hashmap_order
from erex.mln import (collapse_dense, merge_batch, merge_inferred,
                      parse_inferred_mln)

SAMPLE = """\
0.97\tRelET("e1", "tmx0", "BEFORE")
0.40\tRelET("e2", "tmx0", "AFTER")
0.81\tRelEE("e1", "e2", "BEGINS")
0.51\tRelET("e3", "tmx2", "ENDED_BY")
"""


def test_parse_transform_chain_and_threshold():
    inf = parse_inferred_mln(SAMPLE)
    assert inf == {("e1", "tmx0"): "BEFORE",
                   ("e1", "e2"): "BEGINS",
                   ("e3", "tmx2"): "ENDED_BY"}  # 0.40 gated out


def test_parse_strict_like_java():
    # Double.parseDouble on a malformed first column raises — so do we
    with pytest.raises(ValueError):
        parse_inferred_mln('RelEE("e1", "e2", "BEFORE")')


def test_collapse_dense_map():
    # TimeBankDenseExperiments.java:649-660
    assert collapse_dense("BEGINS") == "BEFORE"
    assert collapse_dense("BEGUN_BY") == "AFTER"
    assert collapse_dense("ENDS") == "AFTER"
    assert collapse_dense("ENDED_BY") == "BEFORE"
    assert collapse_dense("IDENTITY") == "SIMULTANEOUS"
    assert collapse_dense("DURING") == "SIMULTANEOUS"
    assert collapse_dense("DURING_INV") == "SIMULTANEOUS"
    assert collapse_dense("BEFORE") == "BEFORE"  # default: pass through


def test_dct_raw_vs_et_ee_collapsed():
    """The load-bearing quirk: DCT overrides take the inferred label
    RAW (:1301), ET/EE collapse it (:1318/:1373)."""
    rows = [
        {"pair_class": "dct", "subj": "e1", "obj": "tmx0",
         "gold": "BEFORE", "pred": "AFTER"},
        {"pair_class": "et", "subj": "e2", "obj": "tmx3",
         "gold": "BEFORE", "pred": "AFTER"},
        {"pair_class": "ee", "subj": "e1", "obj": "e2",
         "gold": "BEFORE", "pred": "AFTER"},
    ]
    inf = {("e1", "tmx0"): "BEGINS", ("e2", "tmx3"): "BEGINS",
           ("e1", "e2"): "BEGINS"}
    out = merge_inferred(rows, inf, non_candidate_from_inferred=False,
                         precision_only=False)
    assert out[0]["pred"] == "BEGINS"   # dct: raw
    assert out[1]["pred"] == "BEFORE"   # et: collapsed
    assert out[2]["pred"] == "BEFORE"   # ee: collapsed
    assert all(r["source"] == "mln" for r in out)


def test_consumed_pairs_leave_the_leftover_pass():
    rows = [{"pair_class": "ee", "subj": "e1", "obj": "e2",
             "gold": "NONE", "pred": "NONE"}]
    inf = {("e1", "e2"): "BEFORE", ("e5", "e6"): "AFTER"}
    out = merge_inferred(rows, inf, precision_only=False)
    lefts = [r for r in out if r.get("gold") == "VAGUE"]
    assert {(r["subj"], r["obj"]) for r in lefts} == {("e5", "e6")}


def test_leftover_routing_and_reverse_skip():
    rows = [{"pair_class": "ee", "subj": "e9", "obj": "e8",
             "gold": "NONE", "pred": "BEFORE"}]
    inf = {("tmx1", "tmx2"): "BEFORE",      # -> tt
           ("e1", "tmx0"): "BEGINS",        # -> dct (target ends in 0)
           ("e1", "tmx3"): "ENDS",          # -> et
           ("e3", "e4"): "IDENTITY",        # -> ee
           ("e8", "e9"): "AFTER"}           # reversed pair extracted -> skip
    out = merge_inferred(rows, inf, precision_only=False)
    lefts = {(r["subj"], r["obj"]): r for r in out if r.get("gold") == "VAGUE"}
    assert ("e8", "e9") not in lefts
    assert lefts[("tmx1", "tmx2")]["pair_class"] == "tt"
    assert lefts[("e1", "tmx0")]["pair_class"] == "dct"
    assert lefts[("e1", "tmx3")]["pair_class"] == "et"
    assert lefts[("e3", "e4")]["pair_class"] == "ee"
    # leftovers are collapsed (:1424)
    assert lefts[("e1", "tmx0")]["pred"] == "BEFORE"
    assert lefts[("e1", "tmx3")]["pred"] == "AFTER"
    assert lefts[("e3", "e4")]["pred"] == "SIMULTANEOUS"
    # and the leftover order is java.util.HashMap keySet order
    got_order = [(r["subj"], r["obj"]) for r in out if r.get("gold") == "VAGUE"]
    want = [tuple(k.split("-", 1)) for k in java_hashmap_order(
        ["%s-%s" % k for k in inf if k not in (("e8", "e9"),)])
        if tuple(k.split("-", 1)) != ("e8", "e9")]
    assert got_order == want


def test_precision_only_drops_none():
    rows = [{"pair_class": "ee", "subj": "e1", "obj": "e2",
             "gold": "BEFORE", "pred": "NONE"},
            {"pair_class": "ee", "subj": "e3", "obj": "e4",
             "gold": "BEFORE", "pred": "AFTER"}]
    out = merge_inferred(rows, {}, precision_only=True)
    assert [(r["subj"], r["obj"]) for r in out] == [("e3", "e4")]


def test_merge_batch_passthrough_and_override():
    batch = pa.table({
        "doc_path": ["a", "a", "b"],
        "pair_class": ["ee", "dct", "ee"],
        "subj": ["e1", "e2", "e1"],
        "obj": ["e2", "tmx0", "e2"],
        "gold": ["BEFORE", "BEFORE", "BEFORE"],
        "pred": ["AFTER", "AFTER", "AFTER"],
    })
    inferred = {"a": {("e1", "e2"): "BEGINS"}}
    out = merge_batch(batch, inferred).to_pylist()
    a_rows = {(r["subj"], r["obj"]): r for r in out if r["doc_path"] == "a"}
    b_rows = [r for r in out if r["doc_path"] == "b"]
    assert a_rows[("e1", "e2")]["pred"] == "BEFORE"   # collapsed BEGINS
    assert a_rows[("e2", "tmx0")]["pred"] == "AFTER"  # untouched
    assert b_rows[0]["pred"] == "AFTER"               # doc without map
