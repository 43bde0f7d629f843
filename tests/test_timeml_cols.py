"""S11 TimeML->columns converter (erex/timeml_cols.py).

Reference: src/parser/convertTimeMLToColumns.py:1-84 (whose conversion
core is an absent external package — these tests pin the functional
contract: everything TimeML carries survives the trip into the TXP
column format and back through the S2 parser)."""

import re
import xml.etree.ElementTree as ET

import pytest

from erex.corpus import generate_txp
from erex.timeml import parse_timeml
from erex.timeml_cols import (TOKEN_PATTERN, TOKEN_RE, render_gold_timeml,
                              timeml_to_columns)
from erex.txp import parse_txp

EXAMPLES = ("/root/reference/data/example_TML/wsj_1014.tml",
            "/root/reference/data/example_TML/bbc_20130322_721.tml")


def _entity_counts(doc):
    ev = sum(1 for e in doc.entities.values() if e.kind == "EVENT")
    tmx = sum(1 for e in doc.entities.values() if e.kind == "TIMEX")
    return ev, tmx


@pytest.mark.parametrize("seed", [0, 7, 123, 999])
def test_gold_roundtrip_exact(seed):
    """TXP -> gold TimeML -> columns -> parse recovers every annotation
    the TimeML format can carry."""
    txp = generate_txp(seed)
    name = "doc_%d" % seed
    orig = parse_txp(txp, name=name)
    tml = render_gold_timeml(txp, name)
    ET.fromstring(tml)  # well-formed XML
    rt = parse_txp(timeml_to_columns(tml, name), name=name)

    assert len(rt.tokens) == len(orig.tokens)
    assert len(rt.sentences) == len(orig.sentences)
    assert set(rt.entities) == set(orig.entities)
    for eid, e in orig.entities.items():
        r = rt.entities[eid]
        if e.is_event:
            assert (r.ev_class, r.tense, r.aspect, r.pol) == \
                (e.ev_class, e.tense, e.aspect, e.pol)
        else:
            assert (r.ttype, r.value, r.is_dct) == \
                (e.ttype, e.value, e.is_dct)
    assert sorted(rt.tlinks) == sorted(orig.tlinks)
    assert sorted(rt.clinks) == sorted(orig.clinks)
    assert rt.dct is not None and rt.dct.value == orig.dct.value


@pytest.mark.parametrize("path", EXAMPLES)
def test_real_timeml_structure(path):
    """The real TimeBank example .tml files convert without loss of any
    entity or link."""
    tml = open(path).read()
    d = parse_txp(timeml_to_columns(tml, path), name=path)
    root = ET.fromstring(tml)
    n_ev, n_tmx = _entity_counts(d)
    assert n_ev == len({e.get("eid") for e in root.iter("EVENT")})
    assert n_tmx == len({t.get("tid") for t in root.iter("TIMEX3")})
    meta = parse_timeml(tml)
    assert len(d.tlinks) == len({(s, t) for s, t, _r, _d in meta["tlinks"]})
    # every tlink pair carries the first relType seen (parser dedup)
    assert len(d.tokens) > 100 and len(d.sentences) > 5
    # tense/aspect/polarity rode through MAKEINSTANCE
    tap_hits = sum(1 for e in d.entities.values()
                   if e.is_event and e.tense not in ("O", ""))
    assert tap_hits > 0


def test_token_regex_matches_duckdb():
    """TOKEN_PATTERN must behave identically under Python re and DuckDB
    RE2 — the driver oracle recounts tokens with it."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    pat = TOKEN_PATTERN.replace("'", "''")
    probes = [
        "Anheuser-Busch Cos. said (it) -- 3.5% 'don't' \"war\"!",
        "a...b?! end", "", "U.S. e-mail@x.org 12/26/89 {x} [y]",
        "semi;colon:and,comma", "tab\tnewline\nmix",
    ]
    for t in probes:
        sql = con.execute(
            "SELECT regexp_extract_all(?, '%s')" % pat, [t]).fetchone()[0]
        assert TOKEN_RE.findall(t) == sql


def test_dct_row_and_header_shape():
    tml = render_gold_timeml(generate_txp(5), "doc_5")
    cols = timeml_to_columns(tml, "doc_5")
    lines = cols.split("\n")
    assert lines[0] == "# FILE: doc_5"
    assert lines[1].startswith("# DATE: ")
    assert lines[2].startswith("# FIELDS: token\t")
    assert lines[3] == ""
    assert lines[4].startswith("DCT_")  # body row 1 = DCT sentinel
    assert lines[5] == ""


def test_dct_sourced_links_survive():
    """Links whose source is the (token-less) DCT are placed on the
    target's row and still parse."""
    tml = render_gold_timeml(generate_txp(123), "d")
    meta = parse_timeml(tml)
    dct_links = [(s, t) for s, t, _r, _d in meta["tlinks"]
                 if s == "tmx0" or t == "tmx0"]
    assert dct_links  # corpus has event-DCT pairs
    d = parse_txp(timeml_to_columns(tml, "d"), name="d")
    got = {(s, t) for s, t, _r in d.tlinks}
    for s, t in dct_links:
        assert (s, t) in got


def test_escaped_tokens():
    """Brackets/quotes in TEXT come out TXP-escaped and unescape back."""
    tml = ('<?xml version="1.0" ?><TimeML><DOCID>x</DOCID>'
           '<DCT><TIMEX3 tid="t0" type="DATE" value="2020-01-01" '
           'functionInDocument="CREATION_TIME">2020-01-01</TIMEX3></DCT>'
           '<TEXT>He said (really) "<EVENT eid="e1" class="REPORTING">'
           'quoted</EVENT>" [sic].</TEXT>'
           '<MAKEINSTANCE eventID="e1" eiid="ei1" tense="PAST" '
           'aspect="NONE" polarity="POS"/></TimeML>')
    cols = timeml_to_columns(tml, "x")
    toks = [l.split("\t")[0] for l in cols.split("\n")[4:]
            if l and not l.startswith("DCT_")]
    assert "-LRB-" in toks and "-RRB-" in toks
    assert "-LSB-" in toks and "-RSB-" in toks
    assert "''" in toks
    d = parse_txp(cols, name="x")
    e1 = d.entities["e1"]
    assert (e1.ev_class, e1.tense, e1.aspect, e1.pol) == \
        ("REPORTING", "PAST", "NONE", "pos")


def test_sentence_rule():
    """Every ./!/? token terminates a sentence; a trailing run without
    one forms a final sentence (the SQL-replicable rule)."""
    tml = ('<TimeML><DCT><TIMEX3 tid="t0" type="DATE" value="2020-01-01" '
           'functionInDocument="CREATION_TIME">x</TIMEX3></DCT>'
           '<TEXT>One two. Three! Four? trailing words</TEXT></TimeML>')
    d = parse_txp(timeml_to_columns(tml, "x"), name="x")
    assert len(d.sentences) == 4
    toks = TOKEN_RE.findall("One two. Three! Four? trailing words")
    assert len(d.tokens) == len(toks)


def test_converted_columns_feed_extraction():
    """End-to-end: converter output is a valid input to the extraction
    stage (the reference's TimeML -> columns -> TXPParser flow)."""
    from erex.extract import extract_document
    tml = render_gold_timeml(generate_txp(123), "doc_123")
    out = extract_document(timeml_to_columns(tml, "doc_123"))
    assert len(out["triples"]) > 0
    assert all("label" in t or "pred" in t or len(t) >= 3
               for t in out["triples"][:1])


def test_nested_entities_inside_wrapper_markup():
    """An EVENT/TIMEX3 nested inside a non-entity wrapper element (<s>,
    <turn>, ...) keeps its annotation — _walk_text recurses into unknown
    inline markup instead of flattening it to plain text."""
    tml = ('<TimeML><DCT><TIMEX3 tid="t0" type="DATE" value="2020-01-01" '
           'functionInDocument="CREATION_TIME">x</TIMEX3></DCT>'
           '<TEXT>intro <s>He <EVENT eid="e1" class="REPORTING">said'
           '</EVENT> on <TIMEX3 tid="t1" type="DATE" value="2020-01-02">'
           'Friday</TIMEX3>.</s> outro <g>plain <b>deep</b> tail</g>.'
           '</TEXT></TimeML>')
    d = parse_txp(timeml_to_columns(tml, "x"), name="x")
    ev = [e for e in d.entities.values() if e.is_event]
    tmx = [e for e in d.entities.values()
           if e.is_timex and not e.is_dct]
    assert len(ev) == 1 and d.tokens[ev[0].start_tok].text == "said"
    assert ev[0].ev_class == "REPORTING"
    assert len(tmx) == 1 and tmx[0].value == "2020-01-02"
    # the wrapper's own text survives as plain tokens
    texts = [d.tokens[t].text for t in d.token_arr]
    for w in ("intro", "He", "on", "outro", "plain", "deep", "tail"):
        assert w in texts
