import os

from erex.corpus import generate_txp
from erex.txp import main_pos_from_pos, parse_txp, parse_txp_lines

REF_EXAMPLE = "/root/reference/data/example_TXP/wsj_1014.tml.txp"


def test_main_pos_table():
    # TXPParser.java:104-121
    assert main_pos_from_pos("VVD") == "v"
    assert main_pos_from_pos("NN1") == "n"
    assert main_pos_from_pos("AT0") == "art"
    assert main_pos_from_pos("AJ0") == "adj"
    assert main_pos_from_pos("AV0") == "adv"
    assert main_pos_from_pos("CJC") == "conj"
    assert main_pos_from_pos("CRD") == "crd"
    assert main_pos_from_pos("PNP") == "pron"
    assert main_pos_from_pos("PRP") == "prep"
    assert main_pos_from_pos("TO0") == "to"
    assert main_pos_from_pos("POS") == "pos"
    assert main_pos_from_pos("PUN") == "punc"
    assert main_pos_from_pos("XX0") == "neg"
    assert main_pos_from_pos("ZZ0") == "O"


def test_parse_generated_doc():
    doc = parse_txp(generate_txp(42))
    assert doc.dct is not None and doc.dct.is_dct
    assert doc.dct.eid == "tmx0"
    assert len(doc.tokens) == len(doc.token_arr)
    assert len(doc.sentences) == len(doc.sentence_arr) >= 4
    # entity spans resolve to tokens
    for e in doc.entities.values():
        if e.is_dct or e.is_empty:
            continue
        assert e.start_tok in doc.tokens
        assert e.end_tok in doc.tokens
        assert e.sent_id in doc.sentences
    # candidate tlinks reference known entities and are (src, tgt)-deduped
    keys = [(s, t) for s, t, _ in doc.tlinks]
    assert len(keys) == len(set(keys))


def test_parse_reference_example():
    """Structural parity against the reference's shipped example file."""
    if not os.path.exists(REF_EXAMPLE):
        return
    with open(REF_EXAMPLE) as f:
        doc = parse_txp(f.read(), name="wsj_1014")
    assert doc.dct is not None
    assert doc.dct.value == "1989-10-26"
    # events and timexes were found
    events = [e for e in doc.entities.values() if e.is_event]
    timexes = [e for e in doc.entities.values() if e.is_timex]
    assert len(events) > 20
    assert len(timexes) >= 3
    # the first reporting event e1 spans token t3 'said'
    e1 = doc.entities["e1"]
    assert e1.start_tok == "t3"
    assert e1.ev_class == "REPORTING"
    assert e1.tense == "PAST"
    assert doc.tokens["t3"].main_verb
    assert doc.tokens["t3"].deps["t1"] == "SBJ"
    # multi-token timex tmx227 'the heady days' -> span t67..t67 (B-DURATION)
    assert "tmx227" in doc.entities
    assert doc.entities["tmx227"].ttype == "DURATION"
    # tlink candidate cells parsed with (src, tgt) dedup
    assert any(s == "e1" and t == "tmx0" and r == "BEFORE"
               for s, t, r in doc.tlinks)
    assert doc.tlink_types["e1,tmx0"] == "BEFORE"
    # coref list parsed (e1's coevent column)
    assert "e34" in e1.coref if e1.coref else True


def test_parse_lines_api():
    lines = generate_txp(7).split("\n")[4:]
    doc = parse_txp_lines(lines)
    assert doc.dct is not None
    assert len(doc.sentences) >= 4
