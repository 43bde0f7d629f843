"""Adversarial multi-signal TXP documents for causal-marker parity.

The reference's getCausalSignal (PairFeatureVector.java:1374-1512) walks
the signal keys in raw HashMap order with one counter ``i`` shared by
the BETWEEN/BEFORE/AFTER scans and bumped inside the collision loop, so
whenever SEVERAL causal signals match around one candidate pair the
winning marker depends on that exact bookkeeping.  The synthetic corpus
templates only ever emit one signal per sentence, so these crafted
documents force the multi-match paths:

  adv0  "because of" + "because" both matching in BEFORE, "since" in
        AFTER (same sentence)
  adv1  signal in BETWEEN and BEFORE with tying distances
  adv2  cross-sentence pair; "so" + "thus" in the BEGIN-BETWEEN window
  adv3  three signals: BEFORE "due to", BETWEEN "as", AFTER "hence"

Ground truth: tests/golden/javaref/causmark_adv.tsv = stdout of

    tools/javaref/build.sh
    for f in tests/golden/javaref/adv/adv*.txp; do
        (cd /root/reference && java -cp "/tmp/javaref_classes:lib/*" \
            javaref.Driver causmark $f)
    done

checked by tests/test_javaref_parity.py::test_adversarial_causal_markers.
"""

from __future__ import annotations

from erex.corpus import DEFAULT_FIELDS, _DocBuilder, _tap


def _render(b: _DocBuilder, name: str, dct: str = "1989-10-26") -> str:
    lines = [
        "# FILE: %s.txp" % name,
        "# DATE: %sT00:00:00" % dct,
        "# FIELDS: " + "\t".join(DEFAULT_FIELDS),
        "",
        "DCT_%s\tO\tO\tO\tO\tO\ttmx0\tB-DATE\t%s\tO\tO\tO\tO\tO\tO\tO\tO\tO\tO\tO\tO"
        % (dct, dct),
        "",
    ]
    for s in b.sents:
        for row in s.rows:
            lines.append("\t".join(row[f] for f in DEFAULT_FIELDS))
        lines.append("")
    return "\n".join(lines)


def _event(s, text, lemma, clink=None):
    eid = s.new_event()
    s.tok(text, "NN1", lemma, ev_class="OCCURRENCE", ev_id=eid, chunk="B-NP")
    if clink is not None:
        s.rows[-1]["clink"] = clink
    return eid


def adv0() -> str:
    # "Because of the crisis , the strike caused the rally since the
    #  market slipped ."  e1=crisis e2=strike e3=rally e4=market:
    # pair (e1,e2): BEFORE has "because of" AND "because"; AFTER "since".
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("Because", "PRP", "because", chunk="B-PP", conn="Contingency")
    s.tok("of", "PRF", "of", chunk="I-PP", conn="Contingency")
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "crisis", "crisis")
    s.tok(",", "PUN", ",")
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "strike", "strike")
    s.tok("caused", "VVD", "cause", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "rally", "rally")
    s.tok("since", "CJS", "since", chunk="B-PP", conn="Contingency")
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "market", "market")
    s.tok("slipped", "VVD", "slip", chunk="B-VP", tap=_tap("PAST", "NONE"))
    s.tok(".", "PUN", ".")
    return _render(b, "adv0")


def adv1() -> str:
    # signals in BETWEEN ("thus") and BEFORE ("therefore") with small,
    # tying distances around pair (e1, e2)
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("Therefore", "AV0", "therefore", chunk="B-ADVP",
          conn="Contingency")
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "merger", "merger")
    s.tok("thus", "AV0", "thus", chunk="B-ADVP", conn="Contingency")
    s.tok("caused", "VVD", "cause", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "closure", "closure")
    s.tok(".", "PUN", ".")
    return _render(b, "adv1")


def adv2() -> str:
    # cross-sentence: e1 in s1; s2 begins "So thus , the" — both "so"
    # and "thus" inside the 5-token BEGIN-BETWEEN window
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("The", "AT0", "the", chunk="B-NP")
    _event(s, "storm", "storm")
    s.tok("happened", "VVD", "happen", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok(".", "PUN", ".")
    s2 = b.sent(2)
    s2.tok("So", "AV0", "so", chunk="B-ADVP", conn="Contingency")
    s2.tok("thus", "AV0", "thus", chunk="B-ADVP", conn="Contingency")
    s2.tok(",", "PUN", ",")
    s2.tok("the", "AT0", "the", chunk="B-NP")
    _event(s2, "protest", "protest")
    s2.tok("caused", "VVD", "cause", chunk="B-VP", mv=True,
           tap=_tap("PAST", "NONE"))
    s2.tok("the", "AT0", "the", chunk="B-NP")
    _event(s2, "election", "election")
    # the cross-sentence candidate gate is isContainCausalSignal(s2)
    # alone (CauseRelPro.java:133-136), which matches the LITERAL
    # numeric map keys — a "44" token lets the (s1-event, s2-event)
    # pairs through so the BEGIN-BETWEEN scan runs
    s2.tok("44", "CRD", "44")
    s2.tok(".", "PUN", ".")
    return _render(b, "adv2")


def adv3() -> str:
    # three contexts at once: BEFORE "due to", BETWEEN "as", AFTER "hence"
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("Due", "PRP", "due", chunk="B-PP", conn="Contingency")
    s.tok("to", "PRP", "to", chunk="I-PP", conn="Contingency")
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "attack", "attack")
    s.tok("as", "CJS", "as", chunk="B-PP", conn="Contingency")
    s.tok("planned", "VVD", "plan", chunk="B-VP")
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "deal", "deal")
    s.tok("caused", "VVD", "cause", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("hence", "AV0", "hence", chunk="B-ADVP", conn="Contingency")
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "growth", "growth")
    s.tok("slipped", "VVD", "slip", chunk="B-VP", tap=_tap("PAST", "NONE"))
    s.tok(".", "PUN", ".")
    return _render(b, "adv3")


DOCS = {"adv0": adv0, "adv1": adv1, "adv2": adv2, "adv3": adv3}


def main(out_dir: str):
    import os
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in DOCS.items():
        path = os.path.join(out_dir, name + ".txp")
        with open(path, "w") as f:
            f.write(fn())
        print("wrote", path)


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else
         "tests/golden/javaref/adv")
