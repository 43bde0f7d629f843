"""Adversarial TXP documents for DISCOURSE-CONNECTIVE marker parity.

getTemporalConnective / getCausalConnective
(PairFeatureVector.java:1291-1371, 1563-1620) have three quirks a
straightforward implementation misses:

- getConnectiveMarker computes NO dep paths for position AFTER (the
  if/else chain covers BETWEEN/INSIDE, BEFORE/BEGIN, BEGIN-BEFORE,
  BEGIN-BETWEEN only);
- the temporal INSIDE branch passes tidConnBegin — the BEGIN-window
  run, not the INSIDE run — into getConnectiveMarker, so INSIDE dep
  paths come from a DIFFERENT (possibly empty) token run;
- both cross-sentence windows scan from **sentence 1's** start token to
  s2.start+4 (`getConnectiveTidArr(..., s1.getStartTokID(), tidBegin2,
  "BEGIN")`), so a connective at the start of the PREVIOUS sentence
  yields a BEGIN-BETWEEN marker.

Docs:
  cadv0  AFTER-position temporal connective (deps must stay O)
  cadv1  temporal INSIDE connective inside a timex span, with and
         without a separate BEGIN-window run
  cadv2  cross-sentence pair; the only Temporal connective is at the
         START OF SENTENCE 1
  cadv3  causal connective in the BEGIN window (+300 branch) and the
         causal cross-sentence s1-window quirk

Ground truth: tests/golden/javaref/connmark_adv.tsv = stdout of
`javaref.Driver connmark` over these files; checked by
test_javaref_parity.py::test_adversarial_connective_markers.
"""

from __future__ import annotations

from erex.corpus import DEFAULT_FIELDS, _DocBuilder, _tap


def _render(b: _DocBuilder, name: str, tlinks: dict,
            dct: str = "1989-10-26") -> str:
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
            eid = row["ev_id"] if row["ev_id"] != "O" else row["tmx_id"]
            if eid in tlinks:
                row["tlink"] = "||".join(
                    "%s:%s:NONE" % (eid, tgt) for tgt in tlinks.pop(eid))
            lines.append("\t".join(row[f] for f in DEFAULT_FIELDS))
        lines.append("")
    return "\n".join(lines)


def _event(s, text, lemma, deps="O"):
    eid = s.new_event()
    s.tok(text, "NN1", lemma, deps=deps, ev_class="OCCURRENCE",
          ev_id=eid, chunk="B-NP")
    return eid


def cadv0() -> str:
    # "The strike happened the merger collapsed afterwards swiftly ."
    # AFTER window of (e1, e2) holds the Temporal connective
    # "afterwards"; e2's token carries a dep to it, so a dep-path
    # implementation would emit a non-O dep — Java leaves AFTER deps O.
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("The", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "strike", "strike")
    s.tok("happened", "VVD", "happen", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    conn_tid = "t%d" % (b.next_tok + 2)     # the 'afterwards' token
    e2 = _event(s, "merger", "merger", deps="%s:TMP" % conn_tid)
    s.tok("collapsed", "VVD", "collapse", chunk="B-VP",
          tap=_tap("PAST", "NONE"))
    s.tok("afterwards", "AV0", "afterwards", chunk="B-ADVP",
          conn="Temporal")
    s.tok("swiftly", "AV0", "swiftly", chunk="B-ADVP")
    s.tok(".", "PUN", ".")
    return _render(b, "cadv0", {e1: [e2]})


def cadv1() -> str:
    # E-T same-sentence: the Temporal connective "meanwhile" sits INSIDE
    # the timex span; another run ("Then") sits in the 5-token BEGIN
    # window.  Java's INSIDE marker takes text from the INSIDE run but
    # dep paths from the BEGIN run.
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("Then", "AV0", "then", chunk="B-ADVP", conn="Temporal")
    s.tok("the", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "rally", "rally")
    s.tok("slipped", "VVD", "slip", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    t1 = b.sents[0].new_timex()
    for i, (w, ttp) in enumerate([("late", "B-DATE"), ("meanwhile",
                                  "I-DATE"), ("1989", "I-DATE")]):
        s.tok(w, "CRD", w, tmx=t1, tmx_type=ttp, tmx_value="1989",
              conn="Temporal" if w == "meanwhile" else "O")
    s.tok(".", "PUN", ".")
    return _render(b, "cadv1", {e1: [t1]})


def cadv2() -> str:
    # cross-sentence: the ONLY Temporal connective is at the start of
    # SENTENCE 1 — Java's BEGIN-BETWEEN window starts at s1.start
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("Meanwhile", "AV0", "meanwhile", chunk="B-ADVP",
          conn="Temporal")
    s.tok("the", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "storm", "storm")
    s.tok("happened", "VVD", "happen", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok(".", "PUN", ".")
    s2 = b.sent(2)
    s2.tok("The", "AT0", "the", chunk="B-NP")
    e2 = _event(s2, "protest", "protest")
    s2.tok("grew", "VVD", "grow", chunk="B-VP", mv=True,
           tap=_tap("PAST", "NONE"))
    s2.tok("very", "AV0", "very", chunk="B-ADVP")
    s2.tok("quickly", "AV0", "quickly", chunk="I-ADVP")
    s2.tok(".", "PUN", ".")
    return _render(b, "cadv2", {e1: [e2]})


def cadv3() -> str:
    # causal connective only in the BEGIN window (Contingency run on the
    # first token; no Contingency in BETWEEN/BEFORE/AFTER) for a
    # same-sentence pair, plus a second sentence whose pair exercises
    # the causal cross-sentence s1-window quirk
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("Consequently", "AV0", "consequently", chunk="B-ADVP",
          conn="Contingency")
    s.tok("the", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "deal", "deal")
    s.tok("collapsed", "VVD", "collapse", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    e2 = _event(s, "growth", "growth")
    s.tok("slipped", "VVD", "slip", chunk="B-VP", tap=_tap("PAST", "NONE"))
    s.tok(".", "PUN", ".")
    s2 = b.sent(2)
    s2.tok("The", "AT0", "the", chunk="B-NP")
    e3 = _event(s2, "market", "market")
    s2.tok("fell", "VVD", "fall", chunk="B-VP", mv=True,
           tap=_tap("PAST", "NONE"))
    s2.tok("rather", "AV0", "rather", chunk="B-ADVP")
    s2.tok("sharply", "AV0", "sharply", chunk="I-ADVP")
    s2.tok(".", "PUN", ".")
    return _render(b, "cadv3", {e1: [e2], e2: [e3]})


def cadv4() -> str:
    # INSIDE branch for real: the only Temporal connective reachable
    # from the BETWEEN/BEFORE/AFTER windows of (e1, tmx1) is the one
    # INSIDE the timex span; a separate "Then" run sits in the BEGIN
    # window but BEFORE the previous entity (e0), so only the INSIDE
    # branch fires — and Java computes its dep paths from the BEGIN run.
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("Then", "AV0", "then", chunk="B-ADVP", conn="Temporal")
    s.tok("the", "AT0", "the", chunk="B-NP")
    _event(s, "growth", "growth")          # e0: bounds the windows
    s.tok("slipped", "VVD", "slip", chunk="B-VP", tap=_tap("PAST", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "rally", "rally")
    s.tok("rose", "VVD", "rise", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    t1 = s.new_timex()
    for w, ttp in [("late", "B-DATE"), ("meanwhile", "I-DATE"),
                   ("1989", "I-DATE")]:
        s.tok(w, "CRD", w, tmx=t1, tmx_type=ttp, tmx_value="1989",
              conn="Temporal" if w == "meanwhile" else "O")
    s.tok(".", "PUN", ".")
    return _render(b, "cadv4", {e1: [t1]})


DOCS = {"cadv0": cadv0, "cadv1": cadv1, "cadv2": cadv2, "cadv3": cadv3,
        "cadv4": cadv4}


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
