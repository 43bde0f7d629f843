"""Adversarial multi-signal TXP documents for TEMPORAL-marker parity.

getTemporalSignal (PairFeatureVector.java:1139-1231) walks ALL
reverse-sorted signal keys, putting every match into a distance-keyed
HashMap (equal distances overwrite, minimum key wins).  An
implementation that stops at the first matching key diverges whenever a
later key yields a smaller distance+offset — e.g. a BETWEEN match found
first losing to an INSIDE match of a later key.  These docs force that:

  tadv0  E-T pair: "just" + "during" in BETWEEN, "early" INSIDE the
         timex span (INSIDE has +0 offset, so it must win)
  tadv1  E-E pair: "before" in BETWEEN vs "meanwhile" in BEFORE/BEGIN
  tadv2  E-T pair: overlapping keys "up to" / "to" in BETWEEN
         (distance interplay + equal-key overwrite)
  tadv3  cross-sentence E-E: "later" + "meanwhile" in BEGIN-BETWEEN

Ground truth: tests/golden/javaref/tempmark_adv.tsv = stdout of

    tools/javaref/build.sh
    for f in tests/golden/javaref/adv/tadv*.txp; do
        (cd /root/reference && java -cp "/tmp/javaref_classes:lib/*" \
            javaref.Driver tempmark $f)
    done

checked by test_javaref_parity.py::test_adversarial_temporal_markers.
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


def _event(s, text, lemma):
    eid = s.new_event()
    s.tok(text, "NN1", lemma, ev_class="OCCURRENCE", ev_id=eid, chunk="B-NP")
    return eid


def _timex(s, words, ttype, value):
    tid = s.new_timex()
    for i, w in enumerate(words):
        s.tok(w, "CRD", w, tmx=tid, tmx_type=("B-" if i == 0 else "I-")
              + ttype, tmx_value=value)
    return tid


def tadv0() -> str:
    # "The strike happened just during early 1989 ."
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("The", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "strike", "strike")
    s.tok("happened", "VVD", "happen", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("just", "AV0", "just", chunk="B-ADVP")
    s.tok("during", "PRP", "during", chunk="B-PP")
    t1 = _timex(s, ["early", "1989"], "DATE", "1989")
    s.tok(".", "PUN", ".")
    return _render(b, "tadv0", {e1: [t1, "tmx0"]})


def tadv1() -> str:
    # "Meanwhile the rally happened before the merger collapsed ."
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("Meanwhile", "AV0", "meanwhile", chunk="B-ADVP", conn="Temporal")
    s.tok("the", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "rally", "rally")
    s.tok("happened", "VVD", "happen", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("before", "CJS", "before", chunk="B-PP", conn="Temporal")
    s.tok("the", "AT0", "the", chunk="B-NP")
    e2 = _event(s, "merger", "merger")
    s.tok("collapsed", "VVD", "collapse", chunk="B-VP",
          tap=_tap("PAST", "NONE"))
    s.tok(".", "PUN", ".")
    return _render(b, "tadv1", {e1: [e2]})


def tadv2() -> str:
    # "The price rose up to late 1989 ."  — "up to" vs "to" overlap
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("The", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "price", "price")
    s.tok("rose", "VVD", "rise", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("up", "AVP", "up", chunk="B-PP")
    s.tok("to", "PRP", "to", chunk="I-PP")
    t1 = _timex(s, ["late", "1989"], "DATE", "1989")
    s.tok(".", "PUN", ".")
    return _render(b, "tadv2", {e1: [t1]})


def tadv3() -> str:
    # cross-sentence: s2 begins "Later meanwhile , the strike" — both
    # keys inside the 5-token BEGIN-BETWEEN window
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("The", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "storm", "storm")
    s.tok("happened", "VVD", "happen", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok(".", "PUN", ".")
    s2 = b.sent(2)
    s2.tok("Later", "AV0", "later", chunk="B-ADVP", conn="Temporal")
    s2.tok("meanwhile", "AV0", "meanwhile", chunk="B-ADVP",
           conn="Temporal")
    s2.tok(",", "PUN", ",")
    s2.tok("the", "AT0", "the", chunk="B-NP")
    e2 = _event(s2, "strike", "strike")
    s2.tok("happened", "VVD", "happen", chunk="B-VP", mv=True,
           tap=_tap("PAST", "NONE"))
    s2.tok(".", "PUN", ".")
    return _render(b, "tadv3", {e1: [e2]})


def tadv4() -> str:
    # "The strike happened within the early 1989 period ." — the
    # reverse-sort-first key "within" matches BETWEEN (+100) while the
    # LATER key "early" sits mid-span INSIDE the 4-token timex (+0):
    # a first-match-wins scan returns "within", the reference's
    # scan-all-keys minimum returns "early"
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("The", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "strike", "strike")
    s.tok("happened", "VVD", "happen", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("within", "PRP", "within", chunk="B-PP")
    t1 = _timex(s, ["the", "early", "1989", "period"], "DATE", "1989")
    s.tok(".", "PUN", ".")
    return _render(b, "tadv4", {e1: [t1]})


def tadv5() -> str:
    # "Thus when investors previously moved the strike happened the
    #  merger collapsed ."  BEFORE window of e1 holds "when" (earlier
    # in reverse-sorted order, farther from e1) and "previously"
    # (later key, nearer): scan-all minimum picks "previously"
    b = _DocBuilder(0)
    s = b.sent(1)
    s.tok("Thus", "AV0", "thus", chunk="B-ADVP")
    s.tok("when", "CJS", "when", chunk="B-PP", conn="Temporal")
    s.tok("investors", "NN2", "investor", chunk="B-NP")
    s.tok("previously", "AV0", "previously", chunk="B-ADVP",
          conn="Temporal")
    s.tok("moved", "VVD", "move", chunk="B-VP", tap=_tap("PAST", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    e1 = _event(s, "strike", "strike")
    s.tok("happened", "VVD", "happen", chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    e2 = _event(s, "merger", "merger")
    s.tok("collapsed", "VVD", "collapse", chunk="B-VP",
          tap=_tap("PAST", "NONE"))
    s.tok(".", "PUN", ".")
    return _render(b, "tadv5", {e1: [e2]})


DOCS = {"tadv0": tadv0, "tadv1": tadv1, "tadv2": tadv2, "tadv3": tadv3,
        "tadv4": tadv4, "tadv5": tadv5}


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
