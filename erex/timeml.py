"""TimeML XML reader (S4) and writer (S5).

Reader re-derives /root/reference/src/parser/TimeMLParser.java:76-255:
- MAKEINSTANCE gives eiid -> eid (and tense+aspect+polarity per event);
- TLINK/CLINK attributes resolve eventInstanceID through the instance
  map and rename timeID `t<j>` -> `tmx<j>` (TimeMLParser.java:158-165);
- TLINKs/CLINKs are collected in REVERSE document order
  (`for (index = length-1; index >= 0; index--)`, TimeMLParser.java:157)
  — kept, since insertion order feeds downstream priority logic;
- the `deduced="true"` attribute is carried.

Writer re-derives writeTimeMLFile's link emission
(/root/reference/src/task/TempEval3TaskABC.java:252-416): one TimeML
document per input doc with MAKEINSTANCE per event and TLINK nodes with
an incrementing `lid`; timex ids are written back as `t<j>`. Intended as
a map_batches formatting stage over the pipeline's edge rows (the
primary sink stays Parquet).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import quoteattr


def parse_timeml(content: str) -> dict:
    """-> {instances: {eiid: eid}, tap: {eid: 'TENSE+ASPECT+pol'},
    tlinks: [(src, tgt, rel, deduced)], clinks: [(src, tgt)],
    events: [eid], timexes: [(tmx_id, type, value)], dct_value}."""
    root = ET.fromstring(content)
    out = {"instances": {}, "tap": {}, "tlinks": [], "clinks": [],
           "events": [], "timexes": [], "dct_value": None}
    for ev in root.iter("EVENT"):
        eid = ev.get("eid")
        if eid:
            out["events"].append(eid)
    for tx in root.iter("TIMEX3"):
        tid = tx.get("tid", "")
        out["timexes"].append((tid.replace("t", "tmx"),
                               tx.get("type", ""), tx.get("value", "")))
        if tx.get("functionInDocument", "") == "CREATION_TIME":
            out["dct_value"] = tx.get("value", "")
    for mi in root.iter("MAKEINSTANCE"):
        eiid, eid = mi.get("eiid"), mi.get("eventID")
        if eiid and eid:
            out["instances"][eiid] = eid
        if eid:
            out["tap"][eid] = "%s+%s+%s" % (mi.get("tense", ""),
                                            mi.get("aspect", ""),
                                            mi.get("polarity", ""))

    def _resolve(node, attr_ev, attr_tmx):
        v = node.get(attr_ev)
        if v is not None:
            return out["instances"].get(v, v)
        v = node.get(attr_tmx)
        if v is not None:
            return v.replace("t", "tmx")
        return None

    # reverse document order (TimeMLParser.java:157)
    for tl in reversed(list(root.iter("TLINK"))):
        src = _resolve(tl, "eventInstanceID", "timeID")
        tgt = _resolve(tl, "relatedToEventInstance", "relatedToTime")
        if src and tgt:
            out["tlinks"].append((src, tgt, tl.get("relType", ""),
                                  tl.get("deduced", "") == "true"))
    for cl in reversed(list(root.iter("CLINK"))):
        src = _resolve(cl, "eventInstanceID", "timeID")
        tgt = _resolve(cl, "relatedToEventInstance", "relatedToTime")
        if src and tgt:
            out["clinks"].append((src, tgt))
    return out


# X7: TXP -> TimeML token unescaping (TempEval3TaskABC.java:283-292;
# replacement ORDER matters: `` and '' fold to " before ` folds to ')
_UNESCAPE = (("``", '"'), ("''", '"'), ("`", "'"),
             ("-LCB-", "{"), ("-RCB-", "}"), ("-LRB-", "("), ("-RRB-", ")"),
             ("-LSB-", "["), ("-RSB-", "]"))


def unescape_token(tok: str) -> str:
    for a, b in _UNESCAPE:
        tok = tok.replace(a, b)
    return tok


def _tml_id(mention_id: str) -> tuple:
    """-> (attr-space, TimeML id): events keep eids; tmx<j> -> t<j>."""
    if mention_id.startswith("tmx"):
        return "Timex", mention_id.replace("tmx", "t", 1)
    return "Event", mention_id


def render_timeml(doc_path: str, triples, events=None) -> str:
    """Render one document's final triples as a TimeML fragment.
    `triples` = iterable of (src, tgt, label, pair_class); CLINK rows
    become <CLINK>, the rest <TLINK>. MAKEINSTANCE rows are emitted for
    every event id seen (eiid == eid, matching the regenerated instances
    of writeTimeMLFile)."""
    lines = ['<?xml version="1.0" ?>',
             '<TimeML>',
             f'<DOCID>{doc_path}</DOCID>']
    seen_events = list(events) if events else []
    if not events:
        seen = set()
        for src, tgt, _l, _pc in triples:
            for m in (src, tgt):
                if not m.startswith("tmx") and m not in seen:
                    seen.add(m)
                    seen_events.append(m)
    for eid in seen_events:
        lines.append(f'<MAKEINSTANCE eiid={quoteattr(eid)} '
                     f'eventID={quoteattr(eid)}/>')
    lid = 1
    for src, tgt, label, pair_class in triples:
        skind, sid = _tml_id(src)
        tkind, tid = _tml_id(tgt)
        sattr = "eventInstanceID" if skind == "Event" else "timeID"
        tattr = ("relatedToEventInstance" if tkind == "Event"
                 else "relatedToTime")
        tag = "CLINK" if pair_class == "causal" else "TLINK"
        lines.append(
            f'<{tag} lid={quoteattr("l%d" % lid)} {sattr}={quoteattr(sid)} '
            f'{tattr}={quoteattr(tid)} relType={quoteattr(label)}/>')
        lid += 1
    lines.append('</TimeML>')
    return "\n".join(lines)


def timeml_batch(batch, group_cols=("doc_sha", "doc_path")):
    """map_batches formatting stage: edge rows -> one TimeML string per
    document: (doc_sha, doc_path, timeml)."""
    import pyarrow as pa
    by_doc: dict = {}
    for r in batch.to_pylist():
        if r["kind"] != "edge" or not r.get("consistent", True):
            continue
        key = (r["doc_sha"], r["doc_path"])
        by_doc.setdefault(key, []).append(
            (r["subj"], r["obj"], r["pred"], r["pair_class"]))
    shas, paths, xmls = [], [], []
    for (sha, path), triples in by_doc.items():
        shas.append(sha)
        paths.append(path)
        xmls.append(render_timeml(path, triples))
    return pa.table({"doc_sha": pa.array(shas, pa.string()),
                     "doc_path": pa.array(paths, pa.string()),
                     "timeml": pa.array(xmls, pa.string())})


# ---------------------------------------------------------------------------
# S5: full system TimeML document writer (TempEval3TaskABC.java:252-416)
# ---------------------------------------------------------------------------
def split_tml_text(tml_content: str) -> list:
    """TimeMLDoc.splitText (TimeMLDoc.java:146-158): the TEXT element's
    text content, tags stripped, each newline turned into ' \\n', then
    split on single spaces (interior empties kept)."""
    import re as _re
    root = ET.fromstring(tml_content)
    te = root.find("TEXT")
    text_str = "".join(te.itertext()) if te is not None else ""
    text_str = _re.sub(r"<.*?>", "", text_str)
    text_str = text_str.replace("\n", " \n")
    return text_str.split(" ")


def reconstruct_text(doc, tml_words: list) -> str:
    """The token-alignment loop of writeTimeMLFile
    (TempEval3TaskABC.java:266-346): walk the original document's
    whitespace-split words against the TXP token stream, re-inserting
    inline <EVENT>/<TIMEX3> tags; TXP tokens are unescaped first and
    multi-word original tokens consume several TXP tokens (inTml)."""
    out = []
    w = t = 0
    in_tml = False
    tml_tok = ""
    tok_arr = doc.token_arr
    while w < len(tml_words):
        if t >= len(tok_arr):
            out.append(" " if tml_words[w] == "" else tml_words[w])
            w += 1
            continue
        tid = tok_arr[t]
        tok = doc.tokens[tid]
        evid = tok.event_id
        tmxid = tok.timex_id
        txp_tok = unescape_token(tok.text)
        if not in_tml:
            tml_tok = tml_words[w]
        if txp_tok == "DCT":
            t += 1
        elif tml_tok == "" and w == 0:
            w += 1
        else:
            if tml_tok == "\n":
                out.append("\n")
                w += 1
            elif tml_tok.startswith("\n"):
                in_tml = True
                tml_tok = tml_tok[1:]
                out.append("\n")
            elif not tml_tok.startswith(txp_tok) and txp_tok == ".":
                t += 1
            elif tml_tok == "":
                out.append(" ")
                w += 1
            else:
                matched = False
                if tml_tok == txp_tok:
                    if not in_tml:
                        out.append(" ")
                    in_tml = False
                    w += 1
                    t += 1
                    matched = True
                elif tml_tok.startswith(txp_tok):
                    if not in_tml:
                        out.append(" ")
                    in_tml = True
                    tml_tok = tml_tok[len(txp_tok):]
                    t += 1
                    matched = True
                # tag + token emission happens even when neither matched
                # (the reference falls through with w/t unchanged, which
                # cannot occur for aligned corpora); keep the structure
                if evid is not None:
                    ev = doc.entities[evid]
                    if tid == ev.start_tok:
                        out.append('<EVENT eid="%s" class="%s">'
                                   % (ev.eid, ev.ev_class))
                    out.append(txp_tok)
                    if tid == ev.end_tok:
                        out.append("</EVENT>")
                elif tmxid is not None:
                    tmx = doc.entities[tmxid]
                    if tid == tmx.start_tok:
                        out.append('<TIMEX3 tid="%s" type="%s" value="%s">'
                                   % (tmx.eid.replace("tmx", "t"),
                                      tmx.ttype, tmx.value))
                    out.append(txp_tok)
                    if tid == tmx.end_tok:
                        out.append("</TIMEX3>")
                else:
                    out.append(txp_tok)
                if not matched:
                    # defensive: avoid an infinite loop on misalignment
                    w += 1
                    t += 1
    return "".join(out)


def render_timeml_document(txp_content: str, tml_content: str,
                           tt, et, ee) -> str:
    """Full S5 writer: reconstruct the TEXT with inline entity tags,
    regenerate MAKEINSTANCE rows (HashMap iteration order over entity
    ids, eiid = eid with 'e'->'ei'), and emit TLINK nodes with a global
    incrementing lid, tt then et then ee (writeTimeMLFile,
    TempEval3TaskABC.java:252-416).  `tt`/`et`/`ee` are iterables of
    (src, tgt, label).  Returns the full TimeML document string."""
    from .javamap import java_hashmap_order
    from .txp import parse_txp

    doc = parse_txp(txp_content)
    text_str = reconstruct_text(doc, split_tml_text(tml_content))

    # header: everything in the original before <TEXT
    head = tml_content[:tml_content.index("<TEXT")]
    lines = [head.rstrip("\n") + "\n"]
    lines.append("<TEXT>%s</TEXT>\n" % text_str)
    for eid in java_hashmap_order(list(doc.entities)):
        e = doc.entities[eid]
        if not e.is_event:
            continue
        lines.append(
            '<MAKEINSTANCE eventID="%s" eiid="%s" tense="%s" aspect="%s" '
            'polarity="%s"/>\n'
            % (e.eid, e.eid.replace("e", "ei"), e.tense, e.aspect,
               e.pol.upper()))
    lid = 1
    for src, tgt, rel in tt:
        lines.append('<TLINK lid="%d" timeID="%s" relatedToTime="%s" '
                     'relType="%s"/>\n'
                     % (lid, src.replace("tmx", "t"),
                        tgt.replace("tmx", "t"), rel))
        lid += 1
    for src, tgt, rel in et:
        lines.append('<TLINK lid="%d" eventInstanceID="%s" '
                     'relatedToTime="%s" relType="%s"/>\n'
                     % (lid, src.replace("e", "ei"),
                        tgt.replace("tmx", "t"), rel))
        lid += 1
    for src, tgt, rel in ee:
        lines.append('<TLINK lid="%d" eventInstanceID="%s" '
                     'relatedToEventInstance="%s" relType="%s"/>\n'
                     % (lid, src.replace("e", "ei"),
                        tgt.replace("e", "ei"), rel))
        lid += 1
    lines.append("</TimeML>\n")
    return "".join(lines)
