"""S11: TimeML -> column-format converter (and a gold-TimeML renderer).

Functional re-derivation of the reference CLI
/root/reference/src/parser/convertTimeMLToColumns.py:1-84, whose actual
conversion core (``from converter import TimeMLToColumns``) is an
external Python-2 package that does not ship with the reference and
depends on TextPro/Stanford for tokenization.  Exact output parity is
therefore impossible by construction; this module provides the same
*capability* — turn a ``.tml`` document into the tab-separated column
layout the TXP source stage (S1/S2, erex/txp.py) consumes — with two
documented seams:

- tokenization/sentence-splitting is a deterministic single-regex
  tokenizer (``TOKEN_RE``) chosen for Python-``re`` / RE2 semantic
  identity so a DuckDB oracle can recount tokens from the raw XML
  (same trick as ops/text.py's BPE token counter);
- TextPro/MATE-derived columns (POS, deps, chunks, roles, supersenses,
  signals) are emitted as ``O`` — the reference needs the external
  TextPro pipeline for those; lemma falls back to the lowercased token.

Everything TimeML itself carries survives the round trip: EVENT spans
(eid + class), TIMEX3 spans (BIO type + value), the DCT sentinel row,
MAKEINSTANCE tense/aspect/polarity, and TLINK/CLINK cells resolved
through the instance map (reusing the S4 reader, erex/timeml.py).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

from .timeml import parse_timeml, unescape_token
from .txp import DEFAULT_FIELDS, parse_txp

# One pattern, both engines: word cores with interior '/./- joiners,
# else any single non-space, non-alphanumeric char.  No lookarounds /
# backrefs, so Python `re` findall == DuckDB (RE2) regexp_extract_all.
TOKEN_PATTERN = r"[A-Za-z0-9]+(?:['./-][A-Za-z0-9]+)*|[^\sA-Za-z0-9]"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# sentence rule: every terminator token ends the current sentence (a
# trailing run without one forms a final sentence) — SQL-replicable as
# count(terminators) + (last token not a terminator).
_TERMINATORS = frozenset({".", "!", "?"})

# inverse of erex.timeml._UNESCAPE for the characters the TXP format
# escapes (bracket family + double quote; plain ' is passed through).
_ESCAPE = (('"', "''"), ("{", "-LCB-"), ("}", "-RCB-"),
           ("(", "-LRB-"), (")", "-RRB-"), ("[", "-LSB-"), ("]", "-RSB-"))


def _escape_token(tok: str) -> str:
    for a, b in _ESCAPE:
        tok = tok.replace(a, b)
    return tok


def _walk_text(te):
    """Yield (text_chunk, entity_dict | None) in document order from the
    TEXT element; EVENT/TIMEX3 children tag their (flattened) inner
    text. Any OTHER inline element is recursed into, so an EVENT or
    TIMEX3 nested inside a wrapper tag (e.g. <s>, <turn>) keeps its
    annotation instead of being flattened to plain text."""
    if te.text:
        yield te.text, None
    for child in te:
        if child.tag == "EVENT":
            yield "".join(child.itertext()), \
                {"kind": "EVENT", "eid": child.get("eid", ""),
                 "class": child.get("class", "O")}
        elif child.tag == "TIMEX3":
            yield "".join(child.itertext()), \
                {"kind": "TIMEX",
                 "tid": child.get("tid", "t?").replace("t", "tmx", 1),
                 "type": child.get("type", "O"),
                 "value": child.get("value", "O")}
        else:
            yield from _walk_text(child)
        if child.tail:
            yield child.tail, None


def timeml_to_columns(tml_content: str, doc_name: str = "") -> str:
    """Convert one TimeML document string to the TXP column format
    (header + DCT row + per-token rows, blank line between sentences).
    The output parses with erex.txp.parse_txp (S2) and recovers every
    TimeML-carried annotation."""
    root = ET.fromstring(tml_content)
    meta = parse_timeml(tml_content)

    # DCT: the CREATION_TIME timex (conventionally outside TEXT)
    dct_id, dct_type, dct_value = "tmx0", "DATE", meta["dct_value"] or ""
    for tx in root.iter("TIMEX3"):
        if tx.get("functionInDocument", "") == "CREATION_TIME":
            dct_id = tx.get("tid", "t0").replace("t", "tmx", 1)
            dct_type = tx.get("type", "DATE")
            dct_value = tx.get("value", dct_value)
            break

    te = root.find("TEXT")
    # token stream: (text, sent_id, entity, first_of_entity)
    toks: list = []
    sid = 1
    pending_break = False
    for chunk, ent in (_walk_text(te) if te is not None else ()):
        first = True
        for tok in TOKEN_RE.findall(chunk):
            if pending_break:
                sid += 1
                pending_break = False
            toks.append((tok, sid, ent, first and ent is not None))
            first = False
            if tok in _TERMINATORS:
                pending_break = True

    # entity id -> first row index (for tlink/clink cell placement)
    first_row: dict = {}
    for i, (_tok, _sid, ent, is_first) in enumerate(toks):
        if is_first:
            key = ent["eid"] if ent["kind"] == "EVENT" else ent["tid"]
            first_row.setdefault(key, i)

    # cell placement: on the first token row of the source entity; a
    # token-less source (the DCT) falls back to the target's row — the
    # S2 parser reads cells off any entity-bearing row, and the cell
    # text itself carries the (src, tgt) pair.
    tl_cells: dict = {}
    cl_cells: dict = {}
    for src, tgt, rel, _deduced in meta["tlinks"]:
        r = first_row.get(src, first_row.get(tgt))
        if r is not None:
            tl_cells.setdefault(r, []).append("%s:%s:%s" % (src, tgt, rel))
    for src, tgt in meta["clinks"]:
        r = first_row.get(src, first_row.get(tgt))
        if r is not None:
            cl_cells.setdefault(r, []).append("%s:%s" % (src, tgt))

    idx = {f: i for i, f in enumerate(DEFAULT_FIELDS)}
    ncols = len(DEFAULT_FIELDS)

    def row(**kv) -> str:
        cols = ["O"] * ncols
        for f, v in kv.items():
            cols[idx[f]] = v
        return "\t".join(cols)

    lines = ["# FILE: %s" % (doc_name or meta.get("docid", "") or "TEXT"),
             "# DATE: %s" % dct_value,
             "# FIELDS: %s" % "\t".join(DEFAULT_FIELDS),
             ""]
    lines.append(row(token="DCT_%s" % dct_value, tmx_id=dct_id,
                     tmx_type="B-%s" % dct_type, tmx_value=dct_value))
    lines.append("")

    tap = meta["tap"]
    prev_sid = None
    for i, (tok, s, ent, is_first) in enumerate(toks):
        if prev_sid is not None and s != prev_sid:
            lines.append("")
        prev_sid = s
        kv = {"token": _escape_token(tok), "token_id": "t%d" % (i + 1),
              "sent_id": str(s), "lemma": tok.lower()}
        if ent is not None and ent["kind"] == "TIMEX":
            kv["tmx_id"] = ent["tid"]
            kv["tmx_type"] = ("B-" if is_first else "I-") + ent["type"]
            kv["tmx_value"] = ent["value"]
        elif ent is not None:
            kv["ev_id"] = ent["eid"]
            kv["ev_class"] = ent["class"]
            t_a_p = tap.get(ent["eid"])
            if t_a_p:
                tense, aspect, pol = (t_a_p.split("+") + ["", "", ""])[:3]
                if pol in ("POS", "NEG"):  # TXP convention: lowercase
                    pol = pol.lower()
                cell = "%s+%s+%s" % (tense or "O", aspect or "O", pol or "O")
                if cell != "O+O+O":
                    kv["tense_aspect_pol"] = cell
        if i in tl_cells:
            kv["tlink"] = "||".join(tl_cells[i])
        if i in cl_cells:
            kv["clink"] = "||".join(cl_cells[i])
        lines.append(row(**kv))
    lines.append("")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Gold-TimeML renderer: TXP -> a valid TimeML document carrying the gold
# annotation (the inverse direction, used to derive a deterministic
# TimeML corpus from the synthetic TXP corpus for converter tests and
# the driver oracle; distinct from the S5 *system* writer which needs
# the original .tml for TEXT alignment).
# ---------------------------------------------------------------------------
def render_gold_timeml(txp_content: str, doc_name: str = "") -> str:
    doc = parse_txp(txp_content, name=doc_name or "TEXT")
    out = ['<?xml version="1.0" ?>', "<TimeML>",
           "<DOCID>%s</DOCID>" % escape(doc.name)]
    dct_val = doc.dct.value if doc.dct is not None else ""
    dct_type = doc.dct.ttype if doc.dct is not None else "DATE"
    dct_tid = (doc.dct.eid.replace("tmx", "t", 1)
               if doc.dct is not None else "t0")
    out.append('<DCT><TIMEX3 tid=%s type=%s value=%s '
               'functionInDocument="CREATION_TIME">%s</TIMEX3></DCT>'
               % (quoteattr(dct_tid), quoteattr(dct_type),
                  quoteattr(dct_val), escape(dct_val)))

    # TEXT: tokens space-joined, entity tags at span boundaries
    parts = ["<TEXT>"]
    open_entity = None
    for si, sid in enumerate(doc.sentence_arr):
        sent = doc.sentences[sid]
        s_i = doc.tokens[sent.start_tok].index
        e_i = doc.tokens[sent.end_tok].index
        if si:
            parts.append("\n")
        for ti in range(s_i, e_i + 1):
            tid = doc.token_arr[ti]
            tok = doc.tokens[tid]
            eid = tok.event_id or tok.timex_id
            if ti > s_i or si:
                parts.append(" ")
            if eid and eid != open_entity:
                e = doc.entities[eid]
                if e.is_event:
                    parts.append('<EVENT eid=%s class=%s>'
                                 % (quoteattr(e.eid),
                                    quoteattr(e.ev_class)))
                else:
                    parts.append('<TIMEX3 tid=%s type=%s value=%s>'
                                 % (quoteattr(e.eid.replace("tmx", "t", 1)),
                                    quoteattr(e.ttype), quoteattr(e.value)))
                open_entity = eid
            parts.append(escape(unescape_token(tok.text)))
            if eid and doc.entities[eid].end_tok == tid:
                parts.append("</EVENT>" if doc.entities[eid].is_event
                             else "</TIMEX3>")
                open_entity = None
    parts.append("</TEXT>")
    out.append("".join(parts))

    for eid, e in doc.entities.items():
        if not e.is_event:
            continue
        out.append('<MAKEINSTANCE eventID=%s eiid=%s tense=%s aspect=%s '
                   'polarity=%s/>'
                   % (quoteattr(e.eid), quoteattr(e.eid.replace("e", "ei", 1)),
                      quoteattr(e.tense), quoteattr(e.aspect),
                      quoteattr(e.pol.upper())))

    def _attr(mid: str, src_side: bool) -> str:
        if mid.startswith("tmx"):
            a = "timeID" if src_side else "relatedToTime"
            return "%s=%s" % (a, quoteattr(mid.replace("tmx", "t", 1)))
        a = "eventInstanceID" if src_side else "relatedToEventInstance"
        return "%s=%s" % (a, quoteattr(mid.replace("e", "ei", 1)))

    lid = 1
    for src, tgt, rel in doc.tlinks:
        out.append('<TLINK lid=%s %s %s relType=%s/>'
                   % (quoteattr("l%d" % lid), _attr(src, True),
                      _attr(tgt, False), quoteattr(rel)))
        lid += 1
    for src, tgt in doc.clinks:
        out.append('<CLINK lid=%s %s %s/>'
                   % (quoteattr("l%d" % lid), _attr(src, True),
                      _attr(tgt, False)))
        lid += 1
    out.append("</TimeML>")
    return "\n".join(out)


def columns_batch(batch, name_col: str = "path", tml_col: str = "tml"):
    """map_batches stage: (path, tml) -> (path, content) column files."""
    import pyarrow as pa
    names = batch.column(name_col).to_pylist()
    outs = [timeml_to_columns(t, n) for n, t in
            zip(names, batch.column(tml_col).to_pylist())]
    return pa.table({name_col: pa.array(names, pa.string()),
                     "content": pa.array(outs, pa.string())})
