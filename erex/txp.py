"""TXP column-format parser (sources S1-S3 of SURVEY.md §2.1).

Re-derives the behavior of /root/reference/src/parser/TXPParser.java:39-440:
4 header comment lines, tab-separated token rows, blank line between
sentences, DCT_/ETX_ sentinel rows, BIO-style run-length span building for
timexes/events/signals, `||`-multi-valued tlink/clink cells, POS->mainPos
prefix table (TXPParser.java:104-121), tense+aspect+pol splitting
(TXPParser.java:146-152).

Deliberately replicated reference quirks (documented, not accidental):
- an entity still open at end-of-input is dropped (the reference only
  closes spans when a following row leaves the id);
- when both `tsignal` and `csignal` columns are configured, only tsignal
  is read (TXPParser.java:261-265 else-if);
- tlink dedup is on the (src, tgt) pair, first relType wins
  (TXPParser.java:413-415, Relation.java:36-47).

Our one extension: if the second header line starts with ``# FIELDS:``
the column order is taken from it, so the field list travels inside
``content`` and the engine needs no side-channel schema.
"""

from __future__ import annotations

from typing import Optional, Sequence

from .doc import Doc, Entity, Sentence, Token

DEFAULT_FIELDS = (
    "token", "token_id", "sent_id", "pos", "lemma", "deps", "tmx_id",
    "tmx_type", "tmx_value", "ner", "ev_class", "ev_id", "chunk",
    "main_verb", "connective", "tense_aspect_pol", "supersense",
    "coref_event", "tlink", "clink", "csignal",
)

# header names used in reference example files -> our field names
_FIELD_ALIASES = {
    "tokenid": "token_id", "sentid": "sent_id", "POS": "pos",
    "dep": "deps", "timex_id": "tmx_id", "timex_type": "tmx_type",
    "timex_value": "tmx_value", "entity": "ner", "pred_class": "ev_class",
    "event_id": "ev_id", "connectives": "connective",
    "tense+aspect+pol": "tense_aspect_pol", "coevent": "coref_event",
    "ss_ner": "ss_ner",
}


def main_pos_from_pos(pos: str) -> str:
    """Prefix table, TXPParser.java:104-121."""
    if not pos:
        return "O"
    c0 = pos[0]
    c1 = pos[1] if len(pos) > 1 else ""
    c2 = pos[2] if len(pos) > 2 else ""
    if c0 == "V":
        return "v"
    if c0 == "N":
        return "n"
    if c0 == "A" and c1 == "T":
        return "art"
    if c0 == "D":
        return "det"
    if c0 == "A" and c1 == "J":
        return "adj"
    if c0 == "A" and c1 == "V":
        return "adv"
    if c0 == "C" and c1 == "J":
        return "conj"
    if c0 == "C" and c1 == "R" and c2 == "D":
        return "crd"
    if c0 == "O" and c1 == "R" and c2 == "D":
        return "ord"
    if c0 == "P" and c1 == "N":
        return "pron"
    if c0 == "P" and c1 == "R":
        return "prep"
    if c0 == "T" and c1 == "O":
        return "to"
    if c0 == "P" and c1 == "O" and c2 == "S":
        return "pos"
    if c0 == "P" and c1 == "U":
        return "punc"
    if c0 == "X":
        return "neg"
    return "O"


def _parse_deps(cell: str) -> Optional[dict]:
    if cell == "O" or not cell:
        return None
    out = {}
    for d in cell.split("||"):
        parts = d.split(":")
        if len(parts) >= 2:
            out[parts[0]] = parts[1]
    return out or None


def _parse_tap(cell: str) -> tuple:
    if cell in ("O", "_", ""):
        return ("O", "O", "O")
    parts = cell.split("+")
    while len(parts) < 3:
        parts.append("O")
    return tuple(parts[:3])


def _strip_bio(t: str) -> str:
    return t[2:] if t.startswith(("B-", "I-")) else t


class TXPDocParser:
    """Per-document stateful line parser. Create one per document
    (cheap); all mutable span state (currTimex/currEvent/currSentence,
    TXPParser.java:28-32) is instance-local, so the surrounding
    map_batches function stays pure per row."""

    def __init__(self, fields: Sequence[str] = DEFAULT_FIELDS):
        self.fields = list(fields)
        self.idx = {f: i for i, f in enumerate(self.fields)}
        self.doc = Doc()
        self._tok_i = 0
        self._sent_i = 0
        self._ent_i = 0
        self._tlink_keys: set = set()
        self._curr_timex: Optional[Entity] = None
        self._curr_event: Optional[Entity] = None
        self._curr_sent: Optional[Sentence] = None
        # hot-path column indices, resolved once per document (missing
        # field -> huge sentinel so `i < len(cols)` covers it)
        gi = lambda f: self.idx.get(f, 1 << 30)  # noqa: E731
        self._ix = tuple(gi(f) for f in (
            "token_id", "sent_id", "pos", "tense_aspect_pol", "lemma",
            "chunk", "ner", "supersense", "connective", "main_verb",
            "deps", "tmx_id", "ev_id", "tmx_type", "tmx_value",
            "ev_class", "coref_event", "tlink", "clink"))

    # -- helpers -------------------------------------------------------
    def _col(self, cols: list, field: str, default: str = "O") -> str:
        i = self.idx.get(field, -1)
        if i < 0 or i >= len(cols):
            return default
        return cols[i]

    # -- span flushing -------------------------------------------------
    def _flush_timex(self) -> None:
        t = self._curr_timex
        if t is not None:
            t.index = self._ent_i
            self._ent_i += 1
            t.sent_id = self._curr_sent.sid
            self.doc.entities[t.eid] = t
            self._curr_sent.entity_arr.append(t.eid)
            self._curr_timex = None

    def _flush_event(self) -> None:
        e = self._curr_event
        if e is not None:
            e.index = self._ent_i
            self._ent_i += 1
            e.sent_id = self._curr_sent.sid
            self.doc.entities[e.eid] = e
            self._curr_sent.entity_arr.append(e.eid)
            self._curr_event = None

    def _flush_sentence(self) -> None:
        s = self._curr_sent
        if s is not None:
            s.index = self._sent_i
            self._sent_i += 1
            self.doc.sentence_arr.append(s.sid)
            self.doc.sentences[s.sid] = s
            self._curr_sent = None

    # -- main line handler ---------------------------------------------
    def parse_line(self, line: str) -> None:
        cols = line.split("\t")
        first = cols[0]
        doc = self.doc

        if "DCT_" in first:
            tmx_id = self._col(cols, "tmx_id")
            dct = Entity(eid=tmx_id, kind="TIMEX",
                         ttype=_strip_bio(self._col(cols, "tmx_type")),
                         value=self._col(cols, "tmx_value"),
                         is_dct=True, index=self._ent_i)
            self._ent_i += 1
            doc.entities[tmx_id] = dct
            doc.dct = dct
            return
        if "ETX_" in first:
            tmx_id = self._col(cols, "tmx_id")
            etx = Entity(eid=tmx_id, kind="TIMEX",
                         ttype=_strip_bio(self._col(cols, "tmx_type")),
                         value=self._col(cols, "tmx_value"),
                         is_empty=True, index=self._ent_i)
            self._ent_i += 1
            doc.entities[tmx_id] = etx
            return
        if not first:
            return

        n = len(cols)
        (i_tok, i_sent, i_pos, i_tap, i_lem, i_chk, i_ner, i_ss, i_conn,
         i_mv, i_dep, i_tmx, i_ev, i_tt, i_tv, i_ec, i_co, i_tl,
         i_cl) = self._ix
        tok_id = cols[i_tok] if i_tok < n else "O"
        sent_id = cols[i_sent] if i_sent < n else "O"
        pos = cols[i_pos] if i_pos < n else "O"
        tense, aspect, pol = _parse_tap(cols[i_tap] if i_tap < n else "O")
        tok = Token(
            tid=tok_id, sent_id=sent_id, text=first,
            lemma=cols[i_lem] if i_lem < n else "O", pos=pos,
            mainpos=main_pos_from_pos(pos),
            chunk=cols[i_chk] if i_chk < n else "O",
            ner=cols[i_ner] if i_ner < n else "O",
            supersense=cols[i_ss] if i_ss < n else "O",
            conn=cols[i_conn] if i_conn < n else "O",
            main_verb=(cols[i_mv] if i_mv < n else "O") == "mainVb",
            deps=_parse_deps(cols[i_dep] if i_dep < n else "O"),
            tense=tense, aspect=aspect, pol=pol,
            index=self._tok_i,
        )
        self._tok_i += 1
        doc.token_arr.append(tok_id)
        doc.tokens[tok_id] = tok

        # sentence run-length
        if self._curr_sent is None:
            self._curr_sent = Sentence(sent_id, tok_id, tok_id)
        elif sent_id == self._curr_sent.sid:
            self._curr_sent.end_tok = tok_id
        else:
            self._flush_sentence()
            self._curr_sent = Sentence(sent_id, tok_id, tok_id)

        tmx_id = cols[i_tmx] if i_tmx < n else "O"
        ev_id = cols[i_ev] if i_ev < n else "O"

        # timex run-length (TXPParser.java:267-304)
        ct = self._curr_timex
        if ct is None and tmx_id != "O":
            tok.timex_id = tmx_id
            self._curr_timex = Entity(
                eid=tmx_id, kind="TIMEX", start_tok=tok_id, end_tok=tok_id,
                ttype=_strip_bio(cols[i_tt] if i_tt < n else "O"),
                value=cols[i_tv] if i_tv < n else "O")
        elif ct is not None and tmx_id == ct.eid:
            tok.timex_id = tmx_id
            ct.end_tok = tok_id
        elif ct is not None and tmx_id == "O":
            self._flush_timex()
        elif ct is not None:
            self._flush_timex()
            tok.timex_id = tmx_id
            self._curr_timex = Entity(
                eid=tmx_id, kind="TIMEX", start_tok=tok_id, end_tok=tok_id,
                ttype=_strip_bio(cols[i_tt] if i_tt < n else "O"),
                value=cols[i_tv] if i_tv < n else "O")

        # coref
        coref_cell = cols[i_co] if i_co < n else "O"
        coref = coref_cell.split(":") if coref_cell not in ("O", "_", "") else []

        # event run-length (TXPParser.java:312-351); note: a token that is
        # part of a timex never opens an event (`&& tmx_id.equals("O")`).
        ce = self._curr_event
        if ce is None and ev_id != "O" and tmx_id == "O":
            tok.event_id = ev_id
            self._curr_event = Entity(
                eid=ev_id, kind="EVENT", start_tok=tok_id, end_tok=tok_id,
                ev_class=cols[i_ec] if i_ec < n else "O",
                tense=tense, aspect=aspect, pol=pol, coref=list(coref))
        elif ce is not None and ev_id == ce.eid:
            tok.event_id = ev_id
            ce.end_tok = tok_id
        elif ce is not None and ev_id == "O":
            self._flush_event()
        elif ce is not None:
            self._flush_event()
            tok.event_id = ev_id
            self._curr_event = Entity(
                eid=ev_id, kind="EVENT", start_tok=tok_id, end_tok=tok_id,
                ev_class=cols[i_ec] if i_ec < n else "O",
                tense=tense, aspect=aspect, pol=pol, coref=list(coref))

        # tlink / clink cells (only on entity-bearing rows,
        # TXPParser.java:395-436)
        if tmx_id != "O" or ev_id != "O":
            tcell = cols[i_tl] if i_tl < n else ""
            if tcell and tcell not in ("O", "_NULL_"):
                for t in tcell.split("||"):
                    parts = t.split(":")
                    if len(parts) == 3:
                        key = (parts[0], parts[1])
                        if key not in self._tlink_keys:
                            self._tlink_keys.add(key)
                            doc.tlinks.append((parts[0], parts[1], parts[2]))
                        doc.tlink_types[parts[0] + "," + parts[1]] = parts[2]
            ccell = cols[i_cl] if i_cl < n else ""
            if ccell and ccell not in ("O", "_NULL_"):
                for c in ccell.split("||"):
                    parts = c.split(":")
                    if len(parts) >= 2:
                        pair = (parts[0], parts[1])
                        if pair not in doc.clinks:
                            doc.clinks.append(pair)

    def finish(self) -> Doc:
        # the reference closes only the last *sentence* (TXPParser.java:56-60)
        self._flush_sentence()
        return self.doc


def _resolve_fields(header_line: str) -> Optional[list]:
    if not header_line.startswith("# FIELDS:"):
        return None
    raw = header_line[len("# FIELDS:"):].strip().split("\t")
    fields = [_FIELD_ALIASES.get(f, f) for f in raw if f]
    # The reference's 24-column example files label their final TLINK
    # column "O" in the header; the real layout is known only to the
    # hard-coded Field[] in TempRelPro.java's main (fieldsFile, where
    # column 24 is Field.tlink).
    if fields and fields[-1] == "O" and "tlink" not in fields:
        fields[-1] = "tlink"
    return fields


def parse_txp(content: str, fields: Sequence[str] = None,
              name: str = "TEXT") -> Doc:
    """Parse a whole TXP document from a string (one corpus-table row's
    ``content``). The first 4 lines are header comments; a ``# FIELDS:``
    line overrides the column order."""
    lines = content.split("\n")
    header, body = lines[:4], lines[4:]
    if fields is None:
        for h in header:
            f = _resolve_fields(h)
            if f:
                fields = f
                break
        else:
            fields = DEFAULT_FIELDS
    p = TXPDocParser(fields)
    p.doc.name = name
    for line in body:
        p.parse_line(line)
    return p.finish()


def parse_txp_lines(lines: Sequence[str],
                    fields: Sequence[str] = DEFAULT_FIELDS) -> Doc:
    """In-memory lines API (TXPParser.parseLines, TXPParser.java:67-80):
    no header skipping."""
    p = TXPDocParser(fields)
    for line in lines:
        p.parse_line(line)
    return p.finish()
