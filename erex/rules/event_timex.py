"""Event-timex rule sieve (R2).

Re-derives /root/reference/src/model/rule/EventTimexRelationRule.java:17-197.

Deliberate reference quirks kept:
- the constructor maps the timespan result 'TMX-BEGIN' -> BEGUN_BY but
  compares against 'TMX_END' (underscore) while getTimexRule returns
  'TMX-END' (hyphen), so the END half never overrides the
  preposition-derived label (lines 28-34);
- the MEASURE post-check reads the field before setMeasureRel runs, so
  it never fires from the production entry points (lines 17-21, 35-37);
  `measure_rel=True` here implements the 5-arg constructor's evident
  intent (DURATION timexes labeled MEASURE, EntityEnum.java:15) as an
  opt-in, applied AFTER every other branch exactly where line 35 sits;
- `until/till` requires event polarity POS (upper-case attr from the
  entity, line 133-135);
- the preposition context is the single lemma before the timex span
  (getString over [tidxStart-1, tidxStart-1], lines 100-104).
"""

from __future__ import annotations

from ..doc import Doc, Entity

_DUR_DURING = ("for", "during", "through", "throughout")
_DUR_IN = ("in", "within")
_DATE_IN = ("in", "at", "on")


def _lemma_before(doc: Doc, tok_index: int) -> str:
    if tok_index - 1 < 0:
        return ""
    return doc.tokens[doc.token_arr[tok_index - 1]].lemma.lower()


def event_timex_rule(doc: Doc, ev: Entity, tmx: Entity, dep_path: str,
                     measure_rel: bool = False) -> str:
    """Label for an (event, timex) pair (already event-first) or 'O'."""
    if measure_rel and tmx.ttype == "DURATION":
        # unconditional last-step override (EventTimexRelationRule.java:35-37
        # — no DCT/empty gate, wins over every rule branch below)
        return "MEASURE"
    rel = "O"
    if not tmx.is_dct and not tmx.is_empty:
        if ev.sent_id != tmx.sent_id:
            return "O"
        s = doc.sentences[tmx.sent_id]
        ent_arr = s.entity_arr
        try:
            eidx = ent_arr.index(tmx.eid)
        except ValueError:
            return "O"
        tidx_start = doc.tokens[tmx.start_tok].index
        tidx_start_sent = doc.tokens[s.start_tok].index
        if tidx_start <= tidx_start_sent:
            return "O"

        timespan = "O"
        if ("TMP" in dep_path and "OBJ" not in dep_path
                and "SUB" not in dep_path and "NMOD" not in dep_path):
            before = _lemma_before(doc, tidx_start)
            if before in _DUR_DURING and tmx.ttype == "DURATION":
                rel = "BEFORE" if "OPRD-IM" in dep_path else "DURING"
            elif before in _DUR_IN and tmx.ttype == "DURATION":
                rel = "BEFORE" if "OPRD-IM" in dep_path else "IS_INCLUDED"
            elif before in _DATE_IN and tmx.ttype in ("DATE", "TIME"):
                rel = "IS_INCLUDED"
            elif before == "after":
                rel = "AFTER"
            elif before == "before":
                rel = "BEFORE"
            elif before in ("from", "since"):
                rel = "BEGUN_BY"
            elif before in ("until", "till") and ev.pol == "POS":
                rel = "ENDED_BY"
            else:
                rel = "IS_INCLUDED"

        # timespan constructions: tmx is the BEGIN or END of a range
        if (eidx < len(ent_arr) - 1
                and doc.entities[ent_arr[eidx + 1]].is_timex):
            tmx2 = doc.entities[ent_arr[eidx + 1]]
            if tmx2.ttype in ("DATE", "TIME"):
                b1 = _lemma_before(doc, tidx_start)
                b2 = _lemma_before(doc, doc.tokens[tmx2.start_tok].index)
                if ((b1 == "between" and b2 == "and")
                        or (b1 == "from" and b2 in ("to", "until", "till"))
                        or b2 == "-" or b2 in ("until", "till")):
                    timespan = "TMX-BEGIN"
        elif eidx > 0 and doc.entities[ent_arr[eidx - 1]].is_timex:
            tmx1 = doc.entities[ent_arr[eidx - 1]]
            if tmx1.ttype in ("DATE", "TIME"):
                b1 = _lemma_before(doc, doc.tokens[tmx1.start_tok].index)
                b2 = _lemma_before(doc, tidx_start)
                if ((b1 == "between" and b2 == "and")
                        or (b1 == "from" and b2 in ("to", "until", "till"))
                        or b2 == "-" or b2 == "until"):
                    timespan = "TMX-END"

        if timespan == "TMX-BEGIN":
            rel = "BEGUN_BY"
        # 'TMX-END' intentionally does NOT override (reference quirk)
        return rel

    if tmx.is_dct:
        if ev.tense == "FUTURE":
            return "AFTER"
        if ev.tense == "PRESENT" and ev.aspect in (
                "PROGRESSIVE", "PERFECTIVE_PROGRESSIVE"):
            return "INCLUDES"
        if ev.tense == "PAST" and ev.aspect == "PERFECTIVE":
            return "BEFORE"
    return "O"
