"""Deterministic synthetic TXP corpus generator (FIXTURES).

Builds documents in the reference's TXP column format (SURVEY.md §1.3,
data/example_TXP/*.txp layout) from a seed, and packs them into the
driver-mandated corpus table shape ``(repo, path, commit, lang, content)``
with one whole document per row. Every linguistic phenomenon the rule
sieves dispatch on is emitted by some template:

  T1 reporting construction  -> OBJ-SUB path, reporting rules (R3)
  T2 preposition + timex     -> TMP-PMOD path, R2 preposition branches
  T3 aspectual 'to'-infinitive -> OPRD-IM path, BEGINS/ENDS/... (R3)
  T4 causal verb (active/passive/periphrastic) -> R5 CLINK/CLINK-R
  T5 two dated clauses       -> T-T grid material (R1)
  T6 'from X to Y' timespan  -> BEGUN_BY + TMX-BEGIN/END constructions
  T7 tense/aspect contrast   -> Reichenbach rules, E-DCT rules
  T8 causal signal sentence  -> CLINK candidate gating (M9/M10)

Everything is derived from `random.Random(seed)` — no wall clock, no
external data. Column order is DEFAULT_FIELDS and is embedded in the
``# FIELDS:`` header so the content is self-describing.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

from .txp import DEFAULT_FIELDS

NOUNS = ["company", "market", "government", "investor", "profit", "sale",
         "price", "war", "crisis", "growth", "decline", "strike", "deal",
         "attack", "election", "storm", "rally", "closure", "merger",
         "protest"]
VERBS = ["increase", "drop", "rise", "fall", "announce", "launch", "approve",
         "expand", "cut", "sign", "open", "close", "move", "surge", "slip"]
REPORT_VERBS = ["say", "report", "state", "claim", "add"]
ASPECT_VERBS = ["begin", "start", "stop", "finish", "continue", "remain",
                "plan", "want", "try", "commence", "cease", "keep"]
CAUSAL_ACTIVE = ["cause", "force", "prompt", "trigger", "push", "drive"]
CAUSAL_PERI = ["force", "prompt", "persuade", "push", "allow", "help"]
PREPS_TIMEX = ["in", "on", "at", "for", "during", "after", "before", "from",
               "since", "until", "within", "through", "by", "over"]
TENSES = ["PAST", "PRESENT", "FUTURE"]
ASPECTS = ["NONE", "PERFECTIVE", "PROGRESSIVE", "PERFECTIVE_PROGRESSIVE"]
EV_CLASSES = ["OCCURRENCE", "OCCURRENCE", "OCCURRENCE", "I_ACTION",
              "I_STATE", "STATE", "PERCEPTION"]

_POS_OF_TENSE = {"PAST": "VVD", "PRESENT": "VVZ", "FUTURE": "VVB",
                 "NONE": "VVB"}


def _timex_value(rng: random.Random) -> tuple:
    """(type, value) drawn over the full R1 value lattice."""
    y = rng.choice([1987, 1988, 1989, 1990, 1991])
    kind = rng.randrange(10)
    if kind <= 2:
        return "DATE", "%d-%02d-%02d" % (y, rng.randrange(1, 13),
                                         rng.randrange(1, 29))
    if kind == 3:
        return "DATE", "%d-%02d" % (y, rng.randrange(1, 13))
    if kind == 4:
        return "DATE", str(y)
    if kind == 5:
        return "DATE", "%d-W%02d" % (y, rng.randrange(1, 53))
    if kind == 6:
        return "DATE", "%d-Q%d" % (y, rng.randrange(1, 5))
    if kind == 7:
        return "DATE", rng.choice(["198X", "19XX", "PAST_REF", "PRESENT_REF",
                                   "FUTURE_REF"])
    if kind == 8:
        if rng.random() < 0.5:
            return "TIME", "%d-%02d-%02dT%02d:%02d" % (
                y, rng.randrange(1, 13), rng.randrange(1, 29),
                rng.randrange(0, 24), rng.randrange(0, 60))
        return "TIME", "%d-%02d-%02dT%s" % (
            y, rng.randrange(1, 13), rng.randrange(1, 29),
            rng.choice(["MO", "AF", "EV", "NI"]))
    return "DURATION", rng.choice(["P3D", "P2W", "P1M", "PXD", "P2Y"])


class _SentBuilder:
    """Accumulates token rows for one sentence."""

    def __init__(self, doc: "_DocBuilder", sid: int):
        self.doc = doc
        self.sid = sid
        self.rows = []           # list of dicts keyed by field name
        self.entities = []       # (eid, kind) in order

    def tok(self, text, pos, lemma=None, deps="O", tmx="O", tmx_type="O",
            tmx_value="O", ev_class="O", ev_id="O", chunk="O", mv=False,
            conn="O", tap="O", ss="O", coref="O"):
        tid = "t%d" % self.doc.next_tok
        self.doc.next_tok += 1
        self.rows.append({
            "token": text, "token_id": tid, "sent_id": str(self.sid),
            "pos": pos, "lemma": lemma if lemma is not None else text.lower(),
            "deps": deps, "tmx_id": tmx, "tmx_type": tmx_type,
            "tmx_value": tmx_value, "ner": "O", "ev_class": ev_class,
            "ev_id": ev_id, "chunk": chunk,
            "main_verb": "mainVb" if mv else "O", "connective": conn,
            "tense_aspect_pol": tap, "supersense": ss, "coref_event": coref,
            "tlink": "O", "clink": "O", "csignal": "O",
        })
        return tid

    def peek_tid(self, ahead=0):
        return "t%d" % (self.doc.next_tok + ahead)

    def new_event(self, cls="OCCURRENCE"):
        eid = "e%d" % self.doc.next_ev
        self.doc.next_ev += 1
        self.entities.append((eid, "EVENT"))
        self.doc.events.append(eid)
        return eid

    def new_timex(self):
        tid = "tmx%d" % self.doc.next_tmx
        self.doc.next_tmx += 1
        self.entities.append((tid, "TIMEX"))
        self.doc.timexes.append(tid)
        return tid


class _DocBuilder:
    def __init__(self, seed: int):
        self.rng = random.Random(seed)
        self.next_tok = 1
        self.next_ev = 1
        self.next_tmx = 1
        self.events: list = []
        self.timexes: list = []
        self.sents: list = []

    def sent(self, sid):
        s = _SentBuilder(self, sid)
        self.sents.append(s)
        return s


def _tap(tense, aspect, pol="pos"):
    return "%s+%s+%s" % (tense, aspect, pol)


# ---------------------------------------------------------------------------
# sentence templates
# ---------------------------------------------------------------------------
def _tmpl_reporting(s: _SentBuilder, rng):
    n1 = rng.choice(NOUNS)
    n2 = rng.choice(NOUNS)
    rv = rng.choice(REPORT_VERBS)
    v2 = rng.choice(VERBS)
    t_gov = rng.choice(["PRESENT", "PAST"])
    t_dep = rng.choice(TENSES)
    a_dep = rng.choice(ASPECTS[:3])
    t_n1 = s.peek_tid(1)
    t_rv = s.peek_tid(2)
    t_that = s.peek_tid(3)
    t_n2 = s.peek_tid(5)
    t_v2 = s.peek_tid(6)
    t_dot = s.peek_tid(7)
    s.tok("The", "AT0", "the", chunk="B-NP")
    s.tok(n1, "NN1", deps="O", chunk="I-NP")
    e1 = s.new_event("REPORTING")
    s.tok(rv + ("s" if t_gov == "PRESENT" else "ed"),
          _POS_OF_TENSE[t_gov], rv,
          deps="%s:SBJ||%s:OBJ||%s:P" % (t_n1, t_that, t_dot),
          ev_class="REPORTING", ev_id=e1, chunk="B-VP", mv=True,
          tap=_tap(t_gov, "NONE"))
    s.tok("that", "CJT", "that", deps="%s:SUB" % t_v2, chunk="B-SBAR")
    s.tok("the", "AT0", "the", chunk="B-NP")
    s.tok(n2, "NN1", chunk="I-NP")
    e2 = s.new_event()
    s.tok(v2 + "ed", _POS_OF_TENSE[t_dep], v2,
          deps="%s:SBJ" % t_n2, ev_class=rng.choice(EV_CLASSES),
          ev_id=e2, chunk="B-VP", tap=_tap(t_dep, a_dep))
    s.tok(".", "PUN", ".")
    return [e1, e2]


def _tmpl_event_timex(s: _SentBuilder, rng):
    n1 = rng.choice(NOUNS)
    v = rng.choice(VERBS)
    prep = rng.choice(PREPS_TIMEX)
    ttype, tval = _timex_value(rng)
    tense = rng.choice(TENSES)
    aspect = rng.choice(ASPECTS)
    t_n1 = s.peek_tid(1)
    t_v = s.peek_tid(2)
    t_prep = s.peek_tid(3)
    t_tmxhead = s.peek_tid(5)
    t_dot = s.peek_tid(6)
    s.tok("The", "AT0", "the", chunk="B-NP")
    s.tok(n1, "NN1", chunk="I-NP")
    e1 = s.new_event()
    s.tok(v + "ed", _POS_OF_TENSE[tense], v,
          deps="%s:SBJ||%s:TMP||%s:P" % (t_n1, t_prep, t_dot),
          ev_class="OCCURRENCE", ev_id=e1, chunk="B-VP", mv=True,
          tap=_tap(tense, aspect))
    s.tok(prep, "PRP", prep, deps="%s:PMOD" % t_tmxhead, chunk="B-PP")
    tmx = s.new_timex()
    s.tok("the", "AT0", "the", chunk="B-NP")
    s.tok("period", "NN1", "period", tmx=tmx, tmx_type="B-" + ttype,
          tmx_value=tval, chunk="I-NP")
    s.tok(".", "PUN", ".")
    return [e1, tmx]


def _tmpl_aspectual(s: _SentBuilder, rng):
    n1 = rng.choice(NOUNS)
    av = rng.choice(ASPECT_VERBS)
    v2 = rng.choice(VERBS)
    aspect = rng.choice(["NONE", "PERFECTIVE_PROGRESSIVE"])
    t_n1 = s.peek_tid(1)
    t_av = s.peek_tid(2)
    t_to = s.peek_tid(3)
    t_v2 = s.peek_tid(4)
    t_n2 = s.peek_tid(6)
    t_dot = s.peek_tid(7)
    s.tok("The", "AT0", "the", chunk="B-NP")
    s.tok(n1, "NN1", chunk="I-NP")
    e1 = s.new_event("ASPECTUAL" if av in
                     ("begin", "start", "stop", "finish", "continue")
                     else "I_ACTION")
    s.tok(av + "ed" if not av.endswith("p") else av + "ped",
          "VVD", av, deps="%s:SBJ||%s:OPRD||%s:P" % (t_n1, t_to, t_dot),
          ev_class=("ASPECTUAL" if av in ("begin", "start", "stop",
                                          "finish", "continue", "cease",
                                          "keep", "remain", "commence")
                    else "I_ACTION"),
          ev_id=e1, chunk="B-VP", mv=True, tap=_tap("PAST", aspect))
    s.tok("to", "TO0", "to", deps="%s:IM" % t_v2, chunk="I-VP")
    e2 = s.new_event()
    s.tok(v2, "VVB", v2, deps="%s:OBJ" % t_n2, ev_class="OCCURRENCE",
          ev_id=e2, chunk="I-VP", tap=_tap("INFINITIVE", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    s.tok(rng.choice(NOUNS), "NN1", chunk="I-NP")
    s.tok(".", "PUN", ".")
    return [e1, e2]


def _tmpl_causal_active(s: _SentBuilder, rng):
    n1 = rng.choice(NOUNS)
    n2 = rng.choice(NOUNS)
    cv = rng.choice(CAUSAL_ACTIVE)
    t_n1 = s.peek_tid(1)
    t_cv = s.peek_tid(2)
    t_n2 = s.peek_tid(4)
    t_dot = s.peek_tid(5)
    s.tok("The", "AT0", "the", chunk="B-NP")
    e1 = s.new_event()
    s.tok(n1, "NN1", ev_class="OCCURRENCE", ev_id=e1, chunk="I-NP")
    s.tok(cv + "d" if cv.endswith("e") else cv + "ed", "VVD", cv,
          deps="%s:SBJ||%s:OBJ||%s:P" % (t_n1, t_n2, t_dot),
          chunk="B-VP", mv=True, tap=_tap("PAST", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    e2 = s.new_event()
    s.tok(n2, "NN1", ev_class="OCCURRENCE", ev_id=e2, chunk="I-NP")
    s.tok(".", "PUN", ".")
    s.doc.gold_clinks.append((e1, e2))
    return [e1, e2]


def _tmpl_causal_passive(s: _SentBuilder, rng):
    n1 = rng.choice(NOUNS)
    n2 = rng.choice(NOUNS)
    cv = rng.choice(CAUSAL_ACTIVE)
    t_n1 = s.peek_tid(1)
    t_was = s.peek_tid(2)
    t_cv = s.peek_tid(3)
    t_by = s.peek_tid(4)
    t_n2 = s.peek_tid(6)
    t_dot = s.peek_tid(7)
    s.tok("The", "AT0", "the", chunk="B-NP")
    e1 = s.new_event()
    s.tok(n1, "NN1", ev_class="OCCURRENCE", ev_id=e1, chunk="I-NP")
    s.tok("was", "VBD", "be",
          deps="%s:SBJ||%s:VC||%s:P" % (t_n1, t_cv, t_dot),
          chunk="B-VP", mv=True, tap=_tap("PAST", "NONE"))
    s.tok(cv + "d" if cv.endswith("e") else cv + "ed", "VVN", cv,
          deps="%s:LGS" % t_by, chunk="I-VP", tap=_tap("PAST", "NONE"))
    s.tok("by", "PRP", "by", deps="%s:PMOD" % t_n2, chunk="B-PP")
    s.tok("the", "AT0", "the", chunk="B-NP")
    e2 = s.new_event()
    s.tok(n2, "NN1", ev_class="OCCURRENCE", ev_id=e2, chunk="I-NP")
    s.tok(".", "PUN", ".")
    s.doc.gold_clinks.append((e2, e1))
    return [e1, e2]


def _tmpl_causal_peri(s: _SentBuilder, rng):
    n1 = rng.choice(NOUNS)
    n2 = rng.choice(NOUNS)
    cv = rng.choice(CAUSAL_PERI)
    v2 = rng.choice(VERBS)
    t_n1 = s.peek_tid(1)
    t_cv = s.peek_tid(2)
    t_n2 = s.peek_tid(4)
    t_to = s.peek_tid(5)
    t_v2 = s.peek_tid(6)
    t_dot = s.peek_tid(7)
    s.tok("The", "AT0", "the", chunk="B-NP")
    e1 = s.new_event()
    s.tok(n1, "NN1", ev_class="OCCURRENCE", ev_id=e1, chunk="I-NP")
    s.tok(cv + "d" if cv.endswith("e") else cv + "ed", "VVD", cv,
          deps="%s:SBJ||%s:OBJ||%s:OPRD||%s:P" % (t_n1, t_n2, t_to, t_dot),
          chunk="B-VP", mv=True, tap=_tap("PAST", "NONE"))
    s.tok("the", "AT0", "the", chunk="B-NP")
    s.tok(n2, "NN1", chunk="I-NP")
    s.tok("to", "TO0", "to", deps="%s:IM" % t_v2, chunk="I-VP")
    e2 = s.new_event()
    s.tok(v2, "VVB", v2, ev_class="OCCURRENCE", ev_id=e2, chunk="I-VP",
          tap=_tap("INFINITIVE", "NONE"))
    s.tok(".", "PUN", ".")
    s.doc.gold_clinks.append((e1, e2))
    return [e1, e2]


def _tmpl_two_timex(s: _SentBuilder, rng):
    ty1, tv1 = _timex_value(rng)
    ty2, tv2 = _timex_value(rng)
    n = rng.choice(NOUNS)
    t_n = s.peek_tid(1)
    t_v = s.peek_tid(2)
    t_on = s.peek_tid(3)
    t_tmx1 = s.peek_tid(4)
    t_and = s.peek_tid(5)
    t_until = s.peek_tid(6)
    t_tmx2 = s.peek_tid(7)
    t_dot = s.peek_tid(8)
    s.tok("The", "AT0", "the", chunk="B-NP")
    s.tok(n, "NN1", chunk="I-NP")
    e1 = s.new_event()
    s.tok("happened", "VVD", "happen",
          deps="%s:SBJ||%s:TMP||%s:P" % (t_n, t_on, t_dot),
          ev_class="OCCURRENCE", ev_id=e1, chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("on", "PRP", "on", deps="%s:PMOD||%s:ADV" % (t_tmx1, t_until),
          chunk="B-PP")
    tmx1 = s.new_timex()
    s.tok("Monday", "NP0", "monday", tmx=tmx1, tmx_type="B-" + ty1,
          tmx_value=tv1, chunk="B-NP")
    s.tok("and", "CJC", "and", chunk="O")
    s.tok("lasted", "VVD", "last", deps="%s:TMP" % s.peek_tid(1),
          chunk="B-VP", tap=_tap("PAST", "NONE"))
    tmx2 = s.new_timex()
    s.tok("Friday", "NP0", "friday", tmx=tmx2, tmx_type="B-" + ty2,
          tmx_value=tv2, chunk="B-NP")
    s.tok(".", "PUN", ".")
    return [e1, tmx1, tmx2]


def _tmpl_timespan(s: _SentBuilder, rng):
    ty1, tv1 = "DATE", "%d-%02d-%02d" % (1989, rng.randrange(1, 13),
                                         rng.randrange(1, 28))
    ty2, tv2 = "DATE", "%d-%02d-%02d" % (1989, rng.randrange(1, 13),
                                         rng.randrange(1, 29))
    n = rng.choice(NOUNS)
    t_n = s.peek_tid(1)
    t_v = s.peek_tid(2)
    t_from = s.peek_tid(3)
    t_tmx1 = s.peek_tid(4)
    t_to = s.peek_tid(5)
    t_tmx2 = s.peek_tid(6)
    t_dot = s.peek_tid(7)
    s.tok("The", "AT0", "the", chunk="B-NP")
    s.tok(n, "NN1", chunk="I-NP")
    e1 = s.new_event()
    s.tok("ran", "VVD", "run",
          deps="%s:SBJ||%s:TMP||%s:P" % (t_n, t_from, t_dot),
          ev_class="OCCURRENCE", ev_id=e1, chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("from", "PRP", "from", deps="%s:PMOD||%s:ADV" % (t_tmx1, t_to),
          chunk="B-PP")
    tmx1 = s.new_timex()
    s.tok("March", "NP0", "march", tmx=tmx1, tmx_type="B-" + ty1,
          tmx_value=tv1, chunk="B-NP")
    s.tok("to", "TO0", "to", deps="%s:PMOD" % t_tmx2, chunk="B-PP")
    tmx2 = s.new_timex()
    s.tok("June", "NP0", "june", tmx=tmx2, tmx_type="B-" + ty2,
          tmx_value=tv2, chunk="B-NP")
    s.tok(".", "PUN", ".")
    return [e1, tmx1, tmx2]


def _tmpl_tense_pair(s: _SentBuilder, rng):
    n1 = rng.choice(NOUNS)
    n2 = rng.choice(NOUNS)
    v1 = rng.choice(VERBS)
    v2 = rng.choice(VERBS)
    t1 = rng.choice(TENSES)
    a1 = rng.choice(["NONE", "PERFECTIVE", "PROGRESSIVE"])
    t2 = rng.choice(TENSES)
    a2 = rng.choice(["NONE", "PERFECTIVE"])
    t_n1 = s.peek_tid(1)
    t_v1 = s.peek_tid(2)
    s.tok("The", "AT0", "the", chunk="B-NP")
    s.tok(n1, "NN1", chunk="I-NP")
    e1 = s.new_event()
    s.tok(v1 + "ed", _POS_OF_TENSE[t1], v1, deps="%s:SBJ" % t_n1,
          ev_class="OCCURRENCE", ev_id=e1, chunk="B-VP", mv=True,
          tap=_tap(t1, a1))
    s.tok(";", "PUN", ";")
    t_n2 = s.peek_tid(1)
    s.tok("the", "AT0", "the", chunk="B-NP")
    s.tok(n2, "NN1", chunk="I-NP")
    e2 = s.new_event()
    s.tok(v2 + "ed", _POS_OF_TENSE[t2], v2, deps="%s:SBJ" % t_n2,
          ev_class="OCCURRENCE", ev_id=e2, chunk="B-VP",
          tap=_tap(t2, a2))
    s.tok(".", "PUN", ".")
    return [e1, e2]


def _tmpl_causal_signal(s: _SentBuilder, rng):
    n1 = rng.choice(NOUNS)
    n2 = rng.choice(NOUNS)
    sig = rng.choice(["because of", "due to", "as a result of"])
    sig_words = sig.split(" ")
    t_first = s.peek_tid(0)
    s.tok(sig_words[0].capitalize(), "PRP", sig_words[0], chunk="B-PP",
          conn="Contingency")
    for w in sig_words[1:]:
        s.tok(w, "PRP", w, chunk="I-PP", conn="Contingency")
    s.tok("the", "AT0", "the", chunk="B-NP")
    e1 = s.new_event()
    s.tok(n1, "NN1", ev_class="OCCURRENCE", ev_id=e1, chunk="I-NP")
    s.tok(",", "PUN", ",")
    s.tok("the", "AT0", "the", chunk="B-NP")
    s.tok(n2, "NN1", chunk="I-NP")
    e2 = s.new_event()
    t_prev = "t%d" % (s.doc.next_tok - 1)
    s.tok("suffered", "VVD", "suffer", deps="%s:SBJ" % t_prev,
          ev_class="OCCURRENCE", ev_id=e2, chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok(".", "PUN", ".")
    r = rng.random()
    if r < 0.4:
        s.doc.gold_clinks.append((e2, e1))
    elif r < 0.8:
        s.doc.gold_clinks.append((e1, e2))
    return [e1, e2]


def _tmpl_passive_ee(s: _SentBuilder, rng):
    """'The deal(e1) was announced(e2-less)…' — adjacent noun-event +
    agent noun-event with an LGS-PMOD path (R3 -> AFTER)."""
    n1 = rng.choice(NOUNS)
    n2 = rng.choice(NOUNS)
    v = rng.choice(VERBS)
    t_n1 = s.peek_tid(1)
    t_was = s.peek_tid(2)
    t_v = s.peek_tid(3)
    t_by = s.peek_tid(4)
    t_n2 = s.peek_tid(6)
    t_dot = s.peek_tid(7)
    s.tok("The", "AT0", "the", chunk="B-NP")
    e1 = s.new_event()
    s.tok(n1, "NN1", ev_class="OCCURRENCE", ev_id=e1, chunk="I-NP")
    s.tok("was", "VBD", "be",
          deps="%s:SBJ||%s:VC||%s:P" % (t_n1, t_v, t_dot),
          chunk="B-VP", mv=True, tap=_tap("PAST", "NONE"))
    s.tok(v + "ed", "VVN", v, deps="%s:LGS" % t_by, chunk="I-VP",
          tap=_tap("PAST", "NONE"))
    s.tok("by", "PRP", "by", deps="%s:PMOD" % t_n2, chunk="B-PP")
    s.tok("the", "AT0", "the", chunk="B-NP")
    e2 = s.new_event()
    s.tok(n2, "NN1", ev_class="OCCURRENCE", ev_id=e2, chunk="I-NP")
    s.tok(".", "PUN", ".")
    return [e1, e2]


def _tmpl_between_timespan(s: _SentBuilder, rng):
    """'… happened between T1 and T2' — TMX-BEGIN/TMX-END timespan
    constructions (R2; the END half exercises the reference's
    underscore quirk)."""
    tv1 = "%d-%02d-%02d" % (1989, rng.randrange(1, 7), rng.randrange(1, 28))
    tv2 = "%d-%02d-%02d" % (1989, rng.randrange(7, 13), rng.randrange(1, 29))
    n = rng.choice(NOUNS)
    t_n = s.peek_tid(1)
    t_bw = s.peek_tid(3)
    t_tmx1 = s.peek_tid(4)
    t_and = s.peek_tid(5)
    t_tmx2 = s.peek_tid(6)
    t_dot = s.peek_tid(7)
    s.tok("The", "AT0", "the", chunk="B-NP")
    s.tok(n, "NN1", chunk="I-NP")
    e1 = s.new_event()
    s.tok("happened", "VVD", "happen",
          deps="%s:SBJ||%s:TMP||%s:P" % (t_n, t_bw, t_dot),
          ev_class="OCCURRENCE", ev_id=e1, chunk="B-VP", mv=True,
          tap=_tap("PAST", "NONE"))
    s.tok("between", "PRP", "between", deps="%s:PMOD||%s:ADV"
          % (t_tmx1, t_and), chunk="B-PP")
    tmx1 = s.new_timex()
    s.tok("May", "NP0", "may", tmx=tmx1, tmx_type="B-DATE", tmx_value=tv1,
          chunk="B-NP")
    s.tok("and", "CJC", "and", deps="%s:CONJ" % t_tmx2, chunk="O")
    tmx2 = s.new_timex()
    s.tok("October", "NP0", "october", tmx=tmx2, tmx_type="B-DATE",
          tmx_value=tv2, chunk="B-NP")
    s.tok(".", "PUN", ".")
    return [e1, tmx1, tmx2]


_TEMPLATES = [_tmpl_reporting, _tmpl_event_timex, _tmpl_aspectual,
              _tmpl_causal_active, _tmpl_causal_passive, _tmpl_causal_peri,
              _tmpl_two_timex, _tmpl_timespan, _tmpl_tense_pair,
              _tmpl_causal_signal, _tmpl_passive_ee, _tmpl_between_timespan]


def generate_txp(doc_seed: int, n_sentences: int = None) -> str:
    """One deterministic TXP document as a string."""
    b = _DocBuilder(doc_seed)
    b.gold_clinks = []
    rng = b.rng
    if n_sentences is None:
        n_sentences = rng.randrange(4, 9)
    dct_value = "%d-%02d-%02d" % (1989, rng.randrange(1, 13),
                                  rng.randrange(1, 29))
    sent_entities = []
    for sid in range(1, n_sentences + 1):
        tmpl = rng.choice(_TEMPLATES)
        s = b.sent(sid)
        ents = tmpl(s, rng)
        sent_entities.append(ents)

    # candidate TLINK cells: event-DCT, same-sentence event-timex,
    # consecutive events (mirrors the candidate structure of the
    # reference's TXP inputs, e.g. data/example_TXP/wsj_1014.tml.txp)
    all_events = b.events
    cand: dict = {}

    def add(src, tgt, lbl="NONE"):
        if src != tgt and (src, tgt) not in cand and (tgt, src) not in cand:
            cand[(src, tgt)] = lbl

    for si, ents in enumerate(sent_entities):
        evs = [e for e in ents if e.startswith("e")]
        tmxs = [t for t in ents if t.startswith("tmx")]
        for e in evs:
            for t in tmxs:
                add(e, t)
            add(e, "tmx0")
        # cross-sentence event-timex candidates (classifier-only path:
        # the R2 rule requires same-sentence)
        if si + 1 < len(sent_entities):
            nxt_tmxs = [t for t in sent_entities[si + 1]
                        if t.startswith("tmx")]
            for e in evs:
                for t in nxt_tmxs:
                    add(e, t)
        for i in range(len(evs) - 1):
            add(evs[i], evs[i + 1])
    for i in range(len(all_events) - 1):
        add(all_events[i], all_events[i + 1])

    # sprinkle gold labels deterministically (feeds evaluation aggregates)
    gold_pool = ["BEFORE", "AFTER", "IS_INCLUDED", "INCLUDES",
                 "SIMULTANEOUS", "VAGUE", "NONE", "NONE", "NONE"]
    cand = {k: (rng.choice(gold_pool) if rng.random() < 0.4 else "NONE")
            for k in cand}

    # attach tlink cells to the row of each source entity's first token
    by_src: dict = {}
    for (src, tgt), lbl in cand.items():
        by_src.setdefault(src, []).append("%s:%s:%s" % (src, tgt, lbl))
    clink_by_src: dict = {}
    for (src, tgt) in b.gold_clinks:
        clink_by_src.setdefault(src, []).append("%s:%s" % (src, tgt))

    lines = [
        "# FILE: doc_%d.txp" % doc_seed,
        "# DATE: %sT00:00:00" % dct_value,
        "# FIELDS: " + "\t".join(DEFAULT_FIELDS),
        "",
        "DCT_%s\tO\tO\tO\tO\tO\ttmx0\tB-DATE\t%s\tO\tO\tO\tO\tO\tO\tO\tO\tO\tO\tO\tO"
        % (dct_value, dct_value),
        "",
    ]
    for s in b.sents:
        for row in s.rows:
            eid = row["ev_id"] if row["ev_id"] != "O" else row["tmx_id"]
            if eid != "O":
                if eid in by_src:
                    row["tlink"] = "||".join(by_src.pop(eid))
                if eid in clink_by_src:
                    row["clink"] = "||".join(clink_by_src.pop(eid))
            lines.append("\t".join(row[f] for f in DEFAULT_FIELDS))
        lines.append("")
    return "\n".join(lines)


LANGS = ("en", "de", "es", "fr", "zh")

# bump when generate_txp's output changes: the /tmp corpus cache is
# keyed by (version, n_docs, seed)
GEN_VERSION = 2


def build_corpus_table(n_docs: int, seed: int = 42) -> pa.Table:
    """Corpus table in the driver-mandated shape; content sha256 is the
    per-row invariant carried through the pipeline."""
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_docs):
        doc_seed = seed * 1_000_003 + i
        content = generate_txp(doc_seed)
        sha = hashlib.sha256(content.encode()).hexdigest()
        repos.append("corpus/shard%03d" % (i % 64))
        paths.append("docs/doc_%06d.txp" % i)
        commits.append(sha[:12])
        langs.append(LANGS[i % len(LANGS)])
        contents.append(content)
    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def corpus_parquet(n_docs: int, seed: int = 42, out_dir: str = None,
                   rows_per_file: int = 512) -> str:
    """Write (or reuse) the deterministic corpus under /tmp keyed by
    (n_docs, seed); returns a DIRECTORY of parquet fragments (~512 docs
    each) so reads parallelize per file and the resumable runner has
    real fragments to checkpoint. Used by __ray_entry__ and bench so
    repeated runs don't regenerate."""
    import os
    import pyarrow.parquet as pq
    out_dir = out_dir or "/tmp/erex_corpus"
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "corpus_v%d_n%d_s%d"
                        % (GEN_VERSION, n_docs, seed))
    done = path + "/_DONE"
    if not os.path.exists(done):
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        table = build_corpus_table(n_docs, seed)
        n_files = max(1, (n_docs + rows_per_file - 1) // rows_per_file)
        for i in range(n_files):
            lo = i * rows_per_file
            hi = min(n_docs, lo + rows_per_file)
            pq.write_table(table.slice(lo, hi - lo),
                           os.path.join(tmp, "part-%04d.parquet" % i))
        open(os.path.join(tmp, "_DONE"), "w").write("ok")
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        os.replace(tmp, path)
    return path
