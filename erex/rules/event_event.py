"""Event-event temporal rule sieve (R3), timex-anchor reasoning (R4) and
causal verb rules (R5).

Re-derives /root/reference/src/model/rule/EventEventRelationRule.java:
- getEventRule (284-357): same-sentence adjacency + dep-path dispatch,
  aspectual-verb lemma classes, reporting rules, Reichenbach rules;
- reportingEventRules (360-386), reichenbachRules (389-411)
  (Chambers et al. 2014);
- anchor-reasoning getEventRule (413-450): label E-E from the timex-timex
  relation of the events' anchors;
- getEventCausalityRule (93-282): causal-verb Marker cluster x depRel(e1)
  x depRel(e2) -> CLINK / CLINK-R.

Deliberate reference quirks kept:
- the IDENTITY->SIMULTANEOUS downgrade inside the constructor is guarded
  by a field read before it is ever set, so it never fires; the
  DURING/DURING_INV->SIMULTANEOUS "TempEval3 tweak" (lines 61-63) always
  fires. The driver separately maps IDENTITY->SIMULTANEOUS after the rule
  (TempRelPro.java:572).
"""

from __future__ import annotations

from typing import Optional

from ..doc import Doc, Entity

ASPECTUAL_INIT = ("begin", "start", "initiate", "commence", "launch")
ASPECTUAL_TERM = ("stop", "finish", "terminate", "cease")
ASPECTUAL_CONT = ("continue", "retain", "keep")
ASPECTUAL_REMAIN = ("remain",)

_DEP1_COMMON = ("SBJ", "ADV", "NMOD", "APPO", "PRD-IM", "PRP-IM")


def reporting_event_rules(gov: Entity, dep: Entity) -> str:
    if gov.tense == "PRESENT" and dep.tense == "PAST":
        return "AFTER"
    if gov.tense == "PRESENT" and dep.tense == "PRESENT" \
            and dep.aspect == "PERFECTIVE":
        return "AFTER"
    if gov.tense == "PRESENT" and dep.tense == "FUTURE":
        return "BEFORE"
    if gov.tense == "PAST" and dep.tense == "PAST" \
            and dep.aspect == "PERFECTIVE":
        return "AFTER"
    if gov.tense == "PAST" and dep.tense == "PAST" \
            and dep.aspect == "PROGRESSIVE":
        return "IS_INCLUDED"
    return "O"


def reichenbach_rules(e1: Entity, e2: Entity) -> str:
    if e1.tense == "PAST" and e1.aspect == "NONE" \
            and e2.tense == "PAST" and e2.aspect == "PERFECTIVE":
        return "AFTER"
    if e1.tense == "FUTURE" and e1.aspect == "NONE" \
            and e2.tense == "PRESENT" and e2.aspect == "PERFECTIVE":
        return "AFTER"
    if e1.tense == "PAST" and e1.aspect == "NONE" \
            and e2.tense == "FUTURE" and e2.aspect == "NONE":
        return "BEFORE"
    return "O"


def _event_rule_core(doc: Doc, e1: Entity, e2: Entity, dep_path: str) -> str:
    """getEventRule, EventEventRelationRule.java:284-357."""
    if e1.sent_id != e2.sent_id:
        return "O"
    s = doc.sentences[e1.sent_id]
    ent_arr = s.entity_arr
    try:
        eidx1 = ent_arr.index(e1.eid)
        eidx2 = ent_arr.index(e2.eid)
    except ValueError:
        return "O"
    adjacent = eidx1 < eidx2 and eidx2 - eidx1 == 1

    if adjacent and dep_path == "LGS-PMOD":
        return "AFTER"
    if adjacent and dep_path == "OPRD-IM":
        lemma1 = doc.tokens[e1.start_tok].lemma
        if lemma1 in ASPECTUAL_INIT:
            return "BEGINS"
        if lemma1 in ASPECTUAL_TERM:
            return "ENDS"
        if lemma1 in ASPECTUAL_CONT:
            return "INCLUDES"
        if lemma1 in ASPECTUAL_REMAIN:
            return "DURING_INV"
        if e1.aspect == "PERFECTIVE_PROGRESSIVE":
            return "SIMULTANEOUS"
        return "BEFORE"
    if dep_path == "OBJ-SUB" and e1.ev_class == "REPORTING":
        r = reporting_event_rules(e1, e2)
        if r != "O":
            return r
        return "O"
    # NOTE: 'OBJ_REV' is dispatched on here for parity but is never
    # produced by the dependency-path search (reference dead branch:
    # getMateDependencyPath reverses 'OBJ' to 'OBJ', not 'OBJ_REV')
    if dep_path == "OBJ_REV" and e2.ev_class == "REPORTING":
        r = reporting_event_rules(e2, e1)
        if r != "O":
            return r
        return "O"
    if dep_path == "LOC-PMOD":
        return "IS_INCLUDED"
    if dep_path == "PMOD-LOC":
        return "INCLUDES"
    return reichenbach_rules(e1, e2)


def anchor_reasoning(e1_id: str, e2_id: str, etanchor: dict, etbefore: dict,
                     etafter: dict, ttlinks: dict) -> str:
    """R4 (EventEventRelationRule.java:413-450). `ttlinks` maps
    (tmx1, tmx2) -> rel for both directions."""
    if e1_id in etanchor and e2_id in etanchor:
        tt = (etanchor[e1_id], etanchor[e2_id])
        if tt in ttlinks:
            return ttlinks[tt]
    elif e1_id in etbefore and e2_id in etanchor:
        tt = (etbefore[e1_id], etanchor[e2_id])
        if ttlinks.get(tt) == "BEFORE":
            return "BEFORE"
    elif e1_id in etafter and e2_id in etanchor:
        tt = (etafter[e1_id], etanchor[e2_id])
        if ttlinks.get(tt) == "AFTER":
            return "AFTER"
    elif e1_id in etanchor and e2_id in etafter:
        tt = (etanchor[e1_id], etafter[e2_id])
        if ttlinks.get(tt) == "BEFORE":
            return "BEFORE"
    elif e1_id in etanchor and e2_id in etbefore:
        tt = (etanchor[e1_id], etbefore[e2_id])
        if ttlinks.get(tt) == "AFTER":
            return "AFTER"
    return "O"


def event_event_rule(doc: Doc, e1: Entity, e2: Entity, dep_path: str,
                     etanchor: Optional[dict] = None,
                     etbefore: Optional[dict] = None,
                     etafter: Optional[dict] = None,
                     ttlinks: Optional[dict] = None) -> str:
    """Constructor semantics (EventEventRelationRule.java:48-91): plain
    rule first; if 'O' and anchor maps given, try anchor reasoning; the
    DURING(-INV)->SIMULTANEOUS tweak always applies."""
    rel = _event_rule_core(doc, e1, e2, dep_path)
    if rel == "O" and etanchor is not None:
        rel = anchor_reasoning(e1.eid, e2.eid, etanchor, etbefore or {},
                               etafter or {}, ttlinks or {})
    if rel in ("DURING", "DURING_INV"):
        rel = "SIMULTANEOUS"
    return rel


# ---------------------------------------------------------------------------
# R5: causal verb rules (getEventCausalityRule, lines 93-282).
# `marker` is the causal-verb Marker of the pair (features.causal_verb_marker):
# (text, cluster, position, dep_rel_e1, dep_rel_e2).
# ---------------------------------------------------------------------------

def event_causality_rule(same_sentence: bool, m_text: str, m_cluster: str,
                         dep1: str, dep2: str) -> str:
    """Returns the cVerb decision: 'O' (no marker), 'NONE', or one of
    CAUSE/ENABLE/PREVENT/AFFECT/LINK[-R] — callers map to CLINK/CLINK-R via
    `causality_link`."""
    if not same_sentence or m_cluster == "O":
        return "O"
    cverb = "O"
    if m_cluster == "AFFECT":
        if dep1 in _DEP1_COMMON:
            cverb = "AFFECT" if dep2 == "OBJ" else "NONE"
        else:
            cverb = "NONE"
    elif "LINK" in m_cluster:
        if dep1 in _DEP1_COMMON + ("APPO-OPRD-IM", "NMOD-OPRD-IM"):
            if dep2 in ("DIR-PMOD", "ADV-PMOD", "NMOD-PMOD", "AMOD-PMOD"):
                cverb = m_cluster
            else:
                cverb = "NONE"
        else:
            cverb = "NONE"
    elif m_cluster == "CAUSE":
        if dep1 in _DEP1_COMMON:
            if dep2 == "OBJ":
                cverb = "CAUSE"
            elif dep2 in ("OPRD-IM", "OPRD"):
                cverb = "CAUSE"
            elif dep2 == "LGS-PMOD":
                cverb = "CAUSE-R"
            else:
                cverb = "NONE"
        else:
            cverb = "NONE"
    elif m_cluster == "CAUSE-AMBIGUOUS":
        if dep1 in ("SBJ", "ADV", "NMOD", "PRD-IM", "PRP-IM", "SBJ-PMOD",
                    "SBJ-ADV-PMOD"):
            if dep2 == "OPRD-IM":
                cverb = "CAUSE"
            elif m_text == "make" and dep2 == "OPRD-SUB-IM":
                cverb = "CAUSE"
            else:
                cverb = "NONE"
        else:
            cverb = "NONE"
    elif m_cluster == "PREVENT":
        if dep1 in _DEP1_COMMON + ("OBJ-IM",):
            if dep2 == "OBJ":
                cverb = "PREVENT"
            elif dep2 in ("OPRD-IM", "OPRD", "ADV-PMOD"):
                cverb = "PREVENT"
            elif dep2 == "LGS-PMOD":
                cverb = "PREVENT-R"
            else:
                cverb = "NONE"
        else:
            cverb = "NONE"
    elif m_cluster == "PREVENT-AMBIGUOUS":
        if dep1 in ("SBJ", "ADV", "NMOD", "PRD-IM", "PRP-IM", "ADV-PMOD-IM"):
            if dep2 in ("ADV-PMOD", "OPRD"):
                cverb = "PREVENT"
            else:
                cverb = "NONE"
        else:
            cverb = "NONE"
    elif m_cluster == "ENABLE":
        if dep1 in _DEP1_COMMON + ("OBJ-NMOD", "IM", "NMOD-IM"):
            if dep2 == "OBJ" and m_text in ("ensure", "guarantee"):
                cverb = "ENABLE"
            elif dep2 in ("OPRD-IM", "OPRD", "OBJ-IM"):
                cverb = "ENABLE"
            else:
                cverb = "NONE"
        else:
            cverb = "NONE"
    return cverb


def causality_link(cverb: str) -> str:
    """cVerb decision -> CLINK / CLINK-R / 'O'.

    Reference quirk (CauseRelPro.java:182-186): the caller tests only
    ``!rule.equals("O")``, so the rule value "NONE" — a causal-verb
    marker whose dependency pattern FAILED — still becomes a CLINK
    prediction.  Verified against the compiled reference on
    wsj_1014.tml.txp (30 of its 34 causal triples arise this way)."""
    if cverb == "O":
        return "O"
    return "CLINK-R" if "-R" in cverb else "CLINK"
