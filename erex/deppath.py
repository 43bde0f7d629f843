"""Pair dependency-path search (feature F6).

Re-derives EventEventFeatureVector.getMateDependencyPath
(/root/reference/src/model/feature/EventEventFeatureVector.java:112-217)
and EventTimexFeatureVector.getMateDependencyPath
(/root/reference/src/model/feature/EventTimexFeatureVector.java:60-91):
bounded DFS over the sentence-local dependency tree, forward and (for E-E)
backward with path reversal, with coord-verb fallback and a second phase
that lifts verbs to their VC head / adjectives to their PRD governor.
Returned paths are raw '-'-joined MATE labels without the leading '-'.
"""

from __future__ import annotations

from typing import Optional

from .doc import Doc, Entity, reverse_path


def _search(doc: Doc, gov: str, targets) -> Optional[str]:
    p = doc.first_dependency_path(gov, targets)
    if p is not None:
        return p[1:]
    cv = doc.mate_coord_verb(gov)
    if cv is not None:
        p = doc.first_dependency_path(cv, targets)
        if p is not None:
            return p[1:]
    return None


def _lift(doc: Doc, e: Entity, tid: str) -> str:
    mainpos = doc.entity_token_attr(e, "mainpos")
    if mainpos == "v":
        return doc.mate_head_verb(tid)
    if mainpos == "adj":
        v = doc.mate_verb_from_adj(tid)
        if v is not None:
            return v
    return tid


def ee_dependency_path(doc: Doc, e1: Entity, e2: Entity) -> str:
    """Event-event path; 'O' when not same-sentence or no path. Events are
    assumed single-token (reference comment, EventEventFeatureVector.java:131)."""
    if not doc.same_sentence(e1, e2):
        return "O"
    t1, t2 = e1.start_tok, e2.start_tok
    # phase 1: direct
    p = _search(doc, t1, (t2,))
    if p is not None:
        return p
    p = _search(doc, t2, (t1,))
    if p is not None:
        return reverse_path(p)
    # phase 2: head-verb / adjective lift
    g1 = _lift(doc, e1, t1)
    g2 = _lift(doc, e2, t2)
    p = _search(doc, g1, (g2,))
    if p is not None:
        return p
    p = _search(doc, g2, (g1,))
    if p is not None:
        return reverse_path(p)
    return "O"


def et_dependency_path(doc: Doc, ev: Entity, tmx: Entity) -> str:
    """Event-timex path (pair already in event-timex order); forward-only
    over the full token spans, event gov lifted."""
    if tmx.is_timex and (tmx.is_dct or tmx.is_empty):
        return "O"
    if not doc.same_sentence(ev, tmx):
        return "O"
    span1 = doc.token_ids_between(ev.start_tok, ev.end_tok)
    span2 = set(doc.token_ids_between(tmx.start_tok, tmx.end_tok))
    for gov in span1:
        gov = _lift(doc, ev, gov)
        p = _search(doc, gov, span2)
        if p is not None:
            return p
    return "O"
