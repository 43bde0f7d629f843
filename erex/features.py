"""Pair feature extraction (F1-F13) producing fixed-width numeric vectors.

Re-derives the liblinear feature lists of the reference classifiers:
- ET / E-DCT (EventTimexRelationClassifier.java liblinear branch):
  eventClass, tense, aspect, polarity  -> 19 dims
- EE temporal (EventEventRelationClassifier.java:61-87 liblinear branch):
  pos, samePos, chunk, entDistance, sentDistance, eventClass, tense,
  aspect, polarity, sameEventClass, sameTenseAspect, samePolarity,
  depEvPath, mainVerb, hasModal, tempSignal2ClusText/Pos/Dep, wnSim
  -> 269 dims
- EE causal (EventEventCausalClassifier.java:72-110 liblinear branch):
  the EE block with tempSignal*/causSignal* pair markers + the 14-dim
  TLINK-type one-hot appended by the causal driver (CauseRelPro.java:200-213)
  -> 377 dims

One-hot block semantics follow addBinaryFeatureToVector
(PairFeatureVector.java:2615-3374): `contains` matching for pos/chunk,
`equals` for class/tense/aspect, polarity encoded 0 for 'neg' else 1,
entDistance/sentDistance sign-clamped to {-1,0,1}, and the reference's
tempSignal(2)Pos quirk of comparing the marker CLUSTER against the
position vocabulary (so the block is almost always all-zero) is kept.

Marker search (getTemporalSignal / getTemporalSignalPerEntity /
getCausalSignal / getCausalVerb, PairFeatureVector.java:1139-1760) is
re-expressed over word lists: same contexts (INSIDE / BETWEEN / BEFORE /
BEGIN / AFTER / BEGIN-BETWEEN), same priority offsets (+100/+200/+300/+400),
same longest-match-first ordering; distances are word distances (the
reference counts spaces in substrings, which is the same number).

wnSim (F11): the REAL ws4j Lin algorithm (max over noun/verb synset
pairs of 2*IC(lcs)/(IC1+IC2)) over the vendored erex/resources/wnlin
lexical database (the ws4j WordNet data itself does not exist in this
sandbox — see tools/build_wnlin.py), discretized exactly like
getDiscreteDoubleWordSimilarity (EventEventFeatureVector.java:52-66).
The compiled-reference parity stub reads the same database and runs the
same algorithm, so goldens exercise a genuinely shared Lin.
"""

from __future__ import annotations


import numpy as np

from .doc import Doc, Entity, simplify_dep_path
from . import signals

# ---------------------------------------------------------------------------
# closed vocabularies (PairFeatureVector.java:39-60)
# ---------------------------------------------------------------------------
POS_VOCAB = (
    "AJ0", "AJC", "AJS", "AT0", "AV0", "AVP", "AVQ", "CJC", "CJS", "CJT",
    "CRD", "DPS", "DT0", "DTQ", "EX0", "ITJ", "NN0", "NN1", "NN2", "NP0",
    "ORD", "PNI", "PNP", "PNQ", "PNX", "POS", "PRF", "PRP", "PUL", "PUN",
    "PUQ", "PUR", "TO0", "UNC", "VBB", "VBD", "VBG", "VBI", "VBN", "VBZ",
    "VDB", "VDD", "VDG", "VDI", "VDN", "VDZ", "VHB", "VHD", "VHG", "VHI",
    "VHN", "VHZ", "VM0", "VVB", "VVD", "VVG", "VVI", "VVN", "VVZ", "XX0",
    "ZZ0")
CHUNK_VOCAB = ("B-VP", "I-VP", "B-NP", "I-NP", "B-ADJP", "I-ADJP", "B-ADVP",
               "I-ADVP", "B-PP", "I-PP", "B-SBAR", "I-SBAR")
EV_CLASS = ("REPORTING", "PERCEPTION", "ASPECTUAL", "I_ACTION", "I_STATE",
            "STATE", "OCCURRENCE")
EV_TENSE = ("PAST", "PRESENT", "FUTURE", "NONE", "INFINITIVE", "PRESPART",
            "PASTPART")
EV_ASPECT = ("PROGRESSIVE", "PERFECTIVE", "PERFECTIVE_PROGRESSIVE", "NONE")
TMX_TYPE = ("DATE", "TIME", "DURATION", "SET")
MARKER_POSITION = ("BETWEEN", "BEFORE", "AFTER", "BEGIN", "BEGIN-BETWEEN",
                   "BEGIN-BEFORE")
TEMP_SIGNAL_EVENT = (
    "as soon as", "as long as", "at the same time", "followed by",
    "prior to", "still", "during", "while", "when", "immediately", "after",
    "until", "if", "eventually", "then", "finally", "afterwards",
    "initially", "next", "once", "since", "simultaneously", "formerly",
    "former", "meanwhile", "later", "into", "follow", "earlier",
    "previously", "before", "as", "already")
TEMP_SIGNAL_TIMEX = (
    "at", "by", "in", "on", "for", "from", "to", "during", "between",
    "after", "before", "up to", "within", "until", "since", "still",
    "recently", "formerly", "former", "early", "over", "next", "later",
    "lately", "immediately", "earlier", "ago")
CAUS_SIGNAL = (
    "so that", "because of", "due to", "in consequence of", "in response to",
    "in exchange for", "in response", "in order to", "as a result of",
    "as a result", "for reason", "is why", "therefore", "because", "since",
    "as", "so", "by", "from")
DEP_EVENT_PATH = (
    "COORD-CONJ", "TMP-SUB", "OPRD", "OPRD-IM", "OBJ-SUB", "ADV", "OBJ",
    "SBJ", "ADV-SUB", "VC", "LGS-PMOD", "ADV-PMOD", "LOC-PMOD",
    "CONJ-COORD", "SUB-TMP", "IM-OPRD", "SUB-OBJ", "SUB-ADV", "PMOD-LGS",
    "PMOD-ADV", "PMOD-LOC")
DEP_SIGNAL_PATH = ("SBJ", "OBJ", "OPRD", "IM", "ADV", "PRP", "SUB", "PRD",
                   "TMP", "PMOD", "LGS", "DEP", "LOC", "APPO")

ET_DIM = 19
EE_DIM = (2 * len(POS_VOCAB) + 1 + 2 * len(CHUNK_VOCAB) + 1 + 1
          + 2 * len(EV_CLASS) + 2 * len(EV_TENSE) + 2 * len(EV_ASPECT) + 2
          + 3 + len(DEP_EVENT_PATH) + 2 + 2
          + len(TEMP_SIGNAL_EVENT) + len(MARKER_POSITION)
          + len(DEP_SIGNAL_PATH) + 1)
CAUSAL_DIM = (2 * len(POS_VOCAB) + 1 + 2 * len(CHUNK_VOCAB) + 1 + 1
              + 2 * len(EV_CLASS) + 2 * len(EV_TENSE) + 2 * len(EV_ASPECT)
              + 2 + 3 + len(DEP_EVENT_PATH) + 2 + 2
              + len(TEMP_SIGNAL_TIMEX) + len(TEMP_SIGNAL_EVENT)
              + len(MARKER_POSITION) + 2 * len(DEP_SIGNAL_PATH)
              + len(CAUS_SIGNAL) + len(MARKER_POSITION)
              + 2 * len(DEP_SIGNAL_PATH) + 1 + 14)


class Marker:
    __slots__ = ("text", "cluster", "position", "dep1", "dep2")

    def __init__(self, text="O", cluster="O", position="O", dep1="O", dep2="O"):
        self.text = text
        self.cluster = cluster or "O"
        self.position = position
        self.dep1 = dep1
        self.dep2 = dep2


# ---------------------------------------------------------------------------
# entity attributes with governing-verb fallback
# (PairFeatureVector.java:433-456)
# ---------------------------------------------------------------------------
def entity_attr(doc: Doc, e: Entity, attr: str) -> str:
    if e.is_event:
        val = getattr(e, {"eventClass": "ev_class", "tense": "tense",
                          "aspect": "aspect", "polarity": "pol"}[attr])
        if val != "O":
            return val
        tid = e.start_tok
        related = None
        mp = doc.tokens[tid].mainpos
        if mp == "n":
            related = doc.mate_verb_from_sbj_noun(tid)
            if related is None:
                related = doc.mate_verb_from_obj_noun(tid)
        elif mp == "adj":
            related = doc.mate_verb_from_adj(tid)
        if related is not None and attr in ("tense", "aspect", "polarity"):
            t = doc.tokens[related]
            return {"tense": t.tense, "aspect": t.aspect,
                    "polarity": t.pol}[attr]
        return "NONE"
    # timex
    return {"eventClass": "O", "tense": "O", "aspect": "O",
            "polarity": "O"}.get(attr, "O")


def mate_main_verb(doc: Doc, e: Entity) -> bool:
    """PairFeatureVector.getMateMainVerb (lines 836-841)."""
    if doc.entity_token_attr(e, "mainpos") == "v":
        return doc.tokens[doc.mate_head_verb(e.start_tok)].main_verb
    return False


# ---------------------------------------------------------------------------
# context windows around entities (PairFeatureVector.java:918-965)
# ---------------------------------------------------------------------------
def _tid_entity_before_after(doc: Doc, e: Entity) -> tuple:
    s = doc.sentences[e.sent_id]
    arr = s.entity_arr
    try:
        eidx = arr.index(e.eid)
    except ValueError:
        # corrupted input can re-open a sentence id later in the file,
        # replacing the Sentence object that listed this entity (same
        # guard as the rule modules; well-formed TXP never hits it —
        # found by the corruption fuzzer)
        return s.start_tok, s.end_tok
    if eidx == 0:
        before = s.start_tok
    else:
        prev = doc.entities[arr[eidx - 1]]
        i = doc.tokens[prev.end_tok].index + 1
        before = doc.token_arr[min(i, len(doc.token_arr) - 1)]
    if eidx == len(arr) - 1:
        after = s.end_tok
    else:
        nxt = doc.entities[arr[eidx + 1]]
        i = doc.tokens[nxt.start_tok].index - 1
        after = doc.token_arr[max(i, 0)]
    return before, after


def _tid_before_after(doc: Doc, e: Entity) -> tuple:
    s = doc.sentences[e.sent_id]
    if e.start_tok == s.start_tok:
        before = s.start_tok
    else:
        before = doc.token_arr[doc.tokens[e.start_tok].index - 1]
    if e.end_tok == s.end_tok:
        after = s.end_tok
    else:
        after = doc.token_arr[doc.tokens[e.end_tok].index + 1]
    return before, after


def _word_window(doc: Doc, start_tid: str, end_tid: str, attr: str = "text"):
    """(words lowercased, tids) for the inclusive token range; empty when
    start is after end (mirrors the reference's empty loop)."""
    i = doc.tokens[start_tid].index
    j = doc.tokens[end_tid].index
    if i > j:
        return [], []
    tids = doc.token_arr[i:j + 1]
    return [getattr(doc.tokens[t], attr).lower() for t in tids], tids


def _sentence_begin_window(doc: Doc, sid: str):
    """First 5 tokens of the sentence (s.start .. s.start+4, clamped;
    the reference indexes start+4 unguarded)."""
    s = doc.sentences[sid]
    i = doc.tokens[s.start_tok].index
    j = min(i + 4, doc.tokens[s.end_tok].index)
    return _word_window(doc, doc.token_arr[i], doc.token_arr[j])


def _find_signal(words: list, key_words: list, from_end: bool):
    """Word-offset of the key n-gram, or None. from_end=True returns the
    match closest to the end (reference lastIndexOf for BEFORE/BETWEEN)."""
    n = len(key_words)
    if n == 0 or n > len(words):
        return None
    rng = range(len(words) - n, -1, -1) if from_end else \
        range(0, len(words) - n + 1)
    for i in rng:
        if words[i:i + n] == key_words:
            return i
    return None


def _java_offset(words: list, sig: str, last: bool):
    """Token offset of a signal occurrence exactly as getSignalTidArr
    resolves it (PairFeatureVector.java:873-892): raw SUBSTRING
    indexOf/lastIndexOf over the space-padded context string, then a
    space count — so e.g. 'over' can resolve into 'over-the-counter'
    earlier in the context than the word-boundary match the regex found."""
    ctx = " " + " ".join(words) + " "
    idx = ctx.rfind(sig) if last else ctx.find(sig)
    if idx < 0:
        return None
    return ctx.strip()[:idx].count(" ")


def _java_distance(words: list, sig: str, from_end: bool):
    """getSignalEntityDistance (PairFeatureVector.java:894-910): space
    count before the first raw-substring occurrence; for BEFORE/BETWEEN
    both context and signal are word-reversed first."""
    ctx = " " + " ".join(words) + " "
    if from_end:
        parts = ctx.split(" ")
        while parts and parts[-1] == "":
            parts.pop()                      # Java split(" ") semantics
        ctx = " ".join(reversed(parts))
        sig = " ".join(reversed(sig.split(" ")))
    idx = ctx.find(sig)
    if idx < 0:
        return None
    return ctx.strip()[:idx].count(" ")


def _index_window(words: list) -> tuple:
    """(_, _, interior) — the set of n-grams (n <= 6) with at least one
    INTERIOR occurrence (neither window-initial nor window-final) in
    the context window: the reference's presence test is
    ``contains(" key ")`` over the UNPADDED space-join, which any
    interior occurrence satisfies even when the first/last occurrence
    touches the window edge (pinned by the wsj_1014 bulk marker
    goldens: the edge 'for' fails the test but an interior 'for'
    earlier in the window passes, and tid/distance then resolve to the
    edge occurrence via raw lastIndexOf).  The leading tuple slots are
    kept for signature stability; only `interior` is consumed."""
    interior: set = set()
    L = len(words)
    for n in range(1, min(6, L - 2) + 1):
        for i in range(1, L - n):
            interior.add(tuple(words[i:i + n]))
    return None, None, interior


def signal_dep_path(doc: Doc, e: Entity, signal_tids: list,
                    strip_appo: bool = True) -> str:
    """getSignalMateDependencyPath (PairFeatureVector.java:672-764) /
    variant 2 (780-873 via strip_appo=False)."""
    ent_tids = doc.token_ids_between(e.start_tok, e.end_tok)
    sig_set = set(signal_tids)
    e_mainpos = doc.entity_token_attr(e, "mainpos")

    def _try(gov, targets):
        p = doc.first_dependency_path(gov, targets)
        if p is not None:
            sp = simplify_dep_path(p, strip_appo=strip_appo)
            if sp:
                return sp[1:]
        return None

    for tid in ent_tids:
        gov = tid
        if e_mainpos == "v":
            gov = doc.mate_head_verb(tid)
        elif e_mainpos == "adj":
            v = doc.mate_verb_from_adj(tid)
            if v is not None:
                gov = v
        p = _try(gov, sig_set)
        if p is not None:
            return p
        cv = doc.mate_coord_verb(gov)
        if cv is not None:
            p = _try(cv, sig_set)
            if p is not None:
                return p
        if e_mainpos == "n":
            sv = doc.mate_verb_from_sbj_noun(tid)
            if sv is not None:
                p = _try(sv, sig_set)
                if p is not None:
                    return p

    # reverse direction: signal token as governor
    for stid in signal_tids:
        for etid in ent_tids:
            if doc.tokens[stid].mainpos == "v":
                gv = doc.mate_head_verb(stid)
                sbj = doc.mate_subject_from_verb(gv)
                if sbj is not None and sbj == etid:
                    return "SBJ"
                obj = doc.mate_object_from_verb(stid)
                if obj is not None and obj == etid:
                    return "OBJ"
            dep = etid
            if e_mainpos == "v":
                dep = doc.mate_head_verb(etid)
            elif e_mainpos == "adj":
                v = doc.mate_verb_from_adj(etid)
                if v is not None:
                    dep = v
            p = _try(stid, {dep})
            if p is not None:
                return p
            cv = doc.mate_coord_verb(dep)
            if cv is not None:
                p = _try(stid, {cv})
                if p is not None:
                    return p
            if e_mainpos == "n":
                sv = doc.mate_verb_from_sbj_noun(dep)
                if sv is not None:
                    p = _try(stid, {sv})
                    if p is not None:
                        return p
    return "O"


def _pair_contexts(doc: Doc, e1: Entity, e2: Entity):
    """The four same-sentence context windows of getTemporalSignal
    (PairFeatureVector.java:1160-1180)."""
    tid_before1, _ = _tid_entity_before_after(doc, e1)
    tid_start1, _ = _tid_before_after(doc, e1)
    tid_before2 = tid_before1              # reference quirk: uses e1's value
    tid_start2, tid_end2 = _tid_before_after(doc, e2)
    _, tid_after2 = _tid_entity_before_after(doc, e2)
    ctx = {
        "BEFORE": _word_window(doc, tid_before1, tid_start1),
        "BETWEEN": _word_window(doc, tid_before2, tid_start2),
        "AFTER": _word_window(doc, tid_end2, tid_after2),
        "BEGIN": _sentence_begin_window(doc, e1.sent_id),
        "INSIDE": _word_window(doc, e2.start_tok, e2.end_tok),
    }
    return ctx


def temporal_signal_pair(doc: Doc, e1: Entity, e2: Entity) -> Marker:
    """getTemporalSignal (PairFeatureVector.java:1139-1231): nearest marker
    across INSIDE(+0) / BETWEEN(+100) / BEFORE(+200) / BEGIN(+400) with the
    e2-kind-specific list for INSIDE/BETWEEN and the event list for
    BEFORE/BEGIN; cross-sentence E-E uses BEGIN-BETWEEN only."""
    sig_timex = signals.temporal_timex_signals()
    sig_event = signals.temporal_event_signals()
    sig = sig_timex if e2.is_timex else sig_event
    keys_split = signals.temporal_timex_keys_split() if e2.is_timex \
        else signals.temporal_event_keys_split()
    pair_key_set = signals.temporal_timex_key_tuples() if e2.is_timex \
        else signals.temporal_event_key_tuples()
    ev_keys_split = signals.temporal_event_keys_split()
    ev_key_set = signals.temporal_event_key_tuples()
    candidates: dict = {}

    if doc.same_sentence(e1, e2):
        ctx = _pair_contexts(doc, e1, e2)
        # per reference: INSIDE/BETWEEN try pair list; BEFORE/BEGIN event list
        words_e, tids_e = ctx["INSIDE"]
        idx_in = _index_window(words_e)
        wb, tb = ctx["BETWEEN"]
        idx_bt = _index_window(wb)
        # the reference scans EVERY key into one distance-keyed HashMap
        # (equal distances overwrite, minimum wins) — a first-match-wins
        # scan provably diverges (golden tadv5: 'when' found first loses
        # to the nearer later key 'previously')
        present = (idx_in[2] | idx_bt[2]) & pair_key_set
        for key, kt in (keys_split if present else ()):
            if kt not in present:
                continue
            kw = kt
            if kt in idx_in[2]:
                joff = _java_offset(words_e, key, False)
                sig_tids = tids_e[joff:joff + len(kw)]
                candidates[_java_distance(words_e, key, False)] = Marker(
                    key, sig[key], "INSIDE",
                    signal_dep_path(doc, e1, sig_tids),
                    signal_dep_path(doc, e2, sig_tids))
                continue
            if kt in idx_bt[2]:
                joff = _java_offset(wb, key, True)
                sig_tids = tb[joff:joff + len(kw)]
                candidates[_java_distance(wb, key, True) + 100] = Marker(
                    key, sig[key], "BETWEEN",
                    signal_dep_path(doc, e1, sig_tids),
                    signal_dep_path(doc, e2, sig_tids))
        wbf, tbf = ctx["BEFORE"]
        idx_bf = _index_window(wbf)
        wg, tg = ctx["BEGIN"]
        idx_bg = _index_window(wg)
        present = (idx_bf[2] | idx_bg[2]) & ev_key_set
        for key, kt in (ev_keys_split if present else ()):
            if kt not in present:
                continue
            kw = kt
            if kt in idx_bf[2]:
                joff = _java_offset(wbf, key, True)
                sig_tids = tbf[joff:joff + len(kw)]
                candidates[_java_distance(wbf, key, True) + 200] = Marker(
                    key, sig_event[key], "BEFORE",
                    signal_dep_path(doc, e2, sig_tids),
                    signal_dep_path(doc, e1, sig_tids))
                continue
            if kt in idx_bg[2]:
                joff = _java_offset(wg, key, False)
                sig_tids = tg[joff:joff + len(kw)]
                candidates[_java_distance(wg, key, False) + 400] = Marker(
                    key, sig_event[key], "BEGIN",
                    signal_dep_path(doc, e2, sig_tids),
                    signal_dep_path(doc, e1, sig_tids))
    elif not e2.is_timex and not doc._non_text_pair(e1, e2):
        words, tids = _sentence_begin_window(doc, e2.sent_id)
        idx = _index_window(words)
        present = idx[2] & ev_key_set
        for key, kt in (ev_keys_split if present else ()):
            if kt not in present:
                continue
            kw = kt
            if kt in idx[2]:
                joff = _java_offset(words, key, False)
                sig_tids = tids[joff:joff + len(kw)]
                candidates[_java_distance(words, key, False)] = Marker(
                    key, sig_event[key], "BEGIN-BETWEEN", "O",
                    signal_dep_path(doc, e2, sig_tids))

    if candidates:
        return candidates[min(candidates)]
    return Marker()


def temporal_signal_per_entity(doc: Doc, ent: Entity) -> Marker:
    """getTemporalSignalPerEntity (PairFeatureVector.java:1233-1289):
    INSIDE(+0) -> BEFORE(+100) -> AFTER(+200) -> BEGIN(+300), first-match
    per key, nearest-by-(distance+offset) wins. Memoized per document:
    the same entity is e2 of many pairs (the reference recomputes per
    pair — pure-function, so caching is behavior-neutral)."""
    if ent.is_timex and (ent.is_dct or ent.is_empty):
        return Marker()
    ck = ("tsig_ent", ent.eid)
    hit = doc.sig_cache.get(ck)
    if hit is not None:
        return hit
    slist = signals.temporal_timex_signals() if ent.is_timex \
        else signals.temporal_event_signals()
    keys_split = signals.temporal_timex_keys_split() if ent.is_timex \
        else signals.temporal_event_keys_split()
    key_set = signals.temporal_timex_key_tuples() if ent.is_timex \
        else signals.temporal_event_key_tuples()
    tid_before, _ = _tid_entity_before_after(doc, ent)
    tid_start, tid_end = _tid_before_after(doc, ent)
    _, tid_after = _tid_entity_before_after(doc, ent)
    # per context: (window, offset, tid_from_end, dist_from_end) — the
    # BEGIN branch splits directions (a reference quirk pinned by the
    # entmark goldens): getSignalMarkerPerEntity resolves the tid with
    # position "BEGIN" (forward indexOf) but the distance call passes
    # "BETWEEN" (reversed), so 'followed by' beats 'followed' there.
    ctx = {
        "INSIDE": (_word_window(doc, ent.start_tok, ent.end_tok), 0,
                   False, False),
        "BEFORE": (_word_window(doc, tid_before, tid_start), 100,
                   True, True),
        "AFTER": (_word_window(doc, tid_end, tid_after), 200,
                  False, False),
        "BEGIN": (_sentence_begin_window(doc, ent.sent_id), 300,
                  False, True),
    }
    idxs = {pos: _index_window(ctx[pos][0][0]) for pos in ctx}
    # fast path: only keys with an interior occurrence in SOME window
    # can produce a candidate — for most entities that set is empty
    present: set = set()
    for pos in idxs:
        present.update(idxs[pos][2])
    present &= key_set
    candidates: dict = {}
    for key, kt in (keys_split if present else ()):
        if kt not in present:
            continue
        kw = kt
        for pos in ("INSIDE", "BEFORE", "AFTER", "BEGIN"):
            (words, tids), offset, tid_fe, dist_fe = ctx[pos]
            if kt not in idxs[pos][2]:
                continue
            # presence = any interior word-exact occurrence (the
            # reference's contains(" key ") over the unpadded join);
            # tid + distance use the reference's raw substring
            # resolution, which may land on a different token
            joff = _java_offset(words, key, tid_fe)
            sig_tids = tids[joff:joff + len(kw)]
            dist = _java_distance(words, key, dist_fe)
            candidates[dist + offset] = Marker(
                key, slist[key], pos,
                signal_dep_path(doc, ent, sig_tids), "")
            break
    m = candidates[min(candidates)] if candidates else Marker()
    doc.sig_cache[ck] = m
    return m


def _connective_run(doc: Doc, start_tid: str, end_tid: str, conn_type: str,
                    reverse: bool) -> list:
    """getConnectiveTidArr (PairFeatureVector.java:966-988): the run of
    consecutive tokens tagged with the discourse-connective type nearest
    the relevant end of the window."""
    i = doc.tokens[start_tid].index
    j = doc.tokens[end_tid].index
    if i > j:
        return []
    tids = doc.token_arr[i:j + 1]
    if reverse:
        tids = list(reversed(tids))
    run, started = [], False
    for t in tids:
        if doc.tokens[t].conn == conn_type:
            run.append(t)
            started = True
        elif started:
            break
    if reverse:
        run.reverse()
    return run


def connective_marker_pair(doc: Doc, e1: Entity, e2: Entity,
                           conn_type: str = "Temporal") -> Marker:
    """F8: getTemporalConnective / getCausalConnective
    (PairFeatureVector.java:1291-1371, 1563-1620) over the
    discourse-connective token column: BETWEEN(+0) > BEFORE(+100) >
    AFTER(+200) > INSIDE(+300, temporal only) > BEGIN; cross-sentence
    BEGIN-BETWEEN.  Three reference quirks pinned by the connmark
    adversarial goldens: AFTER markers carry NO dep paths
    (getConnectiveMarker's if/else chain skips AFTER); the temporal
    INSIDE marker's dep paths come from the BEGIN-window run, not the
    INSIDE run (the call site passes tidConnBegin); and the
    cross-sentence window starts at SENTENCE 1's start token."""
    candidates: dict = {}
    if doc.same_sentence(e1, e2):
        tid_before1, _ = _tid_entity_before_after(doc, e1)
        tid_start1, _ = _tid_before_after(doc, e1)
        tid_start2, tid_end2 = _tid_before_after(doc, e2)
        _, tid_after2 = _tid_entity_before_after(doc, e2)
        s = doc.sentences[e1.sent_id]
        i0 = doc.tokens[s.start_tok].index
        tid_begin = doc.token_arr[min(i0 + 4, doc.tokens[s.end_tok].index)]

        def put(run, pos, base_ent, offset, dep_run=None):
            if not run:
                return False
            text = doc.span_lower_text(run[0], run[-1])
            if pos in ("BEFORE", "BETWEEN"):
                dist = abs(doc.tokens[base_ent.start_tok].index
                           - doc.tokens[run[-1]].index)
            else:
                dist = abs(doc.tokens[base_ent.end_tok].index
                           - doc.tokens[run[0]].index)
            dr = run if dep_run is None else dep_run
            if pos in ("BETWEEN", "INSIDE"):
                d1 = signal_dep_path(doc, e1, dr)
                d2 = signal_dep_path(doc, e2, dr)
            elif pos in ("BEFORE", "BEGIN"):
                d1 = signal_dep_path(doc, e2, dr)
                d2 = signal_dep_path(doc, e1, dr)
            else:                       # AFTER: no dep branch in Java
                d1 = d2 = "O"
            candidates[dist + offset] = Marker(text, text, pos, d1, d2)
            return True

        begin_run = _connective_run(doc, s.start_tok, tid_begin, conn_type,
                                    False)
        # strict priority chain (else-if in the reference)
        (put(_connective_run(doc, tid_before1, tid_start2, conn_type, True),
             "BETWEEN", e2, 0)
         or put(_connective_run(doc, tid_before1, tid_start1, conn_type,
                                True), "BEFORE", e1, 100)
         or put(_connective_run(doc, tid_end2, tid_after2, conn_type,
                                False), "AFTER", e2, 200)
         or (conn_type == "Temporal"
             and put(_connective_run(doc, e2.start_tok, e2.end_tok,
                                     conn_type, False), "INSIDE", e2, 300,
                     dep_run=begin_run))
         or put(begin_run, "BEGIN", e2, 400))
    elif not doc._non_text_pair(e1, e2):
        s1 = doc.sentences[e1.sent_id]
        s2 = doc.sentences[e2.sent_id]
        i0 = doc.tokens[s2.start_tok].index
        tid_begin2 = doc.token_arr[min(i0 + 4, doc.tokens[s2.end_tok].index)]
        run = _connective_run(doc, s1.start_tok, tid_begin2, conn_type,
                              False)
        if run:
            text = doc.span_lower_text(run[0], run[-1])
            candidates[0] = Marker(text, text, "BEGIN-BETWEEN", "O",
                                   signal_dep_path(doc, e2, run))
    if candidates:
        return candidates[min(candidates)]
    return Marker()


def is_coreference(doc: Doc, e1: Entity, e2: Entity) -> bool:
    """F12 (EventEventFeatureVector.java:98-100): e2 listed in e1's
    coreference chain."""
    return e2.eid in e1.coref


def timex_value_template(value: str) -> str:
    r"""M11: digit-masking template, \d -> N (Timex.java:53-57)."""
    import re as _re
    return _re.sub(r"\d", "N", value)


def causal_signal_pair(doc: Doc, e1: Entity, e2: Entity) -> Marker:
    """getCausalSignal (PairFeatureVector.java:1374-1512): regex patterns
    over space-padded lowercased contexts, BETWEEN/BEFORE/AFTER same
    sentence (insertion-order tie-break), BEGIN-BETWEEN across sentences;
    dep1/dep2 with the containment-cancel post-step."""
    pats = signals.causal_signals()
    candidates: dict = {}
    # Java walks the signal keys OUTER and the three contexts INNER,
    # with ONE counter i shared by all contexts that is ALSO bumped
    # inside the collision loop (`while containsKey: distance++; i++`,
    # PairFeatureVector.java:1406-1457) — so an early collision shifts
    # every later candidate's key.  Replicated exactly.
    i = 0

    def put(dist, m):
        nonlocal i
        if dist in candidates:
            while dist in candidates:
                dist += 1
                i += 1
        candidates[dist] = m

    def scan_one(rx, cluster, words, tids, pos, from_end):
        padded = " " + " ".join(words) + " "
        mm = rx.search(padded)
        if not mm:
            return
        text = mm.group().strip()
        kw = text.split(" ")
        off = _java_offset(words, text, from_end)
        if off is None or off + len(kw) > len(tids):
            return
        sig_tids = tids[off:off + len(kw)]
        d1 = signal_dep_path(doc, e1, sig_tids)
        d2 = signal_dep_path(doc, e2, sig_tids)
        if d2 != "O" and d2 in d1:
            d1 = d1.replace(d2, "O") or "O"
            if d1 == "":
                d1 = "O"
            d2 = "O"
        elif d1 != "O" and d1 in d2:
            d2 = d2.replace(d1, "O") or "O"
            if d2 == "":
                d2 = "O"
            d1 = "O"
        dist = _java_distance(words, text, from_end)
        put(dist + i, Marker(text, cluster, pos, d1, d2))

    if doc.same_sentence(e1, e2):
        ctx = _pair_contexts(doc, e1, e2)
        wbet, tbet = ctx["BETWEEN"]
        wbef, tbef = ctx["BEFORE"]
        waft, taft = ctx["AFTER"]
        for rx, _pat, cluster in pats:
            scan_one(rx, cluster, wbet, tbet, "BETWEEN", True)
            scan_one(rx, cluster, wbef, tbef, "BEFORE", True)
            scan_one(rx, cluster, waft, taft, "AFTER", False)
            i += 1
    elif not doc._non_text_pair(e1, e2):
        words, tids = _sentence_begin_window(doc, e2.sent_id)
        for rx, _pat, cluster in pats:
            scan_one(rx, cluster, words, tids, "BEGIN-BETWEEN", False)
            i += 1

    if candidates:
        return candidates[min(candidates)]
    return Marker()


_LINK_PARTICLES = {
    "link": ("to", "with"), "lead": ("to",), "depend": ("on",),
    "result": ("in", "from"), "rely": ("on",), "stem": ("from",),
    "relate": ("to",), "connect": ("with",), "associate": ("with",),
}


def causal_verb_pair(doc: Doc, e1: Entity, e2: Entity) -> Marker:
    """getCausalVerb (PairFeatureVector.java:1636-1760)."""
    verbs = signals.causal_verbs()
    candidates: dict = {}
    if doc.same_sentence(e1, e2):
        lemma1 = doc.tokens[e1.start_tok].lemma
        if verbs.get(lemma1) == "ENABLE" and not doc.mate_passive_verb(e1.start_tok):
            dist = abs(doc.tokens[e1.start_tok].index
                       - doc.tokens[e2.start_tok].index)
            candidates[dist] = _verb_marker(doc, e1, e2, lemma1, e1.start_tok,
                                            verbs)
        else:
            _, tid_end1 = _tid_before_after(doc, e1)
            tid_start2, _ = _tid_before_after(doc, e2)
            i = doc.tokens[tid_end1].index
            j = doc.tokens[tid_start2].index
            for tid in doc.token_arr[i:j + 1]:
                tok = doc.tokens[tid]
                if "VP" not in tok.chunk:
                    continue
                lemma = tok.lemma
                if lemma in _LINK_PARTICLES:
                    nxt_i = tok.index + 1
                    if nxt_i < len(doc.token_arr):
                        nxt = doc.tokens[doc.token_arr[nxt_i]].lemma
                        if nxt in _LINK_PARTICLES[lemma]:
                            dist = abs(tok.index
                                       - doc.tokens[e2.start_tok].index)
                            candidates[dist] = _verb_marker(
                                doc, e1, e2, lemma + "-" + nxt, tid, verbs)
                elif lemma == "have":
                    deps = tok.deps or {}
                    if not any(r == "VC" for r in deps.values()):
                        dist = abs(tok.index - doc.tokens[e2.start_tok].index)
                        candidates[dist] = _verb_marker(doc, e1, e2, lemma,
                                                        tid, verbs)
                elif lemma in verbs:
                    if not doc.mate_passive_verb(tid):
                        dist = abs(tok.index - doc.tokens[e2.start_tok].index)
                        candidates[dist] = _verb_marker(doc, e1, e2, lemma,
                                                        tid, verbs)
    if candidates:
        return candidates[min(candidates)]
    return Marker()


def _verb_marker(doc: Doc, e1: Entity, e2: Entity, text: str, tid: str,
                 verbs: dict) -> Marker:
    d1 = signal_dep_path(doc, e1, [tid], strip_appo=False)
    d2 = signal_dep_path(doc, e2, [tid], strip_appo=False)
    return Marker(text, verbs.get(text, "O"), "BETWEEN", d1, d2)


# ---------------------------------------------------------------------------
# candidate gating for CLINKs (M10; CauseRelPro.java:61-95)
# ---------------------------------------------------------------------------
def _contains_key(words, single: frozenset, multi: tuple) -> bool:
    """`" k " in " w1 w2 ... "` for a space-free key k is exactly
    whole-token membership, so the 66/94-key substring scans reduce to
    one set intersection; multiword keys (none in the shipped lists)
    keep the literal padded-substring semantics."""
    if not single.isdisjoint(words):
        return True
    if multi:
        text = " " + " ".join(words) + " "
        return any(f" {k} " in text for k in multi)
    return False


def sentence_contains_causal_signal(doc: Doc, sid: str) -> bool:
    """Reference quirk (CauseRelPro.java:61-74): the gate matches the
    causal-signal MAP KEYS — which are the list file's numeric line
    numbers — literally against the sentence text, so it fires only when
    a sentence contains a bare small number.  Verified against the
    compiled reference (tools/javaref causmark mode)."""
    s = doc.sentences[sid]
    words = [doc.tokens[t].text.lower() for t in
             doc.token_ids_between(s.start_tok, s.end_tok)]
    return _contains_key(words, *signals.causal_signal_key_split())


def sentence_contains_causal_verb(doc: Doc, sid: str) -> bool:
    s = doc.sentences[sid]
    words = [doc.tokens[t].lemma.lower() for t in
             doc.token_ids_between(s.start_tok, s.end_tok)]
    return _contains_key(words, *signals.causal_verb_key_split())


# ---------------------------------------------------------------------------
# wnSim stand-in (F11)
# ---------------------------------------------------------------------------
def wn_sim_bucket(lemma1: str, lemma2: str) -> float:
    """ws4j Lin similarity over the vendored wnlin database (see
    erex/wnlin.py), discretized exactly like
    getDiscreteDoubleWordSimilarity (EventEventFeatureVector.java:60-66):
    >1 -> 1.0, (0.5,1] -> 0.75, (0,0.5] -> 0.25, <=0 -> 0.0.
    (Lin's max is 1.0, so the >1 bucket never fires — the reference's
    defensive first branch.)"""
    from .wnlin import lin
    sim = lin(lemma1, lemma2)
    if sim > 1.0:
        return 1.0
    if sim > 0.5:
        return 0.75
    if sim > 0.0:
        return 0.25
    return 0.0


# ---------------------------------------------------------------------------
# vector builders
# ---------------------------------------------------------------------------
def _onehot(out, base, vocab, value, contains=False):
    if contains:
        for i, v in enumerate(vocab):
            if v in value:
                out[base + i] = 1.0
    else:
        for i, v in enumerate(vocab):
            if v == value:
                out[base + i] = 1.0
                break
    return base + len(vocab)


def _sign(x: int) -> float:
    return 1.0 if x > 0 else (-1.0 if x < 0 else 0.0)


def et_vector(doc: Doc, ev: Entity, tmx: Entity) -> np.ndarray:
    """ET/DCT liblinear features: eventClass(7) tense(7) aspect(4)
    polarity(1). Depends only on the event side, so memoized per
    (doc, event) — the same event is paired with every candidate timex
    (pure function; the shared array is never mutated downstream)."""
    ck = ("etvec", ev.eid)
    hit = doc.sig_cache.get(ck)
    if hit is not None:
        return hit
    v = np.zeros(ET_DIM, dtype=np.float32)
    p = 0
    p = _onehot(v, p, EV_CLASS, entity_attr(doc, ev, "eventClass"))
    p = _onehot(v, p, EV_TENSE, entity_attr(doc, ev, "tense"))
    p = _onehot(v, p, EV_ASPECT, entity_attr(doc, ev, "aspect"))
    v[p] = 0.0 if entity_attr(doc, ev, "polarity") == "neg" else 1.0
    doc.sig_cache[ck] = v
    return v


DCT_DENSE_DIM = (2 * len(POS_VOCAB) + 2 * len(CHUNK_VOCAB)
                 + len(EV_CLASS) + len(EV_TENSE) + len(EV_ASPECT) + 3)


def dct_dense_vector(doc: Doc, ev: Entity, tmx: Entity) -> np.ndarray:
    """Event-DCT features of the TimeBank-Dense flow: the
    EventDctRelationClassifier liblinear/logit featureList
    (EventDctRelationClassifier.java:74-97) — pos/chunk contains-blocks
    for BOTH entities (the DCT side is all-zero because
    getTokenAttribute returns 'O' for a DCT timex,
    PairFeatureVector.java:264-265), then
    eventClass/tense/aspect/polarity/mainVerb/hasModal of the event.
    167 dims vs tbdense-dct.model nr_feature 166: the last index hits
    the bias row — the same liblinear-java call-site quirk as the
    269-dim EE vector (see erex/liblinear.py)."""
    ck = ("dctdense", ev.eid, tmx.eid)
    hit = doc.sig_cache.get(ck)
    if hit is not None:
        return hit
    v = np.zeros(DCT_DENSE_DIM, dtype=np.float32)
    p = 0
    p = _onehot(v, p, POS_VOCAB, doc.entity_token_attr(ev, "pos"),
                contains=True)
    p = _onehot(v, p, POS_VOCAB, doc.entity_token_attr(tmx, "pos"),
                contains=True)
    p = _onehot(v, p, CHUNK_VOCAB, doc.entity_token_attr(ev, "chunk"),
                contains=True)
    p = _onehot(v, p, CHUNK_VOCAB, doc.entity_token_attr(tmx, "chunk"),
                contains=True)
    p = _onehot(v, p, EV_CLASS, entity_attr(doc, ev, "eventClass"))
    p = _onehot(v, p, EV_TENSE, entity_attr(doc, ev, "tense"))
    p = _onehot(v, p, EV_ASPECT, entity_attr(doc, ev, "aspect"))
    v[p] = 0.0 if entity_attr(doc, ev, "polarity") == "neg" else 1.0
    p += 1
    v[p] = 1.0 if mate_main_verb(doc, ev) else 0.0
    p += 1
    v[p] = 1.0 if doc.mate_modal_verb(ev.start_tok) != "O" else 0.0
    doc.sig_cache[ck] = v
    return v


# exact-match one-hot index tables (vocab entries are unique)
_EVC_IDX = {s: i for i, s in enumerate(EV_CLASS)}
_EVT_IDX = {s: i for i, s in enumerate(EV_TENSE)}
_EVA_IDX = {s: i for i, s in enumerate(EV_ASPECT)}
_DEP_IDX = {s: i for i, s in enumerate(DEP_EVENT_PATH)}
_NPOS = len(POS_VOCAB)
_NCHK = len(CHUNK_VOCAB)
_NEVC = len(EV_CLASS)
_NEVT = len(EV_TENSE)
_NEVA = len(EV_ASPECT)
_NDEP = len(DEP_EVENT_PATH)


def _ee_profile(doc: Doc, e: Entity) -> tuple:
    """Per-entity feature slice of the EE/causal common block, memoized
    per (doc, entity): every entity appears in many pairs, and all of
    these are pure functions of (doc, entity)."""
    ck = ("eeprof", e.eid)
    hit = doc.sig_cache.get(ck)
    if hit is not None:
        return hit
    pos = doc.entity_token_attr(e, "pos")
    chunk = doc.entity_token_attr(e, "chunk")
    cls = entity_attr(doc, e, "eventClass")
    tense = entity_attr(doc, e, "tense")
    aspect = entity_attr(doc, e, "aspect")
    pol = entity_attr(doc, e, "polarity")
    prof = (
        pos,
        tuple(i for i, s in enumerate(POS_VOCAB) if s in pos),
        tuple(i for i, s in enumerate(CHUNK_VOCAB) if s in chunk),
        cls, _EVC_IDX.get(cls, -1),
        tense, _EVT_IDX.get(tense, -1),
        aspect, _EVA_IDX.get(aspect, -1),
        pol,
        1.0 if mate_main_verb(doc, e) else 0.0,
        1.0 if doc.mate_modal_verb(e.start_tok) != "O" else 0.0,
    )
    doc.sig_cache[ck] = prof
    return prof


def _ee_common(doc: Doc, e1: Entity, e2: Entity, dep_path: str,
               v: np.ndarray) -> int:
    """Same layout as the former scan-the-vocab implementation (kept
    bit-identical; pinned by the javaref feature-vector goldens), built
    from the memoized per-entity profiles."""
    (pos1, posi1, chki1, c1, ci1, t1, ti1, a1, ai1, pol1,
     mv1, md1) = _ee_profile(doc, e1)
    (pos2, posi2, chki2, c2, ci2, t2, ti2, a2, ai2, pol2,
     mv2, md2) = _ee_profile(doc, e2)
    for i in posi1:
        v[i] = 1.0
    p = _NPOS
    for i in posi2:
        v[p + i] = 1.0
    p += _NPOS
    if pos1 == pos2:
        v[p] = 1.0
    p += 1
    for i in chki1:
        v[p + i] = 1.0
    p += _NCHK
    for i in chki2:
        v[p + i] = 1.0
    p += _NCHK
    v[p] = _sign(doc.entity_distance(e1, e2))
    p += 1
    v[p] = _sign(doc.sentence_distance(e1, e2))
    p += 1
    if ci1 >= 0:
        v[p + ci1] = 1.0
    p += _NEVC
    if ci2 >= 0:
        v[p + ci2] = 1.0
    p += _NEVC
    if ti1 >= 0:
        v[p + ti1] = 1.0
    p += _NEVT
    if ti2 >= 0:
        v[p + ti2] = 1.0
    p += _NEVT
    if ai1 >= 0:
        v[p + ai1] = 1.0
    p += _NEVA
    if ai2 >= 0:
        v[p + ai2] = 1.0
    p += _NEVA
    v[p] = 0.0 if pol1 == "neg" else 1.0
    p += 1
    v[p] = 0.0 if pol2 == "neg" else 1.0
    p += 1
    if c1 == c2:
        v[p] = 1.0
    p += 1
    if t1 == t2 and a1 == a2:
        v[p] = 1.0
    p += 1
    if pol1 == pol2:
        v[p] = 1.0
    p += 1
    di = _DEP_IDX.get(dep_path, -1)
    if di >= 0:
        v[p + di] = 1.0
    p += _NDEP
    v[p] = mv1
    p += 1
    v[p] = mv2
    p += 1
    v[p] = md1
    p += 1
    v[p] = md2
    p += 1
    return p


def ee_vector(doc: Doc, e1: Entity, e2: Entity, dep_path: str) -> np.ndarray:
    """EE temporal liblinear features (269 dims)."""
    v = np.zeros(EE_DIM, dtype=np.float32)
    p = _ee_common(doc, e1, e2, dep_path, v)
    m = temporal_signal_per_entity(doc, e2)
    p = _onehot(v, p, TEMP_SIGNAL_EVENT, m.cluster)
    # reference quirk: position block matched against the CLUSTER
    p = _onehot(v, p, MARKER_POSITION, m.cluster)
    p = _onehot(v, p, DEP_SIGNAL_PATH, m.dep1, contains=True)
    v[p] = wn_sim_bucket(doc.tokens[e1.start_tok].lemma,
                         doc.tokens[e2.start_tok].lemma)
    return v


def causal_vector(doc: Doc, e1: Entity, e2: Entity, dep_path: str,
                  tlink_type: str) -> np.ndarray:
    """EE causal liblinear features (377 dims) incl. the TLINK one-hot."""
    from .labels import TLINK_LABELS
    v = np.zeros(CAUSAL_DIM, dtype=np.float32)
    p = _ee_common(doc, e1, e2, dep_path, v)
    mt = temporal_signal_pair(doc, e1, e2)
    p = _onehot(v, p, TEMP_SIGNAL_TIMEX, mt.cluster)
    p = _onehot(v, p, TEMP_SIGNAL_EVENT, mt.cluster)
    p = _onehot(v, p, MARKER_POSITION, mt.cluster)   # quirk: cluster
    if mt.cluster != "O":
        p = _onehot(v, p, DEP_SIGNAL_PATH, mt.dep1, contains=True)
        p = _onehot(v, p, DEP_SIGNAL_PATH, mt.dep2, contains=True)
    else:
        p += 2 * len(DEP_SIGNAL_PATH)
    mc = causal_signal_pair(doc, e1, e2)
    if mc.cluster != "O":
        p = _onehot(v, p, CAUS_SIGNAL, mc.cluster)
    else:
        p += len(CAUS_SIGNAL)
    if mc.position != "O":
        p = _onehot(v, p, MARKER_POSITION, mc.position)
    else:
        p += len(MARKER_POSITION)
    if mc.cluster != "O":
        p = _onehot(v, p, DEP_SIGNAL_PATH, mc.dep1, contains=True)
        p = _onehot(v, p, DEP_SIGNAL_PATH, mc.dep2, contains=True)
    else:
        p += 2 * len(DEP_SIGNAL_PATH)
    v[p] = wn_sim_bucket(doc.tokens[e1.start_tok].lemma,
                         doc.tokens[e2.start_tok].lemma)
    p += 1
    p = _onehot(v, p, TLINK_LABELS, tlink_type)
    return v
