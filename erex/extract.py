"""Per-document CATENA-style extraction (the semantic core).

This module holds the *document-local* logic shared verbatim by the
single-process oracle (erex.oracle) and the Ray Data pipeline
(erex.pipeline): the pipeline's three distributed stages call exactly
these functions, which is what makes Ray-vs-oracle parity exact by
construction (SURVEY.md §5 test plan).

Stage structure mirrors SURVEY.md §3.3's canonical Ray shape:

  stage1_document(content)        -> pair rows + node rows + tt links
                                     (parse, mention model, rule sieves,
                                     feature vectors)      [stateless]
  LinearModel.predict_labels(...) -> classifier labels     [actor pool]
  merge_document(rows, models)    -> final triples         [per-doc group:
                                     anchor reasoning R4, CLINK post-edit
                                     R6, timegraph closure R7]

Pipeline wiring follows relpro.TempRelPro.testModel
(/root/reference/src/relpro/TempRelPro.java:508-615) and
task.TempEval3TaskC.main (TempEval3TaskC.java:395-584): T-T rule grid
first, then rules-before-classifier for E-DCT / E-T / E-E, anchor
reasoning from E-T output, CLINK post-edit (CLINK=>BEFORE,
CLINK-R=>AFTER, TempEval3TaskC.java:536-544), rule-first insertion order
into the closure (links from rules are *prepended*)."""

from __future__ import annotations

import importlib.resources as _res
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from .doc import Doc
from .deppath import ee_dependency_path, et_dependency_path
from .features import (ET_DIM, EE_DIM, CAUSAL_DIM, DCT_DENSE_DIM,
                       causal_signal_pair, causal_vector,
                       causal_verb_pair, dct_dense_vector, ee_vector,
                       et_vector,
                       sentence_contains_causal_signal,
                       sentence_contains_causal_verb)
from .labels import TLINK_LABELS, CLINK_LABELS, inverse_tlink
from .liblinear import LinearModel
from .rules.event_event import (anchor_reasoning, causality_link,
                                event_causality_rule, event_event_rule)
from .rules.event_timex import event_timex_rule
from .rules.timex_algebra import timex_timex_rule
from .txp import parse_txp


@dataclass(frozen=False)
class PipelineConfig:
    anchor_reasoning: bool = True     # R4
    clink_postedit: bool = True       # R6
    closure: bool = True              # R7
    causal: bool = True               # CLINK pipeline
    identity_rel: bool = False        # R1 IDENTITY vs SIMULTANEOUS
    dense: bool = False               # TimeBank-Dense 6-label classifier
                                      # heads (predictDense parity)
    model_set: str = "reference"      # "reference" = shipped temprelpro /
                                      # causerelpro weights (models_ref),
                                      # "selftrained" = repo-trained
    causal_tlink_gold: bool = False   # causal TLINK one-hot from the TXP
                                      # annotation (CauseRelPro standalone,
                                      # CauseRelPro.java:200-213 empty-map
                                      # branch) instead of the temporal
                                      # stage's own output
    dct_split: bool = True            # route event-DCT pairs to the DCT
                                      # classifier (TempRelPro flavor).
                                      # False = TaskC flavor: ALL
                                      # event-timex pairs (incl. DCT) use
                                      # the ET model
                                      # (TempEval3TaskC.java:467-470 has
                                      # no DCT split)
    measure_rel: bool = False         # DURATION timexes -> MEASURE rule
                                      # label (EventTimexRelationRule.java
                                      # :35-37; unreachable in the
                                      # reference because the 5-arg ctor
                                      # sets the flag only AFTER the 4-arg
                                      # ctor has read it — opt-in here
                                      # implements the evident intent)


DEFAULT_CONFIG = PipelineConfig()

# The TimeBank-Dense flow as shipped (TimeBankDenseExperiments.java:
# 965-990): rules only for timex-timex, every E-DCT/E-T/E-E candidate
# classified with predictDense; no anchor reasoning, no CLINK
# post-editing (clinkPostEditing=false), no closure (postTimeGraph=
# false), no causal stage.
DENSE_CONFIG = PipelineConfig(dense=True, anchor_reasoning=False,
                              clink_postedit=False, closure=False,
                              causal=False)

PAIR_TT = "tt"
PAIR_DCT = "dct"
PAIR_ET = "et"
PAIR_EE = "ee"
PAIR_CAUSAL = "causal"

FEAT_DIM = {PAIR_DCT: ET_DIM, PAIR_ET: ET_DIM, PAIR_EE: EE_DIM,
            PAIR_CAUSAL: CAUSAL_DIM}
# dense flow: E-DCT uses the 167-dim EventDctRelationClassifier layout
DENSE_FEAT_DIM = {**FEAT_DIM, PAIR_DCT: DCT_DENSE_DIM}


class CatenaModels:
    """The liblinear-format weight matrices (ST3-ST5), ~100 KB of
    read-only state — load once per actor / worker process. dense=True
    loads the TimeBank-Dense temporal heads (*_dense.model).

    model_set="reference" (the default) loads the reference system's own
    shipped weights (resources/models_ref: temprelpro-{dct,et,ee} +
    causerelpro) with liblinear-java call-site semantics, giving
    prediction parity with the reference (tests/test_javaref_parity.py).
    model_set="selftrained" loads the repo-trained models
    (tools/train_models.py — faithful L2R_L2LOSS_SVC_DUAL, bit-exact vs
    the reference jar's Linear.train; tests/test_liblinear.py)."""

    def __init__(self, model_dir=None, dense: bool = False,
                 model_set: str = "reference",
                 java_semantics: bool = True):
        suffix = "_dense.model" if dense else ".model"
        # java call-site semantics for BOTH builtin sets: the
        # reference's shipped weights AND the repo-trained ones were
        # produced by the same Linear.train call convention (problem.n
        # = nFeatures, bias=1.0, no bias node -> nr_feature = n-1, the
        # last feature's weights doubling as the 'bias row'), so
        # prediction must index weights the same way for either.
        # Custom model_dir: pass java_semantics=False for models whose
        # last weight row is a REAL trained bias column (train_ovr_ridge
        # appends one) — the java path would silently drop it.
        java = java_semantics
        if model_dir is None:
            sub = "models"
            if model_set == "reference":
                # dense=True loads the reference's shipped
                # tbdense-{dct,et,ee}.model (vendored as *_dense.model)
                sub = "models_ref"
            base = _res.files("erex") / "resources" / sub
            path = lambda stem, s=suffix: str(base / (stem + s))
        else:
            path = lambda stem, s=suffix: f"{model_dir}/{stem}{s}"
        self.dense = dense
        self.model_set = model_set
        self.dct = LinearModel.load(path("dct"), java_semantics=java)
        self.et = LinearModel.load(path("et"), java_semantics=java)
        self.ee = LinearModel.load(path("ee"), java_semantics=java)
        self.causal = LinearModel.load(path("causal", ".model"),
                                       java_semantics=java)
        from .labels import TLINK_DENSE_LABELS, TLINK_LABELS as _T
        self.temporal_vocab = TLINK_DENSE_LABELS if dense else _T

    def for_class(self, pair_class: str) -> LinearModel:
        return {PAIR_DCT: self.dct, PAIR_ET: self.et, PAIR_EE: self.ee,
                PAIR_CAUSAL: self.causal}[pair_class]


@lru_cache(maxsize=8)
def get_models(model_dir=None, dense: bool = False,
               model_set: str = "reference",
               java_semantics: bool = True) -> CatenaModels:
    return CatenaModels(model_dir, dense, model_set, java_semantics)


# ---------------------------------------------------------------------------
# stage 1: parse + rules + features  (pure per document)
# ---------------------------------------------------------------------------
def tt_rule_grid(doc: Doc, identity_rel: bool = False) -> dict:
    """getTimexTimexRuleRelation (TempRelPro.java:63-83): full pairwise
    grid over the document's timexes; stores pair AND inverse.  Pair
    enumeration follows Java HashMap iteration order over the entity-id
    keys — the R1 era rules are order-asymmetric, so this order is part
    of the reference's observable behavior (see erex/javamap.py)."""
    from .javamap import java_hashmap_order
    ents = [doc.entities[k] for k in java_hashmap_order(doc.entities)]
    ttlinks: dict = {}
    dct_value = doc.dct.value if doc.dct is not None else "XXXX-XX-XX"
    for i in range(len(ents)):
        if not ents[i].is_timex:
            continue
        for j in range(i + 1, len(ents)):
            if not ents[j].is_timex:
                continue
            t1, t2 = ents[i], ents[j]
            rel = timex_timex_rule(
                t1.eid, t1.ttype, t1.value, t1.is_dct,
                t2.eid, t2.ttype, t2.value, t2.is_dct,
                dct_value, identity_rel)
            if rel != "O":
                ttlinks[(t1.eid, t2.eid)] = rel
                ttlinks[(t2.eid, t1.eid)] = inverse_tlink(rel)
    return ttlinks


def causal_candidates(doc: Doc) -> dict:
    """M9 (CauseRelPro.getCandidatePairs, CauseRelPro.java:97-153):
    same-sentence E-E pairs when the sentence has a causal signal/verb,
    plus (e in s_i, e' in s_{i+1}) pairs when s_{i+1} has a signal."""
    clinks: dict = {}
    for src, tgt in doc.clinks:
        clinks[(src, tgt)] = "CLINK"
        clinks[(tgt, src)] = "CLINK-R"
    cands: dict = {}
    sids = doc.sentence_arr
    gate_cache: dict = {}

    def same_sent_gate(sid):
        if sid not in gate_cache:
            gate_cache[sid] = (sentence_contains_causal_signal(doc, sid)
                              or sentence_contains_causal_verb(doc, sid))
        return gate_cache[sid]

    sig_cache: dict = {}

    def signal_gate(sid):
        if sid not in sig_cache:
            sig_cache[sid] = sentence_contains_causal_signal(doc, sid)
        return sig_cache[sid]

    for si, sid in enumerate(sids):
        arr = doc.sentences[sid].entity_arr
        for i, eid1 in enumerate(arr):
            e1 = doc.entities[eid1]
            if same_sent_gate(sid):
                for eid2 in arr[i + 1:]:
                    e2 = doc.entities[eid2]
                    if e1.is_event and e2.is_event:
                        pair = (eid1, eid2)
                        if pair not in cands:
                            cands[pair] = clinks.get(pair, "NONE")
            if si < len(sids) - 1:
                sid2 = sids[si + 1]
                if signal_gate(sid2):
                    for eid2 in doc.sentences[sid2].entity_arr:
                        e2 = doc.entities[eid2]
                        if e1.is_event and e2.is_event:
                            pair = (eid1, eid2)
                            if pair not in cands:
                                cands[pair] = clinks.get(pair, "NONE")
    return cands


def enumerate_pairs(doc, config: PipelineConfig = DEFAULT_CONFIG,
                    gold_candidates=None) -> list:
    """Deterministic candidate pair list [(src, tgt, gold, pair_class)]
    in processing order (temporal candidates then causal candidates) —
    the unit the salted path slices over."""
    out = []
    candidates = doc.tlinks if gold_candidates is None else gold_candidates
    for src, tgt, gold in candidates:
        if src == tgt or src not in doc.entities or tgt not in doc.entities:
            continue
        e1 = doc.entities[src]
        e2 = doc.entities[tgt]
        if e1.is_event and e2.is_event:
            out.append((src, tgt, gold, PAIR_EE))
        elif (e1.is_event and e2.is_timex) or (e1.is_timex and e2.is_event):
            ev, tmx = (e1, e2) if e1.is_event else (e2, e1)
            out.append((src, tgt, gold,
                        PAIR_DCT if (tmx.is_dct and config.dct_split)
                        else PAIR_ET))
    if config.causal:
        for (src, tgt), gold in causal_candidates(doc).items():
            out.append((src, tgt, gold, PAIR_CAUSAL))
    return out


def process_pair(doc, src, tgt, gold, pair_class,
                 config: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Rule + features for one candidate pair (the per-pair unit of
    stage 1)."""
    e1 = doc.entities[src]
    e2 = doc.entities[tgt]
    if pair_class == PAIR_EE:
        if doc.entity_order(e1, e2) == "AFTER":
            e1, e2 = e2, e1
            gold = inverse_tlink(gold)
        dep = ee_dependency_path(doc, e1, e2)
        # dense (TimeBank-Dense) flow: no rule sieve — every candidate
        # goes to predictDense (TimeBankDenseExperiments.java:975-977
        # tlinkFrom*Rules all false, :1286-1380 classifiers on all)
        rule = "O" if config.dense else event_event_rule(doc, e1, e2, dep)
        feats = ee_vector(doc, e1, e2, dep) if rule == "O" else None
        return {"src": e1.eid, "tgt": e2.eid, "pair_class": PAIR_EE,
                "rule_label": rule, "gold": gold, "dep_path": dep,
                "feats": feats}
    if pair_class in (PAIR_DCT, PAIR_ET):
        if e1.is_timex:
            e1, e2 = e2, e1
            gold = inverse_tlink(gold)
        dep = et_dependency_path(doc, e1, e2)
        rule = "O" if config.dense else event_timex_rule(
            doc, e1, e2, dep, measure_rel=config.measure_rel)
        if rule != "O":
            feats = None
        elif config.dense and pair_class == PAIR_DCT:
            # the dense flow builds E-DCT vectors from the 167-dim
            # EventDctRelationClassifier featureList, not the 19-dim
            # EventTimexRelationClassifier one (TimeBankDenseExperiments
            # .java:1015 'new EventDctRelationClassifier("te3","logit")')
            feats = dct_dense_vector(doc, e1, e2)
        else:
            feats = et_vector(doc, e1, e2)
        return {"src": e1.eid, "tgt": e2.eid, "pair_class": pair_class,
                "rule_label": rule, "gold": gold, "dep_path": dep,
                "feats": feats}
    # causal
    same = e1.sent_id == e2.sent_id
    m = causal_verb_pair(doc, e1, e2)
    cverb = event_causality_rule(same, m.text, m.cluster, m.dep1, m.dep2)
    rule = causality_link(cverb)
    feats = None
    if rule == "O":
        # precision gate: only pairs whose causal-signal marker has a
        # non-trivial dependency path reach the classifier
        # (CauseRelPro.java:219-222, getSimplifiedSignalDependencyPath
        # != "O|O"); the rest are dropped entirely
        mc = causal_signal_pair(doc, e1, e2)
        if mc.dep1 == "O" and mc.dep2 == "O":
            return None
        dep = ee_dependency_path(doc, e1, e2)
        feats = causal_vector(doc, e1, e2, dep, "O")
    return {"src": src, "tgt": tgt, "pair_class": PAIR_CAUSAL,
            "rule_label": rule, "gold": gold, "dep_path": "",
            "feats": feats}


def attach_gold_tlink(doc, pairs: list,
                      config: PipelineConfig = DEFAULT_CONFIG) -> None:
    """Gold TLINK type per causal pair for the standalone CauseRelPro
    TLINK one-hot (doc.getTlinkTypes lookup, then inverse —
    CauseRelPro.java:200-213); travels with the pair so the distributed
    merge never needs the document back."""
    if not (config.causal and config.causal_tlink_gold):
        return
    raw = {}
    for s, t, g in doc.tlinks:
        raw[(s, t)] = g              # HashMap.put overwrite semantics
    for p in pairs:
        if p["pair_class"] == PAIR_CAUSAL:
            t = raw.get((p["src"], p["tgt"]))
            if t is None:
                inv = raw.get((p["tgt"], p["src"]))
                t = inverse_tlink(inv) if inv else None
            p["gold_tlink"] = t if t is not None else "O"


def stage1_document(content: str, name: str = "TEXT",
                    config: PipelineConfig = DEFAULT_CONFIG,
                    gold_candidates=None) -> dict:
    """Parse one TXP document and produce everything downstream stages
    need, with no cross-document state. Returns
    {pairs, tt, nodes, ttlinks} where `pairs` rows are
    (src, tgt, pair_class, rule_label, gold, feats|None).

    gold_candidates: optional [(src, tgt, rel)] replacing the TXP
    candidate cells — the reference's goldCandidate=true mode where
    candidates come from a paired gold TimeML
    (TempRelPro.java:139-143 `candidateTlinks = docTml.getTlinks()`)."""
    doc = parse_txp(content, name=name)
    ttlinks = tt_rule_grid(doc, config.identity_rel)
    # M5 candidate filter + causal candidate gen, then per-pair rule +
    # features; enumerate_pairs/process_pair are also the units of the
    # salted skew path (pipeline.run_extraction_salted)
    pairs = [p for cand in enumerate_pairs(doc, config, gold_candidates)
             if (p := process_pair(doc, *cand, config=config)) is not None]

    attach_gold_tlink(doc, pairs, config)

    nodes = []
    for e in doc.entities.values():
        if e.is_event:
            surface = doc.entity_token_attr(e, "lemma")
            nodes.append({"mention_id": e.eid, "kind": "EVENT",
                          "surface": surface, "attr": e.ev_class,
                          "sent_id": e.sent_id})
        else:
            nodes.append({"mention_id": e.eid, "kind": "TIMEX",
                          "surface": e.value, "attr": e.ttype,
                          "sent_id": e.sent_id if not (e.is_dct or e.is_empty)
                          else ("DCT" if e.is_dct else "ETX")})
    return {"pairs": pairs, "ttlinks": ttlinks, "nodes": nodes}


# ---------------------------------------------------------------------------
# stage 3: per-document merge (R4 + R6 + R7)
# ---------------------------------------------------------------------------
def merge_document(pairs: list, ttlinks: dict, models: CatenaModels,
                   config: PipelineConfig = DEFAULT_CONFIG,
                   external_clinks: dict = None) -> list:
    """`pairs` rows must carry cls_label (classifier output) for rows with
    rule_label == 'O' of classes dct/et/ee, and feats for causal rows.
    Returns final triple rows:
    (src, tgt, label, pair_class, stage, consistent, gold) — in the
    reference's closure-input order (ttStr + etStr + eeStr,
    TempEval3TaskC.java:562).

    external_clinks: precomputed CLINK map {(e1, e2): CLINK|CLINK-R}
    (both directions, as built by TempEval3TaskC.getCLINKs from the
    causal extractor's output file) used for the R6 post-edit instead of
    the in-merge causal stage — the TaskC flavor."""
    out = []

    # T-T triples: the whole grid, both directions, in the reference's
    # java.util.HashMap keySet iteration order over the "src\ttgt" string
    # keys (TempRelPro.java:520-527 / TempEval3TaskC.java:454 both
    # iterate ttlinks.keySet())
    from .javamap import java_hashmap_order
    tt_order = java_hashmap_order([f"{s}\t{t}" for (s, t) in ttlinks])
    tt_rows = []
    for seq, key in enumerate(tt_order):
        s, t = key.split("\t")
        # tt_seq = keySet emission index (the TimeML writer and triple
        # sinks emit in this order; the returned row order below is the
        # closure-input order, which differs for SIMULTANEOUS pairs)
        tt_rows.append({"src": s, "tgt": t, "label": ttlinks[(s, t)],
                        "pair_class": PAIR_TT, "stage": "rule",
                        "gold": "NONE", "tt_seq": seq})

    # E-T / E-DCT: rule preferred over classifier; build anchor maps from
    # the final labels (TempEval3TaskC.java:467-502)
    etanchor, etbefore, etafter = {}, {}, {}
    et_rows = []
    for p in pairs:
        if p["pair_class"] not in (PAIR_DCT, PAIR_ET):
            continue
        rule = p["rule_label"]
        label = rule if rule != "O" else p.get("cls_label", "NONE")
        stage = "rule" if rule != "O" else "classifier"
        if label == "IS_INCLUDED":
            etanchor[p["src"]] = p["tgt"]
        elif label == "BEFORE":
            etbefore[p["src"]] = p["tgt"]
        elif label == "AFTER":
            etafter[p["src"]] = p["tgt"]
        et_rows.append({"src": p["src"], "tgt": p["tgt"], "label": label,
                        "pair_class": p["pair_class"], "stage": stage,
                        "gold": p["gold"]})

    # temporal label map for the causal TLINK feature
    # (CauseRelPro.java:200-213 with supplied tlinks)
    tlink_map = {}
    for r in tt_rows + et_rows:
        tlink_map[(r["src"], r["tgt"])] = r["label"]

    ee_pairs = [p for p in pairs if p["pair_class"] == PAIR_EE]
    ee_pre = {}
    for p in ee_pairs:
        rule = p["rule_label"]
        if rule == "O" and config.anchor_reasoning:
            reason = anchor_reasoning(p["src"], p["tgt"], etanchor, etbefore,
                                      etafter, ttlinks)
            if reason != "O":
                if reason in ("DURING", "DURING_INV"):
                    reason = "SIMULTANEOUS"
                ee_pre[(p["src"], p["tgt"])] = ("reason", reason)
                continue
        if rule != "O":
            # IDENTITY downgrade happens at emission (TempRelPro.java:572)
            ee_pre[(p["src"], p["tgt"])] = (
                "rule", "SIMULTANEOUS" if rule == "IDENTITY" else rule)
        else:
            ee_pre[(p["src"], p["tgt"])] = (
                "classifier", p.get("cls_label", "NONE"))
    for p in ee_pairs:
        stage, label = ee_pre[(p["src"], p["tgt"])]
        tlink_map.setdefault((p["src"], p["tgt"]), label)

    # causal pairs: rule triples pass through; classifier with the TLINK
    # one-hot filled from the temporal output; NONE dropped (M14)
    clink_map = {}
    causal_rows = []
    if config.causal:
        cls_pairs = [p for p in pairs if p["pair_class"] == PAIR_CAUSAL]
        todo = [p for p in cls_pairs if p["rule_label"] == "O"]
        if todo:
            X = np.stack([np.asarray(p["feats"], dtype=np.float32)
                          for p in todo])
            # fill the trailing 14-dim TLINK one-hot — from the temporal
            # stage's own output (integrated CATENA flow) or from the TXP
            # gold annotation (standalone CauseRelPro flow)
            for i, p in enumerate(todo):
                if config.causal_tlink_gold:
                    t = p.get("gold_tlink")
                else:
                    t = tlink_map.get((p["src"], p["tgt"]))
                    if t is None:
                        inv = tlink_map.get((p["tgt"], p["src"]))
                        t = inverse_tlink(inv) if inv else None
                if t in TLINK_LABELS:
                    X[i, CAUSAL_DIM - 14 + TLINK_LABELS.index(t)] = 1.0
            labels = models.causal.predict_labels(X, CLINK_LABELS)
        else:
            labels = []
        for p in cls_pairs:
            if p["rule_label"] != "O":
                label, stage = p["rule_label"], "rule"
            else:
                label, stage = labels.pop(0), "classifier"
            if label == "NONE":
                continue
            clink_map[(p["src"], p["tgt"])] = label
            causal_rows.append({"src": p["src"], "tgt": p["tgt"],
                                "label": label, "pair_class": PAIR_CAUSAL,
                                "stage": stage, "gold": p["gold"]})

    if external_clinks is not None:
        clink_map = external_clinks

    # E-E final: rule / reason / clink post-edit / classifier
    ee_rows = []
    for p in ee_pairs:
        stage, label = ee_pre[(p["src"], p["tgt"])]
        if stage == "classifier" and config.clink_postedit:
            cl = clink_map.get((p["src"], p["tgt"]))
            if cl is not None:
                label = "BEFORE" if cl == "CLINK" else "AFTER"
                stage = "clink-edit"
        ee_rows.append({"src": p["src"], "tgt": p["tgt"], "label": label,
                        "pair_class": PAIR_EE, "stage": stage,
                        "gold": p["gold"]})

    # closure: rule-derived links first within each block (prepend order,
    # TempEval3TaskC.java:456,498,552)
    def rule_first(rows):
        rules = [r for r in rows if r["stage"] in ("rule", "reason")]
        others = [r for r in rows if r["stage"] not in ("rule", "reason")]
        return list(reversed(rules)) + others

    # tt block: the reference prepends only SIMULTANEOUS pairs (relabeled
    # IDENTITY in the closure string) and appends the rest in keySet
    # order (TempEval3TaskC.java:455-459) — IDENTITY and SIMULTANEOUS are
    # constraint-identical in the point algebra, so only this order (not
    # the relabel) affects closure outcomes
    tt_sim = [r for r in tt_rows if r["label"] == "SIMULTANEOUS"]
    tt_other = [r for r in tt_rows if r["label"] != "SIMULTANEOUS"]
    tt_closure = list(reversed(tt_sim)) + tt_other

    temporal = tt_closure + rule_first(et_rows) + rule_first(ee_rows)
    if config.closure:
        from .timegraph import TimeGraph
        tg = TimeGraph()
        for r in temporal:
            r["consistent"] = tg.add(r["src"], r["tgt"], r["label"])
    else:
        for r in temporal:
            r["consistent"] = True
    for r in causal_rows:
        r["consistent"] = True
    return temporal + causal_rows


# ---------------------------------------------------------------------------
# fused single-process path (oracle + tests)
# ---------------------------------------------------------------------------
def score_stage(pairs: list, models: CatenaModels) -> None:
    """Fill cls_label in-place for dct/et/ee rows with rule 'O' —
    the oracle equivalent of the actor-pool scorer stage."""
    vocab = models.temporal_vocab
    for pc in (PAIR_DCT, PAIR_ET, PAIR_EE):
        todo = [p for p in pairs
                if p["pair_class"] == pc and p["rule_label"] == "O"]
        if not todo:
            continue
        X = np.stack([np.asarray(p["feats"], dtype=np.float32)
                      for p in todo])
        for p, lbl in zip(todo, models.for_class(pc).predict_labels(X, vocab)):
            p["cls_label"] = lbl


def extract_document(content: str, models: CatenaModels = None,
                     config: PipelineConfig = DEFAULT_CONFIG,
                     name: str = "TEXT", gold_timeml: str = None) -> dict:
    """Whole per-document pipeline in-process; returns
    {triples, nodes}. `gold_timeml`: optional paired gold TimeML whose
    TLINKs become the candidate pairs (goldCandidate mode)."""
    if models is None:
        models = get_models(dense=config.dense, model_set=config.model_set)
    gold_candidates = None
    if gold_timeml is not None:
        from .timeml import parse_timeml
        parsed = parse_timeml(gold_timeml)
        gold_candidates = [(src, tgt, rel)
                           for src, tgt, rel, _d in parsed["tlinks"]]
    s1 = stage1_document(content, name=name, config=config,
                         gold_candidates=gold_candidates)
    score_stage(s1["pairs"], models)
    triples = merge_document(s1["pairs"], s1["ttlinks"], models, config)
    return {"triples": triples, "nodes": s1["nodes"]}


def inverse_clink(label: str) -> str:
    """TempEval3TaskC.getInverseClinkLabel (TempEval3TaskC.java:366-370)."""
    return "CLINK-R" if label == "CLINK" else "CLINK"


def taskc_sections(content: str, name: str = "TEXT",
                   external_clinks: dict = None,
                   models: CatenaModels = None) -> dict:
    """The TempEval3TaskC.main per-file merge path
    (TempEval3TaskC.java:439-556) as the engine runs it: no DCT split
    (every event-timex pair uses the ET model), anchor reasoning R4,
    CLINK post-edit R6 from a precomputed clink map, rule-first
    closure-input assembly — everything up to (and excluding) the
    closure, mirroring tools/javaref `Driver taskc` row for row.

    Returns {"tt": [(src,tgt,gold,label)], "et": [...], "ee": [...],
    "graph": [(src,tgt,label)] in exact ttStr+etStr+eeStr order (tt
    SIMULTANEOUS relabeled IDENTITY, C:455-456)}."""
    cfg = PipelineConfig(anchor_reasoning=True, clink_postedit=True,
                         closure=False, causal=False, dct_split=False)
    if models is None:
        models = get_models(model_set="reference")
    s1 = stage1_document(content, name=name, config=cfg)
    score_stage(s1["pairs"], models)
    rows = merge_document(s1["pairs"], s1["ttlinks"], models, cfg,
                          external_clinks=external_clinks)
    sections = {"tt": [], "et": [], "ee": [], "graph": []}
    for r in rows:
        is_tt = r["pair_class"] == PAIR_TT
        sections["graph"].append(
            (r["src"], r["tgt"],
             "IDENTITY" if is_tt and r["label"] == "SIMULTANEOUS"
             else r["label"]))
        key = PAIR_TT if is_tt else (
            "et" if r["pair_class"] in (PAIR_DCT, PAIR_ET) else "ee")
        gold = r["label"] if is_tt else r["gold"]
        sections[key].append((r["src"], r["tgt"], gold, r["label"]))
    return sections
