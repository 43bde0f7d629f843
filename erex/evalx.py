"""Evaluation aggregates (A1-A3).

- per-label TP/FP/FN -> P/R/F1: re-derives PairEvaluator
  (/root/reference/src/evaluator/PairEvaluator.java:22-130) as a
  distributed groupby over (gold, pred) counts + a small driver-side
  P/R/F1 table;
- closure-aware P/R (A3): the TempEval-3 tool's `evaluate_two_files`
  (temporal_evaluation.py:338-384) and its `implicit_in_recall`
  variant (:264-330), re-derived per document inside map_groups and
  micro-averaged with a tiny global sum.  Both sides are first
  REDUCED (relation_to_timegraph.py:1986-2011 via get_timegraphs:
  exact-duplicate triples dropped, links already entailed when added
  dropped, closure-violating links kept), then
  precision = |{reduced sys matched in gold}| / |reduced sys| and
  recall = |{reduced gold matched in sys}| / |reduced gold|, where
  "matched" = raw-triple membership incl. the reverse relation OR
  full point-constraint entailment in the other side's closure
  (temporal_evaluation.py:190-208 total_relation_matched).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from ._env import remote_args
from .timegraph import TimeGraph


def confusion_counts(edges: "rd.Dataset") -> pd.DataFrame:
    """(gold, pred, n) over evaluated pairs (gold != NONE, edge rows)."""
    def partial(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for kind, gold, pred in zip(t.column("kind").to_pylist(),
                                    t.column("gold").to_pylist(),
                                    t.column("pred").to_pylist()):
            if kind != "edge" or gold in (None, "NONE"):
                continue
            key = (gold, pred)
            agg[key] = agg.get(key, 0) + 1
        return pa.table({
            "gold": pa.array([k[0] for k in agg], pa.string()),
            "pred": pa.array([k[1] for k in agg], pa.string()),
            "n": pa.array(list(agg.values()), pa.int64())})

    out = (edges.map_batches(partial, batch_format="pyarrow",
                             **remote_args())
           .groupby(["gold", "pred"]).aggregate(Sum("n", alias_name="n")))
    return out.to_pandas().sort_values(["gold", "pred"])\
        .reset_index(drop=True)


def prf_from_confusion(conf: pd.DataFrame) -> pd.DataFrame:
    """Per-label precision/recall/F1 from (gold, pred, n) counts."""
    labels = sorted(set(conf["gold"]) | set(conf["pred"]))
    rows = []
    for lbl in labels:
        tp = int(conf[(conf["gold"] == lbl) & (conf["pred"] == lbl)]["n"].sum())
        fp = int(conf[(conf["gold"] != lbl) & (conf["pred"] == lbl)]["n"].sum())
        fn = int(conf[(conf["gold"] == lbl) & (conf["pred"] != lbl)]["n"].sum())
        p = tp / max(1, tp + fp)
        r = tp / max(1, tp + fn)
        f = 2 * p * r / max(1e-12, p + r)
        rows.append({"label": lbl, "tp": tp, "fp": fp, "fn": fn,
                     "precision": p, "recall": r, "f1": f})
    return pd.DataFrame(rows)


# the evaluation tool's default option rewrites DURING/DURING_INV to
# SIMULTANEOUS before anything else touches a relType
# (temporal_evaluation.py:63-73 change_DURING_relation, applied in both
# get_relations and create_timegraph_from_weight_sorted_relations)
_DURING_NORM = {"DURING": "SIMULTANEOUS", "DURING_INV": "SIMULTANEOUS"}

# temporal_evaluation.py:110-135 reverse_relation (DURING pairs are
# unreachable post-normalization; unknown labels return unchanged)
_REVERSE = {"BEFORE": "AFTER", "AFTER": "BEFORE", "IBEFORE": "IAFTER",
            "IAFTER": "IBEFORE", "BEGINS": "BEGUN_BY",
            "BEGUN_BY": "BEGINS", "ENDS": "ENDED_BY", "ENDED_BY": "ENDS",
            "INCLUDES": "IS_INCLUDED", "IS_INCLUDED": "INCLUDES",
            "DURING": "DURING_INV", "DURING_INV": "DURING"}


def reduce_links(links) -> tuple:
    """Reference graph reduction (get_timegraphs,
    temporal_evaluation.py:157-167 + relation_to_timegraph.py:2007-2011):
    feed exact-deduplicated triples IN ORDER into a timegraph; the
    reduced ("final") set keeps every link except those already
    entailed when added (remove_from_reduce); closure-violating links
    are kept too (get_timegraphs appends tg.violated_relations back).
    Returns (reduced_list, timegraph)."""
    tg = TimeGraph()
    seen: set = set()
    reduced = []
    for s, o, l in links:
        l = _DURING_NORM.get(l, l)
        if (s, o, l) in seen:
            continue
        seen.add((s, o, l))
        n_red = len(tg.redundant)
        tg.add(s, o, l)
        if len(tg.redundant) == n_red:      # violated or newly-added
            reduced.append((s, o, l))
    return reduced, tg


def _raw_with_reverses(links) -> set:
    """get_triples (temporal_evaluation.py:138-155): every raw triple
    plus its reverse when the endpoints differ."""
    out: set = set()
    for s, o, l in links:
        l = _DURING_NORM.get(l, l)
        out.add((s, o, l))
        if s != o:
            out.add((o, s, _REVERSE.get(l, l)))
    return out


def reduced_prf_doc(sys_links, gold_links,
                    implicit_in_recall: bool = False) -> dict:
    """One document of the TempEval-3 graph-based evaluation
    (`evaluate_two_files`, temporal_evaluation.py:338-384; with
    implicit_in_recall=True, `evaluate_two_files_implicit_in_recall`,
    :264-330).  Links are consumed in the given order — the reference
    feeds TLINKs in document order and the reduction is
    order-sensitive.  Returns the micro-average parts:
    {p_hit, n_sys, r_hit (float when implicit), n_gold}."""
    gold_reduced, tg_gold = reduce_links(gold_links)
    sys_reduced, tg_sys = reduce_links(sys_links)
    gold_raw = _raw_with_reverses(gold_links)
    sys_raw = _raw_with_reverses(sys_links)
    p_hit = sum(1 for s, o, l in sys_reduced
                if (s, o, l) in gold_raw or tg_gold.entails(s, o, l))
    r_hit: float = sum(1 for s, o, l in gold_reduced
                       if (s, o, l) in sys_raw or tg_sys.entails(s, o, l))
    if implicit_in_recall:
        # sys reduced links absent from the gold reduced set but
        # entailed by the gold closure, credited to recall with weight
        # w = 0.99 / (1 + n(n-1)/2 - rec_matched) over the common
        # entity count n (temporal_evaluation.py:288-301)
        gold_red_set = set(gold_reduced)
        implicit = sum(1 for s, o, l in sys_reduced
                       if (s, o, l) not in gold_red_set
                       and tg_gold.entails(s, o, l))
        ents = {e for s, o, _ in gold_reduced for e in (s, o)} \
            & {e for s, o, _ in sys_reduced for e in (s, o)}
        n = len(ents)
        w = 0.99 / (1 + 0.5 * n * (n - 1) - r_hit)
        r_hit = r_hit + w * implicit
    return {"p_hit": p_hit, "n_sys": len(sys_reduced),
            "r_hit": r_hit, "n_gold": len(gold_reduced)}


def closure_aware_prf(edges: "rd.Dataset",
                      implicit_in_recall: bool = False) -> dict:
    """Graph-based P/R per document (TempEval-3 `evaluate_two_files`
    semantics — reduced-graph denominators), micro-averaged.  `edges` =
    pipeline.run_extraction output; gold links are the candidate golds,
    system links are consistent predictions (what the TimeML writer
    emits).  The reference consumes TLINKs in document order; a
    distributed groupby does not guarantee intra-group row order, so
    links are fed in canonical lexicographic order instead — same
    reduction semantics, deterministic under any shuffle (documented
    seam)."""
    def per_doc(g: pa.Table) -> pa.Table:
        sys_links, gold_links = [], []
        for r in g.to_pylist():
            if r["kind"] != "edge":
                continue
            if r["consistent"]:
                sys_links.append((r["subj"], r["obj"], r["pred"]))
            if r["gold"] not in (None, "NONE"):
                gold_links.append((r["subj"], r["obj"], r["gold"]))
        res = reduced_prf_doc(sorted(sys_links), sorted(gold_links),
                              implicit_in_recall=implicit_in_recall)
        return pa.table({
            "p_hit": pa.array([res["p_hit"]], pa.int64()),
            "n_sys": pa.array([res["n_sys"]], pa.int64()),
            "r_hit": pa.array([float(res["r_hit"])], pa.float64()),
            "n_gold": pa.array([res["n_gold"]], pa.int64())})

    def decode(t: pa.Table) -> pa.Table:
        # groupby keys must not be dictionary-encoded (Ray sort limitation)
        i = t.schema.get_field_index("doc_sha")
        col = t.column("doc_sha")
        if pa.types.is_dictionary(col.type):
            t = t.set_column(i, "doc_sha",
                             col.cast(pa.string()))
        return t

    agg = (edges.map_batches(decode, batch_format="pyarrow",
                             **remote_args())
           .groupby("doc_sha").map_groups(per_doc,
                                          batch_format="pyarrow",
                                          **remote_args())
           .sum(["p_hit", "n_sys", "r_hit", "n_gold"]))
    p = agg["sum(p_hit)"] / max(1, agg["sum(n_sys)"])
    r = agg["sum(r_hit)"] / max(1, agg["sum(n_gold)"])
    return {"precision": p, "recall": r,
            "f1": 2 * p * r / max(1e-12, p + r),
            "n_sys": agg["sum(n_sys)"], "n_gold": agg["sum(n_gold)"]}
