"""Evaluation aggregates (A1-A3).

- per-label TP/FP/FN -> P/R/F1: re-derives PairEvaluator
  (/root/reference/src/evaluator/PairEvaluator.java:22-130) as a
  distributed groupby over (gold, pred) counts + a small driver-side
  P/R/F1 table;
- closure-aware P/R (A3, temporal_evaluation.py:264-510 semantics):
  precision = |sys ∩ closure(gold)| / |sys|, recall =
  |gold ∩ closure(sys)| / |gold|, computed per document inside
  map_groups, micro-averaged with a tiny global sum.
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


def closure_aware_prf(edges: "rd.Dataset") -> dict:
    """Graph-based P/R per document (TempEval-3 style), micro-averaged.
    `edges` = pipeline.run_extraction output; gold links are the
    candidate golds, system links are consistent predictions."""
    def per_doc(g: pa.Table) -> pa.Table:
        sys_links, gold_links = [], []
        for r in g.to_pylist():
            if r["kind"] != "edge":
                continue
            if r["consistent"]:
                sys_links.append((r["subj"], r["obj"], r["pred"]))
            if r["gold"] not in (None, "NONE"):
                gold_links.append((r["subj"], r["obj"], r["gold"]))
        tg_gold = TimeGraph()
        for s, o, l in gold_links:
            tg_gold.add(s, o, l)
        tg_sys = TimeGraph()
        for s, o, l in sys_links:
            tg_sys.add(s, o, l)
        p_hit = sum(1 for s, o, l in sys_links
                    if tg_gold.infer(s, o) in (l, None) and
                    tg_gold.infer(s, o) == l)
        r_hit = sum(1 for s, o, l in gold_links
                    if tg_sys.infer(s, o) == l)
        return pa.table({"p_hit": pa.array([p_hit], pa.int64()),
                         "n_sys": pa.array([len(sys_links)], pa.int64()),
                         "r_hit": pa.array([r_hit], pa.int64()),
                         "n_gold": pa.array([len(gold_links)], pa.int64())})

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
