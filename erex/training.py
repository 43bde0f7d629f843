"""Model training (the reference's trainModel paths, TempRelPro.java:
427-453 / CauseRelPro.java:336-356) as an engine operation.

Collects labeled pair feature vectors from a corpus (gold labels come
from the candidate TLINK/CLINK cells, i.e. the goldCandidate=true
training mode) and fits the four liblinear-format models with the
deterministic OVR ridge trainer. Label column order = first occurrence
in the training stream, like liblinear."""

from __future__ import annotations

import os

import numpy as np

from .corpus import generate_txp
from .extract import (PAIR_CAUSAL, PAIR_DCT, PAIR_EE, PAIR_ET,
                      PipelineConfig, stage1_document)
from .labels import clink_label_num, dense_label_num, \
    tlink_label_num
from .liblinear import train_liblinear_dual, train_ovr_ridge

MODEL_FILES = {PAIR_DCT: "dct.model", PAIR_ET: "et.model",
               PAIR_EE: "ee.model", PAIR_CAUSAL: "causal.model"}


def collect_training_data(contents, config=None, dense=False) -> dict:
    """-> {pair_class: (X, y_ids)} from TXP document strings. With
    dense=True temporal labels index the TimeBank-Dense 6-label set
    (the labelDense training mode)."""
    config = config or PipelineConfig()
    data = {pc: ([], []) for pc in MODEL_FILES}
    for content in contents:
        s1 = stage1_document(content, config=config)
        for p in s1["pairs"]:
            if p["feats"] is None:
                continue
            pc = p["pair_class"]
            gold = p["gold"]
            if pc == PAIR_CAUSAL:
                lid = clink_label_num(gold)
            elif dense:
                lid = dense_label_num(gold)
            else:
                lid = tlink_label_num(gold)
                if gold == "NONE":
                    lid = 0
            if lid == 0:
                continue
            data[pc][0].append(np.asarray(p["feats"], dtype=np.float64))
            data[pc][1].append(lid)
    return data


def train_models(contents, out_dir: str, l2: float = 1.0,
                 dense: bool = False,
                 solver: str = "liblinear") -> dict:
    """Train and write the four model files; returns per-class stats.
    dense=True writes *_dense.model temporal heads (predictDense
    parity, EventTimexRelationClassifier.java:467+).

    solver='liblinear' (default) is the faithful L2R_L2LOSS_SVC_DUAL
    dual coordinate descent (C=1.0, eps=0.01, bias=1.0 — the
    reference's exact Linear.train call, bit-identical weights vs the
    reference jar); solver='ridge' keeps the closed-form OVR ridge as
    a fast deterministic alternative."""
    os.makedirs(out_dir, exist_ok=True)
    contents = list(contents)
    data = collect_training_data(contents, dense=dense)
    stats = {}
    for pc, fname in MODEL_FILES.items():
        if dense:
            if pc == "causal":
                continue
            fname = fname.replace(".model", "_dense.model")
        X, y = data[pc]
        if not X:
            raise ValueError(f"no training data for {pc}")
        X = np.stack(X)
        label_ids = list(dict.fromkeys(y))
        if solver == "liblinear":
            model = train_liblinear_dual(X, y, C=1.0, eps=0.01, bias=1.0)
        elif solver == "ridge":
            model = train_ovr_ridge(X, y, label_ids, bias=1.0, l2=l2)
        else:
            raise ValueError(f"solver must be liblinear/ridge: {solver}")
        model.save(os.path.join(out_dir, fname))
        stats[pc] = {"n": len(y), "d": int(X.shape[1]),
                     "labels": label_ids}
    return stats


def train_from_seeds(n_docs: int, seed: int, out_dir: str,
                     dense: bool = False) -> dict:
    contents = (generate_txp(seed * 999_983 + i) for i in range(n_docs))
    return train_models(contents, out_dir, dense=dense)
