"""Generate the deterministic liblinear-format model files.

The reference ships pre-trained liblinear weight files (models/
temprelpro-{dct,et,ee}.model, causerelpro.model); this repo must be
standalone, so we train our own deterministic models on the synthetic
fixture corpus (seeded — rerunning this script reproduces the same
bytes). Mechanism parity with the reference is in the file format and
the predict path (erex/liblinear.py), not the weight values.

Run:  python tools/train_models.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erex.corpus import generate_txp
from erex.extract import (CAUSAL_DIM, PAIR_CAUSAL, PAIR_DCT, PAIR_EE,
                          PAIR_ET, stage1_document, PipelineConfig)
from erex.labels import TLINK_LABELS, CLINK_LABELS, tlink_label_num, \
    clink_label_num
from erex.liblinear import train_ovr_ridge

N_TRAIN_DOCS = 120
SEED = 7


def main(out_dir=None):
    out_dir = out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "erex", "resources", "models")
    os.makedirs(out_dir, exist_ok=True)

    data = {PAIR_DCT: ([], []), PAIR_ET: ([], []), PAIR_EE: ([], []),
            PAIR_CAUSAL: ([], [])}
    cfg = PipelineConfig()
    for i in range(N_TRAIN_DOCS):
        content = generate_txp(SEED * 999_983 + i)
        s1 = stage1_document(content, config=cfg)
        for p in s1["pairs"]:
            if p["feats"] is None:
                continue
            pc = p["pair_class"]
            if pc == PAIR_CAUSAL:
                feats = np.asarray(p["feats"], dtype=np.float64).copy()
                t = p["gold"]
                # training-time TLINK feature uses the doc's gold tlink map
                # (CauseRelPro.java:203-212); our candidates carry it only
                # implicitly — leave the one-hot zero for training.
                lid = clink_label_num(p["gold"])
                if lid == 0:
                    continue
                data[pc][0].append(feats)
                data[pc][1].append(lid)
            else:
                lid = tlink_label_num(p["gold"])
                if lid == 0 or p["gold"] == "NONE":
                    continue
                data[pc][0].append(np.asarray(p["feats"], dtype=np.float64))
                data[pc][1].append(lid)

    for pc, fname in ((PAIR_DCT, "dct.model"), (PAIR_ET, "et.model"),
                      (PAIR_EE, "ee.model"), (PAIR_CAUSAL, "causal.model")):
        X, y = data[pc]
        if not X:
            raise SystemExit(f"no training data for {pc}")
        X = np.stack(X)
        # liblinear label order: first occurrence in training data
        label_ids = list(dict.fromkeys(y))
        model = train_ovr_ridge(X, y, label_ids, bias=1.0, l2=1.0)
        path = os.path.join(out_dir, fname)
        model.save(path)
        print(f"{fname}: n={len(y)} d={X.shape[1]} labels={label_ids}")


if __name__ == "__main__":
    main()
