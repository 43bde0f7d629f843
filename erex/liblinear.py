"""LIBLINEAR text-model I/O and vectorized batch prediction (ST3-ST5).

Re-derives the prediction semantics of the reference's liblinear usage
(/root/reference/src/model/classifier/EventEventRelationClassifier.java:
274-314): a text model file (solver_type / nr_class / label / nr_feature /
bias / w rows) is loaded into a dense numpy matrix; prediction is
``argmax_c (x . W[:, c] + bias * W[nr_feature, c])`` with ties broken by
model label order (liblinear's dec_values scan keeps the first maximum),
and the predicted 1-based label id is decoded through the engine's label
array (``label[pred - 1]``).

The reference's per-instance FeatureNode loop becomes one matmul per
batch.

Training: the reference shells out to liblinear L2R_L2LOSS_SVC_DUAL
(C=1.0, eps=0.01, bias=1.0). We ship our own deterministic trainer — a
one-vs-rest ridge fit in closed form — because model *weights* are data
this repo must generate itself; the file format and predict path are
byte-compatible with liblinear text models.
"""

from __future__ import annotations

import numpy as np


class LinearModel:
    def __init__(self, labels, weights, bias=1.0,
                 solver="L2R_L2LOSS_SVC_DUAL", java_semantics=False):
        self.labels = list(labels)          # model label ids (ints)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.bias = bias
        self.solver = solver
        self.nr_feature = self.weights.shape[0] - (1 if bias >= 0 else 0)
        # java_semantics=True reproduces how the reference CALLS
        # liblinear-java at predict time (EventEventRelationClassifier.java:
        # 289-309): instances are raw FeatureNode lists 1..x_dim with NO
        # appended bias node.  Linear.predictValues then accepts node
        # indices up to n = nr_feature + (bias>=0), so the instance's
        # (nr_feature+1)-th feature value multiplies the BIAS weight row,
        # and features beyond that are silently dropped.  The reference
        # builds 269-dim E-E vectors against an nr_feature=266 model and
        # 377-dim causal vectors against nr_feature=351 — this call
        # convention is the actual shipped behavior, verified against the
        # compiled reference (tools/javaref).
        self.java_semantics = java_semantics

    # -- text format ---------------------------------------------------
    @classmethod
    def load(cls, path: str, java_semantics: bool = False) -> "LinearModel":
        labels, nr_class, nr_feature, bias = [], 0, 0, -1.0
        solver = "L2R_L2LOSS_SVC_DUAL"
        rows = []
        in_w = False
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if in_w:
                    rows.append([float(x) for x in line.split()])
                    continue
                parts = line.split()
                if parts[0] == "solver_type":
                    solver = parts[1]
                elif parts[0] == "nr_class":
                    nr_class = int(parts[1])
                elif parts[0] == "label":
                    labels = [int(x) for x in parts[1:]]
                elif parts[0] == "nr_feature":
                    nr_feature = int(parts[1])
                elif parts[0] == "bias":
                    bias = float(parts[1])
                elif parts[0] == "w":
                    in_w = True
        w = np.array(rows, dtype=np.float64)
        n_cols = nr_class if nr_class > 2 else 1
        w = w.reshape(-1, n_cols)
        expect = nr_feature + (1 if bias >= 0 else 0)
        assert w.shape[0] == expect, (w.shape, nr_feature, bias)
        return cls(labels, w, bias, solver, java_semantics=java_semantics)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(f"solver_type {self.solver}\n")
            f.write(f"nr_class {len(self.labels)}\n")
            f.write("label " + " ".join(str(x) for x in self.labels) + "\n")
            f.write(f"nr_feature {self.nr_feature}\n")
            f.write(f"bias {self.bias}\n")
            f.write("w\n")
            for row in self.weights:
                f.write(" ".join(f"{x:.17g}" for x in row) + "\n")

    # -- prediction ----------------------------------------------------
    def decision_values(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        W = self.weights
        if self.java_semantics:
            # Linear.predictValues accepts node indices 1..n where
            # n = nr_feature (+1 when bias >= 0); index n when bias >= 0
            # hits the bias weight row, larger indices are ignored.  No
            # bias node is appended by the reference's call sites.
            n = self.nr_feature + (1 if self.bias >= 0 else 0)
            k = min(X.shape[1], n)
            return X[:, :k] @ W[:k]
        if self.bias >= 0:
            scores = X @ W[:-1] + self.bias * W[-1]
        else:
            scores = X @ W
        return scores

    def predict_ids(self, X: np.ndarray) -> np.ndarray:
        """Model label ids (the liblinear Linear.predict return value)."""
        if len(self.labels) == 2 and self.weights.shape[1] == 1:
            s = self.decision_values(X)[:, 0]
            return np.where(s > 0, self.labels[0], self.labels[1])
        scores = self.decision_values(X)
        idx = np.argmax(scores, axis=1)     # first max = label-order tie-break
        return np.asarray(self.labels, dtype=np.int64)[idx]

    def predict_labels(self, X: np.ndarray, label_vocab) -> list:
        """Decode through the engine label array: label_vocab[id-1]
        (EventEventRelationClassifier.java:308)."""
        ids = self.predict_ids(X)
        return [label_vocab[i - 1] for i in ids]


def train_ovr_ridge(X: np.ndarray, y_ids, label_ids, bias: float = 1.0,
                    l2: float = 1.0) -> LinearModel:
    """Deterministic one-vs-rest ridge 'training' producing a liblinear-
    format model. `y_ids` are 1-based label ids; `label_ids` fixes the
    model's label column order (like liblinear: order of first occurrence
    in training data)."""
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    if bias >= 0:
        Xb = np.hstack([X, np.full((n, 1), bias)])
    else:
        Xb = X
    A = Xb.T @ Xb + l2 * np.eye(Xb.shape[1])
    y_ids = np.asarray(y_ids)
    if len(label_ids) == 2:
        # liblinear stores a single weight column for 2-class models:
        # predict label[0] when the decision value is positive
        t = np.where(y_ids == label_ids[0], 1.0, -1.0)
        W = np.linalg.solve(A, Xb.T @ t).reshape(-1, 1)
        return LinearModel(list(label_ids), W, bias)
    W = np.zeros((Xb.shape[1], len(label_ids)))
    for c, lid in enumerate(label_ids):
        t = np.where(y_ids == lid, 1.0, -1.0)
        W[:, c] = np.linalg.solve(A, Xb.T @ t)
    return LinearModel(list(label_ids), W, bias)
