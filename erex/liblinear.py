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


class JavaRandom:
    """java.util.Random's 48-bit LCG — liblinear seeds it with 0
    (Linear.java static init) and draws the CD permutation from it, so
    faithful training must replay the exact stream."""

    _MASK = (1 << 48) - 1
    _MULT = 0x5DEECE66D

    def __init__(self, seed: int = 0):
        self.seed = (seed ^ self._MULT) & self._MASK

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * self._MULT + 0xB) & self._MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if (bound & -bound) == bound:          # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            # Java: while (bits - val + (bound-1) < 0)  [int overflow]
            if bits - val + (bound - 1) < (1 << 31):
                return val


def _solve_l2r_l2loss_svc_dual(rows, y, w_size, eps, Cp, Cn, rnd,
                               max_iter=1000):
    """liblinear 1.95 solve_l2r_l1l2_svc for L2R_L2LOSS_SVC_DUAL,
    transcribed op-for-op (sequential float64 arithmetic in the exact
    Java order, shrinking heuristic, java.util.Random permutation) so
    the returned weights are bit-identical to liblinear-java.

    rows: per-instance list of (feature_index0, value) for NONZERO
    values only — adding a zero term is an exact float identity (and
    can never flip a zero's sign here: w entries never become -0.0
    under round-to-nearest), so skipping zeros preserves bit-exactness
    while making one-hot vectors cheap."""
    inf = float("inf")
    l = len(y)
    diag = (0.5 / Cn, 0.0, 0.5 / Cp)
    upper = (inf, 0.0, inf)
    w = [0.0] * w_size
    alpha = [0.0] * l
    QD = [0.0] * l
    index = list(range(l))
    for i in range(l):
        qd = diag[y[i] + 1]
        for (_j, v) in rows[i]:
            qd += v * v
        QD[i] = qd
    active_size = l
    PGmax_old, PGmin_old = inf, -inf
    it = 0
    while it < max_iter:
        PGmax_new, PGmin_new = -inf, inf
        for i in range(active_size):
            j = i + rnd.next_int(active_size - i)
            index[i], index[j] = index[j], index[i]
        s = 0
        while s < active_size:
            i = index[s]
            yi = y[i]
            g = 0.0
            row = rows[i]
            for (j, v) in row:
                g += w[j] * v
            G = yi * g - 1.0
            C = upper[yi + 1]
            G += alpha[i] * diag[yi + 1]
            PG = 0.0
            if alpha[i] == 0.0:
                if G > PGmax_old:
                    active_size -= 1
                    index[s], index[active_size] = \
                        index[active_size], index[s]
                    continue
                elif G < 0.0:
                    PG = G
            elif alpha[i] == C:
                if G < PGmin_old:
                    active_size -= 1
                    index[s], index[active_size] = \
                        index[active_size], index[s]
                    continue
                elif G > 0.0:
                    PG = G
            else:
                PG = G
            if PG > PGmax_new:
                PGmax_new = PG
            if PG < PGmin_new:
                PGmin_new = PG
            if abs(PG) > 1.0e-12:
                alpha_old = alpha[i]
                a = alpha[i] - G / QD[i]
                if a < 0.0:
                    a = 0.0
                if a > C:
                    a = C
                alpha[i] = a
                d = (a - alpha_old) * yi
                for (j, v) in row:
                    w[j] += d * v
            s += 1
        it += 1
        if PGmax_new - PGmin_new <= eps:
            if active_size == l:
                break
            active_size = l
            PGmax_old, PGmin_old = inf, -inf
            continue
        PGmax_old = PGmax_new
        PGmin_old = PGmin_new
        if PGmax_old <= 0.0:
            PGmax_old = inf
        if PGmin_old >= 0.0:
            PGmin_old = -inf
    return w


def train_liblinear_dual(X: np.ndarray, y_ids, C: float = 1.0,
                         eps: float = 0.01, bias: float = 1.0,
                         max_iter: int = 1000) -> LinearModel:
    """Faithful liblinear-java 1.95 Linear.train for
    L2R_L2LOSS_SVC_DUAL under the reference's exact call convention
    (EventEventRelationClassifier.train :120-170): dense FeatureNode
    rows with indices 1..nFeatures, problem.n = nFeatures, bias = 1.0
    but NO bias node appended — so model.nr_feature comes out n-1 and
    the model's 'bias row' is the LAST feature's trained weights, the
    same call-site quirk the predict path replicates
    (java_semantics=True).

    Deterministic and bit-identical to the reference jar (verified in
    tests/test_liblinear.py against lib/liblinear-java-1.95.jar):
    labels in first-occurrence order, instances permuted class-contiguous
    (groupClasses), one shared java.util.Random(0) stream across the
    one-vs-rest subproblems, dual coordinate descent with shrinking."""
    X = np.asarray(X, dtype=np.float64)
    l, n = X.shape
    y_list = [int(v) for v in y_ids]
    label_ids = list(dict.fromkeys(y_list))
    nr_class = len(label_ids)
    lab_index = {lab: i for i, lab in enumerate(label_ids)}
    data_label = [lab_index[v] for v in y_list]
    count = [0] * nr_class
    for dl in data_label:
        count[dl] += 1
    # groupClasses' one ordering exception: a two-class -1/+1 set with
    # -1 first swaps so the binary SVM's positive weight is for +1
    if nr_class == 2 and label_ids[0] == -1 and label_ids[1] == 1:
        label_ids = [1, -1]
        count = [count[1], count[0]]
        data_label = [1 - dl for dl in data_label]
    start = [0] * nr_class
    for i in range(1, nr_class):
        start[i] = start[i - 1] + count[i - 1]
    perm = [0] * l
    fill = start.copy()
    for i in range(l):
        perm[fill[data_label[i]]] = i
        fill[data_label[i]] += 1
    # sub-problem instances in perm order, zeros stripped (see solver)
    rows = []
    for i in range(l):
        xi = X[perm[i]]
        nz = np.nonzero(xi)[0]
        rows.append([(int(j), float(xi[j])) for j in nz])
    rnd = JavaRandom(0)
    if nr_class == 2:
        # single weight column: +1 for the first label group
        y = [1 if i < start[1] else -1 for i in range(l)]
        w = _solve_l2r_l2loss_svc_dual(rows, y, n, eps, C, C, rnd,
                                       max_iter)
        W = np.asarray(w, dtype=np.float64).reshape(-1, 1)
    else:
        W = np.zeros((n, nr_class), dtype=np.float64)
        for ci in range(nr_class):
            si, ei = start[ci], start[ci] + count[ci]
            y = [1 if si <= i < ei else -1 for i in range(l)]
            w = _solve_l2r_l2loss_svc_dual(rows, y, n, eps, C, C, rnd,
                                           max_iter)
            W[:, ci] = w
    # java_semantics: n-dim input vectors index all n weight rows (the
    # last row is nominally the 'bias row' but was trained as the last
    # feature — the reference's predict call convention)
    return LinearModel(label_ids, W, bias, java_semantics=True)


def train_ovr_ridge(X: np.ndarray, y_ids, label_ids, bias: float = 1.0,
                    l2: float = 1.0) -> LinearModel:
    """Deterministic one-vs-rest ridge 'training' producing a liblinear-
    format model. `y_ids` are 1-based label ids; `label_ids` fixes the
    model's label column order (like liblinear: order of first occurrence
    in training data). NOTE: the last weight row is a REAL trained bias
    column — load these with java_semantics=False (the java call-site
    path would treat it as the last feature's row and drop the bias);
    train_liblinear_dual is the faithful-to-the-reference trainer."""
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
