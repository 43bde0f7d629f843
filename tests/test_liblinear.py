import numpy as np

from erex.liblinear import LinearModel, train_ovr_ridge


def test_save_load_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    X = rng.rand(50, 8)
    y = rng.choice([1, 5, 7], 50)
    m = train_ovr_ridge(X, y, [1, 5, 7])
    p = tmp_path / "m.model"
    m.save(str(p))
    m2 = LinearModel.load(str(p))
    assert m2.labels == [1, 5, 7]
    assert m2.nr_feature == 8
    np.testing.assert_allclose(m.weights, m2.weights)
    np.testing.assert_array_equal(m.predict_ids(X), m2.predict_ids(X))


def test_predict_argmax_and_decode():
    # hand-built model: feature0 votes label 3, feature1 votes label 1
    W = np.array([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]])  # last row = bias
    m = LinearModel([3, 1], np.hstack([W, np.zeros((3, 1))]), bias=1.0)
    m.labels = [3, 1, 2]
    X = np.array([[2.0, 0.0], [0.0, 2.0], [0.0, 0.0]])
    ids = m.predict_ids(X)
    assert list(ids[:2]) == [3, 1]
    # tie on the all-zero row -> first label in model order wins
    assert ids[2] == 3
    vocab = ["BEFORE", "AFTER", "IBEFORE"]
    assert m.predict_labels(X, vocab) == ["IBEFORE", "BEFORE", "IBEFORE"]


def test_two_class_single_column(tmp_path):
    rng = np.random.RandomState(1)
    X = rng.rand(40, 4)
    y = np.where(X[:, 0] > 0.5, 2, 9)
    m = train_ovr_ridge(X, y, [2, 9])
    assert m.weights.shape[1] == 1
    p = tmp_path / "m2.model"
    m.save(str(p))
    m2 = LinearModel.load(str(p))
    ids = m2.predict_ids(X)
    assert set(ids) <= {2, 9}
    # mostly learns the split
    assert (ids == y).mean() > 0.8


def test_shipped_models_load():
    from erex.extract import get_models
    from erex.features import ET_DIM, EE_DIM, CAUSAL_DIM
    # default set: the reference system's own weights, with the
    # liblinear-java call-site semantics (nr_feature below the vector
    # dims is the shipped reality — see resources/models_ref/README.md)
    m = get_models()
    assert m.dct.nr_feature == 268 and m.dct.java_semantics
    assert m.et.nr_feature == 268 and m.et.java_semantics
    assert m.ee.nr_feature == 266 and m.ee.java_semantics
    assert m.causal.nr_feature == 351 and m.causal.java_semantics
    assert [len(lbls) for lbls in
            (m.dct.labels, m.et.labels, m.ee.labels, m.causal.labels)] \
        == [7, 10, 10, 3]
    # self-trained models come from the same Linear.train call
    # convention (problem.n = vector dim, no bias node), so they carry
    # the same nr_feature = n-1 quirk and java call-site semantics
    m2 = get_models(model_set="selftrained")
    assert m2.dct.nr_feature == ET_DIM - 1 and m2.dct.java_semantics
    assert m2.et.nr_feature == ET_DIM - 1
    assert m2.ee.nr_feature == EE_DIM - 1
    assert m2.causal.nr_feature == CAUSAL_DIM - 1


def _java_train(X, y, workdir):
    """Train via the REAL liblinear-java-1.95.jar exactly as the
    reference calls it (tools/javaref/driver/javaref/TrainCheck.java);
    returns (labels, nr_feature, flat weight array)."""
    import struct
    import subprocess
    lines = ["%d %d" % X.shape]
    for i in range(len(y)):
        lines.append(str(int(y[i])) + " "
                     + " ".join(repr(float(v)) for v in X[i]))
    res = subprocess.run(
        ["java", "-cp",
         workdir + ":/root/reference/lib/liblinear-java-1.95.jar",
         "javaref.TrainCheck"],
        input="\n".join(lines) + "\n",
        capture_output=True, text=True, check=True)
    out = res.stdout.split("\n")
    labels = [int(v) for v in out[0].split()[1:]]
    nrf = int(out[1].split()[1])
    wlen = int(out[2].split()[1])
    w = np.array([struct.unpack(">d", int(h, 16).to_bytes(8, "big"))[0]
                  for h in out[3:3 + wlen]])
    return labels, nrf, w


def _bits(v):
    import struct
    return struct.pack(">d", float(v))


def _assert_bit_equal(jw, pw):
    assert len(jw) == pw.size
    for a, b in zip(jw, pw):
        if a == 0.0 and b == 0.0:      # +-0.0 equivalent (see solver doc)
            continue
        assert _bits(a) == _bits(b), (a, b)


def test_train_dual_bit_exact_vs_liblinear_java(tmp_path):
    """train_liblinear_dual == the reference jar's Linear.train,
    weight-for-weight at the bit level, across binary and multiclass
    shapes AND real extraction feature vectors (the reference's actual
    training call: L2R_L2LOSS_SVC_DUAL, C=1.0, eps=0.01, bias=1.0 with
    no bias node — EventEventRelationClassifier.java:120-170)."""
    import os
    import shutil
    import subprocess

    import pytest

    from erex.liblinear import train_liblinear_dual

    javac = shutil.which("javac")
    if not (javac and shutil.which("java")
            and os.path.exists("/root/reference/lib/liblinear-java-1.95.jar")):
        pytest.skip("JVM / liblinear jar not available")
    src = os.path.join(os.path.dirname(__file__), "..", "tools",
                       "javaref", "driver", "javaref", "TrainCheck.java")
    td = str(tmp_path)
    subprocess.run([javac, "-cp",
                    "/root/reference/lib/liblinear-java-1.95.jar",
                    "-d", td, src], check=True)

    rng = np.random.RandomState(5)
    for l, n, k in ((40, 7, 2), (60, 9, 4), (30, 5, 3)):
        X = np.round(rng.normal(size=(l, n)) * 4) / 4.0
        X[rng.random(size=X.shape) < 0.5] = 0.0
        y = rng.randint(1, k + 1, size=l)
        y[:k] = np.arange(1, k + 1)     # all classes present
        jl, jnrf, jw = _java_train(X, y, td)
        m = train_liblinear_dual(X, y)
        assert jl == m.labels and jnrf == m.nr_feature
        _assert_bit_equal(jw, m.weights.reshape(-1))

    # groupClasses' -1/+1 exception: -1 first swaps to ['1', '-1'] so
    # the binary SVM's positive weight is for +1
    X = np.round(rng.normal(size=(40, 6)) * 4) / 4.0
    y = np.where(rng.random(40) < 0.5, -1, 1)
    y[:2] = (-1, 1)                     # -1 occurs first
    jl, jnrf, jw = _java_train(X, y, td)
    m = train_liblinear_dual(X, y)
    assert jl == m.labels == [1, -1]
    _assert_bit_equal(jw, m.weights.reshape(-1))

    # real extraction features (one-hot blocks + wnlin doubles)
    from erex.corpus import generate_txp
    from erex.training import collect_training_data
    data = collect_training_data([generate_txp(1000 + i)
                                  for i in range(10)])
    for pc in ("ee", "causal"):
        X, y = data[pc]
        X = np.stack(X)
        jl, jnrf, jw = _java_train(X, y, td)
        m = train_liblinear_dual(X, y)
        assert jl == m.labels and jnrf == m.nr_feature
        _assert_bit_equal(jw, m.weights.reshape(-1))


def test_train_dual_predict_roundtrip(tmp_path):
    """Model files written by the faithful trainer load and predict
    through the same java-semantics path as the shipped reference
    weights; sanity: it learns a separable split."""
    from erex.liblinear import train_liblinear_dual

    rng = np.random.RandomState(3)
    X = rng.rand(80, 6)
    y = np.where(X[:, 0] > 0.5, 2, 9)
    y[:2] = (2, 9)
    m = train_liblinear_dual(X, y)
    p = tmp_path / "dual.model"
    m.save(str(p))
    m2 = LinearModel.load(str(p), java_semantics=True)
    assert m2.labels == m.labels and m2.nr_feature == m.nr_feature
    np.testing.assert_allclose(m.weights, m2.weights)
    ids = m2.predict_ids(X)
    assert (ids == y).mean() > 0.9


def test_java_random_stream():
    """JavaRandom replays java.util.Random(0) exactly (first draws of
    nextInt for a non-power-of-two and a power-of-two bound)."""
    from erex.liblinear import JavaRandom
    r = JavaRandom(0)
    # java.util.Random(0).nextInt(1000) -> 360 948 29 447 515 (JVM probe)
    assert [r.next_int(1000) for _ in range(5)] == [360, 948, 29, 447, 515]
    r = JavaRandom(0)
    # java.util.Random(0).nextInt(16) -> 11 13 3 9 10 (JVM probe)
    assert [r.next_int(16) for _ in range(5)] == [11, 13, 3, 9, 10]
