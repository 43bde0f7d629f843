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
    # self-trained stand-ins keep the full engineered dimensionality
    m2 = get_models(model_set="selftrained")
    assert m2.dct.nr_feature == ET_DIM
    assert m2.et.nr_feature == ET_DIM
    assert m2.ee.nr_feature == EE_DIM
    assert m2.causal.nr_feature == CAUSAL_DIM
