"""SparkSom local (ndarray) path vs the reference's golden fixtures.

F1 ``som_tiny``: 5×5×1 map, zero weights except W[2,3]=5, W[1,1]=2 —
known BMUs and metric goldens (reference tests.py:22-96; FIXTURES.md F1).
F4: determinism / QE-monotonicity / pca golden (tests.py:98-143).
"""

import pickle

import numpy as np
import pytest

from xpysom_dask_spark import SparkSom


@pytest.fixture
def tiny():
    som = SparkSom(5, 5, 1, random_seed=1)
    som._weights = np.zeros((5, 5, 1))
    som._weights[2, 3] = 5.0
    som._weights[1, 1] = 2.0
    return som


DATA = np.array([[5.0], [2.0], [4.0], [1.0]])


def test_winner_goldens(tiny):
    assert tiny.winner([5.0]) == (2, 3)
    assert tiny.winner([2.0]) == (1, 1)
    # [1.0] ties between w=0 neurons and w=2 → first raveled index wins,
    # identical to the reference argmin semantics
    assert tiny.winner(DATA) == [(2, 3), (1, 1), (2, 3), (0, 0)]


def test_activate_golden(tiny):
    act = tiny.activate(5.0)
    assert act.shape == (1, 25)
    assert act.argmin() == 13  # raveled (2,3)


def test_activation_response(tiny):
    resp = tiny.activation_response(DATA)
    assert resp[2, 3] == 2
    assert resp[1, 1] == 1
    assert resp[0, 0] == 1  # [1.0] tie → first raveled index
    assert resp.sum() == 4


def test_quantization(tiny):
    q = tiny.quantization([[4.0], [2.0]])
    np.testing.assert_array_equal(q, [[5.0], [2.0]])


def test_quantization_error(tiny):
    assert tiny.quantization_error([[5.0], [2.0]]) == 0.0
    assert tiny.quantization_error([[4.0], [1.0]]) == 1.0


def test_topographic_error():
    som = SparkSom(5, 5, 1, random_seed=1)
    som._weights = np.zeros((5, 5, 1))
    # adjacent top-2 → no error
    som._weights[2, 3] = 5.0
    som._weights[2, 2] = 4.9
    assert som.topographic_error([[5.0]]) == 0.0
    # distant top-2 → full error
    som._weights[2, 2] = 0.0
    som._weights[0, 0] = 4.9
    assert som.topographic_error([[5.0]]) == 1.0


def test_topographic_error_1x1_nan():
    som = SparkSom(1, 1, 1, random_seed=1)
    with pytest.warns(UserWarning):
        assert np.isnan(som.topographic_error([[1.0]]))


def test_win_map(tiny):
    wm = tiny.win_map(DATA)
    assert len(wm[(2, 3)]) == 2
    assert len(wm[(1, 1)]) == 1
    assert len(wm[(0, 0)]) == 1


def test_labels_map(tiny):
    lm = tiny.labels_map(DATA, ["a", "b", "a", "b"])
    assert lm[(2, 3)]["a"] == 2
    assert lm[(1, 1)]["b"] == 1
    assert lm[(0, 0)]["b"] == 1
    with pytest.raises(ValueError):
        tiny.labels_map(DATA, ["a"])


def test_predict_flat_ids(tiny):
    ids = tiny.predict(DATA)
    np.testing.assert_array_equal(ids, [13, 6, 13, 0])


def test_seeded_init_bit_identical_to_reference_formula():
    som = SparkSom(4, 3, 2, random_seed=42)
    rng = np.random.RandomState(42)
    w = rng.rand(4, 3, 2) * 2 - 1
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    np.testing.assert_array_equal(som.get_weights(), w)
    # rows are unit-normalized (tests.py:27-30)
    np.testing.assert_allclose(
        np.linalg.norm(som.get_weights(), axis=-1), 1.0, atol=1e-12)


def test_same_seed_same_training():
    rng = np.random.RandomState(1234)
    data = rng.rand(100, 2)
    som1 = SparkSom(5, 5, 2, sigma=1.0, learning_rate=0.5, random_seed=1)
    som2 = SparkSom(5, 5, 2, sigma=1.0, learning_rate=0.5, random_seed=1)
    som1.train(data, 10)
    som2.train(data, 10)
    np.testing.assert_array_equal(som1.get_weights(), som2.get_weights())


def test_qe_decreases_after_training():
    rng = np.random.RandomState(1234)
    data = rng.rand(100, 2)
    som = SparkSom(5, 5, 2, sigma=1.0, learning_rate=0.5, random_seed=1)
    q1 = som.quantization_error(data)
    som.train(data, 5)
    assert som.quantization_error(data) < q1


def test_batch_size_invariance():
    """Partial sums are commutative: mini-batch split must not change the
    result beyond float32 association noise — the property that makes the
    distributed path correct (SURVEY.md §7 risk register)."""
    rng = np.random.RandomState(5)
    data = rng.rand(257, 3)
    w = None
    for br in (16, 64, 257):
        som = SparkSom(4, 4, 3, random_seed=9, batch_rows=br,
                       dtype=np.float64)
        som.train(data, 3)
        if w is None:
            w = som.get_weights()
        else:
            np.testing.assert_allclose(som.get_weights(), w, atol=1e-9)


def test_pca_init_golden():
    som = SparkSom(2, 2, 2, random_seed=1)
    som.pca_weights_init(np.array([[1.0, 0.0], [0.0, 1.0],
                                   [1.0, 0.0], [0.0, 1.0]]))
    expected = np.array([[[0.0, -1.41421356], [-1.41421356, 0.0]],
                         [[1.41421356, 0.0], [0.0, 1.41421356]]])
    np.testing.assert_array_almost_equal(som.get_weights(), expected)


def test_distance_map_golden():
    som = SparkSom(2, 2, 1, random_seed=1)
    som._weights = np.array([[[1.0], [0.0]], [[1.0], [4.0]]])
    # reference golden (tests.py:136-143 construction): normalized
    # neighbor-distance sums
    dm = som.distance_map()
    assert dm.max() == 1.0
    assert dm.shape == (2, 2)
    um = np.zeros((2, 2))
    W = som._weights
    for i in range(2):
        for j in range(2):
            for (di, dj) in [(-1, -1), (-1, 0), (-1, 1), (0, -1),
                             (0, 1), (1, -1), (1, 0), (1, 1)]:
                if 0 <= i + di < 2 and 0 <= j + dj < 2:
                    um[i, j] += abs(W[i, j, 0] - W[i + di, j + dj, 0])
    np.testing.assert_array_almost_equal(dm, um / um.max())


def test_random_weights_init_draws_data_rows():
    rng = np.random.RandomState(0)
    data = rng.rand(50, 3)
    som = SparkSom(3, 3, 3, random_seed=7)
    som.random_weights_init(data)
    flat = som.get_weights().reshape(-1, 3)
    for row in flat:
        assert any(np.array_equal(row, drow) for drow in data)


def test_invalid_names_raise():
    with pytest.raises(ValueError):
        SparkSom(3, 3, 2, neighborhood_function="boogie")
    with pytest.raises(ValueError):
        SparkSom(3, 3, 2, activation_distance="ridge")
    with pytest.raises(ValueError):
        SparkSom(3, 3, 2, topology="toroidal")
    with pytest.raises(ValueError):
        SparkSom(3, 3, 2, decay_function="polynomial")


def test_pickle_roundtrip():
    som = SparkSom(4, 4, 2, random_seed=3)
    rng = np.random.RandomState(0)
    data = rng.rand(20, 2)
    som.train(data, 2)
    clone = pickle.loads(pickle.dumps(som))
    np.testing.assert_array_equal(clone.get_weights(), som.get_weights())
    assert clone.winner(data[:5]) == som.winner(data[:5])


def test_save_load_roundtrip(tmp_path):
    som = SparkSom(4, 4, 2, random_seed=3, topology="hexagonal")
    path = str(tmp_path / "model")
    som.save(path)
    clone = SparkSom.load(path)
    np.testing.assert_array_equal(clone.get_weights(), som.get_weights())
    assert clone.topology == "hexagonal"


def test_hexagonal_training_runs():
    rng = np.random.RandomState(2)
    data = rng.rand(60, 2)
    som = SparkSom(4, 4, 2, random_seed=1, topology="hexagonal")
    q0 = som.quantization_error(data)
    som.train(data, 5)
    assert som.quantization_error(data) < q0


def test_train_input_width_check():
    som = SparkSom(3, 3, 4, random_seed=1)
    with pytest.raises(ValueError, match="expected 4"):
        som.train(np.ones((10, 3)), 1)


def test_chunked_activation_matches_whole():
    """batch_rows chunking of the local winner/predict/quantization/
    topographic paths (reference n_parallel parity, xpysom.py:389-398)
    must match the unchunked computation.  (Training itself is compared
    on shared weights: accumulation order across chunk sizes legitimately
    differs in float, exactly as the reference's n_parallel does.)"""
    rng = np.random.RandomState(3)
    X = rng.rand(257, 6)
    whole = SparkSom(6, 5, 6, random_seed=9, batch_rows=10**9)
    whole.train(X, 2)
    chunked = SparkSom(6, 5, 6, random_seed=9, batch_rows=17)
    chunked._weights = whole._weights.copy()
    np.testing.assert_array_equal(whole.predict(X), chunked.predict(X))
    assert whole.winner(X) == chunked.winner(X)
    np.testing.assert_array_equal(whole.quantization(X),
                                  chunked.quantization(X))
    np.testing.assert_array_equal(whole.distance_from_weights(X),
                                  chunked.distance_from_weights(X))
    assert (whole.topographic_error(X) == chunked.topographic_error(X))
    assert (whole.quantization_error(X) == chunked.quantization_error(X))
    np.testing.assert_array_equal(whole.activation_response(X),
                                  chunked.activation_response(X))


def test_reference_backend_knobs_accepted(spark):
    """Reference constructor call sites run unchanged: xp/use_dask/
    dask_chunks are accepted (warned, ignored — backend selection has
    no meaning on Spark), n_parallel maps to batch_rows, and the model
    is bit-identical to one built without the knobs."""
    import warnings

    import numpy as np

    from xpysom_dask_spark import SparkSom

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        som = SparkSom(4, 4, 3, random_seed=7, xp=np, use_dask=True,
                       dask_chunks=(128, 3), n_parallel=4096)
    assert som.batch_rows == 4096
    msgs = " ".join(str(x.message) for x in w)
    assert "use_dask" in msgs and "dask_chunks" in msgs
    ref = SparkSom(4, 4, 3, random_seed=7)
    np.testing.assert_array_equal(som.get_weights(), ref.get_weights())


def test_n_parallel_zero_means_auto(spark):
    """The reference's documented default n_parallel=0 means
    'auto-infer' (xpysom.py:242-249) — it must keep the batch_rows
    default, not set it to 0 (which would make every chunked method's
    range() step zero).  Negative values get an actionable error."""
    import numpy as np
    import pytest

    from xpysom_dask_spark import SparkSom

    auto = SparkSom(4, 4, 3, random_seed=7, n_parallel=0)
    ref = SparkSom(4, 4, 3, random_seed=7)
    assert auto.batch_rows == ref.batch_rows > 0
    # the reference default call site trains unchanged
    X = np.random.RandomState(0).rand(50, 3).astype(np.float32)
    auto.train(X, 1)
    assert np.isfinite(auto.quantization_error(X))
    with pytest.raises(ValueError, match="n_parallel"):
        SparkSom(4, 4, 3, n_parallel=-1)
