"""Golden tests for host-side preprocessing vs. the reference formulas.

Each test pins the output either to a hand-derivable fixture or to an
independent brute-force implementation of the reference's documented math
(cited per function in ip_avsr_tpu/data/preprocessing.py).
"""

import numpy as np
import pytest

from ip_avsr_tpu.data import preprocessing as pp


# ---------------------------------------------------------------------------
# deltas (lfilter semantics): out[t] = sum_o o * x[t+o], edge padded,
# front pad uses column index 1 (reference python quirk)
# ---------------------------------------------------------------------------

def brute_force_deltas(x, w, pad_mode="python_ref"):
    h = w // 2
    R, T = x.shape
    front = x[:, 1] if (pad_mode == "python_ref" and T > 1) else x[:, 0]
    padded = np.concatenate(
        [np.repeat(front[:, None], h, 1), x, np.repeat(x[:, -1][:, None], h, 1)], axis=1
    )
    out = np.zeros_like(x, dtype=np.float64)
    for t in range(T):
        for o in range(-h, h + 1):
            out[:, t] += o * padded[:, t + h + o]
    return out


@pytest.mark.parametrize("w", [3, 5, 9])
def test_deltas_matches_lfilter_formula(w):
    rng = np.random.RandomState(0)
    x = rng.randn(4, 13).astype(np.float64)
    np.testing.assert_allclose(pp.deltas(x, w), brute_force_deltas(x, w), atol=1e-10)


def test_deltas_matlab_pad_mode():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 10)
    np.testing.assert_allclose(
        pp.deltas(x, 9, pad_mode="matlab"), brute_force_deltas(x, 9, "matlab"), atol=1e-10
    )


def test_deltas_reference_inline_fixture():
    # mirrors the reference's own self-test input (utils/preprocessing.py:11-14)
    a = np.array(
        [[1, 1, 1, 1, 1, 1, 1, 1, 10],
         [2, 2, 2, 2, 2, 2, 2, 2, 20],
         [3, 3, 3, 3, 3, 3, 3, 3, 30],
         [4, 4, 4, 4, 4, 4, 4, 4, 40]],
        dtype=np.float64,
    )
    out = pp.deltas(a, 9)
    np.testing.assert_allclose(out, brute_force_deltas(a, 9), atol=1e-10)
    # constant prefix far from the jump has zero slope
    assert out[0, 0] == 0.0


def test_concat_first_second_deltas_shapes_and_values():
    rng = np.random.RandomState(2)
    X = rng.randn(12, 5)
    lens = [7, 5]
    out = pp.concat_first_second_deltas(X, lens, w=9)
    assert out.shape == (12, 15)
    np.testing.assert_allclose(out[:7, :5], X[:7])
    first = brute_force_deltas(X[:7].T, 9)
    np.testing.assert_allclose(out[:7, 5:10], first.T, atol=1e-9)
    second = brute_force_deltas(first, 9)
    np.testing.assert_allclose(out[:7, 10:], second.T, atol=1e-9)


# ---------------------------------------------------------------------------
# zigzag
# ---------------------------------------------------------------------------

def test_zigzag_reference_fixtures():
    # the reference's own test arrays (utils/preprocessing.py:402-414): values
    # were placed in traversal order, so the scan must return 1..N sorted.
    X = np.array([[1, 2, 6, 7], [3, 5, 8, 11], [4, 9, 10, 12]])
    Y = np.array([[1, 2, 5, 6, 9, 10], [3, 4, 7, 8, 11, 12]])
    np.testing.assert_array_equal(pp.zigzag(X), np.arange(1, 13))
    np.testing.assert_array_equal(pp.zigzag(Y), np.arange(1, 13))


def test_fill_zigzag_is_inverse_of_zigzag():
    filled = pp.fill_zigzag((3, 4))
    np.testing.assert_array_equal(pp.zigzag(filled), np.arange(1, 13))
    np.testing.assert_array_equal(
        filled, np.array([[1, 2, 6, 7], [3, 5, 8, 11], [4, 9, 10, 12]])
    )


def test_dct_features_zigzag():
    rng = np.random.RandomState(3)
    X = rng.randn(6, 12)
    out = pp.compute_dct_features(X, (3, 4), no_coeff=5, method="zigzag")
    import scipy.fftpack as fft

    X_dct = fft.dct(X, norm="ortho")
    expected = np.stack([pp.zigzag(row.reshape(3, 4))[1:6] for row in X_dct])
    np.testing.assert_allclose(out, expected, atol=1e-12)


@pytest.mark.parametrize("method", ["rel_variance", "variance", "energy"])
def test_dct_features_variance_methods(method):
    rng = np.random.RandomState(4)
    X = rng.randn(8, 12)
    out = pp.compute_dct_features(X, (3, 4), no_coeff=4, method=method)
    assert out.shape == (8, 4)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def test_normalize_input_centralize():
    rng = np.random.RandomState(5)
    X = rng.randn(4, 10) * 3 + 7
    out = pp.normalize_input(X.copy())
    np.testing.assert_allclose(out.mean(axis=1), 0, atol=1e-12)
    np.testing.assert_allclose(out.std(axis=1), 1, atol=1e-12)


def test_normalize_input_quantize():
    rng = np.random.RandomState(6)
    X = rng.randn(4, 10)
    out = pp.normalize_input(X.copy(), centralize=False, quantize=True)
    np.testing.assert_allclose(out.min(axis=1), 0, atol=1e-12)
    np.testing.assert_allclose(out.max(axis=1), 1, atol=1e-12)


def test_featurewise_normalize_sequence():
    rng = np.random.RandomState(7)
    X = rng.randn(50, 6) * 2 + 1
    out, mean, std = pp.featurewise_normalize_sequence(X)
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-12)
    np.testing.assert_allclose(out.std(axis=0), 1, atol=1e-12)
    np.testing.assert_allclose((X - mean) / std, out, atol=1e-12)


def test_sequencewise_mean_image_subtraction():
    rng = np.random.RandomState(8)
    X = rng.randn(10, 4).astype(np.float32)
    out = pp.sequencewise_mean_image_subtraction(X, [6, 4])
    np.testing.assert_allclose(out[:6], X[:6] - X[:6].mean(0), atol=1e-6)
    np.testing.assert_allclose(out[6:], X[6:] - X[6:].mean(0), atol=1e-6)


# ---------------------------------------------------------------------------
# diff images / reorder
# ---------------------------------------------------------------------------

def test_compute_diff_images():
    X = np.arange(20, dtype=np.float32).reshape(10, 2) ** 2
    out = pp.compute_diff_images(X, [6, 4])
    d = np.diff(X[:6], 1, 0)
    np.testing.assert_allclose(out[0], d[0])
    np.testing.assert_allclose(out[1:6], d)
    d2 = np.diff(X[6:], 1, 0)
    np.testing.assert_allclose(out[6], d2[0])
    np.testing.assert_allclose(out[7:], d2)


def test_reorder_data_roundtrip():
    rng = np.random.RandomState(9)
    imgs = rng.randn(5, 6)  # 2x3 images
    f_packed = np.stack([im.reshape(2, 3).ravel(order="F") for im in imgs])
    c_again = pp.reorder_data(f_packed, (2, 3), "f", "c")
    np.testing.assert_allclose(c_again, imgs)


# ---------------------------------------------------------------------------
# splits
# ---------------------------------------------------------------------------

def test_create_split_index():
    idx = pp.create_split_index(10, [3, 2, 5], [1, 3, 2])
    expected = np.array([1, 1, 1, 0, 0, 1, 1, 1, 1, 1], dtype=bool)
    np.testing.assert_array_equal(idx, expected)


def test_split_videolen():
    train, test = pp.split_videolen([3, 2, 5, 1], [1, 3, 2, 4])
    assert train == [3, 5]
    assert test == [2, 1]


def test_split_seq_data():
    # 4 videos, subjects [1, 1, 2, 3], lens [2, 3, 1, 2]
    lens = np.array([2, 3, 1, 2])
    subjects = np.array([1, 1, 2, 3])
    X = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    y = np.repeat([0, 1, 2, 3], lens)
    res = pp.split_seq_data(X, y, subjects, lens, train_ids=[1], val_ids=[2], test_ids=[3])
    (tr_X, tr_y, tr_l, tr_s, v_X, v_y, v_l, v_s, te_X, te_y, te_l, te_s) = res
    np.testing.assert_allclose(tr_X, X[:5])
    np.testing.assert_array_equal(tr_y, y[:5])
    np.testing.assert_array_equal(tr_l, [2, 3])
    np.testing.assert_array_equal(tr_s, [1, 1])
    np.testing.assert_allclose(v_X, X[5:6])
    np.testing.assert_array_equal(v_l, [1])
    np.testing.assert_allclose(te_X, X[6:])
    np.testing.assert_array_equal(te_l, [2])
    np.testing.assert_array_equal(te_s, [3])


# ---------------------------------------------------------------------------
# temporal resampling / alignment
# ---------------------------------------------------------------------------

def test_factorize():
    rng = np.random.RandomState(10)
    X = rng.randn(10, 3)
    y = np.arange(10)
    out_X, out_y, out_len = pp.factorize(X, y, np.array([7, 3]), 3, axis_to_delete=0,
                                         rng=np.random.RandomState(0))
    assert out_len.tolist() == [6, 3]
    assert out_X.shape == (9, 3)
    assert out_y.shape == (9,)


def test_embed_temporal_info_win3_step3():
    # win=3, step=3 -> repeats=2, startpos=3 (docstring example,
    # utils/preprocessing.py:566-570)
    X = np.arange(6, dtype=np.float32).reshape(6, 1)
    y = np.zeros(6, dtype=np.int64)
    res, res_t, res_len = pp.embed_temporal_info(X, y, np.array([6]), 3, 3)
    assert res.shape == (2, 7)
    # seq padded: [0,0, 0..5, 5,5]; first window centered at padded idx 3 (orig 1)
    np.testing.assert_allclose(res[0], [0, 0, 0, 1, 2, 3, 4])
    np.testing.assert_allclose(res[1], [1, 2, 3, 4, 5, 5, 5])
    assert res_len.tolist() == [2]


def test_multistream_force_align():
    s1 = (np.arange(5).reshape(5, 1).astype(float), np.zeros(5), np.array([3, 2]))
    s2 = (np.arange(7).reshape(7, 1).astype(float) * 10, np.ones(7), np.array([4, 3]))
    out = pp.multistream_force_align([s1, s2])
    (a_X, a_t, a_l), (b_X, b_t, b_l) = out
    assert a_l.tolist() == [4, 3]
    assert b_l.tolist() == [4, 3]
    # stream 1 seq 1 = [0,1,2] + repeat(2) ; seq 2 = [3,4] + repeat(4)
    np.testing.assert_allclose(a_X.ravel(), [0, 1, 2, 2, 3, 4, 4])
    np.testing.assert_allclose(b_X.ravel(), [0, 10, 20, 30, 40, 50, 60])
    assert len(a_t) == 7 and len(b_t) == 7


def test_force_align_two_streams():
    s1 = (np.arange(3).reshape(3, 1).astype(float), np.zeros(3), np.array([3]))
    s2 = (np.arange(5).reshape(5, 1).astype(float), np.ones(5), np.array([5]))
    (a, a_t, a_l), (b, b_t, b_l) = pp.force_align(s1, s2)
    assert a_l.tolist() == [5] and b_l.tolist() == [5]
    np.testing.assert_allclose(a.ravel(), [0, 1, 2, 2, 2])


# ---------------------------------------------------------------------------
# resize (imresize semantics: uint8 bytescaled output)
# ---------------------------------------------------------------------------

def test_resize_images_uint8_semantics():
    rng = np.random.RandomState(11)
    imgs = rng.rand(3, 4800)
    out = pp.resize_images(imgs, orig_dim=(60, 80), dim=(30, 40))
    assert out.shape == (3, 1200)
    assert out.max() <= 255 and out.min() >= 0
    # values are integers (came from uint8)
    np.testing.assert_array_equal(out, np.round(out))


def test_zca_whiten_shape():
    rng = np.random.RandomState(12)
    X = rng.randn(4, 16)
    out = pp.zca_whiten(X)
    assert out.shape == X.shape
