"""Batch-generator shape contracts (mirrors test/test_gen_batch_from_file.py
and exercises the in-memory generators)."""

import numpy as np
import pytest

from ip_avsr_tpu.data import datagen
from ip_avsr_tpu.io import matio


def _frame_data(n_videos=10, dim=7, seed=0):
    rng = np.random.RandomState(seed)
    lens = rng.randint(3, 9, n_videos)
    X = rng.randn(int(lens.sum()), dim).astype(np.float32)
    y = np.repeat(rng.randint(0, 4, n_videos), lens)
    return X, y, lens


def test_gen_lstm_batch_random_contract():
    X, y, lens = _frame_data()
    gen = datagen.gen_lstm_batch_random(X, y, lens, batchsize=4,
                                        rng=np.random.RandomState(0))
    Tmax = int(lens.max())
    xb, yb, mb, idxs = next(gen)
    assert xb.shape == (4, Tmax, 7)
    assert yb.shape == (4,) and yb.dtype == np.uint8
    assert mb.shape == (4, Tmax) and mb.dtype == np.uint8
    # mask matches video lengths; padding is zero
    for i, idx in enumerate(idxs):
        l = lens[idx]
        assert mb[i].sum() == l
        np.testing.assert_allclose(xb[i, l:], 0)
    # a full pass visits every video exactly once
    seen = list(idxs)
    for _ in range(2):
        _, _, _, idxs = next(gen)
        seen += list(idxs)
    assert sorted(seen) == list(range(10))


def test_gen_lstm_batch_random_partial_final_batch():
    X, y, lens = _frame_data(n_videos=10)
    gen = datagen.gen_lstm_batch_random(X, y, lens, batchsize=4, shuffle=False)
    sizes = [len(next(gen)[3]) for _ in range(3)]
    assert sizes == [4, 4, 2]  # reference yields the remainder batch smaller


def test_gen_seq_batch_from_idx_alignment():
    X, y, lens = _frame_data()
    X2 = X * 2  # secondary stream, frame-aligned
    integral = datagen.compute_integral_len(lens)
    gen = datagen.gen_lstm_batch_random(X, y, lens, batchsize=3,
                                        rng=np.random.RandomState(1))
    xb, _, mb, idxs = next(gen)
    xb2 = datagen.gen_seq_batch_from_idx(X2, idxs, lens, integral, int(lens.max()))
    np.testing.assert_allclose(xb2, xb * 2)


def test_gen_batch_from_file_contract(tmp_path):
    """File-backed generator (the 5words-style contract,
    test/test_gen_batch_from_file.py:46-49: exact padded shapes and
    remainder batch)."""
    rng = np.random.RandomState(0)
    n, dim = 7, 5
    lens = rng.randint(4, 10, n)
    files, ys = [], rng.randint(0, 3, n)
    for i, l in enumerate(lens):
        path = tmp_path / f"video_{i}.mat"
        matio.save_mat({"dataMatrix": rng.randn(l, dim).astype(np.float32)}, str(path))
        files.append(str(path))

    gen = datagen.gen_batch_from_file(files, ys, lens, dim, batchsize=3,
                                      shuffle=False)
    Tmax = int(lens.max())
    xb, yb, mb, idxs = next(gen)
    assert xb.shape == (3, Tmax, dim)
    for i, idx in enumerate(idxs):
        assert mb[i].sum() == lens[idx]
        assert yb[i] == ys[idx]
    # remainder batch: 7 % 3 -> final batch of 1
    sizes = [xb.shape[0]]
    for _ in range(2):
        xb, _, _, _ = next(gen)
        sizes.append(xb.shape[0])
    assert sizes == [3, 3, 1]


def test_gen_file_batch_from_idx(tmp_path):
    rng = np.random.RandomState(0)
    lens = [4, 6, 5]
    files = []
    datas = []
    for i, l in enumerate(lens):
        d = rng.randn(l, 3).astype(np.float32)
        datas.append(d)
        path = tmp_path / f"v{i}.mat"
        matio.save_mat({"dataMatrix": d}, str(path))
        files.append(str(path))
    xb = datagen.gen_file_batch_from_idx(files, [2, 0], lens, 6, 3)
    assert xb.shape == (2, 6, 3)
    np.testing.assert_allclose(xb[0, :5], datas[2], atol=1e-6)
    np.testing.assert_allclose(xb[1, 4:], 0)


def test_batch_iterator_visits_all():
    X = np.arange(10, dtype=np.float32).reshape(10, 1)
    y = np.arange(10)
    it = datagen.batch_iterator(X, y, batchsize=4, rng=np.random.RandomState(0))
    seen = []
    for _ in range(3):
        bx, by = next(it)
        assert bx.shape == (4, 1)
        seen += [v for v in by.tolist()]
    # one full pass covers all examples (pad rows repeat zeros)
    assert set(range(10)) <= set(int(v) for v in seen)


def test_padded_dataset_static_shapes():
    X, y, lens = _frame_data()
    ds = datagen.PaddedDataset([X], y, lens)
    batches = list(ds.epoch_batches(4, rng=np.random.RandomState(0)))
    assert all(b[0][0].shape[0] == 4 for b in batches)  # padded to batchsize
    # padded rows have zero mask
    last = batches[-1]
    n_real = len(last[3])
    assert (last[2][n_real:] == 0).all()


def test_bucketed_dataset_reduces_padding_and_preserves_data():
    rng = np.random.RandomState(0)
    # bimodal length distribution: many short, few long
    lens = np.concatenate([rng.randint(4, 8, 16), rng.randint(20, 25, 4)])
    X = rng.randn(int(lens.sum()), 5).astype(np.float32)
    y = np.repeat(rng.randint(0, 3, 20), lens)

    bucketed = datagen.BucketedDataset([X], y, lens)
    flat = datagen.PaddedDataset([X], y, lens)
    flat_waste = 1.0 - lens.sum() / (flat.n * flat.max_timesteps)
    assert bucketed.padded_frame_fraction() < flat_waste
    assert bucketed.n == 20

    # all batches carry the right data: reassemble and compare frames
    seen_videos = 0
    offsets = np.asarray(datagen.compute_integral_len(lens))
    for b, streams, yy, mask, idxs in bucketed.epoch_batches(
            4, rng=np.random.RandomState(1)):
        bound = bucketed.boundaries[b]
        assert streams[0].shape[1] == bound
        vid_ids = bucketed.bucket_video_idxs[b][idxs]
        for row, vid in enumerate(vid_ids):
            l = min(int(lens[vid]), bound)
            np.testing.assert_allclose(streams[0][row, :l],
                                       X[offsets[vid]:offsets[vid] + l])
            assert mask[row].sum() == l
            assert yy[row] == y[offsets[vid]]
        seen_videos += len(idxs)
    assert seen_videos == 20


def test_gen_lstm_seq_random_contract():
    """utils/datagen.py:67-89: one unpadded sequence at a time; every video
    visited exactly once per pass before the permutation resets."""
    from ip_avsr_tpu.data.datagen import gen_lstm_seq_random

    rng = np.random.RandomState(0)
    lens = np.array([3, 5, 2, 4])
    X = rng.randn(int(lens.sum()), 6).astype(np.float32)
    y = np.repeat(np.arange(4), lens)
    gen = gen_lstm_seq_random(X, y, lens, rng=np.random.RandomState(1))
    seen = []
    for _ in range(len(lens)):
        seq_X, seq_y = next(gen)
        assert seq_X.shape[1] == 6
        assert len(seq_X) == len(seq_y)
        vid = int(seq_y[0])
        assert (seq_y == vid).all()
        assert len(seq_X) == lens[vid]
        # frames are the exact contiguous slice of the video
        start = int(lens[:vid].sum())
        np.testing.assert_array_equal(seq_X, X[start : start + lens[vid]])
        seen.append(vid)
    assert sorted(seen) == [0, 1, 2, 3]
    # the generator keeps going (new permutation)
    next(gen)


def test_prefetch_order_exceptions_and_overlap():
    """prefetch preserves order, forwards producer exceptions at the right
    position, and actually runs the producer ahead of the consumer."""
    import time

    from ip_avsr_tpu.data.prefetch import prefetch

    # order
    assert list(prefetch(range(10), buffer_size=3)) == list(range(10))

    # exception forwarding
    def boom():
        yield 1
        yield 2
        raise ValueError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1 and next(it) == 2
    try:
        next(it)
        assert False, "expected ValueError"
    except ValueError:
        pass

    # overlap: producer items become ready while the consumer sleeps
    produced = []

    def slowish():
        for i in range(4):
            produced.append(i)
            yield i

    it = prefetch(slowish(), buffer_size=4)
    first = next(it)
    time.sleep(0.05)  # give the worker time to run ahead
    assert first == 0
    assert len(produced) == 4  # everything was produced in the background
    assert list(it) == [1, 2, 3]

    # works with the file-backed generator's infinite form
    gen = prefetch(iter(int(i) for i in np.arange(1000)), buffer_size=2)
    assert [next(gen) for _ in range(5)] == [0, 1, 2, 3, 4]
