"""Property-based hardening of the data layer and core-op invariants.

The example-based suites pin reference numerics; these hypothesis tests pin
STRUCTURAL invariants over randomized shapes/lengths — the places where a
padding/indexing refactor can silently go wrong for inputs the fixed tests
never draw (single-frame videos, all-equal lengths, batch == 1, T == 1...).
Deadlines are disabled: first-call JIT compilation dwarfs any per-example
budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from ip_avsr_tpu.data import preprocessing as pp
from ip_avsr_tpu.data.datagen import BucketedDataset, PaddedDataset
from ip_avsr_tpu.ops import lstm as lstm_ops
from ip_avsr_tpu.ops.delta import append_delta_coeff

SETTINGS = dict(max_examples=25, deadline=None)


def _corpus(draw, max_videos=6, max_len=9, dim=3):
    n = draw(st.integers(1, max_videos))
    lens = draw(st.lists(st.integers(1, max_len), min_size=n, max_size=n))
    rng = np.random.RandomState(draw(st.integers(0, 2**16)))
    X = rng.randn(int(sum(lens)), dim).astype(np.float32)
    y = rng.randint(0, 4, int(sum(lens)))
    return X, y, np.asarray(lens)


@settings(**SETTINGS)
@given(st.data())
def test_padded_dataset_gather_invariants(data):
    """Every gathered batch row reproduces exactly its video's frames in
    order, zero-padded, with a mask of exactly its length — for any length
    distribution, any index multiset, and any pad_to."""
    X, y, lens = _corpus(data.draw)
    ds = PaddedDataset([X], y, lens)
    idxs = data.draw(st.lists(st.integers(0, len(lens) - 1),
                              min_size=1, max_size=8))
    pad_to = data.draw(st.one_of(st.none(),
                                 st.integers(len(idxs), len(idxs) + 4)))
    streams, yy, mask = ds.gather(np.asarray(idxs), pad_to=pad_to)
    want_rows = pad_to or len(idxs)
    assert streams[0].shape == (want_rows, ds.max_timesteps, X.shape[1])
    assert mask.shape == (want_rows, ds.max_timesteps)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    for row, vid in enumerate(idxs):
        l = int(lens[vid])
        np.testing.assert_array_equal(streams[0][row, :l],
                                      X[offsets[vid]:offsets[vid] + l])
        np.testing.assert_array_equal(streams[0][row, l:], 0)
        assert mask[row].sum() == l
        assert (mask[row][:l] == 1).all()
        assert yy[row] == y[offsets[vid]]
    # pad rows: all-zero mask (exact no-ops in masked losses)
    for row in range(len(idxs), want_rows):
        assert mask[row].sum() == 0


@settings(**SETTINGS)
@given(st.data())
def test_bucketed_dataset_partitions_every_video_once(data):
    """Bucketing is a partition: every video appears in exactly one bucket,
    and a full epoch_batches pass yields every video exactly once."""
    X, y, lens = _corpus(data.draw, max_videos=10, max_len=12)
    ds = BucketedDataset([X], y, lens)
    all_idxs = np.concatenate([v for v in ds.bucket_video_idxs if len(v)])
    assert sorted(all_idxs.tolist()) == list(range(len(lens)))
    total = 0
    for bucket_id, streams, yy, mask, idxs in ds.epoch_batches(
            batchsize=4, rng=np.random.RandomState(0)):
        rows = len(idxs)  # bucket-local indices of this batch's real rows
        total += rows
        bound = ds.boundaries[bucket_id]
        assert mask.shape[1] == bound
        # each real row's mask length EQUALS its video's (bound-clipped)
        # length — "<= bound" alone is vacuous for any 0/1 mask
        bucket_lens = np.asarray(ds.buckets[bucket_id].seqlens)[np.asarray(idxs)]
        np.testing.assert_array_equal(
            np.asarray(mask)[:rows].sum(axis=1),
            np.minimum(bucket_lens, bound))
        assert (np.asarray(mask)[rows:].sum(axis=1) == 0).all()  # pad rows
    assert total == len(lens)


@settings(**SETTINGS)
@given(st.data())
def test_masked_lstm_ignores_pad_frames(data):
    """Appending extra zero-masked pad frames never changes the outputs at
    valid steps (Lasagne mask-carry), forward or backward direction."""
    rng = np.random.RandomState(data.draw(st.integers(0, 2**16)))
    B = data.draw(st.integers(1, 3))
    T = data.draw(st.integers(1, 6))
    pad = data.draw(st.integers(1, 4))
    D, H = 4, 5
    params = lstm_ops.init_lstm_params(jax.random.PRNGKey(0), D, H)
    x = rng.randn(B, T, D).astype(np.float32)
    lens = rng.randint(1, T + 1, B)
    mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
    xp = np.concatenate([x, rng.randn(B, pad, D).astype(np.float32)], axis=1)
    maskp = np.concatenate([mask, np.zeros((B, pad), np.float32)], axis=1)
    for bwd in (False, True):
        out = np.asarray(lstm_ops.lstm_forward(params, jnp.asarray(x),
                                               jnp.asarray(mask), backwards=bwd))
        outp = np.asarray(lstm_ops.lstm_forward(params, jnp.asarray(xp),
                                                jnp.asarray(maskp), backwards=bwd))
        for b in range(B):
            l = int(lens[b])
            np.testing.assert_allclose(outp[b, :l], out[b, :l],
                                       rtol=1e-5, atol=1e-6)


@settings(**SETTINGS)
@given(st.integers(0, 2**16), st.integers(1, 6), st.integers(2, 10),
       st.integers(1, 4))
def test_delta_is_linear(seed, B, T, window):
    """The in-graph delta op is linear: delta(a*x + b*y) == a*delta(x) +
    b*delta(y) — the property its custom-VJP transpose relies on."""
    rng = np.random.RandomState(seed)
    D = 3
    x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    y = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    a, b = 1.7, -0.3
    lhs = append_delta_coeff(a * x + b * y, window)
    rhs = a * append_delta_coeff(x, window) + b * append_delta_coeff(y, window)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-4, atol=1e-4)


@settings(**SETTINGS)
@given(st.data())
def test_force_align_equalizes_lengths(data):
    """multistream_force_align leaves every stream with identical per-video
    lengths (the property the N-stream runners depend on)."""
    n = data.draw(st.integers(1, 4))
    rng = np.random.RandomState(data.draw(st.integers(0, 2**16)))
    streams = []
    base = rng.randint(2, 8, n)
    for s in range(3):
        lens = np.maximum(1, base + rng.randint(-1, 2, n))
        X = rng.randn(int(lens.sum()), 2).astype(np.float32)
        y = rng.randint(0, 3, int(lens.sum()))
        streams.append((X, y, lens))
    aligned = pp.multistream_force_align(streams)
    lens0 = np.asarray(aligned[0][2]).reshape(-1)
    for X, y, lens in aligned:
        np.testing.assert_array_equal(np.asarray(lens).reshape(-1), lens0)
        assert len(X) == int(lens0.sum())
        assert len(y) == int(lens0.sum())
