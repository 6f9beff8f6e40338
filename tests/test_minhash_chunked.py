"""The chunked affine-min kernel (round-6 memory-bound optimization of
the minhash signature UDFs) must be bit-identical to the naive outer
product it replaced, at every chunk boundary shape."""

import numpy as np

from doctor_spark.operators.dedup import _affine_mins_chunked, _affine_params


def _naive(h32, a, b):
    sig = ((h32[:, None] * a[None, :]) + b[None, :]) % 4294967296
    return sig.min(axis=0)


def test_chunked_equals_naive_across_widths_and_sizes():
    rng = np.random.default_rng(7)
    for n_perms in (4, 16, 17, 48, 128):  # below/at/above/non-multiple of chunk
        a_l, b_l = _affine_params(n_perms)
        a = np.asarray(a_l, dtype=np.int64)
        b = np.asarray(b_l, dtype=np.int64)
        for n_sh in (1, 3, 1000):
            h32 = rng.integers(0, 2**32, size=n_sh, dtype=np.int64)
            got = _affine_mins_chunked(h32, a, b)
            want = _naive(h32, a, b)
            assert got.dtype == want.dtype
            assert (got == want).all(), (n_perms, n_sh)


def test_chunk_transient_is_bounded():
    # the whole point: a pathological 200k-shingle doc at width 128 must
    # not materialize an (n_sh x n_perms) matrix; the adaptive chunk
    # (max_elems // n_sh = 20 perms here) keeps the largest transient to
    # n_sh x 20 int64 (~32 MB, vs ~200 MB naive), while small documents
    # take the whole width in one numpy call
    a_l, b_l = _affine_params(128)
    a = np.asarray(a_l, dtype=np.int64)
    b = np.asarray(b_l, dtype=np.int64)
    h32 = np.arange(200_000, dtype=np.int64) % (2**32)
    mins = _affine_mins_chunked(h32, a, b)
    assert mins.shape == (128,)
    assert (mins >= 0).all() and (mins < 2**32).all()
    # and the chunked result still equals the naive outer product
    assert (mins == _naive(h32, a, b)).all()
