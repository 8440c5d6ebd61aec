"""hilbert_d pinned against the scalar Wikipedia walk and the curve's
defining unit-step adjacency property."""
import numpy as np


def _xy2d_ref(n: int, x: int, y: int) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_scalar_reference():
    from rayse.ops.hilbert import HB_N, hilbert_d

    rng = np.random.default_rng(3)
    xs = rng.integers(0, HB_N, 400)
    ys = rng.integers(0, HB_N, 400)
    got = hilbert_d(xs, ys)
    want = np.array([_xy2d_ref(HB_N, int(a), int(b))
                     for a, b in zip(xs, ys)])
    assert (got == want).all()


def test_hilbert_adjacency_small_grid():
    from rayse.ops.hilbert import hilbert_d

    b = 5
    n = 1 << b
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_d(xs, ys, bits=b)
    # positions along the curve are a permutation of 0..n^2-1 and each
    # consecutive pair of curve cells is 4-adjacent
    assert sorted(d.tolist()) == list(range(n * n))
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order]))
    dy = np.abs(np.diff(ys[order]))
    assert ((dx + dy) == 1).all()


def test_hilbert_rank_is_permutation():
    import ray

    from rayse.ops.hilbert import hilbert_rank

    t = hilbert_rank("/root/testdata/sf0.001")
    tbl = t.to_pandas() if hasattr(t, "to_pandas") else t
    r = np.sort(tbl["rank"].to_numpy())
    assert (r == np.arange(1, len(r) + 1)).all()
