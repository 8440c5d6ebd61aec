import numpy as np
import pandas as pd


def test_h_from_hist_matches_rank_definition():
    from rayse.ops.kcore import _h_from_hist

    rng = np.random.default_rng(11)
    for _ in range(30):
        vals = rng.integers(0, 8, rng.integers(1, 12))
        # histogram form
        u, c = np.unique(vals, return_counts=True)
        verts = np.array([7], np.int64)
        got = _h_from_hist(np.full(u.size, 7, np.int64),
                           u.astype(np.int64), c.astype(np.int64),
                           verts)[0]
        # rank definition: sort desc, h = max rn with val >= rn
        s = np.sort(vals)[::-1]
        want = 0
        for i, v in enumerate(s, 1):
            if v >= i:
                want = i
        assert got == want


def test_kcore_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.kcore import kcore_h, kcore_h_sql

    sf = "/root/testdata/sf0.001"
    got = (kcore_h(sf).to_pandas()
           .sort_values("node").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = (con.execute(kcore_h_sql()).fetchdf()
            .sort_values("node").reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_kcore_sharded_bit_identical(ray_session):
    """The no-driver-vertex-state route equals the dense route exactly,
    including at a truncated iteration count (pre-fixpoint iterates
    must match, not just the converged answer)."""
    from rayse.ops.kcore import kcore_h, kcore_h_sharded

    sf = "/root/testdata/sf0.001"
    for iters in (2, 30):
        a = (kcore_h(sf, iters=iters).to_pandas()
             .sort_values("node").reset_index(drop=True))
        b = (kcore_h_sharded(sf, iters=iters).to_pandas()
             .sort_values("node").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)


def test_kcore_converged_at_demo_graph(ray_session):
    from rayse.ops.kcore import KCORE_ITERS, kcore_h

    sf = "/root/testdata/sf0.001"
    a = kcore_h(sf, iters=KCORE_ITERS).to_pandas()
    b = kcore_h(sf, iters=KCORE_ITERS + 1).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # coreness is bounded by degree and nonneg
    assert (a["core_h"] >= 0).all()
