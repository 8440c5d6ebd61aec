import numpy as np


def test_interleave31_matches_naive():
    from rayse.ops.zorder import Z_BITS, interleave31

    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 40, 200, dtype=np.int64)
    y = rng.integers(0, 1 << 40, 200, dtype=np.int64)
    got = interleave31(x, y)

    def naive(a, b):
        a &= (1 << Z_BITS) - 1
        b &= (1 << Z_BITS) - 1
        z = 0
        for i in range(Z_BITS):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    want = np.array([naive(int(a), int(b)) for a, b in zip(x, y)])
    assert (got == want).all()
    assert (got >= 0).all()


def test_zorder_locality_blocks():
    # contiguous z ranges are 2-D blocks: a 2x2 block of (x,y) cells
    # maps to 4 consecutive z values
    from rayse.ops.zorder import interleave31

    for bx in range(0, 8, 2):
        for by in range(0, 8, 2):
            cells = [(bx + dx, by + dy) for dx in (0, 1) for dy in (0, 1)]
            zs = sorted(int(interleave31(np.array([cx]), np.array([cy]))[0])
                        for cx, cy in cells)
            assert zs == list(range(zs[0], zs[0] + 4))


def test_zorder_rank_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from rayse.ops.zorder import zorder_rank, zorder_rank_sql

    sf = "/root/testdata/sf0.001"
    got = (zorder_rank(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = (con.execute(zorder_rank_sql()).fetchdf()
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns])
    # a permutation: every rank 1..n exactly once
    n = len(got)
    assert sorted(got["rank"].tolist()) == list(range(1, n + 1))
