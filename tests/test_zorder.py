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


def test_layout_compare_matches_duckdb(ray_session):
    """Zone-map scan cost under natural vs z-order layouts — bit-exact
    vs the oracle, plus the scan-conservation invariants."""
    import duckdb
    import pandas as pd

    from rayse.ops.zorder import layout_compare, layout_compare_sql

    sf = "/root/testdata/sf0.001"
    got = layout_compare(sf).to_pandas()
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{sf}/events.parquet')")
    want = c.execute(layout_compare_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want[list(got.columns)].astype(
            got.dtypes.to_dict()).reset_index(drop=True))
    m = got.set_index("layout")
    # both layouts hold the same corpus and the same matches
    assert m.loc["natural", "n_blocks"] == m.loc["zorder", "n_blocks"]
    assert (m.loc["natural", "rows_matching"]
            == m.loc["zorder", "rows_matching"])
    # a scan can never touch fewer rows than actually match
    assert (m["rows_scanned"] >= m["rows_matching"]).all()
