"""Grouped exact event-value quantiles vs the DuckDB window oracle."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    return c


def test_event_quantiles_match_duckdb(ray_session):
    from rayse.ops.quantiles import EVENT_QUANTILES_SQL, event_quantiles

    got = event_quantiles(SF).to_pandas()
    want = _con().execute(EVENT_QUANTILES_SQL).fetchdf()
    keys = ["event_type", "p_label"]
    a = got.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    b = want.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # every type present with all three quantiles, monotone p50<=p90<=p99
    piv = got.pivot(index="event_type", columns="p_label", values="vq")
    assert not piv.isna().any().any()
    assert (piv["p50"] <= piv["p90"]).all()
    assert (piv["p90"] <= piv["p99"]).all()


def test_event_quantiles_rank_rule(ray_session):
    """The pick is exactly the ceil(p*n)-th smallest value (sorted
    multiset semantics), independently recomputed in pandas."""
    import pyarrow.parquet as pq

    from rayse.ops.quantiles import P_SPECS, event_quantiles
    from rayse.ops.rollup import VQ_SCALE

    got = event_quantiles(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["vq"] = np.floor(ev["value"].to_numpy()
                        * float(VQ_SCALE)).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        vals = np.sort(g["vq"].to_numpy())
        n = vals.size
        for num, den, lab in P_SPECS:
            r = (n * num + den - 1) // den
            want = int(vals[r - 1])
            have = int(got[(got.event_type == et)
                           & (got.p_label == lab)].vq.iloc[0])
            assert have == want, (et, lab)


def test_event_quantiles_blocksize_invariant(ray_session):
    """Histogram partials fold identically across batch boundaries."""
    from ray.data.context import DataContext

    from rayse.ops.quantiles import event_quantiles

    keys = ["event_type", "p_label"]
    a = event_quantiles(SF).to_pandas().sort_values(keys)
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024
        b = event_quantiles(SF).to_pandas().sort_values(keys)
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_mad_outliers_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from rayse.ops.quantiles import mad_outliers, mad_outliers_sql

    sf = "/root/testdata/sf0.001"
    got = (mad_outliers(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = (con.execute(mad_outliers_sql()).fetchdf()
            .sort_values("event_type").reset_index(drop=True))
    assert (got["n_out"] > 0).any()            # non-degenerate
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_trimmed_stats_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from rayse.ops.quantiles import trimmed_stats, trimmed_stats_sql

    sf = "/root/testdata/sf0.001"
    got = (trimmed_stats(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = (con.execute(trimmed_stats_sql()).fetchdf()
            .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_trimmed_stats_zero_trim_is_full_sum(ray_session):
    import duckdb

    from rayse.ops.quantiles import trimmed_stats
    from rayse.ops.rollup import VQ_SCALE

    sf = "/root/testdata/sf0.001"
    got = trimmed_stats(sf, g_num=0, g_den=1).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(
        "SELECT event_type, count(*) AS n, CAST(sum(CAST(floor(value * "
        f"{float(VQ_SCALE)}) AS BIGINT)) AS BIGINT) AS s "
        "FROM events GROUP BY 1").fetchdf().set_index("event_type")
    for _, r in got.iterrows():
        assert r["n_kept"] == want.loc[r["event_type"], "n"]
        assert r["sum_q"] == want.loc[r["event_type"], "s"]
