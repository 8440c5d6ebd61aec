"""Relational breadth ops vs DuckDB at sf0.001 (driver re-checks at sf0.01)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for n in ["lineitem", "orders", "customer", "events"]:
        c.sql(f"CREATE VIEW {n} AS SELECT * FROM '{SF}/{n}.parquet'")
    return c


def _cmp(res, sql_df):
    a = res.to_pandas() if hasattr(res, "to_pandas") else res
    if hasattr(a, "to_pandas"):
        a = a.to_pandas()
    a = a.sort_index(axis=1).sort_values(sorted(a.columns)).reset_index(
        drop=True)
    b = sql_df.sort_index(axis=1).sort_values(sorted(sql_df.columns)
                                              ).reset_index(drop=True)
    assert len(a) == len(b)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_pricing_summary(ray_session, con):
    from rayse.ops import relational as R

    _cmp(R.pricing_summary(SF), con.sql(R.PRICING_SUMMARY_SQL).df())


def test_top_customer_revenue(ray_session, con):
    from rayse.ops import relational as R

    _cmp(R.top_customer_revenue(SF),
         con.sql(R.TOP_CUSTOMER_REVENUE_SQL).df())


def test_trailing_window(ray_session, con):
    from rayse.ops import relational as R

    _cmp(R.trailing_window_counts(SF), con.sql(R.TRAILING_WINDOW_SQL).df())


def test_asof_join_matches_duckdb(ray_session):
    """Distributed as-of join == DuckDB's native ASOF JOIN, plus the
    backward-match invariants (gap >= 0; match is the LATEST eligible)."""
    import duckdb
    import pandas as pd

    from rayse.ops.relational import asof_join_events, asof_join_events_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    got = asof_join_events(sf).to_pandas().sort_values("event_id")
    got = got.reset_index(drop=True)
    want = con.execute(asof_join_events_sql()).fetchdf()
    want = want.sort_values("event_id").reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    assert (got["gap_us"] >= 0).all()
    # latest-eligible: no other click of the same user strictly between
    ev = con.execute("SELECT event_id, user_id, epoch_us(ts) AS ts_us "
                     "FROM events WHERE event_type = 'click'").fetchdf()
    clicks = ev.groupby("user_id")["ts_us"].apply(sorted).to_dict()
    for _, r in got.head(50).iterrows():
        later = [t for t in clicks[r["user_id"]]
                 if r["ts_us"] - r["gap_us"] < t <= r["ts_us"]]
        assert later == [], r["event_id"]


def test_range_join_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from rayse.ops.relational import (range_join_events,
                                      range_join_events_sql)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    keys = ["event_id", "matched_event_id"]
    got = range_join_events(sf).to_pandas().sort_values(keys)
    got = got.reset_index(drop=True)
    want = con.execute(range_join_events_sql()).fetchdf()
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    assert (got["delta_us"].abs() <= 3_600_000_000).all()
