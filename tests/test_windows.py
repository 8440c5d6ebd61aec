"""Windowed/ordered operators vs DuckDB on sf0.001 (the driver re-checks
these at sf0.01 via __ray_entry__.oracle_sql)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _cmp(ray_tbl, sql_df):
    a = ray_tbl.to_pandas() if hasattr(ray_tbl, "to_pandas") else ray_tbl
    if hasattr(a, "to_pandas"):
        a = a.to_pandas()
    a = a.sort_index(axis=1).sort_values(list(sorted(a.columns))).reset_index(drop=True)
    b = sql_df.sort_index(axis=1).sort_values(list(sorted(sql_df.columns))).reset_index(drop=True)
    assert len(a) == len(b)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_tumbling_agg(ray_session, con):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __ray_entry__ as e

    _cmp(e.queries()["windowed_agg"](SF),
         con.sql(e.oracle_sql()["windowed_agg"]).df())


def test_sessionize(ray_session, con):
    import __ray_entry__ as e

    _cmp(e.queries()["sessionize"](SF),
         con.sql(e.oracle_sql()["sessionize"]).df())


def test_top_n_per_group(ray_session, con):
    import __ray_entry__ as e

    _cmp(e.queries()["top_events_per_type"](SF),
         con.sql(e.oracle_sql()["top_events_per_type"]).df())


def test_sessionize_gap_semantics(ray_session):
    """Gap strictly greater than timeout starts a new session."""
    from rayse.ops.windows import sessionize

    out = sessionize(SF, gap_s=1800).take_all()
    assert out
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r["session_idx"])
        for a, b in zip(rows, rows[1:]):
            # consecutive sessions are separated by more than the gap
            assert b["start_ts"] - a["end_ts"] > 1800 * 1_000_000


def test_hopping_agg_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.windows import hopping_agg, hopping_agg_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(hopping_agg_sql(3600, 900)).fetchdf()
    got = hopping_agg(SF, 3600, 900).to_pandas()
    keys = ["event_type", "window_start"]
    a = got.sort_values(keys).reset_index(drop=True)
    b = want.sort_values(keys).reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    assert a.equals(b)
    # every tumbling count is <= the containing hopping-window count, and
    # each event lands in exactly window/hop windows
    assert got["n_events"].sum() == 4 * con.execute(
        "SELECT count(*) FROM events").fetchone()[0]


def test_late_events_matches_duckdb(ray_session, con):
    from rayse.ops.windows import late_events, late_events_sql

    got = late_events(SF)
    want = con.sql(late_events_sql()).df()
    _cmp(got, want)
    # the synthesized skew must exercise BOTH branches
    import pandas as pd
    df = got.to_pandas() if hasattr(got, "to_pandas") else got
    if isinstance(df, pd.DataFrame) is False:
        df = df.to_pandas()
    assert set(df["late"].unique()) == {0, 1}


def test_late_events_bucket_invariant(ray_session):
    """The bucket size (driver-state lever) must not change the result:
    the seeded segment-scan is exact across any bucketing."""
    import pandas as pd

    from rayse.ops.windows import late_events

    a = late_events(SF, bucket=1 << 13).to_pandas()
    b = late_events(SF, bucket=37).to_pandas()       # prime, many buckets
    key = ["event_type", "late"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
