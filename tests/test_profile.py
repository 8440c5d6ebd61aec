"""Per-column dataset profile vs the UNION-arm oracle."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_profile_events_matches_duckdb(ray_session):
    from rayse.ops.profile import profile_events, profile_events_sql

    got = profile_events(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(profile_events_sql()).fetchdf()
    keys = ["col", "metric"]
    a = got.sort_values(keys).reset_index(drop=True)
    b = want.sort_values(keys).reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    p = a.set_index(["col", "metric"])["v"]
    n = p[("event_id", "n")]
    # event_id is a unique non-null key; type enum is small
    assert p[("event_id", "n_distinct")] == n
    assert p[("event_id", "n_null")] == 0
    assert p[("event_type", "n_distinct")] == 5
    assert p[("ts", "min")] < p[("ts", "max")]
