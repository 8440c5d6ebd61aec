"""Multi-level ROLLUP aggregate vs DuckDB GROUP BY ROLLUP, pinned at
sf0.001 (the driver re-checks at sf0.01)."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_rollup_matches_duckdb(ray_session):
    from rayse.ops.rollup import ROLLUP_AGG_SQL, rollup_agg

    got = rollup_agg(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(ROLLUP_AGG_SQL).fetchdf()
    assert len(want) > 2
    keys = ["event_type", "day"]
    a = got.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    b = want.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)


def test_rollup_levels_consistent(ray_session):
    """The (type) level must equal the sum of its (type, day) rows, and
    the grand total the sum of the (type) level."""
    from rayse.ops.rollup import rollup_agg

    df = rollup_agg(SF).to_pandas()
    fine = df[(df["day"] >= 0)]
    types = df[(df["day"] == -1) & (df["event_type"] != "")]
    total = df[(df["event_type"] == "")]
    per_type = fine.groupby("event_type")[["n", "sum_vq"]].sum()
    for _, r in types.iterrows():
        assert per_type.loc[r["event_type"], "n"] == r["n"]
        assert per_type.loc[r["event_type"], "sum_vq"] == r["sum_vq"]
    assert total["n"].iloc[0] == types["n"].sum()
    assert total["sum_vq"].iloc[0] == types["sum_vq"].sum()


def test_cube_matches_duckdb(ray_session):
    from rayse.ops.rollup import CUBE_AGG_SQL, cube_agg

    got = cube_agg(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(CUBE_AGG_SQL).fetchdf()
    # cube = rollup + one (day) slice per distinct day
    assert len(want) > len(got[got["day"] >= 0]["day"].unique())
    keys = ["event_type", "day"]
    a = got.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    b = want.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
