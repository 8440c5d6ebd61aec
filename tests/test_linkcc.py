import pandas as pd


def test_link_components_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.kcore import link_components, link_components_sql

    sf = "/root/testdata/sf0.001"
    got = (link_components(sf).to_pandas()
           .sort_values("node").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = (con.execute(link_components_sql()).fetchdf()
            .sort_values("node").reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_link_components_properties(ray_session):
    from rayse.ops.kcore import link_components

    got = link_components("/root/testdata/sf0.001").to_pandas()
    # labels are component minima: every comp_id is itself a node with
    # comp_id == itself, and comp_id <= node
    assert (got["comp_id"] <= got["node"]).all()
    roots = got[got["node"].isin(got["comp_id"].unique())]
    assert (roots.set_index("node").loc[
        got["comp_id"].unique(), "comp_id"].to_numpy()
        == got["comp_id"].unique()).all()
