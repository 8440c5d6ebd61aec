import pandas as pd


def test_data_checks_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.datachecks import data_checks, data_checks_sql

    sf = "/root/testdata/sf0.001"
    got = data_checks(sf).to_pandas()
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(data_checks_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns])
    # non-degenerate: some checks hold, some are violated
    assert (got["n_violations"] == 0).any()
    assert (got["n_violations"] > 0).any()


def test_data_checks_violation_bounds(ray_session):
    from rayse.ops.datachecks import data_checks

    got = data_checks("/root/testdata/sf0.001").to_pandas()
    assert (got["n_violations"] >= 0).all()
    assert (got["n_violations"] <= got["n_rows"]).all()
    assert len(got) == 8
