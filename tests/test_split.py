import pandas as pd


def test_split_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.sampling import split_assign, split_assign_sql

    sf = "/root/testdata/sf0.001"
    got = (split_assign(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(split_assign_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns])
    counts = got["split"].value_counts()
    # roughly 80/10/10 and all three present
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]


def test_split_disjoint_and_total(ray_session):
    from rayse.ops.sampling import split_assign

    got = split_assign("/root/testdata/sf0.001").to_pandas()
    assert got["doc_id"].is_unique
    assert len(got) == 500
