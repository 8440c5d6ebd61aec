import pandas as pd


def test_simpson_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.textstats import simpson_diversity, simpson_diversity_sql

    sf = "/root/testdata/sf0.001"
    got = (simpson_diversity(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(simpson_diversity_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns])
    assert got["simpson_ppm"].between(0, 1_000_000).all()


def test_simpson_extremes(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayse.ops.textstats import SIMPSON_SCALE, simpson_diversity

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a a a a", "a b c d", "x"],
    }), str(tmp_path / "documents.parquet"))
    got = (simpson_diversity(str(tmp_path)).to_pandas()
           .set_index("doc_id")["simpson_ppm"])
    assert got[1] == SIMPSON_SCALE          # all-same: certainty
    assert got[2] == 0                      # all-distinct: zero
    assert got[3] == SIMPSON_SCALE          # n < 2 convention
