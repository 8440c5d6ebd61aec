import pandas as pd


def test_bm25f_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e
    from rayse.ops.porter_oracle import porter_bm25f_sql, porter_bm25f_topk

    sf = "/root/testdata/sf0.001"
    idir = e._index_for(sf)
    got = porter_bm25f_topk(idir).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(porter_bm25f_sql()).fetchdf()
    key = ["query", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_bm25f_differs_from_bm25_and_roleboost(ray_session):
    # pre- vs post-saturation weighting and per-role avgdl must move
    # at least some scores
    import __ray_entry__ as e
    from rayse.ops.porter_oracle import porter_bm25_topk, porter_bm25f_topk

    idir = e._index_for("/root/testdata/sf0.001")
    f = porter_bm25f_topk(idir).to_pandas()
    b = porter_bm25_topk(idir).to_pandas()
    merged = f.merge(b, on=["query", "conv_id", "turn_idx"],
                     suffixes=("_f", "_b"))
    assert (merged["score_q_f"] != merged["score_q_b"]).any()
