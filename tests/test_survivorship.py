import pandas as pd


def test_survivorship_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.dedup import (survivorship_keep_best,
                                 survivorship_keep_best_sql)

    sf = "/root/testdata/sf0.001"
    got = (survivorship_keep_best(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(survivorship_keep_best_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_survivorship_one_winner_per_cluster(ray_session):
    from rayse.ops.dedup import dedup_clusters, survivorship_keep_best

    sf = "/root/testdata/sf0.001"
    got = survivorship_keep_best(sf).to_pandas()
    # exactly one row per cluster, and winners dominate their cluster
    assert got["cluster_id"].is_unique
    cl = dedup_clusters(sf, shingle_k=1, threshold=0.9).to_pandas()
    assert set(got["cluster_id"]) == set(cl["cluster_id"])
    assert got["doc_id"].isin(cl["doc_id"]).all()
