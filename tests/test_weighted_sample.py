import numpy as np
import pandas as pd


def test_weighted_sample_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.sampling import weighted_sample, weighted_sample_sql

    sf = "/root/testdata/sf0.001"
    got = (weighted_sample(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(weighted_sample_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 64
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_weighted_sample_block_invariance(ray_session):
    # partial bottom-k merge is exact for any batching
    import ray.data as rd

    from rayse.ops.sampling import _weighted_final, _weighted_partial

    sf = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "lang", "n_chars"])
    import pyarrow as pa

    whole = _weighted_final(_weighted_partial(t, 64), 64).to_pandas()
    parts = [_weighted_partial(t.slice(i, 37), 64)
             for i in range(0, t.num_rows, 37)]
    merged = _weighted_final(pa.concat_tables(parts), 64).to_pandas()
    pd.testing.assert_frame_equal(
        whole.sort_values("doc_id").reset_index(drop=True),
        merged.sort_values("doc_id").reset_index(drop=True))


def test_weighted_sample_favors_heavy_docs():
    # with one huge-weight doc, it is (near-)certain to be picked:
    # priority = hash // w shrinks by w
    import pyarrow as pa

    from rayse.ops.sampling import _weighted_final, _weighted_partial

    n = 5000
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array(["en"] * n, pa.string()),
        "n_chars": pa.array(
            np.where(np.arange(n) == 777, 10**12, 1).astype(np.int64),
            pa.int64())})
    out = _weighted_final(_weighted_partial(t, 8), 8).to_pandas()
    assert 777 in set(out["doc_id"])
