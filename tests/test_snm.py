"""Sorted-neighborhood blocking: DuckDB oracle match, the exact
candidate-budget property, halo/bucket invariance, and containment in
the exact Jaccard join."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def test_snm_matches_duckdb(ray_session, con):
    from rayse.ops.snm import snm_pairs, snm_pairs_sql

    got = snm_pairs(SF, threshold=0.5).to_pandas()
    want = con.execute(snm_pairs_sql(threshold=0.5)).fetchdf()
    assert len(want) > 0
    a = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = (want.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)


def test_snm_candidate_budget(ray_session):
    """SNM's defining property: candidate volume is EXACTLY
    sum_{off<window} (n - off) — key-skew independent."""
    import pyarrow.parquet as pq

    from rayse.ops.snm import SNM_WINDOW, snm_candidates

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    cand = snm_candidates(SF)
    expect = sum(n - off for off in range(1, SNM_WINDOW))
    assert cand.count() == expect


def test_snm_bucket_invariance(ray_session):
    """The owner+halo bucket exchange must be invariant to bucket width
    (every window pair seen exactly once)."""
    from rayse.ops.snm import SNM_WINDOW, snm_candidates

    def pairs(bucket):
        t = snm_candidates(SF, bucket=bucket).to_pandas()
        return sorted(map(tuple, t[["a", "b"]].to_numpy()))

    assert pairs(32) == pairs(1024)


def test_snm_subset_of_exact_join(ray_session, con):
    """Every SNM-verified pair passes the same Jaccard bar as the exact
    join (verification is shared), so SNM output must be a subset of
    the full PPJoin result at the same threshold."""
    from rayse.ops.dedup import jaccard_pairs
    from rayse.ops.snm import snm_pairs

    snm = set(map(tuple, snm_pairs(SF, threshold=0.9)
                  .to_pandas()[["doc_a", "doc_b"]].to_numpy()))
    full = set(map(tuple, jaccard_pairs(SF, shingle_k=1, threshold=0.9)
                   .to_pandas()[["doc_a", "doc_b"]].to_numpy()))
    assert snm <= full
