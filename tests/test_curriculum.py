"""Exact global ranking (curriculum order + deterministic shuffle) vs
row_number() oracles."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def _check(got, sql, n_docs):
    want = _con().execute(sql).fetchdf()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = want.sort_values("doc_id").reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # ranks are a permutation of 1..n
    r = np.sort(got["rank"].to_numpy())
    assert r[0] == 1 and r[-1] == n_docs and np.all(np.diff(r) == 1)


def test_curriculum_order_matches_duckdb(ray_session):
    from rayse.ops.curriculum import curriculum_order, curriculum_order_sql

    got = curriculum_order(SF).to_pandas()
    _check(got, curriculum_order_sql(), len(got))


def test_shuffle_order_matches_duckdb(ray_session):
    from rayse.ops.curriculum import shuffle_order, shuffle_order_sql

    got = shuffle_order(SF).to_pandas()
    _check(got, shuffle_order_sql(), len(got))
    # the shuffle is not the identity and not doc_id order
    df = got.sort_values("doc_id").reset_index(drop=True)
    assert not (df["rank"].to_numpy() == df["doc_id"].to_numpy() + 1).all()
    assert not df["rank"].is_monotonic_increasing


def test_curriculum_order_blocksize_invariant(ray_session):
    """Histogram offsets + exchange ranks are batch-boundary
    independent."""
    from ray.data.context import DataContext

    from rayse.ops.curriculum import curriculum_order

    a = curriculum_order(SF).to_pandas().sort_values("doc_id")
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024
        b = curriculum_order(SF).to_pandas().sort_values("doc_id")
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
