"""AMS F2 sketch: DuckDB bit-exact match, estimator sanity, and the
linearity (mergeability) property."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ams_matches_duckdb(ray_session):
    from rayse.ops.ams import ams_f2, ams_f2_sql

    got = ams_f2(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(ams_f2_sql()).fetchdf()
    a = got.sort_values("j").reset_index(drop=True)
    b = (want.sort_values("j").reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    # estimator quality: within 2x on the skewed word stream (measured
    # ~5%; the bound is loose on purpose — it pins sanity, not luck)
    f2, est = a.f2_exact[0], a.f2_est[0]
    assert f2 // 2 <= est <= f2 * 2


def test_ams_counters_linear():
    """s_j over a concatenated stream == sum of the parts' s_j — the
    property that makes per-batch partials + groupby exact."""
    import pyarrow as pa

    from rayse.ops.ams import AMS_R, _ams_partial

    t1 = pa.table({"text": ["the fast key", "order sort"]})
    t2 = pa.table({"text": ["the the merge"]})
    t12 = pa.table({"text": ["the fast key", "order sort",
                             "the the merge"]})
    s1 = _ams_partial(t1)["s"].to_numpy()
    s2 = _ams_partial(t2)["s"].to_numpy()
    s12 = _ams_partial(t12)["s"].to_numpy()
    assert s1.size == AMS_R
    np.testing.assert_array_equal(s1 + s2, s12)


def test_ams_exact_f2_ground_truth(ray_session):
    """f2_exact equals the brute-force sum of squared counts over the
    raw token stream (hash-grouped, the documented collision
    semantics)."""
    import pyarrow.parquet as pq

    from rayse.ops.ams import ams_f2
    from rayse.ops.textstats import _word_arr_slices, fnv64_slices

    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    words = np.asarray([w for t in texts for w in t.split(" ")],
                       dtype=object)
    h = fnv64_slices(*_word_arr_slices(words))
    _, cnt = np.unique(h, return_counts=True)
    brute = int((cnt.astype(object) ** 2).sum())
    got = ams_f2(SF).to_pandas()
    assert got.f2_exact[0] == brute
