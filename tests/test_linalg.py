"""Integer Gram matrix + fixed-point PCA vs the HUGEINT recursive-CTE
oracle and numpy eigendecomposition."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    return con


def test_gram_matrix_matches_duckdb(ray_session):
    from rayse.ops.linalg import GRAM_SQL, gram_matrix

    got = gram_matrix(SF).to_pandas()
    want = _con().execute(GRAM_SQL).fetchdf().astype(got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    d = got["j"].max() + 1
    assert len(got) == d * (d + 1) // 2
    # diagonal entries are sums of squares: non-negative
    assert (got[got.i == got.j]["g"] >= 0).all()


def test_gram_matrix_brute_force(ray_session):
    from rayse.ops.linalg import PCA_SCALE, gram_matrix

    got = gram_matrix(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet")["embedding"].to_pylist()
    xq = np.floor(np.asarray(emb, dtype=np.float64)
                  * PCA_SCALE).astype(np.int64)
    G = xq.T @ xq
    for i, j, g in got.itertuples(index=False):
        assert G[i, j] == g


def test_pca_project_matches_duckdb(ray_session):
    from rayse.ops.linalg import pca_project, pca_project_sql

    got = pca_project(SF).to_pandas()
    want = _con().execute(pca_project_sql()).fetchdf().astype(
        got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 500


def test_pca_direction_matches_numpy_eigvec(ray_session):
    """The fixed-point iteration converges to the true top eigenvector:
    cosine of the driver vector vs numpy's eigh direction ~ 1."""
    from rayse.ops.linalg import (PCA_SCALE, gram_matrix,
                                  power_iteration)

    tri = gram_matrix(SF)
    d = int(max(tri["j"].to_pylist())) + 1
    v = np.asarray(power_iteration(tri, d), dtype=np.float64)
    emb = pq.read_table(f"{SF}/embeddings.parquet")["embedding"].to_pylist()
    xq = np.floor(np.asarray(emb, dtype=np.float64)
                  * PCA_SCALE).astype(np.int64)
    G = (xq.T @ xq).astype(np.float64)
    w, vecs = np.linalg.eigh(G)
    top = vecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    # eigengap ratio here is ~0.93; 96 iterations leave ~0.93^96 ~ 1e-3
    # off-axis mass, quadratically suppressed in the cosine
    assert cos > 1 - 1e-4
    # eigengap sanity: iteration count suffices for this corpus
    assert w[-1] > w[-2]


def test_power_iteration_zero_matrix(ray_session):
    import pyarrow as pa

    from rayse.ops.linalg import power_iteration

    tri = pa.table({"i": pa.array([0, 0, 1], pa.int64()),
                    "j": pa.array([0, 1, 1], pa.int64()),
                    "g": pa.array([0, 0, 0], pa.int64())})
    assert power_iteration(tri, 2) == [0, 0]
