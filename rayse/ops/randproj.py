"""Random projection (sparse sign sketch) of the embedding table.

The dimensionality-reduction preprocessor of the ANN family
(Achlioptas 2003 database-friendly random projections, sign variant):
project every embedding onto OUT_DIMS pseudo-random +-1 directions,

    proj[v, i] = sum_j eq[v, j] * sign(i, j)
    sign(i, j) = +1 if splitmix64(i * D + j) is odd else -1

with the embedding quantized per component (eq = floor(e * 10^6) after
an exact float32->float64 widening — one IEEE multiply, identical in
numpy and DuckDB) so every sum is an exact int64 and the oracle
hash-matches. The sign matrix derives from the SAME splitmix finalizer
as the exchange partitioner and the sampling oracles — deterministic,
engine-independent, never stored.

Distributed shape: the (OUT_DIMS x D) sign matrix is built once per
task from pure arithmetic (no broadcast needed), each batch projects
with ONE int64 matmul, and output is (vec_id, out_dim, val) long form
— row-local, no shuffle, no driver state.

Reference relationship: none (no vector ops in the reference); pins
the deterministic-matrix matmul machinery next to
`rayse/ops/linalg.py`'s Gram/PCA family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

OUT_DIMS = 8
E_SCALE = 1_000_000


def _sign_matrix(d: int) -> np.ndarray:
    """(OUT_DIMS x d) +-1 int64 matrix from splitmix(i * d + j)."""
    from .exchange import _mix

    idx = (np.arange(OUT_DIMS, dtype=np.uint64)[:, None]
           * np.uint64(d)
           + np.arange(d, dtype=np.uint64)[None, :])
    bits = _mix(idx.ravel()).reshape(OUT_DIMS, d) & np.uint64(1)
    return np.where(bits == 1, np.int64(1), np.int64(-1))


def _project_batch(batch: pa.Table) -> pa.Table:
    vec_id = batch["vec_id"].to_numpy(zero_copy_only=False)
    emb = batch["embedding"]
    flat = emb.combine_chunks().flatten().to_numpy(
        zero_copy_only=False).astype(np.float64) if isinstance(
        emb, pa.ChunkedArray) else emb.flatten().to_numpy(
        zero_copy_only=False).astype(np.float64)
    d = flat.size // vec_id.size
    eq = np.floor(flat * E_SCALE).astype(np.int64).reshape(
        vec_id.size, d)
    proj = eq @ _sign_matrix(d).T          # (n, OUT_DIMS) int64
    n = vec_id.size
    return pa.table({
        "vec_id": pa.array(np.repeat(vec_id, OUT_DIMS), pa.int64()),
        "out_dim": pa.array(np.tile(np.arange(OUT_DIMS, dtype=np.int64),
                                    n), pa.int64()),
        "val": pa.array(proj.ravel(), pa.int64()),
    })


def random_projection(sf_dir: str):
    """(vec_id, out_dim, val) Dataset: exact int64 sign-sketch
    projection of every embedding — DuckDB hash-matched against the
    zipped-unnest oracle."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ds.map_batches(_project_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def random_projection_sql(d: int = 64) -> str:
    from .sampling import _mix_sql

    return f"""
WITH flat AS (
  SELECT vec_id,
         unnest(embedding) AS e,
         unnest(range(len(embedding))) AS j
  FROM embeddings
),
q AS (
  SELECT vec_id, j,
         CAST(floor(CAST(e AS DOUBLE) * {E_SCALE}) AS BIGINT) AS eq
  FROM flat
),
signs AS (
  SELECT i, j,
         CASE WHEN {_mix_sql(f"i * {d} + j")} % 2 = 1
              THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range({OUT_DIMS})) AS i)
  CROSS JOIN (SELECT unnest(range({d})) AS j)
)
SELECT q.vec_id, CAST(s.i AS BIGINT) AS out_dim,
       CAST(sum(q.eq * s.s) AS BIGINT) AS val
FROM q JOIN signs s ON s.j = q.j
GROUP BY q.vec_id, s.i
ORDER BY q.vec_id, out_dim
"""
