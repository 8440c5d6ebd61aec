"""Distributed integer linear algebra over the embeddings table: the
Gram (uncentered scatter) matrix in ONE map_batches partial-sum pass,
and the top principal direction by fixed-point power iteration on the
tiny d x d result, projected back over the corpus in a second stateless
pass.

Scale shape (the classic one-pass PCA recipe): the data pass is
embarrassingly parallel — each batch contributes a d x d int64 partial
(~33 KB at d=64), summed order-independently by a bounded groupby whose
key space is d^2 regardless of corpus size; the eigen-iteration touches
only the d x d matrix (driver-side, exact Python ints — no overflow, no
float order-dependence); the projection is a broadcast-eigenvector
map_batches. Communication is d^2 per batch + n output rows; nothing
corpus-sized ever reaches the driver.

All arithmetic is integer on floor(x * 1e4)-quantized components, so
results are partition-order invariant and the DuckDB oracle (a HUGEINT
recursive-CTE mirror of the same iteration) is bit-exact. |xq| <= 2^13
for unit-norm-ish embeddings keeps a Gram entry inside int64 up to
~10^11 rows; past that the partial pass would carry (hi, lo) split
accumulators through the same stage shape — documented seam.

Normalization per iteration: v <- trunc_div(y * 2^20, max|y|), floor
division truncating toward zero on both sides (DuckDB ``//`` semantics,
mirrored by :func:`rayse.ops.similarity._trunc_div`); the final sign is
fixed by negating when the first nonzero component is negative — the
one global convention that makes +/-v deterministic.

Reference relationship: the reference exposes no linear-algebra surface
(nearest: the precomputed per-doc vector norms in
`IndexerService.java`'s metrics tables); this extends the embedding-ops
family (`rayse/ops/similarity.py`) with the moment-matrix machinery a
training-data pipeline needs for whitening / PCA-feature dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _mat_from_list, _trunc_div

PCA_SCALE = 10_000          # xq = floor(x * PCA_SCALE), int64
V_SCALE = 1 << 20           # fixed-point eigenvector scale
PCA_ITERS = 96              # fixed iteration count (recursive CTE in SQL);
#                             96 covers eigengap ratios down to ~0.9
#                             (0.9^96 ~ 4e-5 residual off-axis mass)


def _quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * float(PCA_SCALE)).astype(np.int64)


def _gram_partial_batch(batch: pa.Table) -> pa.Table:
    """One batch -> its upper-triangle Gram partial: d*(d+1)/2 rows of
    (ij, i, j, g) with g = sum_rows xq_i * xq_j (int64 matmul, exact)."""
    if batch.num_rows == 0:
        return pa.table({"ij": pa.array([], pa.int64()),
                         "i": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "g": pa.array([], pa.int64())})
    xq = _quantize(_mat_from_list(batch["embedding"]))
    d = xq.shape[1]
    g = xq.T @ xq
    iu, ju = np.triu_indices(d)
    return pa.table({
        "ij": pa.array(iu.astype(np.int64) * d + ju, pa.int64()),
        "i": pa.array(iu.astype(np.int64), pa.int64()),
        "j": pa.array(ju.astype(np.int64), pa.int64()),
        "g": pa.array(g[iu, ju], pa.int64()),
    })


def gram_dataset(sf_dir: str):
    """Streaming (ij, i, j, g) Gram upper triangle: partial d x d sums
    per batch, then a d^2-key groupby-sum (bounded shuffle)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    partials = ds.map_batches(_gram_partial_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = partials.groupby("ij").aggregate(Sum("g"), Max("i"), Max("j"))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({
            "i": pa.compute.cast(b["max(i)"], pa.int64()),
            "j": pa.compute.cast(b["max(j)"], pa.int64()),
            "g": pa.compute.cast(b["sum(g)"], pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def gram_matrix(sf_dir: str) -> pa.Table:
    """Query-result form: (i, j, g) upper triangle, (i, j)-sorted."""
    import ray

    parts = [t for t in ray.get(gram_dataset(sf_dir).to_arrow_refs())
             if t.num_rows]
    tbl = pa.concat_tables(parts).combine_chunks()
    order = pa.compute.sort_indices(
        tbl, sort_keys=[("i", "ascending"), ("j", "ascending")])
    return tbl.take(order)


def power_iteration(tri: pa.Table, d: int) -> list[int]:
    """Fixed-point power iteration on the d x d Gram matrix (driver-side,
    exact Python ints). Returns the V_SCALE-scaled eigenvector with the
    first-nonzero-positive sign convention."""
    G = [[0] * d for _ in range(d)]
    for i, j, g in zip(tri["i"].to_pylist(), tri["j"].to_pylist(),
                       tri["g"].to_pylist()):
        G[i][j] = g
        G[j][i] = g
    v = [V_SCALE] * d
    for _ in range(PCA_ITERS):
        y = [sum(G[r][c] * v[c] for c in range(d)) for r in range(d)]
        m = max(abs(x) for x in y)
        if m == 0:
            v = [0] * d
            continue
        v = [(x * V_SCALE) // m if x >= 0 else -((-x * V_SCALE) // m)
             for x in y]
    for x in v:
        if x != 0:
            if x < 0:
                v = [-c for c in v]
            break
    return v


def pca_project(sf_dir: str) -> pa.Table:
    """(vec_id, proj_q): each embedding's fixed-point projection onto the
    top principal direction — Gram pass, driver iteration on the d x d,
    then a broadcast-eigenvector projection pass."""
    import ray
    import ray.data as rd

    tri = gram_matrix(sf_dir)
    d = int(max(tri["j"].to_pylist())) + 1 if tri.num_rows else 0
    v = np.asarray(power_iteration(tri, d), dtype=np.int64)
    v_ref = ray.put(v)

    def project(batch: pa.Table) -> pa.Table:
        vec = ray.get(v_ref)
        xq = _quantize(_mat_from_list(batch["embedding"]))
        return pa.table({
            "vec_id": batch["vec_id"],
            "proj_q": pa.array(xq @ vec, pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ds.map_batches(project, batch_format="pyarrow",
                         zero_copy_batch=True)
    parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(parts).combine_chunks()
    return tbl.take(pa.compute.sort_indices(
        tbl, sort_keys=[("vec_id", "ascending")]))


# ---------------------------------------------------------------------------
# DuckDB oracles — exact integer mirrors.
# ---------------------------------------------------------------------------

_XQ_CTE = f"""
xq AS (
  SELECT e.vec_id, CAST(u.i AS BIGINT) AS j,
         CAST(floor(CAST(e.embedding[CAST(u.i AS INTEGER) + 1] AS DOUBLE)
                    * {float(PCA_SCALE)}) AS BIGINT) AS x
  FROM embeddings e, UNNEST(range(len(e.embedding))) u(i))"""

GRAM_SQL = f"""
WITH {_XQ_CTE}
SELECT a.j AS i, b.j AS j, CAST(sum(a.x * b.x) AS BIGINT) AS g
FROM xq a JOIN xq b ON a.vec_id = b.vec_id AND a.j <= b.j
GROUP BY 1, 2
ORDER BY 1, 2"""


def pca_project_sql() -> str:
    """The full pipeline in SQL: quantize -> Gram (symmetric) -> the
    SAME {it}-iteration fixed-point power iteration as a HUGEINT
    recursive CTE (trunc-div normalization per step via DuckDB's //,
    window-max over the aggregated matvec) -> sign fix -> projection.
    """.format(it=PCA_ITERS)
    return f"""
WITH RECURSIVE {_XQ_CTE},
gram AS (
  SELECT a.j AS i, b.j AS j, CAST(sum(a.x * b.x) AS HUGEINT) AS g
  FROM xq a JOIN xq b ON a.vec_id = b.vec_id
  GROUP BY 1, 2),
dims AS (SELECT DISTINCT i AS j FROM gram),
pi(iter, j, x) AS (
  SELECT 0, j, CAST({V_SCALE} AS HUGEINT) FROM dims
  UNION ALL
  SELECT s.iter + 1, y.j,
         CASE WHEN y.m = 0 THEN CAST(0 AS HUGEINT)
              WHEN y.y >= 0 THEN (y.y * {V_SCALE}) // y.m
              ELSE -(((-y.y) * {V_SCALE}) // y.m) END
  FROM (
    SELECT t.j, t.y, max(abs(t.y)) OVER () AS m
    FROM (SELECT g.i AS j, sum(g.g * p.x) AS y
          FROM gram g JOIN pi p ON p.j = g.j
          GROUP BY 1) t) y
  JOIN (SELECT max(iter) AS iter FROM pi) s ON TRUE
  WHERE s.iter < {PCA_ITERS}),
vfin AS (SELECT j, x FROM pi WHERE iter = {PCA_ITERS}),
sgn AS (SELECT CASE WHEN (SELECT x FROM vfin WHERE x <> 0
                          ORDER BY j LIMIT 1) < 0
                    THEN -1 ELSE 1 END AS s)
SELECT q.vec_id,
       CAST(sum(q.x * v.x * (SELECT s FROM sgn)) AS BIGINT) AS proj_q
FROM xq q JOIN vfin v ON q.j = v.j
GROUP BY q.vec_id
ORDER BY q.vec_id"""
