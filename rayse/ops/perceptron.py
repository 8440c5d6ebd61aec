"""Batch (pocket-style) perceptron training in exact integer
arithmetic — the iterative SUPERVISED learner of the ML family
(stump learns one threshold, NB counts, Rocchio averages, k-means
iterates unsupervised; this one descends a loss over epochs).

The classical per-sample perceptron is order-dependent (each update
changes the next prediction), which can't be both distributed and
bit-reproducible. The BATCH variant is: one epoch computes every
margin under the FROZEN weights, then applies the summed update

    w += sum_{i misclassified} y_i * x_i        (int64 vector adds)
    b += sum_{i misclassified} y_i

Misclassified = margin y_i * (w . x_i + b) <= 0. Integer sums are
order-independent, so epochs unroll into an exact SQL mirror (the
``kmeans_assign_sql`` idiom). Task: y = +1 iff label is odd, features
= the embeddings quantized by the shared ``_km_quantize`` contract.

Distributed shape per epoch: broadcast (w, b) once (ray.put), one
streaming pass emits per-batch partial (d, s) update rows + the
miscount, one bounded groupby folds them; driver state is the D+1
weight vector. Magnitudes: |x| <= 1e6, so after E epochs
|w| <= E * N * 1e6 and w.x <= D * E * N * 1e12 — int64-safe for the
(E=2, N<=1e5) configuration and HUGEINT-safe in the oracle.

Reference relationship: none; beyond-reference ML family (SURVEY
§2.7), pinning the iterative-learner machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCHS = 2


def _xy(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    from .similarity import _km_quantize, _mat_from_list

    X = _km_quantize(_mat_from_list(batch["embedding"]))
    lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    y = np.where(lab % 2 == 1, 1, -1).astype(np.int64)
    return X, y


def perceptron_train(sf_dir: str, epochs: int = EPOCHS) -> pa.Table:
    """(d, w): trained weight vector (d = 0..D-1), bias at d = -1, and
    the final misclassified count at d = -2 — DuckDB hash-matched
    against the unrolled-epoch oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding", "label"])

    dim = None
    w = None
    b = 0
    for _ in range(epochs):
        ref = ray.put((w, b))

        def epoch_partial(batch: pa.Table) -> pa.Table:
            wb, bb = ray.get(ref)
            X, y = _xy(batch)
            if wb is None:
                mis = np.ones(y.size, dtype=bool)   # margins all 0
            else:
                mis = y * (X @ wb + bb) <= 0
            upd = (y[mis, None] * X[mis]).sum(axis=0).astype(np.int64)
            d = np.arange(X.shape[1], dtype=np.int64)
            return pa.table({
                "d": pa.array(np.concatenate([d, [-1]]), pa.int64()),
                "s": pa.array(np.concatenate(
                    [upd, [int(y[mis].sum())]]), pa.int64()),
            })

        rows = (ds.map_batches(epoch_partial, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("d").sum("s").take_all())
        upd = {int(r["d"]): int(r["sum(s)"]) for r in rows}
        if dim is None:
            dim = max(upd) + 1
            w = np.zeros(dim, dtype=np.int64)
        for d in range(dim):
            w[d] += upd.get(d, 0)
        b += upd.get(-1, 0)

    ref = ray.put((w, b))

    def count_mis(batch: pa.Table) -> pa.Table:
        wb, bb = ray.get(ref)
        X, y = _xy(batch)
        mis = int((y * (X @ wb + bb) <= 0).sum())
        return pa.table({"m": pa.array([mis], pa.int64())})

    n_mis = int(ds.map_batches(count_mis, batch_format="pyarrow",
                               zero_copy_batch=True).sum("m"))
    ds_out = [-2, -1] + list(range(dim))
    ws = [n_mis, b] + [int(x) for x in w]
    return pa.table({"d": pa.array(ds_out, pa.int64()),
                     "w": pa.array(ws, pa.int64())})


def perceptron_train_sql(epochs: int = EPOCHS) -> str:
    """Oracle: the identical batch recursion, epochs unrolled; margins
    and updates in HUGEINT."""
    from .similarity import _KM_SCALE

    ctes = [f"""x AS MATERIALIZED (
  SELECT e.vec_id, CAST(u.i AS BIGINT) AS d,
         CAST(floor(CAST(e.embedding[CAST(u.i AS INTEGER) + 1] AS DOUBLE)
                    * {_KM_SCALE}) AS BIGINT) AS xq,
         CASE WHEN e.label % 2 = 1 THEN 1 ELSE -1 END AS y
  FROM embeddings e, UNNEST(range(len(e.embedding))) u(i))"""]
    # epoch 1: w = 0, b = 0 -> every margin is 0 -> all rows update
    ctes.append("""w1 AS MATERIALIZED (
  SELECT d, sum(CAST(y AS HUGEINT) * xq) AS w FROM x GROUP BY d),
b1 AS MATERIALIZED (
  SELECT sum(CAST(y AS HUGEINT)) AS b
  FROM (SELECT DISTINCT vec_id, y FROM x))""")
    prev_w, prev_b = "w1", "b1"
    for e in range(2, epochs + 1):
        ctes.append(f"""m{e} AS MATERIALIZED (
  SELECT x.vec_id, any_value(x.y) AS y,
         any_value(x.y) * (sum(x.xq * w.w) + (SELECT b FROM {prev_b}))
           AS margin
  FROM x JOIN {prev_w} w USING (d) GROUP BY x.vec_id),
w{e} AS MATERIALIZED (
  SELECT w.d, w.w + coalesce(u.s, 0) AS w
  FROM {prev_w} w LEFT JOIN (
    SELECT x.d, sum(CAST(x.y AS HUGEINT) * x.xq) AS s
    FROM x JOIN m{e} ON m{e}.vec_id = x.vec_id
    WHERE m{e}.margin <= 0 GROUP BY x.d) u USING (d)),
b{e} AS MATERIALIZED (
  SELECT (SELECT b FROM {prev_b})
         + coalesce(sum(CAST(y AS HUGEINT)), 0) AS b
  FROM m{e} WHERE margin <= 0)""")
        prev_w, prev_b = f"w{e}", f"b{e}"
    fin = epochs + 1
    ctes.append(f"""mfin AS (
  SELECT x.vec_id, any_value(x.y) AS y,
         any_value(x.y) * (sum(x.xq * w.w) + (SELECT b FROM {prev_b}))
           AS margin
  FROM x JOIN {prev_w} w USING (d) GROUP BY x.vec_id)""")
    return f"""WITH {', '.join(ctes)}
SELECT CAST(-2 AS BIGINT) AS d,
       CAST(count(*) FILTER (WHERE margin <= 0) AS BIGINT) AS w
FROM mfin
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(b AS BIGINT) FROM {prev_b}
UNION ALL
SELECT d, CAST(w AS BIGINT) FROM {prev_w}
ORDER BY d"""
