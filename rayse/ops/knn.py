"""k-nearest-neighbour classification over the embedding table — the
lazy-learner member of the classifier family (`nb_classify` /
`centroid_classify` / `perceptron_train` are its parametric siblings).

Integer-exact contract (the `kmeans_assign` recipe): components
quantize to floor(x·1e6) int64 once, distances are int64 squared-L2
sums (64 dims × (2e6)² ≈ 1.3e14 — no overflow), so Python and DuckDB
agree bit-for-bit with no float tie ambiguity. Neighbour order is
(dist ASC, vec_id ASC); the vote is majority label with
(count DESC, label ASC) tie-break; the query row itself is excluded.

Scale shape: the Q query vectors ride ONE `ray.put` broadcast; every
batch computes its integer distance block vectorized
(‖q‖²+‖x‖²−2q·xᵀ via int64 einsum/matmul) and emits a per-batch
partial top-k (Q×k rows), so the driver merge is bounded by
Q × k × n_blocks — never corpus-order. At 100 TB this is exactly the
`ann_topk` path with integer scores; an IVF-routed variant would drop
in through the same partial-top-k seam.

Reference relationship: none (beyond-reference training-data op); the
classifier-family context is SURVEY §2.7 SE7z4/z66-z68.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _ids_from, _mat_from_list, _km_quantize

KNN_QUERIES = 8
KNN_K = 9


def knn_classify(sf_dir: str, n_queries: int = KNN_QUERIES,
                 k: int = KNN_K) -> pa.Table:
    """(q_id, pred_label, votes, kth_dist): majority label of the
    ``k`` integer-L2-nearest other vectors per query — DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    # key-column scan for the id pick + a filtered read of exactly the
    # selected rows (raw, unnormalized — the quantized-L2 contract).
    from .similarity import _rows_for_ids, _smallest_vec_ids

    qt = _rows_for_ids(sf_dir, _smallest_vec_ids(sf_dir, n_queries))
    Q = _km_quantize(_mat_from_list(qt["embedding"]))
    q_ids = _ids_from(qt["vec_id"])
    q_norm = np.einsum("qd,qd->q", Q, Q)
    q_ref = ray.put((q_ids, Q, q_norm))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qm, qn = ray.get(q_ref)
        ids = _ids_from(batch["vec_id"])
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        X = _km_quantize(_mat_from_list(batch["embedding"]))
        xn = np.einsum("nd,nd->n", X, X)
        # int64 block distances: ‖q‖² + ‖x‖² − 2 q·xᵀ
        d = qn[:, None] + xn[None, :] - 2 * (qm @ X.T)
        top = min(k + 1, ids.size)   # +1 absorbs a possible self row
        out_q, out_v, out_d, out_l = [], [], [], []
        for qi in range(qm.shape[0]):
            row = d[qi]
            sel = np.lexsort((ids, row))[:top]
            keep = ids[sel] != qids[qi]
            sel = sel[keep][:k]
            out_q.extend([int(qids[qi])] * sel.size)
            out_v.extend(ids[sel].tolist())
            out_d.extend(row[sel].tolist())
            out_l.extend(lab[sel].tolist())
        return pa.table({"q_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "dist": pa.array(out_d, pa.int64()),
                         "label": pa.array(out_l, pa.int64())})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()  # Q*k/block
    by_q: dict[int, list] = {}
    for r in parts:
        by_q.setdefault(int(r["q_id"]), []).append(
            (int(r["dist"]), int(r["vec_id"]), int(r["label"])))
    out_q, out_p, out_n, out_kd = [], [], [], []
    for qid in sorted(by_q):
        cand = sorted(by_q[qid])[:k]
        labs = np.asarray([c[2] for c in cand], np.int64)
        ul, cnt = np.unique(labs, return_counts=True)
        win = ul[np.lexsort((ul, -cnt))[0]]
        out_q.append(qid)
        out_p.append(int(win))
        out_n.append(int(cnt[ul == win][0]))
        out_kd.append(cand[-1][0])
    return pa.table({
        "q_id": pa.array(out_q, pa.int64()),
        "pred_label": pa.array(out_p, pa.int64()),
        "votes": pa.array(out_n, pa.int64()),
        "kth_dist": pa.array(out_kd, pa.int64()),
    })


def knn_classify_sql(n_queries: int = KNN_QUERIES,
                     k: int = KNN_K) -> str:
    """Oracle: the identical quantized long-form distance join, k-NN cut
    by (dist, vec_id) row_number, majority vote by (count DESC, label)."""
    return f"""
WITH x AS (
  SELECT e.vec_id, CAST(u.i AS BIGINT) AS d,
         CAST(floor(CAST(e.embedding[CAST(u.i AS INTEGER) + 1] AS DOUBLE)
                    * 1000000) AS BIGINT) AS xq
  FROM embeddings e, UNNEST(range(len(e.embedding))) u(i)),
q AS (SELECT vec_id FROM embeddings ORDER BY vec_id
      LIMIT {n_queries}),
dist AS (
  SELECT qx.vec_id AS q_id, ex.vec_id AS n_id,
         CAST(sum((qx.xq - ex.xq) * (qx.xq - ex.xq)) AS BIGINT) AS dist
  FROM x qx JOIN x ex USING (d)
  WHERE qx.vec_id IN (SELECT vec_id FROM q)
    AND ex.vec_id <> qx.vec_id
  GROUP BY 1, 2),
nn AS (
  SELECT q_id, n_id, dist FROM (
    SELECT q_id, n_id, dist,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY dist, n_id) AS rn
    FROM dist) WHERE rn <= {k}),
kth AS (SELECT q_id, max(dist) AS kth_dist FROM nn GROUP BY q_id),
votes AS (
  SELECT nn.q_id, CAST(e.label AS BIGINT) AS label,
         CAST(count(*) AS BIGINT) AS votes
  FROM nn JOIN embeddings e ON nn.n_id = e.vec_id
  GROUP BY 1, 2),
win AS (
  SELECT q_id, label, votes FROM (
    SELECT q_id, label, votes,
           row_number() OVER (PARTITION BY q_id
                              ORDER BY votes DESC, label) AS rn
    FROM votes) WHERE rn = 1)
SELECT w.q_id, w.label AS pred_label, w.votes, kth.kth_dist
FROM win w JOIN kth USING (q_id)
ORDER BY w.q_id"""
