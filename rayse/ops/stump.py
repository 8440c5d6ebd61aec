"""Decision stump (1R) — exact single-feature threshold learning.

The model-eval family has a trained classifier (`rayse/ops/classify.py`
Naive Bayes) and its evaluation cells (`nb_eval`); what it lacked is
the LEARNING-a-split primitive — the inner loop of every tree/boosting
trainer: scan all thresholds of one feature, score each split exactly,
pick the argmax. That scan is the classic bounded-histogram reduction:

    best (t, polarity) of rule  "value > t  ->  positive"
    over  label = (event_type == 'purchase'),  feature = value cents.

INTEGER-EXACT contract: the feature quantizes per row to cents
(DuckDB round parity, `relational._cents`), counts are int64, accuracy
quantizes as n_correct * 1e6 // n_total, and ties break
(n_correct DESC, threshold ASC, predict_above ASC) — so the DuckDB
window-cumulative oracle matches bit-for-bit.

Distributed shape: per-batch partial (value_cents, n, n_pos)
histograms -> one tiny groupby -> driver-side cumulative scan over the
DISTINCT-cents table only. The value domain is range-bounded (cents of
a bounded price), so driver state is domain-bounded, not row-bounded —
the same idiom as `rayse/ops/quantiles.py`; at 100 TB the histogram is
identical, only the partials see more rows.

Reference relationship: none; pins the supervised-split machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

POS_TYPE = "purchase"
ACC_SCALE = 1_000_000


def stump_fit(sf_dir: str) -> pa.Table:
    """(threshold_cents, predict_above, n_correct, n_total, acc_ppm):
    the exact best single-threshold rule on value predicting
    event_type == 'purchase' — DuckDB hash-matched."""
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        vq = _cents(batch["value"].to_numpy(zero_copy_only=False))
        pos = (np.asarray(batch["event_type"].to_pylist(), dtype=object)
               == POS_TYPE)
        uniq, inv = np.unique(vq, return_inverse=True)
        n = np.bincount(inv, minlength=uniq.size)
        np_ = np.bincount(inv, weights=pos.astype(np.float64),
                          minlength=uniq.size)
        return pa.table({"vq": pa.array(uniq, pa.int64()),
                         "n": pa.array(n.astype(np.int64), pa.int64()),
                         "np": pa.array(np_.astype(np.int64), pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("vq").sum(["n", "np"]).take_all())
    vq = np.array([r["vq"] for r in rows], dtype=np.int64)
    order = np.argsort(vq, kind="stable")
    vq = vq[order]
    n = np.array([r["sum(n)"] for r in rows], dtype=np.int64)[order]
    npos = np.array([r["sum(np)"] for r in rows], dtype=np.int64)[order]
    cn, cp = np.cumsum(n), np.cumsum(npos)
    total_n, total_p = int(cn[-1]), int(cp[-1])

    # polarity 1: predict positive ABOVE t; polarity 0: at/below t
    corr_above = (total_p - cp) + (cn - cp)
    corr_below = cp + (total_n - total_p) - (cn - cp)
    best = None
    for pred_above, corr in ((0, corr_below), (1, corr_above)):
        for i in range(vq.size):
            key = (-int(corr[i]), int(vq[i]), pred_above)
            if best is None or key < best:
                best = key
    n_correct, thr, pred = -best[0], best[1], best[2]
    return pa.table({
        "threshold_cents": pa.array([thr], pa.int64()),
        "predict_above": pa.array([pred], pa.int64()),
        "n_correct": pa.array([n_correct], pa.int64()),
        "n_total": pa.array([total_n], pa.int64()),
        "acc_ppm": pa.array([n_correct * ACC_SCALE // total_n],
                            pa.int64()),
    })


def stump_fit_sql() -> str:
    return f"""
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS vq,
         count(*) AS n,
         sum(CASE WHEN event_type = '{POS_TYPE}' THEN 1 ELSE 0 END)
           AS np
  FROM events GROUP BY 1),
tot AS (SELECT sum(n) AS tn, sum(np) AS tp FROM h),
c AS (SELECT vq, sum(n) OVER (ORDER BY vq) AS cn,
             sum(np) OVER (ORDER BY vq) AS cp FROM h),
cand AS (
  SELECT vq, 0 AS predict_above,
         cp + ((SELECT tn FROM tot) - (SELECT tp FROM tot))
            - (cn - cp) AS n_correct
  FROM c
  UNION ALL
  SELECT vq, 1, ((SELECT tp FROM tot) - cp) + (cn - cp) FROM c)
SELECT vq AS threshold_cents,
       CAST(predict_above AS BIGINT) AS predict_above,
       CAST(n_correct AS BIGINT) AS n_correct,
       CAST((SELECT tn FROM tot) AS BIGINT) AS n_total,
       CAST(n_correct * {ACC_SCALE} // (SELECT tn FROM tot) AS BIGINT)
         AS acc_ppm
FROM cand
ORDER BY n_correct DESC, vq, predict_above
LIMIT 1"""
