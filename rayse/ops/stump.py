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


# ---------------------------------------------------------------------------
# Depth-2 decision tree — greedy CART over the two event features
# (value cents, hour-of-day): the root is the best stump across BOTH
# features, each leaf then refits the best stump on its own subset.
# Everything runs off ONE domain-bounded JOINT histogram
# (cents × 24 hours): per-batch partials -> one groupby -> three
# driver-side cumulative scans (root, left leaf, right leaf) — so the
# scan state is domain-bounded however many rows feed it, and the
# "recursive partitioning" never re-reads data (the leaf histograms are
# filters of the joint table — the textbook histogram-based tree
# trainer, XGBoost's hist mode at depth 2).
#
# INTEGER-EXACT tie-breaks: candidate key = (n_correct DESC, feature
# ASC, threshold ASC, predict_above ASC); accuracy in truncating ppm.
# The SQL oracle mirrors the greedy literally: root best via the same
# window-cumulative candidate table, leaf scans filtered by the chosen
# root split through scalar subqueries on the root CTE.
# ---------------------------------------------------------------------------


def _tree_scan(fv0, fv1, n, npos):
    """Best stump across feature 0 (rows keyed fv0) and feature 1
    (fv1), given per-(fv0, fv1) counts. Returns (corr, f, thr, pa,
    n_node, n_pos_node) or None for an empty subset."""
    if n.size == 0 or int(n.sum()) == 0:
        return None
    best = None
    for f, fv in ((0, fv0), (1, fv1)):
        uf, inv = np.unique(fv, return_inverse=True)
        mn = np.bincount(inv, n, uf.size).astype(np.int64)
        mp = np.bincount(inv, npos, uf.size).astype(np.int64)
        cn, cp = np.cumsum(mn), np.cumsum(mp)
        tn, tp = int(cn[-1]), int(cp[-1])
        corr_above = (tp - cp) + (cn - cp)
        corr_below = cp + (tn - tp) - (cn - cp)
        for pa_, corr in ((0, corr_below), (1, corr_above)):
            for i in range(uf.size):
                key = (-int(corr[i]), f, int(uf[i]), pa_)
                if best is None or key < best:
                    best = key
    tn, tp = int(n.sum()), int(npos.sum())
    return (-best[0], best[1], best[2], best[3], tn, tp)


def tree_depth2(sf_dir: str) -> pa.Table:
    """(node, feature, threshold, predict_above, n_correct, n_node,
    acc_ppm): greedy depth-2 tree on (value cents, hour) predicting
    event_type == 'purchase' — DuckDB hash-matched. Rows: 'root' (the
    root stump), 'left'/'right' (leaf stumps; absent if the leaf is
    empty), 'tree' (feature/threshold/predict_above = -1; total leaf
    accuracy)."""
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        vq = _cents(batch["value"].to_numpy(zero_copy_only=False))
        hr = ((batch["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").view("int64")
               // 3_600_000_000) % 24).astype(np.int64)
        pos = (np.asarray(batch["event_type"].to_pylist(),
                          dtype=object) == POS_TYPE)
        key = vq * 32 + hr
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(uk, pa.int64()),
            "n": pa.array(np.bincount(inv, None, uk.size)
                          .astype(np.int64), pa.int64()),
            "np": pa.array(np.bincount(inv, pos.astype(np.float64),
                                       uk.size).astype(np.int64),
                           pa.int64()),
        })

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("key").sum(["n", "np"]).take_all())
    key = np.asarray([r["key"] for r in rows], np.int64)
    n = np.asarray([r["sum(n)"] for r in rows], np.int64)
    npos = np.asarray([r["sum(np)"] for r in rows], np.int64)
    vq, hr = key // 32, key % 32

    out = []
    root = _tree_scan(vq, hr, n, npos)
    corr_r, f_r, t_r, pa_r, n_tot, _ = root
    out.append(("root", f_r, t_r, pa_r, corr_r, n_tot))
    split_fv = vq if f_r == 0 else hr
    total = 0
    for side, mask in (("left", split_fv <= t_r),
                       ("right", split_fv > t_r)):
        leaf = _tree_scan(vq[mask], hr[mask], n[mask], npos[mask])
        if leaf is None:
            continue
        corr, f, t, pa_, n_node, _ = leaf
        out.append((side, f, t, pa_, corr, n_node))
        total += corr
    out.append(("tree", -1, -1, -1, total, n_tot))
    return pa.table({
        "node": pa.array([o[0] for o in out], pa.string()),
        "feature": pa.array([o[1] for o in out], pa.int64()),
        "threshold": pa.array([o[2] for o in out], pa.int64()),
        "predict_above": pa.array([o[3] for o in out], pa.int64()),
        "n_correct": pa.array([o[4] for o in out], pa.int64()),
        "n_node": pa.array([o[5] for o in out], pa.int64()),
        "acc_ppm": pa.array([o[4] * ACC_SCALE // max(o[5], 1)
                             for o in out], pa.int64()),
    })


def _tree_scan_sql(name: str, where: str) -> str:
    """Candidate-scan CTE chain over the joint histogram ``h`` filtered
    by ``where``; ``{name}_best`` = (f, thr, pa, corr, nn)."""
    return f"""
{name}_m AS (
  SELECT f, fv, sum(n) AS n, sum(np) AS np FROM (
    SELECT 0 AS f, vq AS fv, n, np FROM h {where}
    UNION ALL
    SELECT 1 AS f, hour AS fv, n, np FROM h {where})
  GROUP BY 1, 2),
{name}_c AS (
  SELECT f, fv,
         sum(n) OVER (PARTITION BY f ORDER BY fv) AS cn,
         sum(np) OVER (PARTITION BY f ORDER BY fv) AS cp,
         sum(n) OVER (PARTITION BY f) AS tn,
         sum(np) OVER (PARTITION BY f) AS tp
  FROM {name}_m),
{name}_cand AS (
  SELECT f, fv AS thr, 0 AS pa, cp + (tn - tp) - (cn - cp) AS corr,
         tn FROM {name}_c
  UNION ALL
  SELECT f, fv, 1, (tp - cp) + (cn - cp), tn FROM {name}_c),
{name}_best AS (
  SELECT f, thr, pa, corr, tn FROM (
    SELECT f, thr, pa, corr, tn,
           row_number() OVER (ORDER BY corr DESC, f, thr, pa) AS rn
    FROM {name}_cand) WHERE rn = 1)"""


def tree_depth2_sql() -> str:
    left_w = ("WHERE (CASE WHEN (SELECT f FROM root_best) = 0 "
              "THEN vq ELSE hour END) <= (SELECT thr FROM root_best)")
    right_w = ("WHERE (CASE WHEN (SELECT f FROM root_best) = 0 "
               "THEN vq ELSE hour END) > (SELECT thr FROM root_best)")
    return f"""
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS vq,
         (epoch_us(ts) // 3600000000) % 24 AS hour,
         count(*) AS n,
         sum(CASE WHEN event_type = '{POS_TYPE}' THEN 1 ELSE 0 END)
           AS np
  FROM events GROUP BY 1, 2),{_tree_scan_sql("root", "")},{
    _tree_scan_sql("l", left_w)},{_tree_scan_sql("r", right_w)},
nodes AS (
  SELECT 'root' AS node, f, thr, pa, corr, tn FROM root_best
  UNION ALL SELECT 'left', f, thr, pa, corr, tn FROM l_best
  UNION ALL SELECT 'right', f, thr, pa, corr, tn FROM r_best
  UNION ALL
  SELECT 'tree', -1, -1, -1,
         (SELECT coalesce(sum(corr), 0) FROM (
            SELECT corr FROM l_best
            UNION ALL SELECT corr FROM r_best)),
         (SELECT tn FROM root_best))
SELECT node, CAST(f AS BIGINT) AS feature,
       CAST(thr AS BIGINT) AS threshold,
       CAST(pa AS BIGINT) AS predict_above,
       CAST(corr AS BIGINT) AS n_correct,
       CAST(tn AS BIGINT) AS n_node,
       CAST(corr * {ACC_SCALE} // greatest(tn, 1) AS BIGINT)
         AS acc_ppm
FROM nodes ORDER BY node"""
