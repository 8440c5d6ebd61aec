"""Two-sample Kolmogorov-Smirnov distances between event-type value
distributions — the distribution-drift test of the monitoring family
(the two-sample sibling of `classify.source_kl`).

For every ordered pair of event types, the KS statistic over the
cents-quantized value distributions:

    D = max over the merged support of |F_a(x) - F_b(x)|

evaluated EXACTLY in integers by cross-multiplying the empirical CDFs:
``D_num = max |cum_a(x) * n_b - cum_b(x) * n_a|`` and
``ks_ppm = D_num * 10^6 // (n_a * n_b)`` — no floats anywhere.

Distributed shape: ONE histogram fold (per-batch (type, cents) partial
counts -> one groupby; the cents domain is bounded, the same
bounded-histogram contract as `rayse/ops/quantiles.py`); the per-pair
merged-support scan runs on the types x distinct-cents driver table
(documented bound), vectorized with searchsorted + cumsum per pair
over a types^2-sized pair list.

Reference relationship: none; pins the exact-CDF cross-multiply
machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KS_SCALE = 1_000_000


def _cents_hist_batch(batch: pa.Table) -> pa.Table:
    et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    x = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                 * 100.0).astype(np.int64)
    key = np.char.add(np.char.add(et.astype(str), "\x1f"),
                      x.astype(str))
    uk, inv, cnt = np.unique(key, return_inverse=True,
                             return_counts=True)
    first = np.full(uk.size, -1, np.int64)
    first[inv[::-1]] = np.arange(len(key) - 1, -1, -1)
    return pa.table({
        "event_type": pa.array(et[first].tolist(), pa.string()),
        "x": pa.array(x[first], pa.int64()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def ks_pairs(sf_dir: str) -> pa.Table:
    """(type_a, type_b, n_a, n_b, ks_ppm): exact two-sample KS distance
    for every ordered event-type pair over cents-quantized values —
    DuckDB hash-matched against the window-CDF oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    agg = (ds.map_batches(_cents_hist_batch, batch_format="pyarrow")
           .groupby(["event_type", "x"]).sum("cnt"))
    rows = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    et = np.asarray(rows["event_type"].to_pylist(), dtype=object)
    xs = rows["x"].to_numpy(zero_copy_only=False)
    cnt = rows["sum(cnt)"].to_numpy(zero_copy_only=False)

    types = sorted(set(et.tolist()))
    per: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in types:
        m = et == t
        o = np.argsort(xs[m], kind="stable")
        per[t] = (xs[m][o], cnt[m][o])

    out_a, out_b, out_na, out_nb, out_k = [], [], [], [], []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            xa, ca = per[a]
            xb, cb = per[b]
            n_a, n_b = int(ca.sum()), int(cb.sum())
            sup = np.union1d(xa, xb)
            cum_a = np.r_[0, np.cumsum(ca)][
                np.searchsorted(xa, sup, side="right")]
            cum_b = np.r_[0, np.cumsum(cb)][
                np.searchsorted(xb, sup, side="right")]
            d = np.abs(cum_a.astype(object) * n_b
                       - cum_b.astype(object) * n_a)
            d_num = int(max(d))
            out_a.append(a)
            out_b.append(b)
            out_na.append(n_a)
            out_nb.append(n_b)
            out_k.append(d_num * KS_SCALE // (n_a * n_b))
    return pa.table({
        "type_a": pa.array(out_a, pa.string()),
        "type_b": pa.array(out_b, pa.string()),
        "n_a": pa.array(out_na, pa.int64()),
        "n_b": pa.array(out_nb, pa.int64()),
        "ks_ppm": pa.array(out_k, pa.int64()),
    })


KS_PAIRS_SQL = f"""
WITH v AS (
  SELECT event_type AS t,
         CAST(floor(value * 100) AS BIGINT) AS x
  FROM events
),
c AS (SELECT t, x, count(*) AS c FROM v GROUP BY t, x),
n AS (SELECT t, count(*) AS n FROM v GROUP BY t),
tp AS (
  SELECT a.t AS ta, b.t AS tb
  FROM (SELECT DISTINCT t FROM v) a
  JOIN (SELECT DISTINCT t FROM v) b ON a.t < b.t
),
sup AS (
  SELECT DISTINCT tp.ta, tp.tb, c.x
  FROM tp JOIN c ON c.t = tp.ta OR c.t = tp.tb
),
cum AS (
  SELECT sup.ta, sup.tb, sup.x,
         sum(COALESCE(ca.c, 0)) OVER
           (PARTITION BY sup.ta, sup.tb ORDER BY sup.x) AS cum_a,
         sum(COALESCE(cb.c, 0)) OVER
           (PARTITION BY sup.ta, sup.tb ORDER BY sup.x) AS cum_b
  FROM sup
  LEFT JOIN c ca ON ca.t = sup.ta AND ca.x = sup.x
  LEFT JOIN c cb ON cb.t = sup.tb AND cb.x = sup.x
),
d AS (
  SELECT cum.ta, cum.tb,
         max(abs(CAST(cum_a AS HUGEINT) * nb.n
                 - CAST(cum_b AS HUGEINT) * na.n)) AS d_num,
         any_value(na.n) AS n_a, any_value(nb.n) AS n_b
  FROM cum
  JOIN n na ON na.t = cum.ta
  JOIN n nb ON nb.t = cum.tb
  GROUP BY cum.ta, cum.tb
)
SELECT ta AS type_a, tb AS type_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(d_num * {KS_SCALE} // (CAST(n_a AS HUGEINT) * n_b)
            AS BIGINT) AS ks_ppm
FROM d
ORDER BY type_a, type_b
"""


def mwu_pairs(sf_dir: str) -> pa.Table:
    """(type_a, type_b, u2, auc_ppm): exact Mann-Whitney U (doubled, so
    half-ties stay integral: u2 = sum_x c_a(x) * (2*cum_b(<x) + c_b(x)))
    and the AUC estimate ``auc_ppm = u2 * 10^6 // (2 * n_a * n_b)`` per
    event-type pair — same one-histogram fold as ``ks_pairs``; DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    agg = (ds.map_batches(_cents_hist_batch, batch_format="pyarrow")
           .groupby(["event_type", "x"]).sum("cnt"))
    rows = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    et = np.asarray(rows["event_type"].to_pylist(), dtype=object)
    xs = rows["x"].to_numpy(zero_copy_only=False)
    cnt = rows["sum(cnt)"].to_numpy(zero_copy_only=False)

    types = sorted(set(et.tolist()))
    per: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for t in types:
        m = et == t
        o = np.argsort(xs[m], kind="stable")
        per[t] = (xs[m][o], cnt[m][o])

    out_a, out_b, out_u, out_auc = [], [], [], []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            xa, ca = per[a]
            xb, cb = per[b]
            n_a, n_b = int(ca.sum()), int(cb.sum())
            cum_b_lt = np.r_[0, np.cumsum(cb)][
                np.searchsorted(xb, xa, side="left")]
            tie_b = np.zeros(xa.size, np.int64)
            j = np.searchsorted(xb, xa, side="left")
            hit = (j < xb.size) & (xb[np.minimum(j, xb.size - 1)] == xa)
            tie_b[hit] = cb[np.minimum(j, xb.size - 1)][hit]
            u2 = int((ca.astype(object)
                      * (2 * cum_b_lt.astype(object) + tie_b)).sum())
            out_a.append(a)
            out_b.append(b)
            out_u.append(u2)
            out_auc.append(u2 * 1_000_000 // (2 * n_a * n_b))
    return pa.table({
        "type_a": pa.array(out_a, pa.string()),
        "type_b": pa.array(out_b, pa.string()),
        "u2": pa.array(out_u, pa.int64()),
        "auc_ppm": pa.array(out_auc, pa.int64()),
    })


MWU_PAIRS_SQL = """
WITH v AS (
  SELECT event_type AS t,
         CAST(floor(value * 100) AS BIGINT) AS x
  FROM events
),
c AS (SELECT t, x, count(*) AS c FROM v GROUP BY t, x),
n AS (SELECT t, count(*) AS n FROM v GROUP BY t),
tp AS (
  SELECT a.t AS ta, b.t AS tb
  FROM (SELECT DISTINCT t FROM v) a
  JOIN (SELECT DISTINCT t FROM v) b ON a.t < b.t
),
u AS (
  SELECT tp.ta, tp.tb,
         sum(CAST(ca.c AS HUGEINT) *
             (2 * COALESCE((SELECT sum(cb.c) FROM c cb
                            WHERE cb.t = tp.tb AND cb.x < ca.x), 0)
              + COALESCE((SELECT cb.c FROM c cb
                          WHERE cb.t = tp.tb AND cb.x = ca.x), 0)))
           AS u2
  FROM tp JOIN c ca ON ca.t = tp.ta
  GROUP BY tp.ta, tp.tb
)
SELECT ta AS type_a, tb AS type_b, CAST(u2 AS BIGINT) AS u2,
       CAST(u2 * 1000000 // (2 * CAST(na.n AS HUGEINT) * nb.n)
            AS BIGINT) AS auc_ppm
FROM u JOIN n na ON na.t = u.ta JOIN n nb ON nb.t = u.tb
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# Population Stability Index drift report (the standard model-monitoring
# drift metric; see e.g. Siddiqi 2006): value-cents histograms of two
# row-local time slices (even vs odd epoch-day — no global pass needed
# to split), PSI term per bucket. Each block contributes one fixed
# 10x2 bincount partial; the fold is a bounded rollup. Per-bucket PSI
# quantizes to int64 BEFORE any cross-bucket sum, so downstream totals
# stay order-independent; zero shares clamp at PSI_EPS on both sides.
# ---------------------------------------------------------------------------

PSI_BUCKETS = 10
PSI_BUCKET_CENTS = 5000
PSI_EPS = 1e-6
PSI_SCALE = 1_000_000_000
_US_PER_DAY = 86_400_000_000


def psi_drift(sf_dir: str) -> pa.Table:
    """(bucket, n_a, n_b, psi_q): per-bucket PSI between the even-day
    and odd-day value distributions."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        c = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        b = np.minimum(c // PSI_BUCKET_CENTS, PSI_BUCKETS - 1)
        w = ((ts // _US_PER_DAY) % 2).astype(np.int64)
        return pa.table({
            "bucket": pa.array(np.arange(PSI_BUCKETS), pa.int64()),
            "n_a": pa.array(np.bincount(b[w == 0], None, PSI_BUCKETS)
                            .astype(np.int64)),
            "n_b": pa.array(np.bincount(b[w == 1], None, PSI_BUCKETS)
                            .astype(np.int64)),
        })

    parts = pa.concat_tables(
        ray.get(ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    bk = parts["bucket"].to_numpy(zero_copy_only=False)
    na = np.bincount(bk, parts["n_a"].to_numpy(zero_copy_only=False),
                     PSI_BUCKETS)
    nb = np.bincount(bk, parts["n_b"].to_numpy(zero_copy_only=False),
                     PSI_BUCKETS)
    ta, tb = float(na.sum()), float(nb.sum())
    p = np.maximum(na / ta, PSI_EPS)
    q = np.maximum(nb / tb, PSI_EPS)
    term = (p - q) * np.log(p / q)
    psi_q = (np.sign(term)
             * np.floor(np.abs(term) * PSI_SCALE + 0.5)).astype(np.int64)
    keep = (na + nb) > 0
    return pa.table({
        "bucket": pa.array(np.flatnonzero(keep), pa.int64()),
        "n_a": pa.array(na[keep].astype(np.int64), pa.int64()),
        "n_b": pa.array(nb[keep].astype(np.int64), pa.int64()),
        "psi_q": pa.array(psi_q[keep], pa.int64()),
    })


def psi_drift_sql() -> str:
    return f"""
WITH v AS (
  SELECT least(CAST(floor(value * 100.0) AS BIGINT)
               // {PSI_BUCKET_CENTS}, {PSI_BUCKETS - 1}) AS bucket,
         (epoch_us(ts) // {_US_PER_DAY}) % 2 AS w
  FROM events),
g AS (SELECT bucket,
             CAST(sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
      FROM v GROUP BY bucket),
t AS (SELECT CAST(sum(n_a) AS DOUBLE) AS ta,
             CAST(sum(n_b) AS DOUBLE) AS tb FROM g),
e AS (SELECT bucket, n_a, n_b,
             greatest(n_a / t.ta, {PSI_EPS!r}) AS p,
             greatest(n_b / t.tb, {PSI_EPS!r}) AS q
      FROM g CROSS JOIN t)
SELECT bucket, n_a, n_b,
       CAST(round((p - q) * ln(p / q) * {PSI_SCALE}) AS BIGINT) AS psi_q
FROM e WHERE n_a + n_b > 0 ORDER BY bucket"""
