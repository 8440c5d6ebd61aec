"""Rank statistics over the events log — Spearman rho, Kendall tau-b,
and the Kruskal-Wallis H test, all EXACT on cents-quantized values.

The three classical rank procedures share one distributed shape: a
per-batch partial joint histogram ((cents, hour) or (type, cents))
-> ONE groupby fold -> a bounded driver finalize (the same
bounded-histogram contract as `rayse/ops/kstest.py` /
`rayse/ops/quantiles.py` — the cents domain, the 24-hour domain and
the event-type domain are all bounded, so the joint table is
histogram-sized, never row-sized).

Tie handling is the textbook average-rank / tau-b / tie-corrected-H
treatment, evaluated in INTEGER arithmetic: average ranks are carried
doubled (R2 = 2*cum_below + cnt + 1 is always integral), pair counts
as Python bigints, and the final statistic leaves integers only at the
last division — so the quantities the SQL oracle reproduces with
window functions hash-match to float precision.

Reference relationship: none; these pin the monitoring/EDA rank-test
machinery alongside KS/MWU (`kstest.py`) and the correlation family
(`corr.py`).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa


def _value_hour_hist_batch(batch: pa.Table) -> pa.Table:
    x = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                 * 100.0).astype(np.int64)
    ts = batch["ts"].to_numpy(zero_copy_only=False)
    h = (ts.astype("datetime64[h]").astype(np.int64) % 24).astype(
        np.int64)
    key = x * 24 + h
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table({
        "x": pa.array(uk // 24, pa.int64()),
        "h": pa.array(uk % 24, pa.int64()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def _joint_value_hour(sf_dir: str):
    """(x, h, cnt) joint histogram, x ascending on the driver."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    agg = (ds.map_batches(_value_hour_hist_batch,
                          batch_format="pyarrow")
           .groupby(["x", "h"]).sum("cnt"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    x = tbl["x"].to_numpy(zero_copy_only=False)
    h = tbl["h"].to_numpy(zero_copy_only=False)
    c = tbl["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.lexsort((h, x))
    return x[o], h[o], c[o]


def _avg_rank2(keys: np.ndarray, cnt: np.ndarray) -> np.ndarray:
    """Doubled average ranks per distinct sorted key: 2*below + cnt + 1
    (always integral, so ties stay exact)."""
    cum = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    return 2 * cum + cnt + 1


def spearman_value_hour(sf_dir: str) -> pa.Table:
    """(n, rho): exact Spearman rank correlation (average-tie ranks)
    between cents-quantized value and hour-of-day — DuckDB
    hash-matched against the window-rank corr() oracle."""
    x, h, c = _joint_value_hour(sf_dir)
    ux, xi = np.unique(x, return_inverse=True)
    xc = np.bincount(xi, c, ux.size).astype(np.int64)
    uh, hi = np.unique(h, return_inverse=True)
    hc = np.bincount(hi, c, uh.size).astype(np.int64)
    r2x = _avg_rank2(ux, xc)[xi]
    r2h = _avg_rank2(uh, hc)[hi]
    n = int(c.sum())
    w = [int(v) for v in c]
    rx = [int(v) for v in r2x]
    rh = [int(v) for v in r2h]
    s1 = sum(wi * a for wi, a in zip(w, rx))
    s2 = sum(wi * b for wi, b in zip(w, rh))
    s11 = sum(wi * a * a for wi, a in zip(w, rx))
    s22 = sum(wi * b * b for wi, b in zip(w, rh))
    s12 = sum(wi * a * b for wi, a, b in zip(w, rx, rh))
    num = n * s12 - s1 * s2
    den2 = (n * s11 - s1 * s1) * (n * s22 - s2 * s2)
    rho = float(num) / float(den2) ** 0.5 if den2 > 0 else 0.0
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "rho": pa.array([rho], pa.float64()),
    })


def spearman_value_hour_sql() -> str:
    return """
WITH q AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS x,
         CAST(hour(ts) AS BIGINT) AS h
  FROM events),
r AS (
  SELECT rank() OVER (ORDER BY x)
           + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
         rank() OVER (ORDER BY h)
           + (count(*) OVER (PARTITION BY h) - 1) / 2.0 AS rh
  FROM q)
SELECT CAST(count(*) AS BIGINT) AS n, corr(rx, rh) AS rho FROM r"""


def kendall_value_hour(sf_dir: str) -> pa.Table:
    """(n, concordant, discordant, tau_b): exact Kendall tau-b between
    cents-quantized value and hour-of-day. Concordant/discordant pair
    counts run over the joint histogram with a per-hour cumulative
    sweep (distinct-cents x 24 work, zero row-pairs) — DuckDB
    hash-matched against the cell-pair inequality-join oracle."""
    x, h, c = _joint_value_hour(sf_dir)
    n = int(c.sum())
    conc = 0
    disc = 0
    cum = [0] * 24  # per-hour counts over values strictly below
    i = 0
    m = x.size
    while i < m:
        j = i
        xv = x[i]
        # pairs against strictly-smaller values
        pre = np.concatenate(([0], np.cumsum(cum)))
        tot_below = pre[-1]
        while j < m and x[j] == xv:
            hv = int(h[j])
            cv = int(c[j])
            conc += cv * int(pre[hv])
            disc += cv * int(tot_below - pre[hv + 1])
            j += 1
        for t in range(i, j):
            cum[int(h[t])] += int(c[t])
        i = j
    ux, xi = np.unique(x, return_inverse=True)
    xc = np.bincount(xi, c, ux.size).astype(np.int64)
    uh, hi = np.unique(h, return_inverse=True)
    hc = np.bincount(hi, c, uh.size).astype(np.int64)
    n0 = n * (n - 1) // 2
    n1 = sum(int(t) * (int(t) - 1) // 2 for t in xc)
    n2 = sum(int(t) * (int(t) - 1) // 2 for t in hc)
    den2 = (n0 - n1) * (n0 - n2)
    tau = float(conc - disc) / float(den2) ** 0.5 if den2 > 0 else 0.0
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "concordant": pa.array([conc], pa.int64()),
        "discordant": pa.array([disc], pa.int64()),
        "tau_b": pa.array([tau], pa.float64()),
    })


def kendall_value_hour_sql() -> str:
    return """
WITH q AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS x,
         CAST(hour(ts) AS BIGINT) AS h
  FROM events),
cells AS (SELECT x, h, CAST(count(*) AS BIGINT) AS c
          FROM q GROUP BY x, h),
pairs AS (
  SELECT CAST(sum(CASE WHEN a.h > b.h THEN a.c * b.c ELSE 0 END)
              AS BIGINT) AS conc,
         CAST(sum(CASE WHEN a.h < b.h THEN a.c * b.c ELSE 0 END)
              AS BIGINT) AS disc
  FROM cells a JOIN cells b ON a.x > b.x),
ties AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM q) AS n,
         (SELECT CAST(sum(t * (t - 1) / 2) AS BIGINT) FROM
            (SELECT CAST(count(*) AS BIGINT) AS t
             FROM q GROUP BY x)) AS n1,
         (SELECT CAST(sum(t * (t - 1) / 2) AS BIGINT) FROM
            (SELECT CAST(count(*) AS BIGINT) AS t
             FROM q GROUP BY h)) AS n2)
SELECT n, conc AS concordant, disc AS discordant,
       CAST(conc - disc AS DOUBLE)
         / sqrt(CAST(n * (n - 1) / 2 - n1 AS DOUBLE)
                * CAST(n * (n - 1) / 2 - n2 AS DOUBLE)) AS tau_b
FROM ties, pairs"""


def _type_value_hist_batch(batch: pa.Table) -> pa.Table:
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


def kruskal_wallis_types(sf_dir: str) -> pa.Table:
    """(k, n, h, h_corrected): exact Kruskal-Wallis H across event
    types on cents-quantized values, with the tie-corrected variant
    H' = H / (1 - sum(t^3 - t)/(n^3 - n)). Rank sums come off the
    pooled (type, cents) histogram in doubled-integer ranks; the final
    two divisions run through Fraction so the emitted doubles are the
    correctly-rounded exact values — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    agg = (ds.map_batches(_type_value_hist_batch,
                          batch_format="pyarrow")
           .groupby(["event_type", "x"]).sum("cnt"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    g = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    x = tbl["x"].to_numpy(zero_copy_only=False)
    c = tbl["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)

    ux, xi = np.unique(x, return_inverse=True)
    xc = np.bincount(xi, c, ux.size).astype(np.int64)
    r2 = _avg_rank2(ux, xc)[xi]  # doubled pooled avg rank per cell
    ug, gi = np.unique(g, return_inverse=True)
    n = int(c.sum())
    k = int(ug.size)
    # doubled rank sum and size per group, exact
    s2 = [0] * k
    nj = [0] * k
    for idx in range(len(c)):
        s2[gi[idx]] += int(c[idx]) * int(r2[idx])
        nj[gi[idx]] += int(c[idx])
    # H = 12/(n(n+1)) * sum((s2/2)^2 / nj) - 3(n+1)
    #   = 3/(n(n+1)) * sum(s2^2/nj) - 3(n+1)
    ssum = sum(Fraction(s * s, m) for s, m in zip(s2, nj))
    hstat = Fraction(3, n * (n + 1)) * ssum - 3 * (n + 1)
    tie = sum(int(t) ** 3 - int(t) for t in xc)
    corr = 1 - Fraction(tie, n ** 3 - n)
    hcorr = hstat / corr if corr != 0 else Fraction(0)
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n": pa.array([n], pa.int64()),
        "h": pa.array([float(hstat)], pa.float64()),
        "h_corrected": pa.array([float(hcorr)], pa.float64()),
    })


def kruskal_wallis_types_sql() -> str:
    return """
WITH q AS (
  SELECT event_type AS g,
         CAST(floor(value * 100) AS BIGINT) AS x
  FROM events),
r AS (
  SELECT g, rank() OVER (ORDER BY x)
              + (count(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx
  FROM q),
gs AS (SELECT g, sum(rx) AS s, CAST(count(*) AS BIGINT) AS nj
       FROM r GROUP BY g),
ties AS (SELECT CAST(count(*) AS BIGINT) AS t FROM q GROUP BY x),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
hval AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM gs) AS k,
         n,
         12.0 / (CAST(n AS DOUBLE) * (n + 1))
           * (SELECT sum(s * s / nj) FROM gs) - 3 * (n + 1.0) AS h,
         1.0 - (SELECT sum(CAST(t AS DOUBLE) * t * t - t) FROM ties)
             / (CAST(n AS DOUBLE) * n * n - n) AS tc
  FROM tot)
SELECT k, n, h, h / tc AS h_corrected FROM hval"""


def mode_value_per_type(sf_dir: str) -> pa.Table:
    """(event_type, mode_cents, n_mode): the most frequent
    cents-quantized value per event type, ties to the smallest cents —
    straight off the bounded (type, cents) histogram fold, DuckDB
    hash-matched against the row_number() oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    agg = (ds.map_batches(_type_value_hist_batch,
                          batch_format="pyarrow")
           .groupby(["event_type", "x"]).sum("cnt"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    g = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    x = tbl["x"].to_numpy(zero_copy_only=False)
    c = tbl["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((x, -c, g.astype(str)))
    gs = g[order]
    firsts = np.concatenate(
        ([True], gs[1:] != gs[:-1]))
    pick = order[firsts]
    o2 = np.argsort(g[pick].astype(str), kind="stable")
    pick = pick[o2]
    return pa.table({
        "event_type": pa.array(g[pick].tolist(), pa.string()),
        "mode_cents": pa.array(x[pick], pa.int64()),
        "n_mode": pa.array(c[pick], pa.int64()),
    })


def mode_value_per_type_sql() -> str:
    return """
WITH h AS (
  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, x),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY c DESC, x) AS rn
  FROM h)
SELECT event_type, x AS mode_cents, c AS n_mode
FROM r WHERE rn = 1 ORDER BY event_type"""


def mutual_information_type_hour(sf_dir: str) -> pa.Table:
    """(n, mi_nats, nmi): mutual information between event_type and
    hour-of-day off ONE bounded joint-histogram fold — exact integer
    counts, the log-sum in float64 (DuckDB-matched within rtol), plus
    the min-marginal-entropy-normalized variant."""
    import math

    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def hist(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view("int64")
        h = (ts // 3_600_000_000) % 24
        key = np.char.add(np.char.add(et.astype(str), "\x00"),
                          h.astype(str))
        uk, inv, cnt = np.unique(key, return_inverse=True,
                                 return_counts=True)
        first = np.full(uk.size, -1, np.int64)
        first[inv[::-1]] = np.arange(len(key) - 1, -1, -1)
        return pa.table({
            "event_type": pa.array(et[first].tolist(), pa.string()),
            "h": pa.array(h[first], pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = (ds.map_batches(hist, batch_format="pyarrow")
           .groupby(["event_type", "h"]).sum("cnt"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    g = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    h = tbl["h"].to_numpy(zero_copy_only=False)
    c = tbl["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(c.sum())
    ug, gi = np.unique(g, return_inverse=True)
    uh, hi = np.unique(h, return_inverse=True)
    cg = np.bincount(gi, c, ug.size)
    ch = np.bincount(hi, c, uh.size)
    mi = 0.0
    for cc, a, b in zip(c, cg[gi], ch[hi]):
        mi += (cc / n) * math.log(cc * n / (a * b))
    hg = -sum((a / n) * math.log(a / n) for a in cg)
    hh = -sum((b / n) * math.log(b / n) for b in ch)
    nmi = mi / min(hg, hh) if min(hg, hh) > 0 else 0.0
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "mi_nats": pa.array([mi], pa.float64()),
        "nmi": pa.array([nmi], pa.float64()),
    })


def mutual_information_sql() -> str:
    return """
WITH q AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS h
  FROM events),
j AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS c
      FROM q GROUP BY event_type, h),
mg AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS a
       FROM j GROUP BY event_type),
mh AS (SELECT h, CAST(sum(c) AS BIGINT) AS b FROM j GROUP BY h),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
mi AS (
  SELECT sum((CAST(j.c AS DOUBLE) / n)
             * ln(CAST(j.c AS DOUBLE) * n / (a * CAST(b AS DOUBLE))))
           AS mi_nats
  FROM j JOIN mg USING (event_type) JOIN mh USING (h), tot),
ents AS (
  SELECT (SELECT -sum((CAST(a AS DOUBLE) / n)
                      * ln(CAST(a AS DOUBLE) / n))
          FROM mg, tot) AS hg,
         (SELECT -sum((CAST(b AS DOUBLE) / n)
                      * ln(CAST(b AS DOUBLE) / n))
          FROM mh, tot) AS hh)
SELECT (SELECT n FROM tot) AS n, mi_nats,
       mi_nats / least(hg, hh) AS nmi
FROM mi, ents"""
