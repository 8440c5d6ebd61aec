"""Isotonic regression of mean event value over hour-of-day — the
monotone-fit primitive (PAVA; the calibration step of probabilistic
classifiers, Zadrozny & Elkan 2002, and the shape-constrained sibling
of `theil_sen`'s linear trend).

Exactness without PAVA's sequential pooling: the isotonic (L2,
non-decreasing) fit has the CLOSED max-min form

    fit(i) = max_{j<=i} min_{k>=i} avg(y[j..k])

and because floor is non-decreasing it COMMUTES with max and min, so
quantizing every interval average first gives exactly the quantized
fit: max-min over floor(1e6·sum/cnt) == floor(1e6·fit). That turns an
inherently sequential algorithm into a closed form both numpy and SQL
evaluate independently — the same algorithm-equivalence flavor as the
Borůvka/Prim pin, with O(H³)=13.8k cells at H=24 (grid-sized).

Distributed shape: ONE bounded (hour, Σcents, n) fold; the closed
form runs on the 24-point grid driver-side. DuckDB hash-matched.

Reference relationship: none (statistics-family completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ISO_SCALE = 1_000_000


def isotonic_hourly(sf_dir: str) -> pa.Table:
    """(hour, n, mean_q, fit_q): per-hour quantized mean value and its
    non-decreasing isotonic fit — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hr = ((batch["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").view("int64")
               // 3_600_000_000) % 24).astype(np.int64)
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        uk, inv = np.unique(hr, return_inverse=True)
        return pa.table({
            "hr": pa.array(uk, pa.int64()),
            "s": pa.array(np.bincount(inv, cents, uk.size)
                          .astype(np.int64), pa.int64()),
            "n": pa.array(np.bincount(inv, None, uk.size)
                          .astype(np.int64), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("hr").sum(["s", "n"]))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    hr = tbl["hr"].to_numpy(zero_copy_only=False)
    s = tbl["sum(s)"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = tbl["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(hr, kind="stable")
    hr, s, n = hr[o], s[o], n[o]
    H = hr.size

    ps = np.concatenate(([0], np.cumsum(s)))
    pn = np.concatenate(([0], np.cumsum(n)))
    # avg_q[j, k] = floor(1e6 * sum[j..k] / cnt[j..k]), 0-based incl.
    j = np.arange(H)[:, None]
    kk = np.arange(H)[None, :]
    seg_s = ps[kk + 1] - ps[j]
    seg_n = pn[kk + 1] - pn[j]
    valid = kk >= j
    avg_q = np.where(valid,
                     ISO_SCALE * seg_s // np.where(valid, seg_n, 1),
                     0)
    big = np.iinfo(np.int64).max
    # min over k >= i (suffix min along k for each j), then max over
    # j <= i
    suf_min = np.where(valid, avg_q, big)[:, ::-1]
    suf_min = np.minimum.accumulate(suf_min, axis=1)[:, ::-1]
    fit = np.empty(H, np.int64)
    for i in range(H):
        fit[i] = suf_min[:i + 1, i].max()
    return pa.table({
        "hour": pa.array(hr, pa.int64()),
        "n": pa.array(n, pa.int64()),
        "mean_q": pa.array(ISO_SCALE * s // n, pa.int64()),
        "fit_q": pa.array(fit, pa.int64()),
    })


def isotonic_hourly_sql() -> str:
    return f"""
WITH g AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hr,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
hrs AS (SELECT hr FROM g),
seg AS (
  SELECT j.hr AS j, k.hr AS k,
         CAST({ISO_SCALE} * (SELECT sum(s) FROM g
                             WHERE hr BETWEEN j.hr AND k.hr)
              // (SELECT sum(n) FROM g
                  WHERE hr BETWEEN j.hr AND k.hr) AS BIGINT) AS aq
  FROM hrs j JOIN hrs k ON k.hr >= j.hr),
inner_min AS (
  SELECT i.hr AS i, s.j, min(s.aq) AS mn
  FROM hrs i JOIN seg s ON s.j <= i.hr AND s.k >= i.hr
  GROUP BY 1, 2),
fit AS (SELECT i, max(mn) AS fit_q FROM inner_min GROUP BY i)
SELECT g.hr AS hour, g.n,
       CAST({ISO_SCALE} * g.s // g.n AS BIGINT) AS mean_q,
       f.fit_q
FROM g JOIN fit f ON f.i = g.hr
ORDER BY hour"""
