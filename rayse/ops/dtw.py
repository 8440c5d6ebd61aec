"""Dynamic-time-warping distance between per-type hourly activity
profiles — the elastic-alignment sibling of the lag cross-correlation
cell (`corr.xcorr_hourly`): DTW tolerates phase shifts and local
tempo changes that a fixed-lag dot product cannot.

Scale shape: 100 TB of events folds to the bounded (type, hour-of-day)
count grid — per-batch `np.unique`/bincount partials, one
grid-bounded groupby — and the DP itself runs driver-side on
types × 24 integers (the `bursts.py` dense-grid contract: the DP input
is grid-sized, never row-sized). Costs are |a−b| int64; the DP is the
classic Sakoe-Chiba unconstrained recurrence, all integers, so the
SQL mirror is bit-exact.

Oracle: a recursive-CTE WAVEFRONT — iteration t computes every
anti-diagonal-(t) cell for every type pair from the carried frontier
(diag t−1) and halo (diag t−2) rows, the first recursive-DP oracle in
the repo to need a two-deep dependency (pagerank/bellman-ford carry
one frontier; DTW's diagonal move needs the previous-but-one too, so
each iteration re-emits its frontier as the next halo).

Reference relationship: none (beyond-reference time-series analytics;
the profile grid matches `corr.py`'s).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HOUR_US = 3_600_000_000


def _hour_grid(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted type names, dense (n_types, 24) int64 count grid) via
    distributed partial-combine."""
    import ray
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        hr = ((batch["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").view("int64") // HOUR_US)
              % 24)
        key = np.char.add(np.char.add(et.astype(str), "|"),
                          hr.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(uk.tolist(), pa.string()),
            "c": pa.array(np.bincount(inv, None, uk.size)
                          .astype(np.int64), pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("key").sum("c"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    keys = tbl["key"].to_pylist()
    cnt = tbl["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    types = sorted({k.split("|")[0] for k in keys})
    tix = {t: i for i, t in enumerate(types)}
    grid = np.zeros((len(types), 24), np.int64)
    for kk, cc in zip(keys, cnt):
        t, h = kk.split("|")
        grid[tix[t], int(h)] = cc
    return np.asarray(types, dtype=object), grid


def _dtw(a: np.ndarray, b: np.ndarray) -> int:
    """Unconstrained integer DTW on two 24-vectors."""
    n, m = a.size, b.size
    cost = np.abs(a[:, None] - b[None, :]).astype(np.int64)
    dp = np.empty((n, m), np.int64)
    dp[0, 0] = cost[0, 0]
    for j in range(1, m):
        dp[0, j] = cost[0, j] + dp[0, j - 1]
    for i in range(1, n):
        dp[i, 0] = cost[i, 0] + dp[i - 1, 0]
        for j in range(1, m):
            dp[i, j] = cost[i, j] + min(dp[i - 1, j], dp[i, j - 1],
                                        dp[i - 1, j - 1])
    return int(dp[n - 1, m - 1])


def dtw_profiles(sf_dir: str) -> pa.Table:
    """(type_a, type_b, dtw): integer DTW distance between the hourly
    profiles of every unordered type pair — DuckDB hash-matched against
    the recursive wavefront oracle."""
    types, grid = _hour_grid(sf_dir)
    out_a, out_b, out_d = [], [], []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            out_a.append(str(types[i]))
            out_b.append(str(types[j]))
            out_d.append(_dtw(grid[i], grid[j]))
    return pa.table({
        "type_a": pa.array(out_a, pa.string()),
        "type_b": pa.array(out_b, pa.string()),
        "dtw": pa.array(out_d, pa.int64()),
    })


def dtw_profiles_sql() -> str:
    return """
WITH RECURSIVE
h AS (
  SELECT event_type AS t, CAST(hour(ts) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
types AS (SELECT DISTINCT event_type AS t FROM events),
grid AS (
  SELECT ty.t, CAST(g.hr AS BIGINT) AS hr, coalesce(h.c, 0) AS c
  FROM types ty
       CROSS JOIN (SELECT unnest(range(24)) AS hr) g
       LEFT JOIN h ON h.t = ty.t AND h.hr = g.hr),
pairs AS (
  SELECT a.t AS ta, b.t AS tb FROM types a JOIN types b ON a.t < b.t),
cost AS (
  SELECT p.ta, p.tb, ga.hr AS i, gb.hr AS j, abs(ga.c - gb.c) AS cost
  FROM pairs p JOIN grid ga ON ga.t = p.ta
       JOIN grid gb ON gb.t = p.tb),
dp(ta, tb, i, j, val, step) AS (
  SELECT ta, tb, i, j, cost AS val, CAST(0 AS BIGINT) AS step
  FROM cost WHERE i = 0 AND j = 0
  UNION ALL
  SELECT * FROM (
    -- wavefront: every diag-(step+1) cell from its <=3 predecessors
    SELECT c.ta, c.tb, c.i, c.j,
           c.cost + min(p.val) AS val, p.step + 1 AS step
    FROM cost c JOIN dp p
      ON p.ta = c.ta AND p.tb = c.tb
     AND c.i + c.j = p.step + 1
     AND ((p.i = c.i - 1 AND p.j = c.j)
          OR (p.i = c.i AND p.j = c.j - 1)
          OR (p.i = c.i - 1 AND p.j = c.j - 1))
    GROUP BY c.ta, c.tb, c.i, c.j, c.cost, p.step
    UNION ALL
    -- halo: re-emit the frontier for the next diagonal's (i-1,j-1)
    SELECT p.ta, p.tb, p.i, p.j, p.val, p.step + 1 AS step
    FROM dp p
    WHERE p.i + p.j = p.step AND p.step + 1 <= 46))
SELECT ta AS type_a, tb AS type_b, CAST(min(val) AS BIGINT) AS dtw
FROM dp WHERE i = 23 AND j = 23
GROUP BY 1, 2
ORDER BY 1, 2"""
