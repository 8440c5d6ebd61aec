"""Weighted interval scheduling per user — the DP the unweighted
greedy cannot replace (activity_selection maximizes COUNT; with
per-interval value the earliest-end greedy is arbitrarily bad, and
the classic dp(i) = max(dp(i−1), wᵢ + dp(p(i))) over end-sorted
intervals is the exact answer). Intervals are the `activity.py`
value-derived ones; weight = cents.

The monotonicity trick that makes the oracle clean: dp is
non-decreasing in i, so dp(p(i)) = max{dp(j) : e_j ≤ s_i} — the
predecessor index never needs materializing, a correlated max over
the carried prefix suffices.

Ray side: one user-hash exchange, per-user end-sorted scan with a
searchsorted predecessor (group-bounded). Oracle: the LIS-style
lockstep recursion — iteration i computes every user's i-th dp from
the carried prefix rows.

Reference relationship: none (scheduling-DP family completion,
answering the question `activity.activity_selection` provably cannot).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .activity import ACT_BASE_S, ACT_MOD_S


def weighted_interval_schedule(sf_dir: str) -> pa.Table:
    """(user_id, n_events, best_value_cents) — DuckDB hash-matched."""
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view("int64"))
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        dur = (ACT_BASE_S + cents % ACT_MOD_S) * 1_000_000
        return pa.table({
            "user_id": batch["user_id"],
            "s": pa.array(ts, pa.int64()),
            "e": pa.array(ts + dur, pa.int64()),
            "event_id": batch["event_id"],
            "w": pa.array(cents, pa.int64()),
        })

    def per_user(group: pa.Table) -> pa.Table:
        s = group["s"].to_numpy(zero_copy_only=False)
        e = group["e"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        w = group["w"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, s, e))
        s, e, w = s[order], e[order], w[order]
        n = s.size
        dp = np.zeros(n + 1, np.int64)
        for i in range(1, n + 1):
            # predecessor: count of intervals ending at/before s_i
            p = int(np.searchsorted(e[:i - 1], s[i - 1], "right"))
            dp[i] = max(dp[i - 1], int(w[i - 1]) + dp[p])
        uid = group["user_id"][0].as_py()
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n_events": pa.array([n], pa.int64()),
            "best_value_cents": pa.array([int(dp[n])], pa.int64()),
        })

    out = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("user_id")
           .map_groups(per_user, batch_format="pyarrow"))
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def weighted_interval_schedule_sql() -> str:
    return f"""
WITH RECURSIVE
iv AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         epoch_us(ts) AS s,
         epoch_us(ts) + ({ACT_BASE_S}
           + CAST(round(value * 100) AS BIGINT) % {ACT_MOD_S})
           * 1000000 AS e,
         CAST(round(value * 100) AS BIGINT) AS w,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts)
                              + ({ACT_BASE_S}
                                 + CAST(round(value * 100) AS BIGINT)
                                   % {ACT_MOD_S}) * 1000000,
                              epoch_us(ts), event_id) AS i
  FROM events),
nmax AS (SELECT max(i) AS m FROM iv),
dp(u, i, e, d) AS (
  SELECT u, CAST(0 AS BIGINT), CAST(-1 AS BIGINT), CAST(0 AS BIGINT)
  FROM (SELECT DISTINCT u FROM iv)
  UNION ALL
  SELECT * FROM (
    WITH cur AS (SELECT max(i) AS t FROM dp)
    SELECT p.u, p.i, p.e, p.d FROM dp p
    WHERE (SELECT t FROM cur) < (SELECT m FROM nmax)
    UNION ALL
    SELECT nx.u, nx.i, nx.e,
           greatest(
             coalesce((SELECT max(p1.d) FROM dp p1
                       WHERE p1.u = nx.u
                         AND p1.i = nx.i - 1), 0),
             nx.w + coalesce((SELECT max(p2.d) FROM dp p2
                              WHERE p2.u = nx.u
                                AND p2.e <= nx.s AND p2.i >= 1), 0))
    FROM iv nx
    WHERE nx.i = (SELECT t FROM cur) + 1
      AND (SELECT t FROM cur) < (SELECT m FROM nmax)))
SELECT u AS user_id,
       CAST(max(i) AS BIGINT) AS n_events,
       CAST(max(d) AS BIGINT) AS best_value_cents
FROM dp GROUP BY u ORDER BY u"""
