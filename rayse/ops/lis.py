"""Longest strictly-increasing subsequence of event values per user —
the classic sequence-DP (Schensted 1961; patience sorting), as the
behavioral "escalation streak" statistic (how long a user's spending
can be read as monotonically ramping): events in (ts, event_id)
order, values in cents, strict increase.

Ray side: one user-hash exchange, then the O(n log n) patience-tails
scan per user (group-bounded — the `sessionize` partition contract).
Oracle: the O(n²) textbook recursion run in lockstep across users —
iteration i computes dp for every user's i-th event from the carried
prefix rows (dp = 1 + max dp over earlier smaller values) — two
independent algorithms, one answer (the Borůvka/Prim pin flavor).

Reference relationship: none (sequence-DP family, next to
`seqmine`/`winfuncs`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def lis_per_user(sf_dir: str) -> pa.Table:
    """(user_id, n_events, lis_len) — DuckDB hash-matched."""
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view("int64"))
        return pa.table({
            "user_id": batch["user_id"],
            "ts": pa.array(ts, pa.int64()),
            "event_id": batch["event_id"],
            "cents": pa.array(_cents(batch["value"].to_numpy(
                zero_copy_only=False)), pa.int64()),
        })

    def per_user(group: pa.Table) -> pa.Table:
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        v = group["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        v = v[order]
        tails: list[int] = []       # patience piles (strict increase)
        for x in v.tolist():
            i = int(np.searchsorted(np.asarray(tails, np.int64), x,
                                    side="left"))
            if i == len(tails):
                tails.append(int(x))
            else:
                tails[i] = int(x)
        uid = group["user_id"][0].as_py()
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n_events": pa.array([v.size], pa.int64()),
            "lis_len": pa.array([len(tails)], pa.int64()),
        })

    out = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("user_id")
           .map_groups(per_user, batch_format="pyarrow"))
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def lis_per_user_sql() -> str:
    return """
WITH RECURSIVE
x AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         CAST(round(value * 100) AS BIGINT) AS v,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i
  FROM events),
nmax AS (SELECT max(i) AS m FROM x),
dp(u, i, v, d) AS (
  SELECT u, i, v, CAST(1 AS BIGINT) FROM x WHERE i = 1
  UNION ALL
  SELECT * FROM (
    WITH cur AS (SELECT max(i) AS t FROM dp)
    SELECT p.u, p.i, p.v, p.d FROM dp p   -- carry the prefix
    WHERE (SELECT t FROM cur) < (SELECT m FROM nmax)
    UNION ALL
    SELECT nx.u, nx.i, nx.v,
           1 + coalesce((SELECT max(p2.d) FROM dp p2
                         WHERE p2.u = nx.u AND p2.v < nx.v), 0)
    FROM x nx
    WHERE nx.i = (SELECT t FROM cur) + 1
      AND (SELECT t FROM cur) < (SELECT m FROM nmax)))
SELECT u AS user_id,
       CAST(max(i) AS BIGINT) AS n_events,
       CAST(max(d) AS BIGINT) AS lis_len
FROM (
  SELECT u, i, d,
         row_number() OVER (PARTITION BY u, i
                            ORDER BY d DESC) AS rn
  FROM dp) WHERE rn = 1
GROUP BY u ORDER BY u"""
