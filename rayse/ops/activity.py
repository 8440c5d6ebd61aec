"""Activity selection — THE canonical greedy (earliest-end-first
maximum non-overlapping interval scheduling, provably optimal): per
user, the largest set of non-overlapping activity intervals, where an
event's interval is [ts, ts + 60 + cents mod 3600 seconds) (a
deterministic value-derived duration — the events table carries no
explicit duration).

Exactness: the greedy chain is fully ordered — successor = the
(end, start, event_id)-least interval starting at/after the current
end — so two independent implementations must agree on every chain.
Ray side: one user-hash exchange, per-user vectorized-scan greedy
(partition-per-user is the documented `sessionize` assumption; the
time-bucket salting fallback of `relational.py` applies to a firehose
user). Oracle: a recursive CTE walking every user's chain via the
correlated earliest-successor subquery — chain recursion, one row per
(user, step).

Reference relationship: none (scheduling/greedy family completion;
the optimality theorem is the pytest pin — greedy count equals a
brute-force DP on a small synthetic case).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ACT_BASE_S = 60
ACT_MOD_S = 3600


def activity_selection(sf_dir: str) -> pa.Table:
    """(user_id, n_selected, first_start_us, last_end_us) — DuckDB
    hash-matched against the recursive chain-walk oracle."""
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
        })

    def per_user(group: pa.Table) -> pa.Table:
        s = group["s"].to_numpy(zero_copy_only=False)
        e = group["e"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, s, e))
        s, e = s[order], e[order]
        n_sel, cur = 0, np.iinfo(np.int64).min
        first, last = 0, 0
        for i in range(s.size):
            if s[i] >= cur:
                if n_sel == 0:
                    first = int(s[i])
                cur = int(e[i])
                last = cur
                n_sel += 1
        uid = group["user_id"][0].as_py()
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n_selected": pa.array([n_sel], pa.int64()),
            "first_start_us": pa.array([first], pa.int64()),
            "last_end_us": pa.array([last], pa.int64()),
        })

    out = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("user_id")
           .map_groups(per_user, batch_format="pyarrow"))
    tbl = out.to_pandas()
    tbl = tbl.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(tbl, preserve_index=False)


def activity_selection_sql() -> str:
    return f"""
WITH RECURSIVE
iv AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         epoch_us(ts) AS s,
         epoch_us(ts) + ({ACT_BASE_S}
           + CAST(round(value * 100) AS BIGINT) % {ACT_MOD_S})
           * 1000000 AS e,
         event_id AS id
  FROM events),
base AS (
  SELECT u, s, e FROM (
    SELECT u, s, e,
           row_number() OVER (PARTITION BY u
                              ORDER BY e, s, id) AS rn
    FROM iv) WHERE rn = 1),
chain(u, first_s, cur_e, cnt) AS (
  SELECT u, s, e, CAST(1 AS BIGINT) FROM base
  UNION ALL
  SELECT c.u, c.first_s,
         (SELECT i.e FROM iv i
          WHERE i.u = c.u AND i.s >= c.cur_e
          ORDER BY i.e, i.s, i.id LIMIT 1),
         c.cnt + 1
  FROM chain c
  WHERE EXISTS (SELECT 1 FROM iv i
                WHERE i.u = c.u AND i.s >= c.cur_e)),
best AS (
  SELECT u, first_s, cur_e, cnt FROM (
    SELECT u, first_s, cur_e, cnt,
           row_number() OVER (PARTITION BY u
                              ORDER BY cnt DESC) AS rn
    FROM chain) WHERE rn = 1)
SELECT u AS user_id, cnt AS n_selected,
       CAST(first_s AS BIGINT) AS first_start_us,
       CAST(cur_e AS BIGINT) AS last_end_us
FROM best ORDER BY user_id"""
