"""Longest border and minimal period of each user's event-type string
(KMP failure function, Knuth–Morris–Pratt 1977; Fine & Wilf): the
repetitive-behavior signal — min_period = n − border is the length of
the cycle the user's event sequence keeps repeating (period 1 = fully
uniform behavior; period n = never repeats its opening).

Ray side: per-user one-char event codes in (ts, event_id) order (the
`seqmine` string contract) inside the user exchange, then the linear
KMP failure recursion per group. Oracle: the DEFINITION, not the
algorithm — border = max k < n with prefix(k) = suffix(k), checked by
direct substring comparison over every k — so the pin is
algorithm-vs-definition, the strongest equivalence flavor.

Reference relationship: none (sequence family, next to `seq_patterns`
/ `lis`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def border_per_user(sf_dir: str) -> pa.Table:
    """(user_id, n, border, min_period) — DuckDB hash-matched."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = (group["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view("int64"))
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(group["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts))
        s = "".join(str(x)[0] for x in et[order])
        n = len(s)
        fail = [0] * (n + 1)
        k = 0
        for i in range(1, n):
            while k > 0 and s[i] != s[k]:
                k = fail[k]
            if s[i] == s[k]:
                k += 1
            fail[i + 1] = k
        border = fail[n]
        uid = group["user_id"][0].as_py()
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "border": pa.array([border], pa.int64()),
            "min_period": pa.array([n - border], pa.int64()),
        })

    out = (ds.groupby("user_id")
           .map_groups(per_user, batch_format="pyarrow"))
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def border_per_user_sql() -> str:
    return """
WITH s AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         string_agg(substr(event_type, 1, 1), ''
                    ORDER BY ts, event_id) AS str
  FROM events GROUP BY user_id),
ks AS (
  SELECT s.u, s.str, CAST(length(s.str) AS BIGINT) AS n,
         CAST(g.k AS BIGINT) AS k
  FROM s, UNNEST(range(length(s.str))) g(k)),
borders AS (
  SELECT u, n,
         CAST(max(CASE WHEN substr(str, 1, CAST(k AS INTEGER))
                        = substr(str,
                                 CAST(n - k + 1 AS INTEGER),
                                 CAST(k AS INTEGER))
                       THEN k ELSE 0 END) AS BIGINT) AS border
  FROM ks WHERE k < n GROUP BY u, n)
SELECT u AS user_id, n, border,
       CAST(n - border AS BIGINT) AS min_period
FROM borders ORDER BY user_id"""
