"""Absorbing-chain conversion probability — the funnel question the
raw transition table (`seqmine.markov_transitions`) doesn't answer:
starting from each event type, what is the probability the user's
NEXT-K-step walk reaches 'purchase'? The purchase state absorbs; the
fixed-point recursion

    p₀(s) = 0;  p_{t+1}(s) = Σ_next c(s, next)·x / tot(s)
            where x = SCALE if next = purchase else p_t(next)

runs in 2^20 fixed point with TRUNCATING division (the
`pagerank_fixed` recipe — integer state, order-independent sums, so
the distributed fold and the SQL recursion agree bit-for-bit).

Distributed shape: the (prev, next) count table is one bounded
groupby over per-user consecutive pairs (the `markov_transitions`
fold); K iterations run on the types×types grid driver-side.

Oracle: a recursive CTE carrying (state, p, iter) with the identical
truncating update.

Reference relationship: none (funnel/Markov family completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

AB_SCALE = 1 << 20
AB_ITERS = 12
AB_TARGET = "purchase"


def _pair_counts(sf_dir: str):
    """Bounded (prev, next) pair counts via per-user ordered pairs."""
    import ray
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
        et = et[order]
        if et.size < 2:
            return pa.table({"prev": pa.array([], pa.string()),
                             "nxt": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        key = np.char.add(np.char.add(et[:-1].astype(str), "|"),
                          et[1:].astype(str))
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "prev": pa.array([k.split("|")[0] for k in uk.tolist()],
                             pa.string()),
            "nxt": pa.array([k.split("|")[1] for k in uk.tolist()],
                            pa.string()),
            "c": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = (ds.groupby("user_id")
           .map_groups(per_user, batch_format="pyarrow")
           .groupby(["prev", "nxt"]).sum("c"))
    return pa.concat_tables(
        [t for t in __import__("ray").get(agg.to_arrow_refs())
         if t.num_rows], promote_options="default")


def absorption_probability(sf_dir: str,
                           iters: int = AB_ITERS) -> pa.Table:
    """(state, p_fp): fixed-point probability of reaching
    '{AB_TARGET}' within ``iters`` transitions — DuckDB
    hash-matched."""
    tbl = _pair_counts(sf_dir)
    prev = np.asarray(tbl["prev"].to_pylist(), dtype=object)
    nxt = np.asarray(tbl["nxt"].to_pylist(), dtype=object)
    c = tbl["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    states = sorted(set(prev.tolist()) | set(nxt.tolist()))
    six = {s: i for i, s in enumerate(states)}
    n = len(states)
    C = np.zeros((n, n), np.int64)
    for p, x, cc in zip(prev.tolist(), nxt.tolist(), c.tolist()):
        C[six[p], six[x]] += cc
    tot = C.sum(axis=1)
    tgt = six.get(AB_TARGET, -1)
    p = np.zeros(n, np.int64)
    for _ in range(iters):
        x = p.copy()
        if tgt >= 0:
            x[tgt] = AB_SCALE
        num = C @ x
        nxt_p = np.where(tot > 0, num // np.maximum(tot, 1), 0)
        p = nxt_p.astype(np.int64)
    return pa.table({
        "state": pa.array(states, pa.string()),
        "p_fp": pa.array(p, pa.int64()),
    })


def absorption_probability_sql(iters: int = AB_ITERS) -> str:
    return f"""
WITH RECURSIVE
seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
pc AS (
  SELECT event_type AS prev, nxt, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
states AS (
  -- DISTINCT over UNION ALL, not bare UNION: inside WITH RECURSIVE
  -- DuckDB treats a CTE's top-level UNION as UNION ALL (observed),
  -- which would duplicate the seed rows and quadruple the folds
  SELECT DISTINCT s FROM (
    SELECT prev AS s FROM pc UNION ALL SELECT nxt FROM pc)),
tot AS (SELECT prev, CAST(sum(c) AS BIGINT) AS t FROM pc
        GROUP BY prev),
pr(s, p, it) AS (
  SELECT s, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM states
  UNION ALL
  SELECT st.s,
         CASE WHEN t.t IS NULL THEN 0
              ELSE CAST(coalesce(sum(pc.c *
                     CASE WHEN pc.nxt = '{AB_TARGET}'
                          THEN {AB_SCALE} ELSE pn.p END), 0)
                   // t.t AS BIGINT) END,
         st.it + 1
  FROM pr st
       LEFT JOIN tot t ON t.prev = st.s
       LEFT JOIN pc ON pc.prev = st.s
       LEFT JOIN pr pn ON pn.s = pc.nxt AND pn.it = st.it
  WHERE st.it < {iters}
  GROUP BY st.s, st.it, t.t)
SELECT s AS state, CAST(max(p) AS BIGINT) AS p_fp
FROM pr WHERE it = {iters}
GROUP BY s ORDER BY s"""
