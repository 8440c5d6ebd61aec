"""Temporal (time-respecting) reachability — earliest-arrival
"foremost journeys" over the timestamped demo link graph (Kempe,
Kleinberg & Kumar 2000; the temporal-graph sibling of `bfs_hops` /
`bellman_ford`): an edge (u → v, t) is usable only at its own
timestamp, and only AFTER u has already been reached (arrival(u) ≤ t),
so arrival(v) = min over such edges of t. Plain BFS overcounts —
a path through a LATER edge into an EARLIER one is not a journey.

The fixpoint is a min-label propagation with a per-edge gate:
candidate(v) = min{t(e) : e = (u→v), arrival(u) ≤ t(e)} — min is
order-independent, so frozen rounds mirror exactly into the oracle's
recursive CTE (arrival labels carried forward, gate in the join).
Distributed shape per round: the (vertex, arrival) vector broadcasts,
timestamped edges stream with per-batch gated minima (the
`bellman_ford` contract).

Source: the minimum src vertex, reached at the epoch of its earliest
outgoing event (its own arrival = that first timestamp — the
journey clock starts at the source's first activity). Unreached
vertices are absent.

Reference relationship: none (temporal-graph completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TR_ROUNDS = 12


def temporal_reachability(sf_dir: str,
                          rounds: int = TR_ROUNDS) -> pa.Table:
    """(vertex, arrival_us): earliest time-respecting arrival from the
    min-src source after ``rounds`` gated relaxation rounds — DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    from .graph import DEMO_VERTEX_SPACE, _props_k

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "props", "ts"])

    def tedges(batch: pa.Table) -> pa.Table:
        src = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        ks = _props_k(batch["props"])
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view("int64"))
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(ks % DEMO_VERTEX_SPACE, pa.int64()),
            "t": pa.array(ts, pa.int64())})

    edges = ds.map_batches(tedges, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    seed = int(edges.min("src"))
    seed_t = int(
        edges.filter(lambda r: r["src"] == seed).min("t"))

    arrival: dict[int, int] = {seed: seed_t}
    for _ in range(rounds):
        items = sorted(arrival.items())
        ref = ray.put((np.array([k for k, _ in items], np.int64),
                       np.array([v for _, v in items], np.int64)))

        def relax(batch: pa.Table) -> pa.Table:
            vs, av = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            t = batch["t"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(vs, src)
            idx_c = np.minimum(idx, vs.size - 1)
            hit = (vs[idx_c] == src) & (t >= av[idx_c])
            dst = batch["dst"].to_numpy(zero_copy_only=False)[hit]
            cand = t[hit]
            if dst.size == 0:
                return pa.table({"v": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            order = np.argsort(dst, kind="stable")
            dst, cand = dst[order], cand[order]
            uk, starts = np.unique(dst, return_index=True)
            return pa.table({
                "v": pa.array(uk, pa.int64()),
                "c": pa.array(np.minimum.reduceat(cand, starts),
                              pa.int64())})

        agg = (edges.map_batches(relax, batch_format="pyarrow",
                                 zero_copy_batch=True)
               .groupby("v").min("c").take_all())
        changed = False
        for r in agg:
            v, c = int(r["v"]), int(r["min(c)"])
            if v not in arrival or c < arrival[v]:
                arrival[v] = c
                changed = True
        if not changed:
            break

    vs = sorted(arrival)
    return pa.table({
        "vertex": pa.array(vs, pa.int64()),
        "arrival_us": pa.array([arrival[v] for v in vs], pa.int64()),
    })


def temporal_reachability_sql(rounds: int = TR_ROUNDS) -> str:
    return f"""
WITH RECURSIVE
te AS (
  SELECT CAST(user_id AS BIGINT) AS s,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 200
              AS BIGINT) AS d,
         epoch_us(ts) AS t
  FROM events),
seed AS (SELECT min(s) AS v FROM te),
seedt AS (SELECT min(t) AS t FROM te
          WHERE s = (SELECT v FROM seed)),
arr(v, a, rnd) AS (
  SELECT (SELECT v FROM seed), (SELECT t FROM seedt),
         CAST(0 AS BIGINT)
  UNION ALL
  SELECT * FROM (
    WITH prev AS (SELECT * FROM arr),
    relaxed AS (
      SELECT te.d AS v, min(te.t) AS a
      FROM te JOIN prev p ON te.s = p.v AND te.t >= p.a
      GROUP BY te.d),
    merged AS (
      SELECT coalesce(r.v, p.v) AS v,
             least(coalesce(r.a, 9223372036854775807),
                   coalesce(p.a, 9223372036854775807)) AS a,
             -- ONE round counter for every row (a per-row counter
             -- would expire newly-discovered vertices late and drop
             -- carried labels early)
             (SELECT max(rnd) FROM prev) + 1 AS rnd
      FROM relaxed r FULL JOIN prev p ON r.v = p.v)
    SELECT v, a, rnd FROM merged
    WHERE rnd <= {rounds}))
SELECT v AS vertex, CAST(min(a) AS BIGINT) AS arrival_us
FROM arr GROUP BY v ORDER BY v"""
