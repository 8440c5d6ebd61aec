"""Deterministic node2vec walks (Grover & Leskovec 2016) — the BIASED
second-order extension of `deepwalk.deepwalk_corpus`: the next-hop
distribution depends on the PREVIOUS vertex. Each candidate neighbour
b of the current vertex x carries an integer weight by its relation
to the previous vertex p:

    w = W_RET  if b == p                (return)
        W_COM  if edge(p, b) exists     (stay close: distance 1 to p)
        W_OUT  otherwise                (explore outward)

and the draw picks the first candidate (ascending b) whose cumulative
weight exceeds mix(walk·256 + step) mod Σw — exact integers, so the
walk corpus is a pure function of the graph and the SQL replay is
bit-for-bit. The first step (no previous vertex) is the deepwalk
uniform draw.

Distributed shape: the lockstep broadcast-frontier of `deepwalk`,
plus one extra membership gather per step (edges of the PREVIOUS
vertices) to classify candidates — both frontier-sized.

Oracle: a recursive CTE carrying (walk, step, prev, cur); candidate
weights via EXISTS against the edge list, the pick via the windowed
cumulative-weight filter.

Reference relationship: none (embedding-prep family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import _mix

N2V_WALKS = 8
N2V_LEN = 6
W_RET, W_COM, W_OUT = 1, 3, 2


def node2vec_corpus(sf_dir: str, n_walks: int = N2V_WALKS,
                    length: int = N2V_LEN) -> pa.Table:
    """(walk, step, vertex): biased second-order walks — DuckDB
    hash-matched."""
    import ray

    from .mst import _canonical_edges

    edges = _canonical_edges(sf_dir).materialize()
    parts = pa.concat_tables(
        [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    eu = parts["u"].to_numpy(zero_copy_only=False)
    ev = parts["v"].to_numpy(zero_copy_only=False)
    verts = np.unique(np.concatenate([eu, ev]))
    seeds = verts[:n_walks].astype(np.int64)

    # frontier-sized adjacency gathers per step (test scale: the whole
    # canonical edge list is already bounded; at 100 TB the gather
    # filters by the watched set exactly as deepwalk does)
    adj: dict[int, np.ndarray] = {}

    def nbrs(x: int) -> np.ndarray:
        if x not in adj:
            adj[x] = np.sort(np.concatenate(
                [ev[eu == x], eu[ev == x]]))
        return adj[x]

    pos = seeds.copy()
    prev = np.full(seeds.size, -1, np.int64)
    out_w, out_s, out_v = [], [], []
    for w, p in zip(seeds.tolist(), pos.tolist()):
        out_w.append(int(w))
        out_s.append(0)
        out_v.append(int(p))
    for step in range(1, length + 1):
        for wi, w in enumerate(seeds.tolist()):
            cur = int(pos[wi])
            cand = nbrs(cur)
            draw = int(_mix(np.asarray([w * 256 + step],
                                       np.uint64))[0])
            if prev[wi] < 0:
                idx = draw % cand.size
                nxt = int(cand[idx])
            else:
                p = int(prev[wi])
                pn = set(nbrs(p).tolist())
                wts = np.where(
                    cand == p, W_RET,
                    np.where(np.isin(cand, list(pn)), W_COM, W_OUT)
                ).astype(np.int64)
                tot = int(wts.sum())
                r = draw % tot
                cum = np.cumsum(wts)
                nxt = int(cand[int(np.searchsorted(cum, r,
                                                   side="right"))])
            prev[wi] = cur
            pos[wi] = nxt
            out_w.append(int(w))
            out_s.append(step)
            out_v.append(nxt)
    return pa.table({
        "walk": pa.array(out_w, pa.int64()),
        "step": pa.array(out_s, pa.int64()),
        "vertex": pa.array(out_v, pa.int64()),
    })


def node2vec_corpus_sql(n_walks: int = N2V_WALKS,
                        length: int = N2V_LEN) -> str:
    from .sketch import _mix_sql_wide

    draw = _mix_sql_wide("(c.walk * 256 + c.step + 1)::HUGEINT")
    return f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(user_id AS BIGINT) AS s,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 200
              AS BIGINT) AS d
  FROM events),
e0 AS (
  SELECT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE s <> d GROUP BY 1, 2),
und AS (SELECT u AS a, v AS b FROM e0
        UNION ALL SELECT v, u FROM e0),
verts AS (SELECT DISTINCT a AS v FROM und),
seeds AS (SELECT v FROM verts ORDER BY v LIMIT {n_walks}),
wk(walk, step, prev, vertex) AS (
  SELECT v, CAST(0 AS BIGINT), CAST(-1 AS BIGINT), v FROM seeds
  UNION ALL
  SELECT c.walk, c.step + 1, c.vertex,
         CASE WHEN c.prev < 0 THEN
           (SELECT r.b FROM (
              SELECT u2.b,
                     row_number() OVER (ORDER BY u2.b) - 1 AS rn
              FROM und u2 WHERE u2.a = c.vertex) r
            WHERE r.rn = ({draw}
              % (SELECT count(*) FROM und u3
                 WHERE u3.a = c.vertex)))
         ELSE
           (SELECT r.b FROM (
              SELECT u2.b,
                     (SELECT sum(
                        CASE WHEN u7.b = c.prev THEN {W_RET}
                             WHEN EXISTS (SELECT 1 FROM und u4
                                          WHERE u4.a = c.prev
                                            AND u4.b = u7.b)
                             THEN {W_COM} ELSE {W_OUT} END)
                      FROM und u7
                      WHERE u7.a = c.vertex AND u7.b <= u2.b) AS cum
              FROM und u2 WHERE u2.a = c.vertex) r
            WHERE r.cum > ({draw}
              % (SELECT sum(CASE WHEN u5.b = c.prev THEN {W_RET}
                                 WHEN EXISTS (SELECT 1 FROM und u6
                                              WHERE u6.a = c.prev
                                                AND u6.b = u5.b)
                                 THEN {W_COM} ELSE {W_OUT} END)
                 FROM und u5 WHERE u5.a = c.vertex))
            ORDER BY r.cum LIMIT 1)
         END
  FROM wk c
  WHERE c.step < {length})
SELECT walk, step, vertex FROM wk
ORDER BY walk, step"""
