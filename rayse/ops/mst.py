"""Minimum spanning forest by Borůvka — THE distributed MST algorithm
(each round is a per-component ARGMIN fold over streaming edges plus a
driver union-find contraction), composed entirely from idioms this
repo already pins: the lexicographic argmin combiner (`ohlc.py`), the
broadcast label vector (`graph.pagerank` — vertex-dense driver state,
edge set streamed per round), and the union-find of the dedup family.

Edge weights: the demo link graph (`graph.derived_edges`) is
unweighted, so each canonical undirected edge gets the deterministic
pseudo-random key h = (u·2654435761 + v·40503) mod 2^20 and the STRICT
TOTAL ORDER (h, u, v) — total orders make the minimum spanning forest
UNIQUE (the cut/exchange argument needs only comparability), which is
what lets two completely different algorithms be compared bit-for-bit:

    Ray side   = Borůvka (log-round parallel contraction)
    SQL oracle = Prim-with-restart (one recursive CTE, one vertex per
                 iteration, carrying the visited set forward)

Both must produce the IDENTICAL edge set — an algorithm-equivalence
theorem, not a replay, in the spirit of the `ann_exact_suite` arms.

Rounds are O(log V): each Borůvka round at least halves component
count. Driver state is one label per vertex (the documented pagerank
bound); edges never land whole on the driver — each round emits
per-batch per-component minima only (components × blocks rows).

Reference relationship: extends the reference's link-analysis family
(`Ranker1.java` degree/PageRank) with the spanning-structure operator;
no reference analog.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

H_MOD = 1 << 20
H_A = 2654435761
H_B = 40503


def _canonical_edges(sf_dir: str):
    """Distinct canonical undirected (u, v, h) edges Dataset (u < v,
    self-loops dropped), deduped by one (u, v) groupby."""
    import ray.data as rd

    from .graph import derived_edges

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        u, v = np.minimum(s, d), np.maximum(s, d)
        key = u * (1 << 32) + v
        uk = np.unique(key)
        return pa.table({"u": pa.array(uk // (1 << 32), pa.int64()),
                         "v": pa.array(uk % (1 << 32), pa.int64())})

    ded = (derived_edges(sf_dir)
           .map_batches(canon, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(["u", "v"]).count())

    def weigh(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (u * H_A + v * H_B) % H_MOD
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "h": pa.array(h, pa.int64())})

    return ded.map_batches(weigh, batch_format="pyarrow")


class _UF:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        if rb < ra:              # min-root: labels stay canonical
            ra, rb = rb, ra
        self.p[rb] = ra
        return True


def min_spanning_forest(sf_dir: str) -> pa.Table:
    """(u, v, w): the unique minimum spanning forest of the demo link
    graph under the (h, u, v) total order, by distributed Borůvka —
    DuckDB hash-matched against a Prim-with-restart recursive oracle."""
    import ray
    import ray.data as rd

    edges = _canonical_edges(sf_dir).materialize()  # bounded: distinct
    # vertex space (driver-held, the pagerank vertex-state bound)
    vert_parts = pa.concat_tables(
        [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    eu = vert_parts["u"].to_numpy(zero_copy_only=False)
    ev = vert_parts["v"].to_numpy(zero_copy_only=False)
    verts = np.unique(np.concatenate([eu, ev]))
    n = verts.size
    if n == 0:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "w": pa.array([], pa.int64())})
    uf = _UF(n)
    mst: set[tuple] = set()

    while True:
        labels = np.asarray([uf.find(i) for i in range(n)], np.int64)
        state_ref = ray.put((verts, labels))

        def round_min(batch: pa.Table) -> pa.Table:
            vs, lb = ray.get(state_ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            h = batch["h"].to_numpy(zero_copy_only=False)
            cu = lb[np.searchsorted(vs, u)]
            cv = lb[np.searchsorted(vs, v)]
            m = cu != cv
            if not m.any():
                return pa.table({"comp": pa.array([], pa.int64()),
                                 "h": pa.array([], pa.int64()),
                                 "u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64())})
            # per-component lexicographic (h, u, v) argmin — both
            # endpoint components are candidates for this edge
            comp = np.concatenate([cu[m], cv[m]])
            hh = np.concatenate([h[m], h[m]])
            uu = np.concatenate([u[m], u[m]])
            vv = np.concatenate([v[m], v[m]])
            order = np.lexsort((vv, uu, hh, comp))
            cc = comp[order]
            firsts = np.concatenate(([True], cc[1:] != cc[:-1]))
            pick = order[firsts]
            return pa.table({"comp": pa.array(comp[pick], pa.int64()),
                             "h": pa.array(hh[pick], pa.int64()),
                             "u": pa.array(uu[pick], pa.int64()),
                             "v": pa.array(vv[pick], pa.int64())})

        part_list = [t for t in ray.get(
            edges.map_batches(round_min, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows]
        if not part_list:
            break
        parts = pa.concat_tables(part_list, promote_options="default")
        comp = parts["comp"].to_numpy(zero_copy_only=False)
        hh = parts["h"].to_numpy(zero_copy_only=False)
        uu = parts["u"].to_numpy(zero_copy_only=False)
        vv = parts["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vv, uu, hh, comp))
        cc = comp[order]
        firsts = np.concatenate(([True], cc[1:] != cc[:-1]))
        pick = order[firsts]
        added = False
        for i in pick.tolist():
            a = int(np.searchsorted(verts, uu[i]))
            b = int(np.searchsorted(verts, vv[i]))
            if uf.union(a, b):
                mst.add((int(uu[i]), int(vv[i]), int(hh[i])))
                added = True
        if not added:
            break

    rows = sorted(mst)
    return pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
        "w": pa.array([r[2] for r in rows], pa.int64()),
    })


def min_spanning_forest_sql() -> str:
    """Prim-with-restart oracle: one vertex joins per iteration — the
    lexicographically-least crossing edge if one exists, else the least
    unvisited vertex starts a new tree. The visited set is carried
    forward each iteration (the recursive table holds only the previous
    step); restart rows carry eu = -1 and are dropped from the edge
    output."""
    return f"""
WITH RECURSIVE
raw AS (
  SELECT CAST(user_id AS BIGINT) AS s,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 200
              AS BIGINT) AS d
  FROM events),
e0 AS (
  SELECT least(s, d) AS u, greatest(s, d) AS v,
         (least(s, d) * {H_A} + greatest(s, d) * {H_B}) % {H_MOD} AS h
  FROM raw WHERE s <> d
  GROUP BY 1, 2),
verts AS (SELECT DISTINCT u AS x FROM e0
          UNION SELECT DISTINCT v FROM e0),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM verts),
walk(step, vertex, eu, ev, eh) AS (
  SELECT CAST(1 AS BIGINT), (SELECT min(x) FROM verts),
         CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
  UNION ALL
  SELECT * FROM (
    SELECT p.step + 1, p.vertex, p.eu, p.ev, p.eh
    FROM walk p WHERE p.step < (SELECT n FROM nn)
    UNION ALL
    SELECT c.step + 1, c.vertex, c.eu, c.ev, c.eh FROM (
      SELECT step, vertex, eu, ev, eh FROM (
        SELECT p2.step, CASE WHEN vis_u THEN e.v ELSE e.u END
                 AS vertex,
               e.u AS eu, e.v AS ev, e.h AS eh,
               0 AS pri, e.h AS o1, e.u AS o2, e.v AS o3
        FROM (SELECT e0.*,
                     e0.u IN (SELECT vertex FROM walk) AS vis_u,
                     e0.v IN (SELECT vertex FROM walk) AS vis_v
              FROM e0) e
             CROSS JOIN (SELECT DISTINCT step FROM walk) p2
        WHERE e.vis_u <> e.vis_v
          AND p2.step < (SELECT n FROM nn)
        UNION ALL
        SELECT p3.step, w.x, CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
               CAST(-1 AS BIGINT), 1 AS pri, w.x AS o1,
               CAST(0 AS BIGINT) AS o2, CAST(0 AS BIGINT) AS o3
        FROM verts w CROSS JOIN (SELECT DISTINCT step FROM walk) p3
        WHERE w.x NOT IN (SELECT vertex FROM walk)
          AND p3.step < (SELECT n FROM nn))
      ORDER BY pri, o1, o2, o3 LIMIT 1) c))
SELECT eu AS u, ev AS v, CAST(eh AS BIGINT) AS w
FROM walk
WHERE step = (SELECT n FROM nn) AND eu >= 0
ORDER BY u, v"""
