"""Maximal independent set by deterministic Luby rounds — the
symmetry-breaking primitive of distributed graph algorithms (Luby
1986; the deterministic-priority variant): a vertex enters the MIS
when its splitmix priority is a strict local minimum among still-
active neighbours; its neighbours then drop out; repeat. With the
fixed priority p(v) = mix(v) the whole execution is a deterministic
function of the graph, so an independent SQL replay must reproduce
the exact set — and the MIS properties (independence + maximality)
are asserted outright in pytest.

Distributed shape: the undirected canonical edge set streams per
round while the (priority, status) vectors broadcast (the
pagerank/Borůvka contract); each round's per-batch partial is the
per-vertex min over active-neighbour priorities (vertices × blocks
rows). Rounds are O(log V) w.h.p. for random priorities — mix()
behaves as such.

Oracle: a recursive CTE carrying (v, status) forward; each iteration
computes the local-minimum set and the newly dominated set with two
joins against the carried state (the DTW/MST multi-reference
pattern).

Reference relationship: none (graph-family completion; the
independent-set dual of the `lpa`/`scc` label machinery).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import _mix


def maximal_independent_set(sf_dir: str) -> pa.Table:
    """(v, in_mis, round_joined): deterministic-Luby MIS over the
    undirected demo graph — DuckDB hash-matched."""
    import ray

    from .mst import _canonical_edges

    edges = _canonical_edges(sf_dir).materialize()
    parts = pa.concat_tables(
        [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    eu = parts["u"].to_numpy(zero_copy_only=False)
    ev = parts["v"].to_numpy(zero_copy_only=False)
    verts = np.unique(np.concatenate([eu, ev]))
    n = verts.size
    prio = (_mix(verts.astype(np.uint64)) >> np.uint64(1)).astype(np.int64)
    # status: 0 = active, 1 = MIS, 2 = dominated
    status = np.zeros(n, np.int64)
    joined = np.full(n, -1, np.int64)
    rnd = 0
    while (status == 0).any():
        rnd += 1
        ref = ray.put((verts, prio, status.copy()))

        def nbr_min(batch: pa.Table) -> pa.Table:
            vs, pr, st = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            ui = np.searchsorted(vs, u)
            vi = np.searchsorted(vs, v)
            m = (st[ui] == 0) & (st[vi] == 0)
            ui, vi = ui[m], vi[m]
            node = np.concatenate([ui, vi])
            nbrp = np.concatenate([pr[vi], pr[ui]])
            uk, inv = np.unique(node, return_inverse=True)
            mn = np.full(uk.size, np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mn, inv, nbrp)
            return pa.table({"i": pa.array(uk, pa.int64()),
                             "m": pa.array(mn, pa.int64())})

        agg = (edges.map_batches(nbr_min, batch_format="pyarrow")
               .groupby("i").min("m"))
        tlist = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
        nbr_min_v = np.full(n, np.iinfo(np.int64).max, np.int64)
        if tlist:
            tbl = pa.concat_tables(tlist, promote_options="default")
            idx = tbl["i"].to_numpy(zero_copy_only=False)
            nbr_min_v[idx] = tbl["min(m)"].to_numpy(
                zero_copy_only=False)
        active = status == 0
        new_mis = active & (prio < nbr_min_v)
        status[new_mis] = 1
        joined[new_mis] = rnd

        ref2 = ray.put((verts, status.copy()))

        def dominated(batch: pa.Table) -> pa.Table:
            vs, st = ray.get(ref2)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            ui = np.searchsorted(vs, u)
            vi = np.searchsorted(vs, v)
            out = np.concatenate([ui[(st[vi] == 1) & (st[ui] == 0)],
                                  vi[(st[ui] == 1) & (st[vi] == 0)]])
            return pa.table({"i": pa.array(np.unique(out),
                                           pa.int64())})

        dom = pa.concat_tables(
            [t for t in ray.get(
                edges.map_batches(dominated, batch_format="pyarrow")
                .to_arrow_refs()) if t.num_rows] or
            [pa.table({"i": pa.array([], pa.int64())})],
            promote_options="default")
        di = np.unique(dom["i"].to_numpy(zero_copy_only=False))
        if di.size:
            status[di[status[di] == 0]] = 2

    return pa.table({
        "v": pa.array(verts, pa.int64()),
        "in_mis": pa.array((status == 1).astype(np.int64), pa.int64()),
        "round_joined": pa.array(joined, pa.int64()),
    })


def maximal_independent_set_sql() -> str:
    from .sketch import _mix_sql_wide

    mixed = _mix_sql_wide("vv.v::HUGEINT")
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
pri AS (
  SELECT vv.v, CAST({mixed} // 2 AS BIGINT) AS p
  FROM verts vv),
st(v, status, rnd) AS (
  SELECT v, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM verts
  UNION ALL
  SELECT * FROM (
    WITH prev AS (SELECT * FROM st),
    nbrmin AS (
      SELECT und.a AS v, min(pb.p) AS nm
      FROM und
           JOIN prev sa ON und.a = sa.v AND sa.status = 0
           JOIN prev sb ON und.b = sb.v AND sb.status = 0
           JOIN pri pb ON und.b = pb.v
      GROUP BY und.a),
    newmis AS (
      SELECT p.v FROM prev p JOIN pri ON p.v = pri.v
           LEFT JOIN nbrmin nm ON p.v = nm.v
      WHERE p.status = 0
        AND pri.p < coalesce(nm.nm, 9223372036854775807)),
    newdom AS (
      SELECT DISTINCT und.b AS v
      FROM und JOIN newmis ON und.a = newmis.v
           JOIN prev pb ON und.b = pb.v
      WHERE pb.status = 0
        AND und.b NOT IN (SELECT v FROM newmis))
    SELECT p.v,
           CASE WHEN p.v IN (SELECT v FROM newmis) THEN 1
                WHEN p.v IN (SELECT v FROM newdom) THEN 2
                ELSE p.status END AS status,
           p.rnd + 1 AS rnd
    FROM prev p
    WHERE EXISTS (SELECT 1 FROM prev x WHERE x.status = 0))),
final AS (
  SELECT v, status, rnd FROM (
    SELECT v, status, rnd,
           row_number() OVER (PARTITION BY v
                              ORDER BY rnd DESC) AS rn
    FROM st) WHERE rn = 1),
firstmis AS (
  SELECT v, min(rnd) AS round_joined FROM st
  WHERE status = 1 GROUP BY v)
SELECT f.v,
       CAST(CASE WHEN f.status = 1 THEN 1 ELSE 0 END AS BIGINT)
         AS in_mis,
       CAST(coalesce(fm.round_joined, -1) AS BIGINT)
         AS round_joined
FROM final f LEFT JOIN firstmis fm ON f.v = fm.v
ORDER BY f.v"""
