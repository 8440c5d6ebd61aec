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


def _mis_select_part(tbl: pa.Table, rnd: int) -> pa.Table:
    """Selection-exchange reducer: each vertex's own (p, st, rnd) state
    row (own = 1) plus the priorities of its still-active neighbours;
    an active vertex whose priority beats the min joins the MIS."""
    if tbl.num_rows == 0:
        return pa.table({"v": pa.array([], pa.int64()),
                         "p": pa.array([], pa.int64()),
                         "st": pa.array([], pa.int64()),
                         "rnd": pa.array([], pa.int64())})
    v = tbl["v"].to_numpy(zero_copy_only=False)
    p = tbl["p"].to_numpy(zero_copy_only=False)
    st = tbl["st"].to_numpy(zero_copy_only=False)
    rj = tbl["rnd"].to_numpy(zero_copy_only=False)
    own = tbl["own"].to_numpy(zero_copy_only=False).astype(bool)
    verts = np.sort(v[own])
    o_p = np.zeros(verts.size, np.int64)
    o_st = np.zeros(verts.size, np.int64)
    o_rj = np.zeros(verts.size, np.int64)
    oi = np.searchsorted(verts, v[own])
    o_p[oi], o_st[oi], o_rj[oi] = p[own], st[own], rj[own]
    mn = np.full(verts.size, np.iinfo(np.int64).max, np.int64)
    nb = ~own
    if nb.any():
        np.minimum.at(mn, np.searchsorted(verts, v[nb]), p[nb])
    new_mis = (o_st == 0) & (o_p < mn)
    o_st[new_mis] = 1
    o_rj[new_mis] = rnd
    return pa.table({"v": pa.array(verts, pa.int64()),
                     "p": pa.array(o_p, pa.int64()),
                     "st": pa.array(o_st, pa.int64()),
                     "rnd": pa.array(o_rj, pa.int64())})


def _mis_dominate_part(tbl: pa.Table) -> pa.Table:
    """Domination-exchange reducer: active vertices adjacent to any MIS
    member drop out (status 2)."""
    if tbl.num_rows == 0:
        return pa.table({"v": pa.array([], pa.int64()),
                         "p": pa.array([], pa.int64()),
                         "st": pa.array([], pa.int64()),
                         "rnd": pa.array([], pa.int64())})
    v = tbl["v"].to_numpy(zero_copy_only=False)
    p = tbl["p"].to_numpy(zero_copy_only=False)
    st = tbl["st"].to_numpy(zero_copy_only=False)
    rj = tbl["rnd"].to_numpy(zero_copy_only=False)
    own = tbl["own"].to_numpy(zero_copy_only=False).astype(bool)
    verts = np.sort(v[own])
    o_p = np.zeros(verts.size, np.int64)
    o_st = np.zeros(verts.size, np.int64)
    o_rj = np.zeros(verts.size, np.int64)
    oi = np.searchsorted(verts, v[own])
    o_p[oi], o_st[oi], o_rj[oi] = p[own], st[own], rj[own]
    has_mis_nbr = np.zeros(verts.size, dtype=bool)
    nb = ~own
    if nb.any():
        has_mis_nbr[np.searchsorted(verts, v[nb])] = True
    o_st[(o_st == 0) & has_mis_nbr] = 2
    return pa.table({"v": pa.array(verts, pa.int64()),
                     "p": pa.array(o_p, pa.int64()),
                     "st": pa.array(o_st, pa.int64()),
                     "rnd": pa.array(o_rj, pa.int64())})


def maximal_independent_set_sharded(sf_dir: str):
    """Deterministic-Luby MIS with NO driver-side vertex state (the
    ``kcore_h_sharded`` template, two exchange passes per round): edge
    shards spilled once by priority-source endpoint; per round the
    (v, priority, status) rows co-partition with them, active-neighbour
    priorities exchange to the selection reducer, then new statuses
    re-spill and MIS-neighbour flags exchange to the domination
    reducer. Bit-identical to the dense route (same strict-local-min
    rule, same round numbering). Returns a Dataset of
    (v, in_mis, round_joined)."""
    import glob
    import os
    import shutil
    import uuid

    import ray
    import ray.data as rd

    from .exchange import default_parts, exchange_by_key, partition_of
    from .mst import _canonical_edges

    P = min(default_parts(), 64)
    root = os.path.join(
        "/tmp", f"rayse_mis_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    edir = os.path.join(root, "und")

    edges = _canonical_edges(sf_dir)

    def stamp_und(b: pa.Table) -> pa.Table:
        eu = b["u"].to_numpy(zero_copy_only=False)
        ev = b["v"].to_numpy(zero_copy_only=False)
        u = np.concatenate((eu, ev))
        v = np.concatenate((ev, eu))
        return pa.table({
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "_part": pa.array(partition_of([u], P), pa.int64()),
        })

    edges.map_batches(stamp_und, batch_format="pyarrow",
                      zero_copy_batch=True).write_parquet(
        edir, partition_cols=["_part"])
    edge_pids = sorted(int(os.path.basename(d).split("=")[1])
                       for d in glob.glob(os.path.join(edir, "_part=*")))
    if not edge_pids:
        shutil.rmtree(root, ignore_errors=True)
        return rd.from_arrow(pa.table({
            "v": pa.array([], pa.int64()),
            "in_mis": pa.array([], pa.int64()),
            "round_joined": pa.array([], pa.int64())}))

    def vert_rows(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"v": pa.array(u, pa.int64())})

    def init_state(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "p": pa.array([], pa.int64()),
                             "st": pa.array([], pa.int64()),
                             "rnd": pa.array([], pa.int64())})
        u = np.unique(tbl["v"].to_numpy(zero_copy_only=False))
        pr = (_mix(u.astype(np.uint64)) >> np.uint64(1)).astype(np.int64)
        return pa.table({
            "v": pa.array(u, pa.int64()),
            "p": pa.array(pr, pa.int64()),
            "st": pa.array(np.zeros(u.size, np.int64), pa.int64()),
            "rnd": pa.array(np.full(u.size, -1, np.int64), pa.int64()),
        })

    state = exchange_by_key(
        edges.map_batches(vert_rows, batch_format="pyarrow"),
        "v", init_state, n_parts=P).materialize()

    @ray.remote
    def emit_shard(pid: int, sdir: str, mode: str) -> pa.Table:
        import pyarrow.dataset as pads

        e = pads.dataset(os.path.join(edir, f"_part={pid}")).to_table(
            columns=["u", "v"], use_threads=False)
        stt = pads.dataset(os.path.join(sdir, f"_part={pid}")).to_table(
            columns=["v", "p", "st"], use_threads=False)
        sv = stt["v"].to_numpy(zero_copy_only=False)
        sp = stt["p"].to_numpy(zero_copy_only=False)
        ss = stt["st"].to_numpy(zero_copy_only=False)
        o = np.argsort(sv)
        sv, sp, ss = sv[o], sp[o], ss[o]
        u = e["u"].to_numpy(zero_copy_only=False)
        v = e["v"].to_numpy(zero_copy_only=False)
        ui = np.searchsorted(sv, u)
        if mode == "select":
            m = ss[ui] == 0          # active sources only
        else:
            m = ss[ui] == 1          # MIS sources only
        n = int(m.sum())
        return pa.table({
            "v": pa.array(v[m], pa.int64()),
            "p": pa.array(sp[ui][m], pa.int64()),
            "st": pa.array(np.zeros(n, np.int64), pa.int64()),
            "rnd": pa.array(np.zeros(n, np.int64), pa.int64()),
            "own": pa.array(np.zeros(n, np.int64), pa.int64()),
        })

    def own_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"], "p": b["p"], "st": b["st"], "rnd": b["rnd"],
            "own": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
        })

    def n_active(ds) -> int:
        return int(ds.map_batches(
            lambda b: pa.table({"a": pa.array(
                [int((b["st"].to_numpy(zero_copy_only=False) == 0)
                     .sum())], pa.int64())}),
            batch_format="pyarrow").sum("a") or 0)

    def spill_state(ds, sdir: str) -> None:
        def stamp_s(b: pa.Table) -> pa.Table:
            v = b["v"].to_numpy(zero_copy_only=False)
            return b.append_column(
                "_part", pa.array(partition_of([v], P), pa.int64()))

        ds.map_batches(stamp_s, batch_format="pyarrow").write_parquet(
            sdir, partition_cols=["_part"])

    rnd = 0
    try:
        while n_active(state) > 0:
            rnd += 1
            sdir = os.path.join(root, f"st_{rnd}_a")
            spill_state(state, sdir)
            refs = [emit_shard.remote(pid, sdir, "select")
                    for pid in edge_pids]
            ray.wait(refs, num_returns=len(refs), fetch_local=False)
            state = exchange_by_key(
                rd.from_arrow_refs(refs).union(
                    state.map_batches(own_rows, batch_format="pyarrow")),
                "v", _mis_select_part, n_parts=P,
                proc_kwargs={"rnd": rnd}).materialize()
            shutil.rmtree(sdir, ignore_errors=True)

            sdir = os.path.join(root, f"st_{rnd}_b")
            spill_state(state, sdir)
            refs = [emit_shard.remote(pid, sdir, "dominate")
                    for pid in edge_pids]
            ray.wait(refs, num_returns=len(refs), fetch_local=False)
            state = exchange_by_key(
                rd.from_arrow_refs(refs).union(
                    state.map_batches(own_rows, batch_format="pyarrow")),
                "v", _mis_dominate_part, n_parts=P).materialize()
            shutil.rmtree(sdir, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    def out(b: pa.Table) -> pa.Table:
        st = b["st"].to_numpy(zero_copy_only=False)
        return pa.table({
            "v": b["v"],
            "in_mis": pa.array((st == 1).astype(np.int64), pa.int64()),
            "round_joined": pa.array(b["rnd"], pa.int64()),
        })

    return state.map_batches(out, batch_format="pyarrow")


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
