"""Strongly connected components of the directed demo link graph —
the coloring algorithm (Orzan 2004; the FW-BW family): the genuinely
DISTRIBUTED SCC construction, next to `lpa.py`'s undirected
communities and `graph.link_components`' undirected CCs.

Each outer round: (1) FORWARD min-label propagation to fixpoint —
color(v) = min vertex id that reaches v — each pass streams the edge
set once with the color vector broadcast (the pagerank shape:
per-batch per-dst min partials, one bounded groupby, driver merge);
(2) roots r (color(r) = r) extract their SCC = vertices of color r
that BACKWARD-reach r inside their color class — the same streaming
passes with the indicator flowing dst→src; (3) extracted vertices
leave the active set and the remainder recolors. Outer rounds are few
(each removes every root SCC; sink/source chains go in one sweep);
inner passes are diameter-bounded.

Correctness pin: an algorithm-equivalence oracle — DuckDB computes
the full mutual-reachability closure (recursive CTE, UNION-dedup) and
labels comp(v) = min{u : u ↔ v}; the coloring result must hash-match
exactly. (Driver state is one int per vertex — the documented
pagerank vertex bound; edges never land on the driver.)

Reference relationship: extends the Ranker's link analysis (A13
family) with the directed-component operator; no reference analog.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def scc_components(sf_dir: str) -> pa.Table:
    """(v, comp, comp_size): SCC label (min member id) per vertex —
    DuckDB hash-matched against the reachability-closure oracle."""
    import ray

    from .mst import _canonical_edges  # noqa: F401  (module marker)
    from .graph import derived_edges

    edges = derived_edges(sf_dir).materialize()
    parts = pa.concat_tables(
        [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    es = parts["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    ed = parts["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    verts = np.unique(np.concatenate([es, ed]))
    n = verts.size
    comp = np.full(n, -1, np.int64)

    def _propagate(state: np.ndarray, active: np.ndarray,
                   forward: bool, color: np.ndarray | None) -> None:
        """Min-label (or indicator) fixpoint over streamed edges.
        ``state`` updates in place; ``active`` masks the live
        subgraph; ``color`` (if given) restricts flow to same-color
        endpoints (the backward step)."""
        while True:
            ref = ray.put((verts, state.copy(), active.copy(),
                           None if color is None else color.copy()))

            def passes(batch: pa.Table) -> pa.Table:
                vs, st, act, col = ray.get(ref)
                s = batch["src"].to_numpy(zero_copy_only=False)
                d = batch["dst"].to_numpy(zero_copy_only=False)
                si = np.searchsorted(vs, s)
                di = np.searchsorted(vs, d)
                m = act[si] & act[di]
                if col is not None:
                    m &= col[si] == col[di]
                si, di = si[m], di[m]
                if forward:
                    frm, to = si, di
                else:
                    frm, to = di, si
                val = st[frm]
                uk, inv = np.unique(to, return_inverse=True)
                mn = np.full(uk.size, np.iinfo(np.int64).max, np.int64)
                np.minimum.at(mn, inv, val)
                return pa.table({
                    "i": pa.array(uk, pa.int64()),
                    "m": pa.array(mn, pa.int64())})

            agg = (edges.map_batches(passes, batch_format="pyarrow")
                   .groupby("i").min("m"))
            tlist = [t for t in ray.get(agg.to_arrow_refs())
                     if t.num_rows]
            if not tlist:
                break
            tbl = pa.concat_tables(tlist, promote_options="default")
            idx = tbl["i"].to_numpy(zero_copy_only=False)
            mn = tbl["min(m)"].to_numpy(zero_copy_only=False)
            nxt = state.copy()
            np.minimum.at(nxt, idx, mn)
            if np.array_equal(nxt, state):
                break
            state[:] = nxt

    while (comp < 0).any():
        active = comp < 0
        # (1) forward min-label coloring of the active subgraph
        color = np.where(active, verts, np.iinfo(np.int64).max)
        _propagate(color, active, forward=True, color=None)
        # (2) roots' SCCs: indicator 0 at roots, flows backward within
        # the color class (min-label with 0 = reached)
        ind = np.where(active & (color == verts), 0,
                       np.iinfo(np.int64).max)
        _propagate(ind, active, forward=False, color=color)
        member = active & (ind == 0)
        comp[member] = color[member]
        if not member.any():     # safety: cannot happen (roots are
            break                # always their own members)

    sizes = np.zeros(n, np.int64)
    uk, inv = np.unique(comp, return_inverse=True)
    cnt = np.bincount(inv)
    sizes = cnt[inv]
    return pa.table({
        "v": pa.array(verts, pa.int64()),
        "comp": pa.array(comp, pa.int64()),
        "comp_size": pa.array(sizes.astype(np.int64), pa.int64()),
    })


def scc_components_sql() -> str:
    return """
WITH RECURSIVE
e0 AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS s,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 200
              AS BIGINT) AS d
  FROM events),
verts AS (SELECT DISTINCT s AS v FROM e0
          UNION SELECT DISTINCT d FROM e0),
reach(a, b) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.a, e.d FROM reach r JOIN e0 e ON r.b = e.s),
mutual AS (
  SELECT f.a AS v, f.b AS u
  FROM reach f JOIN reach b ON f.a = b.b AND f.b = b.a),
comp AS (SELECT v, min(u) AS comp FROM mutual GROUP BY v),
sz AS (SELECT comp, CAST(count(*) AS BIGINT) AS comp_size
       FROM comp GROUP BY comp)
SELECT c.v, c.comp, sz.comp_size
FROM comp c JOIN sz USING (comp)
ORDER BY c.v"""
