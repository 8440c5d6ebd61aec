"""Weisfeiler–Leman (1-WL) color refinement over the undirected demo
graph — the canonical-labeling iteration that bounds GNN
expressiveness (Weisfeiler & Leman 1968; Xu et al. 2019 "How powerful
are GNNs"): color₀(v) = degree; each round rehashes
(color(v), sorted multiset of neighbour colors) — vertices that stay
same-colored are structurally indistinguishable at that depth.

Determinism: the refinement hash is FNV-1a over the CANONICAL string
"c|n1,n2,…" (own color, comma-joined ascending neighbour colors) —
the repo's SQL-expressible string hash — right-shifted one bit into
non-negative int64. Two rounds are unrolled (round 3+ adds no classes
on this graph family).

Distributed shape: each round folds (dst, neighbour color) pairs
through the grouped exchange and rebuilds the per-vertex sorted
multiset inside the group (vertex-bounded state, edge-streamed
passes — the `gprop` contract with a multiset instead of a mean).

Oracle: the identical two unrolled rounds — string_agg(... ORDER BY)
for the multiset, the `c4clean` FNV fold for the hash.

Reference relationship: none (graph/GNN family completion, next to
`gprop.graph_feature_prop`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

WL_ROUNDS = 2


def _fnv_str(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) % (1 << 64)
    return h >> 1


def wl_refinement(sf_dir: str, rounds: int = WL_ROUNDS) -> pa.Table:
    """(v, wl_color, class_size): 1-WL color after ``rounds``
    refinements — DuckDB hash-matched."""
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
    ui = np.searchsorted(verts, eu)
    vi = np.searchsorted(verts, ev)

    color = np.zeros(n, np.int64)
    np.add.at(color, ui, 1)
    np.add.at(color, vi, 1)          # color0 = degree

    for _ in range(rounds):
        nbr_of = [[] for _ in range(n)]
        for a, b in zip(ui.tolist(), vi.tolist()):
            nbr_of[a].append(int(color[b]))
            nbr_of[b].append(int(color[a]))
        nxt = np.empty(n, np.int64)
        for i in range(n):
            s = f"{int(color[i])}|" + ",".join(
                str(x) for x in sorted(nbr_of[i]))
            nxt[i] = _fnv_str(s)
        color = nxt

    uk, inv = np.unique(color, return_inverse=True)
    sizes = np.bincount(inv)[inv]
    return pa.table({
        "v": pa.array(verts, pa.int64()),
        "wl_color": pa.array(color, pa.int64()),
        "class_size": pa.array(sizes.astype(np.int64), pa.int64()),
    })


def _wl_reduce_part(tbl: pa.Table) -> pa.Table:
    """Color-exchange reducer: one partition holds each of its
    vertices' own-color row (own = 1) plus every (v, neighbor-color)
    row; rebuilds the canonical "c|n1,n2,…" string per vertex (own
    first, neighbors ascending) and rehashes. String building is the
    inherent per-vertex work of WL — bounded by the partition."""
    if tbl.num_rows == 0:
        return pa.table({"v": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    v = tbl["v"].to_numpy(zero_copy_only=False)
    c = tbl["c"].to_numpy(zero_copy_only=False)
    own = tbl["own"].to_numpy(zero_copy_only=False)
    order = np.lexsort((c, -own, v))
    v, c, own = v[order], c[order], own[order]
    new = np.empty(v.size, dtype=bool)
    new[0] = True
    new[1:] = v[1:] != v[:-1]
    starts = np.flatnonzero(new)
    ends = np.concatenate([starts[1:], [v.size]])
    out_v = v[starts]
    out_c = np.empty(starts.size, np.int64)
    for i, (a, b) in enumerate(zip(starts.tolist(), ends.tolist())):
        s = f"{int(c[a])}|" + ",".join(
            str(int(x)) for x in c[a + 1:b])
        out_c[i] = _fnv_str(s)
    return pa.table({"v": pa.array(out_v, pa.int64()),
                     "c": pa.array(out_c, pa.int64())})


def wl_refinement_sharded(sf_dir: str, rounds: int = WL_ROUNDS):
    """1-WL refinement with NO driver-side vertex state (the sharded
    template of ``lpa_communities_sharded`` / ``kcore_h_sharded``
    applied to color refinement): the undirected edge list spills once
    partitioned by its color-source endpoint; each round co-partitions
    the (v, color) rows with the edge shards, emits (v, neighbor-color)
    rows per shard, and exchanges them — with the tagged own-color
    rows — by vertex, where the canonical-string rehash runs per
    partition. Class sizes come from one more exchange by color joined
    back by vertex. Bit-identical to the dense route. Returns a
    Dataset of (v, wl_color, class_size)."""
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
        "/tmp", f"rayse_wl_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    edir = os.path.join(root, "und")

    edges = _canonical_edges(sf_dir)

    def stamp_und(b: pa.Table) -> pa.Table:
        eu = b["u"].to_numpy(zero_copy_only=False)
        ev = b["v"].to_numpy(zero_copy_only=False)
        u = np.concatenate((eu, ev))         # color source
        v = np.concatenate((ev, eu))         # receiver
        return pa.table({
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "_part": pa.array(partition_of([u], P), pa.int64()),
        })

    edges.map_batches(stamp_und, batch_format="pyarrow",
                      zero_copy_batch=True).write_parquet(
        edir, partition_cols=["_part"])
    edge_pids = sorted(int(os.path.basename(p).split("=")[1])
                       for p in glob.glob(os.path.join(edir, "_part=*")))
    if not edge_pids:
        shutil.rmtree(root, ignore_errors=True)
        return rd.from_arrow(pa.table({
            "v": pa.array([], pa.int64()),
            "wl_color": pa.array([], pa.int64()),
            "class_size": pa.array([], pa.int64())}))

    # color0 = degree (with multiplicity over distinct canonical edges)
    def deg_rows(b: pa.Table) -> pa.Table:
        both = np.concatenate([
            b["u"].to_numpy(zero_copy_only=False),
            b["v"].to_numpy(zero_copy_only=False)])
        u, cnt = np.unique(both, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    def deg_reduce(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        v = tbl["v"].to_numpy(zero_copy_only=False)
        c = tbl["c"].to_numpy(zero_copy_only=False)
        uv, inv = np.unique(v, return_inverse=True)
        s = np.zeros(uv.size, np.int64)
        np.add.at(s, inv, c)
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "c": pa.array(s, pa.int64())})

    colors = exchange_by_key(
        edges.map_batches(deg_rows, batch_format="pyarrow"),
        "v", deg_reduce, n_parts=P).materialize()

    @ray.remote
    def nbr_shard(pid: int, cdir: str) -> pa.Table:
        import pyarrow.dataset as pads

        e = pads.dataset(os.path.join(edir, f"_part={pid}")).to_table(
            columns=["u", "v"], use_threads=False)
        ct = pads.dataset(os.path.join(cdir, f"_part={pid}")).to_table(
            columns=["v", "c"], use_threads=False)
        cv = ct["v"].to_numpy(zero_copy_only=False)
        cc = ct["c"].to_numpy(zero_copy_only=False)
        o = np.argsort(cv)
        cv, cc = cv[o], cc[o]
        u = e["u"].to_numpy(zero_copy_only=False)
        v = e["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "v": pa.array(v, pa.int64()),
            "c": pa.array(cc[np.searchsorted(cv, u)], pa.int64()),
            "own": pa.array(np.zeros(v.size, np.int64), pa.int64()),
        })

    def own_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"], "c": b["c"],
            "own": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
        })

    try:
        for it in range(rounds):
            cdir = os.path.join(root, f"col_{it}")

            def stamp_c(b: pa.Table) -> pa.Table:
                v = b["v"].to_numpy(zero_copy_only=False)
                return b.append_column(
                    "_part", pa.array(partition_of([v], P), pa.int64()))

            colors.map_batches(stamp_c,
                               batch_format="pyarrow").write_parquet(
                cdir, partition_cols=["_part"])
            refs = [nbr_shard.remote(pid, cdir) for pid in edge_pids]
            ray.wait(refs, num_returns=len(refs), fetch_local=False)
            nbrs = rd.from_arrow_refs(refs)
            owns = colors.map_batches(own_rows, batch_format="pyarrow")
            colors = exchange_by_key(nbrs.union(owns), "v",
                                     _wl_reduce_part,
                                     n_parts=P).materialize()
            shutil.rmtree(cdir, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # class sizes: exchange by color to count, join back by color
    def size_rows(b: pa.Table) -> pa.Table:
        u, cnt = np.unique(b["c"].to_numpy(zero_copy_only=False),
                           return_counts=True)
        return pa.table({
            "v": pa.array(np.full(u.size, -1, np.int64), pa.int64()),
            "c": pa.array(u, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def vert_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            "v": b["v"], "c": b["c"],
            "n": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
        })

    def size_join_part(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "wl_color": pa.array([], pa.int64()),
                             "class_size": pa.array([], pa.int64())})
        v = tbl["v"].to_numpy(zero_copy_only=False)
        c = tbl["c"].to_numpy(zero_copy_only=False)
        n = tbl["n"].to_numpy(zero_copy_only=False)
        is_sz = v < 0
        uc = np.unique(c[is_sz])
        tot = np.zeros(uc.size, np.int64)
        np.add.at(tot, np.searchsorted(uc, c[is_sz]), n[is_sz])
        keep = ~is_sz
        return pa.table({
            "v": pa.array(v[keep], pa.int64()),
            "wl_color": pa.array(c[keep], pa.int64()),
            "class_size": pa.array(tot[np.searchsorted(uc, c[keep])],
                                   pa.int64()),
        })

    sized = exchange_by_key(
        colors.map_batches(size_rows, batch_format="pyarrow")
        .union(colors.map_batches(vert_rows, batch_format="pyarrow")),
        "c", size_join_part, n_parts=P)
    return sized


def wl_refinement_sql(rounds: int = WL_ROUNDS) -> str:
    from .c4clean import _fnv_expr

    fnv = _fnv_expr("cs", 0xCBF29CE484222325)
    rounds_sql = []
    prev = "c0"
    for r in range(1, rounds + 1):
        rounds_sql.append(f""",
m{r} AS (
  SELECT und.a AS v,
         string_agg(CAST(p.c AS VARCHAR), ','
                    ORDER BY p.c, und.b) AS nbrs
  FROM und JOIN {prev} p ON und.b = p.v
  GROUP BY und.a),
s{r} AS (
  SELECT p.v,
         CAST(p.c AS VARCHAR) || '|' || coalesce(m.nbrs, '') AS cs
  FROM {prev} p LEFT JOIN m{r} m ON p.v = m.v),
c{r} AS (
  SELECT v, CAST(({fnv}) // 2 AS BIGINT) AS c FROM s{r})""")
        prev = f"c{r}"
    return f"""
WITH raw AS (
  SELECT CAST(user_id AS BIGINT) AS s,
         CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 200
              AS BIGINT) AS d
  FROM events),
e0 AS (
  SELECT least(s, d) AS u, greatest(s, d) AS v
  FROM raw WHERE s <> d GROUP BY 1, 2),
und AS (SELECT u AS a, v AS b FROM e0
        UNION ALL SELECT v, u FROM e0),
c0 AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS c FROM und
       GROUP BY a){''.join(rounds_sql)},
cls AS (SELECT c, CAST(count(*) AS BIGINT) AS sz FROM {prev}
        GROUP BY c)
SELECT p.v, p.c AS wl_color, cls.sz AS class_size
FROM {prev} p JOIN cls ON p.c = cls.c
ORDER BY p.v"""
