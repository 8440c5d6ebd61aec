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
