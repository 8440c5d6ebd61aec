"""Deterministic random-walk corpus (DeepWalk, Perozzi et al. 2014) —
the embedding-training corpus generator: fixed-length walks whose
"randomness" is the splitmix draw idx = mix(walk·64 + step) mod deg,
so the corpus is a pure function of the graph (re-runs, partitioning
and the SQL oracle all agree bit-for-bit — the repo's deterministic-
seed recipe applied to sequential sampling).

Distributed shape per step: the walk-position vector (n_walks ints)
broadcasts; ONE edges-stream pass gathers the neighbours of watched
vertices only (per-batch partials bounded by Σdeg(watched) — frontier-
sized, never corpus-sized); the driver picks each walk's idx-th
ascending neighbour. Walks advance in lockstep — L passes total.

Oracle: a recursive CTE stepping every walk with the identical draw,
the neighbour picked by ORDER BY b LIMIT 1 OFFSET idx.

Reference relationship: none (embedding-prep family, next to
`gprop` / `wl`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import _mix

DW_WALKS = 10
DW_LEN = 8


def deepwalk_corpus(sf_dir: str, n_walks: int = DW_WALKS,
                    length: int = DW_LEN) -> pa.Table:
    """(walk, step, vertex): one walk per seed (the ``n_walks``
    smallest vertices), ``length`` deterministic steps — DuckDB
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
    seeds = verts[:n_walks]

    pos = seeds.copy().astype(np.int64)
    out_w, out_s, out_v = [], [], []
    for w, p in zip(seeds.tolist(), pos.tolist()):
        out_w.append(int(w))
        out_s.append(0)
        out_v.append(int(p))

    for step in range(1, length + 1):
        watch = np.unique(pos)
        ref = ray.put(watch)

        def gather(batch: pa.Table) -> pa.Table:
            ws = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            mu = np.isin(u, ws)
            mv = np.isin(v, ws)
            x = np.concatenate([u[mu], v[mv]])
            nb = np.concatenate([v[mu], u[mv]])
            return pa.table({"x": pa.array(x, pa.int64()),
                             "nb": pa.array(nb, pa.int64())})

        nbrs = pa.concat_tables(
            [t for t in ray.get(
                edges.map_batches(gather, batch_format="pyarrow")
                .to_arrow_refs()) if t.num_rows],
            promote_options="default")
        x = nbrs["x"].to_numpy(zero_copy_only=False)
        nb = nbrs["nb"].to_numpy(zero_copy_only=False)
        adj: dict[int, np.ndarray] = {}
        for xv in watch.tolist():
            adj[xv] = np.sort(nb[x == xv])
        for wi, w in enumerate(seeds.tolist()):
            cur = int(pos[wi])
            cand = adj[cur]
            idx = int(_mix(np.asarray([w * 64 + step],
                                      np.uint64))[0]
                      % np.uint64(cand.size))
            pos[wi] = int(cand[idx])
            out_w.append(int(w))
            out_s.append(step)
            out_v.append(int(pos[wi]))

    return pa.table({
        "walk": pa.array(out_w, pa.int64()),
        "step": pa.array(out_s, pa.int64()),
        "vertex": pa.array(out_v, pa.int64()),
    })


def deepwalk_corpus_sql(n_walks: int = DW_WALKS,
                        length: int = DW_LEN) -> str:
    from .sketch import _mix_sql_wide

    draw = _mix_sql_wide(f"(c.walk * 64 + c.step + 1)::HUGEINT")
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
wk(walk, step, vertex) AS (
  SELECT v, CAST(0 AS BIGINT), v FROM seeds
  UNION ALL
  SELECT c.walk, c.step + 1,
         (SELECT r.b FROM (
            SELECT u2.b,
                   row_number() OVER (ORDER BY u2.b) - 1 AS rn
            FROM und u2 WHERE u2.a = c.vertex) r
          WHERE r.rn = ({draw}
            % (SELECT count(*) FROM und u3
               WHERE u3.a = c.vertex)))
  FROM wk c
  WHERE c.step < {length})
SELECT walk, step, vertex FROM wk
ORDER BY walk, step"""
