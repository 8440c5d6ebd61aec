"""Graph feature propagation — two rounds of neighbor mean-aggregation
over the undirected demo link graph: the GraphSAGE/GCN message-passing
primitive (Hamilton et al. 2017) stripped to its distributed skeleton.
x0 = degree; x_{t+1}(v) = Σ_{u∈N(v)} x_t(u) // |N(v)| (truncating —
DuckDB ``//`` parity; degrees are positive so floor == trunc).

Distributed shape: the canonical distinct edge set streams per round
(the Borůvka/pagerank edge contract) while the feature vector — one
int per vertex — rides a `ray.put` broadcast; each batch emits
per-dst partial (sum, cnt) rows bounded by vertices × blocks, one
groupby folds them, and the driver applies the division. Two rounds ==
two edge passes; at 100 TB the feature vector is the only dense state
(the documented pagerank vertex bound).

Oracle: the same two rounds as chained SQL joins over the distinct
undirected edge list with integer ``sum // count`` means.

Reference relationship: extends the Ranker's degree statistics
(`Ranker1.java`) one message-passing hop further; no reference analog.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .mst import H_A  # noqa: F401  (module relationship marker)


def graph_feature_prop(sf_dir: str, rounds: int = 2) -> pa.Table:
    """(v, x0, x1, x2): degree feature and two truncating-mean
    propagation rounds — DuckDB hash-matched."""
    import ray
    import ray.data as rd  # noqa: F401

    from .mst import _canonical_edges

    edges = _canonical_edges(sf_dir).materialize()
    parts = pa.concat_tables(
        [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    eu = parts["u"].to_numpy(zero_copy_only=False)
    ev = parts["v"].to_numpy(zero_copy_only=False)
    verts = np.unique(np.concatenate([eu, ev]))

    # x0 = degree (distinct-neighbor count on the canonical edge set)
    deg = np.zeros(verts.size, np.int64)
    np.add.at(deg, np.searchsorted(verts, eu), 1)
    np.add.at(deg, np.searchsorted(verts, ev), 1)

    xs = [deg]
    for _ in range(rounds):
        state_ref = ray.put((verts, xs[-1]))

        def nbr_partial(batch: pa.Table) -> pa.Table:
            vs, x = ray.get(state_ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            xu = x[np.searchsorted(vs, u)]
            xv = x[np.searchsorted(vs, v)]
            node = np.concatenate([u, v])
            val = np.concatenate([xv, xu])
            uk, inv = np.unique(node, return_inverse=True)
            return pa.table({
                "node": pa.array(uk, pa.int64()),
                "s": pa.array(np.bincount(inv, val, uk.size)
                              .astype(np.int64), pa.int64()),
                "c": pa.array(np.bincount(inv, None, uk.size)
                              .astype(np.int64), pa.int64()),
            })

        agg = (edges.map_batches(nbr_partial, batch_format="pyarrow")
               .groupby("node").sum(["s", "c"]))
        tbl = pa.concat_tables(
            [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
            promote_options="default")
        node = tbl["node"].to_numpy(zero_copy_only=False)
        s = tbl["sum(s)"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        c = tbl["sum(c)"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        nxt = np.zeros(verts.size, np.int64)
        nxt[np.searchsorted(verts, node)] = s // c
        xs.append(nxt)

    return pa.table({
        "v": pa.array(verts, pa.int64()),
        "x0": pa.array(xs[0], pa.int64()),
        "x1": pa.array(xs[1], pa.int64()),
        "x2": pa.array(xs[2], pa.int64()),
    })


def graph_feature_prop_sql() -> str:
    return """
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
x0 AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS x FROM und
       GROUP BY a),
x1 AS (
  SELECT und.a AS v, CAST(sum(n.x) // count(*) AS BIGINT) AS x
  FROM und JOIN x0 n ON und.b = n.v
  GROUP BY und.a),
x2 AS (
  SELECT und.a AS v, CAST(sum(n.x) // count(*) AS BIGINT) AS x
  FROM und JOIN x1 n ON und.b = n.v
  GROUP BY und.a)
SELECT x0.v, x0.x AS x0, x1.x AS x1, x2.x AS x2
FROM x0 JOIN x1 USING (v) JOIN x2 USING (v)
ORDER BY v"""
