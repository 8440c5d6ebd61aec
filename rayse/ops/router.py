"""Adaptive join routing — the standing routing policy (broadcast for
small sides, co-partitioned exchange hash join for big⋈big, range
merge join when ordered output matters) formalized as EXECUTABLE code
instead of a per-pipeline convention.

``route_join`` inspects the right side's row count (parquet metadata
when available — zero data read — else a cheap ``count()``) and picks:

  rows <= BROADCAST_ROWS  ->  'broadcast': the right table ships ONCE
                              via ray.put as sorted key + column
                              arrays; every left batch gathers by
                              searchsorted (row-local, no shuffle)
  otherwise               ->  'hash': `exchange.hash_join` (both sides
                              spill co-partitioned, one Arrow join per
                              partition)

The demo query runs one join through EACH route and tags rows with
the route actually taken, so the routing DECISION itself is pinned by
the DuckDB oracle (route tags are constants under the deterministic
thresholds — a wrong route flips the tag and fails the hash).

Reference relationship: none; executable form of the policy stated in
`tpch.py` / `exchange.hash_join` docstrings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BROADCAST_ROWS = 10_000


def _right_rows(path: str | None, right_ds) -> int:
    if path is not None:
        import pyarrow.parquet as pq

        return pq.read_metadata(path).num_rows
    return right_ds.count()


def route_join(left_ds, right_path: str, left_on: str, right_on: str,
               right_columns: list):
    """Join ``left_ds`` with the parquet table at ``right_path`` on the
    given int keys, routing by right-side size. Returns (Dataset,
    route_tag). Right columns must not collide with left names."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    n_right = _right_rows(right_path, None)
    if n_right <= BROADCAST_ROWS:
        t = pq.read_table(right_path,
                          columns=[right_on] + right_columns)
        keys = t[right_on].to_numpy(zero_copy_only=False).astype(
            np.int64)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        cols = {c: t[c].take(pa.array(order)) for c in right_columns}
        ref = ray.put((keys, cols))

        def gather(batch: pa.Table) -> pa.Table:
            ks, cs = ray.get(ref)
            lk = batch[left_on].to_numpy(zero_copy_only=False)
            j = np.searchsorted(ks, lk)
            j = np.minimum(j, ks.size - 1)
            hit = ks[j] == lk
            sub = batch.filter(pa.array(hit))
            jj = pa.array(j[hit], pa.int64())
            for c in right_columns:
                sub = sub.append_column(c, cs[c].take(jj))
            return sub

        return (left_ds.map_batches(gather, batch_format="pyarrow"),
                "broadcast")

    from .exchange import hash_join

    right_ds = rd.read_parquet(right_path,
                               columns=[right_on] + right_columns)
    return (hash_join(left_ds, right_ds, left_on, right_on), "hash")


def routed_joins(sf_dir: str) -> pa.Table:
    """(route, key, n): one small-dim join (orders⋈customer ->
    mktsegment counts; must route broadcast) and one big⋈big join
    (lineitem⋈orders -> priority counts; must route hash), each tagged
    with the route taken — DuckDB hash-matched including the tags."""
    import ray
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    j1, route1 = route_join(orders, f"{sf_dir}/customer.parquet",
                            "o_custkey", "c_custkey",
                            ["c_mktsegment"])

    def p1(batch: pa.Table) -> pa.Table:
        seg = np.asarray(batch["c_mktsegment"].to_pylist(),
                         dtype=object)
        uk, cnt = np.unique(seg.astype(str), return_counts=True)
        return pa.table({
            "key": pa.array(uk.tolist(), pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey"])
    j2, route2 = route_join(line, f"{sf_dir}/orders.parquet",
                            "l_orderkey", "o_orderkey",
                            ["o_orderpriority"])

    def p2(batch: pa.Table) -> pa.Table:
        pr = np.asarray(batch["o_orderpriority"].to_pylist(),
                        dtype=object)
        uk, cnt = np.unique(pr.astype(str), return_counts=True)
        return pa.table({
            "key": pa.array(uk.tolist(), pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    outs = []
    for j, proc, route in ((j1, p1, route1), (j2, p2, route2)):
        agg = (j.map_batches(proc, batch_format="pyarrow")
               .groupby("key").sum("n"))
        t = pa.concat_tables(
            [x for x in ray.get(agg.to_arrow_refs()) if x.num_rows],
            promote_options="default")
        outs.append(pa.table({
            "route": pa.array([route] * t.num_rows, pa.string()),
            "key": t["key"],
            "n": pa.compute.cast(t["sum(n)"], pa.int64()),
        }))
    out = pa.concat_tables(outs)
    idx = pa.compute.sort_indices(
        out, sort_keys=[("route", "ascending"), ("key", "ascending")])
    return out.take(idx)


def routed_joins_sql() -> str:
    """The oracle mirrors the DECISION RULE, not its outcome: route
    tags come from the same right-side row-count threshold, so the
    pin stays true at any scale factor."""
    return f"""
SELECT route, key, n FROM (
  SELECT CASE WHEN (SELECT count(*) FROM customer)
                   <= {BROADCAST_ROWS}
              THEN 'broadcast' ELSE 'hash' END AS route,
         c_mktsegment AS key, CAST(count(*) AS BIGINT) AS n
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
  UNION ALL
  SELECT CASE WHEN (SELECT count(*) FROM orders)
                   <= {BROADCAST_ROWS}
              THEN 'broadcast' ELSE 'hash' END,
         o_orderpriority, CAST(count(*) AS BIGINT)
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_orderpriority)
ORDER BY route, key"""
