"""Frequent co-occurring item pairs (market-basket support counting).

The pairwise itemset-mining primitive over the order/lineitem star: for
every unordered pair of distinct parts appearing in the same order,
count supporting orders and return the global top-k by support.

Distributed shape: one file-exchange by ``l_orderkey`` (each order's
rows land whole in one partition), then a single vectorized pass per
partition — lexsort, (order, part) dedup, per-order pair generation with
repeat/cumsum index arithmetic (no per-order Python loop), and a
``np.unique`` partial count so only (pair_key, partial_count) rows leave
the task (pair-cardinality, not pair-instance-cardinality). A small
``groupby(pair_key).sum`` merges partials, per-batch partial top-k bounds
what reaches the driver at k rows per block, and the final merge
decomposes ``pair_key = p1 << 32 | p2``.

Pair explosion is bounded by order width (sum of C(m,2) per order — m is
single-digit in this schema), not by corpus size; a pathological wide
basket would be capped upstream, documented here as the partitioning
assumption.

Reference relationship: none (no itemset mining in the reference); pins
the per-group pair-generation + partial-count machinery (same index
arithmetic family as the n-gram shingle generators in
`rayse/ops/dedup.py`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TOP_K = 30
_SHIFT = np.int64(32)


def _pair_counts_partition(t: pa.Table) -> pa.Table:
    """All lineitem rows of this partition's orders -> partial
    (pair_key, cnt) counts."""
    empty = pa.table({"pair_key": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
    pk = t["l_partkey"].to_numpy(zero_copy_only=False)
    order = np.lexsort((pk, ok))
    ok, pk = ok[order], pk[order]
    dup = np.r_[False, (ok[1:] == ok[:-1]) & (pk[1:] == pk[:-1])]
    ok, pk = ok[~dup], pk[~dup]
    if ok.size < 2:
        return empty

    new = np.r_[True, ok[1:] != ok[:-1]]
    gstart = np.flatnonzero(new)
    gsize = np.diff(np.r_[gstart, ok.size])
    rowg = np.repeat(gstart, gsize)            # group start per row
    w = np.arange(ok.size) - rowg              # within-group index
    total = int(w.sum())
    if total == 0:
        return empty
    big_idx = np.repeat(np.arange(ok.size), w)
    out_off = np.r_[0, np.cumsum(w)[:-1]]
    small_idx = (np.arange(total) - np.repeat(out_off, w)
                 + np.repeat(rowg, w))
    # within an order parts are sorted ascending and deduped, so
    # pk[small_idx] < pk[big_idx] always
    key = (pk[small_idx].astype(np.int64) << _SHIFT) | pk[big_idx]
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table({"pair_key": pa.array(uk, pa.int64()),
                     "cnt": pa.array(cnt.astype(np.int64), pa.int64())})


def _partial_topk(batch: pa.Table, k: int) -> pa.Table:
    key = batch["pair_key"].to_numpy(zero_copy_only=False)
    cnt = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -cnt))[:k]
    return pa.table({
        "pair_key": pa.array(key[order], pa.int64()),
        "support": pa.array(cnt[order].astype(np.int64), pa.int64()),
    })


def frequent_pairs(sf_dir: str, k: int = TOP_K) -> pa.Table:
    """(p1, p2, support): top-``k`` co-occurring part pairs by
    supporting-order count (ties: ascending pair) — DuckDB hash-matched
    against the self-join oracle."""
    import functools

    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    partials = exchange_by_key(ds, "l_orderkey", _pair_counts_partition)
    agg = partials.groupby("pair_key").sum("cnt")
    tops = agg.map_batches(functools.partial(_partial_topk, k=k),
                           batch_format="pyarrow")
    tbl = pa.concat_tables(
        [t for t in ray.get(tops.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    key = tbl["pair_key"].to_numpy(zero_copy_only=False)
    sup = tbl["support"].to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -sup))[:k]
    key, sup = key[order], sup[order]
    return pa.table({
        "p1": pa.array(key >> _SHIFT, pa.int64()),
        "p2": pa.array(key & np.int64(0xFFFFFFFF), pa.int64()),
        "support": pa.array(sup, pa.int64()),
    })


def frequent_pairs_sql(k: int = TOP_K) -> str:
    return f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT p1, p2, CAST(count(*) AS BIGINT) AS support
FROM p GROUP BY p1, p2
ORDER BY support DESC, p1, p2
LIMIT {k}"""


def _item_counts_partition(t: pa.Table) -> pa.Table:
    """Partition-local (part -> supporting-order count, n_orders):
    orders are whole per partition, so distinct (order, part) resolves
    locally."""
    empty = pa.table({"part": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64()),
                      "orders": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = np.unique(ok * (np.int64(1) << _SHIFT) + pk)
    parts = key & np.int64(0xFFFFFFFF)
    up, cnt = np.unique(parts, return_counts=True)
    n_orders = int(np.unique(ok).size)
    return pa.table({
        "part": pa.array(np.concatenate(([-1], up)), pa.int64()),
        "cnt": pa.array(np.concatenate(([0], cnt)).astype(np.int64),
                        pa.int64()),
        "orders": pa.array(np.concatenate(
            ([n_orders], np.zeros(up.size))).astype(np.int64),
            pa.int64()),
    })


def pair_lift(sf_dir: str, k: int = TOP_K) -> pa.Table:
    """(p1, p2, support, lift_ppm): association lift for the top-k
    support pairs — lift = P(ab) / (P(a)P(b)) as the exact integer
    support·n_orders·1e6 // (c_a·c_b). Item counts ride the SAME
    order-local exchange as the pair counts — DuckDB hash-matched."""
    import ray

    from .exchange import exchange_by_key

    pairs = frequent_pairs(sf_dir, k=k)

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    partials = exchange_by_key(ds, "l_orderkey",
                               _item_counts_partition)
    agg = (partials.groupby("part")
           .aggregate(rd.aggregate.Sum("cnt"),
                      rd.aggregate.Sum("orders")))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    part = tbl["part"].to_numpy(zero_copy_only=False)
    cnt = tbl["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
    orders = tbl["sum(orders)"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    n_orders = int(orders[part == -1].sum())
    real = part != -1
    order = np.argsort(part[real], kind="stable")
    pk, pc = part[real][order], cnt[real][order]

    p1 = pairs["p1"].to_numpy(zero_copy_only=False)
    p2 = pairs["p2"].to_numpy(zero_copy_only=False)
    sup = pairs["support"].to_numpy(zero_copy_only=False)
    c1 = pc[np.searchsorted(pk, p1)]
    c2 = pc[np.searchsorted(pk, p2)]
    lift = [int(s) * n_orders * 1_000_000 // (int(a) * int(b))
            for s, a, b in zip(sup, c1, c2)]
    return pa.table({
        "p1": pa.array(p1, pa.int64()),
        "p2": pa.array(p2, pa.int64()),
        "support": pa.array(sup, pa.int64()),
        "lift_ppm": pa.array(lift, pa.int64()),
    })


def pair_lift_sql(k: int = TOP_K) -> str:
    return f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS HUGEINT) AS n_orders
      FROM lineitem),
ic AS (SELECT l_partkey, CAST(count(*) AS HUGEINT) AS c
       FROM d GROUP BY l_partkey),
p AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(count(*) AS HUGEINT) AS support
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  ORDER BY support DESC, p1, p2
  LIMIT {k})
SELECT p1, p2, CAST(support AS BIGINT) AS support,
       CAST(support * (SELECT n_orders FROM n) * 1000000
            // (ca.c * cb.c) AS BIGINT) AS lift_ppm
FROM p JOIN ic ca ON ca.l_partkey = p1
       JOIN ic cb ON cb.l_partkey = p2
ORDER BY support DESC, p1, p2"""
