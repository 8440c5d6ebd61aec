"""Classic decision-support join pipelines over the star schema —
TPC-H Q3 (shipping priority) and Q10 (returned-item reporting) analogs.

These are the join-shape gaps in the relational family: Q3 is a
selective dim-filter -> fact⋈fact -> grouped top-N; Q10 is fact⋈fact
-> grouped top-N -> dimension hydration. Join routing follows the
repo's standing policy (`revenue_by_region`): the big⋈big edge
(lineitem ⋈ orders) runs through the co-partitioned file-exchange hash
join (`exchange.hash_join` — both sides spilled by mix(orderkey), one
vectorized Arrow join per partition), dimension chains collapse to ONE
broadcast map (`ray.put` once, read in every task), and filters push
into the parquet read so only surviving columns/rows leave storage.

INTEGER-EXACT contract: revenue quantizes per ROW to 1e-4 currency
units — round(extendedprice * (1 - discount) * 10000), DuckDB's
half-away-from-zero — before any sum, so aggregates are
order-independent int64 and the SQL oracle matches bit-for-bit.

Reference relationship: none (the reference has no relational layer);
these pin the generic join/topk machinery the engine exposes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

Q3_SEGMENT = "BUILDING"
Q3_CUT = "1998-01-01"
Q10_LO = "1999-01-01"
Q10_HI = "1999-07-01"


def _rev_q(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    """Per-row 1e-4-unit revenue (DuckDB round parity)."""
    from .relational import _cents

    return _cents(price * (1.0 - disc), 10000.0)


def _ts(date: str) -> np.datetime64:
    return np.datetime64(date)


def shipping_priority(sf_dir: str, k: int = 10) -> pa.Table:
    """(o_orderkey, revenue, o_orderdate, o_orderpriority): top-``k``
    unshipped-revenue orders in the segment (Q3 analog)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .exchange import hash_join

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keep = np.sort(pc.filter(
        cust["c_custkey"],
        pc.equal(cust["c_mktsegment"], Q3_SEGMENT)).to_numpy(
            zero_copy_only=False))
    keep_ref = ray.put(keep)
    cut = _ts(Q3_CUT)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])

    def filt_orders(batch: pa.Table) -> pa.Table:
        ck = ray.get(keep_ref)
        cust_arr = batch["o_custkey"].to_numpy(zero_copy_only=False)
        dt = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        j = np.searchsorted(ck, cust_arr)
        j_c = np.minimum(j, ck.size - 1)
        m = (dt < cut) & (ck[j_c] == cust_arr)
        return batch.filter(pa.array(m)).select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"])

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def filt_line(batch: pa.Table) -> pa.Table:
        dt = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(dt > cut))
        rev = _rev_q(sub["l_extendedprice"].to_numpy(zero_copy_only=False),
                     sub["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": sub["l_orderkey"],
                         "rev": pa.array(rev, pa.int64())})

    j = hash_join(
        line.map_batches(filt_line, batch_format="pyarrow"),
        orders.map_batches(filt_orders, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")
    agg = (j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
           .sum("rev"))

    def partial_topk(batch: pa.Table) -> pa.Table:
        rev = batch["sum(rev)"].to_numpy(zero_copy_only=False)
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -rev))[:k]
        return pa.table({
            "o_orderkey": pa.array(key[order], pa.int64()),
            "revenue": pa.array(rev[order].astype(np.int64), pa.int64()),
            "o_orderdate": pc.take(batch["o_orderdate"],
                                   pa.array(order, pa.int64())),
            "o_orderpriority": pc.take(batch["o_orderpriority"],
                                       pa.array(order, pa.int64())),
        })

    tbl = pa.concat_tables(
        [t for t in ray.get(agg.map_batches(
            partial_topk, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows], promote_options="default")
    rev = tbl["revenue"].to_numpy(zero_copy_only=False)
    key = tbl["o_orderkey"].to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -rev))[:k]
    idx = pa.array(order, pa.int64())
    return pa.table({
        "o_orderkey": pc.take(tbl["o_orderkey"], idx),
        "revenue": pc.take(tbl["revenue"], idx),
        # pin microsecond precision: the exchange spill can degrade the
        # parquet timestamp unit, and the driver compare hashes epoch ints
        "o_orderdate": pc.cast(pc.take(tbl["o_orderdate"], idx),
                               pa.timestamp("us")),
        "o_orderpriority": pc.take(tbl["o_orderpriority"], idx),
    })


def shipping_priority_sql(k: int = 10) -> str:
    return f"""
SELECT o_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUT}'
  AND l_shipdate > TIMESTAMP '{Q3_CUT}'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT {k}"""


def returned_items(sf_dir: str, k: int = 20) -> pa.Table:
    """(c_custkey, c_name, n_name, revenue): top-``k`` customers by
    revenue lost to returned items in the window (Q10 analog)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .exchange import hash_join

    lo, hi = _ts(Q10_LO), _ts(Q10_HI)
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_orders(batch: pa.Table) -> pa.Table:
        dt = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((dt >= lo) & (dt < hi))).select(
            ["o_orderkey", "o_custkey"])

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])

    def filt_line(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        rev = _rev_q(sub["l_extendedprice"].to_numpy(zero_copy_only=False),
                     sub["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": sub["l_orderkey"],
                         "rev": pa.array(rev, pa.int64())})

    j = hash_join(
        line.map_batches(filt_line, batch_format="pyarrow"),
        orders.map_batches(filt_orders, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")
    agg = j.groupby("o_custkey").sum("rev")

    def partial_topk(batch: pa.Table) -> pa.Table:
        rev = batch["sum(rev)"].to_numpy(zero_copy_only=False)
        key = batch["o_custkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -rev))[:k]
        return pa.table({
            "c_custkey": pa.array(key[order], pa.int64()),
            "revenue": pa.array(rev[order].astype(np.int64), pa.int64()),
        })

    tops = pa.concat_tables([
        t for t in ray.get(agg.map_batches(
            partial_topk, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows], promote_options="default")
    rev = tops["revenue"].to_numpy(zero_copy_only=False)
    key = tops["c_custkey"].to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -rev))[:k]
    sel_k = key[order]
    sel_r = rev[order]

    # hydrate the k winners from the broadcast-sized dimension chain
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    c2n = dict(zip(cust["c_custkey"].to_pylist(),
                   zip(cust["c_name"].to_pylist(),
                       cust["c_nationkey"].to_pylist())))
    n2n = dict(zip(nat["n_nationkey"].to_pylist(),
                   nat["n_name"].to_pylist()))
    return pa.table({
        "c_custkey": pa.array(sel_k, pa.int64()),
        "c_name": pa.array([c2n[int(c)][0] for c in sel_k], pa.string()),
        "n_name": pa.array([n2n[c2n[int(c)][1]] for c in sel_k],
                           pa.string()),
        "revenue": pa.array(sel_r, pa.int64()),
    })


def returned_items_sql(k: int = 20) -> str:
    return f"""
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     JOIN customer ON o_custkey = c_custkey
     JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_LO}'
  AND o_orderdate < TIMESTAMP '{Q10_HI}'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT {k}"""


def segment_coverage(sf_dir: str) -> pa.Table:
    """(c_mktsegment, n_customers, n_with_orders, coverage_ppm): the
    LEFT OUTER join completion of the join family — every customer
    kept, order existence tested, grouped by segment with the floored
    ppm coverage rate.

    Shape: customers LEFT OUTER orders through the co-partitioned
    file-exchange hash join (`exchange.hash_join(join_type='left
    outer')` — single-sided partitions surface the unmatched rows), a
    per-batch (segment, has-order) partial count (the join output is
    order-instance-cardinality; distinct-customer accounting dedupes by
    c_custkey inside the partition-local batch, which is exact because
    the join co-partitions by customer), and one segment groupby.
    DuckDB hash-matched."""
    import numpy as np
    import ray
    import ray.data as rd

    from .exchange import hash_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def mark(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "has_o", pa.array(np.ones(batch.num_rows, np.int64),
                              pa.int64()))

    j = hash_join(cust, orders.map_batches(mark,
                                           batch_format="pyarrow"),
                  "c_custkey", "o_custkey", join_type="left outer")

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        seg = np.asarray(batch["c_mktsegment"].to_pylist(),
                         dtype=object)
        # left outer: unmatched customers carry one row; matched carry
        # one row per order (Arrow drops the right key, so a constant
        # has_o marker on the right side is the null-filled signal).
        matched = pa.compute.is_valid(batch["has_o"]).to_numpy(
            zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        ck, seg, matched = ck[order], seg[order], matched[order]
        starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
        any_m = np.logical_or.reduceat(matched, starts)
        gseg = seg[starts]
        uk, inv = np.unique(gseg.astype(str), return_inverse=True)
        n_c = np.zeros(uk.size, np.int64)
        n_m = np.zeros(uk.size, np.int64)
        np.add.at(n_c, inv, 1)
        np.add.at(n_m, inv, any_m.astype(np.int64))
        return pa.table({
            "c_mktsegment": pa.array(uk.tolist(), pa.string()),
            "n_customers": pa.array(n_c, pa.int64()),
            "n_with_orders": pa.array(n_m, pa.int64()),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("c_mktsegment").sum(["n_customers",
                                         "n_with_orders"]))
    rows = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    seg = rows["c_mktsegment"].to_pylist()
    n_c = rows["sum(n_customers)"].to_numpy(zero_copy_only=False)
    n_m = rows["sum(n_with_orders)"].to_numpy(zero_copy_only=False)
    order = np.argsort(np.asarray(seg, dtype=object), kind="stable")
    return pa.table({
        "c_mktsegment": pa.array([seg[i] for i in order], pa.string()),
        "n_customers": pa.array(n_c[order], pa.int64()),
        "n_with_orders": pa.array(n_m[order], pa.int64()),
        "coverage_ppm": pa.array(
            [int(n_m[i]) * 1_000_000 // int(n_c[i]) for i in order],
            pa.int64()),
    })


SEGMENT_COVERAGE_SQL = """
WITH cov AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CASE WHEN EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey)
              THEN 1 ELSE 0 END AS has_o
  FROM customer c
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(has_o) AS BIGINT) AS n_with_orders,
       CAST(sum(has_o) * 1000000 // count(*) AS BIGINT)
         AS coverage_ppm
FROM cov GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


Q4_LO = "1999-01-01"
Q4_HI = "1999-04-01"


def order_priority_check(sf_dir: str) -> pa.Table:
    """(o_orderpriority, order_count): TPC-H Q4 analog — count of orders
    placed in one quarter that contain at least one returned line
    (l_returnflag = 'R'; our lineitem has no commit/receipt dates, so
    the returned flag stands in for Q4's "late" predicate).

    This is the SEMI-JOIN shape the join family lacked: inner/left/
    anti/set-ops exist (`shipping_priority`, `segment_coverage`,
    `customers_without_premium`, `key_set_ops`); Q4 is EXISTS — keep
    each left row at most once regardless of match multiplicity.
    Route: both sides filter at the parquet read (only the quarter's
    orders and the returned lines leave storage), then the
    co-partitioned file exchange joins with Arrow's native
    ``join_type='left semi'`` per partition — no distinct pre-pass
    needed (semi semantics absorb duplicate probes), no row loop,
    and the probe side never carries payload columns. One tiny
    priority groupby finishes.
    """
    import ray.data as rd

    from .exchange import hash_join

    lo, hi = _ts(Q4_LO), _ts(Q4_HI)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def filt_orders(batch: pa.Table) -> pa.Table:
        dt = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((dt >= lo) & (dt < hi))).select(
            ["o_orderkey", "o_orderpriority"])

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_returnflag"])

    def filt_line(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["l_returnflag"], "R")
        return batch.filter(m).select(["l_orderkey"])

    j = hash_join(
        orders.map_batches(filt_orders, batch_format="pyarrow"),
        line.map_batches(filt_line, batch_format="pyarrow"),
        "o_orderkey", "l_orderkey", join_type="left semi")
    rows = j.groupby("o_orderpriority").count().take_all()
    pr = sorted((str(r["o_orderpriority"]), int(r["count()"]))
                for r in rows)
    return pa.table({
        "o_orderpriority": pa.array([p for p, _ in pr], pa.string()),
        "order_count": pa.array([c for _, c in pr], pa.int64()),
    })


def order_priority_check_sql() -> str:
    return f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{Q4_LO}'
  AND o_orderdate < TIMESTAMP '{Q4_HI}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""
