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


# ---------------------------------------------------------------------------
# Q6 analog: forecast-revenue-change — the pure scan-filter-aggregate
# member of the family (no join at all). The entire 100-TB read
# collapses to one int64 per block: predicate pushed to numpy masks
# over three pruned columns, per-row 1e-4-unit quantization, then a
# single global sum. Discounts compare in integer percent
# (round(d*100)) on BOTH sides so the band edges cannot float-flip.
# ---------------------------------------------------------------------------

Q6_LO = "1997-01-01"
Q6_HI = "1998-01-01"
Q6_DISC_LO, Q6_DISC_HI = 3, 7          # percent band, inclusive
Q6_QTY_CAP = 24.0


def forecast_revenue(sf_dir: str) -> pa.Table:
    """One row (revenue, n_items): sum of extendedprice*discount over
    the shipdate window, discount band, and quantity cap (Q6 analog)."""
    import ray
    import ray.data as rd

    from .relational import _cents

    lo, hi = _ts(Q6_LO), _ts(Q6_HI)
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        dt = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dpc = _cents(disc)                       # integer percent
        m = ((dt >= lo) & (dt < hi) & (qty < Q6_QTY_CAP)
             & (dpc >= Q6_DISC_LO) & (dpc <= Q6_DISC_HI))
        rev = _cents(price[m] * disc[m], 10000.0)
        return pa.table({"revenue": pa.array([int(rev.sum())], pa.int64()),
                         "n_items": pa.array([int(m.sum())], pa.int64())})

    parts = pa.concat_tables(
        ray.get(ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    return pa.table({
        "revenue": pa.array([int(pc.sum(parts["revenue"]).as_py() or 0)],
                            pa.int64()),
        "n_items": pa.array([int(pc.sum(parts["n_items"]).as_py() or 0)],
                            pa.int64()),
    })


def forecast_revenue_sql() -> str:
    return f"""
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_LO}'
  AND l_shipdate < TIMESTAMP '{Q6_HI}'
  AND l_quantity < {Q6_QTY_CAP!r}
  AND CAST(round(l_discount * 100) AS INTEGER)
      BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}"""


# ---------------------------------------------------------------------------
# Q14 analog: promotion-effect — fact ⋈ small-dim with a ratio output.
# The part side is a bounded dimension: its (partkey -> is_promo) map is
# ray.put ONCE and searchsorted inside every task, never reshuffled; the
# lineitem side never leaves its blocks (per-batch masked partial sums
# only). The promo share is an integer-ppm floor division of two
# order-independent int64 sums, so the ratio is hash-exact.
# ---------------------------------------------------------------------------

Q14_LO = "1997-09-01"
Q14_HI = "1997-10-01"
Q14_PROMO_TYPE = "PROMO"


def promo_revenue(sf_dir: str) -> pa.Table:
    """One row (promo_revenue, total_revenue, promo_ppm) over one
    shipdate month (Q14 analog)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    promo = pc.equal(part["p_type"], Q14_PROMO_TYPE).to_numpy(
        zero_copy_only=False)
    order = np.argsort(pk, kind="stable")
    dim_ref = ray.put((pk[order], promo[order]))
    lo, hi = _ts(Q14_LO), _ts(Q14_HI)

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        keys, is_promo = ray.get(dim_ref)
        dt = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array((dt >= lo) & (dt < hi)))
        lpk = sub["l_partkey"].to_numpy(zero_copy_only=False)
        rev = _rev_q(sub["l_extendedprice"].to_numpy(zero_copy_only=False),
                     sub["l_discount"].to_numpy(zero_copy_only=False))
        j = np.minimum(np.searchsorted(keys, lpk), keys.size - 1)
        hit = (keys.size > 0) & (keys[j] == lpk)
        pm = hit & is_promo[j]
        return pa.table({
            "promo_revenue": pa.array([int(rev[pm].sum())], pa.int64()),
            "total_revenue": pa.array([int(rev[hit].sum())], pa.int64()),
        })

    parts = pa.concat_tables(
        ray.get(ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    p = int(pc.sum(parts["promo_revenue"]).as_py() or 0)
    t = int(pc.sum(parts["total_revenue"]).as_py() or 0)
    return pa.table({
        "promo_revenue": pa.array([p], pa.int64()),
        "total_revenue": pa.array([t], pa.int64()),
        "promo_ppm": pa.array([p * 1_000_000 // t if t else 0], pa.int64()),
    })


def promo_revenue_sql() -> str:
    return f"""
WITH j AS (
  SELECT CAST(round(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT) AS rev,
         (p_type = '{Q14_PROMO_TYPE}') AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{Q14_LO}'
    AND l_shipdate < TIMESTAMP '{Q14_HI}')
SELECT CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) AS BIGINT)
         AS promo_revenue,
       CAST(sum(rev) AS BIGINT) AS total_revenue,
       CAST(sum(CASE WHEN is_promo THEN rev ELSE 0 END) * 1000000
            // sum(rev) AS BIGINT) AS promo_ppm
FROM j"""


# ---------------------------------------------------------------------------
# Q18 analog: large-volume customers — the HAVING-on-a-big-groupby
# member. The quantity rollup pre-combines inside every lineitem block
# (orderkeys arrive clustered, so the partial shrinks the exchange by
# ~the lines-per-order factor) before ONE high-cardinality groupby; the
# surviving orders (a tiny HAVING residue) flow through the
# co-partitioned hash join against orders, and the customer dimension
# hydrates the k winners driver-side from a broadcast-sized read.
# ---------------------------------------------------------------------------

Q18_QTY_CUT = 250 * 100        # qty in integer hundredths
Q18_K = 20


def large_orders(sf_dir: str, k: int = Q18_K) -> pa.Table:
    """(c_custkey, c_name, o_orderkey, o_orderdate, totalprice_c,
    sum_qty): top-``k`` orders by totalprice among those whose line
    quantities sum past the cut (Q18 analog)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .exchange import hash_join
    from .relational import _cents

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        qty = _cents(batch["l_quantity"].to_numpy(zero_copy_only=False))
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uk, pa.int64()),
            "qty": pa.array(np.bincount(inv, qty, uk.size)
                            .astype(np.int64)),
        })

    agg = (line.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("l_orderkey").sum("qty"))

    def having(batch: pa.Table) -> pa.Table:
        q = batch["sum(qty)"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(q > Q18_QTY_CUT))
        return pa.table({
            "l_orderkey": sub["l_orderkey"],
            "sum_qty": pc.cast(sub["sum(qty)"], pa.int64()),
        })

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def prep_orders(batch: pa.Table) -> pa.Table:
        tp = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "o_orderdate": batch["o_orderdate"],
            "totalprice_c": pa.array(tp, pa.int64()),
        })

    j = hash_join(
        agg.map_batches(having, batch_format="pyarrow"),
        orders.map_batches(prep_orders, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")

    def partial_topk(batch: pa.Table) -> pa.Table:
        tp = batch["totalprice_c"].to_numpy(zero_copy_only=False)
        key = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -tp))[:k]
        return batch.take(pa.array(order, pa.int64()))

    tops = pa.concat_tables(
        [t for t in ray.get(j.map_batches(
            partial_topk, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows], promote_options="default")
    tp = tops["totalprice_c"].to_numpy(zero_copy_only=False)
    key = tops["l_orderkey"].to_numpy(zero_copy_only=False)
    order = np.lexsort((key, -tp))[:k]
    idx = pa.array(order, pa.int64())
    sel_c = pc.take(tops["o_custkey"], idx).to_pylist()

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    c2n = dict(zip(cust["c_custkey"].to_pylist(),
                   cust["c_name"].to_pylist()))
    return pa.table({
        "c_custkey": pa.array([int(c) for c in sel_c], pa.int64()),
        "c_name": pa.array([c2n[int(c)] for c in sel_c], pa.string()),
        "o_orderkey": pc.take(tops["l_orderkey"], idx),
        "o_orderdate": pc.cast(pc.take(tops["o_orderdate"], idx),
                               pa.timestamp("us")),
        "totalprice_c": pc.take(tops["totalprice_c"], idx),
        "sum_qty": pc.take(tops["sum_qty"], idx),
    })


def large_orders_sql(k: int = Q18_K) -> str:
    return f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
         AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > {Q18_QTY_CUT}
ORDER BY totalprice_c DESC, o_orderkey
LIMIT {k}"""


# ---------------------------------------------------------------------------
# Q19 analog: discounted revenue under OR-of-predicate-triples
# (brand × size band × quantity band). The part side is again a
# broadcast dimension — (partkey, brand-code, size) shipped once via
# ray.put — and each lineitem block resolves its branch membership with
# two searchsorted gathers and three vectorized masks; the output is a
# 3-row (branch, revenue, n_items) table of order-independent int64s.
# ---------------------------------------------------------------------------

Q19_BRANCHES = (
    ("Brand#13", 1, 5, 1.0, 11.0),
    ("Brand#23", 1, 10, 10.0, 20.0),
    ("Brand#25", 1, 15, 20.0, 30.0),
)


def brand_revenue(sf_dir: str) -> pa.Table:
    """(branch, revenue, n_items) per predicate triple (Q19 analog)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False)
    size = part["p_size"].to_numpy(zero_copy_only=False)
    brands = part["p_brand"].to_pandas().to_numpy()
    order = np.argsort(pk, kind="stable")
    dim_ref = ray.put((pk[order], brands[order], size[order]))

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
    n_b = len(Q19_BRANCHES)

    def partial(batch: pa.Table) -> pa.Table:
        keys, brand, psize = ray.get(dim_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        rev = _rev_q(batch["l_extendedprice"].to_numpy(
                         zero_copy_only=False),
                     batch["l_discount"].to_numpy(zero_copy_only=False))
        j = np.minimum(np.searchsorted(keys, lpk), keys.size - 1)
        hit = (keys.size > 0) & (keys[j] == lpk)
        out_r = np.zeros(n_b, np.int64)
        out_n = np.zeros(n_b, np.int64)
        for i, (b, s_lo, s_hi, q_lo, q_hi) in enumerate(Q19_BRANCHES):
            m = (hit & (brand[j] == b)
                 & (psize[j] >= s_lo) & (psize[j] <= s_hi)
                 & (qty >= q_lo) & (qty <= q_hi))
            out_r[i] = rev[m].sum()
            out_n[i] = m.sum()
        return pa.table({
            "branch": pa.array([b for b, *_ in Q19_BRANCHES], pa.string()),
            "revenue": pa.array(out_r),
            "n_items": pa.array(out_n),
        })

    parts = pa.concat_tables(
        ray.get(ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    gb = parts.group_by("branch").aggregate(
        [("revenue", "sum"), ("n_items", "sum")])
    gb = gb.filter(pc.greater(gb["n_items_sum"], 0))  # SQL emits no
    order = pc.sort_indices(gb["branch"])             # zero-match branch
    return pa.table({
        "branch": pc.take(gb["branch"], order),
        "revenue": pc.cast(pc.take(gb["revenue_sum"], order), pa.int64()),
        "n_items": pc.cast(pc.take(gb["n_items_sum"], order), pa.int64()),
    })


def brand_revenue_sql() -> str:
    cases = " ".join(
        f"WHEN p_brand = '{b}' AND p_size BETWEEN {s_lo} AND {s_hi} "
        f"AND l_quantity BETWEEN {q_lo!r} AND {q_hi!r} THEN '{b}'"
        for b, s_lo, s_hi, q_lo, q_hi in Q19_BRANCHES)
    return f"""
WITH j AS (
  SELECT CASE {cases} END AS branch,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT branch, CAST(sum(rev) AS BIGINT) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM j WHERE branch IS NOT NULL
GROUP BY branch ORDER BY branch"""


# ---------------------------------------------------------------------------
# Q7 analog: nation-pair shipping volume — the TWO-dimension-chain join
# member. The big⋈big edge (lineitem ⋈ orders) is the one real
# exchange; BOTH nation lookups collapse to broadcasts: supplier ->
# nation rides the lineitem side (l_suppkey gather before the join),
# customer -> nation rides the orders side (o_custkey gather in the
# same pass that filters the date window). Output is bounded by
# nations² × years, grouped from per-row 1e-4-unit integers.
# ---------------------------------------------------------------------------

Q7_LO = "1996-01-01"
Q7_HI = "1998-01-01"


def nation_volume(sf_dir: str, k: int = 20) -> pa.Table:
    """(supp_nation, cust_nation, l_year, revenue, n_items): top-``k``
    nation-pair trade volumes in the window (Q7 analog; all pairs with
    supp != cust nation, ranked by revenue)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .exchange import hash_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    n_order = np.argsort(nk, kind="stable")
    nk, nname = nk[n_order], nname[n_order]

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    s_order = np.argsort(sk, kind="stable")
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cnat = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    c_order = np.argsort(ck, kind="stable")
    dims_ref = ray.put((sk[s_order], snat[s_order],
                        ck[c_order], cnat[c_order]))
    lo, hi = _ts(Q7_LO), _ts(Q7_HI)

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])

    def prep_line(batch: pa.Table) -> pa.Table:
        skeys, snk, _, _ = ray.get(dims_ref)
        dt = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array((dt >= lo) & (dt < hi)))
        lsk = sub["l_suppkey"].to_numpy(zero_copy_only=False)
        rev = _rev_q(sub["l_extendedprice"].to_numpy(
                         zero_copy_only=False),
                     sub["l_discount"].to_numpy(zero_copy_only=False))
        yr = sub["l_shipdate"].to_numpy(
            zero_copy_only=False).astype("datetime64[Y]").astype(
                np.int64) + 1970
        j = np.searchsorted(skeys, lsk)
        return pa.table({
            "l_orderkey": sub["l_orderkey"],
            "supp_nat": pa.array(snk[j], pa.int64()),
            "l_year": pa.array(yr, pa.int64()),
            "rev": pa.array(rev, pa.int64()),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])

    def prep_orders(batch: pa.Table) -> pa.Table:
        _, _, ckeys, cnk = ray.get(dims_ref)
        ock = batch["o_custkey"].to_numpy(zero_copy_only=False)
        j = np.searchsorted(ckeys, ock)
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "cust_nat": pa.array(cnk[j], pa.int64()),
        })

    j = hash_join(
        line.map_batches(prep_line, batch_format="pyarrow"),
        orders.map_batches(prep_orders, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        sn = batch["supp_nat"].to_numpy(zero_copy_only=False)
        cn = batch["cust_nat"].to_numpy(zero_copy_only=False)
        yr = batch["l_year"].to_numpy(zero_copy_only=False)
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        m = sn != cn
        key = (sn[m] * 32 + cn[m]) * 4096 + yr[m]
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(uk, pa.int64()),
            "rev": pa.array(np.bincount(inv, rev[m], uk.size)
                            .astype(np.int64)),
            "n": pa.array(np.bincount(inv, None, uk.size)
                          .astype(np.int64)),
        })

    import ray.data as rd

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("key").aggregate(rd.aggregate.Sum("rev"),
                                     rd.aggregate.Sum("n")))
    t1 = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    k1 = t1["key"].to_numpy(zero_copy_only=False)
    rev = t1["sum(rev)"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t1["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    yr = k1 % 4096
    sn = k1 // 4096 // 32
    cn = k1 // 4096 % 32
    order = np.lexsort((yr, cn, sn, -rev))[:k]
    s_i = np.searchsorted(nk, sn[order])
    c_i = np.searchsorted(nk, cn[order])
    return pa.table({
        "supp_nation": pa.array(nname[s_i].tolist(), pa.string()),
        "cust_nation": pa.array(nname[c_i].tolist(), pa.string()),
        "l_year": pa.array(yr[order], pa.int64()),
        "revenue": pa.array(rev[order], pa.int64()),
        "n_items": pa.array(n[order], pa.int64()),
    })


def nation_volume_sql(k: int = 20) -> str:
    return f"""
WITH j AS (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         sn.n_nationkey AS snk, cn.n_nationkey AS cnk,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT) AS rev
  FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '{Q7_LO}'
    AND l_shipdate < TIMESTAMP '{Q7_HI}'
    AND sn.n_nationkey <> cn.n_nationkey)
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev) AS BIGINT) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM j
GROUP BY supp_nation, cust_nation, l_year, snk, cnk
ORDER BY revenue DESC, snk, cnk, l_year
LIMIT {k}"""


# ---------------------------------------------------------------------------
# Q17 analog: small-quantity-order revenue — the correlated-aggregate
# member (per-part average quantity, then the fact filtered against its
# own group's statistic). Two passes over the pruned lineitem columns:
# pass 1 pre-combines (partkey, Σqty, n) per block into one
# high-cardinality groupby; the per-part thresholds then ride ONE
# broadcast (part-bounded) back into pass 2's row-local filter — the
# self-join the SQL writes never materializes. Threshold compare is
# exact-integer: 100·5·qty_c < sum_qty_c ⇔ qty < 0.2·avg (avg = sum/n).
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#13"


def small_quantity_revenue(sf_dir: str) -> pa.Table:
    """One row (revenue, n_items): extendedprice sum (1e-4 units,
    divided by 7 in milli-units) over brand lineitems with quantity
    below 20% of their part's average (Q17 analog)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .relational import _cents

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    keep = np.sort(pc.filter(
        part["p_partkey"],
        pc.equal(part["p_brand"], Q17_BRAND)).to_numpy(
            zero_copy_only=False))
    keep_ref = ray.put(keep)

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_quantity",
                                    "l_extendedprice"])

    def qty_partial(batch: pa.Table) -> pa.Table:
        ks = ray.get(keep_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        j = np.minimum(np.searchsorted(ks, lpk), max(ks.size - 1, 0))
        m = (ks.size > 0) & (ks[j] == lpk)
        sub = lpk[m]
        qc = _cents(batch["l_quantity"].to_numpy(
            zero_copy_only=False))[m]
        uk, inv = np.unique(sub, return_inverse=True)
        return pa.table({
            "p": pa.array(uk, pa.int64()),
            "sq": pa.array(np.bincount(inv, qc, uk.size)
                           .astype(np.int64)),
            "n": pa.array(np.bincount(inv, None, uk.size)
                          .astype(np.int64)),
        })

    import ray.data as rd2

    agg = (line.map_batches(qty_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("p").aggregate(rd2.aggregate.Sum("sq"),
                                   rd2.aggregate.Sum("n")))
    stats = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    pk = stats["p"].to_numpy(zero_copy_only=False)
    o = np.argsort(pk, kind="stable")
    thr_ref = ray.put((pk[o],
                       stats["sum(sq)"].to_numpy(
                           zero_copy_only=False).astype(np.int64)[o],
                       stats["sum(n)"].to_numpy(
                           zero_copy_only=False).astype(np.int64)[o]))

    def rev_partial(batch: pa.Table) -> pa.Table:
        ks, sq, n = ray.get(thr_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        j = np.minimum(np.searchsorted(ks, lpk), max(ks.size - 1, 0))
        hit = (ks.size > 0) & (ks[j] == lpk)
        qc = _cents(batch["l_quantity"].to_numpy(zero_copy_only=False))
        # qty < 0.2 * (sum/n)  <=>  5 * n * qty_c < sum_qty_c (ints)
        m = hit & (5 * n[j] * qc < sq[j])
        pc_ = _cents(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[m], 10000.0)
        return pa.table({
            "rev": pa.array([int(pc_.sum())], pa.int64()),
            "n_items": pa.array([int(m.sum())], pa.int64())})

    parts = pa.concat_tables(
        ray.get(line.map_batches(rev_partial, batch_format="pyarrow",
                                 zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    rev = int(pc.sum(parts["rev"]).as_py() or 0)
    n = int(pc.sum(parts["n_items"]).as_py() or 0)
    return pa.table({
        "revenue_milli": pa.array([rev * 1000 // 7 // 10], pa.int64()),
        "n_items": pa.array([n], pa.int64()),
    })


def small_quantity_revenue_sql() -> str:
    return f"""
WITH s AS (
  SELECT l_partkey AS p,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS sq,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{Q17_BRAND}'
  GROUP BY l_partkey),
f AS (
  SELECT CAST(round(l_extendedprice * 10000) AS BIGINT) AS pc
  FROM lineitem JOIN s ON l_partkey = s.p
  WHERE 5 * s.n * CAST(round(l_quantity * 100) AS BIGINT) < s.sq)
SELECT CAST(COALESCE(sum(pc), 0) * 1000 // 7 // 10 AS BIGINT)
         AS revenue_milli,
       CAST(count(*) AS BIGINT) AS n_items
FROM f"""


# ---------------------------------------------------------------------------
# Q15 analog: top supplier(s) by window revenue — the
# equal-to-global-max member. Per-block (suppkey, Σrev) partials ->
# one groupby -> the max and ITS achievers resolved from the gathered
# supplier-bounded rollup (suppliers are a dimension; the rollup is
# dimension-sized, documented). Ties all surface, like the SQL.
# ---------------------------------------------------------------------------

Q15_LO = "1997-01-01"
Q15_HI = "1997-04-01"


def top_supplier_revenue(sf_dir: str) -> pa.Table:
    """(s_suppkey, s_name, revenue): every supplier achieving the
    maximum shipdate-window revenue (Q15 analog)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    lo, hi = _ts(Q15_LO), _ts(Q15_HI)
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        dt = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array((dt >= lo) & (dt < hi)))
        sk = sub["l_suppkey"].to_numpy(zero_copy_only=False)
        rev = _rev_q(sub["l_extendedprice"].to_numpy(
                         zero_copy_only=False),
                     sub["l_discount"].to_numpy(zero_copy_only=False))
        uk, inv = np.unique(sk, return_inverse=True)
        return pa.table({
            "s": pa.array(uk, pa.int64()),
            "rev": pa.array(np.bincount(inv, rev, uk.size)
                            .astype(np.int64)),
        })

    agg = (line.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("s").sum("rev"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    sk = tbl["s"].to_numpy(zero_copy_only=False)
    rev = tbl["sum(rev)"].to_numpy(zero_copy_only=False).astype(np.int64)
    mx = int(rev.max())
    m = rev == mx
    win = np.sort(sk[m])
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    s2n = dict(zip(sup["s_suppkey"].to_pylist(),
                   sup["s_name"].to_pylist()))
    return pa.table({
        "s_suppkey": pa.array(win, pa.int64()),
        "s_name": pa.array([s2n[int(s)] for s in win], pa.string()),
        "revenue": pa.array([mx] * win.size, pa.int64()),
    })


def top_supplier_revenue_sql() -> str:
    return f"""
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                       AS BIGINT)) AS BIGINT) AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_LO}'
    AND l_shipdate < TIMESTAMP '{Q15_HI}'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, revenue
FROM r JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue = (SELECT max(revenue) FROM r)
ORDER BY s_suppkey"""


# ---------------------------------------------------------------------------
# Q5 analog: local supplier volume — the cycle-join member (customer and
# supplier constrained to the SAME nation, nation constrained to a
# region). The six-table SQL cycle collapses to the standing routing:
# ONE exchange join (lineitem ⋈ orders on orderkey) with both dimension
# chains folded into broadcast arrays — orders carry their customer's
# nation through the join, lineitem rows carry their supplier's nation,
# and the cycle predicate (c_nationkey = s_nationkey) becomes a
# row-local equality AFTER the join instead of a second exchange.
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_LO = "1996-01-01"
Q5_HI = "1997-01-01"


def local_supplier_volume(sf_dir: str) -> pa.Table:
    """(n_name, revenue): Q5 analog — revenue from lineitems whose
    supplier and ordering customer share a nation inside ``Q5_REGION``,
    orders placed in [Q5_LO, Q5_HI), ordered by revenue descending."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .exchange import hash_join

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {k: n for k, n in zip(reg["r_regionkey"].to_pylist(),
                                 reg["r_name"].to_pylist())}
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nk = np.asarray(nat["n_nationkey"].to_pylist(), dtype=np.int64)
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    nreg = np.asarray(nat["n_regionkey"].to_pylist(), dtype=np.int64)
    order = np.argsort(nk, kind="stable")
    nk, nname, nreg = nk[order], nname[order], nreg[order]
    in_region = np.array([rkey[int(r)] == Q5_REGION for r in nreg])

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    so = np.argsort(sk, kind="stable")
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cnat = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    co = np.argsort(ck, kind="stable")
    region_nations = np.sort(nk[in_region])
    dims_ref = ray.put((sk[so], snat[so], ck[co], cnat[co],
                        region_nations))
    lo, hi = _ts(Q5_LO), _ts(Q5_HI)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def prep_orders(batch: pa.Table) -> pa.Table:
        _, _, ckeys, cnk, rn = ray.get(dims_ref)
        dt = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array((dt >= lo) & (dt < hi)))
        ock = sub["o_custkey"].to_numpy(zero_copy_only=False)
        cn = cnk[np.searchsorted(ckeys, ock)]
        j = np.searchsorted(rn, cn)
        keep = (j < rn.size) & (rn[np.minimum(j, rn.size - 1)] == cn)
        return pa.table({
            "o_orderkey": pa.array(
                sub["o_orderkey"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "cust_nat": pa.array(cn[keep], pa.int64()),
        })

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def prep_line(batch: pa.Table) -> pa.Table:
        skeys, snk, _, _, _ = ray.get(dims_ref)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        rev = _rev_q(batch["l_extendedprice"].to_numpy(
                         zero_copy_only=False),
                     batch["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table({
            "l_orderkey": pa.array(
                batch["l_orderkey"].to_numpy(zero_copy_only=False),
                pa.int64()),
            "supp_nat": pa.array(snk[np.searchsorted(skeys, lsk)],
                                 pa.int64()),
            "rev": pa.array(rev, pa.int64()),
        })

    j = hash_join(
        line.map_batches(prep_line, batch_format="pyarrow"),
        orders.map_batches(prep_orders, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        sn = batch["supp_nat"].to_numpy(zero_copy_only=False)
        cn = batch["cust_nat"].to_numpy(zero_copy_only=False)
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        m = sn == cn
        uk, inv = np.unique(sn[m], return_inverse=True)
        return pa.table({
            "nat": pa.array(uk, pa.int64()),
            "rev": pa.array(np.bincount(inv, rev[m], uk.size)
                            .astype(np.int64)),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("nat").sum("rev"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    natk = tbl["nat"].to_numpy(zero_copy_only=False)
    rev = tbl["sum(rev)"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.lexsort((natk, -rev))
    names = nname[np.searchsorted(nk, natk[o])]
    return pa.table({
        "n_name": pa.array(names.tolist(), pa.string()),
        "revenue": pa.array(rev[o], pa.int64()),
    })


def local_supplier_volume_sql() -> str:
    return f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue
FROM lineitem
     JOIN orders ON l_orderkey = o_orderkey
     JOIN customer ON o_custkey = c_custkey
     JOIN supplier ON l_suppkey = s_suppkey
     JOIN nation ON c_nationkey = n_nationkey
     JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_LO}'
  AND o_orderdate < TIMESTAMP '{Q5_HI}'
GROUP BY n_name, n_nationkey
ORDER BY revenue DESC, n_nationkey"""


# ---------------------------------------------------------------------------
# Q8 analog: market share — the ratio-of-conditional-aggregates member
# over a THREE-dimension-constrained fact (part type, customer region,
# supplier nation flag). Same single-exchange routing as Q5: part
# membership and both nation chains ride broadcasts; the year-grouped
# numerator/denominator pair are integer partial sums; the share
# divides once per year on the driver.
# ---------------------------------------------------------------------------

Q8_NATION = "NATION_7"
Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_LO = "1996-01-01"
Q8_HI = "1998-01-01"


def market_share(sf_dir: str) -> pa.Table:
    """(o_year, nation_rev, total_rev, mkt_share): Q8 analog — yearly
    share of ``Q8_NATION``-supplied revenue among ``Q8_TYPE``-part
    lineitems ordered by ``Q8_REGION`` customers in [Q8_LO, Q8_HI)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .exchange import hash_join

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = {k: n for k, n in zip(reg["r_regionkey"].to_pylist(),
                                 reg["r_name"].to_pylist())}
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nk = np.asarray(nat["n_nationkey"].to_pylist(), dtype=np.int64)
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    nreg = np.asarray(nat["n_regionkey"].to_pylist(), dtype=np.int64)
    x_nation = np.int64(nk[np.asarray(
        [n == Q8_NATION for n in nname])][0])
    region_nations = np.sort(nk[np.asarray(
        [rkey[int(r)] == Q8_REGION for r in nreg])])

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pmask = pc.equal(part["p_type"], Q8_TYPE)
    ppk = np.sort(part.filter(pmask)["p_partkey"].to_numpy(
        zero_copy_only=False).astype(np.int64))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    so = np.argsort(sk, kind="stable")
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cnat = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    co = np.argsort(ck, kind="stable")
    dims_ref = ray.put((ppk, sk[so], snat[so], ck[co], cnat[co],
                        region_nations))
    lo, hi = _ts(Q8_LO), _ts(Q8_HI)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def prep_orders(batch: pa.Table) -> pa.Table:
        _, _, _, ckeys, cnk, rn = ray.get(dims_ref)
        dt = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array((dt >= lo) & (dt < hi)))
        ock = sub["o_custkey"].to_numpy(zero_copy_only=False)
        cn = cnk[np.searchsorted(ckeys, ock)]
        j = np.searchsorted(rn, cn)
        keep = (j < rn.size) & (rn[np.minimum(j, rn.size - 1)] == cn)
        yr = sub["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "o_orderkey": pa.array(
                sub["o_orderkey"].to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "o_year": pa.array(yr[keep], pa.int64()),
        })

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def prep_line(batch: pa.Table) -> pa.Table:
        pk, skeys, snk, _, _, _ = ray.get(dims_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        j = np.searchsorted(pk, lpk)
        keep = (j < pk.size) & (pk[np.minimum(j, pk.size - 1)] == lpk)
        sub = batch.filter(pa.array(keep))
        lsk = sub["l_suppkey"].to_numpy(zero_copy_only=False)
        rev = _rev_q(sub["l_extendedprice"].to_numpy(
                         zero_copy_only=False),
                     sub["l_discount"].to_numpy(zero_copy_only=False))
        is_x = snk[np.searchsorted(skeys, lsk)] == x_nation
        return pa.table({
            "l_orderkey": pa.array(
                sub["l_orderkey"].to_numpy(zero_copy_only=False),
                pa.int64()),
            "rev": pa.array(rev, pa.int64()),
            "x_rev": pa.array(np.where(is_x, rev, 0), pa.int64()),
        })

    j = hash_join(
        line.map_batches(prep_line, batch_format="pyarrow"),
        orders.map_batches(prep_orders, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        yr = batch["o_year"].to_numpy(zero_copy_only=False)
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        xr = batch["x_rev"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(yr, return_inverse=True)
        return pa.table({
            "o_year": pa.array(uk, pa.int64()),
            "num": pa.array(np.bincount(inv, xr, uk.size)
                            .astype(np.int64)),
            "den": pa.array(np.bincount(inv, rev, uk.size)
                            .astype(np.int64)),
        })

    import ray.data as rd2

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("o_year").aggregate(rd2.aggregate.Sum("num"),
                                        rd2.aggregate.Sum("den")))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    yr = tbl["o_year"].to_numpy(zero_copy_only=False)
    num = tbl["sum(num)"].to_numpy(zero_copy_only=False).astype(np.int64)
    den = tbl["sum(den)"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(yr, kind="stable")
    return pa.table({
        "o_year": pa.array(yr[o], pa.int64()),
        "nation_rev": pa.array(num[o], pa.int64()),
        "total_rev": pa.array(den[o], pa.int64()),
        "mkt_share": pa.array(num[o] / den[o], pa.float64()),
    })


def market_share_sql() -> str:
    return f"""
WITH f AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT) AS rev,
         CASE WHEN sn.n_name = '{Q8_NATION}' THEN 1 ELSE 0 END AS is_x
  FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation sn ON s_nationkey = sn.n_nationkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation cn ON c_nationkey = cn.n_nationkey
       JOIN region ON cn.n_regionkey = r_regionkey
  WHERE p_type = '{Q8_TYPE}'
    AND r_name = '{Q8_REGION}'
    AND o_orderdate >= TIMESTAMP '{Q8_LO}'
    AND o_orderdate < TIMESTAMP '{Q8_HI}')
SELECT o_year,
       CAST(sum(rev * is_x) AS BIGINT) AS nation_rev,
       CAST(sum(rev) AS BIGINT) AS total_rev,
       CAST(sum(rev * is_x) AS DOUBLE) / sum(rev) AS mkt_share
FROM f
GROUP BY o_year
ORDER BY o_year"""


# ---------------------------------------------------------------------------
# Q22 analog: idle high-balance customers — the anti-join +
# scalar-subquery member. The global threshold (mean positive account
# balance) is ONE tiny aggregate pass broadcast as two integers
# (sum_cents, n_pos) so the comparison stays exact:
# bal_cents * n_pos > sum_cents  ⇔  bal > avg. The "no recent orders"
# predicate is a distributed LEFT ANTI exchange join (pyarrow
# "left anti" per co-partition) — the order side ships only its
# custkey column, pre-filtered to the recency window at the read.
# Every customer has SOME order in this corpus, so the recency window
# is what makes the anti-join non-vacuous (documented divergence from
# Q22's "no orders at all").
# ---------------------------------------------------------------------------

Q22_CUT = "1999-01-01"


def idle_customers(sf_dir: str) -> pa.Table:
    """(n_name, numcust, totacctbal_cents): Q22 analog — customers with
    above-average positive balance and NO orders on/after ``Q22_CUT``,
    grouped by nation."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .exchange import hash_join
    from .relational import _cents

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def bal_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"].to_numpy(
            zero_copy_only=False), 100.0)
        pos = cents[cents > 0]
        return pa.table({
            "sum_cents": pa.array([int(pos.sum())], pa.int64()),
            "n_pos": pa.array([int(pos.size)], pa.int64()),
        })

    import ray.data as rd2

    tot = (cust.map_batches(bal_partial, batch_format="pyarrow")
           .aggregate(rd2.aggregate.Sum("sum_cents"),
                      rd2.aggregate.Sum("n_pos")))
    sum_cents = int(tot["sum(sum_cents)"])
    n_pos = int(tot["sum(n_pos)"])

    def sel(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["c_acctbal"].to_numpy(
            zero_copy_only=False), 100.0)
        keep = cents * n_pos > sum_cents
        sub = batch.filter(pa.array(keep))
        return pa.table({
            "c_custkey": pa.array(
                sub["c_custkey"].to_numpy(zero_copy_only=False),
                pa.int64()),
            "c_nationkey": pa.array(
                sub["c_nationkey"].to_numpy(zero_copy_only=False),
                pa.int64()),
            "bal_cents": pa.array(cents[keep], pa.int64()),
        })

    cut = _ts(Q22_CUT)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def recent(batch: pa.Table) -> pa.Table:
        dt = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": pa.array(
                batch["o_custkey"].to_numpy(
                    zero_copy_only=False)[dt >= cut], pa.int64()),
        })

    j = hash_join(
        cust.map_batches(sel, batch_format="pyarrow"),
        orders.map_batches(recent, batch_format="pyarrow"),
        "c_custkey", "o_custkey", join_type="left anti")

    def partial(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        bal = batch["bal_cents"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(nk, return_inverse=True)
        return pa.table({
            "nat": pa.array(uk, pa.int64()),
            "numcust": pa.array(np.bincount(inv, None, uk.size)
                                .astype(np.int64)),
            "bal": pa.array(np.bincount(inv, bal, uk.size)
                            .astype(np.int64)),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("nat").aggregate(rd2.aggregate.Sum("numcust"),
                                     rd2.aggregate.Sum("bal")))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    n2n = dict(zip(nat["n_nationkey"].to_pylist(),
                   nat["n_name"].to_pylist()))
    natk = tbl["nat"].to_numpy(zero_copy_only=False)
    o = np.argsort(natk, kind="stable")
    return pa.table({
        "n_name": pa.array([n2n[int(n)] for n in natk[o]], pa.string()),
        "numcust": pa.array(
            tbl["sum(numcust)"].to_numpy(zero_copy_only=False)[o]
            .astype(np.int64)),
        "totacctbal_cents": pa.array(
            tbl["sum(bal)"].to_numpy(zero_copy_only=False)[o]
            .astype(np.int64)),
    })


def idle_customers_sql() -> str:
    return f"""
WITH thresh AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         CAST(count(*) AS BIGINT) AS n_pos
  FROM customer WHERE round(c_acctbal * 100) > 0),
sel AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer, thresh
  WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > sum_cents
    AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '{Q22_CUT}'))
SELECT n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
FROM sel JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name, n_nationkey
ORDER BY n_nationkey"""


# ---------------------------------------------------------------------------
# Q13 analog: customer order-count distribution — the histogram-of-a-
# groupby member (two chained aggregations at different grain). The
# distributed shape is two bounded folds: per-customer order counts
# (one groupby) collapse per block into (c_count, n_customers)
# partials; zero-order customers enter as total_customers − distinct
# ordering customers, both single integers.
# ---------------------------------------------------------------------------


def customer_distribution(sf_dir: str) -> pa.Table:
    """(c_count, custdist): how many customers placed exactly c_count
    orders (including zero) — Q13 analog, DuckDB hash-matched against
    the LEFT OUTER double-aggregation oracle."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    n_customers = pq.read_metadata(
        f"{sf_dir}/customer.parquet").num_rows

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])

    def count_partial(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(ck, return_counts=True)
        return pa.table({
            "c": pa.array(uk.astype(np.int64), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def hist_partial(batch: pa.Table) -> pa.Table:
        n = batch["sum(n)"].to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(n, return_counts=True)
        return pa.table({
            "c_count": pa.array(uk.astype(np.int64), pa.int64()),
            "cd": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = (orders.map_batches(count_partial, batch_format="pyarrow")
           .groupby("c").sum("n")
           .map_batches(hist_partial, batch_format="pyarrow")
           .groupby("c_count").sum("cd"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    cc = tbl["c_count"].to_numpy(zero_copy_only=False).astype(np.int64)
    cd = tbl["sum(cd)"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_with = int(cd.sum())
    if n_customers > n_with:
        cc = np.concatenate((cc, [0]))
        cd = np.concatenate((cd, [n_customers - n_with]))
    o = np.lexsort((cc, -cd))
    return pa.table({
        "c_count": pa.array(cc[o], pa.int64()),
        "custdist": pa.array(cd[o], pa.int64()),
    })


def customer_distribution_sql() -> str:
    return """
WITH co AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
ORDER BY custdist DESC, c_count"""
