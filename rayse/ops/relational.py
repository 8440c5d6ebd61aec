"""Relational operators over the TPC-H-ish sf tables — broad-coverage
demonstrations of the guide's aggregation/join patterns on the engine's
non-search side (wide groupby aggregate, broadcast hash join, trailing
sliding window). All DuckDB-oracle-matched.

Float policy: money values are converted to integer cents PER ROW (both
sides compute half-away-from-zero rounding on identical double operands ->
identical integers) and summed as int64 — integer sums are
order-independent, so the hash-exact comparison cannot be broken by float
summation order, unlike any "round the float sum" scheme (boundary flips).
Rounding is ``floor(x*100 + 0.5)`` (half-AWAY for non-negative money),
matching DuckDB's ``round()`` on DOUBLE exactly; ``np.round`` would be
half-to-even and disagree on exact .5 cents (e.g. 246.5 -> 246 vs 247).
All money columns here are non-negative, which the floor form requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _cents(x: np.ndarray, scale: float = 100.0) -> np.ndarray:
    """Half-away-from-zero integer scaling for non-negative doubles
    (identical to DuckDB round(x*scale))."""
    return np.floor(x * scale + 0.5).astype(np.int64)


def pricing_summary(sf_dir: str):
    """Q1-style pricing summary: per (returnflag, linestatus) sums/counts
    over lineitem — partial per-batch combine + one small groupby."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow/numpy partial combine (no pandas conversion): group key
        # = dictionary codes of "returnflag|linestatus", sums via bincount
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        key = pa.compute.binary_join_element_wise(
            batch["l_returnflag"], batch["l_linestatus"], "|")
        dic = key.combine_chunks().dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_g = len(dic.dictionary)
        labels = [s.split("|") for s in dic.dictionary.to_pylist()]
        return pa.table({
            "l_returnflag": pa.array([l[0] for l in labels], pa.string()),
            "l_linestatus": pa.array([l[1] for l in labels], pa.string()),
            "sum_qty": pa.array(
                np.bincount(codes, _cents(qty), n_g).astype(np.int64)),
            "sum_base_price": pa.array(
                np.bincount(codes, _cents(price), n_g).astype(np.int64)),
            "sum_disc_price": pa.array(
                np.bincount(codes, _cents(price * (1.0 - disc), 10000.0),
                            n_g).astype(np.int64)),
            "count_order": pa.array(np.bincount(codes, None, n_g)
                                    .astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(rd.aggregate.Sum("sum_qty"),
                      rd.aggregate.Sum("sum_base_price"),
                      rd.aggregate.Sum("sum_disc_price"),
                      rd.aggregate.Sum("count_order")))

    def final(batch: pa.Table) -> pa.Table:
        def cents(col):
            return pa.compute.cast(batch[col], pa.int64())

        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": cents("sum(sum_qty)"),            # qty * 100
            "sum_base_price": cents("sum(sum_base_price)"),   # cents
            "sum_disc_price": cents("sum(sum_disc_price)"),   # 1e-4 units
            "count_order": pa.compute.cast(batch["sum(count_order)"],
                                           pa.int64()),
        })

    return agg.map_batches(final, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def top_customer_revenue(sf_dir: str, n: int = 10):
    """Top-N customers by total order value: BROADCAST hash join (customer
    side shipped once via ray.put, looked up per batch — the guide's
    small-side join pattern; no shuffle) + groupby + deterministic top-N."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    name_of = dict(zip(cust["c_custkey"].to_pylist(),
                       cust["c_name"].to_pylist()))
    ref = ray.put(name_of)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "cents": pa.array(_cents(
                batch["o_totalprice"].to_numpy(zero_copy_only=False)),
                pa.int64()),
        })

    agg = (orders.map_batches(to_cents, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("o_custkey")
           .aggregate(rd.aggregate.Sum("cents"), rd.aggregate.Count()))

    def partial_topn(batch: pa.Table) -> pa.Table:
        # per-batch partial top-N: the global top-N is a subset of the union
        # of per-batch top-Ns (keys are distinct after the groupby), so only
        # N rows per batch reach the driver — never one row per customer
        cust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        rev = batch["sum(cents)"].to_numpy(zero_copy_only=False)
        cnt = batch["count()"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((cust, -rev))[:n]
        return pa.table({
            "o_custkey": pa.array(cust[idx], pa.int64()),
            "revenue": pa.array(rev[idx].astype(np.int64), pa.int64()),
            "n_orders": pa.array(cnt[idx].astype(np.int64), pa.int64()),
        })

    def hydrate(batch: pa.Table) -> pa.Table:
        names = ray.get(ref)
        keys = batch["o_custkey"].to_pylist()
        return pa.table({
            "c_custkey": pa.array(keys, pa.int64()),
            "c_name": pa.array([names.get(k, "") for k in keys],
                               pa.string()),
            "revenue": batch["revenue"],
            "n_orders": batch["n_orders"],
        })

    rows = (agg.map_batches(partial_topn, batch_format="pyarrow")
            .map_batches(hydrate, batch_format="pyarrow").take_all())
    rows.sort(key=lambda r: (-r["revenue"], r["c_custkey"]))
    return pa.Table.from_pylist(rows[:n])


TOP_CUSTOMER_REVENUE_SQL = """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 10
"""


def trailing_window_counts(sf_dir: str, window_s: int = 3600):
    """Per event: number of same-type events in the trailing ``window_s``
    seconds (inclusive of ts peers) — the sliding-window analog of
    ``windows.tumbling_agg``; per-type sorted group + two searchsorteds."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])

    def per_type(group: pa.Table) -> pa.Table:
        ts = group["ts"].cast(pa.int64()).to_numpy()
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts_s = ts[order]
        lo = np.searchsorted(ts_s, ts_s - window_s * 1_000_000, side="left")
        hi = np.searchsorted(ts_s, ts_s, side="right")
        counts = (hi - lo).astype(np.int64)
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "trailing_count": pa.array(counts, pa.int64()),
        })

    return ds.groupby("event_type").map_groups(per_type,
                                               batch_format="pyarrow")


TRAILING_WINDOW_SQL = """
    SELECT event_id,
           CAST(count(*) OVER (
             PARTITION BY event_type ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS BIGINT) AS trailing_count
    FROM events
"""
