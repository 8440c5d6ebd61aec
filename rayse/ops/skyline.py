"""Pareto-frontier (skyline) operator over lineitem.

The multi-criteria shortlist operator: keep every row not dominated by
another row — here minimize price, maximize quantity. A row survives iff
no other row is (<= price, >= qty) with at least one strict inequality;
duplicate (price, qty) points all survive.

Distributed shape: the skyline is a proper algebraic combiner —
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — so each batch
computes its partial frontier vectorized (sort by price, prefix-max of
qty, two searchsorted probes for the strict/non-strict dominance tests),
dominated rows never leave the task, and one final pass merges the
partials (a 2-D frontier of n random points has O(log n) expected size,
so the merge input is tiny). No shuffle at all.

INTEGER-EXACT contract: price quantizes to cents per row
(half-away-from-zero, DuckDB round parity via ``relational._cents``);
quantity is integral in the data and casts to int64.

Reference relationship: none (no skyline in the reference); pins the
partial-frontier combiner machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_COLS = ["l_orderkey", "l_linenumber", "price_q", "qty"]


def _frontier(ok: np.ndarray, ln: np.ndarray, pq_: np.ndarray,
              qt: np.ndarray) -> tuple[np.ndarray, ...]:
    """Surviving (orderkey, linenumber, price_q, qty) of one point set."""
    order = np.lexsort((ln, ok, -qt, pq_))
    ok, ln, pq_, qt = ok[order], ln[order], pq_[order], qt[order]
    pre_max = np.maximum.accumulate(qt)
    idx_lt = np.searchsorted(pq_, pq_, side="left")
    idx_le = np.searchsorted(pq_, pq_, side="right") - 1
    m_le = pre_max[idx_le]
    dominated = m_le > qt
    has_lt = idx_lt > 0
    m_lt = np.where(has_lt, pre_max[np.maximum(idx_lt - 1, 0)],
                    np.int64(-2**62))
    dominated |= m_lt >= qt
    keep = ~dominated
    return ok[keep], ln[keep], pq_[keep], qt[keep]


def _partial_skyline(batch: pa.Table) -> pa.Table:
    from .relational import _cents

    ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
    ln = batch["l_linenumber"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    pq_ = _cents(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
    qt = batch["l_quantity"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    ok, ln, pq_, qt = _frontier(ok, ln, pq_, qt)
    return pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_linenumber": pa.array(ln, pa.int64()),
        "price_q": pa.array(pq_, pa.int64()),
        "qty": pa.array(qt, pa.int64()),
    })


def pareto_frontier(sf_dir: str) -> pa.Table:
    """(l_orderkey, l_linenumber, price_q, qty): the global skyline of
    (min price, max quantity) over lineitem — DuckDB hash-matched
    against the prefix-max window oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_quantity"])
    partials = ds.map_batches(_partial_skyline, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    ok, ln, pq_, qt = _frontier(
        tbl["l_orderkey"].to_numpy(zero_copy_only=False),
        tbl["l_linenumber"].to_numpy(zero_copy_only=False),
        tbl["price_q"].to_numpy(zero_copy_only=False),
        tbl["qty"].to_numpy(zero_copy_only=False))
    order = np.lexsort((ln, ok, -qt, pq_))
    return pa.table({
        "l_orderkey": pa.array(ok[order], pa.int64()),
        "l_linenumber": pa.array(ln[order], pa.int64()),
        "price_q": pa.array(pq_[order], pa.int64()),
        "qty": pa.array(qt[order], pa.int64()),
    })


PARETO_FRONTIER_SQL = """
WITH q AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_q,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
), w AS (
  SELECT *,
         max(qty) OVER (ORDER BY price_q
                        RANGE BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS m_lt,
         max(qty) OVER (ORDER BY price_q
                        RANGE BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS m_le
  FROM q
)
SELECT l_orderkey, l_linenumber, price_q, qty
FROM w
WHERE (m_lt IS NULL OR m_lt < qty) AND m_le <= qty
ORDER BY price_q, qty DESC, l_orderkey, l_linenumber
"""
