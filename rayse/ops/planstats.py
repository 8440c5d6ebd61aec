"""Optimizer / partitioner statistics — the numbers a distributed
engine consults BEFORE running a plan.

Two operators:

- ``join_cardinality``: the System-R textbook join-size estimate
  |L| * |O| / max(ndv_L, ndv_O) next to the EXACT output cardinality
  sum_k c_L(k) * c_O(k) for lineitem ⋈ orders on orderkey — the
  estimate-vs-truth cell every cost-based optimizer audit starts with.
  Distributed shape: per-side per-key count folds (exchange-backed
  groupby), ndv = the aggregate's own row count, and the exact product
  sum via the co-partitioned hash join of the two (key, cnt) tables —
  never the raw fact tables.

- ``exchange_balance``: the partition-balance audit of this repo's own
  routing function — per-partition row counts of ``mix(key) % P`` for
  a well-behaved key (doc_id), a raw skewed key (user_id unmixed), and
  the same key mixed, reported as max/min/imbalance-ppm. This is the
  instrument a routing decision reads: raw modulo inherits whatever
  structure the key carries (sequential ids spread perfectly, strided
  ids alias), the splitmix finalizer trades that for uniform-random
  occupancy (near-flat at high key cardinality, birthday-collision
  lumpy when distinct keys ~ P — both regimes visible in the report).
  The fold is one bounded groupby (P rows); the oracle re-derives the
  identical hash in exact HUGEINT arithmetic
  (`rayse/ops/sampling._mix_sql`).

All metrics are int64 counts / floor divisions — DuckDB hash-matched.
Reference relationship: none (the reference trusts PostgreSQL's
planner); beyond-reference engine-introspection family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PPM = 1_000_000
BALANCE_PARTS = 64


def join_cardinality(sf_dir: str) -> pa.Table:
    """(metric, v): n_left / n_right / ndv_left / ndv_right /
    est_systemr / exact_rows for lineitem ⋈ orders on orderkey —
    DuckDB hash-matched."""
    import ray.data as rd

    from .exchange import hash_join

    line = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey"])
            .groupby("l_orderkey").count())
    orders = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey"])
              .groupby("o_orderkey").count())

    def rename(b: pa.Table, names) -> pa.Table:
        return b.rename_columns(names)

    lc = line.map_batches(rename, fn_kwargs={"names": ["k", "cl"]},
                          batch_format="pyarrow")
    oc = orders.map_batches(rename, fn_kwargs={"names": ["k2", "co"]},
                            batch_format="pyarrow")

    n_left = int(lc.sum("cl"))
    n_right = int(oc.sum("co"))
    ndv_left = lc.count()
    ndv_right = oc.count()

    j = hash_join(lc, oc, "k", "k2")

    def prod(b: pa.Table) -> pa.Table:
        p = (b["cl"].to_numpy(zero_copy_only=False).astype(np.int64)
             * b["co"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"p": pa.array([int(p.sum())], pa.int64())})

    exact = int(j.map_batches(prod, batch_format="pyarrow").sum("p"))
    est = n_left * n_right // max(ndv_left, ndv_right)
    names = ["n_left", "n_right", "ndv_left", "ndv_right",
             "est_systemr", "exact_rows"]
    vals = [n_left, n_right, ndv_left, ndv_right, est, exact]
    return pa.table({"metric": pa.array(names, pa.string()),
                     "v": pa.array(vals, pa.int64())})


def join_cardinality_sql() -> str:
    return """
WITH lc AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem
            GROUP BY 1),
oc AS (SELECT o_orderkey AS k, count(*) AS c FROM orders GROUP BY 1),
s AS (SELECT (SELECT sum(c) FROM lc) AS n_left,
             (SELECT sum(c) FROM oc) AS n_right,
             (SELECT count(*) FROM lc) AS ndv_left,
             (SELECT count(*) FROM oc) AS ndv_right,
             (SELECT sum(lc.c * oc.c) FROM lc JOIN oc USING (k))
               AS exact_rows)
SELECT metric, CAST(v AS BIGINT) AS v FROM (
  SELECT 'n_left' AS metric, n_left AS v FROM s
  UNION ALL SELECT 'n_right', n_right FROM s
  UNION ALL SELECT 'ndv_left', ndv_left FROM s
  UNION ALL SELECT 'ndv_right', ndv_right FROM s
  UNION ALL SELECT 'est_systemr',
    n_left * n_right // greatest(ndv_left, ndv_right) FROM s
  UNION ALL SELECT 'exact_rows', exact_rows FROM s)"""


def exchange_balance(sf_dir: str, n_parts: int = BALANCE_PARTS) -> pa.Table:
    """(scope, n_parts_hit, n_rows, max_part, min_part, imbalance_ppm):
    partition-occupancy audit of mix(key) % P vs raw key % P —
    imbalance_ppm = max_part * P * 1e6 // n_rows (1e6 = perfectly
    flat). DuckDB hash-matched."""
    import ray.data as rd

    from .exchange import _mix

    def audit(ds, col: str, mixed: bool):
        def part(batch: pa.Table) -> pa.Table:
            k = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            if mixed:
                pid = (_mix(k.astype(np.uint64))
                       % np.uint64(n_parts)).astype(np.int64)
            else:
                pid = k % n_parts
            uk, cnt = np.unique(pid, return_counts=True)
            return pa.table({"pid": pa.array(uk, pa.int64()),
                             "n": pa.array(cnt.astype(np.int64),
                                           pa.int64())})

        rows = (ds.map_batches(part, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("pid").sum("n").take_all())
        cnts = np.array([r["sum(n)"] for r in rows], dtype=np.int64)
        total = int(cnts.sum())
        return (int(cnts.size), total, int(cnts.max()), int(cnts.min()),
                int(cnts.max()) * n_parts * PPM // total)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    scopes = [("doc_mix", audit(docs, "doc_id", True)),
              ("user_mix", audit(ev, "user_id", True)),
              ("user_raw", audit(ev, "user_id", False))]
    return pa.table({
        "scope": pa.array([s for s, _ in scopes], pa.string()),
        "n_parts_hit": pa.array([m[0] for _, m in scopes], pa.int64()),
        "n_rows": pa.array([m[1] for _, m in scopes], pa.int64()),
        "max_part": pa.array([m[2] for _, m in scopes], pa.int64()),
        "min_part": pa.array([m[3] for _, m in scopes], pa.int64()),
        "imbalance_ppm": pa.array([m[4] for _, m in scopes], pa.int64()),
    })


def exchange_balance_sql(n_parts: int = BALANCE_PARTS) -> str:
    from .sampling import _mix_sql

    def scope(name: str, table: str, col: str, mixed: bool) -> str:
        pid = (f"{_mix_sql(col)} % {n_parts}" if mixed
               else f"CAST({col} AS HUGEINT) % {n_parts}")
        return f"""
SELECT '{name}' AS scope,
       CAST(count(*) AS BIGINT) AS n_parts_hit,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(max(n) AS BIGINT) AS max_part,
       CAST(min(n) AS BIGINT) AS min_part,
       CAST(max(n) * {n_parts} * {PPM} // sum(n) AS BIGINT)
         AS imbalance_ppm
FROM (SELECT ({pid}) AS pid, count(*) AS n FROM {table} GROUP BY 1)"""

    return ("\nUNION ALL\n".join([
        scope("doc_mix", "documents", "doc_id", True),
        scope("user_mix", "events", "user_id", True),
        scope("user_raw", "events", "user_id", False),
    ]) + "\nORDER BY scope")
