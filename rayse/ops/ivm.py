"""Incremental view maintenance (IVM) for a DISTINCT-count view —
bag-semantics multiplicity algebra (the classical IVM construction:
Griffin & Libkin 1995): COUNT DISTINCT is not delta-able from the
answer alone, so the maintained state is the (group, key) MULTIPLICITY
table; applying a RETRACTION delta means subtracting delta
multiplicities and re-counting support (m − Δm > 0).

The pin: the Ray side reconstructs "distinct users per type with the
last day retracted" ONLY via multiplicity subtraction (never touching
a day filter), while the DuckDB oracle computes the same number
DIRECTLY (`WHERE day < D`). Equality is the IVM correctness theorem
for the retraction path — the same
maintained-equals-recomputed contract the index maintenance family
pins for delete+compact (`index/maintenance.py`, SURVEY S10).

Distributed shape: ONE (type, user) groupby carrying two counts
(full, last-day) from per-batch partials; support counting folds that
grouped Dataset through a SECOND per-batch partial + tiny type
groupby — the (type, user) table is never driver-materialized.

Reference relationship: S8's ``ON CONFLICT`` upsert keeps PostgreSQL
views fresh row-by-row; this is the set-oriented maintenance algebra.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY_US = 86_400_000_000


def ivm_distinct_retract(sf_dir: str) -> pa.Table:
    """(event_type, n_full, n_base, n_delta): distinct users per type —
    full corpus, after retracting the last day (maintained via
    multiplicity subtraction), and touched by the delta — DuckDB
    hash-matched against the direct recompute."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    ts_col = (pads.dataset(f"{sf_dir}/events.parquet")
              .to_table(columns=["ts"])["ts"])
    days = (ts_col.combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view("int64") // DAY_US)
    d_last = int(days.max())

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "user_id"])

    def mult_partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        day = (batch["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").view("int64") // DAY_US)
        key = np.char.add(np.char.add(et.astype(str), "|"),
                          uid.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(uk.tolist(), pa.string()),
            "m_full": pa.array(np.bincount(inv, None, uk.size)
                               .astype(np.int64), pa.int64()),
            "m_delta": pa.array(
                np.bincount(inv, (day == d_last).astype(np.float64),
                            uk.size).astype(np.int64), pa.int64()),
        })

    mult = (ds.map_batches(mult_partial, batch_format="pyarrow")
            .groupby("key").sum(["m_full", "m_delta"]))

    def support_partial(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_pylist()
        mf = batch["sum(m_full)"].to_numpy(zero_copy_only=False)
        md = batch["sum(m_delta)"].to_numpy(zero_copy_only=False)
        et = np.asarray([k.split("|")[0] for k in keys], dtype=object)
        ue, inv = np.unique(et.astype(str), return_inverse=True)
        return pa.table({
            "event_type": pa.array(ue.tolist(), pa.string()),
            "n_full": pa.array(np.bincount(
                inv, (mf > 0).astype(np.float64), ue.size)
                .astype(np.int64), pa.int64()),
            "n_base": pa.array(np.bincount(
                inv, (mf - md > 0).astype(np.float64), ue.size)
                .astype(np.int64), pa.int64()),
            "n_delta": pa.array(np.bincount(
                inv, (md > 0).astype(np.float64), ue.size)
                .astype(np.int64), pa.int64()),
        })

    import ray

    agg = (mult.map_batches(support_partial, batch_format="pyarrow")
           .groupby("event_type").sum(["n_full", "n_base", "n_delta"]))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    o = np.argsort(et.astype(str), kind="stable")
    return pa.table({
        "event_type": pa.array(et[o].tolist(), pa.string()),
        "n_full": pa.array(
            tbl["sum(n_full)"].to_numpy(zero_copy_only=False)[o]
            .astype(np.int64), pa.int64()),
        "n_base": pa.array(
            tbl["sum(n_base)"].to_numpy(zero_copy_only=False)[o]
            .astype(np.int64), pa.int64()),
        "n_delta": pa.array(
            tbl["sum(n_delta)"].to_numpy(zero_copy_only=False)[o]
            .astype(np.int64), pa.int64()),
    })


def ivm_distinct_retract_sql() -> str:
    return f"""
WITH d AS (SELECT max(epoch_us(ts) // {DAY_US}) AS dl FROM events),
x AS (SELECT event_type, user_id,
             epoch_us(ts) // {DAY_US} AS day FROM events)
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_full,
       CAST(count(DISTINCT user_id)
              FILTER (WHERE day < (SELECT dl FROM d)) AS BIGINT)
         AS n_base,
       CAST(count(DISTINCT user_id)
              FILTER (WHERE day = (SELECT dl FROM d)) AS BIGINT)
         AS n_delta
FROM x GROUP BY event_type ORDER BY event_type"""
