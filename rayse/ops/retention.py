"""Retention cohort analysis over the events log.

The classic product-analytics triangle: cohort a user by the week of
their FIRST event; for each (cohort_week, week_offset) count the users
from that cohort active ``offset`` weeks later.  The same grouped
"distinct activity relative to a per-key anchor" shape underlies
freshness-weighted sampling and contributor-churn curves in
training-data pipelines.

Scale shape: the read keeps only (user_id, ts); each batch collapses to
DISTINCT (user, week) pairs FIRST (a per-batch partial dedup — weeks per
user per batch is tiny, so the exchange moves pairs, not raw events);
ONE exchange by user co-locates a user's weeks; each partition task
computes per-user first weeks and (cohort, offset) contributions
vectorized (np.unique over composites — a user contributes at most once
per (cohort, offset), so per-partition counts sum exactly).  The global
answer is a sum over n_parts tiny partials.

Weeks are integer micros // (7 * 86400 * 1e6) — truncation == floor for
the non-negative epoch timestamps both here and in the DuckDB oracle.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WEEK_US = 7 * 86400 * 1_000_000

_PAIRS_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("week", pa.int64()),
])


def _user_week_batch(batch: pa.Table) -> pa.Table:
    """events batch -> distinct (user_id, week) pairs (partial dedup)."""
    if batch.num_rows == 0:
        return pa.table({n: [] for n in _PAIRS_SCHEMA.names},
                        schema=_PAIRS_SCHEMA)
    user = batch["user_id"].to_numpy(zero_copy_only=False)
    ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    week = ts // WEEK_US
    pairs = np.unique(np.stack([user, week], axis=1), axis=0)
    return pa.table({
        "user_id": pa.array(pairs[:, 0], pa.int64()),
        "week": pa.array(pairs[:, 1], pa.int64()),
    })


def _retention_partition(tbl: pa.Table) -> pa.Table:
    """This partition's users -> (cohort_week, week_offset, n_users)
    partials; exact because a user's rows all land here."""
    empty = pa.table({
        "cohort_week": pa.array([], pa.int64()),
        "week_offset": pa.array([], pa.int64()),
        "n_users": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    user = tbl["user_id"].to_numpy(zero_copy_only=False)
    week = tbl["week"].to_numpy(zero_copy_only=False)
    uniq, urank = np.unique(user, return_inverse=True)
    # cross-batch partials may repeat (user, week): dedup on the composite
    w0 = int(week.min())
    span = int(week.max()) - w0 + 1
    comp = np.unique(urank.astype(np.int64) * span + (week - w0))
    cu = comp // span
    cw = comp % span + w0
    first = np.full(uniq.size, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(first, cu, cw)
    cohort = first[cu]
    offset = cw - cohort
    # one user contributes once per (cohort, offset): count composites
    out, counts = np.unique(
        np.stack([cohort, offset], axis=1), axis=0, return_counts=True)
    return pa.table({
        "cohort_week": pa.array(out[:, 0], pa.int64()),
        "week_offset": pa.array(out[:, 1], pa.int64()),
        "n_users": pa.array(counts.astype(np.int64), pa.int64()),
    })


def retention_counts(sf_dir: str) -> pa.Table:
    """(cohort_week, week_offset, n_users) — weekly retention triangle
    under first-event cohorting; see module header."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    pairs = ds.map_batches(_user_week_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
    partials = exchange_by_key(pairs, "user_id", _retention_partition)
    parts = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    acc: dict[tuple[int, int], int] = {}
    for t in parts:
        cw = t["cohort_week"].to_numpy(zero_copy_only=False)
        off = t["week_offset"].to_numpy(zero_copy_only=False)
        n = t["n_users"].to_numpy(zero_copy_only=False)
        for i in range(cw.size):          # partials are tiny (weeks^2/part)
            k = (int(cw[i]), int(off[i]))
            acc[k] = acc.get(k, 0) + int(n[i])
    keys = sorted(acc)
    return pa.table({
        "cohort_week": pa.array([k[0] for k in keys], pa.int64()),
        "week_offset": pa.array([k[1] for k in keys], pa.int64()),
        "n_users": pa.array([acc[k] for k in keys], pa.int64()),
    })


def retention_counts_sql() -> str:
    """Oracle for ``retention_counts``: distinct user-weeks, per-user min
    week, count per (cohort, offset)."""
    return f"""WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // {WEEK_US} AS BIGINT) AS wk
  FROM events),
f AS (SELECT user_id, min(wk) AS w0 FROM uw GROUP BY 1)
SELECT f.w0 AS cohort_week, uw.wk - f.w0 AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN f USING (user_id)
GROUP BY 1, 2"""
