"""SCD-type-2 state intervals — the change-data-capture view of the
events log: each user's consecutive run of equal event_type collapses
to one validity interval [valid_from, valid_to) that closes when the
state changes (the slowly-changing-dimension type-2 snapshot shape;
`sessionize` splits on time gaps, this splits on STATE CHANGES).

Distributed shape: ONE exchange by user hash (each user's history
whole in one partition — the `attribution` contract), a vectorized
run-length sweep per partition (sort once; boundaries = new user OR
state change; no Python row loop). Open (last) intervals carry
valid_to_us = -1 — a sentinel, not NULL, so the integer column stays
null-free through the hash compare.

Oracle: the classic gaps-and-islands double row_number() grouping +
lead() window — bit-exact integers.

Reference relationship: none; extends the temporal family
(`windows.sessionize`, `relational.asof_join_events`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _scd_partial(tbl: pa.Table) -> pa.Table:
    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "state": pa.array([], pa.string()),
        "valid_from_us": pa.array([], pa.int64()),
        "valid_to_us": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    uid = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = tbl["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    eid = tbl["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    order = np.lexsort((eid, ts, uid))
    uid, ts, et = uid[order], ts[order], et[order]
    n = uid.size
    new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
    new_state = np.concatenate(([True], et[1:] != et[:-1]))
    start = new_user | new_state
    starts = np.flatnonzero(start)
    lens = np.diff(np.concatenate((starts, [n])))
    # valid_to: start ts of the NEXT run of the same user, else -1
    nxt = np.concatenate((starts[1:], [n]))
    same_user = np.concatenate((uid[starts[1:]] == uid[starts[:-1]],
                                [False]))
    valid_to = np.where(same_user, ts[np.minimum(nxt, n - 1)], -1)
    return pa.table({
        "user_id": pa.array(uid[starts], pa.int64()),
        "state": pa.array(et[starts].tolist(), pa.string()),
        "valid_from_us": pa.array(ts[starts], pa.int64()),
        "valid_to_us": pa.array(valid_to, pa.int64()),
        "n_events": pa.array(lens.astype(np.int64), pa.int64()),
    })


def scd2_intervals(sf_dir: str) -> pa.Table:
    """(user_id, state, valid_from_us, valid_to_us, n_events): SCD-2
    state-run intervals per user — DuckDB hash-matched against the
    gaps-and-islands + lead() oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    # row-sized result: stream back as a Dataset (no driver
    # materialization; the oracle compare sorts rows itself)
    return exchange_by_key(ds, "user_id", _scd_partial)


def scd2_intervals_sql() -> str:
    return """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(epoch_us(ts) AS BIGINT) AS tu
  FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
  FROM e),
g AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY rn) AS grp
  FROM r),
runs AS (
  SELECT user_id, event_type AS state,
         CAST(min(tu) AS BIGINT) AS valid_from_us,
         min(rn) AS rn0,
         CAST(count(*) AS BIGINT) AS n_events
  FROM g GROUP BY user_id, event_type, grp)
SELECT user_id, state, valid_from_us,
       CAST(coalesce(lead(valid_from_us)
              OVER (PARTITION BY user_id ORDER BY rn0), -1)
            AS BIGINT) AS valid_to_us,
       n_events
FROM runs
ORDER BY user_id, valid_from_us, state"""
