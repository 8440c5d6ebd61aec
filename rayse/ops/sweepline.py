"""Distributed sweep-line: peak concurrent sessions — "how many user
sessions were open at the busiest instant, and when was it?".

Sessions are the standing 30-minute-gap islands (`windows.sessionize`
semantics), carried as half-open [first_ts, last_ts + 1) microsecond
intervals. The peak is a prefix-maximum over +1/−1 boundary deltas in
(t, starts-before-ends) order — a sequential recurrence made
distributed by the classic two-phase split:

  pass A (sessions):   ONE user-hash exchange; vectorized
                       gaps-and-islands per partition emits the
                       boundary deltas (+1 at start, −1 at end).
  pass B (sweep):      boundaries exchange by DAY bucket; each bucket
                       reports (sum, local running-max, first t of
                       local max) — three integers — and the driver
                       chains bucket offsets over the bounded day
                       grid, exactly like a segmented prefix-scan
                       combine. No bucket ever sees another bucket's
                       rows.

Tie rule: at equal t the +1 sorts first (touching sessions count as
concurrent at the boundary instant), mirrored in the oracle's
ORDER BY t, delta DESC window.

Reference relationship: none; the sweep-line member of the window
family (`windows.py`, `intervals.py` islands).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY_US = 86_400_000_000
GAP_US = 1800 * 1_000_000


def _session_bounds_proc(tbl: pa.Table) -> pa.Table:
    empty = pa.table({"t": pa.array([], pa.int64()),
                      "delta": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    uid = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = tbl["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    eid = tbl["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((eid, ts, uid))
    uid, ts = uid[order], ts[order]
    new_sess = np.concatenate(
        ([True], (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > GAP_US)))
    starts = np.flatnonzero(new_sess)
    ends = np.concatenate((starts[1:], [uid.size])) - 1
    t = np.concatenate((ts[starts], ts[ends] + 1))
    delta = np.concatenate((np.ones(starts.size, np.int64),
                            -np.ones(starts.size, np.int64)))
    return pa.table({"t": pa.array(t, pa.int64()),
                     "delta": pa.array(delta, pa.int64())})


def _bucket_scan_proc(tbl: pa.Table) -> pa.Table:
    empty = pa.table({"day": pa.array([], pa.int64()),
                      "total": pa.array([], pa.int64()),
                      "n_starts": pa.array([], pa.int64()),
                      "local_max": pa.array([], pa.int64()),
                      "t_at_max": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    t = tbl["t"].to_numpy(zero_copy_only=False)
    d = tbl["delta"].to_numpy(zero_copy_only=False)
    day = tbl["day"].to_numpy(zero_copy_only=False)
    out = {"day": [], "total": [], "n_starts": [], "local_max": [],
           "t_at_max": []}
    for dv in np.unique(day):
        m = day == dv
        tt, dd = t[m], d[m]
        o = np.lexsort((-dd, tt))       # starts before ends at equal t
        run = np.cumsum(dd[o])
        out["day"].append(int(dv))
        out["total"].append(int(dd.sum()))
        out["n_starts"].append(int((dd > 0).sum()))
        out["local_max"].append(int(run.max()))
        out["t_at_max"].append(int(tt[o][int(np.argmax(run))]))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def max_concurrent_sessions(sf_dir: str) -> pa.Table:
    """(n_sessions, peak, t_at_peak_us): peak concurrent 30-min-gap
    sessions and the first microsecond achieving it — DuckDB
    hash-matched against the gaps-and-islands + running-sum window
    oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    bounds = exchange_by_key(ds, "user_id", _session_bounds_proc)

    def stamp_day(batch: pa.Table) -> pa.Table:
        t = batch["t"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "day", pa.array(t // DAY_US, pa.int64()))

    stamped = bounds.map_batches(stamp_day, batch_format="pyarrow")
    scans = exchange_by_key(stamped, "day", _bucket_scan_proc)
    tbl = pa.concat_tables(
        [t for t in ray.get(scans.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    day = tbl["day"].to_numpy(zero_copy_only=False)
    tot = tbl["total"].to_numpy(zero_copy_only=False)
    nst = tbl["n_starts"].to_numpy(zero_copy_only=False)
    lmx = tbl["local_max"].to_numpy(zero_copy_only=False)
    tam = tbl["t_at_max"].to_numpy(zero_copy_only=False)
    o = np.argsort(day, kind="stable")
    day, tot, lmx, tam = day[o], tot[o], lmx[o], tam[o]
    offsets = np.concatenate(([0], np.cumsum(tot)[:-1]))
    glob = lmx + offsets
    peak = int(glob.max())
    i = int(np.argmax(glob))   # first day achieving the peak
    return pa.table({
        "n_sessions": pa.array([int(nst.sum())], pa.int64()),
        "peak": pa.array([peak], pa.int64()),
        "t_at_peak_us": pa.array([int(tam[i])], pa.int64()),
    })


def max_concurrent_sessions_sql() -> str:
    return f"""
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tu, event_id
  FROM events),
r AS (
  SELECT *, lag(tu) OVER (PARTITION BY user_id
                          ORDER BY tu, event_id) AS prev
  FROM e),
g AS (
  SELECT *, sum(CASE WHEN prev IS NULL OR tu - prev > {GAP_US}
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id
                    ORDER BY tu, event_id) AS sess
  FROM r),
sess AS (
  SELECT user_id, sess, min(tu) AS s, max(tu) + 1 AS e
  FROM g GROUP BY user_id, sess),
bounds AS (
  SELECT s AS t, CAST(1 AS BIGINT) AS delta FROM sess
  UNION ALL
  SELECT e, -1 FROM sess),
scan AS (
  SELECT t, sum(delta) OVER (ORDER BY t, delta DESC
                             ROWS UNBOUNDED PRECEDING) AS run
  FROM bounds)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM sess) AS n_sessions,
       CAST(max(run) AS BIGINT) AS peak,
       CAST((SELECT min(t) FROM scan
             WHERE run = (SELECT max(run) FROM scan))
            AS BIGINT) AS t_at_peak_us
FROM scan"""


def _bounce_partial(tbl: pa.Table) -> pa.Table:
    """Per-partition (day, n_sessions, n_bounces) partials — sessions
    are user-local (the exchange contract), day = session start day."""
    empty = pa.table({"day": pa.array([], pa.int64()),
                      "n_sessions": pa.array([], pa.int64()),
                      "n_bounces": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    uid = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = tbl["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    eid = tbl["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((eid, ts, uid))
    uid, ts = uid[order], ts[order]
    new_sess = np.concatenate(
        ([True], (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > GAP_US)))
    starts = np.flatnonzero(new_sess)
    lens = np.diff(np.concatenate((starts, [uid.size])))
    day = ts[starts] // DAY_US
    ud, inv = np.unique(day, return_inverse=True)
    return pa.table({
        "day": pa.array(ud, pa.int64()),
        "n_sessions": pa.array(np.bincount(inv, None, ud.size)
                               .astype(np.int64), pa.int64()),
        "n_bounces": pa.array(np.bincount(inv, lens == 1, ud.size)
                              .astype(np.int64), pa.int64()),
    })


def bounce_rate_daily(sf_dir: str) -> pa.Table:
    """(day, n_sessions, n_bounces, bounce_ppm): share of single-event
    30-min-gap sessions per session-start day — DuckDB hash-matched
    against the gaps-and-islands oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    out = exchange_by_key(ds, "user_id", _bounce_partial)
    agg = (out.groupby("day")
           .aggregate(rd.aggregate.Sum("n_sessions"),
                      rd.aggregate.Sum("n_bounces")))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    day = tbl["day"].to_numpy(zero_copy_only=False)
    ns = tbl["sum(n_sessions)"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    nb = tbl["sum(n_bounces)"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    o = np.argsort(day, kind="stable")
    return pa.table({
        "day": pa.array(day[o], pa.int64()),
        "n_sessions": pa.array(ns[o], pa.int64()),
        "n_bounces": pa.array(nb[o], pa.int64()),
        "bounce_ppm": pa.array(
            nb[o] * 1_000_000 // np.maximum(ns[o], 1), pa.int64()),
    })


def bounce_rate_daily_sql() -> str:
    return f"""
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tu, event_id
  FROM events),
r AS (
  SELECT *, lag(tu) OVER (PARTITION BY user_id
                          ORDER BY tu, event_id) AS prev
  FROM e),
g AS (
  SELECT *, sum(CASE WHEN prev IS NULL OR tu - prev > {GAP_US}
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id
                    ORDER BY tu, event_id) AS sess
  FROM r),
s AS (
  SELECT user_id, sess,
         CAST(min(tu) // {DAY_US} AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_ev
  FROM g GROUP BY user_id, sess)
SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) * 1000000
            // greatest(count(*), 1) AS BIGINT) AS bounce_ppm
FROM s GROUP BY day ORDER BY day"""


WINDOW_DAYS = 7


def _coverage_partial(tbl: pa.Table) -> pa.Table:
    """Per-user coverage boundaries: a user with an active day d is
    'in window' for days [d, d+6]; merged islands (gap > 6 splits)
    emit one +1/-1 delta pair each."""
    empty = pa.table({"day": pa.array([], pa.int64()),
                      "delta": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    uid = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = tbl["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    day = ts // DAY_US
    key = np.unique(uid * np.int64(1 << 32)
                    + (day - day.min()))        # distinct (user, day)
    u = key // (1 << 32)
    d = key % (1 << 32) + day.min()
    new_island = np.concatenate(
        ([True], (u[1:] != u[:-1])
         | (d[1:] - d[:-1] > WINDOW_DAYS - 1)))
    starts = np.flatnonzero(new_island)
    ends = np.concatenate((starts[1:], [u.size])) - 1
    t = np.concatenate((d[starts], d[ends] + WINDOW_DAYS))
    delta = np.concatenate((np.ones(starts.size, np.int64),
                            -np.ones(starts.size, np.int64)))
    return pa.table({"day": pa.array(t, pa.int64()),
                     "delta": pa.array(delta, pa.int64())})


def sliding_distinct_users(sf_dir: str) -> pa.Table:
    """(day, n_users_7d): EXACT trailing-7-day distinct user count per
    day — the exact counterpart of the HLL daily window
    (`sketch.hll_daily_window`). Per-user coverage islands through one
    user exchange, one bounded (day, delta) fold, driver cumsum on the
    day grid — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    bounds = exchange_by_key(ds, "user_id", _coverage_partial)
    agg = bounds.groupby("day").sum("delta")
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    d = tbl["day"].to_numpy(zero_copy_only=False)
    dl = tbl["sum(delta)"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    o = np.argsort(d, kind="stable")
    d, dl = d[o], dl[o]
    # event-day span (coverage extends past it; clamp to real days)
    lo = int(d.min())
    hi = int(d.max()) - WINDOW_DAYS   # last REAL event day
    grid = np.arange(lo, hi + 1)
    deltas = np.zeros(grid.size + 1, np.int64)
    idx = np.searchsorted(grid, d)
    for i, dd in zip(idx, dl):
        if i < deltas.size:
            deltas[i] += dd
    counts = np.cumsum(deltas[:-1])
    return pa.table({
        "day": pa.array(grid, pa.int64()),
        "n_users_7d": pa.array(counts, pa.int64()),
    })


def sliding_distinct_users_sql() -> str:
    return f"""
WITH e AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day
  FROM events),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
grid AS (
  SELECT CAST(unnest(range((SELECT lo FROM span),
                           (SELECT hi FROM span) + 1)) AS BIGINT)
           AS day)
SELECT g.day,
       CAST((SELECT count(DISTINCT user_id) FROM e
             WHERE e.day BETWEEN g.day - {WINDOW_DAYS - 1} AND g.day)
            AS BIGINT) AS n_users_7d
FROM grid g ORDER BY g.day"""
