"""Marketing-attribution counts and the cumulative-user curve — the
conversion-accounting members of the events family (funnel counts the
ordered step sequence, retention counts return visits; attribution
assigns each conversion to the touch that deserves it).

`attribution_counts`: every `purchase` is attributed twice — to the
LAST preceding touch (`click`/`view`) and to the user's FIRST touch
when it precedes the purchase — strict (ts, event_id) composite order,
`none` when no qualifying touch exists. Distributed shape: ONE
exchange by user hash (each user's history lands whole in one
partition — the `asof_join` partitioning contract), a per-partition
vectorized sweep (sort once, forward-fill last-touch indices with the
segment-start validity check, segment-min for first touch; no Python
row loop), and a 6-row counts fold.

`cumulative_users_daily`: first-seen day per user (one groupby), day
histogram, driver cumsum on the bounded day grid.

Oracle: correlated ORDER BY ... LIMIT 1 subqueries (attribution) and
the running-sum window (cumulative) — all integers, bit-exact.

Reference relationship: none; extends the funnel/retention family
(`rayse/ops/funnel.py`, `rayse/ops/retention.py`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY_US = 86_400_000_000
TOUCH_TYPES = ("click", "view")
CONV_TYPE = "purchase"


def _attr_partial(tbl: pa.Table) -> pa.Table:
    empty = pa.table({"model": pa.array([], pa.string()),
                      "touch": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    uid = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = tbl["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    eid = tbl["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    order = np.lexsort((eid, ts, uid))
    uid, ts, eid, et = uid[order], ts[order], eid[order], et[order]
    n = uid.size
    idx = np.arange(n, dtype=np.int64)
    is_touch = np.isin(et, TOUCH_TYPES)
    is_conv = et == CONV_TYPE
    if not is_conv.any():
        return empty
    new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
    start_row = np.maximum.accumulate(np.where(new_user, idx, 0))
    # last touch at or before each row (strictly before the conversion
    # row itself: a conversion is never a touch, so <= is safe)
    lt = np.maximum.accumulate(np.where(is_touch, idx, -1))
    lt_valid = (lt >= 0) & (lt >= start_row)
    # first touch per user segment
    seg_starts = np.flatnonzero(new_user)
    v = np.where(is_touch, idx, n)
    seg_min = np.minimum.reduceat(v, seg_starts)
    seg_len = np.diff(np.concatenate((seg_starts, [n])))
    ft = np.repeat(seg_min, seg_len)

    conv_idx = np.flatnonzero(is_conv)
    lt_touch = np.where(lt_valid[conv_idx],
                        np.where(lt[conv_idx] >= 0,
                                 et[np.maximum(lt[conv_idx], 0)],
                                 "none"), "none")
    ft_ok = ft[conv_idx] < conv_idx
    ft_touch = np.where(ft_ok, et[np.minimum(ft[conv_idx], n - 1)],
                        "none")

    models, touches, counts = [], [], []
    for model, arr in (("first", ft_touch), ("last", lt_touch)):
        uv, cnt = np.unique(arr.astype(str), return_counts=True)
        models.extend([model] * uv.size)
        touches.extend(uv.tolist())
        counts.extend(cnt.astype(np.int64).tolist())
    return pa.table({
        "model": pa.array(models, pa.string()),
        "touch": pa.array(touches, pa.string()),
        "n": pa.array(counts, pa.int64()),
    })


def attribution_counts(sf_dir: str) -> pa.Table:
    """(model, touch, n): purchase conversions attributed first-touch
    and last-touch to click/view (or 'none') — DuckDB hash-matched
    against the correlated LIMIT-1 oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    out = exchange_by_key(ds, "user_id", _attr_partial)
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    model = np.asarray(tbl["model"].to_pylist(), dtype=object)
    touch = np.asarray(tbl["touch"].to_pylist(), dtype=object)
    cnt = tbl["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    key = np.char.add(np.char.add(model.astype(str), "\x00"),
                      touch.astype(str))
    uk, inv = np.unique(key, return_inverse=True)
    first = np.full(uk.size, -1, np.int64)
    first[inv[::-1]] = np.arange(len(key) - 1, -1, -1)
    tot = np.bincount(inv, cnt, uk.size).astype(np.int64)
    order = np.argsort(uk, kind="stable")
    return pa.table({
        "model": pa.array(model[first][order].tolist(), pa.string()),
        "touch": pa.array(touch[first][order].tolist(), pa.string()),
        "n": pa.array(tot[order], pa.int64()),
    })


def attribution_counts_sql() -> str:
    touches = ", ".join(f"'{t}'" for t in TOUCH_TYPES)
    return f"""
WITH p AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = '{CONV_TYPE}'),
lt AS (
  SELECT p.event_id,
         (SELECT t.event_type FROM events t
          WHERE t.user_id = p.user_id
            AND t.event_type IN ({touches})
            AND (t.ts < p.ts OR (t.ts = p.ts
                                 AND t.event_id < p.event_id))
          ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS touch
  FROM p),
ft AS (
  SELECT p.event_id,
         (SELECT t.event_type FROM events t
          WHERE t.user_id = p.user_id
            AND t.event_type IN ({touches})
            AND (t.ts < p.ts OR (t.ts = p.ts
                                 AND t.event_id < p.event_id))
          ORDER BY t.ts, t.event_id LIMIT 1) AS touch
  FROM p)
SELECT model, touch, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT 'first' AS model, coalesce(touch, 'none') AS touch FROM ft
  UNION ALL
  SELECT 'last', coalesce(touch, 'none') FROM lt)
GROUP BY model, touch
ORDER BY model, touch"""


def _first_day_partial(batch: pa.Table) -> pa.Table:
    uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    day = np.floor_divide(ts, DAY_US)
    uk, inv = np.unique(uid, return_inverse=True)
    md = np.full(uk.size, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(md, inv, day)
    return pa.table({
        "user_id": pa.array(uk, pa.int64()),
        "day": pa.array(md, pa.int64()),
    })


def _day_hist(batch: pa.Table) -> pa.Table:
    d = batch["min(day)"].to_numpy(zero_copy_only=False)
    uk, cnt = np.unique(d, return_counts=True)
    return pa.table({
        "day": pa.array(uk, pa.int64()),
        "c": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def cumulative_users_daily(sf_dir: str) -> pa.Table:
    """(day, new_users, cum_users): first-seen-day histogram with the
    running total — DuckDB hash-matched against the min-day + window
    running-sum oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    agg = (ds.map_batches(_first_day_partial, batch_format="pyarrow")
           .groupby("user_id").min("day")
           .map_batches(_day_hist, batch_format="pyarrow")
           .groupby("day").sum("c"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    day = tbl["day"].to_numpy(zero_copy_only=False)
    c = tbl["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(day, kind="stable")
    return pa.table({
        "day": pa.array(day[o], pa.int64()),
        "new_users": pa.array(c[o], pa.int64()),
        "cum_users": pa.array(np.cumsum(c[o]), pa.int64()),
    })


def cumulative_users_daily_sql() -> str:
    return f"""
WITH f AS (
  SELECT user_id,
         min(CAST(floor(epoch_us(ts) / {DAY_US}) AS BIGINT)) AS day
  FROM events GROUP BY user_id),
d AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
      FROM f GROUP BY day)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d ORDER BY day"""


def _ttc_partial(tbl: pa.Table) -> pa.Table:
    """Per-partition (delta_s, cnt) histogram of purchase-minus-last-
    touch seconds, plus a (-1, n_conv) row carrying the partition's
    total conversion count."""
    empty = pa.table({"delta_s": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
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
    idx = np.arange(n, dtype=np.int64)
    is_touch = np.isin(et, TOUCH_TYPES)
    is_conv = et == CONV_TYPE
    n_conv = int(is_conv.sum())
    if n_conv == 0:
        return empty
    new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
    start_row = np.maximum.accumulate(np.where(new_user, idx, 0))
    lt = np.maximum.accumulate(np.where(is_touch, idx, -1))
    conv_idx = np.flatnonzero(is_conv)
    ok = (lt[conv_idx] >= 0) & (lt[conv_idx] >= start_row[conv_idx])
    deltas = (ts[conv_idx[ok]]
              - ts[lt[conv_idx[ok]]]) // 1_000_000
    ud, cnt = np.unique(deltas, return_counts=True)
    return pa.table({
        "delta_s": pa.array(np.concatenate((ud, [-1])), pa.int64()),
        "cnt": pa.array(np.concatenate((cnt.astype(np.int64),
                                        [n_conv])), pa.int64()),
    })


def time_to_convert(sf_dir: str) -> pa.Table:
    """(n_conv, n_attr, median_s, p90_s): lower-order-statistic median
    and p90 of seconds from last touch to purchase, off the
    delta-seconds histogram fold — DuckDB hash-matched against the
    correlated LIMIT-1 + row_number order-statistic oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    out = exchange_by_key(ds, "user_id", _ttc_partial)
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    d = tbl["delta_s"].to_numpy(zero_copy_only=False)
    c = tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_conv = int(c[d == -1].sum())
    m = d >= 0
    ud, inv = np.unique(d[m], return_inverse=True)
    hist = np.bincount(inv, c[m], ud.size).astype(np.int64)
    n_attr = int(hist.sum())
    cum = np.cumsum(hist)
    med_pos = (n_attr + 1) // 2
    p90_pos = (9 * n_attr + 9) // 10
    median_s = int(ud[np.searchsorted(cum, med_pos)])
    p90_s = int(ud[np.searchsorted(cum, p90_pos)])
    return pa.table({
        "n_conv": pa.array([n_conv], pa.int64()),
        "n_attr": pa.array([n_attr], pa.int64()),
        "median_s": pa.array([median_s], pa.int64()),
        "p90_s": pa.array([p90_s], pa.int64()),
    })


def time_to_convert_sql() -> str:
    touches = ", ".join(f"'{t}'" for t in TOUCH_TYPES)
    return f"""
WITH p AS (
  SELECT user_id, ts, event_id FROM events
  WHERE event_type = '{CONV_TYPE}'),
d AS (
  SELECT (CAST(epoch_us(p.ts) AS BIGINT)
          - (SELECT CAST(epoch_us(t.ts) AS BIGINT) FROM events t
             WHERE t.user_id = p.user_id
               AND t.event_type IN ({touches})
               AND (t.ts < p.ts OR (t.ts = p.ts
                                    AND t.event_id < p.event_id))
             ORDER BY t.ts DESC, t.event_id DESC LIMIT 1))
           // 1000000 AS delta_s
  FROM p),
o AS (
  SELECT delta_s,
         row_number() OVER (ORDER BY delta_s) AS rn,
         count(*) OVER () AS cnt
  FROM d WHERE delta_s IS NOT NULL)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_conv,
       CAST(max(cnt) AS BIGINT) AS n_attr,
       CAST(max(CASE WHEN rn = (cnt + 1) // 2
                     THEN delta_s END) AS BIGINT) AS median_s,
       CAST(max(CASE WHEN rn = (9 * cnt + 9) // 10
                     THEN delta_s END) AS BIGINT) AS p90_s
FROM o"""


def ab_conversion_lift(sf_dir: str) -> pa.Table:
    """(bucket, n_users, n_conv_users, conv_ppm, lift_ppm): the A/B
    harness cell — users deterministically split by user_id parity,
    per-bucket converter rate in ppm, and the shared B-vs-A lift ratio
    — DuckDB hash-matched. Distributed shape: per-batch (user, bucket,
    any-conversion) partials -> one user groupby -> a 2-row fold."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        conv = (et == CONV_TYPE).astype(np.int64)
        uk, inv = np.unique(uid, return_inverse=True)
        return pa.table({
            "user_id": pa.array(uk, pa.int64()),
            "c": pa.array(np.bincount(inv, conv, uk.size)
                          .astype(np.int64), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("user_id").sum("c"))

    def fold(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        c = batch["sum(c)"].to_numpy(zero_copy_only=False)
        b = uid % 2
        out = []
        for bv in (0, 1):
            m = b == bv
            out.append((bv, int(m.sum()), int((c[m] > 0).sum())))
        return pa.table({
            "bucket": pa.array([o[0] for o in out], pa.int64()),
            "nu": pa.array([o[1] for o in out], pa.int64()),
            "nc": pa.array([o[2] for o in out], pa.int64()),
        })

    import ray as _ray

    parts = pa.concat_tables(
        [t for t in _ray.get(
            agg.map_batches(fold, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows],
        promote_options="default")
    b = parts["bucket"].to_numpy(zero_copy_only=False)
    nu = parts["nu"].to_numpy(zero_copy_only=False).astype(np.int64)
    nc = parts["nc"].to_numpy(zero_copy_only=False).astype(np.int64)
    stats = {}
    for bv in (0, 1):
        m = b == bv
        stats[bv] = (int(nu[m].sum()), int(nc[m].sum()))
    ppm = {bv: stats[bv][1] * 1_000_000 // max(stats[bv][0], 1)
           for bv in (0, 1)}
    lift = ppm[1] * 1_000_000 // max(ppm[0], 1)
    return pa.table({
        "bucket": pa.array([0, 1], pa.int64()),
        "n_users": pa.array([stats[0][0], stats[1][0]], pa.int64()),
        "n_conv_users": pa.array([stats[0][1], stats[1][1]],
                                 pa.int64()),
        "conv_ppm": pa.array([ppm[0], ppm[1]], pa.int64()),
        "lift_ppm": pa.array([lift, lift], pa.int64()),
    })


def ab_conversion_lift_sql() -> str:
    return f"""
WITH u AS (
  SELECT user_id, user_id % 2 AS bucket,
         max(CASE WHEN event_type = '{CONV_TYPE}'
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id),
s AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_conv_users
  FROM u GROUP BY bucket),
p AS (
  SELECT bucket, n_users, n_conv_users,
         n_conv_users * 1000000 // greatest(n_users, 1) AS conv_ppm
  FROM s)
SELECT bucket, n_users, n_conv_users,
       CAST(conv_ppm AS BIGINT) AS conv_ppm,
       CAST((SELECT conv_ppm FROM p WHERE bucket = 1) * 1000000
            // greatest((SELECT conv_ppm FROM p WHERE bucket = 0), 1)
            AS BIGINT) AS lift_ppm
FROM p ORDER BY bucket"""
