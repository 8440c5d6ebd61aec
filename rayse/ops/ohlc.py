"""Daily OHLC candles per event type — the order-statistics window
aggregate the dashboard family draws (open/high/low/close over
cents-quantized values).

The interesting combiner is OPEN/CLOSE: "value at the earliest
(ts, event_id)" is an argmin over a composite key, which Ray Data's
built-in aggregates can't express — so each batch emits a per-(type,
day) PARTIAL carrying (first_key, first_cents, last_key, last_cents,
lo, hi, n), and the driver folds partials with the same lexicographic
rule. The fold input is bounded by types x days x blocks (grid-sized,
never row-sized — the `bursts.py` dense-grid contract). The composite
tie-break key packs (ts_us, event_id) into the comparison tuple so
duplicate timestamps stay deterministic.

Oracle: the row_number() window formulation (ORDER BY ts, event_id
ascending/descending) — bit-exact, all integers.

Reference relationship: none; pins the argmin/argmax-combiner shape
alongside the sum/count combiners of `windows.py`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY_US = 86_400_000_000


def _ohlc_partial_batch(batch: pa.Table) -> pa.Table:
    ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    cents = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
    et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    day = np.floor_divide(ts, DAY_US)
    key = np.char.add(np.char.add(et.astype(str), "\x00"),
                      day.astype(str))
    uk, inv = np.unique(key, return_inverse=True)
    n_g = uk.size
    # lexsort by (group, ts, eid): first/last rows per group
    order = np.lexsort((eid, ts, inv))
    ginv = inv[order]
    firsts = np.concatenate(([True], ginv[1:] != ginv[:-1]))
    lasts = np.concatenate((ginv[1:] != ginv[:-1], [True]))
    fi = order[firsts]          # row index of group first, group-sorted
    li = order[lasts]
    g_first = inv[fi]
    out = {
        "event_type": pa.array(et[fi].tolist(), pa.string()),
        "day": pa.array(day[fi], pa.int64()),
        "f_ts": pa.array(ts[fi], pa.int64()),
        "f_id": pa.array(eid[fi], pa.int64()),
        "f_cents": pa.array(cents[fi], pa.int64()),
        "l_ts": pa.array(ts[li], pa.int64()),
        "l_id": pa.array(eid[li], pa.int64()),
        "l_cents": pa.array(cents[li], pa.int64()),
        "lo": pa.array(np.minimum.reduceat(
            cents[order], np.flatnonzero(firsts)), pa.int64()),
        "hi": pa.array(np.maximum.reduceat(
            cents[order], np.flatnonzero(firsts)), pa.int64()),
        "n": pa.array(np.bincount(inv, None, n_g)[g_first]
                      .astype(np.int64), pa.int64()),
    }
    return pa.table(out)


def ohlc_daily(sf_dir: str) -> pa.Table:
    """(event_type, day, open, high, low, close, n): daily candles in
    cents per event type, open/close tie-broken by (ts, event_id) —
    DuckDB hash-matched against the window row_number oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type",
                                  "value"])
    parts = ds.map_batches(_ohlc_partial_batch, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    day = tbl["day"].to_numpy(zero_copy_only=False)
    key = np.char.add(np.char.add(et.astype(str), "\x00"),
                      day.astype(str))
    uk, inv = np.unique(key, return_inverse=True)
    f_ts = tbl["f_ts"].to_numpy(zero_copy_only=False)
    f_id = tbl["f_id"].to_numpy(zero_copy_only=False)
    f_c = tbl["f_cents"].to_numpy(zero_copy_only=False)
    l_ts = tbl["l_ts"].to_numpy(zero_copy_only=False)
    l_id = tbl["l_id"].to_numpy(zero_copy_only=False)
    l_c = tbl["l_cents"].to_numpy(zero_copy_only=False)
    lo = tbl["lo"].to_numpy(zero_copy_only=False)
    hi = tbl["hi"].to_numpy(zero_copy_only=False)
    n = tbl["n"].to_numpy(zero_copy_only=False)

    # fold: min by (f_ts, f_id) / max by (l_ts, l_id) per group
    o_first = np.lexsort((f_id, f_ts, inv))
    gi = inv[o_first]
    firsts = np.concatenate(([True], gi[1:] != gi[:-1]))
    pick_f = o_first[firsts]
    o_last = np.lexsort((-l_id, -l_ts, inv))
    gi2 = inv[o_last]
    firsts2 = np.concatenate(([True], gi2[1:] != gi2[:-1]))
    pick_l = o_last[firsts2]
    g_of_f = inv[pick_f]
    lo_g = np.full(uk.size, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(lo_g, inv, lo)
    hi_g = np.full(uk.size, np.iinfo(np.int64).min, np.int64)
    np.maximum.at(hi_g, inv, hi)
    n_g = np.zeros(uk.size, np.int64)
    np.add.at(n_g, inv, n)

    et_g = et[pick_f]
    day_g = day[pick_f]
    order = np.lexsort((day_g, et_g.astype(str)))
    return pa.table({
        "event_type": pa.array(et_g[order].tolist(), pa.string()),
        "day": pa.array(day_g[order], pa.int64()),
        "open": pa.array(f_c[pick_f][order], pa.int64()),
        "high": pa.array(hi_g[g_of_f][order], pa.int64()),
        "low": pa.array(lo_g[g_of_f][order], pa.int64()),
        "close": pa.array(l_c[pick_l][order], pa.int64()),
        "n": pa.array(n_g[g_of_f][order], pa.int64()),
    })


def ohlc_daily_sql() -> str:
    return f"""
WITH q AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / {DAY_US}) AS BIGINT) AS day,
         CAST(floor(value * 100) AS BIGINT) AS cents,
         ts, event_id
  FROM events),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM q)
SELECT event_type, day,
       CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open,
       CAST(max(cents) AS BIGINT) AS high,
       CAST(min(cents) AS BIGINT) AS low,
       CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM r
GROUP BY event_type, day
ORDER BY event_type, day"""
