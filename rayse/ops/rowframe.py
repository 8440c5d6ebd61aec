"""ROWS-frame moving aggregate — SUM OVER (PARTITION BY event_type
ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), the
count-based window frame the time-bucketed family can't express
(`trailing_window` / `twap_daily` frames are TIME-bounded and bucket
-local; a row frame crosses bucket boundaries by construction).

Scale shape — the tail-chain two-pass:

  pass 1: per-batch candidate tails (each batch's last FRAME-1 rows
          per (type, day)) -> a driver merge keeps the GLOBAL last
          FRAME-1 rows per (type, day) (types x days x FRAME state,
          grid-bounded). Walking days in order yields each (type,
          day)'s PREFIX: the last FRAME-1 values that precede its
          first row — exactly what the frame needs to cross the
          boundary.
  pass 2: ONE exchange by (type-hash, day); each partition task sorts
          its bucket, prepends the broadcast prefix, and the moving
          sum is a cumsum difference — vectorized, no halo reads, no
          cross-task coordination.

Every value is cents-quantized int64, so the sums are exact and the
oracle (the literal window frame) hash-matches bit-for-bit.

Reference relationship: none; completes the window family
(`windows.py` hopping/sessionize, `relational.trailing_window`) with
the ROWS-frame member.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY_US = 86_400_000_000
FRAME = 5                     # current row + 4 preceding


def _fnv64(vals) -> np.ndarray:
    h = np.full(len(vals), np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    for i, v in enumerate(vals):
        x = np.uint64(0xCBF29CE484222325)
        for bch in v.encode():
            x = (x ^ np.uint64(bch)) * prime
        h[i] = x
    return h.astype(np.int64)


def _stamp_batch(batch: pa.Table) -> pa.Table:
    ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    cents = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
    ut, inv = np.unique(et.astype(str), return_inverse=True)
    th = _fnv64(list(ut))[inv]
    return pa.table({
        "event_id": batch["event_id"],
        "tu": pa.array(ts, pa.int64()),
        "event_type": pa.array(et.tolist(), pa.string()),
        "thash": pa.array(th, pa.int64()),
        "day": pa.array(ts // DAY_US, pa.int64()),
        "cents": pa.array(cents, pa.int64()),
    })


def _tail_candidates(batch: pa.Table) -> pa.Table:
    """Last FRAME-1 rows of this batch per (type, day) — a superset of
    the global tails."""
    et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    tu = batch["tu"].to_numpy(zero_copy_only=False)
    eid = batch["event_id"].to_numpy(zero_copy_only=False)
    day = batch["day"].to_numpy(zero_copy_only=False)
    cents = batch["cents"].to_numpy(zero_copy_only=False)
    key = np.char.add(np.char.add(et.astype(str), "\x00"),
                      day.astype(str))
    order = np.lexsort((eid, tu, key))
    ks = key[order]
    # positions of the last FRAME-1 rows of each group
    ends = np.concatenate((ks[1:] != ks[:-1], [True]))
    end_pos = np.flatnonzero(ends)
    start_pos = np.concatenate(([0], end_pos[:-1] + 1))
    keep = np.zeros(ks.size, bool)
    for s, e in zip(start_pos, end_pos):
        keep[max(s, e - (FRAME - 2)):e + 1] = True
    pick = order[keep]
    return pa.table({
        "event_type": pa.array(et[pick].tolist(), pa.string()),
        "day": pa.array(day[pick], pa.int64()),
        "tu": pa.array(tu[pick], pa.int64()),
        "event_id": pa.array(eid[pick], pa.int64()),
        "cents": pa.array(cents[pick], pa.int64()),
    })


def _frame_proc(tbl: pa.Table, prefixes: dict) -> pa.Table:
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "msum_cents": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    tu = tbl["tu"].to_numpy(zero_copy_only=False)
    eid = tbl["event_id"].to_numpy(zero_copy_only=False)
    day = tbl["day"].to_numpy(zero_copy_only=False)
    cents = tbl["cents"].to_numpy(zero_copy_only=False)
    key = np.char.add(np.char.add(et.astype(str), "\x00"),
                      day.astype(str))
    order = np.lexsort((eid, tu, key))
    ks = key[order]
    starts = np.concatenate(([True], ks[1:] != ks[:-1]))
    start_pos = np.flatnonzero(starts)
    end_pos = np.concatenate((start_pos[1:], [ks.size]))
    out_id, out_s = [], []
    for s, e in zip(start_pos, end_pos):
        rows = order[s:e]
        pre = prefixes.get((str(et[rows[0]]), int(day[rows[0]])), ())
        vals = np.concatenate((np.asarray(pre, np.int64), cents[rows]))
        p = len(pre)
        c = np.concatenate(([0], np.cumsum(vals)))
        i = np.arange(e - s)
        hi = p + i + 1
        lo = np.maximum(0, hi - FRAME)
        out_id.append(eid[rows])
        out_s.append(c[hi] - c[lo])
    return pa.table({
        "event_id": pa.array(np.concatenate(out_id), pa.int64()),
        "msum_cents": pa.array(np.concatenate(out_s), pa.int64()),
    })


def moving_sum_rows(sf_dir: str) -> pa.Table:
    """(event_id, msum_cents): the exact ROWS-frame moving sum (4
    preceding + current, per event type, (ts, event_id) order) via the
    tail-chain two-pass — DuckDB hash-matched against the literal
    window-frame oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type",
                                  "value"])
    stamped = ds.map_batches(_stamp_batch, batch_format="pyarrow")

    # pass 1: global last FRAME-1 rows per (type, day)
    cand = pa.concat_tables(
        [t for t in ray.get(
            stamped.map_batches(_tail_candidates,
                                batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows],
        promote_options="default")
    cet = np.asarray(cand["event_type"].to_pylist(), dtype=object)
    cday = cand["day"].to_numpy(zero_copy_only=False)
    ctu = cand["tu"].to_numpy(zero_copy_only=False)
    cid = cand["event_id"].to_numpy(zero_copy_only=False)
    cc = cand["cents"].to_numpy(zero_copy_only=False)
    tails: dict = {}
    key = np.char.add(np.char.add(cet.astype(str), "\x00"),
                      cday.astype(str))
    order = np.lexsort((cid, ctu, key))
    ks = key[order]
    starts = np.concatenate(([True], ks[1:] != ks[:-1]))
    start_pos = np.flatnonzero(starts)
    end_pos = np.concatenate((start_pos[1:], [ks.size]))
    for s, e in zip(start_pos, end_pos):
        rows = order[max(s, e - (FRAME - 1)):e]
        t = str(cet[rows[0]])
        d = int(cday[rows[0]])
        tails[(t, d)] = cc[rows]
    # chain tails into per-(type, day) prefixes
    prefixes: dict = {}
    run: dict = {}
    for (t, d) in sorted(tails.keys()):
        prev = run.get(t, np.zeros(0, np.int64))
        prefixes[(t, d)] = tuple(int(v) for v in prev[-(FRAME - 1):])
        run[t] = np.concatenate((prev, tails[(t, d)]))[-(FRAME - 1):]

    # pass 2: one (type-hash, day) exchange, frame-local moving sums.
    # The result is ROW-SIZED, so it streams back as a Dataset — no
    # driver materialization (consumers sort/collect as needed).
    return exchange_by_key(stamped, ["thash", "day"], _frame_proc,
                           proc_kwargs={"prefixes": prefixes})


def moving_sum_rows_sql() -> str:
    return f"""
WITH q AS (
  SELECT event_id, ts, event_type,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT event_id,
       CAST(sum(cents) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id
                             ROWS BETWEEN {FRAME - 1} PRECEDING
                                      AND CURRENT ROW)
            AS BIGINT) AS msum_cents
FROM q ORDER BY event_id"""
