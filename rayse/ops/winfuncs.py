"""Distributed ordered window functions over the events log.

Per-user ordered analytics — ``row_number``, ``lag``-delta, and running
(cumulative) sum — the per-key ordered-scan primitives every
training-data pipeline leans on (session depth, inter-event deltas,
running totals).  SQL shape::

    row_number() OVER w, vq - lag(vq) OVER w, sum(vq) OVER w
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)

Scale shape (the classic two-phase distributed prefix scan, same
structure as ``relational.asof_join_events``):

1. rows are stamped with ``bucket = ts // bucket_us`` and ``vq =
   floor(value * 1e6)`` (all later arithmetic is integer, so the DuckDB
   oracle matches bit-for-bit);
2. a per-batch partial pass reduces the stream to one summary row per
   (user, bucket): row count, vq sum, and the LAST row's vq under the
   (ts, event_id) order;
3. one tiny exchange by user turns summaries into per-(user, bucket)
   carry rows — exclusive prefix offsets (rows before this bucket, vq
   sum before this bucket, previous bucket's last vq);
4. the final exchange by (user, bucket) computes local rn / delta /
   cumsum per partition and adds the carry offsets.

A hot user therefore splits across its time buckets (work per task is
bounded by events-per-bucket, never events-per-user), and the only
per-user state that travels twice is summary-sized.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VQ_SCALE = 1_000_000

_WF_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("bucket", pa.int64()),
    ("ts_us", pa.int64()), ("event_id", pa.int64()), ("vq", pa.int64()),
    ("rn_off", pa.int64()), ("cum_off", pa.int64()),
    ("prev_vq", pa.int64()), ("has_prev", pa.int8()),
    ("kind", pa.int8()),                       # 0 = event row, 1 = carry
])

_SUM_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("bucket", pa.int64()), ("n", pa.int64()),
    ("sum_vq", pa.int64()), ("last_ts", pa.int64()),
    ("last_eid", pa.int64()), ("last_vq", pa.int64()),
])


def _wf_empty(schema: pa.Schema) -> pa.Table:
    return pa.table({n: [] for n in schema.names}, schema=schema)


def _wf_stamp_batch(batch: pa.Table, bucket_us: int) -> pa.Table:
    """events batch -> unified exchange rows (kind=0, zero offsets)."""
    n = batch.num_rows
    if n == 0:
        return _wf_empty(_WF_SCHEMA)
    ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    vq = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                  * float(VQ_SCALE)).astype(np.int64)
    z = np.zeros(n, np.int64)
    z8 = np.zeros(n, np.int8)
    return pa.table({
        "user_id": pa.array(
            batch["user_id"].to_numpy(zero_copy_only=False), pa.int64()),
        "bucket": pa.array(ts // bucket_us, pa.int64()),
        "ts_us": pa.array(ts, pa.int64()),
        "event_id": pa.array(
            batch["event_id"].to_numpy(zero_copy_only=False), pa.int64()),
        "vq": pa.array(vq, pa.int64()),
        "rn_off": pa.array(z, pa.int64()),
        "cum_off": pa.array(z, pa.int64()),
        "prev_vq": pa.array(z, pa.int64()),
        "has_prev": pa.array(z8, pa.int8()),
        "kind": pa.array(z8, pa.int8()),
    })


def _wf_summary_batch(batch: pa.Table) -> pa.Table:
    """Stream-sized rows -> one partial per (user, bucket): count, vq sum,
    and the last (ts, event_id)-ordered row's vq."""
    if batch.num_rows == 0:
        return _wf_empty(_SUM_SCHEMA)
    user = batch["user_id"].to_numpy(zero_copy_only=False)
    bucket = batch["bucket"].to_numpy(zero_copy_only=False)
    ts = batch["ts_us"].to_numpy(zero_copy_only=False)
    eid = batch["event_id"].to_numpy(zero_copy_only=False)
    vq = batch["vq"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, bucket, user))
    u, b, t, e, v = (user[order], bucket[order], ts[order], eid[order],
                     vq[order])
    last = np.empty(u.size, dtype=bool)
    last[-1] = True
    last[:-1] = (u[1:] != u[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(np.concatenate(([True], last[:-1])))
    ends = np.flatnonzero(last)
    cum = np.cumsum(v, dtype=np.int64)
    gsum = cum[ends] - cum[starts] + v[starts]
    return pa.table({
        "user_id": pa.array(u[last], pa.int64()),
        "bucket": pa.array(b[last], pa.int64()),
        "n": pa.array(ends - starts + 1, pa.int64()),
        "sum_vq": pa.array(gsum, pa.int64()),
        "last_ts": pa.array(t[last], pa.int64()),
        "last_eid": pa.array(e[last], pa.int64()),
        "last_vq": pa.array(v[last], pa.int64()),
    })


def _wf_carry_partition(tbl: pa.Table) -> pa.Table:
    """All summary partials of this partition's users -> one carry row per
    (user, bucket): EXCLUSIVE prefix offsets over that user's earlier
    buckets plus the immediately-previous bucket's last vq. Vectorized
    over summaries (never over events)."""
    if tbl.num_rows == 0:
        return _wf_empty(_WF_SCHEMA)
    user = tbl["user_id"].to_numpy(zero_copy_only=False)
    bucket = tbl["bucket"].to_numpy(zero_copy_only=False)
    n = tbl["n"].to_numpy(zero_copy_only=False)
    sum_vq = tbl["sum_vq"].to_numpy(zero_copy_only=False)
    last_ts = tbl["last_ts"].to_numpy(zero_copy_only=False)
    last_eid = tbl["last_eid"].to_numpy(zero_copy_only=False)
    last_vq = tbl["last_vq"].to_numpy(zero_copy_only=False)
    # combine batch partials: order partials of one (user, bucket) so the
    # max-(ts, eid) partial comes last, then segment-reduce
    order = np.lexsort((last_eid, last_ts, bucket, user))
    u, b = user[order], bucket[order]
    nn, sv, lv = n[order], sum_vq[order], last_vq[order]
    last = np.empty(u.size, dtype=bool)
    last[-1] = True
    last[:-1] = (u[1:] != u[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(np.concatenate(([True], last[:-1])))
    ends = np.flatnonzero(last)
    cn = np.cumsum(nn, dtype=np.int64)
    cs = np.cumsum(sv, dtype=np.int64)
    g_n = cn[ends] - cn[starts] + nn[starts]
    g_sum = cs[ends] - cs[starts] + sv[starts]
    g_u, g_b, g_lv = u[last], b[last], lv[last]
    # exclusive per-user prefix over the (sorted) buckets
    ustart = np.empty(g_u.size, dtype=bool)
    ustart[0] = True
    ustart[1:] = g_u[1:] != g_u[:-1]
    rn_off = np.concatenate(([0], np.cumsum(g_n, dtype=np.int64)[:-1]))
    cum_off = np.concatenate(([0], np.cumsum(g_sum, dtype=np.int64)[:-1]))
    base_rn = np.where(ustart, 0, 0)          # per-user reset below
    ubase_idx = np.maximum.accumulate(
        np.where(ustart, np.arange(g_u.size), 0))
    rn_off = rn_off - rn_off[ubase_idx]
    cum_off = cum_off - cum_off[ubase_idx]
    del base_rn
    prev_vq = np.concatenate(([0], g_lv[:-1]))
    has_prev = (~ustart).astype(np.int8)
    prev_vq = np.where(ustart, 0, prev_vq)
    m = g_u.size
    return pa.table({
        "user_id": pa.array(g_u, pa.int64()),
        "bucket": pa.array(g_b, pa.int64()),
        "ts_us": pa.array(np.zeros(m, np.int64), pa.int64()),
        "event_id": pa.array(np.zeros(m, np.int64), pa.int64()),
        "vq": pa.array(np.zeros(m, np.int64), pa.int64()),
        "rn_off": pa.array(rn_off, pa.int64()),
        "cum_off": pa.array(cum_off, pa.int64()),
        "prev_vq": pa.array(prev_vq, pa.int64()),
        "has_prev": pa.array(has_prev, pa.int8()),
        "kind": pa.array(np.ones(m, np.int8), pa.int8()),
    })


def _wf_final_partition(tbl: pa.Table) -> pa.Table:
    """Rows + carries of this partition's (user, bucket) groups -> final
    (event_id, user_id, rn, delta_q, cum_q). Local ordered scan per group
    plus the carry offsets; everything segment-vectorized."""
    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "rn": pa.array([], pa.int64()),
        "delta_q": pa.array([], pa.int64()),
        "cum_q": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    rows = kind == 0
    if not rows.any():
        return empty
    user = tbl["user_id"].to_numpy(zero_copy_only=False)
    bucket = tbl["bucket"].to_numpy(zero_copy_only=False)
    ts = tbl["ts_us"].to_numpy(zero_copy_only=False)[rows]
    eid = tbl["event_id"].to_numpy(zero_copy_only=False)[rows]
    vq = tbl["vq"].to_numpy(zero_copy_only=False)[rows]
    ru, rb = user[rows], bucket[rows]
    order = np.lexsort((eid, ts, rb, ru))
    u, b, e, v = ru[order], rb[order], eid[order], vq[order]
    start = np.empty(u.size, dtype=bool)
    start[0] = True
    start[1:] = (u[1:] != u[:-1]) | (b[1:] != b[:-1])
    gid = np.cumsum(start) - 1
    start_idx = np.flatnonzero(start)
    # local row_number / cumsum within (user, bucket)
    rn_local = np.arange(u.size, dtype=np.int64) \
        - start_idx[gid] + 1
    cum = np.cumsum(v, dtype=np.int64)
    cum_local = cum - cum[start_idx][gid] + v[start_idx][gid]
    # local delta (first row of the group resolved via carry below)
    delta = np.empty(u.size, dtype=np.int64)
    delta[1:] = v[1:] - v[:-1]
    delta[start] = 0
    # carry lookup per group: composite dense keys over the union
    cu, cb = user[~rows & (kind == 1)], bucket[~rows & (kind == 1)]
    c = tbl.filter(pa.array(kind == 1))
    rn_off = np.zeros(start_idx.size, np.int64)
    cum_off = np.zeros(start_idx.size, np.int64)
    prev_vq = np.zeros(start_idx.size, np.int64)
    has_prev = np.zeros(start_idx.size, bool)
    if cu.size:
        all_u = np.concatenate([u[start], cu])
        uu, uinv = np.unique(all_u, return_inverse=True)
        span = int(max(b.max(), cb.max() if cb.size else 0)
                   - min(b.min(), cb.min() if cb.size else 0)) + 2
        b0 = min(int(b.min()), int(cb.min()) if cb.size else int(b.min()))
        gkey = uinv[:start_idx.size] * span + (b[start] - b0)
        ckey = uinv[start_idx.size:] * span + (cb - b0)
        c_order = np.argsort(ckey, kind="stable")
        ckey_s = ckey[c_order]
        j = np.searchsorted(ckey_s, gkey)
        jc = np.minimum(j, ckey_s.size - 1)
        hit = (ckey_s.size > 0) & (ckey_s[jc] == gkey)
        ci = c_order[jc]
        c_rn = c["rn_off"].to_numpy(zero_copy_only=False)
        c_cum = c["cum_off"].to_numpy(zero_copy_only=False)
        c_pv = c["prev_vq"].to_numpy(zero_copy_only=False)
        c_hp = c["has_prev"].to_numpy(zero_copy_only=False)
        rn_off[hit] = c_rn[ci[hit]]
        cum_off[hit] = c_cum[ci[hit]]
        prev_vq[hit] = c_pv[ci[hit]]
        has_prev[hit] = c_hp[ci[hit]] == 1
    rn = rn_local + rn_off[gid]
    cum_q = cum_local + cum_off[gid]
    # delta of each group's FIRST row: prev bucket's last vq when it
    # exists, else (user's first row) lag() is NULL -> delta 0
    first_delta = np.where(has_prev, v[start_idx] - prev_vq, 0)
    delta[start_idx] = first_delta
    return pa.table({
        "event_id": pa.array(e, pa.int64()),
        "user_id": pa.array(u, pa.int64()),
        "rn": pa.array(rn, pa.int64()),
        "delta_q": pa.array(delta, pa.int64()),
        "cum_q": pa.array(cum_q, pa.int64()),
    })


def window_functions(sf_dir: str, bucket_us: int = 86_400_000_000):
    """Per-event ordered analytics -> Dataset of
    (event_id, user_id, rn, delta_q, cum_q); see module header."""
    import ray.data as rd

    from .exchange import exchange_by_key

    def rows():
        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "ts", "user_id", "value"])
        return ds.map_batches(_wf_stamp_batch, batch_format="pyarrow",
                              zero_copy_batch=True,
                              fn_kwargs={"bucket_us": bucket_us})

    summaries = rows().map_batches(_wf_summary_batch, batch_format="pyarrow")
    carries = exchange_by_key(summaries, "user_id", _wf_carry_partition)
    return exchange_by_key(rows().union(carries), ["user_id", "bucket"],
                           _wf_final_partition)


WINDOW_FUNCTIONS_SQL = f"""
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * CAST({VQ_SCALE} AS DOUBLE)) AS BIGINT) AS vq
  FROM events)
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(vq - COALESCE(lag(vq) OVER w, vq) AS BIGINT) AS delta_q,
       CAST(sum(vq) OVER w AS BIGINT) AS cum_q
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
