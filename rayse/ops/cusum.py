"""CUSUM change detection over the events log — an exact distributed
prefix scan.

The Page (1954) cumulative-sum detector: per event type, ordered by
(ts, event_id), the statistic ``c_t = max(0, c_{t-1} + (vq_t - mu))``
(mu = the global truncated-mean drift) flags sustained upward mean
shifts. The reset recurrence looks inherently serial, but it has a
closed form over prefix sums ``P_t = sum_{j<=t}(vq_j - mu)``::

    c_t = P_t - min(0, min_{j<=t} P_j)

which distributes as a classic two-level parallel scan:

1. rows are stamped with ``bucket = ts // bucket_us``; ONE exchange by
   (type, bucket) computes each bucket's summary — sum ``S_b`` and
   within-bucket minimum prefix ``M_b`` (needs co-located, sorted
   bucket rows: min-prefix is NOT mergeable from arbitrary subsets,
   which is why this phase is an exchange where `winfuncs`' sum/count
   carries get away with per-batch partials);
2. a tiny exchange by type folds the bucket summaries into carries —
   exclusive prefix offset ``P_off_b`` and the minimum of all earlier
   buckets' global prefixes ``min_before_b = min_{b'<b}(P_off_b' +
   M_b')``;
3. the final exchange by (type, bucket) re-runs the local scan and
   combines: ``P_t = P_off + L_t``, running min = min(min_before,
   P_off + runmin(L)_t), ``c_t = P_t - min(that, 0)``.

A hot type splits across its time buckets (work per task bounded by
events-per-bucket, never events-per-type — the skew-safe shape
`relational.trailing_window_counts` was reworked onto); the only
per-type state that travels twice is summary-sized (types x buckets).

Reference relationship: no reference analog (it has no telemetry
surface); beyond-reference quality-monitoring family, sibling of
`quantiles.mad_outliers`.

Oracle: the same closed form with native window functions — pure
integers, bit-exact (the one division, the global mean, is on a
non-negative sum so DuckDB's truncating ``//`` agrees with numpy).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .rollup import VQ_SCALE

BUCKET_US = 86_400_000_000           # daily buckets
H_ALARM = 100 * VQ_SCALE             # alarm threshold on c_t

_ROW_SCHEMA = pa.schema([
    ("event_type", pa.string()), ("thash", pa.uint64()),
    ("bucket", pa.int64()), ("ts_us", pa.int64()),
    ("event_id", pa.int64()), ("d", pa.int64()),
    ("p_off", pa.int64()), ("min_before", pa.int64()),
    ("has_min", pa.int8()), ("kind", pa.int8()),   # 0 row, 1 carry
])

_SUM_SCHEMA = pa.schema([
    ("event_type", pa.string()), ("thash", pa.uint64()),
    ("bucket", pa.int64()), ("s", pa.int64()), ("m", pa.int64()),
])


def _empty(schema: pa.Schema) -> pa.Table:
    return pa.table({n: [] for n in schema.names}, schema=schema)


def global_mu(sf_dir: str) -> int:
    """Truncated global mean of the quantized value — one streaming
    aggregate, no driver row state."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        vq = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                      * float(VQ_SCALE)).astype(np.int64)
        return pa.table({"s": pa.array([int(vq.sum())], pa.int64()),
                         "n": pa.array([vq.size], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).sum(["s", "n"])
    s, n = int(agg["sum(s)"]), int(agg["sum(n)"])
    if s < 0:
        raise ValueError("negative value sum: truncating-division "
                         "drift needs the non-negative path")
    return s // n if n else 0


def _stamp_batch(batch: pa.Table, mu: int, bucket_us: int) -> pa.Table:
    from .textstats import _word_arr_slices, fnv64_slices

    n = batch.num_rows
    if n == 0:
        return _empty(_ROW_SCHEMA)
    etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    vq = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                  * float(VQ_SCALE)).astype(np.int64)
    z = np.zeros(n, np.int64)
    z8 = np.zeros(n, np.int8)
    return pa.table({
        "event_type": pa.array(etype.tolist(), pa.string()),
        "thash": pa.array(fnv64_slices(*_word_arr_slices(etype)),
                          pa.uint64()),
        "bucket": pa.array(ts // bucket_us, pa.int64()),
        "ts_us": pa.array(ts, pa.int64()),
        "event_id": pa.array(
            batch["event_id"].to_numpy(zero_copy_only=False), pa.int64()),
        "d": pa.array(vq - mu, pa.int64()),
        "p_off": pa.array(z, pa.int64()),
        "min_before": pa.array(z, pa.int64()),
        "has_min": pa.array(z8, pa.int8()),
        "kind": pa.array(z8, pa.int8()),
    })


def _bucket_summary_partition(tbl: pa.Table) -> pa.Table:
    """Co-located (type, bucket) rows -> (S_b, M_b) per bucket: the sum
    and the minimum prefix of the (ts, event_id)-ordered deltas."""
    if tbl.num_rows == 0:
        return _empty(_SUM_SCHEMA)
    etype = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    th = tbl["thash"].to_numpy(zero_copy_only=False)
    b = tbl["bucket"].to_numpy(zero_copy_only=False)
    ts = tbl["ts_us"].to_numpy(zero_copy_only=False)
    eid = tbl["event_id"].to_numpy(zero_copy_only=False)
    d = tbl["d"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, b, th))
    e_s, t_s, b_s, d_s = etype[order], th[order], b[order], d[order]
    start = np.empty(t_s.size, dtype=bool)
    start[0] = True
    start[1:] = (t_s[1:] != t_s[:-1]) | (b_s[1:] != b_s[:-1])
    gid = np.cumsum(start) - 1
    starts = np.flatnonzero(start)
    cum = np.cumsum(d_s, dtype=np.int64)
    base = np.concatenate(([0], cum[starts[1:] - 1]))
    local = cum - base[gid]                     # prefix within group
    s = np.zeros(starts.size, np.int64)
    np.add.at(s, gid, d_s)
    m = np.full(starts.size, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(m, gid, local)
    return pa.table({
        "event_type": pa.array(e_s[start].tolist(), pa.string()),
        "thash": pa.array(t_s[start], pa.uint64()),
        "bucket": pa.array(b_s[start], pa.int64()),
        "s": pa.array(s, pa.int64()),
        "m": pa.array(m, pa.int64()),
    })


def _carry_partition(tbl: pa.Table) -> pa.Table:
    """All bucket summaries of this partition's types -> one carry row
    per (type, bucket): exclusive offsets + min of earlier global
    prefixes. Vectorized over summaries, never events."""
    if tbl.num_rows == 0:
        return _empty(_ROW_SCHEMA)
    etype = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    th = tbl["thash"].to_numpy(zero_copy_only=False)
    b = tbl["bucket"].to_numpy(zero_copy_only=False)
    s = tbl["s"].to_numpy(zero_copy_only=False)
    m = tbl["m"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, th))
    e_s, t_s, b_s, s_s, m_s = (etype[order], th[order], b[order],
                               s[order], m[order])
    tstart = np.empty(t_s.size, dtype=bool)
    tstart[0] = True
    tstart[1:] = t_s[1:] != t_s[:-1]
    # exclusive per-type prefix sum of S
    cs = np.concatenate(([0], np.cumsum(s_s, dtype=np.int64)[:-1]))
    base_idx = np.maximum.accumulate(
        np.where(tstart, np.arange(t_s.size), 0))
    p_off = cs - cs[base_idx]
    # exclusive per-type running min of (p_off_b + M_b)
    g = p_off + m_s
    run = g.copy()
    for i in range(1, run.size):                # summaries only: tiny
        if not tstart[i]:
            run[i] = min(run[i], run[i - 1])
    min_before = np.concatenate(([0], run[:-1]))
    has_min = (~tstart).astype(np.int8)
    min_before = np.where(tstart, 0, min_before)
    n = t_s.size
    z = np.zeros(n, np.int64)
    return pa.table({
        "event_type": pa.array(e_s.tolist(), pa.string()),
        "thash": pa.array(t_s, pa.uint64()),
        "bucket": pa.array(b_s, pa.int64()),
        "ts_us": pa.array(z, pa.int64()),
        "event_id": pa.array(z, pa.int64()),
        "d": pa.array(z, pa.int64()),
        "p_off": pa.array(p_off, pa.int64()),
        "min_before": pa.array(min_before, pa.int64()),
        "has_min": pa.array(has_min, pa.int8()),
        "kind": pa.array(np.ones(n, np.int8), pa.int8()),
    })


def _final_partition(tbl: pa.Table) -> pa.Table:
    """Rows + carries of this partition's (type, bucket) groups ->
    (event_id, event_type, cus_q). Sorting carries FIRST within each
    group (kind DESC) makes the group's head row its carry."""
    empty = pa.table({"event_id": pa.array([], pa.int64()),
                      "event_type": pa.array([], pa.string()),
                      "cus_q": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    etype = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    th = tbl["thash"].to_numpy(zero_copy_only=False)
    b = tbl["bucket"].to_numpy(zero_copy_only=False)
    ts = tbl["ts_us"].to_numpy(zero_copy_only=False)
    eid = tbl["event_id"].to_numpy(zero_copy_only=False)
    d = tbl["d"].to_numpy(zero_copy_only=False)
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts, -kind, b, th))
    e_s, t_s, b_s, ts_s, id_s, d_s, k_s = (
        etype[order], th[order], b[order], ts[order], eid[order],
        d[order], kind[order])
    start = np.empty(t_s.size, dtype=bool)
    start[0] = True
    start[1:] = (t_s[1:] != t_s[:-1]) | (b_s[1:] != b_s[:-1])
    gid = np.cumsum(start) - 1
    starts = np.flatnonzero(start)
    if not (k_s[starts] == 1).all():
        raise AssertionError("every (type, bucket) group must carry")
    p_off = tbl["p_off"].to_numpy(zero_copy_only=False)[order][starts]
    min_before = tbl["min_before"].to_numpy(
        zero_copy_only=False)[order][starts]
    has_min = tbl["has_min"].to_numpy(
        zero_copy_only=False)[order][starts] == 1
    rows = k_s == 0
    if not rows.any():
        return empty
    # local prefix + running min within each group (rows only)
    rgid = gid[rows]
    rd_ = d_s[rows]
    rstart = np.empty(rgid.size, dtype=bool)
    rstart[0] = True
    rstart[1:] = rgid[1:] != rgid[:-1]
    cum = np.cumsum(rd_, dtype=np.int64)
    rstarts = np.flatnonzero(rstart)
    base = np.concatenate(([0], cum[rstarts[1:] - 1]))
    rgrp = np.cumsum(rstart) - 1
    local = cum - base[rgrp]
    # running min of local prefix, reset per group: accumulate within
    # each group slice (loop count = (type, bucket) groups, not rows)
    runmin = np.empty_like(local)
    bounds = np.append(rstarts, rgid.size)
    for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
        runmin[s:e] = np.minimum.accumulate(local[s:e])
    g_p_off = p_off[rgid]
    g_min_b = min_before[rgid]
    g_has = has_min[rgid]
    p_t = g_p_off + local
    m_t = g_p_off + runmin
    m_all = np.where(g_has, np.minimum(g_min_b, m_t), m_t)
    cus = p_t - np.minimum(m_all, 0)
    return pa.table({
        "event_id": pa.array(id_s[rows], pa.int64()),
        "event_type": pa.array(e_s[rows].tolist(), pa.string()),
        "cus_q": pa.array(cus, pa.int64())})


def cusum_rows(sf_dir: str, bucket_us: int = BUCKET_US):
    """Dataset of (event_id, event_type, cus_q): the exact CUSUM
    statistic per event — see module header for the scan shape."""
    import ray.data as rd

    from .exchange import exchange_by_key

    mu = global_mu(sf_dir)

    def rows():
        ds = rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type", "value"])
        return ds.map_batches(_stamp_batch, batch_format="pyarrow",
                              zero_copy_batch=True,
                              fn_kwargs={"mu": mu, "bucket_us": bucket_us})

    summaries = exchange_by_key(rows(), ["thash", "bucket"],
                                _bucket_summary_partition)
    carries = exchange_by_key(summaries, "thash", _carry_partition)
    return exchange_by_key(rows().union(carries), ["thash", "bucket"],
                           _final_partition)


def cusum_alarms(sf_dir: str, h: int = H_ALARM,
                 bucket_us: int = BUCKET_US) -> pa.Table:
    """(event_type, n_alarms, max_c): per-type count of events with
    cus_q > h and the peak statistic — a bounded downstream aggregate
    of the row stream."""
    ds = cusum_rows(sf_dir, bucket_us)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n_alarms": pa.array([], pa.int64()),
                             "max_c": pa.array([], pa.int64())})
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        c = batch["cus_q"].to_numpy(zero_copy_only=False)
        order = np.argsort(et, kind="stable")
        e_s, c_s = et[order], c[order]
        new = np.empty(e_s.size, dtype=bool)
        new[0] = True
        new[1:] = e_s[1:] != e_s[:-1]
        g = np.cumsum(new) - 1
        na = np.zeros(int(g[-1]) + 1, np.int64)
        np.add.at(na, g, (c_s > h).astype(np.int64))
        mx = np.full(int(g[-1]) + 1, np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, g, c_s)
        return pa.table({
            "event_type": pa.array(e_s[new].tolist(), pa.string()),
            "n_alarms": pa.array(na, pa.int64()),
            "max_c": pa.array(mx, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("event_type").aggregate(
               __import__("ray.data.aggregate", fromlist=["x"]).Sum(
                   "n_alarms", alias_name="n_alarms"),
               __import__("ray.data.aggregate", fromlist=["x"]).Max(
                   "max_c", alias_name="max_c"))
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    return pa.table({
        "event_type": pa.array(agg["event_type"].tolist(), pa.string()),
        "n_alarms": pa.array(agg["n_alarms"].to_numpy().astype(np.int64),
                             pa.int64()),
        "max_c": pa.array(agg["max_c"].to_numpy().astype(np.int64),
                          pa.int64())})


def _cusum_ctes() -> str:
    return f"""
WITH cu_v AS (
  SELECT event_id, event_type, ts,
         CAST(floor(value * CAST({VQ_SCALE} AS DOUBLE)) AS BIGINT) AS vq
  FROM events),
cu_mu AS (SELECT CAST(sum(vq) // count(*) AS BIGINT) AS mu FROM cu_v),
cu_p AS (
  SELECT event_id, event_type, ts,
         CAST(sum(vq - (SELECT mu FROM cu_mu)) OVER
              (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS p
  FROM cu_v),
cu_c AS (
  SELECT event_id, event_type,
         p - least(min(p) OVER
             (PARTITION BY event_type ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
           AS cus_q
  FROM cu_p)"""


def cusum_rows_sql() -> str:
    return f"""{_cusum_ctes()}
SELECT event_id, event_type, CAST(cus_q AS BIGINT) AS cus_q FROM cu_c"""


def cusum_alarms_sql(h: int = H_ALARM) -> str:
    return f"""{_cusum_ctes()}
SELECT event_type,
       CAST(count(*) FILTER (WHERE cus_q > {h}) AS BIGINT) AS n_alarms,
       CAST(max(cus_q) AS BIGINT) AS max_c
FROM cu_c GROUP BY event_type"""
