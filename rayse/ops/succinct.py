"""Succinct-structure and convex-geometry primitives — two exact
cells.

`bitvector_rank_select`: the rank/select dictionary (Jacobson 1989)
over the is-purchase bitvector in (ts, event_id) stream order — the
primitive under every succinct index (FM-index rank, sparse bitmap
compression). Distributed shape: the exact global ordering machinery
(`curriculum`/`shuffle_order`'s range-histogram offsets) gives each
event its stream position WITHOUT a global sort — here positions come
from the bounded (day-bucket) count histogram + in-bucket
(ts, event_id) ranks; block-level popcount partials then answer
rank(i) at sampled positions and select(k) for sampled k, driver
finishing on the bounded block table. Oracle: window sums /
row_number over the same order.

`support_points`: the support-function sample of the (hour, cents)
point cloud — for each of D integer directions the extreme point by
exact int64 dot product, (dot DESC, hour ASC, cents ASC) tie-break.
This is the rotating-calipers/convex-hull workhorse reduced to a
per-batch ARGMAX partial per direction (D × blocks rows) — the
bounded-direction dual of `skyline.pareto_frontier`'s dominance scan.

Reference relationship: none (index/geometry family completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RS_SAMPLE = 16          # rank positions / select ks sampled
SUP_DIRS = 16


DAY_US = 86_400_000_000


def _rs_bucket_rows(sf_dir: str, days: list[int]):
    """Pushdown-filtered read of the needed day buckets only, returned
    as (day, ts, eid, bit) numpy arrays — bucket-bounded, never
    corpus-sized."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    lo = min(days) * DAY_US
    hi = (max(days) + 1) * DAY_US
    t = pads.dataset(f"{sf_dir}/events.parquet").to_table(
        columns=["ts", "event_id", "event_type"],
        filter=(pc.field("ts") >=
                pa.scalar(np.datetime64(lo, "us")))
        & (pc.field("ts") < pa.scalar(np.datetime64(hi, "us"))))
    ts = (t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
          .astype("datetime64[us]").view("int64"))
    eid = (t["event_id"].combine_chunks()
           .to_numpy(zero_copy_only=False).astype(np.int64))
    bit = (np.asarray(t["event_type"].to_pylist(), dtype=object)
           == "purchase").astype(np.int64)
    day = ts // DAY_US
    keep = np.isin(day, days)
    return day[keep], ts[keep], eid[keep], bit[keep]


def bitvector_rank_select(sf_dir: str) -> pa.Table:
    """(kind, q, answer): rank(q) = purchases among the first q events
    in (ts, event_id) order, q = i·n/RS; select(k) = stream position
    of the k-th purchase, k = j·n1/RS. Two-phase succinct directory:
    a BOUNDED per-day (n, n1) fold locates each query's bucket, then a
    pushdown-filtered read of only the touched buckets answers the
    residual in-bucket — the corpus never lands on the driver. DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def dir_partial(batch: pa.Table) -> pa.Table:
        day = (batch["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").view("int64") // DAY_US)
        bit = (np.asarray(batch["event_type"].to_pylist(),
                          dtype=object) == "purchase")
        uk, inv = np.unique(day, return_inverse=True)
        return pa.table({
            "day": pa.array(uk, pa.int64()),
            "n": pa.array(np.bincount(inv, None, uk.size)
                          .astype(np.int64), pa.int64()),
            "n1": pa.array(np.bincount(inv, bit.astype(np.float64),
                                       uk.size).astype(np.int64),
                           pa.int64()),
        })

    agg = (ds.map_batches(dir_partial, batch_format="pyarrow")
           .groupby("day").sum(["n", "n1"]))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    day = tbl["day"].to_numpy(zero_copy_only=False)
    dn = tbl["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    d1 = tbl["sum(n1)"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(day, kind="stable")
    day, dn, d1 = day[o], dn[o], d1[o]
    cn, c1 = np.cumsum(dn), np.cumsum(d1)
    n, n1 = int(cn[-1]), int(c1[-1])

    rank_qs = [i * n // RS_SAMPLE for i in range(1, RS_SAMPLE + 1)]
    sel_ks = [max(1, j * n1 // RS_SAMPLE)
              for j in range(1, RS_SAMPLE + 1)]
    need = set()
    for q in rank_qs:
        if q > 0:
            need.add(int(day[np.searchsorted(cn, q)]))
    for k in sel_ks:
        need.add(int(day[np.searchsorted(c1, k)]))
    bd, bts, beid, bbit = _rs_bucket_rows(sf_dir, sorted(need))

    out_k, out_q, out_a = [], [], []
    for q in rank_qs:
        if q == 0:
            out_k.append("rank")
            out_q.append(0)
            out_a.append(0)
            continue
        bi = int(np.searchsorted(cn, q))
        d = int(day[bi])
        base_n = int(cn[bi - 1]) if bi > 0 else 0
        base_1 = int(c1[bi - 1]) if bi > 0 else 0
        m = bd == d
        order = np.lexsort((beid[m], bts[m]))
        resid = q - base_n
        ans = base_1 + int(np.cumsum(bbit[m][order])[resid - 1]) \
            if resid > 0 else base_1
        out_k.append("rank")
        out_q.append(q)
        out_a.append(ans)
    for k in sel_ks:
        bi = int(np.searchsorted(c1, k))
        d = int(day[bi])
        base_n = int(cn[bi - 1]) if bi > 0 else 0
        base_1 = int(c1[bi - 1]) if bi > 0 else 0
        m = bd == d
        order = np.lexsort((beid[m], bts[m]))
        ones = np.flatnonzero(bbit[m][order]) + 1  # in-bucket pos
        out_k.append("select")
        out_q.append(k)
        out_a.append(base_n + int(ones[k - base_1 - 1]))
    return pa.table({
        "kind": pa.array(out_k, pa.string()),
        "q": pa.array(out_q, pa.int64()),
        "answer": pa.array(out_a, pa.int64()),
    })


def bitvector_rank_select_sql() -> str:
    return f"""
WITH s AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS bit,
         row_number() OVER (ORDER BY ts, event_id) AS pos
  FROM events),
c AS (SELECT pos, bit,
             sum(bit) OVER (ORDER BY pos) AS csum FROM s),
n AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(bit) AS BIGINT) AS n1 FROM s),
qs AS (SELECT CAST(unnest(range(1, {RS_SAMPLE + 1})) AS BIGINT)
         AS i),
ranks AS (
  SELECT 'rank' AS kind, (SELECT n FROM n) * i // {RS_SAMPLE} AS q,
         coalesce((SELECT c.csum FROM c
                   WHERE c.pos = (SELECT n FROM n) * i
                                 // {RS_SAMPLE}), 0) AS answer
  FROM qs),
sels AS (
  SELECT 'select' AS kind,
         greatest(1, (SELECT n1 FROM n) * i // {RS_SAMPLE}) AS q,
         (SELECT CAST(c.pos AS BIGINT) FROM c
          WHERE c.bit = 1
            AND c.csum = greatest(1, (SELECT n1 FROM n) * i
                                     // {RS_SAMPLE})
          ORDER BY c.pos LIMIT 1) AS answer
  FROM qs)
SELECT kind, CAST(q AS BIGINT) AS q, CAST(answer AS BIGINT) AS answer
FROM (SELECT * FROM ranks UNION ALL SELECT * FROM sels)
ORDER BY kind, q, answer"""


_DIRS = [(1, 0), (2, 1), (1, 1), (1, 2), (0, 1), (-1, 2), (-1, 1),
         (-2, 1), (-1, 0), (-2, -1), (-1, -1), (-1, -2), (0, -1),
         (1, -2), (1, -1), (2, -1)]


def support_points(sf_dir: str) -> pa.Table:
    """(dx, dy, hour, cents, dot): per integer direction the extreme
    (hour, value-cents) point by exact dot product — DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    from .relational import _cents

    dirs = np.asarray(_DIRS, np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        hr = ((batch["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").view("int64")
               // 3_600_000_000) % 24).astype(np.int64)
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        dots = dirs[:, 0][:, None] * hr[None, :] \
            + dirs[:, 1][:, None] * cents[None, :]
        out_dx, out_dy, out_h, out_c, out_d = [], [], [], [], []
        for di in range(dirs.shape[0]):
            row = dots[di]
            pick = int(np.lexsort((cents, hr, -row))[0])
            out_dx.append(int(dirs[di, 0]))
            out_dy.append(int(dirs[di, 1]))
            out_h.append(int(hr[pick]))
            out_c.append(int(cents[pick]))
            out_d.append(int(row[pick]))
        return pa.table({
            "dx": pa.array(out_dx, pa.int64()),
            "dy": pa.array(out_dy, pa.int64()),
            "hour": pa.array(out_h, pa.int64()),
            "cents": pa.array(out_c, pa.int64()),
            "dot": pa.array(out_d, pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    parts = pa.concat_tables(
        [t for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows],
        promote_options="default")
    dx = parts["dx"].to_numpy(zero_copy_only=False)
    dy = parts["dy"].to_numpy(zero_copy_only=False)
    hr = parts["hour"].to_numpy(zero_copy_only=False)
    cents = parts["cents"].to_numpy(zero_copy_only=False)
    dot = parts["dot"].to_numpy(zero_copy_only=False)
    key = dx * 1000 + dy          # directions are small ints
    out = {"dx": [], "dy": [], "hour": [], "cents": [], "dot": []}
    for d0, d1 in _DIRS:
        m = key == d0 * 1000 + d1
        pick = np.lexsort((cents[m], hr[m], -dot[m]))[0]
        out["dx"].append(d0)
        out["dy"].append(d1)
        out["hour"].append(int(hr[m][pick]))
        out["cents"].append(int(cents[m][pick]))
        out["dot"].append(int(dot[m][pick]))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in
                     out.items()})


def support_points_sql() -> str:
    vals = ", ".join(f"({dx}, {dy})" for dx, dy in _DIRS)
    return f"""
WITH p AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
d(dx, dy) AS (VALUES {vals}),
scored AS (
  SELECT d.dx, d.dy, p.hour, p.cents,
         d.dx * p.hour + d.dy * p.cents AS dot
  FROM d CROSS JOIN p)
SELECT CAST(dx AS BIGINT) AS dx, CAST(dy AS BIGINT) AS dy,
       CAST(hour AS BIGINT) AS hour, cents, CAST(dot AS BIGINT) AS dot
FROM (
  SELECT *, row_number() OVER (PARTITION BY dx, dy
                               ORDER BY dot DESC, hour, cents) AS rn
  FROM scored)
WHERE rn = 1
ORDER BY dx, dy"""
