"""MERGE INTO / last-write-wins upsert — the CDC apply step
(`scd2_intervals` reconstructs history; this cell applies a change
batch onto a snapshot and reports the merge DISPOSITION, the thing a
warehouse MERGE statement returns): snapshot = each user's last value
in the first half of the corpus time range, updates = the second half,
result = per-user final value tagged kept / updated / inserted.

Distributed shape: ONE pass of per-batch composite-(ts, event_id)
argmax partials carrying BOTH halves side by side (the `ohlc.py`
argmin-combiner doubled), folded on the driver over user × block
bounded rows; the half boundary is a 2-integer broadcast (min/max
day). The FULL OUTER JOIN the SQL writes never materializes.

Oracle: two row_number()-per-half CTEs FULL JOINed with the
disposition CASE — bit-exact, all integers.

Reference relationship: the reference's upsert surface is the JDBC
``ON CONFLICT DO UPDATE`` batch (`IndexerService.java:58-68`); this is
that semantics lifted to a set-oriented engine operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY_US = 86_400_000_000
_SENT = np.iinfo(np.int64).min


def upsert_merge(sf_dir: str) -> pa.Table:
    """(user_id, val_cents, src): last-write-wins merge of the
    second-half change batch onto the first-half snapshot — DuckDB
    hash-matched."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    from .relational import _cents

    # half boundary: 2-integer broadcast off the pruned ts column
    ts_col = (pads.dataset(f"{sf_dir}/events.parquet")
              .to_table(columns=["ts"])["ts"])
    days = (ts_col.combine_chunks().to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view("int64") // DAY_US)
    mid = (int(days.min()) + int(days.max()) + 1) // 2

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "value"])

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        ts = (batch["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").view("int64"))
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        half = (ts // DAY_US >= mid).astype(np.int64)
        out = {}
        for h in (0, 1):
            m = half == h
            u, t, e, c = uid[m], ts[m], eid[m], cents[m]
            if u.size == 0:
                out[h] = (u, t, e, c)
                continue
            order = np.lexsort((e, t, u))
            uu = u[order]
            lasts = np.concatenate((uu[1:] != uu[:-1], [True]))
            pick = order[lasts]
            out[h] = (u[pick], t[pick], e[pick], c[pick])
        users = np.union1d(out[0][0], out[1][0])
        cols = {"user_id": pa.array(users, pa.int64())}
        for h in (0, 1):
            u, t, e, c = out[h]
            ts_a = np.full(users.size, _SENT, np.int64)
            id_a = np.full(users.size, _SENT, np.int64)
            v_a = np.zeros(users.size, np.int64)
            j = np.searchsorted(users, u)
            ts_a[j], id_a[j], v_a[j] = t, e, c
            cols[f"ts{h}"] = pa.array(ts_a, pa.int64())
            cols[f"id{h}"] = pa.array(id_a, pa.int64())
            cols[f"v{h}"] = pa.array(v_a, pa.int64())
        return pa.table(cols)

    parts = pa.concat_tables(
        [t for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows],
        promote_options="default")
    uid = parts["user_id"].to_numpy(zero_copy_only=False)
    users = np.unique(uid)
    res = {}
    for h in (0, 1):
        t = parts[f"ts{h}"].to_numpy(zero_copy_only=False)
        e = parts[f"id{h}"].to_numpy(zero_copy_only=False)
        v = parts[f"v{h}"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, uid))
        uu = uid[order]
        lasts = np.concatenate((uu[1:] != uu[:-1], [True]))
        pick = order[lasts]
        ts_a = np.full(users.size, _SENT, np.int64)
        v_a = np.zeros(users.size, np.int64)
        j = np.searchsorted(users, uid[pick])
        ts_a[j] = t[pick]
        v_a[j] = v[pick]
        res[h] = (ts_a, v_a)
    has0 = res[0][0] != _SENT
    has1 = res[1][0] != _SENT
    val = np.where(has1, res[1][1], res[0][1])
    src = np.where(has0 & has1, "updated",
                   np.where(has1, "inserted", "kept"))
    return pa.table({
        "user_id": pa.array(users, pa.int64()),
        "val_cents": pa.array(val, pa.int64()),
        "src": pa.array(src.tolist(), pa.string()),
    })


def upsert_merge_sql() -> str:
    return f"""
WITH b AS (
  SELECT (min(epoch_us(ts) // {DAY_US})
          + max(epoch_us(ts) // {DAY_US}) + 1) // 2 AS mid
  FROM events),
r AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) // {DAY_US} >= (SELECT mid FROM b)
              THEN 1 ELSE 0 END AS half,
         epoch_us(ts) AS tsu, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
lastv AS (
  SELECT user_id, half, cents FROM (
    SELECT user_id, half, cents,
           row_number() OVER (PARTITION BY user_id, half
                              ORDER BY tsu DESC, event_id DESC) AS rn
    FROM r) WHERE rn = 1),
s AS (SELECT user_id, cents FROM lastv WHERE half = 0),
u AS (SELECT user_id, cents FROM lastv WHERE half = 1)
SELECT coalesce(s.user_id, u.user_id) AS user_id,
       CAST(coalesce(u.cents, s.cents) AS BIGINT) AS val_cents,
       CASE WHEN s.user_id IS NOT NULL AND u.user_id IS NOT NULL
            THEN 'updated'
            WHEN u.user_id IS NOT NULL THEN 'inserted'
            ELSE 'kept' END AS src
FROM s FULL JOIN u ON s.user_id = u.user_id
ORDER BY user_id"""
