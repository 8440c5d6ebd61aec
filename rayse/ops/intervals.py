"""Interval union coverage (gaps-and-islands) over the events log.

The temporal-coverage operator a training-data pipeline needs when raw
activity spans must be merged before billing / sessional statistics:
each event carries a derived validity interval, overlapping-or-touching
intervals of one user merge into islands, and the per-user outputs are
the island count, total covered time, and longest island.

Interval derivation is deterministic from the row itself so the SQL
oracle can reproduce it exactly:

    start_us = epoch_us(ts)
    end_us   = start_us + ((event_id % 3600) + 60) * 1_000_000

Distributed shape (the standing exchange idiom): one file-exchange by
``user_id`` — every user's rows land whole in one partition — then a
single vectorized sweep per partition: lexsort by (user, start, end),
running max of ``end`` with per-user resets (monotone per-user base
offsets so one global ``np.maximum.accumulate`` respects boundaries,
chunked to stay inside int64), island boundaries where ``start`` exceeds
the running max of all PREVIOUS ends (touching intervals merge), then
``reduceat`` folds per island and per user. No per-row Python, no
driver materialization; output is user-cardinality, not event-cardinality.

Reference relationship: none (the reference has no interval algebra);
this pins the segment-merge machinery (same family as sessionize,
`rayse/ops/windows.py`, but length-valued rather than gap-valued).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DUR_MOD = 3600
DUR_BASE_S = 60
_US = 1_000_000


def _coverage_partition(t: pa.Table) -> pa.Table:
    """All rows of this partition's users -> one (user_id, n_islands,
    covered_us, max_island_us) row per user. Pure numpy segment ops."""
    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "n_islands": pa.array([], pa.int64()),
        "covered_us": pa.array([], pa.int64()),
        "max_island_us": pa.array([], pa.int64()),
    })
    if t.num_rows == 0:
        return empty

    user = t["user_id"].to_numpy(zero_copy_only=False)
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    s = t["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    e = s + ((eid % DUR_MOD) + DUR_BASE_S) * _US

    order = np.lexsort((eid, e, s, user))
    user, s, e = user[order], s[order], e[order]

    new_user = np.r_[True, user[1:] != user[:-1]]
    uid_idx = np.cumsum(new_user) - 1          # dense user rank per row
    smin = s.min()
    s0, e0 = s - smin, e - smin
    big = int(e0.max()) + 2

    # chunk users so uid_in_chunk * big stays far inside int64
    users_per_chunk = max(1, int((2**62) // big))
    n_users = int(uid_idx[-1]) + 1

    out_u, out_n, out_c, out_m = [], [], [], []
    for chunk_lo in range(0, n_users, users_per_chunk):
        chunk_hi = min(chunk_lo + users_per_chunk, n_users)
        m = (uid_idx >= chunk_lo) & (uid_idx < chunk_hi)
        cu, cs, ce = user[m], s0[m], e0[m]
        cuid = uid_idx[m] - chunk_lo
        sa = cs + cuid * big
        ea = ce + cuid * big
        cm = np.maximum.accumulate(ea)
        prev_cm = np.r_[np.int64(-1), cm[:-1]]
        new_isl = sa > prev_cm                  # touching intervals merge
        isl_starts = np.flatnonzero(new_isl)
        isl_last = np.r_[isl_starts[1:] - 1, cs.size - 1]
        isl_len = cm[isl_last] - sa[isl_starts]  # same base inside island
        isl_user = cu[isl_starts]
        u_starts = np.flatnonzero(
            np.r_[True, isl_user[1:] != isl_user[:-1]])
        out_u.append(isl_user[u_starts])
        out_n.append(np.diff(np.r_[u_starts, isl_user.size]))
        out_c.append(np.add.reduceat(isl_len, u_starts))
        out_m.append(np.maximum.reduceat(isl_len, u_starts))

    return pa.table({
        "user_id": pa.array(np.concatenate(out_u), pa.int64()),
        "n_islands": pa.array(
            np.concatenate(out_n).astype(np.int64), pa.int64()),
        "covered_us": pa.array(np.concatenate(out_c), pa.int64()),
        "max_island_us": pa.array(np.concatenate(out_m), pa.int64()),
    })


BUCKET_US = 86_400_000_000               # one-day salt buckets
MAX_DUR_US = (DUR_MOD - 1 + DUR_BASE_S) * _US   # longest interval


def _island_arrays(gid: np.ndarray, s: np.ndarray,
                   e: np.ndarray) -> tuple[np.ndarray, ...]:
    """Rows sorted by (gid, s, e) -> (island first-row index,
    island start us, island end us). Chunked base-offset cummax so one
    global accumulate respects group boundaries inside int64."""
    smin = s.min()
    s0, e0 = s - smin, e - smin
    big = int(e0.max()) + 2
    per_chunk = max(1, int((2**62) // big))
    n_g = int(gid[-1]) + 1
    f_out, st_out, en_out = [], [], []
    for lo in range(0, n_g, per_chunk):
        hi = min(lo + per_chunk, n_g)
        m = (gid >= lo) & (gid < hi)
        idx = np.flatnonzero(m)
        cg = gid[idx] - lo
        sa = s0[idx] + cg * big
        ea = e0[idx] + cg * big
        cm = np.maximum.accumulate(ea)
        prev_cm = np.r_[np.int64(-1), cm[:-1]]
        new_isl = sa > prev_cm
        isl_starts = np.flatnonzero(new_isl)
        isl_last = np.r_[isl_starts[1:] - 1, sa.size - 1]
        base = cg[isl_starts] * big
        f_out.append(idx[isl_starts])
        st_out.append(sa[isl_starts] - base + smin)
        en_out.append(cm[isl_last] - base + smin)
    return (np.concatenate(f_out), np.concatenate(st_out),
            np.concatenate(en_out))


def _salted_local(t: pa.Table) -> pa.Table:
    """Stage 1 of the skew-safe route: this partition's (user, bucket)
    groups -> finalized interior-island partials (kind 0) + boundary
    islands for the user-level merge (kind 1).

    An island is finalizable iff it starts after bucket_start + MAX_DUR
    (no overhang from earlier buckets can reach it: any chain ending in
    an earlier island J stops at J.end < I.start, and raw overhangs end
    <= bucket_start + MAX_DUR) and ends inside the bucket."""
    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "kind": pa.array([], pa.int64()),
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
        "c": pa.array([], pa.int64()),
    })
    if t.num_rows == 0:
        return empty
    user = t["user_id"].to_numpy(zero_copy_only=False)
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    s = t["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    e = s + ((eid % DUR_MOD) + DUR_BASE_S) * _US
    bkt = s // BUCKET_US
    order = np.lexsort((eid, e, s, bkt, user))
    user, s, e, bkt = user[order], s[order], e[order], bkt[order]
    new_g = np.r_[True, (user[1:] != user[:-1]) | (bkt[1:] != bkt[:-1])]
    gid = np.cumsum(new_g) - 1
    first, ist, ien = _island_arrays(gid, s, e)
    iu = user[first]
    ib = bkt[first]
    b_lo = ib * BUCKET_US
    b_hi = b_lo + BUCKET_US
    final = (ist > b_lo + MAX_DUR_US) & (ien <= b_hi)

    parts = []
    if final.any():
        fu = iu[final]
        flen = ien[final] - ist[final]
        u_starts = np.flatnonzero(np.r_[True, fu[1:] != fu[:-1]])
        parts.append(pa.table({
            "user_id": pa.array(fu[u_starts], pa.int64()),
            "kind": pa.array(np.zeros(u_starts.size, np.int64),
                             pa.int64()),
            "a": pa.array(np.diff(np.r_[u_starts, fu.size])
                          .astype(np.int64), pa.int64()),
            "b": pa.array(np.add.reduceat(flen, u_starts), pa.int64()),
            "c": pa.array(np.maximum.reduceat(flen, u_starts),
                          pa.int64()),
        }))
    edge = ~final
    if edge.any():
        parts.append(pa.table({
            "user_id": pa.array(iu[edge], pa.int64()),
            "kind": pa.array(np.ones(int(edge.sum()), np.int64),
                             pa.int64()),
            "a": pa.array(ist[edge], pa.int64()),
            "b": pa.array(ien[edge], pa.int64()),
            "c": pa.array(np.zeros(int(edge.sum()), np.int64),
                          pa.int64()),
        }))
    if not parts:
        return empty
    return pa.concat_tables(parts)


def _salted_merge(t: pa.Table) -> pa.Table:
    """Stage 2: per user, re-merge the boundary islands (they are
    intervals again) and fold in the finalized partials."""
    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "n_islands": pa.array([], pa.int64()),
        "covered_us": pa.array([], pa.int64()),
        "max_island_us": pa.array([], pa.int64()),
    })
    if t.num_rows == 0:
        return empty
    user = t["user_id"].to_numpy(zero_copy_only=False)
    kind = t["kind"].to_numpy(zero_copy_only=False)
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    c = t["c"].to_numpy(zero_copy_only=False)

    stats: dict[int, list[int]] = {}
    pm = kind == 0
    for u, n, cov, mx in zip(user[pm], a[pm], b[pm], c[pm]):
        st = stats.setdefault(int(u), [0, 0, 0])
        st[0] += int(n)
        st[1] += int(cov)
        st[2] = max(st[2], int(mx))

    em = kind == 1
    if em.any():
        eu, es, ee = user[em], a[em], b[em]
        order = np.lexsort((ee, es, eu))
        eu, es, ee = eu[order], es[order], ee[order]
        new_u = np.r_[True, eu[1:] != eu[:-1]]
        gid = np.cumsum(new_u) - 1
        first, ist, ien = _island_arrays(gid, es, ee)
        iu = eu[first]
        ilen = ien - ist
        u_starts = np.flatnonzero(np.r_[True, iu[1:] != iu[:-1]])
        nn = np.diff(np.r_[u_starts, iu.size])
        cov = np.add.reduceat(ilen, u_starts)
        mx = np.maximum.reduceat(ilen, u_starts)
        for u, n_, c_, m_ in zip(iu[u_starts], nn, cov, mx):
            st = stats.setdefault(int(u), [0, 0, 0])
            st[0] += int(n_)
            st[1] += int(c_)
            st[2] = max(st[2], int(m_))

    users = sorted(stats)
    return pa.table({
        "user_id": pa.array(users, pa.int64()),
        "n_islands": pa.array([stats[u][0] for u in users], pa.int64()),
        "covered_us": pa.array([stats[u][1] for u in users], pa.int64()),
        "max_island_us": pa.array([stats[u][2] for u in users],
                                  pa.int64()),
    })


def interval_coverage(sf_dir: str, salted: bool = True) -> pa.Table:
    """(user_id, n_islands, covered_us, max_island_us): merged-interval
    coverage per user — DuckDB hash-matched against the gaps-and-islands
    window-function oracle.

    ``salted`` (default) routes through the skew-safe two-stage
    exchange: stage 1 keys by (user, day-bucket of start) so a
    single-user firehose spreads across buckets (the asof-join salting
    policy, `rayse/ops/relational.py`), finalizes every island provably
    unreachable from neighboring buckets (interval durations are
    bounded by MAX_DUR < bucket width), and forwards only boundary
    islands — at most ~2 per (user, bucket) under spread load — to a
    user-keyed merge. ``salted=False`` is the single-exchange
    whole-user path; both are bit-identical (pinned by tests)."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])
    if not salted:
        out = exchange_by_key(ds, "user_id", _coverage_partition)
    else:
        def stamp(batch: pa.Table) -> pa.Table:
            s = batch["ts"].to_numpy(zero_copy_only=False).astype(
                "datetime64[us]").view("int64")
            return batch.append_column(
                "bkt", pa.array(s // BUCKET_US, pa.int64()))

        stage1 = exchange_by_key(
            ds.map_batches(stamp, batch_format="pyarrow",
                           zero_copy_batch=True),
            ["user_id", "bkt"], _salted_local)
        out = exchange_by_key(stage1, "user_id", _salted_merge)
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    return tbl.sort_by("user_id")


INTERVAL_COVERAGE_SQL = f"""
WITH iv AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + ((event_id % {DUR_MOD}) + {DUR_BASE_S})
           * {_US} AS e
  FROM events
), m AS (
  SELECT user_id, event_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax
  FROM iv
), g AS (
  SELECT user_id, s, e,
         sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM m
), isle AS (
  SELECT user_id, isl, min(s) AS i_s, max(e) AS i_e
  FROM g GROUP BY user_id, isl
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(i_e - i_s) AS BIGINT) AS covered_us,
       CAST(max(i_e - i_s) AS BIGINT) AS max_island_us
FROM isle GROUP BY user_id
ORDER BY user_id
"""
