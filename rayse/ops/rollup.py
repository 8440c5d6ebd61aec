"""Multi-level (ROLLUP / grouping-sets) aggregation over the events log.

One streaming pass produces all three grouping levels of
``GROUP BY ROLLUP (event_type, day)`` — (type, day), (type), and the
grand total — the OLAP cube slice every reporting pipeline wants
without re-scanning the corpus per level.

Scale shape: map_batches reduces each batch to FINEST-grain partials
(one row per (type, day) seen in the batch — stream-sized in, summary-
sized out), ONE exchange keyed by the type hash co-locates every
partial of a type, and each partition task folds its types' partials
into the (type, day) and (type) levels locally (a rollup is a
re-aggregation of the finest level, so coarser levels never touch the
raw stream).  The grand total is the sum of the output-sized per-type
rows.  Values are pre-quantized (``vq = floor(value * 1e6)``) so every
aggregate is an exact integer and the DuckDB ``GROUP BY ROLLUP`` oracle
matches bit-for-bit.  NULL grouping keys surface as the same sentinels
the oracle COALESCEs to ('' / -1), keeping the hash contract."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VQ_SCALE = 1_000_000
DAY_US = 86_400_000_000

_PARTIAL_SCHEMA = pa.schema([
    ("event_type", pa.string()), ("thash", pa.uint64()),
    ("day", pa.int64()), ("n", pa.int64()), ("sum_vq", pa.int64()),
])


def _rollup_partial_batch(batch: pa.Table) -> pa.Table:
    """events batch -> one partial row per (event_type, day)."""
    from .textstats import _word_arr_slices, fnv64_slices

    if batch.num_rows == 0:
        return pa.table({n: [] for n in _PARTIAL_SCHEMA.names},
                        schema=_PARTIAL_SCHEMA)
    etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    vq = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                  * float(VQ_SCALE)).astype(np.int64)
    day = ts // DAY_US
    th = fnv64_slices(*_word_arr_slices(etype))
    order = np.lexsort((day, th))
    t_s, d_s, v_s, e_s = th[order], day[order], vq[order], etype[order]
    last = np.empty(t_s.size, dtype=bool)
    last[-1] = True
    last[:-1] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
    starts = np.flatnonzero(np.concatenate(([True], last[:-1])))
    ends = np.flatnonzero(last)
    cs = np.cumsum(v_s, dtype=np.int64)
    return pa.table({
        "event_type": pa.array(e_s[last].tolist(), pa.string()),
        "thash": pa.array(t_s[last], pa.uint64()),
        "day": pa.array(d_s[last], pa.int64()),
        "n": pa.array(ends - starts + 1, pa.int64()),
        "sum_vq": pa.array(cs[ends] - cs[starts] + v_s[starts], pa.int64()),
    })


def _rollup_partition(tbl: pa.Table) -> pa.Table:
    """All partials of this partition's types -> the (type, day) and
    (type) rollup levels. Grouping is on the STRING type (the hash only
    routes), so a hash collision co-locates without merging."""
    empty = pa.table({
        "event_type": pa.array([], pa.string()),
        "day": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
        "sum_vq": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    etype = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    day = tbl["day"].to_numpy(zero_copy_only=False)
    n = tbl["n"].to_numpy(zero_copy_only=False)
    sv = tbl["sum_vq"].to_numpy(zero_copy_only=False)
    order = np.lexsort((day, etype))
    e_s, d_s, n_s, v_s = etype[order], day[order], n[order], sv[order]

    def _levels(keys_equal_prev: np.ndarray):
        last = np.empty(e_s.size, dtype=bool)
        last[-1] = True
        last[:-1] = ~keys_equal_prev
        starts = np.flatnonzero(np.concatenate(([True], last[:-1])))
        ends = np.flatnonzero(last)
        cn = np.cumsum(n_s, dtype=np.int64)
        cv = np.cumsum(v_s, dtype=np.int64)
        return (last, cn[ends] - cn[starts] + n_s[starts],
                cv[ends] - cv[starts] + v_s[starts])

    fine_eq = (e_s[1:] == e_s[:-1]) & (d_s[1:] == d_s[:-1])
    f_last, f_n, f_v = _levels(fine_eq)
    t_last, t_n, t_v = _levels(e_s[1:] == e_s[:-1])
    return pa.table({
        "event_type": pa.array(
            np.concatenate([e_s[f_last], e_s[t_last]]).tolist(),
            pa.string()),
        "day": pa.array(
            np.concatenate([d_s[f_last],
                            np.full(int(t_last.sum()), -1, np.int64)]),
            pa.int64()),
        "n": pa.array(np.concatenate([f_n, t_n]), pa.int64()),
        "sum_vq": pa.array(np.concatenate([f_v, t_v]), pa.int64()),
    })


def rollup_agg(sf_dir: str) -> pa.Table:
    """All three levels of ``GROUP BY ROLLUP (event_type, day)`` with
    exact integer aggregates; sentinel keys '' / -1 mark rolled-up
    levels (what the oracle COALESCEs NULL to)."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    partials = ds.map_batches(_rollup_partial_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    levels = exchange_by_key(partials, "thash", _rollup_partition)
    parts = [t for t in ray.get(levels.to_arrow_refs()) if t.num_rows]
    out = pa.concat_tables(parts, promote_options="default")
    # grand total from the output-sized (type) level
    type_level = out.filter(pc.equal(out["day"], -1))
    total = pa.table({
        "event_type": pa.array([""], pa.string()),
        "day": pa.array([-1], pa.int64()),
        "n": pa.array([pc.sum(type_level["n"]).as_py() or 0], pa.int64()),
        "sum_vq": pa.array([pc.sum(type_level["sum_vq"]).as_py() or 0],
                           pa.int64()),
    })
    return pa.concat_tables([out, total])


ROLLUP_AGG_SQL = f"""
WITH v AS (
  SELECT event_type,
         epoch_us(ts) // {DAY_US} AS day,
         CAST(floor(value * CAST({VQ_SCALE} AS DOUBLE)) AS BIGINT) AS vq
  FROM events)
SELECT COALESCE(event_type, '') AS event_type,
       CAST(COALESCE(day, -1) AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vq) AS BIGINT) AS sum_vq
FROM v
GROUP BY ROLLUP (event_type, day)
"""


def cube_agg(sf_dir: str) -> pa.Table:
    """All four levels of ``GROUP BY CUBE (event_type, day)``: the
    ROLLUP levels plus the per-day-across-types slice.  The extra level
    is a re-aggregation of the OUTPUT-sized finest level (types x days
    rows), so the raw stream is still scanned exactly once; integer
    sums make the fold order-independent and the DuckDB CUBE oracle
    bit-exact."""
    out = rollup_agg(sf_dir)
    import pyarrow.compute as pc

    fine = out.filter(pc.and_(pc.not_equal(out["day"], -1),
                              pc.not_equal(out["event_type"], "")))
    day = fine["day"].to_numpy(zero_copy_only=False)
    n = fine["n"].to_numpy(zero_copy_only=False)
    sv = fine["sum_vq"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(day, return_inverse=True)
    dn = np.zeros(uniq.size, np.int64)
    dv = np.zeros(uniq.size, np.int64)
    np.add.at(dn, inv, n)
    np.add.at(dv, inv, sv)
    day_level = pa.table({
        "event_type": pa.array([""] * uniq.size, pa.string()),
        "day": pa.array(uniq, pa.int64()),
        "n": pa.array(dn, pa.int64()),
        "sum_vq": pa.array(dv, pa.int64()),
    })
    return pa.concat_tables([out, day_level])


CUBE_AGG_SQL = ROLLUP_AGG_SQL.replace("GROUP BY ROLLUP", "GROUP BY CUBE")


def grouping_sets_agg(sf_dir: str) -> pa.Table:
    """``GROUP BY GROUPING SETS ((type, dow), (type), (dow), ())`` with
    dow = day-of-week (day % 7): the arbitrary-grouping-sets completion
    of the ROLLUP/CUBE family.  Every set is a re-aggregation of the
    rollup's output-sized finest (type, day) level — the raw stream is
    still scanned exactly once; integer sums keep each fold
    order-independent and the DuckDB GROUPING SETS oracle bit-exact.
    Sentinels '' / -1 mark aggregated-away keys."""
    out = rollup_agg(sf_dir)
    fine = out.filter(pc.and_(pc.not_equal(out["day"], -1),
                              pc.not_equal(out["event_type"], "")))
    et = np.asarray(fine["event_type"].to_pylist(), dtype=object)
    dow = fine["day"].to_numpy(zero_copy_only=False) % 7
    n = fine["n"].to_numpy(zero_copy_only=False)
    sv = fine["sum_vq"].to_numpy(zero_copy_only=False)

    def fold(keys: list[np.ndarray]) -> tuple:
        combo = keys[0].astype(str)
        for k in keys[1:]:
            combo = np.char.add(np.char.add(combo, "\x1f"),
                                k.astype(str))
        uniq, inv = np.unique(combo, return_inverse=True)
        fn = np.zeros(uniq.size, np.int64)
        fv = np.zeros(uniq.size, np.int64)
        np.add.at(fn, inv, n)
        np.add.at(fv, inv, sv)
        first = np.full(uniq.size, -1, np.int64)
        first[inv[::-1]] = np.arange(inv.size - 1, -1, -1)
        return first, fn, fv

    parts = []
    # (type, dow)
    f, fn, fv = fold([et, dow])
    parts.append(pa.table({
        "event_type": pa.array(et[f].tolist(), pa.string()),
        "dow": pa.array(dow[f], pa.int64()),
        "n": pa.array(fn, pa.int64()),
        "sum_vq": pa.array(fv, pa.int64())}))
    # (type)
    f, fn, fv = fold([et])
    parts.append(pa.table({
        "event_type": pa.array(et[f].tolist(), pa.string()),
        "dow": pa.array(np.full(fn.size, -1), pa.int64()),
        "n": pa.array(fn, pa.int64()),
        "sum_vq": pa.array(fv, pa.int64())}))
    # (dow)
    f, fn, fv = fold([dow])
    parts.append(pa.table({
        "event_type": pa.array([""] * fn.size, pa.string()),
        "dow": pa.array(dow[f], pa.int64()),
        "n": pa.array(fn, pa.int64()),
        "sum_vq": pa.array(fv, pa.int64())}))
    # ()
    parts.append(pa.table({
        "event_type": pa.array([""], pa.string()),
        "dow": pa.array([-1], pa.int64()),
        "n": pa.array([int(n.sum())], pa.int64()),
        "sum_vq": pa.array([int(sv.sum())], pa.int64())}))
    return pa.concat_tables(parts)


GROUPING_SETS_AGG_SQL = f"""
WITH v AS (
  SELECT event_type,
         (epoch_us(ts) // {DAY_US}) % 7 AS dow,
         CAST(floor(value * CAST({VQ_SCALE} AS DOUBLE)) AS BIGINT) AS vq
  FROM events)
SELECT COALESCE(event_type, '') AS event_type,
       CAST(COALESCE(dow, -1) AS BIGINT) AS dow,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vq) AS BIGINT) AS sum_vq
FROM v
GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow), ())
"""
