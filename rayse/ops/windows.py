"""Windowed / ordered operators over the ``events`` log table
(``event_id, ts, user_id, event_type, value, props``).

Ray Data has no event-time windows (SURVEY.md §2.9: neither does the
reference); these implement the batch forms per the Ray guide pattern —
partition by key, sort by ts within the group, window with vectorized
pandas/numpy inside ``groupby().map_groups``:

- ``tumbling_agg``: fixed windows keyed by (event_type, floor(ts/size)) —
  realized as a pure vectorized key computation + groupby aggregate (no
  per-group Python at all).
- ``sessionize``: session windows per user (gap-based) — the canonical
  "needs ordered state" op; per-user group sorted by ts, session breaks
  where the gap exceeds the timeout, one output row per session.
- ``top_n_per_group``: top-N events by value per event_type with
  deterministic tie-breaks (O5-family sort().limit() per key).

Ordering assumption (documented per guide): rows within one group are
sorted by ``ts`` inside the map_groups body; input order is irrelevant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _events(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id", "ts", "user_id",
                                    "event_type", "value"])


def tumbling_agg(sf_dir: str, window_s: int = 3600):
    """Per (event_type, tumbling window): count + value sum.

    Window key computed vectorized in map_batches (epoch-second floor), then
    ONE groupby aggregate — the partial/final combine is Ray's hash agg."""
    import ray.data as rd

    ds = _events(sf_dir)

    def keyed(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()  # microseconds
        w = (ts // (window_s * 1_000_000)) * window_s
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": pa.array(w, pa.int64()),
            "value": batch["value"],
        })

    agg = (ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
           .groupby(["event_type", "window_start"])
           .aggregate(rd.aggregate.Count(), rd.aggregate.Sum("value")))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"],
            "n_events": pa.compute.cast(batch["count()"], pa.int64()),
            # rounded: float sum order differs across engines/partitions;
            # np.round (multiply-round-divide) normalizes to the same double
            # as SQL round(); arrow's pc.round uses a different scheme
            "value_sum": pa.array(np.round(
                batch["sum(value)"].to_numpy(zero_copy_only=False)
                .astype(np.float64), 6), pa.float64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def sessionize(sf_dir: str, gap_s: int = 1800):
    """Session windows per user: a new session starts when the gap since
    the previous event exceeds ``gap_s``. One row per session:
    (user_id, session_idx, n_events, start_ts, end_ts, value_sum).

    groupby(user_id) shuffle, then a fully vectorized per-group body."""
    ds = _events(sf_dir)

    def sessions_of_user(group: pa.Table) -> pa.Table:
        ts = group["ts"].cast(pa.int64()).to_numpy()
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        val = group["value"].to_numpy(zero_copy_only=False)[order]
        gap = np.empty(ts.size, dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_s * 1_000_000
        sid = np.cumsum(gap) - 1
        starts = np.flatnonzero(gap)
        ends = np.concatenate((starts[1:], [ts.size]))
        uid = group["user_id"][0].as_py()
        n = starts.size
        return pa.table({
            "user_id": pa.array([uid] * n, pa.int64()),
            "session_idx": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "start_ts": pa.array(ts[starts], pa.int64()),
            "end_ts": pa.array(ts[ends - 1], pa.int64()),
            "value_sum": pa.array(
                np.round(np.add.reduceat(val, starts), 6)
                if ts.size else np.empty(0), pa.float64()),
        })

    return (ds.groupby("user_id")
            .map_groups(sessions_of_user, batch_format="pyarrow"))


def top_n_per_group(sf_dir: str, n: int = 3):
    """Top-N events by value per event_type, ties broken by ascending
    event_id (deterministic O1-style ordering)."""
    ds = _events(sf_dir)

    def top_of_group(group: pa.Table) -> pa.Table:
        val = group["value"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val))[:n]
        idx = pa.array(order, pa.int64())
        return pa.table({
            "event_type": group["event_type"].take(idx),
            "event_id": group["event_id"].take(idx),
            "value": group["value"].take(idx),
            "rank": pa.array(np.arange(1, order.size + 1, dtype=np.int32),
                             pa.int32()),
        })

    return (ds.groupby("event_type")
            .map_groups(top_of_group, batch_format="pyarrow"))


def hopping_agg(sf_dir: str, window_s: int = 3600, hop_s: int = 900):
    """Per (event_type, HOPPING window): count + value sum. Overlapping
    windows (size ``window_s``, advancing every ``hop_s``; ``window_s``
    must be a multiple of ``hop_s``): each event belongs to exactly
    ``window_s/hop_s`` windows — exploded vectorized (constant factor,
    one np.repeat per batch), then ONE groupby aggregate. The same
    constant-factor explode + hash-agg shape holds at any scale."""
    import ray.data as rd

    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    k = window_s // hop_s
    ds = _events(sf_dir)

    def keyed(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()      # microseconds
        # SQL-parity precondition (same policy as rayse.ops.relational):
        # python // is floor division while the oracle's epoch_us(ts)//N
        # truncates toward zero, so the two diverge for pre-epoch
        # timestamps — guard instead of silently mismatching
        if ts.size and ts.min() < 0:
            raise ValueError("hopping_agg requires non-negative (post-epoch)"
                             " timestamps for SQL-oracle parity")
        base = ts // (hop_s * 1_000_000)                  # hop index
        offs = np.arange(k, dtype=np.int64)
        starts = ((base[:, None] - offs[None, :]) * hop_s).reshape(-1)
        n = len(batch)
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        et = (batch["event_type"].combine_chunks()
              if isinstance(batch["event_type"], pa.ChunkedArray)
              else batch["event_type"]).take(pa.array(idx, pa.int64()))
        val = (batch["value"].combine_chunks()
               if isinstance(batch["value"], pa.ChunkedArray)
               else batch["value"]).take(pa.array(idx, pa.int64()))
        return pa.table({
            "event_type": et,
            "window_start": pa.array(starts, pa.int64()),
            "value": val,
        })

    # float policy (see rayse.ops.relational): per-ROW half-away integer
    # micros, summed as int64 — order-independent exactness; rounding the
    # float SUM would flip on summation-order boundaries. Sign-aware
    # half-AWAY-FROM-ZERO (sign * floor(|v|*1e6 + 0.5)) matches DuckDB
    # round() for negative values too — plain floor(v*1e6+0.5) is half-UP
    # and flips the x.5 boundary for v < 0
    def _micros(v: np.ndarray) -> np.ndarray:
        return (np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)).astype(np.int64)

    agg = (ds.map_batches(keyed, batch_format="pyarrow",
                          zero_copy_batch=True)
           .map_batches(lambda b: pa.table({
               "event_type": b["event_type"],
               "window_start": b["window_start"],
               "micros": pa.array(_micros(
                   b["value"].to_numpy(zero_copy_only=False)), pa.int64()),
           }), batch_format="pyarrow")
           .groupby(["event_type", "window_start"])
           .aggregate(rd.aggregate.Count(), rd.aggregate.Sum("micros")))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"],
            "n_events": pa.compute.cast(batch["count()"], pa.int64()),
            "value_sum_micros": pa.compute.cast(batch["sum(micros)"],
                                                pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def hopping_agg_sql(window_s: int = 3600, hop_s: int = 900) -> str:
    k = window_s // hop_s
    offs = ", ".join(str(i) for i in range(k))
    return f"""
        SELECT event_type,
               ((epoch_us(ts) // {hop_s * 1_000_000}) - i.i) * {hop_s}
                 AS window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
                 AS value_sum_micros
        FROM events, UNNEST([{offs}]) AS i(i)
        GROUP BY 1, 2
    """


# -- watermark late-event accounting ------------------------------------------

WM_DELAY_S = 1800                # watermark lag behind max event time
WM_SKEW_S = 7200                 # synthesized out-of-order skew bound
WM_BUCKET = 1 << 13              # events per prefix bucket (driver lever)


def late_events(sf_dir: str, delay_s: int = WM_DELAY_S,
                skew_s: int = WM_SKEW_S, bucket: int = WM_BUCKET):
    """Event-time watermark accounting (the Dataflow model, Akidau et
    al. 2015): arrival order is the ``event_id`` sequence; after
    processing event i the watermark is ``max(t[0..i]) - delay``; event
    i is LATE iff its event time is below the watermark BEFORE it
    (``t[i] < max(t[0..i-1]) - delay``). The synthetic log is perfectly
    time-ordered, so out-of-orderness is synthesized deterministically
    (the `redact_pii` pattern): event time = ts backdated by
    ``mix(event_id) % skew``. Output: (event_type, late, n) counts.

    Scale shape: a global ordered scan WITHOUT a global sort. Phase 1
    folds per-bucket (``event_id // bucket``) max-event-time partials —
    one bounded row per bucket — and the driver takes the exclusive
    prefix-max over that bounded table (``bucket`` is the driver-state
    lever: 2^20 at 10^12 events keeps it ~1M rows). Phase 2 exchanges
    rows by bucket; inside a partition each bucket's rows sort by
    event_id and ONE seeded ``np.maximum.accumulate`` yields every
    row's exact prior watermark: segment seeds are the broadcast prefix
    maxima, and a segment's carryover into the next is always dominated
    by the next segment's seed (the prefix already contains every
    earlier bucket), so the single accumulate is exact across segment
    boundaries — no per-bucket Python loop."""
    import ray.data as rd

    from .exchange import _mix, exchange_by_key

    skew_us = skew_s * 1_000_000
    delay_us = delay_s * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])

    def stamp(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        t = ts - (_mix(eid.astype(np.uint64))
                  % np.uint64(skew_us)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(eid // bucket, pa.int64()),
            "event_id": pa.array(eid, pa.int64()),
            "t": pa.array(t, pa.int64()),
            "event_type": batch["event_type"]})

    stamped = ds.map_batches(stamp, batch_format="pyarrow",
                             zero_copy_batch=True)
    maxima = (stamped.select_columns(["bucket", "t"])
              .groupby("bucket").max("t").to_pandas())
    b_sorted = np.sort(maxima["bucket"].to_numpy())
    mx = maxima.set_index("bucket").loc[b_sorted, "max(t)"].to_numpy()
    sentinel = np.int64(np.iinfo(np.int64).min // 4)
    prefix = np.empty(b_sorted.size, dtype=np.int64)
    if b_sorted.size:
        prefix[0] = sentinel
        np.maximum.accumulate(mx[:-1], out=prefix[1:])

    out = exchange_by_key(
        stamped, "bucket", _late_partition,
        proc_kwargs={"b_sorted": b_sorted, "prefix": prefix,
                     "delay_us": delay_us, "sentinel": sentinel})
    agg = (out.groupby(["event_type", "late"]).sum("n")
           .to_pandas().sort_values(["event_type", "late"]))
    return pa.table({
        "event_type": pa.array(agg["event_type"], pa.string()),
        "late": pa.array(agg["late"].to_numpy(), pa.int64()),
        "n": pa.array(agg["sum(n)"].to_numpy(), pa.int64())})


def _late_partition(tbl: pa.Table, b_sorted: np.ndarray,
                    prefix: np.ndarray, delay_us: int,
                    sentinel: np.int64) -> pa.Table:
    """All rows of this partition's buckets: sort by (bucket, event_id),
    seed each bucket segment with its exclusive global prefix max, one
    maximum.accumulate -> per-row prior watermark -> (type, late, n)."""
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "late": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    b = tbl["bucket"].to_numpy(zero_copy_only=False)
    eid = tbl["event_id"].to_numpy(zero_copy_only=False)
    t = tbl["t"].to_numpy(zero_copy_only=False)
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    order = np.lexsort((eid, b))
    b, t, et = b[order], t[order], et[order]
    seg = np.empty(b.size, dtype=bool)
    seg[0] = True
    seg[1:] = b[1:] != b[:-1]
    shifted = np.empty(t.size, dtype=np.int64)
    shifted[1:] = t[:-1]
    starts = np.flatnonzero(seg)
    pos = np.searchsorted(b_sorted, b[starts])
    shifted[starts] = prefix[pos] if b_sorted.size else sentinel
    prev = np.maximum.accumulate(shifted)
    late = ((prev > sentinel) & (t < prev - delay_us)).astype(np.int64)
    u, inv = np.unique(et, return_inverse=True)
    key = inv * 2 + late
    cnt = np.bincount(key, minlength=2 * u.size)
    nz = np.flatnonzero(cnt)
    return pa.table({
        "event_type": pa.array(u[nz // 2], pa.string()),
        "late": pa.array((nz % 2).astype(np.int64), pa.int64()),
        "n": pa.array(cnt[nz].astype(np.int64), pa.int64())})


def late_events_sql(delay_s: int = WM_DELAY_S,
                    skew_s: int = WM_SKEW_S) -> str:
    """Oracle: the same backdated event times (HUGEINT splitmix mirror)
    under one ordered window max — exact integer microseconds."""
    from .sketch import _mix_sql_wide

    return f"""
WITH le AS (
  SELECT event_type, event_id,
         epoch_us(ts) - CAST({_mix_sql_wide('CAST(event_id AS HUGEINT)')}
                             % {skew_s * 1_000_000} AS BIGINT) AS t
  FROM events),
lo AS (
  SELECT event_type, t,
         max(t) OVER (ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pm
  FROM le)
SELECT event_type,
       CAST(CASE WHEN pm IS NOT NULL AND t < pm - {delay_s * 1_000_000}
                 THEN 1 ELSE 0 END AS BIGINT) AS late,
       CAST(count(*) AS BIGINT) AS n
FROM lo GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# Day-windowed TWAP (time-weighted average price/value — the standard
# irregular-sampling aggregate in market/telemetry data): each event's
# value holds until the next event of the same type within the day (the
# last one holds to day end), so the mean weights values by holding
# time, not by row count. The day boundary makes the semantic fully
# bucket-local: ONE exchange by (type-hash, day) and every partition
# finishes its own (type, day) groups — no halo, no cross-bucket state
# (the trade-off vs an unbounded-holding TWAP is documented here: value
# holding truncates at midnight). Integer-exact: cents × microsecond
# weights summed as int64, one floor division per group.
# ---------------------------------------------------------------------------

_TWAP_DAY_US = 86_400_000_000


def _twap_partition(tbl: pa.Table) -> pa.Table:
    """All rows of this partition's (type-hash, day) keys: sort by
    (type, day, t, event_id) — event_id breaks timestamp ties exactly
    like the oracle's ORDER BY — then per-group holding weights."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "day": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "den_us": pa.array([], pa.int64()),
                         "twap_milli": pa.array([], pa.int64())})
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    codes, first = None, None
    uk, codes = np.unique(et, return_inverse=True)
    day = tbl["day"].to_numpy(zero_copy_only=False)
    t = tbl["t"].to_numpy(zero_copy_only=False)
    eid = tbl["event_id"].to_numpy(zero_copy_only=False)
    c = tbl["c"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, t, day, codes))
    codes, day, t, c = codes[order], day[order], t[order], c[order]
    # group = (code, day) run boundaries after the sort
    new = np.empty(t.size, dtype=bool)
    new[0] = True
    new[1:] = (codes[1:] != codes[:-1]) | (day[1:] != day[:-1])
    nxt = np.empty(t.size, np.int64)
    nxt[:-1] = t[1:]
    nxt[-1] = 0
    ends = np.empty(t.size, dtype=bool)
    ends[:-1] = new[1:]
    ends[-1] = True
    nxt[ends] = (day[ends] + 1) * _TWAP_DAY_US     # hold to day end
    w = nxt - t
    starts = np.flatnonzero(new)
    num = np.add.reduceat(c * w, starts)
    den = np.add.reduceat(w, starts)
    n = np.add.reduceat(np.ones(t.size, np.int64), starts)
    return pa.table({
        "event_type": pa.array(uk[codes[starts]].tolist(), pa.string()),
        "day": pa.array(day[starts], pa.int64()),
        "n": pa.array(n, pa.int64()),
        "den_us": pa.array(den, pa.int64()),
        "twap_milli": pa.array(num * 1000 // den, pa.int64()),
    })


def twap_daily(sf_dir: str) -> pa.Table:
    """(event_type, day, n, den_us, twap_milli): day-windowed
    time-weighted average value per type — DuckDB hash-matched against
    the lead()-window oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "event_id", "ts",
                                  "value"])

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .textstats import _word_arr_slices, fnv64_slices

        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "thash": pa.array(
                fnv64_slices(*_word_arr_slices(et)).astype(np.int64)
                & ((1 << 63) - 1), pa.int64()),
            "event_type": batch["event_type"],
            "event_id": batch["event_id"],
            "day": pa.array(ts // _TWAP_DAY_US, pa.int64()),
            "t": pa.array(ts, pa.int64()),
            "c": pa.array(np.floor(
                batch["value"].to_numpy(zero_copy_only=False)
                * 100.0).astype(np.int64), pa.int64()),
        })

    out = exchange_by_key(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["thash", "day"], _twap_partition)
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    day = tbl["day"].to_numpy(zero_copy_only=False)
    order = np.lexsort((day, et))
    idx = pa.array(order, pa.int64())
    import pyarrow.compute as pc

    return pa.table({
        "event_type": pc.take(tbl["event_type"], idx),
        "day": pc.take(tbl["day"], idx),
        "n": pc.take(tbl["n"], idx),
        "den_us": pc.take(tbl["den_us"], idx),
        "twap_milli": pc.take(tbl["twap_milli"], idx),
    })


def twap_daily_sql() -> str:
    return f"""
WITH v AS (
  SELECT event_type, event_id, epoch_us(ts) AS t,
         epoch_us(ts) // {_TWAP_DAY_US} AS day,
         CAST(floor(value * 100) AS BIGINT) AS c
  FROM events),
w AS (
  SELECT event_type, day, c,
         COALESCE(lead(t) OVER (PARTITION BY event_type, day
                                ORDER BY t, event_id),
                  (day + 1) * {_TWAP_DAY_US}) - t AS wt
  FROM v)
SELECT event_type, CAST(day AS BIGINT) AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(wt) AS BIGINT) AS den_us,
       CAST(sum(CAST(c AS HUGEINT) * wt) * 1000
            // sum(CAST(wt AS HUGEINT)) AS BIGINT) AS twap_milli
FROM w GROUP BY event_type, day
ORDER BY event_type, day"""
