"""Relational operators over the TPC-H-ish sf tables — broad-coverage
demonstrations of the guide's aggregation/join patterns on the engine's
non-search side (wide groupby aggregate, broadcast hash join, trailing
sliding window). All DuckDB-oracle-matched.

Float policy: money values are converted to integer cents PER ROW (both
sides compute half-away-from-zero rounding on identical double operands ->
identical integers) and summed as int64 — integer sums are
order-independent, so the hash-exact comparison cannot be broken by float
summation order, unlike any "round the float sum" scheme (boundary flips).
Rounding is ``floor(x*100 + 0.5)`` (half-AWAY for non-negative money),
matching DuckDB's ``round()`` on DOUBLE exactly; ``np.round`` would be
half-to-even and disagree on exact .5 cents (e.g. 246.5 -> 246 vs 247).
All money columns here are non-negative, which the floor form requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _cents(x: np.ndarray, scale: float = 100.0) -> np.ndarray:
    """Half-away-from-zero integer scaling for non-negative doubles
    (identical to DuckDB round(x*scale))."""
    return np.floor(x * scale + 0.5).astype(np.int64)


def pricing_summary(sf_dir: str):
    """Q1-style pricing summary: per (returnflag, linestatus) sums/counts
    over lineitem — partial per-batch combine + one small groupby."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow/numpy partial combine (no pandas conversion): group key
        # = dictionary codes of "returnflag|linestatus", sums via bincount
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        key = pa.compute.binary_join_element_wise(
            batch["l_returnflag"], batch["l_linestatus"], "|")
        dic = key.combine_chunks().dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_g = len(dic.dictionary)
        labels = [s.split("|") for s in dic.dictionary.to_pylist()]
        return pa.table({
            "l_returnflag": pa.array([l[0] for l in labels], pa.string()),
            "l_linestatus": pa.array([l[1] for l in labels], pa.string()),
            "sum_qty": pa.array(
                np.bincount(codes, _cents(qty), n_g).astype(np.int64)),
            "sum_base_price": pa.array(
                np.bincount(codes, _cents(price), n_g).astype(np.int64)),
            "sum_disc_price": pa.array(
                np.bincount(codes, _cents(price * (1.0 - disc), 10000.0),
                            n_g).astype(np.int64)),
            "count_order": pa.array(np.bincount(codes, None, n_g)
                                    .astype(np.int64)),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(rd.aggregate.Sum("sum_qty"),
                      rd.aggregate.Sum("sum_base_price"),
                      rd.aggregate.Sum("sum_disc_price"),
                      rd.aggregate.Sum("count_order")))

    def final(batch: pa.Table) -> pa.Table:
        def cents(col):
            return pa.compute.cast(batch[col], pa.int64())

        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": cents("sum(sum_qty)"),            # qty * 100
            "sum_base_price": cents("sum(sum_base_price)"),   # cents
            "sum_disc_price": cents("sum(sum_disc_price)"),   # 1e-4 units
            "count_order": pa.compute.cast(batch["sum(count_order)"],
                                           pa.int64()),
        })

    return agg.map_batches(final, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                         AS BIGINT)) AS BIGINT) AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def top_customer_revenue(sf_dir: str, n: int = 10):
    """Top-N customers by total order value: BROADCAST hash join (customer
    side shipped once via ray.put, looked up per batch — the guide's
    small-side join pattern; no shuffle) + groupby + deterministic top-N."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    name_of = dict(zip(cust["c_custkey"].to_pylist(),
                       cust["c_name"].to_pylist()))
    ref = ray.put(name_of)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "cents": pa.array(_cents(
                batch["o_totalprice"].to_numpy(zero_copy_only=False)),
                pa.int64()),
        })

    agg = (orders.map_batches(to_cents, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("o_custkey")
           .aggregate(rd.aggregate.Sum("cents"), rd.aggregate.Count()))

    def partial_topn(batch: pa.Table) -> pa.Table:
        # per-batch partial top-N: the global top-N is a subset of the union
        # of per-batch top-Ns (keys are distinct after the groupby), so only
        # N rows per batch reach the driver — never one row per customer
        cust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        rev = batch["sum(cents)"].to_numpy(zero_copy_only=False)
        cnt = batch["count()"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((cust, -rev))[:n]
        return pa.table({
            "o_custkey": pa.array(cust[idx], pa.int64()),
            "revenue": pa.array(rev[idx].astype(np.int64), pa.int64()),
            "n_orders": pa.array(cnt[idx].astype(np.int64), pa.int64()),
        })

    def hydrate(batch: pa.Table) -> pa.Table:
        names = ray.get(ref)
        keys = batch["o_custkey"].to_pylist()
        return pa.table({
            "c_custkey": pa.array(keys, pa.int64()),
            "c_name": pa.array([names.get(k, "") for k in keys],
                               pa.string()),
            "revenue": batch["revenue"],
            "n_orders": batch["n_orders"],
        })

    rows = (agg.map_batches(partial_topn, batch_format="pyarrow")
            .map_batches(hydrate, batch_format="pyarrow").take_all())
    rows.sort(key=lambda r: (-r["revenue"], r["c_custkey"]))
    return pa.Table.from_pylist(rows[:n])


TOP_CUSTOMER_REVENUE_SQL = """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 10
"""


def trailing_window_counts(sf_dir: str, window_s: int = 3600):
    """Per event: number of same-type events in the trailing ``window_s``
    seconds (inclusive of ts peers) — the sliding-window analog of
    ``windows.tumbling_agg``; per-type sorted group + two searchsorteds."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "event_type"])

    def per_type(group: pa.Table) -> pa.Table:
        ts = group["ts"].cast(pa.int64()).to_numpy()
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts_s = ts[order]
        lo = np.searchsorted(ts_s, ts_s - window_s * 1_000_000, side="left")
        hi = np.searchsorted(ts_s, ts_s, side="right")
        counts = (hi - lo).astype(np.int64)
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "trailing_count": pa.array(counts, pa.int64()),
        })

    return ds.groupby("event_type").map_groups(per_type,
                                               batch_format="pyarrow")


TRAILING_WINDOW_SQL = """
    SELECT event_id,
           CAST(count(*) OVER (
             PARTITION BY event_type ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS BIGINT) AS trailing_count
    FROM events
"""


# ---------------------------------------------------------------------------
# As-of join — the canonical "operator Ray Data lacks" (task brief §custom
# operators): each left event joined to the same user's most recent
# prior-or-equal right event. Realization: ONE partitioned file-exchange by
# user_id (rayse.ops.exchange), then whole-partition vectorized backward
# searchsorted — the partitioning assumption is that a user's events fit
# one partition (true by construction: partitions hold many users; a single
# user's history is tiny relative to a partition). DuckDB's native ASOF
# JOIN is the oracle.
# ---------------------------------------------------------------------------

def _asof_partition(tbl: "pa.Table", left_type: str,
                    right_type: str) -> "pa.Table":
    """All events of this partition's users -> matched (left, right)
    pairs. Composite int key (user rank * span + ts offset) makes ONE
    searchsorted serve every user at once; exact int64 arithmetic."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts_us": pa.array([], pa.int64()),
        "matched_event_id": pa.array([], pa.int64()),
        "gap_us": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    etype = np.asarray(tbl["event_type"].to_pylist())
    user = tbl["user_id"].to_numpy(zero_copy_only=False)
    ts = pc.cast(tbl["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = tbl["event_id"].to_numpy(zero_copy_only=False)
    lm, rm = etype == left_type, etype == right_type
    if not lm.any() or not rm.any():
        return empty
    uids = np.unique(user)
    uidx = {int(u): i for i, u in enumerate(uids.tolist())}
    urank = np.fromiter((uidx[int(u)] for u in user.tolist()),
                        dtype=np.int64, count=user.size)
    t0 = int(ts.min())
    span = int(ts.max()) - t0 + 2            # +2: room for the key shift
    key = urank * span + (ts - t0)
    lk, rk = key[lm], key[rm]
    r_order = np.argsort(rk, kind="stable")
    rk_s = rk[r_order]
    r_eid = eid[rm][r_order]
    r_ur = urank[rm][r_order]
    r_ts = ts[rm][r_order]
    j = np.searchsorted(rk_s, lk, side="right") - 1
    jc = np.maximum(j, 0)
    ok = (j >= 0) & (r_ur[jc] == urank[lm])  # same user, r.ts <= l.ts
    return pa.table({
        "event_id": pa.array(eid[lm][ok], pa.int64()),
        "user_id": pa.array(user[lm][ok], pa.int64()),
        "ts_us": pa.array(ts[lm][ok], pa.int64()),
        "matched_event_id": pa.array(r_eid[jc][ok], pa.int64()),
        "gap_us": pa.array(ts[lm][ok] - r_ts[jc][ok], pa.int64()),
    })


def asof_join_events(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click"):
    """Each ``left_type`` event joined to the same user's most recent
    prior-or-equal ``right_type`` event -> (event_id, user_id, ts_us,
    matched_event_id, gap_us); unmatched left events drop (inner as-of)."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    return exchange_by_key(
        ds, "user_id", _asof_partition,
        proc_kwargs={"left_type": left_type, "right_type": right_type})


def asof_join_events_sql(left_type: str = "purchase",
                         right_type: str = "click") -> str:
    """Oracle: DuckDB's native ASOF JOIN (greatest r.ts <= l.ts per key)."""
    return f"""
SELECT l.event_id, l.user_id,
       epoch_us(l.ts) AS ts_us,
       r.event_id AS matched_event_id,
       epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = '{left_type}') l
ASOF JOIN (SELECT * FROM events WHERE event_type = '{right_type}') r
  ON l.user_id = r.user_id AND l.ts >= r.ts"""


def _range_partition(tbl: "pa.Table", left_type: str, right_type: str,
                     before_us: int, after_us: int) -> "pa.Table":
    """Range (interval) join within one user partition: for each left
    event, every right event of the same user with ts in [l.ts -
    before_us, l.ts + after_us]. Two searchsorted probes per left side
    (lower/upper bound) + a repeat/arange expand — no per-row loop."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "matched_event_id": pa.array([], pa.int64()),
        "delta_us": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    etype = np.asarray(tbl["event_type"].to_pylist())
    user = tbl["user_id"].to_numpy(zero_copy_only=False)
    ts = pc.cast(tbl["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = tbl["event_id"].to_numpy(zero_copy_only=False)
    lm, rm = etype == left_type, etype == right_type
    if not lm.any() or not rm.any():
        return empty
    uids = np.unique(user)
    uidx = {int(u): i for i, u in enumerate(uids.tolist())}
    urank = np.fromiter((uidx[int(u)] for u in user.tolist()),
                        dtype=np.int64, count=user.size)
    t0 = int(ts.min())
    # span covers the widened probe window so composite keys stay disjoint
    span = int(ts.max()) - t0 + before_us + after_us + 2
    key = urank * span + (ts - t0)
    lk = urank[lm] * span + (ts[lm] - t0)
    rk = key[rm]
    r_order = np.argsort(rk, kind="stable")
    rk_s = rk[r_order]
    r_eid = eid[rm][r_order]
    r_ts = ts[rm][r_order]
    lo = np.searchsorted(rk_s, lk - before_us, side="left")
    hi = np.searchsorted(rk_s, lk + after_us, side="right")
    n = hi - lo
    l_rep = np.repeat(np.arange(lk.size), n)
    r_pos = (np.arange(int(n.sum())) - np.repeat(np.cumsum(n) - n, n)
             + np.repeat(lo, n))
    l_eid, l_uid, l_ts = eid[lm][l_rep], user[lm][l_rep], ts[lm][l_rep]
    return pa.table({
        "event_id": pa.array(l_eid, pa.int64()),
        "user_id": pa.array(l_uid, pa.int64()),
        "matched_event_id": pa.array(r_eid[r_pos], pa.int64()),
        "delta_us": pa.array(r_ts[r_pos] - l_ts, pa.int64()),
    })


def range_join_events(sf_dir: str, left_type: str = "purchase",
                      right_type: str = "error",
                      before_us: int = 3_600_000_000,
                      after_us: int = 3_600_000_000):
    """Interval join: every (left, right) same-user event pair with
    right.ts within [left.ts - before, left.ts + after] -> (event_id,
    user_id, matched_event_id, delta_us). Same exchange-by-user shape as
    the as-of join; output size is bounded by the window, not the
    corpus (skew note: a pathological single-user firehose concentrates
    in one partition — salt by time bucket in that regime)."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    return exchange_by_key(
        ds, "user_id", _range_partition,
        proc_kwargs={"left_type": left_type, "right_type": right_type,
                     "before_us": before_us, "after_us": after_us})


def range_join_events_sql(left_type: str = "purchase",
                          right_type: str = "error",
                          before_us: int = 3_600_000_000,
                          after_us: int = 3_600_000_000) -> str:
    return f"""
SELECT l.event_id, l.user_id, r.event_id AS matched_event_id,
       epoch_us(r.ts) - epoch_us(l.ts) AS delta_us
FROM (SELECT * FROM events WHERE event_type = '{left_type}') l
JOIN (SELECT * FROM events WHERE event_type = '{right_type}') r
  ON l.user_id = r.user_id
 AND epoch_us(r.ts) BETWEEN epoch_us(l.ts) - {before_us}
                        AND epoch_us(l.ts) + {after_us}"""
