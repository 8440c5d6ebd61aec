"""Customer RFM profile, daily value quartiles, and the type x hour
pivot — three small exact analytics cells over the star schema and the
events log.

`orders_rfm`: recency/frequency/monetary per customer in one pass of
per-batch partials (max order-day, count, cents sum) + one groupby;
recency measures against the corpus-wide latest order day (a 2-integer
broadcast).

`daily_quartiles`: lower-order-statistic p25/p50/p75 of cents per day
off the bounded (day, cents) histogram fold (positions ceil(q*n) —
pure selection, no interpolation).

`pivot_type_hour`: the wide count matrix (event_type, h00..h23) — the
PIVOT cell; one bounded histogram fold, driver reshape.

All integers; oracles are direct SQL (argmax/row_number/CASE sums).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY_US = 86_400_000_000


def _rfm_partial(batch: pa.Table) -> pa.Table:
    from .relational import _cents

    ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    day = (batch["o_orderdate"].to_numpy(zero_copy_only=False)
           .astype("datetime64[us]").view("int64") // DAY_US)
    cents = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False),
                   100.0)
    uk, inv = np.unique(ck, return_inverse=True)
    mx = np.full(uk.size, np.iinfo(np.int64).min, np.int64)
    np.maximum.at(mx, inv, day)
    return pa.table({
        "c": pa.array(uk, pa.int64()),
        "last_day": pa.array(mx, pa.int64()),
        "freq": pa.array(np.bincount(inv, None, uk.size)
                         .astype(np.int64), pa.int64()),
        "mon": pa.array(np.bincount(inv, cents, uk.size)
                        .astype(np.int64), pa.int64()),
    })


def orders_rfm(sf_dir: str) -> pa.Table:
    """(c_custkey, rec_days, freq, mon_cents): days since last order
    (vs the corpus-wide latest order day), order count, and total
    spend in cents per customer — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])
    agg = (ds.map_batches(_rfm_partial, batch_format="pyarrow")
           .groupby("c").aggregate(rd.aggregate.Max("last_day"),
                                   rd.aggregate.Sum("freq"),
                                   rd.aggregate.Sum("mon")))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    ck = tbl["c"].to_numpy(zero_copy_only=False)
    last = tbl["max(last_day)"].to_numpy(zero_copy_only=False)
    freq = tbl["sum(freq)"].to_numpy(zero_copy_only=False)
    mon = tbl["sum(mon)"].to_numpy(zero_copy_only=False)
    ref = int(last.max())
    o = np.argsort(ck, kind="stable")
    return pa.table({
        "c_custkey": pa.array(ck[o], pa.int64()),
        "rec_days": pa.array((ref - last[o]).astype(np.int64),
                             pa.int64()),
        "freq": pa.array(freq[o].astype(np.int64), pa.int64()),
        "mon_cents": pa.array(mon[o].astype(np.int64), pa.int64()),
    })


def orders_rfm_sql() -> str:
    return f"""
WITH o AS (
  SELECT o_custkey,
         CAST(epoch_us(o_orderdate) // {DAY_US} AS BIGINT) AS day,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
ref AS (SELECT max(day) AS r FROM o)
SELECT o_custkey AS c_custkey,
       CAST((SELECT r FROM ref) - max(day) AS BIGINT) AS rec_days,
       CAST(count(*) AS BIGINT) AS freq,
       CAST(sum(cents) AS BIGINT) AS mon_cents
FROM o GROUP BY o_custkey
ORDER BY c_custkey"""


def _day_cents_hist(batch: pa.Table) -> pa.Table:
    ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    day = ts // DAY_US
    cents = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
    key = day * np.int64(1 << 32) + (cents + (1 << 31))
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table({
        "day": pa.array(uk // (1 << 32), pa.int64()),
        "cents": pa.array(uk % (1 << 32) - (1 << 31), pa.int64()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def daily_quartiles(sf_dir: str) -> pa.Table:
    """(day, n, p25, p50, p75): lower-order-statistic quartiles of
    cents-quantized value per day — DuckDB hash-matched against the
    row_number order-statistic oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])
    agg = (ds.map_batches(_day_cents_hist, batch_format="pyarrow")
           .groupby(["day", "cents"]).sum("cnt"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    day = tbl["day"].to_numpy(zero_copy_only=False)
    cents = tbl["cents"].to_numpy(zero_copy_only=False)
    cnt = tbl["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((cents, day))
    day, cents, cnt = day[order], cents[order], cnt[order]
    starts = np.concatenate(([True], day[1:] != day[:-1]))
    sp = np.flatnonzero(starts)
    ep = np.concatenate((sp[1:], [day.size]))
    out = {"day": [], "n": [], "p25": [], "p50": [], "p75": []}
    for s, e in zip(sp, ep):
        c = cnt[s:e]
        v = cents[s:e]
        n = int(c.sum())
        cum = np.cumsum(c)
        out["day"].append(int(day[s]))
        out["n"].append(n)
        out["p25"].append(int(v[np.searchsorted(cum, (n + 3) // 4)]))
        out["p50"].append(int(v[np.searchsorted(cum, (n + 1) // 2)]))
        out["p75"].append(int(v[np.searchsorted(cum,
                                                (3 * n + 3) // 4)]))
    return pa.table({
        "day": pa.array(out["day"], pa.int64()),
        "n": pa.array(out["n"], pa.int64()),
        "p25": pa.array(out["p25"], pa.int64()),
        "p50": pa.array(out["p50"], pa.int64()),
        "p75": pa.array(out["p75"], pa.int64()),
    })


def daily_quartiles_sql() -> str:
    return f"""
WITH q AS (
  SELECT CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT day, cents,
         row_number() OVER (PARTITION BY day ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY day) AS n
  FROM q)
SELECT day, CAST(max(n) AS BIGINT) AS n,
       CAST(max(CASE WHEN rn = (n + 3) // 4 THEN cents END)
            AS BIGINT) AS p25,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN cents END)
            AS BIGINT) AS p50,
       CAST(max(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END)
            AS BIGINT) AS p75
FROM r GROUP BY day ORDER BY day"""


def _type_hour_hist(batch: pa.Table) -> pa.Table:
    et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    ts = batch["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    h = (ts // 3_600_000_000) % 24
    key = np.char.add(np.char.add(et.astype(str), "\x00"),
                      h.astype(str))
    uk, inv, cnt = np.unique(key, return_inverse=True,
                             return_counts=True)
    first = np.full(uk.size, -1, np.int64)
    first[inv[::-1]] = np.arange(len(key) - 1, -1, -1)
    return pa.table({
        "event_type": pa.array(et[first].tolist(), pa.string()),
        "h": pa.array(h[first], pa.int64()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def pivot_type_hour(sf_dir: str) -> pa.Table:
    """(event_type, h00..h23): the wide hour-of-day count matrix per
    event type — DuckDB hash-matched against the CASE-sum pivot."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])
    agg = (ds.map_batches(_type_hour_hist, batch_format="pyarrow")
           .groupby(["event_type", "h"]).sum("cnt"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    h = tbl["h"].to_numpy(zero_copy_only=False)
    c = tbl["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
    types = sorted(set(et.tolist()))
    cols = {"event_type": pa.array(types, pa.string())}
    mat = np.zeros((len(types), 24), np.int64)
    tidx = {t: i for i, t in enumerate(types)}
    for e, hh, cc in zip(et, h, c):
        mat[tidx[e], int(hh)] = int(cc)
    for hh in range(24):
        cols[f"h{hh:02d}"] = pa.array(mat[:, hh], pa.int64())
    return pa.table(cols)


def pivot_type_hour_sql() -> str:
    sums = ",\n       ".join(
        f"CAST(sum(CASE WHEN h = {hh} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS h{hh:02d}" for hh in range(24))
    return f"""
WITH q AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS h
  FROM events)
SELECT event_type,
       {sums}
FROM q GROUP BY event_type ORDER BY event_type"""


MONTH_DAYS = 0  # months computed from calendar fields, not day counts


def cohort_revenue(sf_dir: str) -> pa.Table:
    """(cohort_month, month_offset, n_orders, revenue_cents): classic
    cohort-LTV curve — orders grouped by their customer's first-order
    calendar month and the month offset since it. Two-pass shape: the
    per-customer cohort month is ONE groupby fold; the fact join rides
    the co-partitioned exchange (`hash_join` on custkey); months are
    year*12+month integers so offsets are exact. DuckDB hash-matched
    against the window-min oracle."""
    import ray
    import ray.data as rd

    from .exchange import hash_join
    from .relational import _cents

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def stamp(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        ym = (d.astype("datetime64[M]").astype(np.int64)
              + 1970 * 12)
        cents = _cents(batch["o_totalprice"].to_numpy(
            zero_copy_only=False), 100.0)
        return pa.table({
            "o_custkey": pa.array(
                batch["o_custkey"].to_numpy(zero_copy_only=False),
                pa.int64()),
            "ym": pa.array(ym, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        })

    stamped = orders.map_batches(stamp, batch_format="pyarrow")

    def first_partial(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        ym = batch["ym"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ck, return_inverse=True)
        mn = np.full(uk.size, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, ym)
        return pa.table({
            "ck": pa.array(uk, pa.int64()),
            "cm": pa.array(mn, pa.int64()),
        })

    firsts = (stamped.map_batches(first_partial,
                                  batch_format="pyarrow")
              .groupby("ck").min("cm"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "ck": batch["ck"],
            "cohort": pa.compute.cast(batch["min(cm)"], pa.int64()),
        })

    j = hash_join(stamped,
                  firsts.map_batches(rename, batch_format="pyarrow"),
                  "o_custkey", "ck")

    def partial(batch: pa.Table) -> pa.Table:
        co = batch["cohort"].to_numpy(zero_copy_only=False)
        ym = batch["ym"].to_numpy(zero_copy_only=False)
        cents = batch["cents"].to_numpy(zero_copy_only=False)
        off = ym - co
        key = co * 4096 + off
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(uk, pa.int64()),
            "n": pa.array(np.bincount(inv, None, uk.size)
                          .astype(np.int64), pa.int64()),
            "rev": pa.array(np.bincount(inv, cents, uk.size)
                            .astype(np.int64), pa.int64()),
        })

    import ray.data as rd2

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("key").aggregate(rd2.aggregate.Sum("n"),
                                     rd2.aggregate.Sum("rev")))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    k = tbl["key"].to_numpy(zero_copy_only=False)
    n = tbl["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    rev = tbl["sum(rev)"].to_numpy(zero_copy_only=False).astype(np.int64)
    co, off = k // 4096, k % 4096
    o = np.lexsort((off, co))
    return pa.table({
        "cohort_month": pa.array(co[o], pa.int64()),
        "month_offset": pa.array(off[o], pa.int64()),
        "n_orders": pa.array(n[o], pa.int64()),
        "revenue_cents": pa.array(rev[o], pa.int64()),
    })


def cohort_revenue_sql() -> str:
    return """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS ym,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
w AS (SELECT *, min(ym) OVER (PARTITION BY o_custkey) AS cohort
      FROM o)
SELECT cohort AS cohort_month,
       CAST(ym - cohort AS BIGINT) AS month_offset,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM w GROUP BY cohort, ym - cohort
ORDER BY cohort_month, month_offset"""


DECAY_FP = 1 << 20


def decayed_popularity(sf_dir: str, k: int = 25) -> pa.Table:
    """(p_partkey, pop_fp): top-k parts by exponentially time-decayed
    order popularity — each lineitem contributes 2^-age_months in
    2^20 fixed point (integer right-shift, so the decay is EXACT and
    order-independent); ties to ascending part. One partial-combine
    pass + per-block partial top-k — DuckDB hash-matched."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    # reference month = corpus-wide max order month (statistics scan)
    meta = pq.read_table(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate"])
    ref_ym = int(meta["o_orderdate"].to_numpy(zero_copy_only=False)
                 .astype("datetime64[M]").astype(np.int64).max())

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def o_stamp(batch: pa.Table) -> pa.Table:
        ym = (batch["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[M]").astype(np.int64))
        age = np.minimum(ref_ym - ym, 62)
        return pa.table({
            "o_orderkey": pa.array(
                batch["o_orderkey"].to_numpy(zero_copy_only=False),
                pa.int64()),
            "w_fp": pa.array(DECAY_FP >> age, pa.int64()),
        })

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey"])

    from .exchange import hash_join

    j = hash_join(line,
                  orders.map_batches(o_stamp, batch_format="pyarrow"),
                  "l_orderkey", "o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)
        w = batch["w_fp"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "p": pa.array(uk.astype(np.int64), pa.int64()),
            "w": pa.array(np.bincount(inv, w, uk.size)
                          .astype(np.int64), pa.int64()),
        })

    def topk_block(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy(zero_copy_only=False)
        w = batch["sum(w)"].to_numpy(zero_copy_only=False)
        idx = np.lexsort((p, -w))[:k]
        return pa.table({
            "p": pa.array(p[idx], pa.int64()),
            "w": pa.array(w[idx].astype(np.int64), pa.int64()),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("p").sum("w")
           .map_batches(topk_block, batch_format="pyarrow"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    p = tbl["p"].to_numpy(zero_copy_only=False)
    w = tbl["w"].to_numpy(zero_copy_only=False)
    idx = np.lexsort((p, -w))[:k]
    return pa.table({
        "p_partkey": pa.array(p[idx], pa.int64()),
        "pop_fp": pa.array(w[idx].astype(np.int64), pa.int64()),
    })


def decayed_popularity_sql(k: int = 25) -> str:
    return f"""
WITH ref AS (
  SELECT max(CAST(year(o_orderdate) * 12 + month(o_orderdate)
                  AS BIGINT)) AS rm
  FROM orders),
w AS (
  SELECT o_orderkey,
         {DECAY_FP} // power(
           2, least((SELECT rm FROM ref)
                    - (year(o_orderdate) * 12 + month(o_orderdate)),
                    62))::BIGINT AS w_fp
  FROM orders)
SELECT l_partkey AS p_partkey,
       CAST(sum(w_fp) AS BIGINT) AS pop_fp
FROM lineitem JOIN w ON l_orderkey = o_orderkey
GROUP BY l_partkey
ORDER BY pop_fp DESC, p_partkey
LIMIT {k}"""


def _gap_partial(tbl: pa.Table) -> pa.Table:
    """Per-partition histogram of consecutive-order day gaps (orders
    are customer-local under the exchange)."""
    empty = pa.table({"gap_days": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    ck = tbl["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    day = (tbl["o_orderdate"].to_numpy(zero_copy_only=False)
           .astype("datetime64[us]").view("int64") // DAY_US)
    ok = tbl["o_orderkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    order = np.lexsort((ok, day, ck))
    ck, day = ck[order], day[order]
    same = ck[1:] == ck[:-1]
    gaps = (day[1:] - day[:-1])[same]
    ug, cnt = np.unique(gaps, return_counts=True)
    return pa.table({
        "gap_days": pa.array(ug, pa.int64()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def order_gap_stats(sf_dir: str) -> pa.Table:
    """(n_gaps, median_days, p90_days): lower-order statistics of the
    consecutive-order day-gap distribution across customers (orders
    tie-broken by orderkey within a day) — DuckDB hash-matched against
    the lag-window oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate"])
    out = exchange_by_key(ds, "o_custkey", _gap_partial)
    agg = out.groupby("gap_days").sum("cnt")
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    g = tbl["gap_days"].to_numpy(zero_copy_only=False)
    c = tbl["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(g, kind="stable")
    g, c = g[o], c[o]
    n = int(c.sum())
    cum = np.cumsum(c)
    med = int(g[np.searchsorted(cum, (n + 1) // 2)])
    p90 = int(g[np.searchsorted(cum, (9 * n + 9) // 10)])
    return pa.table({
        "n_gaps": pa.array([n], pa.int64()),
        "median_days": pa.array([med], pa.int64()),
        "p90_days": pa.array([p90], pa.int64()),
    })


def order_gap_stats_sql() -> str:
    return f"""
WITH o AS (
  SELECT o_custkey,
         CAST(epoch_us(o_orderdate) // {DAY_US} AS BIGINT) AS day,
         o_orderkey
  FROM orders),
d AS (
  SELECT day - lag(day) OVER (PARTITION BY o_custkey
                              ORDER BY day, o_orderkey) AS gap
  FROM o),
v AS (SELECT gap FROM d WHERE gap IS NOT NULL),
r AS (
  SELECT gap, row_number() OVER (ORDER BY gap) AS rn,
         count(*) OVER () AS n
  FROM v)
SELECT CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap END)
            AS BIGINT) AS median_days,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END)
            AS BIGINT) AS p90_days
FROM r"""


def monthly_revenue_share(sf_dir: str) -> pa.Table:
    """(ym, revenue_cents, pct_ppm, cum_ppm): monthly order revenue
    with exact integer share-of-total and running share — one bounded
    month fold — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ym = (batch["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[M]").astype(np.int64) + 1970 * 12)
        cents = _cents(batch["o_totalprice"].to_numpy(
            zero_copy_only=False), 100.0)
        uk, inv = np.unique(ym, return_inverse=True)
        return pa.table({
            "ym": pa.array(uk, pa.int64()),
            "rev": pa.array(np.bincount(inv, cents, uk.size)
                            .astype(np.int64), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("ym").sum("rev"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    ym = tbl["ym"].to_numpy(zero_copy_only=False)
    rev = tbl["sum(rev)"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(ym, kind="stable")
    ym, rev = ym[o], rev[o]
    total = int(rev.sum())
    cum = np.cumsum(rev)
    return pa.table({
        "ym": pa.array(ym, pa.int64()),
        "revenue_cents": pa.array(rev, pa.int64()),
        "pct_ppm": pa.array(
            [int(r) * 1_000_000 // total for r in rev], pa.int64()),
        "cum_ppm": pa.array(
            [int(c) * 1_000_000 // total for c in cum], pa.int64()),
    })


def monthly_revenue_share_sql() -> str:
    return """
WITH m AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS ym,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM orders GROUP BY ym),
t AS (SELECT CAST(sum(revenue_cents) AS HUGEINT) AS total FROM m)
SELECT ym, revenue_cents,
       CAST(CAST(revenue_cents AS HUGEINT) * 1000000
            // (SELECT total FROM t) AS BIGINT) AS pct_ppm,
       CAST(CAST(sum(revenue_cents) OVER (ORDER BY ym) AS HUGEINT)
            * 1000000 // (SELECT total FROM t) AS BIGINT) AS cum_ppm
FROM m ORDER BY ym"""
