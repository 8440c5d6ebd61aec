"""Deequ-style data-quality constraint checks over the relational
tables — the validation pass a production ingest runs before anything
downstream trusts the data.

Eight checks across four tables, each reported as exact
(check_name, n_violations, n_rows):

- referential integrity twice, by the two scale routes the join family
  already provides: ``ri_lineitem_orders`` through the co-partitioned
  file-exchange ANTI join (big ⋈ big — neither side broadcast), and
  ``ri_orders_customer`` through broadcast membership (small key side:
  ``ray.put`` a sorted key array once, ``np.isin`` per batch);
- uniqueness twice (single-column ``unique_o_orderkey``, composite
  ``pk_lineitem``): excess rows = n - distinct(keys), distinct counted
  inside key-hash exchange partitions (per-batch partials can't merge
  distincts; co-located keys can) and summed;
- domain / range / sign / null checks: row-local vectorized predicates
  folded through per-batch partial sums — the embarrassingly-parallel
  shape.

Everything is an integer count, so the DuckDB oracle (a UNION ALL of
the same predicates) matches bit-for-bit.

Reference relationship: the reference trusts PostgreSQL constraints
(UNIQUE/FK in `V2__Add_Metrics_Tables.sql`, `Document.java:17-55`) to
enforce these at insert time; a lakehouse pipeline has no such gate, so
validation becomes an explicit distributed operator (beyond-reference
family, SURVEY §2.7).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ACCEPTED_EVENT_TYPES = ("click", "view", "purchase", "signup")
VALUE_LO, VALUE_HI = 0.0, 300.0


def _count_ds(ds) -> int:
    return int(ds.count())


def _sum_flags(ds, flag_fn) -> int:
    """Row-local predicate -> exact violation count via partial sums."""
    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"v": pa.array([int(flag_fn(batch).sum())],
                                       pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).sum("v")
    return int(agg) if agg is not None else 0


def _distinct_in_partitions(ds, key_cols: list[str]) -> int:
    """Exact distinct count of (possibly composite) integer keys:
    co-locate by key hash, np.unique per partition, sum."""
    import ray

    from .exchange import exchange_by_key

    def proc(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64())})
        cols = [tbl[c].to_numpy(zero_copy_only=False) for c in key_cols]
        if len(cols) == 1:
            d = np.unique(cols[0]).size
        else:
            d = np.unique(np.rec.fromarrays(cols)).size
        return pa.table({"d": pa.array([d], pa.int64())})

    out = exchange_by_key(ds, key_cols, proc)
    parts = ray.get(out.to_arrow_refs())
    return sum(int(t["d"][i].as_py()) for t in parts
               for i in range(t.num_rows))


def _anti_join_count(left_ds, right_ds, left_on: str, right_on: str) -> int:
    """Left rows with no right match — the exchange ANTI join route."""
    from .exchange import hash_join

    j = hash_join(left_ds, right_ds, left_on, right_on,
                  join_type="left anti")
    return _count_ds(j)


def data_checks(sf_dir: str) -> pa.Table:
    """(check_name, n_violations, n_rows) for the eight-constraint
    validation suite — see module header for the per-check routes."""
    import ray
    import ray.data as rd

    def read(t, cols):
        return rd.read_parquet(f"{sf_dir}/{t}.parquet", columns=cols)

    rows = {
        "orders": _count_ds(read("orders", ["o_orderkey"])),
        "lineitem": _count_ds(read("lineitem", ["l_orderkey"])),
        "customer": _count_ds(read("customer", ["c_custkey"])),
        "events": _count_ds(read("events", ["event_id"])),
    }
    out: list[tuple[str, int, int]] = []

    # RI big-vs-big: exchange anti join (keys only leave the scan)
    li_keys = read("lineitem", ["l_orderkey"])
    ord_keys = read("orders", ["o_orderkey"])
    out.append(("ri_lineitem_orders",
                _anti_join_count(li_keys, ord_keys,
                                 "l_orderkey", "o_orderkey"),
                rows["lineitem"]))

    # RI small key side: broadcast membership
    cust = np.sort(np.unique(np.concatenate(
        [t["c_custkey"].to_numpy(zero_copy_only=False)
         for t in ray.get(read("customer",
                                ["c_custkey"]).to_arrow_refs())]
        or [np.array([], np.int64)])))
    cust_ref = ray.put(cust)

    def missing_cust(batch: pa.Table) -> np.ndarray:
        keys = ray.get(cust_ref)
        return ~np.isin(
            batch["o_custkey"].to_numpy(zero_copy_only=False), keys)

    out.append(("ri_orders_customer",
                _sum_flags(read("orders", ["o_custkey"]), missing_cust),
                rows["orders"]))

    # uniqueness: excess rows over distinct keys
    out.append(("unique_o_orderkey",
                rows["orders"] - _distinct_in_partitions(
                    read("orders", ["o_orderkey"]), ["o_orderkey"]),
                rows["orders"]))
    out.append(("pk_lineitem",
                rows["lineitem"] - _distinct_in_partitions(
                    read("lineitem", ["l_orderkey", "l_linenumber"]),
                    ["l_orderkey", "l_linenumber"]),
                rows["lineitem"]))

    # row-local predicate checks
    accepted = set(ACCEPTED_EVENT_TYPES)

    def bad_type(batch: pa.Table) -> np.ndarray:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        return ~np.isin(et, list(accepted))

    out.append(("domain_event_type",
                _sum_flags(read("events", ["event_type"]), bad_type),
                rows["events"]))

    def bad_value(batch: pa.Table) -> np.ndarray:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return (v < VALUE_LO) | (v >= VALUE_HI)

    out.append(("range_event_value",
                _sum_flags(read("events", ["value"]), bad_value),
                rows["events"]))

    def neg_bal(batch: pa.Table) -> np.ndarray:
        return batch["c_acctbal"].to_numpy(zero_copy_only=False) < 0

    out.append(("nonneg_c_acctbal",
                _sum_flags(read("customer", ["c_acctbal"]), neg_bal),
                rows["customer"]))

    def null_props(batch: pa.Table) -> np.ndarray:
        return pc.is_null(batch["props"]).to_numpy(zero_copy_only=False)

    out.append(("nonnull_props",
                _sum_flags(read("events", ["props"]), null_props),
                rows["events"]))

    out.sort()
    return pa.table({
        "check_name": pa.array([c for c, _, _ in out], pa.string()),
        "n_violations": pa.array([v for _, v, _ in out], pa.int64()),
        "n_rows": pa.array([n for _, _, n in out], pa.int64())})


def data_checks_sql() -> str:
    accepted = ", ".join(f"'{t}'" for t in ACCEPTED_EVENT_TYPES)
    return f"""
SELECT * FROM (
SELECT 'domain_event_type' AS check_name,
       CAST(count(*) FILTER (WHERE event_type NOT IN ({accepted}))
            AS BIGINT) AS n_violations,
       CAST(count(*) AS BIGINT) AS n_rows FROM events
UNION ALL
SELECT 'nonneg_c_acctbal',
       CAST(count(*) FILTER (WHERE c_acctbal < 0) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM customer
UNION ALL
SELECT 'nonnull_props',
       CAST(count(*) FILTER (WHERE props IS NULL) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM events
UNION ALL
SELECT 'pk_lineitem',
       CAST(count(*) - count(DISTINCT [l_orderkey, l_linenumber])
            AS BIGINT),
       CAST(count(*) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'range_event_value',
       CAST(count(*) FILTER (WHERE value < {VALUE_LO}
                             OR value >= {VALUE_HI}) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM events
UNION ALL
SELECT 'ri_lineitem_orders',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL),
       CAST(count(*) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'ri_orders_customer',
       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL),
       CAST(count(*) AS BIGINT) FROM orders
UNION ALL
SELECT 'unique_o_orderkey',
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
       CAST(count(*) AS BIGINT) FROM orders
) ORDER BY check_name"""


K_ANON = 5
QI_VALUE_BUCKET = 5000          # cents — $50 buckets


def k_anonymity(sf_dir: str, k: int = K_ANON) -> pa.Table:
    """(event_type, n_groups, n_small_groups, rows_at_risk): k-anonymity
    audit of the events table under the quasi-identifier
    (event_type, hour-of-day, $50 value bucket) — a privacy gate a
    training-data pipeline runs before releasing event-derived features.
    A QI group smaller than ``k`` re-identifies its members; the report
    counts, per event type, the QI groups, the groups below k, and the
    rows they expose.

    Distributed shape: the QI is computed row-locally (vectorized hour
    extraction + integer bucket), group sizes come from ONE groupby over
    the composite key (bounded by QI-domain cardinality: types x 24 x
    price-range/50 — domain-bounded, not row-bounded), and the per-type
    rollup of sizes is a driver fold over that bounded table. DuckDB
    hash-matched against the same two-level GROUP BY.

    Reference relationship: none (beyond-reference governance family,
    alongside the Deequ-style checks above and `redact_pii`).
    """
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def qi(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hour = ((ts.astype("datetime64[us]").astype(np.int64)
                 // 3_600_000_000) % 24).astype(np.int64)
        bucket = _cents(batch["value"].to_numpy(
            zero_copy_only=False)) // QI_VALUE_BUCKET
        return pa.table({"event_type": batch["event_type"],
                         "hour": pa.array(hour, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    sizes = (ds.map_batches(qi, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["event_type", "hour", "bucket"]).count()
             .take_all())
    per_type: dict[str, list[int]] = {}
    for r in sizes:
        per_type.setdefault(str(r["event_type"]), []).append(
            int(r["count()"]))
    types = sorted(per_type)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_groups": pa.array([len(per_type[t]) for t in types],
                             pa.int64()),
        "n_small_groups": pa.array(
            [sum(1 for s in per_type[t] if s < k) for t in types],
            pa.int64()),
        "rows_at_risk": pa.array(
            [sum(s for s in per_type[t] if s < k) for t in types],
            pa.int64()),
    })


def k_anonymity_sql(k: int = K_ANON) -> str:
    return f"""
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) // {QI_VALUE_BUCKET}
           AS bucket,
         count(*) AS sz
  FROM events GROUP BY 1, 2, 3)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN sz < {k} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_groups,
       CAST(sum(CASE WHEN sz < {k} THEN sz ELSE 0 END) AS BIGINT)
         AS rows_at_risk
FROM g GROUP BY event_type ORDER BY event_type"""


L_DIV = 3


def l_diversity(sf_dir: str, ell: int = L_DIV) -> pa.Table:
    """(hour, n_groups, n_undiverse, rows_at_risk): l-diversity audit —
    the companion privacy gate to ``k_anonymity``: a QI group is unsafe
    not just when it is SMALL but when its SENSITIVE attribute barely
    varies (everyone in the group shares one event_type, so membership
    reveals behaviour). QI = (hour-of-day, $50 value bucket); sensitive
    = event_type; a group fails if it holds fewer than ``ell`` distinct
    sensitive values. Reported per hour so the daily privacy profile is
    visible.

    Distributed shape: distinct (QI, sensitive) triples and QI group
    sizes come from ONE composite groupby each (domain-bounded like
    ``k_anonymity``); the per-hour rollup folds the bounded group
    table. DuckDB hash-matched."""
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def qi(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hour = ((ts.astype("datetime64[us]").astype(np.int64)
                 // 3_600_000_000) % 24).astype(np.int64)
        bucket = _cents(batch["value"].to_numpy(
            zero_copy_only=False)) // QI_VALUE_BUCKET
        return pa.table({"hour": pa.array(hour, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64()),
                         "event_type": batch["event_type"]})

    trip = ds.map_batches(qi, batch_format="pyarrow",
                          zero_copy_batch=True)
    sizes = trip.groupby(["hour", "bucket"]).count().take_all()
    divers = (trip.groupby(["hour", "bucket", "event_type"]).count()
              .map_batches(lambda b: b.select(["hour", "bucket"]),
                           batch_format="pyarrow")
              .groupby(["hour", "bucket"]).count().take_all())
    ndist = {(int(r["hour"]), int(r["bucket"])): int(r["count()"])
             for r in divers}
    per_hour: dict[int, list[tuple[int, int]]] = {}
    for r in sizes:
        h, b = int(r["hour"]), int(r["bucket"])
        per_hour.setdefault(h, []).append((int(r["count()"]),
                                           ndist[(h, b)]))
    hours = sorted(per_hour)
    return pa.table({
        "hour": pa.array(hours, pa.int64()),
        "n_groups": pa.array([len(per_hour[h]) for h in hours],
                             pa.int64()),
        "n_undiverse": pa.array(
            [sum(1 for _, d in per_hour[h] if d < ell) for h in hours],
            pa.int64()),
        "rows_at_risk": pa.array(
            [sum(s for s, d in per_hour[h] if d < ell) for h in hours],
            pa.int64()),
    })


def l_diversity_sql(ell: int = L_DIV) -> str:
    return f"""
WITH g AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) // {QI_VALUE_BUCKET}
           AS bucket,
         count(*) AS sz,
         count(DISTINCT event_type) AS ndist
  FROM events GROUP BY 1, 2)
SELECT hour,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN ndist < {ell} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_undiverse,
       CAST(sum(CASE WHEN ndist < {ell} THEN sz ELSE 0 END) AS BIGINT)
         AS rows_at_risk
FROM g GROUP BY hour ORDER BY hour"""


def t_closeness(sf_dir: str) -> pa.Table:
    """(event_type, hour, n, emd_ppm): t-closeness audit — the third
    privacy gate (Li, Li & Venkatasubramanian 2007): a QI group leaks
    even when large and diverse if its SENSITIVE-attribute distribution
    diverges from the table-wide one. QI = (event_type, hour-of-day);
    sensitive = the ordered $50 value bucket; the distance is the
    ordered-domain Earth-Mover's Distance, EMD = Σ|cum_g − cum_all| /
    (m−1) over the m-bucket domain.

    Integer-exact: with group size n_g and table size n the per-bucket
    term is |cum_g(k)·n − cum_all(k)·n_g| (common denominator n_g·n),
    and emd_ppm = 1e6·Σ // (n_g·n·(m−1)) — truncating, so DuckDB
    HUGEINT mirrors it bit-for-bit. (At full 100 TB scale n² exceeds
    int64; the production variant renormalizes per group to 2^30
    fixed-point before the fold — the test contract pins the exact
    rational form.)

    Distributed shape: ONE domain-bounded (QI, bucket) histogram
    groupby; the global histogram, cumulative sums and EMD fold over
    that bounded table on the driver — grid-sized state, never
    row-sized. DuckDB hash-matched."""
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def qi(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hour = ((ts.astype("datetime64[us]").astype(np.int64)
                 // 3_600_000_000) % 24).astype(np.int64)
        bucket = _cents(batch["value"].to_numpy(
            zero_copy_only=False)) // QI_VALUE_BUCKET
        return pa.table({"event_type": batch["event_type"],
                         "hour": pa.array(hour, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})

    hist = (ds.map_batches(qi, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["event_type", "hour", "bucket"]).count()
            .take_all())
    et = np.asarray([str(r["event_type"]) for r in hist], dtype=object)
    hr = np.asarray([int(r["hour"]) for r in hist], np.int64)
    bk = np.asarray([int(r["bucket"]) for r in hist], np.int64)
    sz = np.asarray([int(r["count()"]) for r in hist], np.int64)

    dom = np.unique(bk)
    m = dom.size
    tot = np.zeros(m, np.int64)
    np.add.at(tot, np.searchsorted(dom, bk), sz)
    n = int(sz.sum())
    cum_all = np.cumsum(tot)

    gkey = np.char.add(np.char.add(et.astype(str), "|"),
                       hr.astype(str))
    ug, ginv = np.unique(gkey, return_inverse=True)
    out_t, out_h, out_n, out_e = [], [], [], []
    for gi in np.argsort(ug, kind="stable"):
        rows = np.flatnonzero(ginv == gi)
        hist_g = np.zeros(m, np.int64)
        hist_g[np.searchsorted(dom, bk[rows])] = sz[rows]
        ng = int(hist_g.sum())
        cum_g = np.cumsum(hist_g)
        d = int(np.abs(cum_g.astype(object) * n
                       - cum_all.astype(object) * ng).sum())
        den = ng * n * max(m - 1, 1)
        out_t.append(str(et[rows[0]]))
        out_h.append(int(hr[rows[0]]))
        out_n.append(ng)
        out_e.append(d * 1_000_000 // den)
    order = np.lexsort((np.asarray(out_h), np.asarray(out_t,
                                                      dtype=object)))
    return pa.table({
        "event_type": pa.array(np.asarray(out_t, dtype=object)[order]
                               .tolist(), pa.string()),
        "hour": pa.array(np.asarray(out_h, np.int64)[order],
                         pa.int64()),
        "n": pa.array(np.asarray(out_n, np.int64)[order], pa.int64()),
        "emd_ppm": pa.array(np.asarray(out_e, np.int64)[order],
                            pa.int64()),
    })


def t_closeness_sql() -> str:
    return f"""
WITH h AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) // {QI_VALUE_BUCKET}
           AS bucket,
         CAST(count(*) AS BIGINT) AS sz
  FROM events GROUP BY 1, 2, 3),
dom AS (SELECT DISTINCT bucket FROM h),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM dom),
tot AS (SELECT bucket, CAST(sum(sz) AS BIGINT) AS c
        FROM h GROUP BY 1),
nall AS (SELECT CAST(sum(sz) AS BIGINT) AS n FROM h),
grp AS (SELECT event_type, hour, CAST(sum(sz) AS BIGINT) AS ng
        FROM h GROUP BY 1, 2),
grid AS (
  SELECT g.event_type, g.hour, g.ng, d.bucket,
         coalesce(h.sz, 0) AS sz, t.c
  FROM grp g CROSS JOIN dom d
       JOIN tot t ON t.bucket = d.bucket
       LEFT JOIN h ON h.event_type = g.event_type
                  AND h.hour = g.hour AND h.bucket = d.bucket),
cums AS (
  SELECT event_type, hour, ng, bucket,
         CAST(sum(sz) OVER (PARTITION BY event_type, hour
                            ORDER BY bucket) AS HUGEINT) AS cg,
         CAST(sum(c) OVER (PARTITION BY event_type, hour
                           ORDER BY bucket) AS HUGEINT) AS ca
  FROM grid),
dsum AS (
  SELECT event_type, hour, ng,
         sum(abs(cg * (SELECT n FROM nall) - ca * ng)) AS d
  FROM cums GROUP BY 1, 2, 3)
SELECT event_type, CAST(hour AS BIGINT) AS hour,
       CAST(ng AS BIGINT) AS n,
       CAST(CAST(d AS HUGEINT) * 1000000
            // (CAST(ng AS HUGEINT) * (SELECT n FROM nall)
                * greatest((SELECT m FROM mm) - 1, 1))
            AS BIGINT) AS emd_ppm
FROM dsum ORDER BY event_type, hour"""


# ---------------------------------------------------------------------------
# Benford first-digit profiling — the classic anomaly screen for money
# columns (Benford 1938; Nigrini's audit usage): the distribution of
# leading significant digits of o_totalprice against the log-law
# expectation. Digit extraction happens on the per-row integer CENTS
# (round half-away, the repo money contract), via the decimal string —
# no float log10 at the row level, so no power-of-ten boundary can
# float-flip a digit. Per-block bincount partials -> one 9-row rollup.
# ---------------------------------------------------------------------------

BENFORD_SCALE = 1_000_000


def benford_digits(sf_dir: str) -> pa.Table:
    """(digit, n, observed_ppm, expected_ppm) over orders.o_totalprice."""
    import ray
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        c = _cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        c = c[c > 0]
        # leading digit via the decimal string: exact for integers
        d = c.astype("U20").astype("U1").astype(np.int64)
        return pa.table({
            "digit": pa.array(np.arange(1, 10), pa.int64()),
            "n": pa.array(np.bincount(d, None, 10)[1:].astype(np.int64)),
        })

    parts = pa.concat_tables(
        ray.get(ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    import pyarrow.compute as pc

    gb = parts.group_by("digit").aggregate([("n", "sum")])
    order = pc.sort_indices(gb["digit"])
    dig = pc.take(gb["digit"], order).to_numpy(zero_copy_only=False)
    n = pc.take(gb["n_sum"], order).to_numpy(zero_copy_only=False)
    tot = int(n.sum())
    obs = n * BENFORD_SCALE // max(tot, 1)
    exp = np.floor(np.log10(1.0 + 1.0 / dig.astype(np.float64))
                   * BENFORD_SCALE + 0.5).astype(np.int64)
    keep = n > 0
    return pa.table({
        "digit": pa.array(dig[keep], pa.int64()),
        "n": pa.array(n[keep].astype(np.int64), pa.int64()),
        "observed_ppm": pa.array(obs[keep].astype(np.int64), pa.int64()),
        "expected_ppm": pa.array(exp[keep], pa.int64()),
    })


def benford_digits_sql() -> str:
    return f"""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE round(o_totalprice * 100) > 0),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
SELECT digit, n,
       CAST(n * {BENFORD_SCALE} // t.tot AS BIGINT) AS observed_ppm,
       CAST(floor(log10(1.0 + 1.0 / digit) * {BENFORD_SCALE} + 0.5)
            AS BIGINT) AS expected_ppm
FROM g CROSS JOIN t ORDER BY digit"""


# ---------------------------------------------------------------------------
# Differentially-private release mechanics: sensitivity-1 Laplace counts
# per event_type (Dwork et al. 2006). The MECHANISM is real — exact
# distributed count, Laplace(1/eps) noise via the inverse CDF — but the
# noise here is SEEDED from the category name (FNV-1a -> splitmix mix ->
# uniform), not from a secret key, because the oracle contract requires
# determinism; a production deployment swaps the seed source and keeps
# every other line. Scale shape: per-block type bincounts -> one
# type-bounded rollup -> O(types) driver finish.
# ---------------------------------------------------------------------------

DP_EPS = 1.0
_DP_M64 = float(1 << 64)


def dp_event_counts(sf_dir: str, eps: float = DP_EPS) -> pa.Table:
    """(event_type, n, noisy_milli): exact count plus the seeded-Laplace
    release, quantized to milli-counts."""
    import math

    import ray
    import ray.data as rd

    from .exchange import _mix
    from .textstats import _word_arr_slices, fnv64_slices

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        uk, cnt = np.unique(et, return_counts=True)
        return pa.table({
            "event_type": pa.array(uk.tolist(), pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    parts = pa.concat_tables(
        [t for t in ray.get(ds.map_batches(
            partial, batch_format="pyarrow",
            zero_copy_batch=True).to_arrow_refs()) if t.num_rows],
        promote_options="default")
    gb = parts.group_by("event_type").aggregate([("n", "sum")])
    types = np.asarray(gb["event_type"].to_pylist(), dtype=object)
    order = np.argsort(types, kind="stable")
    types = types[order]
    n = gb["n_sum"].to_numpy(zero_copy_only=False)[order].astype(np.int64)

    h = _mix(fnv64_slices(*_word_arr_slices(types)))
    u = h.astype(np.float64) / _DP_M64
    x = u - 0.5
    noise = (-(1.0 / eps) * np.sign(x)
             * np.log(1.0 - 2.0 * np.abs(x)))
    noisy = n.astype(np.float64) + noise
    nm = np.fromiter(
        (int(math.copysign(math.floor(abs(v) * 1000 + 0.5), v))
         for v in noisy), np.int64, noisy.size)
    return pa.table({
        "event_type": pa.array(types.tolist(), pa.string()),
        "n": pa.array(n, pa.int64()),
        "noisy_milli": pa.array(nm, pa.int64()),
    })


def dp_event_counts_sql(eps: float = DP_EPS) -> str:
    from .sketch import _mix_sql_wide

    m = "18446744073709551616::HUGEINT"          # 2^64
    off = "14695981039346656037::HUGEINT"        # FNV-1a offset basis
    prime = "1099511628211::HUGEINT"             # FNV-1a prime
    fnv = (f"list_reduce(list_prepend({off}, "
           f"[ascii(c)::HUGEINT FOR c IN string_split(event_type, '')]),"
           f" (h, b) -> (xor(h, b) * {prime}) % {m})")
    mixed = _mix_sql_wide(fnv)
    return f"""
WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY event_type),
s AS (SELECT event_type, n,
             CAST({mixed} AS DOUBLE) / {_DP_M64!r} - 0.5 AS x
      FROM g),
r AS (SELECT event_type, n,
             n + (-(1.0 / {eps!r}) * sign(x) * ln(1.0 - 2.0 * abs(x)))
               AS noisy
      FROM s)
SELECT event_type, n,
       CAST(round(noisy * 1000) AS BIGINT) AS noisy_milli
FROM r ORDER BY event_type"""
