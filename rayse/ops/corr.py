"""Grouped Pearson correlation over the events log.

Per event_type, the correlation between the (quantized) event value and
its hour-of-day — the co-moment aggregation every telemetry/EDA
pipeline wants (is the metric diurnal?), in ONE streaming pass.

Exactness contract: everything before the final ratio is integer —
per-batch partials carry (n, Σx, Σy, Σx², Σy², Σxy) per type, one
type-keyed exchange folds them, and the driver (output-sized: one row
per type) forms num = n·Σxy − Σx·Σy, d1 = n·Σx² − (Σx)², d2 = n·Σy² −
(Σy)² in PYTHON ints (unbounded, mirroring DuckDB HUGEINT), then
quantizes with exactly three float ops — float(num) / sqrt(float(d1·d2))
· 1e9, floored — the same op sequence the oracle runs, so the result is
bit-exact.  x uses cents (1e2) rather than the 1e6 micro scale so the
int64 partial sums hold to ~1e12 events per type; beyond that the
partials themselves would need HUGEINT-style splitting (documented
bound, same class as the rollup micro sums).

Reference relationship: extends the A12 stats family to second-moment
statistics.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

X_SCALE = 100               # cents: keeps Σx² in int64 to ~1e12 rows
US_PER_HOUR = 3_600_000_000

_PARTIAL_SCHEMA = pa.schema([
    ("event_type", pa.string()), ("thash", pa.uint64()),
    ("n", pa.int64()), ("sx", pa.int64()), ("sy", pa.int64()),
    ("sxx", pa.int64()), ("syy", pa.int64()), ("sxy", pa.int64()),
])


def _corr_partial_batch(batch: pa.Table) -> pa.Table:
    """events batch -> one co-moment partial row per event_type."""
    import pyarrow.compute as pc

    from .textstats import _word_arr_slices, fnv64_slices

    if batch.num_rows == 0:
        return pa.table({n: [] for n in _PARTIAL_SCHEMA.names},
                        schema=_PARTIAL_SCHEMA)
    etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    x = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                 * float(X_SCALE)).astype(np.int64)
    y = (ts // US_PER_HOUR) % 24
    th = fnv64_slices(*_word_arr_slices(etype))
    order = np.argsort(th, kind="stable")
    t_s, e_s, x_s, y_s = th[order], etype[order], x[order], y[order]
    new = np.empty(t_s.size, dtype=bool)
    new[0] = True
    new[1:] = t_s[1:] != t_s[:-1]
    starts = np.flatnonzero(new)

    def seg_sum(v: np.ndarray) -> np.ndarray:
        return np.add.reduceat(v, starts)

    return pa.table({
        "event_type": pa.array(e_s[new].tolist(), pa.string()),
        "thash": pa.array(t_s[new], pa.uint64()),
        "n": pa.array(np.diff(np.append(starts, t_s.size))
                      .astype(np.int64), pa.int64()),
        "sx": pa.array(seg_sum(x_s), pa.int64()),
        "sy": pa.array(seg_sum(y_s), pa.int64()),
        "sxx": pa.array(seg_sum(x_s * x_s), pa.int64()),
        "syy": pa.array(seg_sum(y_s * y_s), pa.int64()),
        "sxy": pa.array(seg_sum(x_s * y_s), pa.int64()),
    })


def _corr_fold_partition(tbl: pa.Table) -> pa.Table:
    """Fold this partition's per-type partials (string-keyed grouping;
    the hash only routes)."""
    if tbl.num_rows == 0:
        return pa.table({n: [] for n in _PARTIAL_SCHEMA.names},
                        schema=_PARTIAL_SCHEMA)
    etype = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    order = np.argsort(etype, kind="stable")
    cols = {c: tbl[c].to_numpy(zero_copy_only=False)[order]
            for c in ("thash", "n", "sx", "sy", "sxx", "syy", "sxy")}
    e_s = etype[order]
    new = np.empty(e_s.size, dtype=bool)
    new[0] = True
    new[1:] = e_s[1:] != e_s[:-1]
    starts = np.flatnonzero(new)
    out = {"event_type": pa.array(e_s[new].tolist(), pa.string()),
           "thash": pa.array(cols["thash"][new], pa.uint64())}
    for c in ("n", "sx", "sy", "sxx", "syy", "sxy"):
        out[c] = pa.array(np.add.reduceat(cols[c], starts), pa.int64())
    return pa.table(out)


def corr_value_hour(sf_dir: str) -> pa.Table:
    """(event_type, r_q): Pearson correlation of (value cents,
    hour-of-day) per type, quantized at 1e9."""
    import math

    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    partials = ds.map_batches(_corr_partial_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    folded = exchange_by_key(partials, "thash", _corr_fold_partition)
    rows = pa.concat_tables(
        [t for t in ray.get(folded.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    out_t, out_r = [], []
    for i in range(rows.num_rows):
        n = rows["n"][i].as_py()
        sx, sy = rows["sx"][i].as_py(), rows["sy"][i].as_py()
        sxx, syy = rows["sxx"][i].as_py(), rows["syy"][i].as_py()
        sxy = rows["sxy"][i].as_py()
        num = n * sxy - sx * sy                       # python ints: exact
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        if d1 == 0 or d2 == 0:
            continue
        r_q = math.floor(float(num) / math.sqrt(float(d1 * d2)) * 1e9)
        out_t.append(rows["event_type"][i].as_py())
        out_r.append(r_q)
    order = np.argsort(np.asarray(out_t, dtype=object), kind="stable")
    return pa.table({
        "event_type": pa.array(
            np.asarray(out_t, dtype=object)[order].tolist(), pa.string()),
        "r_q": pa.array(np.asarray(out_r, np.int64)[order], pa.int64()),
    })


CORR_VALUE_HOUR_SQL = f"""
WITH v AS (
  SELECT event_type,
         CAST(floor(value * CAST({X_SCALE} AS DOUBLE)) AS BIGINT) AS x,
         (epoch_us(ts) // {US_PER_HOUR}) % 24 AS y
  FROM events),
s AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(y * y) AS HUGEINT) AS syy,
         CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM v GROUP BY event_type)
SELECT event_type,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST((n * sxx - sx * sx)
                              * (n * syy - sy * sy) AS DOUBLE))
                  * 1000000000::DOUBLE) AS BIGINT) AS r_q
FROM s
WHERE n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0"""


# ---------------------------------------------------------------------------
# Row-level z-score standardization — the outlier-flagging / feature-
# normalization primitive: z = (x - mean)/sd per event_type, computed
# as the algebraically-cancelled (n·x − Σx) / sqrt(n·Σx² − (Σx)²) so
# the numerator stays int64 row-local and the denominator is ONE
# python-int → float sqrt per TYPE (broadcast back to rows — the
# classic two-pass aggregate-then-standardize shape).
# ---------------------------------------------------------------------------

Z_SCALE = 1_000_000_000


def value_zscores(sf_dir: str):
    """(event_id, z_q): quantized z-score of the event's value (cents)
    within its event_type."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds0 = rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["event_type", "ts", "value"])
    partials = ds0.map_batches(_corr_partial_batch,
                               batch_format="pyarrow",
                               zero_copy_batch=True)
    folded = exchange_by_key(partials, "thash", _corr_fold_partition)
    rows = pa.concat_tables(
        [t for t in ray.get(folded.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    stats = {}
    for i in range(rows.num_rows):
        n = rows["n"][i].as_py()
        sx = rows["sx"][i].as_py()
        sxx = rows["sxx"][i].as_py()
        d = n * sxx - sx * sx                  # python ints: exact
        if d <= 0:
            continue
        stats[rows["event_type"][i].as_py()] = (
            n, sx, float(d) ** 0.5)
    ref = ray.put(stats)

    def z_batch(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "z_q": pa.array([], pa.int64())})
        etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        x = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * float(X_SCALE)).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(etype, return_inverse=True)
        # per-UNIQUE-type lookups (types per batch are few; rows are not)
        n_u = np.asarray([st[t][0] if t in st else 0
                          for t in u.tolist()], np.int64)
        sx_u = np.asarray([st[t][1] if t in st else 0
                           for t in u.tolist()], np.int64)
        sd_u = np.asarray([st[t][2] if t in st else 1.0
                           for t in u.tolist()], np.float64)
        keep = (n_u > 0)[inv]
        num = n_u[inv] * x - sx_u[inv]
        z = np.floor(num.astype(np.float64) / sd_u[inv]
                     * float(Z_SCALE)).astype(np.int64)
        return pa.table({
            "event_id": pa.array(eid[keep], pa.int64()),
            "z_q": pa.array(z[keep], pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    return ds.map_batches(z_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


VALUE_ZSCORES_SQL = f"""
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * CAST({X_SCALE} AS DOUBLE)) AS BIGINT) AS x
  FROM events),
s AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(x * x) AS HUGEINT) AS sxx
  FROM v GROUP BY event_type)
SELECT v.event_id,
       CAST(floor(CAST(s.n * v.x - s.sx AS DOUBLE)
                  / sqrt(CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE))
                  * {Z_SCALE}::DOUBLE) AS BIGINT) AS z_q
FROM v JOIN s USING (event_type)
WHERE s.n * s.sxx - s.sx * s.sx > 0"""


# ---------------------------------------------------------------------------
# Grouped OLS regression — value (cents) on hour-of-day per event_type:
# slope and intercept are single exact rationals over the SAME integer
# co-moments as the correlation (slope = (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²),
# intercept = (Σy·Σx² − Σx·Σxy)/(n·Σx² − (Σx)²) with x = hour,
# y = value cents), each quantized with one float division.
# ---------------------------------------------------------------------------

def regress_value_on_hour(sf_dir: str) -> pa.Table:
    """(event_type, slope_q, icept_q) at 1e9 scale."""
    import math

    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    partials = ds.map_batches(_corr_partial_batch, batch_format="pyarrow",
                              zero_copy_batch=True)
    folded = exchange_by_key(partials, "thash", _corr_fold_partition)
    rows = pa.concat_tables(
        [t for t in ray.get(folded.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    out_t, out_s, out_i = [], [], []
    for i in range(rows.num_rows):
        n = rows["n"][i].as_py()
        # x = hour (sy-family columns), y = value (sx-family columns)
        sx_h, sy_v = rows["sy"][i].as_py(), rows["sx"][i].as_py()
        sxx_h = rows["syy"][i].as_py()
        sxy = rows["sxy"][i].as_py()
        den = n * sxx_h - sx_h * sx_h
        if den == 0:
            continue
        num_s = n * sxy - sx_h * sy_v
        num_i = sy_v * sxx_h - sx_h * sxy
        out_t.append(rows["event_type"][i].as_py())
        out_s.append(math.floor(float(num_s) / float(den) * 1e9))
        out_i.append(math.floor(float(num_i) / float(den) * 1e9))
    order = np.argsort(np.asarray(out_t, dtype=object), kind="stable")
    return pa.table({
        "event_type": pa.array(
            np.asarray(out_t, dtype=object)[order].tolist(), pa.string()),
        "slope_q": pa.array(np.asarray(out_s, np.int64)[order],
                            pa.int64()),
        "icept_q": pa.array(np.asarray(out_i, np.int64)[order],
                            pa.int64()),
    })


REGRESS_VALUE_ON_HOUR_SQL = f"""
WITH v AS (
  SELECT event_type,
         CAST(floor(value * CAST({X_SCALE} AS DOUBLE)) AS BIGINT) AS y,
         (epoch_us(ts) // {US_PER_HOUR}) % 24 AS x
  FROM events),
s AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * x) AS HUGEINT) AS sxx,
         CAST(sum(x * y) AS HUGEINT) AS sxy
  FROM v GROUP BY event_type)
SELECT event_type,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)
                  * 1000000000::DOUBLE) AS BIGINT) AS slope_q,
       CAST(floor(CAST(sy * sxx - sx * sxy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE)
                  * 1000000000::DOUBLE) AS BIGINT) AS icept_q
FROM s WHERE n * sxx - sx * sx <> 0"""


# ---------------------------------------------------------------------------
# Robust trend statistics over the hourly profile — Theil-Sen slope
# (Theil 1950 / Sen 1968) and the Mann-Kendall S test (Mann 1945;
# Kendall 1975), both over the 24 hourly mean values of the events log.
# The scale story is the whole point: 100 TB of events fold to 24
# (hour, n, Σcents) partials per block, merged by one bounded rollup;
# the robust statistics run driver-side on that 24-point profile in
# O(1). Exactness: hourly means are ONE float division each on exact
# int64 (identical both sides); pair slopes / sign comparisons are then
# identical doubles; the median is the LOWER order statistic (pure
# selection — no interpolation, so no a+(b-a)/2 vs (a+b)/2 ulp split);
# quantization is sign-aware half-away (DuckDB round parity).
# ---------------------------------------------------------------------------

TS_SCALE = 1_000_000


def _hourly_means(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(hours, means): the bounded rollup — per-block (hour, n, Σcents)
    partials, one concat, one bincount fold, one division per hour."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = pc.cast(batch["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        x = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * float(X_SCALE)).astype(np.int64)
        h = ((ts // US_PER_HOUR) % 24).astype(np.int64)
        return pa.table({
            "h": pa.array(np.arange(24), pa.int64()),
            "n": pa.array(np.bincount(h, None, 24).astype(np.int64)),
            "s": pa.array(np.bincount(h, x, 24).astype(np.int64)),
        })

    parts = pa.concat_tables(
        ray.get(ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_arrow_refs()),
        promote_options="default")
    h = parts["h"].to_numpy(zero_copy_only=False)
    n = np.bincount(h, parts["n"].to_numpy(zero_copy_only=False), 24)
    s = np.bincount(h, parts["s"].to_numpy(zero_copy_only=False), 24)
    keep = n > 0
    hours = np.flatnonzero(keep).astype(np.float64)
    means = s[keep].astype(np.float64) / n[keep]
    return hours, means


def _round_q(x: float, scale: int = TS_SCALE) -> int:
    """Sign-aware half-away integer quantization (DuckDB round)."""
    import math

    return int(math.copysign(math.floor(abs(x) * scale + 0.5), x))


def _median_lo(v: np.ndarray) -> float:
    """Lower median: pure order-statistic selection, no interpolation."""
    return float(np.sort(v, kind="stable")[(v.size - 1) // 2])


def theil_sen_hourly(sf_dir: str) -> pa.Table:
    """One row (n_hours, n_pairs, slope_q, intercept_q): Theil-Sen
    robust line over the (hour, mean value-cents) profile."""
    hours, means = _hourly_means(sf_dir)
    i, j = np.triu_indices(hours.size, k=1)
    slopes = (means[j] - means[i]) / (hours[j] - hours[i])
    slope = _median_lo(slopes)
    intercept = _median_lo(means - slope * hours)
    return pa.table({
        "n_hours": pa.array([hours.size], pa.int64()),
        "n_pairs": pa.array([slopes.size], pa.int64()),
        "slope_q": pa.array([_round_q(slope)], pa.int64()),
        "intercept_q": pa.array([_round_q(intercept)], pa.int64()),
    })


def theil_sen_hourly_sql() -> str:
    means = f"""
v AS (SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS h,
             CAST(floor(value * CAST({X_SCALE} AS DOUBLE)) AS BIGINT)
               AS xq
      FROM events),
m AS (SELECT h, CAST(sum(xq) AS DOUBLE) / count(*) AS mv
      FROM v GROUP BY h)"""
    return f"""
WITH {means},
sl AS (SELECT (b.mv - a.mv) / (b.h - a.h) AS slope
       FROM m a JOIN m b ON b.h > a.h),
slr AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
               count(*) OVER () AS cnt FROM sl),
med AS (SELECT slope FROM slr WHERE rn = (cnt + 1) // 2),
res AS (SELECT m.mv - (SELECT slope FROM med) * m.h AS r FROM m),
rr AS (SELECT r, row_number() OVER (ORDER BY r) AS rn,
              count(*) OVER () AS cnt FROM res),
imed AS (SELECT r FROM rr WHERE rn = (cnt + 1) // 2)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_hours,
       (SELECT CAST(count(*) AS BIGINT) FROM sl) AS n_pairs,
       CAST(round((SELECT slope FROM med) * {TS_SCALE}) AS BIGINT)
         AS slope_q,
       CAST(round((SELECT r FROM imed) * {TS_SCALE}) AS BIGINT)
         AS intercept_q"""


def mann_kendall_hourly(sf_dir: str) -> pa.Table:
    """One row (n_points, s_stat, n_tie_groups, z_q): the Mann-Kendall
    monotone-trend test over the hourly mean profile (tie-corrected
    variance, continuity-corrected z, quantized 1e6)."""
    import math

    hours, means = _hourly_means(sf_dir)
    n = hours.size
    i, j = np.triu_indices(n, k=1)
    d = means[j] - means[i]
    s_stat = int((d > 0).sum()) - int((d < 0).sum())
    _, tcnt = np.unique(means, return_counts=True)
    ties = tcnt[tcnt > 1]
    var_num = (n * (n - 1) * (2 * n + 5)
               - int(np.sum(ties * (ties - 1) * (2 * ties + 5))))
    var = float(var_num) / 18.0
    if s_stat > 0:
        z = (s_stat - 1) / math.sqrt(var)
    elif s_stat < 0:
        z = (s_stat + 1) / math.sqrt(var)
    else:
        z = 0.0
    return pa.table({
        "n_points": pa.array([n], pa.int64()),
        "s_stat": pa.array([s_stat], pa.int64()),
        "n_tie_groups": pa.array([int(ties.size)], pa.int64()),
        "z_q": pa.array([_round_q(z)], pa.int64()),
    })


def mann_kendall_hourly_sql() -> str:
    means = f"""
v AS (SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS h,
             CAST(floor(value * CAST({X_SCALE} AS DOUBLE)) AS BIGINT)
               AS xq
      FROM events),
m AS (SELECT h, CAST(sum(xq) AS DOUBLE) / count(*) AS mv
      FROM v GROUP BY h)"""
    return f"""
WITH {means},
s AS (SELECT CAST(sum(CASE WHEN b.mv > a.mv THEN 1
                           WHEN b.mv < a.mv THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM m a JOIN m b ON b.h > a.h),
np_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
tg AS (SELECT count(*) AS t FROM m GROUP BY mv HAVING count(*) > 1),
tsum AS (SELECT COALESCE(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT),
                         0) AS ts_,
                CAST(count(*) AS BIGINT) AS ng FROM tg),
vr AS (SELECT CAST(np_.n * (np_.n - 1) * (2 * np_.n + 5) - tsum.ts_
              AS DOUBLE) / 18.0 AS var
       FROM np_ CROSS JOIN tsum)
SELECT np_.n AS n_points, s.s_stat, tsum.ng AS n_tie_groups,
       CAST(round(CASE WHEN s.s_stat > 0
                       THEN (s.s_stat - 1) / sqrt(vr.var)
                       WHEN s.s_stat < 0
                       THEN (s.s_stat + 1) / sqrt(vr.var)
                       ELSE 0.0 END * {TS_SCALE}) AS BIGINT) AS z_q
FROM np_ CROSS JOIN s CROSS JOIN tsum CROSS JOIN vr"""
