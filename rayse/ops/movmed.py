"""Moving MEDIAN over a trailing ROWS frame — the order-statistic
window aggregate (`rowframe.moving_sum_rows` pins the sum combiner;
medians don't decompose into partials, which is exactly why the cell
exists: the correct distributed shape is a grid fold first, THEN the
frame walk over the bounded grid — never a row-level window shuffle).

`moving_median_daily`: daily revenue per event type (one bounded
(type, day) fold of cents partials), then per type the doubled median
med2 = s[(n+1)//2] + s[⌊n/2⌋+1] (1-based, sorted) of the trailing
up-to-7 observed days — doubling keeps even-count medians integral, so
the DuckDB mirror (windowed list() → list_sort → element picks) is
bit-exact with no float .5s.

`hbos_outliers`: histogram-based outlier scoring (Goldstein & Dengel
2012) — per event the inverse-density sum over two independent feature
histograms ($50 value bucket, hour-of-day):
score = Σ_f N·1e6 // count_f(bucket_f(x)) (the integer-exact monotone
variant of HBOS's log product; documented divergence). Histograms are
domain-bounded folds broadcast back into a row-local second pass; the
report is the top-k by (score DESC, event_id) via per-batch partial
top-k. DuckDB hash-matched.

Reference relationship: none (window/quality-family completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY_US = 86_400_000_000
MED_FRAME = 7
HBOS_K = 20
HBOS_BUCKET = 5000


def moving_median_daily(sf_dir: str) -> pa.Table:
    """(event_type, day, rev_cents, med2_cents): trailing-7-row doubled
    median of daily revenue per type — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        day = (batch["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").view("int64") // DAY_US)
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        key = np.char.add(np.char.add(et.astype(str), "|"),
                          day.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        # integer accumulation (np.add.at on int64, not a float64
        # bincount): per-key cent sums stay exact past 2^53 (ADVICE r4)
        sums = np.zeros(uk.size, dtype=np.int64)
        np.add.at(sums, inv, cents)
        return pa.table({
            "key": pa.array(uk.tolist(), pa.string()),
            "rev": pa.array(sums, pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("key").sum("rev"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    keys = tbl["key"].to_pylist()
    rev = tbl["sum(rev)"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    et = np.asarray([k.split("|")[0] for k in keys], dtype=object)
    day = np.asarray([int(k.split("|")[1]) for k in keys], np.int64)
    order = np.lexsort((day, et.astype(str)))
    et, day, rev = et[order], day[order], rev[order]

    med2 = np.empty(rev.size, np.int64)
    start = 0
    for i in range(rev.size):
        if i > 0 and et[i] != et[i - 1]:
            start = i
        lo = max(start, i - MED_FRAME + 1)
        s = np.sort(rev[lo:i + 1])
        n = s.size
        med2[i] = int(s[(n + 1) // 2 - 1]) + int(s[n // 2])
    return pa.table({
        "event_type": pa.array(et.tolist(), pa.string()),
        "day": pa.array(day, pa.int64()),
        "rev_cents": pa.array(rev, pa.int64()),
        "med2_cents": pa.array(med2, pa.int64()),
    })


def moving_median_daily_sql() -> str:
    return f"""
WITH d AS (
  SELECT event_type,
         epoch_us(ts) // {DAY_US} AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM events GROUP BY 1, 2),
w AS (
  SELECT event_type, day, rev,
         list_sort(list(rev) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN {MED_FRAME - 1} PRECEDING AND CURRENT ROW))
           AS l
  FROM d)
SELECT event_type, CAST(day AS BIGINT) AS day, rev AS rev_cents,
       CAST(l[(len(l) + 1) // 2] + l[len(l) // 2 + 1] AS BIGINT)
         AS med2_cents
FROM w ORDER BY event_type, day"""


def hbos_outliers(sf_dir: str, k: int = HBOS_K) -> pa.Table:
    """(event_id, score_ppm): top-``k`` histogram-based outliers by
    integer inverse-density sum over (value bucket, hour) — DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "value"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        hr = ((batch["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").view("int64")
               // 3_600_000_000) % 24).astype(np.int64)
        vb = cents // HBOS_BUCKET
        out = []
        for f, arr in ((0, vb), (1, hr)):
            uk, inv = np.unique(arr, return_inverse=True)
            out.append(pa.table({
                "f": pa.array(np.full(uk.size, f), pa.int64()),
                "b": pa.array(uk, pa.int64()),
                "c": pa.array(np.bincount(inv, None, uk.size)
                              .astype(np.int64), pa.int64())}))
        return pa.concat_tables(out)

    hist = (ds.map_batches(hist_partial, batch_format="pyarrow")
            .groupby(["f", "b"]).sum("c").take_all())
    f = np.asarray([r["f"] for r in hist], np.int64)
    b = np.asarray([r["b"] for r in hist], np.int64)
    c = np.asarray([r["sum(c)"] for r in hist], np.int64)
    n_total = int(c[f == 0].sum())
    vb_keys, vb_cnt = b[f == 0], c[f == 0]
    o = np.argsort(vb_keys)
    vb_keys, vb_cnt = vb_keys[o], vb_cnt[o]
    hr_keys, hr_cnt = b[f == 1], c[f == 1]
    o = np.argsort(hr_keys)
    hr_keys, hr_cnt = hr_keys[o], hr_cnt[o]

    import ray as _ray
    h_ref = _ray.put((vb_keys, vb_cnt, hr_keys, hr_cnt, n_total))

    def score_topk(batch: pa.Table) -> pa.Table:
        vbk, vbc, hrk, hrc, n = _ray.get(h_ref)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        hr = ((batch["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").view("int64")
               // 3_600_000_000) % 24).astype(np.int64)
        s = (n * 1_000_000 // vbc[np.searchsorted(
                 vbk, cents // HBOS_BUCKET)]
             + n * 1_000_000 // hrc[np.searchsorted(hrk, hr)])
        top = min(k, eid.size)
        sel = np.lexsort((eid, -s))[:top]
        return pa.table({"event_id": pa.array(eid[sel], pa.int64()),
                         "score_ppm": pa.array(s[sel], pa.int64())})

    parts = pa.concat_tables(
        [t for t in ray.get(
            ds.map_batches(score_topk, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows],
        promote_options="default")
    eid = parts["event_id"].to_numpy(zero_copy_only=False)
    s = parts["score_ppm"].to_numpy(zero_copy_only=False)
    sel = np.lexsort((eid, -s))[:k]
    return pa.table({"event_id": pa.array(eid[sel], pa.int64()),
                     "score_ppm": pa.array(s[sel], pa.int64())})


def hbos_outliers_sql(k: int = HBOS_K) -> str:
    return f"""
WITH x AS (
  SELECT event_id,
         CAST(round(value * 100) AS BIGINT) // {HBOS_BUCKET} AS vb,
         (epoch_us(ts) // 3600000000) % 24 AS hr
  FROM events),
hv AS (SELECT vb, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1),
hh AS (SELECT hr, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x)
SELECT x.event_id,
       CAST((SELECT n FROM n) * 1000000 // hv.c
            + (SELECT n FROM n) * 1000000 // hh.c AS BIGINT)
         AS score_ppm
FROM x JOIN hv USING (vb) JOIN hh USING (hr)
ORDER BY score_ppm DESC, x.event_id
LIMIT {k}"""
