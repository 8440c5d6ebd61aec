"""Grouped exact quantiles over the events log.

Exact per-group discrete quantiles (p50/p90/p99 of the quantized event
value per event_type) without any corpus-order driver state: per-batch
partials reduce each batch to (type, vq, count) histogram rows (bounded
by the batch's distinct values), ONE exchange keyed by the type hash
co-locates a type's histogram, and each partition task folds its types
locally — sort by value, integer cumulative counts, rank pick at
ceil(p*n) — so the driver only ever sees the output-sized answer
(types × quantiles rows).

This is the grouped-quantile sibling of the bounded-domain histogram in
``textstats.token_count_quantiles`` (whose fold is driver-side): the
fold here runs inside the exchange partition, the shape a 100-TB
telemetry percentile job needs.  Ranks are pure-integer
(``(n*num + den - 1) // den`` = ceil(p*n) with non-negative numerators,
so DuckDB's truncating ``//`` agrees), making the oracle bit-exact.

Reference relationship: the reference exposes no percentile surface;
this extends the A12 corpus-stats family (`IndexerService.java` stats
dumps) to distributional summaries.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .rollup import VQ_SCALE

# (numerator, denominator, label): rank = ceil(p * n) in pure integers.
P_SPECS = ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))

_PARTIAL_SCHEMA = pa.schema([
    ("event_type", pa.string()), ("thash", pa.uint64()),
    ("vq", pa.int64()), ("c", pa.int64()),
])


def _quantile_partial_batch(batch: pa.Table) -> pa.Table:
    """events batch -> (type, vq, count) histogram partials."""
    from .textstats import _word_arr_slices, fnv64_slices

    if batch.num_rows == 0:
        return pa.table({n: [] for n in _PARTIAL_SCHEMA.names},
                        schema=_PARTIAL_SCHEMA)
    etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    vq = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                  * float(VQ_SCALE)).astype(np.int64)
    th = fnv64_slices(*_word_arr_slices(etype))
    order = np.lexsort((vq, th))
    t_s, v_s, e_s = th[order], vq[order], etype[order]
    new = np.empty(t_s.size, dtype=bool)
    new[0] = True
    new[1:] = (t_s[1:] != t_s[:-1]) | (v_s[1:] != v_s[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, t_s.size))
    return pa.table({
        "event_type": pa.array(e_s[new].tolist(), pa.string()),
        "thash": pa.array(t_s[new], pa.uint64()),
        "vq": pa.array(v_s[new], pa.int64()),
        "c": pa.array(counts.astype(np.int64), pa.int64()),
    })


def _quantile_partition(tbl: pa.Table) -> pa.Table:
    """All histogram partials of this partition's types -> exact
    discrete quantiles per type.  Grouping is on the STRING type (the
    hash only routes); the loop is over distinct types, never rows."""
    empty = pa.table({
        "event_type": pa.array([], pa.string()),
        "p_label": pa.array([], pa.string()),
        "vq": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    etype = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    vq = tbl["vq"].to_numpy(zero_copy_only=False)
    c = tbl["c"].to_numpy(zero_copy_only=False)
    order = np.lexsort((vq, etype))
    e_s, v_s, c_s = etype[order], vq[order], c[order]
    new = np.empty(e_s.size, dtype=bool)
    new[0] = True
    new[1:] = (e_s[1:] != e_s[:-1]) | (v_s[1:] != v_s[:-1])
    grp = np.cumsum(new) - 1
    n_grp = int(grp[-1]) + 1
    cm = np.zeros(n_grp, np.int64)
    np.add.at(cm, grp, c_s)
    ge, gv = e_s[new], v_s[new]
    tfirst = np.empty(n_grp, dtype=bool)
    tfirst[0] = True
    tfirst[1:] = ge[1:] != ge[:-1]
    tstarts = np.flatnonzero(tfirst)
    tends = np.append(tstarts[1:], n_grp)
    out_e, out_p, out_v = [], [], []
    for s, e in zip(tstarts.tolist(), tends.tolist()):
        cum = np.cumsum(cm[s:e])
        n = int(cum[-1])
        for num, den, label in P_SPECS:
            r = (n * num + den - 1) // den
            out_e.append(ge[s])
            out_p.append(label)
            out_v.append(int(gv[s + int(np.searchsorted(cum, r))]))
    return pa.table({
        "event_type": pa.array(out_e, pa.string()),
        "p_label": pa.array(out_p, pa.string()),
        "vq": pa.array(out_v, pa.int64()),
    })


def event_quantiles(sf_dir: str) -> pa.Table:
    """(event_type, p_label, vq): exact p50/p90/p99 of the quantized
    event value per type, folded inside the exchange partitions."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    partials = ds.map_batches(_quantile_partial_batch,
                              batch_format="pyarrow", zero_copy_batch=True)
    out = exchange_by_key(partials, "thash", _quantile_partition)
    parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not parts:
        return _quantile_partition(pa.table(
            {n: [] for n in _PARTIAL_SCHEMA.names},
            schema=_PARTIAL_SCHEMA))
    return pa.concat_tables(parts, promote_options="default")


def _mad_partition(tbl: pa.Table, k: int) -> pa.Table:
    """Histogram partials of this partition's types -> robust outlier
    summary per type, all from the co-located (vq, count) histogram in
    one pass: median (rank ceil(n/2)), MAD = median of |vq - med| (a
    second rank pick over the re-sorted deviation histogram), and the
    count of values with |vq - med| > k * MAD. Pure integers."""
    empty = pa.table({
        "event_type": pa.array([], pa.string()),
        "med_vq": pa.array([], pa.int64()),
        "mad_vq": pa.array([], pa.int64()),
        "n_out": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    etype = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    vq = tbl["vq"].to_numpy(zero_copy_only=False)
    c = tbl["c"].to_numpy(zero_copy_only=False)
    order = np.lexsort((vq, etype))
    e_s, v_s, c_s = etype[order], vq[order], c[order]
    new = np.empty(e_s.size, dtype=bool)
    new[0] = True
    new[1:] = (e_s[1:] != e_s[:-1]) | (v_s[1:] != v_s[:-1])
    grp = np.cumsum(new) - 1
    n_grp = int(grp[-1]) + 1
    cm = np.zeros(n_grp, np.int64)
    np.add.at(cm, grp, c_s)
    ge, gv = e_s[new], v_s[new]
    tfirst = np.empty(n_grp, dtype=bool)
    tfirst[0] = True
    tfirst[1:] = ge[1:] != ge[:-1]
    tstarts = np.flatnonzero(tfirst)
    tends = np.append(tstarts[1:], n_grp)
    out = {"event_type": [], "med_vq": [], "mad_vq": [],
           "n_out": [], "n": []}
    for s, e in zip(tstarts.tolist(), tends.tolist()):
        vals, cnts = gv[s:e], cm[s:e]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        r = (n + 1) // 2                       # ceil(n/2)
        med = int(vals[int(np.searchsorted(cum, r))])
        dev = np.abs(vals - med)
        do = np.argsort(dev, kind="stable")
        dcum = np.cumsum(cnts[do])
        mad = int(dev[do][int(np.searchsorted(dcum, r))])
        n_out = int(cnts[dev > k * mad].sum())
        out["event_type"].append(ge[s])
        out["med_vq"].append(med)
        out["mad_vq"].append(mad)
        out["n_out"].append(n_out)
        out["n"].append(n)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "med_vq": pa.array(out["med_vq"], pa.int64()),
        "mad_vq": pa.array(out["mad_vq"], pa.int64()),
        "n_out": pa.array(out["n_out"], pa.int64()),
        "n": pa.array(out["n"], pa.int64())})


def _trimmed_partition(tbl: pa.Table, g_num: int, g_den: int) -> pa.Table:
    """Histogram partials -> two-sided trimmed sums per type: drop the
    lowest and highest ``floor(n * g_num/g_den)`` values by rank, emit
    the exact integer sum and count of the middle. Per distinct value,
    kept multiplicity = clamp(min(cum, n-g) - max(cum - c, g), 0) —
    pure-integer interval overlap on the rank line."""
    empty = pa.table({
        "event_type": pa.array([], pa.string()),
        "n_kept": pa.array([], pa.int64()),
        "sum_q": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    etype = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    vq = tbl["vq"].to_numpy(zero_copy_only=False)
    c = tbl["c"].to_numpy(zero_copy_only=False)
    order = np.lexsort((vq, etype))
    e_s, v_s, c_s = etype[order], vq[order], c[order]
    new = np.empty(e_s.size, dtype=bool)
    new[0] = True
    new[1:] = (e_s[1:] != e_s[:-1]) | (v_s[1:] != v_s[:-1])
    grp = np.cumsum(new) - 1
    cm = np.zeros(int(grp[-1]) + 1, np.int64)
    np.add.at(cm, grp, c_s)
    ge, gv = e_s[new], v_s[new]
    tfirst = np.empty(ge.size, dtype=bool)
    tfirst[0] = True
    tfirst[1:] = ge[1:] != ge[:-1]
    tstarts = np.flatnonzero(tfirst)
    tends = np.append(tstarts[1:], ge.size)
    out_e, out_n, out_s = [], [], []
    for s, e in zip(tstarts.tolist(), tends.tolist()):
        cnts, vals = cm[s:e], gv[s:e]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        g = (n * g_num) // g_den
        kept = np.clip(np.minimum(cum, n - g)
                       - np.maximum(cum - cnts, g), 0, None)
        out_e.append(ge[s])
        out_n.append(n - 2 * g)
        out_s.append(int((vals * kept).sum()))
    return pa.table({
        "event_type": pa.array(out_e, pa.string()),
        "n_kept": pa.array(out_n, pa.int64()),
        "sum_q": pa.array(out_s, pa.int64())})


def trimmed_stats(sf_dir: str, g_num: int = 1, g_den: int = 10) -> pa.Table:
    """(event_type, n_kept, sum_q): 10%-two-sided-trimmed sum/count of
    the quantized event value per type — the robust-mean companion of
    `mad_outliers`, folded from the SAME one-histogram-exchange shape
    (a production pass would fuse all three folds into one proc; kept
    separate here for schema clarity — the exchange and partials are
    shared code)."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    partials = ds.map_batches(_quantile_partial_batch,
                              batch_format="pyarrow", zero_copy_batch=True)
    out = exchange_by_key(partials, "thash", _trimmed_partition,
                          proc_kwargs={"g_num": g_num, "g_den": g_den})
    parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not parts:
        return _trimmed_partition(pa.table(
            {n: [] for n in _PARTIAL_SCHEMA.names},
            schema=_PARTIAL_SCHEMA), g_num, g_den)
    return pa.concat_tables(parts, promote_options="default")


def trimmed_stats_sql(g_num: int = 1, g_den: int = 10) -> str:
    """Oracle: identical integer rank-interval overlap over the value
    histogram."""
    return f"""
WITH tr_v AS (
  SELECT event_type,
         CAST(floor(value * CAST({VQ_SCALE} AS DOUBLE)) AS BIGINT) AS vq
  FROM events),
tr_cnt AS (SELECT event_type, vq, CAST(count(*) AS BIGINT) AS c
           FROM tr_v GROUP BY 1, 2),
tr_cum AS (SELECT event_type, vq, c,
                  sum(c) OVER (PARTITION BY event_type ORDER BY vq) AS cum
           FROM tr_cnt),
tr_tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
                  CAST(sum(c) * {g_num} // {g_den} AS BIGINT) AS g
           FROM tr_cnt GROUP BY 1)
SELECT c.event_type,
       CAST(max(t.n - 2 * t.g) AS BIGINT) AS n_kept,
       CAST(sum(c.vq * greatest(least(c.cum, t.n - t.g)
                                - greatest(c.cum - c.c, t.g), 0))
            AS BIGINT) AS sum_q
FROM tr_cum c JOIN tr_tot t ON c.event_type = t.event_type
GROUP BY 1"""


def mad_outliers(sf_dir: str, k: int = 3) -> pa.Table:
    """(event_type, med_vq, mad_vq, n_out, n): robust MAD-based outlier
    accounting of the quantized event value per type — the same ONE
    histogram exchange as `event_quantiles` (median, MAD, and the
    outlier count all fold from the co-located histogram; no second
    scan of the raw events)."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    partials = ds.map_batches(_quantile_partial_batch,
                              batch_format="pyarrow", zero_copy_batch=True)
    out = exchange_by_key(partials, "thash", _mad_partition,
                          proc_kwargs={"k": k})
    parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not parts:
        return _mad_partition(pa.table(
            {n: [] for n in _PARTIAL_SCHEMA.names},
            schema=_PARTIAL_SCHEMA), k)
    return pa.concat_tables(parts, promote_options="default")


def mad_outliers_sql(k: int = 3) -> str:
    """Oracle: the same discrete rank picks (ceil(n/2)) over the value
    and deviation histograms, exact integer comparisons throughout."""
    return f"""
WITH mo_v AS (
  SELECT event_type,
         CAST(floor(value * CAST({VQ_SCALE} AS DOUBLE)) AS BIGINT) AS vq
  FROM events),
mo_cnt AS (SELECT event_type, vq, CAST(count(*) AS BIGINT) AS c
           FROM mo_v GROUP BY 1, 2),
mo_tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
           FROM mo_cnt GROUP BY 1),
mo_cum AS (SELECT event_type, vq,
                  sum(c) OVER (PARTITION BY event_type ORDER BY vq) AS cum
           FROM mo_cnt),
mo_med AS (
  SELECT c.event_type, CAST(min(c.vq) AS BIGINT) AS med
  FROM mo_cum c JOIN mo_tot t ON c.event_type = t.event_type
  WHERE c.cum >= (t.n + 1) // 2
  GROUP BY 1),
mo_dev AS (
  SELECT c.event_type, abs(c.vq - m.med) AS d, c.c, m.med
  FROM mo_cnt c JOIN mo_med m ON c.event_type = m.event_type),
mo_dcnt AS (SELECT event_type, d, CAST(sum(c) AS BIGINT) AS c
            FROM mo_dev GROUP BY 1, 2),
mo_dcum AS (SELECT event_type, d,
                   sum(c) OVER (PARTITION BY event_type ORDER BY d) AS cum
            FROM mo_dcnt),
mo_mad AS (
  SELECT c.event_type, CAST(min(c.d) AS BIGINT) AS mad
  FROM mo_dcum c JOIN mo_tot t ON c.event_type = t.event_type
  WHERE c.cum >= (t.n + 1) // 2
  GROUP BY 1)
SELECT d.event_type,
       CAST(max(d.med) AS BIGINT) AS med_vq,
       CAST(max(a.mad) AS BIGINT) AS mad_vq,
       CAST(coalesce(sum(d.c) FILTER (d.d > {k} * a.mad), 0)
            AS BIGINT) AS n_out,
       CAST(sum(d.c) AS BIGINT) AS n
FROM mo_dev d JOIN mo_mad a ON d.event_type = a.event_type
GROUP BY 1"""


_P_VALUES = ", ".join(f"({num}, {den}, '{lab}')"
                      for num, den, lab in P_SPECS)

EVENT_QUANTILES_SQL = f"""
WITH v AS (
  SELECT event_type,
         CAST(floor(value * CAST({VQ_SCALE} AS DOUBLE)) AS BIGINT) AS vq
  FROM events),
cnt AS (SELECT event_type, vq, CAST(count(*) AS BIGINT) AS c
        FROM v GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
        FROM cnt GROUP BY 1),
cum AS (SELECT event_type, vq,
               sum(c) OVER (PARTITION BY event_type ORDER BY vq) AS cum
        FROM cnt),
p(num, den, lab) AS (VALUES {_P_VALUES}),
tgt AS (SELECT t.event_type, p.lab AS p_label,
               (t.n * p.num + p.den - 1) // p.den AS r
        FROM tot t CROSS JOIN p)
SELECT g.event_type, g.p_label, CAST(min(c.vq) AS BIGINT) AS vq
FROM tgt g JOIN cum c
  ON c.event_type = g.event_type AND c.cum >= g.r
GROUP BY 1, 2"""
