"""Dataset profiling — the per-column data-quality summary every
ingestion pipeline runs before training: row count, null count, exact
distinct count, and min/max for each profiled column of the events
log, in long form (col, metric, v) with every value an int64.

Scale shape: per-batch partials carry (col, metric, v) rows — counts
sum, min/max fold by min/max, and distincts go through a per-column
value-keyed exchange (each column's distinct-value stream dedups
partition-locally, counts fold output-sized).  Timestamps profile as
epoch-micros; string columns profile n/nulls/distinct (no min/max —
the contract stays integer).

Oracle: one UNION ALL arm per (column, metric) in plain SQL.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# (column, kind): kind "int" profiles min/max too
PROFILE_COLS = (("event_id", "int"), ("ts", "ts"), ("user_id", "int"),
                ("event_type", "str"), ("value", "vq"))
_VQ_SCALE = 1_000_000


def _col_as_int64(batch: pa.Table, col: str, kind: str):
    a = batch[col]
    if kind == "ts":
        return pc.cast(a, pa.int64())
    if kind == "vq":
        f = a.to_numpy(zero_copy_only=False)
        return pa.array(np.floor(f * float(_VQ_SCALE)).astype(np.int64),
                        pa.int64())
    if kind == "int":
        return pc.cast(a, pa.int64())
    return a          # str: counted, hashed for distinct


def profile_events(sf_dir: str) -> pa.Table:
    """(col, metric, v) long-form profile of the events table."""
    import ray.data as rd

    from .exchange import exchange_by_key
    from .textstats import _word_arr_slices, fnv64_slices

    cols = [c for c, _ in PROFILE_COLS]
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols)

    def partials(batch: pa.Table) -> pa.Table:
        out_c, out_m, out_v = [], [], []
        for col, kind in PROFILE_COLS:
            arr = batch[col]
            n = len(arr)
            nulls = arr.null_count
            out_c += [col, col]
            out_m += ["n", "n_null"]
            out_v += [n, nulls]
            if kind != "str" and n > nulls:
                iv = _col_as_int64(batch, col, kind)
                vals = iv.to_numpy(zero_copy_only=False)
                out_c += [col, col]
                out_m += ["min", "max"]
                out_v += [int(vals.min()), int(vals.max())]
        return pa.table({"col": pa.array(out_c, pa.string()),
                         "metric": pa.array(out_m, pa.string()),
                         "v": pa.array(out_v, pa.int64())})

    base = ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    out = {"col": [], "metric": [], "v": []}
    for (col, metric), g in base.groupby(["col", "metric"]):
        if metric in ("n", "n_null"):
            v = int(g["v"].sum())
        elif metric == "min":
            v = int(g["v"].min())
        else:
            v = int(g["v"].max())
        out["col"].append(col)
        out["metric"].append(metric)
        out["v"].append(v)

    # exact distinct per column: value-keyed exchange dedup
    def dvals(batch: pa.Table) -> pa.Table:
        out_c, out_h = [], []
        for col, kind in PROFILE_COLS:
            if kind == "str":
                w = np.asarray(batch[col].to_pylist(), dtype=object)
                h64 = (fnv64_slices(*_word_arr_slices(w)) if w.size
                       else np.asarray([], dtype=np.uint64))
                # 62-bit mask keeps the key int64; ok for distinct
                # COUNTING as long as the column's cardinality stays far
                # below birthday-collision range (exact for enum-like
                # string columns; a full-width path would carry the raw
                # strings through the exchange instead)
                h = (h64 & np.uint64((1 << 62) - 1)).astype(np.int64)
            else:
                iv = _col_as_int64(batch, col, kind)
                h = iv.to_numpy(zero_copy_only=False)
            u = np.unique(h)
            out_c.append(np.full(u.size, col, dtype=object))
            out_h.append(u)
        cc = np.concatenate(out_c)
        ch = (fnv64_slices(*_word_arr_slices(cc))
              & np.uint64((1 << 62) - 1)).astype(np.int64)
        return pa.table({
            "col": pa.array(cc.tolist(), pa.string()),
            "chash": pa.array(ch, pa.int64()),
            "h": pa.array(np.concatenate(out_h), pa.int64())})

    def count_part(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"col": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        c = np.asarray(tbl["col"].to_pylist(), dtype=object)
        h = tbl["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, c))
        c, h = c[order], h[order]
        new = np.empty(c.size, dtype=bool)
        new[0] = True
        new[1:] = (c[1:] != c[:-1]) | (h[1:] != h[:-1])
        c = c[new]
        cnew = np.empty(c.size, dtype=bool)
        cnew[0] = True
        cnew[1:] = c[1:] != c[:-1]
        starts = np.flatnonzero(cnew)
        counts = np.diff(np.append(starts, c.size))
        return pa.table({"col": pa.array(c[cnew].tolist(), pa.string()),
                         "c": pa.array(counts.astype(np.int64),
                                       pa.int64())})

    dd = ds.map_batches(dvals, batch_format="pyarrow",
                        zero_copy_batch=True)
    folded = exchange_by_key(dd, ["chash", "h"], count_part)
    dist = folded.groupby("col").sum("c").to_pandas()
    for _, r in dist.iterrows():
        out["col"].append(r["col"])
        out["metric"].append("n_distinct")
        out["v"].append(int(r["sum(c)"]))
    order = np.lexsort((np.asarray(out["metric"], dtype=object),
                        np.asarray(out["col"], dtype=object)))
    return pa.table({
        "col": pa.array(np.asarray(out["col"], dtype=object)[
            order].tolist(), pa.string()),
        "metric": pa.array(np.asarray(out["metric"], dtype=object)[
            order].tolist(), pa.string()),
        "v": pa.array(np.asarray(out["v"], dtype=np.int64)[order],
                      pa.int64()),
    })


def profile_events_sql() -> str:
    arms = []
    for col, kind in PROFILE_COLS:
        if kind == "ts":
            expr = "epoch_us(ts)"
        elif kind == "vq":
            expr = (f"CAST(floor(value * CAST({_VQ_SCALE} AS DOUBLE)) "
                    "AS BIGINT)")
        else:
            expr = col
        arms.append(f"SELECT '{col}' AS col, 'n' AS metric, "
                    f"CAST(count(*) AS BIGINT) AS v FROM events")
        arms.append(f"SELECT '{col}', 'n_null', "
                    f"CAST(count(*) - count({col}) AS BIGINT) "
                    "FROM events")
        dexpr = col if kind == "str" else expr
        arms.append(f"SELECT '{col}', 'n_distinct', "
                    f"CAST(count(DISTINCT {dexpr}) AS BIGINT) "
                    "FROM events")
        if kind != "str":
            arms.append(f"SELECT '{col}', 'min', "
                        f"CAST(min({expr}) AS BIGINT) FROM events")
            arms.append(f"SELECT '{col}', 'max', "
                        f"CAST(max({expr}) AS BIGINT) FROM events")
    return "\nUNION ALL\n".join(arms)
