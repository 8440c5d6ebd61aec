"""Quantile normalization across sources — the cross-distribution
rank-mapping transform (Bolstad et al. 2003, the microarray standard;
in data-pipeline terms: make every source's feature distribution
comparable before mixing): a value v from source s maps to the GLOBAL
value at the same relative CDF position.

Exact integer contract: with per-source cumulative count cum_s(v) and
global cumulative cum_g(·), the normalized value is the smallest
global value g with cum_g(g)·n_s ≥ cum_s(v)·n_global — pure
cross-multiplication, no division, so ties and knife-edges are
impossible and DuckDB mirrors it bit-for-bit with a windowed-CDF
anti-monotone join.

Distributed shape: ONE (source, n_chars) histogram fold (domain- and
source-bounded); CDFs and the rank map fold that bounded table
driver-side. At 100 TB the histogram is identical — only the partials
see more rows (the `stump.py` idiom).

Reference relationship: none (feature-prep family, next to
`source_mix_weights` / `source_kl`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def quantile_normalize(sf_dir: str) -> pa.Table:
    """(source, n_chars, norm_chars, n): per-source rank map of the
    document-length distribution onto the global one — DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        v = batch["n_chars"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        key = np.char.add(np.char.add(src.astype(str), "|"),
                          v.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(uk.tolist(), pa.string()),
            "n": pa.array(np.bincount(inv, None, uk.size)
                          .astype(np.int64), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("key").sum("n"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    keys = tbl["key"].to_pylist()
    n = tbl["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = np.asarray([k.split("|")[0] for k in keys], dtype=object)
    v = np.asarray([int(k.split("|")[1]) for k in keys], np.int64)

    gv = np.unique(v)
    gcnt = np.zeros(gv.size, np.int64)
    np.add.at(gcnt, np.searchsorted(gv, v), n)
    gcum = np.cumsum(gcnt)
    n_global = int(gcum[-1])

    order = np.lexsort((v, src.astype(str)))
    src, v, n = src[order], v[order], n[order]
    out_s, out_v, out_nv, out_n = [], [], [], []
    i = 0
    while i < src.size:
        j = i
        while j < src.size and src[j] == src[i]:
            j += 1
        vs, ns = v[i:j], n[i:j]
        cum_s = np.cumsum(ns)
        n_s = int(cum_s[-1])
        # smallest g with gcum[g]*n_s >= cum_s*n_global
        tgt = np.searchsorted(gcum * n_s, cum_s * n_global, "left")
        for t in range(vs.size):
            out_s.append(str(src[i]))
            out_v.append(int(vs[t]))
            out_nv.append(int(gv[tgt[t]]))
            out_n.append(int(ns[t]))
        i = j
    return pa.table({
        "source": pa.array(out_s, pa.string()),
        "n_chars": pa.array(out_v, pa.int64()),
        "norm_chars": pa.array(out_nv, pa.int64()),
        "n": pa.array(out_n, pa.int64()),
    })


def quantile_normalize_sql() -> str:
    return """
WITH h AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
scdf AS (
  SELECT source, v, n,
         sum(n) OVER (PARTITION BY source ORDER BY v) AS cum,
         sum(n) OVER (PARTITION BY source) AS ntot
  FROM h),
g AS (SELECT v, CAST(sum(n) AS BIGINT) AS n FROM h GROUP BY v),
gcdf AS (
  SELECT v, sum(n) OVER (ORDER BY v) AS cum,
         sum(n) OVER () AS ntot
  FROM g)
SELECT s.source, s.v AS n_chars,
       CAST(min(gc.v) AS BIGINT) AS norm_chars,
       s.n
FROM scdf s JOIN gcdf gc
  ON gc.cum * s.ntot >= s.cum * gc.ntot
GROUP BY s.source, s.v, s.n
ORDER BY s.source, s.v"""
