"""Exact population covariance matrix over lineitem's numeric columns
— the multivariate-moments member of the statistics family (corr.py
holds one pair; this is the full symmetric matrix in one pass).

Per-column integer quantization (qty x100, price cents, discount and
tax x10000, the standing half-away-from-zero `_cents` contract), then
ONE streaming pass emits per-batch moment partials (n, sum_a, sum_b,
sum_ab per ordered column pair). int64 is safe per batch (price-cents
squared x batch rows < 2^63) but NOT per corpus, so partials fold on
the driver in Python bigints (blocks x 10 pair rows — bounded), and
the final covariance quantizes through truncating division with DuckDB
`//` parity. The oracle sums in HUGEINT.

Reference relationship: none; pins the moment-partial machinery the
single-pair `corr_value_hour` uses, generalized to the pair matrix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

COV_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
COV_SCALES = (100.0, 100.0, 10000.0, 10000.0)


def _trunc_div_int(a: int, d: int) -> int:
    return -((-a) // d) if a < 0 else a // d


def _cov_partial_batch(batch: pa.Table) -> pa.Table:
    from .relational import _cents

    mats = [_cents(batch[c].to_numpy(zero_copy_only=False), s)
            for c, s in zip(COV_COLS, COV_SCALES)]
    n = batch.num_rows
    ia, ib, sa, sb, sab = [], [], [], [], []
    sums = [int(m.sum()) for m in mats]
    for a in range(len(COV_COLS)):
        for b in range(a, len(COV_COLS)):
            ia.append(a)
            ib.append(b)
            sa.append(sums[a])
            sb.append(sums[b])
            sab.append(int((mats[a] * mats[b]).sum()))
    return pa.table({
        "ia": pa.array(ia, pa.int64()),
        "ib": pa.array(ib, pa.int64()),
        "n": pa.array([n] * len(ia), pa.int64()),
        "sa": pa.array(sa, pa.int64()),
        "sb": pa.array(sb, pa.int64()),
        "sab": pa.array(sab, pa.int64()),
    })


def cov_matrix(sf_dir: str) -> pa.Table:
    """(col_a, col_b, n, cov_milli): exact population covariance (in
    milli of the quantized units) for every ordered pair of lineitem
    numeric columns — DuckDB hash-matched against the HUGEINT moment
    oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=list(COV_COLS))
    parts = ds.map_batches(_cov_partial_batch, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    ia = tbl["ia"].to_numpy(zero_copy_only=False)
    ib = tbl["ib"].to_numpy(zero_copy_only=False)
    nn = tbl["n"].to_numpy(zero_copy_only=False)
    sa = tbl["sa"].to_numpy(zero_copy_only=False)
    sb = tbl["sb"].to_numpy(zero_copy_only=False)
    sab = tbl["sab"].to_numpy(zero_copy_only=False)

    out_a, out_b, out_n, out_c = [], [], [], []
    for a in range(len(COV_COLS)):
        for b in range(a, len(COV_COLS)):
            m = (ia == a) & (ib == b)
            n = int(nn[m].sum())
            s1 = sum(int(v) for v in sa[m])
            s2 = sum(int(v) for v in sb[m])
            s12 = sum(int(v) for v in sab[m])
            cov = _trunc_div_int((n * s12 - s1 * s2) * 1000, n * n)
            out_a.append(COV_COLS[a])
            out_b.append(COV_COLS[b])
            out_n.append(n)
            out_c.append(cov)
    return pa.table({
        "col_a": pa.array(out_a, pa.string()),
        "col_b": pa.array(out_b, pa.string()),
        "n": pa.array(out_n, pa.int64()),
        "cov_milli": pa.array(out_c, pa.int64()),
    })


def cov_matrix_sql() -> str:
    qcols = {
        c: f"CAST(round({c} * {int(s)}) AS HUGEINT)"
        for c, s in zip(COV_COLS, COV_SCALES)}
    arms = []
    for a in range(len(COV_COLS)):
        for b in range(a, len(COV_COLS)):
            ca, cb = COV_COLS[a], COV_COLS[b]
            arms.append(f"""
SELECT '{ca}' AS col_a, '{cb}' AS col_b,
       CAST(count(*) AS BIGINT) AS n,
       CAST((count(*) * sum(qa * qb) - sum(qa) * sum(qb)) * 1000
            // (CAST(count(*) AS HUGEINT) * count(*)) AS BIGINT)
         AS cov_milli
FROM (SELECT {qcols[ca]} AS qa, {qcols[cb]} AS qb FROM lineitem)""")
    return "\nUNION ALL\n".join(arms)
