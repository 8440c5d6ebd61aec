"""Split conformal prediction + mutual-kNN graph — two exact ML cells.

`conformal_intervals`: split conformal calibration (Vovk et al.;
Papadopoulos et al. 2002): calibration split = even event_ids, test
split = odd. Nonconformity = |cents − per-type calibration median|
(median = lower order statistic, exact); the conformal quantile is the
⌈(n_cal+1)(1−α)⌉-th smallest calibration score (α = 1/10, exact
integer rank — the finite-sample-coverage rank, not a plug-in
quantile), and the cell reports per type the quantile and the TEST
coverage in ppm. Finite-sample theory guarantees coverage ≥ 1−α in
expectation; the driver pin is bit-exactness, the theory rides as a
pytest assertion on the aggregate. Everything runs off the bounded
(type, cents, split) histogram fold.

`mutual_knn_pairs`: the mutual-k-nearest-neighbour graph over the
embedding table (the graph-construction step of spectral/density
clustering): (a, b) is an edge iff b ∈ kNN(a) AND a ∈ kNN(b) under
integer-quantized L2 with (dist, vec_id) order — kNN per side via the
`knn.py` broadcast partial-top-k path, the mutuality check a driver
set-intersection over the 2·N·k bounded candidate rows at test scale
(at corpus scale: a self-exchange on min(a,b)).

Reference relationship: none (ML-workflow completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ALPHA_DEN = 10           # alpha = 1/10
MKNN_N = 40              # vectors considered (bounded head by vec_id)
MKNN_K = 4


def conformal_intervals(sf_dir: str) -> pa.Table:
    """(event_type, n_cal, n_test, q_cents, covered_ppm) — DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        split = (eid % 2).astype(np.int64)     # 0 = cal, 1 = test
        key = np.char.add(
            np.char.add(np.char.add(et.astype(str), "|"),
                        split.astype(str)),
            np.char.add("|", cents.astype(str)))
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
    et = np.asarray([k.split("|")[0] for k in keys], dtype=object)
    sp = np.asarray([int(k.split("|")[1]) for k in keys], np.int64)
    cents = np.asarray([int(k.split("|")[2]) for k in keys], np.int64)

    out = {"event_type": [], "n_cal": [], "n_test": [],
           "q_cents": [], "covered_ppm": []}
    for t in sorted(set(et.tolist())):
        m = et == t
        mc, mt = m & (sp == 0), m & (sp == 1)
        cc, nc = cents[mc], n[mc]
        ct, nt = cents[mt], n[mt]
        # the oracle's q⋈cov inner joins drop a type missing either
        # split (no calibration rows -> no quantile; no test rows -> no
        # coverage row): mirror that dropping here so both engines agree
        # by construction on degenerate splits (ADVICE r4)
        if int(nc.sum()) == 0 or int(nt.sum()) == 0:
            continue
        o = np.argsort(cc)
        cc, nc = cc[o], nc[o]
        n_cal = int(nc.sum())
        cum = np.cumsum(nc)
        # calibration median: lower order statistic at ceil(n/2)
        med = int(cc[np.searchsorted(cum, (n_cal + 1) // 2)])
        # nonconformity scores |c - med| histogram (cal side)
        s = np.abs(cc - med)
        so = np.argsort(s, kind="stable")
        s_sorted, w_sorted = s[so], nc[so]
        # conformal rank: ceil((n+1)(1-alpha)), alpha = 1/ALPHA_DEN —
        # additive ceil (a + d-1) // d, NOT the negation trick, because
        # DuckDB // truncates toward zero while numpy floors
        rank = ((n_cal + 1) * (ALPHA_DEN - 1) + ALPHA_DEN - 1) \
            // ALPHA_DEN
        rank = min(rank, n_cal)
        scum = np.cumsum(w_sorted)
        q = int(s_sorted[np.searchsorted(scum, rank)])
        n_test = int(nt.sum())
        cov = int(nt[np.abs(ct - med) <= q].sum())
        out["event_type"].append(str(t))
        out["n_cal"].append(n_cal)
        out["n_test"].append(n_test)
        out["q_cents"].append(q)
        out["covered_ppm"].append(cov * 1_000_000 // max(n_test, 1))
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "n_cal": pa.array(out["n_cal"], pa.int64()),
        "n_test": pa.array(out["n_test"], pa.int64()),
        "q_cents": pa.array(out["q_cents"], pa.int64()),
        "covered_ppm": pa.array(out["covered_ppm"], pa.int64()),
    })


def conformal_intervals_sql() -> str:
    return f"""
WITH x AS (
  SELECT event_type AS t, event_id % 2 AS sp,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
med AS (
  SELECT t, c AS med FROM (
    SELECT t, c,
           row_number() OVER (PARTITION BY t ORDER BY c) AS rn,
           count(*) OVER (PARTITION BY t) AS n
    FROM x WHERE sp = 0)
  WHERE rn = (n + 1) // 2),
cal AS (
  SELECT x.t, abs(x.c - med.med) AS s
  FROM x JOIN med ON x.t = med.t WHERE x.sp = 0),
q AS (
  SELECT t, s AS q FROM (
    SELECT t, s, row_number() OVER (PARTITION BY t
                                    ORDER BY s) AS rn,
           count(*) OVER (PARTITION BY t) AS n
    FROM cal)
  WHERE rn = least(((n + 1) * {ALPHA_DEN - 1} + {ALPHA_DEN - 1})
                   // {ALPHA_DEN}, n)),
test AS (
  SELECT x.t, abs(x.c - med.med) AS s
  FROM x JOIN med ON x.t = med.t WHERE x.sp = 1),
cov AS (
  SELECT test.t,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(count(*) FILTER (WHERE test.s <= q.q) AS BIGINT)
           AS n_cov
  FROM test JOIN q ON test.t = q.t GROUP BY test.t),
ncal AS (SELECT t, CAST(count(*) AS BIGINT) AS n_cal FROM cal
         GROUP BY t)
SELECT q.t AS event_type, ncal.n_cal, cov.n_test,
       CAST(q.q AS BIGINT) AS q_cents,
       CAST(cov.n_cov * 1000000 // greatest(cov.n_test, 1)
            AS BIGINT) AS covered_ppm
FROM q JOIN cov ON q.t = cov.t JOIN ncal ON q.t = ncal.t
ORDER BY event_type"""


def mutual_knn_pairs(sf_dir: str, n: int = MKNN_N,
                     k: int = MKNN_K) -> pa.Table:
    """(a, b): mutual-kNN edges (a < b) among the ``n`` smallest
    vec_ids under quantized-L2 (dist, vec_id) order — DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    from .similarity import _ids_from, _km_quantize, _mat_from_list, \
        _rows_for_ids, _smallest_vec_ids

    sel = _smallest_vec_ids(sf_dir, n)
    qt = _rows_for_ids(sf_dir, sel)
    Q = _km_quantize(_mat_from_list(qt["embedding"]))
    q_ids = _ids_from(qt["vec_id"])
    qn = np.einsum("qd,qd->q", Q, Q)
    q_ref = ray.put((q_ids, Q, qn, set(q_ids.tolist())))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qm, qnn, _member = ray.get(q_ref)
        ids = _ids_from(batch["vec_id"])
        keep = np.isin(ids, qids)
        if not keep.any():
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64())})
        ids = ids[keep]
        X = _km_quantize(_mat_from_list(batch["embedding"]))[keep]
        xn = np.einsum("nd,nd->n", X, X)
        d = qnn[:, None] + xn[None, :] - 2 * (qm @ X.T)
        out_a, out_b, out_d = [], [], []
        top = min(k + 1, ids.size)
        for qi in range(qm.shape[0]):
            row = d[qi]
            pick = np.lexsort((ids, row))[:top]
            pick = pick[ids[pick] != qids[qi]][:k]
            out_a.extend([int(qids[qi])] * pick.size)
            out_b.extend(ids[pick].tolist())
            out_d.extend(row[pick].tolist())
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "d": pa.array(out_d, pa.int64())})

    parts = pa.concat_tables(
        [t for t in ray.get(
            ds.map_batches(partial_topk, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows],
        promote_options="default")
    a = parts["a"].to_numpy(zero_copy_only=False)
    b = parts["b"].to_numpy(zero_copy_only=False)
    dd = parts["d"].to_numpy(zero_copy_only=False)
    # fold per a: global top-k among batch partials
    nn: dict[int, set] = {}
    order = np.lexsort((b, dd, a))
    cur, cnt = None, 0
    seen = set()
    for i in order.tolist():
        if a[i] != cur:
            cur, cnt, seen = a[i], 0, set()
        if b[i] in seen:
            continue
        if cnt < k:
            nn.setdefault(int(a[i]), set()).add(int(b[i]))
            seen.add(b[i])
            cnt += 1
    out_a, out_b = [], []
    for u in sorted(nn):
        for v in sorted(nn[u]):
            if u < v and u in nn.get(v, set()):
                out_a.append(u)
                out_b.append(v)
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64())})


def mutual_knn_pairs_sql(n: int = MKNN_N, k: int = MKNN_K) -> str:
    return f"""
WITH sel AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n}),
x AS (
  SELECT e.vec_id, CAST(u.i AS BIGINT) AS d,
         CAST(floor(CAST(e.embedding[CAST(u.i AS INTEGER) + 1]
                         AS DOUBLE) * 1000000) AS BIGINT) AS xq
  FROM embeddings e, UNNEST(range(len(e.embedding))) u(i)
  WHERE e.vec_id IN (SELECT vec_id FROM sel)),
dist AS (
  SELECT qa.vec_id AS a, qb.vec_id AS b,
         CAST(sum((qa.xq - qb.xq) * (qa.xq - qb.xq)) AS BIGINT)
           AS dist
  FROM x qa JOIN x qb USING (d)
  WHERE qa.vec_id <> qb.vec_id
  GROUP BY 1, 2),
nn AS (
  SELECT a, b FROM (
    SELECT a, b, row_number() OVER (PARTITION BY a
                                    ORDER BY dist, b) AS rn
    FROM dist) WHERE rn <= {k})
SELECT n1.a, n1.b
FROM nn n1 JOIN nn n2 ON n1.a = n2.b AND n1.b = n2.a
WHERE n1.a < n1.b
ORDER BY n1.a, n1.b"""
