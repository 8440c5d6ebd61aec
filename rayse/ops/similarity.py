"""Similarity search over an embedding column (``list<float>``).

- ``ann_topk``: exact brute-force cosine top-k — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, read in every task),
  per-batch partial top-k, tiny driver merge. The baseline the scale path
  must match.
- ``ann_lsh_topk``: random-hyperplane LSH-bucketed variant — queries only
  score vectors sharing a bucket (multi-probe over H tables). The 100 TB
  path: candidate sets shrink by ~bucket_count x; recall measured against
  the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mat_from_list(col) -> np.ndarray:
    """``list<float>`` column -> (n, dim) float64 matrix via Arrow flatten +
    reshape. Always WRITABLE: for list<float64> the zero-copy view is
    read-only and every caller normalizes in place, so that case pays one
    explicit copy (float32 already copies via the cast)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    m = flat.astype(np.float64, copy=False)
    if not m.flags.writeable:
        m = m.copy()
    return m.reshape(n, -1)


def _ids_from(col) -> np.ndarray:
    return (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col).to_numpy(zero_copy_only=False).astype(np.int64,
                                                            copy=False)


def _smallest_vec_ids(sf_dir: str, n: int) -> np.ndarray:
    """The ``n`` smallest vec_ids, reading ONLY the key column (one int64
    per row reaches the driver — never the embedding payload)."""
    import pyarrow.dataset as pads

    ids = _ids_from(pads.dataset(f"{sf_dir}/embeddings.parquet")
                    .to_table(columns=["vec_id"])["vec_id"])
    if ids.size > n:
        ids = ids[np.argpartition(ids, n - 1)[:n]]
    return np.sort(ids)


def _rows_for_ids(sf_dir: str, sel: np.ndarray) -> pa.Table:
    """Pushdown-filtered read of exactly the selected rows, returned in
    ascending vec_id order."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pc.field("vec_id").isin(sel.tolist()))
    return t.take(pc.sort_indices(t["vec_id"]))


def _load_queries(sf_dir: str, n_queries: int):
    """Query vectors = the ``n_queries`` smallest vec_ids. Scale shape:
    key-column scan for the id selection + a filtered read of exactly the
    selected rows (the round-3 full-table driver read is gone)."""
    sel = _smallest_vec_ids(sf_dir, n_queries)
    t = _rows_for_ids(sf_dir, sel)
    q = _mat_from_list(t["embedding"])
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return _ids_from(t["vec_id"]), q


def ann_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pa.Table:
    """Exact cosine top-k of the first ``n_queries`` vectors (by vec_id)
    against the whole table. Ties broken by ascending vec_id."""
    import ray
    import ray.data as rd

    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    q_ref = ray.put(q_mat)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = _ids_from(batch["vec_id"])
        m = _mat_from_list(batch["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = qm @ m.T                      # (Q, B)
        rows = {"q_id": [], "vec_id": [], "sim": []}
        top = min(k, ids.size)
        for qi in range(qm.shape[0]):
            s = sims[qi]
            idx = np.lexsort((ids, -s))[:top]
            rows["q_id"].extend([int(q_ids[qi])] * top)
            rows["vec_id"].extend(ids[idx].tolist())
            rows["sim"].extend(s[idx].tolist())
        return pa.table({"q_id": pa.array(rows["q_id"], pa.int64()),
                         "vec_id": pa.array(rows["vec_id"], pa.int64()),
                         "sim": pa.array(rows["sim"], pa.float64())})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()  # tiny: Q*k/batch
    return _merge_topk(parts, k)


def _merge_topk(rows: list[dict], k: int) -> pa.Table:
    """Driver merge of per-batch partial top-k rows — input is bounded by
    Q x k x n_batches, never corpus-order."""
    by_q: dict[int, list] = {}
    for row in rows:
        by_q.setdefault(row["q_id"], []).append((row["sim"], row["vec_id"]))
    out_q, out_r, out_v = [], [], []
    for qid in sorted(by_q):
        cand = by_q[qid]
        sims = np.array([c[0] for c in cand])
        vids = np.array([c[1] for c in cand])
        idx = np.lexsort((vids, -sims))[:k]
        for r, i in enumerate(idx, 1):
            out_q.append(qid)
            out_r.append(r)
            out_v.append(int(vids[i]))
    return pa.table({"q_id": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int32()),
                     "vec_id": pa.array(out_v, pa.int64())})


def _kmeans_lite(mat: np.ndarray, n_lists: int, seed: int = 5,
                 n_iter: int = 8) -> np.ndarray:
    """Deterministic mini k-means (seeded init, fixed iterations) on
    L2-normalized vectors — the IVF coarse quantizer. At cluster scale the
    training sample is a small deterministic head of the table; assignment
    is a matmul per batch."""
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(mat.shape[0], size=min(n_lists, mat.shape[0]),
                          replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            members = mat[assign == c]
            if members.shape[0]:
                v = members.mean(axis=0)
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    cent[c] = v / nrm
    return cent


def _train_sample(sf_dir: str, n_train: int) -> np.ndarray:
    """Deterministic bounded training sample: the FIRST ``n_train`` rows in
    file order (never the whole column — at 100 TB the quantizer trains on
    a fixed-size head while assignment streams over everything)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    got, rows = 0, []
    for rb in pf.iter_batches(batch_size=min(n_train, 8192),
                              columns=["embedding"]):
        rows.append(_mat_from_list(pa.Table.from_batches([rb])["embedding"]))
        got += rb.num_rows
        if got >= n_train:
            break
    tm = np.concatenate(rows)[:n_train]
    tm /= np.linalg.norm(tm, axis=1, keepdims=True)
    return tm


def ann_ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                 n_lists: int = 16, n_probe: int = 4,
                 n_train: int = 4096) -> pa.Table:
    """IVF-style ANN: coarse k-means quantizer (trained once on a
    deterministic bounded sample, broadcast), queries probe the ``n_probe``
    nearest lists and score only vectors assigned to those lists. Same output
    schema as ``ann_topk``; recall vs the brute-force baseline is tested."""
    import ray
    import ray.data as rd

    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    tm = _train_sample(sf_dir, n_train)
    cent = _kmeans_lite(tm, n_lists)
    probe = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]  # (Q, P)
    ref = ray.put((cent, probe, q_mat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def candidates(batch: pa.Table) -> pa.Table:
        cents, probes, qm = ray.get(ref)
        ids = _ids_from(batch["vec_id"])
        m = _mat_from_list(batch["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(m @ cents.T, axis=1)
        out_q, out_v, out_s = [], [], []
        # per-batch partial top-k over the probed candidates: rows reaching
        # the driver are bounded by Q x k per batch, not candidate-order
        # (global top-k of a union == top-k of per-batch top-ks)
        for qi in range(qm.shape[0]):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            cids = ids[mask]
            s = np.atleast_1d(qm[qi] @ m[mask].T)
            top = min(k, cids.size)
            idx = np.lexsort((cids, -s))[:top]
            out_q.extend([int(q_ids[qi])] * top)
            out_v.extend(cids[idx].tolist())
            out_s.extend(s[idx].tolist())
        return pa.table({"q_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    rows = ds.map_batches(candidates, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    return _merge_topk(rows, k)


class LshIndexStage:
    """Actor-pool stage holding H random-hyperplane tables (built once per
    actor in __init__): maps each vector to H bucket keys."""

    def __init__(self, dim: int, n_tables: int = 8, n_bits: int = 12,
                 seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.n_tables = n_tables
        self.n_bits = n_bits

    def keys(self, mat: np.ndarray) -> np.ndarray:
        """(N, H) bucket keys."""
        out = np.empty((mat.shape[0], self.n_tables), dtype=np.int64)
        for h in range(self.n_tables):
            bits = (mat @ self.planes[h].T) > 0           # (N, n_bits)
            out[:, h] = bits @ (1 << np.arange(self.n_bits))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = _ids_from(batch["vec_id"])
        m = _mat_from_list(batch["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        keys = self.keys(m)
        n, h = keys.shape
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, h), pa.int64()),
            "table": pa.array(np.tile(np.arange(h, dtype=np.int32), n),
                              pa.int32()),
            "bucket": pa.array(keys.reshape(-1), pa.int64()),
        })


def ann_lsh_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                 n_tables: int = 16, n_bits: int = 4) -> pa.Table:
    """LSH-bucketed approximate top-k: score only vectors sharing >=1
    bucket with the query. Same output schema as ``ann_topk``."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    dim = q_mat.shape[1]

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    stage = LshIndexStage(dim, n_tables, n_bits)
    q_keys = stage.keys(q_mat)                      # (Q, H)
    b_ref = ray.put((q_keys, q_mat))

    def candidates(batch: pa.Table) -> pa.Table:
        qk, qm = ray.get(b_ref)
        ids = _ids_from(batch["vec_id"])
        m = _mat_from_list(batch["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        keys = stage.keys(m)                        # (N, H)
        n_q = qm.shape[0]
        # a vector is a candidate for EVERY query sharing >=1 (table, bucket)
        # — per-query boolean accumulation, no shared-bucket overwrite and no
        # per-row Python probing: Q x N comparisons per table, vectorized
        hit = np.zeros((n_q, ids.size), dtype=bool)
        for h in range(keys.shape[1]):
            hit |= keys[:, h][None, :] == qk[:, h][:, None]
        out_q, out_v, out_s = [], [], []
        # per-batch partial top-k (see ann_ivf_topk): driver rows bounded
        # by Q x k per batch even when buckets are hot
        for qi in range(n_q):
            idx = np.flatnonzero(hit[qi])
            if idx.size == 0:
                continue
            cids = ids[idx]
            s = np.atleast_1d(qm[qi] @ m[idx].T)
            top = min(k, cids.size)
            sel = np.lexsort((cids, -s))[:top]
            out_q.extend([int(q_ids[qi])] * top)
            out_v.extend(cids[sel].tolist())
            out_s.extend(s[sel].tolist())
        return pa.table({"q_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    rows = ds.map_batches(candidates, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    return _merge_topk(rows, k)


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011): split the embedding into m
# subspaces, vector-quantize each against a small per-subspace codebook,
# and score queries by asymmetric distance computation (ADC) — the
# per-subspace query-to-centroid dot products are precomputed as lookup
# tables and a database vector's approximate similarity is the sum of m
# table lookups over its codes. Memory per vector drops from dim floats
# to m bytes; scoring is a gather+sum instead of a matmul.
# ---------------------------------------------------------------------------


def _pq_codebooks(train: np.ndarray, m: int, n_centroids: int,
                  n_iter: int = 8) -> list[np.ndarray]:
    """Per-subspace codebooks via the deterministic mini k-means; the
    training matrix must be L2-normalized and dim % m == 0."""
    dim = train.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [_kmeans_lite(train[:, s * dsub:(s + 1) * dsub], n_centroids,
                         seed=7 + s, n_iter=n_iter)
            for s in range(m)]


def _pq_distinct_codebooks(sf_dir: str, m: int) -> list[np.ndarray]:
    """Full codebooks for the EXACTNESS-THEOREM config: every distinct
    normalized subvector becomes its own centroid (codes reconstruct
    vectors losslessly, so ADC equals the exact dot product). Gathered
    via per-batch uniques; driver state is bounded by the DISTINCT
    subvector count — a theorem fixture for the hash gate, not the
    production path (the approximate entry trains on a bounded head)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])

    def uniq(batch: pa.Table) -> pa.Table:
        mat = _mat_from_list(batch["embedding"])
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        dim = mat.shape[1]
        dsub = dim // m
        out = {}
        for s in range(m):
            u = np.unique(mat[:, s * dsub:(s + 1) * dsub], axis=0)
            out[f"s{s}"] = pa.array(u.tolist(),
                                    pa.list_(pa.float64()))
        n = max(len(v) for v in out.values())
        cols = {}
        for key, arr in out.items():
            pad = n - len(arr)
            cols[key] = pa.concat_arrays(
                [arr, pa.nulls(pad, pa.list_(pa.float64()))]) \
                if pad else arr
        return pa.table(cols)

    parts = ds.map_batches(uniq, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    books = []
    for s in range(m):
        subs = [np.asarray(r[f"s{s}"], dtype=np.float64)
                for r in parts if r[f"s{s}"] is not None]
        books.append(np.unique(np.stack(subs), axis=0))
    return books


def ann_pq_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                m: int = 4, n_centroids: int = 16,
                n_train: int = 2048, exact: bool = False,
                rerank: int = 0) -> pa.Table:
    """PQ/ADC approximate top-k, same output schema and tie-breaks as
    ``ann_topk``. ``rerank`` > 0 enables the standard ADC-shortlist +
    exact-rescore pattern (IVFADC re-ranking): per batch, the top
    ``rerank`` vectors by ADC get their TRUE dot product, and only those
    exact scores compete for the final top-k — quantization error then
    only costs recall when a true neighbor falls outside the shortlist.
    ``exact=True`` swaps in the distinct-subvector codebooks (ADC ==
    exact cosine — the PQ exactness theorem, ridden by
    ``ann_exact_suite`` under the brute-force oracle)."""
    import ray
    import ray.data as rd

    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    dim = q_mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = (_pq_distinct_codebooks(sf_dir, m) if exact
             else _pq_codebooks(_train_sample(sf_dir, n_train), m,
                                n_centroids))
    # ADC lookup tables: per subspace, every query's dot with every
    # centroid — (m, Q, n_centroids)
    luts = [q_mat[:, s * dsub:(s + 1) * dsub] @ books[s].T
            for s in range(m)]
    ref = ray.put((books, luts, q_mat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def candidates(batch: pa.Table) -> pa.Table:
        bks, lts, qm = ray.get(ref)
        ids = _ids_from(batch["vec_id"])
        mat = _mat_from_list(batch["embedding"])
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        n_q = lts[0].shape[0]
        approx = np.zeros((n_q, ids.size), dtype=np.float64)
        for s in range(m):
            sub = mat[:, s * dsub:(s + 1) * dsub]        # (B, dsub)
            cb = bks[s]                                  # (C, dsub)
            # nearest centroid by L2: argmin ||x-c||^2 = argmin
            # (||c||^2 - 2 x.c) — vectorized, ties to the lowest code
            d2 = (cb * cb).sum(axis=1)[None, :] - 2.0 * (sub @ cb.T)
            codes = np.argmin(d2, axis=1)                # (B,)
            approx += lts[s][:, codes]
        out_q, out_v, out_s = [], [], []
        top = min(k, ids.size)
        for qi in range(n_q):
            s = approx[qi]
            if rerank:
                short = np.lexsort((ids, -s))[:min(rerank, ids.size)]
                s_ex = qm[qi] @ mat[short].T
                sel = short[np.lexsort((ids[short], -s_ex))[:top]]
                sims_out = qm[qi] @ mat[sel].T
            else:
                sel = np.lexsort((ids, -s))[:top]
                sims_out = s[sel]
            out_q.extend([int(q_ids[qi])] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_s.extend(np.atleast_1d(sims_out).tolist())
        return pa.table({"q_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})

    rows = ds.map_batches(candidates, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()  # Q*k/batch
    return _merge_topk(rows, k)


def ann_exact_suite(sf_dir: str, n_queries: int = 5,
                    k: int = 10) -> pa.Table:
    """The exact/own-oracle ANN paths as one tagged table (one driver
    window slot): brute-force cosine, IVF at full probe (n_probe ==
    n_lists scans every list -> exact), LSH at zero hash bits (single
    all-candidates bucket -> exact), PQ with distinct-subvector
    codebooks (lossless codes -> ADC == exact cosine) — all four equal
    the brute-force DuckDB oracle — plus int8 scalar quantization,
    hash-checked against its OWN integer-dot oracle (SQ is lossy by
    design; its contract is exactness of the quantized ranking)."""
    parts = []
    for method, tbl in (
            ("brute", ann_topk(sf_dir, n_queries, k)),
            ("ivf_full", ann_ivf_topk(sf_dir, n_queries, k,
                                      n_lists=16, n_probe=16)),
            ("lsh_zero", ann_lsh_topk(sf_dir, n_queries, k,
                                      n_tables=1, n_bits=0)),
            ("pq_full", ann_pq_topk(sf_dir, n_queries, k, exact=True)),
            ("sq_int8", ann_sq_topk(sf_dir, n_queries, k))):
        parts.append(pa.table({
            "method": pa.array([method] * tbl.num_rows, pa.string()),
            "q_id": tbl["q_id"],
            "rank": tbl["rank"],
            "vec_id": tbl["vec_id"],
        }))
    return pa.concat_tables(parts)


def ann_exact_suite_sql(n_queries: int = 5, k: int = 10) -> str:
    """Oracle for ``ann_exact_suite``: the brute-force ranking cross-joined
    with the three method tags (each path is provably exact)."""
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {n_queries}),
scored AS (
  SELECT q.q_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e),
ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY sim DESC, vec_id) AS rank
  FROM scored)
SELECT m.method, r.q_id, CAST(r.rank AS INTEGER) AS rank, r.vec_id
FROM ranked r
CROSS JOIN (VALUES ('brute'), ('ivf_full'), ('lsh_zero'), ('pq_full'))
  m(method)
WHERE r.rank <= {k}
UNION ALL
SELECT 'sq_int8' AS method, q_id, rank, vec_id
FROM (
{ann_sq_sql(n_queries, k)}
)"""


# ---------------------------------------------------------------------------
# Integer fixed-point k-means (cluster-balanced sampling / routing for
# training data). All arithmetic is int64 on floor(x*1e6)-quantized
# components, so Python and SQL agree BIT-EXACTLY (the pagerank_fixed
# recipe): no float accumulation order to mirror, no quantization knife
# edges. Centroid means use TRUNCATING division (DuckDB's // semantics).
# ---------------------------------------------------------------------------

_KM_SCALE = 1_000_000


def _trunc_div(s: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Truncate-toward-zero integer division (SQL //), vectorized."""
    return np.where(s >= 0, s // c, -((-s) // c))


def _km_quantize(mat: np.ndarray) -> np.ndarray:
    return np.floor(mat.astype(np.float64) * _KM_SCALE).astype(np.int64)


def _km_assign_rows(X: np.ndarray, C: np.ndarray) -> tuple:
    """Argmin-distance cluster per row; ties break to the smaller k
    (np.argmin returns the first minimum)."""
    diff = X[:, None, :] - C[None, :, :]
    dists = np.einsum("nkd,nkd->nk", diff, diff)
    a = np.argmin(dists, axis=1)
    return a, dists[np.arange(X.shape[0]), a]


def _kmeans_centroids(ds, sf_dir: str, k: int, iters: int) -> np.ndarray:
    """``iters`` Lloyd rounds of the integer k-means from deterministic
    seeds (the k smallest vec_ids) -> final K x dim int64 centroids.
    Per round: centroids broadcast, per-batch partial (cluster, dim)-sums
    stream back (K x dim ints of driver state — constant in corpus size),
    means by truncating division."""
    import ray

    # deterministic seeds: the k smallest vec_ids, quantized — key-column
    # scan + filtered read of exactly k rows (never the full embedding
    # payload on the driver)
    seed = _rows_for_ids(sf_dir, _smallest_vec_ids(sf_dir, k))
    C = _km_quantize(_mat_from_list(seed["embedding"]))

    for _ in range(iters):
        ref = ray.put(C)

        def partials(batch: pa.Table) -> pa.Table:
            Cb = ray.get(ref)
            X = _km_quantize(_mat_from_list(batch["embedding"]))
            a, _ = _km_assign_rows(X, Cb)
            ks, inv = np.unique(a, return_inverse=True)
            sums = np.zeros((ks.size, X.shape[1]), dtype=np.int64)
            np.add.at(sums, inv, X)
            cnt = np.bincount(inv)
            return pa.table({
                "k": pa.array(np.repeat(ks, X.shape[1]), pa.int64()),
                "d": pa.array(np.tile(np.arange(X.shape[1]), ks.size),
                              pa.int64()),
                "s": pa.array(sums.reshape(-1), pa.int64()),
                "c": pa.array(np.repeat(cnt.astype(np.int64),
                                        X.shape[1]), pa.int64()),
            })

        agg = ds.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
        g = agg.groupby(["k", "d"], as_index=False).sum()   # K x dim rows
        newC = C.copy()                 # empty cluster keeps its centroid
        kk = g["k"].to_numpy()
        dd = g["d"].to_numpy()
        newC[kk, dd] = _trunc_div(g["s"].to_numpy(), g["c"].to_numpy())
        C = newC
    return C


def kmeans_assign(sf_dir: str, k: int = 4, iters: int = 2):
    """Fixed-iteration integer k-means over the embeddings table ->
    (vec_id, cluster, dist): ``iters`` Lloyd rounds (see
    ``_kmeans_centroids``), then a final assignment pass. Ties break to
    the smaller cluster id."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ref = ray.put(_kmeans_centroids(ds, sf_dir, k, iters))

    def final(batch: pa.Table) -> pa.Table:
        Cb = ray.get(ref)
        X = _km_quantize(_mat_from_list(batch["embedding"]))
        a, dist = _km_assign_rows(X, Cb)
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(a.astype(np.int32), pa.int32()),
            "dist": pa.array(dist.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(final, batch_format="pyarrow",
                          zero_copy_batch=True)


def _km_chain_sql(k: int, iters: int) -> list:
    """Shared unrolled-Lloyd CTE chain (through the final all-centroid
    distance table ``df``) used by both ``kmeans_assign_sql`` and
    ``kmeans_silhouette_sql``."""
    scale = _KM_SCALE
    out = [f"""
WITH x AS (
  SELECT e.vec_id, CAST(u.i AS BIGINT) AS d,
         CAST(floor(CAST(e.embedding[CAST(u.i AS INTEGER) + 1] AS DOUBLE)
                    * {scale}) AS BIGINT) AS xq
  FROM embeddings e, UNNEST(range(len(e.embedding))) u(i)),
seeds AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS k
          FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
c0 AS (SELECT s.k, x.d, x.xq AS c FROM seeds s JOIN x USING (vec_id))"""]
    prev = "c0"
    for i in range(1, iters + 1):
        out.append(f""",
d{i} AS (
  SELECT x.vec_id, c.k,
         sum((x.xq - c.c) * (x.xq - c.c)) AS dist
  FROM x JOIN {prev} c ON x.d = c.d GROUP BY 1, 2),
a{i} AS (
  SELECT vec_id, k FROM (
    SELECT vec_id, k, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY dist, k) AS rn
    FROM d{i}) WHERE rn = 1),
u{i} AS (
  SELECT a.k, x.d, sum(x.xq) // CAST(count(*) AS BIGINT) AS c
  FROM a{i} a JOIN x USING (vec_id) GROUP BY 1, 2),
c{i} AS (
  SELECT p.k, p.d, coalesce(u.c, p.c) AS c
  FROM {prev} p LEFT JOIN u{i} u ON p.k = u.k AND p.d = u.d)""")
        prev = f"c{i}"
    out.append(f""",
df AS (
  SELECT x.vec_id, c.k,
         sum((x.xq - c.c) * (x.xq - c.c)) AS dist
  FROM x JOIN {prev} c ON x.d = c.d GROUP BY 1, 2)""")
    return out


def kmeans_assign_sql(k: int = 4, iters: int = 2) -> str:
    """Oracle for ``kmeans_assign``: the identical integer recursion,
    unrolled (fixed iters) — long-form (vec_id, d, xq) joins, argmin by
    (dist, k) row_number, truncating // means, LEFT JOIN keeps the
    previous centroid for empty clusters."""
    out = _km_chain_sql(k, iters)
    out.append("""
SELECT vec_id, CAST(k AS INTEGER) AS cluster, CAST(dist AS BIGINT) AS dist
FROM (SELECT vec_id, k, dist,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, k) AS rn
      FROM df) WHERE rn = 1""")
    return "".join(out)


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication =
# k-means cluster the embedding space, then pairwise-cosine dedup WITHIN
# each cluster only. The paper keeps the member farthest from the
# centroid; here the kept representative is the smallest vec_id (a
# deterministic canonical-keep, so re-runs and the SQL oracle agree
# bit-for-bit). Removal rule: drop v iff some u < v in v's cluster has
# cos(u, v) >= threshold — evaluated against ALL original members, not
# survivors, matching the self-join oracle exactly.
# ---------------------------------------------------------------------------

def _semdedup_part(tbl: pa.Table, threshold: float) -> pa.Table:
    """Whole-partition reducer: every cluster of this partition arrives
    complete; per cluster, one normalized Gram matrix and a strict-upper-
    triangle threshold test in vec_id order."""
    if tbl.num_rows == 0:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int32())})
    ids = _ids_from(tbl["vec_id"])
    cl = tbl["cluster"].to_numpy(zero_copy_only=False)
    M = _mat_from_list(tbl["embedding"])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    order = np.lexsort((ids, cl))        # cluster-major, vec_id ascending
    ids, cl, M = ids[order], cl[order], M[order]
    new = np.empty(ids.size, dtype=bool)
    new[0] = True
    new[1:] = cl[1:] != cl[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], ids.size)
    keep = np.ones(ids.size, dtype=bool)
    for s, e in zip(starts.tolist(), ends.tolist()):
        n = e - s
        if n < 2:
            continue
        S = M[s:e] @ M[s:e].T            # cluster-sized working set
        hit = (S >= threshold) & np.tri(n, n, -1, dtype=bool).T
        keep[s:e] = ~hit.any(axis=0)     # v dropped iff any u < v hits
    return pa.table({"vec_id": pa.array(ids[keep], pa.int64()),
                     "cluster": pa.array(cl[keep], pa.int32())})


def semdedup_keep(sf_dir: str, k: int = 4, iters: int = 2,
                  threshold: float = 0.4):
    """SemDeDup -> kept (vec_id, cluster).

    Scale shape: cluster assignment is the integer k-means above
    (broadcast K x dim centroids, streaming batches — no driver-side
    corpus state); the dedup itself is ONE exchange keyed by cluster id,
    each task computing pairwise cosine for its clusters only. Cost is
    O(|c|^2) per cluster — SemDeDup's own partitioning assumption (k is
    sized so clusters stay small; a pathological giant cluster should be
    LSH-split first, as in ``_embedding_lsh_pairs``)."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ref = ray.put(_kmeans_centroids(ds, sf_dir, k, iters))

    def stamp(batch: pa.Table) -> pa.Table:
        Cb = ray.get(ref)
        X = _km_quantize(_mat_from_list(batch["embedding"]))
        a, _ = _km_assign_rows(X, Cb)
        return pa.table({
            "vec_id": batch["vec_id"],
            "cluster": pa.array(a.astype(np.int32), pa.int32()),
            "embedding": batch["embedding"],
        })

    stamped = ds.map_batches(stamp, batch_format="pyarrow",
                             zero_copy_batch=True)
    return exchange_by_key(stamped, "cluster", _semdedup_part,
                           proc_kwargs={"threshold": threshold},
                           n_parts=32)


def semdedup_keep_sql(k: int = 4, iters: int = 2,
                      threshold: float = 0.4) -> str:
    """Oracle for ``semdedup_keep``: the unrolled k-means oracle as the
    assignment CTE, removal = thresholded same-cluster self-join with
    ``list_cosine_similarity`` (the ``embedding_neardup`` kernel), keep =
    anti-join."""
    return f"""
WITH asn AS (
  SELECT vec_id, cluster FROM (
{kmeans_assign_sql(k=k, iters=iters)}
  )),
removed AS (
  SELECT DISTINCT b.vec_id
  FROM asn a
  JOIN asn b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE list_cosine_similarity(ea.embedding, eb.embedding)
        >= {threshold})
SELECT asn.vec_id, asn.cluster FROM asn
WHERE asn.vec_id NOT IN (SELECT vec_id FROM removed)"""


# ---------------------------------------------------------------------------
# Scalar-quantized (int8) ANN — the SQ compression family next to PQ:
# every component maps to an int8 code floor(x / s * 127) under ONE
# global scale s = max |component| (4x memory-bandwidth reduction, the
# faiss ScalarQuantizer idea), and similarity is the PURE-INTEGER code
# dot product — so past the two deterministic float ops per component
# (divide, multiply; identical order in numpy-f64 and DuckDB-DOUBLE)
# the whole ranking is int64 and the oracle matches bit-for-bit.
#
# Scale shape: s is a distributed max partial; codes are row-local;
# scoring is the ann_topk pattern (broadcast query codes, per-batch
# int matmul partial top-k, output-sized merge).
# ---------------------------------------------------------------------------

SQ_LEVELS = 127.0


def _sq_scale(sf_dir: str) -> float:
    """Global max-|component| via per-batch partials (one float per
    batch to the driver)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])

    def mx(batch: pa.Table) -> pa.Table:
        m = _mat_from_list(batch["embedding"])
        v = float(np.abs(m.astype(np.float64)).max()) if m.size else 0.0
        return pa.table({"m": pa.array([v], pa.float64())})

    return float(ds.map_batches(mx, batch_format="pyarrow",
                                zero_copy_batch=True).max("m"))


def _sq_encode(mat: np.ndarray, s: float) -> np.ndarray:
    return np.floor(mat.astype(np.float64) / s * SQ_LEVELS).astype(
        np.int64)


def ann_sq_topk(sf_dir: str, n_queries: int = 5, k: int = 10) -> pa.Table:
    """(q_id, rank, vec_id, dot_q): top-k by int8-code dot product, ties
    broken by ascending vec_id."""
    import ray
    import ray.data as rd

    s = _sq_scale(sf_dir)
    sel = _smallest_vec_ids(sf_dir, n_queries)
    qt = _rows_for_ids(sf_dir, sel)
    q_ids = _ids_from(qt["vec_id"])
    q_codes = _sq_encode(_mat_from_list(qt["embedding"]), s)
    q_ref = ray.put(q_codes)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qc = ray.get(q_ref)
        empty = pa.table({"qi": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "dot_q": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        ids = _ids_from(batch["vec_id"])
        codes = _sq_encode(_mat_from_list(batch["embedding"]), s)
        dots = codes @ qc.T                          # int64 matmul
        out_qi, out_id, out_d = [], [], []
        for qi in range(qc.shape[0]):
            d = dots[:, qi]
            take = min(k, d.size)
            cut = np.argpartition(-d, take - 1)[:take] if d.size > take \
                else np.arange(d.size)
            out_qi.append(np.full(cut.size, qi, np.int64))
            out_id.append(ids[cut])
            out_d.append(d[cut])
        return pa.table({
            "qi": pa.array(np.concatenate(out_qi), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "dot_q": pa.array(np.concatenate(out_d), pa.int64())})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    out = {c: [] for c in ("q_id", "rank", "vec_id", "dot_q")}
    for qi in range(q_ids.size):
        g = parts[parts["qi"] == qi]
        order = np.lexsort((g["vec_id"].to_numpy(),
                            -g["dot_q"].to_numpy()))[:k]
        for r, j in enumerate(order, 1):
            out["q_id"].append(int(q_ids[qi]))
            out["rank"].append(r)
            out["vec_id"].append(int(g["vec_id"].iloc[j]))
            out["dot_q"].append(int(g["dot_q"].iloc[j]))
    return pa.table({
        "q_id": pa.array(out["q_id"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int32()),
        "vec_id": pa.array(out["vec_id"], pa.int64()),
        "dot_q": pa.array(out["dot_q"], pa.int64()),
    })


def ann_sq_sql(n_queries: int = 5, k: int = 10) -> str:
    """Oracle for ``ann_sq_topk``: the same scale/encode expressions in
    DOUBLE, integer dot product via the position join."""
    return f"""
WITH mx AS (
  SELECT max(list_aggregate(list_transform(embedding,
             x -> abs(CAST(x AS DOUBLE))), 'max')) AS s
  FROM embeddings),
codes AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) / mx.s * {SQ_LEVELS!r})
                     AS BIGINT)) AS c
  FROM embeddings CROSS JOIN mx),
q AS (SELECT vec_id AS q_id, c AS qc FROM codes
      ORDER BY vec_id LIMIT {n_queries}),
scored AS (
  SELECT q.q_id, e.vec_id,
         CAST(list_dot_product(
           list_transform(q.qc, x -> CAST(x AS DOUBLE)),
           list_transform(e.c, x -> CAST(x AS DOUBLE))) AS BIGINT)
           AS dot_q
  FROM q CROSS JOIN codes e),
ranked AS (
  SELECT q_id, vec_id, dot_q,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY dot_q DESC, vec_id) AS rank
  FROM scored)
SELECT q_id, CAST(rank AS INTEGER) AS rank, vec_id, dot_q
FROM ranked WHERE rank <= {k}"""


def centroid_classify(sf_dir: str) -> pa.Table:
    """(label, pred, n): nearest-centroid (Rocchio) classification
    confusion matrix over the embeddings table — the supervised
    companion to ``kmeans_assign`` (same quantize / argmin / truncating
    -mean contracts, zero iterations): per-label integer centroids from
    ONE (label, dim)-sum fold, then a streaming assignment pass against
    the broadcast K x dim matrix, then one bounded confusion groupby.

    Driver state is K x dim int64 (constant in corpus size); ties break
    to the smaller label (np.argmin first-minimum == SQL row_number
    ORDER BY dist, k). DuckDB hash-matched against the long-form
    UNNEST oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def cent_partial(batch: pa.Table) -> pa.Table:
        X = _km_quantize(_mat_from_list(batch["embedding"]))
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        ks, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((ks.size, X.shape[1]), np.int64)
        np.add.at(sums, inv, X)
        cnt = np.bincount(inv)
        return pa.table({
            "k": pa.array(np.repeat(ks, X.shape[1]), pa.int64()),
            "d": pa.array(np.tile(np.arange(X.shape[1]), ks.size),
                          pa.int64()),
            "s": pa.array(sums.reshape(-1), pa.int64()),
            "c": pa.array(np.repeat(cnt.astype(np.int64), X.shape[1]),
                          pa.int64()),
        })

    agg = (ds.map_batches(cent_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["k", "d"]).sum(["s", "c"]).to_pandas())
    labels = np.sort(agg["k"].unique()).astype(np.int64)
    dim = int(agg["d"].max()) + 1
    C = np.zeros((labels.size, dim), np.int64)
    li = np.searchsorted(labels, agg["k"].to_numpy())
    C[li, agg["d"].to_numpy()] = _trunc_div(
        agg["sum(s)"].to_numpy(), agg["sum(c)"].to_numpy())
    ref = ray.put((labels, C))

    def assign(batch: pa.Table) -> pa.Table:
        labs, Cb = ray.get(ref)
        X = _km_quantize(_mat_from_list(batch["embedding"]))
        a, _ = _km_assign_rows(X, Cb)
        true = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        pred = labs[a]
        key = true * (labs.max() + 1) + pred
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "label": pa.array(uk // (labs.max() + 1), pa.int64()),
            "pred": pa.array(uk % (labs.max() + 1), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    rows = (ds.map_batches(assign, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(["label", "pred"]).sum("n").take_all())
    out = sorted((int(r["label"]), int(r["pred"]), int(r["sum(n)"]))
                 for r in rows)
    return pa.table({
        "label": pa.array([a for a, _, _ in out], pa.int64()),
        "pred": pa.array([b for _, b, _ in out], pa.int64()),
        "n": pa.array([c for _, _, c in out], pa.int64()),
    })


def centroid_classify_sql() -> str:
    """Oracle: identical quantize -> truncating per-label mean ->
    argmin assignment -> confusion groupby, in long form."""
    scale = _KM_SCALE
    return f"""
WITH x AS (
  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
         CAST(u.i AS BIGINT) AS d,
         CAST(floor(CAST(e.embedding[CAST(u.i AS INTEGER) + 1] AS DOUBLE)
                    * {scale}) AS BIGINT) AS xq
  FROM embeddings e, UNNEST(range(len(e.embedding))) u(i)),
cent AS (
  SELECT label AS k, d, sum(xq) // count(*) AS c
  FROM x GROUP BY 1, 2),
dist AS (
  SELECT x.vec_id, c.k,
         sum((x.xq - c.c) * (x.xq - c.c)) AS dd
  FROM x JOIN cent c USING (d) GROUP BY 1, 2),
pred AS (
  SELECT vec_id, k AS pred
  FROM (SELECT vec_id, k,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dd, k) AS rn
        FROM dist)
  WHERE rn = 1)
SELECT CAST(e.label AS BIGINT) AS label, p.pred,
       CAST(count(*) AS BIGINT) AS n
FROM embeddings e JOIN pred p USING (vec_id)
GROUP BY 1, 2 ORDER BY 1, 2"""


# ---------------------------------------------------------------------------
# Simplified (centroid-based) silhouette over the integer k-means fit:
# per vector a2 = squared distance to its own centroid, b2 = squared
# distance to the nearest OTHER centroid, s = (b2 - a2)/max(a2, b2)
# quantized to milli in truncating integer division — the clustering
# quality diagnostic (Rousseeuw 1987's simplified variant on squared
# distances), O(n*k) instead of the O(n^2) full silhouette, so it
# streams: centroids broadcast, per-batch partial (cluster, n, sum_s)
# fold, K-bounded driver finalize.
# ---------------------------------------------------------------------------


def kmeans_silhouette(sf_dir: str, k: int = 4,
                      iters: int = 2) -> pa.Table:
    """(cluster, n, sum_s_milli, mean_s_milli): simplified-silhouette
    quality per cluster of the ``kmeans_assign`` fit — exact integers,
    DuckDB hash-matched against the shared unrolled-Lloyd chain plus
    the rn=1/rn=2 distance pair."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ref = ray.put(_kmeans_centroids(ds, sf_dir, k, iters))

    def partials(batch: pa.Table) -> pa.Table:
        Cb = ray.get(ref)
        X = _km_quantize(_mat_from_list(batch["embedding"]))
        diff = X[:, None, :] - Cb[None, :, :]
        dists = np.einsum("nkd,nkd->nk", diff, diff)
        order = np.argsort(dists, axis=1, kind="stable")
        rows = np.arange(X.shape[0])
        a_k = order[:, 0]
        a2 = dists[rows, a_k]
        b2 = dists[rows, order[:, 1]]
        s_q = (b2 - a2) * 1000 // np.maximum(np.maximum(a2, b2), 1)
        ks, inv = np.unique(a_k, return_inverse=True)
        return pa.table({
            "cluster": pa.array(ks.astype(np.int64), pa.int64()),
            "n": pa.array(np.bincount(inv, None, ks.size)
                          .astype(np.int64), pa.int64()),
            "sum_s": pa.array(np.bincount(inv, s_q, ks.size)
                              .astype(np.int64), pa.int64()),
        })

    import ray.data as rd2

    agg = (ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("cluster").aggregate(rd2.aggregate.Sum("n"),
                                         rd2.aggregate.Sum("sum_s")))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    cl = tbl["cluster"].to_numpy(zero_copy_only=False)
    n = tbl["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = tbl["sum(sum_s)"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(cl, kind="stable")
    return pa.table({
        "cluster": pa.array(cl[o].astype(np.int32), pa.int32()),
        "n": pa.array(n[o], pa.int64()),
        "sum_s_milli": pa.array(s[o], pa.int64()),
        "mean_s_milli": pa.array(s[o] // np.maximum(n[o], 1),
                                 pa.int64()),
    })


def kmeans_silhouette_sql(k: int = 4, iters: int = 2) -> str:
    out = _km_chain_sql(k, iters)
    out.append("""
, r AS (
  SELECT vec_id, k, dist,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist, k) AS rn
  FROM df),
ab AS (
  SELECT a.vec_id, a.k AS cluster, a.dist AS a2, b.dist AS b2
  FROM r a JOIN r b ON a.vec_id = b.vec_id
  WHERE a.rn = 1 AND b.rn = 2),
sq AS (
  SELECT cluster,
         (b2 - a2) * 1000 // greatest(a2, b2, 1) AS s_q
  FROM ab)
SELECT CAST(cluster AS INTEGER) AS cluster,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(s_q) AS BIGINT) AS sum_s_milli,
       CAST(sum(s_q) // CAST(count(*) AS BIGINT) AS BIGINT)
         AS mean_s_milli
FROM sq GROUP BY cluster ORDER BY cluster""")
    return "".join(out)


def ann_label_topk(sf_dir: str, n_queries: int = 5,
                   k: int = 3) -> pa.Table:
    """(q_id, label, rank, vec_id): exact cosine top-k PER LABEL GROUP
    for each query — the grouped-retrieval variant of ``ann_topk``
    (per-batch partials bounded by Q x labels x k; ties to ascending
    vec_id) — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    q_ids, q_mat = _load_queries(sf_dir, n_queries)
    q_ref = ray.put(q_mat)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = _ids_from(batch["vec_id"])
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        m = _mat_from_list(batch["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = qm @ m.T
        rows = {"q_id": [], "label": [], "vec_id": [], "sim": []}
        for qi in range(qm.shape[0]):
            s = sims[qi]
            for lv in np.unique(lab):
                sel = np.flatnonzero(lab == lv)
                idx = sel[np.lexsort((ids[sel], -s[sel]))[:k]]
                rows["q_id"].extend([int(q_ids[qi])] * idx.size)
                rows["label"].extend([int(lv)] * idx.size)
                rows["vec_id"].extend(ids[idx].tolist())
                rows["sim"].extend(s[idx].tolist())
        return pa.table({
            "q_id": pa.array(rows["q_id"], pa.int64()),
            "label": pa.array(rows["label"], pa.int64()),
            "vec_id": pa.array(rows["vec_id"], pa.int64()),
            "sim": pa.array(rows["sim"], pa.float64())})

    parts = ds.map_batches(partial_topk, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    by_g: dict = {}
    for row in parts:
        by_g.setdefault((row["q_id"], row["label"]), []).append(
            (row["sim"], row["vec_id"]))
    out = {"q_id": [], "label": [], "rank": [], "vec_id": []}
    for (qid, lv) in sorted(by_g):
        cand = by_g[(qid, lv)]
        sims = np.array([c[0] for c in cand])
        vids = np.array([c[1] for c in cand])
        idx = np.lexsort((vids, -sims))[:k]
        for r, i in enumerate(idx, 1):
            out["q_id"].append(qid)
            out["label"].append(lv)
            out["rank"].append(r)
            out["vec_id"].append(int(vids[i]))
    return pa.table({
        "q_id": pa.array(out["q_id"], pa.int64()),
        "label": pa.array(out["label"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int32()),
        "vec_id": pa.array(out["vec_id"], pa.int64()),
    })


def ann_label_topk_sql(n_queries: int = 5, k: int = 3) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {n_queries}),
scored AS (
  SELECT q.q_id, CAST(e.label AS BIGINT) AS label, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e),
ranked AS (
  SELECT q_id, label, vec_id,
         row_number() OVER (PARTITION BY q_id, label
                            ORDER BY sim DESC, vec_id) AS rank
  FROM scored)
SELECT q_id, label, CAST(rank AS INTEGER) AS rank, vec_id
FROM ranked WHERE rank <= {k}
ORDER BY q_id, label, rank"""
