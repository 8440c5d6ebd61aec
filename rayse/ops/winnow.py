"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm) and fingerprint-overlap pair
detection.

Winnowing selects, from every window of ``w`` consecutive word-``k``-gram
hashes, the minimum hash (ties: RIGHTMOST position — the paper's rule),
guaranteeing any shared substring of length >= w + k - 1 words produces
at least one shared fingerprint while keeping the per-document sketch a
~2/(w+1) fraction of the gram stream. The upgrade over the single
`fingerprint_batch` min-hash: a SET of position-anchored fingerprints,
enabling local (not just whole-doc) overlap detection.

Scale shape: fingerprints are selected batch-locally (one vectorized
(n_windows x w) gather per batch — w is a small constant); the overlap
join ships only DISTINCT (doc_id, fp) rows through one fp-keyed
exchange (per-group pair emit, fp df-bounded), and a second pair-keyed
exchange counts shared fingerprints exactly. Both engine and oracle
join on the FNV hash itself, so they agree bit-for-bit even under a
collision.

Reference relationship: the reference has no plagiarism/overlap
surface; this extends the SE5/SE6 near-dup family (`RankerService.java`
Jaccard rerank is its closest cousin) with the classical
local-similarity sketch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import exchange_by_key
from .textstats import fnv64_slices, gram_slices

WINNOW_K = 4                     # words per gram
WINNOW_W = 5                     # grams per window
MIN_SHARED = 2                   # overlap-pair threshold

_FP_SCHEMA = pa.schema([("doc_id", pa.int64()), ("fp", pa.uint64()),
                        ("pos", pa.int64())])


def _winnow_batch_rows(batch: pa.Table, k: int, w: int) -> pa.Table:
    """(doc_id, fp, pos) DISTINCT winnowed fingerprints of one batch —
    fully vectorized: one (n_windows, min(w, m)) gather per length
    class (m > w in one matrix; short docs m <= w reduce whole-doc)."""
    texts = batch["text"].to_pylist()
    if not texts:
        return pa.table({n: [] for n in _FP_SCHEMA.names},
                        schema=_FP_SCHEMA)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    buf, g_start, lens, g_cum = gram_slices(texts, k)
    h = fnv64_slices(buf, g_start, lens)
    m = np.diff(g_cum)                       # grams per doc
    out_d, out_h, out_p = [], [], []

    # long docs: every window is exactly w grams
    long = np.flatnonzero(m > w)
    if long.size:
        n_win = m[long] - w + 1
        wstart = (np.repeat(g_cum[long], n_win)
                  + (np.arange(int(n_win.sum()), dtype=np.int64)
                     - np.repeat(np.cumsum(n_win) - n_win, n_win)))
        idx = wstart[:, None] + np.arange(w, dtype=np.int64)[None, :]
        vals = h[idx]
        minv = vals.min(axis=1)
        off = w - 1 - np.argmax(vals[:, ::-1] == minv[:, None], axis=1)
        gpos = wstart + off
        d = np.repeat(long, n_win)
        out_d.append(ids[d])
        out_h.append(minv)
        out_p.append(gpos - g_cum[d])

    # short docs: ONE window over all m grams
    short = np.flatnonzero(m <= w)
    if short.size:
        # rightmost argmin per doc segment: lexsort by (doc, h asc,
        # pos desc) -> first row of each doc
        seg_d = np.repeat(short, m[short])
        seg_i = (np.arange(int(m[short].sum()), dtype=np.int64)
                 - np.repeat(np.cumsum(m[short]) - m[short], m[short]))
        seg_h = h[g_cum[seg_d] + seg_i]
        order = np.lexsort((-seg_i, seg_h, seg_d))
        sd, sh_, si = seg_d[order], seg_h[order], seg_i[order]
        first = np.empty(sd.size, dtype=bool)
        first[0] = True
        first[1:] = sd[1:] != sd[:-1]
        out_d.append(ids[sd[first]])
        out_h.append(sh_[first])
        out_p.append(si[first])

    d = np.concatenate(out_d)
    fp = np.concatenate(out_h)
    p = np.concatenate(out_p)
    order = np.lexsort((p, fp, d))
    d, fp, p = d[order], fp[order], p[order]
    keep = np.ones(d.size, dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (fp[1:] != fp[:-1]) | (p[1:] != p[:-1])
    return pa.table({"doc_id": pa.array(d[keep], pa.int64()),
                     "fp": pa.array(fp[keep], pa.uint64()),
                     "pos": pa.array(p[keep], pa.int64())})


def winnow_fingerprints(sf_dir: str, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> pa.Table:
    """(doc_id, n_fp, fp_min, fp_xor): per-document winnowed-sketch
    summary — count, min hash, and the order-independent XOR fold of the
    distinct (fp, pos) picks (all pure integers; one bounded groupby)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rows = ds.map_batches(_winnow_batch_rows,
                          fn_kwargs={"k": k, "w": w},
                          batch_format="pyarrow", zero_copy_batch=True)

    def summarize(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_fp": pa.array([], pa.int64()),
                             "fp_min": pa.array([], pa.uint64()),
                             "fp_xor": pa.array([], pa.uint64())})
        d = tbl["doc_id"].to_numpy(zero_copy_only=False)
        fp = tbl["fp"].to_numpy(zero_copy_only=False)
        order = np.lexsort((fp, d))
        d, fp = d[order], fp[order]
        new = np.empty(d.size, dtype=bool)
        new[0] = True
        new[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, d.size))
        return pa.table({
            "doc_id": pa.array(d[starts], pa.int64()),
            "n_fp": pa.array(n.astype(np.int64), pa.int64()),
            "fp_min": pa.array(fp[starts], pa.uint64()),
            "fp_xor": pa.array(np.bitwise_xor.reduceat(fp, starts),
                               pa.uint64())})

    out = exchange_by_key(rows, "doc_id", summarize)
    parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not parts:
        return summarize(pa.table({n: [] for n in _FP_SCHEMA.names},
                                  schema=_FP_SCHEMA))
    return pa.concat_tables(parts, promote_options="default")


def _winnow_pair_rows_part(t: pa.Table) -> pa.Table:
    """Per-fp partition: one (a, b) row per (pair, shared fp) — doc ids
    within a group are distinct, so no within-group dedup is needed and
    multiplicity across fps is preserved for the count."""
    if t.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    fp = t["fp"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, fp))
    ids, fp = ids[order], fp[order]
    change = np.empty(ids.size, dtype=bool)
    change[0] = True
    change[1:] = fp[1:] != fp[:-1]
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, ids.size))
    out_a, out_b = [], []
    for s, c in zip(starts[counts >= 2].tolist(),
                    counts[counts >= 2].tolist()):
        seg = ids[s:s + c]
        ia, ib = np.triu_indices(seg.size, k=1)
        out_a.append(seg[ia])
        out_b.append(seg[ib])
    if not out_a:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    return pa.table({"a": pa.array(np.concatenate(out_a), pa.int64()),
                     "b": pa.array(np.concatenate(out_b), pa.int64())})


def _pair_count_part(t: pa.Table, min_shared: int) -> pa.Table:
    """Pair-keyed partition: count shared fps per pair, filter."""
    if t.num_rows == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "n_shared": pa.array([], pa.int64())})
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    new = np.ones(a.size, dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    n = np.diff(np.append(starts, a.size))
    keep = n >= min_shared
    return pa.table({
        "doc_a": pa.array(a[starts][keep], pa.int64()),
        "doc_b": pa.array(b[starts][keep], pa.int64()),
        "n_shared": pa.array(n[keep].astype(np.int64), pa.int64())})


def winnow_overlap_pairs(sf_dir: str, k: int = WINNOW_K, w: int = WINNOW_W,
                         min_shared: int = MIN_SHARED):
    """(doc_a, doc_b, n_shared): unordered pairs sharing >=
    ``min_shared`` DISTINCT winnowed fingerprint hashes — MOSS-style
    local-overlap detection. Distinct (doc, fp) rows -> one fp exchange
    (per-group pair emit) -> one pair exchange (exact shared count)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def distinct_fp(batch: pa.Table) -> pa.Table:
        rows = _winnow_batch_rows(batch, k, w)
        d = rows["doc_id"].to_numpy(zero_copy_only=False)
        fp = rows["fp"].to_numpy(zero_copy_only=False)
        order = np.lexsort((fp, d))
        d, fp = d[order], fp[order]
        keep = np.ones(d.size, dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (fp[1:] != fp[:-1])
        return pa.table({"doc_id": pa.array(d[keep], pa.int64()),
                         "fp": pa.array(fp[keep], pa.uint64())})

    rows = ds.map_batches(distinct_fp, batch_format="pyarrow",
                          zero_copy_batch=True)
    pair_rows = exchange_by_key(rows, "fp", _winnow_pair_rows_part)
    return exchange_by_key(pair_rows, ["a", "b"], _pair_count_part,
                           proc_kwargs={"min_shared": min_shared})


def _winnow_ctes(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """Shared oracle CTEs ending in ``fps`` (DISTINCT doc_id, h, pos)."""
    return f"""
WITH wn_g AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
wn_ex AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         array_to_string(list_slice(w, CAST(u.i AS INTEGER) + 1,
                                    CAST(u.i AS INTEGER) + {k}), ' ')
           AS gram
  FROM wn_g, UNNEST(range(CASE WHEN len(w) < {k} THEN 1
                               ELSE len(w) - {k - 1} END)) u(i)),
wn_hashed AS (
  SELECT doc_id, pos,
         list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
                        [ascii(c)::HUGEINT FOR c IN string_split(gram, '')]),
           (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                     % 18446744073709551616::HUGEINT) AS h
  FROM wn_ex),
wn_m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m
         FROM wn_hashed GROUP BY 1),
wn_wj AS (
  SELECT doc_id, CAST(u.j AS BIGINT) AS j,
         CASE WHEN m <= {w} THEN m ELSE {w} END AS L
  FROM wn_m, UNNEST(range(CASE WHEN m <= {w} THEN 1
                               ELSE m - {w - 1} END)) u(j)),
wn_cand AS (
  SELECT wj.doc_id, wj.j, h.pos, h.h,
         row_number() OVER (PARTITION BY wj.doc_id, wj.j
                            ORDER BY h.h ASC, h.pos DESC) AS rn
  FROM wn_wj wj JOIN wn_hashed h ON h.doc_id = wj.doc_id
       AND h.pos >= wj.j AND h.pos < wj.j + wj.L),
fps AS (SELECT DISTINCT doc_id, h, pos FROM wn_cand WHERE rn = 1)"""


def winnow_fingerprints_sql(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    return f"""{_winnow_ctes(k, w)}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
       CAST(min(h) AS UBIGINT) AS fp_min,
       CAST(bit_xor(CAST(h AS UBIGINT)) AS UBIGINT) AS fp_xor
FROM fps GROUP BY doc_id"""


def winnow_overlap_pairs_sql(k: int = WINNOW_K, w: int = WINNOW_W,
                             min_shared: int = MIN_SHARED) -> str:
    return f"""{_winnow_ctes(k, w)},
wn_fph AS (SELECT DISTINCT doc_id, h FROM fps)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM wn_fph a JOIN wn_fph b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_shared}"""
