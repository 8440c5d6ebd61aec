"""Sorted-neighborhood near-duplicate blocking (Hernandez & Stolfo 1995
— the merge/purge method).

The third blocking family next to LSH (minhash/simhash bands) and
prefix filtering (PPJoin): sort the corpus by a cheap blocking key and
compare only records within a sliding window of ``window`` positions.
Where LSH recall depends on signature collisions and PPJoin cost on
shingle-df skew, SNM is *rank-local*: candidate volume is exactly
``(window-1) * n`` regardless of key skew — the predictable-budget
blocker a cleaning pipeline schedules first.

Blocking key here: the first 7 bytes of the text packed big-endian into
a non-negative int64 (ASCII corpus: byte order == lexicographic order
of the prefix, and the DuckDB mirror's per-char ``ascii()`` fold is
identical; short texts zero-pad on both sides).

Scale shape (no global sort materialization):

1. exact global rank by (key, doc_id) via the curriculum machinery
   (`rayse.ops.curriculum._ranked_by_key`: bounded range histogram +
   one range-keyed exchange) — the zip-with-index Ray Data lacks.
2. window candidates from ONE bucket exchange: each row lands in its
   own rank-bucket as OWNER and in the previous bucket as HALO context
   (bucket width ``B >= window - 1``), so every pair's lower-rank
   member sees its full forward window partition-locally — the same
   owner+halo idiom as `relational.trailing_window_counts`.
3. exact word-set Jaccard verification through the dedup family's
   routed ``verify_pairs`` (broadcast below / hash-join above the
   candidate threshold) — candidates never queue on the driver.

Reference relationship: the reference dedups only by exact URL
uniqueness (`Crawler/ServeDataBase.java` unique constraint); SNM is the
classic bounded-cost near-dup blocker its crawl store lacks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SNM_WINDOW = 8
SNM_BUCKET = 1024
KEY_BYTES = 7
RANK_SHIFT_SNM = 40          # 56-bit keys -> buckets by first ~2 chars


def _prefix_key_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, skey): first-KEY_BYTES big-endian int64 blocking key,
    vectorized over the batch's UTF-8 buffer (7 gathers, no row loop)."""
    from .textstats import _word_arr_slices

    texts = np.asarray(
        ["" if t is None else t for t in batch["text"].to_pylist()],
        dtype=object)
    buf, starts, lens = _word_arr_slices(texts)
    key = np.zeros(texts.size, dtype=np.int64)
    for j in range(KEY_BYTES):
        have = lens > j
        b = np.zeros(texts.size, dtype=np.int64)
        b[have] = buf[starts[have] + j]
        key = key * 256 + b
    return pa.table({"doc_id": batch["doc_id"],
                     "skey": pa.array(key, pa.int64())})


def _snm_window_part(tbl: pa.Table, window: int = SNM_WINDOW,
                     bucket: int = SNM_BUCKET) -> pa.Table:
    """All rank-buckets this partition owns: sort by rank, emit every
    pair whose lower-rank member is an OWNER row here and whose rank
    distance is < ``window`` (halo rows are context only)."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    rank = tbl["rank"].to_numpy(zero_copy_only=False)
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    bkt = tbl["bkt"].to_numpy(zero_copy_only=False)
    owner = tbl["owner"].to_numpy(zero_copy_only=False)
    order = np.lexsort((owner, rank, bkt))   # halo dup sorts first
    out_a, out_b = [], []
    # per distinct bucket in this partition: its rows sorted by rank
    b_s = bkt[order]
    new = np.empty(b_s.size, dtype=bool)
    new[0] = True
    new[1:] = b_s[1:] != b_s[:-1]
    seg = np.flatnonzero(new).tolist() + [b_s.size]
    for s, e in zip(seg[:-1], seg[1:]):
        idx = order[s:e]
        r = rank[idx]
        d = doc[idx]
        ow = owner[idx]
        # rows are rank-sorted within the segment (dedupe halo/owner
        # duplicates of the same rank: keep one copy, owner flag OR'd
        # is unnecessary — a rank appears at most once per bucket key)
        for off in range(1, window):
            if off >= r.size:
                break
            lo = slice(0, r.size - off)
            hi = slice(off, r.size)
            ok = ow[lo] & (r[hi] - r[lo] == off)
            la, lb = d[lo][ok], d[hi][ok]
            out_a.append(np.minimum(la, lb))
            out_b.append(np.maximum(la, lb))
    if not out_a:
        return empty
    return pa.table({"a": pa.array(np.concatenate(out_a), pa.int64()),
                     "b": pa.array(np.concatenate(out_b), pa.int64())})


def snm_candidates(sf_dir: str, window: int = SNM_WINDOW,
                   bucket: int = SNM_BUCKET):
    """Dataset of (a, b) candidate pairs within ``window`` positions of
    the (skey, doc_id) global order."""
    import ray.data as rd

    from .curriculum import _ranked_by_key
    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    keyed = ds.map_batches(_prefix_key_batch, batch_format="pyarrow")
    ranked = _ranked_by_key(keyed, "skey", shift=RANK_SHIFT_SNM)

    def owner_halo(batch: pa.Table) -> pa.Table:
        r = batch["rank"].to_numpy(zero_copy_only=False)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        bkt = r // bucket
        halo = (r % bucket) < (window - 1)
        return pa.table({
            "doc_id": pa.array(np.concatenate((d, d[halo])), pa.int64()),
            "rank": pa.array(np.concatenate((r, r[halo])), pa.int64()),
            "bkt": pa.array(np.concatenate((bkt, bkt[halo] - 1)),
                            pa.int64()),
            "owner": pa.array(np.concatenate(
                (np.ones(r.size, bool), np.zeros(int(halo.sum()), bool))),
                pa.bool_()),
        })

    stamped = ranked.map_batches(owner_halo, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return exchange_by_key(stamped, "bkt", _snm_window_part,
                           proc_kwargs={"window": window,
                                        "bucket": bucket})


def snm_pairs(sf_dir: str, window: int = SNM_WINDOW,
              threshold: float = 0.9):
    """(doc_a, doc_b) Dataset: SNM candidates verified by exact
    word-set Jaccard >= ``threshold`` (shingle_k=1) through the routed
    ``verify_pairs`` (same final verify as ``jaccard_pairs``)."""
    from .dedup import verify_pairs

    cand = snm_candidates(sf_dir, window=window)
    return verify_pairs(sf_dir, cand, shingle_k=1, threshold=threshold)


def _skey_sql(col: str = "text") -> str:
    terms = " + ".join(
        f"ascii(substr({col}, {i + 1}, 1)) * {256 ** (KEY_BYTES - 1 - i)}"
        for i in range(KEY_BYTES))
    return f"CAST({terms} AS BIGINT)"


def snm_pairs_sql(window: int = SNM_WINDOW,
                  threshold: float = 0.9) -> str:
    """Oracle for ``snm_pairs``: row_number over (skey, doc_id), rank
    self-join within the window, exact list-Jaccard filter."""
    return f"""
WITH k AS (SELECT doc_id, {_skey_sql()} AS skey FROM documents),
rk AS (SELECT doc_id,
              row_number() OVER (ORDER BY skey, doc_id) AS r
       FROM k),
cand AS (
  SELECT least(a.doc_id, b.doc_id) AS doc_a,
         greatest(a.doc_id, b.doc_id) AS doc_b
  FROM rk a JOIN rk b ON b.r > a.r AND b.r < a.r + {window}),
toks AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
         FROM documents)
SELECT DISTINCT c.doc_a, c.doc_b
FROM cand c
JOIN toks ta ON ta.doc_id = c.doc_a
JOIN toks tb ON tb.doc_id = c.doc_b
WHERE CAST(len(list_intersect(ta.s, tb.s)) AS DOUBLE)
      / len(list_distinct(ta.s || tb.s)) >= {threshold}
ORDER BY doc_a, doc_b"""
