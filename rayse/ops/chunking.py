"""Sliding-window document chunking — the retrieval-corpus prep step
(RAG indexing, long-document embedding) that splits every document into
fixed-size token windows with overlap.

Rule (deterministic, both engines): with chunk size C tokens and
stride S (< C, so consecutive chunks overlap by C - S):

    n_chunks = 1                       if n <= C
             = 1 + ceil((n - C) / S)   otherwise
    chunk_i  = tokens[i*S : i*S + C]   (the last chunk is shorter)

Scale shape: purely row-local — one numpy space-scan per batch, chunk
boundaries computed vectorized over all docs at once (no per-doc Python
loop), output rows stream. This is the map-side complement of
`packing.pack_sequences` (which concatenates ACROSS docs for training;
chunking splits WITHIN docs for retrieval).

Reference relationship: the reference indexes whole pages
(`IndexerService.java` has no sub-document granularity); chunking is
the beyond-reference step a vector/RAG serving layer needs.

Oracle: UNNEST(range(n_chunks)) + list_slice + array_to_string —
bit-exact string equality.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def chunk_documents(sf_dir: str, size: int = CHUNK_TOKENS,
                    stride: int = CHUNK_STRIDE):
    """Dataset of (doc_id, chunk_idx, n_chunk_tokens, chunk_text)."""
    import ray.data as rd

    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size")
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def batch_fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "n_chunk_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        per_doc = [(t or "").split(" ") for t in texts]
        n = np.array([len(p) for p in per_doc], np.int64)
        n_chunks = np.where(n <= size, 1,
                            1 + (n - size + stride - 1) // stride)
        d_idx = np.repeat(np.arange(len(per_doc), dtype=np.int64),
                          n_chunks)
        starts_off = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        ci = (np.arange(int(n_chunks.sum()), dtype=np.int64)
              - starts_off[d_idx])
        cstart = ci * stride
        cend = np.minimum(cstart + size, n[d_idx])
        out_txt = [" ".join(per_doc[d][s:e]) for d, s, e in
                   zip(d_idx.tolist(), cstart.tolist(), cend.tolist())]
        return pa.table({
            "doc_id": pa.array(ids[d_idx], pa.int64()),
            "chunk_idx": pa.array(ci, pa.int64()),
            "n_chunk_tokens": pa.array(cend - cstart, pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string())})

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def chunk_documents_sql(size: int = CHUNK_TOKENS,
                        stride: int = CHUNK_STRIDE) -> str:
    return f"""
WITH ck_t AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents),
ck_n AS (
  SELECT doc_id, w, n,
         CASE WHEN n <= {size} THEN 1
              ELSE 1 + (n - {size} + {stride - 1}) // {stride}
         END AS n_chunks
  FROM ck_t)
SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
       CAST(least(CAST(u.i AS BIGINT) * {stride} + {size}, n)
            - CAST(u.i AS BIGINT) * {stride} AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(
         list_slice(w, CAST(u.i AS BIGINT) * {stride} + 1,
                    least(CAST(u.i AS BIGINT) * {stride} + {size}, n)),
         ' ') AS chunk_text
FROM ck_n, UNNEST(range(n_chunks)) u(i)"""
