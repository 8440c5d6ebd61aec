"""Sequence packing — the concat-and-chunk step of an LLM pretraining
pipeline: all documents' tokens are conceptually concatenated in doc_id
order and cut into fixed-length training sequences; each document maps to
the (sequence, offset) ranges it lands in.

This is a distributed PREFIX-SUM (scan) pattern: the only global state is
one running token total per doc_id-range bucket.

1. row-local pass: per-doc whitespace token counts, stamped with
   ``bucket = doc_id // bucket_size`` (doc_id ranges are the ordered
   partitioning — packing needs SOME deterministic order and doc_id is
   the corpus order);
2. a tiny aggregate: per-bucket token totals -> the driver computes the
   exclusive prefix over BUCKETS (corpus/bucket_size integers — the
   classic scan carry, bounded driver state, documented);
3. one exchange by bucket: each partition sorts its buckets' docs by
   doc_id, local exclusive cumsum + the bucket carry gives every doc its
   global token start, and the (doc, sequence) overlap rows expand
   vectorized (a doc spanning sequences s0..s1 emits one row per
   sequence).

Everything is int64 arithmetic, so the DuckDB oracle (window sum over
doc_id order + UNNEST(range) expansion) matches bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_SEQ_LEN = 256


def _tok_counts_batch(batch: pa.Table, bucket_size: int) -> pa.Table:
    import pyarrow.compute as pc

    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    n = pc.add(pc.count_substring(batch["text"], " "), 1)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "bucket": pa.array(ids // bucket_size, pa.int64()),
        "n": pc.cast(n, pa.int64()),
    })


def _pack_partition(tbl: pa.Table, seq_len: int,
                    carries: dict) -> pa.Table:
    """All (doc_id, bucket, n) rows of this partition's buckets -> the
    (doc, sequence) overlap rows, using the broadcast per-bucket carry
    (global token count before the bucket)."""
    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "seq_id": pa.array([], pa.int64()),
        "doc_off": pa.array([], pa.int64()),
        "seq_off": pa.array([], pa.int64()),
        "n_toks": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    bucket = tbl["bucket"].to_numpy(zero_copy_only=False)
    n = tbl["n"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bucket))
    ids, bucket, n = ids[order], bucket[order], n[order]
    # exclusive cumsum within each bucket + the bucket's global carry
    cs = np.cumsum(n) - n
    new = np.empty(ids.size, dtype=bool)
    new[0] = True
    new[1:] = bucket[1:] != bucket[:-1]
    base = np.repeat(cs[np.flatnonzero(new)], np.diff(
        np.append(np.flatnonzero(new), ids.size)))
    carry = np.fromiter((carries[int(b)] for b in bucket[new].tolist()),
                        dtype=np.int64, count=int(new.sum()))
    start = cs - base + np.repeat(carry, np.diff(
        np.append(np.flatnonzero(new), ids.size)))
    s0 = start // seq_len
    s1 = (start + n - 1) // seq_len
    reps = (s1 - s0 + 1).astype(np.int64)
    total = int(reps.sum())
    d_rep = np.repeat(np.arange(ids.size), reps)
    k = (s0[d_rep] + np.arange(total)
         - np.repeat(np.cumsum(reps) - reps, reps))
    seg_lo = np.maximum(start[d_rep], k * seq_len)
    seg_hi = np.minimum(start[d_rep] + n[d_rep], (k + 1) * seq_len)
    return pa.table({
        "doc_id": pa.array(ids[d_rep], pa.int64()),
        "seq_id": pa.array(k, pa.int64()),
        "doc_off": pa.array(seg_lo - start[d_rep], pa.int64()),
        "seq_off": pa.array(seg_lo - k * seq_len, pa.int64()),
        "n_toks": pa.array(seg_hi - seg_lo, pa.int64()),
    })


def _pack_from_counts(counts, seq_len: int):
    """Shared tail of every packing pipeline: materialize the (doc_id,
    bucket, n) counts, compute the per-bucket scan carry on the driver
    (one int per doc_id-range bucket), and expand the (doc, sequence)
    overlap rows through one exchange by bucket."""
    from .exchange import exchange_by_key

    counts = counts.materialize()
    totals = {int(r["bucket"]): int(r["sum(n)"])
              for r in counts.groupby("bucket").sum("n").take_all()}
    carries, run = {}, 0
    for b in sorted(totals):
        carries[b] = run
        run += totals[b]
    return exchange_by_key(counts, "bucket", _pack_partition,
                           proc_kwargs={"seq_len": seq_len,
                                        "carries": carries})


def pack_sequences(sf_dir: str, seq_len: int = DEFAULT_SEQ_LEN,
                   bucket_size: int = 100_000):
    """(doc_id, seq_id, doc_off, seq_off, n_toks) for every (document,
    training-sequence) overlap under concat-and-chunk packing in doc_id
    order."""
    import ray.data as rd

    counts = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_tok_counts_batch, fn_kwargs={"bucket_size": bucket_size},
                  batch_format="pyarrow", zero_copy_batch=True)
    return _pack_from_counts(counts, seq_len)


def pack_clean_corpus(sf_dir: str, seq_len: int = DEFAULT_SEQ_LEN,
                      bucket_size: int = 100_000):
    """The end-to-end link a pretraining pipeline actually runs: pack
    the CLEANED corpus — `pipelines.clean_corpus` (exact dedup ∘
    near-dup ∘ quality ∘ sample) feeds its kept-id Dataset into the
    packer through a LEFT SEMI `exchange.hash_join` (no driver-side id
    set; survivors keep their doc_id concat order). Oracle = the pack
    window-sum over documents joined to the composed cleaning oracle."""
    import ray.data as rd

    from ..pipelines.clean_corpus import clean_corpus
    from .exchange import hash_join

    kept = clean_corpus(sf_dir)
    counts = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_tok_counts_batch, fn_kwargs={"bucket_size": bucket_size},
                  batch_format="pyarrow", zero_copy_batch=True)
    counts = hash_join(counts, kept, "doc_id", "doc_id",
                       join_type="left semi")
    return _pack_from_counts(counts, seq_len)


def pack_sequences_sql(seq_len: int = DEFAULT_SEQ_LEN,
                       doc_src: str = "documents") -> str:
    """Oracle for ``pack_sequences``: window sum in doc_id order + range
    expansion; pure int64 arithmetic end to end. ``doc_src`` swaps the
    corpus for a filtered subquery (the pack_clean_corpus composition)."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM {doc_src}),
c AS (
  SELECT doc_id, n,
         CAST(sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n
              AS BIGINT) AS start
  FROM t),
e AS (
  SELECT doc_id, n, start,
         start // {seq_len} AS s0,
         (start + n - 1) // {seq_len} AS s1
  FROM c)
SELECT doc_id,
       CAST(e.s0 + u.i AS BIGINT) AS seq_id,
       CAST(greatest(e.start, (e.s0 + u.i) * {seq_len}) - e.start
            AS BIGINT) AS doc_off,
       CAST(greatest(e.start, (e.s0 + u.i) * {seq_len})
            - (e.s0 + u.i) * {seq_len} AS BIGINT) AS seq_off,
       CAST(least(e.start + e.n, (e.s0 + u.i + 1) * {seq_len})
            - greatest(e.start, (e.s0 + u.i) * {seq_len}) AS BIGINT)
         AS n_toks
FROM e, UNNEST(range(e.s1 - e.s0 + 1)) u(i)"""


def pack_clean_corpus_sql(seq_len: int = DEFAULT_SEQ_LEN) -> str:
    """Composed oracle: the packing window-sum over documents restricted
    to the cleaning pipeline\'s kept set."""
    from ..pipelines.clean_corpus import clean_corpus_sql

    kept = clean_corpus_sql()
    return pack_sequences_sql(
        seq_len,
        doc_src=f"(SELECT d2.doc_id, d2.text FROM documents d2 "
                f"JOIN (\n{kept}\n) kc USING (doc_id))")
