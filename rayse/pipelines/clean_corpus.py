"""End-to-end training-corpus cleaning pipeline — the composition a
reference user would actually run before training: exact dedup, near-dup
removal, LM-quality filtering, and deterministic downsampling, ending in
a kept-document set (and optionally a cleaned partitioned-Parquet
corpus).

Every stage reuses a hash-green operator unchanged:

1. exact keep   — lowest doc_id per distinct text (`dedup_exact`
   semantics);
2. near-dup keep — keep-first per connected component of the verified
   Jaccard pair graph (`dedup.near_dedup_keep`);
3. quality keep — unigram-LM NLL at most ``nll_max``
   (`textstats.unigram_nll`, integer-exact);
4. sample keep  — splitmix64(doc_id) % 100 < rate (`sampling`).

The intersection is computed WITHOUT driver-side id sets: each stage
emits (doc_id, src) marker rows, one partitioned exchange by doc_id
counts distinct sources per id, and ids present in all four survive. The
optional corpus rewrite routes document rows and keep markers through a
second exchange by doc_id (text never reaches the driver) and writes
partitioned Parquet (one file per exchange partition — downstream
consumers can restart per file; mid-run resume itself is the index
build's manifest protocol, not re-implemented here).

The DuckDB oracle (`clean_corpus_sql`) composes the same four stages'
oracles as subqueries — any stage drifting from its green sibling
hash-mismatches loudly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_NLL_MAX = 34_100_000      # ~p90 of the synthetic corpus
DEFAULT_SAMPLE_RATE = 80          # keep 80%


def _keep_count_partition(tbl: pa.Table, n_sources: int) -> pa.Table:
    """doc_ids appearing in ALL ``n_sources`` marker streams (each stage
    emits an id at most once, so a plain row count equals the source
    count)."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    s = ids[order]
    new = np.empty(s.size, dtype=bool)
    new[0] = True
    new[1:] = s[1:] != s[:-1]
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, s.size))
    return pa.table({"doc_id": pa.array(s[starts][cnt == n_sources],
                                        pa.int64())})


def _hydrate_partition(tbl: pa.Table) -> pa.Table:
    """Document rows + keep markers (doc rows carry text, markers have
    text = null) -> kept document rows."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "lang": pa.array([], pa.string()),
                         "text": pa.array([], pa.string())})
    is_marker = pa.compute.is_null(tbl["text"]).to_numpy(
        zero_copy_only=False)
    keep_ids = np.unique(
        tbl["doc_id"].to_numpy(zero_copy_only=False)[is_marker])
    docs = tbl.filter(pa.array(~is_marker))
    ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    mask = np.isin(ids, keep_ids)
    return docs.filter(pa.array(mask)).select(["doc_id", "lang", "text"])


def clean_corpus(sf_dir: str, out_dir: str | None = None,
                 near_threshold: float = 0.9, shingle_k: int = 1,
                 nll_max: int = DEFAULT_NLL_MAX,
                 sample_rate: int = DEFAULT_SAMPLE_RATE):
    """Run the four-stage cleaning pass; returns the kept (doc_id)
    Dataset. With ``out_dir`` the cleaned corpus is also written as
    partitioned Parquet (resumable at the partition level)."""
    import ray.data as rd

    from ..ops.dedup import near_dedup_keep
    from ..ops.exchange import exchange_by_key
    from ..ops.sampling import hash_sample_batch
    from ..ops.textstats import unigram_nll

    def tag(src: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
                "src": pa.array(np.full(batch.num_rows, src, np.int8),
                                pa.int8()),
            })
        return f

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    # stage 1: exact keep (min doc_id per content hash — dedup_exact shape)
    import hashlib

    def content_hash(batch: pa.Table) -> pa.Table:
        h = [int.from_bytes(hashlib.sha1(t.encode()).digest()[:8],
                            "big") >> 1
             for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "h": pa.array(h, pa.int64())})

    exact = (docs.map_batches(content_hash, batch_format="pyarrow",
                              zero_copy_batch=True)
             .groupby("h").min("doc_id")
             .map_batches(lambda b: pa.table(
                 {"doc_id": b["min(doc_id)"]}), batch_format="pyarrow"))

    # stage 2-4: reuse the green operators unchanged
    near = near_dedup_keep(sf_dir, shingle_k=shingle_k,
                           threshold=near_threshold)
    def q_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.less_equal(batch["nll_q"], nll_max))

    quality = unigram_nll(sf_dir).map_batches(q_filter,
                                              batch_format="pyarrow")
    sample = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang"]).map_batches(
        hash_sample_batch, fn_kwargs={"rate": sample_rate},
        batch_format="pyarrow", zero_copy_batch=True)

    markers = (exact.map_batches(tag(0), batch_format="pyarrow")
               .union(near.map_batches(tag(1), batch_format="pyarrow"))
               .union(quality.map_batches(tag(2), batch_format="pyarrow"))
               .union(sample.map_batches(tag(3), batch_format="pyarrow")))
    kept = exchange_by_key(markers, "doc_id", _keep_count_partition,
                           proc_kwargs={"n_sources": 4})

    if out_dir is not None:
        full = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

        def as_marker(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "doc_id": batch["doc_id"],
                "lang": pa.array([None] * n, pa.string()),
                "text": pa.array([None] * n, pa.string()),
            })

        cleaned = exchange_by_key(
            full.union(kept.map_batches(as_marker,
                                        batch_format="pyarrow")),
            "doc_id", _hydrate_partition)
        cleaned.write_parquet(out_dir)
    return kept


def clean_corpus_sql(near_threshold: float = 0.9,
                     nll_max: int = DEFAULT_NLL_MAX,
                     sample_rate: int = DEFAULT_SAMPLE_RATE) -> str:
    """Oracle: the four stage oracles composed as subqueries."""
    from ..ops.dedup import near_dedup_keep_sql
    from ..ops.sampling import _mix_sql
    from ..ops.textstats import unigram_nll_sql

    return f"""
SELECT d.doc_id FROM documents d
WHERE d.doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)
  AND d.doc_id IN (SELECT doc_id FROM ({near_dedup_keep_sql(
        near_threshold)}) t1)
  AND d.doc_id IN (SELECT doc_id FROM ({unigram_nll_sql()}) t2
                   WHERE nll_q <= {nll_max})
  AND {_mix_sql("d.doc_id")} % 100 < {sample_rate}"""
