"""Feature hashing (the hashing trick, Weinberger et al. 2009) — the
fixed-width vectorizer a streaming trainer uses instead of a vocabulary
dictionary: bucket = FNV-1a(word) mod B, sign = ±1 from an independent
hash bit, feature value = signed occurrence sum. No global state, no
vocabulary shuffle — the whole vectorization is row-local (the entire
point of the trick at 100 TB), and the output streams back as a
Dataset of sparse (doc_id, bucket, val) rows.

Exactness: FNV-1a is the repo's SQL-expressible string hash
(`textstats.fnv64_slices` / `c4clean._fnv_expr`), the sign bit is
bit 32 of the same hash, sums are int64 — bit-for-bit DuckDB parity
(ASCII-corpus caveat as `fingerprints`).

Reference relationship: none (ML feature-prep family; the dictionary
path it replaces is the `words` table, `Indexer/Entities/Word.java`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FH_BUCKETS = 64


def feature_hash_vectors(sf_dir: str, b: int = FH_BUCKETS):
    """Dataset of (doc_id, bucket, val): signed hashed bag-of-words
    features, zero rows dropped — DuckDB hash-matched."""
    import ray.data as rd

    from .textstats import _word_arr_slices, fnv64_slices

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        texts = batch["text"].to_pylist()
        words = [np.asarray((t or "").split(" "), dtype=object)
                 for t in texts]
        n_tok = np.asarray([w.size for w in words], np.int64)
        if int(n_tok.sum()) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        flat = np.concatenate(words)
        h = fnv64_slices(*_word_arr_slices(flat))
        bucket = (h % np.uint64(b)).astype(np.int64)
        sign = np.where((h >> np.uint64(32)) & np.uint64(1) == 0,
                        1, -1).astype(np.int64)
        doc = np.repeat(ids, n_tok)
        key = doc * b + bucket
        uk, inv = np.unique(key, return_inverse=True)
        val = np.bincount(inv, sign, uk.size).astype(np.int64)
        nz = val != 0
        return pa.table({
            "doc_id": pa.array(uk[nz] // b, pa.int64()),
            "bucket": pa.array(uk[nz] % b, pa.int64()),
            "val": pa.array(val[nz], pa.int64()),
        })

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(batch_fn, batch_format="pyarrow",
                         zero_copy_batch=True))


def feature_hash_vectors_sql(b: int = FH_BUCKETS) -> str:
    from .c4clean import _fnv_expr

    fnv = _fnv_expr("word", 0xCBF29CE484222325)
    return f"""
WITH tok AS (
  SELECT doc_id, u.t AS word
  FROM documents, UNNEST(string_split(text, ' ')) u(t)),
hw AS (
  SELECT word, {fnv} AS h
  FROM (SELECT DISTINCT word FROM tok)),
sv AS (
  SELECT t.doc_id,
         CAST(hw.h % {b} AS BIGINT) AS bucket,
         CASE WHEN (hw.h // 4294967296::HUGEINT) % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM tok t JOIN hw USING (word))
SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS val
FROM sv GROUP BY 1, 2
HAVING sum(sgn) <> 0
ORDER BY doc_id, bucket"""
