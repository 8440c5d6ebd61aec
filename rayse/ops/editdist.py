"""Edit-distance verified near-duplicate pairs over SNM blocks.

The character-level fuzzy-dedup verifier — the complement of the
word-set Jaccard verify (`rayse/ops/snm.py` / `dedup.verify_pairs`):
for every SNM candidate pair, compute the exact (unit-cost) Levenshtein
distance between the two texts and keep pairs within ``MAX_DIST``.
Catches the small-insertions/typo duplicates token-set measures miss.

Algorithm: the classic DP with every ROW fully vectorized — the
insertion chain (the within-row sequential dependency) collapses to a
prefix-min via

    d[j] = min_k<=j (inter[k] + (j-k)) = (prefix-min of inter[k]-k) + j

so one pair costs len_a vector ops over len_b, no per-cell Python.
An early-out abandons a pair when a full row's minimum exceeds
``MAX_DIST`` (the band bound: distance only grows).

Distributed shape: candidates come from the SNM owner+halo exchange;
text hydration through the same TWO co-partitioned ``hash_join`` passes
as `rayse/ops/linkage.py`; the DP runs pair-local inside ``map_batches``
— per-pair work on candidate-bounded rows, the contract of every
verify stage in the dedup family.

Oracle: DuckDB's built-in ``levenshtein`` over the same candidate CTE —
unit-cost edit distance is implementation-independent, so the match is
bit-exact.

Reference relationship: the reference dedups by exact URL only; this is
the graded character-level verifier above its store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_DIST = 40


def levenshtein_np(a: str, b: str, cap: int | None = None) -> int:
    """Exact unit-cost Levenshtein with row-vectorized DP; returns
    cap + 1 early when a row's minimum exceeds ``cap``."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    idx = np.arange(len(b) + 1, dtype=np.int64)
    for i, ch in enumerate(a):
        ca = ord(ch)
        inter = np.empty(len(b) + 1, dtype=np.int64)
        inter[0] = i + 1
        sub = prev[:-1] + (bb != ca)
        dele = prev[1:] + 1
        inter[1:] = np.minimum(sub, dele)
        # insertion chain: prefix-min of (inter - idx) + idx
        d = np.minimum.accumulate(inter - idx) + idx
        if cap is not None and d.min() > cap:
            return cap + 1
        prev = d
    return int(prev[-1])


def _dist_batch(batch: pa.Table) -> pa.Table:
    da = batch["a"].to_numpy(zero_copy_only=False)
    db = batch["b"].to_numpy(zero_copy_only=False)
    ta = batch["text_a"].to_pylist()
    tb = batch["text"].to_pylist()
    out_a, out_b, out_d = [], [], []
    for i in range(len(ta)):
        d = levenshtein_np(ta[i] or "", tb[i] or "", cap=MAX_DIST)
        if d <= MAX_DIST:
            out_a.append(int(da[i]))
            out_b.append(int(db[i]))
            out_d.append(d)
    return pa.table({
        "doc_a": pa.array(out_a, pa.int64()),
        "doc_b": pa.array(out_b, pa.int64()),
        "dist": pa.array(out_d, pa.int64()),
    })


def editdist_pairs(sf_dir: str) -> pa.Table:
    """(doc_a, doc_b, dist): SNM candidate pairs within MAX_DIST
    Levenshtein edits — DuckDB hash-matched against the built-in
    levenshtein oracle."""
    import ray
    import ray.data as rd

    from .exchange import hash_join
    from .snm import snm_candidates

    cand = snm_candidates(sf_dir)
    texts = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    ja = hash_join(cand, texts, "a", "doc_id")

    def rename_a(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch["a"], "b": batch["b"],
                         "text_a": batch["text"]})

    texts2 = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
    jb = hash_join(ja.map_batches(rename_a, batch_format="pyarrow"),
                   texts2, "b", "doc_id")
    out = jb.map_batches(_dist_batch, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    return tbl.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


def editdist_pairs_sql() -> str:
    from .snm import SNM_WINDOW, _skey_sql

    return f"""
WITH k AS (SELECT doc_id, {_skey_sql()} AS skey FROM documents),
rk AS (SELECT doc_id,
              row_number() OVER (ORDER BY skey, doc_id) AS r
       FROM k),
cand AS (
  SELECT least(a.doc_id, b.doc_id) AS doc_a,
         greatest(a.doc_id, b.doc_id) AS doc_b
  FROM rk a JOIN rk b ON b.r > a.r AND b.r < a.r + {SNM_WINDOW})
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS dist
FROM cand c
JOIN documents da ON da.doc_id = c.doc_a
JOIN documents db ON db.doc_id = c.doc_b
WHERE levenshtein(da.text, db.text) <= {MAX_DIST}
ORDER BY c.doc_a, c.doc_b
"""
