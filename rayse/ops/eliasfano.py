"""Elias–Fano vs Elias-gamma postings-size audit — the quasi-succinct
encoding question (Vigna 2013 "Quasi-succinct indices"; the encoding
modern engines pick over gap codes): EF's size depends ONLY on
(df, universe) — n·l + n + (U >> l) bits with l = max(0,
⌊log₂(U/n)⌋) — while gamma pays per actual gap (Σ 2·bit_length(g)−1
over the delta-gapped posting list, 64-bit absolute head). The audit
reports both per term and who wins — the number an index-format
decision is made on (completes `idxplan`'s varint/gamma accounting
with the succinct contender).

Distributed shape: distinct (word, doc) pairs fold per batch; the
per-term gap walk runs inside the term groupby (posting-list-bounded,
the exchange contract); EF needs only (df, U). All integers —
bit_length via the shift ladder, `length(bin())` in SQL.

Reference relationship: the reference stores postings as PostgreSQL
rows (`InvertedIndex.java`) — no encoding choice exists there; this
is the decision surface a segment index actually has.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketch import _bit_length_u64


def ef_gamma_audit(sf_dir: str) -> pa.Table:
    """(word, df, ef_bits, gamma_bits, winner) over the whitespace
    vocabulary, universe = doc count — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    n_docs = ds.count()

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_w, out_d = [], []
        for did, t in zip(ids.tolist(), texts):
            for w in set((t or "").split(" ")):
                out_w.append(w)
                out_d.append(int(did))
        return pa.table({"word": pa.array(out_w, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64())})

    def per_term(group: pa.Table) -> pa.Table:
        docs = np.sort(np.unique(
            group["doc_id"].to_numpy(zero_copy_only=False)))
        n = docs.size
        l = max(0, int(_bit_length_u64(
            np.asarray([n_docs // n], np.uint64))[0]) - 1)
        ef = n * l + n + (n_docs >> l)
        gaps = np.diff(docs)
        gamma = 64 + int((2 * _bit_length_u64(
            gaps.astype(np.uint64)) - 1).sum())
        w = group["word"][0].as_py()
        return pa.table({
            "word": pa.array([w], pa.string()),
            "df": pa.array([n], pa.int64()),
            "ef_bits": pa.array([ef], pa.int64()),
            "gamma_bits": pa.array([gamma], pa.int64()),
            "winner": pa.array(
                ["ef" if ef < gamma else
                 "gamma" if gamma < ef else "tie"], pa.string()),
        })

    out = (ds.map_batches(pairs, batch_format="pyarrow")
           .groupby("word")
           .map_groups(per_term, batch_format="pyarrow"))
    df = out.to_pandas().sort_values("word").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def ef_gamma_audit_sql() -> str:
    return """
WITH tok AS (
  SELECT DISTINCT u.t AS word, doc_id
  FROM documents, UNNEST(string_split(text, ' ')) u(t)),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
dfs AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tok
        GROUP BY word),
lvals AS (
  SELECT word, df,
         greatest(CAST(length(bin((SELECT n_docs FROM nd) // df))
                       AS BIGINT) - 1, 0) AS l
  FROM dfs),
ef AS (
  SELECT word, df,
         df * l + df + ((SELECT n_docs FROM nd) >> CAST(l AS INTEGER))
           AS ef_bits
  FROM lvals),
gaps AS (
  SELECT word, doc_id,
         doc_id - lag(doc_id) OVER (PARTITION BY word
                                    ORDER BY doc_id) AS g
  FROM tok),
gamma AS (
  SELECT word,
         64 + CAST(coalesce(sum(2 * length(bin(g)) - 1), 0)
                   AS BIGINT) AS gamma_bits
  FROM gaps WHERE g IS NOT NULL GROUP BY word
  UNION ALL
  -- df = 1 terms have no gaps at all
  SELECT d.word, CAST(64 AS BIGINT) FROM dfs d
  WHERE d.df = 1)
SELECT e.word, e.df, CAST(e.ef_bits AS BIGINT) AS ef_bits,
       g.gamma_bits,
       CASE WHEN e.ef_bits < g.gamma_bits THEN 'ef'
            WHEN g.gamma_bits < e.ef_bits THEN 'gamma'
            ELSE 'tie' END AS winner
FROM ef e JOIN gamma g USING (word)
ORDER BY e.word"""
