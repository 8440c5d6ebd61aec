"""Exact Shapley data valuation over sources (Shapley 1953; Ghorbani
& Zou 2019 "Data Shapley") — the attribution question a data-mixing
pipeline actually asks: how much does each SOURCE contribute to
corpus coverage? Characteristic function v(S) = number of distinct
vocabulary words covered by the union of the PLAYER sources in S;
players = the first N_PLAYERS sources by name (exact Shapley is
exponential in players — the 2^n lattice stays constant-sized; a
full-source run would switch to the permutation-sampling estimator
behind the same fold) — and the value multiplies through by n! so every weight
|S|!·(n−|S|−1)! is an integer: shapley_x_nfact is EXACT, no floats.

Distributed shape: ONE (source, word) distinct fold (the vocabulary-
bounded broadcast contract); v(S) for all 2^n subsets folds the
bounded per-word source-BITMASK histogram (the `type_user_jaccard`
machinery — a word contributes to v(S) iff its source mask intersects
S), so the driver work is 2^n × |mask domain|, never row-sized.

Oracle: the identical bitmask lattice in SQL — per-word masks via
bit-OR aggregation, v(S) by mask intersection counts, the Shapley sum
unrolled over the subset range with integer factorial weights.

Reference relationship: none (data-valuation family, next to
`source_mix_weights` / `source_kl` / SE7z180's coverage greedy).
"""

from __future__ import annotations

from math import factorial

import numpy as np
import pyarrow as pa

N_PLAYERS = 6


def source_shapley(sf_dir: str) -> pa.Table:
    """(source, n_words_own, shapley_x_nfact): exact integer Shapley
    value (scaled by n!) of each source for vocabulary coverage —
    DuckDB hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        texts = batch["text"].to_pylist()
        out_s, out_w = [], []
        for s, t in zip(src.tolist(), texts):
            for w in set((t or "").split(" ")):
                out_s.append(str(s))
                out_w.append(w)
        return pa.table({"source": pa.array(out_s, pa.string()),
                         "word": pa.array(out_w, pa.string())})

    sw = (ds.map_batches(pairs, batch_format="pyarrow")
          .groupby(["source", "word"]).count())
    tbl = pa.concat_tables(
        [t for t in ray.get(sw.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    src = np.asarray(tbl["source"].to_pylist(), dtype=object)
    wrd = np.asarray(tbl["word"].to_pylist(), dtype=object)
    sources = sorted(set(src.tolist()))[:N_PLAYERS]
    keep = np.isin(src.astype(str), sources)
    src, wrd = src[keep], wrd[keep]
    n = len(sources)
    sidx = {s: i for i, s in enumerate(sources)}
    # per-word source bitmask histogram (bounded: 2^n masks)
    uw, winv = np.unique(wrd.astype(str), return_inverse=True)
    masks = np.zeros(uw.size, np.int64)
    for k in range(src.size):
        masks[winv[k]] |= 1 << sidx[str(src[k])]
    um, mcnt = np.unique(masks, return_counts=True)

    def v(subset: int) -> int:
        return int(mcnt[(um & subset) != 0].sum())

    nfact = factorial(n)
    out_s, out_own, out_val = [], [], []
    for i, s in enumerate(sources):
        bit = 1 << i
        total = 0
        for sub in range(1 << n):
            if sub & bit:
                continue
            size = bin(sub).count("1")
            w = factorial(size) * factorial(n - size - 1)
            total += w * (v(sub | bit) - v(sub))
        out_s.append(s)
        out_own.append(int(mcnt[(um & bit) != 0].sum()))
        out_val.append(total)
    return pa.table({
        "source": pa.array(out_s, pa.string()),
        "n_words_own": pa.array(out_own, pa.int64()),
        "shapley_x_nfact": pa.array(out_val, pa.int64()),
    })


def source_shapley_sql() -> str:
    return """
WITH sw AS (
  SELECT DISTINCT source, u.t AS word
  FROM documents, UNNEST(string_split(text, ' ')) u(t)),
srcs AS (
  SELECT source, row_number() OVER (ORDER BY source) - 1 AS i
  FROM (SELECT DISTINCT source FROM sw ORDER BY source
        LIMIT 6)),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM srcs),
wm AS (
  SELECT sw.word,
         CAST(bit_or(1 << CAST(s.i AS INTEGER)) AS BIGINT) AS mask
  FROM sw JOIN srcs s USING (source) GROUP BY sw.word),
-- only player rows survive the srcs join above
mh AS (SELECT mask, CAST(count(*) AS BIGINT) AS c FROM wm
       GROUP BY mask),
subs AS (SELECT CAST(unnest(range(1 << CAST((SELECT n FROM nn)
                                            AS INTEGER))) AS BIGINT)
           AS sub),
vs AS (
  SELECT s.sub,
         CAST(coalesce(sum(m.c), 0) AS BIGINT) AS v
  FROM subs s LEFT JOIN mh m ON (m.mask & s.sub) <> 0
  GROUP BY s.sub),
fact(k, f) AS (
  SELECT CAST(0 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL SELECT 1, 1 UNION ALL SELECT 2, 2
  UNION ALL SELECT 3, 6 UNION ALL SELECT 4, 24
  UNION ALL SELECT 5, 120 UNION ALL SELECT 6, 720
  UNION ALL SELECT 7, 5040),
contrib AS (
  SELECT sr.source, sr.i,
         fs.f * fns.f
           * (va.v - coalesce(vb.v, 0)) AS term
  FROM srcs sr
       JOIN subs s ON (s.sub & (1 << CAST(sr.i AS INTEGER))) = 0
       JOIN vs va ON va.sub = (s.sub | (1 << CAST(sr.i AS INTEGER)))
       LEFT JOIN vs vb ON vb.sub = s.sub
       JOIN fact fs ON fs.k = bit_count(CAST(s.sub AS BIGINT))
       JOIN fact fns ON fns.k = (SELECT n FROM nn)
                                - bit_count(CAST(s.sub AS BIGINT)) - 1),
own AS (
  SELECT sr.source,
         CAST(coalesce(sum(m.c), 0) AS BIGINT) AS n_words_own
  FROM srcs sr LEFT JOIN mh m
    ON (m.mask & (1 << CAST(sr.i AS INTEGER))) <> 0
  GROUP BY sr.source)
SELECT c.source, own.n_words_own,
       CAST(sum(c.term) AS BIGINT) AS shapley_x_nfact
FROM contrib c JOIN own USING (source)
GROUP BY c.source, own.n_words_own
ORDER BY c.source"""
