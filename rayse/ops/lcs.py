"""Longest common subsequence between document pairs — the diff/merge
primitive (Hunt & McIlroy 1976; the alignment sibling of
`editdist.py`'s Levenshtein and `dtw.py`'s elastic distance: edit
distance counts CHANGES, LCS measures what SURVIVES — the quantity a
three-way merge or a near-dup explainer reports).

Pairs: consecutive doc-id pairs (2i, 2i+1) for the first PAIRS pairs;
sequences truncate to the first ``CAP`` whitespace tokens (the
docstring-honest bound that keeps the O(n·m) DP grid-sized). The DP
dp[i][j] = max(dp[i−1][j], dp[i][j−1], dp[i−1][j−1] + eq) runs
driver-side on the bounded grid after a doc-id-pushdown read of just
the paired rows; the oracle is the DTW-style recursive WAVEFRONT with
the MAX-semiring recurrence (frontier + halo carry, the two-deep
dependency pattern), token equality via the position-exploded text.

Reference relationship: none (text-diff family completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LCS_PAIRS = 3
LCS_CAP = 40


def _lcs(a: list, b: list) -> int:
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1), np.int64)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = max(dp[i - 1][j], dp[i][j - 1],
                           dp[i - 1][j - 1] + (a[i - 1] == b[j - 1]))
    return int(dp[n][m])


def lcs_pairs(sf_dir: str, pairs: int = LCS_PAIRS,
              cap: int = LCS_CAP) -> pa.Table:
    """(doc_a, doc_b, n_a, n_b, lcs): LCS of truncated token streams
    for consecutive doc pairs — DuckDB hash-matched."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    want = [i for p in range(pairs) for i in (2 * p, 2 * p + 1)]
    t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pc.field("doc_id").isin(want))
    texts = {int(i): (s or "").split(" ")[:cap]
             for i, s in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist())}
    out_a, out_b, out_na, out_nb, out_l = [], [], [], [], []
    for p in range(pairs):
        a, b = 2 * p, 2 * p + 1
        if a not in texts or b not in texts:
            continue
        ta, tb = texts[a], texts[b]
        out_a.append(a)
        out_b.append(b)
        out_na.append(len(ta))
        out_nb.append(len(tb))
        out_l.append(_lcs(ta, tb))
    return pa.table({
        "doc_a": pa.array(out_a, pa.int64()),
        "doc_b": pa.array(out_b, pa.int64()),
        "n_a": pa.array(out_na, pa.int64()),
        "n_b": pa.array(out_nb, pa.int64()),
        "lcs": pa.array(out_l, pa.int64()),
    })


def lcs_pairs_sql(pairs: int = LCS_PAIRS, cap: int = LCS_CAP) -> str:
    max_diag = 2 * cap
    return f"""
WITH RECURSIVE
pr AS (SELECT unnest(range({pairs})) AS p),
tok AS (
  SELECT d.doc_id, CAST(u.i AS BIGINT) + 1 AS pos,
         ws[CAST(u.i AS INTEGER) + 1] AS w
  FROM (SELECT doc_id,
               list_slice(string_split(text, ' '), 1, {cap}) AS ws
        FROM documents
        WHERE doc_id < {2 * pairs}) d,
       UNNEST(range(len(d.ws))) u(i)),
lens AS (
  SELECT p.p, 2 * p.p AS da, 2 * p.p + 1 AS db,
         (SELECT count(*) FROM tok WHERE doc_id = 2 * p.p) AS na,
         (SELECT count(*) FROM tok WHERE doc_id = 2 * p.p + 1) AS nb
  FROM pr p),
eq AS (
  SELECT l.p, a.pos AS i, b.pos AS j,
         CASE WHEN a.w = b.w THEN 1 ELSE 0 END AS e
  FROM lens l
       JOIN tok a ON a.doc_id = l.da
       JOIN tok b ON b.doc_id = l.db),
dp(p, i, j, val, step) AS (
  SELECT l.p, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM lens l
  UNION ALL
  SELECT * FROM (
    WITH cur AS (SELECT max(step) AS t FROM dp)
    -- borders of the next diagonal (val 0, no predecessors)
    SELECT l.p, CAST(0 AS BIGINT),
           CAST((SELECT t FROM cur) + 1 AS BIGINT),
           CAST(0 AS BIGINT),
           (SELECT t FROM cur) + 1
    FROM lens l WHERE (SELECT t FROM cur) + 1 <= l.nb
    UNION ALL
    SELECT l.p, CAST((SELECT t FROM cur) + 1 AS BIGINT),
           CAST(0 AS BIGINT), CAST(0 AS BIGINT),
           (SELECT t FROM cur) + 1
    FROM lens l WHERE (SELECT t FROM cur) + 1 <= l.na
    UNION ALL
    -- interior wavefront cells from frontier + halo predecessors
    SELECT c.p, c.i, c.j,
           greatest(
             coalesce(max(CASE WHEN pv.i = c.i - 1 AND pv.j = c.j
                               THEN pv.val END), 0),
             coalesce(max(CASE WHEN pv.i = c.i AND pv.j = c.j - 1
                               THEN pv.val END), 0),
             coalesce(max(CASE WHEN pv.i = c.i - 1
                               AND pv.j = c.j - 1
                               THEN pv.val + c.e END), 0)) AS val,
           (SELECT t FROM cur) + 1 AS step
    FROM eq c JOIN dp pv
      ON pv.p = c.p
     AND c.i + c.j = (SELECT t FROM cur) + 1
     AND ((pv.i = c.i - 1 AND pv.j = c.j)
          OR (pv.i = c.i AND pv.j = c.j - 1)
          OR (pv.i = c.i - 1 AND pv.j = c.j - 1))
    GROUP BY c.p, c.i, c.j, c.e
    UNION ALL
    -- halo: carry the frontier forward for the diagonal dependency
    SELECT d2.p, d2.i, d2.j, d2.val, d2.step + 1
    FROM dp d2
    WHERE d2.i + d2.j = d2.step AND d2.step + 1 <= {max_diag}))
SELECT l.da AS doc_a, l.db AS doc_b,
       CAST(l.na AS BIGINT) AS n_a, CAST(l.nb AS BIGINT) AS n_b,
       CAST(coalesce((SELECT max(d.val) FROM dp d
                      WHERE d.p = l.p AND d.i = l.na
                        AND d.j = l.nb), 0) AS BIGINT) AS lcs
FROM lens l ORDER BY doc_a"""
