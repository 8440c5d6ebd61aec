"""0/1 knapsack document selection — the token-BUDGETED curation DP
(the exact counterpart of SE7z24's weighted sampling and SE7z180's
coverage greedy: pick documents maximizing total value under a hard
token budget, the "fill this context window best" problem). Items =
the first N_ITEMS docs; weight = whitespace token count, value =
distinct-word count (lexical richness); budget = BUDGET tokens.

The DP is the textbook per-item relaxation dp'(b) = max(dp(b),
dp(b−wᵢ) + vᵢ) — N_ITEMS iterations over a (BUDGET+1)-entry integer
array, all driver-side after a doc-id-pushdown read of just the item
rows (grid-sized state; at corpus scale item CANDIDATES come from a
distributed fold, the DP itself is inherently budget-gridded).

Oracle: a recursive CTE carrying the dp curve forward, each iteration
LEFT-joining the shifted previous curve (the carried-state pattern);
output samples the final curve every SAMPLE_EVERY budgets so the
whole frontier is hash-pinned, not just the optimum.

Reference relationship: none (curation/DP family completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

N_ITEMS = 12
BUDGET = 600
SAMPLE_EVERY = 50


def knapsack_select(sf_dir: str, n_items: int = N_ITEMS,
                    budget: int = BUDGET) -> pa.Table:
    """(budget, best_value): the sampled optimal-value frontier of the
    token-budget knapsack — DuckDB hash-matched."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"],
        filter=pc.field("doc_id") < n_items)
    items = []
    for did, s in sorted(zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist())):
        words = (s or "").split(" ")
        items.append((len(words), len(set(words))))
    dp = np.zeros(budget + 1, np.int64)
    for w, v in items:
        if w <= budget:
            shifted = np.concatenate(
                [np.full(w, -1, np.int64), dp[:budget + 1 - w] + v])
            dp = np.maximum(dp, shifted)
    bs = np.arange(0, budget + 1, SAMPLE_EVERY, dtype=np.int64)
    return pa.table({
        "budget": pa.array(bs, pa.int64()),
        "best_value": pa.array(dp[bs], pa.int64()),
    })


def knapsack_select_sql(n_items: int = N_ITEMS,
                        budget: int = BUDGET) -> str:
    return f"""
WITH RECURSIVE
it AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(len(list_distinct(string_split(text, ' ')))
              AS BIGINT) AS v,
         row_number() OVER (ORDER BY doc_id) AS rk
  FROM documents WHERE doc_id < {n_items}),
ni AS (SELECT CAST(count(*) AS BIGINT) AS n FROM it),
dp(rk, b, val) AS (
  SELECT CAST(0 AS BIGINT), CAST(u.x AS BIGINT), CAST(0 AS BIGINT)
  FROM UNNEST(range({budget} + 1)) u(x)
  UNION ALL
  SELECT p.rk + 1, p.b,
         greatest(p.val,
                  coalesce((SELECT p2.val FROM dp p2
                            WHERE p2.rk = p.rk
                              AND p2.b = p.b - (SELECT w FROM it
                                                WHERE rk = p.rk + 1)),
                           -1)
                  + coalesce((SELECT v FROM it
                              WHERE rk = p.rk + 1), 0)
                  * CASE WHEN EXISTS (
                      SELECT 1 FROM dp p3
                      WHERE p3.rk = p.rk
                        AND p3.b = p.b - (SELECT w FROM it
                                          WHERE rk = p.rk + 1))
                    THEN 1 ELSE 0 END) AS val
  FROM dp p
  WHERE p.rk < (SELECT n FROM ni))
SELECT b AS budget, CAST(max(val) AS BIGINT) AS best_value
FROM dp
WHERE b % {SAMPLE_EVERY} = 0
  AND rk = (SELECT n FROM ni)
GROUP BY b ORDER BY b"""
