"""Reciprocal-rank fusion — hybrid retrieval over two engines.

Fuses the ranked outputs of TWO independent retrieval systems covering
the same transcript corpus — the Porter-stemmed flagship index and the
whitespace positional index — with reciprocal-rank fusion (Cormack,
Clarke & Buettcher, SIGIR 2009): each system contributes
``RRF_SCALE // (RRF_K + rank)`` for every doc in its top-``k_pool``,
and docs re-rank by the summed score.  This is the classic hybrid
"rrf retriever" shape (two retrievers, one fused list); the reference
has a single PostgreSQL ranking path, so this is engine breadth over
the same M7/O1 surface (`QueryService.java` ranked output contract).

Scale shape: each system's top-``k_pool`` comes from its own
distributed serving path (per-part actors, doc-disjoint exact merge —
`rayse/query/serve.py`), so the fusion input is Q x 2 x k_pool rows —
output-sized, never corpus-sized.  All arithmetic past each system's
own quantized ranking is non-negative integer (``//``), so the DuckDB
oracle — both systems' full WITH-scoped oracles composed as subqueries
and fused with the identical integer expression — matches bit-for-bit.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

RRF_K = 60                   # the Cormack et al. constant
RRF_SCALE = 1_000_000_000    # integer reciprocal scale
# shared query set: every query is analyzable by BOTH systems (the
# porter side stems / stops it, the ws side splits it — each system
# applies its OWN analyzer, as real hybrid search does)
RRF_QUERIES = ["table scan", "hash join merge", "window agg",
               "customer query plan"]


def rrf_fusion(porter_dir: str, ws_dir: str,
               queries: list[str] | None = None,
               k_pool: int = 20, k: int = 10) -> pa.Table:
    """(query, rank, conv_id, turn_idx, score_q) — integer-RRF fusion of
    the two engines' quantized BM25 top-``k_pool`` lists, re-ranked by
    (score_q desc, conv_id, turn_idx) and cut to ``k``."""
    from .porter_oracle import porter_bm25_topk
    from .ws_search import ws_bm25_topk

    queries = queries if queries is not None else RRF_QUERIES
    pooled = pa.concat_tables([
        porter_bm25_topk(porter_dir, queries=queries, k=k_pool),
        ws_bm25_topk(ws_dir, queries=queries, k=k_pool)])
    df = pooled.to_pandas()
    df["c"] = RRF_SCALE // (RRF_K + df["rank"].astype(np.int64))
    fused = (df.groupby(["query", "conv_id", "turn_idx"], as_index=False)
             ["c"].sum().rename(columns={"c": "score_q"}))
    fused = fused.sort_values(
        ["query", "score_q", "conv_id", "turn_idx"],
        ascending=[True, False, True, True], kind="mergesort")
    fused["rank"] = fused.groupby("query").cumcount() + 1
    fused = fused[fused["rank"] <= k]
    return pa.table({
        "query": pa.array(fused["query"], pa.string()),
        "rank": pa.array(fused["rank"], pa.int32()),
        "conv_id": pa.array(fused["conv_id"], pa.string()),
        "turn_idx": pa.array(fused["turn_idx"], pa.int32()),
        "score_q": pa.array(fused["score_q"], pa.int64()),
    })


def rrf_fusion_sql(queries: list[str] | None = None,
                   k_pool: int = 20, k: int = 10) -> str:
    """Oracle for ``rrf_fusion``: both systems' complete oracles as
    subqueries, fused with the identical integer expression."""
    from .porter_oracle import porter_bm25_sql
    from .ws_search import ws_bm25_sql

    queries = queries if queries is not None else RRF_QUERIES
    p_sql = porter_bm25_sql(queries=queries, k=k_pool)
    w_sql = ws_bm25_sql(queries=queries, k=k_pool)
    return f"""WITH pooled AS (
  SELECT query, conv_id, turn_idx,
         {RRF_SCALE} // ({RRF_K} + rank) AS c
  FROM (
{p_sql}
  )
  UNION ALL
  SELECT query, conv_id, turn_idx,
         {RRF_SCALE} // ({RRF_K} + rank) AS c
  FROM (
{w_sql}
  )),
fused AS (
  SELECT query, conv_id, turn_idx, CAST(sum(c) AS BIGINT) AS score_q
  FROM pooled GROUP BY 1, 2, 3),
ranked AS (
  SELECT query, conv_id, turn_idx, score_q,
         row_number() OVER (PARTITION BY query
                            ORDER BY score_q DESC, conv_id, turn_idx) AS rn
  FROM fused)
SELECT query, CAST(rn AS INTEGER) AS rank, conv_id, turn_idx, score_q
FROM ranked WHERE rn <= {k}"""
