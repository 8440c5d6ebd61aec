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


# ---------------------------------------------------------------------------
# Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between the two
# engines' rankings — the cross-engine agreement diagnostic of the same
# hybrid family as RRF above: how similar are the Porter and whitespace
# BM25 lists, top-weighted?  Truncated RBO at depth k with p = 9/10:
#
#   rbo = (1 - p) * sum_{d=1..k} p^(d-1) * |top_d(A) /\ top_d(B)| / d
#
# evaluated as ONE exact rational: with L = lcm(1..k) and the common
# denominator D = p_den^(k-1) * L, each depth contributes the integer
#   w_d = p_num^(d-1) * p_den^(k-d) * (L // d)
# and rbo_q = (RBO_SCALE * sum w_d * inter_d) // (p_den * D) — unbounded
# ints on the Ray side, HUGEINT with a VALUES weight table in DuckDB.
# ---------------------------------------------------------------------------

RBO_P_NUM, RBO_P_DEN = 9, 10
RBO_DEPTH = 10
RBO_SCALE = 1_000_000_000


def _rbo_weights(k: int) -> tuple[list[int], int]:
    import math

    l_ = math.lcm(*range(1, k + 1))
    w = [RBO_P_NUM ** (d - 1) * RBO_P_DEN ** (k - d) * (l_ // d)
         for d in range(1, k + 1)]
    return w, RBO_P_DEN ** (k - 1) * l_


def rbo_agreement(porter_dir: str, ws_dir: str,
                  queries: list[str] | None = None,
                  k: int = RBO_DEPTH) -> pa.Table:
    """(query, inter_k, rbo_q): truncated rank-biased overlap between
    the Porter and whitespace BM25 top-``k`` lists per query — DuckDB
    hash-matched against the composed-oracle VALUES-weight oracle."""
    from .porter_oracle import porter_bm25_topk
    from .ws_search import ws_bm25_topk

    queries = queries if queries is not None else RRF_QUERIES
    a = porter_bm25_topk(porter_dir, queries=queries, k=k).to_pandas()
    b = ws_bm25_topk(ws_dir, queries=queries, k=k).to_pandas()
    w, d_den = _rbo_weights(k)

    out_q, out_i, out_r = [], [], []
    for q in sorted(set(queries)):
        ra = {(r.conv_id, r.turn_idx): int(r.rank)
              for r in a[a["query"] == q].itertuples()}
        rb = {(r.conv_id, r.turn_idx): int(r.rank)
              for r in b[b["query"] == q].itertuples()}
        pairs = [(ra[key], rb[key]) for key in ra.keys() & rb.keys()]
        s = 0
        inter_k = 0
        for d in range(1, k + 1):
            inter_d = sum(1 for x, y in pairs if x <= d and y <= d)
            s += w[d - 1] * inter_d
            if d == k:
                inter_k = inter_d
        out_q.append(q)
        out_i.append(inter_k)
        out_r.append((RBO_SCALE * s) // (RBO_P_DEN * d_den))
    return pa.table({
        "query": pa.array(out_q, pa.string()),
        "inter_k": pa.array(out_i, pa.int64()),
        "rbo_q": pa.array(out_r, pa.int64()),
    })


def rbo_agreement_sql(queries: list[str] | None = None,
                      k: int = RBO_DEPTH) -> str:
    from .porter_oracle import porter_bm25_sql
    from .ws_search import ws_bm25_sql

    queries = queries if queries is not None else RRF_QUERIES
    w, d_den = _rbo_weights(k)
    wvals = ", ".join(f"({d + 1}, {wd}::HUGEINT)"
                      for d, wd in enumerate(w))
    return f"""WITH rbo_a AS (
  SELECT query, conv_id, turn_idx, rank FROM (
{porter_bm25_sql(queries=queries, k=k)}
  )),
rbo_b AS (
  SELECT query, conv_id, turn_idx, rank FROM (
{ws_bm25_sql(queries=queries, k=k)}
  )),
rbo_j AS (
  SELECT a.query, a.rank AS ra, b.rank AS rb
  FROM rbo_a a JOIN rbo_b b
    ON b.query = a.query AND b.conv_id = a.conv_id
   AND b.turn_idx = a.turn_idx),
rbo_w(d, w) AS (VALUES {wvals}),
rbo_terms AS (
  SELECT q.query, w.d, w.w,
         (SELECT count(*) FROM rbo_j j
          WHERE j.query = q.query AND j.ra <= w.d AND j.rb <= w.d)
           AS inter_d
  FROM (SELECT DISTINCT query FROM rbo_a) q CROSS JOIN rbo_w w),
rbo_s AS (
  SELECT query,
         sum(w * inter_d) AS s,
         max(CASE WHEN d = {k} THEN inter_d END) AS inter_k
  FROM rbo_terms GROUP BY query)
SELECT query, CAST(inter_k AS BIGINT) AS inter_k,
       CAST(({RBO_SCALE}::HUGEINT * s)
            // ({RBO_P_DEN}::HUGEINT * {d_den}::HUGEINT) AS BIGINT)
         AS rbo_q
FROM rbo_s
ORDER BY query"""
