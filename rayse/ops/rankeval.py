"""Rank evaluation — DCG/NDCG inputs and MRR for one engine against
another's judgments.

The offline-eval harness every search team runs (Lucene/Elasticsearch
rank-eval API analog): relevance judgments derive from the Porter
flagship engine's top-``REL_TOP`` (graded rel = REL_TOP+1-rank), and
the whitespace engine's top-``k`` list is scored with:

- ``dcg_q``  = Σ rel_i · D[i]  over the evaluated list
- ``idcg_q`` = Σ rel · D[pos]  over the ideal (judgment-sorted) list
- ``first_rel_rank`` and ``mrr_q = 1e9 // first_rel_rank``

where D[i] = floor(1e9 / log2(i+1)) is a PRECOMPUTED integer discount
table injected into both sides as literals — the whole metric is
integer arithmetic over the two engines' already-hash-green rankings,
so the oracle (both full retrieval oracles composed as subqueries, the
same discount VALUES table) matches bit-for-bit with zero float ops in
either runtime.

Scale shape: both inputs are output-sized (Q × k rows) products of the
distributed serving paths; the eval itself is driver arithmetic over
Q rows.
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .fusion import RRF_QUERIES

REL_TOP = 3          # judged depth (grades 3, 2, 1)
EVAL_K = 10          # evaluated depth
MRR_SCALE = 1_000_000_000

# integer discount table: D[i] = floor(1e9 / log2(i+1)), i = 1..EVAL_K
DISCOUNTS = {i: math.floor(1e9 / math.log2(i + 1))
             for i in range(1, EVAL_K + 1)}


def rank_eval(porter_dir: str, ws_dir: str,
              queries: list[str] | None = None) -> pa.Table:
    """(query, dcg_q, idcg_q, first_rel_rank, mrr_q) per query."""
    from .porter_oracle import porter_bm25_topk
    from .ws_search import ws_bm25_topk

    queries = queries if queries is not None else RRF_QUERIES
    qr = porter_bm25_topk(porter_dir, queries=queries,
                          k=REL_TOP).to_pandas()
    qr["rel"] = REL_TOP + 1 - qr["rank"].astype(np.int64)
    wl = ws_bm25_topk(ws_dir, queries=queries, k=EVAL_K).to_pandas()
    j = wl.merge(qr[["query", "conv_id", "turn_idx", "rel"]],
                 on=["query", "conv_id", "turn_idx"], how="left")
    j["rel"] = j["rel"].fillna(0).astype(np.int64)
    j["d"] = j["rank"].map(DISCOUNTS).astype(np.int64)
    out_q, out_d, out_i, out_f, out_m = [], [], [], [], []
    for q in queries:
        jq = j[j["query"] == q]
        if jq.empty:
            continue
        dcg = int((jq["rel"] * jq["d"]).sum())
        rels = np.sort(qr[qr["query"] == q]["rel"].to_numpy())[::-1]
        idcg = int(sum(int(r) * DISCOUNTS[i + 1]
                       for i, r in enumerate(rels[:EVAL_K].tolist())))
        hit = jq[jq["rel"] > 0]["rank"]
        frr = int(hit.min()) if len(hit) else 0
        out_q.append(q)
        out_d.append(dcg)
        out_i.append(idcg)
        out_f.append(frr)
        out_m.append(MRR_SCALE // frr if frr else 0)
    return pa.table({
        "query": pa.array(out_q, pa.string()),
        "dcg_q": pa.array(out_d, pa.int64()),
        "idcg_q": pa.array(out_i, pa.int64()),
        "first_rel_rank": pa.array(out_f, pa.int64()),
        "mrr_q": pa.array(out_m, pa.int64()),
    })


def rank_eval_sql(queries: list[str] | None = None) -> str:
    """Oracle: both retrieval oracles as subqueries + the same integer
    discount VALUES table."""
    from .porter_oracle import porter_bm25_sql
    from .ws_search import ws_bm25_sql

    queries = queries if queries is not None else RRF_QUERIES
    p_sql = porter_bm25_sql(queries=queries, k=REL_TOP)
    w_sql = ws_bm25_sql(queries=queries, k=EVAL_K)
    dvals = ", ".join(f"({i}, {d})" for i, d in DISCOUNTS.items())
    return f"""WITH qr AS (
  SELECT query, conv_id, turn_idx,
         CAST({REL_TOP} + 1 - rank AS BIGINT) AS rel
  FROM (
{p_sql}
  )),
wl AS (
  SELECT query, rank, conv_id, turn_idx
  FROM (
{w_sql}
  )),
dq(i, d) AS (VALUES {dvals}),
j AS (
  SELECT wl.query, wl.rank, COALESCE(qr.rel, 0) AS rel
  FROM wl LEFT JOIN qr ON qr.query = wl.query
       AND qr.conv_id = wl.conv_id AND qr.turn_idx = wl.turn_idx),
dcg AS (
  SELECT j.query, CAST(sum(j.rel * d.d) AS BIGINT) AS dcg_q
  FROM j JOIN dq d ON d.i = j.rank GROUP BY 1),
iq AS (
  SELECT query, rel,
         row_number() OVER (PARTITION BY query
                            ORDER BY rel DESC) AS pos
  FROM qr),
idcg AS (
  SELECT iq.query, CAST(sum(iq.rel * d.d) AS BIGINT) AS idcg_q
  FROM iq JOIN dq d ON d.i = iq.pos GROUP BY 1),
mrr AS (
  SELECT query,
         CAST(COALESCE(min(CASE WHEN rel > 0 THEN rank END), 0)
              AS BIGINT) AS first_rel_rank
  FROM j GROUP BY query)
SELECT dcg.query, dcg.dcg_q, idcg.idcg_q, mrr.first_rel_rank,
       CAST(CASE WHEN mrr.first_rel_rank > 0
                 THEN {MRR_SCALE} // mrr.first_rel_rank
                 ELSE 0 END AS BIGINT) AS mrr_q
FROM dcg JOIN idcg ON idcg.query = dcg.query
JOIN mrr ON mrr.query = dcg.query"""
