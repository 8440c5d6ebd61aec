"""CORI shard selection (Callan, Lu & Croft 1995) — resource ranking
for routing queries across index partitions.

At 100 TB the index is hundreds of doc-partitioned shards; a broker
that fans every query to every shard wastes the cluster. CORI ranks
shards per query from SHARD-LEVEL statistics only (per-shard df, shard
word counts) so the broker can probe the top few shards first — the
classic resource-selection algorithm distributed IR builds on. The
reference has no multi-shard layer at all (single PostgreSQL store,
`Ranker/DatabaseManager.java`); this is the operator its architecture
would need first at any real scale.

Per query term t and shard (index part) p:

    T = df_{t,p} / (df_{t,p} + 50 + 150 * cw_p / avg_cw)
    I = ln((S + 0.5) / sf_t) / ln(S + 1.0)
    belief(t|p) = b + (1 - b) * T * I          (b = 0.4)

with cw_p the shard's analyzed token count, avg_cw the mean over the S
shards, and sf_t the number of shards containing t. A shard's query
score is the sum of per-term beliefs; a term absent from the shard (or
from every shard) contributes the default belief b.

INTEGER-EXACT contract: each belief is quantized independently
(floor(belief * 1e10)) BEFORE the per-query sum, so the score is an
integer sum — order-independent, and the DuckDB oracle (same float
expressions, same quantization) matches bit-for-bit. Ranking breaks
ties (score_q DESC, part ASC).

Scale shape: the per-(term, part) df and per-part cw come straight off
the hive-partitioned segment files — columns pruned to (term, df, cf),
query terms broadcast, one bounded groupby of (parts x query terms)
rows. Posting blobs never load; the driver computation is
O(parts x terms).

Reference relationship: replaces nothing in the reference (no analog);
north-rule scale machinery. Segment layout per
`rayse/pipelines/build_index.py` (part = top ``part_bits`` of the FNV
doc_id, `rayse/stages/doc_ids.py:64`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CORI_B = 0.4
CORI_QUANT = 10_000_000_000.0        # per-term quantizer (1e10)
_DEFAULT_Q = int(np.floor(CORI_B * CORI_QUANT))


def _part_stats(index_dir: str, terms: list[str]):
    """((part, term, df) for query terms, (part, cw)) — one pruned scan
    of the segment files, partials bounded by (parts x terms) + parts."""
    import ray
    import ray.data as rd

    tset = ray.put(set(terms))

    def partials(batch: pa.Table) -> pa.Table:
        part = batch["part"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        cf = batch["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        terms_arr = np.asarray(batch["term"].to_pylist(), dtype=object)
        # per-part cw partial (sum cf over every row)
        up, inv = np.unique(part, return_inverse=True)
        cw = np.zeros(up.size, dtype=np.int64)
        np.add.at(cw, inv, cf)
        rows = {
            "part": [int(x) for x in up],
            "term": [""] * up.size,
            "df": [0] * up.size,
            "cw": [int(x) for x in cw],
        }
        qs = ray.get(tset)
        hit = np.fromiter((t in qs for t in terms_arr), bool,
                          terms_arr.size)
        if hit.any():
            rows["part"] += [int(x) for x in part[hit]]
            rows["term"] += [str(t) for t in terms_arr[hit]]
            rows["df"] += [int(x) for x in df[hit]]
            rows["cw"] += [0] * int(hit.sum())
        return pa.table({
            "part": pa.array(rows["part"], pa.int64()),
            "term": pa.array(rows["term"], pa.string()),
            "df": pa.array(rows["df"], pa.int64()),
            "cw": pa.array(rows["cw"], pa.int64()),
        })

    ds = rd.read_parquet(f"{index_dir}/segments",
                         columns=["term", "df", "cf", "part"])
    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby(["part", "term"]).sum(["df", "cw"]))
    rows = agg.take_all()
    cw = {}
    dfs = {}
    for r in rows:
        if r["term"] == "":
            cw[r["part"]] = cw.get(r["part"], 0) + r["sum(cw)"]
        else:
            dfs[(r["part"], r["term"])] = r["sum(df)"]
    return dfs, cw


def cori_shard_topk(index_dir: str, queries: list[str] | None = None,
                    k: int = 10) -> pa.Table:
    """(query, rank, part, score_q): top-``k`` shards per query under
    CORI belief scoring, quantized-per-term integer sums."""
    from .porter_oracle import PORTER_QUERIES, _analyzed

    queries = queries if queries is not None else PORTER_QUERIES
    q_terms = {q: _analyzed(q) for q in queries}
    all_terms = sorted({t for ts in q_terms.values() for t in ts})
    dfs, cw = _part_stats(index_dir, all_terms)

    parts = np.array(sorted(cw), dtype=np.int64)
    S = parts.size
    avg_cw = float(sum(cw.values())) / S
    sf = {t: sum(1 for p in parts if dfs.get((int(p), t), 0) > 0)
          for t in all_terms}

    # per-(term, part) quantized belief
    qbel = {}
    for t in all_terms:
        if sf[t] == 0:
            continue
        i_t = float(np.log((S + 0.5) / sf[t]) / np.log(S + 1.0))
        for p in parts:
            d = dfs.get((int(p), t), 0)
            if d == 0:
                continue
            t_s = d / (d + 50.0 + 150.0 * (cw[int(p)] / avg_cw))
            bel = CORI_B + 0.6 * (t_s * i_t)
            qbel[(int(p), t)] = int(np.floor(bel * CORI_QUANT))

    out = {"query": [], "rank": [], "part": [], "score_q": []}
    for q in queries:
        scores = np.fromiter(
            (sum(qbel.get((int(p), t), _DEFAULT_Q) for t in q_terms[q])
             for p in parts), np.int64, S)
        order = np.lexsort((parts, -scores))[:k]
        for rnk, i in enumerate(order, 1):
            out["query"].append(q)
            out["rank"].append(rnk)
            out["part"].append(int(parts[i]))
            out["score_q"].append(int(scores[i]))
    return pa.table({
        "query": pa.array(out["query"], pa.string()),
        "rank": pa.array(out["rank"], pa.int32()),
        "part": pa.array(out["part"], pa.int64()),
        "score_q": pa.array(out["score_q"], pa.int64()),
    })


def cori_shard_sql(queries: list[str] | None = None, k: int = 10,
                   part_bits: int = 8) -> str:
    """Oracle for ``cori_shard_topk``: parts from the exact FNV doc_id
    top bits, per-shard df/cw re-derived from the analyzed stream, the
    same float expressions and per-term quantization."""
    from .porter_oracle import (PORTER_QUERIES, _analysis_ctes, _analyzed,
                                porter_doc_id_sql)

    queries = queries if queries is not None else PORTER_QUERIES
    vals = ", ".join(f"('{q}', '{t}')"
                     for q in queries for t in _analyzed(q))
    did = porter_doc_id_sql("tf.conv_id", "tf.turn_idx")
    shift = 1 << (64 - part_bits)
    return f"""{_analysis_ctes()},
docp AS (
  SELECT tf.term, tf.tf, CAST({did} // {shift}::HUGEINT AS BIGINT) AS part
  FROM tf),
cwp AS (SELECT part, CAST(sum(tf) AS BIGINT) AS cw FROM docp GROUP BY 1),
shards AS (SELECT CAST(count(*) AS BIGINT) AS s,
                  (SELECT CAST(sum(cw) AS DOUBLE) FROM cwp)
                    / count(*) AS avg_cw
           FROM cwp),
dfp AS (SELECT term, part, CAST(count(*) AS BIGINT) AS df
        FROM docp GROUP BY 1, 2),
sft AS (SELECT term, CAST(count(*) AS BIGINT) AS sf FROM dfp GROUP BY 1),
qt(query, term) AS (VALUES {vals}),
bel AS (
  SELECT qt.query, c.part, qt.term,
         CASE WHEN d.df IS NULL THEN {_DEFAULT_Q}
              ELSE CAST(floor(({CORI_B} + 0.6 *
                ((d.df / (d.df + 50.0 + 150.0 * (c.cw / sh.avg_cw)))
                 * (ln((sh.s + 0.5) / f.sf) / ln(sh.s + 1.0))))
                * {CORI_QUANT!r}) AS BIGINT) END AS q
  FROM qt CROSS JOIN cwp c CROSS JOIN shards sh
  LEFT JOIN dfp d ON d.term = qt.term AND d.part = c.part
  LEFT JOIN sft f ON f.term = qt.term),
scored AS (SELECT query, part, CAST(sum(q) AS BIGINT) AS score_q
           FROM bel GROUP BY 1, 2),
ranked AS (
  SELECT query, part, score_q,
         row_number() OVER (PARTITION BY query
                            ORDER BY score_q DESC, part) AS rn
  FROM scored)
SELECT query, CAST(rn AS INTEGER) AS rank, part, score_q
FROM ranked WHERE rn <= {k}"""
