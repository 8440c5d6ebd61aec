"""Canonical Huffman code construction over the top-M corpus words —
the entropy-coding primitive (Huffman 1952) next to the BPE merge
learner (`textstats.bpe_merges`): BPE learns the VOCABULARY, Huffman
learns the optimal integer code LENGTHS for a fixed one.

Determinism: the merge rule is fully ordered — each round merges the
two subtrees of smallest (total_weight, rep_id), and the merged
subtree keeps the SMALLER rep id — so the depth profile is unique and
a completely independent implementation must reproduce it exactly.
Code VALUES are canonical (Deflate-style): leaves sorted by
(len ASC, word ASC), code_i = (Σ_{j<i} 2^(L−len_j)) >> (L−len_i) — a
closed-form prefix sum, no sequential assignment.

Ray side: word-count fold + per-block partial top-k (the `zipf_slope`
vocabulary path — the vocabulary never lands whole on the driver),
then the M-leaf merge loop driver-side (M=16 nodes — constant-sized).
Oracle: a recursive CTE carrying (leaf, rep, depth) rows forward, the
two minimal reps re-derived each iteration from the carried leaf
weights — the Borůvka/Prim-style algorithm-equivalence pin applied to
priority-queue order.

Reference relationship: none (tokenizer/coding family completion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HUFF_M = 16


def huffman_codes(sf_dir: str, m: int = HUFF_M) -> pa.Table:
    """(word, cf, code_len, code): canonical Huffman codes for the
    top-``m`` words by (cf DESC, word ASC) — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    from .heavyhitters import _topk_block, _word_count_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    agg = (ds.map_batches(_word_count_batch, batch_format="pyarrow")
           .groupby("word").sum("cnt")
           .map_batches(_topk_block, fn_kwargs={"k": m},
                        batch_format="pyarrow"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    w = np.asarray(tbl["word"].to_pylist(), dtype=object)
    c = tbl["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((w, -c))[:m]
    w, c = w[order], c[order]
    # leaf ids = 1-based rank by word ASC (the SQL row_number order)
    worder = np.argsort(w.astype(str), kind="stable")
    leaf_of = np.empty(w.size, np.int64)
    leaf_of[worder] = np.arange(1, w.size + 1)

    rep = leaf_of.copy()
    depth = np.zeros(w.size, np.int64)
    while np.unique(rep).size > 1:
        reps = np.unique(rep)
        freqs = np.asarray([c[rep == r].sum() for r in reps], np.int64)
        two = reps[np.lexsort((reps, freqs))[:2]]
        new = int(two.min())
        m_sel = np.isin(rep, two)
        depth[m_sel] += 1
        rep[m_sel] = new

    # canonical code values: sort by (len, word)
    so = np.lexsort((w.astype(str), depth))
    L = int(depth.max())
    weights = np.int64(1) << (L - depth[so])
    pref = np.concatenate(([0], np.cumsum(weights)))[:-1]
    codes = pref >> (L - depth[so])
    out = np.empty(w.size, np.int64)
    out[so] = codes
    final = np.argsort(w.astype(str), kind="stable")
    return pa.table({
        "word": pa.array(w[final].tolist(), pa.string()),
        "cf": pa.array(c[final], pa.int64()),
        "code_len": pa.array(depth[final], pa.int64()),
        "code": pa.array(out[final], pa.int64()),
    })


def huffman_codes_sql(m: int = HUFF_M) -> str:
    return f"""
WITH RECURSIVE
wc AS (
  SELECT u.t AS word, CAST(count(*) AS BIGINT) AS cf
  FROM documents, UNNEST(string_split(text, ' ')) u(t)
  GROUP BY 1),
topm AS (
  SELECT word, cf FROM (
    SELECT word, cf,
           row_number() OVER (ORDER BY cf DESC, word) AS rn
    FROM wc) WHERE rn <= {m}),
leaves AS (
  SELECT word, cf,
         row_number() OVER (ORDER BY word) AS leaf
  FROM topm),
st(word, cf, leaf, rep, depth) AS (
  SELECT word, cf, leaf, leaf, CAST(0 AS BIGINT) FROM leaves
  UNION ALL
  SELECT s.word, s.cf, s.leaf,
         CASE WHEN s.rep IN (SELECT rep FROM (
                SELECT rep, sum(cf) AS f FROM st GROUP BY rep
                ORDER BY f, rep LIMIT 2))
              THEN (SELECT min(rep) FROM (
                SELECT rep, sum(cf) AS f FROM st GROUP BY rep
                ORDER BY f, rep LIMIT 2))
              ELSE s.rep END,
         s.depth + CASE WHEN s.rep IN (SELECT rep FROM (
                SELECT rep, sum(cf) AS f FROM st GROUP BY rep
                ORDER BY f, rep LIMIT 2))
              THEN 1 ELSE 0 END
  FROM st s
  WHERE (SELECT count(DISTINCT rep) FROM st) > 1),
final AS (
  SELECT word, cf, depth FROM st
  WHERE depth = (SELECT max(d2) FROM (
          SELECT word AS w2, max(depth) AS d2 FROM st GROUP BY word)
        WHERE w2 = st.word)
  GROUP BY word, cf, depth),
lmax AS (SELECT max(depth) AS L FROM final),
canon AS (
  SELECT word, cf, depth,
         coalesce(sum(CAST(1 AS BIGINT) << ((SELECT L FROM lmax)
                                            - depth))
                  OVER (ORDER BY depth, word
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS pref
  FROM final)
SELECT word, cf, CAST(depth AS BIGINT) AS code_len,
       CAST(pref >> ((SELECT L FROM lmax) - depth) AS BIGINT) AS code
FROM canon ORDER BY word"""
