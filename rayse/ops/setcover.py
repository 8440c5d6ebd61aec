"""Greedy set cover — the ln(n)-approximation classic (Johnson 1974)
in its data-selection costume: pick documents one at a time, each
maximizing NEWLY covered vocabulary, until the corpus vocabulary is
covered — the coverage-maximization heart of coreset/subset selection
for training data (and of the "choose k exemplar docs" curation ask).

Determinism: ties break (newly-covered DESC, doc_id ASC); rounds stop
when nothing remains uncovered, so the pick sequence is unique and an
independent SQL replay must reproduce it.

Distributed shape per round: the covered-word set broadcasts (bounded
by vocabulary; at 100 TB the 64-bit word-hash set — the dedup-family
broadcast contract); one pass emits per-batch best-(doc, uncovered
count) partials; the winner's OWN words come from a doc_id-pushdown
read (single-doc, bounded). Rounds = cover size (small by the greedy
guarantee when a few docs span the vocabulary).

Oracle: a recursive CTE carrying covered words AND picks as tagged
rows; each iteration anti-joins the token table against the carried
cover, picks the argmax, and re-emits the carried state.

Reference relationship: none (data-curation family, next to
`sampling`/`curriculum`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SC_MAX_ROUNDS = 12


def greedy_set_cover(sf_dir: str,
                     max_rounds: int = SC_MAX_ROUNDS) -> pa.Table:
    """(round, doc_id, newly_covered, total_covered): the greedy cover
    sequence — DuckDB hash-matched."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    covered: set[str] = set()
    out_r, out_d, out_n, out_t = [], [], [], []
    for rnd in range(1, max_rounds + 1):
        ref = ray.put(frozenset(covered))

        def best_partial(batch: pa.Table) -> pa.Table:
            cov = ray.get(ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            texts = batch["text"].to_pylist()
            best = None
            for did, t in zip(ids.tolist(), texts):
                words = set((t or "").split(" "))
                cnt = len(words - cov)
                key = (-cnt, did)
                if best is None or key < best:
                    best = key
            if best is None:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({
                "doc_id": pa.array([best[1]], pa.int64()),
                "cnt": pa.array([-best[0]], pa.int64())})

        parts = pa.concat_tables(
            [t for t in ray.get(
                ds.map_batches(best_partial, batch_format="pyarrow")
                .to_arrow_refs()) if t.num_rows],
            promote_options="default")
        ids = parts["doc_id"].to_numpy(zero_copy_only=False)
        cnt = parts["cnt"].to_numpy(zero_copy_only=False)
        pick = np.lexsort((ids, -cnt))[0]
        if int(cnt[pick]) == 0:
            break
        did = int(ids[pick])
        t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
            columns=["text"],
            filter=pc.field("doc_id") == did)
        words = set((t["text"][0].as_py() or "").split(" "))
        newly = len(words - covered)
        covered |= words
        out_r.append(rnd)
        out_d.append(did)
        out_n.append(newly)
        out_t.append(len(covered))
    return pa.table({
        "round": pa.array(out_r, pa.int64()),
        "doc_id": pa.array(out_d, pa.int64()),
        "newly_covered": pa.array(out_n, pa.int64()),
        "total_covered": pa.array(out_t, pa.int64()),
    })


def greedy_set_cover_sql(max_rounds: int = SC_MAX_ROUNDS) -> str:
    return f"""
WITH RECURSIVE
tok AS (
  SELECT DISTINCT doc_id, u.t AS word
  FROM documents, UNNEST(string_split(text, ' ')) u(t)),
st(rnd, kind, doc_id, word, newly, total) AS (
  SELECT CAST(0 AS BIGINT), 'seed', CAST(-1 AS BIGINT),
         CAST(NULL AS VARCHAR), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT * FROM (
    WITH prev AS (SELECT * FROM st),
    unc AS (
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS c
      FROM tok t
      WHERE t.word NOT IN (SELECT word FROM prev
                           WHERE kind = 'w')
      GROUP BY t.doc_id),
    pick AS (
      SELECT doc_id, c FROM unc
      ORDER BY c DESC, doc_id LIMIT 1),
    nxt AS (SELECT max(rnd) + 1 AS r FROM prev)
    SELECT x.rnd, x.kind, x.doc_id, x.word, x.newly, x.total
    FROM (
      -- carry covered words and past picks forward
      SELECT (SELECT r FROM nxt) AS rnd, p.kind, p.doc_id, p.word,
             p.newly, p.total
      FROM prev p WHERE p.kind IN ('w', 'p')
      UNION ALL
      -- the new pick row
      SELECT (SELECT r FROM nxt), 'p', pick.doc_id,
             CAST(NULL AS VARCHAR), pick.c,
             (SELECT count(DISTINCT word) FROM prev
              WHERE kind = 'w') + pick.c
      FROM pick
      UNION ALL
      -- its newly covered words
      SELECT (SELECT r FROM nxt), 'w', CAST(-1 AS BIGINT), t.word,
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM tok t JOIN pick ON t.doc_id = pick.doc_id
      WHERE t.word NOT IN (SELECT word FROM prev
                           WHERE kind = 'w')) x
    WHERE EXISTS (SELECT 1 FROM pick WHERE pick.c > 0)
      AND (SELECT r FROM nxt) <= {max_rounds}))
SELECT rnd AS round, doc_id,
       newly AS newly_covered, total AS total_covered
FROM (
  SELECT doc_id, newly, total, min(rnd) AS rnd
  FROM st WHERE kind = 'p'
  GROUP BY doc_id, newly, total)
ORDER BY round"""
