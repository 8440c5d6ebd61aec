"""Exact two-pass frequent items (heavy hitters) over the corpus
vocabulary.

The classic exact frequent-items algorithm at cluster scale: every word
whose total occurrence count is >= N/k (N = total tokens) must, by
pigeonhole, appear with local count >= n_p/k in at least ONE partition
(if c_p < n_p/k everywhere then c = sum c_p < N/k). So

1. pass 1 emits, per batch, the <= k words with ``c_p * k >= n_p``
   (at most k can satisfy it — their counts would otherwise exceed
   n_p) plus one total-token partial; the driver folds a table bounded
   by k x n_batches rows — a superset of the true heavy hitters,
   independent of vocabulary size;
2. pass 2 broadcasts the deduplicated candidate list (sorted array,
   searchsorted membership), counts ONLY candidates per batch
   (pre-aggregated partials, <= |candidates| rows each), folds with a
   small groupby, and keeps ``cf * k >= N`` exactly.

No Misra-Gries decrement loop, no per-row Python, no vocabulary-sized
driver state: the only unbounded-cardinality object (the vocabulary)
never leaves the workers.

Reference relationship: the reference's `words.total_frequency` table
(`Indexer/Entities/Word.java:6-22`) materializes the WHOLE vocabulary
to answer "what are the common terms"; this answers the actual question
(terms above a frequency threshold) with bounded state — the
beyond-reference scale path (SURVEY §2.7 family).

Oracle: GROUP BY word HAVING count(*) * k >= (SELECT count(*) ...) —
pure-integer threshold compare, bit-exact.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

HH_K = 500          # frequency threshold denominator: keep cf >= N/k

_CAND_SCHEMA = pa.schema([("word", pa.string()), ("n_p", pa.int64())])


def _candidate_batch(batch: pa.Table, k: int) -> pa.Table:
    """Local heavy words of one batch (pigeonhole superset rows,
    word != None) + one totals row (word == None, n_p = batch tokens)."""
    texts = batch["text"].to_pylist()
    toks = np.concatenate(
        [np.array((t or "").split(" "), dtype=object) for t in texts]
    ) if texts else np.array([], dtype=object)
    n_p = int(toks.size)
    words, counts = (np.unique(toks, return_counts=True)
                     if n_p else (np.array([], object), np.array([], int)))
    keep = counts * k >= n_p
    return pa.table({
        "word": pa.array(list(words[keep]) + [None], pa.string()),
        "n_p": pa.array(list(np.zeros(int(keep.sum()), np.int64))
                        + [n_p], pa.int64())})


def _count_candidates_batch(batch: pa.Table, cand_ref) -> pa.Table:
    """(word, df, cf) partials of one batch, restricted to the
    broadcast sorted candidate array."""
    import ray

    cand = ray.get(cand_ref) if not isinstance(cand_ref, np.ndarray) \
        else cand_ref
    empty = pa.table({"word": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "cf": pa.array([], pa.int64())})
    texts = batch["text"].to_pylist()
    if not texts or cand.size == 0:
        return empty
    per_doc = [np.array((t or "").split(" "), dtype=object) for t in texts]
    toks = np.concatenate(per_doc)
    doc_idx = np.repeat(np.arange(len(per_doc), dtype=np.int64),
                        [a.size for a in per_doc])
    pos = np.searchsorted(cand, toks)
    pos[pos == cand.size] = 0
    hit = cand[pos] == toks
    if not hit.any():
        return empty
    ci, di = pos[hit], doc_idx[hit]
    cf = np.zeros(cand.size, np.int64)
    np.add.at(cf, ci, 1)
    # doc presence: distinct (candidate, doc) pairs
    pair = np.unique(ci * np.int64(len(per_doc)) + di)
    df = np.zeros(cand.size, np.int64)
    np.add.at(df, (pair // np.int64(len(per_doc))), 1)
    present = cf > 0
    return pa.table({
        "word": pa.array(list(cand[present]), pa.string()),
        "df": pa.array(df[present], pa.int64()),
        "cf": pa.array(cf[present], pa.int64())})


def frequent_words(sf_dir: str, k: int = HH_K) -> pa.Table:
    """(word, df, cf): every word with total occurrences cf >= N/k
    (integer compare cf*k >= N), with its document frequency — exact,
    two passes, bounded driver state."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    p1 = ds.map_batches(_candidate_batch, fn_kwargs={"k": k},
                        batch_format="pyarrow", zero_copy_batch=True
                        ).to_pandas()                 # <= k x n_batches
    n_total = int(p1.loc[p1["word"].isna(), "n_p"].sum())
    cand = np.unique(p1.loc[p1["word"].notna(), "word"]
                     .to_numpy(dtype=object))
    if cand.size == 0 or n_total == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64()),
                         "cf": pa.array([], pa.int64())})
    cand_ref = ray.put(cand)
    partials = ds.map_batches(_count_candidates_batch,
                              fn_kwargs={"cand_ref": cand_ref},
                              batch_format="pyarrow", zero_copy_batch=True)
    agg = (partials.groupby("word").sum(["df", "cf"])
           .to_pandas())                              # <= |cand| rows
    agg = agg[agg["sum(cf)"].to_numpy() * k >= n_total]
    agg = agg.sort_values("word").reset_index(drop=True)
    return pa.table({
        "word": pa.array(agg["word"].tolist(), pa.string()),
        "df": pa.array(agg["sum(df)"].to_numpy(), pa.int64()),
        "cf": pa.array(agg["sum(cf)"].to_numpy(), pa.int64())})


def frequent_words_sql(k: int = HH_K) -> str:
    return f"""
WITH hh_tok AS (
  SELECT doc_id, u.t AS word
  FROM documents, UNNEST(string_split(text, ' ')) u(t))
SELECT word,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS cf
FROM hh_tok
GROUP BY word
HAVING count(*) * {k} >= (SELECT count(*) FROM hh_tok)"""


# ---------------------------------------------------------------------------
# Zipf fit — OLS slope of ln(frequency) on ln(rank) over the top-k
# words. The distributed piece is the word-count fold + PER-BLOCK
# partial top-k (each aggregate block emits only its own top-k by the
# (cf DESC, word ASC) total order, so the driver merge is k x blocks
# rows — the `ann_topk` partial-top-k pattern applied to a vocabulary
# that is unbounded at corpus scale). The regression itself is 2k
# doubles on the driver.
# ---------------------------------------------------------------------------

ZIPF_K = 200


def _word_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    toks = np.concatenate(
        [np.array((t or "").split(" "), dtype=object) for t in texts]) \
        if texts else np.array([], dtype=object)
    uw, cnt = np.unique(toks, return_counts=True)
    return pa.table({
        "word": pa.array(list(uw), pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def _topk_block(batch: pa.Table, k: int) -> pa.Table:
    w = np.asarray(batch["word"].to_pylist(), dtype=object)
    c = batch["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((w, -c))[:k]
    return pa.table({
        "word": pa.array(w[order].tolist(), pa.string()),
        "cf": pa.array(c[order], pa.int64()),
    })


def zipf_slope(sf_dir: str, k: int = ZIPF_K) -> pa.Table:
    """(n_words, slope, intercept): OLS fit of ln(cf) ~ ln(rank) over
    the global top-``k`` words ranked by (cf DESC, word ASC) — DuckDB
    hash-matched against the window-rank + regr_slope oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    agg = (ds.map_batches(_word_count_batch, batch_format="pyarrow")
           .groupby("word").sum("cnt")
           .map_batches(_topk_block, fn_kwargs={"k": k},
                        batch_format="pyarrow"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    w = np.asarray(tbl["word"].to_pylist(), dtype=object)
    c = tbl["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((w, -c))[:k]
    cf = c[order].astype(np.float64)
    n = cf.size
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(cf)
    xm, ym = x.mean(), y.mean()
    sxx = ((x - xm) ** 2).sum()
    sxy = ((x - xm) * (y - ym)).sum()
    slope = sxy / sxx
    intercept = ym - slope * xm
    return pa.table({
        "n_words": pa.array([n], pa.int64()),
        "slope": pa.array([slope], pa.float64()),
        "intercept": pa.array([intercept], pa.float64()),
    })


def zipf_slope_sql(k: int = ZIPF_K) -> str:
    return f"""
WITH wc AS (
  SELECT u.t AS word, CAST(count(*) AS BIGINT) AS cf
  FROM documents, UNNEST(string_split(text, ' ')) u(t)
  GROUP BY u.t),
topk AS (
  SELECT word, cf,
         row_number() OVER (ORDER BY cf DESC, word) AS rk
  FROM wc QUALIFY rk <= {k})
SELECT CAST(count(*) AS BIGINT) AS n_words,
       regr_slope(ln(cf), ln(rk)) AS slope,
       regr_intercept(ln(cf), ln(rk)) AS intercept
FROM topk"""
