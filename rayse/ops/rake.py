"""RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010).

The classic unsupervised keyphrase miner: candidate phrases are the
maximal stopword-free token runs (capped at ``MAX_PHRASE_LEN`` words);
each word scores ``deg(w) / freq(w)`` where, over every phrase
OCCURRENCE containing the word,

    freq(w) = number of such occurrences
    deg(w)  = sum of their phrase lengths (word co-occurrence degree,
              self included)

and a phrase scores the sum of its words' scores. Stopwords are the
production analyzer list (`rayse/analyzer/stopwords.py` — data parity
with the reference's 668-entry list, the D1 unified list).

INTEGER-EXACT contract: word scores quantize independently
(``score_q(w) = deg * 10^6 // freq``) BEFORE the per-phrase sum, so
phrase scores are order-independent int64 and the SQL oracle — same
islands, same integer division — matches bit-for-bit.

Distributed shape: two corpus passes. Pass 1 emits per-batch
(word, freq, deg) partials from the vectorized island scan (token
positions, np.isin stopword mask on the sorted list, run detection by
position differencing — no per-token Python); a vocabulary-sized
groupby folds them and the word-score map broadcasts via ray.put
(exchange-routed join documented for open vocabularies). Pass 2
re-runs the same island scan, scores each phrase occurrence with one
searchsorted gather + reduceat, and a phrase-keyed groupby + per-batch
partial top-k bounds the driver gather at k rows per block.

Reference relationship: the reference's suggestions are raw logged
queries (M13, `QueryService.java`); RAKE is the content-derived
keyphrase sibling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RAKE_SCALE = 1_000_000
MAX_PHRASE_LEN = 4
RAKE_TOP_K = 25


def _sorted_stop() -> np.ndarray:
    from ..analyzer.stopwords import STOPWORDS_LIST

    return np.sort(np.array(STOPWORDS_LIST, dtype=object).astype(str))


def _doc_phrases(texts: list) -> tuple[list[list[str]], np.ndarray]:
    """All phrase occurrences of a batch: (list of word-lists, lengths).
    Vectorized island scan over the concatenated token stream."""
    toks_all, doc_of = [], []
    for i, txt in enumerate(texts):
        ts = [t for t in (txt or "").split(" ") if t]
        toks_all.extend(ts)
        doc_of.extend([i] * len(ts))
    if not toks_all:
        return [], np.zeros(0, np.int64)
    arr = np.asarray(toks_all, dtype=object).astype(str)
    doc = np.asarray(doc_of, dtype=np.int64)
    stop = _sorted_stop()
    j = np.searchsorted(stop, arr)
    j_c = np.minimum(j, stop.size - 1)
    is_stop = stop[j_c] == arr
    keep = ~is_stop
    # islands: runs of kept tokens within one doc
    kidx = np.flatnonzero(keep)
    if kidx.size == 0:
        return [], np.zeros(0, np.int64)
    kd = doc[kidx]
    new = np.r_[True, (np.diff(kidx) != 1) | (kd[1:] != kd[:-1])]
    starts = np.flatnonzero(new)
    lens = np.diff(np.r_[starts, kidx.size])
    phrases = []
    out_lens = []
    a_str = arr  # str dtype array
    for s, ln in zip(starts, lens):
        ln = int(min(ln, MAX_PHRASE_LEN))
        idxs = kidx[s:s + ln]
        phrases.append([str(a_str[ix]) for ix in idxs])
        out_lens.append(ln)
    return phrases, np.asarray(out_lens, np.int64)


def _word_partials(batch: pa.Table) -> pa.Table:
    phrases, lens = _doc_phrases(batch["text"].to_pylist())
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for words, ln in zip(phrases, lens):
        for w in words:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + int(ln)
    keys = sorted(freq)
    return pa.table({
        "word": pa.array(keys, pa.string()),
        "freq": pa.array([freq[k] for k in keys], pa.int64()),
        "deg": pa.array([deg[k] for k in keys], pa.int64()),
    })


def rake_phrases(sf_dir: str, k: int = RAKE_TOP_K) -> pa.Table:
    """(phrase, n_occ, score_q): top-``k`` RAKE keyphrases by summed
    quantized word scores (ties: ascending phrase) — DuckDB
    hash-matched against the islands oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    agg = (ds.map_batches(_word_partials, batch_format="pyarrow")
           .groupby("word").sum(["freq", "deg"]))
    rows = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    words = np.asarray(rows["word"].to_pylist(), dtype=object).astype(str)
    order = np.argsort(words, kind="stable")
    words = words[order]
    freq = rows["sum(freq)"].to_numpy(zero_copy_only=False)[order]
    deg = rows["sum(deg)"].to_numpy(zero_copy_only=False)[order]
    score = (deg * RAKE_SCALE) // freq
    w_ref = ray.put((words, score))

    def phrase_partials(batch: pa.Table) -> pa.Table:
        vw, vs = ray.get(w_ref)
        phrases, lens = _doc_phrases(batch["text"].to_pylist())
        agg2: dict[str, list[int]] = {}
        for wlist in phrases:
            s = int(vs[np.searchsorted(vw, np.asarray(
                wlist, dtype=object).astype(str))].sum())
            p = " ".join(wlist)
            cur = agg2.get(p)
            if cur is None:
                agg2[p] = [1, s]
            else:
                cur[0] += 1
                cur[1] += s          # sum = s * n_occ; topk divides back
        keys = sorted(agg2)
        return pa.table({
            "phrase": pa.array(keys, pa.string()),
            "n_occ": pa.array([agg2[p][0] for p in keys], pa.int64()),
            "score_q": pa.array([agg2[p][1] for p in keys], pa.int64()),
        })

    ds2 = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["text"])
    ph = (ds2.map_batches(phrase_partials, batch_format="pyarrow")
          .groupby("phrase").sum(["n_occ", "score_q"]))

    def topk_batch(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["phrase"].to_pylist(), dtype=object)
        n = batch["sum(n_occ)"].to_numpy(zero_copy_only=False)
        # score_q summed over duplicate phrase rows; per-occurrence
        # score is constant, so true score = sum // n_occ
        sq = batch["sum(score_q)"].to_numpy(zero_copy_only=False) // n
        o = np.lexsort((p, -sq))[:k]
        return pa.table({
            "phrase": pa.array(p[o].tolist(), pa.string()),
            "n_occ": pa.array(n[o].astype(np.int64), pa.int64()),
            "score_q": pa.array(sq[o].astype(np.int64), pa.int64()),
        })

    tops = pa.concat_tables(
        [t for t in ray.get(ph.map_batches(
            topk_batch, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows], promote_options="default")
    p = np.asarray(tops["phrase"].to_pylist(), dtype=object)
    n = tops["n_occ"].to_numpy(zero_copy_only=False)
    sq = tops["score_q"].to_numpy(zero_copy_only=False)
    o = np.lexsort((p, -sq))[:k]
    return pa.table({
        "phrase": pa.array(p[o].tolist(), pa.string()),
        "n_occ": pa.array(n[o], pa.int64()),
        "score_q": pa.array(sq[o], pa.int64()),
    })


def rake_phrases_sql(k: int = RAKE_TOP_K) -> str:
    from ..analyzer.stopwords import STOPWORDS_LIST

    stop_vals = ", ".join(
        "('" + w.replace("'", "''") + "')" for w in STOPWORDS_LIST)
    return f"""
WITH stop(w) AS (VALUES {stop_vals}),
tok0 AS (
  SELECT doc_id, t AS tok, p AS rawpos
  FROM (SELECT doc_id,
               unnest(string_split(text, ' ')) AS t,
               unnest(range(len(string_split(text, ' ')))) AS p
        FROM documents)
  WHERE t <> ''
),
tok AS (
  -- renumber after dropping empty tokens so double spaces never
  -- break islands (the Ray side filters before numbering)
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY rawpos) AS pos
  FROM tok0
),
kept AS (
  SELECT doc_id, tok, pos,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM tok WHERE tok NOT IN (SELECT w FROM stop)
),
isl AS (
  SELECT doc_id, tok, pos, pos - rn AS island,
         row_number() OVER (PARTITION BY doc_id, pos - rn
                            ORDER BY pos) AS wpos
  FROM kept
),
ph AS (
  SELECT doc_id, island,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         count(*) AS plen,
         list(tok ORDER BY pos) AS wlist
  FROM isl WHERE wpos <= {MAX_PHRASE_LEN}
  GROUP BY doc_id, island
),
pw AS (
  SELECT doc_id, island, plen, unnest(wlist) AS word FROM ph
),
ws AS (
  SELECT word, count(*) AS freq, sum(plen) AS deg FROM pw
  GROUP BY word
),
wq AS (SELECT word, deg * {RAKE_SCALE} // freq AS wscore FROM ws),
pscore AS (
  SELECT pw.doc_id, pw.island, CAST(sum(wq.wscore) AS BIGINT) AS sq
  FROM pw JOIN wq USING (word) GROUP BY pw.doc_id, pw.island
),
pocc AS (
  SELECT ph.phrase, pscore.sq
  FROM ph JOIN pscore ON pscore.doc_id = ph.doc_id
                     AND pscore.island = ph.island
)
SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(min(sq) AS BIGINT) AS score_q
FROM pocc GROUP BY phrase
ORDER BY score_q DESC, phrase
LIMIT {k}"""
