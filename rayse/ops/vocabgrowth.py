"""Vocabulary growth curve (Heaps'-law measurement).

The corpus-composition diagnostic: distinct-vocabulary size after the
first k documents (doc_id order), reported at a power-of-two ladder of
prefix lengths. The key identity keeps it one aggregate instead of a
sequential scan: the prefix-k vocabulary is exactly the number of terms
whose MINIMUM containing doc_id is <= the k-th doc_id — so one
``groupby(term).min(doc_id)`` fold plus a bounded histogram over the
ladder replaces any per-prefix recount.

Distributed shape: per-batch (term, min doc_id) partials (np.unique on
the batch's tokens, first-occurrence gather), a vocabulary-sized
``groupby(term).min``, then per-batch ladder histograms (ladder-sized
rows per block) and a tiny fold — the vocabulary itself never reaches
the driver. Ladder doc_ids come from one ordered doc_id read
(column-pruned; ladder indices only).

Tokenization matches the corpus convention (space split, '' dropped —
`rayse/ops/heavyhitters.py`).

Reference relationship: none (no corpus diagnostics in the reference);
pins the min-fold + threshold-histogram machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LADDER = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096,
          8192, 16384)


def _term_min_partials(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    toks, dids = [], []
    for txt, d in zip(texts, docs):
        ts = set((txt or "").split(" "))
        ts.discard("")
        toks.extend(ts)
        dids.extend([int(d)] * len(ts))
    if not toks:
        return pa.table({"term": pa.array([], pa.string()),
                         "min_doc": pa.array([], pa.int64())})
    arr = np.asarray(toks, dtype=object)
    did = np.asarray(dids, dtype=np.int64)
    order = np.lexsort((did, arr.astype(str)))
    arr, did = arr[order], did[order]
    first = np.r_[True, arr[1:] != arr[:-1]]
    return pa.table({
        "term": pa.array(arr[first].tolist(), pa.string()),
        "min_doc": pa.array(did[first], pa.int64()),
    })


def vocab_growth(sf_dir: str) -> pa.Table:
    """(k, n_docs, vocab): distinct-vocabulary size within the first
    ``k`` documents by doc_id, at the power-of-two ladder clipped to the
    corpus — DuckDB hash-matched against the min-fold oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    mins = (ds.map_batches(_term_min_partials, batch_format="pyarrow")
            .groupby("term").min("min_doc"))

    # ladder thresholds: the doc_id of the k-th smallest document
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    id_rows = pa.concat_tables(
        [t for t in ray.get(ids.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    all_ids = np.sort(id_rows["doc_id"].to_numpy(zero_copy_only=False))
    n = all_ids.size
    ladder = [k for k in LADDER if k <= n]
    if not ladder or ladder[-1] != n:
        ladder.append(n)
    cut_ids = np.array([all_ids[k - 1] for k in ladder], np.int64)

    def hist_batch(batch: pa.Table) -> pa.Table:
        md = batch["min(min_doc)"].to_numpy(zero_copy_only=False)
        # counts of terms with min_doc <= each ladder cut
        cnt = np.searchsorted(np.sort(md), cut_ids, side="right")
        return pa.table({
            "li": pa.array(np.arange(len(ladder)), pa.int64()),
            "c": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    folded = pa.concat_tables(
        [t for t in ray.get(mins.map_batches(
            hist_batch, batch_format="pyarrow").to_arrow_refs())
         if t.num_rows], promote_options="default")
    li = folded["li"].to_numpy(zero_copy_only=False)
    c = folded["c"].to_numpy(zero_copy_only=False)
    vocab = np.zeros(len(ladder), np.int64)
    np.add.at(vocab, li, c)
    return pa.table({
        "k": pa.array(ladder, pa.int64()),
        "n_docs": pa.array(ladder, pa.int64()),
        "vocab": pa.array(vocab, pa.int64()),
    })


def vocab_growth_sql() -> str:
    ladder = ", ".join(str(k) for k in LADDER)
    return f"""
WITH tok AS (
  SELECT t AS term, min(doc_id) AS min_doc
  FROM documents, UNNEST(string_split(text, ' ')) u(t)
  WHERE t <> ''
  GROUP BY t
),
ord AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn
  FROM documents
),
nn AS (SELECT count(*) AS n FROM documents),
lad AS (
  SELECT DISTINCT least(k, (SELECT n FROM nn)) AS k
  FROM (SELECT unnest([{ladder}, (SELECT n FROM nn)]) AS k)
  WHERE k <= (SELECT n FROM nn)
),
cuts AS (
  SELECT lad.k, ord.doc_id AS cut_id
  FROM lad JOIN ord ON ord.rn = lad.k
)
SELECT c.k, CAST(c.k AS BIGINT) AS n_docs,
       CAST((SELECT count(*) FROM tok WHERE tok.min_doc <= c.cut_id)
            AS BIGINT) AS vocab
FROM cuts c
ORDER BY c.k
"""


# ---------------------------------------------------------------------------
# Hapax legomena ratio — the vocabulary-richness scalar per source: the
# fraction (ppm) of a source's distinct words that occur exactly once
# in it. Same (key, word) count fold family as the growth curve above.
# ---------------------------------------------------------------------------


def _src_word_partials(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    srcs = batch["source"].to_pylist()
    keys = []
    for txt, src in zip(texts, srcs):
        keys.extend(f"{src}\x1f{t}"
                    for t in (txt or "").split(" ") if t)
    if not keys:
        return pa.table({"source": pa.array([], pa.string()),
                         "word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    uk, cnt = np.unique(np.asarray(keys, dtype=object),
                        return_counts=True)
    src, w = zip(*(k.split("\x1f", 1) for k in uk))
    return pa.table({
        "source": pa.array(list(src), pa.string()),
        "word": pa.array(list(w), pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def hapax_ratio(sf_dir: str) -> pa.Table:
    """(source, vocab, n_hapax, hapax_ppm): per-source distinct words,
    once-occurring words, and the floored ppm ratio — DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])
    agg = (ds.map_batches(_src_word_partials, batch_format="pyarrow")
           .groupby(["source", "word"]).sum("cnt"))

    def fold(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        c = batch["sum(cnt)"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(src.astype(str), return_inverse=True)
        v = np.zeros(uk.size, np.int64)
        h = np.zeros(uk.size, np.int64)
        np.add.at(v, inv, 1)
        np.add.at(h, inv, (c == 1).astype(np.int64))
        return pa.table({
            "source": pa.array(uk.tolist(), pa.string()),
            "vocab": pa.array(v, pa.int64()),
            "n_hapax": pa.array(h, pa.int64()),
        })

    folded = agg.map_batches(fold, batch_format="pyarrow").groupby(
        "source").sum(["vocab", "n_hapax"])
    rows = pa.concat_tables(
        [t for t in ray.get(folded.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    src = rows["source"].to_pylist()
    v = rows["sum(vocab)"].to_numpy(zero_copy_only=False)
    h = rows["sum(n_hapax)"].to_numpy(zero_copy_only=False)
    order = np.argsort(np.asarray(src, dtype=object), kind="stable")
    return pa.table({
        "source": pa.array([src[i] for i in order], pa.string()),
        "vocab": pa.array(v[order], pa.int64()),
        "n_hapax": pa.array(h[order], pa.int64()),
        "hapax_ppm": pa.array(
            [int(h[i]) * 1_000_000 // int(v[i]) for i in order],
            pa.int64()),
    })


HAPAX_RATIO_SQL = """
WITH wc AS (
  SELECT source, t AS word, count(*) AS cnt
  FROM documents, UNNEST(string_split(text, ' ')) u(t)
  WHERE t <> ''
  GROUP BY source, t
)
SELECT source,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax,
       CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS hapax_ppm
FROM wc GROUP BY source
ORDER BY source
"""
