"""Exact duplicate-SPAN detection — substring-level dedup for training
data (the ExactSubstr idea of Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better", arXiv:2107.06499 — realized at the
word-k-gram granularity instead of a suffix array).

A k-token span that appears ``min_count``+ times across the corpus
(including repeats inside one document) is a duplicated span; training
pipelines drop or down-weight them. Two operators:

- ``duplicate_spans``: every duplicated k-gram with its document count
  and total occurrence count;
- ``span_dedup_docs``: per-document count of duplicated-span occurrences
  (the removal workload a cleaning pass would perform).

Realization (100-TB shape):
1. ``map_batches``: ``gram_slices`` + ``fnv64_slices`` (the textstats
   fingerprint machinery — ONE definition of a gram and its hash) followed
   by a per-batch PARTIAL aggregate to (gram_hash, doc_id, n_occ). Every
   document lives in exactly one batch, so partials sum globally without
   double-counting docs.
2. one partitioned file-exchange by ``gram_hash``
   (``rayse.ops.exchange``): all rows of a hash land in one partition and
   are reduced with numpy segment ops — no per-group Ray dispatch, no
   driver materialization, no full-text shuffle (hashes travel, text does
   not).
3. ``span_dedup_docs`` adds a second tiny exchange keyed by ``doc_id``
   over the per-partition (doc, count) partials.

The SQL oracle recomputes the identical FNV-1a 64-bit gram hashes
(HUGEINT list_reduce — the ``fingerprint_sql`` recipe) and aggregates in
plain SQL, so both operators are hash-checked end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import exchange_by_key
from .textstats import fnv64_slices, gram_slices

_EMPTY_PARTIAL = pa.schema([("gram_hash", pa.uint64()),
                            ("doc_id", pa.int64()),
                            ("n_occ", pa.int64())])


def _gram_partials_batch(batch: pa.Table, window: int) -> pa.Table:
    """(gram_hash, doc_id, n_occ) partial rows for one batch of documents
    — vectorized gram scan + hash + lexsort/run-length partial aggregate."""
    texts = batch["text"].to_pylist()
    if not texts:
        return pa.table({n: [] for n in _EMPTY_PARTIAL.names},
                        schema=_EMPTY_PARTIAL)
    buf, g_start, lens, g_cum = gram_slices(texts, window)
    h = fnv64_slices(buf, g_start, lens)
    doc = np.repeat(batch["doc_id"].to_numpy(), np.diff(g_cum))
    order = np.lexsort((doc, h))
    hs, ds_ = h[order], doc[order]
    new = np.empty(hs.size, dtype=bool)
    new[0] = True
    new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
    idx = np.flatnonzero(new)
    n_occ = np.diff(np.append(idx, hs.size))
    return pa.table({
        "gram_hash": pa.array(hs[idx], pa.uint64()),
        "doc_id": pa.array(ds_[idx], pa.int64()),
        "n_occ": pa.array(n_occ.astype(np.int64), pa.int64()),
    })


def _dup_agg_partition(tbl: pa.Table, min_count: int) -> pa.Table:
    """One exchange partition -> duplicated grams it owns: sort by hash,
    reduceat-sum occurrences, row-count docs, keep n_occ >= min_count."""
    if tbl.num_rows == 0:
        return pa.table({"gram_hash": pa.array([], pa.uint64()),
                         "n_docs": pa.array([], pa.int64()),
                         "n_occ": pa.array([], pa.int64())})
    h = tbl["gram_hash"].to_numpy(zero_copy_only=False)
    occ = tbl["n_occ"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    hs, occs = h[order], occ[order]
    new = np.empty(hs.size, dtype=bool)
    new[0] = True
    new[1:] = hs[1:] != hs[:-1]
    starts = np.flatnonzero(new)
    n_docs = np.diff(np.append(starts, hs.size))   # one row per (h, doc)
    n_occ = np.add.reduceat(occs, starts)
    keep = n_occ >= min_count
    return pa.table({
        "gram_hash": pa.array(hs[starts][keep], pa.uint64()),
        "n_docs": pa.array(n_docs[keep].astype(np.int64), pa.int64()),
        "n_occ": pa.array(n_occ[keep].astype(np.int64), pa.int64()),
    })


def _doc_dup_partition(tbl: pa.Table, min_count: int) -> pa.Table:
    """One gram-hash partition -> (doc_id, n_dup_grams) partials: find the
    hashes duplicated within this partition (all rows of a hash are here),
    then sum each doc's occurrences over those hashes."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_dup_grams": pa.array([], pa.int64())})
    h = tbl["gram_hash"].to_numpy(zero_copy_only=False)
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    occ = tbl["n_occ"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    hs, docs, occs = h[order], doc[order], occ[order]
    new = np.empty(hs.size, dtype=bool)
    new[0] = True
    new[1:] = hs[1:] != hs[:-1]
    starts = np.flatnonzero(new)
    tot = np.add.reduceat(occs, starts)
    dup_row = np.repeat(tot >= min_count, np.diff(np.append(starts,
                                                            hs.size)))
    docs, occs = docs[dup_row], occs[dup_row]
    if docs.size == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_dup_grams": pa.array([], pa.int64())})
    d_order = np.argsort(docs, kind="stable")
    docs, occs = docs[d_order], occs[d_order]
    dnew = np.empty(docs.size, dtype=bool)
    dnew[0] = True
    dnew[1:] = docs[1:] != docs[:-1]
    dstarts = np.flatnonzero(dnew)
    return pa.table({
        "doc_id": pa.array(docs[dstarts], pa.int64()),
        "n_dup_grams": pa.array(
            np.add.reduceat(occs, dstarts).astype(np.int64), pa.int64()),
    })


def _sum_by_doc_partition(tbl: pa.Table) -> pa.Table:
    """Second-exchange reducer: sum n_dup_grams per doc_id."""
    if tbl.num_rows == 0:
        return tbl
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    v = tbl["n_dup_grams"].to_numpy(zero_copy_only=False)
    order = np.argsort(doc, kind="stable")
    docs, vs = doc[order], v[order]
    new = np.empty(docs.size, dtype=bool)
    new[0] = True
    new[1:] = docs[1:] != docs[:-1]
    starts = np.flatnonzero(new)
    return pa.table({
        "doc_id": pa.array(docs[starts], pa.int64()),
        "n_dup_grams": pa.array(
            np.add.reduceat(vs, starts).astype(np.int64), pa.int64()),
    })


def _partials(sf_dir: str, window: int):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(_gram_partials_batch, fn_kwargs={"window": window},
                          batch_format="pyarrow", zero_copy_batch=True)


def duplicate_spans(sf_dir: str, window: int = 4, min_count: int = 2):
    """All word ``window``-grams occurring >= ``min_count`` times in the
    corpus -> (gram_hash, n_docs, n_occ)."""
    return exchange_by_key(_partials(sf_dir, window), "gram_hash",
                           _dup_agg_partition,
                           proc_kwargs={"min_count": min_count})


def span_dedup_docs(sf_dir: str, window: int = 4, min_count: int = 2):
    """Per-document duplicated-span occurrence counts -> (doc_id,
    n_dup_grams); only documents containing at least one duplicated span
    appear."""
    per_part = exchange_by_key(_partials(sf_dir, window), "gram_hash",
                               _doc_dup_partition,
                               proc_kwargs={"min_count": min_count})
    return exchange_by_key(per_part, "doc_id", _sum_by_doc_partition,
                           n_parts=32)


# ---------------------------------------------------------------------------
# DuckDB oracles (fingerprint_sql's exact-FNV recipe; ASCII corpora)
# ---------------------------------------------------------------------------

def _hashed_cte(window: int) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) < {window} THEN [array_to_string(w, ' ')]
              ELSE [array_to_string(list_slice(w, j + 1, j + {window}), ' ')
                    FOR j IN range(len(w) - {window - 1})]
         END AS gs
  FROM g),
ex AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
hashed AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
                        [ascii(c)::HUGEINT FOR c IN string_split(gram, '')]),
           (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                     % 18446744073709551616::HUGEINT) AS h
  FROM ex),
agg AS (
  SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_occ
  FROM hashed GROUP BY h)"""


def duplicate_spans_sql(window: int = 4, min_count: int = 2) -> str:
    return f"""{_hashed_cte(window)}
SELECT CAST(h AS UBIGINT) AS gram_hash, n_docs, n_occ
FROM agg WHERE n_occ >= {min_count}"""


def span_dedup_docs_sql(window: int = 4, min_count: int = 2) -> str:
    return f"""{_hashed_cte(window)}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams
FROM hashed
WHERE h IN (SELECT h FROM agg WHERE n_occ >= {min_count})
GROUP BY doc_id"""


def _top_grams_partition(tbl: pa.Table, k: int) -> pa.Table:
    """One gram-hash partition -> ITS top-k grams by (n_occ DESC,
    gram_hash ASC): full per-hash aggregate (all rows of a hash are
    here), then a bounded cut — the driver merge sees <= n_parts * k
    rows regardless of vocabulary size."""
    full = _dup_agg_partition(tbl, min_count=1)
    if full.num_rows <= k:
        return full
    h = full["gram_hash"].to_numpy(zero_copy_only=False)
    occ = full["n_occ"].to_numpy(zero_copy_only=False)
    order = np.lexsort((h, -occ))[:k]
    return full.take(pa.array(order, pa.int64()))


def top_grams(sf_dir: str, window: int = 4, k: int = 20) -> pa.Table:
    """Global top-``k`` word ``window``-grams by total occurrence count
    (ties broken by ascending gram hash) — the boilerplate detector: the
    most-repeated spans of a crawl are headers/footers/templates, and
    this surfaces them WITHOUT any corpus-sized driver state (per-batch
    gram partials -> one hash exchange -> per-partition top-k -> a
    <= n_parts*k driver merge). Output: (rank, gram_hash, n_docs,
    n_occ)."""
    out = exchange_by_key(_partials(sf_dir, window), "gram_hash",
                          _top_grams_partition, proc_kwargs={"k": k})
    t = out.to_pandas()
    h = t["gram_hash"].to_numpy()
    occ = t["n_occ"].to_numpy()
    order = np.lexsort((h, -occ))[:k]
    t = t.iloc[order]
    return pa.table({
        "rank": pa.array(np.arange(1, len(t) + 1, dtype=np.int64),
                         pa.int64()),
        "gram_hash": pa.array(t["gram_hash"].to_numpy(), pa.uint64()),
        "n_docs": pa.array(t["n_docs"].to_numpy(), pa.int64()),
        "n_occ": pa.array(t["n_occ"].to_numpy(), pa.int64())})


def top_grams_sql(window: int = 4, k: int = 20) -> str:
    return f"""{_hashed_cte(window)}
SELECT CAST(row_number() OVER (ORDER BY n_occ DESC, h ASC) AS BIGINT)
         AS rank,
       CAST(h AS UBIGINT) AS gram_hash, n_docs, n_occ
FROM agg ORDER BY n_occ DESC, h ASC LIMIT {k}"""


# ---------------------------------------------------------------------------
# Length-MAXIMAL duplicate spans (ExactSubstr proper, Lee et al. 2022 §4:
# the unit of removal is the longest duplicated substring, not the k-gram).
# Realization: flag each gram POSITION whose hash is corpus-duplicated
# (first exchange, by gram_hash — all occurrences of a hash meet in one
# partition), then merge runs of consecutive duplicated positions into
# maximal extents per document (second exchange, by doc_id; vectorized
# gaps-and-islands over the position runs). A run of n consecutive
# duplicated k-grams covers tokens [start, start + n + k - 1).
# ---------------------------------------------------------------------------

def _gram_pos_batch(batch: pa.Table, window: int) -> pa.Table:
    """(gram_hash, doc_id, pos) — one row per gram OCCURRENCE with its
    token position (vs ``_gram_partials_batch``'s pre-aggregated counts:
    extents need positions)."""
    texts = batch["text"].to_pylist()
    if not texts:
        return pa.table({"gram_hash": pa.array([], pa.uint64()),
                         "doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    buf, g_start, lens, g_cum = gram_slices(texts, window)
    h = fnv64_slices(buf, g_start, lens)
    per_doc = np.diff(g_cum)
    doc = np.repeat(batch["doc_id"].to_numpy(), per_doc)
    pos = np.arange(h.size, dtype=np.int64) - np.repeat(g_cum[:-1], per_doc)
    return pa.table({
        "gram_hash": pa.array(h, pa.uint64()),
        "doc_id": pa.array(doc, pa.int64()),
        "pos": pa.array(pos, pa.int64()),
    })


def _dup_pos_partition(tbl: pa.Table, min_count: int) -> pa.Table:
    """One gram-hash partition -> the (doc_id, pos) rows of its duplicated
    hashes (total occurrences across the corpus >= min_count; all rows of
    a hash are local by the exchange invariant)."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    h = tbl["gram_hash"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    new = np.empty(hs.size, dtype=bool)
    new[0] = True
    new[1:] = hs[1:] != hs[:-1]
    starts = np.flatnonzero(new)
    tot = np.diff(np.append(starts, hs.size))
    dup_row = np.repeat(tot >= min_count, tot)
    keep = order[dup_row]
    return pa.table({
        "doc_id": pa.array(
            tbl["doc_id"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
        "pos": pa.array(
            tbl["pos"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
    })


def _extent_partition(tbl: pa.Table, window: int) -> pa.Table:
    """One doc_id partition -> maximal extents: sort (doc, pos), island =
    run of consecutive positions within a doc, span covers tokens
    [min_pos, max_pos + window)."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "span_start": pa.array([], pa.int64()),
                         "span_end": pa.array([], pa.int64()),
                         "n_grams": pa.array([], pa.int64())})
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    pos = tbl["pos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, doc))
    d, p = doc[order], pos[order]
    new = np.empty(d.size, dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (p[1:] != p[:-1] + 1)
    starts = np.flatnonzero(new)
    n = np.diff(np.append(starts, d.size)).astype(np.int64)
    last = starts + n - 1
    return pa.table({
        "doc_id": pa.array(d[starts], pa.int64()),
        "span_start": pa.array(p[starts], pa.int64()),
        "span_end": pa.array(p[last] + window, pa.int64()),
        "n_grams": pa.array(n, pa.int64()),
    })


def duplicate_span_extents(sf_dir: str, window: int = 4,
                           min_count: int = 2):
    """Maximal duplicated spans per document -> (doc_id, span_start,
    span_end, n_grams) with token-index extents; adjacent duplicated
    ``window``-grams merge into one span (ExactSubstr's
    longest-duplicate-substring unit at word granularity)."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rows = ds.map_batches(_gram_pos_batch, fn_kwargs={"window": window},
                          batch_format="pyarrow", zero_copy_batch=True)
    hits = exchange_by_key(rows, "gram_hash", _dup_pos_partition,
                           proc_kwargs={"min_count": min_count})
    return exchange_by_key(hits, "doc_id", _extent_partition,
                           proc_kwargs={"window": window}, n_parts=32)


def duplicate_span_extents_sql(window: int = 4, min_count: int = 2) -> str:
    """Oracle for ``duplicate_span_extents``: positions via UNNEST(range),
    the exact-FNV gram hashes, duplicated-hash filter, then the classic
    gaps-and-islands (pos - row_number partitions consecutive runs)."""
    return f"""
WITH g AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ex AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         array_to_string(list_slice(w, CAST(u.i AS INTEGER) + 1,
                                    CAST(u.i AS INTEGER) + {window}), ' ')
           AS gram
  FROM g, UNNEST(range(CASE WHEN len(w) < {window} THEN 1
                            ELSE len(w) - {window - 1} END)) u(i)),
hashed AS (
  SELECT doc_id, pos,
         list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
                        [ascii(c)::HUGEINT FOR c IN string_split(gram, '')]),
           (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                     % 18446744073709551616::HUGEINT) AS h
  FROM ex),
dup AS (SELECT h FROM hashed GROUP BY h HAVING count(*) >= {min_count}),
hits AS (SELECT doc_id, pos FROM hashed WHERE h IN (SELECT h FROM dup)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits)
SELECT doc_id, min(pos) AS span_start,
       max(pos) + {window} AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, grp"""


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag corpus documents sharing any k-gram with
# a held-out benchmark set (the standard eval-leakage check run before
# training). Benchmark here = the texts of the N lexicographically-first
# doc_ids (deterministic; in production, the eval set's text column).
# ---------------------------------------------------------------------------

def _benchmark_hashes(sf_dir: str, window: int, n_bench: int) -> tuple:
    """(bench doc_ids, gram-hash set of their texts) — tiny driver read of
    exactly n_bench rows; the hash set broadcasts (benchmark sets are
    small by nature — eval suites, not corpora)."""
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    dset = pads.dataset(f"{sf_dir}/documents.parquet")
    # key-column-only scan for the id selection, then a pushdown-filtered
    # read of exactly n_bench rows — the text column never reaches the
    # driver for non-benchmark documents
    ids = dset.to_table(columns=["doc_id"])["doc_id"].to_numpy(
        zero_copy_only=False)
    if ids.size > n_bench:
        ids = ids[np.argpartition(ids, n_bench - 1)[:n_bench]]
    sel = np.sort(ids)
    bench = dset.to_table(columns=["doc_id", "text"],
                          filter=pc.field("doc_id").isin(sel.tolist()))
    bench = bench.take(pc.sort_indices(bench["doc_id"]))
    buf, g_start, lens, _ = gram_slices(bench["text"].to_pylist(), window)
    return (set(bench["doc_id"].to_pylist()),
            fnv64_slices(buf, g_start, lens))


def contamination(sf_dir: str, window: int = 4, n_bench: int = 5,
                  bench_broadcast_limit: int = 1_000_000):
    """(doc_id, n_contaminated_grams) for every NON-benchmark document
    sharing at least one word ``window``-gram with the benchmark texts.

    Two bit-identical routes on the standard threshold convention:

    - benchmark gram set ≤ ``bench_broadcast_limit`` (the normal case —
      eval suites are small): broadcast the exact hash set, row-local
      map_batches, no shuffle.
    - above it (decontaminating against another CORPUS): broadcast only
      a fixed-size BLOOM FILTER of the benchmark hashes (no false
      negatives, so no contaminated gram is missed), emit the
      bloom-positive candidate occurrences, and confirm them EXACTLY
      with one `exchange.hash_join` against the deduped benchmark
      hashes — candidate volume is corpus × bloom-FP-rate, not corpus.
      False positives die in the join, so the output is bit-identical
      (pytest pins limit=0 ≡ broadcast)."""
    import ray
    import ray.data as rd

    bench_ids, bench_hashes = _benchmark_hashes(sf_dir, window, n_bench)
    uniq_bench = np.unique(bench_hashes)
    if uniq_bench.size > bench_broadcast_limit:
        return _contamination_bloom(sf_dir, window, bench_ids, uniq_bench)
    ref = ray.put((bench_ids, uniq_bench))

    def flag(batch: pa.Table) -> pa.Table:
        ids_set, bh = ray.get(ref)
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if not texts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_contaminated_grams": pa.array([],
                                                              pa.int64())})
        buf, g_start, lens, g_cum = gram_slices(texts, window)
        h = fnv64_slices(buf, g_start, lens)
        hit = np.isin(h, bh)
        counts = np.add.reduceat(hit.astype(np.int64), g_cum[:-1])
        counts[np.diff(g_cum) == 0] = 0
        keep = (counts > 0) & ~np.isin(
            ids, np.fromiter(ids_set, dtype=np.int64, count=len(ids_set)))
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_contaminated_grams": pa.array(counts[keep], pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(flag, batch_format="pyarrow",
                          zero_copy_batch=True)


_BLOOM_BITS = 1 << 14
_BLOOM_K = 3


def _contamination_bloom(sf_dir: str, window: int, bench_ids: set,
                         uniq_bench: np.ndarray, bits: int = _BLOOM_BITS,
                         k: int = _BLOOM_K):
    """The big-benchmark route: fixed-size Bloom prefilter (broadcast)
    + exact confirmation through the co-partitioned hash join."""
    import ray
    import ray.data as rd

    from .exchange import hash_join
    from .sketch import _cm_indices
    from .exchange import _mix

    bitset = np.zeros(bits, dtype=bool)
    bitset[_cm_indices(_mix(uniq_bench.astype(np.uint64)), k, bits)] = True
    bid = np.fromiter(bench_ids, dtype=np.int64, count=len(bench_ids))
    ref = ray.put((bid, bitset))

    def candidates(batch: pa.Table) -> pa.Table:
        ids_arr, bs = ray.get(ref)
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "h": pa.array([], pa.int64())})
        if not texts:
            return empty
        buf, g_start, lens, g_cum = gram_slices(texts, window)
        h = fnv64_slices(buf, g_start, lens)
        if h.size == 0:
            return empty
        doc_of = np.repeat(ids, np.diff(g_cum))
        possible = bs[_cm_indices(_mix(h), k, bs.size)].all(axis=0)
        possible &= ~np.isin(doc_of, ids_arr)      # benchmark docs excluded
        return pa.table({
            "doc_id": pa.array(doc_of[possible], pa.int64()),
            "h": pa.array(h[possible].view(np.int64), pa.int64())})

    cand = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True)
    bench_ds = rd.from_arrow(pa.table({
        "bh": pa.array(uniq_bench.view(np.int64), pa.int64())}))
    confirmed = hash_join(cand, bench_ds, "h", "bh")
    return (confirmed.groupby("doc_id").count()
            .map_batches(lambda b: pa.table({
                "doc_id": b["doc_id"],
                "n_contaminated_grams": pa.compute.cast(
                    b["count()"], pa.int64())}), batch_format="pyarrow"))


def contamination_sql(window: int = 4, n_bench: int = 5) -> str:
    """Oracle for ``contamination``: benchmark = n_bench smallest doc_ids;
    both gram sets hashed with the exact-FNV recipe; per-doc count of
    grams present in the benchmark's distinct hash set."""
    return f"""{_hashed_cte(window)},
bench AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT {n_bench}),
bh AS (SELECT DISTINCT h FROM hashed WHERE doc_id IN
       (SELECT doc_id FROM bench)),
flagged AS (
  SELECT hs.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_grams
  FROM hashed hs JOIN bh ON hs.h = bh.h
  WHERE hs.doc_id NOT IN (SELECT doc_id FROM bench)
  GROUP BY hs.doc_id)
SELECT doc_id, n_contaminated_grams FROM flagged"""


# ---------------------------------------------------------------------------
# Char-granularity maximal duplicate extents — ExactSubstr at the
# paper's own unit (Lee et al. 2022 operate on byte streams with a
# minimum match length, not word tokens). Grams are k-char sliding
# windows (every char offset; a document shorter than k contributes its
# whole text as the single gram, mirroring the word path); the two
# exchanges and the gaps-and-islands merge are the SAME stages as the
# word variant — only the gram extraction differs. Extents come back in
# CHAR offsets: [span_start, span_end) with span_end = last_pos + k.
# The SQL oracle hashes substr() grams with the identical list_reduce
# FNV-1a recipe (ASCII corpora: ascii(c) == the utf-8 byte).
# ---------------------------------------------------------------------------

def _char_gram_pos_batch(batch: pa.Table, k: int) -> pa.Table:
    """(gram_hash, doc_id, pos) — one row per k-char gram occurrence,
    pos = char offset; fully vectorized (one concatenated byte buffer,
    sliding starts, shared FNV kernel)."""
    texts = batch["text"].to_pylist()
    if not texts:
        return pa.table({"gram_hash": pa.array([], pa.uint64()),
                         "doc_id": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64())})
    enc = [(t or "").encode() for t in texts]
    lens = np.fromiter((len(e) for e in enc), np.int64, len(enc))
    doc_off = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum(lens, out=doc_off[1:])
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    n_grams = np.maximum(lens - k + 1, 1)
    g_cum = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum(n_grams, out=g_cum[1:])
    total = int(g_cum[-1])
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(g_cum[:-1], n_grams))
    starts = np.repeat(doc_off[:-1], n_grams) + pos
    doc_lens = np.repeat(lens, n_grams)
    glens = np.minimum(doc_lens, k)
    h = fnv64_slices(buf, starts, glens)
    return pa.table({
        "gram_hash": pa.array(h, pa.uint64()),
        "doc_id": pa.array(
            np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False),
                      n_grams), pa.int64()),
        "pos": pa.array(pos, pa.int64()),
    })


def duplicate_char_extents(sf_dir: str, k: int = 20, min_count: int = 2):
    """Maximal duplicated CHAR spans per document -> (doc_id, span_start,
    span_end, n_grams); the word variant's pipeline with k-char sliding
    grams (hashes travel, text does not)."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rows = ds.map_batches(_char_gram_pos_batch, fn_kwargs={"k": k},
                          batch_format="pyarrow", zero_copy_batch=True)
    hits = exchange_by_key(rows, "gram_hash", _dup_pos_partition,
                           proc_kwargs={"min_count": min_count})
    return exchange_by_key(hits, "doc_id", _extent_partition,
                           proc_kwargs={"window": k}, n_parts=32)


def duplicate_char_extents_sql(k: int = 20, min_count: int = 2) -> str:
    """Oracle for ``duplicate_char_extents``: substr() sliding grams,
    the exact list_reduce FNV-1a, duplicated-hash filter, classic
    gaps-and-islands."""
    return f"""
WITH ex AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         substr(text, CAST(u.i AS INTEGER) + 1,
                CASE WHEN length(text) < {k}
                     THEN length(text) ELSE {k} END) AS gram
  FROM documents,
       UNNEST(range(CASE WHEN length(text) < {k} THEN 1
                         ELSE length(text) - {k - 1} END)) u(i)),
hashed AS (
  SELECT doc_id, pos,
         list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
                        [ascii(c)::HUGEINT FOR c IN string_split(gram, '')]),
           (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                     % 18446744073709551616::HUGEINT) AS h
  FROM ex),
dup AS (SELECT h FROM hashed GROUP BY h HAVING count(*) >= {min_count}),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hashed WHERE h IN (SELECT h FROM dup))
SELECT doc_id, min(pos) AS span_start,
       max(pos) + {k} AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, grp"""


# ---------------------------------------------------------------------------
# Gram novelty — the inverse signal of span dedup: what fraction of a
# document's word k-grams appears NOWHERE else in the corpus (count 1
# globally)? High novelty = original text; low = boilerplate/templated.
# Same partials and exchanges as span_dedup_docs (hashes travel, text
# does not); novelty_ppm = n_novel * 1e6 // n_grams is integer-exact.
# ---------------------------------------------------------------------------

def _doc_novel_partition(tbl: pa.Table) -> pa.Table:
    """One gram-hash partition -> per-doc (n_grams, n_novel) partials:
    all rows of a hash are here, so global-count-1 is decidable locally
    (one row with n_occ == 1)."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_grams": pa.array([], pa.int64()),
                         "n_novel": pa.array([], pa.int64())})
    h = tbl["gram_hash"].to_numpy(zero_copy_only=False)
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    occ = tbl["n_occ"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    hs, docs, occs = h[order], doc[order], occ[order]
    new = np.empty(hs.size, dtype=bool)
    new[0] = True
    new[1:] = hs[1:] != hs[:-1]
    starts = np.flatnonzero(new)
    tot = np.add.reduceat(occs, starts)
    sz = np.diff(np.append(starts, hs.size))
    novel_row = np.repeat((tot == 1) & (sz == 1), sz)
    d_order = np.argsort(docs, kind="stable")
    docs, occs = docs[d_order], occs[d_order]
    novel = novel_row[d_order].astype(np.int64)
    dnew = np.empty(docs.size, dtype=bool)
    dnew[0] = True
    dnew[1:] = docs[1:] != docs[:-1]
    dstarts = np.flatnonzero(dnew)
    return pa.table({
        "doc_id": pa.array(docs[dstarts], pa.int64()),
        "n_grams": pa.array(np.add.reduceat(occs, dstarts).astype(np.int64),
                            pa.int64()),
        "n_novel": pa.array(np.add.reduceat(novel, dstarts), pa.int64()),
    })


def _novelty_final_partition(tbl: pa.Table) -> pa.Table:
    """Second exchange: sum per-doc partials, finish the ppm ratio."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_grams": pa.array([], pa.int64()),
                         "n_novel": pa.array([], pa.int64()),
                         "novelty_ppm": pa.array([], pa.int64())})
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    g = tbl["n_grams"].to_numpy(zero_copy_only=False)
    nv = tbl["n_novel"].to_numpy(zero_copy_only=False)
    order = np.argsort(doc, kind="stable")
    doc, g, nv = doc[order], g[order], nv[order]
    new = np.empty(doc.size, dtype=bool)
    new[0] = True
    new[1:] = doc[1:] != doc[:-1]
    starts = np.flatnonzero(new)
    gs = np.add.reduceat(g, starts)
    ns = np.add.reduceat(nv, starts)
    return pa.table({
        "doc_id": pa.array(doc[starts], pa.int64()),
        "n_grams": pa.array(gs, pa.int64()),
        "n_novel": pa.array(ns, pa.int64()),
        "novelty_ppm": pa.array(ns * 1_000_000 // np.maximum(gs, 1),
                                pa.int64()),
    })


def gram_novelty(sf_dir: str, window: int = 4):
    """Per-document novelty -> (doc_id, n_grams, n_novel, novelty_ppm)."""
    per_part = exchange_by_key(_partials(sf_dir, window), "gram_hash",
                               _doc_novel_partition)
    return exchange_by_key(per_part, "doc_id", _novelty_final_partition,
                           n_parts=32)


def gram_novelty_sql(window: int = 4) -> str:
    """Oracle: position-level novelty flags over the shared FNV gram
    CTE, integer ppm ratio."""
    return f"""{_hashed_cte(window)}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (h IN (SELECT h FROM agg WHERE n_occ = 1))
            AS BIGINT) AS n_novel,
       CAST(count(*) FILTER (h IN (SELECT h FROM agg WHERE n_occ = 1))
            * 1000000 // count(*) AS BIGINT) AS novelty_ppm
FROM hashed GROUP BY doc_id"""
