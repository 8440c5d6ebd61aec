"""C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2) — the
canonical within-document cleaning pass a training-data pipeline runs
BEFORE doc-level dedup: per-line heuristic filters plus GLOBAL
duplicate-line removal (C4 discards all but one occurrence of any
repeated three-sentence span; the unit here is the line).

The synthetic corpus is a single-space word stream with no line
structure, so — like `redact_pii` / `html_clean` — structure is
synthesized deterministically: document ``doc_id`` is split into lines
of ``L = 5 + doc_id % 4`` words (SQL-mirrorable), and the C4 rules map
onto that unit:

1. completeness — only FULL ``L``-word lines survive (the analog of
   C4's "ends in terminal punctuation": the trailing ragged line is
   unterminated);
2. blocklist   — lines containing the word ``dup`` are dropped (the
   analog of C4's bad-word list, drawn from the corpus vocabulary);
3. global dedup — of every set of identical surviving lines across the
   WHOLE corpus, only the occurrence with the smallest
   ``(doc_id, line_no)`` is kept;
4. doc filter  — documents with fewer than 3 kept lines are dropped
   (C4's "at least three sentences").

Scale shape: lines never travel as text. Pass A ships only
``(h1, h2, doc_id, line_no)`` — a 128-bit FNV-1a pair (two offset
bases) — through ONE `exchange_by_key` keyed by ``h1``; each partition
dedups its hash-groups with a lexsort and emits REMOVAL markers
(duplicate occurrences only — output is duplicates-sized, not
corpus-sized). Both engine and oracle dedup on the (h1, h2) PAIR, so
they agree bit-for-bit even in the astronomically-unlikely collision
case (P ≈ n²/2^129). Pass B drops marked lines and rebuilds documents:
markers are broadcast (``ray.put`` once) when few, else routed through
a second doc_id-keyed exchange that co-locates markers with their
documents (the `clean_corpus` hydrate pattern) — no driver-side text.

Reference: the reference engine has no corpus cleaner (crawl HTML goes
straight to Jsoup + indexing, PreIndexer.java:48-75); this op is part
of the beyond-reference training-data surface mandated for the rebuild.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import word_bounds, fnv64_slices

# second FNV-1a offset basis (golden-ratio constant) — the (h1, h2)
# pair is the 128-bit dedup key
_FNV64_OFFSET2 = np.uint64(0x9E3779B97F4A7C15)
_BAD = b"dup"
MIN_LINES = 3
# broadcast the removal markers below this count; route through a
# doc_id-keyed exchange above it (markers are duplicate-occurrences
# only, but at 100 TB "few" is not guaranteed)
BROADCAST_LIMIT = 5_000_000
_LINE_BITS = 20                  # (doc_id << 20 | line_no) packed key


def _doc_lines(texts: list, doc_ids: np.ndarray):
    """Byte ranges of every SURVIVING line (full ``L``-word lines not
    containing the blocklist word) of every text, vectorized from the
    shared `word_bounds` scan. Returns ``(buf, starts, lens, line_doc,
    line_no)`` with ``line_doc`` ascending (doc-major order)."""
    n_docs = len(texts)
    empty = (np.asarray([], np.uint8), np.asarray([], np.int64),
             np.asarray([], np.int64), np.asarray([], np.int64),
             np.asarray([], np.int64))
    if n_docs == 0:
        return empty
    buf, doc_off, w_starts, w_ends, w_cum = word_bounds(texts)
    n_words = np.diff(w_cum)
    L = 5 + (doc_ids.astype(np.int64) % 4)
    n_lines = n_words // L                      # full lines only (rule 1)
    total = int(n_lines.sum())
    if total == 0:
        return empty
    line_doc = np.repeat(np.arange(n_docs, dtype=np.int64), n_lines)
    l_cum = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_lines, out=l_cum[1:])
    line_no = np.arange(total, dtype=np.int64) - l_cum[line_doc]
    Lr = L[line_doc]
    w0 = w_cum[line_doc] + line_no * Lr
    starts = w_starts[w0]
    ends = w_ends[w0 + Lr - 1]

    # rule 2: cumulative count of blocklist words over the word index
    wl = w_ends - w_starts
    cand = np.flatnonzero(wl == len(_BAD))
    if cand.size:
        match = np.ones(cand.size, dtype=bool)
        for j, b in enumerate(_BAD):
            match &= buf[w_starts[cand] + j] == b
        cand = cand[match]
    bad_cum = np.zeros(w_starts.size + 1, dtype=np.int64)
    bad_cum[cand + 1] = 1
    np.cumsum(bad_cum, out=bad_cum)
    ok = (bad_cum[w0 + Lr] - bad_cum[w0]) == 0
    return (buf, starts[ok], (ends - starts)[ok], line_doc[ok],
            line_no[ok])


def _line_hash_partial(batch: pa.Table) -> pa.Table:
    """Pass A per-batch map: every surviving line's 128-bit hash pair +
    its (doc_id, line_no) coordinate — text stays in the batch."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    buf, s, ln, ldoc, lno = _doc_lines(batch["text"].to_pylist(), ids)
    return pa.table({
        "h1": pa.array(fnv64_slices(buf, s, ln), pa.uint64()),
        "h2": pa.array(fnv64_slices(buf, s, ln, offset=_FNV64_OFFSET2),
                       pa.uint64()),
        "doc_id": pa.array(ids[ldoc] if ldoc.size else
                           np.asarray([], np.int64), pa.int64()),
        "line_no": pa.array(lno, pa.int64())})


def _dup_markers_partition(tbl: pa.Table) -> pa.Table:
    """All rows of a hash-group land here; keep the smallest
    (doc_id, line_no) per (h1, h2), emit the REST as removal markers."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "line_no": pa.array([], pa.int64())})
    h1 = tbl["h1"].to_numpy(zero_copy_only=False)
    h2 = tbl["h2"].to_numpy(zero_copy_only=False)
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    lno = tbl["line_no"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lno, doc, h2, h1))
    h1, h2, doc, lno = h1[order], h2[order], doc[order], lno[order]
    first = np.empty(h1.size, dtype=bool)
    first[0] = True
    first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    return pa.table({"doc_id": pa.array(doc[~first], pa.int64()),
                     "line_no": pa.array(lno[~first], pa.int64())})


def _assemble(buf: np.ndarray, s: np.ndarray, ln: np.ndarray,
              ldoc: np.ndarray, keep: np.ndarray, ids: np.ndarray,
              n_docs: int, min_lines: int = MIN_LINES) -> pa.Table:
    """Kept line slices (doc-major) -> (doc_id, text_out) rows for docs
    with >= ``min_lines`` kept lines. Output-sized Python work only."""
    s, ln, ldoc = s[keep], ln[keep], ldoc[keep]
    kept_per_doc = np.bincount(ldoc, minlength=n_docs)
    mv = buf.tobytes()
    out_ids, out_texts = [], []
    pos = 0
    for d in range(n_docs):
        k = int(kept_per_doc[d])
        if k >= min_lines:
            parts = [mv[s[i]:s[i] + ln[i]] for i in range(pos, pos + k)]
            out_ids.append(int(ids[d]))
            out_texts.append(b"\n".join(parts).decode())
        pos += k
    return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                     "text_out": pa.array(out_texts, pa.string())})


def _pack(doc: np.ndarray, lno: np.ndarray) -> np.ndarray:
    return (doc.astype(np.uint64) << np.uint64(_LINE_BITS)) | \
        lno.astype(np.uint64)


def _clean_batch(batch: pa.Table, rem_sorted: np.ndarray,
                 min_lines: int = MIN_LINES) -> pa.Table:
    """Pass B per-batch map (broadcast route): rebuild each document
    from its surviving, non-removed lines."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    buf, s, ln, ldoc, lno = _doc_lines(texts, ids)
    keep = np.ones(s.size, dtype=bool)
    if rem_sorted.size and s.size:
        keys = _pack(ids[ldoc], lno)
        pos = np.searchsorted(rem_sorted, keys)
        pos[pos == rem_sorted.size] = 0
        keep = rem_sorted[pos] != keys
    return _assemble(buf, s, ln, ldoc, keep, ids, len(texts), min_lines)


def _rebuild_partition(tbl: pa.Table,
                       min_lines: int = MIN_LINES) -> pa.Table:
    """Pass B partition proc (exchange route): doc rows (text non-null)
    + removal markers (text null, line_no >= 0) co-located by doc_id."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "text_out": pa.array([], pa.string())})
    is_marker = pa.compute.is_null(tbl["text"]).to_numpy(
        zero_copy_only=False)
    docs = tbl.filter(pa.array(~is_marker))
    ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    texts = docs["text"].to_pylist()
    mk = tbl.filter(pa.array(is_marker))
    rem = np.sort(_pack(
        mk["doc_id"].to_numpy(zero_copy_only=False),
        mk["line_no"].to_numpy(zero_copy_only=False)))
    buf, s, ln, ldoc, lno = _doc_lines(texts, ids)
    keep = np.ones(s.size, dtype=bool)
    if rem.size and s.size:
        keys = _pack(ids[ldoc], lno)
        pos = np.searchsorted(rem, keys)
        pos[pos == rem.size] = 0
        keep = rem[pos] != keys
    return _assemble(buf, s, ln, ldoc, keep, ids, len(texts), min_lines)


def _remove_marked_lines(docs, marks, broadcast_limit: int,
                         min_lines: int):
    """Shared pass B: drop every (doc_id, line_no) in ``marks`` from the
    ``docs`` Dataset and rebuild (doc_id, text_out). Markers are
    broadcast (``ray.put`` once) when few, else routed through a
    doc_id-keyed exchange co-locating markers with their documents —
    no driver-side text either way."""
    import ray

    from .exchange import exchange_by_key

    n_marks = marks.count()
    if n_marks <= broadcast_limit:
        mk = marks.to_pandas()
        if len(mk) and (mk["line_no"].to_numpy() >=
                        (1 << _LINE_BITS)).any():
            n_marks = broadcast_limit + 1      # packed key unsafe: route
    if n_marks <= broadcast_limit:
        rem = np.sort(_pack(mk["doc_id"].to_numpy(),
                            mk["line_no"].to_numpy()))
        rem_ref = ray.put(rem)

        def clean(batch: pa.Table) -> pa.Table:
            return _clean_batch(batch, ray.get(rem_ref), min_lines)

        return docs.map_batches(clean, batch_format="pyarrow",
                                zero_copy_batch=True)

    def as_marker(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "line_no": batch["line_no"],
            "text": pa.array([None] * batch.num_rows, pa.string())})

    def as_doc(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "line_no": pa.array(np.full(batch.num_rows, -1, np.int64),
                                pa.int64()),
            "text": batch["text"]})

    unioned = docs.map_batches(as_doc, batch_format="pyarrow",
                               zero_copy_batch=True).union(
        marks.map_batches(as_marker, batch_format="pyarrow",
                          zero_copy_batch=True))
    return exchange_by_key(unioned, "doc_id", _rebuild_partition,
                           proc_kwargs={"min_lines": min_lines})


def c4_clean(sf_dir: str, broadcast_limit: int = BROADCAST_LIMIT):
    """The full C4-style pass over ``documents`` -> Dataset of
    (doc_id, text_out)."""
    import ray.data as rd

    from .exchange import exchange_by_key

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    marks = exchange_by_key(
        docs.map_batches(_line_hash_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        "h1", _dup_markers_partition)
    return _remove_marked_lines(docs, marks, broadcast_limit, MIN_LINES)


_FNV_FOLD = ("(h, b) -> (xor(h, b) * 1099511628211::HUGEINT)"
             " % 18446744073709551616::HUGEINT")


def _fnv_expr(col: str, offset: int) -> str:
    return (f"list_reduce(list_prepend({offset}::HUGEINT,"
            f" [ascii(c)::HUGEINT FOR c IN string_split({col}, '')]),"
            f" {_FNV_FOLD})")


def c4_clean_sql() -> str:
    """DuckDB oracle: identical line synthesis, filters, (h1, h2)-pair
    global dedup (hash-pair, NOT text — bit-agreement with the engine
    even under a collision), and reconstruction. ASCII-corpus caveat as
    `fingerprint_sql`."""
    return f"""
WITH c4_w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, 5 + doc_id % 4 AS L
  FROM documents),
c4_lines AS (
  SELECT doc_id, CAST(u.j AS BIGINT) AS line_no,
         array_to_string(list_slice(ws, u.j*L + 1, u.j*L + L), ' ')
           AS ltext
  FROM c4_w, unnest(range(len(ws) // L)) AS u(j)
  WHERE NOT list_contains(list_slice(ws, u.j*L + 1, u.j*L + L), 'dup')),
c4_hashed AS (
  SELECT doc_id, line_no, ltext,
         {_fnv_expr('ltext', 0xCBF29CE484222325)} AS h1,
         {_fnv_expr('ltext', 0x9E3779B97F4A7C15)} AS h2
  FROM c4_lines),
c4_keep AS (
  SELECT doc_id, line_no,
         row_number() OVER (PARTITION BY h1, h2
                            ORDER BY doc_id, line_no) AS rn
  FROM c4_hashed),
c4_rebuilt AS (
  SELECT l.doc_id,
         string_agg(l.ltext, chr(10) ORDER BY l.line_no) AS text_out,
         count(*) AS nl
  FROM c4_lines l
  JOIN c4_keep k ON l.doc_id = k.doc_id AND l.line_no = k.line_no
                 AND k.rn = 1
  GROUP BY l.doc_id)
SELECT doc_id, text_out FROM c4_rebuilt WHERE nl >= {MIN_LINES}"""


# ---------------------------------------------------------------------------
# Per-source boilerplate-line removal (CCNet, Wenzek et al. 2020 §4.1 /
# trafilatura-style template stripping): a line occurring in >= T DISTINCT
# documents of the SAME source is template chrome (nav bars, footers,
# cookie banners) — remove EVERY occurrence. Differs from `c4_clean`'s
# global dedup (which keeps the first occurrence) in both scope (per
# source, not global) and action (all occurrences removed, none kept):
# dedup de-duplicates content, boilerplate removal deletes template text.
# Same line unit as c4_clean (full L-word non-blocklist lines) so the
# two passes compose; docs keep >= 1 surviving line to be emitted.
#
# Scale shape: pass A ships (src, h1, h2, doc_id, line_no) — the source
# as a 64-bit FNV so the exchange stays fixed-width — through ONE
# `exchange_by_key` on h1 (all occurrences of a line text co-locate
# regardless of source); each partition counts distinct docs per
# (src, h1, h2) group with a lexsort and emits ALL rows of
# over-threshold groups as removal markers (output ∝ boilerplate
# volume). Pass B is the shared `_remove_marked_lines`. Both engine
# and oracle group on the hashed triple, so they agree bit-for-bit
# even under a hash collision.
# ---------------------------------------------------------------------------

BOILER_THRESHOLD = 2


def _fnv64_strings(vals: list) -> np.ndarray:
    """FNV-1a 64 per string; scalar loop over DISTINCT values only
    (source cardinality is tiny next to row count)."""
    arr = np.asarray(vals, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    prime, mask = 0x100000001B3, (1 << 64) - 1
    hs = np.empty(uniq.size, np.uint64)
    for i, v in enumerate(uniq):
        h = 0xCBF29CE484222325
        for b in str(v).encode():
            h = ((h ^ b) * prime) & mask
        hs[i] = h
    return hs[inv] if arr.size else np.asarray([], np.uint64)


def _boiler_hash_partial(batch: pa.Table) -> pa.Table:
    """Pass A per-batch map: surviving-line hash pair + source hash +
    (doc_id, line_no) coordinate — text stays in the batch."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    buf, s, ln, ldoc, lno = _doc_lines(batch["text"].to_pylist(), ids)
    src = _fnv64_strings(batch["source"].to_pylist())
    return pa.table({
        "h1": pa.array(fnv64_slices(buf, s, ln), pa.uint64()),
        "h2": pa.array(fnv64_slices(buf, s, ln, offset=_FNV64_OFFSET2),
                       pa.uint64()),
        "src": pa.array(src[ldoc] if ldoc.size else
                        np.asarray([], np.uint64), pa.uint64()),
        "doc_id": pa.array(ids[ldoc] if ldoc.size else
                           np.asarray([], np.int64), pa.int64()),
        "line_no": pa.array(lno, pa.int64())})


def _boiler_markers_partition(tbl: pa.Table,
                              threshold: int = BOILER_THRESHOLD
                              ) -> pa.Table:
    """All rows of each h1 hash-group land here; emit ALL occurrences of
    every (src, h1, h2) group spanning >= threshold distinct docs."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "line_no": pa.array([], pa.int64())})
    h1 = tbl["h1"].to_numpy(zero_copy_only=False)
    h2 = tbl["h2"].to_numpy(zero_copy_only=False)
    src = tbl["src"].to_numpy(zero_copy_only=False)
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    lno = tbl["line_no"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lno, doc, h2, h1, src))
    h1, h2, src, doc, lno = (h1[order], h2[order], src[order],
                             doc[order], lno[order])
    new_grp = np.empty(h1.size, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = ((src[1:] != src[:-1]) | (h1[1:] != h1[:-1])
                   | (h2[1:] != h2[:-1]))
    gid = np.cumsum(new_grp) - 1
    new_doc = new_grp.copy()
    new_doc[1:] |= doc[1:] != doc[:-1]      # doc sorted within group
    n_distinct = np.bincount(gid[new_doc])
    boiler = n_distinct[gid] >= threshold
    return pa.table({"doc_id": pa.array(doc[boiler], pa.int64()),
                     "line_no": pa.array(lno[boiler], pa.int64())})


def boilerplate_clean(sf_dir: str, threshold: int = BOILER_THRESHOLD,
                      broadcast_limit: int = BROADCAST_LIMIT):
    """Per-source boilerplate-line removal over ``documents`` ->
    Dataset of (doc_id, text_out)."""
    import ray.data as rd

    from .exchange import exchange_by_key

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "source"])
    marks = exchange_by_key(
        docs.map_batches(_boiler_hash_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        "h1", _boiler_markers_partition,
        proc_kwargs={"threshold": threshold})
    return _remove_marked_lines(
        docs.drop_columns(["source"]), marks, broadcast_limit,
        min_lines=1)


def boilerplate_sql(threshold: int = BOILER_THRESHOLD) -> str:
    """DuckDB oracle: identical line synthesis and hashed-triple
    grouping (src/h1/h2 hashes, NOT raw text — bit-agreement with the
    engine even under a collision). ASCII-corpus caveat as
    `fingerprint_sql`."""
    return f"""
WITH bp_w AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws, 5 + doc_id % 4 AS L
  FROM documents),
bp_lines AS (
  SELECT doc_id, source, CAST(u.j AS BIGINT) AS line_no,
         array_to_string(list_slice(ws, u.j*L + 1, u.j*L + L), ' ')
           AS ltext
  FROM bp_w, unnest(range(len(ws) // L)) AS u(j)
  WHERE NOT list_contains(list_slice(ws, u.j*L + 1, u.j*L + L), 'dup')),
bp_hashed AS (
  SELECT doc_id, line_no, ltext,
         {_fnv_expr('source', 0xCBF29CE484222325)} AS src,
         {_fnv_expr('ltext', 0xCBF29CE484222325)} AS h1,
         {_fnv_expr('ltext', 0x9E3779B97F4A7C15)} AS h2
  FROM bp_lines),
bp_boiler AS (
  SELECT src, h1, h2 FROM bp_hashed
  GROUP BY src, h1, h2
  HAVING count(DISTINCT doc_id) >= {threshold}),
bp_kept AS (
  SELECT l.doc_id, l.line_no, l.ltext
  FROM bp_hashed l
  WHERE NOT EXISTS (SELECT 1 FROM bp_boiler b
                    WHERE b.src = l.src AND b.h1 = l.h1
                      AND b.h2 = l.h2))
SELECT doc_id, string_agg(ltext, chr(10) ORDER BY line_no) AS text_out
FROM bp_kept GROUP BY doc_id"""
