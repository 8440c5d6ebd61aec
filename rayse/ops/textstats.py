"""Text-analysis operators for training-data pipelines (task brief: language
ID, quality scoring, token counting, document fingerprinting).

All operate on a ``documents``-shaped table (``doc_id:int64, text:string``)
as vectorized ``map_batches`` stages. Simple whitespace tokenization here is
deliberate (SQL-oracle-matchable); the search analyzer chain lives in
``rayse.analyzer`` and is pinned by golden tests instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analyzer.stopwords import STOPWORDS

# tiny per-language function-word lists for the n-gram/function-word
# language-ID heuristic (public-knowledge common words)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "las", "por"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "du", "une", "est"},
    "de": {"der", "die", "und", "das", "von", "den", "mit", "ist", "des", "ein"},
    "zh": {"de", "shi", "le", "zai", "you", "wo", "ta", "zhe", "bu", "ren"},
}


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Whitespace token count (split on single space, empties included —
    matches DuckDB ``len(string_split(text, ' '))``)."""
    n = pc.add(pc.count_substring(batch["text"], " "), 1)
    return pa.table({"doc_id": batch["doc_id"],
                     "n_tokens": pc.cast(n, pa.int64())})


# GPT-2-style pre-tokenizer-lite, restricted to classes with identical
# semantics in Python re and DuckDB's RE2 (no \p{L} in Python's re):
# optional-space letter runs / digit runs / punctuation runs, else
# whitespace runs. Alternation-order preference matches in both engines.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
_BPE_RE = None


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish token counting (task brief): number of pre-tokenizer
    segments per document under ``BPE_PATTERN`` — the per-doc unit a BPE
    tokenizer's merge phase would start from. Pattern compiled once per
    worker process."""
    global _BPE_RE
    if _BPE_RE is None:
        import re

        _BPE_RE = re.compile(BPE_PATTERN)
    n = np.fromiter((len(_BPE_RE.findall(t or ""))
                     for t in batch["text"].to_pylist()),
                    dtype=np.int64, count=len(batch))
    return pa.table({"doc_id": batch["doc_id"],
                     "n_bpe_tokens": pa.array(n, pa.int64())})


def bpe_token_count_sql() -> str:
    return (f"SELECT doc_id, CAST(len(regexp_extract_all(text, "
            f"'{BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens FROM documents")


def quality_stats_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring features: length, word stats, stopword ratio,
    punctuation ratio. Vectorized via pyarrow.compute kernels."""
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, r"[^\w\s]"), pa.int64())
    # stopword occurrences: python set lookup over split tokens (the 668-word
    # reference list); still O(tokens) with C-speed dict hashing
    stop_counts = np.empty(len(text), dtype=np.int64)
    for i, t in enumerate(text.to_pylist()):
        toks = (t or "").split(" ")
        stop_counts[i] = sum(1 for w in toks if w in STOPWORDS)
    nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "stopword_ratio": pa.array(stop_counts / np.maximum(nt, 1.0),
                                   pa.float64()),
        "avg_token_chars": pa.array(
            (n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
             - (nt - 1.0)) / np.maximum(nt, 1.0), pa.float64()),
    })


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Function-word-overlap language ID (heuristic; training-data op).
    Returns the marker language with the highest token hit-rate, 'und' if
    nothing matches."""
    langs = []
    for t in batch["text"].to_pylist():
        toks = set((t or "").lower().split(" "))
        best, best_n = "und", 0
        for lang, markers in _LANG_MARKERS.items():
            n = len(toks & markers)
            if n > best_n:
                best, best_n = lang, n
        langs.append(best)
    return pa.table({"doc_id": batch["doc_id"],
                     "lang_pred": pa.array(langs, pa.string())})


def lang_id_sql() -> str:
    """DuckDB oracle for ``lang_id`` — argmax of marker-set overlap with
    earliest-language tie-breaks (the Python loop updates only on strictly
    greater counts, so a >=-chain in dict order picks the same winner)."""
    langs = list(_LANG_MARKERS)

    def lst(lang):
        return "[" + ", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang])) \
            + "]"

    counts = ",\n  ".join(
        f"len(list_intersect(toks, {lst(lg)})) AS n_{lg}" for lg in langs)
    allc = ", ".join(f"n_{lg}" for lg in langs)
    chain = []
    for i, lg in enumerate(langs[:-1]):
        conds = " AND ".join(f"n_{lg} >= n_{o}" for o in langs[i + 1:])
        chain.append(f"WHEN {conds} THEN '{lg}'")
    case = "\n       ".join(chain)
    return f"""
WITH t AS (SELECT doc_id,
                  list_distinct(string_split(lower(text), ' ')) AS toks
           FROM documents),
c AS (SELECT doc_id,
  {counts}
  FROM t)
SELECT doc_id,
  CASE WHEN greatest({allc}) = 0 THEN 'und'
       {case}
       ELSE '{langs[-1]}' END AS lang_pred
FROM c"""


_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def word_bounds(texts: list):
    """Vectorized word-boundary scan shared by fingerprints / shingles /
    SimHash: UTF-8-concatenate the batch's texts and find the per-word byte
    ranges with ONE numpy space scan (split(" ")/join(" ") are inverses, so
    any space-joined word slice of a doc is a byte SLICE of the buffer).

    Returns ``(buf, doc_off, w_starts, w_ends, w_cum)``: the uint8 buffer,
    per-doc byte offsets (n+1), global word start/end byte positions, and
    per-doc word-count offsets (n+1). Empty texts contribute one
    zero-length word — identical to ``"".split(" ") == [""]``."""
    n_docs = len(texts)
    enc = [(t or "").encode() for t in texts]
    doc_len = np.fromiter((len(e) for e in enc), np.int64, n_docs)
    doc_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(doc_len, out=doc_off[1:])
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)

    # word boundaries, global coordinates: starts = doc starts ∪ (space+1),
    # ends = spaces ∪ doc ends — both sorted merges pair up element-wise
    sp = np.flatnonzero(buf == 0x20)
    w_starts = np.sort(np.concatenate((doc_off[:-1], sp + 1)))
    w_ends = np.sort(np.concatenate((sp, doc_off[1:])))
    n_words = np.diff(np.searchsorted(sp, doc_off)) + 1   # per doc
    w_cum = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_words, out=w_cum[1:])
    return buf, doc_off, w_starts, w_ends, w_cum


def fnv64_slices(buf: np.ndarray, starts: np.ndarray,
                 lens: np.ndarray,
                 offset: np.uint64 | None = None) -> np.ndarray:
    """FNV-1a 64-bit hash of ``len(starts)`` byte slices of ``buf``, fully
    vectorized: slices sorted by length DESC so at byte position j the
    still-active slices are a prefix — the hash loop is pure slicing (no
    masks, no wasted work on finished slices; total work ∝ Σ lens). Bytes
    are gathered straight from the buffer per position (no padded matrix).
    Bit-identical to the per-byte scalar loop. ``offset`` overrides the
    standard offset basis — a second basis yields an independent hash
    family over the same slices (the 128-bit dedup-key trick)."""
    total = starts.size
    max_len = int(lens.max()) if lens.size else 0
    ord_len = np.argsort(-lens, kind="stable")
    lens_s = lens[ord_len]
    start_s = starts[ord_len]
    counts = np.bincount(lens_s, minlength=max_len + 1)
    act = total - np.cumsum(counts)      # active prefix per byte position
    h = np.full(total, _FNV64_OFFSET if offset is None else offset,
                dtype=np.uint64)
    for j in range(max_len):
        k = int(act[j])
        h[:k] = (h[:k] ^ buf[start_s[:k] + j]) * _FNV64_PRIME
    final = np.empty(total, dtype=np.uint64)
    final[ord_len] = h
    return final


def gram_slices(texts: list, window: int):
    """Byte ranges of every word ``window``-gram of every text (short docs:
    one whole-text gram) plus per-doc gram-count offsets. Vectorized from
    the ``word_bounds`` scan; shared by fingerprints and the dedup family's
    shingle explode (ONE definition of what a shingle is)."""
    n_docs = len(texts)
    buf, doc_off, w_starts, w_ends, w_cum = word_bounds(texts)
    n_words = np.diff(w_cum)
    short = n_words < window
    n_grams = np.where(short, 1, n_words - window + 1)
    g_cum = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_grams, out=g_cum[1:])
    total_g = int(g_cum[-1])
    within = (np.arange(total_g, dtype=np.int64)
              - np.repeat(g_cum[:-1], n_grams))
    widx = np.repeat(w_cum[:-1], n_grams) + within
    g_start = w_starts[widx]
    g_end = w_ends[np.minimum(widx + window - 1, np.repeat(
        w_cum[1:] - 1, n_grams))]
    short_g = np.repeat(short, n_grams)
    g_start[short_g] = np.repeat(doc_off[:-1], n_grams)[short_g]
    g_end[short_g] = np.repeat(doc_off[1:], n_grams)[short_g]
    return buf, g_start, g_end - g_start, g_cum


def fingerprint_batch(batch: pa.Table, window: int = 4) -> pa.Table:
    """Winnowing-style document fingerprint: rolling FNV-1a over word
    ``window``-grams, fingerprint = min hash over windows (deterministic,
    order-sensitive — a reordered document fingerprints differently).
    Fully vectorized via ``gram_slices`` + ``fnv64_slices``; per-doc min
    via one reduceat."""
    texts = batch["text"].to_pylist()
    if not texts:
        return pa.table({"doc_id": batch["doc_id"],
                         "fingerprint": pa.array([], pa.uint64())})
    buf, g_start, lens, g_cum = gram_slices(texts, window)
    final = fnv64_slices(buf, g_start, lens)
    fps = np.minimum.reduceat(final, g_cum[:-1])
    return pa.table({"doc_id": batch["doc_id"],
                     "fingerprint": pa.array(fps, pa.uint64())})


def fingerprint_sql(window: int = 4) -> str:
    """DuckDB oracle for ``fingerprints``: the FNV-1a fold runs as a
    HUGEINT ``list_reduce`` over per-character codes (exact mod-2^64
    arithmetic). Valid for ASCII corpora (``ascii(c)`` = byte value only
    there — true of the sf tables; the Python side hashes UTF-8 bytes)."""
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
hashed AS (
  SELECT doc_id,
         [list_reduce(
            list_prepend(14695981039346656037::HUGEINT,
                         [ascii(c)::HUGEINT FOR c IN string_split(gram, '')]),
            (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                      % 18446744073709551616::HUGEINT)
          FOR gram IN gs] AS hs
  FROM grams)
SELECT doc_id, CAST(list_min(hs) AS UBIGINT) AS fingerprint FROM hashed"""


# -- dataset-level wrappers --------------------------------------------------

def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def token_count(sf_dir: str):
    return _docs(sf_dir).map_batches(token_count_batch,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)


def bpe_token_count(sf_dir: str):
    return _docs(sf_dir).map_batches(bpe_token_count_batch,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)


def quality_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(quality_stats_batch,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)


def lang_id(sf_dir: str):
    return _docs(sf_dir).map_batches(lang_id_batch, batch_format="pyarrow",
                                     zero_copy_batch=True)


def fingerprints(sf_dir: str):
    return _docs(sf_dir).map_batches(fingerprint_batch,
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)


def format_texts_batch(batch: pa.Table) -> pa.Table:
    """M11 result-text formatting (`rayse.query.postprocess.
    format_result_text`: sentence-boundary truncation inside
    [200, 250] chars, else last-space cut > 200, else hard cut) applied
    corpus-wide — the display-formatting stage as a batch op."""
    from ..query.postprocess import format_result_text

    texts = batch["text"].to_pylist()
    return pa.table({
        "doc_id": batch["doc_id"],
        "formatted": pa.array([format_result_text(t or "")
                               for t in texts], pa.string()),
    })


def format_texts(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(format_texts_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def format_texts_sql(max_chars: int = 250, min_chars: int = 200) -> str:
    """Oracle for ``format_texts``. The corpus is sentence-free word soup
    (no ./!/?), so the sentence-split branch never fires on either side;
    the last-space rule is position arithmetic: python's
    cut.rfind(' ') == max_chars - strpos(reverse(cut), ' ') (and the
    no-space case degenerates to the same hard cut on both sides)."""
    cut = f"substr(text, 1, {max_chars})"
    sp = f"({max_chars} - strpos(reverse({cut}), ' '))"
    return f"""
SELECT doc_id,
       CASE WHEN length(text) <= {max_chars} THEN text
            ELSE rtrim(substr(text, 1,
                   CASE WHEN {sp} > {min_chars} THEN {sp}
                        ELSE {max_chars} END)) || '...'
       END AS formatted
FROM documents"""


def _per_doc_gram_counts(texts: list, window: int):
    """Per-document gram-count summaries, vectorized across the batch:
    (n_occ, n_distinct, max_count) per doc — lexsort by (doc, gram hash),
    run-length to per-(doc, gram) counts, segment reductions per doc."""
    buf, g_start, lens, g_cum = gram_slices(texts, window)
    h = fnv64_slices(buf, g_start, lens)
    per_doc = np.diff(g_cum)
    docseg = np.repeat(np.arange(len(texts)), per_doc)
    order = np.lexsort((h, docseg))
    hs, ds_ = h[order], docseg[order]
    new = np.empty(hs.size, dtype=bool)
    new[0] = True
    new[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, hs.size))         # per (doc, gram)
    run_doc = ds_[starts]
    dnew = np.empty(run_doc.size, dtype=bool)
    dnew[0] = True
    dnew[1:] = run_doc[1:] != run_doc[:-1]
    dstarts = np.flatnonzero(dnew)
    n_dist = np.diff(np.append(dstarts, run_doc.size)).astype(np.int64)
    mx = np.maximum.reduceat(counts, dstarts).astype(np.int64)
    # texts always yield >= 1 gram ("" splits to [""]), so every doc has
    # exactly one segment here
    return per_doc.astype(np.int64), n_dist, mx


def repetition_stats(sf_dir: str):
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    Models", table A1 repetition filters — word-level realization): per
    document,

    - ``top2_frac_q``: fraction of 2-gram occurrences taken by the modal
      2-gram;
    - ``dup5_frac_q``: fraction of 5-gram occurrences that are repeats
      (occurrences - distinct) / occurrences;
    - ``word_rep_q``: fraction of tokens that are repeats of an earlier
      token, (n - distinct) / n.

    All three quantized as PURE-INTEGER ``(1e7 * num) // den`` — no floats
    anywhere, so Ray and SQL agree bit-exactly by construction. Row-local
    ``map_batches`` (no shuffle); the grams/hash machinery is the shared
    ``gram_slices``/``fnv64_slices``."""
    import ray.data as rd

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        if not texts:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "top2_frac_q": pa.array([], pa.int64()),
                "dup5_frac_q": pa.array([], pa.int64()),
                "word_rep_q": pa.array([], pa.int64())})
        texts = [(t or "") for t in texts]
        t2, d2, m2 = _per_doc_gram_counts(texts, 2)
        t5, d5, _ = _per_doc_gram_counts(texts, 5)
        tw, dw, _ = _per_doc_gram_counts(texts, 1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "top2_frac_q": pa.array((10_000_000 * m2) // t2, pa.int64()),
            "dup5_frac_q": pa.array((10_000_000 * (t5 - d5)) // t5,
                                    pa.int64()),
            "word_rep_q": pa.array((10_000_000 * (tw - dw)) // tw,
                                   pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(stats, batch_format="pyarrow",
                          zero_copy_batch=True)


def _gram_agg_cte(name: str, window: int) -> str:
    """Per-doc (tot, dist, mx) over word ``window``-grams (whole text is
    the single gram when the doc is shorter than the window, mirroring
    ``gram_slices``)."""
    return f"""
{name}_g AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, CAST(u.i AS INTEGER) + 1,
                                    CAST(u.i AS INTEGER) + {window}), ' ')
           AS gram
  FROM w, UNNEST(range(CASE WHEN len(ws) < {window} THEN 1
                            ELSE len(ws) - {window - 1} END)) u(i)),
{name}_c AS (
  SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
  FROM {name}_g GROUP BY 1, 2),
{name} AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS dist, max(c) AS mx
  FROM {name}_c GROUP BY doc_id)"""


def repetition_stats_sql() -> str:
    """Oracle for ``repetition_stats`` — identical integer contract
    ((1e7 * num) // den, BIGINT end to end)."""
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
{_gram_agg_cte('g2', 2)},
{_gram_agg_cte('g5', 5)},
{_gram_agg_cte('g1', 1)}
SELECT g2.doc_id,
       CAST((10000000 * g2.mx) // g2.tot AS BIGINT) AS top2_frac_q,
       CAST((10000000 * (g5.tot - g5.dist)) // g5.tot AS BIGINT)
         AS dup5_frac_q,
       CAST((10000000 * (g1.tot - g1.dist)) // g1.tot AS BIGINT)
         AS word_rep_q
FROM g2 JOIN g5 ON g2.doc_id = g5.doc_id
JOIN g1 ON g2.doc_id = g1.doc_id"""


# ---------------------------------------------------------------------------
# PII redaction — the scrub pass of a training-data cleaning pipeline.
# Both engines execute the SAME RE2 patterns (pyarrow.compute regex kernels
# and DuckDB regexp_replace are both RE2), so the oracle is exact without
# any dialect translation. The synthetic corpus carries no PII, so the
# driver query injects deterministic PII between the words (the html_clean
# synthesize-then-process recipe) — a redactor missing any pattern
# hash-mismatches loudly.
# ---------------------------------------------------------------------------

PII_PATTERNS = (
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def redact_pii_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Vectorized PII scrub: chained RE2 replacements via Arrow kernels
    (no per-row Python)."""
    col = batch[column]
    for pat, token in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pat,
                                         replacement=token)
    return batch.set_column(batch.schema.get_field_index(column),
                            column, col)


def redact_pii(sf_dir: str):
    """Driver query: deterministic PII injected into each document (email
    from the first word, an IP from the char length, a phone constant),
    then the REAL redactor -> (doc_id, redacted)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def synth_and_redact(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["text"], " ")
        first = pc.list_element(words, 0)
        lens = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        octet = pa.array([f" at 10.0.{int(n) % 256}.7 or 555-123-4567"
                          for n in lens], pa.string())
        wrapped = pc.binary_join_element_wise(
            first, pa.array(["@example.com contact "] * batch.num_rows),
            batch["text"], octet, "")
        t = pa.table({"doc_id": batch["doc_id"], "text": wrapped})
        out = redact_pii_batch(t)
        return pa.table({"doc_id": out["doc_id"],
                         "redacted": out["text"]})

    return ds.map_batches(synth_and_redact, batch_format="pyarrow",
                          zero_copy_batch=True)


def redact_pii_sql() -> str:
    """Oracle for ``redact_pii``: the same synthesis by string concat and
    the same RE2 patterns through regexp_replace (DuckDB is RE2 too)."""
    sql = ("w[1] || '@example.com contact ' || text || ' at 10.0.' || "
           "CAST(length(text) % 256 AS VARCHAR) || '.7 or 555-123-4567'")
    for pat, token in PII_PATTERNS:
        # DuckDB standard string literals pass backslashes through verbatim
        esc = pat.replace("'", "''")
        sql = f"regexp_replace({sql}, '{esc}', '{token}', 'g')"
    return f"""
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
           FROM documents)
SELECT doc_id, {sql} AS redacted FROM t"""


_QUANTILES = (0.25, 0.5, 0.75, 0.875)   # exact binary fractions: q*n is
                                        # computed float-exactly both sides


def token_count_quantiles(sf_dir: str, qs: tuple = _QUANTILES):
    """Exact corpus quantiles of per-document token counts — the
    bounded-domain-histogram pattern: token counts take few distinct
    values, so ``groupby(n).count()`` yields a histogram whose size is
    the DOMAIN size (not the corpus size); the driver folds it into exact
    discrete quantiles (DuckDB's quantile_disc rule: element at index
    max(0, ceil(q*n) - 1) of the sorted multiset)."""
    import math

    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(batch["text"], " "), 1)
        return pa.table({"n_tokens": pc.cast(n, pa.int64())})

    hist = (ds.map_batches(counts, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("n_tokens").count().take_all())   # domain-sized
    vals = np.array(sorted(r["n_tokens"] for r in hist), dtype=np.int64)
    cnts = np.array([dict((r["n_tokens"], r["count()"])
                          for r in hist)[v] for v in vals.tolist()],
                    dtype=np.int64)
    cum = np.cumsum(cnts)
    total = int(cum[-1]) if cum.size else 0
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, math.ceil(q * total) - 1)
        out_q.append(float(q))
        out_v.append(int(vals[np.searchsorted(cum, idx + 1)]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "n_tokens": pa.array(out_v, pa.int64())})


def token_count_quantiles_sql(qs: tuple = _QUANTILES) -> str:
    # quantile_disc requires a CONSTANT q -> one UNION arm per quantile
    arms = "\nUNION ALL\n".join(
        f"SELECT {q!r}::DOUBLE AS q, "
        f"(SELECT CAST(quantile_disc(n, {q!r}) AS BIGINT) FROM t) "
        f"AS n_tokens" for q in qs)
    return f"""
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents)
{arms}"""


def _unigram_cf(sf_dir: str):
    """Global (word, cf) counts as a Dataset: per-batch partial Counter
    (vectorized unique) -> partitioned exchange by word hash. At web-scale
    vocabularies this is the scalable realization (no driver dict); the
    downstream logp map broadcast below assumes a bounded vocabulary —
    above that, route the scoring join through the exchange instead
    (`rayse.ops.exchange`), the verify_pairs threshold pattern."""
    import ray.data as rd

    from .exchange import exchange_by_key

    def partial(batch: pa.Table) -> pa.Table:
        words = np.concatenate([np.asarray((t or "").split(" "))
                                for t in batch["text"].to_pylist()]) \
            if batch.num_rows else np.asarray([], dtype=object)
        u, c = np.unique(words, return_counts=True)
        h = fnv64_slices(*_word_arr_slices(u)) if u.size else \
            np.asarray([], dtype=np.uint64)
        return pa.table({"whash": pa.array(h, pa.uint64()),
                         "word": pa.array(u.tolist(), pa.string()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    def reduce_part(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "cf": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        g = tbl.group_by("word").aggregate([("cnt", "sum")])
        return pa.table({"word": g["word"],
                         "cf": pc.cast(g["cnt_sum"], pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return exchange_by_key(parts, "whash", reduce_part, n_parts=32)


def _word_arr_slices(words: np.ndarray):
    """(buf, starts, lens) for an array of word strings (for FNV)."""
    enc = [w.encode() for w in words.tolist()]
    lens = np.fromiter((len(e) for e in enc), np.int64, len(enc))
    starts = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)
    return buf, starts[:-1], lens


def _nll_doc_partials_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (word, whash, doc_id, tf, n) doc-term partial rows for
    the exchange-routed scoring join. Every document lives in one batch,
    so tf is the document's full term frequency and partials never
    double-count."""
    texts = batch["text"].to_pylist()
    if not texts:
        return pa.table({"word": pa.array([], pa.string()),
                         "whash": pa.array([], pa.uint64()),
                         "doc_id": pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    toks = [(t or "").split(" ") for t in texts]
    counts = np.fromiter((len(x) for x in toks), np.int64, len(toks))
    doc = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), counts)
    flat = np.concatenate([np.asarray(x, dtype=object) for x in toks])
    key = np.char.add(np.char.add(doc.astype("U20"), "\x00"),
                      flat.astype("U"))
    _, first, tf = np.unique(key, return_index=True, return_counts=True)
    n_of = np.repeat(counts, counts)[first]
    u_words = flat[first]
    h = fnv64_slices(*_word_arr_slices(u_words))
    return pa.table({
        "word": pa.array(u_words.tolist(), pa.string()),
        "whash": pa.array(h, pa.uint64()),
        "doc_id": pa.array(doc[first], pa.int64()),
        "tf": pa.array(tf.astype(np.int64), pa.int64()),
        "n": pa.array(n_of, pa.int64()),
    })


def _nll_score_partition(tbl: pa.Table, total: float) -> pa.Table:
    """One whash partition holding BOTH the cf rows (doc_id = -1) and the
    doc-term rows of its words: compute each word's quantized logp
    locally, then per-doc integer partial sums (tf * q)."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    words = np.asarray(tbl["word"].to_pylist(), dtype=object)
    is_cf = doc < 0
    vocab = words[is_cf]
    q = np.floor(np.log(
        tbl["tf"].to_numpy(zero_copy_only=False)[is_cf] / total)
        * 1e9).astype(np.int64)
    order = np.argsort(vocab, kind="stable")
    vocab, q = vocab[order], q[order]
    d_doc = doc[~is_cf]
    d_tf = tbl["tf"].to_numpy(zero_copy_only=False)[~is_cf]
    d_n = tbl["n"].to_numpy(zero_copy_only=False)[~is_cf]
    if d_doc.size == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    contrib = d_tf * q[np.searchsorted(vocab, words[~is_cf])]
    o = np.argsort(d_doc, kind="stable")
    d_doc, contrib, d_n = d_doc[o], contrib[o], d_n[o]
    new = np.empty(d_doc.size, dtype=bool)
    new[0] = True
    new[1:] = d_doc[1:] != d_doc[:-1]
    starts = np.flatnonzero(new)
    return pa.table({
        "doc_id": pa.array(d_doc[starts], pa.int64()),
        "s": pa.array(np.add.reduceat(contrib, starts), pa.int64()),
        "n": pa.array(d_n[starts], pa.int64()),
    })


def _nll_final_partition(tbl: pa.Table) -> pa.Table:
    """Second exchange reducer: sum integer partials per doc and finish
    nll_q = (-s) // (100 * n) (exact; s < 0, n >= 1)."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "nll_q": pa.array([], pa.int64())})
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    s = tbl["s"].to_numpy(zero_copy_only=False)
    n = tbl["n"].to_numpy(zero_copy_only=False)
    o = np.argsort(doc, kind="stable")
    doc, s, n = doc[o], s[o], n[o]
    new = np.empty(doc.size, dtype=bool)
    new[0] = True
    new[1:] = doc[1:] != doc[:-1]
    starts = np.flatnonzero(new)
    tot_s = np.add.reduceat(s, starts)
    return pa.table({
        "doc_id": pa.array(doc[starts], pa.int64()),
        "nll_q": pa.array((-tot_s) // (100 * np.maximum(n[starts], 1)),
                          pa.int64()),
    })


def unigram_nll(sf_dir: str, vocab_broadcast_limit: int = 2_000_000):
    """Unigram-LM quality score (perplexity proxy — the classic
    low-quality-text filter signal): per document, the mean negative
    log-likelihood of its whitespace tokens under the corpus unigram
    model p(w) = cf(w) / total_tokens.

    INTEGER-EXACT contract: each word's logp is quantized ONCE to
    ``q = floor(ln(cf/total) * 1e9)`` (int64); a document's sum of
    per-token q values is an integer, so summation order cannot move the
    result, and ``nll_q = floor(mean_nll * 1e7) = (-s) // (100 * n)`` is
    exact integer arithmetic on both the Ray and SQL sides.

    Routing: vocabularies up to ``vocab_broadcast_limit`` broadcast a
    sorted (vocab, q) pair and score fully vectorized per batch
    (searchsorted gather + reduceat — no per-token Python). Above the
    limit, scoring routes through the partitioned exchange: doc-term
    partials and cf rows meet in whash partitions, per-doc integer
    partial sums take a second exchange by doc_id — no driver-side vocab
    at any size. Both routes are bit-identical (integer sums)."""
    import ray
    import ray.data as rd

    cf_ds = _unigram_cf(sf_dir).materialize()
    total = float(cf_ds.sum("cf"))
    n_vocab = cf_ds.count()

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    if n_vocab > vocab_broadcast_limit:
        from .exchange import exchange_by_key

        def cf_as_partials(batch: pa.Table) -> pa.Table:
            words = np.asarray(batch["word"].to_pylist(), dtype=object)
            h = (fnv64_slices(*_word_arr_slices(words)) if words.size
                 else np.asarray([], dtype=np.uint64))
            m = batch.num_rows
            return pa.table({
                "word": batch["word"],
                "whash": pa.array(h, pa.uint64()),
                "doc_id": pa.array(np.full(m, -1, np.int64), pa.int64()),
                "tf": pa.array(batch["cf"], pa.int64()),
                "n": pa.array(np.zeros(m, np.int64), pa.int64()),
            })

        cf_rows = cf_ds.map_batches(cf_as_partials, batch_format="pyarrow")
        doc_rows = ds.map_batches(_nll_doc_partials_batch,
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
        per_part = exchange_by_key(doc_rows.union(cf_rows), "whash",
                                   _nll_score_partition,
                                   proc_kwargs={"total": total})
        return exchange_by_key(per_part, "doc_id", _nll_final_partition,
                               n_parts=32)

    rows = cf_ds.to_pandas()
    order = np.argsort(rows["word"].to_numpy(), kind="stable")
    vocab = rows["word"].to_numpy()[order]
    qlp = np.floor(np.log(rows["cf"].to_numpy()[order] / total)
                   * 1e9).astype(np.int64)
    ref = ray.put((vocab, qlp))

    def score(batch: pa.Table) -> pa.Table:
        vb, qv = ray.get(ref)
        texts = batch["text"].to_pylist()
        if not texts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "nll_q": pa.array([], pa.int64())})
        toks = [(t or "").split(" ") for t in texts]
        counts = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        flat = np.concatenate([np.asarray(x, dtype=object) for x in toks])
        uf, inv = np.unique(flat, return_inverse=True)
        tok_q = qv[np.searchsorted(vb, uf)][inv]
        starts = np.zeros(counts.size, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        s = np.add.reduceat(tok_q, starts)
        nll_q = (-s) // (100 * np.maximum(counts, 1))
        return pa.table({"doc_id": batch["doc_id"],
                         "nll_q": pa.array(nll_q, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def unigram_nll_sql() -> str:
    """Oracle for ``unigram_nll``: the identical integer contract — cf
    over the whitespace token stream, per-word q = floor(ln(cf/total)
    * 1e9), integer per-doc sum, nll_q = (-s) // (100 * n). Division
    literals stay ::DOUBLE inside ln (no bare DECIMAL arithmetic);
    everything after the floor is BIGINT."""
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
cf AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM cf),
q AS (SELECT cf.w,
             CAST(floor(ln(CAST(cf.c AS DOUBLE) / tot.total)
                        * 1000000000::DOUBLE) AS BIGINT) AS q
      FROM cf CROSS JOIN tot),
per_doc AS (
  SELECT t.doc_id, sum(q.q) AS s, CAST(count(*) AS BIGINT) AS n
  FROM tok t JOIN q ON t.w = q.w
  GROUP BY t.doc_id)
SELECT doc_id, CAST((-s) // (100 * greatest(n, 1)) AS BIGINT) AS nll_q
FROM per_doc"""


# ---------------------------------------------------------------------------
# Bigram-LM quality scoring — the conditional-probability extension of
# ``unigram_nll``: per document, the mean negative log-likelihood of its
# token BIGRAMS under the corpus bigram model
# p(w_i | w_{i-1}) = cf2(w_{i-1} w_i) / cf1(w_{i-1}).
#
# Same integer-exact contract: each bigram's conditional logp quantizes
# ONCE to q = floor(ln(cf2/cf1) * 1e9) (cf2 <= cf1 by construction, so
# q <= 0); a document's sum over its n-1 bigram slots is an int64, and
# nll2_q = (-s) // (100 * (n - 1)) is non-negative integer arithmetic —
# floor == truncate, so Ray and DuckDB agree bit-exactly regardless of
# summation order. Documents with < 2 tokens score 0 (no bigrams).
#
# Scale shape mirrors ``unigram_nll``: cf1/cf2 are exchange-aggregated
# (never a driver dict); the (bigram -> q) map is built by ONE exchange
# keyed by the FIRST word's hash (cf2 rows meet their cf1 row
# co-partitioned); scoring broadcasts the sorted q-map up to
# ``q_broadcast_limit`` distinct bigrams and routes through the bigram-
# hash exchange above it (bit-identical — pinned by tests with limit=0).
# ---------------------------------------------------------------------------

def _doc_bigram_arrays(texts: list):
    """(bigram strings flat, per-doc bigram counts nb, first-word flat)
    for a batch — vectorized: one concatenated token array, last token of
    each doc masked out, np.char joins."""
    toks = [(t or "").split(" ") for t in texts]
    n = np.fromiter((len(x) for x in toks), np.int64, len(toks))
    flat = np.concatenate([np.asarray(x, dtype=object) for x in toks])
    ends = np.cumsum(n) - 1                    # each doc's last token
    mask = np.ones(flat.size, dtype=bool)
    mask[ends] = False                         # n==1 docs lose their token
    i1 = np.flatnonzero(mask)
    w1 = flat[i1].astype("U")
    bi = np.char.add(np.char.add(w1, " "), flat[i1 + 1].astype("U"))
    return bi.astype(object), np.maximum(n - 1, 0), w1.astype(object)


def _bigram_cf(sf_dir: str):
    """Global (bigram, w1, cf2) counts as a Dataset: per-batch partial
    counts -> one exchange by bigram hash."""
    import ray.data as rd

    from .exchange import exchange_by_key

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        if not texts:
            return pa.table({"bhash": pa.array([], pa.uint64()),
                             "bigram": pa.array([], pa.string()),
                             "w1": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        bi, _, w1 = _doc_bigram_arrays(texts)
        u, first, c = np.unique(bi, return_index=True, return_counts=True)
        h = (fnv64_slices(*_word_arr_slices(u)) if u.size
             else np.asarray([], dtype=np.uint64))
        return pa.table({
            "bhash": pa.array(h, pa.uint64()),
            "bigram": pa.array(u.tolist(), pa.string()),
            "w1": pa.array(w1[first].tolist(), pa.string()),
            "cnt": pa.array(c.astype(np.int64), pa.int64())})

    def reduce_part(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "w1": pa.array([], pa.string()),
                             "cf2": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        g = tbl.group_by("bigram").aggregate([("cnt", "sum"),
                                              ("w1", "min")])
        return pa.table({"bigram": g["bigram"], "w1": g["w1_min"],
                         "cf2": pc.cast(g["cnt_sum"], pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return exchange_by_key(parts, "bhash", reduce_part, n_parts=32)


def _bigram_q_rows(tbl: pa.Table) -> pa.Table:
    """One w1-hash partition holding cf1 rows (kind 0: key = the word
    itself) and cf2 rows (kind 1: key = first word): quantize each
    bigram's conditional logp locally -> (bigram, q)."""
    if tbl.num_rows == 0:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "q": pa.array([], pa.int64())})
    kind = tbl["kind"].to_numpy(zero_copy_only=False)
    words = np.asarray(tbl["w1"].to_pylist(), dtype=object)
    c = tbl["c"].to_numpy(zero_copy_only=False)
    vocab, c1 = words[kind == 0], c[kind == 0]
    order = np.argsort(vocab, kind="stable")
    vocab, c1 = vocab[order], c1[order]
    sel = kind == 1
    if not sel.any():
        return pa.table({"bigram": pa.array([], pa.string()),
                         "q": pa.array([], pa.int64())})
    denom = c1[np.searchsorted(vocab, words[sel])]
    q = np.floor(np.log(c[sel] / denom) * 1e9).astype(np.int64)
    bigrams = np.asarray(tbl["bigram"].to_pylist(), dtype=object)[sel]
    return pa.table({
        "bigram": pa.array(bigrams.tolist(), pa.string()),
        "q": pa.array(q, pa.int64())})


def _bigram_q_map(sf_dir: str):
    """(bigram -> q) as a Dataset: cf2 rows exchange-join their first
    word's cf1 row (both keyed by hash(w1))."""
    from .exchange import exchange_by_key

    cf1 = _unigram_cf(sf_dir)
    cf2 = _bigram_cf(sf_dir)

    def cf1_rows(batch: pa.Table) -> pa.Table:
        words = np.asarray(batch["word"].to_pylist(), dtype=object)
        h = (fnv64_slices(*_word_arr_slices(words)) if words.size
             else np.asarray([], dtype=np.uint64))
        return pa.table({
            "w1hash": pa.array(h, pa.uint64()),
            "w1": batch["word"],
            "bigram": pa.array([""] * batch.num_rows, pa.string()),
            "c": pa.array(batch["cf"], pa.int64()),
            "kind": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())})

    def cf2_rows(batch: pa.Table) -> pa.Table:
        words = np.asarray(batch["w1"].to_pylist(), dtype=object)
        h = (fnv64_slices(*_word_arr_slices(words)) if words.size
             else np.asarray([], dtype=np.uint64))
        return pa.table({
            "w1hash": pa.array(h, pa.uint64()),
            "w1": batch["w1"],
            "bigram": batch["bigram"],
            "c": pa.array(batch["cf2"], pa.int64()),
            "kind": pa.array(np.ones(batch.num_rows, np.int8), pa.int8())})

    rows = (cf1.map_batches(cf1_rows, batch_format="pyarrow")
            .union(cf2.map_batches(cf2_rows, batch_format="pyarrow")))
    return exchange_by_key(rows, "w1hash", _bigram_q_rows, n_parts=32)


def _bnll_doc_partials_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (bigram, bhash, doc_id, v=tf, nb) doc-bigram partial rows
    for the exchange-routed scoring join (documents with nb == 0 emit
    nothing here — ``bigram_nll`` unions their zero rows into the final
    exchange directly)."""
    texts = batch["text"].to_pylist()
    empty = pa.table({"bigram": pa.array([], pa.string()),
                      "bhash": pa.array([], pa.uint64()),
                      "doc_id": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64()),
                      "nb": pa.array([], pa.int64())})
    if not texts:
        return empty
    bi, nb, _ = _doc_bigram_arrays(texts)
    if bi.size == 0:
        return empty
    doc = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), nb)
    key = np.char.add(np.char.add(doc.astype("U20"), "\x00"),
                      bi.astype("U"))
    _, first, tf = np.unique(key, return_index=True, return_counts=True)
    u_bi = bi[first]
    h = fnv64_slices(*_word_arr_slices(u_bi))
    return pa.table({
        "bigram": pa.array(u_bi.tolist(), pa.string()),
        "bhash": pa.array(h, pa.uint64()),
        "doc_id": pa.array(doc[first], pa.int64()),
        "v": pa.array(tf.astype(np.int64), pa.int64()),
        "nb": pa.array(np.repeat(nb, nb)[first], pa.int64())})


def _bnll_score_partition(tbl: pa.Table) -> pa.Table:
    """One bhash partition holding q rows (doc_id = -1, v = q) and the
    doc-bigram rows of its bigrams: contrib = tf * q, per-doc integer
    partial sums."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    bi = np.asarray(tbl["bigram"].to_pylist(), dtype=object)
    v = tbl["v"].to_numpy(zero_copy_only=False)
    is_q = doc < 0
    qb, qv = bi[is_q], v[is_q]
    order = np.argsort(qb, kind="stable")
    qb, qv = qb[order], qv[order]
    d_doc = doc[~is_q]
    if d_doc.size == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "s": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    contrib = v[~is_q] * qv[np.searchsorted(qb, bi[~is_q])]
    nb = tbl["nb"].to_numpy(zero_copy_only=False)[~is_q]
    o = np.argsort(d_doc, kind="stable")
    d_doc, contrib, nb = d_doc[o], contrib[o], nb[o]
    new = np.empty(d_doc.size, dtype=bool)
    new[0] = True
    new[1:] = d_doc[1:] != d_doc[:-1]
    starts = np.flatnonzero(new)
    return pa.table({
        "doc_id": pa.array(d_doc[starts], pa.int64()),
        "s": pa.array(np.add.reduceat(contrib, starts), pa.int64()),
        "n": pa.array(nb[starts], pa.int64())})


def bigram_nll(sf_dir: str, q_broadcast_limit: int = 2_000_000):
    """Per-document mean bigram NLL -> (doc_id, nll2_q); see the section
    comment for the integer contract and routing."""
    return _score_bigram_qmap(sf_dir, _bigram_q_map(sf_dir), "nll2_q",
                              q_broadcast_limit)


def _score_bigram_qmap(sf_dir: str, qm_ds, out_col: str,
                       q_broadcast_limit: int = 2_000_000):
    """Score documents against ANY (bigram -> q) map Dataset: per-doc
    integer occurrence-sum of q, mean-normalized — the shared tail of
    ``bigram_nll`` and ``kn_bigram_nll`` (broadcast map below the
    limit, exchange-routed join above)."""
    import ray
    import ray.data as rd

    qm_ds = qm_ds.materialize()
    n_bigrams = qm_ds.count()

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    if n_bigrams > q_broadcast_limit:
        from .exchange import exchange_by_key

        def q_as_rows(batch: pa.Table) -> pa.Table:
            bi = np.asarray(batch["bigram"].to_pylist(), dtype=object)
            h = (fnv64_slices(*_word_arr_slices(bi)) if bi.size
                 else np.asarray([], dtype=np.uint64))
            m = batch.num_rows
            return pa.table({
                "bigram": batch["bigram"],
                "bhash": pa.array(h, pa.uint64()),
                "doc_id": pa.array(np.full(m, -1, np.int64), pa.int64()),
                "v": pa.array(batch["q"], pa.int64()),
                "nb": pa.array(np.zeros(m, np.int64), pa.int64())})

        def zero_rows(batch: pa.Table) -> pa.Table:
            texts = batch["text"].to_pylist()
            n = np.fromiter((len((t or "").split(" ")) for t in texts),
                            np.int64, len(texts))
            sel = pa.array(n < 2)
            z = batch.filter(sel)
            m = z.num_rows
            return pa.table({
                "doc_id": z["doc_id"],
                "s": pa.array(np.zeros(m, np.int64), pa.int64()),
                "n": pa.array(np.ones(m, np.int64), pa.int64())})

        doc_rows = ds.map_batches(_bnll_doc_partials_batch,
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
        per_part = exchange_by_key(
            doc_rows.union(qm_ds.map_batches(q_as_rows,
                                             batch_format="pyarrow")),
            "bhash", _bnll_score_partition)
        zrows = ds.map_batches(zero_rows, batch_format="pyarrow",
                               zero_copy_batch=True)
        final = exchange_by_key(per_part.union(zrows), "doc_id",
                                _nll_final_partition, n_parts=32)
        return final.map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"],
                                out_col: b["nll_q"]}),
            batch_format="pyarrow")

    qm = qm_ds.to_pandas()
    order = np.argsort(qm["bigram"].to_numpy(), kind="stable")
    qb = qm["bigram"].to_numpy()[order]
    qv = qm["q"].to_numpy()[order].astype(np.int64)
    ref = ray.put((qb, qv))

    def score(batch: pa.Table) -> pa.Table:
        vb, vq = ray.get(ref)
        texts = batch["text"].to_pylist()
        if not texts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             out_col: pa.array([], pa.int64())})
        bi, nb, _ = _doc_bigram_arrays(texts)
        s = np.zeros(len(texts), dtype=np.int64)
        if bi.size:
            uf, inv = np.unique(bi, return_inverse=True)
            tok_q = vq[np.searchsorted(vb, uf)][inv]
            has = np.flatnonzero(nb > 0)
            starts = np.zeros(has.size, np.int64)
            np.cumsum(nb[has][:-1], out=starts[1:])
            s[has] = np.add.reduceat(tok_q, starts)
        nll2 = (-s) // (100 * np.maximum(nb, 1))
        return pa.table({"doc_id": batch["doc_id"],
                         out_col: pa.array(nll2, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def bigram_nll_sql() -> str:
    """Oracle for ``bigram_nll``: cf1 over tokens, cf2 over adjacent
    pairs, q = floor(ln(cf2/cf1) * 1e9), per-doc integer sum over bigram
    OCCURRENCES, nll2_q = (-s) // (100 * (n-1)); < 2-token documents
    score 0 via the LEFT JOIN coalesce."""
    return """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
cf1 AS (SELECT word, CAST(count(*) AS BIGINT) AS c1 FROM tok GROUP BY word),
bg AS (
  SELECT doc_id,
         ws[CAST(u.i AS INTEGER) + 1] AS w1,
         ws[CAST(u.i AS INTEGER) + 1] || ' '
           || ws[CAST(u.i AS INTEGER) + 2] AS b
  FROM w, UNNEST(range(len(ws) - 1)) u(i)
  WHERE len(ws) >= 2),
cf2 AS (SELECT b, min(w1) AS w1, CAST(count(*) AS BIGINT) AS c2
        FROM bg GROUP BY b),
q AS (SELECT cf2.b,
             CAST(floor(ln(CAST(cf2.c2 AS DOUBLE) / CAST(cf1.c1 AS DOUBLE))
                        * 1000000000::DOUBLE) AS BIGINT) AS q
      FROM cf2 JOIN cf1 ON cf2.w1 = cf1.word),
s AS (SELECT bg.doc_id, CAST(sum(q.q) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS nb
      FROM bg JOIN q ON bg.b = q.b GROUP BY bg.doc_id)
SELECT w.doc_id,
       CAST(coalesce((-s.s) // (100 * s.nb), 0) AS BIGINT) AS nll2_q
FROM w LEFT JOIN s USING (doc_id)"""


# ---------------------------------------------------------------------------
# PMI word co-occurrence — the association-mining step of a vocabulary /
# phrase-table pipeline (the word2vec/GloVe co-occurrence count
# precursor): for unordered word pairs co-occurring in >= min_df
# documents, pmi_q = floor(ln((n * df_ab) / (df_a * df_b)) * 1e9).
#
# All counts are exchange-aggregated ints; the single float op (one
# division + one ln, both IEEE-deterministic) happens once per output
# pair, so Ray and SQL agree exactly. Per-batch pair partials are
# O(m^2) per doc in DISTINCT words m — inherent to document-window
# co-occurrence (a fixed token window bounds m at web scale); the df
# map broadcast follows the unigram_nll vocabulary contract.
# ---------------------------------------------------------------------------

def _pair_partials_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (pair_hash, word_a, word_b, cnt) distinct-document pair
    counts — vectorized pair enumeration via per-doc sorted distinct
    words and a repeat/arange upper-triangle index."""
    texts = batch["text"].to_pylist()
    empty = pa.table({"pair_hash": pa.array([], pa.uint64()),
                      "word_a": pa.array([], pa.string()),
                      "word_b": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if not texts:
        return empty
    uniq_per_doc = [np.unique(np.asarray((t or "").split(" "),
                                         dtype=object))
                    for t in texts]
    m = np.fromiter((u.size for u in uniq_per_doc), np.int64, len(texts))
    if not (m > 1).any():
        return empty
    flat = np.concatenate(uniq_per_doc)
    off = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(m, out=off[1:])
    # upper-triangle (i < j) pairs per doc via two repeat layers: doc ->
    # rows (i = 0..m-2), row -> its m-1-i columns — no per-doc loop
    mr = np.maximum(m - 1, 0)                  # rows per doc
    doc_of_row = np.repeat(np.arange(len(texts)), mr)
    row_off = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(mr, out=row_off[1:])
    total_rows = int(row_off[-1])
    row_in_doc = (np.arange(total_rows, dtype=np.int64)
                  - np.repeat(row_off[:-1], mr))
    ln_row = m[doc_of_row] - 1 - row_in_doc    # pairs in this row
    pair_off = np.zeros(total_rows + 1, np.int64)
    np.cumsum(ln_row, out=pair_off[1:])
    total_pairs = int(pair_off[-1])
    row_of_pair = np.repeat(np.arange(total_rows, dtype=np.int64), ln_row)
    k_in_row = (np.arange(total_pairs, dtype=np.int64)
                - np.repeat(pair_off[:-1], ln_row))
    i_idx = row_in_doc[row_of_pair]
    j_idx = i_idx + 1 + k_in_row
    d_idx = doc_of_row[row_of_pair]
    wa = flat[off[d_idx] + i_idx]
    wb = flat[off[d_idx] + j_idx]
    key = np.char.add(np.char.add(wa.astype("U"), "\x00"), wb.astype("U"))
    u, first, cnt = np.unique(key, return_index=True, return_counts=True)
    ua, ub = wa[first], wb[first]
    h = fnv64_slices(*_word_arr_slices(
        np.asarray(u, dtype=object)))
    return pa.table({
        "pair_hash": pa.array(h, pa.uint64()),
        "word_a": pa.array(ua.tolist(), pa.string()),
        "word_b": pa.array(ub.tolist(), pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64())})


def _pair_reduce(tbl: pa.Table) -> pa.Table:
    if tbl.num_rows == 0:
        return pa.table({"word_a": pa.array([], pa.string()),
                         "word_b": pa.array([], pa.string()),
                         "df_ab": pa.array([], pa.int64())})
    import pyarrow.compute as pc

    g = tbl.group_by(["word_a", "word_b"]).aggregate([("cnt", "sum")])
    return pa.table({"word_a": g["word_a"], "word_b": g["word_b"],
                     "df_ab": pc.cast(g["cnt_sum"], pa.int64())})


def _df_broadcast(sf_dir: str):
    """(df_ds, n_docs, ref): distinct-document word df, exchange-
    aggregated, then broadcast sorted (vocab, df, n) via ray.put — the
    shared small side of both PMI variants (unigram_nll vocabulary
    contract)."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    # document frequency per word (distinct docs), exchange-aggregated
    def df_partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        per = [np.unique(np.asarray((t or "").split(" "), dtype=object))
               for t in texts]
        words = (np.concatenate(per) if per
                 else np.asarray([], dtype=object))
        u, c = np.unique(words, return_counts=True)
        h = (fnv64_slices(*_word_arr_slices(u)) if u.size
             else np.asarray([], dtype=np.uint64))
        return pa.table({"whash": pa.array(h, pa.uint64()),
                         "word": pa.array(u.tolist(), pa.string()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    def df_reduce(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        g = tbl.group_by("word").aggregate([("cnt", "sum")])
        return pa.table({"word": g["word"],
                         "df": pc.cast(g["cnt_sum"], pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    df_ds = exchange_by_key(
        ds.map_batches(df_partial, batch_format="pyarrow",
                       zero_copy_batch=True), "whash", df_reduce,
        n_parts=32).materialize()
    n_docs = int(ds.count())
    rows = df_ds.to_pandas()                  # vocab-bounded (see header)
    order = np.argsort(rows["word"].to_numpy(), kind="stable")
    vocab = rows["word"].to_numpy()[order]
    dfv = rows["df"].to_numpy()[order].astype(np.int64)
    return df_ds, n_docs, ray.put((vocab, dfv, n_docs))


def _pmi_finish_fn(ref, min_df: int):
    """The final PMI map shared by both variants: gather df for both
    sides from the broadcast, one ln per surviving pair."""
    import ray

    def finish(batch: pa.Table) -> pa.Table:
        vb, dv, n = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table({"word_a": pa.array([], pa.string()),
                             "word_b": pa.array([], pa.string()),
                             "df_ab": pa.array([], pa.int64()),
                             "pmi_q": pa.array([], pa.int64())})
        keep = batch["df_ab"].to_numpy(zero_copy_only=False) >= min_df
        batch = batch.filter(pa.array(keep))
        wa = np.asarray(batch["word_a"].to_pylist(), dtype=object)
        wb = np.asarray(batch["word_b"].to_pylist(), dtype=object)
        dab = batch["df_ab"].to_numpy(zero_copy_only=False)
        d1 = dv[np.searchsorted(vb, wa)]
        d2 = dv[np.searchsorted(vb, wb)]
        pmi = np.floor(np.log((n * dab) / (d1 * d2)) * 1e9).astype(
            np.int64)
        return pa.table({"word_a": batch["word_a"],
                         "word_b": batch["word_b"],
                         "df_ab": pa.array(dab, pa.int64()),
                         "pmi_q": pa.array(pmi, pa.int64())})

    return finish


def cooccur_pmi(sf_dir: str, min_df: int = 2):
    """(word_a, word_b, df_ab, pmi_q) over unordered distinct-document
    co-occurrence; counts exchange-aggregated, df map broadcast."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    _, _, ref = _df_broadcast(sf_dir)
    pairs = exchange_by_key(
        ds.map_batches(_pair_partials_batch, batch_format="pyarrow",
                       zero_copy_batch=True),
        "pair_hash", _pair_reduce, n_parts=32)
    return pairs.map_batches(_pmi_finish_fn(ref, min_df),
                             batch_format="pyarrow")


def cooccur_pmi_sql(min_df: int = 2) -> str:
    """Oracle for ``cooccur_pmi``: DISTINCT (doc, word) stream, pair
    self-join (a.word < b.word), integer counts, one double division +
    ln per pair."""
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY w),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
pagg AS (
  SELECT a.w AS word_a, b.w AS word_b, CAST(count(*) AS BIGINT) AS df_ab
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2)
SELECT p.word_a, p.word_b, p.df_ab,
       CAST(floor(ln(CAST(n.n * p.df_ab AS DOUBLE)
                     / CAST(d1.df * d2.df AS DOUBLE))
                  * 1000000000::DOUBLE) AS BIGINT) AS pmi_q
FROM pagg p
JOIN df d1 ON d1.w = p.word_a
JOIN df d2 ON d2.w = p.word_b
CROSS JOIN n
WHERE p.df_ab >= {min_df}"""


# ---------------------------------------------------------------------------
# CCNet-style quality bucketing (Wenzek et al. 2020: corpora are split
# into head/middle/tail by LM perplexity): the integer unigram NLL
# scores cut at fixed integer thresholds — no knife edges, row-local on
# top of the hash-green scoring pipeline.
# ---------------------------------------------------------------------------

QUALITY_BUCKET_CUTS = (34_000_000, 35_000_000)   # nll_q head/middle/tail


def quality_buckets(sf_dir: str, cuts: tuple = QUALITY_BUCKET_CUTS):
    """(doc_id, nll_q, bucket) — 'head' (best) strictly below cuts[0],
    'middle' below cuts[1], 'tail' otherwise."""
    lo, hi = cuts

    def tag(batch: pa.Table) -> pa.Table:
        q = batch["nll_q"].to_numpy(zero_copy_only=False)
        b = np.where(q < lo, "head", np.where(q < hi, "middle", "tail"))
        return pa.table({"doc_id": batch["doc_id"],
                         "nll_q": batch["nll_q"],
                         "bucket": pa.array(b.tolist(), pa.string())})

    return unigram_nll(sf_dir).map_batches(tag, batch_format="pyarrow")


def quality_buckets_sql(cuts: tuple = QUALITY_BUCKET_CUTS) -> str:
    lo, hi = cuts
    return f"""
WITH nll AS ({unigram_nll_sql()})
SELECT doc_id, nll_q,
       CASE WHEN nll_q < {lo} THEN 'head'
            WHEN nll_q < {hi} THEN 'middle'
            ELSE 'tail' END AS bucket
FROM nll"""


# ---------------------------------------------------------------------------
# BPE merge learning — tokenizer training (Sennrich et al. 2016). The
# classic algorithm operates on the DISTINCT-WORD frequency table, so
# the corpus-sized stage (word counting) is the distributed exchange
# aggregate already used by unigram_nll; the merge loop runs on the
# driver over the distinct vocabulary (bounded by the same broadcast
# contract — HF/sentencepiece trainers make the identical word-counts
# reduction). Determinism: highest pair frequency wins, ties break to
# the lexicographically smallest (left, right). Iterative algorithm ->
# no SQL oracle (the driver records a rows-only check); the loop is
# pinned by pytest against a transparent brute-force reference.
# ---------------------------------------------------------------------------

def _bpe_merge_word(sym: list, left: str, right: str) -> list:
    """One leftmost-greedy non-overlapping merge pass over a symbol
    sequence."""
    out = []
    i = 0
    n = len(sym)
    while i < n:
        if i + 1 < n and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def learn_bpe_merges_from_counts(words: list, cfs: list,
                                 n_merges: int) -> list:
    """The deterministic merge loop over a (word, cf) table ->
    [(rank, left, right, freq)]."""
    seqs = [list(w) for w in words]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for sym, cf in zip(seqs, cfs):
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cf
        if not counts:
            break
        freq = max(counts.values())
        left, right = min(p for p, c in counts.items() if c == freq)
        merges.append((rank, left, right, int(freq)))
        seqs = [_bpe_merge_word(s, left, right) if left in s else s
                for s in seqs]
    return merges


def learn_bpe_merges(sf_dir: str, n_merges: int = 8) -> pa.Table:
    """(rank, left, right, freq): the first ``n_merges`` BPE merges of
    the corpus. Word counts are exchange-aggregated (distributed); the
    loop runs over the distinct vocabulary."""
    rows = _unigram_cf(sf_dir).to_pandas()      # vocab-bounded
    merges = learn_bpe_merges_from_counts(
        rows["word"].tolist(), rows["cf"].astype(int).tolist(), n_merges)
    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int32()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "freq": pa.array([m[3] for m in merges], pa.int64()),
    })


# -- BPE application + the unrolled-SQL oracle -------------------------------
#
# The merge loop IS SQL-expressible for a fixed n_merges via stage
# unrolling (the kmeans unrolled-Lloyd recipe): each stage counts
# adjacent symbol pairs over the vocabulary's cf-weighted sequences,
# picks the (freq DESC, left, right) winner, and applies it as a
# delimiter-guarded string replace — '|'-joined symbols make
# ``replace(seq, '|l|r|', '|lr|')`` exactly the leftmost-greedy
# non-overlapping pass of ``_bpe_merge_word`` (both scanners continue
# after the replacement). This upgrades ``bpe_merges`` from rows-only to
# oracle-backed and gives the APPLIED-BPE token count a full oracle.


def _bpe_seq_sym(alias: str) -> str:
    return (f"list_filter(string_split({alias}.seq, '|'), "
            "x -> x <> '')")


def _bpe_unroll_ctes(n_merges: int) -> str:
    """CTE chain tok/cf/seq0 .. best_k/seq_k for k in 1..n_merges."""
    parts = [
        """tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
cf AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY w),
seq0 AS (
  SELECT w, cf,
         '|' || array_to_string(string_split(w, ''), '|') || '|' AS seq
  FROM cf)"""]
    for k in range(1, n_merges + 1):
        p = f"seq{k - 1}"
        parts.append(f"""pairs{k} AS (
  SELECT u.pair[1] AS l, u.pair[2] AS r, CAST(sum(s.cf) AS BIGINT) AS c
  FROM (SELECT cf, {_bpe_seq_sym('s0')} AS sym
        FROM {p} s0) s,
       UNNEST([[s.sym[i + 1], s.sym[i + 2]]
               FOR i IN range(len(s.sym) - 1)]) u(pair)
  GROUP BY 1, 2),
best{k} AS (SELECT l, r, c FROM pairs{k} ORDER BY c DESC, l, r LIMIT 1),
seq{k} AS (
  SELECT s.w, s.cf,
         replace(s.seq, '|' || b.l || '|' || b.r || '|',
                 '|' || b.l || b.r || '|') AS seq
  FROM {p} s CROSS JOIN best{k} b)""")
    return "WITH " + ",\n".join(parts)


def learn_bpe_merges_sql(n_merges: int = 8) -> str:
    """Oracle for ``learn_bpe_merges``: the unrolled merge loop; one row
    per stage."""
    stages = "\nUNION ALL\n".join(
        f"SELECT {k} AS \"rank\", l AS \"left\", r AS \"right\", "
        f"c AS freq FROM best{k}"
        for k in range(1, n_merges + 1))
    return (f"{_bpe_unroll_ctes(n_merges)}\n"
            f"SELECT CAST(\"rank\" AS INTEGER) AS \"rank\", \"left\", "
            f"\"right\", freq FROM (\n{stages}\n)")


def bpe_encode_vocab(sf_dir: str, n_merges: int = 8):
    """(sorted distinct words, per-word encoded symbol count) — merges
    learned by the production learner, applied per distinct word (the
    encode table is vocabulary-bounded, the same broadcast contract as
    the learner)."""
    rows = _unigram_cf(sf_dir).to_pandas()
    merges = learn_bpe_merges_from_counts(
        rows["word"].tolist(), rows["cf"].astype(int).tolist(), n_merges)
    words = np.sort(rows["word"].to_numpy())
    n_syms = np.empty(words.size, dtype=np.int64)
    for i, w in enumerate(words.tolist()):
        sym = list(w)
        for _, left, right, _f in merges:
            if left in sym:
                sym = _bpe_merge_word(sym, left, right)
        n_syms[i] = len(sym)
    return words, n_syms


def bpe_encoded_len(sf_dir: str, n_merges: int = 8):
    """(doc_id, n_tokens): per-document token count under the LEARNED
    BPE tokenizer (train -> encode -> count, the full tokenizer-training
    loop). The word->length map broadcasts; scoring is a vectorized
    searchsorted gather + reduceat per batch."""
    import ray
    import ray.data as rd

    words, n_syms = bpe_encode_vocab(sf_dir, n_merges)
    ref = ray.put((words, n_syms))

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        vb, ns = ray.get(ref)
        texts = batch["text"].to_pylist()
        if not texts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        toks = [(t or "").split(" ") for t in texts]
        counts = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        flat = np.concatenate([np.asarray(x, dtype=object) for x in toks])
        per_tok = ns[np.searchsorted(vb, flat.astype("U"))]
        starts = np.zeros(counts.size, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        total = np.add.reduceat(per_tok, starts)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": pa.array(total, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def bpe_encoded_len_sql(n_merges: int = 8) -> str:
    """Oracle for ``bpe_encoded_len``: per-doc sum of each word's
    post-merge symbol count from the unrolled chain."""
    return f"""{_bpe_unroll_ctes(n_merges)}
SELECT t.doc_id,
       CAST(sum(len({_bpe_seq_sym('s')})) AS BIGINT) AS n_tokens
FROM tok t JOIN seq{n_merges} s ON t.w = s.w
GROUP BY t.doc_id"""


# ---------------------------------------------------------------------------
# WINDOWED co-occurrence — the skip-gram-window realization (and the
# scale path for document-level PMI's O(m^2): a fixed window W bounds
# per-token pair fan-out at W). A pair (a < b) counts once per document
# iff the two words appear within W tokens of each other; df/PMI
# semantics are otherwise identical to ``cooccur_pmi``. Extraction is W
# vectorized shift passes per batch (offset d in 1..W pairs token i
# with token i+d) — no per-doc loop, no O(m^2).
# ---------------------------------------------------------------------------

def _window_pair_partials_batch(batch: pa.Table, window: int) -> pa.Table:
    """Per-batch (pair_hash, word_a, word_b, cnt) distinct-document
    windowed pair counts."""
    texts = batch["text"].to_pylist()
    empty = pa.table({"pair_hash": pa.array([], pa.uint64()),
                      "word_a": pa.array([], pa.string()),
                      "word_b": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if not texts:
        return empty
    toks = [(t or "").split(" ") for t in texts]
    n = np.fromiter((len(x) for x in toks), np.int64, len(toks))
    flat = np.concatenate([np.asarray(x, dtype=object) for x in toks])
    off = np.zeros(len(toks) + 1, np.int64)
    np.cumsum(n, out=off[1:])
    doc_of = np.repeat(np.arange(len(toks)), n)
    parts_a, parts_b, parts_d = [], [], []
    for d in range(1, window + 1):
        # token i pairs with token i+d when both are in the same doc
        same = doc_of[:-d] == doc_of[d:] if flat.size > d else \
            np.zeros(0, dtype=bool)
        i = np.flatnonzero(same)
        a, b = flat[i], flat[i + d]
        swap = a > b                      # canonical unordered order
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        keep = a2 != b2                   # self-pairs don't count
        parts_a.append(a2[keep])
        parts_b.append(b2[keep])
        parts_d.append(doc_of[i][keep])
    wa = np.concatenate(parts_a)
    if wa.size == 0:
        return empty
    wb = np.concatenate(parts_b)
    dd = np.concatenate(parts_d)
    key = np.char.add(
        np.char.add(np.char.add(dd.astype("U20"), "\x00"),
                    np.char.add(wa.astype("U"), "\x00")),
        wb.astype("U"))
    # distinct per (doc, pair), then count docs per pair in this batch
    _, first = np.unique(key, return_index=True)
    wa, wb = wa[first], wb[first]
    pkey = np.char.add(np.char.add(wa.astype("U"), "\x00"),
                       wb.astype("U"))
    u, pfirst, cnt = np.unique(pkey, return_index=True,
                               return_counts=True)
    ua, ub = wa[pfirst], wb[pfirst]
    h = fnv64_slices(*_word_arr_slices(np.asarray(u, dtype=object)))
    return pa.table({
        "pair_hash": pa.array(h, pa.uint64()),
        "word_a": pa.array(ua.tolist(), pa.string()),
        "word_b": pa.array(ub.tolist(), pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64())})


def cooccur_pmi_window(sf_dir: str, window: int = 5, min_df: int = 2):
    """(word_a, word_b, df_ab, pmi_q) with co-occurrence restricted to a
    W-token window — the bounded-fan-out scale path."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    _, _, ref = _df_broadcast(sf_dir)
    pairs = exchange_by_key(
        ds.map_batches(_window_pair_partials_batch,
                       fn_kwargs={"window": window},
                       batch_format="pyarrow", zero_copy_batch=True),
        "pair_hash", _pair_reduce, n_parts=32)
    return pairs.map_batches(_pmi_finish_fn(ref, min_df),
                             batch_format="pyarrow")


def cooccur_pmi_window_sql(window: int = 5, min_df: int = 2) -> str:
    """Oracle: positional token stream, pair self-join with
    |pos_a - pos_b| <= window and word_a < word_b, DISTINCT doc."""
    return f"""
WITH ptok AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         w[CAST(u.i AS INTEGER) + 1] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(range(len(w))) u(i)),
tokd AS (SELECT DISTINCT doc_id, word FROM ptok),
df AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tokd
       GROUP BY word),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
pagg AS (
  SELECT word_a, word_b, CAST(count(*) AS BIGINT) AS df_ab FROM (
    SELECT DISTINCT a.doc_id, a.word AS word_a, b.word AS word_b
    FROM ptok a JOIN ptok b
      ON a.doc_id = b.doc_id AND a.word < b.word
     AND abs(a.pos - b.pos) <= {window})
  GROUP BY 1, 2)
SELECT p.word_a, p.word_b, p.df_ab,
       CAST(floor(ln(CAST(n.n * p.df_ab AS DOUBLE)
                     / CAST(d1.df * d2.df AS DOUBLE))
                  * 1000000000::DOUBLE) AS BIGINT) AS pmi_q
FROM pagg p
JOIN df d1 ON d1.word = p.word_a
JOIN df d2 ON d2.word = p.word_b
CROSS JOIN n
WHERE p.df_ab >= {min_df}"""


# ---------------------------------------------------------------------------
# Kneser-Ney bigram NLL — interpolated KN smoothing (Kneser & Ney 1995;
# Chen & Goodman 1998), the standard n-gram LM quality signal:
#
#   p_KN(w2|w1) = max(c12 - d, 0)/c(w1.) + d*N1+(w1.)/c(w1.) * P_cont(w2)
#   P_cont(w2)  = N1+(.w2) / T          (T = distinct bigram types)
#
# With the classic discount d = 3/4 every probability is the exact
# rational  num/den  with
#   num = max(4*c12 - 3, 0) * T + 3 * N1+(w1.) * N1+(.w2)
#   den = 4 * c(w1.) * T
# so the quantized score q = floor(ln(num/den) * 1e9) is ONE float
# division + ln per bigram TYPE (IEEE-identical in numpy and DuckDB;
# the int->double casts round identically on both sides), and scoring
# reuses the integer occurrence-sum tail of ``bigram_nll``.
#
# Distribution: the per-w1 aggregates (c(w1.), N1+(w1.)) fall out of
# the SAME exchange partition that holds all of w1's bigram types; a
# second exchange keyed by hash(w2) adds N1+(.w2) and quantizes.  The
# only scalar crossing the driver is T.
# ---------------------------------------------------------------------------

KN_D_NUM, KN_D_DEN = 3, 4


def _kn_fwd_partition(tbl: pa.Table) -> pa.Table:
    """One w1-hash partition of (bigram, w1, cf2): attach the per-w1
    continuation stats (cdot = total bigrams from w1, fwd = distinct
    successors) and split out w2."""
    empty = pa.table({
        "w2hash": pa.array([], pa.uint64()),
        "bigram": pa.array([], pa.string()),
        "cf2": pa.array([], pa.int64()),
        "cdot": pa.array([], pa.int64()),
        "fwd": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    w1 = np.asarray(tbl["w1"].to_pylist(), dtype=object)
    bi = np.asarray(tbl["bigram"].to_pylist(), dtype=object)
    c2 = tbl["cf2"].to_numpy(zero_copy_only=False)
    order = np.argsort(w1, kind="stable")
    w1, bi, c2 = w1[order], bi[order], c2[order]
    new = np.empty(w1.size, dtype=bool)
    new[0] = True
    new[1:] = w1[1:] != w1[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, w1.size))
    cs = np.concatenate(([0], np.cumsum(c2)))
    cdot = (cs[starts + lens] - cs[starts]).astype(np.int64)
    cdot_r = np.repeat(cdot, lens)
    fwd_r = np.repeat(lens.astype(np.int64), lens)
    # per-type w2 split: bounded by bigram TYPES (dictionary-scale loop)
    w2 = np.asarray([b.split(" ", 1)[1] for b in bi.tolist()],
                    dtype=object)
    h = fnv64_slices(*_word_arr_slices(w2))
    return pa.table({
        "w2hash": pa.array(h, pa.uint64()),
        "bigram": pa.array(bi.tolist(), pa.string()),
        "cf2": pa.array(c2.astype(np.int64), pa.int64()),
        "cdot": pa.array(cdot_r, pa.int64()),
        "fwd": pa.array(fwd_r, pa.int64()),
    })


def _kn_q_partition(tbl: pa.Table, T: int = 1) -> pa.Table:
    """One w2-hash partition: add N1+(.w2), form the exact rational,
    quantize."""
    if tbl.num_rows == 0:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "q": pa.array([], pa.int64())})
    bi = np.asarray(tbl["bigram"].to_pylist(), dtype=object)
    w2 = np.asarray([b.split(" ", 1)[1] for b in bi.tolist()],
                    dtype=object)
    c2 = tbl["cf2"].to_numpy(zero_copy_only=False)
    cdot = tbl["cdot"].to_numpy(zero_copy_only=False)
    fwd = tbl["fwd"].to_numpy(zero_copy_only=False)
    u, inv, back_c = np.unique(w2, return_inverse=True,
                               return_counts=True)
    back = back_c.astype(np.int64)[inv]
    if (KN_D_DEN * int(c2.max()) * T >= 2 ** 62
            or KN_D_DEN * int(cdot.max()) * T >= 2 ** 62):
        raise ValueError("KN rational exceeds int64 "
                         "(SQL-parity precondition)")
    num = (np.maximum(KN_D_DEN * c2 - KN_D_NUM, 0) * T
           + KN_D_NUM * fwd * back)
    den = KN_D_DEN * cdot * T
    q = np.floor(np.log(num.astype(np.float64)
                        / den.astype(np.float64)) * 1e9).astype(np.int64)
    return pa.table({"bigram": pa.array(bi.tolist(), pa.string()),
                     "q": pa.array(q, pa.int64())})


def _kn_q_map(sf_dir: str):
    """(bigram -> q) under interpolated Kneser-Ney smoothing."""
    from .exchange import exchange_by_key

    cf2 = _bigram_cf(sf_dir).materialize()
    T = cf2.count()

    def w1_rows(batch: pa.Table) -> pa.Table:
        words = np.asarray(batch["w1"].to_pylist(), dtype=object)
        h = (fnv64_slices(*_word_arr_slices(words)) if words.size
             else np.asarray([], dtype=np.uint64))
        return batch.append_column("w1hash", pa.array(h, pa.uint64()))

    staged = exchange_by_key(
        cf2.map_batches(w1_rows, batch_format="pyarrow"),
        "w1hash", _kn_fwd_partition, n_parts=32)
    return exchange_by_key(staged, "w2hash", _kn_q_partition,
                           n_parts=32, proc_kwargs={"T": T})


def kn_bigram_nll(sf_dir: str, q_broadcast_limit: int = 2_000_000):
    """Per-document mean Kneser-Ney bigram NLL -> (doc_id, knll_q)."""
    return _score_bigram_qmap(sf_dir, _kn_q_map(sf_dir), "knll_q",
                              q_broadcast_limit)


def kn_bigram_nll_sql() -> str:
    """Oracle for ``kn_bigram_nll``: the same rational in BIGINT CTEs,
    one ln per bigram type, occurrence-sum + mean like bigram_nll."""
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id,
         ws[CAST(u.i AS INTEGER) + 1] AS w1,
         ws[CAST(u.i AS INTEGER) + 2] AS w2,
         ws[CAST(u.i AS INTEGER) + 1] || ' '
           || ws[CAST(u.i AS INTEGER) + 2] AS b
  FROM w, UNNEST(range(len(ws) - 1)) u(i)
  WHERE len(ws) >= 2),
cf2 AS (SELECT b, min(w1) AS w1, min(w2) AS w2,
               CAST(count(*) AS BIGINT) AS c2
        FROM bg GROUP BY b),
c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS cdot,
              CAST(count(*) AS BIGINT) AS fwd
       FROM cf2 GROUP BY w1),
bk AS (SELECT w2, CAST(count(*) AS BIGINT) AS back FROM cf2 GROUP BY w2),
tt AS (SELECT CAST(count(*) AS BIGINT) AS T FROM cf2),
q AS (SELECT cf2.b,
             CAST(floor(ln(
               CAST(greatest({KN_D_DEN} * cf2.c2 - {KN_D_NUM}, 0) * tt.T
                    + {KN_D_NUM} * c1.fwd * bk.back AS DOUBLE)
               / CAST({KN_D_DEN} * c1.cdot * tt.T AS DOUBLE))
               * 1000000000::DOUBLE) AS BIGINT) AS q
      FROM cf2
      JOIN c1 USING (w1) JOIN bk USING (w2) CROSS JOIN tt),
s AS (SELECT bg.doc_id, CAST(sum(q.q) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS nb
      FROM bg JOIN q ON bg.b = q.b GROUP BY bg.doc_id)
SELECT w.doc_id,
       CAST(coalesce((-s.s) // (100 * s.nb), 0) AS BIGINT) AS knll_q
FROM w LEFT JOIN s USING (doc_id)"""


# ---------------------------------------------------------------------------
# Row-level token-count percentile rank — the length-based curriculum /
# filtering signal as a PURE-INTEGER contract: pct_q = (# docs with a
# strictly smaller count) * 1e9 // N.  Same bounded-domain histogram as
# token_count_quantiles (domain-sized driver state), broadcast back to
# a row-local map.
# ---------------------------------------------------------------------------

PCT_SCALE = 1_000_000_000


def token_count_pct(sf_dir: str):
    """(doc_id, n_tokens, pct_q) for every document."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(batch["text"], " "), 1)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tokens": pc.cast(n, pa.int64())})

    withn = ds.map_batches(counts, batch_format="pyarrow",
                           zero_copy_batch=True)
    hist = withn.groupby("n_tokens").count().to_pandas()   # domain-sized
    hist = hist.sort_values("n_tokens")
    vals = hist["n_tokens"].to_numpy().astype(np.int64)
    c = hist["count()"].to_numpy().astype(np.int64)
    below = np.concatenate(([0], np.cumsum(c)[:-1]))
    total = int(c.sum())
    ref = ray.put((vals, below))

    def pct(batch: pa.Table) -> pa.Table:
        v, b = ray.get(ref)
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        j = np.searchsorted(v, n)
        pq = b[j] * PCT_SCALE // total
        return batch.append_column("pct_q", pa.array(pq, pa.int64()))

    return withn.map_batches(pct, batch_format="pyarrow",
                             zero_copy_batch=True)


TOKEN_COUNT_PCT_SQL = f"""
WITH t AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
h AS (SELECT n_tokens, CAST(count(*) AS BIGINT) AS c
      FROM t GROUP BY n_tokens),
cum AS (SELECT n_tokens,
               CAST(sum(c) OVER (ORDER BY n_tokens) - c AS BIGINT)
                 AS below
        FROM h),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t)
SELECT t.doc_id, t.n_tokens,
       CAST(cum.below * {PCT_SCALE} // nn.n AS BIGINT) AS pct_q
FROM t JOIN cum USING (n_tokens) CROSS JOIN nn"""


# -- Simpson lexical diversity ------------------------------------------------

SIMPSON_SCALE = 1_000_000


def simpson_diversity(sf_dir: str):
    """(doc_id, simpson_ppm): Simpson's repeat-concentration index per
    document — the probability two token draws (without replacement)
    are the same word, sum c_i(c_i-1) / (n(n-1)), as an exact-rational
    ppm quantization (low = lexically diverse, high = repetitive; the
    diversity complement of `repetition_stats`'s Gopher filters).
    Row-local and fully vectorized: one np.unique over (doc, token)
    pairs per batch, no shuffle at all."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def batch_fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "simpson_ppm": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        texts = batch["text"].to_pylist()
        per_doc = [np.asarray((t or "").split(" "), dtype=object)
                   for t in texts]
        toks = np.concatenate(per_doc)
        didx = np.repeat(np.arange(len(per_doc), dtype=np.int64),
                         [a.size for a in per_doc])
        # counts per (doc, token)
        order = np.lexsort((toks, didx))
        d_s, t_s = didx[order], toks[order]
        new = np.ones(d_s.size, dtype=bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
        grp = np.cumsum(new) - 1
        c = np.zeros(int(grp[-1]) + 1, np.int64)
        np.add.at(c, grp, 1)
        gdoc = d_s[new]
        s = np.zeros(len(per_doc), np.int64)
        np.add.at(s, gdoc, c * (c - 1))
        n = np.array([a.size for a in per_doc], np.int64)
        denom = n * (n - 1)
        ppm = np.where(n < 2, SIMPSON_SCALE,
                       (s * SIMPSON_SCALE) // np.maximum(denom, 1))
        return pa.table({
            "doc_id": pa.array(
                batch["doc_id"].to_numpy(zero_copy_only=False),
                pa.int64()),
            "simpson_ppm": pa.array(ppm, pa.int64())})

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def simpson_diversity_sql() -> str:
    return f"""
WITH sd_t AS (
  SELECT doc_id, u.t AS w
  FROM documents, UNNEST(string_split(text, ' ')) u(t)),
sd_c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
         FROM sd_t GROUP BY 1, 2),
sd_s AS (SELECT doc_id, CAST(sum(c * (c - 1)) AS BIGINT) AS s,
                CAST(sum(c) AS BIGINT) AS n
         FROM sd_c GROUP BY 1)
SELECT doc_id,
       CAST(CASE WHEN n < 2 THEN {SIMPSON_SCALE}
                 ELSE (s * {SIMPSON_SCALE}) // (n * (n - 1))
            END AS BIGINT) AS simpson_ppm
FROM sd_s"""


# -- Dunning log-likelihood (G^2) collocations --------------------------------

def _g2_finish_fn(ref, min_df: int):
    """Dunning (1993) G^2 over the 2x2 document-contingency table of
    each pair — k11 = df_ab, k12 = df_a - df_ab, k21 = df_b - df_ab,
    k22 = n - df_a - df_b + df_ab; G^2 = 2 * sum k ln(k n / (R C)) with
    the 0 ln 0 = 0 convention. Float ops happen in ONE fixed order
    (((t11 + t12) + t21) + t22, then * 2), mirrored verbatim in SQL, so
    the 1e6 quantization matches bit-for-bit (the same contract as the
    PMI ln)."""
    import ray

    def finish(batch: pa.Table) -> pa.Table:
        vb, dv, n = ray.get(ref)
        empty = pa.table({"word_a": pa.array([], pa.string()),
                          "word_b": pa.array([], pa.string()),
                          "df_ab": pa.array([], pa.int64()),
                          "g2_q": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        keep = batch["df_ab"].to_numpy(zero_copy_only=False) >= min_df
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return empty
        wa = np.asarray(batch["word_a"].to_pylist(), dtype=object)
        wb = np.asarray(batch["word_b"].to_pylist(), dtype=object)
        k11 = batch["df_ab"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        da = dv[np.searchsorted(vb, wa)].astype(np.float64)
        db = dv[np.searchsorted(vb, wb)].astype(np.float64)
        nn = float(n)
        k12 = da - k11
        k21 = db - k11
        k22 = nn - da - db + k11

        def term(k, r, c):
            with np.errstate(divide="ignore", invalid="ignore"):
                t = k * np.log((k * nn) / (r * c))
            return np.where(k > 0, t, 0.0)

        t11 = term(k11, da, db)
        t12 = term(k12, da, nn - db)
        t21 = term(k21, nn - da, db)
        t22 = term(k22, nn - da, nn - db)
        g2 = ((t11 + t12) + t21) + t22
        g2_q = np.floor(g2 * 2.0 * 1e6).astype(np.int64)
        return pa.table({"word_a": batch["word_a"],
                         "word_b": batch["word_b"],
                         "df_ab": pa.array(k11.astype(np.int64),
                                           pa.int64()),
                         "g2_q": pa.array(g2_q, pa.int64())})

    return finish


def g2_collocations(sf_dir: str, min_df: int = 2):
    """(word_a, word_b, df_ab, g2_q): Dunning log-likelihood collocation
    scores over unordered distinct-document co-occurrence — the
    significance-tested sibling of `cooccur_pmi` (PMI over-ranks rare
    pairs; G^2 accounts for the marginals), same exchange-aggregated
    counts and broadcast df map."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    _, _, ref = _df_broadcast(sf_dir)
    pairs = exchange_by_key(
        ds.map_batches(_pair_partials_batch, batch_format="pyarrow",
                       zero_copy_batch=True),
        "pair_hash", _pair_reduce, n_parts=32)
    return pairs.map_batches(_g2_finish_fn(ref, min_df),
                             batch_format="pyarrow")


def g2_collocations_sql(min_df: int = 2) -> str:
    def term(k, r, c):
        return (f"CASE WHEN {k} > 0 THEN {k} * ln(({k} * nn) "
                f"/ ({r} * {c})) ELSE 0.0 END")

    t11 = term("k11", "da", "db")
    t12 = term("k12", "da", "(nn - db)")
    t21 = term("k21", "(nn - da)", "db")
    t22 = term("k22", "(nn - da)", "(nn - db)")
    return f"""
WITH g2_tok AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
g2_df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM g2_tok GROUP BY w),
g2_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
g2_pairs AS (
  SELECT a.w AS word_a, b.w AS word_b, CAST(count(*) AS BIGINT) AS df_ab
  FROM g2_tok a JOIN g2_tok b ON a.doc_id = b.doc_id AND a.w < b.w
  GROUP BY 1, 2),
g2_k AS (
  SELECT p.word_a, p.word_b, p.df_ab,
         CAST(p.df_ab AS DOUBLE) AS k11,
         CAST(d1.df - p.df_ab AS DOUBLE) AS k12,
         CAST(d2.df - p.df_ab AS DOUBLE) AS k21,
         CAST(n.n - d1.df - d2.df + p.df_ab AS DOUBLE) AS k22,
         CAST(d1.df AS DOUBLE) AS da, CAST(d2.df AS DOUBLE) AS db,
         CAST(n.n AS DOUBLE) AS nn
  FROM g2_pairs p
  JOIN g2_df d1 ON d1.w = p.word_a
  JOIN g2_df d2 ON d2.w = p.word_b
  CROSS JOIN g2_n n
  WHERE p.df_ab >= {min_df})
SELECT word_a, word_b, df_ab,
       CAST(floor(((({t11} + {t12}) + {t21}) + {t22})
                  * 2.0 * 1000000.0) AS BIGINT) AS g2_q
FROM g2_k"""


# -- Compression-ratio quality signal ------------------------------------------

ZLIB_LEVEL = 6


def compression_ratio(sf_dir: str, level: int = ZLIB_LEVEL):
    """(doc_id, n_bytes, n_compressed, ratio_ppm): per-document zlib
    compression ratio — the Gopher-family redundancy signal (templated
    / repetitive text compresses far below prose; a ratio filter is the
    cheap first cut before span dedup). ratio_ppm = n_compressed * 1e6
    // n_bytes, pure integers on a DETERMINISTIC compressor (fixed
    level; value pinned by pytest on a fixed string so an environment
    zlib change fails loudly instead of silently shifting outputs).

    No SQL oracle (DuckDB has no zlib) — rows-only driver check +
    pytest value pins, like the multimodal feature entries. Row-local;
    the per-doc zlib call is a C call, not Python-loop work."""
    import zlib

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def batch_fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        raw = [(t or "").encode("utf-8") for t in texts]
        nb = np.array([len(b) for b in raw], np.int64)
        nc = np.array([len(zlib.compress(b, level)) for b in raw],
                      np.int64)
        ratio = (nc * 1_000_000) // np.maximum(nb, 1)
        return pa.table({
            "doc_id": pa.array(
                batch["doc_id"].to_numpy(zero_copy_only=False),
                pa.int64()),
            "n_bytes": pa.array(nb, pa.int64()),
            "n_compressed": pa.array(nc, pa.int64()),
            "ratio_ppm": pa.array(ratio, pa.int64())})

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Substring grep — the LIKE/contains scan operator: per fixed needle,
# how many documents contain it and how many (non-overlapping,
# left-to-right) occurrences exist. Pure vectorized Arrow kernels
# (count_substring), per-batch partials, no shuffle. The SQL mirror
# counts via length(text) - length(replace(...)) — the same
# non-overlapping greedy semantics.
# ---------------------------------------------------------------------------

GREP_NEEDLES = ["scan", "hash jo", "agg", "window", "merge batch"]


def grep_counts(sf_dir: str,
                needles: list[str] | None = None) -> pa.Table:
    """(needle, n_docs, n_occurrences) — DuckDB hash-matched."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    needles = needles if needles is not None else GREP_NEEDLES

    def partial(batch: pa.Table) -> pa.Table:
        out_n, out_d, out_o = [], [], []
        col = batch["text"]
        for nd in needles:
            c = pc.count_substring(col, nd)
            cnp = c.to_numpy(zero_copy_only=False)
            out_n.append(nd)
            out_d.append(int((cnp > 0).sum()))
            out_o.append(int(cnp.sum()))
        return pa.table({
            "needle": pa.array(out_n, pa.string()),
            "n_docs": pa.array(out_d, pa.int64()),
            "n_occurrences": pa.array(out_o, pa.int64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text"])
    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("needle").sum(["n_docs", "n_occurrences"]))
    rows = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    out = pa.table({
        "needle": rows["needle"],
        "n_docs": pa.compute.cast(rows["sum(n_docs)"], pa.int64()),
        "n_occurrences": pa.compute.cast(rows["sum(n_occurrences)"],
                                         pa.int64()),
    })
    return out.sort_by("needle")


def grep_counts_sql(needles: list[str] | None = None) -> str:
    needles = needles if needles is not None else GREP_NEEDLES
    arms = []
    for nd in needles:
        esc = nd.replace("'", "''")
        arms.append(f"""
SELECT '{esc}' AS needle,
       CAST(sum(CASE WHEN contains(text, '{esc}') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs,
       CAST(sum((length(text) - length(replace(text, '{esc}', '')))
                // length('{esc}')) AS BIGINT) AS n_occurrences
FROM documents""")
    return "\nUNION ALL\n".join(arms) + "\nORDER BY needle"


def readability_batch(batch: pa.Table) -> pa.Table:
    """Flesch reading ease per document in exact integer milli-points —
    the classic readability quality signal (complements the unigram-LM
    and compression-ratio scores with a purely structural one):

        fre_milli = 206835 - (1015 * W) // S - (84600 * Y) // W

    W = whitespace tokens (the `doc_token_count` contract), S =
    sentence-terminator runs ``[.!?]+`` (min 1), Y = vowel-group
    syllable proxy ``[aeiouy]+`` over the lowercased text. Counting is
    three Arrow kernels (count_substring / count_substring_regex) —
    zero Python per row; floor divisions match DuckDB ``//`` on
    non-negative operands, so the oracle is bit-exact."""
    text = batch["text"]
    w = pc.add(pc.count_substring(text, " "), 1)
    w = pc.cast(w, pa.int64()).to_numpy(zero_copy_only=False)
    s = pc.cast(pc.count_substring_regex(text, r"[.!?]+"),
                pa.int64()).to_numpy(zero_copy_only=False)
    s = np.maximum(s, 1)
    y = pc.cast(pc.count_substring_regex(pc.utf8_lower(text),
                                         r"[aeiouy]+"),
                pa.int64()).to_numpy(zero_copy_only=False)
    fre = 206835 - (1015 * w) // s - (84600 * y) // w
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(w, pa.int64()),
        "n_sents": pa.array(s, pa.int64()),
        "n_syll": pa.array(y, pa.int64()),
        "fre_milli": pa.array(fre, pa.int64()),
    })


def readability(sf_dir: str):
    """(doc_id, n_words, n_sents, n_syll, fre_milli): row-local
    vectorized map — embarrassingly parallel, no shuffle."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(readability_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def readability_sql() -> str:
    return """
WITH f AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                       AS BIGINT), 1) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS y
  FROM documents)
SELECT doc_id, w AS n_words, s AS n_sents, y AS n_syll,
       206835 - (1015 * w) // s - (84600 * y) // w AS fre_milli
FROM f"""


def fertility_by_lang(sf_dir: str) -> pa.Table:
    """(lang, n_docs, sum_chars, sum_bpe, fertility_milli): tokenizer
    fertility (chars per BPE-regex token, milli-quantized truncating)
    per language — the tokenizer-efficiency diagnostic a multilingual
    training-data pipeline reads before fixing a vocab. One streaming
    pass of per-batch (lang, n_docs, chars, bpe) partials; DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        nch = pc.cast(pc.utf8_length(batch["text"]),
                      pa.int64()).to_numpy(zero_copy_only=False)
        global _BPE_RE
        if _BPE_RE is None:
            import re

            _BPE_RE = re.compile(BPE_PATTERN)
        nbpe = np.fromiter(
            (len(_BPE_RE.findall(t or ""))
             for t in batch["text"].to_pylist()),
            dtype=np.int64, count=len(batch))
        uk, inv = np.unique(lang.astype(str), return_inverse=True)
        return pa.table({
            "lang": pa.array(uk.tolist(), pa.string()),
            "n_docs": pa.array(np.bincount(inv, None, uk.size)
                               .astype(np.int64), pa.int64()),
            "chars": pa.array(np.bincount(inv, nch, uk.size)
                              .astype(np.int64), pa.int64()),
            "bpe": pa.array(np.bincount(inv, nbpe, uk.size)
                            .astype(np.int64), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("lang").aggregate(rd.aggregate.Sum("n_docs"),
                                      rd.aggregate.Sum("chars"),
                                      rd.aggregate.Sum("bpe")))
    import ray as _ray

    tbl = pa.concat_tables(
        [t for t in _ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    lang = np.asarray(tbl["lang"].to_pylist(), dtype=object)
    nd = tbl["sum(n_docs)"].to_numpy(zero_copy_only=False)
    ch = tbl["sum(chars)"].to_numpy(zero_copy_only=False)
    bp = tbl["sum(bpe)"].to_numpy(zero_copy_only=False)
    o = np.argsort(lang.astype(str), kind="stable")
    return pa.table({
        "lang": pa.array(lang[o].tolist(), pa.string()),
        "n_docs": pa.array(nd[o].astype(np.int64), pa.int64()),
        "sum_chars": pa.array(ch[o].astype(np.int64), pa.int64()),
        "sum_bpe": pa.array(bp[o].astype(np.int64), pa.int64()),
        "fertility_milli": pa.array(
            ch[o].astype(np.int64) * 1000
            // np.maximum(bp[o].astype(np.int64), 1), pa.int64()),
    })


def fertility_by_lang_sql() -> str:
    return f"""
WITH t AS (
  SELECT lang, CAST(length(text) AS BIGINT) AS nch,
         CAST(len(regexp_extract_all(text, '{BPE_PATTERN}'))
              AS BIGINT) AS nbpe
  FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nch) AS BIGINT) AS sum_chars,
       CAST(sum(nbpe) AS BIGINT) AS sum_bpe,
       CAST(sum(nch) * 1000 // greatest(sum(nbpe), 1) AS BIGINT)
         AS fertility_milli
FROM t GROUP BY lang ORDER BY lang"""
