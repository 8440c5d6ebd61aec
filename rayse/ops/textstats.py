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


_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def fingerprint_batch(batch: pa.Table, window: int = 4) -> pa.Table:
    """Winnowing-style document fingerprint: rolling FNV-1a over word
    ``window``-grams, fingerprint = min hash over windows (deterministic,
    order-sensitive — a reordered document fingerprints differently)."""
    fps = np.empty(len(batch), dtype=np.uint64)
    for i, t in enumerate(batch["text"].to_pylist()):
        words = (t or "").split(" ")
        if len(words) < window:
            grams = [" ".join(words)]
        else:
            grams = [" ".join(words[j:j + window])
                     for j in range(len(words) - window + 1)]
        best = np.uint64(0xFFFFFFFFFFFFFFFF)
        for g in grams:
            h = _FNV64_OFFSET
            for b in g.encode():
                h = np.uint64((int(h) ^ b) * int(_FNV64_PRIME) & 0xFFFFFFFFFFFFFFFF)
            if h < best:
                best = h
        fps[i] = best
    return pa.table({"doc_id": batch["doc_id"],
                     "fingerprint": pa.array(fps, pa.uint64())})


# -- dataset-level wrappers --------------------------------------------------

def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def token_count(sf_dir: str):
    return _docs(sf_dir).map_batches(token_count_batch,
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
