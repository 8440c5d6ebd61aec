"""M2 HTML cleaner — reference `PreIndexer.java:48-75` semantics as a
vectorizable ``map_batches`` stage, plus a synthesized-HTML DuckDB oracle.

Reference semantics reproduced exactly (in order):

1. capture the text of ``code, pre, tt, kbd, samp`` elements (document
   order) — `PreIndexer.java:52-56`;
2. remove ``style, script, meta, link, noscript, svg, canvas`` subtrees —
   `PreIndexer.java:59`;
3. strip every remaining tag to text — `PreIndexer.java:62`;
4. APPEND the captured code text — `PreIndexer.java:65`. The reference does
   NOT remove the code-ish elements before step 3, so their content appears
   TWICE in the output. Quirk kept verbatim.
5. character whitelist ``[a-zA-Z0-9_+-.#$%^&*()\\[\\]{}<>=/\\|:;,!?]``,
   everything else becomes a space — `PreIndexer.java:69`;
6. whitespace collapse + trim — `PreIndexer.java:72`.

Scope: the reference parses with Jsoup; its malformed-HTML error recovery
is NOT reproduced here (no HTML parser library in this container). The
compiled-regex realization is exact for well-formed input — nesting of
non-raw-text removed elements, attributes, self-closing voids, and the
standard named/numeric entities all handled — and a production deployment
would plug a real parser behind the same batch seam (the
``rayse.ops.multimodal`` codec-seam pattern).

Oracle strategy (the ``html_clean`` driver query): both sides synthesize
the SAME HTML document from each ``documents.text`` row by a fixed rule
(heading + style + script-with-leaked-word + paragraph + svg junk + pre
block). The Ray side runs the REAL cleaner over the synthesized HTML; the
SQL side computes the expected output ANALYTICALLY from the raw words
(head word, then all words, then the pre half again — step 4's quirk). A
cleaner that fails to drop script/style/svg, loses the paragraph, or skips
the code-append therefore hash-mismatches loudly.
"""

from __future__ import annotations

import html
import re

import pyarrow as pa

_CODE_TAGS = "code|pre|tt|kbd|samp"
# HTML5 raw-text elements: their content is TEXT (never parsed as
# elements; the first matching close tag always ends them), so a
# first-close non-greedy match is exact and code markup inside them must
# NOT be captured (Jsoup's doc.select never sees elements there).
_RAWTEXT_TAGS = "style|script"
# Removed NON-raw-text subtrees: contents parse as elements (code inside
# an <svg> IS selected by the reference before removal), and same-tag
# nesting is legal (svg-in-svg) — removed innermost-first to a fixpoint.
_REMOVE_ELEM_TAGS = "noscript|svg|canvas"

_CODE_RE = re.compile(rf"<({_CODE_TAGS})\b[^>]*>(.*?)</\1\s*>",
                      re.S | re.I)
_RAWTEXT_RE = re.compile(rf"<({_RAWTEXT_TAGS})\b[^>]*>.*?</\1\s*>",
                         re.S | re.I)
_REMOVE_ELEM_RE = re.compile(
    rf"<({_REMOVE_ELEM_TAGS})\b[^>]*>"
    rf"(?:(?!<(?:{_REMOVE_ELEM_TAGS})\b).)*?</\1\s*>", re.S | re.I)
_VOID_RE = re.compile(r"<(?:meta|link)\b[^>]*/?>", re.I)
_TAG_RE = re.compile(r"<[^>]+>")
# `PreIndexer.java:69` whitelist, verbatim
_WHITELIST_RE = re.compile(r"[^a-zA-Z0-9_+\-.#$%^&*()\[\]{}<>=/\\|:;,!?]")
_WS_RE = re.compile(r"\s+")


def _remove_nested(s: str) -> str:
    """Remove noscript/svg/canvas subtrees innermost-first until stable
    (handles same-tag nesting exactly; terminates — every pass deletes at
    least one element or leaves no match)."""
    while True:
        s2 = _REMOVE_ELEM_RE.sub(" ", s)
        if s2 == s:
            return s
        s = s2


def clean_html_text(s: str) -> str:
    """One document through the reference cleaning chain (module
    docstring steps 1-6). Raw-text subtrees (script/style) are dropped
    BEFORE code capture — their content is text to an HTML parser, so the
    reference's element selection never matches inside them."""
    if not s:
        return ""
    s = _RAWTEXT_RE.sub(" ", s)
    code = " ".join(m.group(2) for m in _CODE_RE.finditer(s))
    code = _TAG_RE.sub(" ", code)          # element.text() of nested markup
    body = _remove_nested(s)
    body = _VOID_RE.sub(" ", body)
    body = _TAG_RE.sub(" ", body)
    out = body + " " + code                # step 4: code content appended
    out = html.unescape(out)               # full named + numeric entities
    out = _WHITELIST_RE.sub(" ", out)
    return _WS_RE.sub(" ", out).strip()


def clean_text_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """map_batches stage: rewrite ``column`` in place through the cleaner
    (the M2 parity hook used by ``IndexConfig(clean_html=True)``). Regexes
    are module-compiled once per worker process."""
    texts = batch[column].to_pylist()
    cleaned = pa.array([clean_html_text(t) if t is not None else None
                        for t in texts], pa.string())
    return batch.set_column(batch.schema.get_field_index(column),
                            column, cleaned)


# ---------------------------------------------------------------------------
# Synthesized-HTML oracle plumbing
# ---------------------------------------------------------------------------

def synth_html(text: str) -> str:
    """Deterministic HTML wrapping of one document's text: first word in a
    heading, first half in a paragraph, second half in a <pre> block,
    plus style/script/meta/svg content that MUST disappear (the script
    leaks the last word — if removal fails, it shows up in the hash)."""
    words = text.split(" ")
    mid = len(words) // 2
    return ("<html><head><style>p { color: red; }</style>"
            '<meta charset="utf-8"/></head><body>'
            f'<h1 class="title">{words[0]}</h1>'
            f'<script>var hidden = "{words[-1]}";</script>'
            f'<p class="note">{" ".join(words[:mid])}</p>'
            "<svg><g>junk glyph</g></svg>"
            f"<pre>{' '.join(words[mid:])}</pre>"
            "</body></html>")


def synth_and_clean_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> (doc_id, clean_text): wrap each text with
    ``synth_html`` and run the REAL cleaner over the wrapped form."""
    texts = batch["text"].to_pylist()
    return pa.table({
        "doc_id": batch["doc_id"],
        "clean_text": pa.array(
            [clean_html_text(synth_html(t or "")) for t in texts],
            pa.string()),
    })


def html_clean(sf_dir: str):
    """Driver query: the M2 cleaner over synthesized HTML for every
    document — DuckDB hash-matched against the analytic expectation."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(synth_and_clean_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def html_clean_sql() -> str:
    """Analytic expected output of ``html_clean``: heading word, then all
    words (h1 + p + pre in document order), then the pre half AGAIN (the
    reference's code-append quirk, module docstring step 4). The corpus
    words are plain lowercase ASCII, so the whitelist is a no-op and the
    whitespace bookkeeping is a trailing collapse+trim."""
    return """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(
         ws[1] || ' ' || array_to_string(ws[1:n//2], ' ') || ' ' ||
         array_to_string(ws[n//2+1:n], ' ') || ' ' ||
         array_to_string(ws[n//2+1:n], ' '),
         '\\s+', ' ', 'g')) AS clean_text
FROM w"""
