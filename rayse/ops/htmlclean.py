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

Parse layer: a small HTML5 tokenizer state machine (the WHATWG
tokenization algorithm's essentials — data / tag-open / tag-name /
attribute skipping with quote awareness / self-closing flag / comment /
bogus-comment / RAWTEXT and RCDATA element content), with Jsoup-like
error recovery on malformed input: a raw ``<`` not opening a tag is
literal text, unmatched close tags are ignored, mis-nested close tags pop
to the nearest matching open element, and EOF implicitly closes
everything (unclosed tags never eat the rest of the document, unlike a
regex ``<[^>]+>`` pass). Element tracking is a plain open-element stack —
enough for the reference chain's three container questions (inside a
captured code-ish element? inside a removed subtree? inside raw text?)
without building a DOM. Tag boundaries contribute a space (the whitespace
collapse downstream absorbs the difference; pinned by tests).

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

# Captured code-ish elements (`PreIndexer.java:52-56`); every selected
# element contributes its FULL text (nested <pre><code>x</code></pre>
# yields x from both, matching Jsoup's per-element select + text()).
_CODE_SET = frozenset({"code", "pre", "tt", "kbd", "samp"})
# HTML5 RAWTEXT elements: content is character data, never elements —
# Jsoup stores it in DataNodes which text() ignores, so it vanishes from
# both the body and any enclosing code capture.
_RAWTEXT_SET = frozenset({"style", "script"})
# RCDATA elements: character data too (no child elements), but TEXT —
# Jsoup's text() keeps it.
_RCDATA_SET = frozenset({"title", "textarea"})
# Removed NON-raw-text subtrees (`PreIndexer.java:59`): their contents
# parse as elements (code inside <svg> IS captured before removal).
_REMOVE_SET = frozenset({"noscript", "svg", "canvas"})
# HTML5 void elements: no content, no close tag (meta/link removal is
# just their tags vanishing).
_VOID_SET = frozenset("area base br col embed hr img input link meta "
                      "param source track wbr".split())

_RAW_CLOSE_RE = {t: re.compile(rf"</{t}\b[^>]*>", re.I)
                 for t in _RAWTEXT_SET | _RCDATA_SET}
_NAME_RE = re.compile(r"[a-zA-Z][^\s/>]*")
# `PreIndexer.java:69` whitelist, verbatim
_WHITELIST_RE = re.compile(r"[^a-zA-Z0-9_+\-.#$%^&*()\[\]{}<>=/\\|:;,!?]")
_WS_RE = re.compile(r"\s+")


def _tag_end(s: str, j: int) -> int:
    """Index of the tag-closing ``>`` scanning from ``j``, honoring quoted
    attribute values (a ``>`` inside quotes does not end the tag); -1 at
    EOF (spec: the truncated tag is dropped). Per-char work is bounded by
    tag length, not document length."""
    n = len(s)
    q = ""
    while j < n:
        ch = s[j]
        if q:
            if ch == q:
                q = ""
        elif ch in "\"'":
            q = ch
        elif ch == ">":
            return j
        j += 1
    return -1


def _parse_clean(s: str) -> tuple[str, str]:
    """One pass of the tokenizer over ``s`` -> (body_text, code_text):
    body excludes removed subtrees and raw text; code_text is the
    document-order concatenation of every code-ish element's text."""
    body: list[str] = []
    code_bufs: list[list[str]] = []        # one per code element, doc order
    stack: list[tuple[str, bool, list | None]] = []   # (name, removed, buf)
    open_code: list[list[str]] = []
    removed_depth = 0
    i, n = 0, len(s)

    def emit_text(seg: str) -> None:
        if removed_depth == 0:
            body.append(seg)
        for buf in open_code:
            buf.append(seg)

    def emit_sep() -> None:
        if removed_depth == 0:
            body.append(" ")
        for buf in open_code:
            buf.append(" ")

    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            emit_text(s[i:])
            break
        if lt > i:
            emit_text(s[i:lt])
        c = s[lt + 1] if lt + 1 < n else ""
        if c == "!":                                   # comment / doctype
            if s.startswith("<!--", lt):
                end = s.find("-->", lt + 4)
                i = n if end < 0 else end + 3
            else:
                end = s.find(">", lt)
                i = n if end < 0 else end + 1
            emit_sep()
        elif c == "?":                                 # bogus comment
            end = s.find(">", lt)
            i = n if end < 0 else end + 1
            emit_sep()
        elif c == "/":
            m = _NAME_RE.match(s, lt + 2)
            if m is None:                              # "</" + non-letter:
                end = s.find(">", lt)                  # bogus comment
                i = n if end < 0 else end + 1
                emit_sep()
                continue
            end = _tag_end(s, lt + 2)
            if end < 0:
                break                                  # EOF in tag: drop
            i = end + 1
            emit_sep()
            name = m.group(0).lower()
            if any(e[0] == name for e in stack):       # pop to match;
                while stack:                           # unmatched: ignored
                    top, rm, buf = stack.pop()
                    if rm:
                        removed_depth -= 1
                    if buf is not None:                # remove by IDENTITY
                        open_code[:] = [b for b in open_code if b is not buf]
                    if top == name:
                        break
        elif c.isalpha():
            m = _NAME_RE.match(s, lt + 1)
            end = _tag_end(s, lt + 1)
            if end < 0:
                break                                  # EOF in tag: drop
            name = m.group(0).lower()
            region = s[lt + 1:end]
            self_closing = region.rstrip().endswith("/")
            i = end + 1
            emit_sep()
            if name in _RAWTEXT_SET or name in _RCDATA_SET:
                mc = _RAW_CLOSE_RE[name].search(s, i)
                content = s[i:mc.start()] if mc else s[i:]
                if name in _RCDATA_SET:
                    emit_text(content)                 # RCDATA is text
                    emit_sep()
                i = mc.end() if mc else n
            elif name in _VOID_SET or self_closing:
                pass                                   # no content
            else:
                buf = None
                if name in _CODE_SET:
                    buf = []
                    code_bufs.append(buf)
                    open_code.append(buf)
                rm = name in _REMOVE_SET
                if rm:
                    removed_depth += 1
                stack.append((name, rm, buf))
        else:                                          # literal "<" in text
            emit_text("<")
            i = lt + 1
    # EOF closes everything implicitly (buffers already registered)
    return "".join(body), " ".join("".join(b) for b in code_bufs)


def clean_html_text(s: str) -> str:
    """One document through the reference cleaning chain (module
    docstring steps 1-6) over the state-machine parse."""
    if not s:
        return ""
    body, code = _parse_clean(s)
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
