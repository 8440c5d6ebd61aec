"""Tokenizer — semantic parity with the reference's ``PreIndexer.tokenize``.

Reference: `Indexer/Service/PreIndexer.java:93-163`. The reference compiles an
ordered regex alternation and walks the text with ``Matcher.find``; because
Java alternation is first-match (not longest-match) and the first alternative
``[a-z0-9_]+(?:\\.[a-z0-9_]+)*`` matches at every ``[a-z0-9_]`` position, the
"operator expression" (``x+=1``) and "array access" (``arr[i]``) alternatives
are unreachable. The observable token grammar is therefore:

1. ``[a-z0-9_]+(\\.[a-z0-9_]+)*``  — words, numbers, dotted identifiers
2. ``\\.[a-z0-9_]+``               — file extensions at a non-word boundary
3. ``/[a-z0-9_\\-./]+``            — paths / URL parts starting with '/'

After each whole token the reference appends *sub-tokens*
(`PreIndexer.java:126-159`):

- dot-split parts if the token contains '.',
- operator-split parts (split on ``[+\\-*/=]``) if the token matches
  ``.*[+\\-*/=].*`` — only path tokens can, via '-' or '/',
- bracket base/index — dead code (no token can contain '[').

Each sub-token is appended only if not already present anywhere in the
token list built so far (``words.contains(part)``) — i.e. dedup against the
full emitted stream, whole tokens included. Python's ``re`` uses the same
first-match alternation semantics as Java, so we use the literal grammar
above.
"""

from __future__ import annotations

import re
from typing import List

# Ordered alternation; Python `re` is first-match like Java.
_TOKEN_RE = re.compile(
    r"(?:[a-z0-9_]+(?:\.[a-z0-9_]+)*)"  # words with optional dots
    r"|(?:\.[a-z0-9_]+)"  # file extensions like ".py"
    r"|(?:/[a-z0-9_\-./]+)"  # file paths or URL parts
)

_OP_SPLIT_RE = re.compile(r"[+\-*/=]")
_HAS_OP_RE = re.compile(r"[+\-*/=]")


def tokenize(text: str) -> List[str]:
    """Token stream incl. sub-token expansion, matching PreIndexer.tokenize.

    Hot-path note: the operator-split branch fires iff the token contains
    one of ``+-*/=`` — provably equivalent to ``token[0] == '/'`` under the
    token grammar (alternatives 1-2 match only ``[a-z0-9_.]``; only the
    path alternative can contain ``-`` or ``/``), so the per-token regex
    search is replaced by one char test."""
    words: List[str] = []
    seen = None  # mirrors `words.contains(...)`; built lazily — it is only
    # consulted by sub-token dedup, so token streams with no compound
    # tokens (no '.'/'/') never pay the per-token set insert
    append = words.append
    for token in _TOKEN_RE.findall(text.lower()):
        append(token)
        if seen is not None:
            seen.add(token)
        if "." in token or token[0] == "/":
            if seen is None:
                seen = set(words)
            if "." in token:
                for part in token.split("."):
                    if part and part not in seen:
                        append(part)
                        seen.add(part)
            if token[0] == "/":
                for part in _OP_SPLIT_RE.split(token):
                    if part and part not in seen:
                        append(part)
                        seen.add(part)
        # bracket handling (`PreIndexer.java:146-159`) is unreachable: no
        # alternative of the token regex can emit '[' — kept out by design.
    return words
