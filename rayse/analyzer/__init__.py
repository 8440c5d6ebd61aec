"""Text analysis chain: tokenize → stopword/length filter → Porter stem.

Order and semantics mirror the reference per-element chain
(`Indexer/Service/IndexerService.java:188-190`):

    tokenize(text) → removeStopWords(words) → Stemming(words)

- ``removeStopWords`` (`PreIndexer.java:41-46`): drop every stopword
  occurrence, then drop null/empty/length <= 1 tokens. Both checks run on the
  *unstemmed* token.
- ``Stemming`` (`PreIndexer.java:165-178`): Porter-stem each survivor.
- Positions are the indices in the final filtered+stemmed stream
  (`IndexerService.java:192-198`).

``analyze`` memoizes the per-token (stop?, stem) decision in a module-level
dict — the token distribution is Zipfian, so the cache hit rate is ~1 after
warmup. In Ray stages this state lives once per worker process (actor pools
share it across batches via ``__init__``-time warmup).
"""

from __future__ import annotations

from typing import List, Optional

from .porter import porter_stem
from .stopwords import STOPWORDS
from .tokenizer import tokenize

__all__ = ["tokenize", "porter_stem", "STOPWORDS", "analyze"]

# token -> stemmed token, or None if the token is filtered out
_CACHE: dict = {}
_CACHE_MAX = 2_000_000  # bound worker memory; reset wholesale if exceeded


def _decide(token: str) -> Optional[str]:
    if len(token) <= 1 or token in STOPWORDS:
        return None
    return porter_stem(token)


def analyze(text: str) -> List[str]:
    """Final stemmed token stream of one document/turn (positions = indices)."""
    cache = _CACHE
    if len(cache) > _CACHE_MAX:
        cache.clear()
    out: List[str] = []
    append = out.append
    for token in tokenize(text):
        try:
            stemmed = cache[token]
        except KeyError:
            stemmed = cache[token] = _decide(token)
        if stemmed is not None:
            append(stemmed)
    return out
