"""Result post-processing over the hydrated top-k page (all driver-side —
the candidate set is <= k rows, no distributed work needed, matching the
reference's post-retrieval layer).

- snippets: M9 semantics — first-match window +-width chars adjusted to
  word boundaries, ``<strong>`` highlighting (`QueryService.java:830-918`,
  `RankerService.java:194-331`)
- proximity bonus: A11 — min pairwise token distance between query-term
  positions -> 2.0 / 1.0 / 0.5 tiers (`QueryService.java:1374-1445`)
- match-count fallback: A8 — conjunctive, then >=50%-of-terms, then
  disjunctive (`QueryService.java:595-670`)
- MMR diversity rerank: A14 — greedy score x (1 - 0.7*sim) with progressive
  same-conversation penalty (the reference's same-domain penalty mapped to
  conversations: transcripts have no URL domains)
  (`Ranker/Service/RankerService.java:342-574`)
- suggested queries: M13 — top non-stop terms of top results combined with
  the original query (`QueryService.java:1498-1540`)
- formatting/pagination: M11/O2 — truncation at sentence boundary, page
  slicing (`QueryService.java:1614-1692`)
- role importance: A7 hook — tag weights {title:10,h1:8,h2:6,h3:4,p:2}
  mapped to roles {system:10, user:8, tool:4, assistant:2}; boost =
  log(1 + weight) multiplier (`IndexerService.java:263-331`,
  `Ranker1.java:305-364`)
"""

from __future__ import annotations

import math
import re

import numpy as np

from ..analyzer import STOPWORDS, porter_stem
from ..analyzer.tokenizer import _TOKEN_RE

# A7: tag-importance map re-keyed to transcript roles (SURVEY.md M6/A7)
ROLE_WEIGHTS = {"system": 10, "user": 8, "tool": 4, "assistant": 2}
DEFAULT_ROLE_WEIGHT = 1


def _token_spans(text: str):
    """(start, end, stem) for each whole token of the raw text (spans are
    char offsets into the ORIGINAL text; sub-token expansion is not needed
    for display highlighting)."""
    for m in _TOKEN_RE.finditer(text.lower()):
        tok = m.group(0)
        if len(tok) <= 1 or tok in STOPWORDS:
            continue
        yield m.start(), m.end(), porter_stem(tok)


def make_snippet(text: str, terms, width: int = 100,
                 highlight: bool = True) -> str:
    """First-match window snippet (M9): +-width chars around the first
    query-term occurrence, expanded to word boundaries, matched tokens
    wrapped in <strong>."""
    terms = set(terms)
    spans = [(s, e) for s, e, stem in _token_spans(text) if stem in terms]
    if not spans:
        return text[: 2 * width] + ("..." if len(text) > 2 * width else "")
    first_s, first_e = spans[0]
    lo = max(0, first_s - width)
    hi = min(len(text), first_e + width)
    while lo > 0 and text[lo - 1] not in " \t\n":
        lo -= 1
    while hi < len(text) and text[hi] not in " \t\n":
        hi += 1
    out = []
    cur = lo
    if highlight:
        for s, e in spans:
            if s < lo or e > hi:
                continue
            out.append(text[cur:s])
            out.append("<strong>")
            out.append(text[s:e])
            out.append("</strong>")
            cur = e
    out.append(text[cur:hi])
    snippet = "".join(out)
    prefix = "..." if lo > 0 else ""
    suffix = "..." if hi < len(text) else ""
    return prefix + snippet + suffix


def make_phrase_snippet(text: str, phrase_terms, width: int = 100) -> str:
    """Phrase-first snippet: window around the first position where the
    stemmed phrase appears adjacently (falls back to term snippet)."""
    toks = [(s, e, stem) for s, e, stem in _token_spans(text)]
    stems = [t[2] for t in toks]
    n = len(phrase_terms)
    for i in range(len(stems) - n + 1):
        if stems[i:i + n] == list(phrase_terms):
            s, e = toks[i][0], toks[i + n - 1][1]
            lo = max(0, s - width)
            hi = min(len(text), e + width)
            while lo > 0 and text[lo - 1] not in " \t\n":
                lo -= 1
            while hi < len(text) and text[hi] not in " \t\n":
                hi += 1
            return (("..." if lo > 0 else "") + text[lo:s] + "<strong>"
                    + text[s:e] + "</strong>" + text[e:hi]
                    + ("..." if hi < len(text) else ""))
    return make_snippet(text, set(phrase_terms), width)


def proximity_bonus(positions_by_term: list[np.ndarray]) -> float:
    """A11 tiers on the minimum pairwise token distance between any two
    DIFFERENT query terms' occurrences."""
    present = [p for p in positions_by_term if p is not None and len(p)]
    if len(present) < 2:
        return 0.0
    best = math.inf
    for i in range(len(present)):
        for j in range(i + 1, len(present)):
            a = np.asarray(present[i], dtype=np.int64)
            b = np.asarray(present[j], dtype=np.int64)
            k = np.searchsorted(b, a)
            for cand in (np.clip(k - 1, 0, b.size - 1),
                         np.clip(k, 0, b.size - 1)):
                best = min(best, int(np.abs(a - b[cand]).min()))
    if best <= 3:
        return 2.0
    if best <= 10:
        return 1.0
    if best <= 50:
        return 0.5
    return 0.0


def fallback_tier(n_terms: int, max_match: int) -> tuple:
    """THE A8 ladder rule (single definition, shared by
    ``search_with_fallback`` and the oracle-checked
    ``porter_fallback_topk``): all terms -> >=ceil(n/2) terms -> any.
    Returns (tier_name, match threshold)."""
    half = (n_terms + 1) // 2
    if max_match == n_terms and n_terms > 0:
        return "all", n_terms
    if n_terms > 1 and max_match >= half:
        return "half", half
    return "any", 1


def search_with_fallback(engine, terms, k: int = 10):
    """A8 retrieval ladder over ONE accumulate pass: the tier is decided
    by the best per-doc match count (`fallback_tier`), then docs at that
    threshold rank by BM25. Equivalent to try-conjunctive / try-min-match
    / regular (a doc matching all n terms exists iff max_match == n), but
    single-pass."""
    from .engine import accumulate, top_k

    terms = list(terms)
    n = len(terms)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.float64), "none"
    idfs = engine._idfs(terms)
    d, s, m = accumulate(engine.reader, terms, idfs, engine.reader.avgdl,
                         engine.params)
    tier, thr = fallback_tier(n, int(m.max()) if d.size else 0)
    keep = m >= thr
    docs, scores = top_k(d[keep], s[keep], k)
    return docs, scores, tier


def _token_set(text: str) -> set:
    return {stem for _, _, stem in _token_spans(text)}


def mmr_rerank(rows: list[dict], k: int | None = None,
               sim_weight: float = 0.7, conv_penalty: float = 0.15,
               jaccard_cut: float = 0.7, jaccard_penalty: float = 0.9
               ) -> list[dict]:
    """A14/SE5 greedy diversity rerank of hydrated rows
    [{doc_id, conv_id, text, score}, ...]:

        adjusted = score * (1 - sim_weight * maxJaccard(sel))
                         * (1 - conv_penalty * n_selected_same_conv)
        near-dup (J > jaccard_cut) multiplies by (1 - jaccard_penalty).
    """
    k = k if k is not None else len(rows)
    cand = list(rows)
    tsets = {r["doc_id"]: _token_set(r["text"]) for r in cand}
    selected: list[dict] = []
    conv_count: dict[str, int] = {}
    while cand and len(selected) < k:
        best_i, best_adj = -1, -math.inf
        for i, r in enumerate(cand):
            ts = tsets[r["doc_id"]]
            max_j = 0.0
            for s in selected:
                ss = tsets[s["doc_id"]]
                inter = len(ts & ss)
                union = len(ts | ss) or 1
                max_j = max(max_j, inter / union)
            adj = r["score"] * (1.0 - sim_weight * max_j)
            adj *= max(0.0, 1.0 - conv_penalty
                       * conv_count.get(r["conv_id"], 0))
            if max_j > jaccard_cut:
                adj *= (1.0 - jaccard_penalty)
            if adj > best_adj or (adj == best_adj and best_i >= 0
                                  and r["doc_id"] < cand[best_i]["doc_id"]):
                best_i, best_adj = i, adj
        chosen = cand.pop(best_i)
        chosen = dict(chosen, mmr_score=best_adj)
        selected.append(chosen)
        conv_count[chosen["conv_id"]] = conv_count.get(chosen["conv_id"], 0) + 1
    return selected


def suggest_queries(query: str, top_rows: list[dict], n_terms: int = 5,
                    n_rows: int = 5) -> list[str]:
    """M13: frequent long non-stop raw tokens of the top rows' text,
    appended to the original query."""
    from collections import Counter

    c: Counter = Counter()
    for r in top_rows[:n_rows]:
        for m in _TOKEN_RE.finditer((r.get("text") or "").lower()):
            tok = m.group(0)
            if len(tok) > 3 and tok not in STOPWORDS:
                c[tok] += 1
    ql = query.lower()
    out = []
    for tok, _ in c.most_common(n_terms * 3):
        if tok not in ql:
            out.append(f"{query} {tok}")
        if len(out) >= n_terms:
            break
    return out


_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def format_result_text(text: str, max_chars: int = 250,
                       min_chars: int = 200) -> str:
    """M11: truncate at a sentence boundary inside [min_chars, max_chars],
    else hard-cut at max_chars."""
    if len(text) <= max_chars:
        return text
    cut = text[:max_chars]
    best = None
    for m in _SENT_SPLIT.finditer(cut):
        if m.start() + 1 >= min_chars:
            best = m.start() + 1
            break
    if best is None:
        sp = cut.rfind(" ")
        best = sp if sp > min_chars else max_chars
    return cut[:best].rstrip() + "..."


def paginate(rows: list, page: int, page_size: int) -> list:
    """O2: 1-based page slicing (`QueryService.java:1674-1692`)."""
    start = (page - 1) * page_size
    return rows[start:start + page_size]


def role_boost(scores: np.ndarray, roles: list[str]) -> np.ndarray:
    """A7/A9 hook: multiply by log(1 + role_weight)."""
    w = np.array([ROLE_WEIGHTS.get(r, DEFAULT_ROLE_WEIGHT) for r in roles],
                 dtype=np.float64)
    return scores * np.log1p(w)
