"""Brute-force single-process oracle (FIXTURES.md §4).

Implements the reference's canonical semantics independently of the engine:
dict-based inverted index with positions, IDF ``ln((1+N)/(1+df))+1``
(`IndexerService.java:966`), BM25 TF ``k1=1.2, b=0.75``
(`IndexerService.java:1028-1070`), score = Σ idf·tf, ties broken by
ascending docID. Shares ONLY the analyzer and docID functions with the
engine (those are pinned separately by golden tests); index construction,
scoring and set algebra are written from the formulas, not the engine code.
"""

from __future__ import annotations

import math

from rayse.analyzer import analyze
from rayse.stages.doc_ids import doc_id_of


class OracleIndex:
    def __init__(self, table, k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b
        conv = table["conv_id"].to_pylist()
        turn = table["turn_idx"].to_pylist()
        texts = table["text"].to_pylist()
        roles = (table["role"].to_pylist()
                 if "role" in table.column_names else [""] * len(conv))
        self.postings: dict[str, dict[int, list[int]]] = {}
        self.doc_len: dict[int, int] = {}
        self.doc_role: dict[int, str] = {}
        total = 0
        for c, t, x, r in zip(conv, turn, texts, roles):
            d = doc_id_of(c, t)
            toks = analyze(x or "")
            self.doc_len[d] = len(toks)
            self.doc_role[d] = r
            total += len(toks)
            for pos, w in enumerate(toks):
                self.postings.setdefault(w, {}).setdefault(d, []).append(pos)
        self.n_docs = len(conv)
        self.total_tokens = total
        self.avgdl = total / self.n_docs if self.n_docs else 1.0

    # -- stats ---------------------------------------------------------------
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> float:
        return math.log((1.0 + self.n_docs) / (1.0 + self.df(term))) + 1.0

    def tf_bm25(self, f: int, dl: int) -> float:
        return f * (self.k1 + 1.0) / (
            f + self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl)))

    # -- retrieval -----------------------------------------------------------
    def score_docs(self, docs, terms) -> dict[int, float]:
        scores = {d: 0.0 for d in docs}
        for t in terms:
            idf = self.idf(t)
            pl = self.postings.get(t, {})
            for d in docs:
                ps = pl.get(d)
                if ps is not None:
                    scores[d] += idf * self.tf_bm25(len(ps), self.doc_len[d])
        return scores

    def regular(self, terms, k: int = 10):
        docs = set()
        for t in terms:
            docs.update(self.postings.get(t, {}).keys())
        return self._topk(self.score_docs(sorted(docs), terms), k)

    def conjunctive(self, terms, k: int = 10):
        sets = [set(self.postings.get(t, {}).keys()) for t in terms]
        docs = set.intersection(*sets) if sets else set()
        return self._topk(self.score_docs(sorted(docs), terms), k)

    def phrase_docs(self, phrase) -> list[int]:
        if not phrase:
            return []
        sets = [set(self.postings.get(t, {}).keys()) for t in phrase]
        cand = set.intersection(*sets)
        out = []
        for d in sorted(cand):
            p0 = set(self.postings[phrase[0]][d])
            for i, t in enumerate(phrase[1:], start=1):
                p0 &= {p - i for p in self.postings[t][d]}
                if not p0:
                    break
            if p0:
                out.append(d)
        return out

    def phrase(self, phrase, k: int = 10):
        docs = self.phrase_docs(phrase)
        terms = list(dict.fromkeys(phrase))
        return self._topk(self.score_docs(docs, terms), k)

    def boolean(self, op, left, right, k: int = 10):
        l = set(self.phrase_docs(left))
        r = set(self.phrase_docs(right))
        if op == "AND":
            docs, terms = l & r, list(dict.fromkeys(list(left) + list(right)))
        elif op == "OR":
            docs, terms = l | r, list(dict.fromkeys(list(left) + list(right)))
        elif op == "NOT":
            docs, terms = l - r, list(dict.fromkeys(left))
        else:
            raise ValueError(op)
        return self._topk(self.score_docs(sorted(docs), terms), k)

    def boolean_complex(self, op, left, right, k: int = 10):
        """ComplexPhraseSearching-parity oracle (running-score x2 per
        matched phrase, log10(N/df) idf, tf = freq/doc_len)."""
        l = set(self.phrase_docs(left))
        r = set(self.phrase_docs(right))
        if op == "AND":
            docs = l & r
        elif op == "OR":
            docs = l | r
        elif op == "NOT":
            docs = l - r
        else:
            raise ValueError(op)
        scores = {d: 0.0 for d in docs}
        for phrase, pdocs in ((left, l), (right, r)):
            for t in phrase:
                pl = self.postings.get(t, {})
                df = len(pl)
                for d in docs:
                    ps = pl.get(d)
                    if ps:
                        tf = len(ps) / max(self.doc_len[d], 1)
                        scores[d] += tf * math.log10(self.n_docs / max(df, 1))
            for d in docs:
                if d in pdocs:
                    scores[d] *= 2.0
        return self._topk(scores, k)

    # -- role-scoped retrieval (M6/A7 oracle) --------------------------------
    def score_docs_weighted(self, docs, terms, role_weights=None):
        scores = {d: 0.0 for d in docs}
        for t in terms:
            idf = self.idf(t)
            pl = self.postings.get(t, {})
            for d in docs:
                ps = pl.get(d)
                if ps is not None:
                    w = (role_weights.get(self.doc_role[d], 1.0)
                         if role_weights else 1.0)
                    scores[d] += w * idf * self.tf_bm25(len(ps),
                                                        self.doc_len[d])
        return scores

    def regular_role(self, terms, k: int = 10, role=None, role_weights=None):
        docs = set()
        for t in terms:
            docs.update(self.postings.get(t, {}).keys())
        if role is not None:
            docs = {d for d in docs if self.doc_role[d] == role}
        return self._topk(
            self.score_docs_weighted(sorted(docs), terms, role_weights), k)

    def conjunctive_role(self, terms, k: int = 10, role=None,
                         role_weights=None):
        sets = [set(self.postings.get(t, {}).keys()) for t in terms]
        docs = set.intersection(*sets) if sets else set()
        if role is not None:
            docs = {d for d in docs if self.doc_role[d] == role}
        return self._topk(
            self.score_docs_weighted(sorted(docs), terms, role_weights), k)

    def phrase_role(self, phrase, k: int = 10, role=None, role_weights=None):
        docs = self.phrase_docs(phrase)
        if role is not None:
            docs = [d for d in docs if self.doc_role[d] == role]
        terms = list(dict.fromkeys(phrase))
        return self._topk(
            self.score_docs_weighted(docs, terms, role_weights), k)

    @staticmethod
    def _topk(scores: dict[int, float], k: int):
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [d for d, _ in ranked], [s for _, s in ranked]

    def search(self, query: str, k: int = 10, mode: str = "or"):
        from rayse.query.parser import parse_query

        q = parse_query(query)
        if q.kind == "phrase":
            return self.phrase(list(q.phrase), k)
        if q.kind == "boolean":
            return self.boolean(q.op, list(q.left), list(q.right), k)
        if not q.terms:
            return [], []
        if mode == "and":
            return self.conjunctive(list(q.terms), k)
        return self.regular(list(q.terms), k)
