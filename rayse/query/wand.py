"""Block-max pruned top-k scoring — the scale path for disjunctive BM25.

The north rule calls for "block-max WAND posting-list intersection"; this
module implements the MaxScore/BMW family adapted to a vectorized runtime:
document-at-a-time pointer chasing is pointer-bound Python here, so instead
we run term-at-a-time over whole posting arrays with the SAME pruning
invariants WAND derives from block maxima:

1. terms sorted by descending score cap (idf x max block_max);
2. threshold θ = current k-th best accumulated score (a true lower bound of
   the final k-th best, since scores only grow);
3. once the remaining terms' total cap < θ, NO new doc can enter the top-k
   -> remaining postings only probe docs already accumulated (binary-search
   semi-join instead of full merge — the "non-essential list" phase);
4. accumulated docs are dropped when score + per-doc remaining bound < θ,
   where the per-doc bound uses each remaining term's BLOCK maximum at that
   doc's block (block_last searchsorted) — the block-max part.

All bounds are true upper bounds and pruning is strict (<), so results are
EXACTLY the exhaustive top-k including docID tie-breaks
(tests/test_wand.py asserts identity on the reference query set).
"""

from __future__ import annotations

import numpy as np

from ..config import BM25Params
from ..index.reader import PartReader
from ..index.segments import DecodedPostings, bm25_tf
from .engine import top_k

_EMPTY_U64 = np.empty(0, dtype=np.uint64)
_EMPTY_F64 = np.empty(0, dtype=np.float64)


def _block_bound(pl: DecodedPostings, docs: np.ndarray, idf: float
                 ) -> np.ndarray:
    """Upper bound of this term's contribution for each doc: idf x the
    block max of the block the doc would land in (0 outside the list's
    doc range)."""
    if pl.block_last.size == 0:
        return np.zeros(docs.size, dtype=np.float64)
    blk = np.searchsorted(pl.block_last, docs, side="left")
    inside = blk < pl.block_last.size
    out = np.zeros(docs.size, dtype=np.float64)
    out[inside] = idf * pl.block_max[blk[inside]]
    return out


def topk_blockmax_part(reader: PartReader, terms, idfs, avgdl: float,
                       params: BM25Params, k: int):
    """Exact disjunctive top-k of one part with block-max pruning."""
    entries = []
    for t, idf in zip(terms, idfs):
        pl = reader.postings(t)
        if pl is None:
            continue
        cap = float(idf * pl.block_max.max()) if pl.block_max.size else 0.0
        entries.append((cap, idf, pl))
    if not entries:
        return _EMPTY_U64, _EMPTY_F64
    entries.sort(key=lambda e: -e[0])
    caps = np.array([e[0] for e in entries])
    suffix = np.concatenate((np.cumsum(caps[::-1])[::-1], [0.0]))

    acc_docs = _EMPTY_U64
    acc_scores = _EMPTY_F64
    probing = False
    for i, (cap, idf, pl) in enumerate(entries):
        theta = (-np.partition(-acc_scores, k - 1)[k - 1]
                 if acc_scores.size >= k else -np.inf)
        if not probing and suffix[i] < theta:
            probing = True  # no new doc can reach the top-k
        contrib_full = None
        if probing:
            # probe only accumulated docs (binary-search semi-join)
            j = np.searchsorted(pl.doc_ids, acc_docs)
            j_c = np.minimum(j, pl.doc_ids.size - 1)
            hit = pl.doc_ids[j_c] == acc_docs
            if hit.any():
                acc_scores = acc_scores.copy()
                acc_scores[hit] += idf * bm25_tf(
                    pl.tfs[j_c[hit]], pl.dls[j_c[hit]], avgdl, params)
        else:
            contrib_full = idf * bm25_tf(pl.tfs, pl.dls, avgdl, params)
            both = np.concatenate((acc_docs, pl.doc_ids))
            vals = np.concatenate((acc_scores, contrib_full))
            uniq, inv = np.unique(both, return_inverse=True)
            merged = np.zeros(uniq.size, dtype=np.float64)
            np.add.at(merged, inv, vals)
            acc_docs, acc_scores = uniq, merged
        # block-max accumulator prune (strict: keeps potential ties)
        if acc_scores.size > 4 * k and i + 1 < len(entries):
            theta = (-np.partition(-acc_scores, k - 1)[k - 1]
                     if acc_scores.size >= k else -np.inf)
            if theta > -np.inf:
                bound = np.zeros(acc_docs.size, dtype=np.float64)
                for cap2, idf2, pl2 in entries[i + 1:]:
                    bound += _block_bound(pl2, acc_docs, idf2)
                keep = acc_scores + bound >= theta
                acc_docs = acc_docs[keep]
                acc_scores = acc_scores[keep]
    return top_k(acc_docs, acc_scores, k)


def regular_blockmax(engine, terms, k: int = 10):
    """Engine-level disjunctive top-k via the block-max path (drop-in for
    SearchEngine.regular; per-part then global merge)."""
    idfs = engine._idfs(terms)
    avgdl = engine.reader.avgdl
    cand_d, cand_s = [], []
    for pr in engine.reader.parts:
        d, s = topk_blockmax_part(pr, terms, idfs, avgdl, engine.params, k)
        if d.size:
            cand_d.append(d)
            cand_s.append(s)
    if not cand_d:
        return _EMPTY_U64, _EMPTY_F64
    return top_k(np.concatenate(cand_d), np.concatenate(cand_s), k)
