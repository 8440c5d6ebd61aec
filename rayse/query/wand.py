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
4. single-term queries visit blocks in descending block-max order and stop
   as soon as the next block's bound is below θ — the classic BMW skip
   (hot-term top-k from a handful of 128-posting blocks).

All bounds are true upper bounds and pruning is strict (<), so results are
EXACTLY the exhaustive top-k including docID tie-breaks
(tests/test_wand.py asserts identity on the reference query set).
"""

from __future__ import annotations

import numpy as np

from ..config import BM25Params
from ..index.segments import DecodedPostings, bm25_tf
from .engine import top_k

_EMPTY_U64 = np.empty(0, dtype=np.uint64)
_EMPTY_F64 = np.empty(0, dtype=np.float64)


def topk_single_term(pl: DecodedPostings, idf: float, avgdl: float,
                     params: BM25Params, k: int):
    """Exact single-term top-k visiting only blocks whose upper bound can
    beat the running threshold — the classic BMW win: a hot term's top-k
    is found after a handful of 128-posting blocks instead of millions.

    Safe ONLY for single-term scoring: skipped postings belong to docs
    whose total score is exactly this term's contribution, strictly below
    θ (bound <= idf x block_max < θ)."""
    n = pl.doc_ids.size
    # idf < 0 (possible under idf_variant="v1") breaks the bound direction:
    # score everything instead (bounds are only valid for idf >= 0)
    if idf < 0 or n <= 8 * k or pl.block_starts is None or pl.block_max.size < 4:
        d, s = pl.doc_ids, idf * bm25_tf(pl.tfs, pl.dls, avgdl, params)
        return top_k(d, s, k)
    bounds = idf * pl.block_max
    order = np.argsort(-bounds, kind="stable")
    starts = pl.block_starts
    sizes = np.diff(np.concatenate((starts, [n])))

    def gather(blocks):
        lens = sizes[blocks]
        idx = (np.repeat(starts[blocks], lens)
               + (np.arange(int(lens.sum()), dtype=np.int64)
                  - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])),
                              lens)))
        return (pl.doc_ids[idx],
                idf * bm25_tf(pl.tfs[idx], pl.dls[idx], avgdl, params))

    # Two phases: score the highest-bound blocks to establish θ, then one
    # gather of every remaining block whose bound can still beat θ. (When
    # blocks are near-uniform — common words, flat tf/dl — the survivor set
    # is large and this degrades gracefully to one full vectorized pass
    # instead of thousands of small batches.)
    head = order[:32]
    d0, s0 = gather(head)
    if s0.size >= k:
        theta = -np.partition(-s0, k - 1)[k - 1]
        rest = order[head.size:]
        rest = rest[bounds[rest] >= theta]
    else:
        rest = order[head.size:]
    if rest.size == 0:
        return top_k(d0, s0, k)
    d1, s1 = gather(rest)
    return top_k(np.concatenate((d0, d1)), np.concatenate((s0, s1)), k)


def topk_blockmax(reader, terms, idfs, avgdl: float,
                  params: BM25Params, k: int):
    """Exact disjunctive top-k over merged lists with block-max pruning.

    Every pruning bound below assumes idf >= 0 (contributions only ever
    raise a doc's score). idf_variant="v1" (log10(N/(df+1))) can be
    negative when df == N, which would flip caps/bounds into lower bounds
    and break the exactness guarantee — such queries fall back to the
    exhaustive path (identical results, no pruning)."""
    if any(i < 0 for i in idfs):
        from .engine import accumulate

        d, s, _ = accumulate(reader, terms, idfs, avgdl, params)
        return top_k(d, s, k)
    entries = []
    for t, idf in zip(terms, idfs):
        pl = reader.merged(t)
        if pl is None:
            continue
        cap = float(idf * pl.block_max.max()) if pl.block_max.size else 0.0
        entries.append((cap, idf, pl))
    if not entries:
        return _EMPTY_U64, _EMPTY_F64
    if len(entries) == 1:
        cap, idf, pl = entries[0]
        return topk_single_term(pl, idf, avgdl, params, k)
    entries.sort(key=lambda e: -e[0])
    caps = np.array([e[0] for e in entries])

    # Pass 1 — bootstrap θ (a true lower bound of the final k-th best):
    # the final k-th best score >= any single term's k-th best contribution
    # (each of that term's top-k docs scores at least its contribution).
    theta = -np.inf
    for cap, idf, pl in entries:
        if cap <= theta:
            continue  # this term's contributions cannot raise θ
        _, s = topk_single_term(pl, idf, avgdl, params, k)
        if s.size >= k:
            theta = max(theta, float(s[k - 1]))

    # Pass 2 — candidate generation with a small/big list split:
    # * SMALL lists (df <= SMALL_DF): every posting's doc is a candidate.
    # * BIG lists: only postings in blocks with idf x block_max >=
    #   θ - (big_cap_total - cap_t) can INTRODUCE a candidate. A doc outside
    #   the candidate set is in no small list and, for every big term t
    #   containing it, contrib_t < θ - Σ_{t' != t, big} cap_{t'}; summing
    #   over its terms gives total score < θ — exact exclusion.
    SMALL_DF = 65536
    full: list = []      # lists whose every doc is a candidate
    partial: list = []   # big lists admitting only block-surviving docs
    big = [e for e in entries if e[2].doc_ids.size > SMALL_DF]
    big_cap_total = sum(e[0] for e in big)
    for cap, idf, pl in entries:
        if pl.doc_ids.size <= SMALL_DF:
            full.append((idf, pl))
            continue
        theta_t = theta - (big_cap_total - cap)
        if theta_t <= 0 or pl.block_starts is None:
            full.append((idf, pl))              # nothing prunable
            continue
        sel = np.flatnonzero(idf * pl.block_max >= theta_t)
        if sel.size == 0:
            partial.append((idf, pl, _EMPTY_U64))
            continue
        starts = pl.block_starts
        sizes = np.diff(np.concatenate((starts, [pl.doc_ids.size])))
        lens = sizes[sel]
        idx = (np.repeat(starts[sel], lens)
               + (np.arange(int(lens.sum()), dtype=np.int64)
                  - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])),
                              lens)))
        partial.append((idf, pl, pl.doc_ids[idx]))

    # Pass 3 — one unique over all candidate docs; FULL lists scatter their
    # contributions through the unique-inverse (no probe), PARTIAL lists
    # probe their whole list into the candidate set (covers both their
    # surviving postings and hits on candidates other terms introduced).
    doc_arrs = [pl.doc_ids for _, pl in full] + [d for _, _, d in partial]
    if not doc_arrs:
        return _EMPTY_U64, _EMPTY_F64
    all_docs = np.concatenate(doc_arrs)
    acc_docs, inv = np.unique(all_docs, return_inverse=True)
    acc_scores = np.zeros(acc_docs.size, dtype=np.float64)
    off = 0
    for idf, pl in full:
        n_t = pl.doc_ids.size
        np.add.at(acc_scores, inv[off:off + n_t],
                  idf * bm25_tf(pl.tfs, pl.dls, avgdl, params))
        off += n_t
    for idf, pl, _ in partial:
        j = np.searchsorted(pl.doc_ids, acc_docs)
        j_c = np.minimum(j, pl.doc_ids.size - 1)
        hit = pl.doc_ids[j_c] == acc_docs
        if hit.any():
            acc_scores[hit] += idf * bm25_tf(
                pl.tfs[j_c[hit]], pl.dls[j_c[hit]], avgdl, params)
    return top_k(acc_docs, acc_scores, k)


def regular_blockmax(engine, terms, k: int = 10):
    """Engine-level disjunctive top-k via the block-max path (drop-in for
    SearchEngine.regular)."""
    idfs = engine._idfs(terms)
    return topk_blockmax(engine.reader, terms, idfs, engine.reader.avgdl,
                         engine.params, k)
