"""Deterministic hash-based sampling — reproducible corpus downsampling
for training pipelines (engine-independent: the same rows are kept by any
implementation of the hash, so re-runs, resumes, and A/B slices agree).

- ``hash_sample``: keep a document iff ``splitmix(doc_id) % 100 < rate``.
- ``stratified_sample``: per-stratum rates (e.g. keep 50% of English, 10%
  of everything else) — the quota-balancing step of a data-mixing recipe.

The hash is the 64-bit splitmix finalizer already used by the exchange
partitioner (``rayse.ops.exchange._mix``) — fully vectorized in numpy and
exactly expressible in SQL as HUGEINT arithmetic (xor + floor-division
shifts + multiply mod 2^64), so both operators run under DuckDB oracles.

Scale shape: a pure ``map_batches`` filter — no shuffle, no state, no
driver involvement; selection decisions are row-local.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import _mix

_DEFAULT_RATES = {"en": 50}
_DEFAULT_OTHER = 10


def _keep_mask(doc_ids: np.ndarray, rates: np.ndarray) -> np.ndarray:
    """rates[i] in [0,100]; keep iff mix(doc_id) % 100 < rate.

    doc_ids must be non-negative: numpy would wrap a negative int64 to
    2^64+k while the SQL oracle hashes the signed value (HUGEINT '//' is
    not '>>' below zero), silently breaking the engine-independence
    contract — refuse loudly instead."""
    if doc_ids.size and doc_ids.min() < 0:
        raise ValueError("hash sampling requires non-negative doc_id "
                         "(SQL-parity precondition)")
    h = _mix(doc_ids.astype(np.uint64))
    return (h % np.uint64(100)).astype(np.int64) < rates


def hash_sample_batch(batch: pa.Table, rate: int) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    keep = _keep_mask(ids, np.full(ids.size, rate, dtype=np.int64))
    return batch.filter(pa.array(keep))


def stratified_sample_batch(batch: pa.Table, rates: dict,
                            other_rate: int, by: str) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    strata = batch[by].to_pylist()
    r = np.fromiter((rates.get(s, other_rate) for s in strata),
                    dtype=np.int64, count=len(strata))
    return batch.filter(pa.array(_keep_mask(ids, r)))


def hash_sample(sf_dir: str, rate: int = 20):
    """Uniform deterministic sample of documents -> (doc_id, lang)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    return ds.map_batches(hash_sample_batch, fn_kwargs={"rate": rate},
                          batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(sf_dir: str, rates: dict | None = None,
                      other_rate: int = _DEFAULT_OTHER, by: str = "lang"):
    """Per-stratum deterministic sample -> (doc_id, lang)."""
    import ray.data as rd

    rates = rates if rates is not None else dict(_DEFAULT_RATES)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", by])
    return ds.map_batches(
        stratified_sample_batch,
        fn_kwargs={"rates": rates, "other_rate": other_rate, "by": by},
        batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SQL oracles: splitmix64 finalizer in exact HUGEINT arithmetic.
# For non-negative k, k >> n == k // 2^n; multiply wraps mod 2^64.
# ---------------------------------------------------------------------------

_GOLD = 0x9E3779B97F4A7C15
_M64 = 1 << 64


def _mix_sql(k: str) -> str:
    return f"""(
  SELECT xor(h2, h2 // 2147483648::HUGEINT)
  FROM (SELECT (xor(kk, kk // 1073741824::HUGEINT)
                * {_GOLD}::HUGEINT) % {_M64}::HUGEINT AS h2
        FROM (SELECT CAST({k} AS HUGEINT) AS kk)))"""


def hash_sample_sql(rate: int = 20) -> str:
    return f"""
SELECT doc_id, lang FROM documents
WHERE {_mix_sql("doc_id")} % 100 < {rate}"""


def stratified_sample_sql(rates: dict | None = None,
                          other_rate: int = _DEFAULT_OTHER,
                          by: str = "lang") -> str:
    rates = rates if rates is not None else dict(_DEFAULT_RATES)
    whens = " ".join(f"WHEN '{s}' THEN {r}" for s, r in rates.items())
    return f"""
SELECT doc_id, {by} FROM documents
WHERE {_mix_sql("doc_id")} % 100
      < (CASE {by} {whens} ELSE {other_rate} END)"""


# ---------------------------------------------------------------------------
# Mixture epochs — the UPSAMPLING half of a data-mixing recipe: each
# stratum trains for a fractional number of epochs (e.g. en x 2.5, rest
# x 1). Fractional parts are realized deterministically per document with
# the same splitmix hash: repeats = epochs_pct // 100 plus one more iff
# mix(doc_id) % 100 < epochs_pct % 100, so exactly pct% of the stratum
# gets the extra pass and re-runs agree. Row-local, no shuffle.
# ---------------------------------------------------------------------------

_DEFAULT_EPOCHS_PCT = {"en": 250}     # 2.5 epochs for English
_DEFAULT_OTHER_EPOCHS_PCT = 100       # 1 epoch otherwise


def mixture_epochs_batch(batch: pa.Table, epochs_pct: dict,
                         other_pct: int, by: str) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    if ids.size and ids.min() < 0:
        raise ValueError("mixture epochs require non-negative doc_id "
                         "(SQL-parity precondition)")
    strata = batch[by].to_pylist()
    pct = np.fromiter((epochs_pct.get(s, other_pct) for s in strata),
                      dtype=np.int64, count=len(strata))
    h = (_mix(ids.astype(np.uint64)) % np.uint64(100)).astype(np.int64)
    reps = pct // 100 + (h < pct % 100)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        by: batch[by],
        "n_repeats": pa.array(reps.astype(np.int64), pa.int64()),
    })


def mixture_epochs(sf_dir: str, epochs_pct: dict | None = None,
                   other_pct: int = _DEFAULT_OTHER_EPOCHS_PCT,
                   by: str = "lang"):
    """Per-document repeat counts under a fractional-epochs mixing plan
    -> (doc_id, lang, n_repeats); docs with 0 repeats are retained as
    rows (n_repeats = 0) so the plan is auditable."""
    import ray.data as rd

    epochs_pct = (epochs_pct if epochs_pct is not None
                  else dict(_DEFAULT_EPOCHS_PCT))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", by])
    return ds.map_batches(
        mixture_epochs_batch,
        fn_kwargs={"epochs_pct": epochs_pct, "other_pct": other_pct,
                   "by": by},
        batch_format="pyarrow", zero_copy_batch=True)


def mixture_epochs_sql(epochs_pct: dict | None = None,
                       other_pct: int = _DEFAULT_OTHER_EPOCHS_PCT,
                       by: str = "lang") -> str:
    epochs_pct = (epochs_pct if epochs_pct is not None
                  else dict(_DEFAULT_EPOCHS_PCT))
    whens = " ".join(f"WHEN '{s}' THEN {p}" for s, p in epochs_pct.items())
    pct = f"(CASE {by} {whens} ELSE {other_pct} END)"
    return f"""
SELECT doc_id, {by},
       CAST({pct} // 100
            + (CASE WHEN {_mix_sql("doc_id")} % 100 < {pct} % 100
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_repeats
FROM documents"""


def _quota_partial(batch: pa.Table, n: int, by: str) -> pa.Table:
    """Per-batch partial: for each stratum, the n smallest (hash, doc_id)
    pairs. min-of-mins is associative, so partials combine exactly."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    if ids.size and ids.min() < 0:
        raise ValueError("quota sampling requires non-negative doc_id")
    strata = np.asarray(batch[by].to_pylist())
    h = _mix(ids.astype(np.uint64))
    keep = np.zeros(ids.size, dtype=bool)
    for s in np.unique(strata):
        m = np.flatnonzero(strata == s)
        if m.size > n:
            order = np.lexsort((ids[m], h[m]))[:n]
            m = m[order]
        keep[m] = True
    # stamp an int key for the exchange (FNV hash of the stratum string)
    from .textstats import fnv64_slices, word_bounds
    uniq = np.unique(strata)
    buf, _, ws, we, _ = word_bounds([" ".join(uniq.tolist())])
    uh = fnv64_slices(buf, ws, we - ws)
    lut = dict(zip(uniq.tolist(), uh.tolist()))
    sh = np.fromiter((lut[s] for s in strata.tolist()), dtype=np.uint64,
                     count=len(strata))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        by: pa.array(strata.tolist(), pa.string()),
        "shash": pa.array(sh, pa.uint64()),
        "hkey": pa.array(h, pa.uint64()),
    })
    return t.filter(pa.array(keep))


def _quota_final(tbl: pa.Table, n: int, by: str) -> pa.Table:
    """Exchange reducer: exact per-stratum n smallest (hash, doc_id)."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         by: pa.array([], pa.string())})
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    h = tbl["hkey"].to_numpy(zero_copy_only=False)
    strata = np.asarray(tbl[by].to_pylist())
    keep = np.zeros(ids.size, dtype=bool)
    for s in np.unique(strata):
        m = np.flatnonzero(strata == s)
        if m.size > n:
            order = np.lexsort((ids[m], h[m]))[:n]
            m = m[order]
        keep[m] = True
    out = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        by: pa.array(strata.tolist(), pa.string()),
    })
    return out.filter(pa.array(keep))


def quota_sample(sf_dir: str, n: int = 20, by: str = "lang"):
    """EXACT fixed-size per-stratum sample (eval-set carving): the n
    documents with the smallest splitmix hash in each stratum —
    deterministic, engine-independent, and exact-N (unlike rate
    sampling's binomial counts). Per-batch bounded partials (<= strata*n
    rows each) flow through one exchange keyed by stratum hash; nothing
    corpus-sized leaves the batches."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", by])
    parts = ds.map_batches(_quota_partial, fn_kwargs={"n": n, "by": by},
                           batch_format="pyarrow", zero_copy_batch=True)
    return exchange_by_key(parts, "shash", _quota_final,
                           proc_kwargs={"n": n, "by": by}, n_parts=32)


def quota_sample_sql(n: int = 20, by: str = "lang") -> str:
    """Oracle: row_number over (stratum, splitmix hash, doc_id) <= n."""
    return f"""
SELECT doc_id, {by} FROM (
  SELECT doc_id, {by},
         row_number() OVER (PARTITION BY {by}
                            ORDER BY {_mix_sql("doc_id")}, doc_id) AS rn
  FROM documents)
WHERE rn <= {n}"""


# ---------------------------------------------------------------------------
# DSIR importance weighting (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every document by
# how much more likely its hashed-unigram bag is under a TARGET corpus
# than under the raw corpus —
#     log w(x) = sum_tokens [ ln((ct[b]+1)/(cr[b]+1)) + ln((Nr+B)/(Nt+B)) ]
# with b = fnv64(token) % B hashed feature buckets, ct/cr the
# target/raw bucket counts (add-1 smoothed), Nt/Nr the corpora token
# totals. Selection = keep the highest-weight docs (compose with
# ``hash_sample`` for Gumbel-free deterministic resampling).
#
# INTEGER-EXACT contract (the unigram_nll recipe): each bucket's log
# ratio quantizes ONCE to q[b] = floor((ln(..) + ln(..)) * 1e9); a
# document's weight is an int64 SUM of per-token q values — order
# independent, so Ray and DuckDB agree bit-exactly.
#
# Scale shape: per-batch vectorized token hashing (word_bounds +
# fnv64_slices) -> per-batch bincount partials -> ONE bounded
# groupby("bucket") whose output is <= B rows (B = 4096 — independent of
# corpus size); the q-map broadcasts as a B-float array; scoring is a
# row-local map (np.take + reduceat). The target membership predicate
# here is the deterministic doc_id % 5 == 0 slice (a stand-in for a
# curated target table at production scale — swap the mask fn).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096
DSIR_TARGET_MOD = 5
DSIR_TARGET_REM = 0


def _dsir_token_buckets(texts: list, n_buckets: int):
    """(bucket array of EVERY token, per-doc token-count array)."""
    from .textstats import word_bounds

    buf, _doc_off, w_starts, w_ends, w_cum = word_bounds(texts)
    from .textstats import fnv64_slices

    h = fnv64_slices(buf, w_starts, w_ends - w_starts)
    return (h % np.uint64(n_buckets)).astype(np.int64), np.diff(w_cum)


def dsir_weights(sf_dir: str, n_buckets: int = DSIR_BUCKETS,
                 target_mod: int = DSIR_TARGET_MOD,
                 target_rem: int = DSIR_TARGET_REM):
    """(doc_id, w_q): quantized DSIR log importance weight per document."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        if not texts:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "ct": pa.array([], pa.int64()),
                             "cr": pa.array([], pa.int64())})
        b, n_tok = _dsir_token_buckets(texts, n_buckets)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        tgt_doc = (doc % target_mod) == target_rem
        tgt_tok = np.repeat(tgt_doc, n_tok)
        cr = np.bincount(b, minlength=n_buckets)
        ct = np.bincount(b[tgt_tok], minlength=n_buckets)
        nz = np.flatnonzero(cr)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "ct": pa.array(ct[nz], pa.int64()),
                         "cr": pa.array(cr[nz], pa.int64())})

    import ray.data as rd2

    agg = (ds.map_batches(partials, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bucket")
           .aggregate(rd2.aggregate.Sum("ct"), rd2.aggregate.Sum("cr"))
           .to_pandas())                      # <= n_buckets rows, bounded
    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    ct[agg["bucket"].to_numpy()] = agg["sum(ct)"].to_numpy()
    cr[agg["bucket"].to_numpy()] = agg["sum(cr)"].to_numpy()
    nt, nr = int(ct.sum()), int(cr.sum())
    norm = np.log(float(nr + n_buckets) / float(nt + n_buckets))
    q = np.floor((np.log((ct + 1).astype(np.float64)
                         / (cr + 1).astype(np.float64)) + norm)
                 * 1e9).astype(np.int64)
    ref = ray.put(q)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(ref)
        texts = batch["text"].to_pylist()
        if not texts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "w_q": pa.array([], pa.int64())})
        b, n_tok = _dsir_token_buckets(texts, n_buckets)
        contrib = qv[b]
        starts = np.zeros(n_tok.size, np.int64)
        np.cumsum(n_tok[:-1], out=starts[1:])
        w = np.add.reduceat(contrib, starts) if b.size else \
            np.zeros(n_tok.size, np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "w_q": pa.array(w, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def dsir_weights_sql(n_buckets: int = DSIR_BUCKETS,
                     target_mod: int = DSIR_TARGET_MOD,
                     target_rem: int = DSIR_TARGET_REM) -> str:
    """Oracle for ``dsir_weights``: FNV-1a per DISTINCT word (HUGEINT
    list_reduce, ASCII corpora), bucket counts with the same smoothing,
    the identical two-ln quantization, integer per-doc sums."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
dw AS (SELECT DISTINCT w FROM tok),
wb AS (
  SELECT w,
         CAST(list_reduce(
            list_prepend(14695981039346656037::HUGEINT,
                         [ascii(c)::HUGEINT FOR c IN string_split(w, '')]),
            (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                      % 18446744073709551616::HUGEINT)
              % {n_buckets} AS BIGINT) AS bucket
  FROM dw),
tokb AS (SELECT t.doc_id, wb.bucket FROM tok t JOIN wb USING (w)),
cr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM tokb
       GROUP BY bucket),
ctt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM tokb
        WHERE doc_id % {target_mod} = {target_rem} GROUP BY bucket),
tot AS (SELECT (SELECT count(*) FROM tokb) AS nr,
               (SELECT count(*) FROM tokb
                WHERE doc_id % {target_mod} = {target_rem}) AS nt),
q AS (
  SELECT cr.bucket,
         CAST(floor((ln((COALESCE(ctt.c, 0) + 1)::DOUBLE
                        / (cr.c + 1)::DOUBLE)
                     + ln((tot.nr + {n_buckets})::DOUBLE
                          / (tot.nt + {n_buckets})::DOUBLE))
                    * 1000000000::DOUBLE) AS BIGINT) AS q
  FROM cr LEFT JOIN ctt USING (bucket) CROSS JOIN tot)
SELECT t.doc_id, CAST(sum(q.q) AS BIGINT) AS w_q
FROM tokb t JOIN q USING (bucket)
GROUP BY t.doc_id"""


# ---------------------------------------------------------------------------
# Frequent-word (occurrence-level) subsampling — the word2vec-style
# corpus rebalancer (Mikolov et al. 2013, threshold form without the
# sqrt term): each OCCURRENCE of word w survives with
# p_keep = min(1, total / (t_den * cf(w))), decided deterministically by
# the splitmix hash of (doc_id, position).
#
# The scale insight: p_keep < 1 only for words with frequency above
# 1/t_den, and there are AT MOST t_den such words in any corpus — so the
# broadcast "hot map" is provably <= t_den entries no matter how large
# the vocabulary grows. Phase 1 (cf aggregation) is the partitioned
# exchange; phase 2 is a row-local map with the tiny hot set. No
# unbounded driver state at any corpus size.
# ---------------------------------------------------------------------------

SUBSAMPLE_T_DEN = 40
_POS_BITS = 20          # position salt width; docs must stay < 2^20 tokens


def _subsample_batch(batch: pa.Table, hot_words: np.ndarray,
                     hot_thr: list) -> pa.Table:
    """Drop hot-word occurrences whose (doc_id, pos) hash clears the
    word's keep threshold; docs losing every token drop entirely."""
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    if batch.num_rows == 0:
        return empty
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    if ids.size and (ids.min() < 0 or ids.max() >= (1 << (63 - _POS_BITS))):
        raise ValueError("subsample requires 0 <= doc_id < 2^43 "
                         "(SQL-parity precondition)")
    toks = [(t or "").split(" ") for t in batch["text"].to_pylist()]
    counts = np.fromiter((len(x) for x in toks), np.int64, len(toks))
    if counts.max() >= (1 << _POS_BITS):
        raise ValueError("subsample requires < 2^20 tokens per doc")
    flat = np.concatenate([np.asarray(x, dtype=object) for x in toks])
    starts = np.zeros(counts.size, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, counts)
    keep = np.ones(flat.size, dtype=bool)
    if hot_words.size:
        uf, inv = np.unique(flat, return_inverse=True)
        slot = np.searchsorted(hot_words, uf)
        slot_c = np.minimum(slot, hot_words.size - 1)
        is_hot = (hot_words[slot_c] == uf)[inv]
        if is_hot.any():
            docrep = np.repeat(ids, counts)
            key = ((docrep.astype(np.uint64) << np.uint64(_POS_BITS))
                   + pos.astype(np.uint64))
            h = _mix(key[is_hot])
            # thresholds are python ints (may exceed int64): compare
            # per hot word via its exact uint64-clamped threshold
            thr_u64 = np.fromiter(
                (min(t, (1 << 64) - 1) for t in hot_thr),
                np.uint64, len(hot_thr))
            tok_thr = thr_u64[slot_c[inv][is_hot]]
            keep[is_hot] = h < tok_thr
    out_ids, out_txt = [], []
    kc = np.add.reduceat(keep.astype(np.int64), np.maximum(starts, 0)) \
        if flat.size else np.zeros(0, np.int64)
    ends = starts + counts
    for i in range(counts.size):
        if kc[i] == 0:
            continue
        sl = keep[starts[i]:ends[i]]
        out_ids.append(int(ids[i]))
        out_txt.append(" ".join(
            np.asarray(toks[i], dtype=object)[sl].tolist()))
    return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                     "text": pa.array(out_txt, pa.string())})


def subsample_frequent(sf_dir: str, t_den: int = SUBSAMPLE_T_DEN):
    """(doc_id, text) with frequent-word occurrences deterministically
    subsampled; docs with no surviving token are dropped."""
    import ray
    import ray.data as rd

    from .textstats import _unigram_cf

    cf_ds = _unigram_cf(sf_dir)
    total = int(cf_ds.sum("cf"))

    def hot_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater(pc.multiply(b["cf"], t_den), total))

    hot = cf_ds.map_batches(hot_only, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    order = np.argsort(hot["word"].to_numpy(), kind="stable")
    hot_words = hot["word"].to_numpy()[order]
    # exact integer threshold: keep iff hash < (total << 64)//(cf*t_den)
    hot_thr = [(total << 64) // (int(c) * t_den)
               for c in hot["cf"].to_numpy()[order]]
    ref = ray.put((hot_words, hot_thr))

    def apply(batch: pa.Table) -> pa.Table:
        hw, ht = ray.get(ref)
        return _subsample_batch(batch, hw, ht)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)


def subsample_frequent_sql(t_den: int = SUBSAMPLE_T_DEN) -> str:
    """Oracle for ``subsample_frequent``: token explode with positions,
    hot-word LEFT JOIN, the same splitmix-vs-threshold test in HUGEINT,
    string_agg reassembly in position order."""
    key = f"(f.doc_id * {1 << _POS_BITS} + f.j)"
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
flat AS (
  SELECT doc_id, unnest(range(len(ws))) AS j,
         unnest(ws) AS tok
  FROM w),
cf AS (SELECT tok, CAST(count(*) AS HUGEINT) AS cf FROM flat GROUP BY tok),
tot AS (SELECT CAST(count(*) AS HUGEINT) AS total FROM flat),
hot AS (
  SELECT tok, cf FROM cf CROSS JOIN tot
  WHERE cf * {t_den} > total),
kept AS (
  SELECT f.doc_id, f.j, f.tok
  FROM flat f LEFT JOIN hot h USING (tok) CROSS JOIN tot
  WHERE h.tok IS NULL
     OR {_mix_sql(key)}
        < (tot.total * 18446744073709551616::HUGEINT) // (h.cf * {t_den}))
SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS text
FROM kept GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# Bottom-k sampling — EXACT-size global sample (the order-statistics
# sibling of rate-based hash_sample; eval-set carving wants exactly k
# rows, not a binomial count). Keep the k documents with the smallest
# (splitmix(doc_id), doc_id) pair: deterministic, engine-independent,
# and mergeable — per-batch bottom-k partials combine exactly (the
# global bottom-k of bottom-k's is the global bottom-k), so nothing
# corpus-sized ever leaves a batch. One single-partition exchange holds
# only n_batches x k rows.
# ---------------------------------------------------------------------------

def _bottomk_partial(batch: pa.Table, k: int) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    if ids.size and ids.min() < 0:
        raise ValueError("bottom-k sampling requires non-negative doc_id")
    lang = batch["lang"]
    h = _mix(ids.astype(np.uint64))
    if ids.size > k:
        sel = np.lexsort((ids, h))[:k]
        ids, lang, h = ids[sel], lang.take(pa.array(sel)), h[sel]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": lang,
        "hkey": pa.array(h, pa.uint64()),
        "one": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
    })


def _bottomk_final(tbl: pa.Table, k: int) -> pa.Table:
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "lang": pa.array([], pa.string())})
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    h = tbl["hkey"].to_numpy(zero_copy_only=False)
    sel = np.lexsort((ids, h))[:k]
    return pa.table({
        "doc_id": pa.array(ids[sel], pa.int64()),
        "lang": tbl["lang"].take(pa.array(sel)),
    })


def bottomk_sample(sf_dir: str, k: int = 64):
    """Exactly-k global sample by splitmix order statistics ->
    (doc_id, lang)."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    parts = ds.map_batches(_bottomk_partial, fn_kwargs={"k": k},
                           batch_format="pyarrow", zero_copy_batch=True)
    return exchange_by_key(parts, "one", _bottomk_final,
                           proc_kwargs={"k": k}, n_parts=1)


def bottomk_sample_sql(k: int = 64) -> str:
    """Oracle: the k smallest (splitmix(doc_id), doc_id) pairs."""
    return f"""
SELECT doc_id, lang FROM documents
ORDER BY {_mix_sql("doc_id")}, doc_id
LIMIT {k}"""


# -- Weighted priority sampling ----------------------------------------------

def _weighted_partial(batch: pa.Table, k: int) -> pa.Table:
    """Per-batch bottom-k by weighted priority = splitmix(doc_id) //
    n_chars: a heavier document divides its uniform hash by a larger
    weight, so its priority shrinks and it is proportionally likelier
    to make the global bottom-k — the integer analog of
    Efraimidis-Spirakis exponent keys (u^(1/w)), chosen so both engines
    compute the identical pure-integer order statistic."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    if ids.size and ids.min() < 0:
        raise ValueError("weighted sampling requires non-negative doc_id")
    w = batch["n_chars"].to_numpy(zero_copy_only=False)
    if ids.size and w.min() <= 0:
        raise ValueError("weights must be positive")
    lang = batch["lang"]
    pr = (_mix(ids.astype(np.uint64)) // w.astype(np.uint64))
    if ids.size > k:
        sel = np.lexsort((ids, pr))[:k]
        ids, lang, pr = ids[sel], lang.take(pa.array(sel)), pr[sel]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "lang": lang,
        "prio": pa.array(pr, pa.uint64()),
        "one": pa.array(np.zeros(len(ids), np.int64), pa.int64()),
    })


def _weighted_final(tbl: pa.Table, k: int) -> pa.Table:
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "lang": pa.array([], pa.string())})
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    pr = tbl["prio"].to_numpy(zero_copy_only=False)
    sel = np.lexsort((ids, pr))[:k]
    return pa.table({
        "doc_id": pa.array(ids[sel], pa.int64()),
        "lang": tbl["lang"].take(pa.array(sel)),
    })


def weighted_sample(sf_dir: str, k: int = 64):
    """Exactly-k WEIGHTED global sample (weight = n_chars, the
    length-proportional pick a token-budgeted eval carve wants) ->
    (doc_id, lang); mergeable per-batch bottom-k partials + one
    single-partition merge, same shape as `bottomk_sample`."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    parts = ds.map_batches(_weighted_partial, fn_kwargs={"k": k},
                           batch_format="pyarrow", zero_copy_batch=True)
    return exchange_by_key(parts, "one", _weighted_final,
                           proc_kwargs={"k": k}, n_parts=1)


def weighted_sample_sql(k: int = 64) -> str:
    """Oracle: the k smallest (splitmix(doc_id) // n_chars, doc_id)."""
    return f"""
SELECT doc_id, lang FROM documents
ORDER BY {_mix_sql("doc_id")} // CAST(n_chars AS HUGEINT), doc_id
LIMIT {k}"""


# -- Temperature-scaled source mixing weights ---------------------------------

MIX_SCALE = 1_000_000


def source_mix_weights(sf_dir: str) -> pa.Table:
    """(source, n_tokens, w_ppm): temperature-scaled multinomial mixing
    weights across sources, w_i ∝ n_i^(1/2) — the standard multilingual
    / multi-source rebalancing rule (alpha-sampling at T=2) that
    upweights small sources relative to proportional sampling. The
    exponent is computed with EXACT integer sqrt (math.isqrt; the SQL
    mirror corrects floor(sqrt(double)) with a ±1 integer check), so
    both engines agree bit-for-bit: w_ppm = isqrt(n_i) * 1e6 //
    Σ_j isqrt(n_j).

    Scale shape: per-batch (source, token-count) partials -> one small
    groupby (sources-bounded) -> driver isqrt + normalization on the
    output-sized table."""
    import math

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        texts = batch["text"].to_pylist()
        ntok = np.array([len((t or "").split(" ")) for t in texts],
                        np.int64)
        u, inv = np.unique(src, return_inverse=True)
        s = np.zeros(u.size, np.int64)
        np.add.at(s, inv, ntok)
        return pa.table({"source": pa.array(u.tolist(), pa.string()),
                         "n": pa.array(s, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("source").sum("n").to_pandas()
           .sort_values("source").reset_index(drop=True))
    n = agg["sum(n)"].to_numpy().astype(np.int64)
    r = np.array([math.isqrt(int(x)) for x in n], np.int64)
    tot = int(r.sum())
    w = (r * MIX_SCALE) // max(tot, 1)
    return pa.table({
        "source": pa.array(agg["source"].tolist(), pa.string()),
        "n_tokens": pa.array(n, pa.int64()),
        "w_ppm": pa.array(w, pa.int64())})


def _isqrt_sql(n: str) -> str:
    """Exact integer sqrt of a non-negative BIGINT expression: float
    floor(sqrt()) corrected by a ±1 integer check."""
    return f"""(
  SELECT CASE WHEN (x0 + 1) * (x0 + 1) <= v THEN x0 + 1
              WHEN x0 * x0 > v THEN x0 - 1
              ELSE x0 END
  FROM (SELECT CAST({n} AS BIGINT) AS v,
               CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT) AS x0))"""


def source_mix_weights_sql() -> str:
    return f"""
WITH mx_n AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
mx_r AS (SELECT source, n_tokens,
                {_isqrt_sql('n_tokens')} AS r
         FROM mx_n),
mx_t AS (SELECT CAST(sum(r) AS BIGINT) AS tot FROM mx_r)
SELECT source, n_tokens,
       CAST((r * {MIX_SCALE}) // greatest(tot, 1) AS BIGINT) AS w_ppm
FROM mx_r CROSS JOIN mx_t"""


# -- Train/val/test split ------------------------------------------------------

SPLIT_BOUNDS = (80, 90)      # [0,80) train, [80,90) val, [90,100) test


def split_assign(sf_dir: str, bounds: tuple = SPLIT_BOUNDS):
    """(doc_id, split): deterministic 80/10/10 train/val/test assignment
    by splitmix(doc_id) % 100 ranges — the first thing an ML pipeline
    does to a corpus, made engine-independent the same way as
    `hash_sample` (re-runs, resumes and different engines agree).
    Row-local, no shuffle."""
    import ray.data as rd

    lo, hi = bounds
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size and ids.min() < 0:
            raise ValueError("split requires non-negative doc_id")
        h = (_mix(ids.astype(np.uint64)) % np.uint64(100)).astype(np.int64)
        split = np.where(h < lo, "train",
                         np.where(h < hi, "val", "test"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "split": pa.array(split.tolist(), pa.string())})

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def split_assign_sql(bounds: tuple = SPLIT_BOUNDS) -> str:
    lo, hi = bounds
    return f"""
SELECT doc_id,
       CASE WHEN {_mix_sql('doc_id')} % 100 < {lo} THEN 'train'
            WHEN {_mix_sql('doc_id')} % 100 < {hi} THEN 'val'
            ELSE 'test' END AS split
FROM documents"""
