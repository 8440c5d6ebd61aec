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
