"""Curriculum ordering: exact global ranks over the whole corpus.

``curriculum_order`` assigns every document its exact position in the
quality-sorted corpus (ascending unigram NLL = best first, doc_id
tie-break) — the deterministic data-ordering primitive behind
curriculum schedules and reproducible "sorted shuffles".  This is the
zip-with-index operation Ray Data has no native exact operator for.

Scale shape (no global sort, no driver corpus state):

1. The quality scores come from the hash-green distributed
   ``unigram_nll`` pipeline.
2. A per-batch histogram over coarse key ranges ``rb = nll_q >>
   RANK_SHIFT`` reduces the stream to (range, count) partials; the
   driver folds ONLY this bounded table (cardinality <= value-range /
   2^RANK_SHIFT, a knob independent of corpus size) into exclusive
   prefix offsets.
3. ONE exchange keyed by ``rb`` co-locates each range; the partition
   task sorts its ranges locally by (nll_q, doc_id) and emits
   ``rank = offset[rb] + local position`` — exact, and each partition
   holds ~corpus/2^(range-spread) rows, tunable via RANK_SHIFT.

The same machinery yields a deterministic global SHUFFLE by feeding a
hash as the key: ``shuffle_order`` ranks by (splitmix64(doc_id),
doc_id) — reproducible epoch ordering with no RNG state.

Oracle: ``row_number() OVER (ORDER BY key, doc_id)`` — bit-exact.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

RANK_SHIFT = 20          # nll-scale keys (~2^25): tens of ranges
SHUFFLE_SHIFT = 51       # 63-bit uniform hash keys: 4096 ranges


def _range_partition(tbl: pa.Table, rbs=None, starts=None,
                     key_col: str = "nll_q",
                     shift: int = RANK_SHIFT) -> pa.Table:
    """All rows of this partition's key ranges -> (doc_id, rank).
    ``rbs``/``starts`` are the sorted range ids and their exclusive
    global prefix offsets (1-based ranks start at offset + 1)."""
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    key = tbl[key_col].to_numpy(zero_copy_only=False)
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, key))
    k_s, d_s = key[order], doc[order]
    rb = (k_s.astype(np.uint64) >> np.uint64(shift)).astype(np.int64)
    new = np.empty(rb.size, dtype=bool)
    new[0] = True
    new[1:] = rb[1:] != rb[:-1]
    seg_starts = np.flatnonzero(new)
    local = np.arange(rb.size, dtype=np.int64) - \
        np.repeat(seg_starts, np.diff(np.append(seg_starts, rb.size)))
    rbs = np.asarray(rbs, np.int64)
    starts = np.asarray(starts, np.int64)
    off = starts[np.searchsorted(rbs, rb)]
    return pa.table({"doc_id": pa.array(d_s, pa.int64()),
                     "rank": pa.array(off + local + 1, pa.int64())})


def _ranked_by_key(scored_ds, key_col: str, shift: int = RANK_SHIFT):
    """(doc_id, key) Dataset -> (doc_id, rank) via histogram offsets +
    one range-keyed exchange."""
    import ray

    from .exchange import exchange_by_key

    def rb_hist(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        if k.size and k.min() < 0:
            raise ValueError(f"{key_col} must be non-negative "
                             "(range-bucket precondition)")
        u, c = np.unique(k.astype(np.uint64) >> np.uint64(shift),
                         return_counts=True)
        return pa.table({"rb": pa.array(u.astype(np.int64), pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    hist = (scored_ds.map_batches(rb_hist, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby("rb").sum("c").to_pandas())      # range-bounded
    hist = hist.sort_values("rb")
    rbs = hist["rb"].to_numpy().astype(np.int64)
    counts = hist["sum(c)"].to_numpy().astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))

    def stamp_rb(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        rb = (k.astype(np.uint64) >> np.uint64(shift)).astype(np.int64)
        return batch.append_column("rb", pa.array(rb, pa.int64()))

    stamped = scored_ds.map_batches(stamp_rb, batch_format="pyarrow",
                                    zero_copy_batch=True)
    return exchange_by_key(
        stamped, "rb", _range_partition,
        proc_kwargs={"rbs": rbs, "starts": starts, "key_col": key_col,
                     "shift": shift})


def curriculum_order(sf_dir: str):
    """(doc_id, rank): exact global curriculum position, best (lowest
    unigram NLL) first, doc_id tie-break."""
    from .textstats import unigram_nll

    return _ranked_by_key(unigram_nll(sf_dir), "nll_q")


def shuffle_order(sf_dir: str):
    """(doc_id, rank): deterministic global shuffle — exact rank by
    (splitmix64(doc_id), doc_id); reproducible without RNG state."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from .sampling import _mix

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def key(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        if d.size and d.min() < 0:
            raise ValueError("doc_id must be non-negative")
        # int64-safe: drop the top bit (uniformity is all a shuffle
        # key needs; the SQL side applies the same mask)
        h = (_mix(d.astype(np.uint64))
             & np.uint64((1 << 63) - 1)).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "hkey": pa.array(h, pa.int64())})

    return _ranked_by_key(
        ds.map_batches(key, batch_format="pyarrow", zero_copy_batch=True),
        "hkey", shift=SHUFFLE_SHIFT)


def curriculum_order_sql() -> str:
    from .textstats import unigram_nll_sql

    return f"""
WITH nll AS ({unigram_nll_sql()})
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY nll_q, doc_id) AS BIGINT) AS rank
FROM nll"""


def shuffle_order_sql() -> str:
    from .sampling import _mix_sql

    return f"""
WITH h AS (
  SELECT doc_id,
         {_mix_sql('doc_id')} % 9223372036854775808::HUGEINT AS hkey
  FROM documents)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY hkey, doc_id) AS BIGINT) AS rank
FROM h"""
