"""Z-order (Morton-curve) data layout: exact multi-dimensional
clustering rank over the events log.

The data-layout primitive behind OPTIMIZE ZORDER in lakehouse table
formats: interleaving the bits of two clustering dimensions — here
``user_id`` and the event's hour-of-epoch — produces a 1-D key whose
contiguous ranges are 2-D locality blocks, so a subsequent
range-partitioned rewrite lets scans prune on EITHER column. The
output is each event's exact position in the z-ordered corpus (the
write order a layout pass would use), computed with the same bounded
range-histogram + one-exchange machinery as `curriculum_order` — no
global sort, no driver corpus state.

Both dimensions are masked to 31 bits (the interleaved key stays a
non-negative int64); hour-of-epoch is ~2^19 for current timestamps, so
the key's spread — and with it the driver-folded histogram cardinality,
bounded by distinct(z >> Z_SHIFT) — is governed by the user-id spread.
Z_SHIFT is the knob: raise it to keep the histogram small when the
dimensions widen.

Reference relationship: the reference stores postings in PostgreSQL and
has no layout control at all; this is a beyond-reference operator from
the large-scale-pipeline family (SURVEY §2.7's data-organization arm,
sibling of `curriculum_order`/`shuffle_order`).

Oracle: the identical bit-interleave in SQL (UNNEST(range(31)) bit
gather, exact integers) + row_number() — bit-exact.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

Z_BITS = 31                  # per-dimension bits kept
Z_SHIFT = 28                 # z-key range-bucket width (histogram knob)
_HOUR_US = 3_600_000_000


def interleave31(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton-interleave the low 31 bits of x (even bit positions) and
    y (odd positions) -> non-negative int64; vectorized, 31 constant
    iterations regardless of row count."""
    x = x.astype(np.uint64) & np.uint64((1 << Z_BITS) - 1)
    y = y.astype(np.uint64) & np.uint64((1 << Z_BITS) - 1)
    z = np.zeros(x.shape, np.uint64)
    for i in range(Z_BITS):
        bi = np.uint64(i)
        z |= ((x >> bi) & np.uint64(1)) << np.uint64(2 * i)
        z |= ((y >> bi) & np.uint64(1)) << np.uint64(2 * i + 1)
    return z.astype(np.int64)


def zorder_rank(sf_dir: str):
    """(event_id, rank): exact global z-order position of every event,
    key = interleave31(user_id, hour-of-epoch), event_id tie-break."""
    import ray.data as rd

    from .curriculum import _ranked_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def zkey(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        if u.size and u.min() < 0:
            raise ValueError("user_id must be non-negative")
        z = interleave31(u, ts // _HOUR_US)
        return pa.table({"doc_id": batch["event_id"],
                         "zkey": pa.array(z, pa.int64())})

    ranked = _ranked_by_key(
        ds.map_batches(zkey, batch_format="pyarrow", zero_copy_batch=True),
        "zkey", shift=Z_SHIFT)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["event_id", "rank"])

    return ranked.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)


def zorder_rank_sql() -> str:
    return f"""
WITH zo_d AS (
  SELECT event_id,
         CAST(user_id AS BIGINT) & {(1 << Z_BITS) - 1} AS x,
         (epoch_us(ts) // {_HOUR_US}) & {(1 << Z_BITS) - 1} AS y
  FROM events),
zo_k AS (
  SELECT d.event_id,
         CAST(sum((((d.x >> b.i) & 1) << (2 * b.i))
                + (((d.y >> b.i) & 1) << (2 * b.i + 1))) AS BIGINT) AS z
  FROM zo_d d,
       (SELECT CAST(u.i AS INTEGER) AS i
        FROM UNNEST(range({Z_BITS})) u(i)) b
  GROUP BY d.event_id)
SELECT event_id,
       CAST(row_number() OVER (ORDER BY z, event_id) AS BIGINT) AS rank
FROM zo_k"""
