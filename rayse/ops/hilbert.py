"""Hilbert-curve global ordering of the events log — the
locality-preserving layout sibling of `rayse/ops/zorder.py` (the
Hilbert curve has strictly better worst-case locality than Morton
order: adjacent curve positions are ALWAYS adjacent cells, no
quadrant-boundary jumps).

Same domain and same ranking machinery as `zorder_rank`: key =
xy2d(user_id, hour-of-epoch) over HB_BITS-bit coordinates, then the
range-histogram + range-keyed-exchange exact global rank
(`curriculum._ranked_by_key`). The xy2d conversion is the classic
iterative quadrant-rotation walk (Wikipedia's Hilbert-curve xy2d, a
public-domain staple), fully vectorized: one numpy pass per bit level,
no Python row loop.

Oracle: the SAME walk unrolled into HB_BITS chained CTEs (rx/ry via
`(v // s) % 2`, the ry=0 invert-and-swap rotation as CASE arms,
inversion against N-1) + row_number() — bit-exact integers.

Reference relationship: none; extends the physical-layout family
(`zorder.py`, `layout_compare`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HB_BITS = 20                 # per-dimension bits (hour-of-epoch needs 19)
HB_N = 1 << HB_BITS
HB_SHIFT = 30                # d-key range-bucket width (histogram knob)
_HOUR_US = 3_600_000_000


def hilbert_d(x: np.ndarray, y: np.ndarray,
              bits: int = HB_BITS) -> np.ndarray:
    """Vectorized xy2d: Hilbert-curve position of (x, y) on the
    2^bits x 2^bits grid."""
    n = 1 << bits
    x = x.astype(np.int64) & (n - 1)
    y = y.astype(np.int64) & (n - 1)
    d = np.zeros(x.shape, np.int64)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotation: if ry == 0 (invert when rx == 1, then swap)
        swap = ry == 0
        inv = swap & (rx == 1)
        xi = np.where(inv, n - 1 - x, x)
        yi = np.where(inv, n - 1 - y, y)
        x = np.where(swap, yi, xi)
        y = np.where(swap, xi, yi)
        s >>= 1
    return d


def hilbert_rank(sf_dir: str):
    """(event_id, rank): exact global Hilbert-curve position of every
    event, key = xy2d(user_id, hour-of-epoch), event_id tie-break —
    DuckDB hash-matched against the unrolled-CTE walk."""
    import ray.data as rd

    from .curriculum import _ranked_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def hkey(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        if u.size and u.min() < 0:
            raise ValueError("user_id must be non-negative")
        h = hilbert_d(u, ts // _HOUR_US)
        return pa.table({"doc_id": batch["event_id"],
                         "hkey": pa.array(h, pa.int64())})

    ranked = _ranked_by_key(
        ds.map_batches(hkey, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", shift=HB_SHIFT)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["event_id", "rank"])

    return ranked.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)


def hilbert_rank_sql() -> str:
    mask = HB_N - 1
    ctes = [f"""
WITH hb_0 AS (
  SELECT event_id,
         CAST(user_id AS BIGINT) & {mask} AS x,
         (epoch_us(ts) // {_HOUR_US}) & {mask} AS y,
         CAST(0 AS BIGINT) AS d
  FROM events)"""]
    prev = "hb_0"
    lvl = 1
    s = HB_N >> 1
    while s > 0:
        ctes.append(f""",
hb_{lvl} AS (
  SELECT event_id,
         CASE WHEN (y // {s}) % 2 = 0 THEN
           CASE WHEN (x // {s}) % 2 = 1 THEN {HB_N - 1} - y ELSE y END
         ELSE x END AS x,
         CASE WHEN (y // {s}) % 2 = 0 THEN
           CASE WHEN (x // {s}) % 2 = 1 THEN {HB_N - 1} - x ELSE x END
         ELSE y END AS y,
         d + CAST({s * s} AS BIGINT)
               * xor(3 * ((x // {s}) % 2), (y // {s}) % 2) AS d
  FROM {prev})""")
        prev = f"hb_{lvl}"
        lvl += 1
        s >>= 1
    ctes.append(f"""
SELECT event_id,
       CAST(row_number() OVER (ORDER BY d, event_id) AS BIGINT) AS rank
FROM {prev}""")
    return "".join(ctes)
