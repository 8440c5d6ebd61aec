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


LAYOUT_BLOCK = 16
LAYOUT_U_LO, LAYOUT_U_HI = 3, 4          # predicate: user_id in [3, 4]


def layout_compare(sf_dir: str) -> pa.Table:
    """(layout, n_blocks, blocks_scanned, rows_scanned, rows_matching):
    the PAYOFF measurement for ``zorder_rank`` — the same zone-map scan
    (16-row blocks, per-block user_id min/max, predicate
    user_id BETWEEN 3 AND 4) evaluated under BOTH physical layouts:

    - ``natural``: write order = event_id (time-ish arrival order) —
      a user's rows scatter across blocks, so min/max zone maps prune
      little for a user predicate;
    - ``zorder``: write order = the Morton rank — the curve localizes
      user ranges, so the same zone maps prune most blocks once blocks
      are numerous relative to the curve granularity (at sf0.01:
      263 vs 90 blocks scanned; at toy scale with a handful of blocks
      neither layout prunes — the comparison is the point, not a
      constant factor).

    Distributed shape: the z-layout block id comes from the existing
    exact global rank (`zorder_rank`, no global sort), joined to the
    predicate column through the co-partitioned exchange; both layouts
    then share one (block -> min/max/count/matches) groupby fold and a
    5-number summary — block state never sits on the driver
    (`rayse/ops/integrity.zonemap_prune` contract). DuckDB
    hash-matched."""
    import ray.data as rd

    from .exchange import hash_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id"])

    def natural_blk(batch: pa.Table) -> pa.Table:
        return pa.table({
            "blk": pa.array(
                batch["event_id"].to_numpy(zero_copy_only=False)
                // LAYOUT_BLOCK, pa.int64()),
            "u": batch["user_id"]})

    def zorder_blk(batch: pa.Table) -> pa.Table:
        return pa.table({
            "blk": pa.array(
                (batch["rank"].to_numpy(zero_copy_only=False) - 1)
                // LAYOUT_BLOCK, pa.int64()),
            "u": batch["user_id"]})

    zr = zorder_rank(sf_dir)
    zjoin = hash_join(
        zr, ev.map_batches(
            lambda b: b.rename_columns(["eid2", "user_id"]),
            batch_format="pyarrow"),
        "event_id", "eid2")

    rows = []
    for name, blocks in (
            ("natural", ev.map_batches(natural_blk,
                                       batch_format="pyarrow")),
            ("zorder", zjoin.map_batches(zorder_blk,
                                         batch_format="pyarrow"))):
        def partial(batch: pa.Table) -> pa.Table:
            blk = batch["blk"].to_numpy(zero_copy_only=False)
            u = batch["u"].to_numpy(zero_copy_only=False)
            order = np.argsort(blk, kind="stable")
            blk, u = blk[order], u[order]
            uk, starts = np.unique(blk, return_index=True)
            ends = np.concatenate([starts[1:], [blk.size]])
            match = ((u >= LAYOUT_U_LO)
                     & (u <= LAYOUT_U_HI)).astype(np.int64)
            return pa.table({
                "blk": pa.array(uk, pa.int64()),
                "umin": pa.array(np.minimum.reduceat(u, starts),
                                 pa.int64()),
                "umax": pa.array(np.maximum.reduceat(u, starts),
                                 pa.int64()),
                "n": pa.array((ends - starts).astype(np.int64),
                              pa.int64()),
                "nm": pa.array(np.add.reduceat(match, starts),
                               pa.int64()),
            })

        from ray.data.aggregate import Max, Min, Sum

        zones = (blocks.map_batches(partial, batch_format="pyarrow")
                 .groupby("blk")
                 .aggregate(Min("umin"), Max("umax"), Sum("n"),
                            Sum("nm")))

        def summarize(batch: pa.Table) -> pa.Table:
            umin = batch["min(umin)"].to_numpy(zero_copy_only=False)
            umax = batch["max(umax)"].to_numpy(zero_copy_only=False)
            n = batch["sum(n)"].to_numpy(zero_copy_only=False)
            nm = batch["sum(nm)"].to_numpy(zero_copy_only=False)
            hit = (umax >= LAYOUT_U_LO) & (umin <= LAYOUT_U_HI)
            return pa.table({
                "n_blocks": pa.array([len(n)], pa.int64()),
                "blocks_scanned": pa.array([int(hit.sum())], pa.int64()),
                "rows_scanned": pa.array([int(n[hit].sum())], pa.int64()),
                "rows_matching": pa.array([int(nm.sum())], pa.int64()),
            })

        agg = (zones.map_batches(summarize, batch_format="pyarrow")
               .sum(["n_blocks", "blocks_scanned", "rows_scanned",
                     "rows_matching"]))
        rows.append((name, int(agg["sum(n_blocks)"]),
                     int(agg["sum(blocks_scanned)"]),
                     int(agg["sum(rows_scanned)"]),
                     int(agg["sum(rows_matching)"])))
    rows.sort()
    return pa.table({
        "layout": pa.array([r[0] for r in rows], pa.string()),
        "n_blocks": pa.array([r[1] for r in rows], pa.int64()),
        "blocks_scanned": pa.array([r[2] for r in rows], pa.int64()),
        "rows_scanned": pa.array([r[3] for r in rows], pa.int64()),
        "rows_matching": pa.array([r[4] for r in rows], pa.int64()),
    })


def layout_compare_sql() -> str:
    zr = zorder_rank_sql()
    return f"""
WITH zrank AS ({zr}),
lays AS (
  SELECT 'natural' AS layout, e.event_id // {LAYOUT_BLOCK} AS blk,
         e.user_id AS u
  FROM events e
  UNION ALL
  SELECT 'zorder', (z.rank - 1) // {LAYOUT_BLOCK}, e.user_id
  FROM events e JOIN zrank z USING (event_id)),
zmaps AS (
  SELECT layout, blk, min(u) AS umin, max(u) AS umax,
         count(*) AS n,
         sum(CASE WHEN u BETWEEN {LAYOUT_U_LO} AND {LAYOUT_U_HI}
                  THEN 1 ELSE 0 END) AS nm
  FROM lays GROUP BY 1, 2)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN umax >= {LAYOUT_U_LO}
                      AND umin <= {LAYOUT_U_HI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS blocks_scanned,
       CAST(sum(CASE WHEN umax >= {LAYOUT_U_LO}
                      AND umin <= {LAYOUT_U_HI}
                     THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(nm) AS BIGINT) AS rows_matching
FROM zmaps GROUP BY layout ORDER BY layout"""
