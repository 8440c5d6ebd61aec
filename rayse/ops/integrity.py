"""Dataset integrity & storage-layout instrumentation.

Two operators:

- ``dataset_checksum``: order-independent per-partition content digests
  plus a root digest — the artifact a resumable 100-TB pipeline signs
  its inputs/outputs with. Each row contributes
  ``h = mix(fnv1a(text) XOR mix(doc_id)) >> 1`` (63-bit); a partition's
  digest is the BIT-XOR fold of its rows' h (XOR is associative,
  commutative, and overflow-free, so per-batch partials fold through
  any task topology in any order); the root is the XOR fold of
  ``mix(digest XOR pid) >> 1`` over partitions. Rerunning over the same
  rows in any partitioning of the WORK (the _partition_ key is content-
  addressed, not task-addressed) reproduces every digest, so two runs
  diff at partition granularity. DuckDB hash-matched: FNV-1a as the
  ``list_reduce`` recipe (`rayse/ops/dedup.simhash_pairs_sql`), the mix
  as exact-HUGEINT splitmix (`rayse/ops/sampling._mix_sql`), the folds
  as ``bit_xor``.

- ``zonemap_prune``: zone-map (block min/max) skipping statistics — the
  read-pruning audit behind every "prune at the read" claim: blocks of
  128 consecutive event_ids, per-block min/max of value-cents from one
  groupby fold, then the counts a predicate scan would touch:
  blocks/rows pruned vs scanned vs actually matching for
  ``value >= $200``. The per-block reduce is distributed (block count
  is corpus-order but never driver-resident — flags and partial sums
  stream); only the 5-row metric table reaches the driver.
  Block id = event_id // 128 (the events table's dense-id contract,
  same assumption as `rayse/ops/zorder.py`).

Reference relationship: none (the reference trusts PostgreSQL page
checksums and has no columnar layout); beyond-reference
engine-introspection family, SURVEY §2.7.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import _mix
from .textstats import fnv64_slices

CHECKSUM_PARTS = 32
ZONE_BLOCK = 128
ZONE_CUT_CENTS = 20_000          # value >= $200


def _content_hash(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(pid, h63) per row: content-addressed partition id + 63-bit
    row digest."""
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
        np.uint64)
    texts = batch["text"].to_pylist()
    buf = "".join(t or "" for t in texts).encode("utf-8")
    lens = np.fromiter((len((t or "").encode("utf-8")) for t in texts),
                       np.int64, len(texts))
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    fnv = fnv64_slices(np.frombuffer(buf, np.uint8), starts, lens)
    h = _mix(fnv ^ _mix(doc_id)) >> np.uint64(1)
    pid = (_mix(doc_id) % np.uint64(CHECKSUM_PARTS)).astype(np.int64)
    return pid, h.astype(np.int64)


def dataset_checksum(sf_dir: str) -> pa.Table:
    """(pid, n_rows, digest): 32 partition digests + the pid=-1 root —
    DuckDB hash-matched."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        pid, h = _content_hash(batch)
        order = np.argsort(pid, kind="stable")
        pid, h = pid[order], h[order]
        uk, starts = np.unique(pid, return_index=True)
        digs = np.bitwise_xor.reduceat(h, starts)
        cnts = np.diff(np.concatenate([starts, [pid.size]]))
        return pa.table({"pid": pa.array(uk, pa.int64()),
                         "dig": pa.array(digs, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64),
                                       pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def fold(group: pa.Table) -> pa.Table:
        d = np.bitwise_xor.reduce(
            group["dig"].to_numpy(zero_copy_only=False))
        return pa.table({
            "pid": group["pid"][:1],
            "digest": pa.array([int(d)], pa.int64()),
            "n_rows": pa.array(
                [int(group["n"].to_numpy(zero_copy_only=False).sum())],
                pa.int64())})

    rows = sorted(
        ((int(r["pid"]), int(r["n_rows"]), int(r["digest"]))
         for r in parts.groupby("pid").map_groups(
             fold, batch_format="pyarrow").take_all()))
    root = 0
    total = 0
    for pid, n, dig in rows:
        root ^= int(_mix(np.array(
            [np.uint64(dig) ^ np.uint64(pid)], np.uint64))[0]
            >> np.uint64(1))
        total += n
    rows = [(-1, total, root)] + rows
    return pa.table({
        "pid": pa.array([r[0] for r in rows], pa.int64()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "digest": pa.array([r[2] for r in rows], pa.int64()),
    })


def dataset_checksum_sql() -> str:
    from .sampling import _mix_sql
    from .sketch import _mix_sql_wide

    return f"""
WITH h AS (
  SELECT {_mix_sql('doc_id')} % {CHECKSUM_PARTS} AS pid,
         xor(
           list_reduce(
             list_prepend(14695981039346656037::HUGEINT,
                          [ascii(c)::HUGEINT
                           FOR c IN string_split(text, '')]),
             (a, b) -> (xor(a, b) * 1099511628211::HUGEINT)
                       % 18446744073709551616::HUGEINT),
           {_mix_sql('doc_id')}) AS fx,
         doc_id
  FROM documents),
hh AS (SELECT pid, {_mix_sql_wide('fx')} // 2 AS h63 FROM h),
p AS (
  SELECT CAST(pid AS BIGINT) AS pid,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(bit_xor(h63) AS BIGINT) AS digest
  FROM hh GROUP BY pid),
root AS (
  SELECT CAST(-1 AS BIGINT) AS pid,
         CAST(sum(n_rows) AS BIGINT) AS n_rows,
         CAST(bit_xor({_mix_sql_wide('xor(CAST(digest AS HUGEINT), '
                                     'CAST(pid AS HUGEINT))')} // 2)
              AS BIGINT) AS digest
  FROM p)
SELECT * FROM root UNION ALL SELECT * FROM p ORDER BY pid"""


def zonemap_prune(sf_dir: str) -> pa.Table:
    """(metric, v): n_blocks / n_pruned / rows_total / rows_scanned /
    rows_matching for the value >= $200 predicate under 128-row zone
    maps — DuckDB hash-matched."""
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def block_partial(batch: pa.Table) -> pa.Table:
        blk = (batch["event_id"].to_numpy(zero_copy_only=False)
               // ZONE_BLOCK).astype(np.int64)
        vq = _cents(batch["value"].to_numpy(zero_copy_only=False))
        order = np.argsort(blk, kind="stable")
        blk, vq = blk[order], vq[order]
        uk, starts = np.unique(blk, return_index=True)
        ends = np.concatenate([starts[1:], [blk.size]])
        return pa.table({
            "blk": pa.array(uk, pa.int64()),
            "vmin": pa.array(np.minimum.reduceat(vq, starts), pa.int64()),
            "vmax": pa.array(np.maximum.reduceat(vq, starts), pa.int64()),
            "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "nm": pa.array(np.add.reduceat(
                (vq >= ZONE_CUT_CENTS).astype(np.int64), starts),
                pa.int64()),
        })

    zones = (ds.map_batches(block_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("blk")
             .aggregate(*_zone_aggs()))

    def flags(batch: pa.Table) -> pa.Table:
        vmax = batch["max(vmax)"].to_numpy(zero_copy_only=False)
        n = batch["sum(n)"].to_numpy(zero_copy_only=False)
        nm = batch["sum(nm)"].to_numpy(zero_copy_only=False)
        pruned = vmax < ZONE_CUT_CENTS
        return pa.table({
            "n_blocks": pa.array([len(vmax)], pa.int64()),
            "n_pruned": pa.array([int(pruned.sum())], pa.int64()),
            "rows_total": pa.array([int(n.sum())], pa.int64()),
            "rows_scanned": pa.array([int(n[~pruned].sum())], pa.int64()),
            "rows_matching": pa.array([int(nm.sum())], pa.int64()),
        })

    agg = (zones.map_batches(flags, batch_format="pyarrow")
           .sum(["n_blocks", "n_pruned", "rows_total", "rows_scanned",
                 "rows_matching"]))
    names = ["n_blocks", "n_pruned", "rows_matching", "rows_scanned",
             "rows_total"]
    return pa.table({
        "metric": pa.array(names, pa.string()),
        "v": pa.array([int(agg[f"sum({k})"]) for k in names], pa.int64()),
    })


def _zone_aggs():
    from ray.data.aggregate import Max, Min, Sum

    return (Min("vmin"), Max("vmax"), Sum("n"), Sum("nm"))


def zonemap_prune_sql() -> str:
    return f"""
WITH z AS (
  SELECT event_id // {ZONE_BLOCK} AS blk,
         min(CAST(round(value * 100) AS BIGINT)) AS vmin,
         max(CAST(round(value * 100) AS BIGINT)) AS vmax,
         count(*) AS n,
         sum(CASE WHEN CAST(round(value * 100) AS BIGINT)
                       >= {ZONE_CUT_CENTS} THEN 1 ELSE 0 END) AS nm
  FROM events GROUP BY 1),
s AS (SELECT count(*) AS n_blocks,
             sum(CASE WHEN vmax < {ZONE_CUT_CENTS} THEN 1 ELSE 0 END)
               AS n_pruned,
             sum(n) AS rows_total,
             sum(CASE WHEN vmax >= {ZONE_CUT_CENTS} THEN n ELSE 0 END)
               AS rows_scanned,
             sum(nm) AS rows_matching
      FROM z)
SELECT metric, CAST(v AS BIGINT) AS v FROM (
  SELECT 'n_blocks' AS metric, n_blocks AS v FROM s
  UNION ALL SELECT 'n_pruned', n_pruned FROM s
  UNION ALL SELECT 'rows_matching', rows_matching FROM s
  UNION ALL SELECT 'rows_scanned', rows_scanned FROM s
  UNION ALL SELECT 'rows_total', rows_total FROM s)
ORDER BY metric"""


DIFF_MOD = 97            # deterministic mutation: doc_id % 97 == 0


def checksum_diff(sf_dir: str) -> pa.Table:
    """(pid, differs, n_rows): the point of ``dataset_checksum`` —
    partition-granular change detection between two corpus versions.
    Version B is a deterministic in-flight mutation (append '!' to
    every doc with doc_id % 97 == 0); both digests compute in ONE
    streaming pass (two XOR folds per batch), and the diff report says
    exactly which content-addressed partitions a re-run would have to
    reprocess. DuckDB hash-matched."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        pid, h_base = _content_hash(batch)
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        mut_texts = [
            (t or "") + "!" if i % DIFF_MOD == 0 else (t or "")
            for i, t in zip(doc_id.tolist(), batch["text"].to_pylist())]
        mut = pa.table({"doc_id": batch["doc_id"],
                        "text": pa.array(mut_texts, pa.string())})
        _, h_mut = _content_hash(mut)
        order = np.argsort(pid, kind="stable")
        pid = pid[order]
        hb, hm = h_base[order], h_mut[order]
        uk, starts = np.unique(pid, return_index=True)
        cnts = np.diff(np.concatenate([starts, [pid.size]]))
        return pa.table({
            "pid": pa.array(uk, pa.int64()),
            "db": pa.array(np.bitwise_xor.reduceat(hb, starts),
                           pa.int64()),
            "dm": pa.array(np.bitwise_xor.reduceat(hm, starts),
                           pa.int64()),
            "n": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    def fold(group: pa.Table) -> pa.Table:
        db = np.bitwise_xor.reduce(
            group["db"].to_numpy(zero_copy_only=False))
        dm = np.bitwise_xor.reduce(
            group["dm"].to_numpy(zero_copy_only=False))
        return pa.table({
            "pid": group["pid"][:1],
            "differs": pa.array([int(db != dm)], pa.int64()),
            "n_rows": pa.array(
                [int(group["n"].to_numpy(zero_copy_only=False).sum())],
                pa.int64())})

    rows = sorted(
        ((int(r["pid"]), int(r["differs"]), int(r["n_rows"]))
         for r in ds.map_batches(partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
         .groupby("pid").map_groups(fold, batch_format="pyarrow")
         .take_all()))
    return pa.table({
        "pid": pa.array([r[0] for r in rows], pa.int64()),
        "differs": pa.array([r[1] for r in rows], pa.int64()),
        "n_rows": pa.array([r[2] for r in rows], pa.int64()),
    })


def checksum_diff_sql() -> str:
    from .sampling import _mix_sql
    from .sketch import _mix_sql_wide

    def digest(text_expr: str, name: str) -> str:
        return f"""xor(
           list_reduce(
             list_prepend(14695981039346656037::HUGEINT,
                          [ascii(c)::HUGEINT
                           FOR c IN string_split({text_expr}, '')]),
             (a, b) -> (xor(a, b) * 1099511628211::HUGEINT)
                       % 18446744073709551616::HUGEINT),
           {_mix_sql('doc_id')}) AS {name}"""

    return f"""
WITH h AS (
  SELECT {_mix_sql('doc_id')} % {CHECKSUM_PARTS} AS pid,
         {digest('text', 'fb')},
         {digest(f"CASE WHEN doc_id % {DIFF_MOD} = 0 "
                  "THEN text || '!' ELSE text END", 'fm')},
         doc_id
  FROM documents),
hh AS (SELECT pid, {_mix_sql_wide('fb')} // 2 AS hb,
              {_mix_sql_wide('fm')} // 2 AS hm
       FROM h)
SELECT CAST(pid AS BIGINT) AS pid,
       CAST(CASE WHEN bit_xor(hb) <> bit_xor(hm) THEN 1 ELSE 0 END
            AS BIGINT) AS differs,
       CAST(count(*) AS BIGINT) AS n_rows
FROM hh GROUP BY pid ORDER BY pid"""
