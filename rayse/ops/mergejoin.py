"""Range-partitioned sort-merge join — the third join strategy in the
engine's routing policy (broadcast for small sides, `exchange
.hash_join` for big⋈big by hash; THIS is the big⋈big route when the
output should come back key-ORDERED, or when the key distribution is
so skewed that hash partitions imbalance).

Plan: ONE bounded range histogram over the left side's keys
(key >> SHIFT partials — the `curriculum._ranked_by_key` contract)
yields equal-COUNT cut points, so ranges stay balanced no matter how
skewed the keys are (a hot key widens its own range's row count only
by its own rows — and equal keys never split across ranges because
cuts fall on shifted-bucket boundaries). Both sides spill
hive-partitioned by searchsorted(cuts, key); one Ray task per range
sorts its two shards and joins them with a vectorized
searchsorted+repeat merge (no Python row loop, no Arrow hash table).

The demo query (`smj_order_priority_revenue`) joins orders⋈lineitem
through the merge route and folds to the per-priority revenue rollup —
DuckDB hash-matched, and pinned BYTE-IDENTICAL to the same pipeline
routed through `hash_join` (the cross-strategy equivalence test).

Reference relationship: none; completes the join-strategy family
(`exchange.hash_join`, broadcast maps in `tpch.py`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SMJ_SHIFT = 6          # range-bucket width knob (histogram bound)


def _range_cuts(ds, key_col: str, n_parts: int,
                shift: int = SMJ_SHIFT) -> np.ndarray:
    """Equal-count cut points (exclusive upper bucket bounds) from the
    bounded shifted-key histogram of ``ds``."""
    import ray

    def hist(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        if k.size and k.min() < 0:
            raise ValueError(f"{key_col} must be non-negative")
        u, c = np.unique(k.astype(np.uint64) >> np.uint64(shift),
                         return_counts=True)
        return pa.table({"rb": pa.array(u.astype(np.int64), pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    h = (ds.map_batches(hist, batch_format="pyarrow",
                        zero_copy_batch=True)
         .groupby("rb").sum("c").to_pandas())
    h = h.sort_values("rb")
    rbs = h["rb"].to_numpy().astype(np.int64)
    counts = h["sum(c)"].to_numpy().astype(np.int64)
    total = int(counts.sum())
    if total == 0 or n_parts <= 1:
        return np.zeros(0, np.int64)
    cum = np.cumsum(counts)
    targets = np.arange(1, n_parts) * (total / n_parts)
    idx = np.searchsorted(cum, targets)
    idx = np.minimum(idx, rbs.size - 1)
    # cuts are EXCLUSIVE shifted-bucket upper bounds -> keys equal
    # across a cut never split ranges
    cuts = np.unique((rbs[idx] + 1) << shift)
    return cuts.astype(np.int64)


def _smj_part(lt: pa.Table, rt: pa.Table, left_on: str,
              right_on: str) -> pa.Table:
    """Sorted vectorized inner merge of one co-range pair."""
    lk = lt[left_on].to_numpy(zero_copy_only=False)
    rk = rt[right_on].to_numpy(zero_copy_only=False)
    lo = np.argsort(lk, kind="stable")
    ro = np.argsort(rk, kind="stable")
    lk, rk = lk[lo], rk[ro]
    starts = np.searchsorted(rk, lk, side="left")
    ends = np.searchsorted(rk, lk, side="right")
    reps = ends - starts
    li = np.repeat(np.arange(lk.size), reps)
    ri = (np.concatenate(
        [np.arange(s, e) for s, e in zip(starts, ends) if e > s])
        if reps.sum() else np.zeros(0, np.int64))
    lt2 = lt.take(pa.array(lo[li], pa.int64()))
    rt2 = rt.drop_columns([right_on]).take(pa.array(ro[ri], pa.int64()))
    for name in rt2.column_names:
        lt2 = lt2.append_column(name, rt2[name])
    return lt2


def merge_join(left_ds, right_ds, left_on: str, right_on: str, *,
               n_parts: int | None = None, tmp_root: str = "/tmp"):
    """Distributed range-partitioned sort-merge inner join. Returns a
    Dataset of joined rows; same non-colliding-column contract as
    ``hash_join``."""
    import glob
    import os
    import shutil
    import uuid

    import ray
    import ray.data as rd

    from .exchange import default_parts

    if n_parts is None:
        n_parts = default_parts()
    cuts = _range_cuts(left_ds, left_on, n_parts)
    cuts_ref = ray.put(cuts)

    base = os.path.join(
        tmp_root, f"rayse_smj_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    sides = {"l": (left_ds, left_on, os.path.join(base, "l")),
             "r": (right_ds, right_on, os.path.join(base, "r"))}
    schemas = {}
    for tag, (ds, key, tmp) in sides.items():
        schema = ds.schema()
        schemas[tag] = pa.schema(list(zip(schema.names, schema.types)))

        def stamp(batch: pa.Table, key=key) -> pa.Table:
            c = ray.get(cuts_ref)
            k = batch[key].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "_part", pa.array(np.searchsorted(c, k, side="right"),
                                  pa.int64()))

        ds.map_batches(stamp, batch_format="pyarrow").write_parquet(
            tmp, partition_cols=["_part"])

    def part_ids(tmp: str) -> set:
        return {int(os.path.basename(d).split("=")[1])
                for d in glob.glob(os.path.join(tmp, "_part=*"))}

    ltmp, rtmp = sides["l"][2], sides["r"][2]
    lparts, rparts = part_ids(ltmp), part_ids(rtmp)
    ids = sorted(lparts & rparts)

    lschema, rschema = schemas["l"], schemas["r"]

    @ray.remote
    def run_part(pid: int) -> pa.Table:
        import pyarrow.dataset as pads

        lt = pads.dataset(os.path.join(ltmp, f"_part={pid}")).to_table(
            columns=lschema.names, use_threads=False)
        rt = pads.dataset(os.path.join(rtmp, f"_part={pid}")).to_table(
            columns=rschema.names, use_threads=False)
        return _smj_part(lt, rt, left_on, right_on)

    if not ids:
        shutil.rmtree(base, ignore_errors=True)
        probe = _smj_part(lschema.empty_table(), rschema.empty_table(),
                          left_on, right_on)
        return rd.from_arrow(probe)

    refs = [run_part.remote(pid) for pid in ids]
    ray.wait(refs, num_returns=len(refs), fetch_local=False)
    out = rd.from_arrow_refs(refs)
    shutil.rmtree(base, ignore_errors=True)
    return out


def _smj_rollup(join_ds):
    """orders⋈lineitem -> (o_orderpriority, n_items, revenue)."""
    import ray
    import ray.data as rd

    from .relational import _cents

    def partial(batch: pa.Table) -> pa.Table:
        pr = np.asarray(batch["o_orderpriority"].to_pylist(),
                        dtype=object)
        rev = _cents(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)
            * (1.0 - batch["l_discount"].to_numpy(
                zero_copy_only=False)), 10000.0)
        uk, inv = np.unique(pr.astype(str), return_inverse=True)
        return pa.table({
            "o_orderpriority": pa.array(uk.tolist(), pa.string()),
            "n": pa.array(np.bincount(inv, None, uk.size)
                          .astype(np.int64), pa.int64()),
            "rev": pa.array(np.bincount(inv, rev, uk.size)
                            .astype(np.int64), pa.int64()),
        })

    agg = (join_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(rd.aggregate.Sum("n"), rd.aggregate.Sum("rev")))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    idx = pa.compute.sort_indices(
        tbl, sort_keys=[("o_orderpriority", "ascending")])
    tbl = tbl.take(idx)
    return pa.table({
        "o_orderpriority": tbl["o_orderpriority"],
        "n_items": pa.compute.cast(tbl["sum(n)"], pa.int64()),
        "revenue": pa.compute.cast(tbl["sum(rev)"], pa.int64()),
    })


def smj_order_priority_revenue(sf_dir: str) -> pa.Table:
    """(o_orderpriority, n_items, revenue) through the RANGE-MERGE join
    route — DuckDB hash-matched; byte-identical to the hash_join route
    (pytest cross-strategy pin)."""
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    j = merge_join(line, orders, "l_orderkey", "o_orderkey")
    return _smj_rollup(j)


def hj_order_priority_revenue(sf_dir: str) -> pa.Table:
    """The identical rollup through ``exchange.hash_join`` (the
    cross-strategy equivalence fixture)."""
    import ray.data as rd

    from .exchange import hash_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    j = hash_join(line, orders, "l_orderkey", "o_orderkey")
    return _smj_rollup(j)


def smj_order_priority_revenue_sql() -> str:
    return """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""


# ---------------------------------------------------------------------------
# Bloom semi-join reduction — the classic distributed-join optimization:
# build a Bloom filter over the FILTERED small side's keys, broadcast
# the bit array once, and drop non-members of the big side BEFORE it
# pays the exchange. False positives only cost spill bytes (the exact
# join still removes them), so correctness is oblivious to the filter —
# which is why the demo query hash-matches the plain SQL oracle while
# shipping ~1/5 of the lineitem rows through the join.
# ---------------------------------------------------------------------------

BLOOMJ_BITS_LOG2 = 20
BLOOMJ_K = 3
BLOOMJ_PRIORITY = "1-URGENT"


def _bloom_hashes(keys: np.ndarray, k: int, bits_log2: int):
    """k splitmix64-derived hash positions per key, vectorized."""
    x = keys.astype(np.uint64)
    mask = np.uint64((1 << bits_log2) - 1)
    out = []
    for i in range(k):
        z = x + np.uint64((0x9E3779B97F4A7C15 * (i + 1))
                          & 0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        out.append((z & mask).astype(np.int64))
    return out


def bloom_join_revenue(sf_dir: str) -> pa.Table:
    """(n_items, revenue): urgent-order lineitem revenue through the
    Bloom-prefiltered exchange join — DuckDB hash-matched against the
    plain join+filter oracle (the Bloom layer is invisible to the
    result, by construction)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .exchange import hash_join
    from .relational import _cents

    orders_t = pq.read_table(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    sel = orders_t.filter(
        pc.equal(orders_t["o_orderpriority"], BLOOMJ_PRIORITY))
    keys = sel["o_orderkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    bits = np.zeros(1 << (BLOOMJ_BITS_LOG2 - 6), np.uint64)
    for pos in _bloom_hashes(keys, BLOOMJ_K, BLOOMJ_BITS_LOG2):
        # bitwise_or.at, NOT fancy-index |= (which drops all but one
        # update per duplicate word index -> false negatives)
        np.bitwise_or.at(
            bits, pos >> 6,
            np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
    bits_ref = ray.put(bits)

    line = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prefilter(batch: pa.Table) -> pa.Table:
        bb = ray.get(bits_ref)
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        member = np.ones(k.size, bool)
        for pos in _bloom_hashes(k, BLOOMJ_K, BLOOMJ_BITS_LOG2):
            member &= (bb[pos >> 6]
                       >> (pos.astype(np.uint64) & np.uint64(63))
                       & np.uint64(1)).astype(bool)
        sub = batch.filter(pa.array(member))
        rev = _cents(sub["l_extendedprice"].to_numpy(
            zero_copy_only=False)
            * (1.0 - sub["l_discount"].to_numpy(zero_copy_only=False)),
            10000.0)
        return pa.table({
            "l_orderkey": pa.array(
                sub["l_orderkey"].to_numpy(zero_copy_only=False),
                pa.int64()),
            "rev": pa.array(rev, pa.int64()),
        })

    sel_ds = rd.from_arrow(pa.table({
        "o_orderkey": pa.array(np.sort(keys), pa.int64())}))
    j = hash_join(line.map_batches(prefilter, batch_format="pyarrow"),
                  sel_ds, "l_orderkey", "o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "rev": pa.array([int(rev.sum())], pa.int64()),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .aggregate(rd.aggregate.Sum("n"), rd.aggregate.Sum("rev")))
    return pa.table({
        "n_items": pa.array([int(agg["sum(n)"] or 0)], pa.int64()),
        "revenue": pa.array([int(agg["sum(rev)"] or 0)], pa.int64()),
    })


def bloom_join_revenue_sql() -> str:
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '{BLOOMJ_PRIORITY}'"""


# ---------------------------------------------------------------------------
# Partitioned-sink round trip: write a fact table hive-partitioned by a
# key, then answer a partition-selective query by reading ONLY that
# partition's files with only the needed columns — the resumable-output
# + pruned-read contract of the build pipeline exercised as a
# standalone, oracle-checked operator.
# ---------------------------------------------------------------------------

PWP_PRIORITY = "1-URGENT"


def partitioned_write_prune(sf_dir: str) -> pa.Table:
    """(o_orderpriority, n_orders, revenue_cents): write orders
    hive-partitioned by priority under /tmp, then compute the urgent
    partition's rollup from a partition-pruned, column-pruned re-read
    — DuckDB hash-matched against the filtered oracle."""
    import os
    import shutil
    import uuid

    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    from .relational import _cents

    out_dir = os.path.join(
        "/tmp", f"rayse_pwp_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_orderkey", "o_orderpriority",
                                  "o_totalprice"])
    ds.write_parquet(out_dir, partition_cols=["o_orderpriority"])

    # pruned re-read: one partition directory, two columns
    part_dir = os.path.join(out_dir,
                            f"o_orderpriority={PWP_PRIORITY}")
    sel = rd.read_parquet(part_dir,
                          columns=["o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"].to_numpy(
            zero_copy_only=False), 100.0)
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "rev": pa.array([int(cents.sum())], pa.int64()),
        })

    agg = (sel.map_batches(partial, batch_format="pyarrow")
           .aggregate(rd.aggregate.Sum("n"), rd.aggregate.Sum("rev")))
    shutil.rmtree(out_dir, ignore_errors=True)
    return pa.table({
        "o_orderpriority": pa.array([PWP_PRIORITY], pa.string()),
        "n_orders": pa.array([int(agg["sum(n)"] or 0)], pa.int64()),
        "revenue_cents": pa.array([int(agg["sum(rev)"] or 0)],
                                  pa.int64()),
    })


def partitioned_write_prune_sql() -> str:
    return f"""
SELECT '{PWP_PRIORITY}' AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders WHERE o_orderpriority = '{PWP_PRIORITY}'"""
