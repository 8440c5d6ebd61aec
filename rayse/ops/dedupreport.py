"""Per-source exact-duplication report — the dedup observability layer.

A cleaning run's first dashboard number: how much of each source is
exact-duplicate content (globally — cross-source copies count for both
sources). Output per source: doc count, docs whose text occurs more
than once anywhere in the corpus, and the duplication rate in ppm
(floored integer).

Distributed shape: the same 64-bit content hash as ``dedup_exact``
(sha1 top bits, vectorized map — no full-text shuffle), ONE exchange by
hash with the source column carried, per-partition group-size test +
per-source partial counts (partition output is source-cardinality), a
tiny source groupby fold, and a second tiny per-source totals
aggregate. The SQL oracle groups by raw text (the same equivalence the
hash pins — convention shared with the green ``dedup_exact`` oracle).

Reference relationship: the reference dedups silently
(`ReindexController.java:62-67` keep-first); this surfaces the rates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DUP_SCALE = 1_000_000


def _hash_source_batch(batch: pa.Table) -> pa.Table:
    h = [int.from_bytes(hashlib.sha1((t or "").encode()).digest()[:8],
                        "big") >> 1
         for t in batch["text"].to_pylist()]
    return pa.table({"h": pa.array(h, pa.int64()),
                     "source": batch["source"]})


def _dup_partition(t: pa.Table) -> pa.Table:
    empty = pa.table({"source": pa.array([], pa.string()),
                      "n_dup": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    h = t["h"].to_numpy(zero_copy_only=False)
    src = np.asarray(t["source"].to_pylist(), dtype=object)
    order = np.argsort(h, kind="stable")
    h, src = h[order], src[order]
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    sizes = np.diff(np.r_[starts, h.size])
    dup_rows = np.repeat(sizes > 1, sizes)
    dsrc = src[dup_rows]
    if dsrc.size == 0:
        return empty
    uk, cnt = np.unique(dsrc.astype(str), return_counts=True)
    return pa.table({
        "source": pa.array(uk.tolist(), pa.string()),
        "n_dup": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def dedup_report(sf_dir: str) -> pa.Table:
    """(source, n_docs, n_dup, dup_ppm): exact-duplicate exposure per
    source — DuckDB hash-matched against the group-by-text oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])
    hashed = ds.map_batches(_hash_source_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    parts = exchange_by_key(hashed, "h", _dup_partition)
    agg = parts.groupby("source").sum("n_dup")
    dup_tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if dup_tables:
        dup_rows = pa.concat_tables(dup_tables,
                                    promote_options="default")
        n_dup = dict(zip(dup_rows["source"].to_pylist(),
                         (int(x) for x in
                          dup_rows["sum(n_dup)"].to_pylist())))
    else:
        n_dup = {}

    tot = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source"])
           .groupby("source").count())
    tot_rows = pa.concat_tables(
        [t for t in ray.get(tot.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    srcs = sorted(tot_rows["source"].to_pylist())
    n_docs = dict(zip(tot_rows["source"].to_pylist(),
                      (int(x) for x in tot_rows["count()"].to_pylist())))
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_docs": pa.array([n_docs[s] for s in srcs], pa.int64()),
        "n_dup": pa.array([n_dup.get(s, 0) for s in srcs], pa.int64()),
        "dup_ppm": pa.array(
            [n_dup.get(s, 0) * DUP_SCALE // n_docs[s] for s in srcs],
            pa.int64()),
    })


DEDUP_REPORT_SQL = f"""
WITH g AS (SELECT text, count(*) AS c FROM documents GROUP BY text),
d AS (
  SELECT doc_id, source
  FROM documents JOIN g USING (text) WHERE g.c > 1
),
tot AS (SELECT source, count(*) AS n_docs FROM documents
        GROUP BY source),
dd AS (SELECT source, count(*) AS n_dup FROM d GROUP BY source)
SELECT t.source,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(COALESCE(dd.n_dup, 0) AS BIGINT) AS n_dup,
       CAST(COALESCE(dd.n_dup, 0) * {DUP_SCALE} // t.n_docs
            AS BIGINT) AS dup_ppm
FROM tot t LEFT JOIN dd USING (source)
ORDER BY t.source
"""
