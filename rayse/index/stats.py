"""Global term-dictionary stats as a Ray Data aggregate.

Each segment file already holds per-part partial (df, cf) sums for the
terms appearing in that part (parts partition *documents*, so one term
can appear in many parts).  The global dictionary is therefore one
vocab-keyed sum — expressed here as a distributed ``groupby(term)``
aggregate over a pruned Parquet read, never as a driver-side pandas
frame, so it holds at 1e9-term vocabularies (the reference materializes
this as the PostgreSQL ``words`` / ``word_idf`` tables,
``Indexer/Entities/Word.java:6-22``).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa


def term_stats_ds(index_dir: str):
    """Distributed (term, df, cf) dictionary for a segment-file index.

    Returns an unsorted ``ray.data.Dataset`` — callers that need an
    ordering chain ``.sort("term")``; callers that feed a further
    pipeline stage keep streaming.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    files = sorted(glob.glob(os.path.join(
        index_dir, "segments", "part=*", "segment.parquet")))
    if not files:
        raise FileNotFoundError(f"no segment files under {index_dir}")
    ds = rd.read_parquet(files, columns=["term", "df", "cf"])
    agg = ds.groupby("term").aggregate(Sum("df"), Sum("cf"))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "term": batch["term"],
            "df": pa.compute.cast(batch["sum(df)"], pa.int64()),
            "cf": pa.compute.cast(batch["sum(cf)"], pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


def term_stats_table(index_dir: str) -> pa.Table:
    """Term dictionary as a term-sorted Arrow table (query-result form)."""
    import ray

    tbls = ray.get(term_stats_ds(index_dir).sort("term").to_arrow_refs())
    return pa.concat_tables(
        [t for t in tbls if t.num_rows]).combine_chunks()
