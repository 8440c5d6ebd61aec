"""Index dictionary diff — the monitoring operator for index
maintenance: given two segment-file indexes (a before/after of a
delete+compact, an append, or a re-build), emit every term whose global
(df, cf) changed, with both sides' stats and a status tag.

Scale shape: each side's dictionary is the existing distributed
``term_stats_ds`` aggregate (per-part partial sums -> groupby(term));
the diff itself is one term-hash exchange over the UNION of both sides'
partials — a vocabulary-sized shuffle, never a driver-side dictionary.
The fold is pure integer (sum per side, compare), so the DuckDB oracle
(FULL OUTER JOIN of the two corpus re-derivations) is bit-exact.

Reference relationship: the reference re-indexes in place and exposes
index health only through row counts (`DatabaseMaintenanceService.java`
VACUUM + `IndexerService.java` metrics dumps); a dictionary diff is the
segment-file analog a production index pipeline alerts on after every
maintenance operation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_DIFF_PARTIAL_SCHEMA = pa.schema([
    ("term", pa.string()), ("thash", pa.uint64()),
    ("df_a", pa.int64()), ("cf_a", pa.int64()),
    ("df_b", pa.int64()), ("cf_b", pa.int64()),
])


def _side_partials(ds, side: str):
    """Tag one side's (term, df, cf) stats into the shared diff-partial
    schema (other side zeroed) with the exchange hash."""
    from .textstats import _word_arr_slices, fnv64_slices

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        w = np.asarray(batch["term"].to_pylist(), dtype=object)
        zero = pa.array(np.zeros(n, np.int64), pa.int64())
        df = pc.cast(batch["df"], pa.int64())
        cf = pc.cast(batch["cf"], pa.int64())
        return pa.table({
            "term": batch["term"],
            "thash": pa.array(fnv64_slices(*_word_arr_slices(w)),
                              pa.uint64()),
            "df_a": df if side == "a" else zero,
            "cf_a": cf if side == "a" else zero,
            "df_b": df if side == "b" else zero,
            "cf_b": cf if side == "b" else zero,
        })

    return ds.map_batches(tag, batch_format="pyarrow")


def _diff_fold(tbl: pa.Table) -> pa.Table:
    """Per-term sums of both sides' partials; emit only changed terms."""
    empty = pa.table({
        "term": pa.array([], pa.string()),
        "status": pa.array([], pa.string()),
        "df_a": pa.array([], pa.int64()),
        "cf_a": pa.array([], pa.int64()),
        "df_b": pa.array([], pa.int64()),
        "cf_b": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
    uniq, code = np.unique(terms, return_inverse=True)
    order = np.argsort(code, kind="stable")
    c_s = code[order]
    new = np.empty(c_s.size, dtype=bool)
    new[0] = True
    new[1:] = c_s[1:] != c_s[:-1]
    starts = np.flatnonzero(new)

    def tot(col):
        return np.add.reduceat(
            tbl[col].to_numpy(zero_copy_only=False)[order], starts)

    df_a, cf_a, df_b, cf_b = (tot(c) for c in
                              ("df_a", "cf_a", "df_b", "cf_b"))
    changed = (df_a != df_b) | (cf_a != cf_b)
    status = np.where(df_b == 0, "removed",
                      np.where(df_a == 0, "added", "changed"))
    return pa.table({
        "term": pa.array(uniq[c_s[new]][changed].tolist(), pa.string()),
        "status": pa.array(status[changed].tolist(), pa.string()),
        "df_a": pa.array(df_a[changed], pa.int64()),
        "cf_a": pa.array(cf_a[changed], pa.int64()),
        "df_b": pa.array(df_b[changed], pa.int64()),
        "cf_b": pa.array(cf_b[changed], pa.int64()),
    })


def index_diff(index_a: str, index_b: str) -> pa.Table:
    """(term, status, df_a, cf_a, df_b, cf_b) for every term whose
    global stats differ between the two indexes, term-sorted."""
    import ray

    from ..index.stats import term_stats_ds
    from .exchange import exchange_by_key

    union = _side_partials(term_stats_ds(index_a), "a").union(
        _side_partials(term_stats_ds(index_b), "b"))
    out = exchange_by_key(union, "thash", _diff_fold)
    parts = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not parts:
        return _diff_fold(pa.table(
            {n: [] for n in _DIFF_PARTIAL_SCHEMA.names},
            schema=_DIFF_PARTIAL_SCHEMA))
    tbl = pa.concat_tables(parts).combine_chunks()
    return tbl.take(pc.sort_indices(tbl, sort_keys=[("term",
                                                     "ascending")]))


def index_diff_sql(doc_filter_b: str | None = None) -> str:
    """Oracle for diffing the full porter index against its
    delete+compacted variant: ONE analyzed-stream re-derivation, both
    dictionaries derived from it (side b under the delete filter over
    the conv id's encoded doc number), FULL OUTER JOIN, changed-only."""
    from .porter_oracle import (DELETED_DOC_MOD, DELETED_DOC_REM,
                                _analysis_ctes)

    filt = doc_filter_b or (
        f"CAST(substr(conv_id, 6) AS BIGINT) % {DELETED_DOC_MOD} "
        f"!= {DELETED_DOC_REM}")
    return f"""{_analysis_ctes()},
dfa AS (SELECT term, CAST(count(*) AS BIGINT) AS df_a,
               CAST(sum(tf) AS BIGINT) AS cf_a
        FROM tf GROUP BY term),
dfb AS (SELECT term, CAST(count(*) AS BIGINT) AS df_b,
               CAST(sum(tf) AS BIGINT) AS cf_b
        FROM tf WHERE {filt} GROUP BY term),
j AS (SELECT coalesce(a.term, b.term) AS term,
             coalesce(a.df_a, 0) AS df_a, coalesce(a.cf_a, 0) AS cf_a,
             coalesce(b.df_b, 0) AS df_b, coalesce(b.cf_b, 0) AS cf_b
      FROM dfa a FULL OUTER JOIN dfb b ON a.term = b.term)
SELECT term,
       CASE WHEN df_b = 0 THEN 'removed'
            WHEN df_a = 0 THEN 'added'
            ELSE 'changed' END AS status,
       df_a, cf_a, df_b, cf_b
FROM j
WHERE df_a <> df_b OR cf_a <> cf_b
ORDER BY term"""
