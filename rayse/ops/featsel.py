"""Chi-square term-source association (feature selection).

The classic supervised feature-selection statistic over the corpus: for
every (term, source) cell of the presence contingency table

    A = docs of the source containing the term
    B = docs of other sources containing the term
    C = docs of the source without the term
    D = docs of other sources without the term

score chi2 = N * (AD - CB)^2 / ((A+C)(B+D)(A+B)(C+D)), the strength of
the term's association with the source — what a data-mixing pipeline
uses to find source-discriminating vocabulary.

INTEGER-EXACT contract: the score is the exact rational floored at 1e-6
resolution — ``chi2_q = (N * (AD-CB)^2 * 10^6) // denom`` evaluated in
unbounded Python ints on the Ray side and HUGEINT in DuckDB, so the
driver hash matches bit-for-bit. Terms present in EVERY doc are excluded
(C+D = 0 would divide by zero) along with terms under ``min_df`` — both
thresholds are part of the operator contract, applied identically in SQL.

Distributed shape: each document is one row, so term presence needs no
exchange at all — per-batch distinct-token pair partials (np.unique),
one vocabulary-sized ``groupby(term, source).sum``, a term-level fold
for df, and the df filter bounds what reaches the driver at
(corpus/min_df) x sources rows BEFORE the gather; the exact-rational
scoring loop runs over that filtered output only. Source doc totals are
a tiny broadcast-sized aggregate.

Tokenization matches the corpus-wide convention (space split, empty
tokens dropped — `rayse/ops/heavyhitters.py`).

Reference relationship: none (no feature selection in the reference);
pins the contingency-fold + exact-rational scoring machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MIN_DF = 25
CHI2_SCALE = 1_000_000


def _presence_partials(batch: pa.Table) -> pa.Table:
    """(term, source, cnt) partial doc-presence counts of one batch."""
    texts = batch["text"].to_pylist()
    srcs = batch["source"].to_pylist()
    keys = []
    for txt, src in zip(texts, srcs):
        toks = set((txt or "").split(" "))
        toks.discard("")
        keys.extend(f"{t}\x00{src}" for t in toks)
    if not keys:
        return pa.table({"term": pa.array([], pa.string()),
                         "source": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    uk, cnt = np.unique(np.array(keys, dtype=object), return_counts=True)
    terms, sources = zip(*(k.split("\x00") for k in uk))
    return pa.table({
        "term": pa.array(list(terms), pa.string()),
        "source": pa.array(list(sources), pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def chi2_term_source(sf_dir: str, min_df: int = MIN_DF) -> pa.Table:
    """(term, source, n_docs, chi2_q): exact floored-rational chi-square
    association of each qualifying term with each source it appears in —
    DuckDB hash-matched against the HUGEINT contingency oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "source"])
    agg = (ds.map_batches(_presence_partials, batch_format="pyarrow")
           .groupby(["term", "source"]).sum("cnt"))
    cells = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    # ^ gather is bounded: (term, source) presence cells post-groupby.
    # At open-vocabulary scale, insert the df >= min_df semi-join HERE
    # (term-level groupby -> broadcast qualifying set) before gathering;
    # the scoring below is already filtered-output-sized.

    term = cells["term"].to_pylist()
    src = cells["source"].to_pylist()
    a_arr = cells["sum(cnt)"].to_numpy(zero_copy_only=False)

    # tiny side aggregates: per-source doc totals and N
    src_tbl = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source"])
               .groupby("source").count())
    src_rows = pa.concat_tables(
        [t for t in ray.get(src_tbl.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    n_s = dict(zip(src_rows["source"].to_pylist(),
                   (int(x) for x in src_rows["count()"].to_pylist())))
    n = sum(n_s.values())

    df: dict[str, int] = {}
    for t, a in zip(term, a_arr):
        df[t] = df.get(t, 0) + int(a)

    out_t, out_s, out_a, out_q = [], [], [], []
    for t, s, a in zip(term, src, a_arr):
        d_f = df[t]
        if d_f < min_df or d_f >= n:
            continue
        a = int(a)
        b = d_f - a
        c = n_s[s] - a
        d = n - d_f - n_s[s] + a
        num = n * (a * d - c * b) ** 2 * CHI2_SCALE
        den = (a + c) * (b + d) * (a + b) * (c + d)
        out_t.append(t)
        out_s.append(s)
        out_a.append(a)
        out_q.append(num // den)

    order = np.lexsort((np.array(out_s, dtype=object),
                        np.array(out_t, dtype=object)))
    return pa.table({
        "term": pa.array([out_t[i] for i in order], pa.string()),
        "source": pa.array([out_s[i] for i in order], pa.string()),
        "n_docs": pa.array([out_a[i] for i in order], pa.int64()),
        "chi2_q": pa.array([out_q[i] for i in order], pa.int64()),
    })


def chi2_term_source_sql(min_df: int = MIN_DF) -> str:
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, source, t AS term
  FROM documents, UNNEST(string_split(text, ' ')) u(t)
  WHERE t <> ''
),
n_total AS (SELECT count(*) AS n FROM documents),
src AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
ts AS (SELECT term, source, count(*) AS a FROM tok GROUP BY term, source),
df AS (SELECT term, sum(a) AS df FROM ts GROUP BY term),
q AS (
  SELECT ts.term, ts.source,
         CAST(ts.a AS HUGEINT) AS a,
         CAST(df.df - ts.a AS HUGEINT) AS b,
         CAST(src.n_s - ts.a AS HUGEINT) AS c,
         CAST(n.n - df.df - src.n_s + ts.a AS HUGEINT) AS d,
         CAST(n.n AS HUGEINT) AS n
  FROM ts
  JOIN df USING (term)
  JOIN src USING (source)
  CROSS JOIN n_total n
  WHERE df.df >= {min_df} AND df.df < n.n
)
SELECT term, source, CAST(a AS BIGINT) AS n_docs,
       CAST((n * (a*d - c*b) * (a*d - c*b) * {CHI2_SCALE})
            // ((a+c) * (b+d) * (a+b) * (c+d)) AS BIGINT) AS chi2_q
FROM q
ORDER BY term, source
"""
