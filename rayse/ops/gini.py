"""Gini concentration of per-key load — the skew diagnostic.

At 100 TB the first question about any partitioning key is "how skewed
is it": the Gini coefficient of the per-key size distribution is the
standard scalar. Two scopes: events per user (the exchange key of the
session/window family) and tokens per document (the payload weight of
the tokenize stage).

Exact-integer contract via the sorted rank-sum identity: with sizes
x_(1) <= ... <= x_(n),

    G = (2 * sum_i i * x_(i) - (n + 1) * sum_i x_i) / (n * sum_i x_i)

and ties make the rank-sum order-invariant, so
``gini_ppm = ((2*S1 - (n+1)*S0) * 10^6) // (n * S0)`` matches the SQL
row_number formulation bit-for-bit regardless of tie order.

Distributed shape: sizes come from one groupby fold (key-cardinality);
the rank sum NEVER sorts the sizes globally — a count-of-counts
histogram (distinct-size-bounded, the same bounded-domain idiom as
`rayse/ops/quantiles.py`) yields S1 exactly via per-size-block rank
ranges F_{j-1}+1 .. F_j:  S1 = sum_j v_j * (T(F_j) - T(F_{j-1})),
T(k) = k(k+1)/2. The histogram fold is per-batch partials + one tiny
groupby; only the distinct-size table reaches the driver.

Reference relationship: none; pins the histogram rank-sum machinery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GINI_SCALE = 1_000_000


def _gini_from_hist(sizes: np.ndarray, mult: np.ndarray) -> tuple[int, int]:
    """(n_keys, gini_ppm) from a (distinct size, multiplicity) table."""
    order = np.argsort(sizes, kind="stable")
    v = sizes[order].astype(object)        # python ints: exact
    f = mult[order].astype(object)
    n = int(sum(f))
    s0 = int(sum(a * b for a, b in zip(v, f)))
    s1 = 0
    f_cum = 0
    for vj, fj in zip(v, f):
        lo, hi = f_cum, f_cum + int(fj)
        s1 += int(vj) * (hi * (hi + 1) // 2 - lo * (lo + 1) // 2)
        f_cum = hi
    if n == 0 or s0 == 0:
        return 0, 0
    return n, ((2 * s1 - (n + 1) * s0) * GINI_SCALE) // (n * s0)


def _tok_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    n = np.array([sum(1 for t in (x or "").split(" ") if t)
                  for x in texts], np.int64)
    n = n[n > 0]       # SQL's GROUP BY never sees token-less docs
    uk, cnt = np.unique(n, return_counts=True)
    return pa.table({"sz": pa.array(uk, pa.int64()),
                     "mult": pa.array(cnt.astype(np.int64), pa.int64())})


def gini_skew(sf_dir: str) -> pa.Table:
    """(scope, n_keys, gini_ppm): Gini concentration of events-per-user
    and tokens-per-document — DuckDB hash-matched against the
    row_number rank-sum oracle."""
    import ray
    import ray.data as rd

    out_s, out_n, out_g = [], [], []

    # scope 1: events per user — groupby fold, then size histogram
    ev = (rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id"])
          .groupby("user_id").count())

    def hist_batch(batch: pa.Table) -> pa.Table:
        c = batch["count()"].to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(c, return_counts=True)
        return pa.table({
            "sz": pa.array(uk.astype(np.int64), pa.int64()),
            "mult": pa.array(cnt.astype(np.int64), pa.int64())})

    h = (ev.map_batches(hist_batch, batch_format="pyarrow")
         .groupby("sz").sum("mult"))
    rows = pa.concat_tables(
        [t for t in ray.get(h.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    n, g = _gini_from_hist(
        rows["sz"].to_numpy(zero_copy_only=False),
        rows["sum(mult)"].to_numpy(zero_copy_only=False))
    out_s.append("user_events")
    out_n.append(n)
    out_g.append(g)

    # scope 2: tokens per document — doc is a row, histogram directly
    h2 = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["text"])
          .map_batches(_tok_count_batch, batch_format="pyarrow")
          .groupby("sz").sum("mult"))
    rows2 = pa.concat_tables(
        [t for t in ray.get(h2.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    n2, g2 = _gini_from_hist(
        rows2["sz"].to_numpy(zero_copy_only=False),
        rows2["sum(mult)"].to_numpy(zero_copy_only=False))
    out_s.append("doc_tokens")
    out_n.append(n2)
    out_g.append(g2)

    return pa.table({
        "scope": pa.array(out_s, pa.string()),
        "n_keys": pa.array(out_n, pa.int64()),
        "gini_ppm": pa.array(out_g, pa.int64()),
    })


GINI_SKEW_SQL = f"""
WITH ue AS (
  SELECT count(*) AS x FROM events GROUP BY user_id
),
ue_r AS (
  SELECT x, row_number() OVER (ORDER BY x) AS rn FROM ue
),
ue_g AS (
  SELECT 'user_events' AS scope,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS s0,
         CAST(sum(rn * x) AS HUGEINT) AS s1
  FROM ue_r
),
dt AS (
  SELECT doc_id, count(*) AS x
  FROM documents, UNNEST(string_split(text, ' ')) u(t)
  WHERE t <> ''
  GROUP BY doc_id
),
dt_r AS (
  SELECT x, row_number() OVER (ORDER BY x) AS rn FROM dt
),
dt_g AS (
  SELECT 'doc_tokens' AS scope,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS s0,
         CAST(sum(rn * x) AS HUGEINT) AS s1
  FROM dt_r
)
SELECT scope, CAST(n AS BIGINT) AS n_keys,
       CAST(((2 * s1 - (n + 1) * s0) * {GINI_SCALE})
            // (n * s0) AS BIGINT) AS gini_ppm
FROM (SELECT * FROM ue_g UNION ALL SELECT * FROM dt_g)
WHERE n > 0 AND s0 > 0
ORDER BY scope
"""
