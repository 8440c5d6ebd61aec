"""Selinger dynamic-programming join ordering (System R, Selinger et
al. 1979) over the star-schema chain lineitem–orders–customer–nation —
the optimizer cell that COMPLETES `planstats.join_cardinality` (one
pair's estimate-vs-exact) into a full plan search.

Statistics are computed EXACTLY and distributedly (row counts + NDVs
per join key via per-batch unique partials → one groupby each — the
`exact_distinct` shape); the DP then runs driver-side over the 10
connected subsets of the 4-relation chain (constant-sized). Estimates
use the System-R rule |R⋈S| = |R|·|S| // max(ndv_R, ndv_S) with the
NDV-preservation assumption, folded along the canonical chain order
(L→O→C→N) so every subset's cardinality is a deterministic integer;
plan cost is C_out (Σ intermediate cardinalities), and each subset
reports its cheapest split under (cost ASC, split-label ASC).

Oracle: DuckDB computes the identical stats (count / count DISTINCT)
and the identical unrolled DP as pure scalar CTE arithmetic — so the
pin covers the stats collection AND the search, bit-for-bit.

Reference relationship: none (the reference delegates planning to
PostgreSQL); SURVEY §2.8 scalar family + SE7z72.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ndv(sf_dir: str, table: str, col: str) -> int:
    """Exact distinct count of one key column — per-batch unique
    partials, one groupby, count of groups."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

    def uniq(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array(np.unique(v), pa.int64())})

    return (ds.map_batches(uniq, batch_format="pyarrow")
            .groupby("k").count().count())


def _nrows(sf_dir: str, table: str) -> int:
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet").count()


def selinger_plan(sf_dir: str) -> pa.Table:
    """(subset, n_rows_est, best_cost, best_split): the DP table over
    connected subsets of L-O-C-N — DuckDB hash-matched."""
    nl = _nrows(sf_dir, "lineitem")
    no = _nrows(sf_dir, "orders")
    nc = _nrows(sf_dir, "customer")
    nn = _nrows(sf_dir, "nation")
    d_l_ok = _ndv(sf_dir, "lineitem", "l_orderkey")
    d_o_ok = _ndv(sf_dir, "orders", "o_orderkey")
    d_o_ck = _ndv(sf_dir, "orders", "o_custkey")
    d_c_ck = _ndv(sf_dir, "customer", "c_custkey")
    d_c_nk = _ndv(sf_dir, "customer", "c_nationkey")
    d_n_nk = _ndv(sf_dir, "nation", "n_nationkey")

    # canonical chain-fold cardinalities (floor at every step)
    card = {
        "L": nl, "O": no, "C": nc, "N": nn,
        "LO": nl * no // max(d_l_ok, d_o_ok),
        "OC": no * nc // max(d_o_ck, d_c_ck),
        "CN": nc * nn // max(d_c_nk, d_n_nk),
    }
    card["LOC"] = card["LO"] * nc // max(d_o_ck, d_c_ck)
    card["OCN"] = card["OC"] * nn // max(d_c_nk, d_n_nk)
    card["LOCN"] = card["LOC"] * nn // max(d_c_nk, d_n_nk)

    splits = {
        "LO": [("L", "O")],
        "OC": [("O", "C")],
        "CN": [("C", "N")],
        "LOC": [("LO", "C"), ("L", "OC")],
        "OCN": [("OC", "N"), ("O", "CN")],
        "LOCN": [("LOC", "N"), ("LO", "CN"), ("L", "OCN")],
    }
    cost = {s: 0 for s in ("L", "O", "C", "N")}
    best = {}
    for s in ("LO", "OC", "CN", "LOC", "OCN", "LOCN"):
        cands = [(cost[a] + cost[b] + card[s], f"{a}*{b}")
                 for a, b in splits[s]]
        mc = min(c for c, _ in cands)
        cost[s] = mc
        # first-wins on ties, matching the SQL CASE precedence
        best[s] = next(l for c, l in cands if c == mc)
    subsets = ["C", "CN", "L", "LO", "LOC", "LOCN", "N", "O", "OC",
               "OCN"]
    return pa.table({
        "subset": pa.array(subsets, pa.string()),
        "n_rows_est": pa.array([card[s] for s in subsets], pa.int64()),
        "best_cost": pa.array([cost[s] for s in subsets], pa.int64()),
        "best_split": pa.array([best.get(s, "-") for s in subsets],
                               pa.string()),
    })


def selinger_plan_sql() -> str:
    return """
WITH st AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS nl,
         (SELECT CAST(count(*) AS BIGINT) FROM orders) AS no_,
         (SELECT CAST(count(*) AS BIGINT) FROM customer) AS nc,
         (SELECT CAST(count(*) AS BIGINT) FROM nation) AS nn,
         (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
          FROM lineitem) AS d_l_ok,
         (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT)
          FROM orders) AS d_o_ok,
         (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
          FROM orders) AS d_o_ck,
         (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT)
          FROM customer) AS d_c_ck,
         (SELECT CAST(count(DISTINCT c_nationkey) AS BIGINT)
          FROM customer) AS d_c_nk,
         (SELECT CAST(count(DISTINCT n_nationkey) AS BIGINT)
          FROM nation) AS d_n_nk),
card AS (
  SELECT *,
         nl * no_ // greatest(d_l_ok, d_o_ok) AS c_lo,
         no_ * nc // greatest(d_o_ck, d_c_ck) AS c_oc,
         nc * nn // greatest(d_c_nk, d_n_nk) AS c_cn
  FROM st),
card2 AS (
  SELECT *,
         c_lo * nc // greatest(d_o_ck, d_c_ck) AS c_loc,
         c_oc * nn // greatest(d_c_nk, d_n_nk) AS c_ocn
  FROM card),
card3 AS (
  SELECT *, c_loc * nn // greatest(d_c_nk, d_n_nk) AS c_locn
  FROM card2),
dp AS (
  SELECT *,
         c_lo AS k_lo, c_oc AS k_oc, c_cn AS k_cn,
         least(c_lo + c_loc, c_oc + c_loc) AS k_loc,
         least(c_oc + c_ocn, c_cn + c_ocn) AS k_ocn
  FROM card3),
dp2 AS (
  SELECT *,
         least(k_loc + c_locn, k_lo + k_cn + c_locn,
               k_ocn + c_locn) AS k_locn
  FROM dp)
SELECT * FROM (
  SELECT 'L' AS subset, nl AS n_rows_est,
         CAST(0 AS BIGINT) AS best_cost, '-' AS best_split FROM dp2
  UNION ALL
  SELECT 'O', no_, 0, '-' FROM dp2
  UNION ALL
  SELECT 'C', nc, 0, '-' FROM dp2
  UNION ALL
  SELECT 'N', nn, 0, '-' FROM dp2
  UNION ALL
  SELECT 'LO', c_lo, k_lo, 'L*O' FROM dp2
  UNION ALL
  SELECT 'OC', c_oc, k_oc, 'O*C' FROM dp2
  UNION ALL
  SELECT 'CN', c_cn, k_cn, 'C*N' FROM dp2
  UNION ALL
  SELECT 'LOC', c_loc, k_loc,
         CASE WHEN c_lo + c_loc <= c_oc + c_loc
              THEN 'LO*C' ELSE 'L*OC' END FROM dp2
  UNION ALL
  SELECT 'OCN', c_ocn, k_ocn,
         CASE WHEN c_oc + c_ocn <= c_cn + c_ocn
              THEN 'OC*N' ELSE 'O*CN' END FROM dp2
  UNION ALL
  SELECT 'LOCN', c_locn, k_locn,
         CASE WHEN k_loc + c_locn <= least(k_lo + k_cn + c_locn,
                                           k_ocn + c_locn)
              THEN 'LOC*N'
              WHEN k_lo + k_cn + c_locn <= k_ocn + c_locn
              THEN 'LO*CN' ELSE 'L*OCN' END FROM dp2)
ORDER BY subset"""
