"""TPC-H shape completion: the Q2-analog correlated min with
join-back, and the Q9-analog multi-dimension profit rollup.

`min_cost_supplier` (Q2 analog): for every part in a (size, type)
slice, the cheapest unit cost offered by any supplier in one region,
and the supplier achieving it. No `partsupp` table exists in the
testdata star schema, so lineitem plays the supply-cost book: unit
cost = floor(price_cents * 1e6 / quantity) — the truncating-micro
quantization every fixed-point cell here uses, identical in numpy and
DuckDB HUGEINT floor division. The correlated scalar subquery
(`cost = (SELECT min(cost) ...)`) and the join-back the SQL writes
never materialize on the Ray side: each batch emits a per-part
PARTIAL carrying the lexicographic (cost, suppkey) argmin — the
`ohlc.py` argmin-combiner shape — and the driver folds partials
bounded by parts x blocks (part is a dimension table). Supplier→
(region member, nation) and the part slice ride ONE broadcast.

`profit_by_nation_year` (Q9 analog): revenue of part-name-matched
lineitems grouped by (supplier nation, order year). The part-name
filter and supplier→nation are broadcast dimension gathers; the
order-year column arrives through the co-partitioned orderkey
`hash_join` (the fact-fact exchange — Q9's only true shuffle).
Real Q9 subtracts ps_supplycost·qty; with no partsupp the profit
measure is revenue alone (documented divergence, shape preserved).

Reference relationship: extends the reference's single-table ranking
SQL (`Ranker/RankerMainProcess/Ranker1.java` reads one joined
projection) to the canonical warehouse join shapes its PostgreSQL
schema would need; no reference code computes these.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

Q2_SIZE_LO = 1
Q2_SIZE_HI = 15
Q2_TYPE = "SMALL"
Q2_REGION = "EUROPE"
Q2_K = 100

Q9_NEEDLE = "gear"


def _region_suppliers(sf_dir: str):
    """(sorted suppkeys in region, their nationkeys, nation-name map)."""
    import pyarrow.parquet as pq

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = reg["r_regionkey"].to_numpy(zero_copy_only=False)
    rname = np.asarray(reg["r_name"].to_pylist(), dtype=object)
    want_rk = set(rk[rname == Q2_REGION].tolist())

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nreg = nat["n_regionkey"].to_numpy(zero_copy_only=False)
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    o = np.argsort(nk, kind="stable")
    nk, nreg, nname = nk[o], nreg[o], nname[o]
    in_region_nat = np.isin(nreg, list(want_rk))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    o = np.argsort(sk, kind="stable")
    sk, snat = sk[o], snat[o]
    member = in_region_nat[np.searchsorted(nk, snat)]
    return sk[member], snat[member], nk, nname


def min_cost_supplier(sf_dir: str, k: int = Q2_K) -> pa.Table:
    """(s_acctbal_cents, s_name, n_name, p_partkey, p_name,
    cost_micro, s_suppkey): cheapest in-region supplier per sliced
    part, Q2 order/limit — DuckDB hash-matched."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .relational import _cents

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_type",
                                  "p_size"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    psize = part["p_size"].to_numpy(zero_copy_only=False)
    ptype = np.asarray(part["p_type"].to_pylist(), dtype=object)
    pname = np.asarray(part["p_name"].to_pylist(), dtype=object)
    o = np.argsort(pk, kind="stable")
    pk, psize, ptype, pname = pk[o], psize[o], ptype[o], pname[o]
    sliced = ((psize >= Q2_SIZE_LO) & (psize <= Q2_SIZE_HI)
              & (ptype == Q2_TYPE))
    slice_keys = pk[sliced]

    rsk, _rsnat, _nk, _nname = _region_suppliers(sf_dir)
    dims_ref = ray.put((slice_keys, rsk))

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_suppkey",
                                    "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        skeys, region_sk = ray.get(dims_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        ls = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        j = np.searchsorted(skeys, lp)
        in_p = (j < skeys.size) & (skeys[np.minimum(j, skeys.size - 1)]
                                   == lp)
        js = np.searchsorted(region_sk, ls)
        in_s = (js < region_sk.size) & (
            region_sk[np.minimum(js, region_sk.size - 1)] == ls)
        m = in_p & in_s
        if not m.any():
            return pa.table({"pk": pa.array([], pa.int64()),
                             "cost": pa.array([], pa.int64()),
                             "sk": pa.array([], pa.int64())})
        lp, ls = lp[m], ls[m]
        cents = _cents(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)[m], 100.0)
        qty = batch["l_quantity"].to_numpy(
            zero_copy_only=False)[m].astype(np.int64)
        cost = cents * 1_000_000 // qty
        order = np.lexsort((ls, cost, lp))
        glp = lp[order]
        firsts = np.concatenate(([True], glp[1:] != glp[:-1]))
        pick = order[firsts]
        return pa.table({"pk": pa.array(lp[pick], pa.int64()),
                         "cost": pa.array(cost[pick], pa.int64()),
                         "sk": pa.array(ls[pick], pa.int64())})

    parts_t = pa.concat_tables(
        [t for t in ray.get(
            line.map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows],
        promote_options="default")
    gp = parts_t["pk"].to_numpy(zero_copy_only=False)
    gc = parts_t["cost"].to_numpy(zero_copy_only=False)
    gs = parts_t["sk"].to_numpy(zero_copy_only=False)
    order = np.lexsort((gs, gc, gp))
    gpo = gp[order]
    firsts = np.concatenate(([True], gpo[1:] != gpo[:-1]))
    pick = order[firsts]
    win_pk, win_cost, win_sk = gp[pick], gc[pick], gs[pick]

    sup = pq.read_table(f"{sf_dir}/supplier.parquet")
    sk_all = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    o = np.argsort(sk_all, kind="stable")
    sk_all = sk_all[o]
    sname = np.asarray(sup["s_name"].to_pylist(), dtype=object)[o]
    sbal = _cents(sup["s_acctbal"].to_numpy(zero_copy_only=False),
                  100.0)[o]
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)[o]
    _rsk2, _rsn2, nk, nname = _region_suppliers(sf_dir)
    si = np.searchsorted(sk_all, win_sk)
    ni = np.searchsorted(nk, snat[si])
    pi = np.searchsorted(pk, win_pk)

    bal = sbal[si]
    nnm = nname[ni].astype(str)
    snm = sname[si].astype(str)
    final = np.lexsort((win_pk, snm, nnm, -bal))[:k]
    return pa.table({
        "s_acctbal_cents": pa.array(bal[final], pa.int64()),
        "s_name": pa.array(snm[final].tolist(), pa.string()),
        "n_name": pa.array(nnm[final].tolist(), pa.string()),
        "p_partkey": pa.array(win_pk[final], pa.int64()),
        "p_name": pa.array(pname[pi][final].tolist(), pa.string()),
        "cost_micro": pa.array(win_cost[final], pa.int64()),
        "s_suppkey": pa.array(win_sk[final], pa.int64()),
    })


def min_cost_supplier_sql(k: int = Q2_K) -> str:
    return f"""
WITH p AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
    AND p_type = '{Q2_TYPE}'),
rs AS (
  SELECT s_suppkey, s_name,
         CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
         n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'),
rows_ AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         CAST(CAST(round(l_extendedprice * 100) AS HUGEINT) * 1000000
              // CAST(l_quantity AS HUGEINT) AS BIGINT) AS cost
  FROM lineitem JOIN rs ON l_suppkey = rs.s_suppkey
       JOIN p ON l_partkey = p.p_partkey),
m AS (SELECT pk, min(cost) AS mc FROM rows_ GROUP BY pk),
w AS (
  SELECT r.pk, m.mc AS cost, min(r.sk) AS sk
  FROM rows_ r JOIN m ON r.pk = m.pk AND r.cost = m.mc
  GROUP BY r.pk, m.mc)
SELECT rs.s_acctbal_cents, rs.s_name, rs.n_name,
       w.pk AS p_partkey, p.p_name, w.cost AS cost_micro,
       w.sk AS s_suppkey
FROM w JOIN rs ON w.sk = rs.s_suppkey
     JOIN p ON w.pk = p.p_partkey
ORDER BY rs.s_acctbal_cents DESC, rs.n_name, rs.s_name, w.pk
LIMIT {k}"""


def profit_by_nation_year(sf_dir: str) -> pa.Table:
    """(nation, o_year, profit_rev_only): 1e-4-unit revenue of '{Q9_NEEDLE}'
    parts by supplier nation and order year, nation asc / year desc —
    DuckDB hash-matched."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from .exchange import hash_join
    from .tpch import _rev_q

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    pname = np.asarray(part["p_name"].to_pylist(), dtype=object)
    hit = np.char.find(pname.astype(str), Q9_NEEDLE) >= 0
    match_keys = np.sort(pk[hit])

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    snat = sup["s_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    o = np.argsort(sk, kind="stable")
    sk, snat = sk[o], snat[o]

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    nname = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    o = np.argsort(nk, kind="stable")
    nk, nname = nk[o], nname[o]

    dims_ref = ray.put((match_keys, sk, snat))

    line = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_partkey",
                                    "l_suppkey", "l_extendedprice",
                                    "l_discount"])

    def prep_line(batch: pa.Table) -> pa.Table:
        mkeys, skeys, snk = ray.get(dims_ref)
        lp = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        j = np.searchsorted(mkeys, lp)
        m = (j < mkeys.size) & (mkeys[np.minimum(j, mkeys.size - 1)]
                                == lp)
        sub = batch.filter(pa.array(m))
        ls = sub["l_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        rev = _rev_q(sub["l_extendedprice"].to_numpy(
                         zero_copy_only=False),
                     sub["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table({
            "l_orderkey": sub["l_orderkey"],
            "nat": pa.array(snk[np.searchsorted(skeys, ls)],
                            pa.int64()),
            "rev": pa.array(rev, pa.int64()),
        })

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def prep_orders(batch: pa.Table) -> pa.Table:
        yr = (batch["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[Y]").astype(np.int64) + 1970)
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "o_year": pa.array(yr, pa.int64())})

    j = hash_join(
        line.map_batches(prep_line, batch_format="pyarrow"),
        orders.map_batches(prep_orders, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")

    def partial(batch: pa.Table) -> pa.Table:
        natc = batch["nat"].to_numpy(zero_copy_only=False)
        yr = batch["o_year"].to_numpy(zero_copy_only=False)
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        key = natc * 4096 + yr
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(uk, pa.int64()),
            "rev": pa.array(np.bincount(inv, rev, uk.size)
                            .astype(np.int64), pa.int64()),
        })

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("key").sum("rev"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    key = tbl["key"].to_numpy(zero_copy_only=False)
    rev = tbl["sum(rev)"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    natc, yr = key // 4096, key % 4096
    nm = nname[np.searchsorted(nk, natc)].astype(str)
    order = np.lexsort((-yr, nm))
    return pa.table({
        "nation": pa.array(nm[order].tolist(), pa.string()),
        "o_year": pa.array(yr[order], pa.int64()),
        "profit_rev_only": pa.array(rev[order], pa.int64()),
    })


def profit_by_nation_year_sql() -> str:
    return f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS profit_rev_only
FROM lineitem
     JOIN orders ON l_orderkey = o_orderkey
     JOIN supplier ON l_suppkey = s_suppkey
     JOIN nation ON s_nationkey = n_nationkey
     JOIN part ON l_partkey = p_partkey
WHERE p_name LIKE '%{Q9_NEEDLE}%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC"""
