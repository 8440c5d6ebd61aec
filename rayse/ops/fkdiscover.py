"""Foreign-key discovery — schema-profiling over the star schema.

``fk_discovery`` scores CANDIDATE key relationships by inclusion: for
each (child column, parent column) pair it reports the child's distinct
key count, the parent's, how many distinct child keys the parent
contains, and the containment ratio in ppm — the signal an auto-join
planner (or a human wiring up an unfamiliar lake) uses to tell real
foreign keys (containment 1e6) from coincidental overlaps. The
candidate list spans the true FK chain (lineitem->orders->customer,
lineitem->part, lineitem->supplier, supplier->nation->region) plus one
cross-domain pair (events.user_id vs customer.c_custkey) — in the
synthetic tables its id ranges coincide, so its containment is high
too; what the report still exposes is the ndv asymmetry, which is why
the op emits the raw distinct counts alongside the ratio instead of a
verdict.

Distributed shape: each side's distinct keys come from a groupby fold
(never the raw table), containment from the co-partitioned LEFT SEMI
join of the two distinct-key sets (`exchange.hash_join` — both sides
spill by the same mix(key); no broadcast assumption on either side),
and only the 7-row report reaches the driver. All counts int64 —
DuckDB hash-matched against the EXISTS oracle.

Reference relationship: none (the reference's schema is hand-wired via
JPA annotations); beyond-reference profiling family, SURVEY §2.7.
"""

from __future__ import annotations

import pyarrow as pa

CANDIDATES = [
    # (child table, child col, parent table, parent col)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
]

PPM = 1_000_000


def _distinct_keys(sf_dir: str, table: str, col: str):
    import ray.data as rd

    return (rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])
            .groupby(col).count()
            .map_batches(lambda b, c=col: b.select([c]),
                         batch_format="pyarrow"))


def fk_discovery(sf_dir: str) -> pa.Table:
    """(child, parent, ndv_child, ndv_parent, n_contained,
    containment_ppm) per candidate pair — DuckDB hash-matched."""
    from .exchange import hash_join

    rows = []
    for ct, cc, pt, pcol in CANDIDATES:
        child = _distinct_keys(sf_dir, ct, cc)
        parent = _distinct_keys(sf_dir, pt, pcol).map_batches(
            lambda b, c=pcol: b.rename_columns([f"{c}_p"]),
            batch_format="pyarrow")
        ndv_c = child.count()
        ndv_p = parent.count()
        contained = hash_join(child, parent, cc, f"{pcol}_p",
                              join_type="left semi").count()
        rows.append((f"{ct}.{cc}", f"{pt}.{pcol}", ndv_c, ndv_p,
                     contained, contained * PPM // ndv_c))
    rows.sort()
    return pa.table({
        "child": pa.array([r[0] for r in rows], pa.string()),
        "parent": pa.array([r[1] for r in rows], pa.string()),
        "ndv_child": pa.array([r[2] for r in rows], pa.int64()),
        "ndv_parent": pa.array([r[3] for r in rows], pa.int64()),
        "n_contained": pa.array([r[4] for r in rows], pa.int64()),
        "containment_ppm": pa.array([r[5] for r in rows], pa.int64()),
    })


def fk_discovery_sql() -> str:
    arms = []
    for ct, cc, pt, pcol in CANDIDATES:
        arms.append(f"""
SELECT '{ct}.{cc}' AS child, '{pt}.{pcol}' AS parent,
       (SELECT count(DISTINCT {cc}) FROM {ct}) AS ndv_child,
       (SELECT count(DISTINCT {pcol}) FROM {pt}) AS ndv_parent,
       (SELECT count(*) FROM (SELECT DISTINCT {cc} FROM {ct}) c
        WHERE EXISTS (SELECT 1 FROM {pt} p WHERE p.{pcol} = c.{cc}))
         AS n_contained""")
    return ("SELECT child, parent, CAST(ndv_child AS BIGINT) AS ndv_child,"
            " CAST(ndv_parent AS BIGINT) AS ndv_parent,"
            " CAST(n_contained AS BIGINT) AS n_contained,"
            f" CAST(n_contained * {PPM} // ndv_child AS BIGINT)"
            " AS containment_ppm FROM ("
            + "\nUNION ALL\n".join(arms)
            + ") ORDER BY child, parent")
