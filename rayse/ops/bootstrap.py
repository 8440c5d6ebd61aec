"""Poisson bootstrap — the scalable uncertainty estimator for massive
data (Chamandy et al. 2012, Google: classical resampling needs global
row draws; the Poisson approximation makes every row's resample
multiplicity ROW-LOCAL, which is the only shape that survives 100 TB).

Determinism contract: row j's multiplicity in resample b is the exact
inverse-CDF of Poisson(λ=1) at u = splitmix-mix(j·B + b) (uint64),
with the CDF quantized ONCE to nine hard-coded integer thresholds
T_k = floor(2^64·P(X≤k)) — so both engines count thresholds ≤ u with
pure uint64 comparisons: no runtime float, no RNG state, independent
of partitioning and order (the repo's deterministic-seed recipe, as
`dp_event_counts`). Multiplicities ≥ 9 truncate (P ≈ 1.1e-7 at λ=1;
documented).

Distributed shape: per-batch int64 partials (b, Σc·cents, Σc) —
B × blocks rows — one tiny groupby, driver emits the per-resample
table. The bootstrap CI (order statistics over the B sums) is then a
driver-side selection.

Reference relationship: none (statistics family; the uncertainty
companion of `trimmed_stats`/`mad_outliers`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import _mix

BOOT_B = 64
# floor(2^64 * CDF_Poisson(1)(k)), k = 0..8 (exact, precomputed)
POIS1_T = (6786177901268885274, 13572355802537770549,
           16965444753172213186, 18096474403383694065,
           18379231815936564285, 18435783298447138329,
           18445208545532234003, 18446555009401533385,
           18446723317385195808)


def _pois1_counts(u: np.ndarray) -> np.ndarray:
    """Inverse-CDF Poisson(1) multiplicity per uint64 draw."""
    c = np.zeros(u.size, np.int64)
    for t in POIS1_T:
        c += (u >= np.uint64(t)).astype(np.int64)
    return c


def bootstrap_resamples(sf_dir: str, b: int = BOOT_B) -> pa.Table:
    """(b, n, sum_cents): the ``b`` Poisson resamples of total event
    value — DuckDB hash-matched."""
    import ray
    import ray.data as rd

    from .relational import _cents

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        # (rows, B) multiplicities from mixed draw keys j*B + rb
        keys = (eid[:, None] * b
                + np.arange(b, dtype=np.int64)[None, :])
        c = _pois1_counts(_mix(keys.astype(np.uint64)).ravel()) \
            .reshape(eid.size, b)
        return pa.table({
            "b": pa.array(np.arange(b, dtype=np.int64), pa.int64()),
            "s": pa.array((c * cents[:, None]).sum(axis=0),
                          pa.int64()),
            "n": pa.array(c.sum(axis=0), pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("b").sum(["s", "n"]))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    bb = tbl["b"].to_numpy(zero_copy_only=False)
    o = np.argsort(bb, kind="stable")
    return pa.table({
        "b": pa.array(bb[o], pa.int64()),
        "n": pa.array(tbl["sum(n)"].to_numpy(zero_copy_only=False)[o]
                      .astype(np.int64), pa.int64()),
        "sum_cents": pa.array(
            tbl["sum(s)"].to_numpy(zero_copy_only=False)[o]
            .astype(np.int64), pa.int64()),
    })


def bootstrap_resamples_sql(b: int = BOOT_B) -> str:
    from .sketch import _mix_sql_wide

    mixed = _mix_sql_wide(f"(e.event_id * {b} + rb.b)::HUGEINT")
    cnt = " + ".join(
        f"CASE WHEN m >= {t}::HUGEINT THEN 1 ELSE 0 END"
        for t in POIS1_T)
    return f"""
WITH rb AS (SELECT unnest(range({b})) AS b),
draws AS (
  SELECT rb.b, CAST(round(e.value * 100) AS BIGINT) AS cents,
         {mixed} AS m
  FROM events e CROSS JOIN rb),
mult AS (SELECT b, cents, {cnt} AS c FROM draws)
SELECT CAST(b AS BIGINT) AS b,
       CAST(sum(c) AS BIGINT) AS n,
       CAST(sum(c * cents) AS BIGINT) AS sum_cents
FROM mult GROUP BY b ORDER BY b"""
