"""Fellegi-Sunter record-linkage scoring over sorted-neighborhood blocks.

The probabilistic record-linkage layer (Fellegi & Sunter 1969) on top of
the SNM blocker (`rayse/ops/snm.py`): for every candidate pair, compare
the cheap metadata fields

    lang  |  source  |  len_bkt = n_chars // 16

and score the agreement pattern with the likelihood ratio

    R = prod_f  agree_f ? m_f / u_f : (1 - m_f) / (1 - u_f)

where ``u_f`` is the chance-agreement probability estimated exactly from
the value-frequency fold (``u_f = sum_v cnt_v^2 / N^2`` — the
probability two random records agree on field f) and ``m_f`` is the
fixed match-probability prior 19/20 (the classic 0.95 default; a
deterministic constant keeps the score reproducible — EM fitting is a
seeded refinement a production run would add).

INTEGER-EXACT contract: every factor is the exact rational

    agree:     19 * N^2      /  (20 * sum cnt_v^2)
    disagree:       N^2      /  (20 * (N^2 - sum cnt_v^2))

and the emitted score is ``score_q = (10^6 * prod num) // prod den``
evaluated in unbounded Python ints on the Ray side and HUGEINT in
DuckDB — bit-for-bit.

Distributed shape: candidates come from the SNM owner+halo exchange
(predictable ``(window-1) * n`` volume); pair hydration runs through TWO
co-partitioned ``exchange.hash_join`` passes (cand x fields on a, then
on b) so neither the field table nor the candidate set is ever
broadcast or driver-materialized; the u-statistics are three
field-cardinality-sized aggregates; scoring is a vectorized
pattern-code gather against the 8-entry precomputed score table.

Reference relationship: the reference dedups by exact URL match only
(`Crawler/ServeDataBase.java`); FS scoring is the graded-evidence
linkage layer above it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FS_SCALE = 1_000_000
M_NUM, M_DEN = 19, 20
FIELDS = ("lang", "source", "len_bkt")


def _field_batch(batch: pa.Table) -> pa.Table:
    return pa.table({
        "doc_id": batch["doc_id"],
        "lang": batch["lang"],
        "source": batch["source"],
        "len_bkt": pa.array(
            batch["n_chars"].to_numpy(zero_copy_only=False) // 16,
            pa.int64()),
    })


def _u_stats(sf_dir: str) -> tuple[int, dict[str, int]]:
    """N and per-field sum of squared value counts (exact ints)."""
    import ray
    import ray.data as rd

    u_num: dict[str, int] = {}
    n = 0
    for f in FIELDS:
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "lang", "source",
                                      "n_chars"])
        agg = (ds.map_batches(_field_batch, batch_format="pyarrow")
               .groupby(f).count())
        rows = pa.concat_tables(
            [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
            promote_options="default")
        cnts = [int(x) for x in rows["count()"].to_pylist()]
        u_num[f] = sum(c * c for c in cnts)
        n = sum(cnts)
    return n, u_num


def _pattern_scores(n: int, u_num: dict[str, int]) -> list[int]:
    """score_q for each 3-bit agreement pattern (bit i = FIELDS[i])."""
    n2 = n * n
    out = []
    for pat in range(8):
        num, den = FS_SCALE, 1
        for i, f in enumerate(FIELDS):
            if (pat >> i) & 1:
                num *= M_NUM * n2
                den *= M_DEN * u_num[f]
            else:
                num *= n2
                den *= M_DEN * (n2 - u_num[f])
        out.append(num // den)
    return out


def fs_scores(sf_dir: str) -> pa.Table:
    """(doc_a, doc_b, agree_lang, agree_source, agree_len, score_q):
    Fellegi-Sunter likelihood-ratio scores for every SNM candidate pair
    — DuckDB hash-matched against the HUGEINT rational oracle."""
    import ray
    import ray.data as rd

    from .exchange import hash_join
    from .snm import snm_candidates

    cand = snm_candidates(sf_dir)
    fields = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"]).map_batches(
            _field_batch, batch_format="pyarrow")

    ja = hash_join(cand, fields, "a", "doc_id")

    def rename_a(batch: pa.Table) -> pa.Table:
        return pa.table({
            "a": batch["a"], "b": batch["b"],
            "lang_a": batch["lang"], "source_a": batch["source"],
            "len_a": batch["len_bkt"],
        })

    fields2 = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"]).map_batches(
            _field_batch, batch_format="pyarrow")
    jb = hash_join(ja.map_batches(rename_a, batch_format="pyarrow"),
                   fields2, "b", "doc_id")

    n, u_num = _u_stats(sf_dir)
    scores = np.array(_pattern_scores(n, u_num), dtype=np.int64)

    def score_batch(batch: pa.Table) -> pa.Table:
        al = np.asarray(batch["lang_a"].to_pylist(), dtype=object)
        bl = np.asarray(batch["lang"].to_pylist(), dtype=object)
        asrc = np.asarray(batch["source_a"].to_pylist(), dtype=object)
        bsrc = np.asarray(batch["source"].to_pylist(), dtype=object)
        alen = batch["len_a"].to_numpy(zero_copy_only=False)
        blen = batch["len_bkt"].to_numpy(zero_copy_only=False)
        g_lang = (al == bl).astype(np.int64)
        g_src = (asrc == bsrc).astype(np.int64)
        g_len = (alen == blen).astype(np.int64)
        pat = g_lang | (g_src << 1) | (g_len << 2)
        return pa.table({
            "doc_a": batch["a"], "doc_b": batch["b"],
            "agree_lang": pa.array(g_lang, pa.int64()),
            "agree_source": pa.array(g_src, pa.int64()),
            "agree_len": pa.array(g_len, pa.int64()),
            "score_q": pa.array(scores[pat], pa.int64()),
        })

    out = jb.map_batches(score_batch, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    return tbl.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


def fs_scores_sql() -> str:
    from .snm import SNM_WINDOW, _skey_sql

    m, d = M_NUM, M_DEN
    agree = {f: f"CAST({m} AS HUGEINT) * nn" for f in FIELDS}
    num_f = {
        "lang": f"CASE WHEN agree_lang = 1 THEN {agree['lang']} "
                "ELSE CAST(1 AS HUGEINT) * nn END",
        "source": f"CASE WHEN agree_source = 1 THEN {agree['source']} "
                  "ELSE CAST(1 AS HUGEINT) * nn END",
        "len_bkt": f"CASE WHEN agree_len = 1 THEN {agree['len_bkt']} "
                   "ELSE CAST(1 AS HUGEINT) * nn END",
    }
    den_f = {
        "lang": f"CASE WHEN agree_lang = 1 THEN CAST({d} AS HUGEINT)"
                f" * ul ELSE CAST({d} AS HUGEINT) * (nn - ul) END",
        "source": f"CASE WHEN agree_source = 1 THEN CAST({d} AS HUGEINT)"
                  f" * us ELSE CAST({d} AS HUGEINT) * (nn - us) END",
        "len_bkt": f"CASE WHEN agree_len = 1 THEN CAST({d} AS HUGEINT)"
                   f" * ub ELSE CAST({d} AS HUGEINT) * (nn - ub) END",
    }
    return f"""
WITH k AS (SELECT doc_id, {_skey_sql()} AS skey FROM documents),
rk AS (SELECT doc_id,
              row_number() OVER (ORDER BY skey, doc_id) AS r
       FROM k),
cand AS (
  SELECT least(a.doc_id, b.doc_id) AS doc_a,
         greatest(a.doc_id, b.doc_id) AS doc_b
  FROM rk a JOIN rk b ON b.r > a.r AND b.r < a.r + {SNM_WINDOW}),
f AS (SELECT doc_id, lang, source, n_chars // 16 AS len_bkt
      FROM documents),
stats AS (
  SELECT CAST((SELECT count(*) FROM documents) AS HUGEINT)
           * (SELECT count(*) FROM documents) AS nn,
         (SELECT CAST(sum(c * c) AS HUGEINT) FROM
            (SELECT count(*) AS c FROM documents GROUP BY lang)) AS ul,
         (SELECT CAST(sum(c * c) AS HUGEINT) FROM
            (SELECT count(*) AS c FROM documents GROUP BY source)) AS us,
         (SELECT CAST(sum(c * c) AS HUGEINT) FROM
            (SELECT count(*) AS c FROM documents
             GROUP BY n_chars // 16)) AS ub
),
pairs AS (
  SELECT c.doc_a, c.doc_b,
         CASE WHEN fa.lang = fb.lang THEN 1 ELSE 0 END AS agree_lang,
         CASE WHEN fa.source = fb.source THEN 1 ELSE 0 END
           AS agree_source,
         CASE WHEN fa.len_bkt = fb.len_bkt THEN 1 ELSE 0 END
           AS agree_len
  FROM cand c
  JOIN f fa ON fa.doc_id = c.doc_a
  JOIN f fb ON fb.doc_id = c.doc_b
)
SELECT doc_a, doc_b,
       CAST(agree_lang AS BIGINT) AS agree_lang,
       CAST(agree_source AS BIGINT) AS agree_source,
       CAST(agree_len AS BIGINT) AS agree_len,
       CAST((CAST({FS_SCALE} AS HUGEINT)
             * ({num_f['lang']}) * ({num_f['source']})
             * ({num_f['len_bkt']}))
            // (({den_f['lang']}) * ({den_f['source']})
                * ({den_f['len_bkt']})) AS BIGINT) AS score_q
FROM pairs CROSS JOIN stats
ORDER BY doc_a, doc_b
"""


def er_components(sf_dir: str) -> pa.Table:
    """(node, comp_id): entity-resolution clusters — connected
    components over the SNM candidate pairs whose every compared field
    agrees (the deterministic FS decision rule at the all-agree
    pattern), comp_id = smallest doc_id in the cluster. Routes through
    the shared CC machinery (driver union-find below
    ``dedup.DRIVER_MAX_PAIRS``, distributed min-label propagation
    above). DuckDB hash-matched against the recursive min-label
    oracle."""
    import ray
    import ray.data as rd

    from .dedup import DRIVER_MAX_PAIRS, _cc_distributed, _cc_driver

    full = fs_scores(sf_dir)
    keep = full.filter(
        pa.compute.and_(
            pa.compute.and_(
                pa.compute.equal(full["agree_lang"], 1),
                pa.compute.equal(full["agree_source"], 1)),
            pa.compute.equal(full["agree_len"], 1))).select(
        ["doc_a", "doc_b"])
    if keep.num_rows == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "comp_id": pa.array([], pa.int64())})
    if keep.num_rows <= DRIVER_MAX_PAIRS:
        cc = _cc_driver(keep)
    else:
        cc = _cc_distributed(rd.from_arrow(keep))
    return pa.table({"node": cc["doc_id"], "comp_id": cc["cluster_id"]})


def er_components_sql() -> str:
    from .snm import SNM_WINDOW, _skey_sql

    return f"""
WITH RECURSIVE er_k AS (
  SELECT doc_id, {_skey_sql()} AS skey FROM documents),
er_rk AS (SELECT doc_id,
                 row_number() OVER (ORDER BY skey, doc_id) AS r
          FROM er_k),
er_cand AS (
  SELECT least(a.doc_id, b.doc_id) AS doc_a,
         greatest(a.doc_id, b.doc_id) AS doc_b
  FROM er_rk a JOIN er_rk b ON b.r > a.r AND b.r < a.r + {SNM_WINDOW}),
er_f AS (SELECT doc_id, lang, source, n_chars // 16 AS len_bkt
         FROM documents),
er_p AS (
  SELECT DISTINCT c.doc_a, c.doc_b
  FROM er_cand c
  JOIN er_f fa ON fa.doc_id = c.doc_a
  JOIN er_f fb ON fb.doc_id = c.doc_b
  WHERE fa.lang = fb.lang AND fa.source = fb.source
    AND fa.len_bkt = fb.len_bkt),
er_ue AS (SELECT doc_a AS a, doc_b AS b FROM er_p
          UNION ALL SELECT doc_b, doc_a FROM er_p),
er_lbl(node, lbl) AS (
  SELECT a AS node, least(a, min(b)) AS lbl FROM er_ue GROUP BY a
  UNION
  SELECT e.a AS node, least(l.lbl, e.a) AS lbl
  FROM er_ue e JOIN er_lbl l ON e.b = l.node)
SELECT node, CAST(min(lbl) AS BIGINT) AS comp_id
FROM er_lbl GROUP BY node
ORDER BY node"""
