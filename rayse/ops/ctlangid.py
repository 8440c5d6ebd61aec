"""Cavnar-Trenkle n-gram rank-profile language identification (1994,
"N-Gram-Based Text Categorization") — the rank-order sibling of the NB
classifier (`rayse/ops/classify.py`): no probabilities, just profile
rank displacement, so every number is a small exact integer.

Profiles: the top ``PROFILE_N`` char trigrams by (count desc, trigram
asc) — per language over its documents (training) and per document
(scoring). Distance(doc, lang) = sum over the doc profile of
``|rank_doc - rank_lang|`` when the trigram is in the language profile
else the out-of-profile penalty ``PROFILE_N``; prediction = argmin
(language-ascending tie-break).

Distributed shape: training = per-batch (lang, trigram) partial counts
(np.unique over batch-concatenated trigram streams — trigram space is
char^3-bounded) -> one groupby -> driver top-N per language (a
languages x N table, broadcast via ray.put). Scoring is row-local per
batch: per-doc trigram counts, top-N profile, a vectorized
rank-displacement gather against each language profile.

Reference relationship: complements the heuristic lang-id of
`rayse/ops/textstats.py` (SURVEY §2.2 text-analysis family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PROFILE_N = 20


def _doc_trigrams(text: str) -> list[str]:
    return [text[i:i + 3] for i in range(len(text) - 2)]


def _top_profile(grams: np.ndarray, counts: np.ndarray,
                 n: int) -> list[str]:
    order = np.lexsort((grams.astype(str), -counts))[:n]
    return [str(g) for g in grams[order]]


def _tri_partials(batch: pa.Table) -> pa.Table:
    langs = batch["lang"].to_pylist()
    texts = batch["text"].to_pylist()
    keys = []
    for lg, tx in zip(langs, texts):
        keys.extend(f"{lg}\x1f{g}" for g in _doc_trigrams(tx or ""))
    if not keys:
        return pa.table({"lang": pa.array([], pa.string()),
                         "g": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    uk, cnt = np.unique(np.asarray(keys, dtype=object), return_counts=True)
    lg, g = zip(*(k.split("\x1f", 1) for k in uk))
    return pa.table({
        "lang": pa.array(list(lg), pa.string()),
        "g": pa.array(list(g), pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def ct_langid(sf_dir: str, n: int = PROFILE_N) -> pa.Table:
    """(doc_id, pred, dist): Cavnar-Trenkle prediction and rank
    displacement per document — DuckDB hash-matched against the
    row_number profile oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text"])
    agg = (ds.map_batches(_tri_partials, batch_format="pyarrow")
           .groupby(["lang", "g"]).sum("cnt"))
    rows = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    lg = np.asarray(rows["lang"].to_pylist(), dtype=object)
    g = np.asarray(rows["g"].to_pylist(), dtype=object)
    cnt = rows["sum(cnt)"].to_numpy(zero_copy_only=False)
    langs = sorted(set(lg.tolist()))
    profiles = {}
    for l_ in langs:
        m = lg == l_
        prof = _top_profile(g[m], cnt[m], n)
        profiles[l_] = {gram: r + 1 for r, gram in enumerate(prof)}
    ref = ray.put((langs, profiles))

    def score(batch: pa.Table) -> pa.Table:
        lgs, profs = ray.get(ref)
        docs = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_d, out_p, out_s = [], [], []
        for d, tx in zip(docs, texts):
            trig = _doc_trigrams(tx or "")
            if not trig:
                continue
            ug, uc = np.unique(np.asarray(trig, dtype=object),
                               return_counts=True)
            prof = _top_profile(ug, uc, n)
            best_l, best_s = None, None
            for l_ in lgs:
                lp = profs[l_]
                s = sum(abs((r + 1) - lp[gr]) if gr in lp else n
                        for r, gr in enumerate(prof))
                if best_s is None or s < best_s:
                    best_l, best_s = l_, s
            out_d.append(int(d))
            out_p.append(best_l)
            out_s.append(int(best_s))
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "pred": pa.array(out_p, pa.string()),
            "dist": pa.array(out_s, pa.int64()),
        })

    ds2 = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
    out = ds2.map_batches(score, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    return tbl.sort_by("doc_id")


def ct_langid_sql(n: int = PROFILE_N) -> str:
    return f"""
WITH tri AS (
  SELECT doc_id, lang, substr(text, p + 1, 3) AS g
  FROM (SELECT doc_id, lang, text,
               unnest(range(length(text) - 2)) AS p
        FROM documents WHERE length(text) >= 3)
),
lc AS (SELECT lang, g, count(*) AS cnt FROM tri GROUP BY lang, g),
lprof AS (
  SELECT lang, g,
         row_number() OVER (PARTITION BY lang
                            ORDER BY cnt DESC, g) AS r
  FROM lc QUALIFY r <= {n}
),
dc AS (SELECT doc_id, g, count(*) AS cnt FROM tri GROUP BY doc_id, g),
dprof AS (
  SELECT doc_id, g,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, g) AS r
  FROM dc QUALIFY r <= {n}
),
langs AS (SELECT DISTINCT lang FROM documents),
dist AS (
  SELECT d.doc_id, langs.lang,
         CAST(sum(CASE WHEN lp.r IS NULL THEN {n}
                       ELSE abs(d.r - lp.r) END) AS BIGINT) AS s
  FROM dprof d
  CROSS JOIN langs
  LEFT JOIN lprof lp ON lp.lang = langs.lang AND lp.g = d.g
  GROUP BY d.doc_id, langs.lang
),
best AS (
  SELECT doc_id, lang AS pred, s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s, lang) AS rn
  FROM dist
)
SELECT doc_id, pred, CAST(s AS BIGINT) AS dist
FROM best WHERE rn = 1
ORDER BY doc_id"""


# ---------------------------------------------------------------------------
# Source-pair character-trigram cosine — corpus-level stylistic
# similarity between sources over the SAME trigram fold as the
# Cavnar-Trenkle profiles. Exactness: cosine is emitted SQUARED in ppm
# (cos2_ppm = dot^2 * 1e6 // (n2_a * n2_b)) so the whole statistic
# stays in integer arithmetic — no sqrt ulp, Python bigints on the
# driver, HUGEINT in the oracle. The per-source trigram vector is
# vocabulary-bounded (char^3), the standing bounded-histogram
# contract.
# ---------------------------------------------------------------------------


def _src_tri_partials(batch: pa.Table) -> pa.Table:
    srcs = batch["source"].to_pylist()
    texts = batch["text"].to_pylist()
    keys = []
    for s, tx in zip(srcs, texts):
        keys.extend(f"{s}\x1f{g}" for g in _doc_trigrams(tx or ""))
    if not keys:
        return pa.table({"source": pa.array([], pa.string()),
                         "g": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    uk, cnt = np.unique(np.asarray(keys, dtype=object),
                        return_counts=True)
    s, g = zip(*(k.split("\x1f", 1) for k in uk))
    return pa.table({
        "source": pa.array(list(s), pa.string()),
        "g": pa.array(list(g), pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def source_trigram_cos(sf_dir: str) -> pa.Table:
    """(src_a, src_b, dot, cos2_ppm): squared trigram-cosine between
    every ordered source pair — DuckDB hash-matched against the
    HUGEINT self-join oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    agg = (ds.map_batches(_src_tri_partials, batch_format="pyarrow")
           .groupby(["source", "g"]).sum("cnt"))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    src = np.asarray(tbl["source"].to_pylist(), dtype=object)
    g = np.asarray(tbl["g"].to_pylist(), dtype=object)
    c = tbl["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
    sources = sorted(set(src.tolist()))
    vecs = {}
    for s in sources:
        m = src == s
        vecs[s] = dict(zip(g[m].tolist(), (int(v) for v in c[m])))
    n2 = {s: sum(v * v for v in vecs[s].values()) for s in sources}
    out_a, out_b, out_d, out_c = [], [], [], []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            va, vb = vecs[a], vecs[b]
            if len(vb) < len(va):
                va, vb = vb, va
            dot = sum(v * vb.get(k, 0) for k, v in va.items())
            out_a.append(a)
            out_b.append(b)
            out_d.append(dot)
            out_c.append(dot * dot * 1_000_000 // (n2[a] * n2[b]))
    return pa.table({
        "src_a": pa.array(out_a, pa.string()),
        "src_b": pa.array(out_b, pa.string()),
        "dot": pa.array(out_d, pa.int64()),
        "cos2_ppm": pa.array(out_c, pa.int64()),
    })


def source_trigram_cos_sql() -> str:
    return """
WITH tri AS (
  SELECT source, substr(text, p + 1, 3) AS g
  FROM (SELECT source, text,
               unnest(range(length(text) - 2)) AS p
        FROM documents WHERE length(text) >= 3)),
t AS (SELECT source, g, CAST(count(*) AS HUGEINT) AS c
      FROM tri GROUP BY source, g),
n2 AS (SELECT source, sum(c * c) AS nn FROM t GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(sum(a.c * b.c) AS HUGEINT) AS dot
  FROM t a JOIN t b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2)
SELECT src_a, src_b, CAST(dot AS BIGINT) AS dot,
       CAST(dot * dot * 1000000 // (na.nn * nb.nn) AS BIGINT)
         AS cos2_ppm
FROM pairs
     JOIN n2 na ON na.source = src_a
     JOIN n2 nb ON nb.source = src_b
ORDER BY src_a, src_b"""
