"""TextRank keyword extraction (Mihalcea & Tarau 2004) — the classic
graph-based keyword scorer, in its WEIGHTED form (edge weight = number of
co-occurring position pairs within the window; the variant the paper
recommends for keyword graphs with meaningful tie strengths — the
unweighted graph over this corpus's closed vocabulary is regular and
ranks uniformly, which the weighted recursion differentiates).

Nodes are words (node id = FNV(word) >> 1 — deterministic and
SQL-mirrorable; a collision merges two words into one node identically on
both sides, so parity is unconditional). Edges carry both orientations
(the paper's undirected graph). The recursion is integer fixed-point in
the `graph.pagerank_fixed` idiom with classic d = 0.85 damping:

    link[v]  = Σ_{(u,v) ∈ E} (rank[u] * cnt(u,v)) // wout[u]
    rank'[v] = (85 * link[v]) // 100 + (15 * scale) // (100 * n)

Integer sums are order-independent, so the DuckDB recursive-CTE oracle
matches bit-for-bit. Bound: rank ≤ scale and cnt ≤ wout, so the per-edge
product is ≤ scale * wout — scale = 10**9 leaves headroom for ~9e9
co-occurrences per word before int64 overflow (document larger corpora
by dropping scale).

Scale shape: edge-count derivation is W vectorized shift passes per
batch with per-batch partial counts (order-independent sums, NOT
per-batch dedup — counts must not depend on batching), then ONE groupby
to global counts — output bounded by the co-occurrence graph size, not
the corpus; each iteration streams the (vocab-bounded) edge table with
the rank vector broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TEXTRANK_WINDOW = 5
TEXTRANK_ITERS = 12
TEXTRANK_SCALE = 10**9
TEXTRANK_D_NUM = 85      # classic damping d = 0.85
TEXTRANK_D_DEN = 100


def _node_ids(words: np.ndarray) -> np.ndarray:
    from .textstats import _word_arr_slices, fnv64_slices

    if words.size == 0:
        return np.asarray([], dtype=np.int64)
    return (fnv64_slices(*_word_arr_slices(words))
            >> np.uint64(1)).astype(np.int64)


def _edge_partials(batch: pa.Table, window: int) -> pa.Table:
    """Per-batch PARTIAL co-occurrence counts: W shift passes over the
    concatenated token stream with a same-doc mask — no per-doc Python
    loop beyond the initial split. Counts (not dedup) so the global sum
    is independent of batch boundaries."""
    texts = batch["text"].to_pylist()
    empty = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    if not texts:
        return empty
    per_doc = [np.asarray((t or "").split(" "), dtype=object)
               for t in texts]
    lens = np.array([w.size for w in per_doc], dtype=np.int64)
    if lens.sum() == 0:
        return empty
    w = np.concatenate(per_doc)
    d = np.repeat(np.arange(len(per_doc), dtype=np.int64), lens)
    u, inv = np.unique(w, return_inverse=True)
    nid = _node_ids(u)[inv]
    srcs, dsts = [], []
    for s in range(1, window + 1):
        if s >= w.size:
            break
        same = d[:-s] == d[s:]
        a, b = nid[:-s][same], nid[s:][same]
        ne = a != b
        a, b = a[ne], b[ne]
        srcs.append(a)
        dsts.append(b)
        srcs.append(b)        # both orientations: undirected graph
        dsts.append(a)
    if not srcs:
        return empty
    pairs = np.stack([np.concatenate(srcs), np.concatenate(dsts)], axis=1)
    e, cnt = np.unique(pairs, axis=0, return_counts=True)
    return pa.table({"src": pa.array(e[:, 0], pa.int64()),
                     "dst": pa.array(e[:, 1], pa.int64()),
                     "n": pa.array(cnt.astype(np.int64), pa.int64())})


def textrank_edges(sf_dir: str, window: int = TEXTRANK_WINDOW):
    """Global (src, dst, cnt) co-occurrence-count edge Dataset."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return (ds.map_batches(_edge_partials, fn_kwargs={"window": window},
                           batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["src", "dst"]).sum("n"))


def _weighted_pagerank_fixed(edges_ds, iters: int, scale: int,
                             d_num: int, d_den: int) -> pa.Table:
    """Weighted integer PageRank over an (src, dst, sum(n)) Dataset —
    the `pagerank_fixed` streaming shape (edges stream per iteration,
    rank vector broadcast, per-batch partial sums) with per-edge
    weights. Every node of a symmetric edge table has out-mass, so no
    dangling handling is needed."""
    import ray

    verts_tbl = edges_ds.map_batches(
        lambda b: pa.table({"v": pa.array(
            np.unique(np.concatenate([
                b["src"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False)])), pa.int64())}),
        batch_format="pyarrow").groupby("v").count()
    verts = np.sort(np.asarray([r["v"] for r in verts_tbl.take_all()],
                               dtype=np.int64))
    n = verts.size
    wout_rows = edges_ds.groupby("src").sum("sum(n)").take_all()
    wout = np.ones(n, dtype=np.int64)
    for r in wout_rows:
        wout[np.searchsorted(verts, r["src"])] = r["sum(sum(n))"]

    rank = np.full(n, scale // n, dtype=np.int64)
    teleport = ((d_den - d_num) * scale) // (d_den * n)
    for _ in range(iters):
        ref = ray.put((verts, rank, wout))

        def partial(batch: pa.Table) -> pa.Table:
            vs, rk, wo = ray.get(ref)
            src = np.searchsorted(vs, batch["src"].to_numpy(
                zero_copy_only=False))
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            cnt = batch["sum(n)"].to_numpy(zero_copy_only=False)
            w = (rk[src] * cnt) // wo[src]
            uniq, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(uniq.size, dtype=np.int64)
            np.add.at(sums, inv, w)
            return pa.table({"dst": pa.array(uniq, pa.int64()),
                             "contrib": pa.array(sums, pa.int64())})

        agg = (edges_ds.map_batches(partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
               .groupby("dst").sum("contrib").take_all())
        link = np.zeros(n, dtype=np.int64)
        for r in agg:
            link[np.searchsorted(verts, r["dst"])] = r["sum(contrib)"]
        rank = (d_num * link) // d_den + teleport
    return pa.table({"vertex": pa.array(verts, pa.int64()),
                     "rank_fp": pa.array(rank, pa.int64())})


def textrank_keywords(sf_dir: str, window: int = TEXTRANK_WINDOW,
                      iters: int = TEXTRANK_ITERS) -> pa.Table:
    """(word, rank_fp) for every word participating in the co-occurrence
    graph — bit-exact under the recursive-CTE oracle."""
    from .textstats import _unigram_cf

    ranks = _weighted_pagerank_fixed(
        textrank_edges(sf_dir, window), iters, TEXTRANK_SCALE,
        TEXTRANK_D_NUM, TEXTRANK_D_DEN)
    rank_of = dict(zip(ranks["vertex"].to_pylist(),
                       ranks["rank_fp"].to_pylist()))
    vocab = _unigram_cf(sf_dir).to_pandas()    # vocab-bounded
    words = np.asarray(vocab[vocab.columns[0]].tolist(), dtype=object)
    order = np.argsort(words, kind="stable")
    words = words[order]
    nids = _node_ids(words)
    out_w, out_r = [], []
    for wd, nd in zip(words.tolist(), nids.tolist()):
        r = rank_of.get(nd)
        if r is not None:        # isolated words carry no rank
            out_w.append(wd)
            out_r.append(int(r))
    return pa.table({"word": pa.array(out_w, pa.string()),
                     "rank_fp": pa.array(out_r, pa.int64())})


def textrank_vertices(sf_dir: str, window: int = TEXTRANK_WINDOW,
                      iters: int = TEXTRANK_ITERS) -> pa.Table:
    """(vertex, rank_fp) — the raw node-level result (the
    `pagerank_fixed_suite` arm shape; `textrank_keywords` maps back to
    words)."""
    return _weighted_pagerank_fixed(
        textrank_edges(sf_dir, window), iters, TEXTRANK_SCALE,
        TEXTRANK_D_NUM, TEXTRANK_D_DEN)


def textrank_sql(window: int = TEXTRANK_WINDOW,
                 iters: int = TEXTRANK_ITERS,
                 final: str = "word") -> str:
    """DuckDB oracle: same FNV node ids, same window-pair counts, the
    same weighted integer recursion (MATERIALIZED support CTEs — the
    recursion re-references them per iteration). ``final="vertex"``
    emits the node-level (vertex, rank_fp) arm shape."""
    scale, dn, dd = TEXTRANK_SCALE, TEXTRANK_D_NUM, TEXTRANK_D_DEN
    m64 = 1 << 64
    fnv = ("list_reduce(list_prepend(14695981039346656037::HUGEINT,"
           "[ascii(c)::HUGEINT FOR c IN string_split(word, '')]),"
           "(h, b) -> (xor(h, b) * 1099511628211::HUGEINT)"
           f" % {m64}::HUGEINT)")
    return f"""
WITH RECURSIVE
ptok AS MATERIALIZED (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         w[CAST(u.i AS INTEGER) + 1] AS word
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(range(len(w))) u(i)),
wh AS MATERIALIZED (
  SELECT word, CAST({fnv} // 2 AS BIGINT) AS nid
  FROM (SELECT DISTINCT word FROM ptok)),
edges AS MATERIALIZED (
  SELECT wa.nid AS src, wb.nid AS dst, CAST(count(*) AS BIGINT) AS cnt
  FROM ptok a JOIN ptok b
    ON a.doc_id = b.doc_id AND a.pos <> b.pos
   AND abs(a.pos - b.pos) <= {window} AND a.word <> b.word
  JOIN wh wa ON wa.word = a.word
  JOIN wh wb ON wb.word = b.word
  GROUP BY 1, 2),
verts AS MATERIALIZED (SELECT DISTINCT v FROM
  (SELECT src AS v FROM edges UNION SELECT dst FROM edges)),
deg AS MATERIALIZED (
  SELECT src, CAST(sum(cnt) AS BIGINT) AS wout FROM edges GROUP BY src),
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM verts),
pr(iter, v, r) AS (
  SELECT 0, v, {scale}::BIGINT // (SELECT n FROM nn) FROM verts
  UNION ALL
  SELECT p.iter + 1, x.v,
         ({dn}::BIGINT * x.link) // {dd}
         + ({dd - dn}::BIGINT * {scale}::BIGINT)
           // ({dd}::BIGINT * (SELECT n FROM nn))
  FROM (
    SELECT vv.v, coalesce(sum((pp.r * e.cnt) // d.wout), 0) AS link
    FROM verts vv
    LEFT JOIN edges e ON e.dst = vv.v
    LEFT JOIN pr pp ON pp.v = e.src
    LEFT JOIN deg d ON d.src = e.src
    GROUP BY vv.v) x
  JOIN (SELECT max(iter) AS iter FROM pr) p ON TRUE
  WHERE p.iter < {iters})
{'''SELECT v AS vertex, CAST(r AS BIGINT) AS rank_fp
FROM pr WHERE iter = ''' + str(iters) + ''' ORDER BY vertex'''
 if final == "vertex" else
 '''SELECT w.word, CAST(pr.r AS BIGINT) AS rank_fp
FROM pr JOIN wh w ON w.nid = pr.v
WHERE pr.iter = ''' + str(iters) + ''' ORDER BY w.word'''}"""
