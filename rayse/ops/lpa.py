"""Label-propagation community detection (Raghavan et al. 2007) in the
deterministic synchronous form.

Communities complement the link-graph family (PageRank/HITS/k-core/
connected components): CC answers "reachable at all", LPA answers
"densely connected with" — the clustering a crawl/corpus pipeline uses
to group near-duplicate sites or topical clusters before sampling.

Determinism contract (the repo's standing oracle recipe): the classic
algorithm breaks ties randomly and updates asynchronously; here updates
are SYNCHRONOUS over a fixed iteration count and ties break to the
SMALLEST label — every step is integer counting + argmax, so a DuckDB
unrolled-CTE oracle matches bit-exactly.

    label_0(v)   = v
    votes_t(v,l) = #{(u,v) in E_und : label_t(u) = l}   (E_und = both
                   directions of every edge row; multi-edges vote with
                   multiplicity, a self-loop votes twice)
    label_{t+1}(v) = argmax_l votes_t(v, l), ties -> min l

Distributed shape (`pagerank_fixed`'s idiom, `rayse/ops/graph.py`):
edges stream per iteration through a vectorized per-batch vote partial
(np.unique over (dst, label[src]) pairs), one bounded groupby, and a
driver-side argmax over the vote table. Driver state is the
vertex-dense label vector — same documented ~1e8-vertex bound as
pagerank_fixed; the unbounded path is the sharded realization
(`pagerank_fixed_sharded`) applied to votes.

Reference relationship: the reference has no community operator; its
graph surface is PageRank over crawl links (`Ranker/PageRank.java`).
LPA is the standard next operator a link-graph pipeline adds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LPA_ITERS = 4


def lpa_communities(edges_ds, iters: int = LPA_ITERS) -> pa.Table:
    """(vertex, community) after ``iters`` synchronous label-propagation
    rounds; community = the converged-to label (a vertex id)."""
    import ray

    verts_tbl = edges_ds.map_batches(
        lambda b: pa.table({"v": pa.array(
            np.unique(np.concatenate([
                b["src"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False)])), pa.int64())}),
        batch_format="pyarrow").groupby("v").count()
    verts = np.sort(np.asarray([r["v"] for r in verts_tbl.take_all()],
                               dtype=np.int64))
    if verts.size and verts[-1] >= (1 << 32):
        # the (v, l) vote key packs into one uint64 for the np.unique
        # partial; beyond 2^32 vertices switch the partial to a
        # two-column lexsort reduction
        raise ValueError("lpa_communities packs vertex ids into 32 bits")
    labels = verts.copy()

    for _ in range(iters):
        ref = ray.put((verts, labels))

        def vote_partial(batch: pa.Table) -> pa.Table:
            vs, lb = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            # both directions: v receives label[u] for every incident
            # edge row (self-loops therefore vote twice)
            v = np.concatenate((dst, src))
            l = np.concatenate((lb[np.searchsorted(vs, src)],
                                lb[np.searchsorted(vs, dst)]))
            key = v.astype(np.uint64) << np.uint64(32) | l.astype(
                np.uint64)
            uniq, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "v": pa.array((uniq >> np.uint64(32)).astype(np.int64),
                              pa.int64()),
                "l": pa.array((uniq & np.uint64(0xFFFFFFFF)).astype(
                    np.int64), pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            })

        votes = (edges_ds.map_batches(vote_partial, batch_format="pyarrow",
                                      zero_copy_batch=True)
                 .groupby(["v", "l"]).sum("c").take_all())
        v = np.fromiter((r["v"] for r in votes), np.int64, len(votes))
        l = np.fromiter((r["l"] for r in votes), np.int64, len(votes))
        c = np.fromiter((r["sum(c)"] for r in votes), np.int64,
                        len(votes))
        # argmax with (count DESC, label ASC) tie-break: sort rows by
        # (v, -c, l) and take each vertex's first row
        order = np.lexsort((l, -c, v))
        v_s, l_s = v[order], l[order]
        first = np.empty(v_s.size, dtype=bool)
        first[0] = True
        first[1:] = v_s[1:] != v_s[:-1]
        labels = labels.copy()
        labels[np.searchsorted(verts, v_s[first])] = l_s[first]

    return pa.table({"vertex": pa.array(verts, pa.int64()),
                     "community": pa.array(labels, pa.int64())})


def lpa_communities_events(sf_dir: str, iters: int = LPA_ITERS) -> pa.Table:
    from .graph import derived_edges

    return lpa_communities(derived_edges(sf_dir), iters=iters)


def lpa_communities_sql(iters: int = LPA_ITERS,
                        vertex_space: int | None = None) -> str:
    """Oracle for ``lpa_communities_events``: the synchronous recursion
    unrolled to ``iters`` chained CTEs (windows are disallowed in a
    recursive term, and the k-means oracle set the unrolled precedent);
    per round QUALIFY picks each vertex's (count DESC, label ASC)
    winner."""
    from .graph import DEMO_VERTEX_SPACE

    vs = vertex_space if vertex_space is not None else DEMO_VERTEX_SPACE
    parts = [f"""
edges AS (SELECT user_id AS src,
                 CAST(json_extract(props, '$.k') AS BIGINT)
                   % {vs} AS dst
          FROM events),
und AS (SELECT src AS u, dst AS v FROM edges
        UNION ALL SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT v FROM
          (SELECT src AS v FROM edges UNION SELECT dst FROM edges)),
lp0 AS (SELECT v, v AS l FROM verts)"""]
    for t in range(1, iters + 1):
        parts.append(f"""
lp{t} AS (
  SELECT u.v, p.l
  FROM und u JOIN lp{t - 1} p ON p.v = u.u
  GROUP BY u.v, p.l
  QUALIFY row_number() OVER (PARTITION BY u.v
                             ORDER BY count(*) DESC, p.l) = 1)""")
    return ("WITH " + ",".join(parts) +
            f"\nSELECT v AS vertex, CAST(l AS BIGINT) AS community "
            f"FROM lp{iters} ORDER BY vertex")


# ---------------------------------------------------------------------------
# Newman modularity of the LPA partition — the quality score for the
# community detection above, EXACT: Q = (4m·Σm_c − ΣD_c²) / (4m²) over
# the distinct undirected self-loop-free edge set, emitted as a
# truncating milli integer so the oracle (the same rational in HUGEINT
# over the unrolled-LPA labels) hash-matches bit-for-bit.
# ---------------------------------------------------------------------------


def modularity_events(sf_dir: str, iters: int = LPA_ITERS) -> pa.Table:
    """(n_communities, m_edges, intra_edges, q_milli): modularity of
    the LPA communities on the distinct undirected demo graph."""
    import ray
    import ray.data as rd

    from .graph import derived_edges

    lab_t = lpa_communities_events(sf_dir, iters=iters)
    verts = lab_t["vertex"].to_numpy(zero_copy_only=False)
    comm = lab_t["community"].to_numpy(zero_copy_only=False)
    order = np.argsort(verts, kind="stable")
    verts, comm = verts[order], comm[order]
    lab_ref = ray.put((verts, comm))

    edges = derived_edges(sf_dir)

    def undirect(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        m = lo != hi
        key = lo[m] * np.int64(1 << 32) + hi[m]
        return pa.table({"key": pa.array(np.unique(key), pa.int64())})

    dedup = (edges.map_batches(undirect, batch_format="pyarrow")
             .groupby("key").count())

    def partial(batch: pa.Table) -> pa.Table:
        vs, cs = ray.get(lab_ref)
        k = batch["key"].to_numpy(zero_copy_only=False)
        lo, hi = k // (1 << 32), k % (1 << 32)
        cl = cs[np.searchsorted(vs, lo)]
        ch = cs[np.searchsorted(vs, hi)]
        intra = int((cl == ch).sum())
        # per-community degree contributions of this block's edges
        allc = np.concatenate((cl, ch))
        uc, cnt = np.unique(allc, return_counts=True)
        return pa.table({
            "c": pa.array(np.concatenate(([-1], uc)), pa.int64()),
            "deg": pa.array(np.concatenate(([0], cnt)).astype(np.int64),
                            pa.int64()),
            "m": pa.array(np.concatenate(
                ([k.size], np.zeros(uc.size))).astype(np.int64),
                pa.int64()),
            "intra": pa.array(np.concatenate(
                ([intra], np.zeros(uc.size))).astype(np.int64),
                pa.int64()),
        })

    import ray.data as rd2

    agg = (dedup.map_batches(partial, batch_format="pyarrow")
           .groupby("c").aggregate(rd2.aggregate.Sum("deg"),
                                   rd2.aggregate.Sum("m"),
                                   rd2.aggregate.Sum("intra")))
    tbl = pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    c = tbl["c"].to_numpy(zero_copy_only=False)
    deg = tbl["sum(deg)"].to_numpy(zero_copy_only=False).astype(np.int64)
    mm = tbl["sum(m)"].to_numpy(zero_copy_only=False).astype(np.int64)
    ii = tbl["sum(intra)"].to_numpy(zero_copy_only=False).astype(np.int64)
    m_edges = int(mm[c == -1].sum())
    intra = int(ii[c == -1].sum())
    real = c != -1
    n_comms = int(real.sum())
    sum_d2 = sum(int(d) ** 2 for d in deg[real])
    num = 1000 * (4 * m_edges * intra - sum_d2)
    den = 4 * m_edges * m_edges
    q_milli = -((-num) // den) if num < 0 else num // den
    return pa.table({
        "n_communities": pa.array([n_comms], pa.int64()),
        "m_edges": pa.array([m_edges], pa.int64()),
        "intra_edges": pa.array([intra], pa.int64()),
        "q_milli": pa.array([q_milli], pa.int64()),
    })


def modularity_events_sql(iters: int = LPA_ITERS) -> str:
    from .graph import DEMO_VERTEX_SPACE

    return f"""
WITH lab AS (
  SELECT vertex, community FROM (
{lpa_communities_sql(iters=iters)}
  )),
me0 AS (
  SELECT least(user_id,
               CAST(json_extract(props, '$.k') AS BIGINT)
                 % {DEMO_VERTEX_SPACE}) AS lo,
         greatest(user_id,
                  CAST(json_extract(props, '$.k') AS BIGINT)
                    % {DEMO_VERTEX_SPACE}) AS hi
  FROM events),
me AS (SELECT DISTINCT lo, hi FROM me0 WHERE lo <> hi),
lb AS (
  SELECT me.lo, me.hi, a.community AS ca, b.community AS cb
  FROM me JOIN lab a ON me.lo = a.vertex
       JOIN lab b ON me.hi = b.vertex),
mm AS (SELECT CAST(count(*) AS HUGEINT) AS m,
              CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END)
                   AS HUGEINT) AS intra
       FROM lb),
dc AS (
  SELECT community, CAST(count(*) AS HUGEINT) AS d
  FROM (SELECT ca AS community FROM lb
        UNION ALL SELECT cb FROM lb)
  GROUP BY community)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM dc) AS n_communities,
       CAST(m AS BIGINT) AS m_edges,
       CAST(intra AS BIGINT) AS intra_edges,
       CAST((1000 * (4 * m * intra - (SELECT sum(d * d) FROM dc)))
            // (4 * m * m) AS BIGINT) AS q_milli
FROM mm"""
