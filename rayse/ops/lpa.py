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


def _lpa_vote_reduce(tbl: pa.Table) -> pa.Table:
    """Vote-exchange reducer: one partition holds ALL (v, l, c) vote
    rows of its vertices; sum per (v, l), then each vertex's winner
    under (count DESC, label ASC) — vectorized lexsort + reduceat."""
    if tbl.num_rows == 0:
        return pa.table({"v": pa.array([], pa.int64()),
                         "l": pa.array([], pa.int64())})
    v = tbl["v"].to_numpy(zero_copy_only=False)
    l = tbl["l"].to_numpy(zero_copy_only=False)
    c = tbl["c"].to_numpy(zero_copy_only=False)
    o = np.lexsort((l, v))
    v, l, c = v[o], l[o], c[o]
    new = np.empty(v.size, dtype=bool)
    new[0] = True
    new[1:] = (v[1:] != v[:-1]) | (l[1:] != l[:-1])
    starts = np.flatnonzero(new)
    gv, gl = v[starts], l[starts]
    gc = np.add.reduceat(c, starts)
    o2 = np.lexsort((gl, -gc, gv))
    gv, gl = gv[o2], gl[o2]
    first = np.empty(gv.size, dtype=bool)
    first[0] = True
    first[1:] = gv[1:] != gv[:-1]
    return pa.table({"v": pa.array(gv[first], pa.int64()),
                     "l": pa.array(gl[first], pa.int64())})


def lpa_communities_sharded(edges_ds, iters: int = LPA_ITERS,
                            n_parts: int | None = None,
                            tmp_root: str = "/tmp"):
    """LPA with NO driver-side vertex state (the
    ``pagerank_fixed_sharded`` template applied to votes, closing the
    round-4 review item): the undirected edge list spills ONCE
    partitioned by the label-source endpoint; each iteration writes the
    label rows partitioned the same way, joins edge shard to label
    shard inside one task (vote partials = labels crossing each edge),
    and exchanges votes by receiving vertex where the (count DESC,
    label ASC) argmax runs per partition. Bit-identical to
    ``lpa_communities`` — vote counts are integers and the argmax is
    order-independent — with no 2^32 vertex-id pack (two-column lexsort
    reduction) and no vertex-dense driver vector at any size. Returns a
    Dataset of (vertex, community)."""
    import glob
    import os
    import shutil
    import uuid

    import ray
    import ray.data as rd

    from .exchange import (default_parts, exchange_by_key,
                           partition_of)

    P = n_parts if n_parts is not None else min(default_parts(), 64)
    root = os.path.join(tmp_root,
                        f"rayse_lpa_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    edir = os.path.join(root, "und")

    def stamp_und(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        u = np.concatenate((src, dst))       # label source endpoint
        v = np.concatenate((dst, src))       # vote receiver
        return pa.table({
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "_part": pa.array(partition_of([u], P), pa.int64()),
        })

    edges_ds.map_batches(stamp_und, batch_format="pyarrow",
                         zero_copy_batch=True).write_parquet(
        edir, partition_cols=["_part"])
    edge_pids = sorted(int(os.path.basename(p).split("=")[1])
                       for p in glob.glob(os.path.join(edir, "_part=*")))

    def vrows(b: pa.Table) -> pa.Table:
        return pa.table({"v": pa.array(np.unique(np.concatenate([
            b["src"].to_numpy(zero_copy_only=False),
            b["dst"].to_numpy(zero_copy_only=False)])), pa.int64())})

    from .graph import _pr_distinct_v

    verts = exchange_by_key(
        edges_ds.map_batches(vrows, batch_format="pyarrow",
                             zero_copy_batch=True),
        "v", _pr_distinct_v).materialize()
    if verts.count() == 0:
        shutil.rmtree(root, ignore_errors=True)
        return rd.from_arrow(pa.table({
            "vertex": pa.array([], pa.int64()),
            "community": pa.array([], pa.int64())}))

    def init_labels(b: pa.Table) -> pa.Table:
        return pa.table({"v": b["v"], "l": b["v"]})

    @ray.remote
    def vote_shard(pid: int, ldir: str) -> pa.Table:
        import pyarrow.dataset as pads

        e = pads.dataset(os.path.join(edir, f"_part={pid}")).to_table(
            columns=["u", "v"], use_threads=False)
        lt = pads.dataset(os.path.join(ldir, f"_part={pid}")).to_table(
            columns=["v", "l"], use_threads=False)
        lv = lt["v"].to_numpy(zero_copy_only=False)
        ll = lt["l"].to_numpy(zero_copy_only=False)
        o = np.argsort(lv)
        lv, ll = lv[o], ll[o]
        u = e["u"].to_numpy(zero_copy_only=False)
        v = e["v"].to_numpy(zero_copy_only=False)
        lab = ll[np.searchsorted(lv, u)]
        # two-column (v, lab) count reduction — no 32-bit pack
        o2 = np.lexsort((lab, v))
        v, lab = v[o2], lab[o2]
        new = np.empty(v.size, dtype=bool)
        if v.size:
            new[0] = True
            new[1:] = (v[1:] != v[:-1]) | (lab[1:] != lab[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate([starts, [v.size]]))
        return pa.table({
            "v": pa.array(v[starts], pa.int64()),
            "l": pa.array(lab[starts], pa.int64()),
            "c": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    labels = verts.map_batches(init_labels, batch_format="pyarrow")
    try:
        for it in range(iters):
            ldir = os.path.join(root, f"lab_{it}")

            def stamp_lab(b: pa.Table) -> pa.Table:
                v = b["v"].to_numpy(zero_copy_only=False)
                return b.append_column(
                    "_part", pa.array(partition_of([v], P), pa.int64()))

            labels.map_batches(stamp_lab,
                               batch_format="pyarrow").write_parquet(
                ldir, partition_cols=["_part"])
            refs = [vote_shard.remote(pid, ldir) for pid in edge_pids]
            ray.wait(refs, num_returns=len(refs), fetch_local=False)
            votes = rd.from_arrow_refs(refs)
            labels = exchange_by_key(votes, "v", _lpa_vote_reduce,
                                     n_parts=P,
                                     tmp_root=tmp_root).materialize()
            shutil.rmtree(ldir, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"vertex": b["v"], "community": b["l"]})

    return labels.map_batches(out, batch_format="pyarrow")


def lpa_communities_sharded_events(sf_dir: str, iters: int = LPA_ITERS):
    from .graph import derived_edges

    return lpa_communities_sharded(derived_edges(sf_dir), iters=iters)


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
