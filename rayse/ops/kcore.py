"""k-core decomposition (coreness) of the derived link graph via
h-index iteration.

Coreness — the largest k such that a vertex survives in the k-core — is
the classic peeling statistic, but peeling is inherently sequential.
Lü et al. (Nature Communications 2016) showed the core number is the
fixed point of the LOCAL h-index iteration::

    h_0(v)   = deg(v)
    h_{t+1}(v) = H({h_t(u) : u ~ v})   (H = the h-index operator)

which converges monotonically from above — exactly the shape the
PageRank/HITS family already uses: per-iteration the vertex-value
vector broadcasts (``ray.put``), the DISTINCT undirected edge set
streams once, and per-batch (vertex, neighbor-value) COUNT partials
(mergeable histograms — the h-index of a multiset only needs its value
histogram) fold through one bounded groupby; the driver applies H per
vertex from the histogram (h = max over desc-sorted rows of
min(value, cumulative count) — pytest-pinned against the rank
definition). Driver state is vertex-dense, the same documented bound
as the dense PageRank variant (the sharded-exchange realization there
shows the unbounded-vertex path).

Iteration count is FIXED (KCORE_ITERS) so both engines compute the
identical iterate; convergence at the demo graph is pytest-pinned
(h_T == h_{T+1}).

Oracle: the same iteration unrolled in SQL — per round, neighbors
ranked descending by current value, h = max rank with value >= rank.

Reference relationship: extends the Ranker's degree statistics
(`Ranker.java` in/out-degree) to the density-layering statistic;
shares the edge derivation with `triangles.py` (same canonical
distinct undirected edge CTE).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .graph import DEMO_VERTEX_SPACE

KCORE_ITERS = 30


def _distinct_edges(sf_dir: str):
    """Distinct canonical (lo, hi) edges, self-loops dropped — the
    triangles dedup shape: batch-local canon partials, one lo-keyed
    exchange for exact distinctness."""
    import ray.data as rd

    from .exchange import exchange_by_key
    from .triangles import _canon_batch

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "props"])
    parts = ds.map_batches(_canon_batch, batch_format="pyarrow",
                           zero_copy_batch=True)

    def distinct(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        lo = tbl["lo"].to_numpy(zero_copy_only=False)
        hi = tbl["hi"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        keep = np.ones(lo.size, dtype=bool)
        keep[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        return pa.table({"lo": pa.array(lo[keep], pa.int64()),
                         "hi": pa.array(hi[keep], pa.int64())})

    return exchange_by_key(parts, "lo", distinct)


def _h_from_hist(v: np.ndarray, val: np.ndarray,
                 cnt: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Per-vertex h-index from (vertex, value, count) histogram rows:
    h = max over value-descending rows of min(value, cum count)."""
    h = np.zeros(verts.size, np.int64)
    if v.size == 0:
        return h
    order = np.lexsort((-val, v))
    v_s, val_s, c_s = v[order], val[order], cnt[order]
    start = np.empty(v_s.size, dtype=bool)
    start[0] = True
    start[1:] = v_s[1:] != v_s[:-1]
    gid = np.cumsum(start) - 1
    starts = np.flatnonzero(start)
    cum = np.cumsum(c_s)
    base = np.concatenate(([0], cum[starts[1:] - 1]))
    local_cum = cum - base[gid]
    cand = np.minimum(val_s, local_cum)
    hv = np.zeros(starts.size, np.int64)
    np.maximum.at(hv, gid, cand)
    idx = np.searchsorted(verts, v_s[start])
    h[idx] = hv
    return h


def kcore_h(sf_dir: str, iters: int = KCORE_ITERS) -> pa.Table:
    """(node, core_h): the h-index iterate after ``iters`` rounds (the
    core number once converged — pinned at the demo graph)."""
    import ray

    edges = _distinct_edges(sf_dir).materialize()

    # dense vertex space + initial degrees (vertex-dense driver bound)
    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            batch["lo"].to_numpy(zero_copy_only=False),
            batch["hi"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
           .groupby("v").sum("c").to_pandas())
    verts = np.sort(deg["v"].to_numpy().astype(np.int64))
    h = deg.sort_values("v")["sum(c)"].to_numpy().astype(np.int64)

    for _ in range(iters):
        h_ref = ray.put(h)
        verts_ref = ray.put(verts)

        def hist_partial(batch: pa.Table, h_ref=h_ref,
                         verts_ref=verts_ref) -> pa.Table:
            hv = ray.get(h_ref)
            vs = ray.get(verts_ref)
            lo = batch["lo"].to_numpy(zero_copy_only=False)
            hi = batch["hi"].to_numpy(zero_copy_only=False)
            tgt = np.concatenate([lo, hi])
            nb = np.concatenate([hi, lo])
            val = hv[np.searchsorted(vs, nb)]
            order = np.lexsort((val, tgt))
            t_s, v_s = tgt[order], val[order]
            new = np.ones(t_s.size, dtype=bool)
            new[1:] = (t_s[1:] != t_s[:-1]) | (v_s[1:] != v_s[:-1])
            g = np.cumsum(new) - 1
            c = np.zeros(int(g[-1]) + 1, np.int64)
            np.add.at(c, g, 1)
            return pa.table({"v": pa.array(t_s[new], pa.int64()),
                             "val": pa.array(v_s[new], pa.int64()),
                             "c": pa.array(c, pa.int64())})

        parts = [t for t in ray.get(
            edges.map_batches(hist_partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_arrow_refs())
            if t.num_rows]
        hist = pa.concat_tables(parts)    # <= V x values rows per batch;
        # the driver fold replaces a per-iteration shuffle (histogram
        # rows are the already-reduced partials, vertex-dense bound)
        hv = hist["v"].to_numpy(zero_copy_only=False)
        hval = hist["val"].to_numpy(zero_copy_only=False)
        hc = hist["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((hval, hv))
        hv, hval, hc = hv[order], hval[order], hc[order]
        new = np.ones(hv.size, dtype=bool)
        new[1:] = (hv[1:] != hv[:-1]) | (hval[1:] != hval[:-1])
        g = np.cumsum(new) - 1
        cs = np.zeros(int(g[-1]) + 1, np.int64)
        np.add.at(cs, g, hc)
        h_next = _h_from_hist(hv[new], hval[new], cs, verts)
        if (h_next == h).all():
            break                        # monotone fixpoint: h_T = h_t
        h = h_next

    return pa.table({"node": pa.array(verts, pa.int64()),
                     "core_h": pa.array(h, pa.int64())})


def _kcore_reduce_part(tbl: pa.Table) -> pa.Table:
    """Vote-exchange reducer: one partition holds every (v, val, cnt)
    neighbor-histogram row of its vertices PLUS each vertex's old-h row
    (tagged val = -1, cnt = h_old). Computes h-index per vertex (split
    counts for equal values cannot change the max — see module note)
    and a changed flag for the driver's fixpoint check."""
    if tbl.num_rows == 0:
        return pa.table({"v": pa.array([], pa.int64()),
                         "h": pa.array([], pa.int64()),
                         "changed": pa.array([], pa.int64())})
    v = tbl["v"].to_numpy(zero_copy_only=False)
    val = tbl["val"].to_numpy(zero_copy_only=False)
    cnt = tbl["c"].to_numpy(zero_copy_only=False)
    is_old = val < 0
    verts = np.sort(v[is_old])
    old = np.zeros(verts.size, np.int64)
    old[np.searchsorted(verts, v[is_old])] = cnt[is_old]
    h = _h_from_hist(v[~is_old], val[~is_old], cnt[~is_old], verts)
    return pa.table({
        "v": pa.array(verts, pa.int64()),
        "h": pa.array(h, pa.int64()),
        "changed": pa.array((h != old).astype(np.int64), pa.int64()),
    })


def kcore_h_sharded(sf_dir: str, iters: int = KCORE_ITERS):
    """Coreness with NO driver-side vertex state (the sharded template
    of ``pagerank_fixed_sharded`` / ``lpa_communities_sharded`` applied
    to the h-index iteration): the distinct undirected edge list spills
    once partitioned by its value-source endpoint; each iteration
    co-partitions the (v, h) rows with the edge shards, emits
    (v, neighbor-h, count) histogram partials inside one task per
    shard, and exchanges them — together with the tagged old-h rows —
    by receiving vertex where the h-index fold runs per partition.
    Stops at the same monotone fixpoint as the dense route (sum of
    per-vertex changed flags = 0), so results are bit-identical.
    Returns a Dataset of (node, core_h)."""
    import glob
    import os
    import shutil
    import uuid

    import ray
    import ray.data as rd

    from .exchange import default_parts, exchange_by_key, partition_of

    P = min(default_parts(), 64)
    root = os.path.join(
        tmp_root := "/tmp",
        f"rayse_kc_{os.getpid()}_{uuid.uuid4().hex[:8]}")
    edir = os.path.join(root, "und")

    edges = _distinct_edges(sf_dir)

    def stamp_und(b: pa.Table) -> pa.Table:
        lo = b["lo"].to_numpy(zero_copy_only=False)
        hi = b["hi"].to_numpy(zero_copy_only=False)
        u = np.concatenate((lo, hi))         # value-source endpoint
        v = np.concatenate((hi, lo))         # histogram receiver
        return pa.table({
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "_part": pa.array(partition_of([u], P), pa.int64()),
        })

    edges.map_batches(stamp_und, batch_format="pyarrow",
                      zero_copy_batch=True).write_parquet(
        edir, partition_cols=["_part"])
    edge_pids = sorted(int(os.path.basename(p).split("=")[1])
                       for p in glob.glob(os.path.join(edir, "_part=*")))
    if not edge_pids:
        shutil.rmtree(root, ignore_errors=True)
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "core_h": pa.array([], pa.int64())}))

    # h_0 = degree, computed in the same exchange shape (no driver vec).
    # NOTE: degrees come from the edges Dataset, not a re-read of the
    # spill dir — pyarrow dataset discovery skips `_part=*` directories
    # (underscore ignore-prefix); the shard tasks read them explicitly.
    def deg_rows(b: pa.Table) -> pa.Table:
        both = np.concatenate([
            b["lo"].to_numpy(zero_copy_only=False),
            b["hi"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(both, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    def deg_reduce(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        v = tbl["v"].to_numpy(zero_copy_only=False)
        c = tbl["c"].to_numpy(zero_copy_only=False)
        uv, inv = np.unique(v, return_inverse=True)
        s = np.zeros(uv.size, np.int64)
        np.add.at(s, inv, c)
        return pa.table({"v": pa.array(uv, pa.int64()),
                         "h": pa.array(s, pa.int64())})

    vals = exchange_by_key(
        edges.map_batches(deg_rows, batch_format="pyarrow"),
        "v", deg_reduce, n_parts=P).materialize()

    @ray.remote
    def hist_shard(pid: int, hdir: str) -> pa.Table:
        import pyarrow.dataset as pads

        e = pads.dataset(os.path.join(edir, f"_part={pid}")).to_table(
            columns=["u", "v"], use_threads=False)
        ht = pads.dataset(os.path.join(hdir, f"_part={pid}")).to_table(
            columns=["v", "h"], use_threads=False)
        hv = ht["v"].to_numpy(zero_copy_only=False)
        hh = ht["h"].to_numpy(zero_copy_only=False)
        o = np.argsort(hv)
        hv, hh = hv[o], hh[o]
        u = e["u"].to_numpy(zero_copy_only=False)
        v = e["v"].to_numpy(zero_copy_only=False)
        val = hh[np.searchsorted(hv, u)]
        o2 = np.lexsort((val, v))
        v, val = v[o2], val[o2]
        new = np.ones(v.size, dtype=bool)
        if v.size:
            new[1:] = (v[1:] != v[:-1]) | (val[1:] != val[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate([starts, [v.size]]))
        return pa.table({
            "v": pa.array(v[starts], pa.int64()),
            "val": pa.array(val[starts], pa.int64()),
            "c": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def old_rows(b: pa.Table) -> pa.Table:
        m = b.num_rows
        return pa.table({
            "v": b["v"],
            "val": pa.array(np.full(m, -1, np.int64), pa.int64()),
            "c": pa.array(b["h"], pa.int64()),
        })

    try:
        for it in range(iters):
            hdir = os.path.join(root, f"h_{it}")

            def stamp_h(b: pa.Table) -> pa.Table:
                v = b["v"].to_numpy(zero_copy_only=False)
                return b.append_column(
                    "_part", pa.array(partition_of([v], P), pa.int64()))

            vals.map_batches(stamp_h,
                             batch_format="pyarrow").write_parquet(
                hdir, partition_cols=["_part"])
            refs = [hist_shard.remote(pid, hdir) for pid in edge_pids]
            ray.wait(refs, num_returns=len(refs), fetch_local=False)
            hist = rd.from_arrow_refs(refs)
            olds = vals.map_batches(old_rows, batch_format="pyarrow")
            nxt = exchange_by_key(hist.union(olds), "v",
                                  _kcore_reduce_part, n_parts=P,
                                  tmp_root=tmp_root).materialize()
            shutil.rmtree(hdir, ignore_errors=True)
            changed = int(nxt.sum("changed") or 0)
            vals = nxt.drop_columns(["changed"]).materialize()
            if changed == 0:
                break                     # monotone fixpoint (dense rule)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["v"], "core_h": b["h"]})

    return vals.map_batches(out, batch_format="pyarrow")


def kcore_h_sql(iters: int = KCORE_ITERS) -> str:
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(f"""
kc_n{t} AS MATERIALIZED (
  SELECT ue.a AS v, h.h AS val,
         CAST(row_number() OVER (PARTITION BY ue.a
                                 ORDER BY h.h DESC) AS BIGINT) AS rn
  FROM kc_ue ue JOIN kc_h{t - 1} h ON h.v = ue.b),
kc_h{t} AS MATERIALIZED (
  SELECT v, COALESCE(max(CASE WHEN val >= rn THEN rn END), 0) AS h
  FROM kc_n{t} GROUP BY v)""")
    return f"""
WITH kc_e0 AS MATERIALIZED (SELECT user_id AS src,
                      CAST(json_extract(props, '$.k') AS BIGINT)
                        % {DEMO_VERTEX_SPACE} AS dst
               FROM events),
kc_e AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
         FROM kc_e0 WHERE src <> dst),
kc_ue AS MATERIALIZED (SELECT lo AS a, hi AS b FROM kc_e
          UNION ALL SELECT hi, lo FROM kc_e),
kc_h0 AS MATERIALIZED (SELECT a AS v, CAST(count(*) AS BIGINT) AS h
          FROM kc_ue GROUP BY a),{','.join(rounds)}
SELECT v AS node, CAST(h AS BIGINT) AS core_h
FROM kc_h{iters}"""


# ---------------------------------------------------------------------------
# Connected components of the link graph — reuses the dedup family's
# routed CC machinery (driver union-find below the pair bound,
# distributed pointer-jumping min-label propagation above) over the
# SAME canonical distinct edge set as k-core/triangles, so all three
# link statistics share one derivation.
# ---------------------------------------------------------------------------

def link_components(sf_dir: str) -> pa.Table:
    """(node, comp_id): connected components, comp_id = smallest node id
    in the component; isolated vertices cannot occur (every vertex here
    is an edge endpoint)."""
    import ray

    from .dedup import DRIVER_MAX_PAIRS, _cc_distributed, _cc_driver

    edges_ds = _distinct_edges(sf_dir).materialize()
    n_pairs = int(edges_ds.count())

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_a", "doc_b"])

    pairs_ds = edges_ds.map_batches(rename, batch_format="pyarrow",
                                    zero_copy_batch=True)
    if n_pairs <= DRIVER_MAX_PAIRS:
        parts = [t for t in ray.get(pairs_ds.to_arrow_refs())
                 if t.num_rows]
        cc = _cc_driver(pa.concat_tables(parts))
    else:
        cc = _cc_distributed(pairs_ds)
    return pa.table({"node": cc["doc_id"], "comp_id": cc["cluster_id"]})


def link_components_sql() -> str:
    """Recursive min-label propagation over the canonical edge CTE."""
    return f"""
WITH RECURSIVE lc_e0 AS (
  SELECT user_id AS src,
         CAST(json_extract(props, '$.k') AS BIGINT)
           % {DEMO_VERTEX_SPACE} AS dst
  FROM events),
lc_e AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
         FROM lc_e0 WHERE src <> dst),
lc_ue AS (SELECT lo AS a, hi AS b FROM lc_e
          UNION ALL SELECT hi, lo FROM lc_e),
lc_lbl(node, lbl) AS (
  SELECT a AS node, least(a, min(b)) AS lbl FROM lc_ue GROUP BY a
  UNION
  SELECT e.a AS node, least(l.lbl, e.a) AS lbl
  FROM lc_ue e JOIN lc_lbl l ON e.b = l.node)
SELECT node, CAST(min(lbl) AS BIGINT) AS comp_id
FROM lc_lbl GROUP BY node"""
