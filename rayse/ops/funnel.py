"""Funnel (ordered-sequence) analysis over the events log.

How many users complete stage 1, then stage 2 strictly later, then
stage 3 strictly later still — the earliest-completion funnel every
product-analytics pipeline computes (and the sequence-matching shape
behind session-level curriculum filters).  Semantics: t_0 = min ts of
a stage-0 event; t_k = min ts of a stage-k event with ts > t_{k-1};
a user counts toward every stage whose t_k exists.

Scale shape: the read keeps only funnel-type events (pruned columns +
row filter), stamps each with its stage index, and ONE exchange by
user co-locates a user's funnel history; each partition task runs the
stage chain VECTORIZED ACROSS USERS (dense user ranks + one composite
searchsorted per stage — no per-user Python), emitting per-stage
partial user counts.  The global answer is a stage-count sum over
n_parts tiny partials.  A user's full funnel history lands in one
task by construction (the chain is sequential per user); the
time-bucketed carry decomposition of ``asof_join_events`` is the
documented path if per-user event counts ever outgrow a task.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FUNNEL_STAGES = ("view", "click", "purchase")

_ROWS_SCHEMA = pa.schema([
    ("user_id", pa.int64()), ("ts_us", pa.int64()),
    ("stage", pa.int64()),
])


def _funnel_stamp_batch(batch: pa.Table, stages: list[str]) -> pa.Table:
    """events batch -> (user_id, ts_us, stage) rows of funnel types only."""
    if batch.num_rows == 0:
        return pa.table({n: [] for n in _ROWS_SCHEMA.names},
                        schema=_ROWS_SCHEMA)
    etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    stage = np.full(etype.size, -1, np.int64)
    for i, s in enumerate(stages):
        stage[etype == s] = i
    keep = stage >= 0
    ts = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    return pa.table({
        "user_id": pa.array(
            batch["user_id"].to_numpy(zero_copy_only=False)[keep],
            pa.int64()),
        "ts_us": pa.array(ts[keep], pa.int64()),
        "stage": pa.array(stage[keep], pa.int64()),
    })


def _funnel_partition(tbl: pa.Table, n_stages: int) -> pa.Table:
    """This partition's users -> per-stage partial reach counts. The
    chain runs once per STAGE (a fixed small constant), vectorized over
    all users at once via composite (user-rank, ts) searchsorted."""
    empty = pa.table({
        "stage": pa.array([], pa.int64()),
        "n_users": pa.array([], pa.int64()),
    })
    if tbl.num_rows == 0:
        return empty
    user = tbl["user_id"].to_numpy(zero_copy_only=False)
    ts = tbl["ts_us"].to_numpy(zero_copy_only=False)
    stage = tbl["stage"].to_numpy(zero_copy_only=False)
    uniq, urank = np.unique(user, return_inverse=True)
    n_users = uniq.size
    t0 = int(ts.min())
    span = int(ts.max()) - t0 + 2              # +2: room for the +1 shift
    tsn = (ts - t0).astype(np.int64)
    # per-stage sorted composite keys
    stage_keys, stage_uranks = [], []
    for k in range(n_stages):
        m = stage == k
        key = urank[m].astype(np.int64) * span + tsn[m]
        order = np.argsort(key, kind="stable")
        stage_keys.append(key[order])
        stage_uranks.append(urank[m][order])
    alive = np.ones(n_users, dtype=bool)
    t_prev = np.zeros(n_users, dtype=np.int64)   # normalized ts + 1 floor
    counts = []
    for k in range(n_stages):
        keys, uranks = stage_keys[k], stage_uranks[k]
        if keys.size == 0:
            alive[:] = False
            counts.append(0)
            continue
        probe = np.arange(n_users, dtype=np.int64) * span + t_prev
        j = np.searchsorted(keys, probe, side="left")
        jc = np.minimum(j, keys.size - 1)
        hit = alive & (uranks[jc] == np.arange(n_users)) \
            & (keys[jc] >= probe)
        alive = hit
        counts.append(int(hit.sum()))
        # next stage needs ts STRICTLY greater: floor = found ts + 1
        t_found = keys[jc] - np.arange(n_users, dtype=np.int64) * span
        t_prev = np.where(hit, t_found + 1, t_prev)
    return pa.table({
        "stage": pa.array(np.arange(n_stages, dtype=np.int64), pa.int64()),
        "n_users": pa.array(np.array(counts, np.int64), pa.int64()),
    })


def funnel_counts(sf_dir: str,
                  stages: tuple[str, ...] = FUNNEL_STAGES) -> pa.Table:
    """(stage_idx, stage, n_users) — users reaching each funnel stage
    under earliest-completion semantics; see module header."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    rows = ds.map_batches(_funnel_stamp_batch, batch_format="pyarrow",
                          zero_copy_batch=True,
                          fn_kwargs={"stages": list(stages)})
    partials = exchange_by_key(rows, "user_id", _funnel_partition,
                               proc_kwargs={"n_stages": len(stages)})
    parts = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    agg = np.zeros(len(stages), dtype=np.int64)
    for t in parts:
        agg[t["stage"].to_numpy(zero_copy_only=False)] += \
            t["n_users"].to_numpy(zero_copy_only=False)
    return pa.table({
        "stage_idx": pa.array(np.arange(len(stages), dtype=np.int64),
                              pa.int64()),
        "stage": pa.array(list(stages), pa.string()),
        "n_users": pa.array(agg, pa.int64()),
    })


def funnel_counts_sql(stages: tuple[str, ...] = FUNNEL_STAGES) -> str:
    """Oracle for ``funnel_counts``: chained min-ts CTEs with strict
    ts > predecessor joins."""
    ctes = [f"s0 AS (SELECT user_id, min(ts) AS t FROM events "
            f"WHERE event_type = '{stages[0]}' GROUP BY 1)"]
    for k in range(1, len(stages)):
        ctes.append(
            f"s{k} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN s{k - 1} p USING (user_id) "
            f"WHERE e.event_type = '{stages[k]}' AND e.ts > p.t "
            f"GROUP BY 1)")
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS stage_idx, '{s}' AS stage, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM s{k}"
        for k, s in enumerate(stages)]
    return "WITH " + ",\n".join(ctes) + "\n" \
        + "\nUNION ALL\n".join(selects)


# ---------------------------------------------------------------------------
# Cohort overlap — pairwise event-type audience Jaccard: for every
# unordered pair of event types, the distinct-user intersection, union
# and quantized Jaccard (inter * 1e9 // union — pure integers).  The
# audience-overlap matrix behind segmentation dashboards.
#
# Scale shape: per-batch (user, type) pair dedup, ONE exchange keyed
# by user co-locates each user's type set (types per user bounded by
# type cardinality), the partition task enumerates the per-user
# upper-triangle pairs vectorized and emits pair-count partials, and
# the fold is output-sized (|types|^2 rows).
# ---------------------------------------------------------------------------

def cohort_overlap(sf_dir: str) -> pa.Table:
    """(type_a, type_b, inter, union_, jac_q) for type_a < type_b."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "event_type": pa.array([], pa.string())})
        if batch.num_rows == 0:
            return empty
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        uid = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((et, uid))
        et, uid = et[order], uid[order]
        new = np.empty(uid.size, dtype=bool)
        new[0] = True
        new[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        return pa.table({
            "user_id": pa.array(uid[new], pa.int64()),
            "event_type": pa.array(et[new].tolist(), pa.string())})

    def overlap_partition(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], pa.string()),
                          "type_b": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if tbl.num_rows == 0:
            return empty
        et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((et, uid))
        et, uid = et[order], uid[order]
        new = np.empty(uid.size, dtype=bool)
        new[0] = True
        new[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        et, uid = et[new], uid[new]
        unew = np.empty(uid.size, dtype=bool)
        unew[0] = True
        unew[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(unew)
        lens = np.diff(np.append(starts, uid.size))
        pa_, pb_ = [], []
        for s, ln in zip(starts.tolist(), lens.tolist()):
            if ln < 2:
                continue
            # types sorted within user by the lexsort: upper triangle
            reps = np.arange(ln - 1, 0, -1)
            left = np.repeat(et[s:s + ln - 1], reps)
            idx = np.arange(int(reps.sum()))
            seg = np.concatenate(([0], np.cumsum(reps)[:-1]))
            off = idx - np.repeat(seg, reps)
            right = et[s:s + ln][np.repeat(np.arange(ln - 1), reps)
                                 + 1 + off]
            pa_.append(left)
            pb_.append(right)
        # size partials from the SAME exact-deduped rows (type_b = ''
        # sentinel): a pair may repeat across batches, so audience
        # sizes must count post-exchange distinct rows, not raw pairs
        su, sc = np.unique(et, return_counts=True)
        tab = {"type_a": list(su.tolist()),
               "type_b": [""] * su.size,
               "c": list(sc.astype(np.int64).tolist())}
        if pa_:
            left = np.concatenate(pa_)
            right = np.concatenate(pb_)
            key = np.asarray(
                [a + "\x00" + b
                 for a, b in zip(left.tolist(), right.tolist())],
                dtype=object)
            u, c = np.unique(key, return_counts=True)
            ab = [k.split("\x00") for k in u.tolist()]
            tab["type_a"] += [x[0] for x in ab]
            tab["type_b"] += [x[1] for x in ab]
            tab["c"] += list(c.astype(np.int64).tolist())
        return pa.table({
            "type_a": pa.array(tab["type_a"], pa.string()),
            "type_b": pa.array(tab["type_b"], pa.string()),
            "c": pa.array(tab["c"], pa.int64())})

    pairs = ds.map_batches(pair_partials, batch_format="pyarrow",
                           zero_copy_batch=True)
    parts = exchange_by_key(pairs, "user_id", overlap_partition)
    agg = parts.groupby(["type_a", "type_b"]).sum("c").to_pandas()
    sizes = (agg[agg["type_b"] == ""]
             .set_index("type_a")["sum(c)"])
    inter = agg[agg["type_b"] != ""]
    out = {c: [] for c in ("type_a", "type_b", "inter", "union_",
                           "jac_q")}
    inter = inter.sort_values(["type_a", "type_b"])
    for _, r in inter.iterrows():
        i = int(r["sum(c)"])
        un = int(sizes[r["type_a"]]) + int(sizes[r["type_b"]]) - i
        out["type_a"].append(r["type_a"])
        out["type_b"].append(r["type_b"])
        out["inter"].append(i)
        out["union_"].append(un)
        out["jac_q"].append(i * 1_000_000_000 // un)
    return pa.table({
        "type_a": pa.array(out["type_a"], pa.string()),
        "type_b": pa.array(out["type_b"], pa.string()),
        "inter": pa.array(out["inter"], pa.int64()),
        "union_": pa.array(out["union_"], pa.int64()),
        "jac_q": pa.array(out["jac_q"], pa.int64()),
    })


COHORT_OVERLAP_SQL = """
WITH p AS (SELECT DISTINCT user_id, event_type FROM events),
sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       FROM p GROUP BY event_type),
ix AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM p a JOIN p b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT ix.type_a, ix.type_b, ix.inter,
       CAST(sa.n + sb.n - ix.inter AS BIGINT) AS union_,
       CAST(ix.inter * 1000000000
            // (sa.n + sb.n - ix.inter) AS BIGINT) AS jac_q
FROM ix
JOIN sz sa ON sa.event_type = ix.type_a
JOIN sz sb ON sb.event_type = ix.type_b"""
