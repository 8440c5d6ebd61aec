"""Sequential-pattern mining over per-user event streams.

Two operators on the time-ordered event sequence of each user:

* ``markov_transitions`` — the first-order Markov transition table over
  event types: count of each (prev_type, next_type) adjacency plus the
  transition probability as an exact floored rational
  ``p_q = cnt * 10^6 // out_deg(prev_type)``. The behavioral-model /
  next-event-prediction training table.
* ``top_paths`` — the most frequent length-3 event-type paths
  (trigrams of consecutive events), the session-flow mining primitive.

Ordering contract: events order by (ts, event_id) within a user — the
event_id tie-break makes equal-timestamp adjacencies deterministic and
lets the SQL lag()/lead() oracle match bit-for-bit.

Distributed shape: one file-exchange by ``user_id`` (each user's stream
lands whole in one partition), one lexsort per partition, adjacency
masks (``user[i] == user[i+1]``) instead of any per-row loop, dictionary
encoding of type strings before pair/trigram hashing, and np.unique
partial counts so only (pattern, cnt) rows leave the task. A
type-cardinality groupby folds partials; the probability normalization
runs over the transition table itself (types^2-bounded, tiny).

Reference relationship: none (no sequence mining in the reference);
pins the ordered-adjacency machinery next to sessionize
(`rayse/ops/windows.py`) which shares the exchange-by-user idiom.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PROB_SCALE = 1_000_000
TOP_PATHS_K = 25
# \x1f (unit separator): numpy U-dtype strips trailing \x00, and the
# separator must sort below every alphanumeric so concatenated-pattern
# order equals tuple order (the SQL ORDER BY t1, t2, t3 contract)
_SEP = "\x1f"


def _adjacency_partials(t: pa.Table, gram: int) -> pa.Table:
    """Partial (pattern, cnt) counts of consecutive ``gram``-event
    type paths within each user's (ts, event_id)-ordered stream."""
    empty = pa.table({"pattern": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if t.num_rows < gram:
        return empty
    user = t["user_id"].to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)

    order = np.lexsort((eid, ts, user))
    user, et = user[order], et[order]

    # dictionary-encode types so pattern keys are small ints
    vocab, codes = np.unique(et.astype(str), return_inverse=True)
    nv = np.int64(vocab.size)

    same = np.ones(user.size - (gram - 1), dtype=bool)
    for off in range(1, gram):
        same &= user[off:user.size - (gram - 1) + off] == \
            user[:user.size - (gram - 1)]
    key = codes[:codes.size - (gram - 1)].astype(np.int64)
    for off in range(1, gram):
        key = key * nv + codes[off:codes.size - (gram - 1) + off]
    key = key[same]
    if key.size == 0:
        return empty
    uk, cnt = np.unique(key, return_counts=True)

    # decode pattern ids back to SEP-joined type strings
    parts = []
    rem = uk.copy()
    for _ in range(gram):
        parts.append(rem % nv)
        rem //= nv
    parts.reverse()
    pats = vocab[parts[0]]
    for p in parts[1:]:
        pats = np.char.add(np.char.add(pats, _SEP), vocab[p])
    return pa.table({
        "pattern": pa.array(pats.tolist(), pa.string()),
        "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def _pairs_proc(t: pa.Table) -> pa.Table:
    return _adjacency_partials(t, 2)


def _tri_proc(t: pa.Table) -> pa.Table:
    return _adjacency_partials(t, 3)


def _fold_patterns(sf_dir: str, proc) -> pa.Table:
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    partials = exchange_by_key(ds, "user_id", proc)
    agg = partials.groupby("pattern").sum("cnt")
    return pa.concat_tables(
        [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows],
        promote_options="default")


def markov_transitions(sf_dir: str, salted: bool = True) -> pa.Table:
    """(prev_type, next_type, cnt, p_q): first-order transition counts
    and exact floored-rational probabilities — DuckDB hash-matched
    against the lag() oracle. ``salted`` (default) routes through the
    two-stage (user, day-bucket) exchange + boundary stitch below;
    ``salted=False`` is the whole-user single exchange — bit-identical
    (pinned by tests)."""
    tbl = (_fold_patterns_salted(sf_dir, 2) if salted
           else _fold_patterns(sf_dir, _pairs_proc))
    pats = tbl["pattern"].to_pylist()
    cnt = tbl["sum(cnt)"].to_numpy(zero_copy_only=False)
    prev, nxt = zip(*(p.split(_SEP) for p in pats)) if pats else ((), ())
    out_deg: dict[str, int] = {}
    for p, c in zip(prev, cnt):
        out_deg[p] = out_deg.get(p, 0) + int(c)
    p_q = [int(c) * PROB_SCALE // out_deg[p] for p, c in zip(prev, cnt)]
    order = np.lexsort((np.array(nxt, dtype=object),
                        np.array(prev, dtype=object)))
    return pa.table({
        "prev_type": pa.array([prev[i] for i in order], pa.string()),
        "next_type": pa.array([nxt[i] for i in order], pa.string()),
        "cnt": pa.array([int(cnt[i]) for i in order], pa.int64()),
        "p_q": pa.array([p_q[i] for i in order], pa.int64()),
    })


MARKOV_TRANSITIONS_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS cnt
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
),
deg AS (SELECT prev_type, sum(cnt) AS od FROM pairs GROUP BY prev_type)
SELECT p.prev_type, p.next_type, CAST(p.cnt AS BIGINT) AS cnt,
       CAST(p.cnt * {PROB_SCALE} // d.od AS BIGINT) AS p_q
FROM pairs p JOIN deg d USING (prev_type)
ORDER BY p.prev_type, p.next_type
"""


def top_paths(sf_dir: str, k: int = TOP_PATHS_K,
              salted: bool = True) -> pa.Table:
    """(t1, t2, t3, cnt): top-``k`` consecutive event-type trigram paths
    by count (ties: ascending path) — DuckDB hash-matched against the
    double-lead() oracle. ``salted`` as in ``markov_transitions``."""
    tbl = (_fold_patterns_salted(sf_dir, 3) if salted
           else _fold_patterns(sf_dir, _tri_proc))
    pats = tbl["pattern"].to_pylist()
    cnt = tbl["sum(cnt)"].to_numpy(zero_copy_only=False)
    order = np.lexsort((np.array(pats, dtype=object), -cnt))[:k]
    t1, t2, t3 = zip(*(pats[i].split(_SEP) for i in order))
    return pa.table({
        "t1": pa.array(list(t1), pa.string()),
        "t2": pa.array(list(t2), pa.string()),
        "t3": pa.array(list(t3), pa.string()),
        "cnt": pa.array([int(cnt[i]) for i in order], pa.int64()),
    })


def top_paths_sql(k: int = TOP_PATHS_K) -> str:
    return f"""
WITH seq AS (
  SELECT user_id, event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS cnt
FROM seq WHERE t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY cnt DESC, t1, t2, t3
LIMIT {k}"""


# ---------------------------------------------------------------------------
# Skew-safe salted route (default): a single-user firehose must not pin
# one partition. Stage 1 keys by (user, day-bucket of ts) and emits
# (a) pattern partials for windows entirely inside one bucket and
# (b) the first/last (gram-1) rows of each (user, bucket) as boundary
# rows. Stage 2 keys by user over the boundary rows only — O(non-empty
# buckets x 2(gram-1)) per user — reconstructs exactly the windows that
# CROSS a bucket boundary: adjacent rows are stream-consecutive iff
# (same bucket and ordinal diff 1) or (last ordinal of a bucket
# followed by ordinal 0 of the next non-empty bucket), and a window
# counts iff every adjacent pair is consecutive and it spans >1 bucket
# (in-bucket windows were counted in stage 1).
# ---------------------------------------------------------------------------

BUCKET_US = 86_400_000_000


def _salted_local_grams(t: pa.Table, gram: int) -> pa.Table:
    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "kind": pa.array([], pa.int64()),
        "pattern": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "eid": pa.array([], pa.int64()),
        "bkt": pa.array([], pa.int64()),
        "ordinal": pa.array([], pa.int64()),
        "bsize": pa.array([], pa.int64()),
    })
    if t.num_rows == 0:
        return empty
    user = t["user_id"].to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    eid = t["event_id"].to_numpy(zero_copy_only=False)
    et = np.asarray(t["event_type"].to_pylist(), dtype=object)
    bkt = ts // BUCKET_US
    order = np.lexsort((eid, ts, bkt, user))
    user, ts, eid, et, bkt = (user[order], ts[order], eid[order],
                              et[order], bkt[order])

    # in-bucket gram partials: same-user AND same-bucket window
    vocab, codes = np.unique(et.astype(str), return_inverse=True)
    nv = np.int64(vocab.size)
    w = user.size - (gram - 1)
    parts = []
    if w > 0:
        same = np.ones(w, dtype=bool)
        for off in range(1, gram):
            same &= (user[off:w + off] == user[:w]) \
                & (bkt[off:w + off] == bkt[:w])
        key = codes[:w].astype(np.int64)
        for off in range(1, gram):
            key = key * nv + codes[off:w + off]
        key = key[same]
        if key.size:
            uk, cnt = np.unique(key, return_counts=True)
            rem = uk.copy()
            segs = []
            for _ in range(gram):
                segs.append(rem % nv)
                rem //= nv
            segs.reverse()
            pats = vocab[segs[0]]
            for p in segs[1:]:
                pats = np.char.add(np.char.add(pats, _SEP), vocab[p])
            parts.append(pa.table({
                "user_id": pa.array(
                    np.zeros(uk.size, np.int64), pa.int64()),
                "kind": pa.array(np.zeros(uk.size, np.int64),
                                 pa.int64()),
                "pattern": pa.array(pats.tolist(), pa.string()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "ts": pa.array(np.zeros(uk.size, np.int64), pa.int64()),
                "eid": pa.array(np.zeros(uk.size, np.int64),
                                pa.int64()),
                "bkt": pa.array(np.zeros(uk.size, np.int64),
                                pa.int64()),
                "ordinal": pa.array(np.zeros(uk.size, np.int64),
                                    pa.int64()),
                "bsize": pa.array(np.zeros(uk.size, np.int64),
                                  pa.int64()),
            }))

    # boundary rows: first/last (gram-1) per (user, bucket)
    new_g = np.r_[True, (user[1:] != user[:-1]) | (bkt[1:] != bkt[:-1])]
    gstart = np.flatnonzero(new_g)
    gsize = np.diff(np.r_[gstart, user.size])
    rowg = np.repeat(gstart, gsize)
    ordinal = np.arange(user.size) - rowg
    bsize = np.repeat(gsize, gsize)
    h = gram - 1
    is_edge = (ordinal < h) | (ordinal >= bsize - h)
    ei = np.flatnonzero(is_edge)
    if ei.size:
        parts.append(pa.table({
            "user_id": pa.array(user[ei], pa.int64()),
            "kind": pa.array(np.ones(ei.size, np.int64), pa.int64()),
            "pattern": pa.array(et[ei].astype(str).tolist(),
                                pa.string()),
            "cnt": pa.array(np.zeros(ei.size, np.int64), pa.int64()),
            "ts": pa.array(ts[ei], pa.int64()),
            "eid": pa.array(eid[ei], pa.int64()),
            "bkt": pa.array(bkt[ei], pa.int64()),
            "ordinal": pa.array(ordinal[ei], pa.int64()),
            "bsize": pa.array(bsize[ei], pa.int64()),
        }))
    if not parts:
        return empty
    return pa.concat_tables(parts)


def _salted_stitch(t: pa.Table, gram: int) -> pa.Table:
    """Stage 2: boundary rows of this partition's users -> pattern
    partials for windows crossing a bucket boundary."""
    empty = pa.table({"pattern": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    user = t["user_id"].to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False)
    eid = t["eid"].to_numpy(zero_copy_only=False)
    et = np.asarray(t["pattern"].to_pylist(), dtype=object)
    bkt = t["bkt"].to_numpy(zero_copy_only=False)
    ordinal = t["ordinal"].to_numpy(zero_copy_only=False)
    bsize = t["bsize"].to_numpy(zero_copy_only=False)

    order = np.lexsort((eid, ts, user))
    user, ts, eid, et, bkt, ordinal, bsize = (
        user[order], ts[order], eid[order], et[order], bkt[order],
        ordinal[order], bsize[order])

    w = user.size - (gram - 1)
    if w <= 0:
        return empty
    # stream-consecutive adjacent pairs
    same_u = user[1:] == user[:-1]
    same_b = same_u & (bkt[1:] == bkt[:-1])
    step = same_b & (ordinal[1:] == ordinal[:-1] + 1)
    jump = same_u & (bkt[1:] != bkt[:-1]) \
        & (ordinal[:-1] == bsize[:-1] - 1) & (ordinal[1:] == 0)
    valid = step | jump

    vocab, codes = np.unique(et.astype(str), return_inverse=True)
    nv = np.int64(vocab.size)
    ok = np.ones(w, dtype=bool)
    crosses = np.zeros(w, dtype=bool)
    for off in range(gram - 1):
        ok &= valid[off:w + off]
        crosses |= jump[off:w + off]
    key = codes[:w].astype(np.int64)
    for off in range(1, gram):
        key = key * nv + codes[off:w + off]
    key = key[ok & crosses]
    if key.size == 0:
        return empty
    uk, cnt = np.unique(key, return_counts=True)
    rem = uk.copy()
    segs = []
    for _ in range(gram):
        segs.append(rem % nv)
        rem //= nv
    segs.reverse()
    pats = vocab[segs[0]]
    for p in segs[1:]:
        pats = np.char.add(np.char.add(pats, _SEP), vocab[p])
    return pa.table({"pattern": pa.array(pats.tolist(), pa.string()),
                     "cnt": pa.array(cnt.astype(np.int64), pa.int64())})


def _local2(t: pa.Table) -> pa.Table:
    return _salted_local_grams(t, 2)


def _local3(t: pa.Table) -> pa.Table:
    return _salted_local_grams(t, 3)


def _stitch2(t: pa.Table) -> pa.Table:
    return _salted_stitch(t, 2)


def _stitch3(t: pa.Table) -> pa.Table:
    return _salted_stitch(t, 3)


def _fold_patterns_salted(sf_dir: str, gram: int) -> pa.Table:
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def stamp(batch: pa.Table) -> pa.Table:
        s = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view("int64")
        return batch.append_column(
            "bkt", pa.array(s // BUCKET_US, pa.int64()))

    stage1 = exchange_by_key(
        ds.map_batches(stamp, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["user_id", "bkt"], _local2 if gram == 2 else _local3)
    stage1 = stage1.materialize()
    local = stage1.filter(lambda r: r["kind"] == 0)
    edges = stage1.filter(lambda r: r["kind"] == 1)
    stitched = exchange_by_key(edges, "user_id",
                               _stitch2 if gram == 2 else _stitch3)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select(["pattern", "cnt"])

    allp = local.map_batches(strip, batch_format="pyarrow").union(
        stitched)
    agg = allp.groupby("pattern").sum("cnt")
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table({"pattern": pa.array([], pa.string()),
                         "sum(cnt)": pa.array([], pa.int64())})
    return pa.concat_tables(tables, promote_options="default")


# ---------------------------------------------------------------------------
# Sequence-pattern matching (MATCH_RECOGNIZE / CEP analog): each user's
# event-type history compacts to a one-char-per-event code string in
# strict (ts, event_id) order, and regex patterns over that alphabet
# count matching users — "clicked, browsed any number of times, then
# purchased" as a grep. ONE user-hash exchange; the per-user string
# build and regex probe are partition-local. Patterns stay in the
# RE2-compatible subset (literals, classes, closures) so Python re and
# DuckDB regexp_matches agree.
# ---------------------------------------------------------------------------

SEQ_CODE = {"click": "c", "view": "v", "purchase": "p",
            "signup": "s", "error": "e"}
SEQ_PATTERNS = ("cv*p", "c[ve]*p", "s.*p", "ee", "pv*p")


def _seqpat_proc(tbl: pa.Table, patterns: tuple) -> pa.Table:
    import re

    empty = pa.table({"pattern": pa.array([], pa.string()),
                      "n_users": pa.array([], pa.int64())})
    if tbl.num_rows == 0:
        return empty
    uid = tbl["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = tbl["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view("int64")
    eid = tbl["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
    order = np.lexsort((eid, ts, uid))
    uid, et = uid[order], et[order]
    codes = np.array([SEQ_CODE.get(t, "x") for t in et], dtype="U1")
    starts = np.flatnonzero(
        np.concatenate(([True], uid[1:] != uid[:-1])))
    ends = np.concatenate((starts[1:], [uid.size]))
    seqs = ["".join(codes[s:e]) for s, e in zip(starts, ends)]
    res = [re.compile(p) for p in patterns]
    counts = [sum(1 for s in seqs if r.search(s)) for r in res]
    return pa.table({
        "pattern": pa.array(list(patterns), pa.string()),
        "n_users": pa.array(counts, pa.int64()),
    })


def sequence_pattern_counts(sf_dir: str) -> pa.Table:
    """(pattern, n_users): users whose (ts, event_id)-ordered type
    code string matches each regex pattern — DuckDB hash-matched
    against the string_agg + regexp_matches oracle."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    out = exchange_by_key(ds, "user_id", _seqpat_proc,
                          proc_kwargs={"patterns": SEQ_PATTERNS})
    tbl = pa.concat_tables(
        [t for t in ray.get(out.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    pat = np.asarray(tbl["pattern"].to_pylist(), dtype=object)
    n = tbl["n_users"].to_numpy(zero_copy_only=False).astype(np.int64)
    out_p, out_n = [], []
    for p in SEQ_PATTERNS:
        m = pat == p
        out_p.append(p)
        out_n.append(int(n[m].sum()))
    return pa.table({
        "pattern": pa.array(out_p, pa.string()),
        "n_users": pa.array(out_n, pa.int64()),
    })


def sequence_pattern_counts_sql() -> str:
    code_case = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in SEQ_CODE.items())
    pats = ", ".join(f"('{p}')" for p in SEQ_PATTERNS)
    return f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(CASE event_type {code_case} ELSE 'x' END, ''
                    ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id),
pats(pattern) AS (VALUES {pats})
SELECT p.pattern,
       CAST(count(*) FILTER (regexp_matches(s.seq, p.pattern))
            AS BIGINT) AS n_users
FROM pats p CROSS JOIN seqs s
GROUP BY p.pattern
ORDER BY p.pattern"""
