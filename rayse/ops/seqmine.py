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


def markov_transitions(sf_dir: str) -> pa.Table:
    """(prev_type, next_type, cnt, p_q): first-order transition counts
    and exact floored-rational probabilities — DuckDB hash-matched
    against the lag() oracle."""
    tbl = _fold_patterns(sf_dir, _pairs_proc)
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


def top_paths(sf_dir: str, k: int = TOP_PATHS_K) -> pa.Table:
    """(t1, t2, t3, cnt): top-``k`` consecutive event-type trigram paths
    by count (ties: ascending path) — DuckDB hash-matched against the
    double-lead() oracle."""
    tbl = _fold_patterns(sf_dir, _tri_proc)
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
