"""Deduplication operators for training-data pipelines.

Five families (task brief): exact hash, n-gram Jaccard (exact), MinHash+LSH
(approximate candidate generation + exact verify), SimHash, embedding-cosine
near-dup. All are Ray-Data-first:

- exact:      vectorized content hash -> groupby(hash) (64-bit key, no
              full-text shuffle)
- jaccard:    EXACT prefix-filtered set-similarity join (PPJoin family):
              explode shingles -> attach df -> per-doc df-ordered prefix
              -> candidate pairs from prefix-shingle groups -> exact
              distributed verify. Hot shingles sort out of prefixes, so
              candidate generation is df-bounded, not quadratic in the
              hottest shingle's df.
- minhash:    batch-vectorized shingle->minhash signatures -> band rows ->
              per-bucket candidate pairs -> exact verify
- simhash:    64-bit simhash per doc -> bucket by 4 x 16-bit sub-bands ->
              hamming verify (all pairs <= k bits differ share a sub-band
              for k <= 3); word hash is FNV-1a, so the whole operator is
              DuckDB-expressible (``simhash_pairs_sql``)
- embedding:  blockwise cosine of L2-normalized vectors (numpy matmul per
              block pair; small side broadcast); LSH-bucketed route above
              a size threshold

Scale realization (round-3 rework): every keyed stage that previously ran
``groupby(key).map_groups`` (~0.2 ms/group Python dispatch — days of pure
overhead at 1e9+ distinct shingles) now uses the index build's partitioned
file-exchange idiom (``rayse.ops.exchange``): rows spill to Parquet
hive-partitioned by ``hash(key)``, then ONE task per partition processes
all its groups with numpy segment ops. Candidate-pair verification routes
by candidate count: small sets broadcast a partner map (``ray.put`` once)
and stream exact Jaccard over ``documents.parquet``; above
``broadcast_max_pairs`` the same verify runs as distributed hash-joins of
the pair table against the exploded candidate shingles — no driver
materialization on either route's hot side. Connected components likewise
route: driver union-find below ``driver_max_pairs``, iterated min-label
propagation (Dataset joins) above.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import exchange_by_key
from .textstats import (_FNV64_OFFSET, _FNV64_PRIME, fnv64_slices,
                        gram_slices, word_bounds)

# candidate sets above this broadcast threshold verify via distributed
# hash-joins instead of a ray.put partner map; pair graphs above the driver
# threshold cluster via distributed min-label propagation
BROADCAST_MAX_PAIRS = 1_000_000
DRIVER_MAX_PAIRS = 5_000_000


def _fnv64_str(s: str) -> int:
    """Scalar FNV-1a 64 over UTF-8 bytes — the reference definition the
    vectorized ``fnv64_slices`` matches bit-for-bit (pinned in tests)."""
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _hash64(s: str) -> int:
    """63-bit shingle hash (fits arrow int64 group keys)."""
    return _fnv64_str(s) >> 1


def _word_shingles(text: str, k: int) -> set:
    words = (text or "").split(" ")
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def _shingle_arrays(texts: list, shingle_k: int):
    """Vectorized distinct-shingle explode for a batch of texts: returns
    ``(doc_idx, sh, set_sizes)`` where rows are one per DISTINCT shingle
    per doc (63-bit FNV hashes) and ``set_sizes[i]`` = doc i's distinct
    count. Identical to hashing ``_word_shingles`` per doc (pinned by a
    property test), with no per-shingle Python strings."""
    buf, g_start, lens, g_cum = gram_slices(texts, shingle_k)
    h = (fnv64_slices(buf, g_start, lens) >> np.uint64(1)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64),
                        np.diff(g_cum))
    order = np.lexsort((h, doc_idx))
    d2, h2 = doc_idx[order], h[order]
    keep = np.ones(d2.size, dtype=bool)
    keep[1:] = (d2[1:] != d2[:-1]) | (h2[1:] != h2[:-1])
    d2, h2 = d2[keep], h2[keep]
    sizes = np.bincount(d2, minlength=len(texts))
    return d2, h2, sizes


_EMPTY_PAIRS = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}


# -- exact -------------------------------------------------------------------

def exact_dedup(sf_dir: str):
    """Lowest doc_id per distinct text + copy count (SE4 keep-first
    semantics, `ReindexController.java:62-67`)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        buf, doc_off, _, _, _ = word_bounds(texts)
        h = fnv64_slices(buf, doc_off[:-1], np.diff(doc_off))
        return pa.table({"doc_id": batch["doc_id"],
                         "h": pa.array((h >> np.uint64(1)).astype(np.int64),
                                       pa.int64())})

    agg = (ds.map_batches(add_hash, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("h")
           .aggregate(rd.aggregate.Min("doc_id"), rd.aggregate.Count()))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["min(doc_id)"],
            "n_copies": pa.compute.cast(batch["count()"], pa.int64()),
        })

    return agg.map_batches(rename, batch_format="pyarrow")


# -- exact n-gram Jaccard ----------------------------------------------------

def _explode_shingles(ds, shingle_k: int, cand_ref=None):
    """documents Dataset -> (doc_id, sh, set_size) rows, one per DISTINCT
    shingle per doc (vectorized, ``_shingle_arrays``). ``cand_ref``:
    optional ray.ObjectRef of a container of doc_ids — only those docs
    explode (the semi-join filter shared with pair verification; ONE copy
    of the shingling logic keeps candidate generation and verification in
    sync)."""
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        if cand_ref is not None:
            import ray

            cand = ray.get(cand_ref)
            m = np.fromiter((int(i) in cand for i in ids), dtype=bool,
                            count=ids.size)
            ids, texts = ids[m], [t for t, keep in zip(texts, m) if keep]
        if not len(texts):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.int64()),
                             "set_size": pa.array([], pa.int64())})
        d2, h2, sizes = _shingle_arrays(texts, shingle_k)
        return pa.table({"doc_id": pa.array(ids[d2], pa.int64()),
                         "sh": pa.array(h2, pa.int64()),
                         "set_size": pa.array(sizes[d2], pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


# -- exchange partition procs (module-level: shipped to Ray tasks) -----------

def _attach_df_part(t: pa.Table) -> pa.Table:
    """Whole-partition df attach: all rows of a shingle live here, so each
    shingle's df is its row count (rows are distinct per doc)."""
    sh = t["sh"].to_numpy(zero_copy_only=False)
    _, inv, counts = np.unique(sh, return_inverse=True, return_counts=True)
    return t.append_column("df", pa.array(counts[inv].astype(np.int64),
                                          pa.int64()))


def _ceil_tn_map(sizes: np.ndarray, t_num: int, t_den: int) -> np.ndarray:
    """Exact rational ceil(t*n) per row, computed once per DISTINCT n with
    Python ints (no int64 overflow for pathological float thresholds).
    Remainders below 2^-40 relative are float-representation artifacts —
    see the prefix-length note in ``jaccard_pairs``."""
    uniq = np.unique(sizes)
    lut = {}
    for n in uniq.tolist():
        q, rem = divmod(t_num * n, t_den)
        if rem and rem * (1 << 40) >= t_den:
            q += 1
        lut[n] = q
    return np.fromiter((lut[n] for n in sizes.tolist()), np.int64,
                       sizes.size)


def _prefix_part(t: pa.Table, t_num: int, t_den: int) -> pa.Table:
    """Whole-partition per-doc prefix: sort (doc, df, sh), keep the first
    n - ceil(t*n) + 1 rows of each doc (prefix-filter theorem)."""
    if t.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "sh": pa.array([], pa.int64())})
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    sh = t["sh"].to_numpy(zero_copy_only=False)
    df = t["df"].to_numpy(zero_copy_only=False)
    order = np.lexsort((sh, df, d))
    d2, sh2 = d[order], sh[order]
    starts = np.concatenate(([0], np.flatnonzero(d2[1:] != d2[:-1]) + 1))
    counts = np.diff(np.concatenate((starts, [d2.size])))
    plen = counts - _ceil_tn_map(counts, t_num, t_den) + 1
    rank = np.arange(d2.size, dtype=np.int64) - np.repeat(starts, counts)
    keep = rank < np.repeat(plen, counts)
    return pa.table({"doc_id": pa.array(d2[keep], pa.int64()),
                     "sh": pa.array(sh2[keep], pa.int64())})


def _group_pairs_part(t: pa.Table, group_cols: list,
                      id_col: str = "doc_id") -> pa.Table:
    """Whole-partition candidate-pair generation: for every group of
    ``group_cols`` emit all unordered id pairs (a < b). Groups are found by
    one lexsort; the per-group triu loop touches only groups with >= 2
    distinct ids (numpy per group, no Ray dispatch). Pairs are deduped
    within the partition."""
    if t.num_rows == 0:
        return pa.table(_EMPTY_PAIRS)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    keys = [t[c].to_numpy(zero_copy_only=False) for c in group_cols]
    order = np.lexsort((ids, *keys[::-1]))
    ids_s = ids[order]
    keys_s = [k[order] for k in keys]
    change = np.zeros(ids_s.size, dtype=bool)
    change[0] = True
    for k in keys_s:
        change[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    counts = np.diff(np.concatenate((starts, [ids_s.size])))
    out_a, out_b = [], []
    for s, c in zip(starts[counts >= 2].tolist(),
                    counts[counts >= 2].tolist()):
        seg = ids_s[s:s + c]
        seg = seg[np.concatenate(([True], seg[1:] != seg[:-1]))]
        if seg.size < 2:
            continue
        ia, ib = np.triu_indices(seg.size, k=1)
        out_a.append(seg[ia])
        out_b.append(seg[ib])
    if not out_a:
        return pa.table(_EMPTY_PAIRS)
    ab = np.unique(np.stack((np.concatenate(out_a),
                             np.concatenate(out_b)), axis=1), axis=0)
    return pa.table({"a": pa.array(ab[:, 0], pa.int64()),
                     "b": pa.array(ab[:, 1], pa.int64())})


def _cand_pairs_part(t: pa.Table, cand_ref) -> pa.Table:
    """Whole-partition verify-side pair emit (broadcast route): for every
    shingle group, emit only pairs present in the broadcast partner map,
    with both set sizes. One output row per (pair, shared shingle)."""
    import ray

    if t.num_rows == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "sa": pa.array([], pa.int64()),
                         "sb": pa.array([], pa.int64())})
    partners = ray.get(cand_ref)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    sh = t["sh"].to_numpy(zero_copy_only=False)
    sz = t["set_size"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, sh))
    d, sh, sz = d[order], sh[order], sz[order]
    starts = np.concatenate(([0], np.flatnonzero(sh[1:] != sh[:-1]) + 1))
    counts = np.diff(np.concatenate((starts, [sh.size])))
    oa, ob, osa, osb = [], [], [], []
    for s, c in zip(starts[counts >= 2].tolist(),
                    counts[counts >= 2].tolist()):
        size_of = dict(zip(d[s:s + c].tolist(), sz[s:s + c].tolist()))
        for a in size_of:
            for b in partners.get(a, ()):
                if a < b and b in size_of:
                    oa.append(a)
                    ob.append(b)
                    osa.append(size_of[a])
                    osb.append(size_of[b])
    return pa.table({"a": pa.array(oa, pa.int64()),
                     "b": pa.array(ob, pa.int64()),
                     "sa": pa.array(osa, pa.int64()),
                     "sb": pa.array(osb, pa.int64())})


def _distinct_ids_part(t: pa.Table) -> pa.Table:
    """Whole-partition distinct over a single int64 ``doc_id`` column."""
    ids = np.unique(t["doc_id"].to_numpy(zero_copy_only=False))
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def _distinct_pairs_part(t: pa.Table) -> pa.Table:
    """Whole-partition distinct over (a, b) rows (all copies of a pair
    land in one partition — exchange key is the pair)."""
    if t.num_rows == 0:
        return pa.table(_EMPTY_PAIRS)
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    ab = np.unique(np.stack((a, b), axis=1), axis=0)
    return pa.table({"a": pa.array(ab[:, 0], pa.int64()),
                     "b": pa.array(ab[:, 1], pa.int64())})


def _count_verify_part(t: pa.Table, threshold: float) -> pa.Table:
    """Whole-partition |A∩B| count + exact-J filter: input rows are one
    per (pair, shared shingle), all rows of a pair in this partition."""
    if t.num_rows == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    sa = t["sa"].to_numpy(zero_copy_only=False)
    sb = t["sb"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b, sa, sb = a[order], b[order], sa[order], sb[order]
    new = np.ones(a.size, dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    inter = np.diff(np.concatenate((starts, [a.size]))).astype(np.float64)
    sa0 = sa[starts].astype(np.float64)
    sb0 = sb[starts].astype(np.float64)
    keep = inter / (sa0 + sb0 - inter) >= threshold
    return pa.table({
        "doc_a": pa.array(a[starts][keep], pa.int64()),
        "doc_b": pa.array(b[starts][keep], pa.int64()),
    })


# -- verification routes -----------------------------------------------------

def verify_pairs_distributed(sf_dir: str, cand_pairs, shingle_k: int,
                             threshold: float,
                             verify_part=None, verify_kwargs=None):
    """EXACT Jaccard verification of candidate pairs as a distributed
    semi-join over ``documents.parquet`` — broadcast route (the pattern the
    reference's batched hydration plays, `QueryService.java:739-746`):
    broadcast the candidate doc->partners map (``ray.put`` once, read in
    every task; bounded by the candidate-pair set) -> re-explode ONLY
    candidate docs' shingles -> per-shingle exchange partitions emit
    candidate pairs -> groupby(pair).count == |A∩B| exactly -> J =
    c / (|A|+|B|-c). The driver never sees any text. For candidate sets
    too large to broadcast, ``verify_pairs_hashjoin`` runs the same verify
    as distributed hash-joins (``verify_pairs`` routes automatically)."""
    import ray
    import ray.data as rd

    cand_pairs = sorted({(int(a), int(b)) if a < b else (int(b), int(a))
                         for a, b in cand_pairs})
    if not cand_pairs:
        return rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64())}))
    partners: dict[int, set] = {}
    for a, b in cand_pairs:
        partners.setdefault(a, set()).add(b)
        partners.setdefault(b, set()).add(a)
    ref = ray.put(partners)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    exploded = _explode_shingles(ds, shingle_k, cand_ref=ref)
    pair_rows = exchange_by_key(exploded, "sh", _cand_pairs_part,
                                proc_kwargs={"cand_ref": ref})
    return exchange_by_key(
        pair_rows, ["a", "b"], verify_part or _count_verify_part,
        proc_kwargs=verify_kwargs or {"threshold": threshold})


def verify_pairs_hashjoin(sf_dir: str, pairs_ds, shingle_k: int,
                          threshold: float, num_partitions: int | None = None,
                          verify_part=None, verify_kwargs=None):
    """EXACT Jaccard verification with NO driver materialization and NO
    broadcast — the large-candidate-set route: the distinct pair table
    joins the exploded candidate-doc shingles on each side, shared-shingle
    rows count per pair, J filters exactly. ``pairs_ds``: Dataset with
    int64 columns (a, b), a < b, assumed distinct."""
    import ray
    import ray.data as rd

    # join partition count caps at the CPU count: Ray's hash-shuffle join
    # schedules one aggregator per partition — more partitions than CPUs
    # deadlocks a small cluster (at scale, pass num_partitions explicitly)
    P = num_partitions or max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)

    def _ids(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pa.concat_arrays([
            batch["a"].combine_chunks() if isinstance(batch["a"],
                                                      pa.ChunkedArray)
            else batch["a"],
            batch["b"].combine_chunks() if isinstance(batch["b"],
                                                      pa.ChunkedArray)
            else batch["b"]])})

    cand_ids = exchange_by_key(
        pairs_ds.map_batches(_ids, batch_format="pyarrow"), "doc_id",
        _distinct_ids_part)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    cand_docs = docs.join(cand_ids, "inner", P, on=("doc_id",))
    sh = _explode_shingles(cand_docs, shingle_k)

    def _as_a(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch["doc_id"], "sh": batch["sh"],
                         "sa": batch["set_size"]})

    def _as_b(batch: pa.Table) -> pa.Table:
        return pa.table({"b": batch["doc_id"], "sh": batch["sh"],
                         "sb": batch["set_size"]})

    sh_a = sh.map_batches(_as_a, batch_format="pyarrow")
    sh_b = sh.map_batches(_as_b, batch_format="pyarrow")
    j1 = pairs_ds.join(sh_a, "inner", P, on=("a",))      # a, b, sh, sa
    j2 = j1.join(sh_b, "inner", P, on=("b", "sh"))       # a, b, sh, sa, sb
    return exchange_by_key(
        j2, ["a", "b"], verify_part or _count_verify_part,
        proc_kwargs=verify_kwargs or {"threshold": threshold})


def verify_pairs(sf_dir: str, cand_ds, shingle_k: int, threshold: float,
                 route: str = "auto",
                 broadcast_max_pairs: int = BROADCAST_MAX_PAIRS,
                 _cand_stats: dict | None = None,
                 verify_part=None, verify_kwargs=None):
    """Route candidate verification by candidate count: broadcast partner
    map below ``broadcast_max_pairs`` distinct pairs, distributed
    hash-joins above (identical outputs — pinned by pytest equality).
    ``verify_part``/``verify_kwargs`` swap the final pair-keyed partition
    proc (default: exact-Jaccard ``_count_verify_part``)."""
    # distinct candidates via the pair-keyed exchange (its output blocks
    # are concrete object-store tables, so the routing count() and the
    # downstream verify share them — no lineage re-execution)
    distinct = exchange_by_key(cand_ds, ["a", "b"], _distinct_pairs_part)
    n = distinct.count()
    if _cand_stats is not None:
        _cand_stats["n_candidates"] = n
    if route == "auto":
        route = "broadcast" if n <= broadcast_max_pairs else "hashjoin"
    if route == "broadcast":
        cand_pairs = [(r["a"], r["b"]) for r in distinct.take_all()]
        return verify_pairs_distributed(sf_dir, cand_pairs, shingle_k,
                                        threshold, verify_part=verify_part,
                                        verify_kwargs=verify_kwargs)
    if route == "hashjoin":
        return verify_pairs_hashjoin(sf_dir, distinct, shingle_k, threshold,
                                     verify_part=verify_part,
                                     verify_kwargs=verify_kwargs)
    raise ValueError(f"unknown verify route {route!r}")


def jaccard_pairs(sf_dir: str, shingle_k: int = 3, threshold: float = 0.5,
                  _cand_stats: dict | None = None, verify_route: str = "auto",
                  broadcast_max_pairs: int = BROADCAST_MAX_PAIRS):
    """All document pairs with word-``shingle_k``-gram Jaccard >=
    ``threshold`` — EXACT, via a prefix-filtered set-similarity join
    (PPJoin-family, Xiao et al., WWW'08):

    1. explode (doc_id, sh, set_size)   [vectorized FNV shingles]
    2. exchange by sh: attach each shingle's df (its partition row count)
    3. exchange by doc_id: order each doc's shingles by ascending (df, sh)
       and keep only the PREFIX of length n - ceil(t*n) + 1
    4. exchange by sh over prefix rows: per-group candidate pairs
    5. exact |A∩B| verification (``verify_pairs``: broadcast semi-join or
       hash-join, routed by candidate count)

    Exactness: under any global shingle order, two sets with J >= t must
    share a shingle within both prefixes (prefix-filter theorem; pinned by
    a brute-force-equality test incl. Zipf-skewed fixtures). Hot shingles
    have maximal df, so they sort to the END of every doc's order and
    almost never enter a prefix — pair generation is df-bounded instead of
    quadratic in the hottest shingle's df.

    Prefix length uses an exact rational ceil(t*n): math.ceil(0.28*25)==8
    (the double 0.28 is a hair ABOVE 7/25) would shorten the prefix below
    the theorem's minimum and silently DROP the J == 7/25 pair the float
    verification accepts; remainders below 2^-40 relative are treated as
    zero (erring to LONGER prefixes is always safe — verification is
    exact).

    Scale: all three keyed stages run as partitioned file exchanges with
    whole-partition numpy procs (the index build's idiom) — per-KEY cost
    is a few ns of segment arithmetic, not a Ray per-group dispatch, and
    nothing corpus-sized ever reaches the driver on either verify route."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    shingles = _explode_shingles(ds, shingle_k)
    t_num, t_den = float(threshold).as_integer_ratio()
    with_df = exchange_by_key(shingles, "sh", _attach_df_part)
    prefixes = exchange_by_key(with_df, "doc_id", _prefix_part,
                               proc_kwargs={"t_num": t_num, "t_den": t_den})
    cands = exchange_by_key(prefixes, "sh", _group_pairs_part,
                            proc_kwargs={"group_cols": ["sh"]})
    return verify_pairs(sf_dir, cands, shingle_k, threshold,
                        route=verify_route,
                        broadcast_max_pairs=broadcast_max_pairs,
                        _cand_stats=_cand_stats)


# -- containment (asymmetric set-similarity) join ------------------------------

def _prefix_flag_part(t: pa.Table, t_num: int, t_den: int) -> pa.Table:
    """Like ``_prefix_part`` but keeps EVERY row, flagging the prefix
    (containment candidate generation needs prefix rows on the source
    side joined against FULL sets on the destination side)."""
    if t.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "sh": pa.array([], pa.int64()),
                         "in_prefix": pa.array([], pa.bool_())})
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    sh = t["sh"].to_numpy(zero_copy_only=False)
    df = t["df"].to_numpy(zero_copy_only=False)
    order = np.lexsort((sh, df, d))
    d2, sh2 = d[order], sh[order]
    starts = np.concatenate(([0], np.flatnonzero(d2[1:] != d2[:-1]) + 1))
    counts = np.diff(np.concatenate((starts, [d2.size])))
    plen = counts - _ceil_tn_map(counts, t_num, t_den) + 1
    rank = np.arange(d2.size, dtype=np.int64) - np.repeat(starts, counts)
    flag = rank < np.repeat(plen, counts)
    return pa.table({"doc_id": pa.array(d2, pa.int64()),
                     "sh": pa.array(sh2, pa.int64()),
                     "in_prefix": pa.array(flag, pa.bool_())})


def _containment_group_pairs_part(t: pa.Table) -> pa.Table:
    """Per-shingle candidate pairs for containment: (prefix doc) x (any
    doc) per group, normalized to unordered a < b and deduped within the
    partition. Hot shingles sort OUT of prefixes (maximal df), so their
    groups contribute pairs only through the rare docs that still hold
    them in a prefix — df-bounded, not quadratic."""
    if t.num_rows == 0:
        return pa.table(_EMPTY_PAIRS)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    sh = t["sh"].to_numpy(zero_copy_only=False)
    pf = t["in_prefix"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, sh))
    ids, sh, pf = ids[order], sh[order], pf[order]
    change = np.empty(ids.size, dtype=bool)
    change[0] = True
    change[1:] = sh[1:] != sh[:-1]
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, ids.size))
    out_a, out_b = [], []
    for s, c in zip(starts.tolist(), counts.tolist()):
        seg_ids = ids[s:s + c]
        seg_pf = pf[s:s + c]
        if c < 2 or not seg_pf.any():
            continue
        src = seg_ids[seg_pf]
        a = np.repeat(src, c)
        b = np.tile(seg_ids, src.size)
        m = a != b
        a, b = a[m], b[m]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out_a.append(lo)
        out_b.append(hi)
    if not out_a:
        return pa.table(_EMPTY_PAIRS)
    ab = np.unique(np.stack((np.concatenate(out_a),
                             np.concatenate(out_b)), axis=1), axis=0)
    return pa.table({"a": pa.array(ab[:, 0], pa.int64()),
                     "b": pa.array(ab[:, 1], pa.int64())})


def _containment_verify_part(t: pa.Table, t_num: int,
                             t_den: int) -> pa.Table:
    """|A∩B| per unordered pair -> ordered (src_id, dst_id) rows for
    every direction passing EXACT rational containment
    ``inter * t_den >= t_num * |src|`` (integer compare; the oracle
    mirrors it as ``t_den * len(intersect) >= t_num * len(src)``)."""
    empty = pa.table({"src_id": pa.array([], pa.int64()),
                      "dst_id": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    sa = t["sa"].to_numpy(zero_copy_only=False)
    sb = t["sb"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b, sa, sb = a[order], b[order], sa[order], sb[order]
    new = np.ones(a.size, dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    inter = np.diff(np.concatenate((starts, [a.size])))
    a0, b0 = a[starts], b[starts]
    sa0, sb0 = sa[starts], sb[starts]
    ab_ok = inter * t_den >= t_num * sa0        # a contained in b
    ba_ok = inter * t_den >= t_num * sb0        # b contained in a
    return pa.table({
        "src_id": pa.array(np.concatenate((a0[ab_ok], b0[ba_ok])),
                           pa.int64()),
        "dst_id": pa.array(np.concatenate((b0[ab_ok], a0[ba_ok])),
                           pa.int64())})


def containment_pairs(sf_dir: str, shingle_k: int = 3,
                      t_num: int = 9, t_den: int = 10,
                      verify_route: str = "auto",
                      broadcast_max_pairs: int = BROADCAST_MAX_PAIRS):
    """All ORDERED document pairs (src, dst) with set containment
    ``|src ∩ dst| / |src| >= t_num/t_den`` over distinct word
    ``shingle_k``-grams — near-containment detection (quotes, subset
    pages, partial copies: the asymmetric case Jaccard misses when the
    destination is much larger than the source).

    Same PPJoin-family machinery as `jaccard_pairs` with the asymmetric
    prefix theorem: if |A∩B| >= t|A| then A's prefix (ascending global
    (df, sh) order, length |A| - ceil(t|A|) + 1) must intersect B — so
    candidates are (prefix row) x (full-set row) per shingle group, and
    verification is the same exact intersection count tested per
    DIRECTION with a pure-integer rational compare. All keyed stages are
    partitioned file exchanges; the verify is count-routed
    (broadcast / hash-join) exactly like the Jaccard family."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    shingles = _explode_shingles(ds, shingle_k)
    with_df = exchange_by_key(shingles, "sh", _attach_df_part)
    flagged = exchange_by_key(with_df, "doc_id", _prefix_flag_part,
                              proc_kwargs={"t_num": t_num, "t_den": t_den})
    cands = exchange_by_key(flagged, "sh", _containment_group_pairs_part)
    return verify_pairs(sf_dir, cands, shingle_k, t_num / t_den,
                        route=verify_route,
                        broadcast_max_pairs=broadcast_max_pairs,
                        verify_part=_containment_verify_part,
                        verify_kwargs={"t_num": t_num, "t_den": t_den})


def containment_pairs_sql(shingle_k: int = 3, t_num: int = 9,
                          t_den: int = 10) -> str:
    """Brute-force oracle over distinct word-``shingle_k``-gram sets
    (short docs: one whole-text gram, the `_word_shingles` convention),
    the same integer rational compare, both directions."""
    return f"""
WITH ct_g AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ct AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(w) < {shingle_k} THEN [array_to_string(w, ' ')]
         ELSE [array_to_string(list_slice(w, j + 1, j + {shingle_k}), ' ')
               FOR j IN range(len(w) - {shingle_k - 1})]
    END) AS s
  FROM ct_g)
SELECT a.doc_id AS src_id, b.doc_id AS dst_id
FROM ct a JOIN ct b ON a.doc_id != b.doc_id
WHERE {t_den} * len(list_intersect(a.s, b.s)) >= {t_num} * len(a.s)"""


# -- connected components ----------------------------------------------------

def _cc_driver(pairs: pa.Table) -> pa.Table:
    """Union-find with path compression over the pair graph (driver-side
    route: fine while pairs ≪ corpus)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:        # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    label: dict[int, int] = {}
    for n in parent:
        r = find(n)
        label[r] = min(label.get(r, r), n)
    nodes = sorted(parent)
    return pa.table({
        "doc_id": pa.array(nodes, pa.int64()),
        "cluster_id": pa.array([label[find(n)] for n in nodes], pa.int64()),
    })


def _cc_distributed(pairs_ds, num_partitions: int | None = None,
                    max_rounds: int = 64) -> pa.Table:
    """Iterated min-label propagation over the pair graph as Dataset
    joins — the algorithm the SQL oracle's recursive CTE runs, distributed
    (the large-pair-graph route): each round every node takes the min of
    its own label and its neighbors' labels; converged when no label
    changes, with POINTER JUMPING (each round also takes the label OF the
    label — valid because every label is itself a node id in the same
    component), so chains collapse in O(log diameter) rounds instead of
    O(diameter). Labels materialize per round to truncate lineage; the
    edge set streams every round."""
    import ray
    import ray.data as rd

    # join partition count caps at the CPU count: Ray's hash-shuffle join
    # schedules one aggregator per partition — more partitions than CPUs
    # deadlocks a small cluster (at scale, pass num_partitions explicitly)
    P = num_partitions or max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)

    def _both_dirs(batch: pa.Table) -> pa.Table:
        a = (batch["doc_a"].combine_chunks()
             if isinstance(batch["doc_a"], pa.ChunkedArray)
             else batch["doc_a"])
        b = (batch["doc_b"].combine_chunks()
             if isinstance(batch["doc_b"], pa.ChunkedArray)
             else batch["doc_b"])
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = pairs_ds.map_batches(_both_dirs,
                                 batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})

    def _init_lbl(batch: pa.Table) -> pa.Table:
        node = batch["src"].to_numpy(zero_copy_only=False)
        mn = batch["min(dst)"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(node, pa.int64()),
                         "lbl": pa.array(np.minimum(node, mn), pa.int64())})

    labels = (edges.groupby("src").min("dst")
              .map_batches(_init_lbl, batch_format="pyarrow").materialize())

    def _msg(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["src"], "lbl": batch["lbl"]})

    def _strip_min(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "lbl": batch["min(lbl)"]})

    def _count_changed(batch: pa.Table) -> pa.Table:
        ch = int((batch["lbl"].to_numpy(zero_copy_only=False)
                  < batch["old"].to_numpy(zero_copy_only=False)).sum())
        return pa.table({"c": pa.array([ch], pa.int64())})

    def _as_jump(batch: pa.Table) -> pa.Table:
        return pa.table({"jnode": batch["node"], "jlbl": batch["lbl"]})

    def _apply_jump(batch: pa.Table) -> pa.Table:
        lbl = batch["lbl"].to_numpy(zero_copy_only=False)
        jlbl = batch["jlbl"].to_numpy(zero_copy_only=False)
        return pa.table({"node": batch["node"],
                         "lbl": pa.array(np.minimum(lbl, jlbl), pa.int64())})

    for _ in range(max_rounds):
        msgs = (edges.join(labels, "inner", P, on=("dst",),
                           right_on=("node",))
                .map_batches(_msg, batch_format="pyarrow"))
        new = (labels.union(msgs).groupby("node").min("lbl")
               .map_batches(_strip_min, batch_format="pyarrow").materialize())
        # pointer jump: lbl(x) <- min(lbl(x), lbl(lbl(x))) — every label is
        # a node id (init = min(self, neighbor); min preserves it), so the
        # inner self-join is total
        new = (new.join(new.map_batches(_as_jump, batch_format="pyarrow"),
                        "inner", P, on=("lbl",), right_on=("jnode",))
               .map_batches(_apply_jump, batch_format="pyarrow").materialize())
        old = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "old": b["lbl"]}),
            batch_format="pyarrow")
        changed = (new.join(old, "inner", P, on=("node",))
                   .map_batches(_count_changed, batch_format="pyarrow")
                   .sum("c"))
        labels = new
        if not changed:
            break
    else:
        raise RuntimeError(f"min-label propagation did not converge in "
                           f"{max_rounds} rounds")
    import ray as _ray

    parts = [t for t in _ray.get(labels.to_arrow_refs()) if t.num_rows]
    tbl = (pa.concat_tables(parts, promote_options="default") if parts
           else pa.table({"node": pa.array([], pa.int64()),
                          "lbl": pa.array([], pa.int64())}))
    node = tbl["node"].to_numpy(zero_copy_only=False)
    lbl = tbl["lbl"].to_numpy(zero_copy_only=False)
    order = np.argsort(node, kind="stable")
    return pa.table({
        "doc_id": pa.array(node[order], pa.int64()),
        "cluster_id": pa.array(lbl[order], pa.int64()),
    })


def dedup_clusters(sf_dir: str, shingle_k: int = 3, threshold: float = 0.5,
                   pairs: pa.Table | None = None, route: str = "auto",
                   driver_max_pairs: int = DRIVER_MAX_PAIRS):
    """Near-dup CLUSTER assignment: connected components over the verified
    near-dup pair graph; ``cluster_id`` = smallest doc_id in the component
    (the keep-first canonical — SE4 semantics lifted from exact to near
    duplicates). Only docs appearing in >= 1 pair get a row.

    Routes by pair count (identical outputs, pinned by pytest): driver
    union-find below ``driver_max_pairs`` (the pair graph is the
    already-reduced dedup output — orders of magnitude smaller than the
    corpus), distributed min-label propagation above (``_cc_distributed``;
    the SQL oracle's recursive CTE is that algorithm)."""
    pairs_ds = None
    if pairs is None:
        # materialized: the routing count() and the chosen route's consumer
        # must not re-execute the whole verify pipeline
        pairs_ds = jaccard_pairs(sf_dir, shingle_k, threshold).materialize()
        n_pairs = pairs_ds.count()
    else:
        n_pairs = pairs.num_rows
    if route == "auto":
        route = "driver" if n_pairs <= driver_max_pairs else "distributed"
    if route == "driver":
        if pairs is None:
            # arrow-ref gather, NOT take_all(): per-row Python dicts at
            # millions of pairs dominate the whole op
            import ray

            parts = [t for t in ray.get(pairs_ds.to_arrow_refs())
                     if t.num_rows]
            pairs = (pa.concat_tables(parts, promote_options="default")
                     if parts else
                     pa.table({"doc_a": pa.array([], pa.int64()),
                               "doc_b": pa.array([], pa.int64())}))
        if pairs.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64())})
        return _cc_driver(pairs)
    if route == "distributed":
        import ray.data as rd

        if pairs_ds is None:
            pairs_ds = rd.from_arrow(pairs)
        return _cc_distributed(pairs_ds)
    raise ValueError(f"unknown cluster route {route!r}")


def dedup_clusters_sql(threshold: float = 0.9) -> str:
    """DuckDB oracle: the word-shingle (k=1) Jaccard pair graph + recursive
    min-label propagation to the component minimum."""
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
  FROM documents),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / len(list_distinct(a.s || b.s)) >= {threshold}),
edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
lbl(node, lbl) AS (
  SELECT a AS node, least(a, min(b)) AS lbl FROM edges GROUP BY a
  UNION
  SELECT e.a AS node, least(l.lbl, e.a) AS lbl
  FROM edges e JOIN lbl l ON e.b = l.node)
SELECT node AS doc_id, min(lbl) AS cluster_id FROM lbl GROUP BY node"""


def _antijoin_partition(tbl: pa.Table) -> pa.Table:
    """(doc_id, is_drop) marker rows of one partition -> ids with NO drop
    marker (distributed anti-join reducer)."""
    if tbl.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    drop = tbl["is_drop"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    s, d = ids[order], drop[order]
    new = np.empty(s.size, dtype=bool)
    new[0] = True
    new[1:] = s[1:] != s[:-1]
    starts = np.flatnonzero(new)
    dropped = np.maximum.reduceat(d, starts) > 0
    return pa.table({"doc_id": pa.array(s[starts][~dropped], pa.int64())})


def near_dedup_keep(sf_dir: str, shingle_k: int = 3,
                    threshold: float = 0.5,
                    broadcast_limit: int = 2_000_000):
    """THE training-data dedup output: doc_ids surviving near-duplicate
    removal — every doc except non-canonical cluster members (keep-first
    per connected component). Size-routed like the rest of the family:
    a drop set up to ``broadcast_limit`` broadcasts (sorted array +
    np.isin, no per-row Python) and the keep filter streams row-local;
    above it the filter becomes a distributed anti-join — corpus ids and
    drop markers meet in doc_id-keyed exchange partitions, so the drop
    set is never SHIPPED per task (the cluster table itself remains a
    documented driver bound of ``dedup_clusters``)."""
    import ray
    import ray.data as rd

    clusters = dedup_clusters(sf_dir, shingle_k, threshold)
    drop_ids = np.asarray(
        [int(d) for d, c in zip(clusters["doc_id"].to_pylist(),
                                clusters["cluster_id"].to_pylist())
         if d != c], dtype=np.int64)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    if drop_ids.size <= broadcast_limit:
        ref = ray.put(np.sort(drop_ids))

        def keep(batch: pa.Table) -> pa.Table:
            dset = ray.get(ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            mask = ~np.isin(ids, dset)
            return pa.table({"doc_id": pa.array(ids[mask], pa.int64())})

        return ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)

    from .exchange import exchange_by_key

    def corpus_markers(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": pa.compute.cast(batch["doc_id"], pa.int64()),
            "is_drop": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    drop_tbl = pa.table({
        "doc_id": pa.array(drop_ids, pa.int64()),
        "is_drop": pa.array(np.ones(drop_ids.size, np.int8), pa.int8()),
    })
    markers = ds.map_batches(corpus_markers, batch_format="pyarrow",
                             zero_copy_batch=True).union(
        rd.from_arrow(drop_tbl))
    return exchange_by_key(markers, "doc_id", _antijoin_partition)


def near_dedup_keep_sql(threshold: float = 0.9) -> str:
    return f"""
WITH clusters AS ({dedup_clusters_sql(threshold)})
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM clusters
                     WHERE doc_id != cluster_id)"""


# -- MinHash + LSH -----------------------------------------------------------

class MinHashStage:
    """Actor-pool stage: per-doc MinHash signatures over word shingles.
    Permutation parameters generated once per actor in __init__ (seeded).
    Permutation family: multiply-shift over uint64 (native wraparound).
    Signatures for a WHOLE batch compute as chunked (shingles x hashes)
    broadcasts + one reduceat per chunk — no per-doc Python loop (duplicate
    shingles cannot change a min, so the explode needn't dedup)."""

    _CHUNK = 16     # hash columns per broadcast (bounds the temp matrix)

    def __init__(self, n_hashes: int = 64, shingle_k: int = 3,
                 seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 1 << 62, n_hashes).astype(np.uint64)
                  | np.uint64(1))  # odd multipliers
        self.b = rng.integers(0, 1 << 62, n_hashes).astype(np.uint64)
        self.n_hashes = n_hashes
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        """Scalar reference path (tests pin ``signatures`` against it)."""
        hs = np.array([_hash64(s) for s in
                       _word_shingles(text, self.shingle_k)],
                      dtype=np.uint64)
        prod = hs[:, None] * self.a[None, :] + self.b[None, :]
        return prod.min(axis=0)

    def signatures(self, texts: list) -> np.ndarray:
        """(n_docs, n_hashes) uint64 — vectorized across the batch."""
        buf, g_start, lens, g_cum = gram_slices(texts, self.shingle_k)
        hs = fnv64_slices(buf, g_start, lens) >> np.uint64(1)
        out = np.empty((len(texts), self.n_hashes), dtype=np.uint64)
        for c0 in range(0, self.n_hashes, self._CHUNK):
            a = self.a[c0:c0 + self._CHUNK]
            b = self.b[c0:c0 + self._CHUNK]
            prod = hs[:, None] * a[None, :] + b[None, :]
            out[:, c0:c0 + a.size] = np.minimum.reduceat(
                prod, g_cum[:-1], axis=0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        if not texts:
            return pa.table({"doc_id": batch["doc_id"],
                             "sig": pa.array([], pa.list_(pa.uint64()))})
        sigs = self.signatures(texts)
        offsets = np.arange(0, (len(texts) + 1) * self.n_hashes,
                            self.n_hashes, dtype=np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(sigs.reshape(-1), pa.uint64())),
        })


def _band_rows_vec(batch: pa.Table, bands: int,
                   rows_per_band: int) -> pa.Table:
    """(doc_id, sig) -> (doc_id, band, bh) rows, fully vectorized: band
    hashes FNV-fold the band's signature words (64-bit wraparound), rows
    explode via repeat/tile."""
    sig_col = (batch["sig"].combine_chunks()
               if isinstance(batch["sig"], pa.ChunkedArray)
               else batch["sig"])
    n = len(sig_col)
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "band": pa.array([], pa.int32()),
                         "bh": pa.array([], pa.int64())})
    flat = sig_col.flatten().to_numpy(zero_copy_only=False).astype(
        np.uint64, copy=False)
    sig3 = flat.reshape(n, bands, rows_per_band)
    h = np.full((n, bands), _FNV64_OFFSET, dtype=np.uint64)
    for r in range(rows_per_band):
        h = (h ^ sig3[:, :, r]) * _FNV64_PRIME
    bh = (h >> np.uint64(1)).astype(np.int64)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                         pa.int32()),
        "bh": pa.array(bh.reshape(-1), pa.int64()),
    })


def minhash_lsh_pairs(sf_dir: str, n_hashes: int = 64, bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.5,
                      verify_route: str = "auto"):
    """Near-dup candidate pairs via MinHash banding, verified with EXACT
    shingle Jaccard (so emitted pairs are true positives; banding controls
    recall — 16 bands x 4 rows targets J >= ~0.5). Bucket pair generation
    runs as a partitioned exchange keyed by (band, band_hash)."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rows_per_band = n_hashes // bands

    # scale with the cluster, leaving one core for read/write tasks: an
    # actor pool that reserves every CPU starves the rest of the pipeline
    # (ray_guide: pool sizing) — floor-capped only, never ceiling-capped
    pool = max(1, int(ray.cluster_resources().get("CPU", 2)) - 1)
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(n_hashes=n_hashes, shingle_k=shingle_k),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=pool)
    band_rows = sigs.map_batches(
        _band_rows_vec, batch_format="pyarrow",
        fn_kwargs={"bands": bands, "rows_per_band": rows_per_band})
    cands = exchange_by_key(band_rows, ["band", "bh"], _group_pairs_part,
                            proc_kwargs={"group_cols": ["band", "bh"]})
    verified = verify_pairs(sf_dir, cands, shingle_k, threshold,
                            route=verify_route)
    rows = verified.take_all()   # tiny: verified near-dup pairs only
    rows.sort(key=lambda r: (r["doc_a"], r["doc_b"]))
    return pa.table({
        "doc_a": pa.array([r["doc_a"] for r in rows], pa.int64()),
        "doc_b": pa.array([r["doc_b"] for r in rows], pa.int64()),
    })


def minhash_lsh_pairs_sql(n_hashes: int = 64, bands: int = 16,
                          shingle_k: int = 3, threshold: float = 0.5,
                          seed: int = 1234) -> str:
    """DuckDB oracle for ``minhash_lsh_pairs`` — the WHOLE pipeline in SQL,
    bit-exact: word shingles (k-grams, whole-text fallback below k words),
    63-bit FNV-1a shingle hashes (``fingerprint_sql`` recipe, exact
    mod-2^64 HUGEINT arithmetic), the 64 affine permutations
    ``(h*a+b) mod 2^64`` with the stage's rng constants EMBEDDED as a
    VALUES table, per-band FNV folds of the signature words, the
    bucket-share candidate join, and the exact-Jaccard verify over the
    distinct hash sets. Candidate recall is part of the contract, so a
    banding bug on either side breaks the match. ASCII-valid like
    ``fingerprint_sql`` (``ascii(c)`` = byte value; true of the sf
    tables); the ``s = ''`` guard covers DuckDB's ``['']`` char-split of
    the empty string (FNV of zero bytes is the offset basis)."""
    rng = np.random.default_rng(seed)
    pa_ = (rng.integers(1, 1 << 62, n_hashes).astype(np.uint64)
           | np.uint64(1))
    pb_ = rng.integers(0, 1 << 62, n_hashes).astype(np.uint64)
    perm_rows = ",\n    ".join(
        f"({j}, {int(pa_[j])}::HUGEINT, {int(pb_[j])}::HUGEINT)"
        for j in range(n_hashes))
    m = "18446744073709551616::HUGEINT"          # 2^64
    off = "14695981039346656037::HUGEINT"        # FNV-1a offset basis
    prime = "1099511628211::HUGEINT"             # FNV-1a prime
    rpb = n_hashes // bands
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh0 AS (SELECT doc_id,
         CASE WHEN len(ws) < {shingle_k} THEN [array_to_string(ws, ' ')]
              ELSE [array_to_string(list_slice(ws, i, i + {shingle_k - 1}),
                                    ' ')
                    FOR i IN range(1, len(ws) - {shingle_k - 2})]
         END AS shs FROM w),
shd AS (SELECT doc_id, unnest(list_distinct(shs)) AS s FROM sh0),
hs AS (SELECT doc_id,
        (CASE WHEN s = '' THEN {off}
              ELSE list_reduce(
                list_prepend({off},
                             [ascii(c)::HUGEINT FOR c IN string_split(s, '')]),
                (h, b) -> (xor(h, b) * {prime}) % {m})
         END // 2) AS h
       FROM shd),
hsd AS (SELECT DISTINCT doc_id, h FROM hs),
perms(j, pa, pb) AS (VALUES {perm_rows}),
sig AS (SELECT doc_id, j, min((h * pa + pb) % {m}) AS mn
        FROM hsd, perms GROUP BY doc_id, j),
bandh AS (SELECT doc_id, j // {rpb} AS band,
                 list_reduce(list_prepend({off}, list(mn ORDER BY j)),
                             (h, x) -> (xor(h, x) * {prime}) % {m}) // 2 AS bh
          FROM sig GROUP BY doc_id, j // {rpb}),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bandh x JOIN bandh y
           ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
sets AS (SELECT doc_id, list(h) AS hl, count(*) AS n FROM hsd
         GROUP BY doc_id)
SELECT c.doc_a, c.doc_b
FROM cand c JOIN sets p ON p.doc_id = c.doc_a
            JOIN sets q ON q.doc_id = c.doc_b
WHERE CAST(len(list_intersect(p.hl, q.hl)) AS DOUBLE)
      / (p.n + q.n - len(list_intersect(p.hl, q.hl))) >= {threshold}
ORDER BY doc_a, doc_b"""


# -- SimHash -----------------------------------------------------------------

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over whitespace tokens (tf-weighted), vectorized
    across the whole batch: FNV-1a word hashes from one byte scan, bit
    unpack -> signed per-doc column sums (one reduceat) -> sign repack.
    The FNV word hash makes the operator SQL-expressible
    (``simhash_pairs_sql``)."""
    texts = batch["text"].to_pylist()
    if not texts:
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array([], pa.uint64())})
    buf, _, w_starts, w_ends, w_cum = word_bounds(texts)
    hs = fnv64_slices(buf, w_starts, w_ends - w_starts)
    bits = ((hs[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)
            ).astype(np.int32)
    acc = np.add.reduceat(2 * bits - 1, w_cum[:-1], axis=0)
    out = ((acc > 0).astype(np.uint64)
           << _BIT_SHIFTS[None, :]).sum(axis=1, dtype=np.uint64)
    return pa.table({"doc_id": batch["doc_id"],
                     "simhash": pa.array(out, pa.uint64())})


def _simhash_band_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, simhash) -> 4 x (doc_id, band, key, h) rows, vectorized."""
    h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    n = h.size
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    bands = np.tile(np.arange(4, dtype=np.int32), n)
    rep = np.repeat(h, 4)
    keys = ((rep >> (np.uint64(16) * bands.astype(np.uint64)))
            & np.uint64(0xFFFF)).astype(np.int32)
    return pa.table({"doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                     "band": pa.array(bands, pa.int32()),
                     "key": pa.array(keys, pa.int32()),
                     "h": pa.array(rep, pa.uint64())})


def _simhash_pairs_part(t: pa.Table, max_hamming: int) -> pa.Table:
    """Whole-partition bucket pair generation with hamming verification
    (vectorized popcount via unpackbits)."""
    if t.num_rows == 0:
        return pa.table(_EMPTY_PAIRS)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    band = t["band"].to_numpy(zero_copy_only=False)
    key = t["key"].to_numpy(zero_copy_only=False)
    h = t["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((d, key, band))
    d, band, key, h = d[order], band[order], key[order], h[order]
    change = np.zeros(d.size, dtype=bool)
    change[0] = True
    change[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(change)
    counts = np.diff(np.concatenate((starts, [d.size])))
    out_a, out_b = [], []
    for s, c in zip(starts[counts >= 2].tolist(),
                    counts[counts >= 2].tolist()):
        seg_d, seg_h = d[s:s + c], h[s:s + c]
        keep = np.concatenate(([True], seg_d[1:] != seg_d[:-1]))
        seg_d, seg_h = seg_d[keep], seg_h[keep]
        if seg_d.size < 2:
            continue
        ia, ib = np.triu_indices(seg_d.size, k=1)
        x = seg_h[ia] ^ seg_h[ib]
        # vectorized popcount (numpy<2 has no bitwise_count): unpack the 8
        # bytes of each xor and sum the bits
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        m = ham <= max_hamming
        out_a.append(seg_d[ia][m])
        out_b.append(seg_d[ib][m])
    if not out_a:
        return pa.table(_EMPTY_PAIRS)
    ab = np.unique(np.stack((np.concatenate(out_a),
                             np.concatenate(out_b)), axis=1), axis=0)
    return pa.table({"a": pa.array(ab[:, 0], pa.int64()),
                     "b": pa.array(ab[:, 1], pa.int64())})


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs with simhash hamming distance <= ``max_hamming``,
    found by 4 x 16-bit sub-band bucketing (pigeonhole: <=3 differing bits
    leave at least one band intact — COMPLETE for max_hamming <= 3).
    Bucket pair generation runs as a partitioned exchange keyed by
    (band, key); pairs dedupe across bands via one hash aggregate."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    hashed = ds.map_batches(simhash_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    band_rows = hashed.map_batches(_simhash_band_rows,
                                   batch_format="pyarrow")
    bucket_pairs = exchange_by_key(band_rows, ["band", "key"],
                                   _simhash_pairs_part,
                                   proc_kwargs={"max_hamming": max_hamming})
    pairs = exchange_by_key(bucket_pairs, ["a", "b"], _distinct_pairs_part)

    def strip(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_a": batch["a"], "doc_b": batch["b"]})

    return pairs.map_batches(strip, batch_format="pyarrow")


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """DuckDB oracle for ``simhash_pairs``: FNV-1a word hashes as HUGEINT
    ``list_reduce`` (the ``fingerprint_sql`` recipe, exact mod-2^64), per-bit
    signed tf-weighted sums over a 64-row bit series, sign repack, then a
    brute-force self-join on ``bit_count(xor) <= k`` — which equals the
    banded pigeonhole search exactly for k <= 3. ASCII-valid like
    ``fingerprint_sql`` (``ascii(c)`` = byte value; true of the sf tables)."""
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
h AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
                        [ascii(c)::HUGEINT FOR c IN string_split(word, '')]),
           (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                     % 18446744073709551616::HUGEINT) AS wh
  FROM w),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (wh // power(2, b.bit)::HUGEINT) % 2 = 1
                  THEN 1 ELSE -1 END) AS acc
  FROM h, (SELECT unnest(range(64)) AS bit) b
  GROUP BY doc_id, b.bit),
sh AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN power(2, bit)::HUGEINT
                  ELSE 0::HUGEINT END) AS simhash
  FROM bits GROUP BY doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT))
      <= {max_hamming}"""


# -- embedding cosine near-dup ----------------------------------------------

def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4,
                            method: str = "auto",
                            max_exact_rows: int = 200_000,
                            lsh_tables: int = 24, lsh_bits: int = 3):
    """Vector pairs with cosine similarity >= threshold.

    ``method="exact"``: L2-normalize per batch, blockwise matmul against
    the (broadcast) full matrix — O(n²) compute, full-matrix broadcast;
    the small-n oracle (works to ~1e6 x few hundred dims per node).
    DuckDB-matched (``embedding_neardup`` oracle via
    ``list_cosine_similarity``).

    ``method="lsh"``: the 100 TB route — random-hyperplane bucketing
    (``lsh_tables`` x ``lsh_bits``), pairwise cosine only within buckets,
    distinct pairs across tables. Approximate: a true pair is missed only
    if it shares NO bucket in any table (P_miss = (1-p^bits)^tables with
    p = 1 - angle/pi; ~1e-3 at threshold 0.4 with 24x3). Equality with the
    exact path on the test fixtures is pinned by pytest.

    ``method="auto"``: exact below ``max_exact_rows`` (parquet metadata
    row count — no scan), LSH above."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    if method == "auto":
        n_rows = pq.ParquetFile(
            f"{sf_dir}/embeddings.parquet").metadata.num_rows
        method = "exact" if n_rows <= max_exact_rows else "lsh"
        if method == "lsh":
            import warnings

            warnings.warn(
                f"embedding_neardup_pairs: {n_rows} rows > "
                f"max_exact_rows={max_exact_rows}; routing to the "
                "APPROXIMATE LSH path (P_miss ~ (1-p^bits)^tables). Pass "
                "method='exact' to force the O(n^2) exact join.",
                stacklevel=2)
    if method == "lsh":
        return _embedding_lsh_pairs(sf_dir, threshold, lsh_tables, lsh_bits)

    from .similarity import _ids_from, _mat_from_list

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = _ids_from(tbl["vec_id"])
    mat = _mat_from_list(tbl["embedding"])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat_ref = ray.put((ids, mat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(mat_ref)
        bid = _ids_from(batch["vec_id"])
        bm = _mat_from_list(batch["embedding"])
        bm /= np.linalg.norm(bm, axis=1, keepdims=True)
        sims = bm @ all_mat.T
        ia, ib = np.nonzero(sims >= threshold)
        a, b = bid[ia], all_ids[ib]
        m = a < b   # each unordered pair once
        return pa.table({"vec_a": pa.array(a[m], pa.int64()),
                         "vec_b": pa.array(b[m], pa.int64())})

    return ds.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)


def embedding_neardup_sql(threshold: float = 0.4) -> str:
    """DuckDB oracle for the exact route: the ``ann_topk`` oracle's
    ``list_cosine_similarity`` kernel as a thresholded self-join."""
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}"""


def _embedding_lsh_pairs(sf_dir: str, threshold: float, n_tables: int,
                         n_bits: int, seed: int = 7):
    """LSH-bucketed near-dup pairs: explode (table, bucket) rows carrying
    the vector, pairwise cosine within each bucket group, distinct pairs
    across tables. No full-matrix broadcast anywhere — the one all-to-all
    exchange is the bucket groupby, and each group is bucket-sized."""
    import ray.data as rd
    import pyarrow.parquet as pq

    from .similarity import LshIndexStage, _ids_from, _mat_from_list

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first["embedding"][0])
    stage = LshIndexStage(dim, n_tables, n_bits, seed=seed)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = _ids_from(batch["vec_id"])
        m = _mat_from_list(batch["embedding"])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        keys = stage.keys(m)                       # (N, H)
        n, h = keys.shape
        rep = np.repeat(np.arange(n, dtype=np.int64), h)
        emb = (batch["embedding"].combine_chunks()
               if isinstance(batch["embedding"], pa.ChunkedArray)
               else batch["embedding"]).take(pa.array(rep, pa.int64()))
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, h), pa.int64()),
            "table": pa.array(np.tile(np.arange(h, dtype=np.int32), n),
                              pa.int32()),
            "bucket": pa.array(keys.reshape(-1), pa.int64()),
            "embedding": emb,
        })

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        ids = _ids_from(group["vec_id"])
        m = _mat_from_list(group["embedding"])
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        keep = np.concatenate(([True], ids[1:] != ids[:-1]))
        ids, m = ids[keep], m[keep]
        if ids.size < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pa.table({"a": pa.array(ids[ia], pa.int64()),
                         "b": pa.array(ids[ib], pa.int64())})

    pairs = (ds.map_batches(bucketize, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["table", "bucket"])
             .map_groups(pairs_of_bucket, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(rd.aggregate.Count()))

    def strip(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_a": batch["a"], "vec_b": batch["b"]})

    return pairs.map_batches(strip, batch_format="pyarrow")


# -- Survivorship (keep-best) -------------------------------------------------

def survivorship_keep_best(sf_dir: str, shingle_k: int = 1,
                           threshold: float = 0.9) -> pa.Table:
    """Near-dup survivorship with a QUALITY policy: per connected
    component keep the member with the most characters (``n_chars``
    metadata column — no text scan), ties to the smallest doc_id —
    the "keep the richest copy" rule real cleaning passes use instead
    of keep-first. Output: one (doc_id, cluster_id, n_chars) row per
    cluster, the surviving member.

    Scale shape: the cluster table is the already-reduced dedup output
    (documented driver bound of ``dedup_clusters``); member metadata
    arrives via a broadcast-membership filtered scan of the METADATA
    column only, so nothing corpus-sized moves. Reference relationship:
    lifts the reference's keep-first SE4 semantics
    (`IndexerService.java` URL-unique upsert) to a quality policy."""
    import ray
    import ray.data as rd

    clusters = dedup_clusters(sf_dir, shingle_k, threshold)
    ids = clusters["doc_id"].to_numpy(zero_copy_only=False)
    cid = clusters["cluster_id"].to_numpy(zero_copy_only=False)
    if ids.size == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64()),
                         "n_chars": pa.array([], pa.int64())})
    member_ref = ray.put(np.sort(ids))

    def member_meta(batch: pa.Table) -> pa.Table:
        mem = ray.get(member_ref)
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.isin(d, mem)
        return pa.table({
            "doc_id": pa.array(d[keep], pa.int64()),
            "n_chars": pa.array(
                batch["n_chars"].to_numpy(zero_copy_only=False)[keep],
                pa.int64())})

    meta = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
            .map_batches(member_meta, batch_format="pyarrow",
                         zero_copy_batch=True)
            .to_pandas())                       # cluster-table-sized
    order = np.argsort(meta["doc_id"].to_numpy(), kind="stable")
    m_ids = meta["doc_id"].to_numpy()[order]
    m_nc = meta["n_chars"].to_numpy()[order]
    nc = m_nc[np.searchsorted(m_ids, ids)]
    # winner per cluster: max n_chars, tie min doc_id
    sel = np.lexsort((ids, -nc, cid))
    c_s = cid[sel]
    first = np.empty(c_s.size, dtype=bool)
    first[0] = True
    first[1:] = c_s[1:] != c_s[:-1]
    win = sel[first]
    out = np.argsort(ids[win], kind="stable")
    return pa.table({
        "doc_id": pa.array(ids[win][out], pa.int64()),
        "cluster_id": pa.array(cid[win][out], pa.int64()),
        "n_chars": pa.array(nc[win][out], pa.int64())})


def survivorship_keep_best_sql(threshold: float = 0.9) -> str:
    return f"""
WITH sv_cl AS ({dedup_clusters_sql(threshold)}),
sv_rank AS (
  SELECT c.doc_id, c.cluster_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
  FROM sv_cl c JOIN documents d USING (doc_id))
SELECT doc_id, cluster_id, CAST(n_chars AS BIGINT) AS n_chars
FROM sv_rank WHERE rn = 1"""
