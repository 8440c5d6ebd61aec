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
- minhash:    per-batch shingle->minhash signatures -> band rows ->
              groupby(band, band_hash) -> candidates -> exact verify
- simhash:    64-bit simhash per doc -> bucket by 4 x 16-bit sub-bands ->
              hamming verify (all pairs <= k bits differ share a sub-band
              for k <= 3)
- embedding:  blockwise cosine of L2-normalized vectors (numpy matmul per
              block pair; small side broadcast); LSH-bucketed route above
              a size threshold

Scale notes: groupby keys are 64-bit hashes (skew-safe for natural text).
Candidate-pair verification is a shared distributed semi-join over the
documents table (``verify_pairs_distributed``): the candidate pair ids are
the broadcast side, text never reaches the driver. At 100 TB the shingle
groupby is the one all-to-all exchange; MinHash reduces its payload to
fixed-size signatures.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash64(s: str) -> int:
    """63-bit content hash (fits arrow int64 group keys)."""
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big") >> 1


def _hash64_full(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode()).digest()[:8], "big")


def _word_shingles(text: str, k: int) -> set:
    words = (text or "").split(" ")
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


# -- exact -------------------------------------------------------------------

def exact_dedup(sf_dir: str):
    """Lowest doc_id per distinct text + copy count (SE4 keep-first
    semantics, `ReindexController.java:62-67`)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [_hash64(t) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "h": pa.array(h, pa.int64())})

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
    shingle per doc. ``cand_ref``: optional ray.ObjectRef of a container of
    doc_ids — only those docs explode (the semi-join filter shared with
    pair verification; ONE copy of the shingling loop to keep candidate
    generation and verification in sync)."""
    def explode(batch: pa.Table) -> pa.Table:
        cand = None
        if cand_ref is not None:
            import ray

            cand = ray.get(cand_ref)
        docs, shs, sizes = [], [], []
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text"].to_pylist()):
            if cand is not None and did not in cand:
                continue
            sset = _word_shingles(t, shingle_k)
            for s in sset:
                docs.append(did)
                shs.append(_hash64(s))
                sizes.append(len(sset))
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "sh": pa.array(shs, pa.int64()),
                         "set_size": pa.array(sizes, pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow",
                          zero_copy_batch=True)


def verify_pairs_distributed(sf_dir: str, cand_pairs, shingle_k: int,
                             threshold: float):
    """EXACT Jaccard verification of candidate pairs as a distributed
    semi-join over ``documents.parquet`` — the replacement for driver-side
    text materialization (the pattern the reference's batched hydration
    plays, `QueryService.java:739-746`):

    broadcast the candidate doc->partners map (``ray.put`` once, read in
    every task; its size is bounded by the candidate-pair set, never the
    corpus) -> re-explode ONLY candidate docs' shingles -> per-shingle
    groups emit only candidate pairs -> groupby(pair).count == |A∩B| exactly
    -> J = c / (|A|+|B|-c). No task ever holds more than one batch of text,
    and the driver never sees any text. For candidate sets too large to
    broadcast, the same verify runs as a hash-join of the pair table
    against the exploded shingles (one extra shuffle)."""
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

    def pairs_in_candset(group: pa.Table) -> pa.Table:
        p = ray.get(ref)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        sz = group["set_size"].to_numpy(zero_copy_only=False)
        size_of = dict(zip(d.tolist(), sz.tolist()))
        present = set(size_of)
        oa, ob, osa, osb = [], [], [], []
        for a in size_of:
            for b in p.get(a, ()):
                if a < b and b in present:
                    oa.append(a)
                    ob.append(b)
                    osa.append(size_of[a])
                    osb.append(size_of[b])
        return pa.table({"a": pa.array(oa, pa.int64()),
                         "b": pa.array(ob, pa.int64()),
                         "sa": pa.array(osa, pa.int64()),
                         "sb": pa.array(osb, pa.int64())})

    pair_counts = (exploded
                   .groupby("sh")
                   .map_groups(pairs_in_candset, batch_format="pyarrow")
                   .groupby(["a", "b", "sa", "sb"])
                   .aggregate(rd.aggregate.Count()))

    def verify(batch: pa.Table) -> pa.Table:
        inter = batch["count()"].to_numpy(
            zero_copy_only=False).astype(np.float64)
        sa = batch["sa"].to_numpy(zero_copy_only=False).astype(np.float64)
        sb = batch["sb"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = inter / (sa + sb - inter)
        keep = j >= threshold
        return pa.table({
            "doc_a": pa.array(
                batch["a"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
            "doc_b": pa.array(
                batch["b"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
        })

    return pair_counts.map_batches(verify, batch_format="pyarrow")


def jaccard_pairs(sf_dir: str, shingle_k: int = 3, threshold: float = 0.5,
                  _cand_stats: dict | None = None):
    """All document pairs with word-``shingle_k``-gram Jaccard >=
    ``threshold`` — EXACT, via a prefix-filtered set-similarity join
    (PPJoin-family, Xiao et al., WWW'08):

    1. explode (doc_id, sh, set_size)
    2. groupby(sh): attach each shingle's df (group row count — no second
       aggregation pass)
    3. groupby(doc_id): order each doc's shingles by ascending (df, sh)
       and keep only the PREFIX of length n - ceil(t*n) + 1
    4. groupby(sh) over prefix rows only: per-group candidate pairs
    5. exact |A∩B| verification via the distributed semi-join
       (``verify_pairs_distributed``)

    Exactness: under any global shingle order, two sets with J >= t must
    share a shingle within both prefixes (prefix-filter theorem; pinned by
    a brute-force-equality test incl. Zipf-skewed fixtures). Scale: hot
    shingles have maximal df, so they sort to the END of every doc's order
    and almost never enter a prefix — pair generation is df-bounded instead
    of quadratic in the hottest shingle's df (the round-1 blowup: one
    shingle in 1e6 docs emitted 5e11 pairs).

    Scale note: the per-key ``map_groups`` stages pay Ray's per-group
    Python-call overhead (~0.2 ms/group) — the repo-wide idiom for keyed
    work (windows/sessionize use it per user). At extreme key cardinality
    (1e9+ distinct shingles), the established alternative is the index
    build's own file-based exchange (write partitioned by hash(key),
    vectorize whole partitions), which this join would adopt wholesale."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    shingles = _explode_shingles(ds, shingle_k)

    def attach_df(group: pa.Table) -> pa.Table:
        return group.append_column(
            "df", pa.array(np.full(len(group), len(group), dtype=np.int64)))

    # ceil(t*n) without float overshoot: math.ceil(0.28*25) == 8 (the
    # double 0.28 is a hair ABOVE 7/25), which would shorten the prefix
    # below the theorem's minimum and silently DROP the J == 7/25 pair the
    # float verification accepts. Exact rational ceil, with remainders
    # below 2^-40 relative (pure float-representation artifacts — any real
    # fraction at feasible n is vastly larger) treated as zero. Erring to
    # LONGER prefixes is always safe: verification is exact.
    t_num, t_den = float(threshold).as_integer_ratio()

    def _ceil_tn(n: int) -> int:
        q, rem = divmod(t_num * n, t_den)
        if rem and rem * (1 << 40) >= t_den:
            q += 1
        return q

    def doc_prefix(group: pa.Table) -> pa.Table:
        sh = group["sh"].to_numpy(zero_copy_only=False)
        df = group["df"].to_numpy(zero_copy_only=False)
        n = sh.size
        p = n - _ceil_tn(n) + 1
        idx = np.lexsort((sh, df))[:p]
        return pa.table({
            "doc_id": group["doc_id"].take(pa.array(idx, pa.int64())),
            "sh": pa.array(sh[idx], pa.int64()),
        })

    def pairs_of_group(group: pa.Table) -> pa.Table:
        d = np.sort(np.unique(group["doc_id"].to_numpy(zero_copy_only=False)))
        if d.size < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(d.size, k=1)
        return pa.table({"a": pa.array(d[ia], pa.int64()),
                         "b": pa.array(d[ib], pa.int64())})

    cands = (shingles
             .groupby("sh").map_groups(attach_df, batch_format="pyarrow")
             .groupby("doc_id").map_groups(doc_prefix,
                                           batch_format="pyarrow")
             .groupby("sh").map_groups(pairs_of_group,
                                       batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(rd.aggregate.Count()))
    cand_pairs = [(r["a"], r["b"]) for r in cands.take_all()]
    if _cand_stats is not None:
        _cand_stats["n_candidates"] = len(cand_pairs)
    return verify_pairs_distributed(sf_dir, cand_pairs, shingle_k, threshold)


def dedup_clusters(sf_dir: str, shingle_k: int = 3, threshold: float = 0.5,
                   pairs: pa.Table | None = None):
    """Near-dup CLUSTER assignment: connected components over the verified
    near-dup pair graph; ``cluster_id`` = smallest doc_id in the component
    (the keep-first canonical — SE4 semantics lifted from exact to near
    duplicates). Only docs appearing in >= 1 pair get a row.

    The pair graph comes from the exact prefix-filtered Jaccard join; the
    component reduction (union-find with path compression) runs
    driver-side over the PAIR SET — which is the already-reduced dedup
    output, orders of magnitude smaller than the corpus. If a corpus ever
    produces a pair graph too large for one machine, the same result
    falls out of an iterated distributed min-label propagation
    (map_batches join per round); the SQL oracle's recursive CTE is
    exactly that algorithm."""
    if pairs is None:
        pairs = pa.Table.from_pylist(
            jaccard_pairs(sf_dir, shingle_k, threshold).take_all())
    if pairs.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})
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


def near_dedup_keep(sf_dir: str, shingle_k: int = 3,
                    threshold: float = 0.5):
    """THE training-data dedup output: doc_ids surviving near-duplicate
    removal — every doc except non-canonical cluster members (keep-first
    per connected component). The tiny drop set broadcasts; the keep
    filter streams over the corpus (never materialized)."""
    import ray
    import ray.data as rd

    clusters = dedup_clusters(sf_dir, shingle_k, threshold)
    drop = {int(d) for d, c in zip(clusters["doc_id"].to_pylist(),
                                   clusters["cluster_id"].to_pylist())
            if d != c}
    ref = ray.put(drop)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])

    def keep(batch: pa.Table) -> pa.Table:
        dset = ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = np.fromiter((int(i) not in dset for i in ids),
                           dtype=bool, count=ids.size)
        return pa.table({"doc_id": pa.array(ids[mask], pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def near_dedup_keep_sql(threshold: float = 0.9) -> str:
    return f"""
WITH clusters AS ({dedup_clusters_sql(threshold)})
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM clusters
                     WHERE doc_id != cluster_id)"""


# -- MinHash + LSH -----------------------------------------------------------

_MH_PRIME = (1 << 61) - 1


class MinHashStage:
    """Actor-pool stage: per-doc MinHash signature over word shingles.
    Permutation parameters generated once per actor in __init__ (seeded).
    Permutation family: multiply-shift over uint64 (native wraparound),
    fully vectorized as one (shingles x hashes) broadcast."""

    def __init__(self, n_hashes: int = 64, shingle_k: int = 3,
                 seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.a = (rng.integers(1, 1 << 62, n_hashes).astype(np.uint64)
                  | np.uint64(1))  # odd multipliers
        self.b = rng.integers(0, 1 << 62, n_hashes).astype(np.uint64)
        self.n_hashes = n_hashes
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        hs = np.array([_hash64(s) for s in
                       _word_shingles(text, self.shingle_k)],
                      dtype=np.uint64)
        prod = hs[:, None] * self.a[None, :] + self.b[None, :]
        return prod.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.uint64())),
        })


def minhash_lsh_pairs(sf_dir: str, n_hashes: int = 64, bands: int = 16,
                      shingle_k: int = 3, threshold: float = 0.5):
    """Near-dup candidate pairs via MinHash banding, verified with EXACT
    shingle Jaccard (so emitted pairs are true positives; banding controls
    recall — 16 bands x 4 rows targets J >= ~0.5)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    rows_per_band = n_hashes // bands

    import ray

    # scale with the cluster, leaving one core for read/write tasks: an
    # actor pool that reserves every CPU starves the rest of the pipeline
    # (ray_guide: pool sizing) — floor-capped only, never ceiling-capped
    pool = max(1, int(ray.cluster_resources().get("CPU", 2)) - 1)
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(n_hashes=n_hashes, shingle_k=shingle_k),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=pool)

    def band_rows(batch: pa.Table) -> pa.Table:
        docs, band_ids, band_hash = [], [], []
        for did, sig in zip(batch["doc_id"].to_pylist(),
                            batch["sig"].to_pylist()):
            for b in range(bands):
                chunk = tuple(sig[b * rows_per_band:(b + 1) * rows_per_band])
                docs.append(did)
                band_ids.append(b)
                band_hash.append(hash(chunk) & 0x7FFFFFFFFFFFFFFF)
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "band": pa.array(band_ids, pa.int32()),
                         "bh": pa.array(band_hash, pa.int64())})

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        d = np.sort(np.unique(group["doc_id"].to_numpy(zero_copy_only=False)))
        if d.size < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(d.size, k=1)
        return pa.table({"a": pa.array(d[ia], pa.int64()),
                         "b": pa.array(d[ib], pa.int64())})

    cands = (sigs.map_batches(band_rows, batch_format="pyarrow")
             .groupby(["band", "bh"])
             .map_groups(pairs_of_bucket, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(rd.aggregate.Count()))
    # candidate pair IDS are small by construction (near-dups only) and
    # become the broadcast side; the exact-Jaccard verify is a distributed
    # semi-join over the documents table — no driver text materialization
    cand_pairs = [(r["a"], r["b"]) for r in cands.take_all()]
    verified = verify_pairs_distributed(sf_dir, cand_pairs, shingle_k,
                                        threshold)
    rows = verified.take_all()   # tiny: verified near-dup pairs only
    rows.sort(key=lambda r: (r["doc_a"], r["doc_b"]))
    return pa.table({
        "doc_a": pa.array([r["doc_a"] for r in rows], pa.int64()),
        "doc_b": pa.array([r["doc_b"] for r in rows], pa.int64()),
    })


# -- SimHash -----------------------------------------------------------------

_BIT_SHIFTS = np.arange(64, dtype=np.uint64)


def simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over whitespace tokens (tf-weighted, vectorized:
    unpack word-hash bits -> signed column sums -> repack sign bits)."""
    out = np.empty(len(batch), dtype=np.uint64)
    for i, t in enumerate(batch["text"].to_pylist()):
        hs = np.array([_hash64_full(w) for w in (t or "").split(" ")],
                      dtype=np.uint64)
        bits = ((hs[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)
                ).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        out[i] = np.uint64(((acc > 0).astype(np.uint64)
                            << _BIT_SHIFTS).sum(dtype=np.uint64))
    return pa.table({"doc_id": batch["doc_id"],
                     "simhash": pa.array(out, pa.uint64())})


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """Near-dup pairs with simhash hamming distance <= ``max_hamming``,
    found by 4 x 16-bit sub-band bucketing (pigeonhole: <=3 differing bits
    leave at least one band intact)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    hashed = ds.map_batches(simhash_batch, batch_format="pyarrow",
                            zero_copy_batch=True)

    def band_rows(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False)
        docs, bands, keys, full = [], [], [], []
        for did, hv in zip(batch["doc_id"].to_pylist(), h.tolist()):
            for b in range(4):
                docs.append(did)
                bands.append(b)
                keys.append((int(hv) >> (16 * b)) & 0xFFFF)
                full.append(int(hv))
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int32()),
                         "h": pa.array(full, pa.uint64())})

    def pairs_of_bucket(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        order = np.argsort(d)
        d, h = d[order], h[order]
        keep = np.concatenate(([True], d[1:] != d[:-1]))
        d, h = d[keep], h[keep]
        if d.size < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(d.size, k=1)
        x = (h[ia].astype(np.uint64) ^ h[ib].astype(np.uint64))
        # vectorized popcount (numpy<2 has no bitwise_count): unpack the 8
        # bytes of each xor and sum the bits
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        m = ham <= max_hamming
        return pa.table({"a": pa.array(d[ia][m], pa.int64()),
                         "b": pa.array(d[ib][m], pa.int64())})

    pairs = (hashed.map_batches(band_rows, batch_format="pyarrow")
             .groupby(["band", "key"])
             .map_groups(pairs_of_bucket, batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(rd.aggregate.Count()))

    def strip(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_a": batch["a"], "doc_b": batch["b"]})

    return pairs.map_batches(strip, batch_format="pyarrow")


# -- embedding cosine near-dup ----------------------------------------------

def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4,
                            method: str = "auto",
                            max_exact_rows: int = 200_000,
                            lsh_tables: int = 24, lsh_bits: int = 3):
    """Vector pairs with cosine similarity >= threshold.

    ``method="exact"``: L2-normalize per batch, blockwise matmul against
    the (broadcast) full matrix — O(n²) compute, full-matrix broadcast;
    the small-n oracle (works to ~1e6 x few hundred dims per node).

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
