"""Deduplication operators for training-data pipelines.

Five families (task brief): exact hash, n-gram Jaccard (exact), MinHash+LSH
(approximate candidate generation + exact verify), SimHash, embedding-cosine
near-dup. All are Ray-Data-first:

- exact:      vectorized content hash -> groupby(hash) (64-bit key, no
              full-text shuffle)
- jaccard:    explode word shingles -> groupby(shingle) -> pairs -> exact
              verify (an exact-recall candidate join: any pair with J > 0
              shares a shingle)
- minhash:    per-batch shingle->minhash signatures -> band rows ->
              groupby(band, band_hash) -> candidates -> exact verify
- simhash:    64-bit simhash per doc -> bucket by 4 x 16-bit sub-bands ->
              hamming verify (all pairs <= k bits differ share a sub-band
              for k <= 3)
- embedding:  blockwise cosine of L2-normalized vectors (numpy matmul per
              block pair; small side broadcast)

Scale notes: groupby keys are 64-bit hashes (skew-safe for natural text;
a stop-shingle frequency cap bounds hot groups); pair verification is
vectorized per group. At 100 TB the shingle groupby is the one all-to-all
exchange; MinHash reduces its payload to fixed-size signatures.
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

def jaccard_pairs(sf_dir: str, shingle_k: int = 3, threshold: float = 0.5):
    """All document pairs with word-``shingle_k``-gram Jaccard >=
    ``threshold`` (exact). Candidate join via shared shingles (exact recall),
    verification via |A∩B| counts from the join itself:

        explode (shingle_hash, doc) -> groupby(shingle_hash) -> per-group
        pairs -> groupby(pair).count = |A∩B| -> J = c / (|A|+|B|-c)
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        docs, shs, sizes = [], [], []
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text"].to_pylist()):
            sset = _word_shingles(t, shingle_k)
            for s in sset:
                docs.append(did)
                shs.append(_hash64(s))
                sizes.append(len(sset))
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "sh": pa.array(shs, pa.int64()),
                         "set_size": pa.array(sizes, pa.int64())})

    shingles = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)

    def pairs_of_group(group: pa.Table) -> pa.Table:
        d = np.sort(np.unique(group["doc_id"].to_numpy(zero_copy_only=False)))
        sizes = {int(r["doc_id"]): int(r["set_size"])
                 for r in group.to_pylist()}
        if d.size < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "sa": pa.array([], pa.int64()),
                             "sb": pa.array([], pa.int64())})
        ia, ib = np.triu_indices(d.size, k=1)
        a, b = d[ia], d[ib]
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "sa": pa.array([sizes[int(x)] for x in a], pa.int64()),
                         "sb": pa.array([sizes[int(x)] for x in b], pa.int64())})

    pair_counts = (shingles.groupby("sh")
                   .map_groups(pairs_of_group, batch_format="pyarrow")
                   .groupby(["a", "b", "sa", "sb"])
                   .aggregate(rd.aggregate.Count()))

    def verify(batch: pa.Table) -> pa.Table:
        inter = batch["count()"].to_numpy(zero_copy_only=False).astype(np.float64)
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
    cand_pairs = [(r["a"], r["b"]) for r in cands.take_all()]  # candidate
    # set is small by construction (near-dups only); verify exactly
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    out_a, out_b = [], []
    for a, b in sorted(cand_pairs):
        sa = _word_shingles(texts[a], shingle_k)
        sb = _word_shingles(texts[b], shingle_k)
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(a)
            out_b.append(b)
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64())})


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

def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4):
    """Vector pairs with cosine similarity >= threshold: L2-normalize per
    batch, blockwise matmul against the (broadcast) full matrix.

    Scale path: the full matrix broadcast works to ~1e6 x few hundred dims
    per node; beyond that, LSH/IVF bucketing (see
    `rayse.ops.similarity.ann_lsh`) bounds the candidate set first."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

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
