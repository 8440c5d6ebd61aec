"""Distributed inverted-index build — the Ray-Data-native replacement for the
reference's ``POST /reindex`` path (`ReindexController.java:40-89` →
`Indexer/Service/IndexerService.java:370-452`: 20-doc batches × ≤8 raw Java
threads upserting PostgreSQL rows).

Pipeline (per input shard, then a per-part merge):

  read_parquet(transcripts, columns=[conv_id, turn_idx, text])
    → map_batches(TokenizeStage, batch_format="pyarrow")     # actor pool;
        # phase-1 combiner: per-batch compressed posting runs
    → write_parquet(runs/shard=S/, partition_cols=["part"])  # file-based
        # exchange: the groupby-term shuffle, realized as partition-by-
        # doc-part at write + per-part gather at merge
  MergeWorker actor pool (one part per call):
    read all shards' runs for the part → group by term → k-way merge runs
    (decode, mergesort by doc_id, re-encode, block-max) → final segment
    parquet + per-part manifest

Index layout under ``out_dir``::

    runs/shard={s}/part={p}/*.parquet     phase-1 runs (deleteable after merge)
    segments/part={p}/segment.parquet     final per-part posting lists
    _manifest/shard-{s}.json              per-shard build checkpoint
    _manifest/part-{p}.json               per-part merge checkpoint (lineage)
    corpus_stats.json                     N, total_tokens, avgdl
    metrics.json                          throughput + per-stage wall times

Resume: a shard/part whose manifest exists is skipped; outputs are written
to a temp dir and atomically renamed, so a killed run never leaves a
half-written partition (north rule: resumable from per-partition checkpoints
with lineage + throughput metrics; analog of the crawler's DB-status resume,
`CrawlerMainProcess.java:248-260`).

Skew: two-phase aggregation — the tokenize combiner bounds any term's
phase-1 row to one batch, and the merge splits hot terms into doc_id-
contiguous output runs of ≤ ``compact_max_postings`` postings.  The
alternative ``strategy="groupby_salted"`` path does the literal
``groupby(part, term, salt)`` with doc_id-derived salts; both strategies
produce byte-identical segments (asserted by tests/test_skew_salting.py).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import IndexConfig
from ..index.encoding import (
    binary_array_from_offsets,
    decode_varints_concat,
    encode_varints,
    encode_varints_offsets,
    segmented_cumsum_abs,
)
from ..index.segments import SEGMENT_SCHEMA, bm25_tf
from ..stages.tokenize import RUNS_SCHEMA, TokenizeStage


# --------------------------------------------------------------------------
# small utilities
# --------------------------------------------------------------------------

def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _atomic_rename_dir(tmp_dir: str, final_dir: str) -> None:
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)


def discover_input_files(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, (list, tuple)):
        return sorted(input_path)
    if os.path.isdir(input_path):
        return sorted(glob.glob(os.path.join(input_path, "**", "*.parquet"),
                                recursive=True))
    return [input_path]


def shard_files(files: list[str], target_bytes: int) -> list[list[str]]:
    """Greedy size-based sharding; shard = unit of build checkpointing.

    At cluster scale, size shards so one shard's postings fit comfortably in
    the aggregate object store (the shard pipeline streams regardless; the
    bound matters for the runs/ directory fan-in per merge part)."""
    shards: list[list[str]] = []
    cur: list[str] = []
    cur_b = 0
    for f in files:
        cur.append(f)
        cur_b += os.path.getsize(f)
        if cur_b >= target_bytes:
            shards.append(cur)
            cur, cur_b = [], 0
    if cur:
        shards.append(cur)
    return shards


# --------------------------------------------------------------------------
# phase 1: shard -> compressed runs (the map/combine + shuffle-write)
# --------------------------------------------------------------------------

_TOKENIZE_SINGLETON: dict = {}


def _tokenize_task(batch: pa.Table, *, part_bits: int,
                   with_positions: bool,
                   remap: dict | None = None,
                   analyzer: str = "porter") -> pa.Table:
    """Task-form wrapper: one TokenizeStage instance per worker process."""
    key = (part_bits, with_positions, analyzer,
           tuple(sorted(remap.items())) if remap else None)
    stage = _TOKENIZE_SINGLETON.get(key)
    if stage is None:
        stage = _TOKENIZE_SINGLETON[key] = TokenizeStage(
            part_bits=part_bits, with_positions=with_positions, remap=remap,
            analyzer=analyzer)
    return stage(batch)

def _encode_group(group: pa.Table) -> pa.Table:
    """groupby(part, term, salt).map_groups encoder for the salted strategy.

    One group = one (part, term, salt)'s raw posting rows; sort by doc_id,
    emit one compressed run row (RUNS_SCHEMA)."""
    doc = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(doc, kind="stable")
    doc = doc[order]
    tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
    dl = group["doc_len"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
    role = group["role"].to_numpy(zero_copy_only=False).astype(np.uint8)[order]
    pos_blobs = group["pos_enc"].to_pylist()
    # positions: [count varint][delta blob] per doc, in doc order
    chunks = bytearray()
    tf_list = tf.tolist()
    for j, i in enumerate(order.tolist()):
        g = tf_list[j]
        while g >= 0x80:
            chunks.append((g & 0x7F) | 0x80)
            g >>= 7
        chunks.append(g)
        chunks.extend(pos_blobs[i])
    gaps = np.empty_like(doc)
    gaps[0] = doc[0]
    np.subtract(doc[1:], doc[:-1], out=gaps[1:])
    return pa.table(
        {
            "part": group["part"][:1],
            "term": group["term"][:1],
            "salt": group["salt"][:1],
            "df": pa.array([len(doc)], pa.int64()),
            "cf": pa.array([int(tf.sum())], pa.int64()),
            "min_doc": pa.array([int(doc[0])], pa.uint64()),
            "doc_ids": pa.array([encode_varints(gaps)], pa.binary()),
            "tfs": pa.array([encode_varints(tf)], pa.binary()),
            "dls": pa.array([encode_varints(dl)], pa.binary()),
            "roles": pa.array([role.tobytes()], pa.binary()),
            "positions": pa.array([bytes(chunks)], pa.binary()),
        },
        schema=RUNS_SCHEMA,
    )


def build_runs_for_shard(shard_id: int, files: list[str], out_dir: str,
                         cfg: IndexConfig, strategy: str = "combine",
                         concurrency: int | None = None,
                         remap: dict | None = None) -> dict:
    """Run phase 1 for one shard; returns the manifest dict (also written)."""
    import ray
    import ray.data as rd

    manifest_path = os.path.join(out_dir, "_manifest", f"shard-{shard_id}.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)

    t0 = time.perf_counter()
    n_read_blocks = max(2 * int(ray.cluster_resources().get("CPU", 4)),
                        len(files))
    cols = ["conv_id", "turn_idx", "text"]
    # role detection must inspect EVERY file: a shard mixing role-bearing
    # and role-less parquet would either fail the columns= read or silently
    # index part of the corpus as role 0 — refuse it explicitly
    with_role = ["role" in pq.ParquetFile(f).schema_arrow.names
                 for f in files]
    has_role = all(with_role)
    if any(with_role) and not has_role:
        bad = [f for f, w in zip(files, with_role) if not w]
        raise ValueError(
            f"shard {shard_id} mixes role-bearing and role-less parquet "
            f"files (role column missing from {bad[:3]}...); add the "
            "column or split the inputs")
    if has_role:
        cols.append("role")     # M6 role-scoped posting stats
    ds = rd.read_parquet(files, columns=cols,
                         override_num_blocks=n_read_blocks)
    n_turns = ds.count()  # parquet metadata count: no data scan
    if cfg.clean_html:
        from ..ops.htmlclean import clean_text_batch

        ds = ds.map_batches(clean_text_batch, batch_format="pyarrow",
                            zero_copy_batch=True)

    if concurrency is None:
        concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)) - 1)

    if strategy == "combine":
        # Stateless Ray tasks over the warm worker pool: the analyzer's
        # stem/stop cache is module state shared per worker process, so the
        # actor-pool benefit (state amortization) comes for free while
        # scheduling stays elastic and pays no pool spin-up. (The stage
        # class itself is actor-pool-capable; the groupby_salted path and
        # heavier stages use explicit pools.)
        runs = ds.map_batches(
            _tokenize_task,
            fn_kwargs=dict(part_bits=cfg.part_bits,
                           with_positions=cfg.with_positions,
                           remap=remap, analyzer=cfg.analyzer),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.tokenize_batch_size,
        )
    elif strategy == "groupby_salted":
        postings = ds.map_batches(
            TokenizeStage,
            fn_constructor_kwargs=dict(part_bits=cfg.part_bits,
                                       with_positions=cfg.with_positions,
                                       emit="postings", salt_bits=cfg.salt_bits,
                                       remap=remap, analyzer=cfg.analyzer),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.tokenize_batch_size,
            concurrency=concurrency,
        )
        runs = postings.groupby(["part", "term", "salt"]).map_groups(
            _encode_group, batch_format="pyarrow")
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    tmp = os.path.join(out_dir, "runs", f"shard={shard_id}.tmp")
    final = os.path.join(out_dir, "runs", f"shard={shard_id}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    runs.write_parquet(tmp, partition_cols=["part"])
    _atomic_rename_dir(tmp, final)

    wall = time.perf_counter() - t0
    try:  # per-stage lineage from Ray's own executor stats (A12 metrics)
        stage_stats = runs.stats().split("\n\nDataset")[0][:4000]
    except Exception:
        stage_stats = None
    man = {
        "shard": shard_id,
        "files": files,
        "n_turns": int(n_turns),
        "has_role": has_role,
        "strategy": strategy,
        "wall_s": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1) if wall > 0 else None,
        "ray_stage_stats": stage_stats,
    }
    os.makedirs(os.path.dirname(manifest_path), exist_ok=True)
    _atomic_write_json(manifest_path, man)
    return man


# --------------------------------------------------------------------------
# corpus stats (needs only run-file metadata columns: cheap column read)
# --------------------------------------------------------------------------

def compute_corpus_stats(out_dir: str, n_docs: int) -> dict:
    """total_tokens = Σ cf over run rows (each token occurrence is counted in
    exactly one run); avgdl = total_tokens / N. Replaces
    `documentRepository.count()` + avg length (`IndexerService.java:1014-1020`).
    One threaded pyarrow-dataset scan of the single ``cf`` column."""
    import pyarrow.dataset as pads

    files = [f for f in glob.glob(os.path.join(
        out_dir, "runs", "shard=*", "**", "*.parquet"), recursive=True)
        if ".tmp" not in f]  # exclude crash-leftover temp dirs
    if files:
        t = pads.dataset(files).to_table(columns=["cf"])
        total = int(pa.compute.sum(t["cf"]).as_py() or 0)
    else:
        total = 0
    stats = {
        "n_docs": int(n_docs),
        "total_tokens": int(total),
        "avgdl": (total / n_docs) if n_docs else 0.0,
    }
    _atomic_write_json(os.path.join(out_dir, "corpus_stats.json"), stats)
    return stats


# --------------------------------------------------------------------------
# phase 2: per-part k-way merge (stateful actor pool)
# --------------------------------------------------------------------------

class MergeWorker:
    """Actor-pool stage: one ``__call__`` merges one doc-partition.

    Stateful per north rule ("per-partition segment files merged via stateful
    actor-pool k-way merge"): config + corpus stats load once per actor.
    Memory bound: one part's compressed postings (size_total / n_parts) —
    choose ``part_bits`` so this fits a worker heap at target scale.
    """

    def __init__(self, out_dir: str, cfg: IndexConfig):
        self.out_dir = out_dir
        self.cfg = cfg

    # -- core ---------------------------------------------------------------
    def merge_part(self, part: int, avgdl: float) -> dict:
        t0 = time.perf_counter()
        man_path = os.path.join(self.out_dir, "_manifest", f"part-{part}.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                return json.load(f)
        run_files = sorted(
            f for f in glob.glob(os.path.join(
                self.out_dir, "runs", "shard=*", f"part={part}",
                "*.parquet"))
            if ".tmp" not in f)  # exclude crash-leftover temp dirs
        seg_dir = os.path.join(self.out_dir, "segments", f"part={part}")
        if not run_files:
            os.makedirs(seg_dir, exist_ok=True)
            pq.write_table(pa.table({n: [] for n in SEGMENT_SCHEMA.names},
                                    schema=SEGMENT_SCHEMA),
                           os.path.join(seg_dir, "segment.parquet"))
            man = {"part": part, "n_terms": 0, "n_postings": 0, "inputs": [],
                   "avgdl": avgdl, "wall_s": 0.0, "postings_per_sec": None}
            _atomic_write_json(man_path, man)
            return man

        import pyarrow.dataset as pads

        # single-threaded read: each merge actor owns one CPU; a threaded
        # arrow read pool per actor would thrash at pool_size x cpu threads
        dset = pads.dataset(run_files)
        cols = ["term", "df", "cf", "min_doc", "doc_ids",
                "tfs", "dls", "positions"]
        if "roles" in dset.schema.names:   # absent in pre-role run files
            cols.insert(7, "roles")
        tbl = dset.to_table(columns=cols, use_threads=False)
        tbl = tbl.sort_by([("term", "ascending"), ("min_doc", "ascending")])
        seg_tbl, n_terms, n_postings = self._merge_table(
            tbl, avgdl if avgdl > 0 else 1.0)
        tmp_dir = seg_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)
        pq.write_table(seg_tbl, os.path.join(tmp_dir, "segment.parquet"))
        _atomic_rename_dir(tmp_dir, seg_dir)
        wall = time.perf_counter() - t0
        man = {
            "part": part,
            "n_terms": int(n_terms),
            "n_postings": int(n_postings),
            "inputs": [os.path.relpath(f, self.out_dir) for f in run_files],
            "avgdl": avgdl,     # bound provenance: block_max was computed
            #                     with THIS avgdl (append bound-correction)
            "wall_s": round(wall, 3),
            "postings_per_sec": round(n_postings / wall, 1) if wall > 0 else None,
        }
        os.makedirs(os.path.dirname(man_path), exist_ok=True)
        _atomic_write_json(man_path, man)
        return man

    def _merge_table(self, tbl: pa.Table, avgdl: float):
        """Vectorized whole-part merge: decode every run blob in ONE varint
        pass, lexsort all postings by (term, doc_id), re-encode with ONE
        segmented varint pass. Rows must be pre-sorted by (term, min_doc).

        Returns (segment_table, n_terms, n_postings)."""
        cap = self.cfg.compact_max_postings
        bs = self.cfg.block_size
        with_pos = self.cfg.with_positions
        p = self.cfg.bm25

        df_row = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        # dictionary-encode terms: int codes for grouping, strings only
        # materialized once for the output column (no object arrays)
        tdict = tbl["term"].combine_chunks().dictionary_encode()
        tcodes = tdict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tvalues = tdict.dictionary
        n_rows = df_row.size
        if n_rows == 0:
            empty = pa.table({n: [] for n in SEGMENT_SCHEMA.names},
                             schema=SEGMENT_SCHEMA)
            return empty, 0, 0

        doc_blobs = tbl["doc_ids"].to_pylist()
        tf_blobs = tbl["tfs"].to_pylist()
        dl_blobs = tbl["dls"].to_pylist()

        row_starts = np.zeros(n_rows, dtype=np.int64)
        np.cumsum(df_row[:-1], out=row_starts[1:])
        doc_abs = segmented_cumsum_abs(decode_varints_concat(doc_blobs),
                                       row_starts)
        tfs = decode_varints_concat(tf_blobs)
        dls = decode_varints_concat(dl_blobs)
        n_post = doc_abs.size

        new_term = np.ones(n_rows, dtype=bool)
        new_term[1:] = tcodes[1:] != tcodes[:-1]
        term_id_row = np.cumsum(new_term) - 1
        term_id = np.repeat(term_id_row, df_row)
        uniq_codes = tcodes[new_term]   # term_id -> dictionary code

        if "roles" in tbl.column_names:
            # mixed legacy/new runs surface missing blobs as None: code 0
            roles_all = np.frombuffer(
                b"".join(b if b is not None else b"\x00" * int(d)
                         for b, d in zip(tbl["roles"].to_pylist(),
                                         df_row.tolist())),
                dtype=np.uint8)
        else:                              # pre-role index (append path)
            roles_all = np.zeros(n_post, dtype=np.uint8)

        order = np.lexsort((doc_abs, term_id))
        sd = doc_abs[order]
        st = tfs[order]
        sl = dls[order]
        sr = roles_all[order]
        stid = term_id[order]

        # output rows: per term, split into <=cap chunks (deterministic)
        t_starts = np.concatenate(
            ([0], np.flatnonzero(stid[1:] != stid[:-1]) + 1))
        t_ends = np.concatenate((t_starts[1:], [n_post]))
        out_term_idx: list[int] = []
        out_salt: list[int] = []
        out_start: list[int] = []
        out_end: list[int] = []
        for ti, (s, e) in enumerate(zip(t_starts.tolist(), t_ends.tolist())):
            n = e - s
            if n <= cap:
                out_term_idx.append(int(stid[s]))
                out_salt.append(0)
                out_start.append(s)
                out_end.append(e)
            else:
                n_chunks = (n + cap - 1) // cap
                size = (n + n_chunks - 1) // n_chunks
                for ci in range(n_chunks):
                    out_term_idx.append(int(stid[s]))
                    out_salt.append(ci)
                    out_start.append(s + ci * size)
                    out_end.append(min(s + (ci + 1) * size, e))
        ostart = np.asarray(out_start, dtype=np.int64)
        oend = np.asarray(out_end, dtype=np.int64)

        # delta-gap re-encode: diffs within rows, absolute at row starts;
        # each column encoded ONCE into a contiguous buffer + offsets ->
        # zero-copy arrow binary columns (no per-row bytes objects)
        gaps = sd.copy()
        gaps[1:] -= sd[:-1]          # uint64 wrap at boundaries is overwritten
        gaps[ostart] = sd[ostart]
        doc_out = binary_array_from_offsets(
            *encode_varints_offsets(gaps, ostart))
        tf_out = binary_array_from_offsets(
            *encode_varints_offsets(st, ostart))
        dl_out = binary_array_from_offsets(
            *encode_varints_offsets(sl, ostart))
        role_offsets = np.empty(len(ostart) + 1, dtype=np.int64)
        role_offsets[:-1] = ostart
        role_offsets[-1] = n_post
        role_out = binary_array_from_offsets(sr.tobytes(), role_offsets)
        df_out = (oend - ostart).astype(np.int64)
        cf_out = np.add.reduceat(st.astype(np.int64), ostart)

        # block-max metadata: ONE reduceat over all output rows' blocks
        comp = bm25_tf(st, sl, avgdl, p)
        n_blocks_row = (df_out + bs - 1) // bs
        blk_row_off = np.zeros(len(ostart) + 1, dtype=np.int64)
        np.cumsum(n_blocks_row, out=blk_row_off[1:])
        total_blocks = int(blk_row_off[-1])
        within = (np.arange(total_blocks, dtype=np.int64)
                  - np.repeat(blk_row_off[:-1], n_blocks_row))
        blk_starts = np.repeat(ostart, n_blocks_row) + within * bs
        blk_last_idx = np.minimum(blk_starts + bs - 1,
                                  np.repeat(oend - 1, n_blocks_row))
        bm_flat = np.maximum.reduceat(comp, blk_starts) \
            if total_blocks else np.empty(0, np.float64)
        bl_flat = sd[blk_last_idx] if total_blocks else np.empty(0, np.uint64)
        block_max = pa.ListArray.from_arrays(
            pa.array(blk_row_off, pa.int32()),
            pa.array(bm_flat, pa.float64()))
        block_last = pa.ListArray.from_arrays(
            pa.array(blk_row_off, pa.int32()),
            pa.array(bl_flat, pa.uint64()))

        if with_pos:
            # Positions are NEVER decoded: per-posting varint byte slices
            # are self-delimited ([count][deltas restarting at 0]) and thus
            # relocatable — permute RAW BYTES (uint8 gather, ~1-2 B/value)
            # instead of uint64 value streams (8 B/value): the merge's
            # memory traffic is what bounds multi-worker scaling.
            pos_blob = np.frombuffer(
                b"".join(tbl["positions"].to_pylist()), dtype=np.uint8)
            v_ends = np.flatnonzero((pos_blob & 0x80) == 0)  # varint ends
            # values per posting = tf + 1 (count prefix + tf deltas)
            vcum = np.cumsum((tfs + np.uint64(1)).astype(np.int64))
            p_end_b = v_ends[vcum - 1] + 1        # excl. byte end per posting
            p_start_b = np.concatenate(([0], p_end_b[:-1]))
            blen = p_end_b - p_start_b
            sb = p_start_b[order]
            ln = blen[order]
            out_cum = np.cumsum(ln)
            out_begin = np.concatenate(([0], out_cum[:-1]))
            idx = (np.repeat(sb - out_begin, ln)
                   + np.arange(int(out_cum[-1]) if ln.size else 0,
                               dtype=np.int64))
            out_bytes = pos_blob[idx]
            row_offsets = np.empty(len(ostart) + 1, dtype=np.int64)
            row_offsets[:-1] = out_begin[ostart]
            row_offsets[-1] = out_bytes.size
            pos_out = binary_array_from_offsets(out_bytes.tobytes(),
                                                row_offsets)
        else:
            pos_out = binary_array_from_offsets(
                b"", np.zeros(len(ostart) + 1, dtype=np.int64))

        out_codes = uniq_codes[np.asarray(out_term_idx, dtype=np.int64)]
        term_col = pa.compute.take(tvalues,
                                   pa.array(out_codes, pa.int64()))
        seg_tbl = pa.table(
            {
                "term": pa.compute.cast(term_col, pa.string()),
                "salt": pa.array(out_salt, pa.int32()),
                "df": pa.array(df_out, pa.int64()),
                "cf": pa.array(cf_out, pa.int64()),
                "doc_ids": doc_out,
                "tfs": tf_out,
                "dls": dl_out,
                "roles": role_out,
                "positions": pos_out,
                "block_max": pa.compute.cast(block_max,
                                             pa.list_(pa.float64())),
                "block_last": pa.compute.cast(block_last,
                                              pa.list_(pa.uint64())),
            },
            schema=SEGMENT_SCHEMA,
        )
        return seg_tbl, int(uniq_codes.size), n_post


# --------------------------------------------------------------------------
# conv-hash collision handling (doc_id integrity)
# --------------------------------------------------------------------------

def resolve_conv_collisions(out_dir: str, max_rounds: int = 5,
                            append_from: int | None = None) -> dict:
    """Detect 43-bit conv-hash collisions and build the deterministic
    exception map {conv_id: overridden_hash} — the validation promised by
    `rayse.stages.doc_ids` (without it, colliding conversations would
    produce duplicate doc_ids that corrupt searchsorted probes and hydrate
    the wrong text; P(any collision) ≈ n²/2^44 ≈ 30% at 2.4M convs).

    Distributed shape: one groupby over the (already-built) conv_map's
    distinct (conv_hash, conv_id) rows; only COLLIDING groups reach the
    driver (expected size n²/2^44, e.g. ~57k entries at 1e9 convs). Within
    a group, the lexicographically-first conv keeps the hash; the rest get
    salted rehashes. New hashes are then validated against the whole corpus
    by a broadcast-set scan of the conv_map (repeat with a higher salt on
    the astronomically-unlikely secondary conflict). The result is written
    to ``_manifest/conv_remap.json`` (resume: loaded if present) and is a
    pure function of the distinct conv_id set — independent of sharding,
    batch boundaries and CPU count.

    ``append_from``: when appending (new shard ids >= append_from), hashes
    already minted into the index are FROZEN — the existing remap is kept
    verbatim, and within a colliding group old conversations take
    precedence over new ones regardless of lexicographic order (an old
    conv's postings must never move)."""
    import ray
    import ray.data as rd

    from ..stages.doc_ids import _CONV_MASK, fnv1a64

    remap_path = os.path.join(out_dir, "_manifest", "conv_remap.json")
    base_remap: dict[str, int] = {}
    if os.path.exists(remap_path):
        with open(remap_path) as f:
            loaded = json.load(f)
        if append_from is None:
            return loaded
        base_remap = loaded

    files = [f for f in glob.glob(os.path.join(
        out_dir, "conv_map", "shard=*", "*.parquet")) if ".tmp" not in f]

    # detection: colliding hashes + their conv_ids (vectorized, no
    # per-group Python). Two routes with identical semantics:
    # - small conv_map (compressed bytes under the threshold): one
    #   threaded driver-side read + numpy/pandas distinct — the two Ray
    #   shuffles cost ~3 s of fixed overhead at 120k-turn scale, dwarfing
    #   the microseconds of actual work
    # - large conv_map: distributed distinct-pair groupby + per-hash
    #   count (linear shuffles of (hash, conv) pairs only — never texts)
    DRIVER_BYTES_CAP = 256 << 20
    total_bytes = sum(os.path.getsize(f) for f in files)
    by_hash: dict[int, list] = {}
    if total_bytes <= DRIVER_BYTES_CAP:
        import pyarrow.dataset as pads

        # pairs only: conv_map rows carry per-batch n_turns partials, so
        # the same (hash, conv) appears in several rows — dedup the PAIR
        t = pads.dataset(files).to_table(columns=["conv_hash", "conv_id"])
        df = t.to_pandas().drop_duplicates()
        dup = df[df.duplicated("conv_hash", keep=False)]
        for h, conv in zip(dup["conv_hash"].tolist(),
                           dup["conv_id"].tolist()):
            by_hash.setdefault(int(h), []).append(conv)
        for h in by_hash:
            by_hash[h].sort()
        ds = rd.read_parquet(files)    # validation scan input (below)
    else:
        ds = rd.read_parquet(files)
        pairs = ds.groupby(["conv_hash", "conv_id"]).aggregate(
            rd.aggregate.Count())

        def hashes_only(batch: pa.Table) -> pa.Table:
            return pa.table({"conv_hash": batch["conv_hash"]})

        hash_counts = (pairs.map_batches(hashes_only,
                                         batch_format="pyarrow")
                       .groupby("conv_hash").aggregate(rd.aggregate.Count()))

        def colliding_hashes(batch: pa.Table) -> pa.Table:
            m = pa.compute.greater(batch["count()"], 1)
            return pa.table({"conv_hash": batch["conv_hash"].filter(m)})

        coll = {int(r["conv_hash"]) for r in hash_counts.map_batches(
            colliding_hashes, batch_format="pyarrow").take_all()}
        if coll:
            ref0 = ray.put(coll)

            def members(batch: pa.Table) -> pa.Table:
                want = ray.get(ref0)
                hs = batch["conv_hash"].to_pylist()
                cs = batch["conv_id"].to_pylist()
                keep = [i for i, h in enumerate(hs) if h in want]
                return pa.table({
                    "conv_hash": pa.array([hs[i] for i in keep],
                                          pa.uint64()),
                    "conv_id": pa.array([cs[i] for i in keep],
                                        pa.string()),
                })

            seen_members = set()
            for r in ds.map_batches(members,
                                    batch_format="pyarrow").take_all():
                key = (int(r["conv_hash"]), r["conv_id"])
                if key not in seen_members:
                    seen_members.add(key)
                    by_hash.setdefault(key[0], []).append(key[1])
            for h in by_hash:
                by_hash[h].sort()

    old_convs: set = set()
    if append_from is not None and by_hash:
        # which colliding convs pre-exist? one tiny filtered read over the
        # OLD conv_map shards (the colliding set is small by construction)
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        all_colliding = [c for convs in by_hash.values() for c in convs]
        old_files = [f for f in files
                     if int(f.split("shard=")[1].split(os.sep)[0])
                     < append_from]
        if old_files:
            t = pads.dataset(old_files).to_table(
                filter=pc.field("conv_id").isin(all_colliding))
            old_convs = set(t["conv_id"].to_pylist())

    remap: dict[str, int] = dict(base_remap)
    if by_hash:
        taken = set(by_hash) | set(base_remap.values())
        salts: dict[str, int] = {}

        def rehash(conv: str, start_salt: int) -> int:
            salt = start_salt
            while True:
                nh = fnv1a64(f"{conv}\x00{salt}") & _CONV_MASK
                if nh not in taken:
                    salts[conv] = salt
                    taken.add(nh)
                    return nh
                salt += 1

        for h in sorted(by_hash):
            members = by_hash[h]
            # old convs outrank new ones (frozen hashes); ties lexicographic
            members = (sorted(c for c in members if c in old_convs)
                       + sorted(c for c in members if c not in old_convs)
                       if append_from is not None else sorted(members))
            for conv in members[1:]:
                if conv not in remap:
                    remap[conv] = rehash(conv, 1)

        # global validation: no new hash may equal ANY other conv's hash
        frozen = set(base_remap)
        for _ in range(max_rounds):
            inv = {nh: c for c, nh in remap.items()}
            ref = ray.put(inv)

            def scan(batch: pa.Table) -> pa.Table:
                m = ray.get(ref)
                bad_h, bad_c = [], []
                for h, c in zip(batch["conv_hash"].to_pylist(),
                                batch["conv_id"].to_pylist()):
                    if h in m and m[h] != c:
                        bad_h.append(h)
                        bad_c.append(c)
                return pa.table({"h": pa.array(bad_h, pa.uint64()),
                                 "c": pa.array(bad_c, pa.string())})

            conflicts = {(int(r["h"]), r["c"]) for r in ds.map_batches(
                scan, batch_format="pyarrow").take_all()}
            if not conflicts:
                break
            for h, other in conflicts:
                if other in remap:
                    continue    # other's original hash is vacated — no clash
                conv = inv[h]
                if conv in frozen:
                    # an append must never move an already-minted hash: the
                    # CONFLICTING (necessarily new) conv is remapped instead
                    remap[other] = rehash(other, 1)
                else:
                    remap[conv] = rehash(conv, salts[conv] + 1)
        else:
            raise RuntimeError(
                f"conv-hash remap failed to converge in {max_rounds} rounds")

    os.makedirs(os.path.dirname(remap_path), exist_ok=True)
    _atomic_write_json(remap_path, remap)
    return remap


# --------------------------------------------------------------------------
# orchestration
# --------------------------------------------------------------------------

@dataclass
class BuildResult:
    out_dir: str
    n_docs: int
    total_tokens: int
    avgdl: float
    wall_s: float
    turns_per_sec: float
    shard_manifests: list = field(default_factory=list)
    part_manifests: list = field(default_factory=list)


def build_index(input_path: str | list[str], out_dir: str,
                cfg: IndexConfig | None = None, *,
                strategy: str = "combine",
                shard_target_bytes: int = 2 << 30,
                concurrency: int | None = None,
                merge_concurrency: int | None = None,
                keep_runs: bool = True) -> BuildResult:
    """End-to-end index build. Safe to re-run: finished shards/parts skip."""
    import ray
    import ray.data as rd

    cfg = cfg or IndexConfig()
    t0 = time.perf_counter()
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    _atomic_write_json(os.path.join(out_dir, "index_meta.json"), {
        "part_bits": cfg.part_bits,
        "block_size": cfg.block_size,
        "with_positions": cfg.with_positions,
        "compact_max_postings": cfg.compact_max_postings,
        "bm25": {"k1": cfg.bm25.k1, "b": cfg.bm25.b},
        "analyzer": cfg.analyzer,
        "clean_html": cfg.clean_html,
        "strategy": strategy,
    })

    files = discover_input_files(input_path)
    shards = shard_files(files, shard_target_bytes)
    # conv_map FIRST (cheap single-column scan): collision detection must
    # complete before any doc_id is minted by the tokenize stage
    remap: dict = {}
    if cfg.build_conv_map:
        from .hydrate import build_conv_map

        for s_id, fl in enumerate(shards):
            build_conv_map(fl, out_dir, s_id)
        remap = resolve_conv_collisions(out_dir)
    shard_mans = [
        build_runs_for_shard(s, fl, out_dir, cfg, strategy, concurrency,
                             remap=remap)
        for s, fl in enumerate(shards)
    ]
    n_docs = sum(m["n_turns"] for m in shard_mans)
    stats = compute_corpus_stats(out_dir, n_docs)

    # per-index role-integrity flag: role queries are only sound when EVERY
    # shard carried real role data (a role-less shard's postings are all
    # code 0 and would silently vanish from role-scoped results). Missing
    # has_role (pre-round-3 manifests) defaults to True: those builds read
    # the role column whenever files[0] had one.
    meta_path = os.path.join(out_dir, "index_meta.json")
    with open(meta_path) as f:
        meta_now = json.load(f)
    meta_now["roles_real"] = all(m.get("has_role", True)
                                 for m in shard_mans) if shard_mans else False
    _atomic_write_json(meta_path, meta_now)

    # Stateful actor-pool k-way merge (north rule): raw Ray actors with a
    # dynamic work queue — the part list is fixed, ActorPool load-balances
    # uneven parts. Created after phase 1 so actor spin-up (process fork +
    # imports) does not compete with the tokenize scan for cores.
    from ray.util import ActorPool

    n_parts = 1 << cfg.part_bits
    if merge_concurrency is None:
        merge_concurrency = max(1, min(
            n_parts, int(ray.cluster_resources().get("CPU", 4))))
    RemoteMergeWorker = ray.remote(num_cpus=1)(MergeWorker)
    merge_actors = [RemoteMergeWorker.remote(out_dir, cfg)
                    for _ in range(merge_concurrency)]
    merge_pool = ActorPool(merge_actors)
    metrics = list(merge_pool.map_unordered(
        lambda a, p: a.merge_part.remote(p, stats["avgdl"]),
        list(range(n_parts))))
    metrics.sort(key=lambda m: m["part"])
    for a in merge_actors:
        ray.kill(a)

    if not keep_runs:
        shutil.rmtree(os.path.join(out_dir, "runs"), ignore_errors=True)

    wall = time.perf_counter() - t0
    result = BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        total_tokens=stats["total_tokens"],
        avgdl=stats["avgdl"],
        wall_s=round(wall, 3),
        turns_per_sec=round(n_docs / wall, 1) if wall > 0 else 0.0,
        shard_manifests=shard_mans,
        part_manifests=metrics,
    )
    _atomic_write_json(os.path.join(out_dir, "metrics.json"), {
        "n_docs": n_docs,
        "total_tokens": stats["total_tokens"],
        "wall_s": result.wall_s,
        "turns_per_sec": result.turns_per_sec,
        "shards": shard_mans,
        "parts": [{k: v for k, v in m.items() if k != "inputs"} for m in metrics],
    })
    return result


def append_index(out_dir: str, new_input: str | list[str], *,
                 shard_target_bytes: int = 2 << 30,
                 concurrency: int | None = None,
                 merge_concurrency: int | None = None) -> BuildResult:
    """Incrementally index a GROWN corpus into an existing index — the
    re-crawl/re-index path the reference gets from DB upserts
    (`IndexerService.java:58-68`, resume `CrawlerMainProcess.java:248-260`)
    without a full rebuild:

    - only the NEW files are tokenized (new shard ids continue the old
      sequence; finished shards skip via their manifests)
    - only parts that received new runs re-merge, with the NEW corpus
      avgdl; their manifests record it
    - untouched parts keep their segments verbatim; their block_max was
      computed under the old avgdl, so the reader scales those bounds by
      max(1, avgdl_now/avgdl_then) — pruning stays EXACT, and scoring is
      exact regardless (raw tf/dl stored; avgdl applied at query time)
    - already-minted conv hashes are frozen: collision resolution runs
      append-aware (new colliding convs are re-salted, old ones never move)

    Equivalence with a from-scratch build over the union corpus (same
    shard boundaries): byte-identical segments for every re-merged part,
    byte-identical except block_max for untouched parts, rank-identical
    queries — pinned by tests/test_append.py. Safe to re-run after a
    crash (same manifest discipline as build_index)."""
    import ray

    t0 = time.perf_counter()
    with open(os.path.join(out_dir, "index_meta.json")) as f:
        meta = json.load(f)
    # pre-role part manifests carry no "avgdl"; their block_max WAS built
    # with the pre-append avgdl — backfill it NOW (before stats change) so
    # the reader's bound correction stays exact for untouched legacy parts
    try:
        with open(os.path.join(out_dir, "corpus_stats.json")) as f:
            old_avgdl = json.load(f).get("avgdl")
    except OSError:
        old_avgdl = None
    if old_avgdl:
        for mp in glob.glob(os.path.join(out_dir, "_manifest",
                                         "part-*.json")):
            with open(mp) as f:
                man = json.load(f)
            if "avgdl" not in man:
                man["avgdl"] = old_avgdl
                _atomic_write_json(mp, man)
    from ..config import BM25Params

    cfg = IndexConfig(
        part_bits=meta["part_bits"], block_size=meta["block_size"],
        with_positions=meta["with_positions"],
        compact_max_postings=meta["compact_max_postings"],
        bm25=BM25Params(**meta["bm25"]),
        analyzer=meta.get("analyzer", "porter"),
        clean_html=meta.get("clean_html", False))
    strategy = meta.get("strategy", "combine")

    old_mans = sorted(glob.glob(os.path.join(out_dir, "_manifest",
                                             "shard-*.json")))
    old_ids = []
    known_inputs: dict[tuple, int] = {}   # file-set -> existing shard id
    for p in old_mans:
        with open(p) as f:
            m = json.load(f)
        old_ids.append(int(m["shard"]))
        known_inputs[tuple(m["files"])] = int(m["shard"])
    next_id = (max(old_ids) + 1) if old_ids else 0

    files = discover_input_files(new_input)
    # idempotence: a shard whose exact file list was already indexed reuses
    # its id (re-running append with the same input is a no-op, and a
    # crashed append resumes instead of duplicating documents)
    shard_ids: list[int] = []
    new_shards = shard_files(files, shard_target_bytes)
    for fl in new_shards:
        sid = known_inputs.get(tuple(fl))
        if sid is None:
            sid = next_id
            next_id += 1
        shard_ids.append(sid)
    first_new = min((sid for sid in shard_ids if sid not in old_ids),
                    default=next_id)

    remap: dict = {}
    if os.path.isdir(os.path.join(out_dir, "conv_map")):
        from .hydrate import build_conv_map

        for sid, fl in zip(shard_ids, new_shards):
            build_conv_map(fl, out_dir, sid)
        remap = resolve_conv_collisions(out_dir, append_from=first_new)

    new_mans = [
        build_runs_for_shard(sid, fl, out_dir, cfg, strategy,
                             concurrency, remap=remap)
        for sid, fl in zip(shard_ids, new_shards)
    ]
    n_docs = 0
    for p in glob.glob(os.path.join(out_dir, "_manifest", "shard-*.json")):
        with open(p) as f:
            n_docs += json.load(f)["n_turns"]
    stats = compute_corpus_stats(out_dir, n_docs)

    # role-integrity after append: appending onto a PRE-ROLE index
    # backfills legacy postings as role code 0 in re-merged parts while
    # untouched parts carry no roles at all — role queries would behave
    # differently depending on which parts a term touches. Record one
    # uniform per-index flag (the reader/engine raise on role queries when
    # it is false) instead of depending on per-term part coverage.
    old_real = meta.get("roles_real")
    if old_real is None:
        seg_files = glob.glob(os.path.join(out_dir, "segments", "part=*",
                                           "segment.parquet"))
        old_real = bool(seg_files) and all(
            "roles" in pq.ParquetFile(s).schema_arrow.names
            for s in seg_files)
    meta["roles_real"] = bool(old_real) and all(
        m.get("has_role", True) for m in new_mans)
    _atomic_write_json(os.path.join(out_dir, "index_meta.json"), meta)

    # parts touched by any new shard re-merge with the new avgdl; a part
    # whose manifest already reflects the current inputs+avgdl (crash
    # re-run) skips
    affected: set[int] = set()
    for sid in shard_ids:
        for d in glob.glob(os.path.join(out_dir, "runs",
                                        f"shard={sid}", "part=*")):
            affected.add(int(d.rsplit("=", 1)[1]))
    to_merge = []
    for part in sorted(affected):
        man_path = os.path.join(out_dir, "_manifest", f"part-{part}.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            cur = sorted(os.path.relpath(f_, out_dir) for f_ in glob.glob(
                os.path.join(out_dir, "runs", "shard=*", f"part={part}",
                             "*.parquet")) if ".tmp" not in f_)
            if (man.get("avgdl") == stats["avgdl"]
                    and sorted(man.get("inputs", [])) == cur):
                continue
            os.remove(man_path)
        to_merge.append(part)

    from ray.util import ActorPool

    if merge_concurrency is None:
        merge_concurrency = max(1, min(
            max(1, len(to_merge)),
            int(ray.cluster_resources().get("CPU", 4))))
    RemoteMergeWorker = ray.remote(num_cpus=1)(MergeWorker)
    merge_actors = [RemoteMergeWorker.remote(out_dir, cfg)
                    for _ in range(merge_concurrency)]
    merge_pool = ActorPool(merge_actors)
    metrics = list(merge_pool.map_unordered(
        lambda a, p: a.merge_part.remote(p, stats["avgdl"]), to_merge))
    metrics.sort(key=lambda m: m["part"])
    for a in merge_actors:
        ray.kill(a)

    wall = time.perf_counter() - t0
    n_new = sum(m["n_turns"] for m in new_mans)
    result = BuildResult(
        out_dir=out_dir,
        n_docs=n_docs,
        total_tokens=stats["total_tokens"],
        avgdl=stats["avgdl"],
        wall_s=round(wall, 3),
        turns_per_sec=round(n_new / wall, 1) if wall > 0 else 0.0,
        shard_manifests=new_mans,
        part_manifests=metrics,
    )
    _atomic_write_json(os.path.join(out_dir, "metrics.json"), {
        "n_docs": n_docs,
        "total_tokens": stats["total_tokens"],
        "appended_turns": n_new,
        "remerged_parts": len(to_merge),
        "wall_s": result.wall_s,
        "turns_per_sec": result.turns_per_sec,
        "shards": new_mans,
        "parts": [{k: v for k, v in m.items() if k != "inputs"}
                  for m in metrics],
    })
    return result
