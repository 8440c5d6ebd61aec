"""Index maintenance: logical deletes (tombstones) + physical compaction.

The reference mutates its corpus through the DB (`Document` rows deleted /
re-crawled; the PG index follows implicitly). A distributed immutable
segment index needs the Lucene two-phase realization instead:

1. ``delete_convs`` — LOGICAL delete: the conversation hashes land in
   ``tombstones.json`` and every query-time posting traversal masks them
   out (``IndexReader._mask_tombstoned``). Corpus statistics (df, n_docs,
   avgdl) keep their pre-delete values until compaction — documented
   Lucene semantics (deleted docs count toward stats until segments
   merge), pinned by tests: surviving docs' scores are UNCHANGED by a
   logical delete.
2. ``compact_index`` — PHYSICAL rewrite: every part's segment file is
   filtered (postings of tombstoned conversations dropped, positions
   relocated by byte-span gather — never decoded), corpus stats are
   recomputed exactly from the dropped postings' (doc, dl) pairs, and
   block-max metadata is rebuilt against the new avgdl. The result ranks
   IDENTICALLY to a fresh build over the filtered corpus (pinned by
   tests across bm25/phrase/boolean/role modes).

Contract notes:
- Turns whose every token was filtered by the analyzer carry no postings
  and are invisible to compaction's stats recomputation; a corpus with
  such turns would compact to a slightly different avgdl than a rebuild
  (they never match any query either way). The synthetic corpora have
  none (every turn keeps >= 1 token; the parity test would fail loudly
  otherwise).
- Parts are docID-range partitions, so a conversation's postings live in
  exactly one part: per-part distinct-(doc, dl) sums combine exactly.
- Deleting a conversation that was collision-remapped at build time
  resolves through the same exception map the build wrote
  (``_manifest/conv_remap.json``).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import BM25Params
from ..stages.doc_ids import TURN_BITS, conv_hash
from .encoding import delta_encode, encode_varints
from .segments import SEGMENT_SCHEMA, bm25_tf, filter_positions_blob


def _tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones.json")


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted uint64 conv-hash tombstone array (empty when none)."""
    p = _tombstone_path(index_dir)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.uint64)
    with open(p) as f:
        return np.asarray(sorted(json.load(f)["conv_hashes"]),
                          dtype=np.uint64)


def delete_convs(index_dir: str, conv_ids: list[str]) -> dict:
    """Logically delete conversations: merge their (remap-aware) hashes
    into ``tombstones.json``. Returns a small summary. Readers opened
    AFTER this call mask the postings; open readers are unaffected."""
    remap_p = os.path.join(index_dir, "_manifest", "conv_remap.json")
    remap: dict[str, int] = {}
    if os.path.exists(remap_p):
        with open(remap_p) as f:
            remap = json.load(f)
    hashes = {int(remap.get(c, conv_hash(c))) for c in conv_ids}
    p = _tombstone_path(index_dir)
    prev_h: set[int] = set()
    prev_c: list[str] = []
    if os.path.exists(p):
        with open(p) as f:
            prev = json.load(f)
        prev_h = set(prev["conv_hashes"])
        prev_c = prev.get("conv_ids", [])
    merged_h = sorted(prev_h | hashes)
    merged_c = sorted(set(prev_c) | set(conv_ids))
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"conv_hashes": merged_h, "conv_ids": merged_c}, f)
    os.replace(tmp, p)
    return {"n_tombstoned_convs": len(merged_h),
            "n_new": len(merged_h) - len(prev_h)}


def _compact_part_stats(seg_path: str, tombs: np.ndarray) -> tuple:
    """(n_deleted_docs, deleted_token_sum) of one part — distinct
    (doc, dl) pairs over the part's tombstoned postings. Exact because a
    doc's postings never span parts."""
    tbl = pq.read_table(seg_path, columns=["df", "doc_ids", "dls"])
    if tbl.num_rows == 0:
        return 0, 0
    from .encoding import decode_varints

    del_docs: list[np.ndarray] = []
    del_dls: list[np.ndarray] = []
    for i in range(tbl.num_rows):
        d = np.cumsum(decode_varints(tbl["doc_ids"][i].as_py()),
                      dtype=np.uint64)
        convs = d >> np.uint64(TURN_BITS)
        pos = np.searchsorted(tombs, convs)
        pos_c = np.minimum(pos, tombs.size - 1)
        hit = tombs[pos_c] == convs
        if hit.any():
            del_docs.append(d[hit])
            del_dls.append(decode_varints(tbl["dls"][i].as_py())[hit])
    if not del_docs:
        return 0, 0
    docs = np.concatenate(del_docs)
    dls = np.concatenate(del_dls)
    uniq, first = np.unique(docs, return_index=True)
    return int(uniq.size), int(dls[first].sum())


def _compact_part_rewrite(part_dir: str, out_part_dir: str,
                          tombs: np.ndarray, avgdl: float,
                          params: BM25Params, block_size: int) -> dict:
    """Rewrite one part's segment file without the tombstoned postings.
    Terms keep their (term, salt) row split; rows that lose every posting
    are dropped. Positions move by byte-span gather (never decoded)."""
    seg_path = os.path.join(part_dir, "segment.parquet")
    tbl = pq.read_table(seg_path)
    rows = {n: [] for n in SEGMENT_SCHEMA.names}
    n_terms = 0
    n_post = 0
    prev_term = None
    has_roles = "roles" in tbl.column_names
    from .encoding import decode_varints

    for i in range(tbl.num_rows):
        d = np.cumsum(decode_varints(tbl["doc_ids"][i].as_py()),
                      dtype=np.uint64)
        if tombs.size:
            convs = d >> np.uint64(TURN_BITS)
            pos = np.searchsorted(tombs, convs)
            pos_c = np.minimum(pos, tombs.size - 1)
            keep = tombs[pos_c] != convs
        else:
            keep = np.ones(d.size, dtype=bool)
        if not keep.any():
            continue
        tfs = decode_varints(tbl["tfs"][i].as_py())
        dls = decode_varints(tbl["dls"][i].as_py())
        pos_blob = tbl["positions"][i].as_py()
        if keep.all():
            kd, kt, kl = d, tfs, dls
            kp = pos_blob
            kr = tbl["roles"][i].as_py() if has_roles else b""
        else:
            kd, kt, kl = d[keep], tfs[keep], dls[keep]
            kp = filter_positions_blob(pos_blob, tfs, keep)
            if has_roles:
                rb = np.frombuffer(tbl["roles"][i].as_py(), dtype=np.uint8)
                kr = rb[keep].tobytes()
            else:
                kr = b""
        term = tbl["term"][i].as_py()
        n = kd.size
        comp = bm25_tf(kt, kl, avgdl, params)
        nblocks = (n + block_size - 1) // block_size
        starts = np.arange(nblocks, dtype=np.int64) * block_size
        rows["term"].append(term)
        rows["salt"].append(tbl["salt"][i].as_py())
        rows["df"].append(n)
        rows["cf"].append(int(kt.sum()))
        rows["doc_ids"].append(encode_varints(delta_encode(kd)))
        rows["tfs"].append(encode_varints(kt.astype(np.uint64)))
        rows["dls"].append(encode_varints(kl.astype(np.uint64)))
        rows["roles"].append(kr)
        rows["positions"].append(kp)
        rows["block_max"].append(
            np.maximum.reduceat(comp, starts).tolist())
        rows["block_last"].append(
            kd[np.minimum(starts + block_size - 1, n - 1)].tolist())
        n_post += n
        if term != prev_term:
            n_terms += 1
            prev_term = term

    os.makedirs(out_part_dir, exist_ok=True)
    pq.write_table(pa.table(rows, schema=SEGMENT_SCHEMA),
                   os.path.join(out_part_dir, "segment.parquet"))
    return {"n_terms": n_terms, "n_postings": n_post}


def compact_index(index_dir: str, out_dir: str,
                  extra_conv_ids: list[str] | None = None) -> dict:
    """Physically rewrite ``index_dir`` without its tombstoned
    conversations -> ``out_dir`` (a complete standalone index: segments,
    corpus stats, meta, conv_map, manifests with lineage). Two passes of
    one Ray task per part: stats (distinct deleted (doc, dl) sums), then
    rewrite against the recomputed avgdl. ``extra_conv_ids`` compact
    out additional conversations without mutating ``index_dir`` (no
    tombstone write — a one-shot filtered rewrite)."""
    import ray

    tombs = load_tombstones(index_dir)
    if extra_conv_ids:
        remap_p = os.path.join(index_dir, "_manifest", "conv_remap.json")
        remap: dict[str, int] = {}
        if os.path.exists(remap_p):
            with open(remap_p) as f:
                remap = json.load(f)
        extra = {int(remap.get(c, conv_hash(c))) for c in extra_conv_ids}
        tombs = np.asarray(sorted(set(tombs.tolist()) | extra),
                           dtype=np.uint64)
    with open(os.path.join(index_dir, "corpus_stats.json")) as f:
        stats = json.load(f)
    with open(os.path.join(index_dir, "index_meta.json")) as f:
        meta = json.load(f)
    part_dirs = sorted(
        (d for d in glob.glob(os.path.join(index_dir, "segments", "part=*"))
         if not d.endswith(".tmp")),
        key=lambda p: int(p.rsplit("=", 1)[1]))

    if tombs.size:
        stats_task = ray.remote(_compact_part_stats)
        refs = [stats_task.remote(os.path.join(d, "segment.parquet"), tombs)
                for d in part_dirs]
        partials = ray.get(refs)
        n_del = sum(p[0] for p in partials)
        tok_del = sum(p[1] for p in partials)
    else:
        n_del, tok_del = 0, 0

    n_docs = stats["n_docs"] - n_del
    total_tokens = stats["total_tokens"] - tok_del
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    params = BM25Params(**meta.get("bm25", {}))
    block_size = meta.get("block_size", 128)

    os.makedirs(out_dir, exist_ok=True)
    rewrite_task = ray.remote(_compact_part_rewrite)
    refs = []
    for d in part_dirs:
        pid = d.rsplit("=", 1)[1]
        refs.append(rewrite_task.remote(
            d, os.path.join(out_dir, "segments", f"part={pid}"),
            tombs, avgdl, params, block_size))
    part_stats = ray.get(refs)

    with open(os.path.join(out_dir, "corpus_stats.json"), "w") as f:
        json.dump({"avgdl": avgdl, "n_docs": n_docs,
                   "total_tokens": total_tokens}, f, indent=1)
    with open(os.path.join(out_dir, "index_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    man_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    for d, ps in zip(part_dirs, part_stats):
        pid = d.rsplit("=", 1)[1]
        with open(os.path.join(man_dir, f"part-{pid}.json"), "w") as f:
            json.dump({"part": int(pid), "avgdl": avgdl,
                       "compacted_from": os.path.abspath(index_dir),
                       "n_tombstoned_convs": int(tombs.size), **ps}, f)
    remap_p = os.path.join(index_dir, "_manifest", "conv_remap.json")
    if os.path.exists(remap_p):
        shutil.copy(remap_p, os.path.join(man_dir, "conv_remap.json"))
    cm = os.path.join(index_dir, "conv_map")
    if os.path.isdir(cm):
        shutil.copytree(cm, os.path.join(out_dir, "conv_map"),
                        dirs_exist_ok=True)
    return {"n_docs": n_docs, "n_deleted_docs": n_del,
            "avgdl": avgdl,
            "n_postings": sum(p["n_postings"] for p in part_stats)}
