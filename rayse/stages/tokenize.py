"""Tokenize stage: transcript turns -> compressed posting runs (map_batches).

One zero-copy Arrow batch of turns in, one Arrow table of *batch runs* out.
A batch run is one term's postings within one input batch, already
delta-gap + varint compressed — i.e. the map-side **combiner** of the
two-phase (salted) aggregation: phase 1 here (per-batch partial posting
lists, ~10-40x smaller than raw (term, doc) rows), phase 2 in the per-part
merge (`rayse.pipelines.build_index.MergeWorker`).

    part: int32          # doc partition = top part_bits of doc_id
    term: string
    salt: int32          # sub-split of hot groups (0 unless salting enabled)
    df: int64            # postings in this run
    cf: int64            # sum of tf in this run
    min_doc: uint64      # first (lowest) doc_id of the run
    doc_ids: binary      # delta-gap + varint, ascending doc_id
    tfs: binary          # varint term frequencies (`IndexerService.java:205-211`)
    dls: binary          # varint per-posting doc lengths (`IndexerService.java:249-254`)
    positions: binary    # [varint count][delta varint offsets]* per doc
                         # (`IndexerService.java:192-198` position semantics)

This replaces the reference's per-page ``indexPage`` + JDBC upserts
(`Indexer/Service/IndexerService.java:236-365`): instead of upserting
(word, doc) rows into PostgreSQL, each batch emits mergeable compressed
partial posting lists that the merge phase combines per (part, term).

Used as an actor-pool stage (callable class): the stem/stop decision cache
(module-level in ``rayse.analyzer``) warms once per worker and is shared
across batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analyzer import analyze
from ..index.encoding import encode_small_deltas
from .doc_ids import assign_doc_ids

RUNS_SCHEMA = pa.schema([
    ("part", pa.int32()),
    ("term", pa.string()),
    ("salt", pa.int32()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    ("min_doc", pa.uint64()),
    ("doc_ids", pa.binary()),
    ("tfs", pa.binary()),
    ("dls", pa.binary()),
    ("positions", pa.binary()),
])

# raw (term, doc) posting rows — the uncombined phase-1 output used by the
# alternative `groupby_salted` build strategy (skew-parity test path)
POSTINGS_SCHEMA = pa.schema([
    ("part", pa.int32()),
    ("term", pa.string()),
    ("salt", pa.int32()),
    ("doc_id", pa.uint64()),
    ("tf", pa.int32()),
    ("pos_enc", pa.binary()),
    ("doc_len", pa.int32()),
])


def _encode_varint_list(vals: list) -> bytes:
    """Plain (non-delta) varints for a short python list."""
    out = bytearray()
    append = out.append
    for g in vals:
        while g >= 0x80:
            append((g & 0x7F) | 0x80)
            g >>= 7
        append(g)
    return bytes(out)


def _encode_delta_varints(vals: list) -> bytes:
    out = bytearray()
    append = out.append
    prev = 0
    for v in vals:
        g = v - prev
        prev = v
        while g >= 0x80:
            append((g & 0x7F) | 0x80)
            g >>= 7
        append(g)
    return bytes(out)


class TokenizeStage:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools.

    ``emit="runs"`` (default) produces RUNS_SCHEMA combiner output;
    ``emit="postings"`` produces raw POSTINGS_SCHEMA rows for the
    groupby-salted strategy.
    """

    def __init__(self, part_bits: int = 5, with_positions: bool = True,
                 emit: str = "runs", salt_bits: int = 0):
        self.part_bits = part_bits
        self.with_positions = with_positions
        self.emit = emit
        self.salt_bits = salt_bits
        self.conv_cache: dict = {}

    def _analyze_batch(self, batch: pa.Table):
        """Common front half: doc ids + per-doc (term -> positions) maps,
        iterated in ascending doc_id order."""
        doc_ids = assign_doc_ids(batch["conv_id"], batch["turn_idx"].to_numpy(),
                                 self.conv_cache)
        texts = batch["text"].to_pylist()
        order = np.argsort(doc_ids, kind="stable")
        for i in order.tolist():
            text = texts[i]
            tokens = analyze(text if text is not None else "")
            occ: dict = {}
            for pos, t in enumerate(tokens):
                lst = occ.get(t)
                if lst is None:
                    occ[t] = [pos]
                else:
                    lst.append(pos)
            yield int(doc_ids[i]), len(tokens), occ

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.emit == "postings":
            return self._call_postings(batch)
        shift = 64 - self.part_bits
        with_pos = self.with_positions

        # term -> [doc_ids, tfs, dls, pos_blobs]; docs arrive in ascending
        # doc_id order, so every per-term list is born sorted.
        acc: dict = {}
        for d, doc_len, occ in self._analyze_batch(batch):
            for t, positions in occ.items():
                entry = acc.get(t)
                if entry is None:
                    entry = acc[t] = ([], [], [], [])
                entry[0].append(d)
                entry[1].append(len(positions))
                entry[2].append(doc_len)
                if with_pos:
                    entry[3].append(encode_small_deltas(positions))

        n = len(acc)
        terms = []
        parts = np.empty(n, dtype=np.int32)
        dfs = np.empty(n, dtype=np.int64)
        cfs = np.empty(n, dtype=np.int64)
        min_docs = np.empty(n, dtype=np.uint64)
        b_docs: list = []
        b_tfs: list = []
        b_dls: list = []
        b_pos: list = []
        for j, (t, (ds_, ts_, ls_, ps_)) in enumerate(acc.items()):
            terms.append(t)
            parts[j] = ds_[0] >> shift
            dfs[j] = len(ds_)
            cfs[j] = sum(ts_)
            min_docs[j] = ds_[0]
            b_docs.append(_encode_delta_varints(ds_))
            b_tfs.append(_encode_varint_list(ts_))
            b_dls.append(_encode_varint_list(ls_))
            if with_pos:
                chunks = bytearray()
                for tf, blob in zip(ts_, ps_):
                    g = tf
                    while g >= 0x80:
                        chunks.append((g & 0x7F) | 0x80)
                        g >>= 7
                    chunks.append(g)
                    chunks.extend(blob)
                b_pos.append(bytes(chunks))
            else:
                b_pos.append(b"")

        # NOTE: a batch run can span partition boundaries only if a term's
        # postings fall in multiple parts; split rows per part.
        # (doc partition = top bits of doc_id, docs within a batch span parts,
        # so per-term runs must be split at part boundaries.)
        return _split_runs_by_part(terms, parts, dfs, cfs, min_docs,
                                   b_docs, b_tfs, b_dls, b_pos,
                                   acc, self.part_bits, with_pos)

    def _call_postings(self, batch: pa.Table) -> pa.Table:
        shift = 64 - self.part_bits
        salt_shift = 64 - self.part_bits - self.salt_bits
        salt_mask = (1 << self.salt_bits) - 1
        terms: list = []
        out_doc: list = []
        out_tf: list = []
        out_pos: list = []
        out_dl: list = []
        with_pos = self.with_positions
        for d, doc_len, occ in self._analyze_batch(batch):
            for t, positions in occ.items():
                terms.append(t)
                out_doc.append(d)
                out_tf.append(len(positions))
                out_pos.append(encode_small_deltas(positions) if with_pos else b"")
                out_dl.append(doc_len)
        doc_arr = np.asarray(out_doc, dtype=np.uint64)
        salt = ((doc_arr >> np.uint64(salt_shift)) & np.uint64(salt_mask)
                ).astype(np.int32) if self.salt_bits else np.zeros(len(out_doc), np.int32)
        return pa.table(
            {
                "part": pa.array((doc_arr >> np.uint64(shift)).astype(np.int32), pa.int32()),
                "term": pa.array(terms, pa.string()),
                "salt": pa.array(salt, pa.int32()),
                "doc_id": pa.array(doc_arr, pa.uint64()),
                "tf": pa.array(out_tf, pa.int32()),
                "pos_enc": pa.array(out_pos, pa.binary()),
                "doc_len": pa.array(out_dl, pa.int32()),
            },
            schema=POSTINGS_SCHEMA,
        )


def _split_runs_by_part(terms, parts, dfs, cfs, min_docs, b_docs, b_tfs, b_dls,
                        b_pos, acc, part_bits, with_pos) -> pa.Table:
    """Split any run whose postings cross a doc-partition boundary.

    Most runs live in one part (parts = 2^part_bits, docs hash-uniform, so a
    small-df run usually stays put; big runs split into <= n_parts rows).
    """
    shift = 64 - part_bits
    o_term, o_part, o_salt, o_df, o_cf, o_min = [], [], [], [], [], []
    o_docs, o_tfs, o_dls, o_positions = [], [], [], []

    for j, t in enumerate(terms):
        ds_, ts_, ls_, ps_ = acc[t]
        last_part = ds_[-1] >> shift
        if last_part == parts[j]:
            o_term.append(t)
            o_part.append(parts[j])
            o_salt.append(0)
            o_df.append(dfs[j])
            o_cf.append(cfs[j])
            o_min.append(min_docs[j])
            o_docs.append(b_docs[j])
            o_tfs.append(b_tfs[j])
            o_dls.append(b_dls[j])
            o_positions.append(b_pos[j])
            continue
        # crosses parts: re-encode per part slice
        darr = np.asarray(ds_, dtype=np.uint64)
        p_of = (darr >> np.uint64(shift)).astype(np.int64)
        bounds = np.flatnonzero(p_of[1:] != p_of[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(ds_)]))
        for s, e in zip(starts.tolist(), ends.tolist()):
            o_term.append(t)
            o_part.append(int(p_of[s]))
            o_salt.append(0)
            o_df.append(e - s)
            o_cf.append(sum(ts_[s:e]))
            o_min.append(ds_[s])
            o_docs.append(_encode_delta_varints(ds_[s:e]))
            o_tfs.append(_encode_varint_list(ts_[s:e]))
            o_dls.append(_encode_varint_list(ls_[s:e]))
            if with_pos:
                chunks = bytearray()
                for tf, blob in zip(ts_[s:e], ps_[s:e]):
                    g = tf
                    while g >= 0x80:
                        chunks.append((g & 0x7F) | 0x80)
                        g >>= 7
                    chunks.append(g)
                    chunks.extend(blob)
                o_positions.append(bytes(chunks))
            else:
                o_positions.append(b"")

    return pa.table(
        {
            "part": pa.array(o_part, pa.int32()),
            "term": pa.array(o_term, pa.string()),
            "salt": pa.array(o_salt, pa.int32()),
            "df": pa.array(o_df, pa.int64()),
            "cf": pa.array(o_cf, pa.int64()),
            "min_doc": pa.array(o_min, pa.uint64()),
            "doc_ids": pa.array(o_docs, pa.binary()),
            "tfs": pa.array(o_tfs, pa.binary()),
            "dls": pa.array(o_dls, pa.binary()),
            "positions": pa.array(o_positions, pa.binary()),
        },
        schema=RUNS_SCHEMA,
    )
