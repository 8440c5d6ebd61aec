"""Stable docID assignment — pure function, no shuffle.

The reference identifies documents by URL with a DB-assigned bigserial PK
(`Crawler/Entities/Document.java:17-55`). A distributed build cannot mint
sequential IDs without coordination, so docIDs are a pure function of the
row key (BASELINE.json: docID = ``conv_id:turn_idx`` under stable turn
ordering):

    doc_id = (fnv1a64(conv_id) & (2^43-1)) << 21 | turn_idx

- bits 63..21: 43-bit conversation hash → document partition = the top
  ``part_bits`` bits, so a conversation's turns co-locate in one partition
  (phrase/boolean ops and conv-level ops stay partition-local).
- bits 20..0: turn_idx (up to 2M turns per conversation).

doc_id order within a conversation == turn order, so ascending-docID
tie-breaks are deterministic and conversation-coherent.

Collision handling: two conversations CAN hash to the same 43 bits
(P ≈ n²/2^44 — about 30% that at least one pair collides at 2.4M convs),
which would corrupt searchsorted probes and hydrate to the wrong
conversation. The build therefore detects collisions up front
(`rayse.pipelines.build_index.resolve_conv_collisions`: distributed
distinct-(hash, conv) scan over the conv_map) and deterministically
re-salts every colliding conversation except the lexicographically first
(``fnv1a64(conv_id + "\\0" + salt)``), validating the final assignment is
injective before any posting is written. The tiny exception map is carried
by every doc_id producer/consumer (tokenize seeds its conv cache with it;
hydrate overlays it on conv_map lookups). At 10^10+ conversations the
43-bit space itself saturates — the documented scale path is a global
ordinal assignment (one groupby over conv_ids), which this exception-map
mechanism degrades into gracefully (the map IS the ordinal table for the
colliding subset).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CONV_BITS = 43
TURN_BITS = 21
_CONV_MASK = (1 << CONV_BITS) - 1
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_U64 = (1 << 64) - 1


def fnv1a64(s: str) -> int:
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _U64
    return h


def conv_hash(conv_id: str) -> int:
    return fnv1a64(conv_id) & _CONV_MASK


def doc_id_of(conv_id: str, turn_idx: int) -> int:
    return (conv_hash(conv_id) << TURN_BITS) | turn_idx


def part_of(doc_id: int, part_bits: int) -> int:
    return doc_id >> (64 - part_bits)


def assign_doc_ids(conv_ids: pa.Array | list, turn_idxs: np.ndarray,
                   cache: dict | None = None) -> np.ndarray:
    """Vector doc_id assignment for one batch (conv hash memoized — convs
    repeat ~n_turns times and batches keep conversations contiguous).

    Collision remaps enter by pre-seeding ``cache`` with the exception map
    (conv_id -> overridden hash): zero hot-path cost."""
    if cache is None:
        cache = {}
    convs = conv_ids.to_pylist() if isinstance(conv_ids, (pa.Array, pa.ChunkedArray)) else list(conv_ids)
    hashes = np.empty(len(convs), dtype=np.uint64)
    for i, c in enumerate(convs):
        h = cache.get(c)
        if h is None:
            h = cache[c] = conv_hash(c)
        hashes[i] = h
    return (hashes << np.uint64(TURN_BITS)) | np.asarray(turn_idxs, dtype=np.uint64)
