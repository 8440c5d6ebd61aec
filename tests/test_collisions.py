"""Conv-hash collision handling (round-1 advisory: duplicate doc_ids from
43-bit hash collisions corrupted searchsorted probes and hydrated the wrong
conversation). The build must detect collisions, deterministically remap all
but the first conv of each group, and keep search + hydration correct."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rayse.config import IndexConfig
from rayse.corpus.generator import TRANSCRIPTS_SCHEMA
from rayse.pipelines.build_index import build_index, resolve_conv_collisions
from rayse.query.engine import SearchEngine
from rayse.stages.doc_ids import conv_hash

# A real 43-bit FNV-1a collision, found once by a seeded birthday search
# (8M random a-z ids, rng seed 12345); pinned as constants.
COLL_A, COLL_B = "cdihvanqcy", "otvfawvedp"

CONVS = [COLL_A, COLL_B, "normalconva", "normalconvb"]


def _write_corpus(path: str):
    rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool",
                            "ts")}
    for ci, c in enumerate(CONVS):
        for t in range(3):
            rows["conv_id"].append(c)
            rows["turn_idx"].append(t)
            rows["role"].append("user" if t % 2 == 0 else "assistant")
            rows["text"].append(f"convmark{ci} turnmark{t} commontoken")
            rows["tool"].append("")
            rows["ts"].append(1_700_000_000_000_000 + ci * 1000 + t)
    tbl = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], pa.string()),
            "turn_idx": pa.array(np.asarray(rows["turn_idx"],
                                            dtype=np.int32)),
            "role": pa.array(rows["role"], pa.string()),
            "text": pa.array(rows["text"], pa.string()),
            "tool": pa.array(rows["tool"], pa.string()),
            "ts": pa.array(np.asarray(rows["ts"],
                                      dtype=np.int64).view("datetime64[us]")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
    pq.write_table(tbl, path)


def test_collision_pair_is_real():
    assert COLL_A != COLL_B
    assert conv_hash(COLL_A) == conv_hash(COLL_B)


def test_build_remaps_collisions(ray_session, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    _write_corpus(str(corpus / "t.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(corpus), idx, IndexConfig(part_bits=4))

    with open(os.path.join(idx, "_manifest", "conv_remap.json")) as f:
        remap = json.load(f)
    # exactly the later conv of the colliding pair is remapped
    assert list(remap) == [max(COLL_A, COLL_B)]
    conv, nh = next(iter(remap.items()))
    assert nh != conv_hash(conv)
    assert 0 <= nh < (1 << 43)

    # all 12 turns have distinct doc_ids (without the remap, the colliding
    # convs' turns collapse onto 3 shared doc_ids -> only 9 distinct)
    eng = SearchEngine(idx)
    docs, _ = eng.search("commontoken", k=50)
    assert docs.size == 12
    assert np.unique(docs).size == 12

    # hydration resolves each colliding conv to ITS OWN text
    for ci, conv_id in enumerate(CONVS[:2]):
        rows = eng.search_hydrated(f"convmark{ci}", str(corpus), k=10)
        assert len(rows) == 3
        assert {r["conv_id"] for r in rows} == {conv_id}
        assert all(f"convmark{ci}" in r["text"] for r in rows)


def test_remap_deterministic(ray_session, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    _write_corpus(str(corpus / "t.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(corpus), idx, IndexConfig(part_bits=4))
    p = os.path.join(idx, "_manifest", "conv_remap.json")
    with open(p) as f:
        first = json.load(f)
    os.remove(p)
    second = resolve_conv_collisions(idx)
    assert second == first


def test_no_collision_no_remap(ray_session, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    rows = pa.table(
        {
            "conv_id": pa.array(["convone"] * 2 + ["convtwo"] * 2,
                                pa.string()),
            "turn_idx": pa.array(np.asarray([0, 1, 0, 1], dtype=np.int32)),
            "role": pa.array(["user", "assistant"] * 2, pa.string()),
            "text": pa.array([f"plainword{i}" for i in range(4)],
                             pa.string()),
            "tool": pa.array([""] * 4, pa.string()),
            "ts": pa.array(np.asarray([1, 2, 3, 4],
                                      dtype=np.int64).view("datetime64[us]")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )
    pq.write_table(rows, str(corpus / "t.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(corpus), idx, IndexConfig(part_bits=4))
    with open(os.path.join(idx, "_manifest", "conv_remap.json")) as f:
        assert json.load(f) == {}
