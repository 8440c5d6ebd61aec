"""Incremental append (`append_index`): append(A, B) must equal
build(A+B) — byte-identical segments for re-merged parts, byte-identical
except block_max (old-avgdl bounds, reader-corrected) for untouched parts,
rank-identical queries — and re-running the same append must be a no-op."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from rayse.config import IndexConfig
from rayse.corpus.generator import generate_block
from rayse.pipelines.build_index import append_index, build_index
from rayse.query.engine import SearchEngine

QUERIES = ["table scan", "hash join", '"table scan"', "window agg batch"]


@pytest.fixture(scope="module")
def dirs(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("append")
    a, b, union = root / "a", root / "b", root / "union"
    for d in (a, b, union):
        d.mkdir()
    ta = generate_block(0, 150)
    tb = generate_block(150, 153)
    pq.write_table(ta, str(a / "000.parquet"))
    pq.write_table(tb, str(b / "001.parquet"))
    pq.write_table(ta, str(union / "000.parquet"))
    pq.write_table(tb, str(union / "001.parquet"))

    cfg = IndexConfig(part_bits=5)
    idx_full = str(root / "idx_full")
    build_index(str(union), idx_full, cfg, shard_target_bytes=1,
                concurrency=3, merge_concurrency=3)
    idx_inc = str(root / "idx_inc")
    build_index(str(a), idx_inc, cfg, shard_target_bytes=1,
                concurrency=3, merge_concurrency=3)
    res = append_index(idx_inc, str(b), shard_target_bytes=1,
                       concurrency=3, merge_concurrency=3)
    return idx_full, idx_inc, res


def _seg(idx, part):
    return pq.read_table(os.path.join(idx, "segments", f"part={part}",
                                      "segment.parquet"))


def test_append_equals_full_build(dirs):
    idx_full, idx_inc, res = dirs
    with open(os.path.join(idx_full, "corpus_stats.json")) as f:
        full_stats = json.load(f)
    with open(os.path.join(idx_inc, "corpus_stats.json")) as f:
        inc_stats = json.load(f)
    assert full_stats == inc_stats

    remerged = {m["part"] for m in res.part_manifests}
    n_parts = 32
    assert 0 < len(remerged) < n_parts     # some parts must be untouched

    for part in range(n_parts):
        a = _seg(idx_full, part)
        b = _seg(idx_inc, part)
        if part in remerged:
            assert a.equals(b), f"re-merged part {part} not byte-identical"
        else:
            assert a.drop_columns(["block_max"]).equals(
                b.drop_columns(["block_max"])), f"part {part} differs"


def test_append_rank_identity(dirs):
    idx_full, idx_inc, _ = dirs
    ef, ei = SearchEngine(idx_full), SearchEngine(idx_inc)
    for q in QUERIES:
        df_, sf_ = ef.search(q, 10)
        di, si = ei.search(q, 10)
        assert [int(x) for x in df_] == [int(x) for x in di], q
        assert sf_.tolist() == si.tolist(), q
        # untouched parts carry old-avgdl bounds: the scaled block-max path
        # must still be exactly the exhaustive top-k
        de, se = ei.search(q, 10, mode="exhaustive")
        assert [int(x) for x in di] == [int(x) for x in de], q


def test_append_bound_scale_applied(dirs):
    _, idx_inc, res = dirs
    reader = SearchEngine(idx_inc).reader
    remerged = {m["part"] for m in res.part_manifests}
    scales = {int(p.part_dir.rsplit("=", 1)[1]): p.bound_scale
              for p in reader.parts}
    for part, scale in scales.items():
        if part in remerged:
            assert scale == 1.0
        else:
            assert scale >= 1.0


def test_append_idempotent(dirs, tmp_path_factory):
    _, idx_inc, first = dirs
    b_dir = os.path.dirname(glob.glob(os.path.join(
        os.path.dirname(idx_inc), "b", "*.parquet"))[0])
    again = append_index(idx_inc, b_dir, shard_target_bytes=1,
                         concurrency=3, merge_concurrency=3)
    assert again.n_docs == first.n_docs
    with open(os.path.join(idx_inc, "metrics.json")) as f:
        m = json.load(f)
    assert m["remerged_parts"] == 0
    assert m["appended_turns"] == 0 or again.part_manifests == []


def test_append_to_legacy_index(ray_session, tmp_path):
    """Appending to a pre-role index (run files and segments without the
    'roles' column, part manifests without 'avgdl') must work: merges
    tolerate missing blobs (role code 0), and the pre-append avgdl is
    backfilled into legacy part manifests so untouched parts' block-max
    correction stays exact."""
    import shutil

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir()
    b.mkdir()
    pq.write_table(generate_block(0, 100), str(a / "000.parquet"))
    pq.write_table(generate_block(100, 104), str(b / "001.parquet"))
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(part_bits=4)
    build_index(str(a), idx, cfg, shard_target_bytes=1,
                concurrency=3, merge_concurrency=3)

    # simulate a round-1 index: strip roles from runs + segments, drop
    # avgdl from part manifests
    for f in glob.glob(os.path.join(idx, "runs", "shard=*", "part=*",
                                    "*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["roles"]), f)
    for f in glob.glob(os.path.join(idx, "segments", "part=*",
                                    "segment.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["roles"]), f)
    for f in glob.glob(os.path.join(idx, "_manifest", "part-*.json")):
        with open(f) as fh:
            man = json.load(fh)
        man.pop("avgdl", None)
        with open(f, "w") as fh:
            json.dump(man, fh)
    meta_path = os.path.join(idx, "index_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta.pop("roles_real", None)    # pre-role meta carries no flag
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)

    res = append_index(idx, str(b), shard_target_bytes=1,
                       concurrency=3, merge_concurrency=3)
    assert res.n_docs > 0 and res.part_manifests

    # the appended index mixes backfilled (code-0) and real role postings:
    # the per-index flag must be recorded false and role queries raise
    # UNIFORMLY, not per-term depending on which parts the term touches
    with open(meta_path) as fh:
        assert json.load(fh)["roles_real"] is False

    # legacy manifests got the pre-append avgdl backfilled
    remerged = {m["part"] for m in res.part_manifests}
    for f in glob.glob(os.path.join(idx, "_manifest", "part-*.json")):
        with open(f) as fh:
            man = json.load(fh)
        assert "avgdl" in man, f

    # index is queryable and the block-max path stays exact
    eng = SearchEngine(idx)
    for q in QUERIES:
        d_bm, s_bm = eng.search(q, 10)
        d_ex, s_ex = eng.search(q, 10, mode="exhaustive")
        assert [int(x) for x in d_bm] == [int(x) for x in d_ex], q
    assert 0 < len(remerged)
    assert eng.reader.roles_real is False
    import pytest

    with pytest.raises(ValueError, match="role"):
        eng.search(QUERIES[0], 5, role="assistant")
    with pytest.raises(ValueError, match="role"):
        eng.search(QUERIES[0], 5, role_weights={"assistant": 2.0})
