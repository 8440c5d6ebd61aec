"""Index storage planner: per-term compressed-size accounting vs the
DuckDB re-derivation, plus physical consistency against the actual
segment bytes and the real encoder."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def porter_index(ray_session, tmp_path_factory):
    from rayse.config import IndexConfig
    from rayse.pipelines.build_index import build_index
    from rayse.pipelines.transcripts import write_transcripts_from_documents

    root = tmp_path_factory.mktemp("idxplan")
    tdir = root / "transcripts"
    tdir.mkdir()
    write_transcripts_from_documents(SF, str(tdir))
    idir = str(root / "index")
    build_index(str(tdir), idir, IndexConfig())
    return idir


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def test_plan_matches_duckdb(porter_index, con):
    from rayse.ops.idxplan import postings_size_plan, postings_size_plan_sql

    got = postings_size_plan(porter_index).to_pandas()
    want = con.execute(postings_size_plan_sql()).fetchdf()
    assert len(want) > 0
    got = got.sort_values("term").reset_index(drop=True)
    want = (want.sort_values("term").reset_index(drop=True)
            [list(got.columns)].astype(got.dtypes.to_dict()))
    pd.testing.assert_frame_equal(got, want)


def test_plan_positions_match_stored_bytes(porter_index, ray_session):
    """Positions streams are self-delimited/relocatable, so the planned
    positions size must equal the stored blob bytes exactly; tf/dl
    streams re-encode value-for-value, so planned == stored for them
    too. doc_ids shrink: merging chunks replaces each non-first chunk's
    absolute head with a (smaller or equal) boundary gap."""
    from rayse.ops.idxplan import postings_size_plan

    plan = postings_size_plan(porter_index).to_pandas().set_index("term")
    files = sorted(glob.glob(os.path.join(
        porter_index, "segments", "part=*", "segment.parquet")))
    seg = pq.read_table(files, columns=["term", "doc_ids", "tfs", "dls",
                                        "positions"]).to_pandas()
    stored = seg.assign(
        db=seg["doc_ids"].map(len), tb=seg["tfs"].map(len),
        lb=seg["dls"].map(len), pb=seg["positions"].map(len),
    ).groupby("term")[["db", "tb", "lb", "pb"]].sum()
    assert (plan["pos_varint_bytes"] == stored["pb"]).all()
    assert (plan["tf_varint_bytes"] == stored["tb"]).all()
    assert (plan["dl_varint_bytes"] == stored["lb"]).all()
    assert (plan["doc_varint_bytes"] <= stored["db"]).all()
    assert (plan["doc_varint_bytes"] > 0).all()


def test_plan_matches_reencode_of_merged_lists(porter_index, ray_session):
    """Ground truth by construction: re-encode each term's MERGED
    posting list with the production encoder and compare byte lengths;
    gamma bits recomputed with pure-python int.bit_length."""
    from rayse.index.encoding import delta_encode, encode_varints
    from rayse.index.reader import IndexReader
    from rayse.ops.idxplan import postings_size_plan

    plan = postings_size_plan(porter_index).to_pandas().set_index("term")
    r = IndexReader(porter_index)
    for term in plan.index:
        pl = r.merged(term)
        d = pl.doc_ids
        assert (np.diff(d.astype(object)) > 0).all()
        enc = encode_varints(delta_encode(d))
        assert plan.at[term, "doc_varint_bytes"] == len(enc)
        gaps = np.diff(d.astype(object))
        gbits = 64 + sum(2 * int(g).bit_length() - 1 for g in gaps)
        assert plan.at[term, "doc_gamma_bits"] == gbits
        assert plan.at[term, "tf_varint_bytes"] == len(
            encode_varints(pl.tfs.astype(np.uint64)))
        assert plan.at[term, "df"] == d.size
        assert plan.at[term, "cf"] == int(pl.tfs.sum())


def test_remap_plan_matches_duckdb(porter_index, con):
    from rayse.ops.idxplan import (postings_remap_plan,
                                   postings_remap_plan_sql)

    got = postings_remap_plan(porter_index).to_pandas()
    want = con.execute(postings_remap_plan_sql()).fetchdf()
    assert len(want) > 0
    got = got.sort_values("term").reset_index(drop=True)
    want = (want.sort_values("term").reset_index(drop=True)
            [list(got.columns)].astype(got.dtypes.to_dict()))
    pd.testing.assert_frame_equal(got, want)


def test_remap_matches_reencode_of_ranked_lists(porter_index, ray_session):
    """Ground truth by construction: rank every posting-bearing doc in
    global doc_id order, re-encode each term's rank list with the
    production encoder, compare bytes/bits."""
    from rayse.index.encoding import delta_encode, encode_varints
    from rayse.index.reader import IndexReader
    from rayse.ops.idxplan import postings_remap_plan, postings_size_plan

    plan = postings_remap_plan(porter_index).to_pandas().set_index("term")
    r = IndexReader(porter_index)
    universe = np.unique(np.concatenate(
        [r.merged(t).doc_ids for t in plan.index]))
    total_remap, total_orig = 0, 0
    orig = postings_size_plan(porter_index).to_pandas().set_index("term")
    for term in plan.index:
        ranks = np.searchsorted(universe, r.merged(term).doc_ids).astype(
            np.uint64)
        enc = encode_varints(delta_encode(ranks))
        assert plan.at[term, "remap_docvb"] == len(enc)
        gaps = np.diff(ranks.astype(object))
        gbits = 64 + sum(2 * int(g).bit_length() - 1 for g in gaps)
        assert plan.at[term, "remap_gamma"] == gbits
        total_remap += len(enc)
        total_orig += orig.at[term, "doc_varint_bytes"]
    # dense reassignment must strictly shrink the sparse-FNV gap stream
    assert total_remap < total_orig
