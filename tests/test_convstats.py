"""Conversation analytics vs DuckDB oracles (stats fold + index-derived
TF-IDF keywords, both df-attachment routes)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_index(ray_session, tmp_path_factory):
    from rayse.config import IndexConfig
    from rayse.pipelines.build_index import build_index
    from rayse.pipelines.transcripts import write_transcripts_from_documents

    root = tmp_path_factory.mktemp("convstats")
    tdir = root / "transcripts"
    tdir.mkdir()
    write_transcripts_from_documents(SF, str(tdir))
    idir = str(root / "index")
    build_index(str(tdir), idir, IndexConfig())
    return idir


def _con():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def test_conv_stats_matches_duckdb(ray_session):
    from rayse.ops.convstats import CONV_STATS_SQL, conv_stats

    got = conv_stats(SF).to_pandas()
    want = _con().execute(CONV_STATS_SQL).fetchdf().astype(
        got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 500
    # derivation invariants: alternating roles, 40-word turns
    assert (got["n_user"] == (got["n_turns"] + 1) // 2).all()
    assert (got["duration_us"] == (got["n_turns"] - 1) * 1000).all()
    assert got["max_turn_words"].max() <= 40


def test_conv_keywords_matches_duckdb(ray_session, sf_index):
    from rayse.ops.convstats import conv_keywords, conv_keywords_sql

    got = conv_keywords(sf_index).to_pandas()
    want = _con().execute(conv_keywords_sql()).fetchdf().astype(
        got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    # every conversation with any kept token contributes <= 3 rows
    assert got.groupby("conv_id").size().max() <= 3
    assert (got["score_q"] > 0).all()


def test_conv_keywords_join_route_identical(ray_session, sf_index):
    """broadcast_max=0 forces the hash-join df attachment; both routes
    must be byte-identical."""
    from rayse.ops.convstats import conv_keywords

    a = conv_keywords(sf_index).to_pandas()
    b = conv_keywords(sf_index, broadcast_max=0).to_pandas()
    pd.testing.assert_frame_equal(a, b)
