"""Whitespace-analyzer ranked retrieval vs DuckDB — the hash-matched oracle
for the flagship machinery (build pipeline + BM25 scoring + positional
phrase + role scope), pinned at sf0.001 (the driver re-checks at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ws_index(ray_session, tmp_path_factory):
    from rayse.config import IndexConfig
    from rayse.pipelines.build_index import build_index
    from rayse.pipelines.transcripts import write_transcripts_from_documents

    root = tmp_path_factory.mktemp("ws")
    tdir = root / "transcripts"
    tdir.mkdir()
    write_transcripts_from_documents(SF, str(tdir))
    idir = str(root / "index")
    build_index(str(tdir), idir, IndexConfig(analyzer="whitespace"))
    return idir


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def _cmp(got, want: pd.DataFrame, keys):
    got = got.to_pandas()
    assert sorted(got.columns) == sorted(want.columns)
    a = got.sort_values(keys).reset_index(drop=True)
    b = want.sort_values(keys).reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)


def test_ws_bm25_matches_duckdb(ws_index, con):
    from rayse.ops.ws_search import ws_bm25_sql, ws_bm25_topk

    got = ws_bm25_topk(ws_index)
    want = con.execute(ws_bm25_sql()).fetchdf()
    assert len(want) > 0
    _cmp(got, want, ["query", "rank"])


def test_ws_phrase_matches_duckdb(ws_index, con):
    from rayse.ops.ws_search import ws_phrase_matches, ws_phrase_sql

    got = ws_phrase_matches(ws_index)
    want = con.execute(ws_phrase_sql()).fetchdf()
    assert len(want) > 0
    _cmp(got, want, ["phrase", "conv_id", "turn_idx"])


def test_ws_role_matches_duckdb(ws_index, con):
    from rayse.ops.ws_search import ws_bm25_sql, ws_bm25_topk

    got = ws_bm25_topk(ws_index, role="assistant")
    want = con.execute(ws_bm25_sql(assistant_only=True)).fetchdf()
    assert len(want) > 0
    _cmp(got, want, ["query", "rank"])


def test_ws_term_stats_matches_duckdb(ws_index, con):
    from rayse.ops.ws_search import ws_term_stats, ws_term_stats_sql

    got = ws_term_stats(ws_index)
    want = con.execute(ws_term_stats_sql()).fetchdf()
    assert len(want) > 10   # word-soup corpus: ~31 distinct words
    _cmp(got, want, ["term"])


def test_ws_boolean_matches_duckdb(ws_index, con):
    from rayse.ops.ws_search import ws_boolean_sql, ws_boolean_topk

    got = ws_boolean_topk(ws_index)
    want = con.execute(ws_boolean_sql()).fetchdf()
    assert len(want) > 0
    assert got.num_rows > 0
    # all three set ops must actually produce rows on this corpus
    assert len(set(got["query"].to_pylist())) == 3
    _cmp(got, want, ["query", "rank"])


def test_ws_fallback_matches_duckdb(ws_index, con):
    from rayse.ops.ws_search import ws_fallback_sql, ws_fallback_topk

    got = ws_fallback_topk(ws_index)
    want = con.execute(ws_fallback_sql()).fetchdf()
    assert len(want) > 0
    # the three ladder tiers must all trigger on this corpus
    assert set(got["tier"].to_pylist()) == {"all", "half", "any"}
    _cmp(got, want, ["query", "rank"])


def test_ws_proximity_matches_duckdb(ws_index, con):
    """A11 tiered proximity bonus + BM25 through the positional index
    equals the SQL min-pairwise-distance oracle (quantized ranking)."""
    from rayse.ops.ws_search import ws_proximity_sql, ws_proximity_topk

    got = ws_proximity_topk(ws_index)
    want = con.execute(ws_proximity_sql()).fetchdf()
    assert len(want) > 0
    _cmp(got, want, ["query", "rank"])


def test_ws_proximity_bonus_changes_ranking(ws_index):
    """The bonus is live: at least one query's quantized scores differ
    from plain BM25 (the corpus co-locates query words within turns)."""
    from rayse.ops.ws_search import ws_bm25_topk, ws_proximity_topk

    plain = ws_bm25_topk(ws_index).to_pandas()
    prox = ws_proximity_topk(ws_index).to_pandas()
    assert not plain["score_q"].equals(prox["score_q"])


def test_ws_rank_matrix_matches_duckdb(ws_index, con):
    """The window-slot suite: all five ranked ws variants tagged and
    unioned must hash-match the tagged UNION ALL oracle."""
    from rayse.ops.ws_search import ws_rank_matrix, ws_rank_matrix_sql

    got = ws_rank_matrix(ws_index)
    want = con.execute(ws_rank_matrix_sql()).fetchdf()
    assert len(want) > 0
    assert set(want["variant"]) == {"bm25", "role", "boolean", "fallback",
                                    "proximity"}
    _cmp(got, want, ["variant", "query", "rank"])
