"""Percolator (standing-query reverse search): DuckDB parity at
sf0.001, per-type semantics on crafted turns, the dense-mask capacity
guard, and consistency with the FORWARD phrase engine."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from rayse.ops.percolate import (PERCOLATE_QUERIES, PercolateStage,
                                 _prepare, percolate, percolate_sql)

SF = "/root/testdata/sf0.001"


def _stage(queries):
    vocab, specs = _prepare(queries)
    return PercolateStage(vocab, specs)


def _match(stage, text):
    t = pa.table({"conv_id": pa.array(["c0"], pa.string()),
                  "turn_idx": pa.array([0], pa.int32()),
                  "text": pa.array([text], pa.string())})
    return set(stage(t)["query_id"].to_pylist())


def test_percolate_matches_duckdb(ray_session):
    import __ray_entry__ as e

    got = (e._q_percolate(SF).to_pandas()
           .sort_values(["query_id", "conv_id", "turn_idx"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = (con.execute(percolate_sql()).fetchdf()
            .sort_values(["query_id", "conv_id", "turn_idx"])
            .reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns],
                                  check_dtype=False)


def test_and_or_not_semantics():
    st = _stage([("a", "AND", ("table scan",)),
                 ("o", "OR", ("table scan",)),
                 ("n", "NOT", ("table", "scan"))])
    assert _match(st, "table scan merge") == {"a", "o"}
    assert _match(st, "table merge") == {"o", "n"}
    assert _match(st, "scan merge") == {"o"}
    assert _match(st, "merge join") == set()


def test_phrase_requires_adjacency():
    st = _stage([("p", "PHRASE", ("hash join",)),
                 ("b", "AND", ("hash join",))])
    assert _match(st, "hash join merge") == {"p", "b"}
    # both words present but not adjacent: bag matches, phrase doesn't
    assert _match(st, "hash merge join") == {"b"}
    # stopword 'the' is dropped by the analyzer -> becomes adjacent
    assert _match(st, "hash the join") == {"p", "b"}


def test_oov_query_matches_nothing():
    st = _stage([("x", "AND", ("qqoovword",))])
    assert _match(st, "table scan merge join") == set()


def test_vocab_capacity_guard():
    qs = [(f"q{i}", "AND", (f"w{i}x",)) for i in range(65)]
    with pytest.raises(ValueError, match="<= 64"):
        _prepare(qs)


def test_percolate_agrees_with_forward_phrase_engine(ray_session):
    # every (phrase, turn) the forward positional engine reports must
    # be matched by the percolator's PHRASE standing query, and vice
    # versa — reverse search == forward search, per phrase.
    import os

    import __ray_entry__ as e
    from rayse.ops.porter_oracle import porter_phrase_matches

    idir = e._index_for(SF)
    fwd = porter_phrase_matches(idir, ["hash join"]).to_pandas()
    tdir = os.path.join(os.path.dirname(idir), "transcripts")
    rev = percolate(tdir, [("p", "PHRASE", ("hash join",))]).to_pandas()
    key = lambda df: set(zip(df["conv_id"], df["turn_idx"]))
    assert key(fwd) == key(rev)
