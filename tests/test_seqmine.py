"""Sequence mining (Markov transitions, trigram paths): DuckDB
bit-exact match at sf0.001 plus adjacency-mask invariants."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    return c


def _cmp(got, want, keys):
    a = got.sort_values(keys).reset_index(drop=True)
    b = (want.sort_values(keys).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    return len(a)


def test_markov_matches_duckdb(ray_session, con):
    from rayse.ops.seqmine import MARKOV_TRANSITIONS_SQL, markov_transitions

    n = _cmp(markov_transitions(SF).to_pandas(),
             con.execute(MARKOV_TRANSITIONS_SQL).fetchdf(),
             ["prev_type", "next_type"])
    assert n > 0


def test_markov_probabilities_normalize(ray_session):
    """Per prev_type, sum(p_q) is within n_successors of the scale
    (floor loses < 1 per cell)."""
    from rayse.ops.seqmine import PROB_SCALE, markov_transitions

    df = markov_transitions(SF).to_pandas()
    g = df.groupby("prev_type").agg(s=("p_q", "sum"), n=("p_q", "size"))
    assert ((g["s"] <= PROB_SCALE) & (g["s"] > PROB_SCALE - g["n"])).all()


def test_paths_match_duckdb(ray_session, con):
    from rayse.ops.seqmine import top_paths, top_paths_sql

    n = _cmp(top_paths(SF).to_pandas(),
             con.execute(top_paths_sql()).fetchdf(),
             ["cnt", "t1", "t2", "t3"])
    assert n > 0


def test_adjacency_respects_user_boundaries():
    """Pairs never span two users; equal timestamps break ties by
    event_id."""
    from rayse.ops.seqmine import _SEP, _adjacency_partials

    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([10, 11, 12, 13], pa.int64()),
        "ts": pa.array(np.array([0, 0, 5, 5], dtype="datetime64[us]"),
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "c", "d"], pa.string()),
    })
    out = _adjacency_partials(t, 2).to_pydict()
    assert sorted(out["pattern"]) == [f"a{_SEP}b", f"c{_SEP}d"]
    assert out["cnt"] == [1, 1]
