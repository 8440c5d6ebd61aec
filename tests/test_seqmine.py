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


def test_salted_equals_unsalted(ray_session):
    from rayse.ops.seqmine import markov_transitions, top_paths

    a = markov_transitions(SF, salted=True).to_pandas()
    b = markov_transitions(SF, salted=False).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
    a = top_paths(SF, salted=True).to_pandas()
    b = top_paths(SF, salted=False).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_salted_hot_user_boundaries(ray_session, tmp_path):
    """One user, events clustered AT day-bucket boundaries (forcing
    cross-bucket windows), plus sparse buckets with gaps (forcing the
    next-NON-EMPTY-bucket jump): salted equals unsalted."""
    import pyarrow.parquet as pq

    from rayse.ops.seqmine import markov_transitions, top_paths

    rng = np.random.RandomState(5)
    day = 86_400_000_000
    n = 3000
    ts = []
    # clumps hugging each boundary of days 0..9, skipping days 4 and 7
    for d in [0, 1, 2, 3, 5, 6, 8, 9]:
        base = d * day
        ts.extend(base + day - np.arange(20, 0, -1) * 1_000_000)
        ts.extend(base + np.arange(1, 21) * 1_000_000)
    ts.extend(rng.randint(0, 10 * day, n - len(ts)))
    ts = np.sort(np.array(ts, dtype=np.int64))
    types = np.array(["a", "b", "c", "d"], dtype=object)[
        rng.randint(0, 4, ts.size)]
    t = pa.table({
        "event_id": pa.array(np.arange(ts.size, dtype=np.int64),
                             pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(np.ones(ts.size, np.int64), pa.int64()),
        "event_type": pa.array(types.tolist(), pa.string()),
    })
    d_ = tmp_path / "hotseq"
    d_.mkdir()
    pq.write_table(t, str(d_ / "events.parquet"))

    for fn in (markov_transitions, top_paths):
        a = fn(str(d_), salted=True).to_pandas()
        b = fn(str(d_), salted=False).to_pandas()
        pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                      b.reset_index(drop=True))
