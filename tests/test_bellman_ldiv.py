"""Session-8 batch 7: Bellman-Ford weighted SSSP and l-diversity —
DuckDB bit-exact plus semantics (triangle relaxation, BFS consistency,
diversity monotonicity)."""

import duckdb
import pandas as pd
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


def test_bellman_matches_duckdb(ray_session, con):
    from rayse.ops.graph import bellman_ford, bellman_ford_sql

    n = _cmp(bellman_ford(SF).to_pandas(),
             con.execute(bellman_ford_sql()).fetchdf(), ["vertex"])
    assert n > 1


def test_bellman_dominated_by_hops(ray_session):
    """Weighted distance >= hop count (weights >= 1), over the same
    reachable set at equal round/hop budgets."""
    from rayse.ops.graph import bellman_ford, bfs_hops_events

    bf = bellman_ford(SF, rounds=16).to_pandas().set_index("vertex")
    bfs = bfs_hops_events(SF, max_hops=16).to_pandas().set_index(
        "vertex")
    assert set(bf.index) == set(bfs.index)
    assert (bf["dist"] >= bfs.loc[bf.index, "hop"]).all()


def test_bellman_converged_is_fixed_point(ray_session):
    """Once converged, more rounds change nothing."""
    from rayse.ops.graph import bellman_ford

    a = bellman_ford(SF, rounds=12).to_pandas()
    b = bellman_ford(SF, rounds=16).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_ldiv_matches_duckdb(ray_session, con):
    from rayse.ops.datachecks import l_diversity, l_diversity_sql

    got = l_diversity(SF).to_pandas()
    n = _cmp(got, con.execute(l_diversity_sql()).fetchdf(), ["hour"])
    assert n == 24


def test_ldiv_monotone_in_ell(ray_session):
    from rayse.ops.datachecks import l_diversity

    t2 = l_diversity(SF, ell=2).to_pandas().set_index("hour")
    t5 = l_diversity(SF, ell=5).to_pandas().set_index("hour")
    assert (t5["n_undiverse"] >= t2["n_undiverse"]).all()
    assert (t5["rows_at_risk"] >= t2["rows_at_risk"]).all()


def test_cli_audit(ray_session, capsys):
    """The audit subcommand prints one JSON row per output row for
    every kind."""
    import json as js

    from rayse.cli import main

    for kind in ("checks", "kanon", "ldiv", "checksum"):
        rc = main(["audit", "--input", SF, "--kind", kind])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert out and all(js.loads(line) is not None for line in out)
