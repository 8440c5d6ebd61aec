"""Interval coverage, Pareto frontier, and frequent-pair tests:
DuckDB bit-exact match at sf0.001 plus semantic invariants (combiner
correctness, dominance, touching-interval merge)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "lineitem"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(got, want, keys):
    a = got.sort_values(keys).reset_index(drop=True)
    b = (want.sort_values(keys).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    return len(a)


def test_interval_coverage_matches_duckdb(ray_session, con):
    from rayse.ops.intervals import INTERVAL_COVERAGE_SQL, interval_coverage

    n = _cmp(interval_coverage(SF).to_pandas(),
             con.execute(INTERVAL_COVERAGE_SQL).fetchdf(), ["user_id"])
    assert n > 0


def test_interval_touching_merges():
    """[0,10) and [10,20) merge (s > pmax is strict); [0,10)+[11,20)
    stay two islands."""
    from rayse.ops.intervals import _coverage_partition

    def run(starts, eids):
        # ts in us since epoch; duration = ((eid % 3600) + 60) s
        t = pa.table({
            "user_id": pa.array([1] * len(starts), pa.int64()),
            "event_id": pa.array(eids, pa.int64()),
            "ts": pa.array(
                np.array(starts, dtype="datetime64[us]"),
                pa.timestamp("us")),
        })
        return _coverage_partition(t).to_pydict()

    # eid 0 -> 60 s duration. starts at 0 and 60 s: touching -> 1 island
    out = run([0, 60_000_000], [0, 0])
    assert out["n_islands"] == [1]
    assert out["covered_us"] == [120_000_000]
    # starts at 0 and 61 s: gap of 1 s -> 2 islands
    out = run([0, 61_000_000], [0, 0])
    assert out["n_islands"] == [2]
    assert out["covered_us"] == [120_000_000]
    assert out["max_island_us"] == [60_000_000]


def test_interval_user_isolation():
    """Adjacent users' intervals never merge across the base-offset
    boundary (including the chunked path)."""
    from rayse.ops import intervals
    from rayse.ops.intervals import _coverage_partition

    t = pa.table({
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "event_id": pa.array([0, 0, 0], pa.int64()),
        "ts": pa.array(np.array([0, 0, 0], dtype="datetime64[us]"),
                       pa.timestamp("us")),
    })
    out = _coverage_partition(t).to_pydict()
    assert out["user_id"] == [1, 2, 3]
    assert out["n_islands"] == [1, 1, 1]


def test_pareto_matches_duckdb(ray_session, con):
    from rayse.ops.skyline import PARETO_FRONTIER_SQL, pareto_frontier

    n = _cmp(pareto_frontier(SF).to_pandas(),
             con.execute(PARETO_FRONTIER_SQL).fetchdf(),
             ["price_q", "qty", "l_orderkey", "l_linenumber"])
    assert n > 0


def test_pareto_no_survivor_dominated(ray_session):
    from rayse.ops.skyline import pareto_frontier

    df = pareto_frontier(SF).to_pandas()
    p = df["price_q"].to_numpy()
    q = df["qty"].to_numpy()
    for i in range(len(df)):
        dom = ((p <= p[i]) & (q >= q[i])
               & ((p < p[i]) | (q > q[i])))
        assert not dom.any()


def test_pareto_combiner_exact():
    """Partial-frontier merge equals the one-shot frontier on a point
    set with duplicates and equal-price ties."""
    from rayse.ops.skyline import _frontier

    rng = np.random.RandomState(7)
    n = 500
    pq_ = rng.randint(0, 40, n).astype(np.int64)
    qt = rng.randint(0, 40, n).astype(np.int64)
    ok = np.arange(n, dtype=np.int64)
    ln = np.zeros(n, dtype=np.int64)

    whole = _frontier(ok, ln, pq_, qt)
    a = _frontier(ok[:250], ln[:250], pq_[:250], qt[:250])
    b = _frontier(ok[250:], ln[250:], pq_[250:], qt[250:])
    cat = tuple(np.concatenate([x, y]) for x, y in zip(a, b))
    merged = _frontier(cat[0], cat[1], cat[2], cat[3])
    for w, m in zip(whole, merged):
        assert np.array_equal(np.sort(w), np.sort(m))


def test_frequent_pairs_matches_duckdb(ray_session, con):
    from rayse.ops.basket import frequent_pairs, frequent_pairs_sql

    n = _cmp(frequent_pairs(SF).to_pandas(),
             con.execute(frequent_pairs_sql()).fetchdf(),
             ["support", "p1", "p2"])
    assert n > 0


def test_pair_generation_dedups_within_order():
    """A part repeated inside one order contributes each pair once."""
    from rayse.ops.basket import _pair_counts_partition

    t = pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([5, 5, 7, 5, 7], pa.int64()),
    })
    out = _pair_counts_partition(t).to_pydict()
    # one pair (5,7) with count 2 (orders 1 and 2)
    assert out["pair_key"] == [(5 << 32) | 7]
    assert out["cnt"] == [2]


def test_grouping_sets_matches_duckdb(ray_session):
    import duckdb as dd

    from rayse.ops.rollup import GROUPING_SETS_AGG_SQL, grouping_sets_agg

    c = dd.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    got = grouping_sets_agg(SF).to_pandas()
    want = c.execute(GROUPING_SETS_AGG_SQL).fetchdf()
    n = _cmp(got, want, ["event_type", "dow"])
    assert n > 0
    # the four sets are all present: (t,d), (t), (d), ()
    assert ((got["event_type"] == "") & (got["dow"] == -1)).sum() == 1


def test_assortativity_matches_duckdb(ray_session):
    import duckdb as dd

    from rayse.ops.graph import (degree_assortativity,
                                 degree_assortativity_sql)

    c = dd.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    got = degree_assortativity(SF).to_pandas()
    want = c.execute(degree_assortativity_sql()).fetchdf()
    n = _cmp(got, want, ["scope"])
    assert n == 1
    assert -10**9 <= got["r_q"].iloc[0] <= 10**9


def test_clustering_coeff_matches_duckdb(ray_session):
    import duckdb as dd

    from rayse.ops.triangles import CLUSTERING_COEFF_SQL, clustering_coeff

    c = dd.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    got = clustering_coeff(SF).to_pandas()
    want = c.execute(CLUSTERING_COEFF_SQL).fetchdf()
    n = _cmp(got, want, ["node"])
    assert n > 0
    # coefficient is a fraction of neighbor pairs: in [0, 1e6]
    assert got["coeff_ppm"].between(0, 10**6).all()


def test_qpp_post_matches_duckdb(ray_session):
    """Post-retrieval WIG/NQC vs the composed oracle at sf0.001
    (requires a built Porter index via the entry cache)."""
    import duckdb as dd

    import __ray_entry__ as e
    from rayse.ops.qpp import qpp_post, qpp_post_sql

    c = dd.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    got = qpp_post(e._index_for(SF)).to_pandas()
    want = c.execute(qpp_post_sql()).fetchdf()
    n = _cmp(got, want, ["query", "metric"])
    assert n > 0
    assert set(got["metric"]) == {"wig", "nqc"}


def test_reciprocity_matches_duckdb(ray_session):
    import duckdb as dd

    from rayse.ops.graph import edge_reciprocity, edge_reciprocity_sql

    c = dd.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    got = edge_reciprocity(SF).to_pandas()
    want = c.execute(edge_reciprocity_sql()).fetchdf()
    n = _cmp(got, want, ["scope"])
    assert n == 1
    assert 0 <= got["recip_ppm"].iloc[0] <= 10**6


def test_gini_matches_duckdb(ray_session):
    import duckdb as dd

    from rayse.ops.gini import GINI_SKEW_SQL, gini_skew

    c = dd.connect()
    for t in ("events", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    got = gini_skew(SF).to_pandas()
    want = c.execute(GINI_SKEW_SQL).fetchdf()
    n = _cmp(got, want, ["scope"])
    assert n == 2
    assert got["gini_ppm"].between(0, 10**6).all()


def test_gini_hist_identity():
    """Histogram rank-sum equals the direct sorted formula, including
    heavy ties; uniform sizes give G = 0."""
    from rayse.ops.gini import GINI_SCALE, _gini_from_hist

    rng = np.random.RandomState(3)
    x = rng.randint(1, 20, 200).astype(np.int64)
    uk, cnt = np.unique(x, return_counts=True)
    n, g = _gini_from_hist(uk, cnt.astype(np.int64))
    xs = np.sort(x)
    s0 = int(xs.sum())
    s1 = int((np.arange(1, x.size + 1) * xs).sum())
    want = ((2 * s1 - (x.size + 1) * s0) * GINI_SCALE) // (x.size * s0)
    assert (n, g) == (x.size, want)
    n, g = _gini_from_hist(np.array([7], np.int64),
                           np.array([50], np.int64))
    assert g == 0


def test_interval_salted_equals_unsalted(ray_session):
    from rayse.ops.intervals import interval_coverage

    a = (interval_coverage(SF, salted=True).to_pandas()
         .sort_values("user_id").reset_index(drop=True))
    b = (interval_coverage(SF, salted=False).to_pandas()
         .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_interval_salted_hot_user(ray_session, tmp_path):
    """One user holding every event across many day-buckets: the salted
    route must equal the whole-user route (and the brute-force merge),
    including chains that cross bucket boundaries."""
    import pyarrow.parquet as pq

    from rayse.ops.intervals import (DUR_BASE_S, DUR_MOD, _US,
                                     interval_coverage)

    rng = np.random.RandomState(11)
    n = 5000
    # spread over ~12 days with clumps near bucket edges
    day = 86_400_000_000
    ts = np.sort(rng.randint(0, 12 * day, n).astype(np.int64))
    # force some events right at bucket boundaries (overhang chains)
    ts[:200] = (np.arange(200) % 12) * day - 30 * _US \
        + np.arange(200) * _US
    ts = np.abs(np.sort(ts))
    eid = rng.randint(0, 100000, n).astype(np.int64)
    t = pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(np.ones(n, np.int64), pa.int64()),
    })
    d = tmp_path / "hot"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))

    a = interval_coverage(str(d), salted=True).to_pandas()
    b = interval_coverage(str(d), salted=False).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True))
    # brute force islands
    s = ts
    e = s + ((eid % DUR_MOD) + DUR_BASE_S) * _US
    order = np.lexsort((e, s))
    s, e = s[order], e[order]
    cov = 0
    n_isl = 0
    mx = 0
    cur_s, cur_e = None, None
    for i in range(n):
        if cur_e is None or s[i] > cur_e:
            if cur_e is not None:
                cov += cur_e - cur_s
                mx = max(mx, cur_e - cur_s)
            n_isl += 1
            cur_s, cur_e = s[i], e[i]
        else:
            cur_e = max(cur_e, e[i])
    cov += cur_e - cur_s
    mx = max(mx, cur_e - cur_s)
    assert a["n_islands"].iloc[0] == n_isl
    assert a["covered_us"].iloc[0] == cov
    assert a["max_island_us"].iloc[0] == mx


def test_grep_counts_matches_duckdb(ray_session):
    import duckdb as dd

    from rayse.ops.textstats import grep_counts, grep_counts_sql

    c = dd.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    got = grep_counts(SF).to_pandas()
    want = c.execute(grep_counts_sql()).fetchdf()
    n = _cmp(got, want, ["needle"])
    assert n > 0
    assert (got["n_occurrences"] >= got["n_docs"]).all()


def test_key_set_ops_matches_duckdb(ray_session):
    import duckdb as dd

    from rayse.ops.relational import KEY_SET_OPS_SQL, key_set_ops

    c = dd.connect()
    for t in ("events", "customer"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    got = key_set_ops(SF).to_pandas()
    want = c.execute(KEY_SET_OPS_SQL).fetchdf()
    n = _cmp(got, want, ["scope"])
    assert n == 3


def test_cli_diagnose(ray_session, capsys):
    """The diagnose subcommand prints one JSON row per output row for
    every kind."""
    import json as js

    from rayse.cli import main

    for kind in ("skew", "bursts", "seasonality", "dup", "hapax"):
        rc = main(["diagnose", "--input", SF, "--kind", kind])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert out and all(js.loads(line) for line in out)
