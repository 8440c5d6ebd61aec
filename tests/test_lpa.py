"""Label-propagation communities: DuckDB unrolled-CTE oracle match plus
a hand-built structural case."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_lpa_matches_duckdb(ray_session):
    from rayse.ops.lpa import lpa_communities_events, lpa_communities_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    for iters in (1, 2, 4):
        got = lpa_communities_events(SF, iters=iters).to_pandas()
        want = con.execute(lpa_communities_sql(iters=iters)).fetchdf()
        a = got.sort_values("vertex").reset_index(drop=True)
        b = (want.sort_values("vertex").reset_index(drop=True)
             [list(a.columns)].astype(a.dtypes.to_dict()))
        pd.testing.assert_frame_equal(a, b)


def test_lpa_sharded_bit_identical(ray_session):
    """The no-driver-vertex-state route equals the dense route exactly —
    including on a hot-key graph (one vertex on most edges), the skew
    case the exchange must absorb."""
    import ray.data as rd

    from rayse.ops.lpa import (lpa_communities, lpa_communities_events,
                               lpa_communities_sharded,
                               lpa_communities_sharded_events)

    for iters in (1, 3):
        a = lpa_communities_events(SF, iters=iters).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        b = lpa_communities_sharded_events(SF, iters=iters).to_pandas() \
            .sort_values("vertex").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    # hot graph: star around vertex 0 + a triangle + a self-loop
    pairs = [(0, i) for i in range(1, 40)] + \
            [(100, 101), (101, 102), (102, 100), (7, 7)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in pairs], pa.int64()),
        "dst": pa.array([b for _, b in pairs], pa.int64()),
    }))
    a = lpa_communities(edges, iters=3).to_pandas() \
        .sort_values("vertex").reset_index(drop=True)
    b = lpa_communities_sharded(edges, iters=3).to_pandas() \
        .sort_values("vertex").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lpa_two_triangles(ray_session):
    """Disconnected triangles converge to their own minimum labels; a
    one-edge bridge renames but does not merge them (in-triangle votes
    outnumber the bridge 2:1 once labels consolidate)."""
    import ray.data as rd

    from rayse.ops.lpa import lpa_communities

    tri = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in tri], pa.int64()),
        "dst": pa.array([b for _, b in tri], pa.int64()),
    }))
    out = lpa_communities(edges, iters=4).to_pandas().set_index("vertex")
    assert set(out.loc[[0, 1, 2], "community"]) == {0}
    assert set(out.loc[[10, 11, 12], "community"]) == {10}

    # bridged: the communities SURVIVE the bridge (count dominance) —
    # the right triangle merely renames to the leaked bridge label 2
    bridged = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in tri] + [2], pa.int64()),
        "dst": pa.array([b for _, b in tri] + [10], pa.int64()),
    }))
    out = lpa_communities(bridged, iters=8).to_pandas().set_index("vertex")
    assert set(out.loc[[0, 1, 2], "community"]) == {0}
    assert set(out.loc[[10, 11, 12], "community"]) == {2}


def test_lpa_isolated_self_loop(ray_session):
    """A vertex whose only edge is a self-loop keeps its own label."""
    import ray.data as rd

    from rayse.ops.lpa import lpa_communities

    edges = rd.from_arrow(pa.table({
        "src": pa.array([5, 1], pa.int64()),
        "dst": pa.array([5, 2], pa.int64()),
    }))
    out = lpa_communities(edges, iters=3).to_pandas().set_index("vertex")
    assert out.at[5, "community"] == 5
    # the isolated 1-2 pair exhibits the classic synchronous-LPA
    # two-cycle: odd iteration counts swap the labels, even restore
    assert out.at[1, "community"] == 2 and out.at[2, "community"] == 1
    out = lpa_communities(edges, iters=4).to_pandas().set_index("vertex")
    assert out.at[1, "community"] == 1 and out.at[2, "community"] == 2
