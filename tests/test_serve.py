"""Distributed serving == single-process engine (rank identity across the
actor fan-out; SURVEY.md ST2/J2)."""

import json
from pathlib import Path

import numpy as np
import pytest

QUERIES = json.loads((Path(__file__).parent / "queries.json").read_text())


@pytest.fixture(scope="module")
def cluster(ray_session, index_dir):
    from rayse.query.serve import SearchCluster

    c = SearchCluster(index_dir, pool_size=3)
    yield c
    c.shutdown()


def test_cluster_rank_identity(cluster, engine):
    for q in QUERIES[::3] + ['"rate limit exceeded"', "us uk eu war"]:
        cd, cs = cluster.search(q, 10)
        ed, es = engine.search(q, 10)
        assert [int(x) for x in cd] == [int(x) for x in ed], q
        np.testing.assert_allclose(cs, es, rtol=0, atol=1e-12, err_msg=q)


def test_cluster_search_many(cluster, engine):
    qs = QUERIES[:6]
    batch = cluster.search_many(qs, 10)
    for q, (cd, cs) in zip(qs, batch):
        ed, es = engine.search(q, 10)
        assert [int(x) for x in cd] == [int(x) for x in ed], q


def test_serving_role_identity(cluster, engine):
    """Distributed role-filtered/boosted search == single-process engine
    (role ops are partition-local, so the per-part merge stays exact).
    Reuses the module cluster — its 3 actors hold 3 of the session's 4
    CPUs, so a second pool would pend forever."""
    for q in ["table scan", "hash join merge"]:
        for kwargs in ({"role": "assistant"},
                       {"role_weights": {"assistant": 3.0, "user": 0.5}}):
            dd, ds_ = cluster.search(q, 10, **kwargs)
            ld, ls = engine.search(q, 10, **kwargs)
            assert [int(x) for x in dd] == [int(x) for x in ld], (q, kwargs)
            assert ds_.tolist() == ls.tolist(), (q, kwargs)
