"""Role(field)-scoped index stats — M6 parity with the reference's per-tag
posting stats (`Indexer/Entities/WordDocumentTag.java:8-43`, populated at
`IndexerService.java:185-200,275-301`) and A7 importance boost
(`IndexerService.java:263-331`): a transcript turn has exactly one role, so
the per-posting role code IS the field scope. Verified rank-identical
against the brute-force oracle, and bitwise-identical to unscoped search
when all weights are 1."""

import json
from pathlib import Path

import numpy as np

from rayse.query.parser import parse_query

QUERIES = json.loads((Path(__file__).parent / "queries.json").read_text())
ROLES = ["user", "assistant", "system", "tool"]


def test_role_filter_rank_identity(engine, oracle):
    for q in QUERIES:
        pq_ = parse_query(q)
        for role in ROLES:
            if pq_.kind == "regular":
                ed, es = engine.search(q, 10, role=role)
                od, os_ = oracle.regular_role(list(pq_.terms), 10, role=role)
            elif pq_.kind == "phrase":
                ed, es = engine.search(q, 10, role=role)
                od, os_ = oracle.phrase_role(list(pq_.phrase), 10, role=role)
            else:
                continue
            assert [int(x) for x in ed] == od, (q, role)
            np.testing.assert_allclose(es, os_, rtol=0, atol=1e-9,
                                       err_msg=f"{q} role={role}")


def test_role_weights_one_is_identity(engine):
    """All-1 weights multiply by exactly 1.0 -> bitwise-identical scores."""
    w = {r: 1.0 for r in ROLES}
    for q in QUERIES:
        if parse_query(q).kind == "boolean":
            continue
        # exhaustive mode: same accumulation order as the role path (the
        # block-max path is rank-identical but sums in a different order)
        d0, s0 = engine.search(q, 10, mode="exhaustive")
        d1, s1 = engine.search(q, 10, role_weights=w)
        assert [int(x) for x in d0] == [int(x) for x in d1], q
        assert s0.tolist() == s1.tolist(), q


def test_role_boost_rank_identity_vs_oracle(engine, oracle):
    w = {"assistant": 3.0, "user": 0.5, "system": 1.0, "tool": 2.0}
    for q in QUERIES:
        pq_ = parse_query(q)
        if pq_.kind != "regular":
            continue
        ed, es = engine.search(q, 10, role_weights=w)
        od, os_ = oracle.regular_role(list(pq_.terms), 10, role_weights=w)
        assert [int(x) for x in ed] == od, q
        np.testing.assert_allclose(es, os_, rtol=1e-12, err_msg=q)


def test_role_boost_promotes_role(engine, oracle):
    """An extreme boost puts that role's matching docs ahead of all others
    (whenever the role has matches at all)."""
    for q in QUERIES[:4]:
        pq_ = parse_query(q)
        if pq_.kind != "regular":
            continue
        filt, _ = engine.search(q, 5, role="assistant")
        if not filt.size:
            continue
        boosted, _ = engine.search(
            q, 5, role_weights={"assistant": 1e6})
        roles = engine._role_of_docs(boosted, list(pq_.terms))
        n_assist = min(5, filt.size)
        from rayse.index.segments import ROLE_CODES

        assert (roles[:n_assist] == ROLE_CODES["assistant"]).all(), q


def test_role_filter_matches_hydrated_roles(engine, corpus_dir):
    """Index-answered role filtering agrees with the hydrated role column
    (the round-1 gap: role was only available AFTER hydration)."""
    for q in QUERIES[:3]:
        if parse_query(q).kind != "regular":
            continue
        rows = []
        docs, _ = engine.search(q, 8, role="tool")
        if docs.size:
            from rayse.pipelines.hydrate import hydrate

            tbl = hydrate(engine.reader.index_dir, corpus_dir, docs)
            rows = tbl["role"].to_pylist()
        assert all(r == "tool" for r in rows)


def test_role_conjunctive_rank_identity(engine, oracle):
    """mode="and" + role scoping (round-2 ADVICE: previously the role path
    silently discarded mode and returned disjunctive results)."""
    w = {"assistant": 2.0, "user": 0.5}
    hit = 0
    for q in QUERIES:
        pq_ = parse_query(q)
        if pq_.kind != "regular" or len(pq_.terms) < 2:
            continue
        for role in (None, "assistant", "user"):
            ed, es = engine.search(q, 10, mode="and", role=role,
                                   role_weights=w)
            od, os_ = oracle.conjunctive_role(list(pq_.terms), 10,
                                              role=role, role_weights=w)
            assert [int(x) for x in ed] == od, (q, role)
            np.testing.assert_allclose(es, os_, rtol=1e-12,
                                       err_msg=f"{q} role={role}")
            hit += ed.size > 0
    assert hit > 0      # the fixture corpus exercises non-empty results


def test_role_rejects_unsupported_mode(engine):
    """Unsupported mode x role combinations raise instead of silently
    returning disjunctive results."""
    import pytest

    for mode in ("fallback", "capped"):
        with pytest.raises(ValueError, match="mode"):
            engine.search(QUERIES[0], 10, mode=mode, role="assistant")
        with pytest.raises(ValueError, match="mode"):
            engine.search(QUERIES[0], 10, mode=mode,
                          role_weights={"user": 2.0})
