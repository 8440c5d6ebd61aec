"""Block-max pruned scoring == exhaustive scoring, exactly (the scale-path
guarantee: pruning uses true upper bounds with strict comparisons)."""

import json
from pathlib import Path

import numpy as np

from rayse.query.parser import parse_query
from rayse.query.wand import regular_blockmax

QUERIES = json.loads((Path(__file__).parent / "queries.json").read_text())


def test_blockmax_identity_on_query_set(engine):
    for q in QUERIES:
        pq_ = parse_query(q)
        if pq_.kind != "regular" or not pq_.terms:
            continue
        ed, es = engine.regular(pq_.terms, 10)
        bd, bs = regular_blockmax(engine, pq_.terms, 10)
        assert [int(x) for x in bd] == [int(x) for x in ed], q
        np.testing.assert_allclose(bs, es, rtol=0, atol=1e-12, err_msg=q)


def test_blockmax_via_search_mode(engine):
    ed, es = engine.search("flazo basnacle sokidi", 10)
    bd, bs = engine.search("flazo basnacle sokidi", 10, mode="blockmax")
    assert [int(x) for x in bd] == [int(x) for x in ed]
    np.testing.assert_allclose(bs, es, rtol=0, atol=1e-12)


def test_blockmax_many_terms_prunes(engine):
    """A wide disjunction (hot + rare terms) exercises the probe phase and
    the accumulator prune; results must still be identical."""
    terms = tuple(sorted(engine.reader.vocabulary()))[:40]
    ed, es = engine.regular(terms, 5)
    bd, bs = regular_blockmax(engine, terms, 5)
    assert [int(x) for x in bd] == [int(x) for x in ed]
    np.testing.assert_allclose(bs, es, rtol=0, atol=1e-12)
