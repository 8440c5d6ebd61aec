"""Post-processing operators: snippets (M9), proximity (A11), fallback
retrieval (A8), MMR rerank (A14), suggestions (M13), formatting/pagination
(M11/O2), role boost (A7), hydration (J4)."""

import numpy as np
import pytest

from rayse.query.parser import analyze_phrase
from rayse.query.postprocess import (
    format_result_text,
    make_phrase_snippet,
    make_snippet,
    mmr_rerank,
    paginate,
    proximity_bonus,
    role_boost,
    search_with_fallback,
    suggest_queries,
)


def test_snippet_highlights_and_windows():
    text = ("alpha " * 30) + "gradient descent here" + (" omega" * 30)
    snip = make_snippet(text, {"gradient"}, width=40)
    assert "<strong>gradient</strong>" in snip
    assert snip.startswith("...") and snip.endswith("...")
    assert len(snip) < len(text)


def test_snippet_no_match_prefix():
    text = "x " * 200
    snip = make_snippet(text, {"nomatch"}, width=50)
    assert snip.endswith("...") and len(snip) <= 104


def test_phrase_snippet_adjacency():
    text = "filler gradient word descent filler gradient descent target"
    snip = make_phrase_snippet(text, analyze_phrase("gradient descent"))
    # highlights the ADJACENT occurrence, not the separated one
    assert "<strong>gradient descent</strong>" in snip


def test_proximity_tiers():
    a = np.array([0, 100]); b = np.array([2])
    assert proximity_bonus([a, b]) == 2.0
    assert proximity_bonus([np.array([0]), np.array([8])]) == 1.0
    assert proximity_bonus([np.array([0]), np.array([40])]) == 0.5
    assert proximity_bonus([np.array([0]), np.array([400])]) == 0.0
    assert proximity_bonus([np.array([0])]) == 0.0


def test_fallback_ladder(engine, oracle):
    # all planted rare terms co-occur nowhere -> conjunctive empty -> ladder
    terms = ["zzrareterm00", "zzrareterm01"]
    stems = [t for t in terms]
    docs, scores, level = search_with_fallback(engine, stems, 10)
    assert level in ("half", "any")
    assert docs.size > 0
    # a single common term resolves at "all"
    d2, s2, level2 = search_with_fallback(engine, ["flazo"], 10)
    assert level2 == "all"
    od, os_ = oracle.conjunctive(["flazo"], 10)
    assert [int(x) for x in d2] == od


def test_mmr_rerank_diversity():
    rows = [
        {"doc_id": 1, "conv_id": "a", "text": "apple banana cherry", "score": 10.0},
        {"doc_id": 2, "conv_id": "a", "text": "apple banana cherry", "score": 9.9},
        {"doc_id": 3, "conv_id": "b", "text": "totally different words", "score": 5.0},
    ]
    out = mmr_rerank(rows, k=3)
    assert out[0]["doc_id"] == 1
    # the near-duplicate of doc 1 is pushed below the diverse doc 3
    assert [r["doc_id"] for r in out][1] == 3
    assert all("mmr_score" in r for r in out)


def test_suggest_queries():
    rows = [{"text": "tokenizer tokenizer tokenizer pipeline pipeline"}]
    out = suggest_queries("index", rows, n_terms=2)
    assert out and out[0] == "index tokenizer"
    assert all(s.startswith("index ") for s in out)


def test_format_and_paginate():
    long = ("Sentence one is here. " * 30).strip()
    out = format_result_text(long, max_chars=250, min_chars=200)
    assert len(out) <= 254 and out.endswith("...")
    rows = list(range(25))
    assert paginate(rows, 1, 10) == list(range(10))
    assert paginate(rows, 3, 10) == list(range(20, 25))
    assert paginate(rows, 4, 10) == []


def test_role_boost_ordering():
    s = role_boost(np.array([1.0, 1.0, 1.0, 1.0]),
                   ["system", "user", "tool", "assistant"])
    assert s[0] > s[1] > s[2] > s[3]


def test_hydrate_and_search_hydrated(engine, corpus_dir, index_dir):
    from rayse.pipelines.hydrate import hydrate

    docs, scores = engine.search("flazo", 5)
    tbl = hydrate(index_dir, corpus_dir, docs)
    assert tbl.num_rows == docs.size
    assert [int(x) for x in tbl["doc_id"].to_pylist()] == \
        [int(x) for x in docs]
    for i in range(tbl.num_rows):
        assert "flazo" in tbl["text"][i].as_py()

    rows = engine.search_hydrated("flazo", corpus_dir, k=5, page=1,
                                  page_size=3)
    assert len(rows) == 3
    assert all("<strong>flazo</strong>" in r["snippet"] for r in rows)
    assert rows[0]["score"] >= rows[1]["score"]


def test_idf_variant_v1(index_dir, oracle):
    import math

    from rayse.query.engine import SearchEngine

    eng = SearchEngine(index_dir, idf_variant="v1")
    t = "flazo"
    got = eng._idfs([t])[0]
    want = math.log10(oracle.n_docs / (oracle.df(t) + 1.0))
    assert got == pytest.approx(want, abs=1e-12)
