"""Duplicate-span detection: brute-force pin on a hand corpus, DuckDB
hash-match at sf0.001, and self-repeat/min_count semantics."""

from collections import Counter

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from rayse.ops.spandedup import (_dup_agg_partition, _gram_partials_batch,
                                 duplicate_spans, duplicate_spans_sql,
                                 span_dedup_docs, span_dedup_docs_sql)

SF = "/root/testdata/sf0.001"


def _brute(texts, window, min_count):
    """gram text -> (n_docs, n_occ) for duplicated grams, by dict force."""
    occ = Counter()
    docs = {}
    for d, t in enumerate(texts):
        ws = t.split(" ")
        grams = ([" ".join(ws)] if len(ws) < window else
                 [" ".join(ws[j:j + window])
                  for j in range(len(ws) - window + 1)])
        for g in grams:
            occ[g] += 1
            docs.setdefault(g, set()).add(d)
    return {g: (len(docs[g]), c) for g, c in occ.items() if c >= min_count}


@pytest.mark.parametrize("window,min_count", [(2, 2), (3, 2), (2, 3)])
def test_partials_plus_agg_equal_brute_force(window, min_count):
    texts = [
        "a b c a b c a b",          # self-repeats within one doc
        "x y a b c z",              # cross-doc repeat of "a b c"
        "short",                    # < window -> whole-text gram
        "short",                    # duplicated whole-text gram
        "p q r s",
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    # single-batch path: partials ARE the full (hash, doc, occ) rows
    part = _gram_partials_batch(batch, window)
    got = _dup_agg_partition(part, min_count).to_pandas()
    want = _brute(texts, window, min_count)
    assert len(got) == len(want)
    assert sorted(zip(got["n_docs"], got["n_occ"])) == \
           sorted(want.values())


def test_duplicate_spans_matches_duckdb(ray_session):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = duplicate_spans(SF).to_pandas().sort_values("gram_hash")
    got = got.reset_index(drop=True)
    want = con.execute(duplicate_spans_sql()).fetchdf()
    want = want.sort_values("gram_hash").reset_index(drop=True)
    assert len(got) > 100        # rich duplicate set on the 31-word vocab
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))


def test_span_dedup_docs_matches_duckdb(ray_session):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = span_dedup_docs(SF).to_pandas().sort_values("doc_id")
    got = got.reset_index(drop=True)
    want = con.execute(span_dedup_docs_sql()).fetchdf()
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    # consistency: total flagged occurrences == sum over duplicated grams
    spans = duplicate_spans(SF).to_pandas()
    assert got["n_dup_grams"].sum() == spans["n_occ"].sum()


def test_contamination_matches_duckdb(ray_session):
    from rayse.ops.spandedup import contamination, contamination_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = contamination(SF).to_pandas().sort_values("doc_id")
    got = got.reset_index(drop=True)
    want = con.execute(contamination_sql()).fetchdf()
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    # benchmark docs themselves are never flagged
    import pyarrow.parquet as pq_

    bench = sorted(pq_.read_table(f"{SF}/documents.parquet",
                                  columns=["doc_id"])
                   ["doc_id"].to_pylist())[:5]
    assert not set(got["doc_id"]) & set(bench)


def test_unigram_nll_matches_duckdb(ray_session):
    from rayse.ops.textstats import unigram_nll, unigram_nll_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = unigram_nll(SF).to_pandas().sort_values("doc_id")
    got = got.reset_index(drop=True)
    want = con.execute(unigram_nll_sql()).fetchdf()
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 500
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    # sanity: all NLLs positive (probabilities < 1)
    assert (got["nll_q"] > 0).all()


def test_extent_merge_brute_force():
    """Maximal-extent semantics on a hand corpus: runs of adjacent
    duplicated grams merge; isolated hits stay single-gram spans."""
    from rayse.ops.spandedup import (_dup_pos_partition, _extent_partition,
                                     _gram_pos_batch)

    texts = [
        "a b c d e x y",     # "a b c d e" duplicated -> one maximal span
        "q a b c d e r",
        "u v w z1 z2 u v w", # self-repeat "u v w" (window 3): run of 1
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    rows = _gram_pos_batch(batch, 3)
    hits = _dup_pos_partition(rows, 2)
    got = _extent_partition(hits, 3).to_pandas()
    got = got.sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    # doc 0: grams (a b c),(b c d),(c d e) duplicated at pos 0..2 -> one
    # span tokens [0, 5); doc 1: same grams at pos 1..3 -> [1, 6);
    # doc 2: "u v w" at pos 0 and 5 -> two spans [0,3) and [5,8)
    want = pd.DataFrame({
        "doc_id": [0, 1, 2, 2],
        "span_start": [0, 1, 0, 5],
        "span_end": [5, 6, 3, 8],
        "n_grams": [3, 3, 1, 1],
    })
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_duplicate_span_extents_matches_duckdb(ray_session):
    from rayse.ops.spandedup import (duplicate_span_extents,
                                     duplicate_span_extents_sql)

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    keys = ["doc_id", "span_start"]
    got = duplicate_span_extents(SF).to_pandas().sort_values(keys)
    got = got.reset_index(drop=True)
    want = con.execute(duplicate_span_extents_sql()).fetchdf()
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    # extents are maximal: within a doc, consecutive spans' gram runs are
    # separated by at least one non-duplicated gram position (next start
    # > previous last gram start + 1, where last gram start = end - 4)
    for _, grp in got.groupby("doc_id"):
        s = grp.sort_values("span_start")
        starts = s["span_start"].to_numpy()[1:]
        prev_last_gram = s["span_end"].to_numpy()[:-1] - 4
        assert (starts > prev_last_gram + 1).all()


def test_unigram_nll_routed_path_bit_identical(ray_session):
    """vocab_broadcast_limit=0 forces the exchange-routed scoring join
    (the unbounded-vocabulary path); integer per-token quantization makes
    it bit-identical to the broadcast route."""
    from rayse.ops.textstats import unigram_nll

    broadcast = unigram_nll(SF).to_pandas().sort_values("doc_id")
    routed = unigram_nll(SF, vocab_broadcast_limit=0).to_pandas() \
        .sort_values("doc_id")
    pd.testing.assert_frame_equal(broadcast.reset_index(drop=True),
                                  routed.reset_index(drop=True))


def test_bigram_nll_matches_duckdb(ray_session):
    """Conditional-probability LM scoring: bigram q = floor(ln(cf2/cf1)
    * 1e9), integer per-doc sums — exact vs the SQL oracle."""
    from rayse.ops.textstats import bigram_nll, bigram_nll_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = bigram_nll(SF).to_pandas().sort_values("doc_id")
    got = got.reset_index(drop=True)
    want = con.execute(bigram_nll_sql()).fetchdf()
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 500
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    assert (got["nll2_q"] >= 0).all()


def test_bigram_nll_routed_path_bit_identical(ray_session):
    """q_broadcast_limit=0 forces the exchange-routed scoring join; the
    integer contract makes it bit-identical to the broadcast route."""
    from rayse.ops.textstats import bigram_nll

    broadcast = bigram_nll(SF).to_pandas().sort_values("doc_id")
    routed = bigram_nll(SF, q_broadcast_limit=0).to_pandas() \
        .sort_values("doc_id")
    pd.testing.assert_frame_equal(broadcast.reset_index(drop=True),
                                  routed.reset_index(drop=True))


def test_bigram_kernel_edge_cases():
    """The bigram extraction kernel: empty text, single-token docs (no
    bigrams), doc boundaries never produce cross-document bigrams."""
    from rayse.ops.textstats import _doc_bigram_arrays

    bi, nb, w1 = _doc_bigram_arrays(["a b c", "x", "", "p q"])
    assert nb.tolist() == [2, 1 - 1, 0, 1]
    assert bi.tolist() == ["a b", "b c", "p q"]
    assert w1.tolist() == ["a", "b", "p"]


def test_duplicate_char_extents_matches_duckdb(ray_session):
    """ExactSubstr at char granularity: k-char sliding grams through the
    same dedup pipeline, extents in char offsets — exact vs the
    substr + FNV oracle."""
    from rayse.ops.spandedup import (duplicate_char_extents,
                                     duplicate_char_extents_sql)

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = duplicate_char_extents(SF).to_pandas() \
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    want = con.execute(duplicate_char_extents_sql()).fetchdf() \
        .sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))


def test_char_extent_kernel_brute_force():
    """The char-gram extraction kernel on a hand corpus: offsets,
    short-doc whole-text gram, cross-doc duplication."""
    import pyarrow as pa

    from rayse.ops.spandedup import _char_gram_pos_batch

    batch = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["abcdef", "xbcdey", "ab"],
                                       pa.string())})
    t = _char_gram_pos_batch(batch, 4)
    by_doc = {}
    for d, p, h in zip(t["doc_id"].to_pylist(), t["pos"].to_pylist(),
                       t["gram_hash"].to_pylist()):
        by_doc.setdefault(d, []).append((p, h))
    assert [p for p, _ in by_doc[1]] == [0, 1, 2]       # abcd bcde cdef
    assert [p for p, _ in by_doc[3]] == [0]             # whole short text
    # "bcde" occurs in docs 1 and 2 at offset 1 -> equal hashes
    h1 = dict(by_doc[1])[1]
    h2 = dict(by_doc[2])[1]
    assert h1 == h2
    assert len({h for _, h in by_doc[1]}) == 3


def test_quality_buckets_matches_duckdb(ray_session):
    """CCNet head/middle/tail bucketing: integer cuts on the integer
    NLL — exact vs SQL, all three buckets populated at sf0.001."""
    from rayse.ops.textstats import quality_buckets, quality_buckets_sql

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    got = quality_buckets(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    want = con.execute(quality_buckets_sql()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 500
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    assert set(got["bucket"]) == {"head", "middle", "tail"}


def test_contamination_bloom_route_identical(ray_session):
    """The big-benchmark route (broadcast Bloom prefilter + exact
    confirmation through the co-partitioned hash join) is bit-identical
    to the broadcast-exact-set route — Bloom has no false negatives and
    false positives die in the join."""
    from rayse.ops.spandedup import contamination

    a = contamination(SF).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = contamination(SF, bench_broadcast_limit=0).to_pandas()
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b[a.columns].astype(
        a.dtypes.to_dict()))


def test_kn_bigram_nll_matches_duckdb(ray_session):
    """Interpolated Kneser-Ney bigram NLL vs the rational-CTE oracle;
    KN and raw-MLE bigram scores must disagree somewhere (the discount
    and continuation mass actually bite)."""
    import duckdb
    import pandas as pd

    from rayse.ops.textstats import (bigram_nll, kn_bigram_nll,
                                     kn_bigram_nll_sql)

    SF = "/root/testdata/sf0.001"
    got = kn_bigram_nll(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(kn_bigram_nll_sql()).fetchdf()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = want.sort_values("doc_id").reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    mle = bigram_nll(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert not (a["knll_q"].to_numpy()
                == mle["nll2_q"].to_numpy()).all()


def test_top_grams_matches_duckdb(ray_session):
    from rayse.ops.spandedup import top_grams, top_grams_sql

    got = top_grams(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(top_grams_sql()).fetchdf().reset_index(drop=True)
    assert len(got) == 20 and got["n_occ"].iloc[0] >= 2
    # rank order must be non-increasing in n_occ with hash tie-break
    assert (got["n_occ"].diff().dropna() <= 0).all()
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))


def test_top_grams_k_invariance(ray_session):
    """top-5 must be the prefix of top-20 (the per-partition cut never
    loses a global winner)."""
    from rayse.ops.spandedup import top_grams

    t20 = top_grams(SF, k=20).to_pandas()
    t5 = top_grams(SF, k=5).to_pandas()
    pd.testing.assert_frame_equal(t5.reset_index(drop=True),
                                  t20.head(5).reset_index(drop=True))
