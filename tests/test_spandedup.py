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
