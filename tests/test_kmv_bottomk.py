"""Bottom-k sampling, KMV distinct estimation, and gram novelty vs
DuckDB oracles, plus estimator-path semantics with k below the
vocabulary size."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def test_bottomk_sample_matches_duckdb(ray_session):
    from rayse.ops.sampling import bottomk_sample, bottomk_sample_sql

    got = bottomk_sample(SF, k=17).to_pandas()
    want = _con().execute(bottomk_sample_sql(k=17)).fetchdf()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = want.sort_values("doc_id").reset_index(drop=True)[list(a.columns)]
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    assert len(a) == 17


def test_bottomk_is_prefix_of_larger_k(ray_session):
    """Order statistics nest: the k=8 sample is a subset of k=32."""
    from rayse.ops.sampling import bottomk_sample

    small = set(bottomk_sample(SF, k=8).to_pandas()["doc_id"])
    large = set(bottomk_sample(SF, k=32).to_pandas()["doc_id"])
    assert small < large


def test_kmv_exact_path_matches_duckdb(ray_session):
    """Vocabulary below k: the sketch degrades to the exact count."""
    from rayse.ops.sketch import kmv_distinct_words, kmv_sql

    got = kmv_distinct_words(SF).to_pandas()
    want = _con().execute(kmv_sql()).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want[list(got.columns)].astype(got.dtypes.to_dict()))
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    vocab = {w for t in docs["text"].to_pylist() for w in t.split(" ")}
    assert int(got["est"].iloc[0]) == len(vocab)


def test_kmv_estimator_path(ray_session):
    """k below the vocabulary size exercises the order-statistics
    estimate: hash-match the SQL mirror and land within the sketch's
    ~1/sqrt(k) relative-error envelope (generous 3x margin)."""
    from rayse.ops.sketch import kmv_distinct_words, kmv_sql

    k = 16
    got = kmv_distinct_words(SF, k=k).to_pandas()
    want = _con().execute(kmv_sql(k=k)).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want[list(got.columns)].astype(got.dtypes.to_dict()))
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    true = len({w for t in docs["text"].to_pylist()
                for w in t.split(" ")})
    est = int(got["est"].iloc[0])
    assert abs(est - true) <= 3 * true / np.sqrt(k) + 2


def test_gram_novelty_matches_duckdb(ray_session):
    from rayse.ops.spandedup import gram_novelty, gram_novelty_sql

    got = gram_novelty(SF).to_pandas()
    want = _con().execute(gram_novelty_sql()).fetchdf()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = want.sort_values("doc_id").reset_index(drop=True)[list(a.columns)]
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    assert len(a) == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert (a["n_novel"] <= a["n_grams"]).all()
    assert ((a["novelty_ppm"] >= 0) & (a["novelty_ppm"] <= 1_000_000)).all()


def test_gram_novelty_complements_span_dedup(ray_session):
    """A gram occurrence is novel (count 1) or duplicated (count >= 2):
    per doc, n_novel + n_dup_grams == n_grams."""
    from rayse.ops.spandedup import gram_novelty, span_dedup_docs

    nov = gram_novelty(SF).to_pandas().set_index("doc_id")
    dup = span_dedup_docs(SF).to_pandas().set_index("doc_id")
    joined = nov.join(dup, how="left").fillna({"n_dup_grams": 0})
    assert (joined["n_novel"] + joined["n_dup_grams"]
            == joined["n_grams"]).all()
