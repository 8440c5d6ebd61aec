import numpy as np
import pyarrow as pa


def test_candidate_batch_superset_bound():
    # pigeonhole: per batch at most k candidate rows (plus totals row)
    from rayse.ops.heavyhitters import _candidate_batch

    batch = pa.table({"doc_id": [1, 2],
                      "text": ["a a a b b c", "a b d e f g"]})
    out = _candidate_batch(batch, k=3)
    words = [w for w in out["word"].to_pylist() if w is not None]
    assert len(words) <= 3
    assert "a" in words          # 4/12 >= 1/3
    n_p = out["n_p"].to_pylist()[-1]
    assert n_p == 12


def test_frequent_words_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd

    from rayse.ops.heavyhitters import frequent_words, frequent_words_sql

    sf = "/root/testdata/sf0.001"
    got = (frequent_words(sf).to_pandas()
           .sort_values("word").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(frequent_words_sql()).fetchdf()
            .sort_values("word").reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_frequent_words_threshold_semantics(ray_session):
    # every returned word satisfies cf*k >= N; none below threshold
    import duckdb

    from rayse.ops.heavyhitters import HH_K, frequent_words

    sf = "/root/testdata/sf0.001"
    got = frequent_words(sf).to_pandas()
    con = duckdb.connect()
    n = con.execute(
        "SELECT count(*) FROM (SELECT u.t FROM "
        f"read_parquet('{sf}/documents.parquet'), "
        "UNNEST(string_split(text, ' ')) u(t))").fetchone()[0]
    assert (got["cf"].to_numpy() * HH_K >= n).all()
    assert (got["df"] <= got["cf"]).all()
