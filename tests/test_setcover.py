"""Multi-round greedy set cover on a synthetic corpus where no single
document covers the vocabulary — exercises the carried-state rounds
(the sf corpora saturate in one pick) — vs the DuckDB oracle and a
hand-computed greedy."""
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path) -> str:
    texts = [
        "a b c d",        # 4 new -> picked first (ties: lowest id)
        "a b c e",        # then 1 new at best
        "f g h",          # 3 new -> picked second
        "e i",            # 2 new -> third
        "i j",            # j remains -> fourth
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path),
                                     "documents.parquet"))
    return str(tmp_path)


def test_multi_round_cover(ray_session, tmp_path):
    from rayse.ops.setcover import greedy_set_cover, \
        greedy_set_cover_sql

    sf = _write_docs(tmp_path)
    got = greedy_set_cover(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(greedy_set_cover_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype(got.dtypes.to_dict())[got.columns]
        .reset_index(drop=True))
    assert len(got) == 4
    assert got.doc_id.tolist() == [0, 2, 3, 4]
    assert got.newly_covered.tolist() == [4, 3, 2, 1]
    assert int(got.total_covered.iloc[-1]) == 10
