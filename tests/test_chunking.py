import pandas as pd


def test_chunking_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.chunking import chunk_documents, chunk_documents_sql

    sf = "/root/testdata/sf0.001"
    got = (chunk_documents(sf).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(chunk_documents_sql()).fetchdf()
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    assert len(got) > len(want["doc_id"].unique())   # docs do split
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_chunking_overlap_and_coverage(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayse.ops.chunking import chunk_documents

    words = [f"w{i}" for i in range(150)]
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [" ".join(words), "short text"],
    }), str(tmp_path / "documents.parquet"))
    got = (chunk_documents(str(tmp_path), size=64, stride=48)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]))
    d1 = got[got.doc_id == 1]
    # n=150: chunks at 0,48,96 -> 3 chunks; last = tokens 96..150 (54)
    assert list(d1["chunk_idx"]) == [0, 1, 2]
    assert list(d1["n_chunk_tokens"]) == [64, 64, 54]
    c0 = d1.iloc[0]["chunk_text"].split(" ")
    c1 = d1.iloc[1]["chunk_text"].split(" ")
    assert c0[48:] == c1[:16]                        # 16-token overlap
    # full coverage: union of chunks == original tokens
    seen = set()
    for _, r in d1.iterrows():
        s = r.chunk_idx * 48
        seen.update(range(s, s + r.n_chunk_tokens))
    assert seen == set(range(150))
    d2 = got[got.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0]["chunk_text"] == "short text"
