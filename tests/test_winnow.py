"""Winnowing fingerprints: scalar-reference pin (incl. the rightmost
tie rule), DuckDB parity, and overlap-pair guarantee."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from rayse.ops.winnow import (_winnow_batch_rows, winnow_fingerprints,
                              winnow_fingerprints_sql,
                              winnow_overlap_pairs,
                              winnow_overlap_pairs_sql)

SF = "/root/testdata/sf0.001"


def _fnv(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _winnow_scalar(text: str, k: int, w: int) -> set:
    ws = text.split(" ")
    grams = ([" ".join(ws)] if len(ws) < k
             else [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)])
    h = [_fnv(g) for g in grams]
    m = len(h)
    L = min(w, m)
    out = set()
    for j in range(m - L + 1):
        win = h[j:j + L]
        mn = min(win)
        out.add((mn, j + max(i for i, v in enumerate(win) if v == mn)))
    return out


def test_winnow_batch_matches_scalar():
    texts = ["a b c d e f g h i j k l",
             "x y",                                  # short: one gram
             "a b c d a b c d a b c d",              # periodic (ties!)
             ""]
    batch = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                      "text": pa.array(texts)})
    rows = _winnow_batch_rows(batch, 4, 5).to_pandas()
    for d, t in enumerate(texts):
        got = set(zip(rows[rows.doc_id == d].fp.astype("uint64").tolist(),
                      rows[rows.doc_id == d].pos.tolist()))
        assert got == _winnow_scalar(t, 4, 5), d


def test_winnow_fingerprints_matches_duckdb(ray_session):
    got = (winnow_fingerprints(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = (con.execute(winnow_fingerprints_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 500
    pd.testing.assert_frame_equal(got, want[got.columns]
                                  .astype(got.dtypes.to_dict()))


def test_winnow_overlap_matches_duckdb(ray_session):
    got = (winnow_overlap_pairs(SF).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = (con.execute(winnow_overlap_pairs_sql()).fetchdf()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns]
                                  .astype(got.dtypes.to_dict()))


def test_winnow_guarantee_shared_substring(ray_session, tmp_path):
    """The winnowing theorem: a shared run of >= w + k - 1 words must
    yield at least one shared fingerprint -> the pair is detected."""
    import pyarrow.parquet as pq

    shared = " ".join(f"s{i}" for i in range(4 + 5 - 1 + 3))  # > w+k-1
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([f"p q r {shared} z1 z2",
                          f"m n {shared} y1 y2 y3"])})
    pq.write_table(docs, tmp_path / "documents.parquet")
    pairs = winnow_overlap_pairs(str(tmp_path), min_shared=1).to_pandas()
    assert [(1, 2)] == list(zip(pairs.doc_a, pairs.doc_b))
