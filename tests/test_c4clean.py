"""C4-style line cleaning: DuckDB parity on both join-back routes,
rule-level behavior on a hand-built corpus, batch-size invariance of the
line synthesis."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from rayse.ops.c4clean import (_doc_lines, _line_hash_partial,
                               boilerplate_clean, boilerplate_sql,
                               c4_clean, c4_clean_sql)

SF = "/root/testdata/sf0.001"


def _want():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return (con.execute(c4_clean_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))


def _norm(df):
    return df.sort_values("doc_id").reset_index(drop=True)


def test_c4_clean_matches_duckdb_broadcast(ray_session):
    got = _norm(c4_clean(SF).to_pandas())
    want = _want()
    assert 0 < len(got) < 500
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_c4_clean_matches_duckdb_exchange_route(ray_session):
    got = _norm(c4_clean(SF, broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(got, _want()[got.columns])


def test_doc_lines_rules():
    # doc 0: L=5. 11 words -> 2 full lines, ragged tail dropped;
    # second line contains 'dup' -> dropped.
    texts = ["a b c d e f g dup h i j",
             "one two three four five six"]          # doc 1: L=6, 1 line
    ids = np.asarray([0, 1], dtype=np.int64)
    buf, s, ln, ldoc, lno = _doc_lines(texts, ids)
    got = [bytes(buf[a:a + b].tobytes()).decode()
           for a, b in zip(s, ln)]
    assert got == ["a b c d e", "one two three four five six"]
    assert ldoc.tolist() == [0, 1] and lno.tolist() == [0, 0]


def test_line_hash_batchsize_invariant():
    texts = pa.table({
        "doc_id": pa.array(np.arange(20, dtype=np.int64)),
        "text": pa.array([f"w{i} x y z q r s t u v" for i in range(20)])})
    whole = _line_hash_partial(texts).to_pandas()
    parts = pd.concat([
        _line_hash_partial(texts.slice(0, 7)).to_pandas(),
        _line_hash_partial(texts.slice(7, 6)).to_pandas(),
        _line_hash_partial(texts.slice(13)).to_pandas()],
        ignore_index=True)
    pd.testing.assert_frame_equal(
        whole.sort_values(["doc_id", "line_no"]).reset_index(drop=True),
        parts.sort_values(["doc_id", "line_no"]).reset_index(drop=True))


def _want_boiler():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return (con.execute(boilerplate_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))


def test_boilerplate_matches_duckdb_broadcast(ray_session):
    got = _norm(boilerplate_clean(SF).to_pandas())
    want = _want_boiler()
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_boilerplate_matches_duckdb_exchange_route(ray_session):
    got = _norm(boilerplate_clean(SF, broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(got, _want_boiler()[got.columns])


def test_boilerplate_removes_all_occurrences_within_source(
        ray_session, tmp_path):
    # the template line appears in two docs of src_a -> removed from
    # BOTH (unlike c4 dedup, which keeps the first); the same line in
    # src_b appears once there -> kept. All doc_ids % 4 == 0 (L=5).
    tpl = "nav home about contact legal"
    docs = pa.table({
        "doc_id": pa.array([0, 4, 8], pa.int64()),
        "text": pa.array([
            " ".join([tpl, "a0 a1 a2 a3 a4"]),       # src_a, has tpl
            " ".join([tpl, "b0 b1 b2 b3 b4"]),       # src_a, has tpl
            " ".join([tpl, "c0 c1 c2 c3 c4"])]),     # src_b, has tpl
        "source": pa.array(["src_a", "src_a", "src_b"])})
    import pyarrow.parquet as pq
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (boilerplate_clean(str(tmp_path)).to_pandas()
           .set_index("doc_id")["text_out"].sort_index())
    assert list(out.index) == [0, 4, 8]
    assert out[0] == "a0 a1 a2 a3 a4"
    assert out[4] == "b0 b1 b2 b3 b4"
    assert out[8] == "\n".join([tpl, "c0 c1 c2 c3 c4"])


def test_global_dedup_keeps_first_occurrence(ray_session, tmp_path):
    # three docs, L=5 each (doc_id % 4 == 0); doc 8's line duplicates
    # doc 0's first line -> removed from doc 8 only; doc 4 is unrelated.
    line = "alpha beta gamma delta eps"
    other = ["k0 k1 k2 k3 k4", "k5 k6 k7 k8 k9", "m0 m1 m2 m3 m4"]
    docs = pa.table({
        "doc_id": pa.array([0, 4, 8], pa.int64()),
        "text": pa.array([
            " ".join([line] + other),                   # doc 0: 4 lines
            " ".join(["z0 z1 z2 z3 z4"] + other),       # doc 4: 4 lines
            " ".join([line] + other)])})                # doc 8: dup line
    import pyarrow.parquet as pq
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (c4_clean(str(tmp_path)).to_pandas()
           .set_index("doc_id")["text_out"])
    # the shared `other` lines occur in all three docs -> only doc 0's
    # occurrences survive; doc 4 keeps just its unique z-line (1 < 3 ->
    # doc filter drops it) and doc 8 keeps nothing.
    assert list(out.index) == [0]
    assert out[0] == "\n".join([line] + other)
