"""Session-8 batch 4: perceptual dHash, edge churn, checksum diff —
DuckDB bit-exact plus behavioural invariants (dHash locality, churn
conservation, diff precision)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(got, want, keys):
    a = got.sort_values(keys).reset_index(drop=True)
    b = (want.sort_values(keys).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    return len(a)


def test_dhash_matches_duckdb(ray_session, con):
    from rayse.ops.multimodal import (media_dhash_from_documents,
                                      media_dhash_sql)

    n = _cmp(media_dhash_from_documents(SF).to_pandas(),
             con.execute(media_dhash_sql()).fetchdf(), ["media_id"])
    assert n > 0


def test_dhash_locality(ray_session):
    """A tiny edit moves few bits; unrelated payloads differ widely."""
    from rayse.ops.multimodal import dhash_batch

    base = "the quick brown fox jumps over the lazy dog " * 4
    tweak = base.replace("lazy", "hazy")
    other = "zzz 999 !!! ??? @@@ ### $$$ %%% ^^^ &&& *** ((( " * 4
    t = dhash_batch(pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([base.encode(), tweak.encode(),
                             other.encode()], pa.binary())}))
    h = dict(zip(t["media_id"].to_pylist(), t["dhash"].to_pylist()))
    d_close = bin(h[1] ^ h[2]).count("1")
    d_far = bin(h[1] ^ h[3]).count("1")
    assert d_close < d_far


def test_dhash_short_payload_skipped(ray_session):
    from rayse.ops.multimodal import dhash_batch

    t = dhash_batch(pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([b"short"], pa.binary())}))
    assert t.num_rows == 0


def test_edge_churn_matches_duckdb(ray_session, con):
    from rayse.ops.graph import edge_churn, edge_churn_sql

    got = edge_churn(SF).to_pandas()
    _cmp(got, con.execute(edge_churn_sql()).fetchdf(), ["metric"])
    m = got.set_index("metric")["v"]
    # conservation: distinct edges overall == stable + added + removed
    total = con.execute("""
        SELECT count(*) FROM (
          SELECT DISTINCT user_id,
                 CAST(json_extract(props, '$.k') AS BIGINT) % 200
          FROM events)""").fetchone()[0]
    assert m["stable"] + m["added"] + m["removed"] == total
    assert 0 <= m["jaccard_ppm"] <= 1_000_000


def test_checksum_diff_matches_duckdb(ray_session, con):
    from rayse.ops.integrity import checksum_diff, checksum_diff_sql

    got = checksum_diff(SF).to_pandas()
    _cmp(got, con.execute(checksum_diff_sql()).fetchdf(), ["pid"])
    # exactly the partitions holding a mutated doc differ
    from rayse.ops.integrity import CHECKSUM_PARTS, DIFF_MOD

    from rayse.ops.exchange import _mix

    ids = con.execute(
        f"SELECT doc_id FROM documents WHERE doc_id % {DIFF_MOD} = 0"
    ).fetchdf()["doc_id"].to_numpy().astype(np.uint64)
    want = set((_mix(ids) % np.uint64(CHECKSUM_PARTS)).astype(int))
    have = set(got[got["differs"] == 1]["pid"])
    assert have == want
