"""Distributed ordered window functions (row_number / lag-delta / running
sum per user) vs DuckDB window functions, pinned at sf0.001; plus a
single-user firehose skew case where every row shares one key and the
two-phase prefix scan must still be exact across its time buckets."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _cmp(got, want: pd.DataFrame, keys):
    got = got.to_pandas()
    assert sorted(got.columns) == sorted(want.columns)
    a = got.sort_values(keys).reset_index(drop=True)
    b = want.sort_values(keys).reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)


def _oracle(events_path: str) -> pd.DataFrame:
    from rayse.ops.winfuncs import WINDOW_FUNCTIONS_SQL

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{events_path}')")
    return con.execute(WINDOW_FUNCTIONS_SQL).fetchdf()


def test_window_functions_match_duckdb(ray_session):
    from rayse.ops.winfuncs import window_functions

    got = window_functions(SF)
    want = _oracle(f"{SF}/events.parquet")
    assert len(want) > 0
    _cmp(got, want, ["event_id"])


def test_window_functions_carry_heavy(ray_session):
    """One-hour buckets force nearly every group to need a carry row."""
    from rayse.ops.winfuncs import window_functions

    got = window_functions(SF, bucket_us=3_600_000_000)
    want = _oracle(f"{SF}/events.parquet")
    _cmp(got, want, ["event_id"])


def test_window_functions_single_user_skew(ray_session, tmp_path):
    """A single-user firehose spanning many buckets: no partition sees the
    whole user, yet rn / delta / cumsum stay exact across buckets."""
    from rayse.ops.winfuncs import window_functions

    rng = np.random.RandomState(7)
    n = 5_000
    base = np.int64(1_700_000_000_000_000)
    ts = base + np.sort(rng.randint(0, 40 * 86_400_000_000, n))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.full(n, 42, dtype=np.int64)),
        "event_type": pa.array(["t"] * n),
        "value": pa.array(rng.randn(n)),
        "props": pa.array(["{}"] * n),
    })
    d = tmp_path / "skew"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    got = window_functions(str(d)).to_pandas()
    want = _oracle(str(d / "events.parquet"))
    assert len(got) == n
    _cmp_df = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        _cmp_df[sorted(_cmp_df.columns)],
        want[sorted(want.columns)].astype(
            _cmp_df[sorted(_cmp_df.columns)].dtypes.to_dict()))
