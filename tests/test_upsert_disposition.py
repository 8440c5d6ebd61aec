"""upsert_merge disposition coverage: a synthetic events table with
users present only in the snapshot half (kept), only in the change
half (inserted), and in both (updated) — compared against the DuckDB
oracle AND against hand-computed expectations."""
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_corpus(tmp_path) -> str:
    day = 86_400_000_000
    rows = [
        # user 1: snapshot only -> kept, last value 3.00
        (0, 1, 0 * day + 10, 1.00),
        (1, 1, 1 * day + 20, 3.00),
        # user 2: both halves -> updated, final 7.00
        (2, 2, 0 * day + 30, 2.00),
        (3, 2, 8 * day + 40, 7.00),
        # user 3: change half only -> inserted, 9.00
        (4, 3, 9 * day + 50, 9.00),
        # day-range anchors (user 2 active at both extremes)
        (5, 2, 0 * day + 5, 4.00),
        (6, 2, 9 * day + 60, 7.00),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(
            np.asarray([r[2] for r in rows], np.int64)
            .astype("datetime64[us]"), pa.timestamp("us")),
        "event_type": pa.array(["x"] * len(rows), pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf, "events.parquet"))
    return sf


def test_upsert_dispositions(ray_session, tmp_path):
    from rayse.ops.upsert import upsert_merge, upsert_merge_sql

    sf = _write_corpus(tmp_path)
    got = upsert_merge(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(upsert_merge_sql()).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype(got.dtypes.to_dict())[got.columns]
        .reset_index(drop=True))
    by_user = {int(r.user_id): (int(r.val_cents), r.src)
               for r in got.itertuples()}
    assert by_user[1] == (300, "kept")
    assert by_user[2] == (700, "updated")
    assert by_user[3] == (900, "inserted")
