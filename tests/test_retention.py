"""Retention cohort triangle vs the DuckDB distinct-user-week oracle,
plus a hand-built corpus with known cohort structure."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _oracle(events_path: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{events_path}')")
    return con.execute(sql).fetchdf()


def test_retention_matches_duckdb(ray_session):
    from rayse.ops.retention import retention_counts, retention_counts_sql

    got = retention_counts(SF).to_pandas()
    want = _oracle(f"{SF}/events.parquet", retention_counts_sql())
    key = ["cohort_week", "week_offset"]
    a = got.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    assert (got["week_offset"] >= 0).all()
    # every cohort has an offset-0 row (the cohorting week itself)
    zero = set(got.loc[got.week_offset == 0, "cohort_week"])
    assert set(got.cohort_week) == zero


def test_retention_known_cohorts(ray_session, tmp_path):
    """u1: weeks 0,1,3 (cohort 0, offsets 0/1/3); u2: weeks 1,1 dup
    (cohort 1, offset 0 once); u3: week 0 only."""
    from rayse.ops.retention import WEEK_US, retention_counts

    rows = [(1, 0), (1, 1), (1, 3), (2, 1), (2, 1), (3, 0)]
    ts = np.array([w * (WEEK_US // 1) + 1234 for _, w in rows], np.int64)
    tbl = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    d = tmp_path / "ret"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    got = retention_counts(str(d)).to_pandas()
    got = got.set_index(["cohort_week", "week_offset"])["n_users"]
    assert got.loc[(0, 0)] == 2            # u1 + u3
    assert got.loc[(0, 1)] == 1            # u1
    assert got.loc[(0, 3)] == 1            # u1
    assert got.loc[(1, 0)] == 1            # u2, dup week counted once
    assert len(got) == 4
