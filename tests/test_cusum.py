import numpy as np
import pandas as pd


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    return con


def test_cusum_rows_matches_duckdb(ray_session):
    from rayse.ops.cusum import cusum_rows, cusum_rows_sql

    sf = "/root/testdata/sf0.001"
    got = (cusum_rows(sf).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    want = (_duck(sf).execute(cusum_rows_sql()).fetchdf()
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns])
    assert (got["cus_q"] >= 0).all()


def test_cusum_rows_bucket_invariance(ray_session):
    # the scan decomposition is exact for ANY bucket width
    from rayse.ops.cusum import cusum_rows

    sf = "/root/testdata/sf0.001"
    a = (cusum_rows(sf, bucket_us=86_400_000_000).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (cusum_rows(sf, bucket_us=3_600_000_000).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_cusum_alarms_matches_duckdb(ray_session):
    from rayse.ops.cusum import cusum_alarms, cusum_alarms_sql

    sf = "/root/testdata/sf0.001"
    got = (cusum_alarms(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    want = (_duck(sf).execute(cusum_alarms_sql()).fetchdf()
            .sort_values("event_type").reset_index(drop=True))
    assert (got["n_alarms"] > 0).any()         # non-degenerate
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_cusum_closed_form_equals_recurrence():
    # c_t = P_t - min(0, min P_j) == the max(0, c+d) recurrence
    rng = np.random.default_rng(3)
    d = rng.integers(-50, 45, 500)
    p = np.cumsum(d)
    closed = p - np.minimum(np.minimum.accumulate(p), 0)
    c, out = 0, []
    for x in d:
        c = max(0, c + int(x))
        out.append(c)
    assert (closed == np.array(out)).all()
