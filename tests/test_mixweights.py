import math

import pandas as pd


def test_mix_weights_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.sampling import (source_mix_weights,
                                    source_mix_weights_sql)

    sf = "/root/testdata/sf0.001"
    got = (source_mix_weights(sf).to_pandas()
           .sort_values("source").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(source_mix_weights_sql()).fetchdf()
            .sort_values("source").reset_index(drop=True))
    assert len(got) > 1
    pd.testing.assert_frame_equal(got, want[got.columns])
    # weights are a (floor-truncated) distribution
    assert got["w_ppm"].sum() <= 1_000_000
    assert got["w_ppm"].sum() > 1_000_000 - len(got)


def test_isqrt_sql_exact_on_edges():
    import duckdb

    from rayse.ops.sampling import _isqrt_sql

    con = duckdb.connect()
    for n in [0, 1, 2, 3, 4, 15, 16, 17, 24, 25, 26,
              10**12 - 1, 10**12, (10**6 + 1) ** 2 - 1, (10**6 + 1) ** 2]:
        got = con.execute(f"SELECT {_isqrt_sql(str(n))}").fetchone()[0]
        assert got == math.isqrt(n), n
