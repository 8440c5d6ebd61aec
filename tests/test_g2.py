import pandas as pd


def test_g2_matches_duckdb(ray_session):
    import duckdb

    from rayse.ops.textstats import g2_collocations, g2_collocations_sql

    sf = "/root/testdata/sf0.001"
    got = (g2_collocations(sf).to_pandas()
           .sort_values(["word_a", "word_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.execute(g2_collocations_sql()).fetchdf()
            .sort_values(["word_a", "word_b"]).reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_g2_known_table(ray_session):
    # hand-checked 2x2: n=100 docs, df_a=20, df_b=10, df_ab=8
    import math

    import numpy as np
    import pyarrow as pa
    import ray

    from rayse.ops.textstats import _g2_finish_fn

    vocab = np.array(["alpha", "beta"], dtype=object)
    dfv = np.array([20, 10], dtype=np.int64)
    ref = ray.put((vocab, dfv, 100))
    batch = pa.table({"word_a": ["alpha"], "word_b": ["beta"],
                      "df_ab": pa.array([8], pa.int64())})
    out = _g2_finish_fn(ref, 1)(batch).to_pandas()

    def term(k, r, c, n=100.0):
        return k * math.log(k * n / (r * c)) if k > 0 else 0.0

    # k22 = n - df_a - df_b + df_ab = 100 - 20 - 10 + 8 = 78
    want = ((term(8, 20, 10) + term(12, 20, 90))
            + term(2, 80, 10)) + term(78, 80, 90)
    assert out["g2_q"][0] == math.floor(want * 2.0 * 1e6)
    assert out["g2_q"][0] > 0          # positive association
