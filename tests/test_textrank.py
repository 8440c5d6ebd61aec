"""TextRank keyword extraction: DuckDB recursive-CTE parity, rank
differentiation, and mass conservation of the damped recursion."""

import duckdb
import numpy as np
import pandas as pd

from rayse.ops.textrank import (TEXTRANK_SCALE, textrank_keywords,
                                textrank_sql, textrank_vertices)

SF = "/root/testdata/sf0.001"


def _con():
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def test_textrank_matches_duckdb(ray_session):
    got = textrank_keywords(SF).to_pandas()
    got = got.sort_values("word").reset_index(drop=True)
    want = _con().execute(textrank_sql()).fetchdf()
    want = want.sort_values("word").reset_index(drop=True)
    assert len(got) > 10
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    # the weighted recursion differentiates (the unweighted graph over
    # this closed vocabulary is regular and would rank uniformly)
    assert got["rank_fp"].nunique() > len(got) // 2


def test_textrank_vertices_match_duckdb(ray_session):
    got = textrank_vertices(SF).to_pandas()
    got = got.sort_values("vertex").reset_index(drop=True)
    want = _con().execute(textrank_sql(final="vertex")).fetchdf()
    want = want.sort_values("vertex").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))
    # damped-mass sanity: total rank stays within the accumulated
    # per-edge floor loss of scale (≤ edges × iters quanta, ≪ 1%)
    total = int(got["rank_fp"].sum())
    assert 0.99 * TEXTRANK_SCALE <= total <= TEXTRANK_SCALE
