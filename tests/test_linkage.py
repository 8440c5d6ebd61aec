"""Fellegi-Sunter linkage scoring: DuckDB bit-exact match at sf0.001
plus exact-rational and pattern-monotonicity invariants."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def test_fs_matches_duckdb(ray_session, con):
    from rayse.ops.linkage import fs_scores, fs_scores_sql

    got = fs_scores(SF).to_pandas()
    want = con.execute(fs_scores_sql()).fetchdf()
    a = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = (want.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_fs_pattern_scores_exact():
    """Pattern scores equal the Fraction-evaluated rational floored at
    the scale, and full agreement scores strictly above any pattern
    with one extra disagreement."""
    from fractions import Fraction

    from rayse.ops.linkage import (FIELDS, FS_SCALE, M_DEN, M_NUM,
                                   _pattern_scores)

    n = 100
    u_num = {"lang": 3000, "source": 700, "len_bkt": 450}
    scores = _pattern_scores(n, u_num)
    n2 = n * n
    for pat in range(8):
        r = Fraction(FS_SCALE)
        for i, f in enumerate(FIELDS):
            if (pat >> i) & 1:
                r *= Fraction(M_NUM * n2, M_DEN * u_num[f])
            else:
                r *= Fraction(n2, M_DEN * (n2 - u_num[f]))
        assert scores[pat] == int(r)
    full = scores[7]
    for miss in (3, 5, 6):     # one field flipped to disagree
        assert scores[miss] < full


def test_fs_agreement_bits(ray_session):
    """agree_* bits are consistent with a direct field lookup for a
    sample of pairs."""
    import pyarrow.parquet as pq

    from rayse.ops.linkage import fs_scores

    df = fs_scores(SF).to_pandas().head(50)
    docs = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"]).to_pandas()
    docs["len_bkt"] = docs["n_chars"] // 16
    m = docs.set_index("doc_id")
    for _, row in df.iterrows():
        fa, fb = m.loc[row["doc_a"]], m.loc[row["doc_b"]]
        assert row["agree_lang"] == int(fa["lang"] == fb["lang"])
        assert row["agree_source"] == int(fa["source"] == fb["source"])
        assert row["agree_len"] == int(fa["len_bkt"] == fb["len_bkt"])


def test_er_components_matches_duckdb(ray_session):
    """sf0.01 has nonzero all-agree SNM pairs; comp_id is the min node."""
    import duckdb as dd

    from rayse.ops.linkage import er_components, er_components_sql

    sf = "/root/testdata/sf0.01"
    c = dd.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{sf}/documents.parquet')")
    got = er_components(sf).to_pandas()
    want = c.execute(er_components_sql()).fetchdf()
    a = got.sort_values(["node"]).reset_index(drop=True)
    b = (want.sort_values(["node"]).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    if len(a):
        g = a.groupby("comp_id")["node"].min()
        assert (g.index == g.values).all()


def test_levenshtein_row_vectorized_exact():
    from rayse.ops.editdist import levenshtein_np

    cases = [("kitten", "sitting", 3), ("", "abc", 3), ("abc", "", 3),
             ("abc", "abc", 0), ("abcdef", "abXdYf", 2),
             ("flaw", "lawn", 2), ("intention", "execution", 5)]
    for a, b, d in cases:
        assert levenshtein_np(a, b) == d
        assert levenshtein_np(b, a) == d
    # cap early-out returns cap+1 when exceeded
    assert levenshtein_np("a" * 50, "b" * 50, cap=7) == 8


def test_editdist_pairs_matches_duckdb(ray_session):
    import duckdb as dd

    from rayse.ops.editdist import editdist_pairs, editdist_pairs_sql

    c = dd.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    got = editdist_pairs(SF).to_pandas()
    want = c.execute(editdist_pairs_sql()).fetchdf()
    a = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = (want.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
