"""Vocabulary growth curve and random projection: DuckDB bit-exact
match at sf0.001 plus semantic invariants."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(got, want, keys):
    a = got.sort_values(keys).reset_index(drop=True)
    b = (want.sort_values(keys).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    return len(a)


def test_vocab_growth_matches_duckdb(ray_session, con):
    from rayse.ops.vocabgrowth import vocab_growth, vocab_growth_sql

    got = vocab_growth(SF).to_pandas()
    n = _cmp(got, con.execute(vocab_growth_sql()).fetchdf(), ["k"])
    assert n > 0
    # monotone non-decreasing in k; last point covers the whole corpus
    v = got.sort_values("k")["vocab"].to_numpy()
    assert (np.diff(v) >= 0).all()


def test_vocab_growth_full_corpus_point(ray_session, con):
    from rayse.ops.vocabgrowth import vocab_growth

    got = vocab_growth(SF).to_pandas().sort_values("k")
    total = con.execute(
        "SELECT count(DISTINCT t) FROM documents, "
        "UNNEST(string_split(text,' ')) u(t) WHERE t <> ''"
    ).fetchone()[0]
    assert got["vocab"].iloc[-1] == total


def test_randproj_matches_duckdb(ray_session, con):
    from rayse.ops.randproj import random_projection, random_projection_sql

    got = random_projection(SF).to_pandas()
    n = _cmp(got, con.execute(random_projection_sql()).fetchdf(),
             ["vec_id", "out_dim"])
    assert n > 0


def test_randproj_sign_matrix_deterministic():
    """Sign matrix is +-1, stable across calls, and ~balanced."""
    from rayse.ops.randproj import OUT_DIMS, _sign_matrix

    s1, s2 = _sign_matrix(64), _sign_matrix(64)
    assert np.array_equal(s1, s2)
    assert s1.shape == (OUT_DIMS, 64)
    assert set(np.unique(s1)) == {-1, 1}
    frac = (s1 == 1).mean()
    assert 0.3 < frac < 0.7


def test_rake_matches_duckdb(ray_session, con):
    from rayse.ops.rake import rake_phrases, rake_phrases_sql

    n = _cmp(rake_phrases(SF).to_pandas(),
             con.execute(rake_phrases_sql()).fetchdf(),
             ["score_q", "phrase"])
    assert n > 0


def test_rake_islands_and_cap():
    """Stopwords break phrases; islands cap at MAX_PHRASE_LEN words;
    duplicate words inside one phrase count per occurrence."""
    from rayse.ops.rake import MAX_PHRASE_LEN, _doc_phrases

    phrases, lens = _doc_phrases(
        ["fast merge the quick sort quick sort batch scan extra"])
    # 'the' splits; second island truncates to MAX_PHRASE_LEN
    assert phrases[0] == ["fast", "merge"]
    assert lens[0] == 2
    assert phrases[1] == ["quick", "sort", "quick", "sort"]
    assert lens[1] == MAX_PHRASE_LEN


def test_dedup_report_matches_duckdb(ray_session, con):
    from rayse.ops.dedupreport import DEDUP_REPORT_SQL, dedup_report

    n = _cmp(dedup_report(SF).to_pandas(),
             con.execute(DEDUP_REPORT_SQL).fetchdf(), ["source"])
    assert n > 0


def test_dedup_report_partition_counts():
    """Cross-source duplicate groups count for every involved source;
    singleton hashes never count."""
    import pyarrow as pa

    from rayse.ops.dedupreport import _dup_partition

    t = pa.table({"h": pa.array([1, 1, 2, 3, 3, 3], pa.int64()),
                  "source": pa.array(["a", "b", "a", "c", "c", "a"],
                                     pa.string())})
    out = _dup_partition(t).to_pydict()
    assert out == {"source": ["a", "b", "c"], "n_dup": [2, 1, 2]}


def test_hapax_matches_duckdb(ray_session, con):
    from rayse.ops.vocabgrowth import HAPAX_RATIO_SQL, hapax_ratio

    n = _cmp(hapax_ratio(SF).to_pandas(),
             con.execute(HAPAX_RATIO_SQL).fetchdf(), ["source"])
    assert n > 0
