"""Hybrid retrieval: integer reciprocal-rank fusion of the Porter and
whitespace engines vs the composed DuckDB oracle, pinned at sf0.001
(the driver re-checks at sf0.01 through the ws_rank_matrix arm)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def both_indexes(ray_session, tmp_path_factory):
    from rayse.config import IndexConfig
    from rayse.pipelines.build_index import build_index
    from rayse.pipelines.transcripts import write_transcripts_from_documents

    root = tmp_path_factory.mktemp("fusion")
    tdir = root / "transcripts"
    tdir.mkdir()
    write_transcripts_from_documents(SF, str(tdir))
    pdir, wdir = str(root / "porter"), str(root / "ws")
    build_index(str(tdir), pdir, IndexConfig())
    build_index(str(tdir), wdir, IndexConfig(analyzer="whitespace"))
    return pdir, wdir


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def _cmp(got, want: pd.DataFrame, keys):
    got = got.to_pandas()
    assert sorted(got.columns) == sorted(want.columns)
    a = got.sort_values(keys).reset_index(drop=True)
    b = want.sort_values(keys).reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)


def test_rrf_fusion_matches_duckdb(both_indexes, con):
    from rayse.ops.fusion import rrf_fusion, rrf_fusion_sql

    pdir, wdir = both_indexes
    got = rrf_fusion(pdir, wdir)
    want = con.execute(rrf_fusion_sql()).fetchdf()
    assert len(want) > 0
    _cmp(got, want, ["query", "rank"])


def test_rrf_fuses_both_systems(both_indexes):
    """A fused score must exceed any single-system contribution ceiling
    for at least one doc (i.e. both lists actually participate), and
    every fused doc appears in at least one system's pool."""
    from rayse.ops.fusion import RRF_K, RRF_SCALE, rrf_fusion

    pdir, wdir = both_indexes
    t = rrf_fusion(pdir, wdir).to_pandas()
    assert len(t) > 0
    single_max = RRF_SCALE // (RRF_K + 1)
    assert (t["score_q"] > single_max).any()
    assert (t["score_q"] <= 2 * single_max).all()


def test_rank_eval_matches_duckdb(both_indexes, con):
    """DCG/IDCG/MRR integers vs the composed-oracle + discount-table
    SQL; sanity: dcg <= idcg, idcg equals the full-judgment ideal when
    all judged docs exist, and mrr is the reciprocal of the first hit."""
    from rayse.ops.rankeval import (DISCOUNTS, MRR_SCALE, REL_TOP,
                                    rank_eval, rank_eval_sql)

    pdir, wdir = both_indexes
    got = rank_eval(pdir, wdir)
    want = con.execute(rank_eval_sql()).fetchdf()
    assert len(want) > 0
    _cmp(got, want, ["query"])
    df = got.to_pandas()
    assert (df.dcg_q <= df.idcg_q).all()
    full_ideal = sum((REL_TOP - i) * DISCOUNTS[i + 1]
                     for i in range(REL_TOP))
    assert (df.idcg_q == full_ideal).all()
    for _, r in df.iterrows():
        if r.first_rel_rank > 0:
            assert r.mrr_q == MRR_SCALE // r.first_rel_rank
        else:
            assert r.mrr_q == 0
    # the two engines must actually disagree somewhere (dcg < idcg for
    # at least one query), else the eval is vacuous
    assert (df.dcg_q < df.idcg_q).any()


def test_rbo_weights_exact():
    """Weights reproduce the closed-form identical-list RBO:
    (RBO_SCALE * sum w_d * d) // (p_den * D) == floor((1-p^k)*SCALE)."""
    from fractions import Fraction

    from rayse.ops.fusion import (RBO_DEPTH, RBO_P_DEN, RBO_P_NUM,
                                  RBO_SCALE, _rbo_weights)

    w, d_den = _rbo_weights(RBO_DEPTH)
    s = sum(wd * d for wd, d in zip(w, range(1, RBO_DEPTH + 1)))
    max_q = (RBO_SCALE * s) // (RBO_P_DEN * d_den)
    p = Fraction(RBO_P_NUM, RBO_P_DEN)
    assert max_q == int((1 - p ** RBO_DEPTH) * RBO_SCALE)


def test_rbo_matches_duckdb(both_indexes, con):
    from rayse.ops.fusion import rbo_agreement, rbo_agreement_sql

    pdir, wdir = both_indexes
    got = rbo_agreement(pdir, wdir)
    want = con.execute(rbo_agreement_sql()).fetchdf()
    assert len(want) > 0
    _cmp(got, want, ["query"])


def test_rbo_bounds(both_indexes):
    from fractions import Fraction

    from rayse.ops.fusion import (RBO_DEPTH, RBO_P_DEN, RBO_P_NUM,
                                  RBO_SCALE, rbo_agreement)

    pdir, wdir = both_indexes
    df = rbo_agreement(pdir, wdir).to_pandas()
    p = Fraction(RBO_P_NUM, RBO_P_DEN)
    cap = int((1 - p ** RBO_DEPTH) * RBO_SCALE)
    assert df["rbo_q"].between(0, cap).all()
