"""Naive Bayes classifier + source-KL divergence vs DuckDB oracles,
plus semantic pins (NB brute-force replay; KL non-negativity and the
identical-slice zero property)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def test_nb_classify_matches_duckdb(ray_session):
    from rayse.ops.classify import nb_classify, nb_classify_sql

    got = nb_classify(SF).to_pandas()
    want = _con().execute(nb_classify_sql()).fetchdf()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = want.sort_values("doc_id").reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    # margins are non-negative by construction (best minus runner-up)
    assert (a["margin_q"] >= 0).all()


def test_nb_classify_exchange_route_bit_identical(ray_session):
    """vocab_broadcast_limit=0 forces the whash-exchange scoring route
    (no driver vocab at any point); it must be bit-identical to the
    broadcast route — integer sums of identically-quantized q values."""
    from rayse.ops.classify import nb_classify

    a = nb_classify(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = nb_classify(SF, vocab_broadcast_limit=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)[list(a.columns)]
    pd.testing.assert_frame_equal(a, b)


def test_nb_classify_brute_force(ray_session):
    """Replay the add-1 NB math in plain floats per document; the
    quantized argmax must agree wherever the float margin is clear."""
    from rayse.ops.classify import nb_classify

    got = nb_classify(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "text"]).to_pandas()
    toks = docs["text"].str.split(" ")
    vocab = sorted({w for t in toks for w in t})
    classes = sorted(docs["lang"].unique())
    V, widx = len(vocab), {w: i for i, w in enumerate(vocab)}
    cnt = {c: np.zeros(V) for c in classes}
    for lang, t in zip(docs["lang"], toks):
        for w in t:
            cnt[lang][widx[w]] += 1
    n = len(docs)
    logp = {c: np.log((cnt[c] + 1) / (cnt[c].sum() + V)) for c in classes}
    prior = {c: np.log((docs["lang"] == c).sum() / n) for c in classes}
    for doc_id, t in zip(docs["doc_id"], toks):
        s = {c: prior[c] + sum(logp[c][widx[w]] for w in t)
             for c in classes}
        best = min(classes, key=lambda c: (-s[c], c))
        runner = min((c for c in classes if c != best),
                     key=lambda c: (-s[c], c))
        if (s[best] - s[runner]) * 1e9 > 10:   # clear of quantization
            assert got.loc[doc_id, "pred"] == best, doc_id


def test_source_kl_matches_duckdb(ray_session):
    from rayse.ops.classify import source_kl, source_kl_sql

    got = source_kl(SF).to_pandas()
    want = _con().execute(source_kl_sql()).fetchdf()
    a = got.sort_values("source").reset_index(drop=True)
    b = want.sort_values("source").reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 1
    # KL >= 0 up to quantization (each term floors by < 1e-9 nat)
    assert (a["kl_q"] > -len(a)).all()


def test_source_kl_single_slice_is_zeroish(ray_session, tmp_path):
    """One slice == the corpus: KL(P_s || P) == 0 up to quantization
    (|kl_q| bounded by ~1 per vocab word / (T+V))."""
    import pyarrow as pa

    from rayse.ops.classify import source_kl

    docs = pq.read_table(f"{SF}/documents.parquet")
    one = docs.set_column(
        docs.schema.get_field_index("source"), "source",
        pa.array(["only"] * docs.num_rows, pa.string()))
    d = tmp_path / "one"
    d.mkdir()
    pq.write_table(one, d / "documents.parquet")
    got = source_kl(str(d)).to_pandas()
    assert list(got["source"]) == ["only"]
    assert abs(int(got["kl_q"].iloc[0])) <= 1


def test_nb_eval_matches_duckdb(ray_session):
    from rayse.ops.classify import nb_eval, nb_eval_sql

    con = _con()
    got = nb_eval(SF).to_pandas()
    want = con.execute(nb_eval_sql()).fetchdf()
    a = got.sort_values(["lang", "pred", "bucket"]).reset_index(drop=True)
    b = (want.sort_values(["lang", "pred", "bucket"])
         .reset_index(drop=True)[list(a.columns)]
         .astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    # confusion marginals cover the corpus exactly once
    total = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert a["n"].sum() == total


def test_ct_langid_matches_duckdb(ray_session):
    from rayse.ops.ctlangid import ct_langid, ct_langid_sql

    con = _con()
    got = ct_langid(SF).to_pandas()
    want = con.execute(ct_langid_sql()).fetchdf()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = (want.sort_values("doc_id").reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)


def test_ct_profile_rules():
    """Top-profile picks by (count desc, trigram asc); ranks 1-based;
    out-of-profile penalty dominates max in-profile displacement."""
    import numpy as np

    from rayse.ops.ctlangid import PROFILE_N, _top_profile

    g = np.asarray(["abc", "abd", "abe"], dtype=object)
    c = np.asarray([5, 5, 9])
    assert _top_profile(g, c, 2) == ["abe", "abc"]
    assert PROFILE_N >= 2
