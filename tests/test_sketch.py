"""Streaming sketches (HLL distinct-count, Count-Min frequency):
DuckDB register-dump parity, merge semantics, and estimate quality."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from rayse.ops.sketch import (CM_DEPTH, CM_WIDTH, HLL_P, cm_estimates,
                              cm_registers, hll_distinct, hll_estimate_q,
                              hll_registers, sketch_suite,
                              sketch_suite_sql)

SF = "/root/testdata/sf0.001"


def _con():
    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{SF}/events.parquet')")
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{SF}/documents.parquet')")
    return c


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_sketch_suite_matches_duckdb(ray_session):
    got = _canon(sketch_suite(SF).to_pandas())
    want = _canon(_con().execute(sketch_suite_sql()).fetchdf())
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_hll_estimate_within_error(ray_session):
    true = _con().execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    est = hll_distinct(SF).to_pandas()
    est = int(est.loc[est["idx"] == -1, "value"].iloc[0])
    # 512 registers -> ~4.6% standard error; allow 4 sigma
    assert abs(est - true) <= max(5, 0.20 * true)


def test_hll_merge_equals_whole(ray_session):
    """max-merge of per-half register dumps == whole-corpus dump (the
    property that makes the sketch composable across shards/days)."""
    t = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])
    ids = t["user_id"].to_numpy()
    whole = hll_registers(SF).to_pandas()
    whole = dict(zip(whole["bucket"], whole[whole.columns[-1]]))

    import pyarrow as pa
    from rayse.ops import sketch as sk

    def regs_of(arr):
        h = sk._mix(arr.astype(np.uint64))
        sb = 64 - HLL_P
        bucket = (h >> np.uint64(sb)).astype(np.int64)
        rho = sb - sk._bit_length_u64(
            h & ((np.uint64(1) << np.uint64(sb)) - np.uint64(1))) + 1
        reg = np.zeros(1 << HLL_P, dtype=np.int64)
        np.maximum.at(reg, bucket, rho)
        return reg

    half = len(ids) // 2
    merged = np.maximum(regs_of(ids[:half]), regs_of(ids[half:]))
    got = {int(b): int(r) for b, r in enumerate(merged) if r > 0}
    assert got == {int(k): int(v) for k, v in whole.items()}


def test_cm_estimate_upper_bounds_truth(ray_session):
    truth = _con().execute(
        "SELECT event_type, count(*) AS n FROM events GROUP BY 1").fetchdf()
    from rayse.ops.sketch import _fnv_words

    h = _fnv_words(np.asarray(truth["event_type"].tolist(), dtype=object))
    key = (h >> np.uint64(1)).astype(np.int64)
    true_by_key = dict(zip(key.tolist(), truth["n"].tolist()))
    est = cm_estimates(SF).to_pandas()
    assert len(est) == len(truth)
    for idx, val in zip(est["idx"], est["value"]):
        assert val >= true_by_key[int(idx)]  # CM never underestimates
    # register mass conserved: every row of the table sums to N
    regs = cm_registers(SF).to_pandas()
    total = _con().execute("SELECT count(*) FROM events").fetchone()[0]
    cells = regs["cell"].to_numpy()
    sums = regs[regs.columns[-1]].to_numpy()
    for d in range(CM_DEPTH):
        row_mask = (cells // CM_WIDTH) == d
        assert sums[row_mask].sum() == total


def test_bloom_no_false_negatives(ray_session):
    """Every probe id actually present in the data must answer 1 (Bloom
    filters never miss a member); absent ids are allowed either way."""
    from rayse.ops.sketch import BLOOM_PROBES, bloom_probe

    present = set(
        _con().execute("SELECT DISTINCT user_id FROM events").df()
        ["user_id"].tolist())
    got = bloom_probe(SF).to_pandas()
    assert len(got) == BLOOM_PROBES
    for pid, val in zip(got["idx"], got["value"]):
        if int(pid) in present:
            assert val == 1
    # some probe must be a miss at this sf (ids 0..29 vs ~15 users)
    assert (got["value"] == 0).any()


def test_hll_by_type_estimates(ray_session):
    """Per-type distinct-user estimates stay within HLL error of truth
    and cover exactly the distinct types."""
    from rayse.ops.sketch import _TYPE_MOD, _fnv_words, hll_by_type

    truth = _con().execute(
        "SELECT event_type, count(DISTINCT user_id) AS n "
        "FROM events GROUP BY 1").fetchdf()
    h = _fnv_words(np.asarray(truth["event_type"].tolist(), dtype=object))
    gkeys = (h % np.uint64(_TYPE_MOD)).astype(np.int64)
    true_by_g = dict(zip(gkeys.tolist(), truth["n"].tolist()))
    _, est = hll_by_type(SF)
    est = est.to_pandas()
    assert set(est["idx"]) == set(true_by_g)
    for g, v in zip(est["idx"], est["value"]):
        t = true_by_g[int(g)]
        assert abs(int(v) - t) <= max(5, 0.20 * t)


def test_hll_window_matches_rescan(ray_session):
    """The trailing-window estimate from merged DAILY register dumps
    equals the estimate of a fresh sketch over the window's raw rows —
    the mergeability contract that lets a 100 TB pipeline keep only
    per-day dumps."""
    import pyarrow.parquet as pq
    from rayse.ops import sketch as sk

    t = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id"])
    day = (t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
           // sk.US_PER_DAY)
    ids = t["user_id"].to_numpy()
    _, win_est = sk.hll_daily_window(SF)
    win_est = win_est.to_pandas()
    sb = 64 - sk.HLL_P
    for d, v in list(zip(win_est["idx"], win_est["value"]))[:5]:
        sel = ids[(day >= d - sk.HLL_WINDOW_DAYS + 1) & (day <= d)]
        h = sk._mix(np.unique(sel).astype(np.uint64))
        rho = sb - sk._bit_length_u64(
            h & ((np.uint64(1) << np.uint64(sb)) - np.uint64(1))) + 1
        bucket = (h >> np.uint64(sb)).astype(np.int64)
        reg = np.zeros(1 << sk.HLL_P, dtype=np.int64)
        np.maximum.at(reg, bucket, rho)
        fresh = sk.hll_estimate_q(
            pd.DataFrame({"rho": reg[reg > 0]}))
        assert fresh == int(v)


def test_hll_estimate_exact_small(ray_session):
    """Linear-counting branch: tiny distinct set is counted exactly."""
    import pyarrow as pa

    regs = pd.DataFrame({"bucket": [], "rho": []})
    assert hll_estimate_q(regs) == 0


def test_exact_distinct_matches_duckdb(ray_session):
    """Exact grouped count-distinct vs the COUNT(DISTINCT) oracle, and
    the HLL estimate rows land within the standard-error envelope of
    the exact values (the sketch actually estimates THIS quantity)."""
    import duckdb
    import pandas as pd

    from rayse.ops.sketch import (HLL_P, exact_distinct_by_type,
                                  exact_distinct_sql, hll_by_type)

    got = exact_distinct_by_type(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(exact_distinct_sql()).fetchdf()
    a = got.sort_values("idx").reset_index(drop=True)
    b = want.sort_values("idx").reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    _, est = hll_by_type(SF)
    est = est.to_pandas().set_index("idx")["value"]
    exact = a.set_index("idx")["value"]
    rel = 3 * 1.04 / (1 << HLL_P) ** 0.5 + 0.15
    for k, v in exact.items():
        assert abs(est[k] - v) <= max(rel * v, 8), (k, est[k], v)
