"""Range-merge join: cross-strategy equivalence with hash_join,
partition-count invariance, and the key-never-splits-ranges property
under heavy skew."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _frame(t):
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_smj_equals_hash_join_route(ray_session):
    from rayse.ops.mergejoin import (hj_order_priority_revenue,
                                     smj_order_priority_revenue)

    a = _frame(smj_order_priority_revenue(SF))
    b = _frame(hj_order_priority_revenue(SF))
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("n_parts", [1, 5])
def test_smj_invariant(ray_session, n_parts, monkeypatch):
    import rayse.ops.exchange as ex
    from rayse.ops.mergejoin import smj_order_priority_revenue

    base = _frame(smj_order_priority_revenue(SF))
    monkeypatch.setattr(ex, "default_parts", lambda: n_parts)
    got = _frame(smj_order_priority_revenue(SF))
    pd.testing.assert_frame_equal(base, got)


def test_smj_skewed_hot_key(ray_session):
    # one key holding ~90% of the left side must still join exactly
    import ray.data as rd

    from rayse.ops.mergejoin import merge_join

    rng = np.random.default_rng(5)
    n = 5000
    keys = np.where(rng.random(n) < 0.9, 7,
                    rng.integers(0, 1000, n)).astype(np.int64)
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(np.arange(n), pa.int64())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array(np.arange(0, 1000, dtype=np.int64), pa.int64()),
        "w": pa.array(np.arange(0, 1000, dtype=np.int64) * 10,
                      pa.int64())}))
    got = merge_join(left, right, "k", "rk", n_parts=8).to_pandas()
    assert len(got) == n            # every key has exactly one match
    assert (got["w"].to_numpy() == got["k"].to_numpy() * 10).all()


def test_bloom_no_false_negatives():
    # every inserted key must test positive (the join-correctness
    # contract; false positives are allowed, negatives are not)
    import numpy as np

    from rayse.ops.mergejoin import (BLOOMJ_BITS_LOG2, BLOOMJ_K,
                                     _bloom_hashes)

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 1 << 50, 20000).astype(np.int64)
    bits = np.zeros(1 << (BLOOMJ_BITS_LOG2 - 6), np.uint64)
    for pos in _bloom_hashes(keys, BLOOMJ_K, BLOOMJ_BITS_LOG2):
        np.bitwise_or.at(
            bits, pos >> 6,
            np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
    member = np.ones(keys.size, bool)
    for pos in _bloom_hashes(keys, BLOOMJ_K, BLOOMJ_BITS_LOG2):
        member &= (bits[pos >> 6]
                   >> (pos.astype(np.uint64) & np.uint64(63))
                   & np.uint64(1)).astype(bool)
    assert member.all()
