"""Partition-count invariance + brute-force pins for the session's
exchange ops: ROWS-frame moving sum, attribution, SCD-2, JW pairs."""
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _frame(t):
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_moving_sum_matches_bruteforce(ray_session):
    from rayse.ops.rowframe import FRAME, moving_sum_rows

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100).astype(np.int64)
    ev = ev.sort_values(["event_type", "tu", "event_id"]).reset_index(
        drop=True)
    want = {}
    for _, g in ev.groupby("event_type"):
        c = g["cents"].to_numpy()
        cs = np.concatenate(([0], np.cumsum(c)))
        hi = np.arange(1, len(c) + 1)
        lo = np.maximum(0, hi - FRAME)
        ms = cs[hi] - cs[lo]
        for eid, v in zip(g["event_id"], ms):
            want[int(eid)] = int(v)
    got = moving_sum_rows(SF).to_pandas()
    assert len(got) == len(ev)
    assert all(want[int(e)] == int(v)
               for e, v in zip(got["event_id"], got["msum_cents"]))


@pytest.mark.parametrize("n_parts", [1, 7])
def test_moving_sum_invariant(ray_session, n_parts, monkeypatch):
    import rayse.ops.exchange as ex
    from rayse.ops.rowframe import moving_sum_rows

    base = _frame(moving_sum_rows(SF))
    monkeypatch.setattr(ex, "default_parts", lambda: n_parts)
    got = _frame(moving_sum_rows(SF))
    pd.testing.assert_frame_equal(base, got)


@pytest.mark.parametrize("n_parts", [1, 7])
def test_attribution_invariant(ray_session, n_parts, monkeypatch):
    import rayse.ops.exchange as ex
    from rayse.ops.attribution import attribution_counts

    base = _frame(attribution_counts(SF))
    monkeypatch.setattr(ex, "default_parts", lambda: n_parts)
    got = _frame(attribution_counts(SF))
    pd.testing.assert_frame_equal(base, got)


@pytest.mark.parametrize("n_parts", [1, 7])
def test_scd2_invariant(ray_session, n_parts, monkeypatch):
    import rayse.ops.exchange as ex
    from rayse.ops.scd import scd2_intervals

    base = _frame(scd2_intervals(SF))
    monkeypatch.setattr(ex, "default_parts", lambda: n_parts)
    got = _frame(scd2_intervals(SF))
    pd.testing.assert_frame_equal(base, got)


@pytest.mark.parametrize("n_parts", [1, 7])
def test_jw_pairs_invariant(ray_session, n_parts, monkeypatch):
    import rayse.ops.exchange as ex
    from rayse.ops.editdist import jw_name_pairs

    base = _frame(jw_name_pairs(SF))
    monkeypatch.setattr(ex, "default_parts", lambda: n_parts)
    got = _frame(jw_name_pairs(SF))
    pd.testing.assert_frame_equal(base, got)


@pytest.mark.parametrize("n_parts", [1, 7])
def test_max_concurrent_invariant(ray_session, n_parts, monkeypatch):
    import rayse.ops.exchange as ex
    from rayse.ops.sweepline import max_concurrent_sessions

    base = _frame(max_concurrent_sessions(SF))
    monkeypatch.setattr(ex, "default_parts", lambda: n_parts)
    got = _frame(max_concurrent_sessions(SF))
    pd.testing.assert_frame_equal(base, got)
