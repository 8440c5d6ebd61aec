"""Rank statistics (rankstats.py) pinned against brute-force numpy
references over the same parquet — average-tie ranks, pairwise tau-b,
tie-corrected H."""
import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _events():
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["ts", "event_type", "value"])
    x = np.floor(t["value"].to_numpy(zero_copy_only=False)
                 * 100.0).astype(np.int64)
    ts = t["ts"].to_numpy(zero_copy_only=False)
    h = (ts.astype("datetime64[h]").astype(np.int64) % 24)
    g = np.asarray(t["event_type"].to_pylist(), dtype=object)
    return x, h, g


def _avg_ranks(v: np.ndarray) -> np.ndarray:
    order = np.argsort(v, kind="stable")
    ranks = np.empty(v.size, dtype=np.float64)
    sv = v[order]
    i = 0
    r = 1
    while i < v.size:
        j = i
        while j < v.size and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (r + r + (j - i) - 1) / 2.0
        r += j - i
        i = j
    return ranks


def test_spearman_matches_bruteforce():
    from rayse.ops.rankstats import spearman_value_hour

    x, h, _ = _events()
    rx, rh = _avg_ranks(x), _avg_ranks(h.astype(np.int64))
    want = np.corrcoef(rx, rh)[0, 1]
    got = spearman_value_hour(SF)
    assert got.num_rows == 1
    assert int(got["n"][0].as_py()) == x.size
    assert abs(got["rho"][0].as_py() - want) < 1e-12


def test_kendall_matches_pairwise():
    from rayse.ops.rankstats import kendall_value_hour

    x, h, _ = _events()
    n = x.size
    # O(n^2) literal definition on the small corpus
    dx = np.sign(x[:, None] - x[None, :])
    dh = np.sign(h[:, None] - h[None, :])
    prod = dx * dh
    conc = int((prod > 0).sum()) // 2
    disc = int((prod < 0).sum()) // 2
    n0 = n * (n - 1) // 2
    _, tc = np.unique(x, return_counts=True)
    n1 = int((tc * (tc - 1) // 2).sum())
    _, tch = np.unique(h, return_counts=True)
    n2 = int((tch * (tch - 1) // 2).sum())
    want = (conc - disc) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    got = kendall_value_hour(SF)
    assert int(got["concordant"][0].as_py()) == conc
    assert int(got["discordant"][0].as_py()) == disc
    assert abs(got["tau_b"][0].as_py() - want) < 1e-12


def test_kruskal_matches_bruteforce():
    from rayse.ops.rankstats import kruskal_wallis_types

    x, _, g = _events()
    n = x.size
    r = _avg_ranks(x)
    groups = np.unique(g)
    ssum = 0.0
    for gv in groups:
        m = g == gv
        ssum += r[m].sum() ** 2 / m.sum()
    hstat = 12.0 / (n * (n + 1)) * ssum - 3 * (n + 1)
    _, tc = np.unique(x, return_counts=True)
    tie = 1.0 - float((tc.astype(np.int64) ** 3 - tc).sum()) / (
        n ** 3 - n)
    got = kruskal_wallis_types(SF)
    assert int(got["k"][0].as_py()) == groups.size
    assert int(got["n"][0].as_py()) == n
    assert abs(got["h"][0].as_py() - hstat) < 1e-9
    assert abs(got["h_corrected"][0].as_py() - hstat / tie) < 1e-9
