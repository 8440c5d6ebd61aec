"""Greedy-optimality pin for activity selection: on random small
interval sets the earliest-end greedy count must equal the O(n²)
DP maximum (the textbook theorem, verified rather than assumed)."""
import numpy as np


def _greedy(s, e):
    order = np.lexsort((s, e))
    cnt, cur = 0, -10**18
    for i in order:
        if s[i] >= cur:
            cur = e[i]
            cnt += 1
    return cnt


def _dp_max(s, e):
    order = np.lexsort((s, e))
    s, e = s[order], e[order]
    n = s.size
    best = np.zeros(n + 1, np.int64)   # best[i] = max using first i
    for i in range(1, n + 1):
        # skip interval i-1
        take = 1
        j = i - 1
        prev = 0
        for j in range(i - 1):
            if e[j] <= s[i - 1]:
                prev = max(prev, best[j + 1])
        best[i] = max(best[i - 1], prev + take)
    return int(best[n])


def test_greedy_matches_dp():
    rng = np.random.default_rng(13)
    for trial in range(50):
        n = int(rng.integers(1, 25))
        s = rng.integers(0, 100, n).astype(np.int64)
        d = rng.integers(1, 40, n).astype(np.int64)
        e = s + d
        assert _greedy(s, e) == _dp_max(s, e), (s.tolist(), e.tolist())
