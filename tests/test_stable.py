"""Stability theorem check for the Gale-Shapley matching: NO blocking
pair — no (s, c) not matched to each other where both prefer each
other over their assigned partners."""


def test_no_blocking_pair(ray_session):
    from rayse.ops.stable import _mix1, _PA, _PB, stable_matching

    SF = "/root/testdata/sf0.001"
    t = stable_matching(SF)
    s_of = dict(zip(t["s_suppkey"].to_pylist(),
                    t["c_custkey"].to_pylist()))
    c_of = {c: s for s, c in s_of.items()}
    sups = sorted(s_of)
    custs = sorted(c_of)
    assert all(c >= 0 for c in s_of.values())   # perfect matching

    def s_rank(s, c):
        return (_mix1(s * _PA + c), c)

    def c_rank(c, s):
        return (_mix1(c * _PB + s), s)

    for s in sups:
        for c in custs:
            if s_of[s] == c:
                continue
            s_prefers = s_rank(s, c) < s_rank(s, s_of[s])
            c_prefers = c_rank(c, s) < c_rank(c, c_of[c])
            assert not (s_prefers and c_prefers), (s, c)
