"""jaro_winkler_np pinned bit-for-bit to DuckDB's built-in, including
the empty-string and odd-transposition-cycle corners."""
import random

import duckdb


def test_jw_matches_duckdb_fuzz():
    from rayse.ops.editdist import jaro_winkler_np

    con = duckdb.connect()
    random.seed(23)
    cases = [("", ""), ("", "a"), ("abc", "abc"), ("abc", "bca"),
             ("martha", "marhta"), ("DIXON", "DICKSONX"),
             ("small ring", "small rink")]
    for alpha in ("ab", "abcde"):
        for _ in range(600):
            cases.append((
                "".join(random.choice(alpha)
                        for _ in range(random.randint(0, 12))),
                "".join(random.choice(alpha)
                        for _ in range(random.randint(0, 12)))))
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        got = jaro_winkler_np(a, b)
        assert abs(got - want) < 1e-12, (a, b, got, want)
