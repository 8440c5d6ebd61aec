"""Funnel (ordered-sequence) analysis vs the chained min-ts DuckDB
oracle, pinned at sf0.001; plus a hand-built corpus where the strict
ordering rules are known by construction."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _oracle(events_path: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{events_path}')")
    return con.execute(sql).fetchdf()


def test_funnel_matches_duckdb(ray_session):
    from rayse.ops.funnel import funnel_counts, funnel_counts_sql

    got = funnel_counts(SF).to_pandas()
    want = _oracle(f"{SF}/events.parquet", funnel_counts_sql())
    a = got.sort_values("stage_idx").reset_index(drop=True)
    b = want.sort_values("stage_idx").reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    n = got.sort_values("stage_idx")["n_users"].to_numpy()
    assert (np.diff(n) <= 0).all()          # funnel is monotone
    assert n[0] > 0


def test_funnel_strict_ordering(ray_session, tmp_path):
    """Users: u1 completes all three in order; u2 has click BEFORE view
    (reaches only stage 0 via its later view, no purchase); u3 has
    view and click at the SAME timestamp (strict > excludes click)."""
    from rayse.ops.funnel import funnel_counts

    rows = [
        (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        (2, 100, "click"), (2, 200, "view"),
        (3, 100, "view"), (3, 100, "click"),
    ]
    tbl = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "ts": pa.array(np.array([r[1] for r in rows], np.int64)
                       * 1_000_000).cast(pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    d = tmp_path / "funnel"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    got = funnel_counts(str(d)).to_pandas().set_index("stage_idx")
    assert got.loc[0, "n_users"] == 3       # all three saw a view
    assert got.loc[1, "n_users"] == 1       # only u1 clicked after view
    assert got.loc[2, "n_users"] == 1


def test_cohort_overlap_matches_duckdb(ray_session):
    """Pairwise audience Jaccard vs the distinct-pair self-join oracle;
    all C(5,2)=10 unordered type pairs appear with inter <= union."""
    import duckdb
    import pandas as pd

    from rayse.ops.funnel import COHORT_OVERLAP_SQL, cohort_overlap

    got = cohort_overlap(SF).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute(COHORT_OVERLAP_SQL).fetchdf()
    keys = ["type_a", "type_b"]
    a = got.sort_values(keys).reset_index(drop=True)
    b = want.sort_values(keys).reset_index(drop=True)[list(a.columns)]
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 10
    assert (a["inter"] <= a["union_"]).all()
    assert (a["type_a"] < a["type_b"]).all()
