"""Relational breadth ops vs DuckDB at sf0.001 (driver re-checks at sf0.01)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for n in ["lineitem", "orders", "customer", "events"]:
        c.sql(f"CREATE VIEW {n} AS SELECT * FROM '{SF}/{n}.parquet'")
    return c


def _cmp(res, sql_df):
    a = res.to_pandas() if hasattr(res, "to_pandas") else res
    if hasattr(a, "to_pandas"):
        a = a.to_pandas()
    a = a.sort_index(axis=1).sort_values(sorted(a.columns)).reset_index(
        drop=True)
    b = sql_df.sort_index(axis=1).sort_values(sorted(sql_df.columns)
                                              ).reset_index(drop=True)
    assert len(a) == len(b)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_pricing_summary(ray_session, con):
    from rayse.ops import relational as R

    _cmp(R.pricing_summary(SF), con.sql(R.PRICING_SUMMARY_SQL).df())


def test_top_customer_revenue(ray_session, con):
    from rayse.ops import relational as R

    _cmp(R.top_customer_revenue(SF),
         con.sql(R.TOP_CUSTOMER_REVENUE_SQL).df())


def test_trailing_window(ray_session, con):
    from rayse.ops import relational as R

    _cmp(R.trailing_window_counts(SF), con.sql(R.TRAILING_WINDOW_SQL).df())
