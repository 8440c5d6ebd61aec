"""Q3/Q10-analog join pipelines: DuckDB bit-exact match + join-route
invariance (hash-join partition count must not change results)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(got, want, keys):
    a = got.sort_values(keys).reset_index(drop=True)
    b = (want.sort_values(keys).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    return len(a)


def test_q3_matches_duckdb(ray_session, con):
    from rayse.ops.tpch import shipping_priority, shipping_priority_sql

    n = _cmp(shipping_priority(SF).to_pandas(),
             con.execute(shipping_priority_sql()).fetchdf(),
             ["o_orderkey"])
    assert n > 0


def test_q10_matches_duckdb(ray_session, con):
    from rayse.ops.tpch import returned_items, returned_items_sql

    n = _cmp(returned_items(SF).to_pandas(),
             con.execute(returned_items_sql()).fetchdf(),
             ["c_custkey"])
    assert n > 0


def test_q10_revenue_positive_and_sorted(ray_session):
    from rayse.ops.tpch import returned_items

    t = returned_items(SF).to_pandas()
    assert (t["revenue"] > 0).all()
    assert (t["revenue"].diff().dropna() <= 0).all()


def test_segment_coverage_matches_duckdb(ray_session, con):
    from rayse.ops.tpch import SEGMENT_COVERAGE_SQL, segment_coverage

    got = segment_coverage(SF).to_pandas()
    want = con.execute(SEGMENT_COVERAGE_SQL).fetchdf()
    n = _cmp(got, want, ["c_mktsegment"])
    assert n > 0
    assert (got["n_with_orders"] <= got["n_customers"]).all()


@pytest.fixture(scope="module")
def con_p():
    c = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_q6_matches_duckdb(ray_session, con_p):
    from rayse.ops.tpch import forecast_revenue, forecast_revenue_sql

    got = forecast_revenue(SF).to_pandas()
    want = con_p.execute(forecast_revenue_sql()).fetchdf()
    _cmp(got, want, ["revenue"])
    assert int(got["n_items"].iloc[0]) > 0


def test_q14_matches_duckdb(ray_session, con_p):
    from rayse.ops.tpch import promo_revenue, promo_revenue_sql

    got = promo_revenue(SF).to_pandas()
    want = con_p.execute(promo_revenue_sql()).fetchdf()
    _cmp(got, want, ["total_revenue"])
    r = got.iloc[0]
    assert 0 <= r["promo_revenue"] <= r["total_revenue"]
    assert 0 <= r["promo_ppm"] <= 1_000_000


def test_q18_matches_duckdb(ray_session, con_p):
    from rayse.ops.tpch import large_orders, large_orders_sql

    got = large_orders(SF, k=10).to_pandas()
    want = con_p.execute(large_orders_sql(k=10)).fetchdf()
    n = _cmp(got, want, ["o_orderkey"])
    assert n > 0
    assert (got["totalprice_c"].diff().dropna() <= 0).all()


def test_q19_matches_duckdb(ray_session, con_p):
    from rayse.ops.tpch import brand_revenue, brand_revenue_sql

    got = brand_revenue(SF).to_pandas()
    want = con_p.execute(brand_revenue_sql()).fetchdf()
    n = _cmp(got, want, ["branch"])
    assert n > 0


def test_q7_matches_duckdb(ray_session, con_p):
    c = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "nation", "supplier"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    from rayse.ops.tpch import nation_volume, nation_volume_sql

    got = nation_volume(SF, k=15).to_pandas()
    want = c.execute(nation_volume_sql(k=15)).fetchdf()
    n = _cmp(got, want, ["supp_nation", "cust_nation", "l_year"])
    assert n > 0
    assert (got["supp_nation"] != got["cust_nation"]).all()


def test_q17_matches_duckdb(ray_session, con_p):
    from rayse.ops.tpch import (small_quantity_revenue,
                                small_quantity_revenue_sql)

    got = small_quantity_revenue(SF).to_pandas()
    want = con_p.execute(small_quantity_revenue_sql()).fetchdf()
    _cmp(got, want, ["n_items"])


def test_q15_matches_duckdb(ray_session, con_p):
    c = duckdb.connect()
    for t in ("lineitem", "supplier"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    from rayse.ops.tpch import (top_supplier_revenue,
                                top_supplier_revenue_sql)

    got = top_supplier_revenue(SF).to_pandas()
    want = c.execute(top_supplier_revenue_sql()).fetchdf()
    n = _cmp(got, want, ["s_suppkey"])
    assert n >= 1
    assert got["revenue"].nunique() == 1
