"""Session-8 batch 5: seasonal-naive forecast evaluation and
inclusion-based FK discovery — DuckDB bit-exact plus semantics."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "lineitem", "orders", "customer", "part",
              "supplier", "nation", "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _cmp(got, want, keys):
    a = got.sort_values(keys).reset_index(drop=True)
    b = (want.sort_values(keys).reset_index(drop=True)
         [list(a.columns)].astype(a.dtypes.to_dict()))
    pd.testing.assert_frame_equal(a, b)
    return len(a)


def test_forecast_eval_matches_duckdb(ray_session, con):
    from rayse.ops.bursts import forecast_eval, forecast_eval_sql

    got = forecast_eval(SF).to_pandas()
    n = _cmp(got, con.execute(forecast_eval_sql()).fetchdf(),
             ["event_type"])
    assert n > 0
    assert (got["n_hours"] > 0).all()


def test_forecast_eval_degenerate_season(ray_session):
    """season == 1 makes the seasonal forecast THE naive baseline:
    mase_ppm must be exactly 1e6 for every type."""
    from rayse.ops.bursts import forecast_eval

    t = forecast_eval(SF, season=1).to_pandas()
    assert (t["mase_ppm"] == 1_000_000).all()
    assert (t["mae24_q"] == t["mae1_q"]).all()


def test_fk_discovery_matches_duckdb(ray_session, con):
    from rayse.ops.fkdiscover import fk_discovery, fk_discovery_sql

    got = fk_discovery(SF).to_pandas()
    n = _cmp(got, con.execute(fk_discovery_sql()).fetchdf(),
             ["child", "parent"])
    assert n == 7


def test_fk_discovery_true_fks_fully_contained(ray_session):
    from rayse.ops.fkdiscover import fk_discovery

    got = fk_discovery(SF).to_pandas().set_index("child")
    for child in ("lineitem.l_orderkey", "orders.o_custkey",
                  "supplier.s_nationkey", "nation.n_regionkey"):
        assert got.loc[child, "containment_ppm"] == 1_000_000
        assert (got.loc[child, "n_contained"]
                == got.loc[child, "ndv_child"])
