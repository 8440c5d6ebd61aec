"""OHLC candles and the Holt smoother pinned against pandas brute
force at sf0.001."""
import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_ohlc_matches_bruteforce():
    from rayse.ops.ohlc import DAY_US, ohlc_daily

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["tu"] = ev["ts"].astype("int64")
    ev["day"] = ev["tu"] // DAY_US
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100).astype(
        np.int64)
    ev = ev.sort_values(["event_type", "day", "tu", "event_id"])
    got = ohlc_daily(SF).to_pandas()
    want_rows = {}
    for (t, d), g in ev.groupby(["event_type", "day"]):
        c = g["cents"].to_numpy()
        want_rows[(t, int(d))] = (int(c[0]), int(c.max()),
                                  int(c.min()), int(c[-1]), len(c))
    assert len(got) == len(want_rows)
    for _, row in got.iterrows():
        w = want_rows[(row["event_type"], int(row["day"]))]
        assert (int(row["open"]), int(row["high"]), int(row["low"]),
                int(row["close"]), int(row["n"])) == w


def test_holt_recursion_properties():
    from rayse.ops.bursts import HOLT_SCALE, holt_hourly

    got = holt_hourly(SF).to_pandas()
    # per type: first level is c0 * SCALE; hours are dense
    for t, g in got.groupby("event_type"):
        g = g.sort_values("hr")
        hrs = g["hr"].to_numpy()
        assert (np.diff(hrs) == 1).all()
        assert int(g["level_fp"].iloc[0]) % HOLT_SCALE == 0
    # constant-series fixed point: if counts were constant c, level
    # stays near c*SCALE — check magnitudes are bounded by the max
    # hourly count
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    ev["hr"] = ev["ts"].astype("int64") // 3_600_000_000
    mx = ev.groupby(["event_type", "hr"]).size().max()
    assert got["level_fp"].abs().max() <= (mx + 1) * 2 * HOLT_SCALE
