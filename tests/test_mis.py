"""MIS property pins: independence (no edge inside the set) and
maximality (every excluded vertex has a MIS neighbour) on the sf0.001
demo graph — the theorems behind the hash-gated replay."""
import numpy as np
import pyarrow as pa
import ray


def test_mis_properties(ray_session):
    from rayse.ops.mis import maximal_independent_set
    from rayse.ops.mst import _canonical_edges

    SF = "/root/testdata/sf0.001"
    t = maximal_independent_set(SF)
    v = t["v"].to_numpy(zero_copy_only=False)
    in_mis = t["in_mis"].to_numpy(zero_copy_only=False).astype(bool)
    mis = dict(zip(v.tolist(), in_mis.tolist()))

    parts = pa.concat_tables(
        [x for x in ray.get(
            _canonical_edges(SF).to_arrow_refs()) if x.num_rows],
        promote_options="default")
    eu = parts["u"].to_numpy(zero_copy_only=False)
    ev = parts["v"].to_numpy(zero_copy_only=False)

    # independence
    for a, b in zip(eu.tolist(), ev.tolist()):
        assert not (mis[a] and mis[b]), (a, b)
    # maximality: every non-member has a member neighbour
    nbr_has = {x: False for x in v.tolist()}
    for a, b in zip(eu.tolist(), ev.tolist()):
        if mis[b]:
            nbr_has[a] = True
        if mis[a]:
            nbr_has[b] = True
    for x, m in mis.items():
        assert m or nbr_has[x], x


def test_mis_sharded_bit_identical(ray_session):
    """The no-driver-vertex-state MIS equals the dense route exactly —
    statuses AND round numbers (the per-round semantics match, not
    just the final set)."""
    import pandas as pd

    from rayse.ops.mis import (maximal_independent_set,
                               maximal_independent_set_sharded)

    sf = "/root/testdata/sf0.001"
    a = (maximal_independent_set(sf).to_pandas()
         .sort_values("v").reset_index(drop=True))
    b = (maximal_independent_set_sharded(sf).to_pandas()
         .sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_wl_sharded_bit_identical(ray_session):
    """Sharded 1-WL refinement equals the dense route exactly,
    including class sizes."""
    import pandas as pd

    from rayse.ops.wl import wl_refinement, wl_refinement_sharded

    sf = "/root/testdata/sf0.001"
    a = (wl_refinement(sf).to_pandas()
         .sort_values("v").reset_index(drop=True))
    b = (wl_refinement_sharded(sf).to_pandas()
         .sort_values("v").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
