"""Index dictionary diff vs the FULL OUTER JOIN oracle."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def diff_indexes(ray_session, tmp_path_factory):
    from rayse.config import IndexConfig
    from rayse.ops.porter_oracle import _compacted_index_for
    from rayse.pipelines.build_index import build_index
    from rayse.pipelines.transcripts import write_transcripts_from_documents

    root = tmp_path_factory.mktemp("idxdiff")
    tdir = root / "transcripts"
    tdir.mkdir()
    write_transcripts_from_documents(SF, str(tdir))
    idir = str(root / "index")
    build_index(str(tdir), idir, IndexConfig())
    return idir, _compacted_index_for(idir)


def test_index_diff_matches_duckdb(ray_session, diff_indexes):
    from rayse.ops.indexdiff import index_diff, index_diff_sql

    a, b = diff_indexes
    got = index_diff(a, b).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(index_diff_sql()).fetchdf().astype(
        got.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, want)
    # deleting documents can only remove or shrink dictionary entries
    assert set(got["status"]) <= {"removed", "changed"}
    assert (got["df_b"] <= got["df_a"]).all()
    assert (got["cf_b"] < got["cf_a"]).all()


def test_index_diff_reverse_reports_added(ray_session, diff_indexes):
    """Diffing compacted -> full flags the same terms as added/changed
    with the sides swapped."""
    from rayse.ops.indexdiff import index_diff

    a, b = diff_indexes
    fwd = index_diff(a, b).to_pandas()
    rev = index_diff(b, a).to_pandas()
    assert len(fwd) == len(rev)
    assert (rev.loc[rev["df_a"] == 0, "status"] == "added").all()
    assert set(fwd.loc[fwd["status"] == "removed", "term"]) \
        == set(rev.loc[rev["status"] == "added", "term"])


def test_index_diff_identical_is_empty(ray_session, diff_indexes):
    from rayse.ops.indexdiff import index_diff

    a, _ = diff_indexes
    assert index_diff(a, a).num_rows == 0
