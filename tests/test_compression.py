import zlib

import numpy as np


def test_compression_ratio_values(ray_session):
    from rayse.ops.textstats import compression_ratio

    sf = "/root/testdata/sf0.001"
    got = compression_ratio(sf).to_pandas()
    assert len(got) == 500
    assert (got["n_compressed"] > 0).all()
    assert (got["ratio_ppm"] > 0).all()
    # repetitive synthetic text compresses below 1.0
    assert got["ratio_ppm"].median() < 1_000_000


def test_compression_deterministic_pin():
    # environment zlib drift must fail loudly (fixed level 6)
    s = ("the quick brown fox jumps over the lazy dog " * 10).encode()
    assert len(zlib.compress(s, 6)) == 56


def test_compression_ordering(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayse.ops.textstats import compression_ratio

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["abc " * 200, "".join(
            np.random.default_rng(5).choice(list("abcdefgh"), 800))],
    }), str(tmp_path / "documents.parquet"))
    got = (compression_ratio(str(tmp_path)).to_pandas()
           .set_index("doc_id"))
    # pure repetition compresses (much) better than random text
    assert got.loc[1, "ratio_ppm"] < got.loc[2, "ratio_ppm"]
