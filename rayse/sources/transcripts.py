"""Transcript source readers: Parquet (native), JSONL, CSV -> one Dataset
with the canonical transcripts schema (BASELINE.json ``input_hint``).

Replaces the reference's corpus sources (PostgreSQL ``documents`` reads,
`Crawler/CrawlerMainProcess/ServeDataBase.java:32-47`) with format-pluggable
Ray Data readers; every format is normalized to::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

Parquet is the scale path (column pruning + row-group pushdown); JSONL/CSV
exist for interchange and are normalized via a vectorized map_batches.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

from ..corpus.generator import TRANSCRIPTS_SCHEMA

_EXT_FORMATS = {".parquet": "parquet", ".json": "json", ".jsonl": "json",
                ".csv": "csv"}


def _detect_format(path: str | list[str]) -> str:
    p = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(p):
        for f in sorted(glob.glob(os.path.join(p, "**", "*"), recursive=True)):
            ext = os.path.splitext(f)[1].lower()
            if ext in _EXT_FORMATS:
                return _EXT_FORMATS[ext]
        raise ValueError(f"no recognizable transcript files under {p}")
    ext = os.path.splitext(p)[1].lower()
    if ext not in _EXT_FORMATS:
        raise ValueError(f"unsupported transcript format: {p}")
    return _EXT_FORMATS[ext]


def _normalize(batch: pa.Table) -> pa.Table:
    """Coerce a loosely-typed batch (JSON/CSV inference) to the canonical
    schema; missing optional columns default (role='user', tool='', ts=0)."""
    n = batch.num_rows
    cols = set(batch.column_names)

    def col(name, typ, default):
        if name in cols:
            return batch[name].cast(typ)
        if typ == pa.string():
            return pa.array([default] * n, typ)
        return pa.array(np.full(n, default, dtype="int64")
                        .view("datetime64[us]") if name == "ts"
                        else np.full(n, default), typ)

    return pa.table({
        "conv_id": col("conv_id", pa.string(), ""),
        "turn_idx": col("turn_idx", pa.int32(), 0),
        "role": col("role", pa.string(), "user"),
        "text": col("text", pa.string(), ""),
        "tool": col("tool", pa.string(), ""),
        "ts": col("ts", pa.timestamp("us"), 0),
    }, schema=TRANSCRIPTS_SCHEMA)


def read_transcripts(path: str | list[str], fmt: str | None = None,
                     columns: list[str] | None = None):
    """Dataset of transcript turns from parquet/jsonl/csv input.

    ``columns`` pruning applies at the read for parquet (the scale path);
    JSON/CSV read whole rows then project."""
    import ray.data as rd

    fmt = fmt or _detect_format(path)
    if fmt == "parquet":
        return rd.read_parquet(path, columns=columns)
    if fmt == "json":
        ds = rd.read_json(path)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(fmt)
    ds = ds.map_batches(_normalize, batch_format="pyarrow",
                        zero_copy_batch=True)
    if columns:
        ds = ds.select_columns(columns)
    return ds
