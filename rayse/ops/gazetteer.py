"""Dictionary tagging — multi-pattern substring matching with
OVERLAPPING semantics, the gazetteer/entity-tagging pass of an
annotation pipeline (and the percolate/grep family's missing member:
`grep_counts` scans per needle non-overlapping and global; this cell
emits per-DOCUMENT tags and counts every occurrence, nested and
overlapping included — "scan" also fires its embedded "an").

Matcher: a per-length sliding-window comparator — each batch's texts
concatenate into ONE byte array with NUL fences (no needle contains
NUL, so windows cannot straddle documents), and for every distinct
needle length L a single `sliding_window_view` equality against the
stacked needle-byte matrix scores all needles of that length at once —
the Rabin-Karp/Aho-Corasick work profile (one pass over the text per
length class, not per needle) with zero Python in the per-char loop.
The stacked needle matrices are ACTOR STATE, prepared once in
`__init__` of the actor-pool stage; a production dictionary of 10⁵+
entries would swap a C Aho-Corasick automaton behind the same
`__call__` seam without touching the pipeline.

Oracle: the DuckDB position scan — every (position, needle) pair with
`substr(text, p, len(needle)) = needle` — the literal definition of
overlapping occurrence counting.

Reference relationship: generalizes the reference's single-term scans
(`QueryService.java:1295-1367` substring re-verification) to a
dictionary pass; no reference analog for the tagging output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GAZETTEER = ["scan", "an", "hash", "as", "join", "in", "window",
             "win", "agg", "merge", "erg", "table"]


class DictionaryTagger:
    """Actor-pool stage: per-length stacked needle bytes in state."""

    def __init__(self, needles: list[str] | None = None):
        needles = needles if needles is not None else GAZETTEER
        self.by_len: dict[int, tuple[np.ndarray, list[str]]] = {}
        for nd in needles:
            b = np.frombuffer(nd.encode("utf-8"), np.uint8)
            mat, names = self.by_len.setdefault(
                b.size, (np.empty((0, b.size), np.uint8), []))
            self.by_len[b.size] = (np.vstack([mat, b[None, :]]),
                                   names + [nd])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        raw = [(t or "").encode("utf-8") for t in texts]
        fence = b"\x00"
        blob = np.frombuffer(fence.join(raw) + fence, np.uint8)
        # document of position p: offsets of doc starts
        lens = np.asarray([len(r) + 1 for r in raw], np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        out_d, out_n, out_c = [], [], []
        for L, (mat, names) in sorted(self.by_len.items()):
            if blob.size < L:
                continue
            win = np.lib.stride_tricks.sliding_window_view(blob, L)
            for r in range(mat.shape[0]):
                hits = np.flatnonzero((win == mat[r]).all(axis=1))
                if hits.size == 0:
                    continue
                di = np.searchsorted(starts, hits, side="right") - 1
                ud, cnt = np.unique(di, return_counts=True)
                out_d.extend(ids[ud].tolist())
                out_n.extend([names[r]] * ud.size)
                out_c.extend(cnt.tolist())
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "needle": pa.array(out_n, pa.string()),
            "n_hits": pa.array(out_c, pa.int64()),
        })


def gazetteer_tags(sf_dir: str,
                   needles: list[str] | None = None) -> pa.Table:
    """(doc_id, needle, n_hits): overlapping occurrence counts of every
    dictionary entry per document — DuckDB hash-matched against the
    position-scan oracle."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tagged = ds.map_batches(DictionaryTagger,
                            fn_constructor_kwargs={"needles": needles},
                            batch_format="pyarrow",
                            zero_copy_batch=True, concurrency=2)
    tbl = pa.concat_tables(
        [t for t in ray.get(tagged.to_arrow_refs()) if t.num_rows],
        promote_options="default")
    return tbl.sort_by([("doc_id", "ascending"),
                        ("needle", "ascending")])


def gazetteer_tags_sql(needles: list[str] | None = None) -> str:
    needles = needles if needles is not None else GAZETTEER
    vals = ", ".join(f"('{n}')" for n in needles)
    return f"""
WITH nd(needle) AS (VALUES {vals}),
hits AS (
  SELECT d.doc_id, n.needle
  FROM documents d,
       UNNEST(range(1, length(d.text) + 1)) u(p)
       JOIN nd n
         ON substr(d.text, CAST(u.p AS INTEGER),
                   length(n.needle)) = n.needle)
SELECT doc_id, needle, CAST(count(*) AS BIGINT) AS n_hits
FROM hits GROUP BY 1, 2
ORDER BY doc_id, needle"""
