"""Percolator: standing-query reverse search over the turn stream.

The forward engine indexes documents and evaluates ad-hoc queries; a
percolator stores the QUERIES and evaluates each incoming document
against all of them at ingest time, with no document index at all —
the Elasticsearch percolate / prospective-search feature the reference
has no analog of (its closest surface is the per-request boolean path,
`Query/QueryService.java:418-520`, which always runs index-side). This
is the alerting/routing primitive of a feed pipeline: "which saved
searches does this new turn match?".

Semantics (terms through the PRODUCTION Porter analyzer, identical to
the forward boolean engine `rayse/query/engine.py`):

- ``AND q``      — every distinct analyzed term of ``q`` present;
- ``OR q``       — any analyzed term of ``q`` present;
- ``NOT a b``    — all of ``a``'s terms present AND none of ``b``'s;
- ``PHRASE p``   — ``p``'s analyzed sequence adjacent in the
  filtered+stemmed stream (the J6 position semantics,
  `Ranker1.java:370-449`).

Scale shape: queries are parsed ONCE on the driver (tiny) and shipped
in the actor constructor — never per batch; turns stream through a
``map_batches`` actor pool reading only (conv_id, turn_idx, text);
matching is one pass over each turn's analyzed tokens folding a
presence BITMASK over the union query vocabulary (one uint64 per turn
— |vocab| <= 64 here), then O(|Q|) mask compares; phrase adjacency is
verified only for mask-prefiltered turns (output-bounded re-scan).
Output ∝ matches; nothing shuffles, nothing materializes driver-side.
At large |Q| (thousands of standing queries) the mask table stops
fitting a word: route each query through an inverted map keyed by its
RAREST term and evaluate only queries whose key term occurs in the
turn (the Whang et al. 2009 / ES percolator candidate pruning) — the
per-turn work drops to Σ_matching-queries, independent of |Q|. The
dense-mask path here IS that design's |Q|-small fast case.

Oracle: each standing query is one UNION ALL arm over the shared
`_analysis_ctes` token stream (stem map built FROM the production
analyzer), so DuckDB replays parse + match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# (query_id, type, args): AND/OR/PHRASE take one text, NOT takes
# (positive, negative). Terms cover the corpus vocabulary plus one
# OOV probe (matches nothing — the zero-match query must cost zero).
PERCOLATE_QUERIES = [
    ("and_table_scan", "AND", ("table scan",)),
    ("and_hash_join_merge", "AND", ("hash join merge",)),
    ("or_window_agg", "OR", ("window agg",)),
    ("not_spark_slow", "NOT", ("spark", "slow")),
    ("phrase_hash_join", "PHRASE", ("hash join",)),
    ("phrase_window_agg_batch", "PHRASE", ("window agg batch",)),
    ("and_oov", "AND", ("qqoovword",)),
]


def _prepare(queries) -> tuple[list[str], list[dict]]:
    """Driver-side parse: analyzed term structures + the union vocab.
    Returns (vocab_sorted, specs); each spec carries bit masks over the
    vocab and, for phrases, the analyzed sequence."""
    from ..analyzer import analyze

    def dedup_terms(text: str) -> list[str]:
        return list(dict.fromkeys(analyze(text)))

    vocab: dict[str, int] = {}

    def mask_of(terms: list[str]) -> int:
        m = 0
        for t in terms:
            if t not in vocab:
                if len(vocab) >= 64:
                    raise ValueError("dense-mask percolator holds <= 64 "
                                     "distinct terms; use the inverted "
                                     "candidate-pruning route")
                vocab[t] = len(vocab)
            m |= 1 << vocab[t]
        return m

    specs = []
    for qid, typ, args in queries:
        if typ == "AND":
            specs.append({"qid": qid, "typ": typ,
                          "req": mask_of(dedup_terms(args[0]))})
        elif typ == "OR":
            specs.append({"qid": qid, "typ": typ,
                          "any": mask_of(dedup_terms(args[0]))})
        elif typ == "NOT":
            specs.append({"qid": qid, "typ": typ,
                          "req": mask_of(dedup_terms(args[0])),
                          "neg": mask_of(dedup_terms(args[1]))})
        elif typ == "PHRASE":
            seq = analyze(args[0])
            specs.append({"qid": qid, "typ": typ,
                          "req": mask_of(list(dict.fromkeys(seq))),
                          "seq": seq})
        else:
            raise ValueError(typ)
    inv = sorted(vocab, key=vocab.get)
    return inv, specs


def _contains_seq(toks: list[str], seq: list[str]) -> bool:
    n, m = len(toks), len(seq)
    first = seq[0]
    for i in range(n - m + 1):
        if toks[i] == first and toks[i:i + m] == seq:
            return True
    return False


class PercolateStage:
    """map_batches actor: standing-query structures built once in
    ``__init__`` (per actor), every batch of turns matched in
    ``__call__``."""

    def __init__(self, vocab: list[str], specs: list[dict]):
        self.bit = {t: 1 << i for i, t in enumerate(vocab)}
        self.specs = specs

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..analyzer import analyze

        convs = batch["conv_id"].to_pylist()
        turns = batch["turn_idx"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        bit = self.bit
        out_q: list[str] = []
        out_i: list[int] = []       # row index within batch
        for i, text in enumerate(texts):
            toks = analyze(text if text is not None else "")
            mask = 0
            for t in toks:
                b = bit.get(t)
                if b is not None:
                    mask |= b
            if mask == 0:
                continue
            for s in self.specs:
                typ = s["typ"]
                if typ == "AND":
                    hit = (mask & s["req"]) == s["req"] and s["req"] != 0
                elif typ == "OR":
                    hit = (mask & s["any"]) != 0
                elif typ == "NOT":
                    hit = ((mask & s["req"]) == s["req"]
                           and (mask & s["neg"]) == 0)
                else:                      # PHRASE: prefilter then verify
                    hit = ((mask & s["req"]) == s["req"]
                           and _contains_seq(toks, s["seq"]))
                if hit:
                    out_q.append(s["qid"])
                    out_i.append(i)
        idx = np.asarray(out_i, dtype=np.int64)
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            "conv_id": pa.array([convs[i] for i in out_i], pa.string()),
            "turn_idx": pa.array(turns[idx] if idx.size else
                                 np.asarray([], turns.dtype)).cast(
                                     pa.int32()),
        })


def percolate(transcripts_dir: str, queries=None, concurrency=None):
    """Match every turn of the transcripts table against the standing
    queries -> Dataset of (query_id, conv_id, turn_idx)."""
    import ray
    import ray.data as rd

    vocab, specs = _prepare(queries or PERCOLATE_QUERIES)
    if concurrency is None:
        concurrency = max(1, int(ray.cluster_resources().get("CPU", 2)) - 1)
    ds = rd.read_parquet(transcripts_dir,
                         columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(PercolateStage, fn_constructor_args=(vocab, specs),
                          batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=concurrency)


def _sql_quote_terms(terms: list[str]) -> str:
    return ", ".join("'" + t.replace("'", "''") + "'" for t in terms)


def percolate_sql(queries=None) -> str:
    """DuckDB oracle: one UNION ALL arm per standing query over the
    shared analyzed token stream."""
    from ..analyzer import analyze
    from .porter_oracle import _analysis_ctes

    def dedup_terms(text: str) -> list[str]:
        return list(dict.fromkeys(analyze(text)))

    def and_arm(qid: str, terms: list[str]) -> str:
        return (f"SELECT '{qid}' AS query_id, conv_id, turn_idx\n"
                f"FROM tf WHERE term IN ({_sql_quote_terms(terms)})\n"
                f"GROUP BY conv_id, turn_idx\n"
                f"HAVING count(DISTINCT term) = {len(terms)}")

    arms = []
    for qid, typ, args in (queries or PERCOLATE_QUERIES):
        if typ == "AND":
            terms = dedup_terms(args[0])
            arms.append(and_arm(qid, terms) if terms else
                        f"SELECT '{qid}' AS query_id, conv_id, turn_idx "
                        f"FROM tf WHERE FALSE")
        elif typ == "OR":
            arms.append(
                f"SELECT DISTINCT '{qid}' AS query_id, conv_id, turn_idx\n"
                f"FROM tf WHERE term IN "
                f"({_sql_quote_terms(dedup_terms(args[0]))})")
        elif typ == "NOT":
            neg = _sql_quote_terms(dedup_terms(args[1]))
            arms.append(
                f"SELECT query_id, conv_id, turn_idx FROM (\n"
                f"{and_arm(qid, dedup_terms(args[0]))}\n) m\n"
                f"ANTI JOIN (SELECT DISTINCT conv_id, turn_idx FROM tf\n"
                f"           WHERE term IN ({neg})) x\n"
                f"  USING (conv_id, turn_idx)")
        elif typ == "PHRASE":
            stemmed = " ".join(analyze(args[0])).replace("'", "''")
            arms.append(
                f"SELECT '{qid}' AS query_id, conv_id, turn_idx\n"
                f"FROM ftext WHERE contains(' ' || ft || ' ', "
                f"' {stemmed} ')")
        else:
            raise ValueError(typ)
    body = "\nUNION ALL\n".join(arms)
    return f"""{_analysis_ctes()},
ftext AS (
  SELECT conv_id, turn_idx,
         string_agg(term, ' ' ORDER BY rawpos) AS ft
  FROM ptok GROUP BY 1, 2)
{body}"""
