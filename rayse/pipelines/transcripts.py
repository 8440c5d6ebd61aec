"""Derive a transcripts table (BASELINE.json ``input_hint`` schema) from a
``documents`` parquet table, deterministically.

Used by the driver-contract entry points: the sf tables at
``/root/testdata/sf*/`` carry a ``documents(doc_id, text, lang, source,
n_chars)`` table; each document becomes one conversation, its text split
into turns of ``words_per_turn`` whitespace words with alternating
user/assistant roles. Pure per-row function -> plain ``map_batches``; no
shuffle, order-stable (turn text is a pure function of (doc_id, text)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..corpus.generator import TRANSCRIPTS_SCHEMA

_TS0 = 1_700_000_000_000_000


def documents_to_transcripts_batch(batch: pa.Table,
                                   words_per_turn: int = 40) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    conv_ids, turn_idxs, roles, out_texts, tools, tss = [], [], [], [], [], []
    for did, text in zip(doc_ids, texts):
        words = (text or "").split(" ")
        cid = "conv-%09d" % did
        n_turns = max(1, (len(words) + words_per_turn - 1) // words_per_turn)
        for t in range(n_turns):
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append("user" if t % 2 == 0 else "assistant")
            out_texts.append(" ".join(words[t * words_per_turn:
                                            (t + 1) * words_per_turn]))
            tools.append("")
            tss.append(_TS0 + did * 1_000_000 + t * 1_000)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(np.asarray(turn_idxs, dtype=np.int32)),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(out_texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(np.asarray(tss, dtype=np.int64).view("datetime64[us]")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def transcripts_dataset_from_documents(sf_dir: str, words_per_turn: int = 40):
    """Streaming Dataset of transcript turns derived from sf documents."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ds.map_batches(documents_to_transcripts_batch,
                          fn_kwargs={"words_per_turn": words_per_turn},
                          batch_format="pyarrow", zero_copy_batch=True)


def write_transcripts_from_documents(sf_dir: str, out_dir: str,
                                     words_per_turn: int = 40) -> str:
    """Materialize to parquet (cached input for index builds)."""
    ds = transcripts_dataset_from_documents(sf_dir, words_per_turn)
    ds.write_parquet(out_dir)
    return out_dir
