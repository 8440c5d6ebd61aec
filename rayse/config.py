"""Engine configuration — the single tuning surface (SURVEY.md §2.10).

Replaces the reference's scattered hardcoded knobs
(`application.properties`, tag-importance map `IndexerService.java:263-268`,
BM25 constants `IndexerService.java:1029-1030`).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    # `IndexerService.java:1029-1030` — k1 controls TF scaling, b length norm
    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class IndexConfig:
    # document partitioning: P = 2^part_bits doc partitions (top bits of the
    # conversation hash). Finer parts = smaller per-part merge working sets
    # (cache-resident sorts: measured 3x less merge CPU at 2^9 vs 2^5 on
    # 2.4M turns) and more merge/serve parallelism; size so one partition
    # fits a worker's cache-friendly zone and a serving actor's memory
    # (at 10^12 turns this wants 2^12+ together with more shards).
    part_bits: int = 8
    # salted two-phase aggregation: within a partition, hot-term groups are
    # split into up to 2^salt_bits doc_id-contiguous runs (north rule skew
    # handling). Runs re-merge at compaction unless larger than
    # compact_max_postings.
    salt_bits: int = 3
    # runs whose combined length is below this re-encode into a single row
    # at compaction; larger terms keep doc_id-contiguous runs (bounded tasks)
    compact_max_postings: int = 1 << 20
    block_size: int = 128          # postings per block-max block
    with_positions: bool = True    # store positional postings (phrase queries)
    # "porter" = reference-parity chain (tokenize -> stopwords -> Porter);
    # "whitespace" = text.split(" ") verbatim — SQL-oracle-matchable, used
    # by the DuckDB-green ranked-retrieval queries (rayse.ops.ws_search)
    analyzer: str = "porter"
    # M2 parity hook: run the reference HTML cleaning chain
    # (`PreIndexer.java:48-75`, rayse.ops.htmlclean) over `text` before
    # tokenizing — off for plain-text transcripts (cleaner is then a
    # whitespace-collapse identity the tokenizer already performs)
    clean_html: bool = False
    bm25: BM25Params = field(default_factory=BM25Params)
    # tokenize stage sizing
    tokenize_batch_size: int = 1024
    tokenize_concurrency: int | None = None   # None → let Ray size tasks
    # conv_map sidecar (doc hydration J4: conv_hash -> conv_id); cheap
    # single-column scan per shard
    build_conv_map: bool = True
