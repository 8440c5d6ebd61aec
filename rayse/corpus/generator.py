"""Deterministic synthetic transcripts corpus (FIXTURES.md §1-2).

Schema (authoritative, from BASELINE.json ``input_hint``):
    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

Properties:
- seed-deterministic and *block-deterministic*: conversation ``c``'s rows
  depend only on ``(seed, c)``, so any sharding (or Ray parallelism level)
  produces identical bytes per conversation — the per-turn text-equality
  invariant holds across runs.
- Zipf(s=1.1) content vocabulary (~2000 words) + the reference 668-word
  stopword list mixed at ~35% token share + programming-style tokens
  (dots/operators/paths) exercising the tokenizer's compound paths.
- 12 planted multi-word phrases at known (conv_id, turn_idx) → ground truth
  for positional phrase tests; 20 planted rare terms in 1-3 turns each.
- rows sorted by (conv_id, turn_idx); ts strictly increasing per conv.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analyzer.stopwords import STOPWORDS_LIST

SEED = 42

_SYL = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "na", "pe", "qi",
    "ra", "so", "tu", "va", "wo", "xe", "yi", "zo", "bra", "cle", "dri",
    "fla", "gro", "ste", "tra", "pli", "sna", "que",
]

PROG_TOKENS = [
    "numpy.array", "pandas.dataframe", "torch.nn.module", "x+=1", "y-=2",
    "arr[i]", "matrix[j]", ".py", ".js", ".rs", "/usr/bin", "/home/user/src",
    "os.path.join", "ray.data.dataset", "a=b", "k*v", "n/m", "model.fit",
    "json.loads", "re.compile", "req.get", "resp.status_code", "df.groupby",
    "sys.argv", "log.info", "/tmp/output", "/var/log/app", "utils.helper",
    "cfg.yaml", "main.rs", "lib.so", "data.bin", "idx[k]", "q+=delta",
    "loss.backward", "optim.step", "batch.to_pandas", "tbl.filter",
    "vec.dot", "mat.t", "/opt/tools", "conf.d", "v2.1.3", "x0=y0",
    "feat.norm", "emb.cos", "tok.ids", "pos.enc", "seg.merge", "top.k",
]

PHRASES = [
    "gradient descent optimizer", "rate limit exceeded",
    "connection reset by peer", "invalid api key",
    "token bucket refill", "nearest neighbor search",
    "inverted index segment", "posting list compression",
    "block max scoring", "checkpoint manifest restore",
    "shuffle partition skew", "actor pool warmup",
]

RARE_TERMS = ["zzrareterm%02d" % i for i in range(20)]

ROLES = ["user", "assistant", "tool", "system"]
ROLE_P = [0.30, 0.50, 0.15, 0.05]
TOOLS = ["bash", "search", "calculator", "browser", "editor", "compiler",
         "profiler", "linter", "debugger", "planner"]


def _content_vocab(rng: np.random.Generator, n: int = 2000) -> list[str]:
    words, seen = [], set()
    while len(words) < n:
        w = "".join(rng.choice(_SYL, size=rng.integers(2, 5)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


class CorpusSpec:
    """Precomputed vocab + sampling tables; cheap to build, deterministic."""

    def __init__(self, seed: int = SEED):
        rng = np.random.default_rng(seed)
        self.seed = seed
        self.content = np.array(_content_vocab(rng), dtype=object)
        ranks = np.arange(1, len(self.content) + 1, dtype=np.float64)
        w = ranks ** -1.1
        self.zipf_p = w / w.sum()
        self.stop = np.array([s for s in STOPWORDS_LIST if s], dtype=object)
        self.prog = np.array(PROG_TOKENS, dtype=object)

    # --- planted ground truth -------------------------------------------------
    @staticmethod
    def phrase_plants(n_convs: int) -> dict[tuple[str, int], str]:
        """(conv_id, turn_idx) -> planted phrase. Rule: conv c with c%17==3
        gets PHRASES[(c//17) % 12] inserted in turn 2 (if the conv has >2 turns,
        which the generator guarantees for planted convs)."""
        out = {}
        for c in range(n_convs):
            if c % 17 == 3:
                out[(conv_name(c), 2)] = PHRASES[(c // 17) % len(PHRASES)]
        return out

    @staticmethod
    def rare_plants(n_convs: int) -> dict[str, list[tuple[str, int]]]:
        """rare term -> list of (conv_id, turn_idx) containing it.
        Rule: term i lives in convs {7i+5, 7i+200, 7i+401} ∩ [0,n_convs) at
        turn 1."""
        out = {}
        for i, t in enumerate(RARE_TERMS):
            convs = [7 * i + 5, 7 * i + 200, 7 * i + 401]
            out[t] = [(conv_name(c), 1) for c in convs if c < n_convs]
        return out


def conv_name(c: int) -> str:
    return "conv-%07d" % c


def _gen_conv(spec: CorpusSpec, c: int, n_convs: int):
    """Rows for conversation c. Depends only on (seed, c, n_convs plants)."""
    rng = np.random.default_rng((spec.seed << 24) ^ (c * 2654435761 % (1 << 61)))
    n_turns = int(rng.integers(4, 13))  # ~8 avg
    planted_phrase = PHRASES[(c // 17) % len(PHRASES)] if c % 17 == 3 else None
    rare_here = [
        (t, 1) for i, t in enumerate(RARE_TERMS)
        if c in (7 * i + 5, 7 * i + 200, 7 * i + 401)
    ]
    if planted_phrase is not None:
        n_turns = max(n_turns, 3)
    rows_role, rows_text, rows_tool = [], [], []
    for t in range(n_turns):
        n_tok = int(min(400, max(3, rng.lognormal(np.log(40), 0.8))))
        r = rng.random(n_tok)
        toks = np.empty(n_tok, dtype=object)
        stop_m = r < 0.35
        prog_m = (r >= 0.35) & (r < 0.39)
        cont_m = ~(stop_m | prog_m)
        toks[stop_m] = rng.choice(spec.stop, size=int(stop_m.sum()))
        toks[prog_m] = rng.choice(spec.prog, size=int(prog_m.sum()))
        toks[cont_m] = rng.choice(spec.content, size=int(cont_m.sum()), p=spec.zipf_p)
        toks = toks.tolist()
        if planted_phrase is not None and t == 2:
            pos = min(5, len(toks))
            toks[pos:pos] = planted_phrase.split()
        for term, tt in rare_here:
            if tt == t:
                toks.insert(min(3, len(toks)), term)
        role = ROLES[int(rng.choice(4, p=ROLE_P))]
        tool = TOOLS[int(rng.integers(len(TOOLS)))] if role == "tool" else ""
        rows_role.append(role)
        rows_tool.append(tool)
        rows_text.append(" ".join(toks))
    return rows_role, rows_text, rows_tool, n_turns


TRANSCRIPTS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

_TS0 = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in µs


def generate_block(conv_start: int, conv_end: int, seed: int = SEED) -> pa.Table:
    """Arrow table of conversations [conv_start, conv_end), sorted."""
    spec = CorpusSpec(seed)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for c in range(conv_start, conv_end):
        r, x, tl, n = _gen_conv(spec, c, conv_end)
        cid = conv_name(c)
        conv_ids.extend([cid] * n)
        turn_idxs.extend(range(n))
        roles.extend(r)
        texts.extend(x)
        tools.extend(tl)
        base = _TS0 + c * 3_600_000_000
        tss.extend(base + 30_000_000 * t for t in range(n))
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def write_transcripts(out_dir: str, n_convs: int, seed: int = SEED,
                      convs_per_file: int = 2000) -> list[str]:
    """Write the corpus as a sharded Parquet directory; returns file paths.

    Block-deterministic: file i always holds convs [i*cpf, (i+1)*cpf)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, start in enumerate(range(0, n_convs, convs_per_file)):
        p = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(generate_block(start, min(start + convs_per_file, n_convs), seed), p)
        paths.append(p)
    return paths
