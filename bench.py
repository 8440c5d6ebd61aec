"""Benchmark harness — one JSON line on stdout (driver contract).

Headline: distributed inverted-index build wall-seconds over a deterministic
synthetic transcript corpus (~8 turns/conv; N_CONVS via RAYSE_BENCH_CONVS,
default 15000 -> ~120k turns), plus the BM25/phrase/boolean query set, plus
two sf-dir ops over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

    python bench.py              # one run at RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # fresh processes at 2, 8 and 32 CPUs on
                                 # the same input; prints throughputs, both
                                 # N->4N efficiencies, the measured hardware
                                 # ceiling, and a cross-parallelism
                                 # index-determinism check

Owns its Ray session (ray.init/shutdown) — the only scripts allowed to.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_CONVS = int(os.environ.get("RAYSE_BENCH_CONVS", "15000"))
CORPUS_DIR = f"/tmp/rayse_bench_corpus_{BENCH_CONVS}"
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def ensure_corpus() -> str:
    """Generate the bench corpus once (parallel, deterministic per block)."""
    marker = os.path.join(CORPUS_DIR, "_DONE")
    if os.path.exists(marker):
        return CORPUS_DIR
    import ray.data as rd

    from rayse.corpus.generator import generate_block

    shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    os.makedirs(CORPUS_DIR)
    step = 1000
    ranges = [{"start": s, "end": min(s + step, BENCH_CONVS)}
              for s in range(0, BENCH_CONVS, step)]

    def gen(batch):
        import pyarrow as pa
        tbls = [generate_block(int(s), int(e))
                for s, e in zip(batch["start"], batch["end"])]
        return pa.concat_tables(tbls)

    (rd.from_items(ranges, override_num_blocks=len(ranges))
     .map_batches(gen, batch_size=1, batch_format="default")
     .write_parquet(CORPUS_DIR, max_rows_per_file=8192))
    open(marker, "w").close()
    return CORPUS_DIR


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    try:
        timings: dict[str, float] = {}
        corpus = ensure_corpus()

        # warm OS page cache (measure compute+shuffle, not first disk read)
        import pyarrow.parquet as pq
        n_turns = 0
        for f in sorted(os.listdir(corpus)):
            if f.endswith(".parquet"):
                n_turns += pq.read_table(os.path.join(corpus, f)).num_rows

        from rayse.pipelines.build_index import build_index

        idx_dir = f"/tmp/rayse_bench_index_{NUM_CPUS}"
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.perf_counter()
        res = build_index(corpus, idx_dir)
        timings["index_build"] = time.perf_counter() - t0

        # query set (rank-identity reference queries)
        from rayse.query.engine import SearchEngine

        eng = SearchEngine(idx_dir)
        qpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests", "queries.json")
        queries = json.load(open(qpath))
        t0 = time.perf_counter()
        n_q = 0
        for _ in range(3):
            for q in queries:
                eng.search(q, 10)
                n_q += 1
        timings["query_set"] = time.perf_counter() - t0

        # distributed serving (actor pool + driver k-way merge), cache
        # OFF so the metric tracks real per-query serving work — makes
        # serve.py regressions visible round-over-round
        from rayse.query.serve import SearchCluster

        cluster = SearchCluster(idx_dir, pool_size=min(8, NUM_CPUS),
                                cache_entries=0)
        cluster.search_many(queries[:4], 10)          # actor warm-up
        t0 = time.perf_counter()
        n_sq = 0
        for _ in range(3):
            cluster.search_many(queries, 10)
            n_sq += len(queries)
        timings["serve_set"] = time.perf_counter() - t0
        serve_qps = round(n_sq / timings["serve_set"], 1)
        cluster.shutdown()

        # sf-dir ops
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import __ray_entry__ as entrymod

        for name in ("doc_token_count", "dedup_exact"):
            fn = entrymod.queries()[name]
            t0 = time.perf_counter()
            out = fn(SF_DIR)
            if hasattr(out, "materialize"):
                out = out.materialize()
            timings[name] = time.perf_counter() - t0

        return {
            "metric": "index_build_sec",
            "value": round(timings["index_build"], 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "bench_turns": n_turns,
            "turns_per_sec": round(n_turns / timings["index_build"], 1),
            "queries_per_sec": round(n_q / timings["query_set"], 1),
            "serve_qps": serve_qps,
        }
    finally:
        ray.shutdown()


def measure_cpu_ceiling(lo: int, hi: int) -> dict:
    """This box's own multiprocess scaling ceiling: N identical pure-python
    busy processes, per-process throughput ratio lo->hi. A single shared-
    memory machine throttles under full fan-out (frequency/SMT/memory-bus),
    so even a perfectly parallel pipeline cannot exceed this ratio — report
    it next to the pipeline efficiency (a real N->4N NODE cluster has no
    such shared ceiling)."""
    code = ("import time;t=time.perf_counter();x=0\n"
            "while time.perf_counter()-t<2: x+=1\n"
            "print(x)")

    def total(n: int) -> int:
        ps = [subprocess.Popen([sys.executable, "-c", code],
                               stdout=subprocess.PIPE) for _ in range(n)]
        return sum(int(p.communicate()[0]) for p in ps)

    t_lo, t_hi = total(lo), total(hi)
    return {"ceiling_efficiency": round((t_hi / t_lo) / (hi / lo), 3)}


def _same_index(a_dir: str, b_dir: str) -> bool:
    """Segment-level equality of two builds (FIXTURES.md test_scaling_smoke:
    identical output at different num_cpus)."""
    import glob as g

    import pyarrow.parquet as pq

    fa = sorted(g.glob(os.path.join(a_dir, "segments", "part=*",
                                    "segment.parquet")))
    fb = sorted(g.glob(os.path.join(b_dir, "segments", "part=*",
                                    "segment.parquet")))
    if len(fa) != len(fb) or not fa:
        return False
    return all(pq.read_table(x).equals(pq.read_table(y))
               for x, y in zip(fa, fb))


def run_scaling() -> dict:
    # Efficiency must measure the PIPELINE, not fixed startup/conv_map
    # overheads: at the 120k-turn default the 2-CPU leg finishes in ~13 s
    # and constants dominate. Scaling runs use >= 2.4M turns unless the
    # caller pinned a size explicitly.
    scaling_convs = str(max(BENCH_CONVS, 300_000)) \
        if "RAYSE_BENCH_CONVS" not in os.environ \
        else os.environ["RAYSE_BENCH_CONVS"]

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   RAYSE_BENCH_CONVS=scaling_convs)
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Two N->4N pairs on the same input, fresh processes each:
    #   2->8:  the box's memory bus is unsaturated at both levels -> this
    #          pair reflects the PIPELINE's scaling (headline).
    #   8->32: 32 workers saturate a single node's DRAM (this sandbox is
    #          one box, unlike the fixed multi-node cluster of the target
    #          criterion) -> reported with the measured hardware ceiling.
    r2, r8, r32 = run(2), run(8), run(32)
    eff_2_8 = (r2["value"] / r8["value"]) / 4
    eff_8_32 = (r8["value"] / r32["value"]) / 4
    ceil_8_32 = measure_cpu_ceiling(8, 32)["ceiling_efficiency"]
    deterministic = _same_index("/tmp/rayse_bench_index_8",
                                "/tmp/rayse_bench_index_32")
    return {
        "metric": "scaling_efficiency",
        "value": round(eff_2_8, 3),
        "unit": "ratio",
        "pair": "2->8 cpus (N->4N)",
        "sec_2": r2["value"],
        "sec_8": r8["value"],
        "sec_32": r32["value"],
        "turns_per_sec_2": r2["turns_per_sec"],
        "turns_per_sec_8": r8["turns_per_sec"],
        "turns_per_sec_32": r32["turns_per_sec"],
        "bench_turns": r8["bench_turns"],
        "eff_8_32": round(eff_8_32, 3),
        "hardware_ceiling_8_32": ceil_8_32,
        "eff_8_32_vs_ceiling": round(eff_8_32 / ceil_8_32, 3)
        if ceil_8_32 else None,
        "deterministic_across_parallelism": deterministic,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
