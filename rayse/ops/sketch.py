"""Streaming sketches over the events log — the bounded-memory
aggregates a 100 TB pipeline uses where exact state would be
corpus-sized: HyperLogLog distinct counting (Flajolet et al. 2007) and
Count-Min frequency estimation (Cormode & Muthukrishnan 2005).

INTEGER-EXACT contract (the repo's standing oracle recipe): register
contents are pure integers (max-of-rho / sums of counts), so the
distributed merge is order-independent and DuckDB hash-matches the
register DUMP bit-for-bit; the float estimate formulas run in ONE fixed
op order on exact-integer inputs (a single division / a power-of-two
product), so the quantized estimates match too. Determinism comes from
the splitmix finalizer (``rayse.ops.exchange._mix``) and FNV-1a — both
already SQL-expressible in this repo.

Scale shape: per-batch vectorized register partials (bincount /
np.maximum.at) -> ONE bounded groupby whose output is at most
``m`` (HLL) or ``depth*width`` (CM) rows — independent of corpus size —
-> a driver-side finish over that bounded table. Sketches MERGE by the
same max/sum, so multi-day or multi-shard composition is the identical
aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import _mix

HLL_P = 9                      # 512 registers -> ~4.6% standard error
CM_DEPTH = 4
CM_WIDTH = 64
_CM_SALT = 0x9E3779B97F4A7C15  # golden-ratio odd constant (public)


_M64 = 1 << 64
_GOLD_INT = 0x9E3779B97F4A7C15


def _mulmod64_sql(a: str, b: int) -> str:
    """(a * b) % 2^64 in HUGEINT without INT128 overflow: split ``a``
    into 32-bit halves so every partial product stays under 2^97
    (the sampling module's direct product overflows once both operands
    approach 2^64 — full-width hashes do)."""
    return (f"(((((({a}) // 4294967296::HUGEINT) * {b}::HUGEINT)"
            f" % {_M64}::HUGEINT) * 4294967296::HUGEINT"
            f" + ((({a}) % 4294967296::HUGEINT) * {b}::HUGEINT))"
            f" % {_M64}::HUGEINT)")


def _mix_sql_wide(k: str) -> str:
    """Width-safe HUGEINT mirror of ``exchange._mix`` for arbitrary
    64-bit inputs."""
    step1 = f"xor(({k}), ({k}) // 1073741824::HUGEINT)"
    h2 = _mulmod64_sql(step1, _GOLD_INT)
    return f"xor({h2}, {h2} // 2147483648::HUGEINT)"


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized integer bit_length (no float log2 — misrounding near
    powers of two would silently disagree with the SQL mirror)."""
    v = v.astype(np.uint64).copy()
    bl = np.zeros(v.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl[v > 0] += 1
    return bl


def _hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(sf_dir: str, p: int = HLL_P):
    """(bucket, rho) register dump of the HLL sketch over
    ``events.user_id`` — max-of-rho is the distributed merge, realized
    as per-batch partial maxima + one bounded groupby."""
    import ray.data as rd

    suffix_bits = 64 - p
    mask = (np.uint64(1) << np.uint64(suffix_bits)) - np.uint64(1)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = _mix(ids.astype(np.uint64))
        bucket = (h >> np.uint64(suffix_bits)).astype(np.int64)
        suffix = h & mask
        rho = suffix_bits - _bit_length_u64(suffix) + 1
        reg = np.zeros(1 << p, dtype=np.int64)
        np.maximum.at(reg, bucket, rho)
        nz = np.flatnonzero(reg)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "rho": pa.array(reg[nz], pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("bucket")
            .aggregate(rd.aggregate.Max("rho")))


def hll_estimate_q(registers, p: int = HLL_P) -> int:
    """floor of the HLL estimate from a register table/DataFrame —
    exact-integer S = sum(2^(suffix_bits - rho)) keeps the only float
    work to one power-of-two product and one division (plus the
    standard linear-counting small-range correction, same both sides)."""
    import pandas as pd

    if not isinstance(registers, pd.DataFrame):
        registers = registers.to_pandas()
    m = 1 << p
    suffix_bits = 64 - p
    rho = registers[registers.columns[-1]].to_numpy()
    n_set = rho.size
    zeros = m - n_set
    # common denominator 2^(sb+1): rho ranges over [1, sb+1] (an all-zero
    # suffix — e.g. user_id 0 under splitmix — legitimately yields sb+1)
    s_int = int(sum(1 << (suffix_bits + 1 - int(r))
                    for r in rho.tolist()))
    s_int += zeros * (1 << (suffix_bits + 1))    # rho = 0 for empty regs
    raw = _hll_alpha(m) * float(m) * float(m) * float(
        1 << (suffix_bits + 1)) / float(s_int)
    if raw <= 2.5 * m and zeros > 0:
        raw = float(m) * np.log(float(m) / float(zeros))
    return int(np.floor(raw))


def hll_distinct(sf_dir: str, p: int = HLL_P) -> pa.Table:
    """(idx, value) long form: one row per set register (idx = bucket,
    value = rho) plus the quantized estimate row (idx = -1)."""
    regs = hll_registers(sf_dir, p).to_pandas().sort_values("bucket")
    est = hll_estimate_q(regs, p)
    idx = np.concatenate(([-1], regs["bucket"].to_numpy()))
    val = np.concatenate(([est], regs["max(rho)"].to_numpy()))
    return pa.table({"idx": pa.array(idx, pa.int64()),
                     "value": pa.array(val, pa.int64())})


def hll_sql(p: int = HLL_P) -> str:
    """Oracle for ``hll_distinct``: splitmix via the sampling module's
    HUGEINT mirror, rho via length(bin()) (exact integer bit_length),
    the same exact-integer S and one-division estimate."""
    m = 1 << p
    sb = 64 - p
    alpha = _hll_alpha(m)
    return f"""
WITH h AS (
  SELECT {_mix_sql_wide('CAST(user_id AS HUGEINT)')} AS hv FROM events),
parts AS (
  SELECT CAST(hv // {1 << sb}::HUGEINT AS BIGINT) AS bucket,
         hv % {1 << sb}::HUGEINT AS suffix
  FROM h),
regs AS (
  SELECT bucket,
         max({sb} - (CASE WHEN suffix = 0 THEN 0
                          ELSE length(bin(suffix)) END) + 1) AS rho
  FROM parts GROUP BY bucket),
est AS (
  SELECT CAST(floor(
    CASE WHEN ({alpha!r}::DOUBLE * {float(m)!r}::DOUBLE * {float(m)!r}::DOUBLE
               * {float(1 << (sb + 1))!r}::DOUBLE
               / CAST(sum(power_int) + ({m} - count(*))
                      * {1 << (sb + 1)}::HUGEINT AS DOUBLE))
              <= {2.5 * m!r}::DOUBLE AND ({m} - count(*)) > 0
         THEN {float(m)!r}::DOUBLE * ln({float(m)!r}::DOUBLE
                                / CAST({m} - count(*) AS DOUBLE))
         ELSE {alpha!r}::DOUBLE * {float(m)!r}::DOUBLE * {float(m)!r}::DOUBLE
              * {float(1 << (sb + 1))!r}::DOUBLE
              / CAST(sum(power_int) + ({m} - count(*))
                     * {1 << (sb + 1)}::HUGEINT AS DOUBLE)
    END) AS BIGINT) AS est
  FROM (SELECT (1::HUGEINT << ({sb} + 1 - rho)) AS power_int FROM regs))
SELECT -1 AS idx, est AS value FROM est
UNION ALL
SELECT bucket AS idx, CAST(rho AS BIGINT) AS value FROM regs"""


# -- Count-Min ---------------------------------------------------------------

def _fnv_words(words: np.ndarray) -> np.ndarray:
    from .textstats import _word_arr_slices, fnv64_slices

    if words.size == 0:
        return np.asarray([], dtype=np.uint64)
    return fnv64_slices(*_word_arr_slices(words))


def _cm_indices(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) column indices: row j hashes mix(h + j*salt) % width
    — exact uint64 wraparound arithmetic, HUGEINT-mirrorable."""
    out = np.empty((depth, h.size), dtype=np.int64)
    for j in range(depth):
        hj = _mix(h + np.uint64((j * _CM_SALT) % (1 << 64)))
        out[j] = (hj % np.uint64(width)).astype(np.int64)
    return out


def cm_registers(sf_dir: str, depth: int = CM_DEPTH,
                 width: int = CM_WIDTH):
    """(cell, n) register dump of the Count-Min sketch over
    ``events.event_type`` (cell = row*width + col) — per-batch bincount
    partials + one bounded groupby sum."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        types = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        if types.size == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        u, inv, cnt = np.unique(types, return_inverse=True,
                                return_counts=True)
        idx = _cm_indices(_fnv_words(u), depth, width)   # (d, |u|)
        cells = (np.arange(depth)[:, None] * width + idx).ravel()
        vals = np.broadcast_to(cnt, (depth, cnt.size)).ravel()
        reg = np.zeros(depth * width, dtype=np.int64)
        np.add.at(reg, cells, vals)
        nz = np.flatnonzero(reg)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "n": pa.array(reg[nz], pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type"])
    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cell")
            .aggregate(rd.aggregate.Sum("n")))


def cm_estimates(sf_dir: str, depth: int = CM_DEPTH,
                 width: int = CM_WIDTH) -> pa.Table:
    """(idx, value) point estimates per distinct event_type (idx =
    FNV(type) >> 1 so it stays a non-negative int64; value = min over
    rows — the CM upper bound, exact when no cell collides). The point
    set comes from a DISTRIBUTED distinct (domain-sized output), never a
    driver read of the raw column."""
    import ray.data as rd

    regs = cm_registers(sf_dir, depth, width).to_pandas()
    reg = np.zeros(depth * width, dtype=np.int64)
    reg[regs["cell"].to_numpy()] = regs["sum(n)"].to_numpy()
    type_rows = (rd.read_parquet(f"{sf_dir}/events.parquet",
                                 columns=["event_type"])
                 .groupby("event_type").count().take_all())
    types = np.unique(np.asarray([r["event_type"] for r in type_rows],
                                 dtype=object))
    h = _fnv_words(types)
    idx = _cm_indices(h, depth, width)
    cells = np.arange(depth)[:, None] * width + idx
    est = reg[cells].min(axis=0)
    key = (h >> np.uint64(1)).astype(np.int64)
    order = np.argsort(key, kind="stable")
    return pa.table({"idx": pa.array(key[order], pa.int64()),
                     "value": pa.array(est[order], pa.int64())})


def cm_sql(depth: int = CM_DEPTH, width: int = CM_WIDTH) -> str:
    """Oracle CTE fragments for Count-Min: exact FNV of the distinct
    event types, the same mix(h + j*salt) % width row hashes (HUGEINT
    wraparound), register sums and min-over-rows estimates."""
    m64 = 1 << 64
    rows = ",\n".join(
        f"""cm_idx{j} AS (
  SELECT w, cnt,
         {j} * {width} + CAST(
           {_mix_sql_wide(f'((hv + {(j * _CM_SALT) % m64}::HUGEINT) '
                          f'% {m64}::HUGEINT)')} % {width} AS BIGINT)
           AS cell
  FROM cm_hash)"""
        for j in range(depth))
    unions = "\nUNION ALL\n".join(
        f"SELECT cell, cnt FROM cm_idx{j}" for j in range(depth))
    return f"""
cm_counts AS (
  SELECT event_type AS w, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type),
cm_hash AS (
  SELECT w, cnt,
         list_reduce(
            list_prepend(14695981039346656037::HUGEINT,
                         [ascii(c)::HUGEINT FOR c IN string_split(w, '')]),
            (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                      % {m64}::HUGEINT) AS hv
  FROM cm_counts),
{rows},
cm_cells AS (
  SELECT cell, CAST(sum(cnt) AS BIGINT) AS n
  FROM (\n{unions}\n) GROUP BY cell),
cm_points AS (
  SELECT CAST(h.hv // 2 AS BIGINT) AS idx,
         min(c.n) AS value
  FROM cm_hash h
       JOIN ({' UNION ALL '.join(f'SELECT w, cell FROM cm_idx{j}'
                                 for j in range(depth))}) i USING (w)
       JOIN cm_cells c USING (cell)
  GROUP BY 1)"""


# -- Bloom filter ------------------------------------------------------------

BLOOM_BITS = 4096
BLOOM_K = 3
BLOOM_PROBES = 30              # membership probes: user ids 0..29


def bloom_bits(sf_dir: str, bits: int = BLOOM_BITS, k: int = BLOOM_K):
    """Distinct set-bit dump of a Bloom filter over ``events.user_id``
    (k mix-hashes per key). Bits MERGE by OR == distinct-union, so the
    distributed build is per-batch distinct cells -> one bounded groupby
    (output <= ``bits`` rows regardless of corpus size)."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table({"cell": pa.array([], pa.int64())})
        u = np.unique(ids)
        cells = np.unique(_cm_indices(_mix(u.astype(np.uint64)), k, bits))
        return pa.table({"cell": pa.array(cells, pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("cell").count())


def bloom_probe(sf_dir: str, n_probes: int = BLOOM_PROBES,
                bits: int = BLOOM_BITS, k: int = BLOOM_K) -> pa.Table:
    """(idx, value) membership verdicts for probe keys 0..n_probes-1:
    value = 1 iff every one of the key's k bits is set (the Bloom
    'possibly present' answer; 0 is a certain miss). The bit table is
    bounded (<= ``bits`` rows), so the probe is driver-side."""
    regs = bloom_bits(sf_dir, bits, k).to_pandas()
    bitset = np.zeros(bits, dtype=bool)
    bitset[regs["cell"].to_numpy()] = True
    pids = np.arange(n_probes, dtype=np.int64)
    cells = _cm_indices(_mix(pids.astype(np.uint64)), k, bits)
    member = bitset[cells].all(axis=0).astype(np.int64)
    return pa.table({"idx": pa.array(pids, pa.int64()),
                     "value": pa.array(member, pa.int64())})


def bloom_sql(bits: int = BLOOM_BITS, k: int = BLOOM_K,
              n_probes: int = BLOOM_PROBES) -> str:
    """Oracle CTE fragments: ``bl_bits`` (distinct set cells) and
    ``bl_probe`` (per-probe all-bits-set verdicts) from the identical
    HUGEINT mix mirrors."""
    m64 = 1 << 64

    def cell_expr(src: str, j: int) -> str:
        shifted = (f"(({src} + {(j * _CM_SALT) % m64}::HUGEINT)"
                   f" % {m64}::HUGEINT)")
        return f"CAST({_mix_sql_wide(shifted)} % {bits} AS BIGINT)"

    bit_unions = "\nUNION ALL\n".join(
        f"SELECT {cell_expr('hv', j)} AS cell FROM bl_hash"
        for j in range(k))
    probe_unions = "\nUNION ALL\n".join(
        f"SELECT pid, {cell_expr('hv', j)} AS cell FROM bl_probe_hash"
        for j in range(k))
    return f"""
bl_hash AS (
  SELECT DISTINCT {_mix_sql_wide('CAST(user_id AS HUGEINT)')} AS hv
  FROM events),
bl_bits AS (
  SELECT DISTINCT cell FROM (\n{bit_unions}\n)),
bl_probe_hash AS (
  SELECT CAST(r.range AS BIGINT) AS pid,
         {_mix_sql_wide('CAST(r.range AS HUGEINT)')} AS hv
  FROM range(0, {n_probes}) r),
bl_probe AS (
  SELECT pid,
         CAST(min(CASE WHEN b.cell IS NULL THEN 0 ELSE 1 END)
              AS BIGINT) AS value
  FROM (\n{probe_unions}\n) p
  LEFT JOIN bl_bits b USING (cell)
  GROUP BY pid)"""


# -- Grouped + windowed HLL ---------------------------------------------------

_TYPE_MOD = 1 << 40            # group-key space; key*m + bucket < 2^49
US_PER_DAY = 86_400_000_000
HLL_WINDOW_DAYS = 7


def _hll_partial_max(key: np.ndarray, rho: np.ndarray) -> pa.Table:
    """Per-batch (key, rho) partial maxima: sort by (key, rho), keep the
    last row of each key run — the vectorized per-batch combiner every
    grouped register build shares."""
    order = np.lexsort((rho, key))
    k_s, r_s = key[order], rho[order]
    last = np.r_[k_s[1:] != k_s[:-1], True] if k_s.size else \
        np.asarray([], dtype=bool)
    return pa.table({"key": pa.array(k_s[last], pa.int64()),
                     "rho": pa.array(r_s[last], pa.int64())})


def _grouped_hll_registers(sf_dir: str, columns: list,
                           gkey_of, p: int = HLL_P):
    """(key = gkey*m + bucket, rho) register dump of one HLL PER GROUP —
    per-batch partial maxima + one groupby whose output is bounded by
    n_groups * m rows (domain-sized, corpus-size-independent)."""
    import ray.data as rd

    m = 1 << p
    sb = 64 - p
    mask = (np.uint64(1) << np.uint64(sb)) - np.uint64(1)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        if ids.size == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        g = gkey_of(batch)
        h = _mix(ids.astype(np.uint64))
        bucket = (h >> np.uint64(sb)).astype(np.int64)
        rho = sb - _bit_length_u64(h & mask) + 1
        return _hll_partial_max(g * m + bucket, rho)

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)
    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("key").aggregate(rd.aggregate.Max("rho")))


def _group_estimates(regs_df, p: int = HLL_P) -> tuple:
    """(gkeys, estimates) from a grouped register frame with columns
    (key, max(rho)) — driver-side finish over a domain-bounded table."""
    import pandas as pd

    m = 1 << p
    key = regs_df["key"].to_numpy()
    rho = regs_df[regs_df.columns[-1]].to_numpy()
    gkey = key // m
    out_k, out_e = [], []
    for g in np.unique(gkey):
        sub = pd.DataFrame({"rho": rho[gkey == g]})
        out_k.append(int(g))
        out_e.append(hll_estimate_q(sub, p))
    return np.asarray(out_k, dtype=np.int64), \
        np.asarray(out_e, dtype=np.int64)


def hll_by_type(sf_dir: str, p: int = HLL_P) -> tuple:
    """(registers, estimates) of one HLL per event_type (distinct users
    per type): registers long-form (idx = fnv(type)%2^40 * m + bucket,
    value = rho), estimates (idx = fnv(type)%2^40, value = floor est)."""
    def gkey_of(batch: pa.Table) -> np.ndarray:
        types = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        u, inv = np.unique(types, return_inverse=True)
        gh = (_fnv_words(u) % np.uint64(_TYPE_MOD)).astype(np.int64)
        return gh[inv]

    regs = _grouped_hll_registers(
        sf_dir, ["event_type", "user_id"], gkey_of, p
    ).to_pandas().sort_values("key")
    reg_tbl = pa.table({
        "idx": pa.array(regs["key"].to_numpy(), pa.int64()),
        "value": pa.array(regs[regs.columns[-1]].to_numpy(), pa.int64())})
    gk, est = _group_estimates(regs, p)
    est_tbl = pa.table({"idx": pa.array(gk, pa.int64()),
                        "value": pa.array(est, pa.int64())})
    return reg_tbl, est_tbl


def hll_daily_window(sf_dir: str, p: int = HLL_P,
                     window_days: int = HLL_WINDOW_DAYS) -> tuple:
    """(registers, window_estimates) of one HLL per UTC day plus the
    trailing-``window_days`` distinct-user estimate per day — the
    composition property in action: the window sketch is the max-merge
    of the daily register dumps, never a re-scan of the raw events."""
    import pandas as pd

    m = 1 << p

    def gkey_of(batch: pa.Table) -> np.ndarray:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        return (ts.astype("datetime64[us]").astype(np.int64)
                // US_PER_DAY)

    regs = _grouped_hll_registers(
        sf_dir, ["ts", "user_id"], gkey_of, p
    ).to_pandas().sort_values("key")
    reg_tbl = pa.table({
        "idx": pa.array(regs["key"].to_numpy(), pa.int64()),
        "value": pa.array(regs[regs.columns[-1]].to_numpy(), pa.int64())})

    key = regs["key"].to_numpy()
    rho = regs[regs.columns[-1]].to_numpy()
    day = key // m
    bucket = key % m
    days = np.unique(day)
    out_d, out_e = [], []
    for d in days:
        in_win = (day >= d - window_days + 1) & (day <= d)
        merged = np.zeros(m, dtype=np.int64)
        np.maximum.at(merged, bucket[in_win], rho[in_win])
        nz = merged[merged > 0]
        out_d.append(int(d))
        out_e.append(hll_estimate_q(pd.DataFrame({"rho": nz}), p))
    est_tbl = pa.table({
        "idx": pa.array(np.asarray(out_d, np.int64), pa.int64()),
        "value": pa.array(np.asarray(out_e, np.int64), pa.int64())})
    return reg_tbl, est_tbl


def _hll_group_est_sql(regs_cte: str, p: int) -> str:
    """Shared per-group estimate SELECT over a (gkey, rho) CTE: the same
    exact-integer S, one-division raw estimate and linear-counting
    small-range branch as ``hll_estimate_q``, per gkey."""
    m = 1 << p
    sb = 64 - p
    alpha = _hll_alpha(m)
    s = (f"CAST(sum(1::HUGEINT << ({sb} + 1 - rho))"
         f" + ({m} - count(*)) * {1 << (sb + 1)}::HUGEINT AS DOUBLE)")
    raw = (f"({alpha!r}::DOUBLE * {float(m)!r}::DOUBLE"
           f" * {float(m)!r}::DOUBLE * {float(1 << (sb + 1))!r}::DOUBLE"
           f" / {s})")
    lc = (f"({float(m)!r}::DOUBLE * ln({float(m)!r}::DOUBLE"
          f" / CAST({m} - count(*) AS DOUBLE)))")
    return f"""
  SELECT gkey,
         CAST(floor(CASE WHEN {raw} <= {2.5 * m!r}::DOUBLE
                          AND ({m} - count(*)) > 0
                     THEN {lc} ELSE {raw} END) AS BIGINT) AS est
  FROM {regs_cte} GROUP BY gkey"""


def grouped_hll_sql(p: int = HLL_P,
                    window_days: int = HLL_WINDOW_DAYS) -> str:
    """Oracle CTE fragments for per-type and per-day/windowed HLL:
    ``ht_regs``/``ht_est`` and ``hd_regs``/``hd_win_est``."""
    m = 1 << p
    sb = 64 - p
    m64 = 1 << 64
    fnv = ("list_reduce(list_prepend(14695981039346656037::HUGEINT,"
           "[ascii(c)::HUGEINT FOR c IN string_split(event_type, '')]),"
           "(h, b) -> (xor(h, b) * 1099511628211::HUGEINT)"
           f" % {m64}::HUGEINT)")
    rho = (f"({sb} - (CASE WHEN uh % {1 << sb}::HUGEINT = 0 THEN 0"
           f" ELSE length(bin(uh % {1 << sb}::HUGEINT)) END) + 1)")
    bucket = f"CAST(uh // {1 << sb}::HUGEINT AS BIGINT)"
    return f"""
ht_h AS (
  SELECT CAST({fnv} % {_TYPE_MOD}::HUGEINT AS BIGINT) AS gkey,
         {_mix_sql_wide('CAST(user_id AS HUGEINT)')} AS uh
  FROM events),
ht_regs AS (
  SELECT gkey, {bucket} AS bucket, max({rho}) AS rho
  FROM ht_h GROUP BY 1, 2),
ht_est AS ({_hll_group_est_sql('ht_regs', p)}),
hd_h AS (
  SELECT epoch_us(ts) // {US_PER_DAY} AS gkey,
         {_mix_sql_wide('CAST(user_id AS HUGEINT)')} AS uh
  FROM events),
hd_regs AS (
  SELECT gkey, {bucket} AS bucket, max({rho}) AS rho
  FROM hd_h GROUP BY 1, 2),
hd_win AS (
  SELECT d.gkey AS gkey, r.bucket, max(r.rho) AS rho
  FROM (SELECT DISTINCT gkey FROM hd_regs) d
  JOIN hd_regs r
    ON r.gkey BETWEEN d.gkey - {window_days - 1} AND d.gkey
  GROUP BY 1, 2),
hd_win_est AS ({_hll_group_est_sql('hd_win', p)})"""


def sketch_suite(sf_dir: str) -> pa.Table:
    """HLL + Count-Min under one window slot: variant-tagged (idx,
    value) long-form rows — HLL registers + estimate, CM register dump,
    CM per-type point estimates."""
    regs = cm_registers(sf_dir).to_pandas().sort_values("cell")
    cm_regs = pa.table({
        "idx": pa.array(regs["cell"].to_numpy(), pa.int64()),
        "value": pa.array(regs["sum(n)"].to_numpy(), pa.int64())})
    bl = bloom_bits(sf_dir).to_pandas().sort_values("cell")
    bl_regs = pa.table({
        "idx": pa.array(bl["cell"].to_numpy(), pa.int64()),
        "value": pa.array(np.ones(len(bl), np.int64), pa.int64())})
    ht_regs, ht_est = hll_by_type(sf_dir)
    hd_regs, hd_est = hll_daily_window(sf_dir)
    parts = [
        ("hll", hll_distinct(sf_dir)),
        ("cm_registers", cm_regs),
        ("cm_estimates", cm_estimates(sf_dir)),
        ("bloom_bits", bl_regs),
        ("bloom_probe", bloom_probe(sf_dir)),
        ("hll_type", ht_regs),
        ("hll_type_est", ht_est),
        ("hll_day", hd_regs),
        ("hll_window_est", hd_est),
        ("exact_distinct", exact_distinct_by_type(sf_dir)),
        ("kmv", kmv_distinct_words(sf_dir).to_pandas().pipe(
            lambda d: pa.table({"idx": pa.array(d["k"], pa.int64()),
                                "value": pa.array(d["est"],
                                                  pa.int64())}))),
    ]
    # KMV pair algebra: idx packs the synthetic 'srcN' numbers (the
    # standalone `kmv_source_ops` entry keeps the general string keys)
    ko = kmv_source_ops(sf_dir).to_pandas()
    pair_idx = (ko["src_a"].str[3:].astype(int) * 1000
                + ko["src_b"].str[3:].astype(int)).to_numpy()
    for metric, variant in (("est_union", "kmv_union"),
                            ("est_inter", "kmv_inter")):
        parts.append((variant, pa.table({
            "idx": pa.array(pair_idx, pa.int64()),
            "value": pa.array(ko[metric].to_numpy(), pa.int64())})))
    # AMS F2: the R counters plus (idx 0 = median estimate, 1 = exact)
    from .ams import ams_f2
    at = ams_f2(sf_dir)
    parts.append(("ams_counters", pa.table({
        "idx": at["j"], "value": at["s"]})))
    parts.append(("ams_f2", pa.table({
        "idx": pa.array([0, 1], pa.int64()),
        "value": pa.array([at["f2_est"][0].as_py(),
                           at["f2_exact"][0].as_py()], pa.int64())})))
    out = []
    for variant, t in parts:
        out.append(t.add_column(0, "variant", pa.array(
            [variant] * t.num_rows, pa.string())))
    return pa.concat_tables(out)


def sketch_suite_sql() -> str:
    from .ams import ams_f2_sql

    m = 1 << HLL_P
    return f"""WITH {cm_sql()},
{bloom_sql().lstrip()},
{grouped_hll_sql().lstrip()}
SELECT 'cm_registers' AS variant, cell AS idx, n AS value FROM cm_cells
UNION ALL
SELECT 'cm_estimates' AS variant, idx, value FROM cm_points
UNION ALL
SELECT 'hll' AS variant, idx, value FROM (\n{hll_sql()}\n)
UNION ALL
SELECT 'bloom_bits' AS variant, cell AS idx, 1::BIGINT AS value
FROM bl_bits
UNION ALL
SELECT 'bloom_probe' AS variant, pid AS idx, value FROM bl_probe
UNION ALL
SELECT 'hll_type' AS variant, gkey * {m} + bucket AS idx,
       CAST(rho AS BIGINT) AS value FROM ht_regs
UNION ALL
SELECT 'hll_type_est' AS variant, gkey AS idx, est AS value FROM ht_est
UNION ALL
SELECT 'hll_day' AS variant, gkey * {m} + bucket AS idx,
       CAST(rho AS BIGINT) AS value FROM hd_regs
UNION ALL
SELECT 'hll_window_est' AS variant, gkey AS idx, est AS value
FROM hd_win_est
UNION ALL
SELECT 'exact_distinct' AS variant, idx, value
FROM (\n{exact_distinct_sql()}\n)
UNION ALL
SELECT 'kmv' AS variant, k AS idx, est AS value
FROM (\n{kmv_sql()}\n)
UNION ALL
SELECT 'kmv_union' AS variant,
       CAST(substr(src_a, 4) AS BIGINT) * 1000
         + CAST(substr(src_b, 4) AS BIGINT) AS idx,
       est_union AS value FROM (\n{kmv_source_ops_sql()}\n)
UNION ALL
SELECT 'kmv_inter' AS variant,
       CAST(substr(src_a, 4) AS BIGINT) * 1000
         + CAST(substr(src_b, 4) AS BIGINT) AS idx,
       est_inter AS value FROM (\n{kmv_source_ops_sql()}\n)
UNION ALL
SELECT 'ams_counters' AS variant, j AS idx, s AS value
FROM (\n{ams_f2_sql()}\n)
UNION ALL
SELECT 'ams_f2' AS variant, CAST(j AS BIGINT) AS idx,
       CASE WHEN j = 0 THEN f2_est ELSE f2_exact END AS value
FROM (\n{ams_f2_sql()}\n) WHERE j < 2"""


# ---------------------------------------------------------------------------
# Exact grouped COUNT DISTINCT — the ground-truth companion to
# ``hll_by_type``: same idx space (fnv(type) % 2^40), so estimate vs
# truth per group is a join away. Per-batch pair dedup bounds each
# partial at the batch's distinct (type, user) pairs; ONE exchange
# keyed by the pair co-locates every copy for exact partition-local
# dedup, and the per-group fold is an output-sized groupby-sum.
# ---------------------------------------------------------------------------

def exact_distinct_by_type(sf_dir: str) -> pa.Table:
    """(idx = fnv(event_type) % 2^40, value = exact distinct users)."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def pair_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({"gkey": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        types = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        u, inv = np.unique(types, return_inverse=True)
        gh = (_fnv_words(u) % np.uint64(_TYPE_MOD)).astype(np.int64)
        g = gh[inv]
        uid = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((uid, g))
        g, uid = g[order], uid[order]
        new = np.empty(g.size, dtype=bool)
        new[0] = True
        new[1:] = (g[1:] != g[:-1]) | (uid[1:] != uid[:-1])
        return pa.table({"gkey": pa.array(g[new], pa.int64()),
                         "user_id": pa.array(uid[new], pa.int64())})

    def count_partition(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "value": pa.array([], pa.int64())})
        g = tbl["gkey"].to_numpy(zero_copy_only=False)
        uid = tbl["user_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, g))
        g, uid = g[order], uid[order]
        new = np.empty(g.size, dtype=bool)
        new[0] = True
        new[1:] = (g[1:] != g[:-1]) | (uid[1:] != uid[:-1])
        g = g[new]
        gnew = np.empty(g.size, dtype=bool)
        gnew[0] = True
        gnew[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(gnew)
        counts = np.diff(np.append(starts, g.size))
        return pa.table({"idx": pa.array(g[gnew], pa.int64()),
                         "value": pa.array(counts.astype(np.int64),
                                           pa.int64())})

    parts = ds.map_batches(pair_partials, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = exchange_by_key(parts, ["gkey", "user_id"], count_partition)
    agg = out.groupby("idx").sum("value").to_pandas().sort_values("idx")
    return pa.table({
        "idx": pa.array(agg["idx"].to_numpy(), pa.int64()),
        "value": pa.array(agg["sum(value)"].to_numpy(), pa.int64())})


def exact_distinct_sql() -> str:
    """Oracle for ``exact_distinct_by_type``."""
    m64 = 1 << 64
    fnv = ("list_reduce(list_prepend(14695981039346656037::HUGEINT,"
           "[ascii(c)::HUGEINT FOR c IN string_split(event_type, '')]),"
           "(h, b) -> (xor(h, b) * 1099511628211::HUGEINT)"
           f" % {m64}::HUGEINT)")
    return f"""
SELECT CAST({fnv} % {_TYPE_MOD}::HUGEINT AS BIGINT) AS idx,
       CAST(count(DISTINCT user_id) AS BIGINT) AS value
FROM events GROUP BY event_type"""


# -- KMV (k minimum values) distinct-count sketch ----------------------------
# The bottom-k order-statistics estimator (Bar-Yossef et al. 2002): keep
# the k smallest distinct word hashes; with h_k the k-th smallest on the
# [0, 2^64) line, distinct ~= (k-1) * 2^64 / h_k. Fully mergeable
# (bottom-k of bottom-k's), integer-exact (one HUGEINT floor-division),
# and engine-independent under the shared FNV word hash — so unlike the
# float HLL estimate, the KMV estimate itself is DuckDB hash-matched.

KMV_K = 256


def _kmv_partial(batch: pa.Table, k: int) -> pa.Table:
    texts = batch["text"].to_pylist()
    words = np.unique(np.concatenate(
        [np.asarray((t or "").split(" ")) for t in texts])) \
        if texts else np.asarray([], dtype=object)
    h = np.unique(_fnv_words(words))
    return pa.table({"h": pa.array(h[:k], pa.uint64()),
                     "one": pa.array(np.zeros(min(h.size, k), np.int64),
                                     pa.int64())})


def _kmv_final(tbl: pa.Table, k: int) -> pa.Table:
    h = np.unique(tbl["h"].to_numpy(zero_copy_only=False))
    if h.size >= k:
        hk = int(h[k - 1])
        est = ((k - 1) << 64) // hk
    else:                       # fewer distinct hashes than k: exact
        est = int(h.size)
    return pa.table({"k": pa.array([k], pa.int64()),
                     "est": pa.array([est], pa.int64())})


def kmv_distinct_words(sf_dir: str, k: int = KMV_K):
    """KMV distinct-word estimate -> one row (k, est). Per-batch
    bottom-k of the batch's distinct word hashes (bounded partials), one
    single-partition exchange merge."""
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    parts = ds.map_batches(_kmv_partial, fn_kwargs={"k": k},
                           batch_format="pyarrow", zero_copy_batch=True)
    return exchange_by_key(parts, "one", _kmv_final,
                           proc_kwargs={"k": k}, n_parts=1)


def kmv_sql(k: int = KMV_K) -> str:
    """Oracle: k-th smallest distinct FNV word hash -> the same HUGEINT
    floor-division estimate (or the exact distinct count when the
    vocabulary is smaller than k)."""
    return f"""
WITH w AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents),
h AS (
  SELECT DISTINCT list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
                        [ascii(c)::HUGEINT FOR c IN string_split(w, '')]),
           (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                     % 18446744073709551616::HUGEINT) AS h
  FROM w),
nv AS (SELECT CAST(count(*) AS BIGINT) AS n FROM h),
kth AS (SELECT h FROM h ORDER BY h LIMIT 1 OFFSET {k - 1})
SELECT {k} AS k,
       CAST(CASE WHEN nv.n < {k} THEN nv.n::HUGEINT
                 ELSE ({k - 1}::HUGEINT * 18446744073709551616::HUGEINT)
                      // kth.h
            END AS BIGINT) AS est
FROM nv LEFT JOIN kth ON TRUE"""


# ---------------------------------------------------------------------------
# KMV sketch ALGEBRA (Beyer et al., SIGMOD 2007): per-source bottom-k
# sketches support union/intersection estimates between any source pair
# without revisiting the data — the mergeable-summary property that makes
# KMV a cluster primitive rather than a one-shot estimator. Sketches are
# sources x k rows by construction (that boundedness is the point), so the
# pairwise combine runs on the driver; the corpus is touched exactly once.
# ---------------------------------------------------------------------------

def _kmv_source_partial(batch: pa.Table, k: int) -> pa.Table:
    """Per-batch per-source bottom-k distinct word hashes."""
    empty = pa.table({"source": pa.array([], pa.string()),
                      "shash": pa.array([], pa.uint64()),
                      "h": pa.array([], pa.uint64())})
    if batch.num_rows == 0:
        return empty
    src = np.asarray(batch["source"].to_pylist(), dtype=object)
    texts = batch["text"].to_pylist()
    per_doc = [np.unique(np.asarray((t or "").split(" "), dtype=object))
               for t in texts]
    words = np.concatenate(per_doc)
    sidx = np.repeat(np.arange(len(per_doc)), [a.size for a in per_doc])
    h = _fnv_words(words)
    su, sinv = np.unique(src, return_inverse=True)
    sh = _fnv_words(su)
    g = sinv[sidx]
    order = np.lexsort((h, g))
    g_s, h_s = g[order], h[order]
    keep = np.ones(g_s.size, dtype=bool)
    keep[1:] = (g_s[1:] != g_s[:-1]) | (h_s[1:] != h_s[:-1])
    g_s, h_s = g_s[keep], h_s[keep]
    # bottom-k within each source segment
    starts = np.flatnonzero(np.concatenate(
        ([True], g_s[1:] != g_s[:-1])))
    rank = np.arange(g_s.size) - np.repeat(
        starts, np.diff(np.append(starts, g_s.size)))
    kmask = rank < k
    g_k, h_k = g_s[kmask], h_s[kmask]
    return pa.table({"source": pa.array(su[g_k].tolist(), pa.string()),
                     "shash": pa.array(sh[g_k], pa.uint64()),
                     "h": pa.array(h_k, pa.uint64())})


def _kmv_source_final(tbl: pa.Table, k: int) -> pa.Table:
    """Merge a source's partials: distinct hashes, keep bottom-k."""
    if tbl.num_rows == 0:
        return pa.table({"source": pa.array([], pa.string()),
                         "h": pa.array([], pa.uint64())})
    src = np.asarray(tbl["source"].to_pylist(), dtype=object)
    h = tbl["h"].to_numpy(zero_copy_only=False)
    order = np.lexsort((h, src))
    s_s, h_s = src[order], h[order]
    keep = np.ones(s_s.size, dtype=bool)
    keep[1:] = (s_s[1:] != s_s[:-1]) | (h_s[1:] != h_s[:-1])
    s_s, h_s = s_s[keep], h_s[keep]
    starts = np.flatnonzero(np.concatenate(
        ([True], s_s[1:] != s_s[:-1])))
    rank = np.arange(s_s.size) - np.repeat(
        starts, np.diff(np.append(starts, s_s.size)))
    kmask = rank < k
    return pa.table({"source": pa.array(s_s[kmask].tolist(), pa.string()),
                     "h": pa.array(h_s[kmask], pa.uint64())})


def kmv_source_sketches(sf_dir: str, k: int = KMV_K) -> pa.Table:
    """(source, h): the per-source bottom-k sketch — one corpus pass,
    bounded output (sources x k)."""
    import ray
    import ray.data as rd

    from .exchange import exchange_by_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])
    parts = ds.map_batches(_kmv_source_partial, fn_kwargs={"k": k},
                           batch_format="pyarrow", zero_copy_batch=True)
    out = exchange_by_key(parts, "shash", _kmv_source_final,
                          proc_kwargs={"k": k})
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"source": pa.array([], pa.string()),
                         "h": pa.array([], pa.uint64())})
    return pa.concat_tables(tabs, promote_options="default")


def kmv_source_ops(sf_dir: str, k: int = KMV_K) -> pa.Table:
    """(src_a, src_b, est_union, est_inter) for every ordered source
    pair, from the per-source KMV sketches alone (Beyer et al. 2007):
    tau = k-th smallest of the combined sketch, union = (k-1)*2^64 //
    tau (exact when the combined sketch is complete), intersection =
    matches-under-tau scaled by union/k_eff — all integer arithmetic,
    reproduced verbatim by the oracle."""
    t = kmv_source_sketches(sf_dir, k)
    src = np.asarray(t["source"].to_pylist(), dtype=object)
    h = t["h"].to_numpy(zero_copy_only=False)
    names = sorted(set(src.tolist()))
    sk = {s: np.sort(h[src == s]) for s in names}
    out_a, out_b, out_u, out_i = [], [], [], []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ka, kb = sk[a], sk[b]
            union = np.union1d(ka, kb)
            tot = int(union.size)
            k_eff = min(k, tot)
            tau = int(union[k_eff - 1])
            est_u = tot if tot < k else ((k - 1) << 64) // tau
            inter = np.intersect1d(ka, kb)
            n_match = int((inter <= tau).sum())
            est_i = (n_match * est_u) // k_eff
            out_a.append(a)
            out_b.append(b)
            out_u.append(est_u)
            out_i.append(est_i)
    return pa.table({"src_a": pa.array(out_a, pa.string()),
                     "src_b": pa.array(out_b, pa.string()),
                     "est_union": pa.array(out_u, pa.int64()),
                     "est_inter": pa.array(out_i, pa.int64())})


def kmv_source_ops_sql(k: int = KMV_K) -> str:
    return f"""
WITH kv_w AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
  FROM documents),
kv_h AS (
  SELECT DISTINCT source, list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
                        [ascii(c)::HUGEINT FOR c IN string_split(w, '')]),
           (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
                     % 18446744073709551616::HUGEINT) AS h
  FROM kv_w),
kv_sk AS (
  SELECT source, h
  FROM (SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM kv_h) WHERE rn <= {k}),
kv_pairs AS (
  SELECT a.source AS sa, b.source AS sb
  FROM (SELECT DISTINCT source FROM kv_sk) a
  JOIN (SELECT DISTINCT source FROM kv_sk) b ON a.source < b.source),
kv_comb AS (
  SELECT p.sa, p.sb, s.h,
         CAST(count(DISTINCT s.source) AS BIGINT) AS nsrc
  FROM kv_pairs p JOIN kv_sk s ON s.source IN (p.sa, p.sb)
  GROUP BY 1, 2, 3),
kv_rank AS (
  SELECT sa, sb, h, nsrc,
         row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY sa, sb) AS tot
  FROM kv_comb),
kv_tau AS (
  SELECT sa, sb, max(tot) AS tot,
         least(max(tot), {k}) AS k_eff,
         max(CASE WHEN rn = least(tot, {k}) THEN h END) AS tau
  FROM kv_rank GROUP BY 1, 2),
kv_est AS (
  SELECT t.sa, t.sb, t.k_eff,
         CASE WHEN t.tot < {k} THEN t.tot::HUGEINT
              ELSE ({k - 1}::HUGEINT * 18446744073709551616::HUGEINT)
                   // t.tau END AS est_u,
         (SELECT CAST(count(*) AS BIGINT) FROM kv_rank r
          WHERE r.sa = t.sa AND r.sb = t.sb AND r.nsrc = 2
            AND r.h <= t.tau) AS n_match
  FROM kv_tau t)
SELECT sa AS src_a, sb AS src_b,
       CAST(est_u AS BIGINT) AS est_union,
       CAST((n_match::HUGEINT * est_u) // k_eff AS BIGINT) AS est_inter
FROM kv_est"""


# ---------------------------------------------------------------------------
# Exact pairwise Jaccard between event-type user sets via the BITMASK-
# COMBINATION histogram: one per-user type-bitmask fold (users bounded
# per partition; combos bounded at 2^|types|), then every pairwise
# |A∩B| / |A∪B| reads off the 32-row combo table — the exact
# ground-truth the KMV set-operation estimates (`kmv_source_ops`)
# approximate, at histogram cost instead of sort cost.
# ---------------------------------------------------------------------------


def _bitmask_partial(batch: pa.Table) -> pa.Table:
    uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
        np.int64)
    et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    ut, ti = np.unique(et.astype(str), return_inverse=True)
    uu, ui = np.unique(uid, return_inverse=True)
    # per-(user, type-name) presence -> emit (user, type) pairs
    key = np.unique(ui * np.int64(64) + ti)
    return pa.table({
        "user_id": pa.array(uu[key // 64], pa.int64()),
        "t": pa.array([str(ut[i]) for i in (key % 64)], pa.string()),
    })


def type_user_jaccard(sf_dir: str) -> pa.Table:
    """(type_a, type_b, n_inter, n_union, jaccard_ppm): EXACT Jaccard
    similarity between every event-type pair's user sets, computed
    from the bounded per-user bitmask histogram — DuckDB
    hash-matched."""
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    # distinct (user, type) then per-user bitmask histogram
    pairs = (ds.map_batches(_bitmask_partial, batch_format="pyarrow")
             .groupby(["user_id", "t"]).count())

    def mask_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        t = np.asarray(batch["t"].to_pylist(), dtype=object)
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "t": pa.array(t.tolist(), pa.string()),
        })

    tbl = pa.concat_tables(
        [t for t in ray.get(
            pairs.map_batches(mask_partial, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows],
        promote_options="default")
    uid = tbl["user_id"].to_numpy(zero_copy_only=False)
    t = np.asarray(tbl["t"].to_pylist(), dtype=object)
    types = sorted(set(t.tolist()))
    tidx = {v: i for i, v in enumerate(types)}
    ti = np.array([tidx[v] for v in t], np.int64)
    uu, ui = np.unique(uid, return_inverse=True)
    masks = np.zeros(uu.size, np.int64)
    np.bitwise_or.at(masks, ui, np.int64(1) << ti)
    um, cnt = np.unique(masks, return_counts=True)
    out = {"type_a": [], "type_b": [], "n_inter": [], "n_union": [],
           "jaccard_ppm": []}
    for a in range(len(types)):
        for b in range(a + 1, len(types)):
            ba, bb = 1 << a, 1 << b
            inter = int(cnt[(um & ba > 0) & (um & bb > 0)].sum())
            union = int(cnt[(um & ba > 0) | (um & bb > 0)].sum())
            out["type_a"].append(types[a])
            out["type_b"].append(types[b])
            out["n_inter"].append(inter)
            out["n_union"].append(union)
            out["jaccard_ppm"].append(
                inter * 1_000_000 // union if union else 0)
    return pa.table({
        "type_a": pa.array(out["type_a"], pa.string()),
        "type_b": pa.array(out["type_b"], pa.string()),
        "n_inter": pa.array(out["n_inter"], pa.int64()),
        "n_union": pa.array(out["n_union"], pa.int64()),
        "jaccard_ppm": pa.array(out["jaccard_ppm"], pa.int64()),
    })


def type_user_jaccard_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
t AS (SELECT DISTINCT event_type FROM events),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM t a JOIN t b ON a.event_type < b.event_type),
s AS (
  SELECT p.type_a, p.type_b,
         CAST((SELECT count(*) FROM d x JOIN d y
               ON x.user_id = y.user_id
               WHERE x.event_type = p.type_a
                 AND y.event_type = p.type_b) AS BIGINT) AS n_inter,
         CAST((SELECT count(DISTINCT user_id) FROM d
               WHERE event_type IN (p.type_a, p.type_b))
              AS BIGINT) AS n_union
  FROM p)
SELECT type_a, type_b, n_inter, n_union,
       CAST(CASE WHEN n_union > 0
                 THEN n_inter * 1000000 // n_union
                 ELSE 0 END AS BIGINT) AS jaccard_ppm
FROM s ORDER BY type_a, type_b"""
