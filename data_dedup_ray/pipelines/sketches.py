"""Mergeable streaming sketches: HyperLogLog distinct-count registers and
a Count-Min frequency sketch.

Complements the EXACT heavy-hitter pipeline (pipelines/heavy.py,
Misra-Gries): these are the constant-size summaries a 100 TB crawl keeps
PER SHARD and merges — distinct-page estimates per crawl slice (HLL,
Flajolet et al. 2007) and approximate token frequencies with a one-sided
error bound (CMS, Cormode & Muthukrishnan 2005).  Both sketches are
trivially mergeable (elementwise max / elementwise sum), which tests pin
exactly: sketch(A ∪ B) == merge(sketch(A), sketch(B)).

Oracle strategy: the REGISTER TABLES are pure integer functions of the
input (md5-derived bucket/rank / cell assignments), so both sketches have
exact DuckDB twins — the same pattern as the classifier's md5-derived
weights.  The float ESTIMATES derived from the registers are rows-only,
pinned by error-bound tests against exact distinct counts.

Scale shape: each batch reduces to a bounded partial (≤2^b register rows /
≤depth·width cells) before anything is shuffled; the global merge is a
groupby over sketch-sized — not corpus-sized — rows.  The md5 row hash is
the SQL-parity choice (the digest cost class the exact cascade already
pays per row); a throughput-first deployment would swap a 64-bit
vectorized hash behind the same register layout.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray.data

#: md5 hex chars used for the HLL hash → 60-bit values (fits BIGINT for
#: the DuckDB twin: CAST('0x' || substr(md5(v),1,15) AS BIGINT))
_HLL_HEX = 15
_HLL_BITS = 4 * _HLL_HEX


def _hll_partial(b: int, col: str):
    m = 1 << b
    rest_bits = _HLL_BITS - b
    rest_mask = (1 << rest_bits) - 1

    def fn(t: pa.Table) -> pa.Table:
        vals = t[col].to_pylist()
        if not vals:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "max_rho": pa.array([], pa.int64())})
        h = np.array(
            [int(hashlib.md5(("" if v is None else v).encode("utf-8"))
                 .hexdigest()[:_HLL_HEX], 16) for v in vals],
            dtype=np.int64,
        )
        bucket = h >> rest_bits
        rest = h & rest_mask
        # exact for rest < 2^53: floor(log2(x)) + 1 == bit_length(x)
        bitlen = np.zeros(len(rest), dtype=np.int64)
        nz = rest > 0
        bitlen[nz] = np.floor(np.log2(rest[nz])).astype(np.int64) + 1
        rho = rest_bits - bitlen + 1
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        got = np.nonzero(regs)[0]
        return pa.table({"bucket": pa.array(got.astype(np.int64)),
                         "max_rho": pa.array(regs[got])})

    return fn


def hll_registers(ds: ray.data.Dataset, *, col: str = "text",
                  b: int = 8) -> ray.data.Dataset:
    """``(bucket, max_rho)`` — the observed HyperLogLog registers of the
    distinct values of ``col`` (2^b buckets; absent rows mean register 0).

    Each batch collapses to ≤2^b partial rows before the (tiny) merge."""
    partial = ds.map_batches(_hll_partial(b, col), batch_format="pyarrow")
    merged = partial.groupby("bucket").max("max_rho")
    return merged.map_batches(
        lambda t: pa.table({
            "bucket": t["bucket"].combine_chunks().cast(pa.int64()),
            "max_rho": t["max(max_rho)"].combine_chunks().cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def merge_hll(*register_frames: pd.DataFrame) -> pd.DataFrame:
    """Union of sketches = elementwise max of registers (exact)."""
    cat = pd.concat(register_frames, ignore_index=True)
    out = (cat.groupby("bucket", as_index=False)["max_rho"].max()
           .sort_values("bucket").reset_index(drop=True))
    return out


def hll_estimate(registers: pd.DataFrame, *, b: int = 8) -> float:
    """Standard HLL estimator with the small-range correction
    (Flajolet et al. 2007 Fig. 3); registers is sketch-sized, driver-safe."""
    m = 1 << b
    regs = np.zeros(m, dtype=np.int64)
    if len(registers):
        regs[registers["bucket"].to_numpy()] = registers["max_rho"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    return float(e)


# --------------------------------------------------------------------------
# Count-Min sketch over token occurrences
# --------------------------------------------------------------------------


def _cms_partial(depth: int, width: int):
    def fn(t: pa.Table) -> pa.Table:
        s = pl.from_arrow(t["text"].combine_chunks()).str.to_lowercase()
        toks = s.str.extract_all(r"[a-z0-9]+").explode().drop_nulls()
        if not len(toks):
            return pa.table({"depth": pa.array([], pa.int64()),
                             "col": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        vc = toks.value_counts()
        terms = vc[vc.columns[0]].to_list()
        counts = vc["count"].to_numpy().astype(np.int64)
        cells = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            cols = np.array(
                [int(hashlib.md5(f"{d}|{term}".encode("utf-8"))
                     .hexdigest()[:8], 16) % width for term in terms],
                dtype=np.int64,
            )
            np.add.at(cells[d], cols, counts)
        dd, cc = np.nonzero(cells)
        return pa.table({"depth": pa.array(dd.astype(np.int64)),
                         "col": pa.array(cc.astype(np.int64)),
                         "cnt": pa.array(cells[dd, cc])})

    return fn


def cms_token_counts(sf_dir: str, *, depth: int = 4,
                     width: int = 64) -> ray.data.Dataset:
    """``(depth, col, cnt)`` — the non-zero cells of a Count-Min sketch
    over every token occurrence in ``documents`` (row hash d of token =
    md5("d|token") mod width).  Point estimates are one-sided:
    ``min_d cnt[d][h_d(tok)] ≥ true count`` always, and exceeds it by
    more than 2N/width with probability ≤ 2^-depth."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    partial = docs.map_batches(
        _cms_partial(depth, width), batch_format="pyarrow")
    merged = partial.groupby(["depth", "col"]).sum("cnt")
    return merged.map_batches(
        lambda t: pa.table({
            "depth": t["depth"].combine_chunks().cast(pa.int64()),
            "col": t["col"].combine_chunks().cast(pa.int64()),
            "cnt": t["sum(cnt)"].combine_chunks().cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def merge_cms(*cell_frames: pd.DataFrame) -> pd.DataFrame:
    """Union of sketches = elementwise SUM of cells (CMS is linear)."""
    cat = pd.concat(cell_frames, ignore_index=True)
    return (cat.groupby(["depth", "col"], as_index=False)["cnt"].sum()
            .sort_values(["depth", "col"]).reset_index(drop=True))


def cms_point_estimate(cells: pd.DataFrame, term: str, *,
                       depth: int = 4, width: int = 64) -> int:
    """min over rows of the term's cells — the CMS frequency estimate."""
    lut = {(int(d), int(c)): int(n) for d, c, n in
           zip(cells["depth"], cells["col"], cells["cnt"])}
    est = None
    for d in range(depth):
        col = int(hashlib.md5(f"{d}|{term}".encode("utf-8"))
                  .hexdigest()[:8], 16) % width
        v = lut.get((d, col), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)


def hll_registers_sql(source: str = "web_pages", *, col: str = "text",
                      b: int = 8) -> str:
    """DuckDB twin of ``hll_registers`` over relation ``source`` (WITH-free
    so corpus CTE wrappers can prefix it)."""
    rest_bits = _HLL_BITS - b
    return f"""
SELECT hv >> {rest_bits} AS bucket,
       MAX(CASE WHEN (hv & ((1::BIGINT << {rest_bits}) - 1)) = 0
                THEN {rest_bits + 1}
                ELSE {rest_bits}
                     - length(bin(hv & ((1::BIGINT << {rest_bits}) - 1)))
                     + 1 END) AS max_rho
FROM (SELECT CAST(('0x' || substr(md5({col}), 1, {_HLL_HEX})) AS BIGINT)
        AS hv FROM {source})
GROUP BY 1"""


def cms_token_counts_sql(*, depth: int = 4, width: int = 64) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
cells AS (
  SELECT g.d AS depth,
         CAST(('0x' || substr(md5(CAST(g.d AS VARCHAR) || '|' || term),
                              1, 8)) AS BIGINT) % {width} AS col
  FROM toks, UNNEST(generate_series(0, {depth - 1})) AS g(d))
SELECT depth, col, CAST(count(*) AS BIGINT) AS cnt
FROM cells GROUP BY 1, 2"""


def hll_raw_estimate(ds: ray.data.Dataset, *, col: str = "text",
                     b: int = 8) -> ray.data.Dataset:
    """``(m, n_zero_registers, estimate)`` — the RAW HLL estimator
    (Flajolet et al. 2007, no small-range correction) as ONE exact
    integer: with rational ``α_m = 7213·m / (10⁴·(1 + 1079/(10³·m)))``
    and ``Z = Σ_j 2^{−M_j} = Z_num / 2^R`` (``R = max M_j``, ``Z_num``
    an exact integer),

        estimate = ⌊ 7213·m³·2^R / (10·(1000·m + 1079)·Z_num) ⌋ —

    no float ever, so the SQL twin reproduces it bit-for-bit
    (``hll_raw_estimate_sql``).  The float path with the log-based
    small-range correction stays ``hll_estimate`` (rows-only, pinned
    by the error-bound test); ``n_zero_registers`` is reported so a
    reader can tell when the correction regime would have applied."""
    regs = hll_registers(ds, col=col, b=b).to_pandas()
    m = 1 << b
    arr = np.zeros(m, dtype=np.int64)
    if len(regs):
        arr[regs["bucket"].to_numpy()] = regs["max_rho"].to_numpy()
    R = int(arr.max())
    z_num = int(sum(1 << (R - int(r)) for r in arr))
    est = (7213 * m ** 3 * (1 << R)) // (10 * (1000 * m + 1079) * z_num)
    return ray.data.from_arrow(pa.table({
        "m": pa.array([m], pa.int64()),
        "n_zero_registers": pa.array([int((arr == 0).sum())],
                                     pa.int64()),
        "estimate": pa.array([est], pa.int64()),
    }))


def hll_raw_estimate_sql(source: str = "web_pages", *, col: str = "text",
                         b: int = 8) -> str:
    """DuckDB twin of ``hll_raw_estimate``: the registers CTE, zeros
    filled over the full bucket range, ``2^(R−reg)`` via
    ``power(2, ·)`` (powers of two are exact doubles up to 2¹⁰²³ —
    cast back to HUGEINT loss-free), and the single integer floor
    division."""
    m = 1 << b
    return f"""
regs AS ({hll_registers_sql(source, col=col, b=b)}),
allregs AS (
  SELECT g.i AS bucket, coalesce(r.max_rho, 0) AS reg
  FROM UNNEST(generate_series(0, {m - 1})) AS g(i)
  LEFT JOIN regs r ON r.bucket = g.i),
mx AS (SELECT max(reg) AS R FROM allregs),
z AS (SELECT CAST(sum(CAST(power(2, mx.R - reg) AS HUGEINT))
              AS HUGEINT) AS z_num
      FROM allregs, mx)
SELECT CAST({m} AS BIGINT) AS m,
       (SELECT CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM allregs) AS n_zero_registers,
       CAST(CAST(7213 AS HUGEINT) * {m ** 3}
            * CAST(power(2, mx.R) AS HUGEINT)
            // (10 * (1000 * {m} + 1079) * z.z_num)
            AS BIGINT) AS estimate
FROM mx, z"""
