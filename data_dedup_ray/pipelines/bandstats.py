"""LSH band observability — the skew dashboard an operator reads
BEFORE tuning ``group_cap`` / skew-split thresholds on a new corpus:
per band, how many buckets exist, how hot the hottest bucket is, and
how many candidate pairs the band would emit pre-cap.

The engine's near-dup shuffles are keyed on ``(band_id, band_hash)``;
one pathological bucket (a boilerplate band shared by millions of
pages) is THE way a 100 TB run falls over.  ``lsh_band_stats`` measures
exactly that distribution without running the pair stage:

- per-batch partial: group the stage's exploded band rows to
  ``(band_id, band_hash, n)`` counts — the only rows that shuffle
  (bucket-count-sized, never doc-sized);
- ONE exchange keyed on the engine-wide ``band_partition`` hash makes
  each ``(band_id, band_hash)`` bucket whole in exactly one partition,
  so per-partition rollups (bucket count, max bucket, Σ C(sz,2)) are
  globally additive / max-able;
- the final per-band reduce runs over ``n_bands × P`` partial rows —
  42·P at the defaults, driver-safe at any corpus size.

``n_cand_pairs`` is the PRE-CAP candidate volume (what the band would
emit with no ``group_cap`` star fallback) — the number to compare
against the cap; int64 holds it to ~4.3e9 docs per single bucket,
far past any bucket the cap would let through.

SQL twin: the sha-token signature chain (``sigstore.sig_chain_ctes``,
single-corpus form) extended by the band combine restated bit-for-bit —
``band_hash = Σ_j sig[b·r+j]·BC[j] mod 2⁶⁴`` with the exact rng-derived
``BC`` multipliers inlined and each 64×64-bit product decomposed
HUGEINT-safe exactly like the permutation products.

Reference anchor: generalizes the reference's per-level collision
counters (lib/Data/Dedup/Engine.pm count_collisions — SURVEY §2.3) to
the LSH regime: the same "how selective is each blocking level"
telemetry, per band instead of per digest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange
from data_dedup_ray.stages.minhash import MinHashLSH, band_partition
from data_dedup_ray.util import stage_task

_PARTIAL_SCHEMA = pa.schema([
    ("band_id", pa.int32()), ("n_rows", pa.int64()),
    ("n_buckets", pa.int64()), ("max_bucket", pa.int64()),
    ("n_dup_buckets", pa.int64()), ("n_cand_pairs", pa.int64()),
])


def _batch_partial(t: pa.Table) -> pa.Table:
    """Exploded band rows → (band_id, band_hash, n, _part) counts —
    the map-side combiner: only bucket-count-sized rows shuffle."""
    if t.num_rows == 0:
        return pa.schema([("band_id", pa.int32()),
                          ("band_hash", pa.int64()),
                          ("n", pa.int64()),
                          ("_part", pa.int64())]).empty_table()
    g = t.group_by(["band_id", "band_hash", "_part"]) \
        .aggregate([("band_id", "count")])
    return pa.table({
        "band_id": g["band_id"],
        "band_hash": g["band_hash"],
        "n": g["band_id_count"].cast(pa.int64()),
        "_part": g["_part"],
    })


def lsh_band_stats(
    ds: ray.data.Dataset, *, id_col: str = "url",
    text_col: str = "text", n_perm: int = 126, band_r: int = 3,
    shingle_k: int = 5, seed: int = 42, num_partitions: int = 32,
    token_hash: str | None = None,
) -> ray.data.Dataset:
    """``(band_id, n_rows, n_buckets, max_bucket, n_dup_buckets,
    n_cand_pairs)`` — one row per LSH band (42 at the defaults)."""
    P = num_partitions
    bands = ds.map_batches(
        stage_task(MinHashLSH, n_perm=n_perm, band_r=band_r,
                   shingle_k=shingle_k, seed=seed, id_col=id_col,
                   text_col=text_col, num_partitions=P,
                   token_hash=token_hash),
        batch_format="pyarrow", batch_size=1024,
    ).map_batches(_batch_partial, batch_format="pyarrow")

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "band_id": pd.Series(dtype=np.int32),
                "n_rows": pd.Series(dtype=np.int64),
                "n_buckets": pd.Series(dtype=np.int64),
                "max_bucket": pd.Series(dtype=np.int64),
                "n_dup_buckets": pd.Series(dtype=np.int64),
                "n_cand_pairs": pd.Series(dtype=np.int64)})
        # buckets are whole here (partition key = f(band_id, band_hash)):
        # finish each bucket's size, then fold buckets per band
        b = df.groupby(["band_id", "band_hash"], sort=False)["n"] \
            .sum().reset_index()
        sz = b["n"].to_numpy()
        b["pairs"] = sz * (sz - 1) // 2
        g = b.groupby("band_id", sort=False)
        out = pd.DataFrame({
            "n_rows": g["n"].sum(),
            "n_buckets": g["n"].size(),
            "max_bucket": g["n"].max(),
            "n_dup_buckets": g["n"].apply(lambda s: int((s > 1).sum())),
            "n_cand_pairs": g["pairs"].sum(),
        }).reset_index()
        return out.astype({"band_id": np.int32, "n_rows": np.int64,
                           "n_buckets": np.int64, "max_bucket": np.int64,
                           "n_dup_buckets": np.int64,
                           "n_cand_pairs": np.int64})

    partials = hash_exchange(
        [bands], per_partition, num_partitions=P,
        schema=_PARTIAL_SCHEMA,
        in_schemas=[pa.schema([("band_id", pa.int32()),
                               ("band_hash", pa.int64()),
                               ("n", pa.int64())])],
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "band_id": [np.int32(g["band_id"].iloc[0])],
            "n_rows": [np.int64(g["n_rows"].sum())],
            "n_buckets": [np.int64(g["n_buckets"].sum())],
            "max_bucket": [np.int64(g["max_bucket"].max())],
            "n_dup_buckets": [np.int64(g["n_dup_buckets"].sum())],
            "n_cand_pairs": [np.int64(g["n_cand_pairs"].sum())],
        })

    return partials.groupby("band_id").map_groups(
        final, batch_format="pandas")


def lsh_band_stats_web(sf_dir: str) -> ray.data.Dataset:
    """Driver query: the band dashboard over web_pages with the
    sha-token oracle chain."""
    from data_dedup_ray.corpus import web_pages

    return lsh_band_stats(
        web_pages(sf_dir).select_columns(["url", "text"]),
        token_hash="sha")


def lsh_band_stats_sql(*, n_perm: int = 126, band_r: int = 3,
                       shingle_k: int = 5, seed: int = 42) -> str:
    """DuckDB twin: the shared sha-token signature chain + the band
    combine ``Σ_j v_{b·r+j}·BC_j mod 2⁶⁴`` with the exact rng-derived
    band multipliers, decomposed HUGEINT-safe (each product
    (bc%2³²)·v + ((bc>>32)·v mod 2³²)·2³² mod 2⁶⁴; the r-term sum is
    < 2⁶⁶, reduced mod 2⁶⁴ after)."""
    from data_dedup_ray.pipelines.sigstore import sig_chain_ctes

    m = MinHashLSH(n_perm=n_perm, band_r=band_r, shingle_k=shingle_k,
                   seed=seed)
    bc = m.BC.astype(object)
    M = 1 << 64
    rows = ",\n    ".join(
        f"({p}, {p // band_r}, {int(bc[p % band_r])}::HUGEINT)"
        for p in range(n_perm))
    return f"""
WITH {sig_chain_ctes(n_perm=n_perm, shingle_k=shingle_k, seed=seed,
                     single_corpus=True)},
bmap(p, band_id, bc) AS (VALUES
    {rows}),
mterm AS (
  SELECT id, band_id,
         (((bc % 4294967296) * v) % {M}::HUGEINT
          + (((bc // 4294967296) * v) % 4294967296) * 4294967296)
         % {M}::HUGEINT AS term
  FROM msig JOIN bmap USING (p)),
mband AS (
  SELECT id, band_id, sum(term) % {M}::HUGEINT AS band_hash
  FROM mterm GROUP BY 1, 2),
bucket AS (
  SELECT band_id, band_hash, CAST(count(*) AS BIGINT) AS n
  FROM mband GROUP BY 1, 2)
SELECT CAST(band_id AS INT) AS band_id,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(n) AS BIGINT) AS max_bucket,
       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_buckets,
       CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_cand_pairs
FROM bucket GROUP BY 1"""
