"""b-bit MinHash store tier — Li & König 2010 (WWW '10): keep only the
LOWEST bit of each MinHash minimum, so a document's similarity state is
``n_perm / 8`` bytes (16 B at the default 126 permutations) instead of
the signature store's ``n_perm × 8`` (1 KB).  The estimator changes with
the compression: two 1-bit minima agree with probability
``J + (1 − J)/2 = (1 + J)/2`` (unrelated minima collide on a coin flip),
so with ``c = n_match / n_perm`` the unbiased estimate is
``Ĵ = 2c − 1`` — reported here as the exact integer
``est_bp = max(0, (2·n_match − n_perm) · 10⁴ // n_perm)``.

Position in the fingerprint-store ladder (SURVEY §8): 32 B content sha
(exact re-capture) → 8 B SimHash (Hamming ≤ 3) → **16 B b-bit MinHash
(Jaccard estimate, ~2× the variance of the 1 KB tier at 1/64 the
state)** → 1 KB full signatures → full shingle blobs (exact verify).

The b-bit rows cannot drive LSH banding themselves (a 1-bit band row is
useless), so the index persists TWO tiers from ONE signature pass:

- ``bands/``  — ``(id, band_id, band_hash)`` rows (n_bands × 8 B/doc),
  the retrieval state;
- ``bsig/``   — ``(id, bsig)`` packed-bit rows (n_perm/8 B/doc), the
  estimation state.

The full 1 KB signatures are TRANSIENT build state (materialized once,
discarded after both tiers are derived) — that is the point: retrieval +
estimation at ~350 B/doc total, no kilobyte-per-doc state kept.

Incremental pairs: new-crawl band rows meet the stored band rows in one
sortless exchange (the live LSH path's ``_pairs_in_partition`` with the
same ``group_cap`` star fallback); candidate pairs pick up their two
16 B blobs through two hash-keyed exchanges; the agreement count is one
vectorized XOR + popcount per partition.  Index text is never re-read.

SQL twin: the signature chain restated bit-for-bit
(``sigstore.sig_chain_ctes`` — sha256 token hash, HUGEINT rolling
shingle combine, the exact rng-derived permutations) extended by one
``v % 2`` projection and a bit-agreement join.  The SQL scores EVERY
cross pair while the Ray side scores LSH candidates only — the same
documented ~2e-8 analytic band-miss bound as the signature oracle
(sigstore.incremental_sig_near_pairs_sql docstring), pinned empirically
by the driver run and pytest.

Reference anchor: generalizes Data-Dedup's cheap-digest-first cascade
(lib/Data/Dedup/Engine.pm:558-566 — weakest/smallest keys first) to the
similarity regime: the 16 B tier answers most pair queries; only
survivors pay for fatter state.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition
from data_dedup_ray.stages.minhash import band_partition
from data_dedup_ray.pipelines.sigstore import (
    SignatureBands,
    sig_chain_ctes,
    signature_rows,
)
from data_dedup_ray.util import stage_task

_BSIG_SCHEMA = pa.schema([("url", pa.string()),
                          ("bsig", pa.large_binary())])
_BAND_SCHEMA = pa.schema([("url", pa.string()), ("band_id", pa.int32()),
                          ("band_hash", pa.int64())])
_PAIR_OUT = pa.schema([("new_url", pa.string()),
                       ("index_url", pa.string()),
                       ("n_match", pa.int64()), ("est_bp", pa.int64())])

_POPCNT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1) \
    .astype(np.int64)


def bbit_from_signatures(sig_table: pa.Table, *, n_perm: int = 126,
                         id_col: str = "url") -> pa.Table:
    """``(id, sig)`` full-signature rows → ``(id, bsig)`` packed lowest
    bits (little-endian bit order: bit ``p`` of the blob is permutation
    ``p``'s minimum & 1).  Shingle-less docs keep an EMPTY blob."""
    ids = sig_table[id_col].combine_chunks().cast(pa.string())
    blobs = sig_table["sig"].to_pylist()
    width = n_perm * 8
    out: list[bytes] = [b""] * len(blobs)
    valid = [i for i, b in enumerate(blobs) if len(b) == width]
    if valid:
        mat = np.frombuffer(
            b"".join(blobs[i] for i in valid), dtype=np.uint64
        ).reshape(-1, n_perm)
        bits = (mat & np.uint64(1)).astype(np.uint8)
        packed = np.packbits(bits, axis=1, bitorder="little")
        for k, i in enumerate(valid):
            out[i] = packed[k].tobytes()
    return pa.table({id_col: ids,
                     "bsig": pa.array(out, pa.large_binary())})


def build_bbit_index(
    ds: ray.data.Dataset, path: str, *, id_col: str = "url",
    text_col: str = "text", n_perm: int = 126, band_r: int = 3,
    shingle_k: int = 5, seed: int = 42, num_partitions: int = 32,
    token_hash: str | None = None,
):
    """Build both persisted tiers under ``path`` from ONE signature
    pass: ``path/bands`` (LSH retrieval rows) and ``path/bsig``
    (packed 1-bit estimation rows).  The full signatures are transient —
    materialized for the two derivations, never written."""
    from data_dedup_ray.state.sink import resumable_write_parquet

    cfg = {"n_perm": n_perm, "band_r": band_r, "shingle_k": shingle_k,
           "seed": seed, "id_col": id_col, "token_hash": token_hash,
           "b": 1}
    sig = signature_rows(ds, id_col=id_col, text_col=text_col,
                         n_perm=n_perm, band_r=band_r,
                         shingle_k=shingle_k, seed=seed,
                         token_hash=token_hash).materialize()
    bands = sig.map_batches(
        stage_task(SignatureBands, n_perm=n_perm, band_r=band_r,
                   shingle_k=shingle_k, seed=seed, id_col=id_col),
        batch_format="pyarrow", batch_size=1024,
    )
    resumable_write_parquet(
        bands, f"{path}/bands", key_col=id_col,
        num_partitions=num_partitions,
        config={"kind": "bbit_band_store", **cfg},
    )
    bsig = sig.map_batches(
        lambda t: bbit_from_signatures(t, n_perm=n_perm, id_col=id_col),
        batch_format="pyarrow",
    )
    resumable_write_parquet(
        bsig, f"{path}/bsig", key_col=id_col,
        num_partitions=num_partitions,
        config={"kind": "bbit_store", **cfg},
    )
    return path


def _read_tier(path: str, sub: str,
               expect: dict | None = None) -> ray.data.Dataset:
    """Read one persisted tier; when ``expect`` is given, validate the
    caller's signature parameters against the store's ``_META.json``
    lineage config — a query whose (n_perm, band_r, shingle_k, seed,
    token_hash, b) tuple differs from the index's would silently produce
    garbage estimates, so it fails loudly instead."""
    import glob
    import os

    from data_dedup_ray.state.sink import validate_store_config

    if expect:
        validate_store_config(os.path.join(path, sub), expect)
    files = sorted(glob.glob(os.path.join(path, sub, "part=*",
                                          "*.parquet")))
    return ray.data.read_parquet(files, partitioning=None)


def bbit_match_counts(a_blobs, b_blobs, n_perm: int) -> np.ndarray:
    """Vectorized agreement count per pair: ``n_perm − popcount(XOR)``.
    Padding bits (the blob is byte-padded past ``n_perm``) are zero on
    both sides, so they never contribute a disagreement."""
    nbytes = (n_perm + 7) // 8
    A = np.frombuffer(b"".join(a_blobs), dtype=np.uint8) \
        .reshape(-1, nbytes)
    B = np.frombuffer(b"".join(b_blobs), dtype=np.uint8) \
        .reshape(-1, nbytes)
    return n_perm - _POPCNT[A ^ B].sum(axis=1)


def incremental_bbit_pairs(
    new_ds: ray.data.Dataset, index_path: str, *,
    threshold: float = 0.7, id_col: str = "url", text_col: str = "text",
    n_perm: int = 126, band_r: int = 3, shingle_k: int = 5,
    seed: int = 42, group_cap: int = 256, num_partitions: int = 32,
    token_hash: str | None = None,
) -> ray.data.Dataset:
    """``(new_url, index_url, n_match, est_bp)`` — estimated near-dup
    pairs between the new crawl and the persisted b-bit index, keeping
    pairs whose bit-agreement implies ``Ĵ = 2c − 1 ≥ threshold``,
    i.e. ``n_match ≥ ceil((1 + threshold)/2 · n_perm)``."""
    from data_dedup_ray.pipelines.near import (
        _distinct_pairs,
        _pairs_in_partition,
    )

    P = num_partitions
    a_col, b_col = f"{id_col}_a", f"{id_col}_b"

    def _tag_col(prefix: str, col: str):
        def fn(t: pa.Table) -> pa.Table:
            tagged = pc.binary_join_element_wise(
                pa.scalar(prefix),
                t[col].combine_chunks().cast(pa.string()), "")
            return t.set_column(t.schema.get_field_index(col), col,
                                tagged)
        return fn

    expect_cfg = {"n_perm": n_perm, "band_r": band_r,
                  "shingle_k": shingle_k, "seed": seed,
                  "token_hash": token_hash, "b": 1}

    # new side: ONE signature pass feeds both the band rows and the
    # 16 B estimation rows (the same two-tier derivation as the index);
    # num_partitions=P makes the band stage emit the coarse shuffle key
    # in-stage — no separate re-keying pass over the exploded band rows
    sig_new = signature_rows(
        new_ds, id_col=id_col, text_col=text_col, n_perm=n_perm,
        band_r=band_r, shingle_k=shingle_k, seed=seed,
        token_hash=token_hash,
    ).map_batches(_tag_col("n|", id_col), batch_format="pyarrow") \
        .materialize()
    new_bands = sig_new.map_batches(
        stage_task(SignatureBands, n_perm=n_perm, band_r=band_r,
                   shingle_k=shingle_k, seed=seed, id_col=id_col,
                   num_partitions=P),
        batch_format="pyarrow", batch_size=1024,
    )
    new_bsig = sig_new.map_batches(
        lambda t: bbit_from_signatures(t, n_perm=n_perm, id_col=id_col),
        batch_format="pyarrow",
    )

    idx_bands = _read_tier(index_path, "bands", expect_cfg).map_batches(
        _tag_col("i|", id_col), batch_format="pyarrow")

    def _prep_idx_bsig(t: pa.Table) -> pa.Table:
        # parquet round-trips large_binary as binary; normalize so the
        # union with the new side's large_binary rows concatenates
        t = _tag_col("i|", id_col)(t)
        return t.set_column(
            t.schema.get_field_index("bsig"), "bsig",
            t["bsig"].combine_chunks().cast(pa.large_binary()))

    idx_bsig = _read_tier(index_path, "bsig", expect_cfg).map_batches(
        _prep_idx_bsig, batch_format="pyarrow")

    def band_part(t: pa.Table) -> pa.Table:
        # index-tier rows come back from parquet without _part; re-key
        # with the SAME shared formula the in-stage path uses
        return t.append_column("_part", pa.array(band_partition(
            t["band_hash"].to_numpy().view(np.uint64),
            t["band_id"].to_numpy(), P)))

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_partition(
            g, key_cols=["band_id", "band_hash"], id_col=id_col,
            group_cap=group_cap)

    cand = hash_exchange(
        [new_bands,
         idx_bands.map_batches(band_part, batch_format="pyarrow")],
        lambda dn, di: emit_partition(pd.concat([dn, di])),
        num_partitions=P,
        schema=pa.schema([(a_col, pa.string()), (b_col, pa.string())]),
        in_schemas=[_BAND_SCHEMA, _BAND_SCHEMA],
    )
    cross = cand.map_batches(
        lambda t: t.filter(pc.not_equal(
            pc.utf8_slice_codeunits(t[a_col], 0, 1),
            pc.utf8_slice_codeunits(t[b_col], 0, 1),
        )),
        batch_format="pyarrow",
    )
    cross = _distinct_pairs(cross, [a_col, b_col], num_partitions=P)

    bsig_all = idx_bsig.union(new_bsig)
    bsig_by_id = bsig_all.map_batches(
        lambda t: t.append_column("_part", pa.array(key_partition(
            t[id_col].combine_chunks().to_numpy(zero_copy_only=False),
            P))),
        batch_format="pyarrow",
    )

    def _part_on(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_part", pa.array(key_partition(
                t[col].combine_chunks().to_numpy(zero_copy_only=False),
                P)))
        return fn

    def attach_a(pg: pd.DataFrame, sg: pd.DataFrame) -> pd.DataFrame:
        if not len(pg):
            return pd.DataFrame({a_col: pd.Series([], dtype=object),
                                 b_col: pd.Series([], dtype=object),
                                 "bsig_a": pd.Series([], dtype=object)})
        m = pg.merge(sg.rename(columns={id_col: a_col,
                                        "bsig": "bsig_a"}), on=a_col,
                     how="inner")
        return m[[a_col, b_col, "bsig_a"]]

    with_a = hash_exchange(
        [cross.map_batches(_part_on(a_col), batch_format="pyarrow"),
         bsig_by_id],
        attach_a, num_partitions=P,
        schema=pa.schema([(a_col, pa.string()), (b_col, pa.string()),
                          ("bsig_a", pa.large_binary())]),
        in_schemas=[pa.schema([(a_col, pa.string()),
                               (b_col, pa.string())]), _BSIG_SCHEMA],
    )

    min_match = math.ceil((1 + threshold) / 2 * n_perm)

    def score_b(pg: pd.DataFrame, sg: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "new_url": pd.Series([], dtype=object),
            "index_url": pd.Series([], dtype=object),
            "n_match": pd.Series([], dtype=np.int64),
            "est_bp": pd.Series([], dtype=np.int64)})
        if not len(pg):
            return empty
        m = pg.merge(sg.rename(columns={id_col: b_col,
                                        "bsig": "bsig_b"}), on=b_col,
                     how="inner")
        width = (n_perm + 7) // 8
        ok = (m["bsig_a"].str.len() == width) \
            & (m["bsig_b"].str.len() == width)
        m = m[ok]
        if not len(m):
            return empty
        n_match = bbit_match_counts(m["bsig_a"], m["bsig_b"], n_perm)
        keep = n_match >= min_match
        est = np.maximum(0, (2 * n_match - n_perm) * 10000 // n_perm)
        return pd.DataFrame({
            "new_url": m[b_col].str[2:].to_numpy()[keep],
            "index_url": m[a_col].str[2:].to_numpy()[keep],
            "n_match": n_match[keep],
            "est_bp": est[keep],
        })

    return hash_exchange(
        [with_a.map_batches(_part_on(b_col), batch_format="pyarrow"),
         bsig_by_id],
        score_b, num_partitions=P, schema=_PAIR_OUT,
        in_schemas=[pa.schema([(a_col, pa.string()), (b_col, pa.string()),
                               ("bsig_a", pa.large_binary())]),
                    _BSIG_SCHEMA],
    )


def incremental_bbit_pairs_sql(
    threshold: float = 0.7, *, n_perm: int = 126, shingle_k: int = 5,
    seed: int = 42,
) -> str:
    """DuckDB twin of ``incremental_bbit_pairs(token_hash="sha")`` over
    web_pages (index) × snapshot2 (new): the shared signature chain
    (``sigstore.sig_chain_ctes``) + the 1-bit projection ``v % 2`` and a
    bit-agreement join.  Same every-cross-pair vs LSH-candidates caveat
    (and the same ~2e-8 analytic band-miss bound) as the signature
    oracle."""
    min_match = math.ceil((1 + threshold) / 2 * n_perm)
    return f"""
WITH {sig_chain_ctes(n_perm=n_perm, shingle_k=shingle_k, seed=seed)},
mbit AS (SELECT id, p, v % 2 AS bit FROM msig),
mmatch AS (SELECT a.id AS id_a, b.id AS id_b,
                  CAST(count(*) AS BIGINT) AS n_match
           FROM mbit a JOIN mbit b ON a.p = b.p AND a.bit = b.bit
                                   AND a.id < b.id
           GROUP BY 1, 2)
SELECT substr(id_b, 3) AS new_url, substr(id_a, 3) AS index_url, n_match,
       CAST(greatest(0, (2 * n_match - {n_perm}) * 10000 // {n_perm})
            AS BIGINT) AS est_bp
FROM mmatch
WHERE substr(id_a, 1, 1) = 'i' AND substr(id_b, 1, 1) = 'n'
  AND n_match >= {min_match}"""
