"""Sign-random-projection (SRP) binary embedding sketches — SimHash for
vectors (Charikar, STOC 2002): signature bit j = sign(⟨x, r_j⟩) for b
random hyperplanes; Hamming distance between signatures estimates the
angle (E[ham] = b·θ/π).  This is the 16 B/doc BINARY tier of the
embedding-sketch ladder, below the int8 index (1 B/dim, embstore) the
way b-bit MinHash sits below the signature store on the text side.

Integer-exact by construction (no float sign flips to chase): the
projections are ±1 entries derived from md5 parity (r_ij = +1 iff the
first hex digit of md5(i|j) is even — DuckDB restates it verbatim), and
they act on the int8-QUANTIZED vectors (search.quantize_int8, the
already-SQL-pinned rule), so every dot is an exact integer and the bit
rule ``Σ q_i·r_ij > 0`` is unambiguous on both engines.

Pipeline shape: one pass quantizes + signs + packs each vector into
b/64 uint64 words; band rows (16 bands × 8 bits for b = 128) carry the
full 16-byte signature, so candidate pairs XOR-popcount IN the band
partition and only ham ≤ max_hamming pairs ever travel again.
Pigeonhole completeness: ham ≤ max_hamming < n_bands forces at least
one untouched band, so banding has recall 1.0 vs the brute-force
Hamming join the oracle runs."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange
from data_dedup_ray.stages.simhash import popcount64

_PAIR_OUT = pa.schema([("vec_id_a", pa.int64()), ("vec_id_b", pa.int64()),
                       ("hamming", pa.int64())])

_R_CACHE: dict = {}


def _projections(d: int, b: int) -> np.ndarray:
    """±1 matrix (d, b): r_ij = +1 iff first md5 hex digit of
    ``f"{i}|{j}"`` (1-based, the SQL convention) is even."""
    key = (d, b)
    if key not in _R_CACHE:
        R = np.empty((d, b), np.int64)
        for i in range(d):
            for j in range(b):
                h = hashlib.md5(f"{i + 1}|{j + 1}".encode()).hexdigest()
                R[i, j] = 1 if int(h[0], 16) % 2 == 0 else -1
        _R_CACHE[key] = R
    return _R_CACHE[key]


def srp_signatures(
    emb: ray.data.Dataset, *, n_bits: int = 128,
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> ray.data.Dataset:
    """``(vec_id, sig)`` — the packed b-bit signature as a
    little-endian uint64-word blob (b/64 words)."""
    from data_dedup_ray.pipelines.search import quantize_int8
    assert n_bits % 64 == 0

    def fn(t: pa.Table) -> pa.Table:
        X = np.stack(t[emb_col].to_pandas().to_numpy())
        Q = quantize_int8(X)
        R = _projections(Q.shape[1], n_bits)
        bits = (Q @ R) > 0                       # exact integer dots
        words = np.zeros((len(bits), n_bits // 64), np.uint64)
        for w in range(n_bits // 64):
            for k in range(64):
                words[:, w] |= (bits[:, w * 64 + k]
                                .astype(np.uint64) << np.uint64(k))
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "sig": pa.array([row.tobytes() for row in words],
                            pa.large_binary()),
        })

    return emb.map_batches(fn, batch_format="pyarrow")


def srp_hamming_pairs(
    emb: ray.data.Dataset, *, n_bits: int = 128, n_bands: int = 16,
    max_hamming: int = 10, id_col: str = "vec_id",
    emb_col: str = "embedding", num_partitions: int = 16,
    group_cap: int = 100_000,
) -> ray.data.Dataset:
    """``(vec_id_a < vec_id_b, hamming)`` for every pair with signature
    Hamming distance ≤ ``max_hamming`` — exact vs the brute-force join
    (pigeonhole: requires ``max_hamming < n_bands``)."""
    from data_dedup_ray.pipelines.near import (_distinct_pairs,
                                               _pairs_in_partition)
    if max_hamming >= n_bands:
        raise ValueError("pigeonhole recall needs max_hamming < n_bands")
    if n_bits % n_bands != 0:
        raise ValueError(f"n_bits={n_bits} must divide into n_bands="
                         f"{n_bands} equal bands")
    rb = n_bits // n_bands
    # band extraction below reads each band from ONE uint64 word of the
    # signature; rb > 64 overflows the mask and a band straddling a
    # word boundary would silently truncate — reject both up front.
    if rb > 64 or 64 % rb != 0:
        raise ValueError(
            f"band width n_bits/n_bands={rb} unsupported: bands must be "
            "<= 64 bits and evenly pack into 64-bit words (64 % width "
            "== 0); pick n_bands so the width is a power of two <= 64")
    P = num_partitions
    sigs = srp_signatures(emb, n_bits=n_bits, id_col=id_col,
                          emb_col=emb_col)

    def band_rows(t: pa.Table) -> pa.Table:
        raw = t["sig"].to_pandas().to_numpy()
        n = len(raw)
        words = np.frombuffer(b"".join(raw), np.uint64) \
            .reshape(n, n_bits // 64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_band, out_val = [], []
        for band in range(n_bands):
            lo = band * rb
            w, off = lo // 64, lo % 64
            val = (words[:, w] >> np.uint64(off)) \
                & np.uint64((1 << rb) - 1)
            out_band.append(np.full(n, band, np.int64))
            out_val.append(val.astype(np.int64))
        bands = np.concatenate(out_band)
        vals = np.concatenate(out_val)
        with np.errstate(over="ignore"):
            part = ((vals.astype(np.uint64)
                     * np.uint64(0x100000001B3)
                     + bands.astype(np.uint64))
                    % np.uint64(P)).astype(np.int64)
        return pa.table({
            "bk": pa.array(bands * (1 << rb) + vals),
            "id": pa.array(np.tile(ids, n_bands)),
            "sig": pa.array(np.tile(raw, n_bands), pa.large_binary()),
            "_part": pa.array(part),
        })

    def pairs_fn(g: pd.DataFrame) -> pd.DataFrame:
        p = _pairs_in_partition(g, key_cols=["bk"], id_col="id",
                                group_cap=group_cap, carry=["sig"])
        if not len(p):
            return pd.DataFrame({"vec_id_a": pd.Series(dtype=np.int64),
                                 "vec_id_b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
        sa = np.frombuffer(b"".join(p["sig_a"]), np.uint64) \
            .reshape(len(p), n_bits // 64)
        sb = np.frombuffer(b"".join(p["sig_b"]), np.uint64) \
            .reshape(len(p), n_bits // 64)
        ham = popcount64(sa ^ sb).sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        out = pd.DataFrame({
            "vec_id_a": p["id_a"].to_numpy()[keep],
            "vec_id_b": p["id_b"].to_numpy()[keep],
            "hamming": ham[keep],
        })
        sw = out["vec_id_a"] > out["vec_id_b"]
        out.loc[sw, ["vec_id_a", "vec_id_b"]] = \
            out.loc[sw, ["vec_id_b", "vec_id_a"]].to_numpy()
        return out

    cand = hash_exchange(
        [sigs.map_batches(band_rows, batch_format="pyarrow")],
        pairs_fn, num_partitions=P,
        schema=_PAIR_OUT,
        in_schemas=[pa.schema([("bk", pa.int64()), ("id", pa.int64()),
                               ("sig", pa.large_binary())])],
    )
    return _distinct_pairs(
        cand, ["vec_id_a", "vec_id_b"],
        keep_cols=["vec_id_a", "vec_id_b", "hamming"],
        num_partitions=P).sort(["vec_id_a", "vec_id_b"])


def srp_pairs(sf_dir: str, *, n_bits: int = 128,
              max_hamming: int = 10,
              num_partitions: int = 16) -> ray.data.Dataset:
    """Driver query: SRP Hamming pairs over the augmented embedding set
    (planted exact copies land at hamming 0)."""
    from data_dedup_ray.pipelines.search import augmented_embeddings
    return srp_hamming_pairs(
        augmented_embeddings(sf_dir), n_bits=n_bits,
        max_hamming=max_hamming, num_partitions=num_partitions)


def srp_pairs_sql(*, n_bits: int = 128, max_hamming: int = 10) -> str:
    """Bit-exact twin: md5-parity ±1 projections over the int8-quantized
    vectors, brute-force Hamming join at oracle scale."""
    return f"""
WITH emb AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0),
x AS (
  SELECT vec_id, g.i AS i, CAST(embedding[g.i] AS DOUBLE) AS v
  FROM emb, UNNEST(generate_series(1, len(embedding))) AS g(i)),
mx AS (SELECT vec_id, max(abs(v)) AS m FROM x GROUP BY 1),
q AS (
  SELECT x.vec_id, i,
         CAST(floor(v * 127 / CASE WHEN m = 0 THEN 1 ELSE m END)
              AS BIGINT) AS q
  FROM x JOIN mx USING (vec_id)),
js AS (SELECT unnest(generate_series(1, {n_bits})) AS j),
r AS (SELECT d.i, js.j,
             CASE WHEN CAST(('0x' || substr(
                    md5(CAST(d.i AS VARCHAR) || '|'
                        || CAST(js.j AS VARCHAR)), 1, 1))
                  AS INTEGER) % 2 = 0 THEN 1 ELSE -1 END AS rv
      FROM (SELECT DISTINCT i FROM x) d, js),
s AS (SELECT q.vec_id, r.j,
             CASE WHEN sum(q.q * r.rv) > 0 THEN 1 ELSE 0 END AS bit
      FROM q JOIN r ON r.i = q.i GROUP BY 1, 2),
ham AS (SELECT a.vec_id AS va, b.vec_id AS vb,
               sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h
        FROM s a JOIN s b ON a.j = b.j AND a.vec_id < b.vec_id
        GROUP BY 1, 2)
SELECT va AS vec_id_a, vb AS vec_id_b, CAST(h AS BIGINT) AS hamming
FROM ham WHERE h <= {max_hamming}
ORDER BY vec_id_a, vec_id_b"""
