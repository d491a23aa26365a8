"""Persisted MinHash SIGNATURE store — the constant-size incremental
state for trillion-document indexes.

``pipelines/index.py`` persists full shingle sets (8 B per DISTINCT
shingle, so a long page costs kilobytes and the store scales with total
corpus TEXT).  The signature store keeps ``n_perm × 8 B`` per document
(~1 KB at the default 126 permutations) REGARDLESS of document length —
the state a 10¹²-document rolling dedup can actually afford to keep hot.
The trade is exactness: downstream similarity is the unbiased MinHash
ESTIMATE ``|{p: sig_a[p]==sig_b[p]}| / n_perm`` (Broder 1997), not the
exact Jaccard the blob store can re-verify.  Standard error at j≈0.7,
n_perm=126 is ~0.04, and identical shingle sets agree on every
permutation by construction, so exact-duplicate recall is 1.0.

Pipeline shape (all 100 TB rules hold):
- signatures are computed by the same vectorized ``MinHashLSH`` kernel
  the live path uses (stages/minhash.py) — one numpy reduction per
  permutation, no per-shingle Python;
- band emission reads the fixed-width blobs straight into a
  ``(n, n_perm)`` uint64 view — no tokenization, no text;
- candidate pairs flow through the sortless ``hash_exchange`` with the
  same ``group_cap`` star fallback as the live LSH path;
- the estimate join is TWO exchange rounds (attach sig_a by hash(url_a),
  attach sig_b by hash(url_b)) carrying one fixed 1 KB blob per pair —
  never the corpus, never variable-length shingle sets.

Reference anchor: the store generalizes Data-Dedup's digest cache
(lib/Data/Dedup/Engine.pm blocking keys persisted per file) to
similarity state kept between crawls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition
from data_dedup_ray.stages.minhash import MinHashLSH
from data_dedup_ray.util import stage_task


class SignatureRows(MinHashLSH):
    """``(id, sig: binary)`` per document — the store wire format.

    ``sig`` is the row-major little-endian uint64 signature
    (``n_perm * 8`` bytes); documents with no shingles keep a row with
    an EMPTY blob so the store covers the whole corpus id universe."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].combine_chunks().cast(pa.string())
        sig, has = self.signatures(batch[self.text_col])
        blobs: list[bytes] = [b""] * len(ids)
        k = 0
        for i in np.flatnonzero(has):
            blobs[i] = sig[k].tobytes()
            k += 1
        return pa.table({self.id_col: ids,
                         "sig": pa.array(blobs, pa.large_binary())})


class SignatureBands(MinHashLSH):
    """LSH band rows from STORED signatures — input ``(id, sig)``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=object)
        blobs = batch["sig"].to_pylist()
        width = self.n_perm * 8
        has = np.fromiter((len(b) == width for b in blobs), dtype=bool,
                          count=len(blobs))
        if not has.any():
            return self.band_table(
                np.empty((0, self.n_perm), dtype=np.uint64), ids[:0])
        mat = np.frombuffer(
            b"".join(b for b in blobs if len(b) == width), dtype=np.uint64
        ).reshape(-1, self.n_perm)
        return self.band_table(mat, ids[has])


def signature_rows(
    ds: ray.data.Dataset, *, id_col: str = "url", text_col: str = "text",
    n_perm: int = 126, band_r: int = 3, shingle_k: int = 5, seed: int = 42,
    token_hash: str | None = None,
) -> ray.data.Dataset:
    """Tokenize → shingle → MinHash each page into its fixed-size
    signature row.  ``token_hash="sha"`` selects the SQL-restatable
    sha256 token hash (oracle variant)."""
    return ds.map_batches(
        stage_task(SignatureRows, n_perm=n_perm, band_r=band_r,
                   shingle_k=shingle_k, seed=seed, id_col=id_col,
                   text_col=text_col, token_hash=token_hash),
        batch_format="pyarrow", batch_size=1024,
    )


def build_signature_store(
    ds: ray.data.Dataset, path: str, *, id_col: str = "url",
    text_col: str = "text", n_perm: int = 126, band_r: int = 3,
    shingle_k: int = 5, seed: int = 42, num_partitions: int = 32,
    token_hash: str | None = None,
):
    """Persist ``ds``'s signature table under ``path`` (resumable
    hash-partitioned parquet with lineage meta).  The signature config is
    part of the lineage: estimates are only comparable between stores
    built with identical (n_perm, shingle_k, seed)."""
    from data_dedup_ray.state.sink import resumable_write_parquet

    rows = signature_rows(ds, id_col=id_col, text_col=text_col,
                          n_perm=n_perm, band_r=band_r,
                          shingle_k=shingle_k, seed=seed,
                          token_hash=token_hash)
    return resumable_write_parquet(
        rows, path, key_col=id_col, num_partitions=num_partitions,
        config={"kind": "signature_store", "n_perm": n_perm,
                "band_r": band_r, "shingle_k": shingle_k, "seed": seed,
                "id_col": id_col, "token_hash": token_hash},
    )


def read_signature_store(path: str | list[str]) -> ray.data.Dataset:
    """The stored ``(id, sig)`` table; a list reads several crawls'
    stores as one index (append-only rolling form)."""
    if isinstance(path, (list, tuple)):
        import glob
        import os

        files: list[str] = []
        for p in path:
            files += sorted(glob.glob(os.path.join(p, "part=*",
                                                   "*.parquet")))
        return ray.data.read_parquet(files)
    return ray.data.read_parquet(path)


_PAIR_OUT = pa.schema([("new_url", pa.string()),
                       ("index_url", pa.string()),
                       ("n_agree", pa.int64())])


def incremental_sig_near_pairs(
    new_ds: ray.data.Dataset, store_path: str | list[str], *,
    threshold: float = 0.7, id_col: str = "url", text_col: str = "text",
    n_perm: int = 126, band_r: int = 3, shingle_k: int = 5,
    seed: int = 42, group_cap: int = 256, num_partitions: int = 32,
    token_hash: str | None = None,
) -> ray.data.Dataset:
    """``(new_url, index_url, n_agree)`` — estimated near-dup pairs
    between the new crawl and the persisted signature index, keeping
    pairs with ``n_agree / n_perm >= threshold``.

    The index side contributes ONLY its fixed 1 KB/doc signatures; its
    text is never read, its shingles never existed on disk."""
    from data_dedup_ray.pipelines.near import _distinct_pairs, \
        _pairs_in_partition
    from data_dedup_ray.state.sink import validate_store_config

    validate_store_config(store_path, {
        "n_perm": n_perm, "band_r": band_r, "shingle_k": shingle_k,
        "seed": seed, "token_hash": token_hash})
    P = num_partitions

    def _tag(prefix: str):
        def fn(t: pa.Table) -> pa.Table:
            tagged = pc.binary_join_element_wise(
                pa.scalar(prefix),
                t[id_col].combine_chunks().cast(pa.string()), "")
            return pa.table({id_col: tagged,
                             "sig": t["sig"].combine_chunks().cast(
                                 pa.large_binary())})
        return fn

    sig_new = signature_rows(new_ds, id_col=id_col, text_col=text_col,
                             n_perm=n_perm, band_r=band_r,
                             shingle_k=shingle_k, seed=seed,
                             token_hash=token_hash)
    sig = (
        read_signature_store(store_path)
        .map_batches(_tag("i|"), batch_format="pyarrow")
        .union(sig_new.map_batches(_tag("n|"), batch_format="pyarrow"))
        .materialize()
    )

    bands = sig.map_batches(
        stage_task(SignatureBands, n_perm=n_perm, band_r=band_r,
                   shingle_k=shingle_k, seed=seed, id_col=id_col,
                   num_partitions=P),
        batch_format="pyarrow", batch_size=1024,
    )

    def emit_partition(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_in_partition(
            g, key_cols=["band_id", "band_hash"], id_col=id_col,
            group_cap=group_cap)

    cand = hash_exchange(
        [bands], emit_partition, num_partitions=P,
        schema=pa.schema([(f"{id_col}_a", pa.string()),
                          (f"{id_col}_b", pa.string())]),
    )
    # cross-side only: 'i|' < 'n|', so url_a is always the index side
    cross = cand.map_batches(
        lambda t: t.filter(pc.not_equal(
            pc.utf8_slice_codeunits(t[f"{id_col}_a"], 0, 1),
            pc.utf8_slice_codeunits(t[f"{id_col}_b"], 0, 1),
        )),
        batch_format="pyarrow",
    )
    cross = _distinct_pairs(cross, [f"{id_col}_a", f"{id_col}_b"],
                            num_partitions=P)

    sig_by_id = sig.map_batches(
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

    a_col, b_col = f"{id_col}_a", f"{id_col}_b"

    def attach_a(pg: pd.DataFrame, sg: pd.DataFrame) -> pd.DataFrame:
        if not len(pg):
            return pd.DataFrame({a_col: pd.Series([], dtype=object),
                                 b_col: pd.Series([], dtype=object),
                                 "sig_a": pd.Series([], dtype=object)})
        m = pg.merge(sg.rename(columns={id_col: a_col,
                                        "sig": "sig_a"}), on=a_col,
                     how="inner")
        return m[[a_col, b_col, "sig_a"]]

    with_a = hash_exchange(
        [cross.map_batches(_part_on(a_col), batch_format="pyarrow"),
         sig_by_id],
        attach_a, num_partitions=P,
        schema=pa.schema([(a_col, pa.string()), (b_col, pa.string()),
                          ("sig_a", pa.large_binary())]),
        in_schemas=[pa.schema([(a_col, pa.string()),
                               (b_col, pa.string())]),
                    pa.schema([(id_col, pa.string()),
                               ("sig", pa.large_binary())])],
    )

    min_agree = int(np.ceil(threshold * n_perm))

    def score_b(pg: pd.DataFrame, sg: pd.DataFrame) -> pd.DataFrame:
        if not len(pg):
            return pd.DataFrame({"new_url": pd.Series([], dtype=object),
                                 "index_url": pd.Series([], dtype=object),
                                 "n_agree": pd.Series([], dtype=np.int64)})
        m = pg.merge(sg.rename(columns={id_col: b_col,
                                        "sig": "sig_b"}), on=b_col,
                     how="inner")
        if not len(m):
            return pd.DataFrame({"new_url": pd.Series([], dtype=object),
                                 "index_url": pd.Series([], dtype=object),
                                 "n_agree": pd.Series([], dtype=np.int64)})
        A = np.frombuffer(b"".join(m["sig_a"]), dtype=np.uint64
                          ).reshape(-1, n_perm)
        B = np.frombuffer(b"".join(m["sig_b"]), dtype=np.uint64
                          ).reshape(-1, n_perm)
        agree = (A == B).sum(axis=1).astype(np.int64)
        keep = agree >= min_agree
        return pd.DataFrame({
            "new_url": m[b_col].str[2:].to_numpy()[keep],
            "index_url": m[a_col].str[2:].to_numpy()[keep],
            "n_agree": agree[keep],
        })

    return hash_exchange(
        [with_a.map_batches(_part_on(b_col), batch_format="pyarrow"),
         sig_by_id],
        score_b, num_partitions=P, schema=_PAIR_OUT,
        in_schemas=[pa.schema([(a_col, pa.string()), (b_col, pa.string()),
                               ("sig_a", pa.large_binary())]),
                    pa.schema([(id_col, pa.string()),
                               ("sig", pa.large_binary())])],
    )


def sig_chain_ctes(*, n_perm: int = 126, shingle_k: int = 5,
                   seed: int = 42, single_corpus: bool = False) -> str:
    """The shared SQL restatement of the MinHash signature chain over
    the tagged web_pages ('i|') × snapshot2 ('n|') union — CTE fragment
    from the corpus derivations through ``msig(id, p, v)`` (per-perm
    minima).  Both the signature-agreement oracle below and the b-bit
    oracle (pipelines/bbit.py) append their own tails to it.

    ``single_corpus=True`` drops the snapshot2 side (``mall`` = bare
    web_pages urls, no tag) — the shape the one-permutation-hashing
    oracle (pipelines/oph.py) builds on; it stops at ``msh`` (distinct
    shingle hashes), whose derivation is the part worth sharing."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import SNAPSHOT2_CTE
    from data_dedup_ray.stages.minhash import MinHashLSH

    m = MinHashLSH(n_perm=n_perm, band_r=1 if n_perm % 3 else 3,
                   shingle_k=shingle_k, seed=seed)
    a = m.A[:, 0].astype(object)  # python ints: no uint64 overflow
    b = m.B[:, 0].astype(object)
    perms = ",\n    ".join(
        f"({p}, {int(a[p])}::HUGEINT, {int(b[p])}::HUGEINT)"
        for p in range(n_perm))
    C = 0x100000001B3
    M = 1 << 64
    k = shingle_k
    # rolling combine ((((h1·c + h2)·c + h3)·c + h4)·c + h5) mod 2⁶⁴,
    # built for any k
    expr = "h1::HUGEINT"
    for j in range(2, k + 1):
        expr = f"(({expr} * {C} + h{j}) % {M}::HUGEINT)"
    leads = ",\n         ".join(
        f"lead(h, {j - 1}) OVER w AS h{j}" for j in range(2, k + 1))
    if single_corpus:
        corpus = f"""{WEB_PAGES_CTE},
mall AS (SELECT url AS id, text FROM web_pages),"""
    else:
        corpus = f"""{WEB_PAGES_CTE},
{SNAPSHOT2_CTE},
mall AS (
  SELECT 'i|' || url AS id, text FROM web_pages
  UNION ALL SELECT 'n|' || url, text FROM snapshot2),"""
    return f"""{corpus}
mtok AS (SELECT id, g.i AS pos, t[g.i] AS tok
         FROM (SELECT id, regexp_extract_all(text, '[a-z0-9]+') AS t
               FROM mall) u,
              UNNEST(generate_series(1, len(t))) AS g(i)),
mh AS (SELECT id, pos,
              CAST(('0x' || substr(sha256(tok), 1, 16)) AS UBIGINT) AS h
       FROM mtok),
mw AS (SELECT id, h AS h1,
         {leads}
       FROM mh WINDOW w AS (PARTITION BY id ORDER BY pos)),
msh AS (SELECT DISTINCT id, {expr} AS s
        FROM mw WHERE h{k} IS NOT NULL),
perms(p, pa, pb) AS (VALUES
    {perms}),
msig AS (SELECT id, p,
                min((((pa % 4294967296) * s) % {M}::HUGEINT
                     + (((pa // 4294967296) * s) % 4294967296) * 4294967296
                     + pb) % {M}::HUGEINT) AS v
         FROM msh CROSS JOIN perms GROUP BY id, p)"""


def incremental_sig_near_pairs_sql(
    threshold: float = 0.7, *, n_perm: int = 126, shingle_k: int = 5,
    seed: int = 42,
) -> str:
    """DuckDB twin of ``incremental_sig_near_pairs(token_hash="sha")``
    over web_pages (index) × snapshot2 (new) — the MinHash signature
    restated BIT-FOR-BIT in SQL:

    - token hash = first 16 hex chars of sha256(token) (UBIGINT);
    - k-shingle hash = the same FNV-multiplier rolling combine,
      mod-2⁶⁴ in HUGEINT (the multiplier is 41 bits, so h*c < 2¹⁰⁵
      never overflows HUGEINT);
    - permutation p: (a_p·s + b_p) mod 2⁶⁴ with the EXACT (a_p, b_p)
      the numpy rng derives from ``seed`` (inlined as a VALUES list);
      the 64×64-bit product is decomposed as
      a·s = (a mod 2³²)·s + ((a>>32)·s mod 2³²)·2³² (mod 2⁶⁴),
      each partial < 2⁹⁷, HUGEINT-safe;
    - signature = per-(id, p) min over the doc's distinct shingles;
      n_agree = #{p : sig_a[p] = sig_b[p]} via an equality join.

    The SQL scores EVERY cross pair; the Ray side scores LSH candidates
    only — a pair at est ≥ t with NO fully-agreeing band would differ,
    with probability (1-t^r)^(n_perm/r) ≈ 2e-8 at t=0.7 (deterministic
    per corpus; pinned empirically by the driver run and a pytest)."""
    min_agree = int(np.ceil(threshold * n_perm))
    return f"""
WITH {sig_chain_ctes(n_perm=n_perm, shingle_k=shingle_k, seed=seed)},
magree AS (SELECT a.id AS id_a, b.id AS id_b,
                  CAST(count(*) AS BIGINT) AS n_agree
           FROM msig a JOIN msig b ON a.p = b.p AND a.v = b.v
                                   AND a.id < b.id
           GROUP BY 1, 2)
SELECT substr(id_b, 3) AS new_url, substr(id_a, 3) AS index_url, n_agree
FROM magree
WHERE substr(id_a, 1, 1) = 'i' AND substr(id_b, 1, 1) = 'n'
  AND n_agree >= {min_agree}"""
