"""DSIR-style hashed n-gram importance weights for data selection.

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023): represent every document as a bag of HASHED
n-gram features (unigrams + bigrams folded into B buckets), fit two
bag-of-buckets models — the TARGET distribution p (here: the corpus'
``lang = target`` slice, the "domain we want more of") and the RAW
distribution q (the whole crawl) — and weight each document by its
importance log-ratio ``Σ_b count_doc[b]·(log p̂[b] − log q̂[b])`` with
add-1 smoothing.  High-weight documents look like the target domain;
resampling by the weight shifts the training mixture toward it.

House-style exactness (the bigram-LM playbook, pipelines/lm.py): the two
log terms are quantized ONCE at fit time — ``floor(ln((c+1)/(T+B))·10⁴)``
per bucket via libm ``math.log``, the same call DuckDB's ``ln`` makes —
so the per-doc weight is an INTEGER sum: order-independent, partition-
independent, exactly SQL-restatable.

100 TB shape, two passes, no corpus-sized shuffle:

1. **fit** — per-batch dense bucket histograms (B ≤ 2¹³ ints) for
   target and raw, emitted sparse through ONE bucket-keyed exchange;
   the model that returns is B rows — model-sized, never corpus-sized.
2. **score** — the quantized log-ratio table (B int64s) is broadcast
   via ``ray.put``; each batch folds its (doc, bucket, count) triples
   against it with one fancy-index + bincount — no Python loops.

Features use the sha token hash (sigstore convention — SQL twin:
``substr(sha256(tok), 1, 16)``) and the FNV rolling combine for bigrams
(41-bit multiplier: products < 2¹⁰⁵ stay HUGEINT-safe in DuckDB).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from data_dedup_ray.engine.exchange import bucketize, hash_exchange
from data_dedup_ray.stages.minhash import sha256_token_hash, tokenize_batch

_C = np.uint64(0x100000001B3)
_OUT = pa.schema([("doc_id", pa.int64()), ("n_feats", pa.int64()),
                  ("dsir_msum", pa.int64())])


def _doc_bucket_counts(texts, n_buckets: int
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_local, bucket, count) sparse triples of hashed unigram +
    bigram features, vectorized; bigrams never cross doc boundaries."""
    hashes, counts = tokenize_batch(texts, token_hash=sha256_token_hash)
    B = np.uint64(n_buckets)
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    uni = (hashes % B).astype(np.int64)
    if len(hashes) > 1:
        valid = doc_of[:-1] == doc_of[1:]
        with np.errstate(over="ignore"):
            big = ((hashes[:-1] * _C + hashes[1:]) % B).astype(np.int64)
        big = big[valid]
        bdoc = doc_of[:-1][valid]
    else:
        big = np.zeros(0, np.int64)
        bdoc = np.zeros(0, np.int64)
    alld = np.concatenate([doc_of, bdoc])
    allb = np.concatenate([uni, big])
    if not len(alld):
        return alld, allb, np.zeros(0, np.int64)
    key = alld * n_buckets + allb
    uk, cnt = np.unique(key, return_counts=True)
    return uk // n_buckets, uk % n_buckets, cnt.astype(np.int64)


def fit_dsir_model(
    docs: ray.data.Dataset, *, target_lang: str = "en",
    n_buckets: int = 8192, num_partitions: int = 8,
) -> np.ndarray:
    """Quantized per-bucket importance log-ratio ``lr[b] = lp_m − lq_m``
    (int64, length ``n_buckets``) — model-sized, driver-held."""
    P = num_partitions
    B = n_buckets

    def partial(t: pa.Table) -> pa.Table:
        d, b, c = _doc_bucket_counts(t["text"], B)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        cq = np.bincount(b, weights=c, minlength=B)
        tgt = lang[d] == target_lang
        cp = np.bincount(b[tgt], weights=c[tgt], minlength=B)
        nz = np.nonzero(cq)[0]
        return pa.table({
            "b": pa.array(nz, pa.int64()),
            "cp": pa.array(cp[nz].astype(np.int64)),
            "cq": pa.array(cq[nz].astype(np.int64)),
            "_part": pa.array((nz % P).astype(np.int64)),
        })

    def reduce_fit(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("b", as_index=False)[["cp", "cq"]].sum()

    model = hash_exchange(
        [docs.select_columns(["text", "lang"])
             .map_batches(partial, batch_format="pyarrow")],
        reduce_fit, num_partitions=P,
        schema=pa.schema([("b", pa.int64()), ("cp", pa.int64()),
                          ("cq", pa.int64())]),
        in_schemas=[pa.schema([("b", pa.int64()), ("cp", pa.int64()),
                               ("cq", pa.int64())])],
    ).to_pandas()                      # ≤ B rows
    cp = np.zeros(B, np.int64)
    cq = np.zeros(B, np.int64)
    if len(model):
        cp[model["b"].to_numpy()] = model["cp"].to_numpy()
        cq[model["b"].to_numpy()] = model["cq"].to_numpy()
    tp, tq = int(cp.sum()), int(cq.sum())
    # libm log per bucket (math.log == DuckDB ln), quantized separately
    # so the subtraction is integer — the lm.py fit-time convention
    lr = np.empty(B, np.int64)
    for i in range(B):
        lp_m = math.floor(math.log((int(cp[i]) + 1) / (tp + B)) * 10000)
        lq_m = math.floor(math.log((int(cq[i]) + 1) / (tq + B)) * 10000)
        lr[i] = lp_m - lq_m
    # dsir_select's non-negative-domain shift assumes |lr| < 10⁶ —
    # true for any corpus below e¹⁰⁰ features; fail loudly, never drift
    assert np.abs(lr).max(initial=0) < 1_000_000
    return lr


def dsir_weights(
    sf_dir: str, *, target_lang: str = "en", n_buckets: int = 8192,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """``(doc_id, n_feats, dsir_msum)`` for every document — the
    integer importance weight (positive ⇒ more target-like than the
    raw mixture), sorted by doc_id."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    lr = fit_dsir_model(docs, target_lang=target_lang,
                        n_buckets=n_buckets,
                        num_partitions=num_partitions)
    ref = ray.put(lr)
    B = n_buckets

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        d, b, c = _doc_bucket_counts(t["text"], B)
        n = t.num_rows
        n_feats = np.bincount(d, weights=c, minlength=n).astype(np.int64)
        msum = np.bincount(d, weights=c * m[b],
                           minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "n_feats": pa.array(n_feats),
            "dsir_msum": pa.array(msum),
        })

    return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")


#: shift added to the per-feature mean so the floor-division happens in
#: the NON-NEGATIVE domain — python's // floors toward -inf but DuckDB's
#: // truncates toward zero, so they only agree for non-negative
#: numerators.  |lr[b]| < ln(T+B)·10⁴ < 10⁶ for any corpus below e¹⁰⁰
#: features, so msum + SHIFT·n_feats ≥ 0 always.
_WNORM_SHIFT = 1_000_000


def dsir_select(
    sf_dir: str, *, frac_bp: int = 2000, target_lang: str = "en",
    n_buckets: int = 8192, num_partitions: int = 8,
) -> ray.data.Dataset:
    """The resampling step: keep the top ``frac_bp/10⁴`` fraction of
    scoreable docs by per-feature importance ``wnorm_m =
    (dsir_msum + SHIFT·n_feats) // n_feats`` (ties broken by doc_id) —
    ``(doc_id, wnorm_m)`` sorted by doc_id.

    Deterministic AND distributed: selection never materializes the
    corpus on the driver.  wnorm_m lives in a bounded integer domain,
    so (1) a value-histogram exchange (≤ |domain| rows) finds the
    exact threshold value T and how many T-ties survive, (2) ties are
    ranked by doc_id with the two-phase ordered-prefix-sum over dense
    doc_id range buckets — only tie rows travel."""
    P = num_partitions
    w = dsir_weights(sf_dir, target_lang=target_lang,
                     n_buckets=n_buckets,
                     num_partitions=num_partitions).materialize()

    def norm(t: pa.Table) -> pa.Table:
        nf = t["n_feats"].to_numpy(zero_copy_only=False)
        ms = t["dsir_msum"].to_numpy(zero_copy_only=False)
        keep = nf > 0
        nf, ms = nf[keep], ms[keep]
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks().filter(pa.array(keep)),
            "wnorm_m": pa.array(
                (ms + _WNORM_SHIFT * nf) // nf, pa.int64()),
        })

    scored = w.map_batches(norm, batch_format="pyarrow").materialize()

    def hist_partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(t["wnorm_m"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({
            "v": pa.array(v, pa.int64()),
            "c": pa.array(c.astype(np.int64)),
            "_part": pa.array((v % P).astype(np.int64)),
        })

    hist = hash_exchange(
        [scored.map_batches(hist_partial, batch_format="pyarrow")],
        lambda df: df.groupby("v", as_index=False)["c"].sum(),
        num_partitions=P,
        schema=pa.schema([("v", pa.int64()), ("c", pa.int64())]),
        in_schemas=[pa.schema([("v", pa.int64()), ("c", pa.int64())])],
    ).to_pandas().sort_values("v", ascending=False)     # domain-sized
    n_scored = int(hist["c"].sum())
    keep_n = (n_scored * frac_bp) // 10000
    cum = hist["c"].cumsum()
    above = cum[cum <= keep_n]
    if keep_n <= 0 or not len(hist):
        thr, tie_keep = None, 0
    elif len(above) == len(hist) or int(cum.iloc[-1]) == keep_n:
        thr, tie_keep = int(hist["v"].iloc[-1]), None   # keep everything
    else:
        pos = len(above)
        thr = int(hist["v"].iloc[pos])
        tie_keep = keep_n - (int(above.iloc[-1]) if pos else 0)

    if thr is None:
        return ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "wnorm_m": pa.array([], pa.int64())}))
    if tie_keep is None:
        return scored.sort("doc_id")

    strict = scored.filter(expr=f"wnorm_m > {thr}")
    ties = scored.filter(expr=f"wnorm_m == {thr}").materialize()
    # rank ties by doc_id via range buckets + exclusive bases (ordered
    # prefix sum) — doc_ids are dense in [0, n_docs)
    n_docs = int(ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count())
    span = max(1, -(-n_docs // P))                      # ceil

    def tie_part(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_part", pa.array((d // span).astype(np.int64)))

    tie_schema = pa.schema([("doc_id", pa.int64()),
                            ("wnorm_m", pa.int64())])
    buckets = bucketize(
        ties.map_batches(tie_part, batch_format="pyarrow"),
        num_partitions=P, in_schema=tie_schema)

    counts_df = hash_exchange(
        [buckets],
        lambda df: pd.DataFrame(
            {"part": [int(df["doc_id"].iloc[0]) // span],
             "n": [len(df)]}) if len(df) else
        pd.DataFrame({"part": pd.Series(dtype=np.int64),
                      "n": pd.Series(dtype=np.int64)}),
        num_partitions=P,
        schema=pa.schema([("part", pa.int64()), ("n", pa.int64())]),
        in_schemas=[tie_schema],
    ).to_pandas()
    base = np.zeros(P, np.int64)
    for _, r in counts_df.iterrows():
        base[int(r["part"])] = int(r["n"])
    base = np.concatenate([[0], np.cumsum(base)[:-1]])

    def tie_rank(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        p = int(df["doc_id"].iloc[0]) // span
        df = df.sort_values("doc_id", kind="stable")
        keep = base[p] + np.arange(len(df)) < tie_keep
        return df.loc[keep]

    kept_ties = hash_exchange(
        [buckets], tie_rank, num_partitions=P,
        schema=tie_schema, in_schemas=[tie_schema])
    return strict.union(kept_ties).sort("doc_id")


def dsir_select_sql(*, frac_bp: int = 2000, target_lang: str = "en",
                    n_buckets: int = 8192) -> str:
    base = dsir_weights_sql(target_lang=target_lang, n_buckets=n_buckets)
    return f"""
WITH w AS ({base}),
s AS (SELECT doc_id,
             (dsir_msum + {_WNORM_SHIFT} * n_feats) // n_feats
               AS wnorm_m
      FROM w WHERE n_feats > 0),
r AS (SELECT doc_id, CAST(wnorm_m AS BIGINT) AS wnorm_m,
             row_number() OVER (ORDER BY wnorm_m DESC, doc_id) AS rnk,
             (SELECT count(*) FROM s) AS n
      FROM s)
SELECT doc_id, wnorm_m FROM r
WHERE rnk <= (n * {frac_bp}) // 10000
ORDER BY doc_id"""


def dsir_weights_sql(*, target_lang: str = "en",
                     n_buckets: int = 8192) -> str:
    """Bit-exact twin: sha token hash, FNV bigram combine in HUGEINT,
    per-bucket floor(ln·10⁴) model, integer per-doc sum."""
    B = n_buckets
    M64 = "18446744073709551616::HUGEINT"
    return f"""
WITH toks AS (
  SELECT doc_id, lang, g.i AS pos, t[g.i] AS tok
  FROM (SELECT doc_id, lang, regexp_extract_all(text, '[a-z0-9]+') AS t
        FROM documents) u,
       UNNEST(generate_series(1, len(t))) AS g(i)),
th AS (SELECT doc_id, lang, pos,
              CAST(('0x' || substr(sha256(tok), 1, 16)) AS UBIGINT) AS h
       FROM toks),
bg AS (SELECT doc_id, lang, h,
              lead(h) OVER (PARTITION BY doc_id ORDER BY pos) AS hn
       FROM th),
feats AS (
  SELECT doc_id, lang, CAST(h % {B} AS BIGINT) AS b FROM th
  UNION ALL
  SELECT doc_id, lang,
         CAST(((h::HUGEINT * 1099511628211::HUGEINT + hn::HUGEINT)
               % {M64}) % {B} AS BIGINT)
  FROM bg WHERE hn IS NOT NULL),
buckets AS (SELECT unnest(generate_series(0, {B - 1})) AS b),
cp AS (SELECT b, count(*) AS c FROM feats
       WHERE lang = '{target_lang}' GROUP BY b),
cq AS (SELECT b, count(*) AS c FROM feats GROUP BY b),
tot AS (SELECT
  (SELECT count(*) FROM feats WHERE lang = '{target_lang}') AS tp,
  (SELECT count(*) FROM feats) AS tq),
model AS (SELECT bk.b,
    CAST(floor(ln((coalesce(cp.c, 0) + 1) / (tot.tp + {B})) * 10000)
         AS BIGINT)
  - CAST(floor(ln((coalesce(cq.c, 0) + 1) / (tot.tq + {B})) * 10000)
         AS BIGINT) AS lr
  FROM buckets bk CROSS JOIN tot
  LEFT JOIN cp ON cp.b = bk.b
  LEFT JOIN cq ON cq.b = bk.b),
dscore AS (SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                  CAST(sum(m.lr) AS BIGINT) AS dsir_msum
           FROM feats f JOIN model m ON m.b = f.b
           GROUP BY f.doc_id)
SELECT d.doc_id, coalesce(s.n_feats, 0) AS n_feats,
       coalesce(s.dsir_msum, 0) AS dsir_msum
FROM documents d LEFT JOIN dscore s ON s.doc_id = d.doc_id
ORDER BY d.doc_id"""
