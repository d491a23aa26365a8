"""Bigram language-model document scoring — the CCNet-style
perplexity-filter shape (Wenzek et al. 2020: score every page with an
n-gram LM, filter/partition the corpus by the score).

Two passes, no corpus-sized shuffle:

1. **fit** — per-batch partial bigram counts (vectorized through polars:
   token lists → shifted-slice explode, zero per-token Python) feed ONE
   exchange keyed on the bigram's PREFIX token, so a prefix's marginal
   ``c(a·)`` is derivable inside its owning partition; the distinct-bigram
   table that comes back is vocabulary²-bounded — model-sized, not
   corpus-sized.  Each bigram's negative log-likelihood is quantized ONCE
   at fit time (``floor(-ln(c_ab/c_a)·10⁴)`` via libm ``math.log``, the
   same call DuckDB's ``ln`` makes), so the per-doc score is an INTEGER
   sum — order-independent, exactly reproducible, exactly SQL-restatable
   (float avg-of-logs would be summation-order-dependent in the last ulp).
2. **score** — the quantized model is broadcast via ``ray.put`` (the
   blocklist pattern, clean.py); each batch merges its bigram pairs
   against it and reduces per doc.  A vocabulary too large to broadcast
   would co-partition pairs and model on the prefix token through the
   same exchange instead — the partitioning key is already right.

Self-scoring (train corpus == scored corpus) means every bigram is in the
model; the merge is still a LEFT join with an explicit unseen marker so a
held-out corpus scores correctly (unseen bigrams count in ``n_unseen``,
not in the sum — the caller picks the smoothing policy).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_PAIR_IN = pa.schema([("a", pa.string()), ("b", pa.string()),
                      ("c", pa.int64())])
_MODEL = pa.schema([("a", pa.string()), ("b", pa.string()),
                    ("nll_m", pa.int64())])
_OUT = pa.schema([("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
                  ("n_unseen", pa.int64()), ("nll_msum", pa.int64())])


def _bigram_frame(t: pa.Table) -> pl.DataFrame:
    """(doc_id, a, b) rows — one per adjacent token pair, vectorized."""
    df = pl.DataFrame({
        "doc_id": pl.from_arrow(t["doc_id"].combine_chunks()),
        "t": pl.from_arrow(t["text"].combine_chunks())
        .str.to_lowercase().str.extract_all(r"[a-z0-9]+"),
    })
    pairs = (
        df.with_columns(
            a=pl.col("t").list.slice(0, pl.col("t").list.len() - 1),
            b=pl.col("t").list.slice(1),
        )
        .select("doc_id", "a", "b")
        .explode("a", "b")
        .drop_nulls()
    )
    return pairs


def fit_bigram_model(docs: ray.data.Dataset, *,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """``(a, b, nll_m)`` — every observed bigram with its quantized NLL
    ``floor(-ln(c(a,b)/c(a·)) · 10⁴)``; vocabulary²-bounded."""
    P = num_partitions

    def partial(t: pa.Table) -> pa.Table:
        pairs = _bigram_frame(t)
        if not len(pairs):
            return _PAIR_IN.empty_table().append_column(
                "_part", pa.array([], pa.int64()))
        counts = pairs.group_by("a", "b").agg(pl.len().alias("c"))
        out = counts.to_arrow().cast(_PAIR_IN)
        part = key_partition(out["a"].to_numpy(zero_copy_only=False), P)
        return out.append_column("_part", pa.array(part))

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def reduce_fit(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "nll_m": pd.Series([], dtype=np.int64)})
        g = df.groupby(["a", "b"], sort=False, as_index=False)["c"].sum()
        ca = g.groupby("a", sort=False)["c"].transform("sum")
        # quantize per DISTINCT bigram with libm log (DuckDB ln parity);
        # the model table is vocab²-bounded, so this loop is model-sized
        nll = np.fromiter(
            (math.floor(-math.log(cab / cta) * 10000)
             for cab, cta in zip(g["c"], ca)),
            np.int64, len(g),
        )
        return pd.DataFrame({"a": g["a"], "b": g["b"], "nll_m": nll})

    return hash_exchange(
        [partials], reduce_fit, num_partitions=P,
        schema=_MODEL, in_schemas=[_PAIR_IN],
    )


def score_docs(docs: ray.data.Dataset,
               model: pd.DataFrame) -> ray.data.Dataset:
    """``(doc_id, n_bigrams, n_unseen, nll_msum)`` for every document with
    ≥1 bigram, scored under ``model`` (a ``fit_bigram_model`` frame —
    vocabulary²-bounded, broadcast once)."""
    mref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        pairs = _bigram_frame(t).to_pandas()
        if not len(pairs):
            return _OUT.empty_table()
        m = ray.get(mref)
        j = pairs.merge(m, on=["a", "b"], how="left")
        j["unseen"] = j["nll_m"].isna().astype(np.int64)
        j["v"] = j["nll_m"].fillna(0).astype(np.int64)
        out = j.groupby("doc_id", sort=False, as_index=False).agg(
            n_bigrams=("a", "size"), n_unseen=("unseen", "sum"),
            nll_msum=("v", "sum"))
        return pa.Table.from_pandas(out, preserve_index=False).cast(_OUT)

    return docs.map_batches(score, batch_format="pyarrow")


def bigram_lm_scores(sf_dir: str, *,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """The corpus scored under its own bigram model (CCNet self-scoring;
    ``n_unseen`` is identically 0 in this mode)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    model = fit_bigram_model(docs, num_partitions=num_partitions).to_pandas()
    return score_docs(docs, model)


_BUCKET_OUT = pa.schema([
    ("doc_id", pa.int64()), ("lang", pa.string()), ("ppl_m", pa.int64()),
    ("lang_rank", pa.int64()), ("n_lang", pa.int64()),
    ("bucket", pa.string()),
])
_BAND_PARTIAL = pa.schema([
    ("lang", pa.string()), ("band", pa.int64()), ("n", pa.int64()),
])


def _scored_with_lang(docs: ray.data.Dataset,
                      model: pd.DataFrame) -> ray.data.Dataset:
    """``(doc_id, lang, ppl_m)`` — quantized mean NLL per doc,
    ``ppl_m = nll_msum // n_bigrams`` (integer, order-independent).

    ``lang`` rides along from the SAME batch (a local merge on doc_id),
    so attaching it costs no exchange."""
    mref = ray.put(model)
    out_schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                            ("ppl_m", pa.int64())])

    def score(t: pa.Table) -> pa.Table:
        pairs = _bigram_frame(t).to_pandas()
        if not len(pairs):
            return out_schema.empty_table()
        m = ray.get(mref)
        j = pairs.merge(m, on=["a", "b"], how="left")
        j["v"] = j["nll_m"].fillna(0).astype(np.int64)
        per = j.groupby("doc_id", sort=False, as_index=False).agg(
            nb=("a", "size"), sm=("v", "sum"))
        per["ppl_m"] = per["sm"].to_numpy(np.int64) \
            // per["nb"].to_numpy(np.int64)
        lang = pd.DataFrame({
            "doc_id": t["doc_id"].to_pandas(),
            "lang": t["lang"].to_pandas(),
        })
        out = per.merge(lang, on="doc_id")[["doc_id", "lang", "ppl_m"]]
        return pa.Table.from_pandas(out, preserve_index=False) \
            .cast(out_schema)

    return docs.map_batches(score, batch_format="pyarrow")


def ppl_bucket_rows(
    docs: ray.data.Dataset, *, band_width: int = 1024,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """CCNet head/middle/tail perplexity partition (Wenzek et al. 2020
    §4.4): per language, rank documents by quantized mean bigram NLL
    ascending and cut the ranking into thirds — ``head`` = the
    best-scoring third the LM filter keeps, ``tail`` = the worst.

    ``(doc_id, lang, ppl_m, lang_rank, n_lang, bucket)`` for every doc
    with ≥1 bigram; ``lang_rank`` orders by ``(ppl_m, doc_id)`` so the
    output is deterministic, and ``bucket`` derives from the exact
    integer predicate ``3·(rank−1) // n_lang`` (sizes differ by ≤1).

    Distributed ranking WITHOUT a global sort (the
    ``deterministic_shuffle`` pattern): ``ppl_m`` is a bounded integer,
    so ``band = ppl_m // band_width`` RANGE-partitions each language's
    score axis.  Phase 1 reduces the corpus to (lang, band) counts
    (vocabulary-of-bands-sized — the only driver collect); phase 2 adds
    each band's exclusive prefix base to its local ``(ppl_m, doc_id)``
    sort.  Shuffle volume is two short columns + two int64s per doc;
    text never moves.  Skew note: a (lang, band) pair owns one
    partition's slice of the rank — ``band_width`` trades band-count
    overhead against the hottest band's size."""
    P = num_partitions
    model = fit_bigram_model(docs, num_partitions=P).to_pandas()
    scored = _scored_with_lang(docs, model).materialize()

    def band_partial(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _BAND_PARTIAL.empty_table().append_column(
                "_part", pa.array([], pa.int64()))
        df = pd.DataFrame({
            "lang": t["lang"].to_pandas(),
            "band": t["ppl_m"].to_numpy() // band_width,
        })
        g = df.groupby(["lang", "band"], sort=False, as_index=False) \
            .size().rename(columns={"size": "n"})
        out = pa.Table.from_pandas(g, preserve_index=False) \
            .cast(_BAND_PARTIAL)
        return out.append_column("_part", pa.array(key_partition(
            out["lang"].to_numpy(zero_copy_only=False), P)))

    def band_reduce(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "lang": pd.Series([], dtype=object),
                "band": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64)})
        return df.groupby(["lang", "band"], sort=False,
                          as_index=False)["n"].sum()

    counts = hash_exchange(
        [scored.map_batches(band_partial, batch_format="pyarrow")],
        band_reduce, num_partitions=P, schema=_BAND_PARTIAL,
    ).to_pandas()  # (langs × bands)-sized: the planner table, not rows

    counts = counts.sort_values(["lang", "band"]).reset_index(drop=True)
    grp = counts.groupby("lang", sort=False)
    base = (grp["n"].cumsum() - counts["n"]).to_numpy(np.int64)
    n_lang = grp["n"].transform("sum").to_numpy(np.int64)
    bases = {
        (la, int(bd)): (int(bs), int(nl))
        for la, bd, bs, nl in zip(counts["lang"], counts["band"],
                                  base, n_lang)
    }
    bref = ray.put(bases)

    def with_part(t: pa.Table) -> pa.Table:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        band = t["ppl_m"].to_numpy() // band_width
        key = np.array([f"{la}|{bd}" for la, bd in zip(lang, band)],
                       dtype=object)
        return t.append_column("_part", pa.array(key_partition(key, P)))

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "lang": pd.Series([], dtype=object),
                "ppl_m": pd.Series([], dtype=np.int64),
                "lang_rank": pd.Series([], dtype=np.int64),
                "n_lang": pd.Series([], dtype=np.int64),
                "bucket": pd.Series([], dtype=object)})
        b = ray.get(bref)
        df = df.copy()
        df["band"] = df["ppl_m"].to_numpy(np.int64) // band_width
        df = df.sort_values(["lang", "band", "ppl_m", "doc_id"],
                            kind="stable").reset_index(drop=True)
        g = df.groupby(["lang", "band"], sort=False)
        local = g.cumcount().to_numpy(np.int64)
        meta = np.array([b[(la, int(bd))]
                         for la, bd in zip(df["lang"], df["band"])],
                        dtype=np.int64)
        rank = meta[:, 0] + local + 1
        n = meta[:, 1]
        code = 3 * (rank - 1) // n
        df["lang_rank"] = rank
        df["n_lang"] = n
        df["bucket"] = np.array(["head", "middle", "tail"],
                                dtype=object)[code]
        return df[["doc_id", "lang", "ppl_m", "lang_rank", "n_lang",
                   "bucket"]]

    return hash_exchange(
        [scored.map_batches(with_part, batch_format="pyarrow")],
        rank_part, num_partitions=P, schema=_BUCKET_OUT,
    )


def ppl_buckets(sf_dir: str, *, band_width: int = 1024,
                num_partitions: int = 16) -> ray.data.Dataset:
    """The corpus partitioned into CCNet head/middle/tail by its own
    bigram model (self-scored, so every bigram is in-model)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ppl_bucket_rows(docs, band_width=band_width,
                           num_partitions=num_partitions)


def ppl_buckets_sql() -> str:
    """DuckDB twin: the bigram-score CTEs verbatim, then the identical
    integer mean, rank, and third-cut arithmetic via window functions."""
    return """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents),
bg AS (
  SELECT doc_id, t[g.i] AS a, t[g.i + 1] AS b
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) > 1),
cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2),
ca AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
nll AS (
  SELECT a, b,
         CAST(floor(-ln(CAST(c_ab AS DOUBLE) / c_a) * 10000) AS BIGINT) AS v
  FROM cab JOIN ca USING (a)),
s AS (
  SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(v) AS BIGINT) AS sm
  FROM bg JOIN nll USING (a, b) GROUP BY 1),
sc AS (
  SELECT d.doc_id, d.lang, CAST(s.sm // s.nb AS BIGINT) AS ppl_m
  FROM s JOIN documents d USING (doc_id)),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY lang ORDER BY ppl_m, doc_id)
           AS lang_rank,
         count(*) OVER (PARTITION BY lang) AS n_lang
  FROM sc)
SELECT doc_id, lang, ppl_m, CAST(lang_rank AS BIGINT) AS lang_rank,
       CAST(n_lang AS BIGINT) AS n_lang,
       CASE WHEN 3 * (lang_rank - 1) < n_lang THEN 'head'
            WHEN 3 * (lang_rank - 1) < 2 * n_lang THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r"""


def bigram_lm_scores_sql() -> str:
    """DuckDB twin (self-scored corpus: every bigram is in-model, so
    ``n_unseen`` is identically 0)."""
    return """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents),
bg AS (
  SELECT doc_id, t[g.i] AS a, t[g.i + 1] AS b
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) > 1),
cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2),
ca AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
nll AS (
  SELECT a, b,
         CAST(floor(-ln(CAST(c_ab AS DOUBLE) / c_a) * 10000) AS BIGINT) AS v
  FROM cab JOIN ca USING (a))
SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(0 AS BIGINT) AS n_unseen,
       CAST(sum(v) AS BIGINT) AS nll_msum
FROM bg JOIN nll USING (a, b)
GROUP BY 1"""
