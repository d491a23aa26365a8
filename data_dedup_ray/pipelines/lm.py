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
