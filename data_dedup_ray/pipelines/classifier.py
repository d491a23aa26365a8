"""Hashed-linear text quality scoring — the model-serving stage shape.

A fastText-style linear classifier over hashed token features, with a
weight function deterministic enough to restate bit-for-bit in SQL:

    w(token)   = (int(md5("w|" + token)[:8], 16) % 2001) - 1000
    score(doc) = Σ over token OCCURRENCES of w(token)      (exact int)

The weights stand in for a trained model's parameter table — what makes
this operator worth keeping at 100 TB is the SERVING shape, which is the
real thing: a per-worker scorer built once per process (``stage_task``)
holding a token→weight memo (bounded, like text._BPEMergeCounter's word
memo), scoring whole Arrow batches with one vectorized map over each
batch's DISTINCT tokens (weight lookups are vocabulary-bounded, the
per-occurrence sum is numpy).  Swapping in real learned weights is a
one-line change (broadcast the table via ``ray.put``, the
clean.remove_boilerplate pattern).

DuckDB twin: ``CAST('0x' || substr(md5(...), 1, 8) AS BIGINT)`` parses
the same 8 hex chars to the same non-negative int — both sides apply
identical ``% 2001 - 1000`` integer arithmetic."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import polars as pl  # module-level: workers import it once, serially
import pyarrow as pa
import ray

_MOD = 2001
_OFF = 1000


def _weight(token: str) -> int:
    h = hashlib.md5(b"w|" + token.encode("utf-8")).hexdigest()
    return int(h[:8], 16) % _MOD - _OFF


class _HashedLinearScorer:
    """Per-worker scorer state: the token→weight memo (the 'model')."""

    def __init__(self):
        self.memo: dict[str, int] = {}

    def _weights_for(self, vocab: np.ndarray) -> np.ndarray:
        memo = self.memo
        out = np.empty(len(vocab), dtype=np.int64)
        for i, tok in enumerate(vocab):
            w = memo.get(tok)
            if w is None:
                w = _weight(tok)
                if len(memo) < 1_000_000:  # bound worker memory
                    memo[tok] = w
            out[i] = w
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        s = pl.from_arrow(t["text"].combine_chunks()).str.to_lowercase()
        lst = s.str.extract_all(r"[a-z0-9]+")
        counts = lst.list.len().fill_null(0).to_numpy().astype(np.int64)
        score = np.zeros(len(ids), dtype=np.int64)
        if counts.sum():
            toks = lst.explode().drop_nulls().to_numpy().astype(object)
            vocab, inv = np.unique(toks, return_inverse=True)
            w = self._weights_for(vocab)[inv]
            doc_of = np.repeat(np.arange(len(ids)), counts)
            score = np.bincount(doc_of, weights=w,
                                minlength=len(ids)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "score": pa.array(score),
            "n_tokens": pa.array(counts),
        })


def quality_classifier_scores(sf_dir: str) -> ray.data.Dataset:
    """``(doc_id, score, n_tokens)`` — exact integer hashed-linear scores
    for every document (one streaming pass, no shuffle)."""
    from data_dedup_ray.util import stage_task

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(stage_task(_HashedLinearScorer),
                            batch_format="pyarrow")


def quality_classifier_scores_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents),
w AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('w|' || tok), 1, 8)) AS BIGINT)
           % {_MOD} - {_OFF} AS wt
  FROM toks),
s AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS score,
             count(*) AS n_tokens
      FROM w GROUP BY doc_id)
SELECT d.doc_id, coalesce(s.score, 0) AS score,
       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN s USING (doc_id)"""


def top_quality_per_domain(
    ds: "ray.data.Dataset", *, k: int = 3, num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(domain, url, score)`` — each domain's ``k`` best pages by the
    hashed-linear score (ties → lexicographically-first url).  The
    per-site curation pick ("keep the best page(s) per host").

    Scale shape: scoring is the shuffle-free scorer pass; the grouped
    top-k uses the events.top_k_per_user pattern — a map-side combiner
    prunes every batch to ≤ k rows per domain BEFORE the exchange, so
    the shuffle carries at most k rows per (domain, batch), never the
    corpus."""
    from data_dedup_ray.engine.exchange import hash_exchange, key_partition
    from data_dedup_ray.pipelines.snapshots import domain_of
    from data_dedup_ray.util import stage_task

    P = num_partitions
    scorer = stage_task(_HashedLinearScorer)

    def score_rows(t: pa.Table) -> pa.Table:
        scored = scorer(pa.table({
            "doc_id": pa.array(np.arange(t.num_rows, dtype=np.int64)),
            "text": t["text"].combine_chunks(),
        }))
        urls = t["url"].to_numpy(zero_copy_only=False)
        doms = np.asarray([domain_of(u) for u in urls], dtype=object)
        return pa.table({
            "domain": pa.array(doms, pa.string()),
            "url": t["url"].combine_chunks(),
            "score": scored["score"],
            "_part": pa.array(key_partition(doms, P)),
        })

    def prune(t: pa.Table) -> pa.Table:
        # combiner: keep ≤ k rows per domain inside the split group
        df = t.to_pandas()
        df = df.sort_values(["domain", "score", "url"],
                            ascending=[True, False, True], kind="stable")
        return pa.Table.from_pandas(
            df.groupby("domain", sort=False).head(k),
            preserve_index=False)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["domain", "score", "url"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("domain", sort=False).head(k)

    return hash_exchange(
        [ds.map_batches(score_rows, batch_format="pyarrow")],
        fin,
        num_partitions=P,
        schema=pa.schema([("domain", pa.string()), ("url", pa.string()),
                          ("score", pa.int64())]),
        in_schemas=[pa.schema([("domain", pa.string()),
                               ("url", pa.string()),
                               ("score", pa.int64())])],
        pre=[prune],
    )


def top_quality_per_domain_sql(k: int = 3) -> str:
    from data_dedup_ray.corpus import web_pages_sql

    return web_pages_sql(f"""
SELECT domain, url, score FROM (
  SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain, url,
         coalesce((SELECT CAST(sum(
             CAST(('0x' || substr(md5('w|' || t.tok), 1, 8)) AS BIGINT)
               % {_MOD} - {_OFF}) AS BIGINT)
           FROM unnest(regexp_extract_all(lower(w.text), '[a-z0-9]+'))
                AS t(tok)), 0) AS score
  FROM web_pages w)
QUALIFY row_number() OVER (PARTITION BY domain
                           ORDER BY score DESC, url) <= {k}""")
