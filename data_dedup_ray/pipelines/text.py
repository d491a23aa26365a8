"""Text-analysis pipelines over the ``documents`` table.

Each is the scalable composition of the stages in stages/textstats.py:
stateless vectorized ``map_batches`` for per-row signals, and the
pre-aggregate-then-small-groupby pattern for the wide stats (one partial
row per (lang, source) per batch enters the shuffle — not one per doc).
"""

from __future__ import annotations

import pandas as pd
import ray.data

from data_dedup_ray.util import autoscale_pool
from ray.data.aggregate import Sum

from data_dedup_ray.stages import textstats


def token_stats(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(textstats.token_stats, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_token_chars", "n_punct"]
    )


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(textstats.quality_scores, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_token_chars", "n_punct", "n_stopwords",
         "stop_ratio_bp", "punct_ratio_bp", "keep"]
    )


def lang_id(sf_dir: str, *, concurrency: int | tuple | None = None) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    from data_dedup_ray.util import stage_task

    return docs.map_batches(
        stage_task(textstats.LangId), batch_format="pyarrow"
    ).select_columns(["doc_id", "lang_pred"])


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        textstats.doc_fingerprint, batch_format="pyarrow"
    ).select_columns(["doc_id", "fingerprint"])


def doc_stats_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Grouped corpus stats with per-batch pre-aggregation (combiner) before
    the small shuffle — the scalable aggregate shape (SURVEY.md §4)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_tokens"] = [
            len(textstats.TOKEN_RE.findall(t.lower())) for t in b["text"]
        ]
        return (
            b.groupby(["lang", "source"], sort=False)
            .agg(
                n_docs=("doc_id", "count"),
                sum_chars=("n_chars", "sum"),
                total_tokens=("n_tokens", "sum"),
            )
            .reset_index()
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source"])
        .aggregate(
            Sum(on="n_docs", alias_name="n_docs"),
            Sum(on="sum_chars", alias_name="sum_chars"),
            Sum(on="total_tokens", alias_name="total_tokens"),
        )
    )
