"""Token-budget corpus MIXING — multi-source training-mix assembly.

Training sets are assembled from several corpora at prescribed token
budgets (web crawl vs re-crawl vs curated sources; the static-weights
step of DoReMi-style mixture tuning).  Each source is down-sampled with
the repo's deterministic hash rule at a rate derived from its measured
token total:

    keep(doc)  iff  int(md5(source|url)[:8], 16) < thr(source)
    thr        =    min(budget · 2³² // max(total_tokens, 1), 2³²)

All-integer threshold arithmetic, so the DuckDB twin reproduces the
EXACT member set (no float rates); the sample is stable across runs,
partitionings and corpus growth on the kept side (a url's fate depends
only on the seeded hash and the source's total).

Two streaming passes per source (totals, then the filter) — the rate
depends on the measured total, so a second pass is inherent; both are
shuffle-free and column-pruned."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

from data_dedup_ray.stages.minhash import token_counts

_SCALE = 1 << 32

#: default per-source token budgets for the web_pages + snapshot2 mix
DEFAULT_BUDGETS = {"web": 30_000, "snap2": 15_000}


def _threshold(budget: int, total: int) -> int:
    return min(budget * _SCALE // max(total, 1), _SCALE)


def mix_corpora(
    sources: "dict[str, ray.data.Dataset]",
    budgets: "dict[str, int]",
) -> ray.data.Dataset:
    """``(source, url, n_tokens)`` — the union of the per-source samples
    hitting each source's token budget in expectation."""
    outs = []
    for name, ds in sources.items():
        budget = budgets[name]
        totals = ds.map_batches(
            lambda t: pa.table({"n": pa.array(token_counts(t["text"]))}),
            batch_format="pyarrow",
        ).sum("n")
        thr = _threshold(budget, int(totals or 0))

        def keep(t: pa.Table, name=name, thr=thr) -> pa.Table:
            urls = t["url"].to_pylist()
            mask = pa.array(
                [int(hashlib.md5(f"{name}|{u}".encode()).hexdigest()[:8],
                     16) < thr for u in urls],
                pa.bool_(),
            )
            t = t.filter(mask)
            return pa.table({
                "source": pa.array([name] * t.num_rows, pa.string()),
                "url": t["url"].combine_chunks(),
                "n_tokens": pa.array(token_counts(t["text"])),
            })

        outs.append(ds.map_batches(keep, batch_format="pyarrow"))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def mix_web_snapshots(sf_dir: str,
                      budgets: "dict[str, int] | None" = None):
    """The driver mix: the web_pages index corpus + the snapshot2
    re-crawl, sampled to DEFAULT_BUDGETS tokens each."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines.snapshots import snapshot2

    b = budgets or DEFAULT_BUDGETS
    return mix_corpora(
        {"web": web_pages(sf_dir), "snap2": snapshot2(sf_dir)}, b)


def mix_web_snapshots_sql(budgets: "dict[str, int] | None" = None) -> str:
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    b = budgets or DEFAULT_BUDGETS
    toks = "len(regexp_extract_all(text, '[a-z0-9]+'))"

    def side(src: str, table: str) -> str:
        return f"""
SELECT '{src}' AS source, url, CAST({toks} AS BIGINT) AS n_tokens
FROM {table},
     (SELECT CAST(coalesce(sum({toks}), 0) AS BIGINT) AS t
      FROM {table}) tot
WHERE CAST(('0x' || substr(md5('{src}' || '|' || url), 1, 8)) AS BIGINT)
      < least(CAST({b[src]} AS BIGINT) * {_SCALE}
                // greatest(tot.t, 1), {_SCALE})"""

    return snapshots_sql(
        side("web", "web_pages") + "\nUNION ALL" + side("snap2", "snapshot2"))
