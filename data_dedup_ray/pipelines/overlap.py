"""Corpus OVERLAP matrix — pairwise exact content overlap between N
sources, the planning input for multi-source mixing and cross-source
dedup ordering.

Before assembling a training mix (pipelines/mixing.py) or scheduling
cross-corpus dedup passes, a pipeline wants to know how much each pair
of sources shares: two crawls of the same web are near-copies, a books
source and a web source barely intersect.  For every unordered source
pair this reports, over DISTINCT exact content (sha256 of the text
bytes — the same 32 B identity the fpstore ladder keeps):

- ``n_a`` / ``n_b``            — distinct contents per source;
- ``n_inter`` / ``n_union``    — exact set intersection / union;
- ``jaccard_bp``               — ``10^4 * inter // union``;
- ``containment_a_bp`` (``_b``) — ``10^4 * inter // n_a`` — how much of
  A already lives in B (the dedup-ordering signal: dedup the contained
  side against the container first).

Scale shape: one multi-input hash exchange keyed on the sha — each
source ships per-batch-deduped ``(sha)`` rows only (pre-combined, then
re-deduped per partition per the exchange's split-group contract).
Since every sha lands in exactly one partition, per-partition distinct
and intersection counts are globally additive; the driver sees
``pairs x P`` integer partials.  Sources = the number of corpora (a
handful), so the per-partition pair loop is O(sources²) over numpy
set ops, never over rows.

SQL twin: ``corpus_overlap_sql`` restates the 3-crawl case (web_pages /
snapshot2 / snapshot3) with DuckDB sha256 + set aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_OUT_SCHEMA = pa.schema([
    ("source_a", pa.string()), ("source_b", pa.string()),
    ("n_a", pa.int64()), ("n_b", pa.int64()),
    ("n_inter", pa.int64()), ("n_union", pa.int64()),
    ("jaccard_bp", pa.int64()),
    ("containment_a_bp", pa.int64()), ("containment_b_bp", pa.int64()),
])

_SHA = pa.schema([("sha", pa.string())])


def corpus_overlap(
    sources: list[tuple[str, ray.data.Dataset]],
    *,
    id_col: str = "url",
    text_col: str = "text",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Pairwise overlap rows for every unordered source pair (ordered
    by position in ``sources``)."""
    from data_dedup_ray.pipelines.fpstore import content_hash_rows

    if len(sources) < 2:
        raise ValueError("corpus_overlap needs at least two sources")
    P = num_partitions
    names = [n for n, _ in sources]

    def shas(t: pa.Table) -> pa.Table:
        s = np.unique(t["sha"].to_numpy(zero_copy_only=False))
        return pa.table({
            "sha": s, "_part": pa.array(key_partition(s, P)),
        })

    def pre_dedup(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates("sha")
        return pa.Table.from_pandas(df, preserve_index=False)

    inputs = [
        content_hash_rows(ds, id_col=id_col, text_col=text_col)
        .select_columns(["sha"])
        .map_batches(shas, batch_format="pyarrow")
        for _, ds in sources
    ]

    def partials(*dfs: pd.DataFrame) -> pd.DataFrame:
        sets = [np.unique(d["sha"].to_numpy()) for d in dfs]
        rows = []
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                inter = len(np.intersect1d(
                    sets[i], sets[j], assume_unique=True))
                rows.append({"i": i, "j": j, "n_a": len(sets[i]),
                             "n_b": len(sets[j]), "n_inter": inter})
        return pd.DataFrame(rows)

    p = hash_exchange(
        inputs, partials, num_partitions=P,
        schema=pa.schema([("i", pa.int64()), ("j", pa.int64()),
                          ("n_a", pa.int64()), ("n_b", pa.int64()),
                          ("n_inter", pa.int64())]),
        in_schemas=[_SHA] * len(sources),
        pre=[pre_dedup] * len(sources),
    ).to_pandas()  # pairs x P integer partials
    out = []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            g = p[(p["i"] == i) & (p["j"] == j)]
            n_a, n_b = int(g["n_a"].sum()), int(g["n_b"].sum())
            inter = int(g["n_inter"].sum())
            union = n_a + n_b - inter
            out.append({
                "source_a": names[i], "source_b": names[j],
                "n_a": n_a, "n_b": n_b,
                "n_inter": inter, "n_union": union,
                "jaccard_bp": 10000 * inter // max(union, 1),
                "containment_a_bp": 10000 * inter // max(n_a, 1),
                "containment_b_bp": 10000 * inter // max(n_b, 1),
            })
    return ray.data.from_arrow(
        pa.Table.from_pylist(out, schema=_OUT_SCHEMA))


def corpus_overlap_sql() -> str:
    """DuckDB twin of ``corpus_overlap`` over the three crawls
    (web_pages 's1', snapshot2 's2', snapshot3 's3')."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import (SNAPSHOT2_CTE,
                                                    SNAPSHOT3_CTE)

    return f"""
WITH {WEB_PAGES_CTE},
{SNAPSHOT2_CTE},
{SNAPSHOT3_CTE},
u AS (
  SELECT DISTINCT 's1' AS src, sha256(text) AS sha FROM web_pages
  UNION SELECT DISTINCT 's2', sha256(text) FROM snapshot2
  UNION SELECT DISTINCT 's3', sha256(text) FROM snapshot3),
pairs(a, b) AS (VALUES ('s1','s2'), ('s1','s3'), ('s2','s3')),
m AS (
  SELECT p.a, p.b,
         (SELECT count(*) FROM u WHERE src = p.a) AS n_a,
         (SELECT count(*) FROM u WHERE src = p.b) AS n_b,
         (SELECT count(*) FROM u x JOIN u y
            ON x.sha = y.sha AND x.src = p.a AND y.src = p.b)
           AS n_inter
  FROM pairs p)
SELECT a AS source_a, b AS source_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(n_a + n_b - n_inter AS BIGINT) AS n_union,
       CAST(10000 * n_inter // greatest(n_a + n_b - n_inter, 1)
            AS BIGINT) AS jaccard_bp,
       CAST(10000 * n_inter // greatest(n_a, 1) AS BIGINT)
         AS containment_a_bp,
       CAST(10000 * n_inter // greatest(n_b, 1) AS BIGINT)
         AS containment_b_bp
FROM m"""
