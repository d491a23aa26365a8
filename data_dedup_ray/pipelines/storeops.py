"""Store maintenance — compaction for the append-only crawl stores.

Every store tier (fpstore content-sha / simhash, sigstore signatures,
index shingle blobs) appends one directory per crawl and reads lists of
directories.  After many crawls the same url has one row per revisit;
readers cope, but (a) the index side of every incremental job carries
dead rows and (b) list-reads accumulate small files.  ``compact_store``
rewrites N crawl directories into ONE, keeping the LATEST crawl's row
per id (later paths win — the order the crawls were appended), through
a single hash exchange that moves (id, payload, crawl#) rows once.

Payload-agnostic: works on any ``(id, <payload columns...>)`` store the
sinks in this repo write.  The compacted directory is itself a
resumable-sink store (part dirs, _SUCCESS, _META lineage recording the
source count), so downstream list-reads mix compacted and fresh crawl
directories freely.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition


def compact_store(
    paths: list[str],
    out_path: str | None = None,
    *,
    id_col: str = "url",
    num_partitions: int = 32,
    config: dict | None = None,
) -> ray.data.Dataset:
    """Latest-wins union of ``paths`` (later path = newer crawl).

    Returns the compacted ``(id, payload...)`` Dataset; when
    ``out_path`` is given, also persists it as a resumable store."""
    from data_dedup_ray.pipelines.fpstore import _read_store

    if not paths:
        raise ValueError("compact_store needs at least one store path")
    P = num_partitions

    def tag(k: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t[id_col].combine_chunks().cast(pa.string())
            return t.set_column(
                t.schema.get_field_index(id_col), id_col, ids
            ).append_column(
                "_crawl", pa.array(np.full(len(ids), k, np.int64))
            ).append_column(
                "_part", pa.array(key_partition(
                    ids.to_numpy(zero_copy_only=False), P)))
        return fn

    # list-read form: explicit part=*/ *.parquet files, so the hive
    # `part` directory key never becomes a phantom payload column
    stores = [_read_store([p]) for p in paths]
    parts = [s.map_batches(tag(k), batch_format="pyarrow")
             for k, s in enumerate(stores)]
    ds = parts[0]
    for nxt in parts[1:]:
        ds = ds.union(nxt)

    base = stores[0].schema().base_schema
    out_schema = pa.schema([base.field(n) for n in base.names])
    in_schema = out_schema.append(pa.field("_crawl", pa.int64()))
    payload = [n for n in base.names if n != id_col]

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in base.names})
        # stable sort: within-crawl duplicate ids tie on _crawl, so
        # input (file) order must break the tie deterministically
        win = (df.sort_values("_crawl", kind="stable")
                 .drop_duplicates(id_col, keep="last"))
        return win[[id_col, *payload]].reset_index(drop=True)

    def pre_latest(t: pa.Table) -> pa.Table:
        # map-side combiner: latest per id within the split group
        df = t.to_pandas()
        win = df.sort_values("_crawl", kind="stable").drop_duplicates(
            [id_col, "_part"], keep="last")
        return pa.Table.from_pandas(win, preserve_index=False)

    compacted = hash_exchange(
        [ds], keep_latest, num_partitions=P, schema=out_schema,
        in_schemas=[in_schema], pre=[pre_latest],
    )
    if out_path is not None:
        from data_dedup_ray.state.sink import resumable_write_parquet

        compacted = compacted.materialize()
        resumable_write_parquet(
            compacted, out_path, key_col=id_col, num_partitions=P,
            config={"kind": "compacted_store", "n_sources": len(paths),
                    "id_col": id_col, **(config or {})},
        )
    return compacted


_AUDIT_SCHEMA = pa.schema([
    ("crawl", pa.int64()), ("n_rows", pa.int64()),
    ("n_distinct_payloads", pa.int64()), ("n_seen_earlier", pa.int64()),
    ("seen_earlier_bp", pa.int64()),
])


def store_audit(
    paths: list[str],
    *,
    payload_col: str = "sha",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-crawl dedup accounting straight from the persisted store
    ladder — the corpus text is never re-read (the whole point of
    keeping 32 B/doc state): one row per crawl directory with

    - ``n_rows`` / ``n_distinct_payloads`` — within-crawl exact-dup
      pressure (rows minus distinct = same-crawl copies);
    - ``n_seen_earlier`` / ``seen_earlier_bp`` — rows whose payload
      already existed in ANY earlier crawl's store (the re-capture
      carryover an incremental funnel skips without tokenizing).

    One hash exchange keyed on the payload moves ``(payload, crawl)``
    rows once; each partition resolves first-seen crawls locally
    (payload co-location makes per-partition distinct counts globally
    additive), emitting crawl-count-sized partials."""
    from data_dedup_ray.pipelines.fpstore import _read_store

    if not paths:
        raise ValueError("store_audit needs at least one store path")
    P = num_partitions

    def tag(k: int):
        def fn(t: pa.Table) -> pa.Table:
            pay = t[payload_col].combine_chunks().cast(pa.string())
            return pa.table({
                "payload": pay,
                "crawl": pa.array(np.full(len(pay), k, np.int64)),
                "_part": pa.array(key_partition(
                    pay.to_numpy(zero_copy_only=False), P)),
            })
        return fn

    tagged = [_read_store([p]).map_batches(tag(k), batch_format="pyarrow")
              for k, p in enumerate(paths, start=1)]
    ds = tagged[0]
    for nxt in tagged[1:]:
        ds = ds.union(nxt)

    in_schema = pa.schema([("payload", pa.string()),
                           ("crawl", pa.int64())])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in
                                 ["crawl", "n_rows", "n_distinct",
                                  "n_seen_earlier"]})
        first = df.groupby("payload")["crawl"].transform("min")
        df = df.assign(_seen=(df["crawl"] > first).astype(np.int64))
        g = df.groupby("crawl").agg(
            n_rows=("payload", "size"),
            n_distinct=("payload", "nunique"),
            n_seen_earlier=("_seen", "sum"),
        ).reset_index()
        return g.astype(np.int64)

    p = hash_exchange(
        [ds], partials, num_partitions=P,
        schema=pa.schema([("crawl", pa.int64()), ("n_rows", pa.int64()),
                          ("n_distinct", pa.int64()),
                          ("n_seen_earlier", pa.int64())]),
        in_schemas=[in_schema],
    ).to_pandas()  # crawl-count x P rows — never data-sized
    rows = []
    for k in range(1, len(paths) + 1):
        g = p[p["crawl"] == k]
        n_rows = int(g["n_rows"].sum())
        seen = int(g["n_seen_earlier"].sum())
        rows.append({
            "crawl": k, "n_rows": n_rows,
            "n_distinct_payloads": int(g["n_distinct"].sum()),
            "n_seen_earlier": seen,
            "seen_earlier_bp": 10000 * seen // max(n_rows, 1),
        })
    return ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=_AUDIT_SCHEMA))


def store_audit_sql() -> str:
    """DuckDB twin of auditing the web_pages (crawl 1) + snapshot2
    (crawl 2) content-hash stores."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    return snapshots_sql("""
, u AS (
  SELECT sha256(text) AS sha, 1 AS k FROM web_pages
  UNION ALL SELECT sha256(text), 2 FROM snapshot2),
firstk AS (SELECT sha, min(k) AS mk FROM u GROUP BY sha)
SELECT u.k AS crawl, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT u.sha) AS BIGINT) AS n_distinct_payloads,
       CAST(sum(CASE WHEN u.k > f.mk THEN 1 ELSE 0 END) AS BIGINT)
         AS n_seen_earlier,
       CAST(10000 * sum(CASE WHEN u.k > f.mk THEN 1 ELSE 0 END)
            // count(*) AS BIGINT) AS seen_earlier_bp
FROM u JOIN firstk f ON u.sha = f.sha
GROUP BY u.k""")


def compact_hash_store_sql() -> str:
    """DuckDB twin of compacting the web_pages (crawl 1) + snapshot2
    (crawl 2) content-hash stores: per url, the sha of the LATEST
    capture's text (arg_max by crawl#)."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    return snapshots_sql(
        ", uall AS (SELECT url, text, 1 AS k FROM web_pages"
        "  UNION ALL SELECT url, text, 2 FROM snapshot2)"
        " SELECT url, sha256(arg_max(text, k)) AS sha"
        " FROM uall GROUP BY url"
    )
