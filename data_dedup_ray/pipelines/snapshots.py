"""Cross-snapshot corpus management — the operations a recurring crawl needs.

The reference deduplicates one static directory tree per run
(/root/reference/lib/Data/Dedup/Files.pm:215-240, multi-scan accumulation
Files.pm:24-44).  A web-scale corpus is instead a SEQUENCE of snapshots:
each re-crawl revisits urls, most pages are unchanged, and the pipeline
must (a) collapse revisits to the latest capture, (b) find which new
pages carry genuinely new content vs the existing index, (c) sample
deterministically for eval sets, and (d) roll quality stats up by
domain.  These four operators fill that gap (SURVEY.md §2.6 lists
joins/set-ops/sampling as absent from the reference).

Scale notes
-----------
- ``latest_by_url`` / ``new_content`` each do ONE ``hash_exchange``
  (sortless bucketing, engine/exchange.py) keyed on hash(url) /
  content-sha respectively; both carry only (key, small ints) through
  the shuffle — never ``text``/``html`` (SURVEY.md §7.4: project wide
  binary away before any shuffle).
- ``latest_by_url`` is algebraic: the map-side ``pre`` combiner keeps
  one row per url per split group, so shuffle volume is O(distinct
  urls in the group), not O(captures).
- ``new_content`` co-partitions BOTH sides by content hash — at 100 TB
  the "existing index" side is itself huge, so a broadcast build is
  impossible; co-partitioning keeps each anti-join probe local.  The
  sha prefix is uniform, so bucket skew cannot occur even when one
  text value repeats (dup keys still land together but the per-bucket
  fn is a set lookup, O(rows)).
- ``sample_pages`` and ``domain_stats`` are embarrassingly parallel
  map-side ops; domain rollup pre-aggregates per batch so the final
  exchange moves one row per (domain, lang) per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import (
    BASE_TS,
    HTML_PRE_A,
    HTML_PRE_B,
    HTML_POST,
    WEB_PAGES_CTE,
    web_pages,
)
from data_dedup_ray.engine.exchange import hash_exchange, key_partition

RECRAWL_SUFFIX = " updated rev2"
RECRAWL3_SUFFIX = " updated rev3"


# --------------------------------------------------------------------------
# Snapshot 2: a deterministic re-crawl of part of the corpus
# --------------------------------------------------------------------------


def _derive2(batch: pd.DataFrame) -> pd.DataFrame:
    doc_id = batch["doc_id"]
    sub = batch.loc[(doc_id % 3) == 0]
    ids = sub["doc_id"]
    changed = (ids % 6) != 0
    text = sub["text"].where(~changed, sub["text"] + RECRAWL_SUFFIX)
    url = (
        "https://site" + (ids % 20).astype(str) + ".example/p/" + ids.astype(str)
    )
    ts = (
        pd.Timestamp(BASE_TS)
        + pd.to_timedelta(ids, unit="m")
        + pd.Timedelta(days=30)
    ).astype("datetime64[us]")
    html = (
        (HTML_PRE_A + ids.astype(str) + HTML_PRE_B + text + HTML_POST)
        .str.encode("utf-8")
    )
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": sub["lang"],
            "inode_id": ids.astype("int64"),
        }
    )


def _derive3(batch: pd.DataFrame) -> pd.DataFrame:
    doc_id = batch["doc_id"]
    sub = batch.loc[(doc_id % 5) == 0]
    ids = sub["doc_id"]
    changed = (ids % 10) != 0
    text = sub["text"].where(~changed, sub["text"] + RECRAWL3_SUFFIX)
    url = (
        "https://site" + (ids % 20).astype(str) + ".example/p/" + ids.astype(str)
    )
    ts = (
        pd.Timestamp(BASE_TS)
        + pd.to_timedelta(ids, unit="m")
        + pd.Timedelta(days=60)
    ).astype("datetime64[us]")
    html = (
        (HTML_PRE_A + ids.astype(str) + HTML_PRE_B + text + HTML_POST)
        .str.encode("utf-8")
    )
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": sub["lang"],
            "inode_id": ids.astype("int64"),
        }
    )


def snapshot3(sf_dir: str) -> ray.data.Dataset:
    """The second re-crawl, another month on: every ``doc_id % 5 == 0``
    base url is revisited; ``doc_id % 10 == 0`` captures are byte-identical
    to snapshot 1, the rest gained a rev-3 trailing edit."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return docs.map_batches(_derive3, batch_format="pandas")


#: DuckDB twin of ``snapshot3`` (same shape as SNAPSHOT2_CTE).
SNAPSHOT3_CTE = (
    "snapshot3 AS (\n"
    "  SELECT 'https://site' || (doc_id % 20) || '.example/p/' || doc_id AS url,\n"
    f"         TIMESTAMP '{BASE_TS}' + doc_id * INTERVAL 1 MINUTE"
    " + INTERVAL 60 DAY AS warc_ts,\n"
    f"         encode('{HTML_PRE_A}' || doc_id || '{HTML_PRE_B}' || "
    "CASE WHEN doc_id % 10 = 0 THEN text ELSE text || "
    f"'{RECRAWL3_SUFFIX}' END || '{HTML_POST}') AS html,\n"
    "         CASE WHEN doc_id % 10 = 0 THEN text ELSE text || "
    f"'{RECRAWL3_SUFFIX}' END AS text,\n"
    "         lang, CAST(doc_id AS BIGINT) AS inode_id\n"
    "  FROM documents WHERE doc_id % 5 = 0\n"
    ")"
)


def snapshot2(sf_dir: str) -> ray.data.Dataset:
    """The month-later re-crawl: every ``doc_id % 3 == 0`` base url is
    revisited; captures with ``doc_id % 6 == 0`` are byte-identical to
    snapshot 1, the rest gained a trailing edit."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return docs.map_batches(_derive2, batch_format="pandas")


#: DuckDB twin of ``snapshot2`` (same shape as corpus.WEB_PAGES_CTE).
SNAPSHOT2_CTE = (
    "snapshot2 AS (\n"
    "  SELECT 'https://site' || (doc_id % 20) || '.example/p/' || doc_id AS url,\n"
    f"         TIMESTAMP '{BASE_TS}' + doc_id * INTERVAL 1 MINUTE"
    " + INTERVAL 30 DAY AS warc_ts,\n"
    f"         encode('{HTML_PRE_A}' || doc_id || '{HTML_PRE_B}' || "
    "CASE WHEN doc_id % 6 = 0 THEN text ELSE text || "
    f"'{RECRAWL_SUFFIX}' END || '{HTML_POST}') AS html,\n"
    "         CASE WHEN doc_id % 6 = 0 THEN text ELSE text || "
    f"'{RECRAWL_SUFFIX}' END AS text,\n"
    "         lang, CAST(doc_id AS BIGINT) AS inode_id\n"
    "  FROM documents WHERE doc_id % 3 = 0\n"
    ")"
)


def snapshots_sql(select: str) -> str:
    """Wrap a SELECT over ``web_pages`` + ``snapshot2`` with both CTEs."""
    return f"WITH {WEB_PAGES_CTE},\n{SNAPSHOT2_CTE}\n{select}"


# --------------------------------------------------------------------------
# Latest capture per url across snapshots
# --------------------------------------------------------------------------



def domain_of(url: str) -> str:
    """Host part of a url — SQL-twin semantics (split_part(url,'//',2)
    then up to the first '/'): scheme-less urls yield '' instead of
    raising, exactly like the oracle side."""
    parts = url.split("//", 1)
    return "" if len(parts) < 2 else parts[1].split("/", 1)[0]


def _url_part(urls: np.ndarray, P: int) -> np.ndarray:
    return key_partition(urls, P)


def latest_by_url(
    snapshots: list[ray.data.Dataset],
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Collapse all captures of a url to the newest one.

    ``(url, warc_ts_us, text_len)`` — arg-max by capture time (ties →
    longer text; fully deterministic under any partitioning).  The union
    of snapshots never co-locates by url on its own, so this is one
    exchange keyed on hash(url); the ``pre`` combiner already keeps only
    one row per url per split group.
    """
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        urls = np.asarray(t["url"].to_pylist(), dtype=object)
        return pa.table({
            "url": t["url"].combine_chunks(),
            "warc_ts_us": t["warc_ts"].combine_chunks().cast(pa.int64()),
            "text_len": pa.compute.utf8_length(t["text"]).cast(pa.int64()),
            "_part": pa.array(_url_part(urls, P)),
        })

    def _keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["url", "warc_ts_us", "text_len"],
            ascending=[True, False, False], kind="stable",
        )
        return df.groupby("url", sort=False).head(1)

    def combine(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _keep_latest(t.to_pandas()), preserve_index=False
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return _keep_latest(df)[["url", "warc_ts_us", "text_len"]]

    part_schema = pa.schema([
        ("url", pa.string()), ("warc_ts_us", pa.int64()),
        ("text_len", pa.int64()),
    ])
    prepped = [
        ds.map_batches(prep, batch_format="pyarrow") for ds in snapshots
    ]
    return hash_exchange(
        prepped,
        lambda *dfs: final(pd.concat(dfs, ignore_index=True)),
        num_partitions=P,
        schema=part_schema,
        in_schemas=[part_schema] * len(prepped),
        pre=[combine] * len(prepped),
    )


def latest_by_url_sql() -> str:
    return snapshots_sql(
        "SELECT url, epoch_us(warc_ts) AS warc_ts_us,"
        " CAST(length(text) AS BIGINT) AS text_len FROM ("
        "  SELECT url, warc_ts, text, row_number() OVER ("
        "    PARTITION BY url ORDER BY warc_ts DESC, length(text) DESC"
        "  ) AS rn FROM ("
        "    SELECT url, warc_ts, text FROM web_pages"
        "    UNION ALL SELECT url, warc_ts, text FROM snapshot2))"
        " WHERE rn = 1"
    )


# --------------------------------------------------------------------------
# Incremental dedup: which re-crawled pages carry NEW content?
# --------------------------------------------------------------------------


def _sha_prep(P: int, keep_url: bool):
    def fn(t: pa.Table) -> pa.Table:
        from data_dedup_ray.pipelines.fpstore import sha256_hex

        shas = sha256_hex(t["text"].to_pylist())
        part = [int(s[:8], 16) % P for s in shas]
        cols = {"sha": pa.array(shas, pa.string())}
        if keep_url:
            cols["url"] = t["url"].combine_chunks()
            cols["text_len"] = pa.compute.utf8_length(t["text"]).cast(pa.int64())
        cols["_part"] = pa.array(part, pa.int64())
        return pa.table(cols)
    return fn


def _distinct_sha(t: pa.Table) -> pa.Table:
    return t.group_by(["sha", "_part"]).aggregate([])


def new_content(
    new_ds: ray.data.Dataset,
    index_ds: ray.data.Dataset,
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Anti-join by full-content SHA-256: pages of ``new_ds`` whose exact
    content does NOT already exist anywhere in ``index_ds``.

    ``(url, text_len)``.  Both sides co-partition on the sha prefix in
    one two-input exchange; the index side ships only distinct hashes
    (``pre`` combiner), never content.  This is the "dedup the new crawl
    against the existing corpus" primitive — the incremental counterpart
    of the reference's whole-directory rescan (Files.pm:24-44 accumulates
    scans but re-hashes everything; here the index side is hashes only).
    """
    P = num_partitions

    def anti(new_df: pd.DataFrame, idx_df: pd.DataFrame) -> pd.DataFrame:
        keep = ~new_df["sha"].isin(set(idx_df["sha"]))
        out = new_df.loc[keep, ["url", "text_len"]]
        return out.reset_index(drop=True)

    new_schema = pa.schema([
        ("sha", pa.string()), ("url", pa.string()), ("text_len", pa.int64()),
    ])
    idx_schema = pa.schema([("sha", pa.string())])
    return hash_exchange(
        [
            new_ds.map_batches(_sha_prep(P, True), batch_format="pyarrow"),
            index_ds.map_batches(_sha_prep(P, False), batch_format="pyarrow"),
        ],
        anti,
        num_partitions=P,
        schema=pa.schema([("url", pa.string()), ("text_len", pa.int64())]),
        in_schemas=[new_schema, idx_schema],
        pre=[None, _distinct_sha],
    )


def new_content_sql() -> str:
    return snapshots_sql(
        "SELECT s2.url, CAST(length(s2.text) AS BIGINT) AS text_len"
        " FROM snapshot2 s2 WHERE NOT EXISTS ("
        "  SELECT 1 FROM web_pages w WHERE w.text = s2.text)"
    )


# --------------------------------------------------------------------------
# Deterministic hash sampling
# --------------------------------------------------------------------------


def sample_pages(
    ds: ray.data.Dataset,
    *,
    threshold: str = "4",
) -> ray.data.Dataset:
    """Keep pages whose ``md5(url)`` hex digest sorts below ``threshold``
    — a content-independent, seed-free sample that is STABLE across runs,
    partitionings, and snapshot versions (the same url is always in or
    always out; ``threshold='4'`` ≈ 25%).  ``ds.random_sample`` cannot
    give that stability.  ``(url, lang, text_len)``."""

    def fn(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        keep = pa.array(
            [hashlib.md5(u.encode("utf-8")).hexdigest() < threshold
             for u in urls],
            pa.bool_(),
        )
        t = t.filter(keep)
        return pa.table({
            "url": t["url"].combine_chunks(),
            "lang": t["lang"].combine_chunks(),
            "text_len": pa.compute.utf8_length(t["text"]).cast(pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_pages_sql(threshold: str = "4") -> str:
    from data_dedup_ray.corpus import web_pages_sql

    return web_pages_sql(
        "SELECT url, lang, CAST(length(text) AS BIGINT) AS text_len"
        f" FROM web_pages WHERE md5(url) < '{threshold}'"
    )


# --------------------------------------------------------------------------
# Broadcast blocklist filter
# --------------------------------------------------------------------------

#: demo blocklist for the driver query (oracle pins the same values)
DEFAULT_BLOCKED = ("mirror.example", "site3.example", "site7.example")


class _DomainFilter:
    """Blocklist held once per worker via a broadcast ``ObjectRef`` —
    the small-side-lookup pattern (``ray.put`` once, ``ray.get`` in the
    per-worker constructor), NOT a shuffle join and NOT a per-batch
    closure re-ship: a real crawl blocklist is millions of domains."""

    def __init__(self, blocked_ref):
        import ray

        blocked = (
            ray.get(blocked_ref)
            if isinstance(blocked_ref, ray.ObjectRef) else blocked_ref
        )
        self.blocked = frozenset(blocked)

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        keep = pa.array(
            [domain_of(u) not in self.blocked
             for u in urls],
            pa.bool_(),
        )
        t = t.filter(keep)
        return pa.table({
            "url": t["url"].combine_chunks(),
            "lang": t["lang"].combine_chunks(),
            "text_len": pa.compute.utf8_length(t["text"]).cast(pa.int64()),
        })


def filter_blocked_domains(
    ds: ray.data.Dataset,
    blocked=DEFAULT_BLOCKED,
) -> ray.data.Dataset:
    """Drop pages whose url host is on the blocklist.
    ``(url, lang, text_len)`` of the surviving pages."""
    import ray

    ref = ray.put(sorted(set(blocked)))
    from data_dedup_ray.util import stage_task

    return ds.map_batches(
        stage_task(_DomainFilter, blocked_ref=ref), batch_format="pyarrow"
    )


def filter_blocked_domains_sql(blocked=DEFAULT_BLOCKED) -> str:
    from data_dedup_ray.corpus import web_pages_sql

    quoted = ", ".join(f"'{d}'" for d in sorted(set(blocked)))
    return web_pages_sql(
        "SELECT url, lang, CAST(length(text) AS BIGINT) AS text_len"
        " FROM web_pages"
        f" WHERE split_part(split_part(url, '//', 2), '/', 1) NOT IN ({quoted})"
    )


# --------------------------------------------------------------------------
# Per-domain rollup
# --------------------------------------------------------------------------


def domain_stats(
    ds: ray.data.Dataset,
    *,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Crawl health by site: ``(domain, n_pages, total_text_chars,
    n_langs)``.  Partial-aggregates per batch to (domain, lang) rows, so
    the exchange moves O(domains × langs), not O(pages) — the
    pre-aggregate-before-groupby rule (SURVEY.md §4)."""
    P = num_partitions

    def partial(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        dom = pa.array([domain_of(u) for u in urls])
        tl = pa.compute.utf8_length(t["text"]).cast(pa.int64())
        g = pa.table({
            "domain": dom, "lang": t["lang"].combine_chunks(), "chars": tl,
        }).group_by(["domain", "lang"]).aggregate(
            [("chars", "sum"), ("chars", "count")]
        ).rename_columns(["domain", "lang", "chars", "n"])
        part = pa.array(
            (pd.util.hash_array(np.asarray(g["domain"].to_pylist(),
                                           dtype=object))
             % np.uint64(P)).astype(np.int64)
        )
        return g.append_column("_part", part)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby("domain", sort=False)
            .agg(
                n_pages=("n", "sum"),
                total_text_chars=("chars", "sum"),
                n_langs=("lang", "nunique"),
            )
            .reset_index()
        )
        return out[["domain", "n_pages", "total_text_chars", "n_langs"]]

    prepped = ds.map_batches(partial, batch_format="pyarrow")
    return hash_exchange(
        [prepped],
        final,
        num_partitions=P,
        schema=pa.schema([
            ("domain", pa.string()), ("n_pages", pa.int64()),
            ("total_text_chars", pa.int64()), ("n_langs", pa.int64()),
        ]),
        in_schemas=[pa.schema([
            ("domain", pa.string()), ("lang", pa.string()),
            ("chars", pa.int64()), ("n", pa.int64()),
        ])],
    )


def domain_stats_sql() -> str:
    from data_dedup_ray.corpus import web_pages_sql

    return web_pages_sql(
        "SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,"
        " count(*) AS n_pages,"
        " CAST(sum(length(text)) AS BIGINT) AS total_text_chars,"
        " count(DISTINCT lang) AS n_langs"
        " FROM web_pages GROUP BY 1"
    )


# --------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup — the 10^12-doc path for new_content
# --------------------------------------------------------------------------

#: Bloom geometry for the driver query (test scale).  At 10^12 docs the
#: index-side filter is sized ~10 bits/key (1.25 TB total) and built as a
#: per-node tree reduce; the geometry below keeps the same code path with
#: a 2^20-bit (128 KiB) filter.
BLOOM_BITS = 1 << 20
BLOOM_K = 4


def _bloom_positions(sha_hex: str, m: int) -> list[int]:
    """k bit positions derived from disjoint 32-bit slices of the SHA-256
    hex digest — no extra hashing; sha256 is already uniform."""
    return [int(sha_hex[i * 8:(i + 1) * 8], 16) % m for i in range(BLOOM_K)]


def new_content_bloom(
    new_ds: ray.data.Dataset,
    index_ds: ray.data.Dataset,
    *,
    num_partitions: int = 32,
    bloom_bits: int = BLOOM_BITS,
) -> ray.data.Dataset:
    """``new_content`` with a broadcast Bloom prefilter: EXACTLY the same
    result (Bloom filters have no false negatives; false positives are
    removed by the exact anti-join), but only the tiny candidate slice of
    the new crawl enters the shuffle.

    Why this is the scale path: in a recurring crawl ~95% of captures are
    byte-identical re-crawls or genuinely new pages whose sha misses the
    filter outright.  ``new_content`` ships every new-side hash through
    the exchange; here the definite-new majority short-circuits after one
    broadcast-bitmap probe (``ray.put`` once, fetched once per worker),
    and only Bloom-positive candidates (true dups + ~0.1% false
    positives at 10 bits/key) pay the co-partitioned verify join.

    Build shape: per-batch partial bitmaps over the index side (one
    128 KiB row per batch, OR-merged streaming on the driver — a
    reduction to ONE small object, the same contract as ``count()``; a
    multi-node run tree-reduces instead).  ``(url, text_len)``.
    """
    import ray

    from data_dedup_ray.util import stage_task

    m = bloom_bits

    def partial_bitmap(t: pa.Table) -> pa.Table:
        from data_dedup_ray.pipelines.fpstore import sha256_hex

        bits = np.zeros(m // 8, dtype=np.uint8)
        for sha in sha256_hex(t["text"].to_pylist()):
            for p in _bloom_positions(sha, m):
                bits[p >> 3] |= 1 << (p & 7)
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    bitmap = np.zeros(m // 8, dtype=np.uint8)
    partials = index_ds.map_batches(partial_bitmap, batch_format="pyarrow")
    for b in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in b["bitmap"].to_pylist():
            np.bitwise_or(bitmap, np.frombuffer(buf, np.uint8), out=bitmap)
    bitmap_ref = ray.put(bitmap)

    class _Probe:
        """Hash each new-side page and test the broadcast bitmap."""

        def __init__(self, ref):
            self.bits = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            from data_dedup_ray.pipelines.fpstore import sha256_hex

            texts = t["text"].to_pylist()
            shas = sha256_hex(texts)
            maybe = np.zeros(len(texts), dtype=bool)
            for i, sha in enumerate(shas):
                maybe[i] = all(
                    self.bits[p >> 3] & (1 << (p & 7))
                    for p in _bloom_positions(sha, m)
                )
            return pa.table({
                "url": t["url"].combine_chunks(),
                "text_len": pa.compute.utf8_length(t["text"]).cast(pa.int64()),
                "sha": pa.array(shas, pa.string()),
                "maybe_dup": pa.array(maybe),
            })

    # hashes + flag only (never text) — tiny, so materializing to split the
    # stream into definite-new vs needs-verify is one small checkpoint
    probed = new_ds.map_batches(
        stage_task(_Probe, ref=bitmap_ref), batch_format="pyarrow"
    ).materialize()
    import pyarrow.compute as pc

    definite = probed.map_batches(
        lambda t: t.filter(pc.invert(t["maybe_dup"]))
                   .select(["url", "text_len"]),
        batch_format="pyarrow",
    )

    P = num_partitions

    def cand_prep(t: pa.Table) -> pa.Table:
        t = t.filter(t["maybe_dup"])
        part = [int(s[:8], 16) % P for s in t["sha"].to_pylist()]
        return pa.table({
            "sha": t["sha"].combine_chunks(),
            "url": t["url"].combine_chunks(),
            "text_len": t["text_len"].combine_chunks(),
            "_part": pa.array(part, pa.int64()),
        })

    def anti(new_df: pd.DataFrame, idx_df: pd.DataFrame) -> pd.DataFrame:
        keep = ~new_df["sha"].isin(set(idx_df["sha"]))
        return new_df.loc[keep, ["url", "text_len"]].reset_index(drop=True)

    out_schema = pa.schema([("url", pa.string()), ("text_len", pa.int64())])
    verified = hash_exchange(
        [
            probed.map_batches(cand_prep, batch_format="pyarrow"),
            index_ds.map_batches(_sha_prep(P, False), batch_format="pyarrow"),
        ],
        anti,
        num_partitions=P,
        schema=out_schema,
        in_schemas=[
            pa.schema([
                ("sha", pa.string()), ("url", pa.string()),
                ("text_len", pa.int64()),
            ]),
            pa.schema([("sha", pa.string())]),
        ],
        pre=[None, _distinct_sha],
    )
    return definite.union(verified)


def new_content_bloom_sql() -> str:
    return new_content_sql()  # identical result by construction


def domain_dup_stats(
    ds: ray.data.Dataset, *, num_partitions: int = 16
) -> ray.data.Dataset:
    """Per-domain duplication report: ``(domain, n_pages, n_distinct,
    dup_rate_bp)`` — which sites are mirror farms.  Per-batch partials
    carry (domain, sha) pairs already deduped within the batch, the
    domain-keyed exchange counts distinct content per domain, and the
    rate is integer basis points.  The reference's global dup tallies
    (CLI.pm:313-321) become a keyed rollup."""
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        domains = [domain_of(u) for u in urls]
        from data_dedup_ray.pipelines.fpstore import sha256_hex

        shas = sha256_hex(t["text"].to_pylist())
        out = pa.table({
            "domain": pa.array(domains, pa.string()),
            "sha": pa.array(shas, pa.string()),
            "n": pa.array(np.ones(len(urls), np.int64)),
        })
        g = out.group_by(["domain", "sha"]).aggregate([("n", "sum")])
        g = g.rename_columns(["domain", "sha", "n"])
        part = key_partition(g["domain"].to_pylist(), P)
        return g.append_column("_part", pa.array(part))

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["domain", "sha", "_part"]).aggregate([("n", "sum")])
            .rename_columns(["domain", "sha", "_part", "n"])
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("domain", sort=False).agg(
            n_pages=("n", "sum"), n_distinct=("sha", "nunique")
        ).reset_index()
        out["dup_rate_bp"] = (
            (out["n_pages"] - out["n_distinct"]) * 10000 // out["n_pages"]
        )
        return out

    part_schema = pa.schema([
        ("domain", pa.string()), ("sha", pa.string()), ("n", pa.int64()),
    ])
    return hash_exchange(
        [ds.map_batches(prep, batch_format="pyarrow")],
        final,
        num_partitions=P,
        schema=pa.schema([
            ("domain", pa.string()), ("n_pages", pa.int64()),
            ("n_distinct", pa.int64()), ("dup_rate_bp", pa.int64()),
        ]),
        in_schemas=[part_schema],
        pre=[combine],
    )


def domain_dup_stats_sql() -> str:
    from data_dedup_ray.corpus import web_pages_sql

    return web_pages_sql(
        "SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,"
        " count(*) AS n_pages, count(DISTINCT text) AS n_distinct,"
        " (count(*) - count(DISTINCT text)) * 10000 // count(*)"
        "   AS dup_rate_bp"
        " FROM web_pages GROUP BY 1"
    )


# --------------------------------------------------------------------------
# Capture-duplication timeline across crawls
# --------------------------------------------------------------------------

_TIMELINE_SCHEMA = pa.schema([
    ("epoch_day", pa.int64()), ("n_captures", pa.int64()),
    ("n_dup_captures", pa.int64()), ("dup_bp", pa.int64()),
])

_US_PER_DAY = 86_400 * 1_000_000


def crawl_dup_timeline(
    snapshots: list[ray.data.Dataset],
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Duplication rate over TIME: one row per capture day across all
    crawls, counting captures whose exact content was already captured
    at an earlier ``(warc_ts, url)`` — the trend line an operations
    dashboard plots to see crawl-over-crawl redundancy grow.

    A capture is a dup iff another row with the same content sha sorts
    strictly earlier by ``(warc_ts, url)`` (url is the deterministic
    tiebreak).  One sha-keyed exchange resolves first captures locally
    per partition (sha co-location), emitting day-count-sized partials;
    the driver sees only the day x partition rollup."""
    import hashlib

    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        from data_dedup_ray.pipelines.fpstore import sha256_hex

        shas = sha256_hex(t["text"].to_pylist())
        sha_arr = pa.array(shas, pa.string())
        return pa.table({
            "sha": sha_arr,
            "ts_us": t["warc_ts"].combine_chunks().cast(pa.int64()),
            "url": t["url"].combine_chunks().cast(pa.string()),
            "_part": pa.array(key_partition(
                np.asarray(shas, dtype=object), P)),
        })

    ds = snapshots[0].map_batches(prep, batch_format="pyarrow")
    for nxt in snapshots[1:]:
        ds = ds.union(nxt.map_batches(prep, batch_format="pyarrow"))

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in
                                 ["epoch_day", "n", "ndup"]})
        df = df.sort_values(["sha", "ts_us", "url"], kind="stable")
        dup = (df["sha"] == df["sha"].shift()).to_numpy()
        df = df.assign(
            epoch_day=(df["ts_us"] // _US_PER_DAY).astype(np.int64),
            _dup=dup.astype(np.int64))
        g = df.groupby("epoch_day").agg(
            n=("sha", "size"), ndup=("_dup", "sum")).reset_index()
        return g.astype(np.int64)

    p = hash_exchange(
        [ds], partials, num_partitions=P,
        schema=pa.schema([("epoch_day", pa.int64()), ("n", pa.int64()),
                          ("ndup", pa.int64())]),
        in_schemas=[pa.schema([("sha", pa.string()),
                               ("ts_us", pa.int64()),
                               ("url", pa.string())])],
    ).to_pandas()  # days x P rows
    g = (p.groupby("epoch_day")[["n", "ndup"]].sum().reset_index()
          .sort_values("epoch_day"))
    return ray.data.from_arrow(pa.table({
        "epoch_day": g["epoch_day"].astype(np.int64),
        "n_captures": g["n"].astype(np.int64),
        "n_dup_captures": g["ndup"].astype(np.int64),
        "dup_bp": (10000 * g["ndup"] // g["n"]).astype(np.int64),
    }, schema=_TIMELINE_SCHEMA))


def crawl_dup_timeline_sql() -> str:
    """DuckDB twin over the three crawls (web_pages + snapshot2 +
    snapshot3)."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    day = "CAST(86400 AS BIGINT) * 1000000"
    return f"""
WITH {WEB_PAGES_CTE},
{SNAPSHOT2_CTE},
{SNAPSHOT3_CTE},
u AS (
  SELECT url, warc_ts, sha256(text) AS sha FROM web_pages
  UNION ALL SELECT url, warc_ts, sha256(text) FROM snapshot2
  UNION ALL SELECT url, warc_ts, sha256(text) FROM snapshot3),
r AS (
  SELECT epoch_us(warc_ts) // ({day}) AS epoch_day,
         row_number() OVER (PARTITION BY sha
                            ORDER BY warc_ts, url) AS rn
  FROM u)
SELECT CAST(epoch_day AS BIGINT) AS epoch_day,
       CAST(count(*) AS BIGINT) AS n_captures,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_captures,
       CAST(10000 * sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
            // count(*) AS BIGINT) AS dup_bp
FROM r GROUP BY epoch_day"""


# --------------------------------------------------------------------------
# Per-host content change rates between crawls (revisit scheduling)
# --------------------------------------------------------------------------

_CHANGE_SCHEMA = pa.schema([
    ("host", pa.string()), ("n_revisited", pa.int64()),
    ("n_changed", pa.int64()), ("change_bp", pa.int64()),
])


def host_change_rates(crawl1: ray.data.Dataset, crawl2: ray.data.Dataset,
                      *, num_partitions: int = 32) -> ray.data.Dataset:
    """Per-host re-crawl change rate: of urls captured in BOTH crawls,
    how many changed content — ``(host, n_revisited, n_changed,
    change_bp)``.  The number a crawl scheduler turns into a revisit
    interval (fast-changing hosts get short intervals; static mirrors
    barely need re-fetching).  Each side ships ``(url, sha)`` partials
    through ONE url-keyed exchange (text never shuffles); the matched
    per-partition host tallies are P·hosts-sized, summed on the driver."""
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        from data_dedup_ray.pipelines.fpstore import sha256_hex

        urls = t["url"].to_pylist()
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "sha": pa.array(sha256_hex(t["text"].to_pylist()), pa.string()),
            "_part": pa.array(key_partition(
                np.asarray(urls, dtype=object), P)),
        })

    def matched(d1: pd.DataFrame, d2: pd.DataFrame) -> pd.DataFrame:
        m = d1.merge(d2, on="url", suffixes=("_1", "_2"))
        if not len(m):
            return pd.DataFrame({
                "host": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "chg": pd.Series([], dtype=np.int64)})
        host = m["url"].astype(object).str.split("/").str[2].fillna("")
        chg = (m["sha_1"] != m["sha_2"]).to_numpy()
        g = (pd.DataFrame({"host": host, "chg": chg.astype(np.int64)})
             .groupby("host", sort=False)
             .agg(n=("chg", "size"), chg=("chg", "sum")).reset_index())
        return g

    in_schema = pa.schema([("url", pa.string()), ("sha", pa.string())])
    parts = hash_exchange(
        [crawl1.select_columns(["url", "text"]).map_batches(
            prep, batch_format="pyarrow"),
         crawl2.select_columns(["url", "text"]).map_batches(
            prep, batch_format="pyarrow")],
        matched, num_partitions=P,
        schema=pa.schema([("host", pa.string()), ("n", pa.int64()),
                          ("chg", pa.int64())]),
        in_schemas=[in_schema, in_schema],
    ).to_pandas()  # P·hosts partial rows — host-scale
    if not len(parts):
        return ray.data.from_arrow(_CHANGE_SCHEMA.empty_table())
    out = (parts.groupby("host", sort=False)
           .agg(n_revisited=("n", "sum"), n_changed=("chg", "sum"))
           .reset_index())
    n = out["n_revisited"].to_numpy(np.int64)
    c = out["n_changed"].to_numpy(np.int64)
    out["change_bp"] = c * 10000 // np.maximum(n, 1)
    return ray.data.from_arrow(pa.Table.from_pandas(
        out.astype({k: np.int64 for k in out.columns if k != "host"}),
        schema=_CHANGE_SCHEMA, preserve_index=False))


def host_change_rates_sql() -> str:
    host = "split_part(split_part(w.url, '//', 2), '/', 1)"
    return snapshots_sql(
        f"""SELECT {host} AS host,
       CAST(count(*) AS BIGINT) AS n_revisited,
       CAST(sum(CASE WHEN w.text <> s.text THEN 1 ELSE 0 END)
            AS BIGINT) AS n_changed,
       CAST(sum(CASE WHEN w.text <> s.text THEN 1 ELSE 0 END) * 10000
            // count(*) AS BIGINT) AS change_bp
FROM web_pages w JOIN snapshot2 s ON s.url = w.url
GROUP BY 1"""
    )


_CHURN_SCHEMA = pa.schema([
    ("host", pa.string()), ("n_common", pa.int64()),
    ("n_gone", pa.int64()), ("n_new", pa.int64()),
])


def host_url_churn(crawl1: ray.data.Dataset, crawl2: ray.data.Dataset,
                   *, num_partitions: int = 32) -> ray.data.Dataset:
    """Per-host URL turnover between crawls: ``(host, n_common, n_gone,
    n_new)`` — urls captured in both, only in crawl 1 (disappeared), and
    only in crawl 2 (appeared).  Together with ``host_change_rates``
    this is the full revisit-policy input: churny hosts need discovery
    crawls, stable-but-changing hosts need refresh crawls.  Each side
    ships bare ``(url,)`` rows through one url-keyed exchange; the
    per-partition host tallies are P·hosts-sized and summed driver-side."""
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "_part": pa.array(key_partition(
                np.asarray(urls, dtype=object), P)),
        })

    def tally(d1: pd.DataFrame, d2: pd.DataFrame) -> pd.DataFrame:
        m = pd.merge(d1.assign(a=1), d2.assign(b=1), on="url", how="outer")
        if not len(m):
            return pd.DataFrame({
                "host": pd.Series([], dtype=object),
                "n_common": pd.Series([], dtype=np.int64),
                "n_gone": pd.Series([], dtype=np.int64),
                "n_new": pd.Series([], dtype=np.int64)})
        host = m["url"].astype(object).str.split("/").str[2].fillna("")
        ina = m["a"].notna().to_numpy()
        inb = m["b"].notna().to_numpy()
        g = (pd.DataFrame({
                "host": host,
                "n_common": (ina & inb).astype(np.int64),
                "n_gone": (ina & ~inb).astype(np.int64),
                "n_new": (~ina & inb).astype(np.int64)})
             .groupby("host", sort=False).sum().reset_index())
        return g

    in_schema = pa.schema([("url", pa.string())])
    parts = hash_exchange(
        [crawl1.select_columns(["url"]).map_batches(
            prep, batch_format="pyarrow"),
         crawl2.select_columns(["url"]).map_batches(
            prep, batch_format="pyarrow")],
        tally, num_partitions=P, schema=_CHURN_SCHEMA,
        in_schemas=[in_schema, in_schema],
    ).to_pandas()
    if not len(parts):
        return ray.data.from_arrow(_CHURN_SCHEMA.empty_table())
    out = parts.groupby("host", sort=False).sum().reset_index()
    return ray.data.from_arrow(pa.Table.from_pandas(
        out.astype({k: np.int64 for k in out.columns if k != "host"}),
        schema=_CHURN_SCHEMA, preserve_index=False))


def host_url_churn_sql() -> str:
    host = ("split_part(split_part(coalesce(w.url, s.url), '//', 2),"
            " '/', 1)")
    return snapshots_sql(
        f"""SELECT {host} AS host,
       CAST(sum(CASE WHEN w.url IS NOT NULL AND s.url IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       CAST(sum(CASE WHEN s.url IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_gone,
       CAST(sum(CASE WHEN w.url IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new
FROM web_pages w FULL OUTER JOIN snapshot2 s ON s.url = w.url
GROUP BY 1"""
    )
