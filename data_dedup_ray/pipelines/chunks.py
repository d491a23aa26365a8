"""Chunk-level storage dedup over the binary ``html`` column — fixed-size
and content-defined (CDC) chunking.

north_rule extension.  The reference deduplicates whole files by a digest
cascade (/root/reference/lib/Data/Dedup/Files.pm:104-116); classic storage
dedup refines that to SUB-file granularity: split each blob into chunks,
hash each chunk, and group identical chunks across the corpus.  Two
splitters:

- ``fixed_chunk_rows``: fixed ``chunk_size``-byte offsets — the simple
  splitter, and the SQL-twin-able one (DuckDB can restate it exactly:
  ``sha256(lower(substring(hex(html), 1 + i*2L, 2L)))`` over an unnested
  ``range(ceil(octet_length/L))`` — see ``oracles.chunk_dedup_fixed_sql``).
  One byte inserted at the front shifts every later chunk, so fixed
  chunking misses shifted duplicates — which is exactly what CDC fixes.
- ``cdc_chunk_rows``: content-defined chunking with a gear rolling hash
  (the LBFS / FastCDC family: Muthitacharoen et al., SOSP'01 "A
  Low-bandwidth Network File System"; Xia et al., USENIX ATC'16
  "FastCDC").  A boundary is declared after byte ``i`` when the gear
  hash of the trailing 64 bytes has ``log2(avg_size)`` zero low bits,
  clamped to ``[min_size, max_size]``.  Boundaries depend only on LOCAL
  content, so an insertion re-synchronizes within ~one chunk and the
  rest of the blob dedups against the unshifted copy (pinned by the
  shift-resilience property test).

Chunk identity is ``sha256`` of the LOWERCASE HEX of the chunk bytes —
hex rather than raw bytes only because the SQL twin's ``sha256()`` takes
VARCHAR, not BLOB; both sides hash the identical string.

Vectorization: the gear hash is computed for ALL positions of a batch in
64 numpy ops (the 64-byte window makes it a shift-weighted convolution —
the same trick as the rolling token-window hashes in stages/substring.py);
the min/max clamp walks only the SPARSE candidate set (≈ bytes/avg_size
entries).  Per-chunk sha256 is a C-speed hashlib call per chunk (bounded
by chunks-per-batch, never per byte).

100 TB shape: chunk BYTES never enter a shuffle — only fixed-width
``(chunk_hash, chunk_len, url)`` rows flow through the sortless
``hash_exchange``, with a map-side combiner collapsing within-batch
repeats before the exchange; the multi-copy group table that reaches the
caller is output-sized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.engine.exchange import hash_exchange, key_partition

#: gear table: 256 deterministic uint64s, derived from public knowledge
#: only (sha256 of the byte value) — no seed state to ship to workers
_GEAR = np.frombuffer(
    b"".join(hashlib.sha256(bytes([i])).digest()[:8] for i in range(256)),
    dtype=">u8",
).astype(np.uint64)

_WINDOW = 64  # gear window: bits shifted out after 64 steps

_CHUNK_ROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("chunk_idx", pa.int64()),
        ("chunk_len", pa.int64()),
        ("chunk_hash", pa.string()),
    ]
)

_GROUP_SCHEMA = pa.schema(
    [
        ("chunk_hash", pa.string()),
        ("n_copies", pa.int64()),
        ("chunk_len", pa.int64()),
        ("canonical_url", pa.string()),
    ]
)


def _chunk_hash(chunk: bytes) -> str:
    return hashlib.sha256(chunk.hex().encode("ascii")).hexdigest()


def _binary_buffers(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """binary column → (concatenated uint8 data, int64 row offsets)."""
    arr = col.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    width = 8 if pa.types.is_large_binary(arr.type) else 4
    off_dt = np.int64 if width == 8 else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dt,
                        count=len(arr) + 1 + arr.offset)
    off = off[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, off


def fixed_chunk_rows(
    pages: ray.data.Dataset,
    *,
    chunk_size: int = 512,
    id_col: str = "url",
    html_col: str = "html",
    distinct_per_page: bool = False,
) -> ray.data.Dataset:
    """``(url, chunk_idx, chunk_len, chunk_hash[, url_chunks])`` —
    fixed-offset chunks.

    ``distinct_per_page=True`` emits one row per DISTINCT chunk hash of
    each page (first occurrence's idx/len) plus the page's distinct
    count as ``url_chunks``.  Consumers that count per-page or
    per-(page, chunk) facts from the row stream need this form: the
    rows become globally unique AT EMISSION, so per-batch partial
    counts stay additive no matter how downstream stages re-batch the
    stream (a page's rows may split across batch boundaries — nothing
    downstream may assume they don't)."""
    L = int(chunk_size)

    def fn(t: pa.Table) -> pa.Table:
        data, off = _binary_buffers(t[html_col])
        ids = t[id_col].to_pylist()
        urls, idxs, lens, hashes, counts = [], [], [], [], []
        mv = data.tobytes()  # one copy; memoryview slices after
        for r, url in enumerate(ids):
            s, e = int(off[r]), int(off[r + 1])
            seen: dict = {}
            n0 = len(urls)
            for ci, cs in enumerate(range(s, e, L)):
                ce = min(cs + L, e)
                h = _chunk_hash(mv[cs:ce])
                if distinct_per_page:
                    if h in seen:
                        continue
                    seen[h] = True
                urls.append(url)
                idxs.append(ci)
                lens.append(ce - cs)
                hashes.append(h)
            if distinct_per_page:
                counts.extend([len(urls) - n0] * (len(urls) - n0))
        cols = {
            "url": pa.array(urls, pa.string()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "chunk_len": pa.array(lens, pa.int64()),
            "chunk_hash": pa.array(hashes, pa.string()),
        }
        if distinct_per_page:
            cols["url_chunks"] = pa.array(counts, pa.int64())
        return pa.table(cols)

    return pages.map_batches(fn, batch_format="pyarrow")


def _gear_hashes(data: np.ndarray) -> np.ndarray:
    """Gear hash at every position of ``data`` (uint8) in 64 numpy ops:
    ``h[i] = Σ_{j<64} GEAR[data[i-j]] << j`` — the closed form of the
    recurrence ``h = (h << 1) + GEAR[b]`` once ``j ≥ 64`` bits have
    shifted out."""
    n = len(data)
    g = _GEAR[data]
    h = g.copy()
    with np.errstate(over="ignore"):
        for j in range(1, _WINDOW):
            h[j:] += g[: n - j] << np.uint64(j)
    return h


def cdc_boundaries(
    data: np.ndarray,
    doc_offsets: np.ndarray,
    *,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> tuple[np.ndarray, np.ndarray]:
    """Content-defined chunk boundaries for each doc segment of ``data``.

    → (chunk start offsets, chunk end offsets), both absolute into
    ``data``, covering every doc segment exactly.  ``avg_size`` must be a
    power of two (the boundary test is ``gear & (avg-1) == 0``).
    ``min_size ≥ 64`` keeps the gear window inside the current doc, so
    boundaries never depend on a neighboring doc's bytes."""
    assert avg_size & (avg_size - 1) == 0, "avg_size must be a power of 2"
    assert min_size >= _WINDOW, "min_size must cover the gear window"
    mask = np.uint64(avg_size - 1)
    h = _gear_hashes(data)
    cand = np.flatnonzero((h & mask) == 0)  # boundary AFTER byte i
    starts, ends = [], []
    for d in range(len(doc_offsets) - 1):
        s, e = int(doc_offsets[d]), int(doc_offsets[d + 1])
        lo = np.searchsorted(cand, s)
        hi = np.searchsorted(cand, e)
        dc = cand[lo:hi]
        pos = s
        while pos < e:
            limit = min(pos + max_size, e)
            j = np.searchsorted(dc, pos + min_size - 1)
            cut = None
            if j < len(dc) and dc[j] < limit:
                cut = int(dc[j]) + 1
            elif limit < e:
                cut = limit
            else:
                cut = e
            starts.append(pos)
            ends.append(cut)
            pos = cut
    return (np.asarray(starts, np.int64), np.asarray(ends, np.int64))


def cdc_chunk_rows(
    pages: ray.data.Dataset,
    *,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
    id_col: str = "url",
    html_col: str = "html",
) -> ray.data.Dataset:
    """``(url, chunk_idx, chunk_len, chunk_hash)`` — gear-CDC chunks."""

    def fn(t: pa.Table) -> pa.Table:
        data, off = _binary_buffers(t[html_col])
        ids = t[id_col].to_pylist()
        starts, ends = cdc_boundaries(
            data, off, min_size=min_size, avg_size=avg_size,
            max_size=max_size)
        # chunk r belongs to the doc whose segment contains starts[r]
        doc_of = np.searchsorted(off, starts, side="right") - 1
        idx = np.arange(len(starts)) - np.searchsorted(starts, off[doc_of])
        mv = data.tobytes()
        return pa.table(
            {
                "url": pa.array(
                    [ids[d] for d in doc_of.tolist()], pa.string()),
                "chunk_idx": pa.array(idx, pa.int64()),
                "chunk_len": pa.array(ends - starts, pa.int64()),
                "chunk_hash": pa.array(
                    [_chunk_hash(mv[s:e])
                     for s, e in zip(starts.tolist(), ends.tolist())],
                    pa.string()),
            }
        )

    return pages.map_batches(fn, batch_format="pyarrow")


def _dup_chunk_groups(
    rows: ray.data.Dataset, *, num_partitions: int = 16
) -> ray.data.Dataset:
    """chunk rows → ``(chunk_hash, n_copies, chunk_len, canonical_url)``
    for every chunk occurring more than once (identical-content chunks
    share ``chunk_len`` by construction)."""
    P = num_partitions

    def with_part(t: pa.Table) -> pa.Table:
        part = key_partition(t["chunk_hash"].to_numpy(zero_copy_only=False), P)
        return t.append_column("_part", pa.array(part))

    def combine(t: pa.Table) -> pa.Table:
        # map-side partial: within-batch copy counts + min url
        return (
            t.group_by(["chunk_hash", "chunk_len", "_part"])
            .aggregate([("url", "count"), ("url", "min")])
            .rename_columns(
                ["chunk_hash", "chunk_len", "_part", "n_copies",
                 "canonical_url"])
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series(dtype=t)
                 for c, t in [("chunk_hash", object), ("n_copies", np.int64),
                              ("chunk_len", np.int64),
                              ("canonical_url", object)]})
        g = df.groupby("chunk_hash", sort=False, as_index=False).agg(
            n_copies=("n_copies", "sum"), chunk_len=("chunk_len", "first"),
            canonical_url=("canonical_url", "min"))
        return g.loc[g["n_copies"] > 1,
                     ["chunk_hash", "n_copies", "chunk_len",
                      "canonical_url"]]

    in_schema = pa.schema(
        [("chunk_hash", pa.string()), ("chunk_len", pa.int64()),
         ("n_copies", pa.int64()), ("canonical_url", pa.string())])
    return hash_exchange(
        [rows.map_batches(with_part, batch_format="pyarrow")],
        per_part,
        num_partitions=P,
        schema=_GROUP_SCHEMA,
        in_schemas=[in_schema],
        pre=[combine],
    )


def chunk_delta(
    new_ds: ray.data.Dataset,
    index_ds: ray.data.Dataset,
    *,
    chunker=fixed_chunk_rows,
    num_partitions: int = 16,
    **chunk_kw,
) -> ray.data.Dataset:
    """Incremental storage delta of a new crawl against an existing
    corpus: ``(url, n_chunks, n_new_chunks, new_bytes)`` per new page,
    where a chunk is NEW iff its hash occurs nowhere in ``index_ds``
    (``new_bytes`` = the bytes a chunk store would actually ingest).

    The incremental counterpart of ``_dup_chunk_groups`` — the primitive
    a recurring crawl runs between snapshots (the reference re-hashes
    everything on every scan, Files.pm:24-44; here the index side ships
    DISTINCT CHUNK HASHES only, never bytes).  Both sides co-partition
    on ``chunk_hash`` in one two-input exchange; the anti-join marks new
    chunks and reduces to per-(url, partition) partials inside the
    partition, so the final url rollup moves one tiny row per url per
    touched partition."""
    P = num_partitions

    def with_part(t: pa.Table) -> pa.Table:
        part = key_partition(t["chunk_hash"].to_numpy(zero_copy_only=False), P)
        return t.append_column("_part", pa.array(part))

    def idx_prep(t: pa.Table) -> pa.Table:
        t = t.select(["chunk_hash"])
        part = key_partition(t["chunk_hash"].to_numpy(zero_copy_only=False), P)
        return t.append_column("_part", pa.array(part))

    def idx_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["chunk_hash", "_part"]).aggregate([])

    def anti(new_df: pd.DataFrame, idx_df: pd.DataFrame) -> pd.DataFrame:
        if not len(new_df):
            return pd.DataFrame({
                "url": pd.Series(dtype=object),
                "n_chunks": pd.Series(dtype=np.int64),
                "n_new_chunks": pd.Series(dtype=np.int64),
                "new_bytes": pd.Series(dtype=np.int64),
            })
        is_new = ~new_df["chunk_hash"].isin(set(idx_df["chunk_hash"]))
        g = new_df.assign(
            _new=is_new.astype(np.int64),
            _nb=new_df["chunk_len"].to_numpy() * is_new.to_numpy(),
        ).groupby("url", sort=False, as_index=False).agg(
            n_chunks=("chunk_hash", "size"), n_new_chunks=("_new", "sum"),
            new_bytes=("_nb", "sum"))
        return g[["url", "n_chunks", "n_new_chunks", "new_bytes"]]

    new_schema = pa.schema(
        [("url", pa.string()), ("chunk_idx", pa.int64()),
         ("chunk_len", pa.int64()), ("chunk_hash", pa.string())])
    idx_schema = pa.schema([("chunk_hash", pa.string())])
    partials = hash_exchange(
        [
            chunker(new_ds, **chunk_kw).map_batches(
                with_part, batch_format="pyarrow"),
            chunker(index_ds, **chunk_kw).map_batches(
                idx_prep, batch_format="pyarrow"),
        ],
        anti,
        num_partitions=P,
        schema=pa.schema(
            [("url", pa.string()), ("n_chunks", pa.int64()),
             ("n_new_chunks", pa.int64()), ("new_bytes", pa.int64())]),
        in_schemas=[new_schema, idx_schema],
        pre=[None, idx_distinct],
    )
    from ray.data.aggregate import Sum

    return partials.groupby("url").aggregate(
        Sum(on="n_chunks", alias_name="n_chunks"),
        Sum(on="n_new_chunks", alias_name="n_new_chunks"),
        Sum(on="new_bytes", alias_name="new_bytes"),
    )


def chunk_delta_snap2(sf_dir: str, *, chunk_size: int = 512) -> ray.data.Dataset:
    """Driver query: fixed-size chunk delta of the month-later re-crawl
    (snapshots.snapshot2) against the base corpus — full SQL twin in
    ``oracles.chunk_delta_snap2_sql``."""
    from data_dedup_ray.pipelines.snapshots import snapshot2

    new_ds = snapshot2(sf_dir).select_columns(["url", "html"])
    index_ds = web_pages(sf_dir).select_columns(["url", "html"])
    return chunk_delta(new_ds, index_ds, chunk_size=chunk_size)


def chunk_delta_snap2_cdc(
    sf_dir: str, *, min_size: int = 64, avg_size: int = 256,
    max_size: int = 1024,
) -> ray.data.Dataset:
    """Driver query (rows-only): the same delta under gear-CDC chunking.
    The oracle-backed sibling is ``chunk_delta_snap2`` (same rollup
    kernel); the CDC splitter is pinned by tests/test_chunks.py, and
    test_chunk_delta_cdc_resync asserts the property CDC exists for:
    the delta of an edited page stays O(edit), not O(page)."""
    from data_dedup_ray.pipelines.snapshots import snapshot2

    new_ds = snapshot2(sf_dir).select_columns(["url", "html"])
    index_ds = web_pages(sf_dir).select_columns(["url", "html"])
    return chunk_delta(
        new_ds, index_ds, chunker=cdc_chunk_rows,
        min_size=min_size, avg_size=avg_size, max_size=max_size)


def chunk_dedup_fixed(sf_dir: str, *, chunk_size: int = 512) -> ray.data.Dataset:
    """Driver query: multi-copy fixed-size chunk groups over web_pages —
    full SQL twin in ``oracles.chunk_dedup_fixed_sql``."""
    pages = web_pages(sf_dir).select_columns(["url", "html"])
    return _dup_chunk_groups(fixed_chunk_rows(pages, chunk_size=chunk_size))


def cdc_chunk_stats(
    sf_dir: str, *, min_size: int = 64, avg_size: int = 256,
    max_size: int = 1024,
) -> ray.data.Dataset:
    """Driver query: multi-copy CDC chunk groups over web_pages.

    Rows-only for the driver (the gear boundary rule is not reasonably
    SQL-restatable); the oracle-backed sibling is ``chunk_dedup_fixed``
    (same hash identity, same group/rollup kernel), and the CDC splitter
    itself is pinned by reconstruction / bounds / shift-resilience
    property tests (tests/test_chunks.py)."""
    pages = web_pages(sf_dir).select_columns(["url", "html"])
    rows = cdc_chunk_rows(pages, min_size=min_size, avg_size=avg_size,
                          max_size=max_size)
    return _dup_chunk_groups(rows)


_STORE_SCHEMA = pa.schema(
    [("chunk_hash", pa.string()), ("chunk_len", pa.int64())]
)


def build_chunk_store(
    pages: ray.data.Dataset, path: str, *, chunker=fixed_chunk_rows,
    num_partitions: int = 32, **chunk_kw,
):
    """Persist a crawl's DISTINCT chunk set as ``(chunk_hash,
    chunk_len)`` — the content-addressed index a chunk store keeps
    (~40 B/chunk regardless of chunk bytes), the sub-file tier of the
    fingerprint-store ladder (pipelines/fpstore.py; the reference
    re-hashes every file on every scan, Files.pm:24-44 — a persisted
    store is the scan it never has to repeat).

    One ``chunk_hash``-keyed exchange with a map-side pre-distinct;
    duplicates collapse in their owning partition, so the resumable
    sink receives each chunk identity exactly once.  Chunk BYTES never
    move — only hashes and lengths."""
    from data_dedup_ray.state.sink import resumable_write_parquet

    P = num_partitions
    rows = chunker(pages, **chunk_kw)

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["chunk_hash", "chunk_len"])
        part = key_partition(
            t["chunk_hash"].to_numpy(zero_copy_only=False), P)
        return t.append_column("_part", pa.array(part))

    def pre_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["chunk_hash", "chunk_len", "_part"]) \
            .aggregate([])

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "chunk_hash": pd.Series(dtype=object),
                "chunk_len": pd.Series(dtype=np.int64)})
        return df.drop_duplicates("chunk_hash")[
            ["chunk_hash", "chunk_len"]]

    store_rows = hash_exchange(
        [rows.map_batches(prep, batch_format="pyarrow")],
        distinct, num_partitions=P, schema=_STORE_SCHEMA,
        in_schemas=[_STORE_SCHEMA], pre=[pre_distinct],
    )
    chunk_cfg = {k: v for k, v in sorted(chunk_kw.items())}
    return resumable_write_parquet(
        store_rows, path, key_col="chunk_hash", num_partitions=P,
        config={"kind": "chunk_store", "chunker": chunker.__name__,
                **chunk_cfg},
    )


def chunk_store_gc(
    store_path: str, live_pages: ray.data.Dataset, *,
    chunker=fixed_chunk_rows, num_partitions: int = 16, **chunk_kw,
) -> ray.data.Dataset:
    """Mark-and-sweep over a persisted chunk store: ``(chunk_hash,
    chunk_len)`` for every stored chunk referenced by ZERO live pages —
    the orphan list a GC pass deletes (and ``sum(chunk_len)`` = the
    bytes it reclaims).

    The reverse direction of ``chunk_delta`` (which asks what a new
    crawl ADDS; GC asks what a superseded crawl LEAVES BEHIND once the
    live corpus moves on).  The store side is read from parquet — the
    old corpus's bytes are never re-chunked — and both sides meet in one
    ``chunk_hash``-keyed exchange: live pages ship per-batch-distinct
    hashes only (map-side pre), the anti-join resolves inside each
    partition, and the output is orphan-sized."""
    from data_dedup_ray.pipelines.fpstore import _read_store

    P = num_partitions
    store = _read_store(store_path)

    def store_prep(t: pa.Table) -> pa.Table:
        t = t.select(["chunk_hash", "chunk_len"])
        part = key_partition(
            t["chunk_hash"].to_numpy(zero_copy_only=False), P)
        return t.append_column("_part", pa.array(part))

    live_schema = pa.schema([("chunk_hash", pa.string())])

    def live_prep(t: pa.Table) -> pa.Table:
        t = t.select(["chunk_hash"])
        part = key_partition(
            t["chunk_hash"].to_numpy(zero_copy_only=False), P)
        return t.append_column("_part", pa.array(part))

    def live_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["chunk_hash", "_part"]).aggregate([])

    def sweep(store_df: pd.DataFrame,
              live_df: pd.DataFrame) -> pd.DataFrame:
        if not len(store_df):
            return pd.DataFrame({
                "chunk_hash": pd.Series(dtype=object),
                "chunk_len": pd.Series(dtype=np.int64)})
        orphan = ~store_df["chunk_hash"].isin(set(live_df["chunk_hash"]))
        return store_df.loc[orphan, ["chunk_hash", "chunk_len"]]

    live_rows = chunker(live_pages, **chunk_kw)
    return hash_exchange(
        [
            store.map_batches(store_prep, batch_format="pyarrow"),
            live_rows.map_batches(live_prep, batch_format="pyarrow"),
        ],
        sweep, num_partitions=P, schema=_STORE_SCHEMA,
        in_schemas=[_STORE_SCHEMA, live_schema],
        pre=[None, live_distinct],
    )


def chunk_gc_snap2(sf_dir: str, *, chunk_size: int = 512,
                   store_path: str | None = None) -> ray.data.Dataset:
    """Driver query: the GC pass after the month-later re-crawl
    (snapshots.snapshot2) replaces the base corpus — store built from
    web_pages, live = snapshot2; orphans = base-corpus chunks no live
    page references.  Full SQL twin in ``oracles.chunk_gc_snap2_sql``."""
    from data_dedup_ray.pipelines.snapshots import snapshot2
    from data_dedup_ray.util import scratch_dir

    if store_path is None:
        store_path = scratch_dir("chunk_store", sf_dir)
    build_chunk_store(
        web_pages(sf_dir).select_columns(["url", "html"]), store_path,
        chunk_size=chunk_size)
    live = snapshot2(sf_dir).select_columns(["url", "html"])
    return chunk_store_gc(store_path, live, chunk_size=chunk_size)


# --------------------------------------------------------------------------
# Chunk-overlap similarity: which PAGES share raw chunks
# --------------------------------------------------------------------------

_OVERLAP_SCHEMA = pa.schema([
    ("url_a", pa.string()), ("url_b", pa.string()),
    ("n_shared", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64()),
    ("containment_bp", pa.int64()),
])


def chunk_overlap_pairs(
    pages: ray.data.Dataset, *, chunk_size: int = 512,
    min_shared: int = 2, hot_cap: int = 64, num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(url_a < url_b, n_shared, n_a, n_b, containment_bp)`` — page
    pairs sharing ≥ ``min_shared`` distinct raw chunks, the
    dedup-appliance "files that share blocks" similarity view: catches
    pages that EMBED each other's byte ranges (templated wrappers,
    partial syndication) that whole-content hashing can't see and
    token-level Jaccard only sees diluted.

    ``containment_bp = n_shared·10⁴ // min(n_a, n_b)`` — 10000 means
    the smaller page's chunk set is entirely inside the larger's.

    Chunks occurring on more than ``hot_cap`` pages are excluded from
    the overlap definition (the boilerplate guard — a site-wide footer
    chunk on 10⁶ pages must not emit C(10⁶,2) pairs); the SQL twin
    restates the same cutoff, so the cap is part of the metric, not an
    approximation.

    100 TB shape: chunk bytes never shuffle — only ``(url, chunk_hash)``
    rows keyed on the hash, with a map-side distinct combiner; pair
    emission per chunk is C(m≤hot_cap, 2)-bounded; per-page distinct
    counts ride on the chunk rows themselves (``url_chunks``, computed
    in the chunker where the whole page is one input row) and attach
    through the two output-sized pair-keyed rounds (bbit's attach
    shape) — the join sides deduplicate the replicated count rows, so
    nothing assumes a page's rows share a downstream batch."""
    P = num_partitions
    # distinct_per_page: rows are globally unique at emission, so the
    # per-batch partials below stay exact however the stream re-batches
    rows = fixed_chunk_rows(pages, chunk_size=chunk_size,
                            distinct_per_page=True)

    def prep(t: pa.Table) -> pa.Table:
        t = t.select(["url", "chunk_hash"])
        part = key_partition(
            t["chunk_hash"].to_numpy(zero_copy_only=False), P)
        return t.append_column("_part", pa.array(part))

    def pre_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["url", "chunk_hash", "_part"]).aggregate([])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"url_a": pd.Series(dtype=object),
                              "url_b": pd.Series(dtype=object),
                              "n_shared": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        df = df.drop_duplicates(["chunk_hash", "url"]) \
            .sort_values(["chunk_hash", "url"], kind="stable")
        ch = df["chunk_hash"].to_numpy()
        urls = df["url"].to_numpy()
        starts = np.flatnonzero(np.r_[True, ch[1:] != ch[:-1]])
        ends = np.r_[starts[1:], len(ch)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2 or m > hot_cap:
                continue
            ii, jj = np.triu_indices(m, k=1)
            out_a.append(urls[s + ii])
            out_b.append(urls[s + jj])
        if not out_a:
            return empty
        p = pd.DataFrame({"url_a": np.concatenate(out_a),
                          "url_b": np.concatenate(out_b)})
        g = p.groupby(["url_a", "url_b"], sort=False,
                      as_index=False).size()
        return g.rename(columns={"size": "n_shared"})

    partials = hash_exchange(
        [rows.map_batches(prep, batch_format="pyarrow")],
        pair_partial, num_partitions=P,
        schema=pa.schema([("url_a", pa.string()),
                          ("url_b", pa.string()),
                          ("n_shared", pa.int64())]),
        in_schemas=[pa.schema([("url", pa.string()),
                               ("chunk_hash", pa.string())])],
        pre=[pre_distinct],
    )

    def counts(t: pa.Table) -> pa.Table:
        # the per-page distinct count rides on every row (url_chunks);
        # (url, n) rows may repeat across batches when a page's rows
        # split — they are identical, and the join sides drop_duplicate
        g = t.select(["url", "url_chunks"]).to_pandas() \
            .drop_duplicates().rename(columns={"url_chunks": "n"})
        g["_part"] = key_partition(g["url"].to_numpy(), P)
        return pa.Table.from_pandas(g, preserve_index=False)

    cnt = rows.map_batches(counts, batch_format="pyarrow")
    cnt_schema = pa.schema([("url", pa.string()), ("n", pa.int64())])

    def part_on(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_part", pa.array(key_partition(
                t[col].to_numpy(zero_copy_only=False), P)))
        return fn

    a_schema = pa.schema([("url_a", pa.string()), ("url_b", pa.string()),
                          ("n_shared", pa.int64()), ("n_a", pa.int64())])

    def round_a(pp: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        if not len(pp):
            return pd.DataFrame({"url_a": pd.Series(dtype=object),
                                 "url_b": pd.Series(dtype=object),
                                 "n_shared": pd.Series(dtype=np.int64),
                                 "n_a": pd.Series(dtype=np.int64)})
        g = pp.groupby(["url_a", "url_b"], sort=False,
                       as_index=False)["n_shared"].sum()
        g = g[g["n_shared"] >= min_shared]
        c = c.drop_duplicates()
        return g.merge(c.rename(columns={"url": "url_a", "n": "n_a"}),
                       on="url_a", how="inner")

    with_a = hash_exchange(
        [partials.map_batches(part_on("url_a"), batch_format="pyarrow"),
         cnt],
        round_a, num_partitions=P, schema=a_schema,
        in_schemas=[pa.schema([("url_a", pa.string()),
                               ("url_b", pa.string()),
                               ("n_shared", pa.int64())]), cnt_schema],
    )

    def round_b(pp: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        if not len(pp):
            return pd.DataFrame({
                "url_a": pd.Series(dtype=object),
                "url_b": pd.Series(dtype=object),
                "n_shared": pd.Series(dtype=np.int64),
                "n_a": pd.Series(dtype=np.int64),
                "n_b": pd.Series(dtype=np.int64),
                "containment_bp": pd.Series(dtype=np.int64)})
        m = pp.merge(
            c.drop_duplicates().rename(
                columns={"url": "url_b", "n": "n_b"}),
            on="url_b", how="inner")
        m["containment_bp"] = (m["n_shared"] * 10000
                               // np.minimum(m["n_a"], m["n_b"]))
        return m[["url_a", "url_b", "n_shared", "n_a", "n_b",
                  "containment_bp"]]

    return hash_exchange(
        [with_a.map_batches(part_on("url_b"), batch_format="pyarrow"),
         cnt],
        round_b, num_partitions=P, schema=_OVERLAP_SCHEMA,
        in_schemas=[a_schema, cnt_schema],
    )


def chunk_overlap_web(sf_dir: str, *, chunk_size: int = 512,
                      min_shared: int = 2,
                      hot_cap: int = 64) -> ray.data.Dataset:
    """Driver query: chunk-overlap pairs over web_pages' html blobs."""
    return chunk_overlap_pairs(
        web_pages(sf_dir).select_columns(["url", "html"]),
        chunk_size=chunk_size, min_shared=min_shared, hot_cap=hot_cap)


def chunk_overlap_pairs_sql(chunk_size: int = 512, min_shared: int = 2,
                            hot_cap: int = 64) -> str:
    """DuckDB twin of ``chunk_overlap_web``: the same hex-slice chunk
    identity as ``oracles.chunk_dedup_fixed_sql``, per-url DISTINCT
    chunk sets, the identical hot-chunk cutoff, and BIGINT floor
    containment."""
    from data_dedup_ray.corpus import web_pages_sql

    L = int(chunk_size)
    return web_pages_sql(
        ", chunks AS (\n"
        "  SELECT url,\n"
        f"    substring(hex(html), CAST(1 + i*{2 * L} AS BIGINT),"
        f" {2 * L}) AS hx\n"
        "  FROM (SELECT url, html,\n"
        "    unnest(range(CAST(ceil(octet_length(html)"
        f" / {L}.0) AS BIGINT))) AS i\n"
        "    FROM web_pages)),\n"
        "pc AS (SELECT DISTINCT url, sha256(lower(hx)) AS ch"
        " FROM chunks),\n"
        "cnt AS (SELECT url, CAST(count(*) AS BIGINT) AS n FROM pc"
        " GROUP BY 1),\n"
        "ok AS (SELECT ch FROM pc GROUP BY ch\n"
        f"       HAVING count(*) BETWEEN 2 AND {int(hot_cap)}),\n"
        "sh AS (SELECT a.url AS ua, b.url AS ub,"
        " CAST(count(*) AS BIGINT) AS ns\n"
        "       FROM pc a JOIN pc b USING (ch)\n"
        "       WHERE a.url < b.url AND ch IN (SELECT ch FROM ok)\n"
        "       GROUP BY 1, 2)\n"
        "SELECT ua AS url_a, ub AS url_b, ns AS n_shared,\n"
        "       ca.n AS n_a, cb.n AS n_b,\n"
        "       CAST(ns * 10000 // least(ca.n, cb.n) AS BIGINT)"
        " AS containment_bp\n"
        "FROM sh JOIN cnt ca ON ca.url = ua JOIN cnt cb ON cb.url = ub\n"
        f"WHERE ns >= {int(min_shared)}"
    )


# --------------------------------------------------------------------------
# Per-host boilerplate chunk profile
# --------------------------------------------------------------------------

_TEMPLATE_SCHEMA = pa.schema([
    ("host", pa.string()), ("chunk_hash", pa.string()),
    ("n_pages", pa.int64()), ("host_pages", pa.int64()),
    ("coverage_bp", pa.int64()),
])


def host_template_chunks(
    pages: ray.data.Dataset, *, chunk_size: int = 512,
    min_coverage_bp: int = 5000, min_pages: int = 2,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(host, chunk_hash, n_pages, host_pages, coverage_bp)`` — each
    host's TEMPLATE chunks: raw byte chunks present on at least
    ``min_coverage_bp`` basis points of the host's chunked pages (and
    ≥ ``min_pages`` absolutely) — the storage-level boilerplate
    profile (site chrome, nav shells, footers) complementing the
    token-level ``remove_boilerplate`` detector.  What a crawl store
    reads to budget per-host dedup savings or to pre-strip template
    bytes before token-level processing.

    Two exchanges, both skew-safe: per-batch ``(host, chunk_hash, n)``
    partials (a page's html lives in ONE input row, so per-batch counts
    are globally additive) meet on the CHUNK-level key — a hot host
    never concentrates in one partition; the host-level join of chunk
    counts vs host page totals moves only the already-aggregated
    chunk-count table.  Chunk bytes never shuffle."""
    P = num_partitions
    # distinct_per_page: (url, chunk_hash) rows are globally unique at
    # emission, so the per-batch counts below stay additive however the
    # stream re-batches (a page's rows may split across batches)
    rows = fixed_chunk_rows(pages, chunk_size=chunk_size,
                            distinct_per_page=True)

    def chunk_partials(t: pa.Table) -> pa.Table:
        df = t.select(["url", "chunk_hash"]).to_pandas()
        df["host"] = (df["url"].astype(object)
                      .str.split("/").str[2].fillna(""))
        cc = df.groupby(["host", "chunk_hash"], sort=False) \
            .size().rename("n").reset_index()
        cc["_part"] = key_partition(
            (cc["host"] + "\x00" + cc["chunk_hash"]).to_numpy(), P)
        return pa.Table.from_pandas(cc, preserve_index=False)

    def host_partials(t: pa.Table) -> pa.Table:
        # ship per-batch-distinct (host, url) membership rows; a page
        # split across batches duplicates its row, so the join side
        # counts DISTINCT urls, never row totals
        df = t.select(["url"]).to_pandas().drop_duplicates()
        df["host"] = (df["url"].astype(object)
                      .str.split("/").str[2].fillna(""))
        df["_part"] = key_partition(df["host"].to_numpy(), P)
        return pa.Table.from_pandas(df[["host", "url", "_part"]],
                                    preserve_index=False)

    cc_schema = pa.schema([("host", pa.string()),
                           ("chunk_hash", pa.string()),
                           ("n", pa.int64())])

    def sum_chunks(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"host": pd.Series(dtype=object),
                                 "chunk_hash": pd.Series(dtype=object),
                                 "n_pages": pd.Series(dtype=np.int64)})
        g = df.groupby(["host", "chunk_hash"], sort=False,
                       as_index=False)["n"].sum()
        g = g[g["n"] >= min_pages]
        return g.rename(columns={"n": "n_pages"})

    chunk_counts = hash_exchange(
        [rows.map_batches(chunk_partials, batch_format="pyarrow")],
        sum_chunks, num_partitions=P,
        schema=pa.schema([("host", pa.string()),
                          ("chunk_hash", pa.string()),
                          ("n_pages", pa.int64())]),
        in_schemas=[cc_schema],
    )

    def part_on_host(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(key_partition(
            t["host"].to_numpy(zero_copy_only=False), P)))

    def join(cc: pd.DataFrame, hp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "host": pd.Series(dtype=object),
            "chunk_hash": pd.Series(dtype=object),
            "n_pages": pd.Series(dtype=np.int64),
            "host_pages": pd.Series(dtype=np.int64),
            "coverage_bp": pd.Series(dtype=np.int64)})
        if not len(cc) or not len(hp):
            return empty
        tot = hp.drop_duplicates().groupby(
            "host", sort=False)["url"].nunique() \
            .rename("host_pages").reset_index()
        m = cc.merge(tot, on="host", how="inner")
        m["coverage_bp"] = m["n_pages"] * 10000 // m["host_pages"]
        m = m[m["coverage_bp"] >= min_coverage_bp]
        return m[["host", "chunk_hash", "n_pages", "host_pages",
                  "coverage_bp"]]

    return hash_exchange(
        [chunk_counts.map_batches(part_on_host, batch_format="pyarrow"),
         rows.map_batches(host_partials, batch_format="pyarrow")],
        join, num_partitions=P, schema=_TEMPLATE_SCHEMA,
        in_schemas=[pa.schema([("host", pa.string()),
                               ("chunk_hash", pa.string()),
                               ("n_pages", pa.int64())]),
                    pa.schema([("host", pa.string()),
                               ("url", pa.string())])],
    )


def host_template_web(sf_dir: str, *, chunk_size: int = 512,
                      min_coverage_bp: int = 200,
                      min_pages: int = 2) -> ray.data.Dataset:
    """Driver query: per-host template chunks over web_pages' html.

    The synthetic corpus has little fixed-offset chunk reuse inside a
    host (bodies differ early, shifting every later chunk — the fixed
    chunker's documented weakness), so the driver cutoff is 2% of the
    host's pages; a real template-heavy web host saturates the library
    default of 50%."""
    return host_template_chunks(
        web_pages(sf_dir).select_columns(["url", "html"]),
        chunk_size=chunk_size, min_coverage_bp=min_coverage_bp,
        min_pages=min_pages)


def host_template_chunks_sql(chunk_size: int = 512,
                             min_coverage_bp: int = 5000,
                             min_pages: int = 2) -> str:
    """DuckDB twin of ``host_template_web``: hex-slice chunk identity,
    split_part host rule (mirrors convention), BIGINT floor coverage."""
    from data_dedup_ray.corpus import web_pages_sql

    L = int(chunk_size)
    host = "split_part(split_part(url, '//', 2), '/', 1)"
    return web_pages_sql(
        ", chunks AS (\n"
        "  SELECT url,\n"
        f"    substring(hex(html), CAST(1 + i*{2 * L} AS BIGINT),"
        f" {2 * L}) AS hx\n"
        "  FROM (SELECT url, html,\n"
        "    unnest(range(CAST(ceil(octet_length(html)"
        f" / {L}.0) AS BIGINT))) AS i\n"
        "    FROM web_pages)),\n"
        f"pc AS (SELECT DISTINCT url, {host} AS host,"
        " sha256(lower(hx)) AS ch FROM chunks),\n"
        "hp AS (SELECT host, CAST(count(DISTINCT url) AS BIGINT)"
        " AS host_pages FROM pc GROUP BY 1),\n"
        "cc AS (SELECT host, ch, CAST(count(DISTINCT url) AS BIGINT)"
        " AS n_pages FROM pc GROUP BY 1, 2)\n"
        "SELECT cc.host, cc.ch AS chunk_hash, n_pages, host_pages,\n"
        "       CAST(n_pages * 10000 // host_pages AS BIGINT)"
        " AS coverage_bp\n"
        "FROM cc JOIN hp USING (host)\n"
        f"WHERE n_pages >= {int(min_pages)}\n"
        f"  AND n_pages * 10000 // host_pages >= {int(min_coverage_bp)}"
    )


# --------------------------------------------------------------------------
# Byte-level nearest-dup attribution: new crawl vs base corpus chunks
# --------------------------------------------------------------------------

_ATTR_SCHEMA = pa.schema([
    ("url", pa.string()), ("index_url", pa.string()),
    ("n_shared", pa.int64()), ("n_chunks", pa.int64()),
    ("reuse_bp", pa.int64()),
])


def incremental_chunk_overlap(
    new_pages: ray.data.Dataset, base_pages: ray.data.Dataset, *,
    chunk_size: int = 512, hot_cap: int = 64,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """``(url, index_url, n_shared, n_chunks, reuse_bp)`` — per NEW
    page, the base-corpus page it shares the most raw chunks with
    (ties: shared count desc, then min index_url): BYTE-level
    nearest-dup attribution, the storage-tier sibling of
    ``near.nearest_dup_attribution`` (token Jaccard) — what a re-crawl
    ingest logs to say "this capture is mostly assembled from bytes we
    already hold, here is the prior page".

    ``reuse_bp = n_shared·10⁴ // n_chunks`` over the new page's
    DISTINCT chunk count; pages sharing nothing are absent.  Chunks on
    more than ``hot_cap`` pages (both sides combined) are excluded from
    attribution — the boilerplate guard, restated in the SQL twin so
    the cap is part of the metric.

    Shape: both sides chunk distinct-per-page (globally unique rows —
    per-batch partials stay additive under any re-batching); one
    chunk-keyed exchange emits cross-side pair partials (≤ hot_cap²
    per chunk), one new_url-keyed exchange sums and takes the local
    argmax (all of a new page's pairs co-locate).  Chunk bytes never
    shuffle."""
    P = num_partitions

    def tag_prep(tag: str, with_counts: bool):
        def fn(t: pa.Table) -> pa.Table:
            cols = ["url", "chunk_hash"] + (
                ["url_chunks"] if with_counts else [])
            df = t.select(cols).to_pandas()
            df["url"] = tag + df["url"].astype(object)
            df["_part"] = key_partition(
                df["chunk_hash"].to_numpy(), P)
            return pa.Table.from_pandas(df, preserve_index=False)
        return fn

    new_rows = fixed_chunk_rows(new_pages, chunk_size=chunk_size,
                                distinct_per_page=True) \
        .map_batches(tag_prep("n|", True), batch_format="pyarrow")
    idx_rows = fixed_chunk_rows(base_pages, chunk_size=chunk_size,
                                distinct_per_page=True) \
        .map_batches(tag_prep("i|", False), batch_format="pyarrow")

    pair_schema = pa.schema([
        ("url", pa.string()), ("index_url", pa.string()),
        ("n", pa.int64()), ("n_chunks", pa.int64()),
    ])

    def emit_pairs(nd: pd.DataFrame, idx: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "url": pd.Series(dtype=object),
            "index_url": pd.Series(dtype=object),
            "n": pd.Series(dtype=np.int64),
            "n_chunks": pd.Series(dtype=np.int64)})
        if not len(nd) or not len(idx):
            return empty
        # rows are globally unique; the hot cap counts BOTH sides
        per_chunk = pd.concat([nd[["chunk_hash", "url"]],
                               idx[["chunk_hash", "url"]]]) \
            .groupby("chunk_hash", sort=False)["url"].size()
        ok = set(per_chunk[per_chunk <= hot_cap].index)
        nd = nd[nd["chunk_hash"].isin(ok)]
        idx = idx[idx["chunk_hash"].isin(ok)]
        if not len(nd) or not len(idx):
            return empty
        m = nd.merge(idx.rename(columns={"url": "index_url"}),
                     on="chunk_hash")
        if not len(m):
            return empty
        g = m.groupby(["url", "index_url"], sort=False) \
            .agg(n=("chunk_hash", "size"),
                 n_chunks=("url_chunks", "first")).reset_index()
        g["url"] = g["url"].str[2:]
        g["index_url"] = g["index_url"].str[2:]
        return g

    partials = hash_exchange(
        [new_rows, idx_rows], emit_pairs, num_partitions=P,
        schema=pair_schema,
        in_schemas=[pa.schema([("url", pa.string()),
                               ("chunk_hash", pa.string()),
                               ("url_chunks", pa.int64())]),
                    pa.schema([("url", pa.string()),
                               ("chunk_hash", pa.string())])],
    )

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "url": pd.Series(dtype=object),
            "index_url": pd.Series(dtype=object),
            "n_shared": pd.Series(dtype=np.int64),
            "n_chunks": pd.Series(dtype=np.int64),
            "reuse_bp": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        g = df.groupby(["url", "index_url"], sort=False) \
            .agg(n_shared=("n", "sum"),
                 n_chunks=("n_chunks", "first")).reset_index()
        g = g.sort_values(["url", "n_shared", "index_url"],
                          ascending=[True, False, True],
                          kind="stable")
        best = g.drop_duplicates("url", keep="first").copy()
        best["reuse_bp"] = best["n_shared"] * 10000 // best["n_chunks"]
        return best[["url", "index_url", "n_shared", "n_chunks",
                     "reuse_bp"]]

    def part_on_url(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(key_partition(
            t["url"].to_numpy(zero_copy_only=False), P)))

    return hash_exchange(
        [partials.map_batches(part_on_url, batch_format="pyarrow")],
        argmax, num_partitions=P, schema=_ATTR_SCHEMA,
        in_schemas=[pair_schema],
    )


def incremental_chunk_overlap_snap2(
        sf_dir: str, *, chunk_size: int = 512,
        hot_cap: int = 64) -> ray.data.Dataset:
    """Driver query: snapshot2's pages attributed against web_pages."""
    from data_dedup_ray.pipelines.snapshots import snapshot2

    return incremental_chunk_overlap(
        snapshot2(sf_dir).select_columns(["url", "html"]),
        web_pages(sf_dir).select_columns(["url", "html"]),
        chunk_size=chunk_size, hot_cap=hot_cap)


def incremental_chunk_overlap_sql(chunk_size: int = 512,
                                  hot_cap: int = 64) -> str:
    """DuckDB twin of ``incremental_chunk_overlap_snap2``: hex-slice
    chunk identity, DISTINCT per-page sets, both-sides hot cutoff,
    row_number argmax with the identical tie order."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    L = int(chunk_size)
    slice_ = (f"substring(hex(html), CAST(1 + i*{2 * L} AS BIGINT),"
              f" {2 * L})")
    rng = (f"unnest(range(CAST(ceil(octet_length(html) / {L}.0)"
           " AS BIGINT))) AS i")
    return snapshots_sql(
        ",\nipc AS (SELECT DISTINCT url,"
        f" sha256(lower({slice_})) AS ch\n"
        f"  FROM (SELECT url, html, {rng} FROM web_pages)),\n"
        "npc AS (SELECT DISTINCT url,"
        f" sha256(lower({slice_})) AS ch\n"
        f"  FROM (SELECT url, html, {rng} FROM snapshot2)),\n"
        "ncnt AS (SELECT url, CAST(count(*) AS BIGINT) AS n_chunks"
        " FROM npc GROUP BY 1),\n"
        "ok AS (SELECT ch FROM (SELECT ch, url FROM ipc UNION ALL"
        " SELECT ch, url FROM npc) GROUP BY ch\n"
        f"       HAVING count(*) <= {int(hot_cap)}),\n"
        "sh AS (SELECT n.url AS url, i.url AS index_url,"
        " CAST(count(*) AS BIGINT) AS n_shared\n"
        "       FROM npc n JOIN ipc i USING (ch)\n"
        "       WHERE ch IN (SELECT ch FROM ok) GROUP BY 1, 2)\n"
        "SELECT url, index_url, n_shared, n_chunks,\n"
        "       CAST(n_shared * 10000 // n_chunks AS BIGINT)"
        " AS reuse_bp\n"
        "FROM (SELECT sh.*, ncnt.n_chunks, row_number() OVER (\n"
        "        PARTITION BY sh.url"
        " ORDER BY n_shared DESC, index_url) AS rk\n"
        "      FROM sh JOIN ncnt USING (url))\n"
        "WHERE rk = 1"
    )


def _cdc_ctes(prefix: str, src: str, *, min_size: int, avg_size: int,
              max_size: int) -> str:
    """The gear-CDC boundary machinery as a prefixed CTE chain over
    corpus CTE ``src`` → ``{p}cch(url, cx)`` (one row per chunk, hex
    payload).  Caller emits the shared ``gear``/``jt`` tables once.
    See ``cdc_chunk_stats_sql`` for the low-bits reduction that makes
    this tractable."""
    p = prefix
    bits = int(avg_size).bit_length() - 1
    assert (1 << bits) == avg_size, "avg_size must be a power of 2"
    mn, mx = int(min_size), int(max_size)
    return f"""{p}docs AS (SELECT url, hex(html) AS hx,
                CAST(octet_length(html) AS BIGINT) AS L
         FROM {src}),
{p}bytes AS (
  SELECT url, g.i - 1 AS p,
         CAST(('0x' || substr(hx, CAST(2*g.i - 1 AS BIGINT), 2))
              AS INT) AS byte
  FROM {p}docs, UNNEST(generate_series(1, L)) AS g(i)),
{p}cand AS (
  SELECT a.url, a.i
  FROM (SELECT url, p AS i FROM {p}bytes WHERE p >= {mn - 1}) a
  JOIN jt ON TRUE
  JOIN {p}bytes b2 ON b2.url = a.url AND b2.p = a.i - jt.j
  JOIN gear ge ON ge.b = b2.byte
  GROUP BY a.url, a.i
  HAVING sum((ge.g % jt.pm) * jt.pj) % {avg_size} = 0),
{p}rec(url, pos, cut) AS (
  SELECT d.url, CAST(0 AS BIGINT),
         coalesce((SELECT min(c.i) + 1 FROM {p}cand c
                   WHERE c.url = d.url AND c.i >= {mn - 1}
                     AND c.i < least(CAST({mx} AS BIGINT), d.L)),
                  least({mx}, d.L))
  FROM {p}docs d WHERE d.L > 0
  UNION ALL
  SELECT r.url, r.cut,
         coalesce((SELECT min(c.i) + 1 FROM {p}cand c
                   WHERE c.url = r.url AND c.i >= r.cut + {mn - 1}
                     AND c.i < least(r.cut + {mx}, d.L)),
                  least(r.cut + {mx}, d.L))
  FROM {p}rec r JOIN {p}docs d ON d.url = r.url
  WHERE r.cut < d.L),
{p}cch AS (
  SELECT r.url,
         substr(d.hx, CAST(2*r.pos + 1 AS BIGINT),
                CAST(2*(r.cut - r.pos) AS BIGINT)) AS cx
  FROM {p}rec r JOIN {p}docs d ON d.url = r.url)"""


def _cdc_shared_tables(avg_size: int) -> str:
    bits = int(avg_size).bit_length() - 1
    gear_rows = ",\n    ".join(
        f"({b}, {int(_GEAR[b]) % avg_size})" for b in range(256))
    jt_rows = ",\n    ".join(
        f"({j}, {1 << j}, {1 << (bits - j)})" for j in range(bits))
    return (f"gear(b, g) AS (VALUES\n    {gear_rows}),\n"
            f"jt(j, pj, pm) AS (VALUES\n    {jt_rows})")


def cdc_chunk_stats_sql(min_size: int = 64, avg_size: int = 256,
                        max_size: int = 1024) -> str:
    """DuckDB twin of ``cdc_chunk_stats`` — the gear-CDC boundary rule
    restated exactly, long believed not-reasonably-SQL-restatable.

    The key reduction: the boundary test is ``gear_hash & (avg−1) == 0``
    and ``(x << j) mod avg == 0`` for every ``j ≥ log2(avg)``, so of the
    64 shift-weighted window terms only the LOW ``log2(avg)`` (8 at the
    default) can influence the predicate:
    ``h mod avg = Σ_{j<bits} (GEAR[b(i−j)] mod 2^(bits−j))·2^j mod avg``.
    That turns an infeasible 64×-positions join into an 8×-positions
    one, with the gear table inlined mod ``avg`` (the same public
    sha256-derived constants as ``_GEAR``).

    Positions below ``min_size−1`` never host a USED candidate (the
    clamp searches from ``pos+min−1`` and ``min ≥ 64`` keeps the window
    doc-local — the same argument ``cdc_boundaries`` documents), so the
    candidate set is computed only for ``i ≥ min−1``.  The sequential
    min/max clamp walk is one recursive CTE per doc:
    ``cut = coalesce(min candidate in [pos+min−1, limit) + 1, limit)``
    with ``limit = least(pos+max, L)`` — literally the numpy loop's
    cases folded into one expression.  Chunk identity/rollup then
    reuse the fixed-size oracle's hex-slice machinery."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    kw = dict(min_size=min_size, avg_size=avg_size, max_size=max_size)
    return (f"WITH RECURSIVE {WEB_PAGES_CTE},\n"
            f"{_cdc_shared_tables(avg_size)},\n"
            f"{_cdc_ctes('c', 'web_pages', **kw)}\n"
            "SELECT sha256(lower(cx)) AS chunk_hash,\n"
            "       CAST(count(*) AS BIGINT) AS n_copies,\n"
            "       CAST(length(cx) // 2 AS BIGINT) AS chunk_len,\n"
            "       min(url) AS canonical_url\n"
            "FROM ccch GROUP BY cx HAVING count(*) > 1")


def chunk_delta_cdc_sql(min_size: int = 64, avg_size: int = 256,
                        max_size: int = 1024) -> str:
    """DuckDB twin of ``chunk_delta_snap2_cdc``: the CDC boundary
    machinery (see ``cdc_chunk_stats_sql``) applied to BOTH crawls,
    then the same anti-join rollup as the fixed-size delta oracle —
    per re-crawled page, how many of its CDC chunks (and bytes) are
    absent from the base corpus's distinct chunk set."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import SNAPSHOT2_CTE

    kw = dict(min_size=min_size, avg_size=avg_size, max_size=max_size)
    return (f"WITH RECURSIVE {WEB_PAGES_CTE},\n{SNAPSHOT2_CTE},\n"
            f"{_cdc_shared_tables(avg_size)},\n"
            f"{_cdc_ctes('i', 'web_pages', **kw)},\n"
            f"{_cdc_ctes('n', 'snapshot2', **kw)},\n"
            "widx AS (SELECT DISTINCT sha256(lower(cx)) AS ch"
            " FROM icch),\n"
            "s AS (SELECT url, sha256(lower(cx)) AS ch,\n"
            "             CAST(length(cx) // 2 AS BIGINT) AS len"
            " FROM ncch)\n"
            "SELECT url, CAST(count(*) AS BIGINT) AS n_chunks,\n"
            "  CAST(sum(CASE WHEN w.ch IS NULL THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_new_chunks,\n"
            "  CAST(sum(CASE WHEN w.ch IS NULL THEN len ELSE 0 END)"
            " AS BIGINT) AS new_bytes\n"
            "FROM s LEFT JOIN widx w ON s.ch = w.ch GROUP BY url")
