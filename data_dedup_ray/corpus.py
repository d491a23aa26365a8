"""Deterministic Common-Crawl-style ``web_pages`` corpus.

The driver's ``input_hint`` (BASELINE.json:16) mandates the input table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
This module derives that table *deterministically* from the driver's
``documents`` table (``/root/testdata/sf*/documents.parquet``) and plants the
duplicate families of FIXTURES.md §F1, mirroring the reference test corpus
strategy (seeded byte-identical duplicate content under distinct paths,
/root/reference/t/unit/Data/Dedup/Files.t:32-55):

- ``base``   — one page per document (url plays the file-path role,
               /root/reference/lib/Data/Dedup/Files.pm:235);
- ``mirror`` — exact duplicates (``doc_id % 10 == 0``): byte-identical
               text/html under a different url (Files.t:69-98 analogue);
- ``alias``  — hardlink analogue (``doc_id % 13 == 0``): same content AND the
               same ``inode_id`` as the base page (Files.pm:225, Files.t:133-183);
- ``empty``  — zero-length text (``doc_id % 97 == 0``) (Files.t:231-271);
- ``near``   — near-duplicates (``doc_id % 7 == 0``): base text + a fixed
               suffix → high-but-not-1.0 shingle Jaccard (north_rule MinHash
               recall fixture);
- ``quote``  — substring duplicates (``doc_id % 11 == 0``): base text + one
               shared ≥50-token span (suffix-array / winnowing fixture).

Every derivation is pure string/arithmetic → the exact same table is
expressible as an ANSI-SQL CTE over the pre-registered ``documents`` view
(``WEB_PAGES_CTE`` below), which is what makes the dedup pipelines
oracle-checkable in DuckDB.

``extract_text(html) == text`` byte-identically for every row (the per-row
invariant of BASELINE.json:16); see stages/extract.py and the tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

HTML_PRE_A = "<html><head><title>Doc "
HTML_PRE_B = "</title></head><body><p>"
HTML_POST = "</p></body></html>"

NEAR_SUFFIX = (
    " extra trailing words appended here to form the near duplicate variant"
    " of this page body"
)

SHARED_SPAN = (
    "shared quoted span begins here the quick brown fox jumps over the lazy dog"
    " while the streaming executor moves arrow blocks between nodes and the"
    " object store spills cold partitions to disk so that every batch transform"
    " keeps flowing under backpressure and the shuffle stays balanced across"
    " workers even when hot keys are salted into smaller subgroups ends here"
)  # 60 whitespace tokens

BASE_TS = "2019-07-01 00:00:00"

# (family, modulus, ts_offset_days, inode_base)
# inode_base None → inode_id = doc_id (shares identity with base: the
# hardlink analogue).  modulus 0 → every row.
_FAMILIES = [
    ("base", None, 0, None),
    ("mirror", 10, 1, 10_000_000),
    ("alias", 13, 2, None),
    ("empty", 97, 3, 20_000_000),
    ("near", 7, 4, 30_000_000),
    ("quote", 11, 5, 40_000_000),
]


def _family_text(fam: str, text: pd.Series) -> pd.Series:
    if fam == "empty":
        return pd.Series([""] * len(text), index=text.index, dtype="object")
    if fam == "near":
        return text + NEAR_SUFFIX
    if fam == "quote":
        return text + " " + SHARED_SPAN
    return text


def _derive(batch: pd.DataFrame) -> pd.DataFrame:
    """One documents batch → all web_pages family rows (vectorized)."""
    doc_id = batch["doc_id"]
    base_ts = pd.Timestamp(BASE_TS) + pd.to_timedelta(doc_id, unit="m")
    out = []
    for fam, modulus, ts_days, inode_base in _FAMILIES:
        if modulus:
            mask = (doc_id % modulus) == 0
            if not mask.any():
                continue
            sub = batch.loc[mask]
        else:
            sub = batch
        ids = sub["doc_id"]
        text = _family_text(fam, sub["text"])
        if fam == "base":
            url = (
                "https://site"
                + (ids % 20).astype(str)
                + ".example/p/"
                + ids.astype(str)
            )
        else:
            url = f"https://{fam}.example/p/" + ids.astype(str)
        html = (
            (HTML_PRE_A + ids.astype(str) + HTML_PRE_B + text + HTML_POST)
            .str.encode("utf-8")
        )
        inode = ids if inode_base is None else inode_base + ids
        out.append(
            pd.DataFrame(
                {
                    "url": url,
                    "warc_ts": (base_ts.loc[sub.index] + pd.Timedelta(days=ts_days))
                    .astype("datetime64[us]"),
                    "html": html,
                    "text": text,
                    "lang": sub["lang"],
                    "inode_id": inode.astype("int64"),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def web_pages(sf_dir: str, *, override_num_blocks: int | None = None,
              batch_size: int | None = None) -> ray.data.Dataset:
    """The web_pages corpus for one scale tier, as a streaming Dataset.

    One parquet read (column-pruned to doc_id/text/lang) + one vectorized
    ``map_batches`` that emits every family row; no shuffle, no driver loop.
    """
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"], **kwargs
    )
    return docs.map_batches(_derive, batch_format="pandas",
                            batch_size=batch_size)


def _sql_html(text_expr: str) -> str:
    return (
        f"encode('{HTML_PRE_A}' || doc_id || '{HTML_PRE_B}' || {text_expr}"
        f" || '{HTML_POST}')"
    )


def _sql_family(fam: str, modulus: int | None, ts_days: int, inode_base) -> str:
    if fam == "empty":
        text_expr = "''"
    elif fam == "near":
        text_expr = f"text || '{NEAR_SUFFIX}'"
    elif fam == "quote":
        text_expr = f"text || ' ' || '{SHARED_SPAN}'"
    else:
        text_expr = "text"
    if fam == "base":
        url = "'https://site' || (doc_id % 20) || '.example/p/' || doc_id"
    else:
        url = f"'https://{fam}.example/p/' || doc_id"
    ts = (
        f"TIMESTAMP '{BASE_TS}' + doc_id * INTERVAL 1 MINUTE"
        + (f" + INTERVAL {ts_days} DAY" if ts_days else "")
    )
    inode = "doc_id" if inode_base is None else f"{inode_base} + doc_id"
    where = f" WHERE doc_id % {modulus} = 0" if modulus else ""
    return (
        f"SELECT {url} AS url, {ts} AS warc_ts, {_sql_html(text_expr)} AS html,"
        f" {text_expr} AS text, lang, CAST({inode} AS BIGINT) AS inode_id"
        f" FROM documents{where}"
    )


#: DuckDB CTE producing the byte-identical web_pages table from the
#: pre-registered ``documents`` view — the oracle-side twin of ``web_pages()``.
WEB_PAGES_CTE = "web_pages AS (\n  " + "\n  UNION ALL\n  ".join(
    _sql_family(fam, modulus, ts_days, inode_base)
    for fam, modulus, ts_days, inode_base in _FAMILIES
) + "\n)"


def web_pages_sql(select: str) -> str:
    """Wrap a SELECT over ``web_pages`` with the derivation CTE."""
    return f"WITH {WEB_PAGES_CTE}\n{select}"


# --------------------------------------------------------------------------
# Bench-scale amplification (NOT oracle-checked; bench.py only).
# --------------------------------------------------------------------------

_AMP_WORDS = np.array(
    ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
     "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa"],
    dtype=object,
)


class _Pad:
    """Pad each page's text to ~``target`` bytes with doc-specific filler.

    The raw synthetic docs average ~300 bytes — tweet-sized, not
    web-page-sized; Common-Crawl extracted text averages several KB.  The
    filler words are seeded per doc (hash of url), so padding never
    creates cross-doc shingle overlap; revisions of one base doc (added
    by ``_Amplify`` afterwards) share its padding, preserving the planted
    near-dup structure at realistic document lengths.
    """

    def __init__(self, target: int = 2048):
        self.target = target

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(batch["url"].to_numpy(dtype=object))
        texts = batch["text"].tolist()
        out = []
        W = len(_AMP_WORDS)
        for t, seed in zip(texts, h):
            seed = int(seed)
            need = self.target - len(t)
            if need <= 0:
                out.append(t)
                continue
            n_words = need // 7 + 1
            # a doc-seeded RNG sequence over a word×tag vocabulary: two
            # different docs share (statistically) no 5-gram of filler, so
            # padding adds ZERO cross-doc shingle overlap; an affine walk
            # here once cycled with period 16 and silently welded all
            # same-tag docs into J≈0.15 near-dups (3M phantom candidates)
            rng = np.random.default_rng(seed)
            idx = rng.integers(0, W, size=n_words)
            tags = rng.integers(0, 997, size=n_words)
            out.append(t + " " + " ".join(
                f"{_AMP_WORDS[i]}x{g:x}" for i, g in zip(idx, tags)))
        b = batch.copy()
        b["text"] = out
        return b


class _Amplify:
    """Emit ``factor`` deterministic revisions per page (seeded word edits).

    Common-Crawl-realistic duplicate density: revisions with ``r % 4 == 0``
    are near-dups; all other revisions get an ``r``-specific marker token
    injected after every 3rd word — every 5-shingle then contains a marker,
    so those revisions share (almost) no shingles with anything else.

    Near-dup revisions are grouped into BLOCKS of 16 (``block = r // 16``):
    block 0's near revisions differ from the base only by a short suffix;
    block k>0's get a block-specific injected marker plus a per-``r``
    suffix, so they are near-dups of each other but not of other blocks.
    ⇒ near-dup family size is CONSTANT (4) at every factor that is a
    multiple of 16, and the ~25% dup rate holds — pair counts scale
    LINEARLY with factor, the scale-invariance a real web corpus has
    (cluster sizes don't grow because the crawl got bigger).  Seeded by
    (doc row hash, r): no wall-clock, no global RNG.
    """

    def __init__(self, factor: int):
        self.factor = factor

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        h = pd.util.hash_array(batch["url"].to_numpy(dtype=object))
        for r in range(self.factor):
            b = batch.copy()
            if r:
                pick = _AMP_WORDS[(h + 2654435761 * r) % len(_AMP_WORDS)]
                if r % 4 == 0:
                    block = r // 16
                    if block:
                        b["text"] = b["text"].str.replace(
                            r"((?:\S+\s+){2}\S+)", rf"\1 p{block}x", regex=True
                        )
                    b["text"] = b["text"] + " rev" + str(r) + " " + pick
                else:
                    b["text"] = b["text"].str.replace(
                        r"((?:\S+\s+){2}\S+)", rf"\1 q{r}z", regex=True
                    ) + " rev" + str(r) + " " + pick
                b["url"] = b["url"] + f"?rev={r}"
            out.append(b)
        return pd.concat(out, ignore_index=True)


def amplified_pages(sf_dir: str, factor: int,
                    pad_to: int = 2048) -> ray.data.Dataset:
    """web_pages × ``factor`` deterministic revisions at web-page-realistic
    document lengths (bench workload; NOT oracle-checked).

    High-expansion map: a few MB of parquet become GBs of pages.  Ray Data
    bundles map inputs by INPUT bytes (``target_min_block_size``), which
    would collapse this stage to a handful of tasks (measured: 5 tasks,
    120 CPU-s — zero parallelism); reading with many blocks and a small
    min-block floor keeps the expansion stage wide.  Real pipelines hit
    the same issue whenever a source row fans out (frame sampling, chunk
    explosion) — callers there should size blocks the same way.
    """
    import ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    # floor low enough that the small source blocks stay individual map
    # inputs rather than being coalesced
    ctx.target_min_block_size = 16 * 1024
    ds = web_pages(sf_dir, override_num_blocks=64, batch_size=64)
    # small batch_size = small min_rows_per_bundle: the default (1024 rows)
    # would bundle the whole 5k-row source into ~5 tasks and serialize the
    # ~100 CPU-s expansion stage
    if pad_to:
        ds = ds.map_batches(_Pad(pad_to), batch_format="pandas",
                            batch_size=64)
    if factor > 1:
        ds = ds.map_batches(_Amplify(factor), batch_format="pandas",
                            batch_size=64)
    # materialize: (a) downstream stages would otherwise FUSE with this
    # chain and inherit their own larger batch_size as the bundling floor,
    # collapsing the expansion to ~5 tasks; (b) a real run reads the corpus
    # from parquet — materialized blocks are the honest equivalent
    return ds.materialize()
