"""URL canonicalization — collapsing crawl aliases of the same page.

The reference's identity collapse is filesystem hardlinks (inode
first-seen, /root/reference/lib/Data/Dedup/Files.pm:225); the web
analogue is URL aliasing: ``WWW.``/case variants, default ports,
fragments, and tracking query parameters all address one resource.  A
crawler's frontier dedup and the corpus's identity key both need the
canonical form.

The synthetic corpus's urls are already clean, so ``messy_urls`` plants
a deterministic alias per ``doc_id % 5`` residue (uppercase host +
default port, ``www.`` prefix, fragment, utm tracking params) — the SQL
CTE twin generates byte-identical input, so the canonicalizer itself is
what the oracle checks.

Scale shape: embarrassingly parallel ``map_batches``; the canonical
form then serves as the grouping key for first-seen identity collapse
(one exchange on hash(canonical), same as exact.collapse_identity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

# --------------------------------------------------------------------------
# Deterministic messy-url derivation (+ SQL twin)
# --------------------------------------------------------------------------


def _mess(batch: pd.DataFrame) -> pd.DataFrame:
    d = batch["doc_id"]
    base = "site" + (d % 20).astype(str) + ".example/p/" + d.astype(str)
    clean = pd.DataFrame({"doc_id": d, "url": "https://" + base})
    r = d % 5
    alias = "HTTPS://" + base.str.upper().str.replace(
        "EXAMPLE/", "EXAMPLE:443/", regex=False)
    alias = alias.where(r != 2, "https://www." + base)
    alias = alias.where(r != 3, "https://" + base + "#section-2")
    alias = alias.where(
        r != 4, "https://" + base + "?utm_source=feed&utm_campaign=x&ref=home"
    )
    aliases = pd.DataFrame({"doc_id": d, "url": alias}).loc[r != 0]
    return pd.concat([clean, aliases], ignore_index=True)


#: SQL twin of ``_mess`` (string-identical construction): every doc's
#: clean url plus, for ``doc_id % 5 != 0``, one alias of it.
MESSY_URLS_CTE = (
    "messy_urls AS ("
    "SELECT doc_id, 'https://site' || (doc_id % 20) || '.example/p/' ||"
    " doc_id AS url FROM documents"
    " UNION ALL "
    "SELECT doc_id, CASE doc_id % 5"
    " WHEN 2 THEN 'https://www.site' || (doc_id % 20) ||"
    " '.example/p/' || doc_id"
    " WHEN 3 THEN 'https://site' || (doc_id % 20) ||"
    " '.example/p/' || doc_id || '#section-2'"
    " WHEN 4 THEN 'https://site' || (doc_id % 20) ||"
    " '.example/p/' || doc_id || '?utm_source=feed&utm_campaign=x&ref=home'"
    " ELSE 'HTTPS://' || upper('site' || (doc_id % 20) ||"
    " '.example') || ':443/P/' || doc_id"
    " END AS url FROM documents WHERE doc_id % 5 <> 0)"
)


def messy_urls(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return docs.map_batches(_mess, batch_format="pandas")


# --------------------------------------------------------------------------
# The canonicalizer (Python + SQL, rule-for-rule identical)
# --------------------------------------------------------------------------

_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def canonicalize_url(u: str) -> str:
    """Lowercase scheme+host, strip ``www.``, strip default port, drop
    fragment, drop tracking query params, sort survivors, strip a bare
    trailing ``?`` / ``/``."""
    u = u.split("#", 1)[0]
    if "://" in u:
        scheme, rest = u.split("://", 1)
    else:
        scheme, rest = "https", u
    scheme = scheme.lower()
    sep = len(rest)
    for ch in "/?":
        i = rest.find(ch)
        if i != -1:
            sep = min(sep, i)
    host, tail = rest[:sep].lower(), rest[sep:]
    if host.startswith("www."):
        host = host[4:]
    default = ":443" if scheme == "https" else ":80"
    if host.endswith(default):
        host = host[: -len(default)]
    if "?" in tail:
        path, q = tail.split("?", 1)
        # lowercase BEFORE filtering + sorting: the canonical form is
        # lowercase, so sorting any other case breaks idempotence (and
        # 'UTM_X=' must not escape the tracking filter)
        params = [
            p for p in q.lower().split("&")
            if p and not any(p.startswith(t) for t in _TRACKING_PREFIXES)
        ]
        tail = path + ("?" + "&".join(sorted(params)) if params else "")
    while tail.endswith("/") and len(tail) > 1:
        tail = tail[:-1]
    return scheme + "://" + host + tail.lower()


def _canon_batch(t: pa.Table) -> pa.Table:
    urls = t["url"].to_pylist()
    return pa.table({
        "doc_id": t["doc_id"].combine_chunks(),
        "url": t["url"].combine_chunks(),
        "canonical_url": pa.array(
            [canonicalize_url(u) for u in urls], pa.string()
        ),
    })


def canonical_urls(sf_dir: str) -> ray.data.Dataset:
    """``(doc_id, url, canonical_url)`` over the messy-url corpus."""
    return messy_urls(sf_dir).map_batches(
        _canon_batch, batch_format="pyarrow"
    )


def _canon_sql(url_expr: str) -> str:
    """A SELECT producing ``canonical_url`` from ``{url_expr}`` — built as
    nested CTE steps so each rule is one expression."""
    return f"""
  SELECT doc_id, url, lower(scheme) || '://' ||
    CASE WHEN lower(scheme) = 'https' AND host2 LIKE '%:443'
         THEN host2[1:len(host2)-4]
         WHEN lower(scheme) = 'http' AND host2 LIKE '%:80'
         THEN host2[1:len(host2)-3]
         ELSE host2 END ||
    regexp_replace(tail2, '(.)/+$', '\\1') AS canonical_url
  FROM (
    SELECT doc_id, url, scheme, host2,
      lower(CASE WHEN tail LIKE '%?%' THEN
        split_part(tail, '?', 1) ||
        CASE WHEN kept = '' THEN '' ELSE '?' || kept END
      ELSE tail END) AS tail2
    FROM (
      SELECT doc_id, url, scheme, host, tail,
        CASE WHEN lower(host) LIKE 'www.%' THEN lower(host)[5:]
             ELSE lower(host) END AS host2,
        array_to_string(list_sort(list_filter(
          str_split(CASE WHEN tail LIKE '%?%'
                         THEN lower(split_part(tail, '?', 2)) ELSE '' END,
                    '&'),
          p -> p <> '' AND NOT starts_with(p, 'utm_')
               AND NOT starts_with(p, 'fbclid')
               AND NOT starts_with(p, 'gclid'))), '&') AS kept
      FROM (
        SELECT doc_id, url,
          split_part(nofrag, '://', 1) AS scheme,
          regexp_extract(split_part(nofrag, '://', 2), '^[^/?]*') AS host,
          regexp_replace(split_part(nofrag, '://', 2), '^[^/?]*', '') AS tail
        FROM (SELECT doc_id, url, split_part(url, '#', 1) AS nofrag
              FROM ({url_expr}))
      )
    )
  )"""


def canonical_urls_sql() -> str:
    return (
        f"WITH {MESSY_URLS_CTE}\n"
        + _canon_sql("SELECT doc_id, url FROM messy_urls")
    )


# --------------------------------------------------------------------------
# First-seen identity collapse by canonical url
# --------------------------------------------------------------------------


def canonical_collapse(
    sf_dir: str, *, num_partitions: int = 16
) -> ray.data.Dataset:
    """One representative per canonical url — the min original url, with
    the alias count: ``(canonical_url, url, n_aliases)``.  Same first-seen
    semantics as exact.collapse_identity (Files.pm:225 hardlink collapse),
    keyed on the canonical form."""
    P = num_partitions
    canon = canonical_urls(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        part = key_partition(t["canonical_url"].to_pylist(), P)
        return pa.table({
            "canonical_url": t["canonical_url"].combine_chunks(),
            "url": t["url"].combine_chunks(),
            "_part": pa.array(part),
        })

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["canonical_url", "_part"])
            .aggregate([("url", "min"), ("url", "count")])
            .rename_columns(["canonical_url", "_part", "url", "n_aliases"])
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("canonical_url", sort=False).agg(
            url=("url", "min"), n_aliases=("n_aliases", "sum")
        )
        return out.reset_index()

    part_schema = pa.schema([
        ("canonical_url", pa.string()), ("url", pa.string()),
        ("n_aliases", pa.int64()),
    ])
    return hash_exchange(
        [canon.map_batches(prep, batch_format="pyarrow")],
        per_part,
        num_partitions=P,
        schema=part_schema,
        in_schemas=[part_schema],
        pre=[combine],
    )


def canonical_collapse_sql() -> str:
    return (
        f"WITH {MESSY_URLS_CTE},\ncanon AS ({_canon_sql('SELECT doc_id, url FROM messy_urls')})\n"
        "SELECT canonical_url, min(url) AS url, count(*) AS n_aliases"
        " FROM canon GROUP BY canonical_url"
    )


# --------------------------------------------------------------------------
# URL template mining (crawler-trap / crawl-budget signal)
# --------------------------------------------------------------------------

_TEMPLATE_SCHEMA = pa.schema([
    ("domain", pa.string()), ("template", pa.string()),
    ("n_pages", pa.int64()), ("n_distinct_content", pa.int64()),
    ("dup_rate_bp", pa.int64()),
])


def url_template_stats(
    ds: ray.data.Dataset,
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Digit-normalized URL TEMPLATES and their content-duplication
    rates — the crawl-budget pruning signal: a template whose pages are
    mostly byte-identical (calendars, pagination shells, session-id
    mirrors) is a crawler trap to deprioritize.

    ``template = regexp_replace(url, '[0-9]+', 'N', 'g')`` (identical
    Python/DuckDB semantics); one row per (domain, template) with page
    count, distinct content-sha count, and ``dup_rate_bp = 10^4 *
    (n_pages - n_distinct) // n_pages``.

    Scale shape: the exchange is keyed on the template and carries one
    pre-deduped (template, sha) row per batch occurrence (map-side
    combiner); per-partition nunique is globally additive because a
    template's rows co-locate.  Driver sees nothing — output is
    template-count-sized."""
    import re

    from data_dedup_ray.pipelines.fpstore import sha256_hex
    from data_dedup_ray.pipelines.snapshots import domain_of

    P = num_partitions
    digits = re.compile("[0-9]+")

    def prep(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        templates = [digits.sub("N", u) for u in urls]
        tarr = np.asarray(templates, dtype=object)
        return pa.table({
            "domain": pa.array([domain_of(u) for u in urls],
                               pa.string()),
            "template": pa.array(templates, pa.string()),
            "sha": pa.array(sha256_hex(t["text"].to_pylist()),
                            pa.string()),
            "n": pa.array(np.ones(len(urls), np.int64)),
            "_part": pa.array(key_partition(tarr, P)),
        })

    part_schema = pa.schema([
        ("domain", pa.string()), ("template", pa.string()),
        ("sha", pa.string()), ("n", pa.int64()),
    ])

    def combine(t: pa.Table) -> pa.Table:
        # map-side: one row per (domain, template, sha) with its count
        df = t.to_pandas()
        g = df.groupby(["domain", "template", "sha", "_part"],
                       sort=False, as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "domain": pd.Series(dtype=str),
                "template": pd.Series(dtype=str),
                "n_pages": pd.Series(dtype=np.int64),
                "n_distinct_content": pd.Series(dtype=np.int64),
                "dup_rate_bp": pd.Series(dtype=np.int64)})
        g = df.groupby(["domain", "template"], sort=False).agg(
            n_pages=("n", "sum"), n_distinct_content=("sha", "nunique")
        ).reset_index()
        g["dup_rate_bp"] = (
            10000 * (g["n_pages"] - g["n_distinct_content"])
            // g["n_pages"])
        return g

    return hash_exchange(
        [ds.map_batches(prep, batch_format="pyarrow")],
        per_part,
        num_partitions=P,
        schema=_TEMPLATE_SCHEMA,
        in_schemas=[part_schema],
        pre=[combine],
    )


def url_template_stats_sql() -> str:
    """DuckDB twin over web_pages."""
    from data_dedup_ray.corpus import web_pages_sql

    return web_pages_sql(
        "SELECT split_part(split_part(url, '//', 2), '/', 1) AS domain,"
        " regexp_replace(url, '[0-9]+', 'N', 'g') AS template,"
        " CAST(count(*) AS BIGINT) AS n_pages,"
        " CAST(count(DISTINCT sha256(text)) AS BIGINT)"
        "   AS n_distinct_content,"
        " CAST(10000 * (count(*) - count(DISTINCT sha256(text)))"
        "   // count(*) AS BIGINT) AS dup_rate_bp"
        " FROM web_pages GROUP BY 1, 2"
    )


# --------------------------------------------------------------------------
# Extraction overhead: html markup vs extracted-text bytes per host
# --------------------------------------------------------------------------

_MARKUP_SCHEMA = pa.schema([
    ("host", pa.string()), ("n_pages", pa.int64()),
    ("html_bytes", pa.int64()), ("text_bytes", pa.int64()),
    ("markup_bp", pa.int64()),
])


def markup_stats(ds: ray.data.Dataset, *,
                 num_partitions: int = 16) -> ray.data.Dataset:
    """Per-host extraction overhead: ``(host, n_pages, html_bytes,
    text_bytes, markup_bp)`` with ``markup_bp = (html - text) * 10000 //
    html`` — which hosts are mostly markup (ads/nav chrome) vs mostly
    payload, the storage- and extraction-cost planner view.  Byte
    lengths are computed in the same streaming pass that reads the
    pages; only 3-int partials per (host, batch) enter the exchange."""

    def prep(t: pa.Table) -> pa.Table:
        urls = pd.Series(t["url"].to_pylist(), dtype=object)
        host = urls.str.split("/").str[2].fillna("")
        hb = np.fromiter((len(h) for h in t["html"].to_pylist()),
                         np.int64, len(urls))
        tb = np.fromiter(
            (len(s.encode("utf-8")) for s in t["text"].to_pylist()),
            np.int64, len(urls))
        g = (pd.DataFrame({"host": host, "hb": hb, "tb": tb})
             .groupby("host", sort=False)
             .agg(n=("hb", "size"), hb=("hb", "sum"), tb=("tb", "sum"))
             .reset_index())
        g["_part"] = key_partition(g["host"].to_numpy(object),
                                   num_partitions)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("host", sort=False)
               .agg(n_pages=("n", "sum"), html_bytes=("hb", "sum"),
                    text_bytes=("tb", "sum")).reset_index())
        h = out["html_bytes"].to_numpy(np.int64)
        t = out["text_bytes"].to_numpy(np.int64)
        out["markup_bp"] = (h - t) * 10000 // np.maximum(h, 1)
        return out.astype({c: np.int64 for c in out.columns
                           if c != "host"})

    return hash_exchange(
        [ds.map_batches(prep, batch_format="pyarrow")],
        final, num_partitions=num_partitions, schema=_MARKUP_SCHEMA,
        in_schemas=[pa.schema([
            ("host", pa.string()), ("n", pa.int64()),
            ("hb", pa.int64()), ("tb", pa.int64())])])


def markup_stats_sql() -> str:
    from data_dedup_ray.corpus import web_pages_sql

    return web_pages_sql(
        "SELECT split_part(split_part(url, '//', 2), '/', 1) AS host,"
        " CAST(count(*) AS BIGINT) AS n_pages,"
        " CAST(sum(octet_length(html)) AS BIGINT) AS html_bytes,"
        " CAST(sum(octet_length(encode(text))) AS BIGINT) AS text_bytes,"
        " CAST((sum(octet_length(html)) - sum(octet_length(encode(text))))"
        " * 10000 // greatest(sum(octet_length(html)), 1) AS BIGINT)"
        "   AS markup_bp"
        " FROM web_pages GROUP BY 1"
    )
