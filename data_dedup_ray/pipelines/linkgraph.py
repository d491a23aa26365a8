"""Link-graph analytics over the web corpus — outlink extraction, host
rollups, and an exact-integer PageRank.

The reference dedups file trees and has no hyperlink notion
(/root/reference/lib/Data/Dedup/Files.pm walks a directory, not a web
graph); a Common-Crawl-scale pipeline, though, needs the link graph for
crawl scheduling, host-authority weighting and dedup prioritisation
(mirror hosts show up as near-clique host pairs).  This module:

- derives a deterministic LINKED corpus: every base page carries three
  ``<a href>`` anchors whose targets are a pure function of ``doc_id``
  (``(doc_id * M_k + A_k) % n_docs`` for three fixed ``(M_k, A_k)``
  pairs — same synthesis discipline as corpus.py's duplicate families);
- parses the anchors back out of the html BYTES with one compiled regex
  (the honest extraction operator; the DuckDB oracle re-derives the
  targets arithmetically instead of parsing, so the two sides meet only
  if the regex extraction is faithful);
- rolls the edge list up into host-pair weights, per-host degrees and
  a top-k inlink table;
- runs an EXACT-INTEGER PageRank over the host graph: every operation
  is int64 (``(w * 85 // 100) // out_weight`` per unit link, plus a
  constant teleport term), so the result is order-independent and
  restatable bit-for-bit in DuckDB via unrolled CTE iterations.

Scale shape: html bytes never enter a shuffle — edges (two short url
strings) are extracted in the same streaming pass that reads the pages;
host rollups key their exchange on the host (or host-pair) string; the
PageRank iteration moves only ``(host, w)`` rows, with the host-pair
edge table and the host list bucketized ONCE and reused by all
``iters`` rounds (engine/exchange.Bucketed).  Dangling hosts (no
outlinks — absent under this derivation) would simply drop their
non-teleport mass; W0/TELEPORT are sized for ≤~10^5 hosts before int64
overflow and should scale down with host count beyond that.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import HTML_PRE_A, HTML_PRE_B
from data_dedup_ray.engine.exchange import (bucketize, hash_exchange,
                                            key_partition)

#: (multiplier, offset) per outlink slot: target_k = (doc_id*M + A) % n.
#: Slot moduli are chosen so the per-page TARGET-HOST pattern varies:
#: hosts are target%20, so slots 1/2 (M%20 = 19/9) always differ, while
#: slot 3 (M%20 = 10) collides with slot 1 on doc_id≡8 and slot 2 on
#: doc_id≡0 (mod 20) — page_link_features' distinct-host count is 2 or 3
#: depending on the page, and slot 3's gcd(M%n, n) > 1 makes a minority
#: of pages genuine inlink hubs (non-uniform top_linked_pages).
LINK_KS = ((7919, 17), (104729, 389), (1299710, 4049))

#: Exact-integer PageRank constants (damping 0.85 as 85//100).
PAGERANK_W0 = 1_000_000_000_000
PAGERANK_TELEPORT = 150_000_000_000

_HREF = re.compile(rb'href="([^"]+)"')

_EDGE_SCHEMA = pa.schema([
    ("src_url", pa.string()), ("dst_url", pa.string()),
    ("src_host", pa.string()), ("dst_host", pa.string()),
])


def _base_url(ids: pd.Series) -> pd.Series:
    return ("https://site" + (ids % 20).astype(str)
            + ".example/p/" + ids.astype(str))


def _anchor_text(t: pd.Series, slot: int) -> pd.Series:
    """Anchor text as a pure function of (target id, link slot) —
    ``t<t%97>s<slot>`` — so inlinks arriving via different slots carry
    DIFFERENT anchor strings for the same target (non-degenerate
    distinct-anchor counts) while staying arithmetic, i.e. restatable in
    the DuckDB oracle without parsing html."""
    return "t" + (t % 97).astype(str) + "s" + str(slot)


def _n_docs(sf_dir: str) -> int:
    """``max(doc_id) + 1`` — the modulus both sides share.  A pruned
    single-column aggregate (metadata-cheap); 0 for an empty table."""
    mx = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).max("doc_id")
    return 0 if mx is None else int(mx) + 1


def linked_pages(sf_dir: str) -> ray.data.Dataset:
    """``(url, html)`` base pages whose html embeds the three anchors."""
    n = _n_docs(sf_dir)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def derive(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"]
        anchors = None
        for slot, (m, a) in enumerate(LINK_KS):
            t = (ids * m + a) % n
            piece = ('<a href="' + _base_url(t) + '">'
                     + _anchor_text(t, slot) + "</a>")
            anchors = piece if anchors is None else anchors + piece
        html = (
            HTML_PRE_A + ids.astype(str) + HTML_PRE_B + batch["text"]
            + "</p>" + anchors + "</body></html>"
        ).str.encode("utf-8")
        return pd.DataFrame({"url": _base_url(ids), "html": html})

    return docs.map_batches(derive, batch_format="pandas")


def _extract_edges(t: pa.Table) -> pa.Table:
    """Regex-parse every ``href`` out of the html bytes (compiled once at
    module import; per-row loop is inherent to variable-count anchor
    extraction — the html column never leaves this stage)."""
    src = t["url"].to_numpy(zero_copy_only=False)
    htmls = t["html"].to_pylist()
    counts = np.empty(len(htmls), np.int64)
    dsts: list[str] = []
    for i, h in enumerate(htmls):
        found = _HREF.findall(h)
        counts[i] = len(found)
        dsts.extend(x.decode("utf-8") for x in found)
    src_rep = np.repeat(src, counts)
    dst = np.asarray(dsts, dtype=object)
    host = lambda s: (pd.Series(s, dtype=object)
                      .str.split("/").str[2].fillna(""))
    return pa.table({
        "src_url": pa.array(src_rep, pa.string()),
        "dst_url": pa.array(dst, pa.string()),
        "src_host": pa.array(host(src_rep), pa.string()),
        "dst_host": pa.array(host(dst), pa.string()),
    })


def link_edges(sf_dir: str) -> ray.data.Dataset:
    """The full outlink edge list: ``(src_url, dst_url, src_host,
    dst_host)``, one row per anchor (3 per base page)."""
    return linked_pages(sf_dir).map_batches(
        _extract_edges, batch_format="pyarrow")


# --------------------------------------------------------------------------
# SQL twins — arithmetic re-derivation of the anchors (no parsing).
# --------------------------------------------------------------------------

def _links_cte() -> str:
    ks = ", ".join(f"({m}, {a})" for m, a in LINK_KS)
    return f"""links AS (
  SELECT 'https://site' || (d.doc_id % 20) || '.example/p/' || d.doc_id AS src_url,
         'https://site' || (((d.doc_id * k.m + k.a) % nn.n) % 20)
           || '.example/p/' || ((d.doc_id * k.m + k.a) % nn.n) AS dst_url
  FROM documents d,
       (SELECT max(doc_id) + 1 AS n FROM documents) nn,
       (VALUES {ks}) k(m, a)
)"""


def _edges_cte() -> str:
    """links + host columns (split_part mirrors the Ray-side split)."""
    return (_links_cte() + """,
edges AS (
  SELECT src_url, dst_url,
         split_part(src_url, '/', 3) AS src_host,
         split_part(dst_url, '/', 3) AS dst_host
  FROM links
)""")


def link_edges_sql() -> str:
    return f"WITH {_edges_cte()}\nSELECT * FROM edges"


# --------------------------------------------------------------------------
# Host rollups.
# --------------------------------------------------------------------------

_HG_SCHEMA = pa.schema([
    ("src_host", pa.string()), ("dst_host", pa.string()),
    ("n_links", pa.int64()),
    ("n_src_pages", pa.int64()), ("n_dst_pages", pa.int64()),
])


def host_graph(edges: ray.data.Dataset, *,
               num_partitions: int = 16) -> ray.data.Dataset:
    """Host-pair rollup: link count + distinct page counts per side.
    Exchange keyed on the host-pair string, so each pair's rows land in
    one partition and the distinct counts are exact."""
    P = num_partitions

    def keyed(t: pa.Table) -> pa.Table:
        key = (t["src_host"].to_pandas().astype(object)
               + "|" + t["dst_host"].to_pandas().astype(object))
        return t.append_column(
            "_part", pa.array(key_partition(key.to_numpy(object), P)))

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["src_host", "dst_host"], sort=False).agg(
            n_links=("src_url", "size"),
            n_src_pages=("src_url", "nunique"),
            n_dst_pages=("dst_url", "nunique"),
        ).reset_index()
        return g

    return hash_exchange(
        [edges.map_batches(keyed, batch_format="pyarrow")], agg,
        num_partitions=P, schema=_HG_SCHEMA, in_schemas=[_EDGE_SCHEMA])


def host_graph_sql() -> str:
    return f"""WITH {_edges_cte()}
SELECT src_host, dst_host,
       count(*) AS n_links,
       count(DISTINCT src_url) AS n_src_pages,
       count(DISTINCT dst_url) AS n_dst_pages
FROM edges GROUP BY src_host, dst_host"""


_HD_SCHEMA = pa.schema([
    ("host", pa.string()),
    ("out_links", pa.int64()), ("in_links", pa.int64()),
    ("out_hosts", pa.int64()), ("in_hosts", pa.int64()),
])

_TAG_SCHEMA = pa.schema([
    ("host", pa.string()), ("peer", pa.string()), ("is_out", pa.int64()),
])


def host_degree(edges: ray.data.Dataset, *,
                num_partitions: int = 16) -> ray.data.Dataset:
    """Per-host degree table: out/in link counts + distinct peer hosts.
    Each edge is emitted twice (once per endpoint, tagged), then ONE
    exchange keyed on the host folds both directions."""
    P = num_partitions

    def tag(t: pa.Table) -> pa.Table:
        sh = t["src_host"].to_numpy(zero_copy_only=False)
        dh = t["dst_host"].to_numpy(zero_copy_only=False)
        host = np.concatenate([sh, dh])
        peer = np.concatenate([dh, sh])
        is_out = np.concatenate([
            np.ones(len(sh), np.int64), np.zeros(len(dh), np.int64)])
        return pa.table({
            "host": pa.array(host, pa.string()),
            "peer": pa.array(peer, pa.string()),
            "is_out": pa.array(is_out),
            "_part": pa.array(key_partition(host, P)),
        })

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "host": pd.Series([], dtype=object),
                "out_links": pd.Series([], dtype=np.int64),
                "in_links": pd.Series([], dtype=np.int64),
                "out_hosts": pd.Series([], dtype=np.int64),
                "in_hosts": pd.Series([], dtype=np.int64)})
        out = df[df["is_out"] == 1].groupby("host", sort=False)
        inn = df[df["is_out"] == 0].groupby("host", sort=False)
        hosts = pd.Index(df["host"].unique())
        return pd.DataFrame({
            "host": hosts.to_numpy(dtype=object),
            "out_links": out.size().reindex(hosts).fillna(0).astype(np.int64).to_numpy(),
            "in_links": inn.size().reindex(hosts).fillna(0).astype(np.int64).to_numpy(),
            "out_hosts": out["peer"].nunique().reindex(hosts).fillna(0).astype(np.int64).to_numpy(),
            "in_hosts": inn["peer"].nunique().reindex(hosts).fillna(0).astype(np.int64).to_numpy(),
        })

    return hash_exchange(
        [edges.select_columns(["src_host", "dst_host"]).map_batches(
            tag, batch_format="pyarrow")],
        agg, num_partitions=P, schema=_HD_SCHEMA,
        in_schemas=[_TAG_SCHEMA])


def host_degree_sql() -> str:
    return f"""WITH {_edges_cte()},
o AS (SELECT src_host AS host, count(*) AS out_links,
             count(DISTINCT dst_host) AS out_hosts
      FROM edges GROUP BY 1),
i AS (SELECT dst_host AS host, count(*) AS in_links,
             count(DISTINCT src_host) AS in_hosts
      FROM edges GROUP BY 1)
SELECT COALESCE(o.host, i.host) AS host,
       COALESCE(o.out_links, 0) AS out_links,
       COALESCE(i.in_links, 0) AS in_links,
       COALESCE(o.out_hosts, 0) AS out_hosts,
       COALESCE(i.in_hosts, 0) AS in_hosts
FROM o FULL OUTER JOIN i ON o.host = i.host"""


_TOP_SCHEMA = pa.schema([("dst_url", pa.string()), ("n_inlinks", pa.int64())])


def top_linked_pages(edges: ray.data.Dataset, *, k: int = 20,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """Top-k pages by inlink count (ties broken by url ascending).
    Map-side partial counts → exchange keyed on dst_url → per-partition
    top-k → driver-side final k over P·k candidate rows."""
    P = num_partitions

    def partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(
            t["dst_url"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({
            "dst_url": pa.array(u, pa.string()),
            "n": pa.array(c.astype(np.int64)),
            "_part": pa.array(key_partition(u, P)),
        })

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst_url", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "dst_url"], ascending=[False, True],
                          kind="mergesort").head(k)
        return g.rename(columns={"n": "n_inlinks"})

    cand = hash_exchange(
        [edges.select_columns(["dst_url"]).map_batches(
            partial, batch_format="pyarrow")],
        topk, num_partitions=P, schema=_TOP_SCHEMA,
        in_schemas=[pa.schema([("dst_url", pa.string()),
                               ("n", pa.int64())])],
    ).to_pandas()  # ≤ P·k candidate rows — output-sized collect
    out = cand.sort_values(["n_inlinks", "dst_url"],
                           ascending=[False, True],
                           kind="mergesort").head(k)
    return ray.data.from_arrow(
        pa.Table.from_pandas(out, schema=_TOP_SCHEMA, preserve_index=False))


def top_linked_pages_sql(k: int = 20) -> str:
    return f"""WITH {_edges_cte()}
SELECT dst_url, count(*) AS n_inlinks
FROM edges GROUP BY dst_url
ORDER BY n_inlinks DESC, dst_url LIMIT {k}"""


# --------------------------------------------------------------------------
# Exact-integer PageRank over the host graph.
# --------------------------------------------------------------------------

_W_SCHEMA_P = pa.schema([
    ("host", pa.string()), ("w", pa.int64()), ("_part", pa.int64())])
_W_IN = pa.schema([("host", pa.string()), ("w", pa.int64())])
_HE_SCHEMA = pa.schema([
    ("src_host", pa.string()), ("dst_host", pa.string()),
    ("nl", pa.int64()), ("ow", pa.int64()), ("_part", pa.int64())])
_HE_IN = pa.schema([
    ("src_host", pa.string()), ("dst_host", pa.string()),
    ("nl", pa.int64()), ("ow", pa.int64())])
_HOST_SCHEMA_P = pa.schema([("host", pa.string()), ("_part", pa.int64())])
_HOST_IN = pa.schema([("host", pa.string())])
_C_SCHEMA_P = pa.schema([
    ("host", pa.string()), ("c", pa.int64()), ("_part", pa.int64())])
_C_IN = pa.schema([("host", pa.string()), ("c", pa.int64())])
_PR_SCHEMA = pa.schema([("host", pa.string()), ("pagerank", pa.int64())])


def pagerank_hosts(edges: ray.data.Dataset, *, iters: int = 3,
                   num_partitions: int = 8) -> ray.data.Dataset:
    """``(host, pagerank)`` after ``iters`` exact-integer power
    iterations over the host-pair graph.

    Per unit link from host h: ``(w[h] * 85 // 100) // out_weight[h]``;
    per edge, that times the edge multiplicity; each host's new weight
    is ``TELEPORT + sum(in-contributions)``.  All int64 → the result is
    independent of summation order, hence identical to the unrolled
    DuckDB CTE twin.  Each iteration is two exchanges moving only
    ``(host, int)`` rows; the host-pair edge table and host list are
    bucketized once and reused across all rounds."""
    P = num_partitions

    def pair_keyed(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(key_partition(
            t["src_host"].to_numpy(zero_copy_only=False), P)))

    def pair_agg(df: pd.DataFrame) -> pd.DataFrame:
        # keyed on src_host → every out-edge of a host is local, so the
        # per-source total out-weight ow is exact here
        g = (df.groupby(["src_host", "dst_host"], sort=False)
             .size().rename("nl").reset_index())
        if len(g):
            g["ow"] = g.groupby("src_host", sort=False)["nl"].transform("sum")
        else:
            g["ow"] = pd.Series([], dtype=np.int64)
        g["_part"] = key_partition(g["src_host"].to_numpy(object), P)
        return g

    hedges = hash_exchange(
        [edges.select_columns(["src_host", "dst_host"]).map_batches(
            pair_keyed, batch_format="pyarrow")],
        pair_agg, num_partitions=P, schema=_HE_SCHEMA,
        in_schemas=[pa.schema([("src_host", pa.string()),
                               ("dst_host", pa.string())])])

    def host_rows(t: pa.Table) -> pa.Table:
        h = np.unique(np.concatenate([
            t["src_host"].to_numpy(zero_copy_only=False),
            t["dst_host"].to_numpy(zero_copy_only=False)]))
        return pa.table({"host": pa.array(h, pa.string()),
                         "_part": pa.array(key_partition(h, P))})

    def distinct_hosts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"host": pd.unique(df["host"])})

    hosts = hash_exchange(
        [edges.select_columns(["src_host", "dst_host"]).map_batches(
            host_rows, batch_format="pyarrow")],
        distinct_hosts, num_partitions=P,
        schema=pa.schema([("host", pa.string())]),
        in_schemas=[_HOST_IN])

    # pair_agg already emitted _part keyed on src_host — bucketize as-is
    e_b = bucketize(hedges, num_partitions=P, in_schema=_HE_SCHEMA)
    hosts_p = hosts.map_batches(
        lambda t: t.append_column("_part", pa.array(key_partition(
            t["host"].to_numpy(zero_copy_only=False), P))),
        batch_format="pyarrow")
    h_b = bucketize(hosts_p, num_partitions=P, in_schema=_HOST_SCHEMA_P)

    w = hosts_p.map_batches(
        lambda t: pa.table({
            "host": t["host"],
            "w": pa.array(np.full(t.num_rows, PAGERANK_W0, np.int64)),
            "_part": t["_part"]}),
        batch_format="pyarrow")

    def contrib(wdf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        m = edf.merge(wdf, left_on="src_host", right_on="host")
        if not len(m):
            return pd.DataFrame({"host": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int64)})
        c = (m["w"].to_numpy(np.int64) * 85 // 100
             // m["ow"].to_numpy(np.int64)) * m["nl"].to_numpy(np.int64)
        g = (pd.DataFrame({"host": m["dst_host"], "c": c})
             .groupby("host", sort=False)["c"].sum().reset_index())
        g["_part"] = key_partition(g["host"].to_numpy(object), P)
        return g

    def renew(hdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        s = cdf.groupby("host", sort=False)["c"].sum()
        w_new = (PAGERANK_TELEPORT
                 + hdf["host"].map(s).fillna(0).astype(np.int64))
        out = pd.DataFrame({"host": hdf["host"], "w": w_new})
        out["_part"] = key_partition(out["host"].to_numpy(object), P)
        return out

    for _ in range(iters):
        contribs = hash_exchange(
            [w, e_b], contrib, num_partitions=P,
            schema=_C_SCHEMA_P, in_schemas=[_W_IN, _HE_IN])
        w = hash_exchange(
            [h_b, contribs], renew, num_partitions=P,
            schema=_W_SCHEMA_P, in_schemas=[_HOST_IN, _C_IN])

    return w.map_batches(
        lambda t: pa.table({"host": t["host"],
                            "pagerank": t["w"]}),
        batch_format="pyarrow")


# --------------------------------------------------------------------------
# HITS hubs & authorities (exact-integer, Kleinberg 1999)
# --------------------------------------------------------------------------

#: initial hub score and per-round hub down-scale (a power of two so the
#: floor division is a bit shift).  Magnitude bound: after one round
#: ``a ≤ E·H0`` and ``h ≤ E²·H0 // SCALE`` — with H0=2²⁰ and SCALE=2²⁰,
#: ``iters=2`` stays inside int64 for graphs up to ~10⁵ weighted edges
#: per host pair; scale H0 down with graph size beyond that (same
#: documented discipline as PAGERANK_W0).
HITS_H0 = 1 << 20
HITS_SCALE = 1 << 20

_HITS_SCHEMA = pa.schema([
    ("host", pa.string()), ("hub", pa.int64()), ("authority", pa.int64())])


def hits_hosts(edges: ray.data.Dataset, *, iters: int = 2,
               num_partitions: int = 8) -> ray.data.Dataset:
    """``(host, hub, authority)`` after ``iters`` exact-integer HITS
    rounds (Kleinberg 1999): ``a_i = Σ_{j→i} h_j·nl`` then ``h_i =
    (Σ_{i→j} a_j·nl) // HITS_SCALE`` — sum BEFORE the floor division, so
    every value is an order-independent int64 and the result is
    restatable bit-for-bit in DuckDB.  Directories/portals surface as
    hubs, syndication sources as authorities — the pair of signals
    frontier scheduling reads next to PageRank's single one.

    Same scale shape as ``pagerank_hosts``: the host-pair edge table is
    rolled up once and bucketized TWICE (keyed by src for the hub→
    authority half, by dst for the authority→hub half); each half-round
    is two exchanges moving only ``(host, int)`` rows."""
    P = num_partitions

    def pair_keyed(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(key_partition(
            t["src_host"].to_numpy(zero_copy_only=False), P)))

    def pair_agg(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["src_host", "dst_host"], sort=False)
             .size().rename("nl").reset_index())
        g["_part"] = key_partition(g["src_host"].to_numpy(object), P)
        return g

    he_schema = pa.schema([
        ("src_host", pa.string()), ("dst_host", pa.string()),
        ("nl", pa.int64()), ("_part", pa.int64())])
    he_in = pa.schema([
        ("src_host", pa.string()), ("dst_host", pa.string()),
        ("nl", pa.int64())])
    hedges = hash_exchange(
        [edges.select_columns(["src_host", "dst_host"]).map_batches(
            pair_keyed, batch_format="pyarrow")],
        pair_agg, num_partitions=P, schema=he_schema,
        in_schemas=[pa.schema([("src_host", pa.string()),
                               ("dst_host", pa.string())])])

    def host_rows(t: pa.Table) -> pa.Table:
        h = np.unique(np.concatenate([
            t["src_host"].to_numpy(zero_copy_only=False),
            t["dst_host"].to_numpy(zero_copy_only=False)]))
        return pa.table({"host": pa.array(h, pa.string()),
                         "_part": pa.array(key_partition(h, P))})

    hosts = hash_exchange(
        [edges.select_columns(["src_host", "dst_host"]).map_batches(
            host_rows, batch_format="pyarrow")],
        lambda df: pd.DataFrame({"host": pd.unique(df["host"])}),
        num_partitions=P, schema=pa.schema([("host", pa.string())]),
        in_schemas=[_HOST_IN])

    e_src = bucketize(hedges, num_partitions=P, in_schema=he_schema)
    e_dst = bucketize(
        hedges.map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("_part"), "_part",
                pa.array(key_partition(
                    t["dst_host"].to_numpy(zero_copy_only=False), P))),
            batch_format="pyarrow"),
        num_partitions=P, in_schema=he_schema)

    hosts_p = hosts.map_batches(
        lambda t: t.append_column("_part", pa.array(key_partition(
            t["host"].to_numpy(zero_copy_only=False), P))),
        batch_format="pyarrow")
    h_b = bucketize(hosts_p, num_partitions=P, in_schema=_HOST_SCHEMA_P)

    h = hosts_p.map_batches(
        lambda t: pa.table({
            "host": t["host"],
            "w": pa.array(np.full(t.num_rows, HITS_H0, np.int64)),
            "_part": t["_part"]}),
        batch_format="pyarrow")

    def _push(src_key: str, dst_key: str):
        # contributions w[src_key]·nl delivered to dst_key's partition
        def fn(wdf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
            m = edf.merge(wdf, left_on=src_key, right_on="host")
            if not len(m):
                return pd.DataFrame({
                    "host": pd.Series([], dtype=object),
                    "c": pd.Series([], dtype=np.int64),
                    "_part": pd.Series([], dtype=np.int64)})
            c = m["w"].to_numpy(np.int64) * m["nl"].to_numpy(np.int64)
            g = (pd.DataFrame({"host": m[dst_key], "c": c})
                 .groupby("host", sort=False)["c"].sum().reset_index())
            g["_part"] = key_partition(g["host"].to_numpy(object), P)
            return g
        return fn

    def _sum(div: int):
        def fn(hdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
            s = cdf.groupby("host", sort=False)["c"].sum()
            w_new = (hdf["host"].map(s).fillna(0).astype(np.int64)
                     // div)
            out = pd.DataFrame({"host": hdf["host"], "w": w_new})
            out["_part"] = key_partition(out["host"].to_numpy(object), P)
            return out
        return fn

    a = h  # placeholder; overwritten in round 1
    for _ in range(iters):
        ca = hash_exchange(
            [h, e_src], _push("src_host", "dst_host"), num_partitions=P,
            schema=_C_SCHEMA_P, in_schemas=[_W_IN, he_in])
        a = hash_exchange(
            [h_b, ca], _sum(1), num_partitions=P,
            schema=_W_SCHEMA_P, in_schemas=[_HOST_IN, _C_IN])
        ch = hash_exchange(
            [a, e_dst], _push("dst_host", "src_host"), num_partitions=P,
            schema=_C_SCHEMA_P, in_schemas=[_W_IN, he_in])
        h = hash_exchange(
            [h_b, ch], _sum(HITS_SCALE), num_partitions=P,
            schema=_W_SCHEMA_P, in_schemas=[_HOST_IN, _C_IN])

    def zip_scores(hdf: pd.DataFrame, adf: pd.DataFrame) -> pd.DataFrame:
        m = hdf.merge(adf, on="host", suffixes=("_h", "_a"))
        return pd.DataFrame({"host": m["host"],
                             "hub": m["w_h"].astype(np.int64),
                             "authority": m["w_a"].astype(np.int64)})

    return hash_exchange(
        [h, a], zip_scores, num_partitions=P,
        schema=_HITS_SCHEMA, in_schemas=[_W_IN, _W_IN])


def hits_hosts_sql(iters: int = 2) -> str:
    parts = [f"""{_edges_cte()},
hedges AS (SELECT src_host AS sh, dst_host AS dh, count(*) AS nl
           FROM edges GROUP BY 1, 2),
hosts AS (SELECT sh AS host FROM hedges UNION SELECT dh FROM hedges),
h0 AS (SELECT host, CAST({HITS_H0} AS BIGINT) AS w FROM hosts)"""]
    for i in range(1, iters + 1):
        parts.append(f"""a{i} AS (
  SELECT h.host,
         CAST(COALESCE(SUM(p.w * e.nl), 0) AS BIGINT) AS w
  FROM hosts h
  LEFT JOIN hedges e ON e.dh = h.host
  LEFT JOIN h{i - 1} p ON p.host = e.sh
  GROUP BY h.host)""")
        parts.append(f"""h{i} AS (
  SELECT h.host,
         CAST(COALESCE(SUM(p.w * e.nl), 0) // {HITS_SCALE}
           AS BIGINT) AS w
  FROM hosts h
  LEFT JOIN hedges e ON e.sh = h.host
  LEFT JOIN a{i} p ON p.host = e.dh
  GROUP BY h.host)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT h.host, h{iters}.w AS hub, a{iters}.w AS authority"
            f"\nFROM hosts h"
            f"\nJOIN h{iters} ON h{iters}.host = h.host"
            f"\nJOIN a{iters} ON a{iters}.host = h.host")


# --------------------------------------------------------------------------
# Link-structure dedup: group pages by their ordered outlink target set.
# --------------------------------------------------------------------------

_FP_SCHEMA = pa.schema([
    ("url", pa.string()), ("link_cluster_id", pa.string())])
_FP_IN = pa.schema([("url", pa.string()), ("fp", pa.string())])


def linked_web_pages(sf_dir: str) -> ray.data.Dataset:
    """The FULL web_pages corpus (all six duplicate families) with the
    three doc_id-keyed anchors inserted into each page's body — every
    family variant of one document carries the IDENTICAL ordered outlink
    set, the link-structure fixture content hashing can't see (near /
    quote / empty variants have different text but the same links)."""
    from data_dedup_ray.corpus import HTML_POST, web_pages

    n = _n_docs(sf_dir)

    def add_anchors(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["url"].str.split("/p/").str[1].astype(np.int64)
        anchors = None
        for m, a in LINK_KS:
            t = (ids * m + a) % n
            piece = '<a href="' + _base_url(t) + '">more</a>'
            anchors = piece if anchors is None else anchors + piece
        html = (df["html"].str.decode("utf-8").str[: -len(HTML_POST)]
                + "</p>" + anchors + "</body></html>").str.encode("utf-8")
        out = df.copy()
        out["html"] = html
        return out

    return web_pages(sf_dir).map_batches(add_anchors, batch_format="pandas")


def link_fingerprint_groups(sf_dir: str, *,
                            num_partitions: int = 16) -> ray.data.Dataset:
    """``(url, link_cluster_id)`` — pages grouped by the chr(1)-joined
    ORDERED list of href targets regex-parsed from their html bytes;
    cluster id is the group's min url.  Link-structure near-dup
    detection: boilerplate-nav mirrors and text-mutated variants group
    together even when content hashes differ.  The fingerprint-keyed
    exchange moves only ``(url, fp)`` rows — html never shuffles — and
    the oracle re-derives the target list arithmetically, so the two
    sides meet only if the regex parse is faithful."""
    P = num_partitions

    def fp_rows(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        fps = [b"\x01".join(_HREF.findall(h)).decode("utf-8")
               for h in t["html"].to_pylist()]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "fp": pa.array(fps, pa.string()),
            "_part": pa.array(key_partition(
                np.asarray(fps, dtype=object), P)),
        })

    def label(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 "link_cluster_id": pd.Series([], dtype=object)})
        lab = df.groupby("fp", sort=False)["url"].transform("min")
        return pd.DataFrame({"url": df["url"], "link_cluster_id": lab})

    return hash_exchange(
        [linked_web_pages(sf_dir).map_batches(
            fp_rows, batch_format="pyarrow")],
        label, num_partitions=P, schema=_FP_SCHEMA, in_schemas=[_FP_IN])


def link_fingerprint_groups_sql() -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    targets = " || chr(1) || ".join(
        f"('https://site' || (((p.id * {m} + {a}) % nn.n) % 20)"
        f" || '.example/p/' || ((p.id * {m} + {a}) % nn.n))"
        for m, a in LINK_KS)
    return f"""WITH {WEB_PAGES_CTE},
p AS (SELECT url, CAST(split_part(url, '/p/', 2) AS BIGINT) AS id
      FROM web_pages),
nn AS (SELECT max(doc_id) + 1 AS n FROM documents),
fp AS (SELECT p.url, {targets} AS f FROM p, nn)
SELECT url, min(url) OVER (PARTITION BY f) AS link_cluster_id FROM fp"""


_PLF_SCHEMA = pa.schema([
    ("url", pa.string()), ("n_links", pa.int64()),
    ("n_target_hosts", pa.int64()),
])


def page_link_features(sf_dir: str) -> ray.data.Dataset:
    """Per-page link features for quality / spam classifiers: ``(url,
    n_links, n_target_hosts)`` — a page whose links all hit ONE host is
    a nav shell / doorway; broad-host linkers look editorial.  One
    streaming pass over the linked corpus: regex parse + per-page
    distinct-host count, html never leaves the stage.  Oracle re-derives
    the three targets arithmetically per family url.  (A same-host
    "internal link" ratio would be the classic companion feature, but on
    this corpus derivation it is provably constant-zero — the anchor
    moduli make ``target%20 == doc_id%20`` unsolvable — so the varying
    distinct-host count is the honest fixture-backed feature.)"""

    def feats(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        n = np.empty(len(urls), np.int64)
        nh = np.empty(len(urls), np.int64)
        for i, h in enumerate(t["html"].to_pylist()):
            found = _HREF.findall(h)
            n[i] = len(found)
            nh[i] = len({f.split(b"/")[2] for f in found})
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "n_links": pa.array(n),
            "n_target_hosts": pa.array(nh),
        })

    return linked_web_pages(sf_dir).map_batches(
        feats, batch_format="pyarrow")


def page_link_features_sql() -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    hosts = ", ".join(
        f"((p.id * {m} + {a}) % nn.n) % 20" for m, a in LINK_KS)
    return f"""WITH {WEB_PAGES_CTE},
p AS (SELECT url, CAST(split_part(url, '/p/', 2) AS BIGINT) AS id
      FROM web_pages),
nn AS (SELECT max(doc_id) + 1 AS n FROM documents)
SELECT p.url, CAST(3 AS BIGINT) AS n_links,
       CAST(len(list_distinct([{hosts}])) AS BIGINT) AS n_target_hosts
FROM p, nn"""


_RECIP_SCHEMA = pa.schema([
    ("host_a", pa.string()), ("host_b", pa.string()),
    ("n_ab", pa.int64()), ("n_ba", pa.int64()),
    ("reciprocity_bp", pa.int64()),
])


def host_reciprocity(edges: ray.data.Dataset, *,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """Bidirectional linking per unordered host pair: ``(host_a <
    host_b, n_ab, n_ba, reciprocity_bp)`` where ``n_ab`` counts links
    a→b, ``n_ba`` counts b→a and ``reciprocity_bp = 2 * min * 10000 //
    (n_ab + n_ba)`` (10000 = perfectly mutual).  Mutual high-volume
    linking is the link-structure mirror signal that complements the
    content-sha view in ``pipelines/mirrors``.  Per-batch directed
    partials flow through one exchange keyed on the unordered pair;
    intra-host links are excluded."""
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        sh = t["src_host"].to_numpy(zero_copy_only=False)
        dh = t["dst_host"].to_numpy(zero_copy_only=False)
        keep = sh != dh
        sh, dh = sh[keep], dh[keep]
        lo = np.minimum(sh, dh)
        hi = np.maximum(sh, dh)
        fwd = (sh == lo).astype(np.int64)  # 1 = the a→b direction
        g = (pd.DataFrame({"host_a": lo, "host_b": hi, "fwd": fwd,
                           "rev": 1 - fwd})
             .groupby(["host_a", "host_b"], sort=False)
             .agg(n_ab=("fwd", "sum"), n_ba=("rev", "sum")).reset_index())
        key = (g["host_a"].astype(object) + "|"
               + g["host_b"].astype(object))
        g["_part"] = key_partition(key.to_numpy(object), P)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["host_a", "host_b"], sort=False)
             .agg(n_ab=("n_ab", "sum"), n_ba=("n_ba", "sum"))
             .reset_index())
        a = g["n_ab"].to_numpy(np.int64)
        b = g["n_ba"].to_numpy(np.int64)
        g["reciprocity_bp"] = 2 * np.minimum(a, b) * 10000 // (a + b)
        return g

    return hash_exchange(
        [edges.select_columns(["src_host", "dst_host"]).map_batches(
            prep, batch_format="pyarrow")],
        final, num_partitions=P, schema=_RECIP_SCHEMA,
        in_schemas=[pa.schema([
            ("host_a", pa.string()), ("host_b", pa.string()),
            ("n_ab", pa.int64()), ("n_ba", pa.int64())])])


def host_reciprocity_sql() -> str:
    return f"""WITH {_edges_cte()},
d AS (SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n
      FROM edges WHERE src_host <> dst_host GROUP BY 1, 2),
p AS (SELECT least(src_host, dst_host) AS host_a,
             greatest(src_host, dst_host) AS host_b,
             CAST(sum(CASE WHEN src_host < dst_host THEN n ELSE 0 END)
                  AS BIGINT) AS n_ab,
             CAST(sum(CASE WHEN src_host > dst_host THEN n ELSE 0 END)
                  AS BIGINT) AS n_ba
      FROM d GROUP BY 1, 2)
SELECT host_a, host_b, n_ab, n_ba,
       2 * least(n_ab, n_ba) * 10000 // (n_ab + n_ba) AS reciprocity_bp
FROM p"""


_FRONTIER_SCHEMA = pa.schema([
    ("host", pa.string()), ("pagerank", pa.int64()),
    ("dup_rate_bp", pa.int64()), ("priority", pa.int64()),
])


def frontier_scores(sf_dir: str) -> ray.data.Dataset:
    """Crawl-frontier priority per host: exact-integer PageRank authority
    discounted by the host's exact-content duplication rate —
    ``priority = pagerank * (10000 - dup_rate_bp) // 10000``.  The
    composition a crawl scheduler actually runs: spend authority-weighted
    budget where content is NOT redundant.  Both inputs are host-scale
    (output-sized) Datasets — PageRank over the link graph, dup rates
    from the sha rollup — joined on the driver; pages are only touched
    inside those two pipelines.  Hosts outside the link graph (family
    hosts with no anchors) carry no frontier row, matching the INNER
    join in the twin."""
    from data_dedup_ray.pipelines.mirrors import host_content_counts

    pr = pagerank_hosts(link_edges(sf_dir)).to_pandas()
    from data_dedup_ray.corpus import web_pages

    hc = host_content_counts(web_pages(sf_dir)).to_pandas()
    if not len(pr) or not len(hc):
        return ray.data.from_arrow(_FRONTIER_SCHEMA.empty_table())
    hc["dup_rate_bp"] = ((hc["n_pages"] - hc["n_distinct"]) * 10000
                         // hc["n_pages"]).astype(np.int64)
    m = pr.merge(hc[["host", "dup_rate_bp"]], on="host")
    m["priority"] = (m["pagerank"].astype(np.int64)
                     * (10000 - m["dup_rate_bp"]) // 10000)
    return ray.data.from_arrow(pa.Table.from_pandas(
        m[["host", "pagerank", "dup_rate_bp", "priority"]],
        schema=_FRONTIER_SCHEMA, preserve_index=False))


def frontier_scores_sql(iters: int = 3) -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    host = "split_part(split_part(url, '//', 2), '/', 1)"
    dup = f"""WITH {WEB_PAGES_CTE},
h AS (SELECT {host} AS host, CAST(count(*) AS BIGINT) AS n_pages,
             CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
      FROM web_pages GROUP BY 1)
SELECT host, (n_pages - n_distinct) * 10000 // n_pages AS dup_rate_bp
FROM h"""
    return f"""SELECT pr.host, pr.pagerank, d.dup_rate_bp,
       pr.pagerank * (10000 - d.dup_rate_bp) // 10000 AS priority
FROM ({pagerank_hosts_sql(iters)}) pr
JOIN ({dup}) d ON d.host = pr.host"""


def pagerank_pages(edges: ray.data.Dataset, *, iters: int = 3,
                   num_partitions: int = 8) -> ray.data.Dataset:
    """``(url, pagerank)`` — the same exact-integer power iteration at
    PAGE granularity (nodes = urls, one row per page).  Reuses the host
    machinery verbatim by projecting the url endpoints into the node
    columns; the exchange/bucketize shapes are identical, only the key
    cardinality grows — which is the point: nothing in the operator
    assumed a small graph."""
    nodes = edges.select_columns(["src_url", "dst_url"]).rename_columns(
        {"src_url": "src_host", "dst_url": "dst_host"})
    pr = pagerank_hosts(nodes, iters=iters, num_partitions=num_partitions)
    return pr.rename_columns({"host": "url"})


def pagerank_pages_sql(iters: int = 3) -> str:
    parts = [f"""{_links_cte()},
hedges AS (SELECT src_url AS sh, dst_url AS dh, count(*) AS nl
           FROM links GROUP BY 1, 2),
hosts AS (SELECT sh AS host FROM hedges UNION SELECT dh FROM hedges),
outw AS (SELECT sh AS host, CAST(sum(nl) AS BIGINT) AS ow
         FROM hedges GROUP BY 1),
w0 AS (SELECT host, CAST({PAGERANK_W0} AS BIGINT) AS w FROM hosts)"""]
    for i in range(1, iters + 1):
        parts.append(f"""w{i} AS (
  SELECT h.host,
         CAST({PAGERANK_TELEPORT}
              + COALESCE(SUM(((p.w * 85 // 100) // o.ow) * e.nl), 0)
           AS BIGINT) AS w
  FROM hosts h
  LEFT JOIN hedges e ON e.dh = h.host
  LEFT JOIN w{i - 1} p ON p.host = e.sh
  LEFT JOIN outw o ON o.host = e.sh
  GROUP BY h.host)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT host AS url, w AS pagerank FROM w{iters}")


def pagerank_hosts_sql(iters: int = 3) -> str:
    parts = [f"""{_edges_cte()},
hedges AS (SELECT src_host AS sh, dst_host AS dh, count(*) AS nl
           FROM edges GROUP BY 1, 2),
hosts AS (SELECT sh AS host FROM hedges UNION SELECT dh FROM hedges),
outw AS (SELECT sh AS host, CAST(sum(nl) AS BIGINT) AS ow
         FROM hedges GROUP BY 1),
w0 AS (SELECT host, CAST({PAGERANK_W0} AS BIGINT) AS w FROM hosts)"""]
    for i in range(1, iters + 1):
        parts.append(f"""w{i} AS (
  SELECT h.host,
         CAST({PAGERANK_TELEPORT}
              + COALESCE(SUM(((p.w * 85 // 100) // o.ow) * e.nl), 0)
           AS BIGINT) AS w
  FROM hosts h
  LEFT JOIN hedges e ON e.dh = h.host
  LEFT JOIN w{i - 1} p ON p.host = e.sh
  LEFT JOIN outw o ON o.host = e.sh
  GROUP BY h.host)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT host, w AS pagerank FROM w{iters}")


# --------------------------------------------------------------------------
# Anchor-text aggregation per target page.
# --------------------------------------------------------------------------

_AT_SCHEMA = pa.schema([
    ("url", pa.string()), ("n_inlinks", pa.int64()),
    ("n_anchors", pa.int64()), ("top_anchor", pa.string()),
])

_AT_IN = pa.schema([
    ("url", pa.string()), ("anchor", pa.string()),
    ("n", pa.int64()),
])

_ANCHOR = re.compile(rb'<a href="([^"]+)">([^<]*)</a>')


def anchor_text_agg(sf_dir: str, *,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """Per-TARGET anchor-text rollup — the classic web-search / quality
    feature (what the web *calls* a page, independent of what the page
    says about itself): ``(url, n_inlinks, n_anchors, top_anchor)`` with
    ``top_anchor`` = the most frequent inbound anchor string, ties
    broken lexicographically (deterministic).

    Scale shape: anchors are regex-parsed out of the html BYTES in the
    same streaming pass that reads the pages and immediately combined to
    per-batch ``(target url, anchor, count)`` partials — html never
    enters the shuffle, and the one exchange is keyed on the target url
    so each target's counts are exact in its owning partition.  The
    oracle re-derives every (target, anchor) pair arithmetically (see
    ``_anchor_text``), so the two sides meet only if the byte-level
    anchor parse is faithful."""
    P = num_partitions

    def parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        anchors: list[str] = []
        for h in t["html"].to_pylist():
            for u, a in _ANCHOR.findall(h):
                urls.append(u.decode("utf-8"))
                anchors.append(a.decode("utf-8"))
        g = (pd.DataFrame({"url": urls, "anchor": anchors})
             .groupby(["url", "anchor"], sort=False)
             .size().reset_index(name="n"))
        return pa.table({
            "url": pa.array(g["url"], pa.string()),
            "anchor": pa.array(g["anchor"], pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "_part": pa.array(key_partition(g["url"].to_numpy(object), P)),
        })

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "url": pd.Series([], dtype=object),
                "n_inlinks": pd.Series([], dtype=np.int64),
                "n_anchors": pd.Series([], dtype=np.int64),
                "top_anchor": pd.Series([], dtype=object)})
        c = (df.groupby(["url", "anchor"], sort=False)["n"]
             .sum().reset_index()
             .sort_values(["url", "n", "anchor"],
                          ascending=[True, False, True]))
        tot = c.groupby("url", sort=False).agg(
            n_inlinks=("n", "sum"), n_anchors=("anchor", "size"),
            top_anchor=("anchor", "first")).reset_index()
        return tot

    return hash_exchange(
        [linked_pages(sf_dir).map_batches(parse, batch_format="pyarrow")],
        agg, num_partitions=P, schema=_AT_SCHEMA, in_schemas=[_AT_IN])


def anchor_text_agg_sql() -> str:
    ks = ", ".join(f"({m}, {a}, {s})"
                   for s, (m, a) in enumerate(LINK_KS))
    return f"""WITH tgt AS (
  SELECT ((d.doc_id * k.m + k.a) % nn.n) AS t, k.s AS slot
  FROM documents d,
       (SELECT max(doc_id) + 1 AS n FROM documents) nn,
       (VALUES {ks}) k(m, a, s)
), anch AS (
  SELECT 'https://site' || (t % 20) || '.example/p/' || t AS url,
         't' || (t % 97) || 's' || slot AS anchor
  FROM tgt
), cnt AS (
  SELECT url, anchor, count(*) AS n FROM anch GROUP BY url, anchor
), tot AS (
  SELECT url, CAST(sum(n) AS BIGINT) AS n_inlinks,
         count(*) AS n_anchors
  FROM cnt GROUP BY url
), top AS (
  SELECT url, anchor,
         row_number() OVER (PARTITION BY url ORDER BY n DESC, anchor)
           AS rn
  FROM cnt
)
SELECT t.url, t.n_inlinks, t.n_anchors, top.anchor AS top_anchor
FROM tot t JOIN top ON top.url = t.url AND top.rn = 1"""
