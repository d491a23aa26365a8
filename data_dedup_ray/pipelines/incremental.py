"""Incremental near-dup CLUSTERING against a persisted index — the state
update a rolling 100 TB dedup keeps between crawls.

``pipelines/index.py`` gives incremental PAIRS (new crawl vs the persisted
shingle store, index text never re-read).  This module completes the
story: fold those pairs — plus the new crawl's internal pairs — into the
EXISTING cluster assignment without ever re-discovering index-vs-index
pairs.  Correctness rests on the supernode identity: connected components
of (old edges ∪ cross edges ∪ new-new edges) equal components of the
graph where every old COMPONENT is collapsed to one supernode, because
the old labels encode exactly the old edges' connectivity.  Cluster ids
stay ``min member url`` across the whole union, so the result is
byte-identical to re-clustering the union corpus flat — which is what the
SQL oracle states (and a pytest pins against the live flat pipeline).

Pipeline (nothing corpus-sized leaves its partition):

1. ONE LSH job over the tagged union of store blobs (``i|``) and the
   newly tokenized crawl (``n|``); index-vs-index candidates are dropped
   BEFORE the Jaccard verify — the saved work is the point;
2. verified edges (output-sized) have their ``i|url`` endpoints rewritten
   to ``i|<old cluster>`` supernodes via two label-join exchanges;
3. components over the supernode graph run on the alternating-star
   engine (pipelines/cc.py — diameter-independent rounds);
4. each component is re-labeled with its minimum UNTAGGED member url
   (old labels are their old components' minima, so min-of-mins is the
   union minimum), and the assignment is fanned back out to every index
   url (via its old label) and every new url.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_EDGE_IN = pa.schema([("node_a", pa.string()), ("node_b", pa.string())])
_LAB_IN = pa.schema([("url", pa.string()), ("lab", pa.string())])
_NC_IN = pa.schema([("node", pa.string()), ("rep", pa.string())])
_OUT = pa.schema([("side", pa.string()), ("url", pa.string()),
                  ("cluster_id", pa.string())])


def _untag(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.utf8_slice_codeunits(arr, 2)


def _rewrite(src: str, carry: str, out_node: str, out_carry: str,
             order: tuple[str, str]):
    """Exchange kernel factory: left-join ``src``'s UNTAGGED endpoint
    against this partition's old labels and rewrite ``i|url`` →
    ``i|<old label>`` (``n|`` endpoints pass through); ``carry`` rides
    along unchanged.  ``order`` is the output schema's column order
    (hash_exchange casts positionally)."""
    order = list(order)

    def fn(eg: pd.DataFrame, lg: pd.DataFrame) -> pd.DataFrame:
        if not len(eg):
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in order})
        u = eg[src].str[2:]
        m = pd.DataFrame({"u": u.to_numpy()}).merge(
            lg.rename(columns={"url": "u"}), on="u", how="left")
        is_index = eg[src].str[:1].to_numpy() == "i"
        node = np.where(is_index,
                        "i|" + m["lab"].fillna(m["u"]), eg[src])
        out = pd.DataFrame({out_node: node,
                            out_carry: eg[carry].to_numpy()})
        return out[order]

    return fn


def incremental_near_dup_clusters(
    new_ds: ray.data.Dataset,
    store_path: str | list[str],
    old_labels: ray.data.Dataset,
    *,
    threshold: float = 0.7,
    num_partitions: int = 32,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """``(side, url, cluster_id)`` for every page of index ∪ new crawl;
    ``old_labels`` is the index corpus' existing ``(url, cluster_id)``
    assignment (min-member ids, e.g. from minhash_dedup_clusters)."""
    from data_dedup_ray.pipelines.cc import largestar_components
    from data_dedup_ray.pipelines.index import read_shingle_store
    from data_dedup_ray.pipelines.near import (lsh_candidate_pairs,
                                               shingle_rows,
                                               verify_pairs_partitioned)

    id_col = lsh_kwargs.get("id_col", "url")
    text_col = lsh_kwargs.get("text_col", "text")
    shingle_k = lsh_kwargs.get("shingle_k", 5)
    P = num_partitions

    def _tag(prefix: str):
        def fn(t: pa.Table) -> pa.Table:
            tagged = pc.binary_join_element_wise(
                pa.scalar(prefix),
                t[id_col].combine_chunks().cast(pa.string()), "")
            return pa.table({id_col: tagged,
                             "sh": t["sh"].combine_chunks().cast(
                                 pa.large_binary())})
        return fn

    sh_new = shingle_rows(new_ds, id_col=id_col, text_col=text_col,
                          shingle_k=shingle_k)
    sh = (
        read_shingle_store(store_path)
        .map_batches(_tag("i|"), batch_format="pyarrow")
        .union(sh_new.map_batches(_tag("n|"), batch_format="pyarrow"))
        .materialize()
    )
    lsh_kwargs.setdefault("distinct", False)
    cand = lsh_candidate_pairs(None, sh=sh, **lsh_kwargs)
    # index-vs-index connectivity is already in old_labels: drop those
    # candidates before they cost a verify join
    not_ii = cand.map_batches(
        lambda t: t.filter(pc.invert(pc.and_(
            pc.equal(pc.utf8_slice_codeunits(t[f"{id_col}_a"], 0, 1), "i"),
            pc.equal(pc.utf8_slice_codeunits(t[f"{id_col}_b"], 0, 1), "i"),
        ))),
        batch_format="pyarrow",
    )
    edges = verify_pairs_partitioned(
        None, not_ii, id_col=id_col, text_col=text_col,
        shingle_k=shingle_k, threshold=threshold, sh=sh,
    )

    lab = old_labels.map_batches(
        lambda t: pa.table({
            "url": t["url"].combine_chunks().cast(pa.string()),
            "lab": t["cluster_id"].combine_chunks().cast(pa.string()),
            "_part": pa.array(key_partition(
                t["url"].combine_chunks().to_numpy(zero_copy_only=False),
                P)),
        }),
        batch_format="pyarrow",
    )

    # rewrite tagged endpoints to supernodes: i|url → i|<old label>,
    # n|url unchanged — one label-join exchange per endpoint
    def _endpoint_part(col: str):
        def fn(t: pa.Table) -> pa.Table:
            u = _untag(t[col].combine_chunks())
            return t.append_column("_part", pa.array(key_partition(
                u.to_numpy(zero_copy_only=False), P)))
        return fn

    e1 = hash_exchange(
        [edges.select_columns([f"{id_col}_a", f"{id_col}_b"]).map_batches(
            _endpoint_part(f"{id_col}_a"), batch_format="pyarrow"), lab],
        _rewrite(f"{id_col}_a", f"{id_col}_b", "node_a", "url_b",
                 ("node_a", "url_b")),
        num_partitions=P,
        schema=pa.schema([("node_a", pa.string()), ("url_b", pa.string())]),
        in_schemas=[pa.schema([(f"{id_col}_a", pa.string()),
                               (f"{id_col}_b", pa.string())]), _LAB_IN],
    )
    sup_edges = hash_exchange(
        [e1.map_batches(_endpoint_part("url_b"), batch_format="pyarrow"),
         lab],
        _rewrite("url_b", "node_a", "node_b", "node_a",
                 ("node_a", "node_b")),
        num_partitions=P,
        schema=_EDGE_IN, in_schemas=[
            pa.schema([("node_a", pa.string()), ("url_b", pa.string())]),
            _LAB_IN],
    )

    # supernode universe: one node per old cluster + one per new page
    # (per-batch dedup cuts the label fan-in from corpus-sized to
    # cluster-count-sized; largestar's groupby-min absorbs the rest)
    old_nodes = old_labels.map_batches(
        lambda t: pa.table({"node": pc.binary_join_element_wise(
            pa.scalar("i|"),
            pc.unique(t["cluster_id"].combine_chunks().cast(pa.string())),
            "")}),
        batch_format="pyarrow",
    )
    new_nodes = new_ds.select_columns([id_col]).map_batches(
        lambda t: pa.table({"node": pc.binary_join_element_wise(
            pa.scalar("n|"),
            t[id_col].combine_chunks().cast(pa.string()), "")}),
        batch_format="pyarrow",
    )
    nodes = old_nodes.union(new_nodes).map_batches(
        lambda t: t, batch_format="pyarrow")

    comp = largestar_components(
        nodes, sup_edges, node_col="node", a="node_a", b="node_b",
        num_partitions=P,
    ).map_batches(
        lambda t: pa.table({
            "node": t["url"].combine_chunks(),
            "rep": t["cluster_id"].combine_chunks(),
            "_part": pa.array(key_partition(
                t["cluster_id"].combine_chunks()
                .to_numpy(zero_copy_only=False), P)),
        }),
        batch_format="pyarrow",
    )

    # component label = min UNTAGGED member (min-of-mins = union minimum)
    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"node": pd.Series([], dtype=object),
                                 "cluster_id": pd.Series([], dtype=object)})
        u = df["node"].str[2:]
        m = u.groupby(df["rep"], sort=False).transform("min")
        return pd.DataFrame({"node": df["node"], "cluster_id": m})

    node_clusters = hash_exchange(
        [comp], relabel, num_partitions=P,
        schema=pa.schema([("node", pa.string()), ("cluster_id", pa.string())]),
        in_schemas=[_NC_IN],
    )

    def _new_rows(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(pc.utf8_slice_codeunits(t["node"], 0, 1),
                              "n"))
        return pa.table({
            "side": pa.array(["new"] * f.num_rows, pa.string()),
            "url": _untag(f["node"].combine_chunks()),
            "cluster_id": f["cluster_id"].combine_chunks(),
        })

    new_out = node_clusters.map_batches(_new_rows, batch_format="pyarrow")

    # index pages: url → old label → its supernode's new cluster id
    i_clusters = node_clusters.map_batches(
        lambda t: (lambda f: pa.table({
            "lab": _untag(f["node"].combine_chunks()),
            "cluster_id": f["cluster_id"].combine_chunks(),
            "_part": pa.array(key_partition(
                _untag(f["node"].combine_chunks())
                .to_numpy(zero_copy_only=False), P)),
        }))(t.filter(pc.equal(
            pc.utf8_slice_codeunits(t["node"], 0, 1), "i"))),
        batch_format="pyarrow",
    )
    lab_by_lab = old_labels.map_batches(
        lambda t: pa.table({
            "url": t["url"].combine_chunks().cast(pa.string()),
            "lab": t["cluster_id"].combine_chunks().cast(pa.string()),
            "_part": pa.array(key_partition(
                t["cluster_id"].combine_chunks()
                .to_numpy(zero_copy_only=False), P)),
        }),
        batch_format="pyarrow",
    )

    def fan_out(ic: pd.DataFrame, lg: pd.DataFrame) -> pd.DataFrame:
        if not len(lg):
            return pd.DataFrame({"side": pd.Series([], dtype=object),
                                 "url": pd.Series([], dtype=object),
                                 "cluster_id": pd.Series([], dtype=object)})
        m = lg.merge(ic.drop_duplicates("lab"), on="lab", how="left")
        cid = m["cluster_id"].where(m["cluster_id"].notna(), m["lab"])
        return pd.DataFrame({"side": "index", "url": m["url"],
                             "cluster_id": cid})

    index_out = hash_exchange(
        [i_clusters, lab_by_lab], fan_out, num_partitions=P,
        schema=_OUT, in_schemas=[
            pa.schema([("lab", pa.string()), ("cluster_id", pa.string())]),
            _LAB_IN],
    )
    return index_out.union(new_out).map_batches(
        lambda t: t, batch_format="pyarrow")


def tag_captures(ds: ray.data.Dataset, prefix: str, *,
                 id_col: str = "url", text_col: str = "text"
                 ) -> ray.data.Dataset:
    """``(url, text)`` with ``url`` → ``<prefix>url`` — globally unique
    capture ids for a crawl sequence where the same url recurs every
    snapshot.  Prefixes are opaque to the incremental fold (its internal
    ``i|``/``n|`` tags wrap them)."""
    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.binary_join_element_wise(
                pa.scalar(prefix),
                t[id_col].combine_chunks().cast(pa.string()), ""),
            text_col: t[text_col].combine_chunks().cast(pa.string()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def rolling_incremental_clusters(
    crawls: list[tuple[str, ray.data.Dataset]],
    store_root: str,
    *,
    threshold: float = 0.7,
    num_partitions: int = 32,
    **lsh_kwargs,
) -> ray.data.Dataset:
    """The OPERATIONAL loop a recurring crawl runs: cluster crawl 0 flat,
    then fold each later crawl into the standing assignment — each fold
    sees earlier crawls only through their persisted shingle stores
    (text tokenized exactly once, in the crawl that captured it) and the
    label table the previous fold produced.

    ``crawls`` is ``[(name, dataset), ...]``; every capture gets the
    globally unique id ``<name>|<url>``.  Each crawl's shingles persist
    under ``<store_root>/crawl=<name>`` (append-only: a new crawl never
    rewrites an old crawl's store).  Returns ``(crawl, url, cluster_id)``
    for every capture of every crawl; ``cluster_id`` is the minimum
    member capture id — byte-identical to clustering the tagged union of
    all crawls flat, by induction on the supernode identity
    (``incremental_near_dup_clusters`` docstring)."""
    from data_dedup_ray.pipelines.index import build_shingle_store
    from data_dedup_ray.pipelines.near import minhash_dedup_clusters

    id_col = lsh_kwargs.get("id_col", "url")
    text_col = lsh_kwargs.get("text_col", "text")
    shingle_k = lsh_kwargs.get("shingle_k", 5)

    (name0, ds0), rest = crawls[0], crawls[1:]
    tagged0 = tag_captures(ds0, f"{name0}|", id_col=id_col,
                           text_col=text_col)
    store0 = f"{store_root}/crawl={name0}"
    build_shingle_store(tagged0, store0, id_col=id_col, text_col=text_col,
                        shingle_k=shingle_k,
                        num_partitions=num_partitions)
    labels = minhash_dedup_clusters(tagged0, threshold=threshold,
                                    **lsh_kwargs)
    stores = [store0]
    for name, ds in rest:
        tagged = tag_captures(ds, f"{name}|", id_col=id_col,
                              text_col=text_col)
        out = incremental_near_dup_clusters(
            tagged, stores, labels, threshold=threshold,
            num_partitions=num_partitions, **lsh_kwargs)
        labels = out.select_columns([id_col, "cluster_id"]).materialize()
        store = f"{store_root}/crawl={name}"
        build_shingle_store(tagged, store, id_col=id_col,
                            text_col=text_col, shingle_k=shingle_k,
                            num_partitions=num_partitions)
        stores.append(store)

    out_schema = pa.schema([("crawl", pa.string()),
                            (id_col, pa.string()),
                            ("cluster_id", pa.string())])

    def split_tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        # capture id = '<crawl>|<url>'; urls never contain '|'
        parts = pc.split_pattern(t[id_col].combine_chunks(), "|",
                                 max_splits=1)
        return pa.table({
            "crawl": pc.list_element(parts, 0),
            id_col: pc.list_element(parts, 1),
            "cluster_id": t["cluster_id"].combine_chunks(),
        })

    return labels.map_batches(split_tag, batch_format="pyarrow")


def rolling_incremental_clusters_sql(threshold: float = 0.7) -> str:
    """Full DuckDB statement: flat closure over the tagged 3-crawl union
    (web_pages = s1, snapshot2 = s2, snapshot3 = s3); cluster_id = min
    member capture id — exactly what the rolling fold must reproduce."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import (SNAPSHOT2_CTE,
                                                    SNAPSHOT3_CTE)

    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},
{SNAPSHOT2_CTE},
{SNAPSHOT3_CTE},
rall AS (
  SELECT 's1|' || url AS id, text FROM web_pages
  UNION ALL SELECT 's2|' || url, text FROM snapshot2
  UNION ALL SELECT 's3|' || url, text FROM snapshot3),
rtoks AS (SELECT id, regexp_extract_all(text, '[a-z0-9]+') AS t FROM rall),
rsh AS (SELECT DISTINCT id, array_to_string(t[i:i+4], ' ') AS s
        FROM rtoks, UNNEST(generate_series(1, len(t) - 4)) AS g(i)
        WHERE len(t) >= 5),
rcnt AS (SELECT id, count(*) AS n FROM rsh GROUP BY id),
rinter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
           FROM rsh a JOIN rsh b ON a.s = b.s AND a.id < b.id
           GROUP BY 1, 2),
rjac AS (SELECT id_a, id_b,
                rinter.i * 1.0 / (ca.n + cb.n - rinter.i) AS j
         FROM rinter JOIN rcnt ca ON ca.id = id_a
                     JOIN rcnt cb ON cb.id = id_b),
rdup AS (SELECT id_a, id_b FROM rjac WHERE j >= {threshold}),
redges AS (SELECT id_a AS a, id_b AS b FROM rdup
           UNION SELECT id_b, id_a FROM rdup),
rreach(a, b) AS (SELECT a, b FROM redges
                 UNION SELECT r.a, e.b FROM rreach r
                       JOIN redges e ON r.b = e.a),
rcomp AS (SELECT a AS id, least(a, min(b)) AS cl
          FROM rreach GROUP BY a)
SELECT substr(l.id, 1, 2) AS crawl, substr(l.id, 4) AS url,
       coalesce(c.cl, l.id) AS cluster_id
FROM rall l LEFT JOIN rcomp c ON c.id = l.id"""


def incremental_near_dup_clusters_oracle(threshold: float = 0.7) -> str:
    """The full DuckDB statement: WITH RECURSIVE + both corpus CTEs +
    the flat-union closure body below."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.snapshots import SNAPSHOT2_CTE

    return (f"WITH RECURSIVE {WEB_PAGES_CTE},\n{SNAPSHOT2_CTE},"
            f"{incremental_near_dup_clusters_sql(threshold)}")


def incremental_near_dup_clusters_sql(threshold: float = 0.7) -> str:
    """The flat truth the incremental pipeline must equal: near-dup
    clusters over the tagged UNION corpus (web_pages = index side,
    snapshot2 = new side), labels = min untagged member url.  Wrap with
    ``snapshots.snapshots_sql`` (provides both corpus CTEs); the WITH
    RECURSIVE prefix is part of that wrapper's contract, so this body
    extends its CTE list."""
    return f"""
allpages AS (
  SELECT 'i|' || url AS url, text FROM web_pages
  UNION ALL SELECT 'n|' || url AS url, text FROM snapshot2),
utoks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t
          FROM allpages),
ush AS (SELECT DISTINCT url, array_to_string(t[i:i+4], ' ') AS s
        FROM utoks, UNNEST(generate_series(1, len(t) - 4)) AS g(i)
        WHERE len(t) >= 5),
ucnt AS (SELECT url, count(*) AS n FROM ush GROUP BY url),
uinter AS (SELECT a.url AS url_a, b.url AS url_b, count(*) AS i
           FROM ush a JOIN ush b ON a.s = b.s AND a.url < b.url
           GROUP BY 1, 2),
ujac AS (SELECT url_a, url_b,
                uinter.i * 1.0 / (ca.n + cb.n - uinter.i) AS j
         FROM uinter JOIN ucnt ca ON ca.url = url_a
                     JOIN ucnt cb ON cb.url = url_b),
udup AS (SELECT url_a, url_b FROM ujac WHERE j >= {threshold}),
uedges AS (SELECT url_a AS a, url_b AS b FROM udup
           UNION SELECT url_b, url_a FROM udup),
ureach(a, b) AS (SELECT a, b FROM uedges
                 UNION SELECT r.a, e.b FROM ureach r
                       JOIN uedges e ON r.b = e.a),
ucomp AS (SELECT a AS url, least(a, min(b)) AS tag_cluster
          FROM ureach GROUP BY a),
ulabels AS (SELECT p.url, coalesce(c.tag_cluster, p.url) AS tag_cluster
            FROM allpages p LEFT JOIN ucomp c USING (url)),
urel AS (SELECT tag_cluster, min(substr(url, 3)) AS m
         FROM ulabels GROUP BY 1)
SELECT CASE substr(l.url, 1, 1) WHEN 'i' THEN 'index' ELSE 'new' END
         AS side,
       substr(l.url, 3) AS url, r.m AS cluster_id
FROM ulabels l JOIN urel r ON r.tag_cluster = l.tag_cluster"""
