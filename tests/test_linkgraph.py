"""Link-graph analytics: anchor round-trip, host rollups, top-k ties,
and the exact-integer PageRank vs both a driver-side reference
implementation and the DuckDB CTE twin."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.pipelines import linkgraph as lg

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{SF}/documents.parquet'")
    return con


def _cmp(ds, sql):
    a = ds.to_pandas()
    con = _con()
    b = con.sql(sql).df()
    con.close()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = b[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    return a


def test_link_edges_round_trip_matches_arithmetic_oracle():
    edges = _cmp(lg.link_edges(SF), lg.link_edges_sql())
    # 3 anchors per base page, 500 docs at sf0.001
    assert len(edges) == 1500
    # every host is one of the 20 site shards on both sides
    hosts = set(edges.src_host) | set(edges.dst_host)
    assert hosts <= {f"site{i}.example" for i in range(20)}


def test_extract_edges_parses_hrefs_not_arithmetic():
    # feed a hand-built page: the regex must find exactly these anchors
    t = pa.table({
        "url": ["https://x.example/p/1"],
        "html": [(b'<html><a href="https://a.example/p/2">x</a>'
                  b'<p>noise</p><a href="https://b.example/q/3">y</a>')],
    })
    out = lg._extract_edges(t).to_pandas()
    assert list(out.dst_url) == ["https://a.example/p/2",
                                 "https://b.example/q/3"]
    assert list(out.dst_host) == ["a.example", "b.example"]


def test_host_graph_matches_sql():
    g = _cmp(lg.host_graph(lg.link_edges(SF)), lg.host_graph_sql())
    assert (g.n_links >= g.n_src_pages).all()
    assert g.n_links.sum() == 1500


def test_host_degree_matches_sql():
    d = _cmp(lg.host_degree(lg.link_edges(SF)), lg.host_degree_sql())
    # conservation: total out == total in == edge count
    assert d.out_links.sum() == 1500 and d.in_links.sum() == 1500


def test_top_linked_pages_matches_sql_with_deterministic_ties():
    _cmp(lg.top_linked_pages(lg.link_edges(SF)),
         lg.top_linked_pages_sql())


def _reference_pagerank(edges: pd.DataFrame, iters: int) -> dict:
    """Driver-side pure-Python restatement of the integer recurrence."""
    pairs = (edges.groupby(["src_host", "dst_host"])
             .size().rename("nl").reset_index())
    ow = pairs.groupby("src_host")["nl"].sum().to_dict()
    hosts = sorted(set(pairs.src_host) | set(pairs.dst_host))
    w = {h: lg.PAGERANK_W0 for h in hosts}
    for _ in range(iters):
        nxt = {h: lg.PAGERANK_TELEPORT for h in hosts}
        for r in pairs.itertuples():
            c = (w[r.src_host] * 85 // 100) // ow[r.src_host]
            nxt[r.dst_host] += c * r.nl
        w = nxt
    return w


def test_pagerank_matches_reference_and_sql():
    got = _cmp(lg.pagerank_hosts(lg.link_edges(SF)),
               lg.pagerank_hosts_sql())
    edges = lg.link_edges(SF).to_pandas()
    ref = _reference_pagerank(edges, 3)
    assert dict(zip(got.host, got.pagerank)) == ref
    # mass sanity: every host at least the teleport constant
    assert (got.pagerank >= lg.PAGERANK_TELEPORT).all()


def test_pagerank_micro_graph_exact_values():
    # a -> b (x2), b -> a: verify one iteration by hand
    edges = ray.data.from_arrow(pa.table({
        "src_url": ["u1", "u1", "u2"],
        "dst_url": ["v1", "v2", "v3"],
        "src_host": ["a", "a", "b"],
        "dst_host": ["b", "b", "a"],
    }))
    got = lg.pagerank_hosts(edges, iters=1, num_partitions=2
                            ).to_pandas().set_index("host")["pagerank"]
    w0, tp = lg.PAGERANK_W0, lg.PAGERANK_TELEPORT
    share_a = (w0 * 85 // 100) // 2   # a has 2 outlinks
    share_b = (w0 * 85 // 100) // 1
    assert got["b"] == tp + share_a * 2
    assert got["a"] == tp + share_b


def test_linked_pages_empty_documents_table(tmp_path):
    import pyarrow.parquet as pq
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}),
        str(tmp_path / "documents.parquet"))
    assert lg.link_edges(str(tmp_path)).count() == 0


def test_link_fingerprint_groups_matches_sql_and_groups_families():
    got = _cmp(lg.link_fingerprint_groups(SF),
               lg.link_fingerprint_groups_sql())
    lab = dict(zip(got.url, got.link_cluster_id))
    # all family variants of doc 0 (base/mirror/alias/empty/near/quote
    # at sf0.001 doc_id 0 hits every modulus) share one link cluster
    fams = [u for u in lab if u.endswith("/p/0")]
    assert len(fams) == 6
    assert len({lab[u] for u in fams}) == 1
    # two different docs never share a link cluster (targets injective
    # in doc_id for these moduli at this n)
    assert lab["https://site1.example/p/1"] != lab[fams[0]]


def test_linked_web_pages_preserves_text_and_adds_anchors():
    row = lg.linked_web_pages(SF).take(1)[0]
    html = row["html"]
    assert html.count(b"<a href=") == 3
    assert row["text"].encode("utf-8") in html


def test_frontier_scores_matches_sql():
    got = _cmp(lg.frontier_scores(SF), lg.frontier_scores_sql())
    # link-graph hosts only (the 20 site shards), each with a priority
    # no greater than its raw pagerank
    assert len(got) == 20
    assert (got.priority <= got.pagerank).all()


def test_host_reciprocity_matches_sql():
    got = _cmp(lg.host_reciprocity(lg.link_edges(SF)),
               lg.host_reciprocity_sql())
    assert (got.host_a < got.host_b).all()
    assert got.reciprocity_bp.between(0, 10000).all()
    # directed counts conserve the cross-host edge total
    edges = lg.link_edges(SF).to_pandas()
    cross = int((edges.src_host != edges.dst_host).sum())
    assert int((got.n_ab + got.n_ba).sum()) == cross


def test_host_reciprocity_micro():
    edges = ray.data.from_arrow(pa.table({
        "src_host": ["a", "a", "b", "c"],
        "dst_host": ["b", "b", "a", "a"],
        "src_url": ["u"] * 4, "dst_url": ["v"] * 4,
    }))
    got = (lg.host_reciprocity(edges, num_partitions=2).to_pandas()
           .set_index(["host_a", "host_b"]))
    ab = got.loc[("a", "b")]
    assert (ab.n_ab, ab.n_ba) == (2, 1)
    assert ab.reciprocity_bp == 2 * 1 * 10000 // 3
    ac = got.loc[("a", "c")]
    assert (ac.n_ab, ac.n_ba, ac.reciprocity_bp) == (0, 1, 0)


def test_page_link_features_matches_sql():
    got = _cmp(lg.page_link_features(SF), lg.page_link_features_sql())
    assert (got.n_links == 3).all()
    assert got.n_target_hosts.between(1, 3).all()
    # the distinct-host count genuinely varies across pages
    assert got.n_target_hosts.nunique() >= 2


def test_pagerank_pages_matches_sql_and_mass():
    got = _cmp(lg.pagerank_pages(lg.link_edges(SF)),
               lg.pagerank_pages_sql())
    assert len(got) == 500  # one node per base page at sf0.001
    assert (got.pagerank >= lg.PAGERANK_TELEPORT).all()
    # slot-3 hub pages (gcd structure) must out-rank the minimum
    assert got.pagerank.max() > got.pagerank.min()


def test_anchor_text_agg_matches_sql():
    got = _cmp(lg.anchor_text_agg(SF), lg.anchor_text_agg_sql())
    # inlinks conserve the edge total (3 per base page)
    assert int(got.n_inlinks.sum()) == 1500
    # distinct-anchor counts are non-degenerate and bounded by the slots
    assert got.n_anchors.between(1, 3).all()
    assert got.n_anchors.max() > 1
    # anchor strings follow the arithmetic derivation
    assert got.top_anchor.str.fullmatch(r"t\d+s[012]").all()


def test_anchor_parse_reads_bytes_not_arithmetic():
    t = pa.table({
        "url": ["https://x.example/p/1"],
        "html": [(b'<html><a href="https://a.example/p/2">hello</a>'
                  b'<p>n</p><a href="https://a.example/p/2">world</a>'
                  b'<a href="https://b.example/p/3">hello</a></html>')],
    })
    pairs = lg._ANCHOR.findall(t["html"][0].as_py())
    assert [(u.decode(), a.decode()) for u, a in pairs] == [
        ("https://a.example/p/2", "hello"),
        ("https://a.example/p/2", "world"),
        ("https://b.example/p/3", "hello"),
    ]


def test_anchor_top_tie_breaks_lexicographically():
    # two anchors with equal counts for one target: min string wins
    df = pd.DataFrame({
        "url": ["u", "u", "u", "u"],
        "anchor": ["zz", "aa", "zz", "aa"],
        "n": [1, 1, 1, 1],
    })
    c = (df.groupby(["url", "anchor"], sort=False)["n"].sum()
         .reset_index()
         .sort_values(["url", "n", "anchor"], ascending=[True, False, True]))
    top = c.groupby("url", sort=False)["anchor"].first()
    assert top["u"] == "aa"


def test_hits_hosts_matches_sql():
    got = _cmp(lg.hits_hosts(lg.link_edges(SF)), lg.hits_hosts_sql())
    assert len(got) == 20
    # both signals non-degenerate on the corpus graph
    assert got.hub.nunique() > 1 and got.authority.nunique() > 1


def test_hits_hosts_micro_hand_computed():
    edges = ray.data.from_arrow(pa.table({
        "src_host": ["a", "a", "b"],
        "dst_host": ["b", "c", "c"],
    }))
    got = (lg.hits_hosts(edges, iters=1, num_partitions=3)
           .to_pandas().set_index("host"))
    H0 = lg.HITS_H0
    # a1: a<-0, b<-h(a)=H0, c<-h(a)+h(b)=2*H0
    assert got.loc["a", "authority"] == 0
    assert got.loc["b", "authority"] == H0
    assert got.loc["c", "authority"] == 2 * H0
    # h1 = floor(sum of dst authorities / SCALE)
    assert got.loc["a", "hub"] == (H0 + 2 * H0) // lg.HITS_SCALE
    assert got.loc["b", "hub"] == (2 * H0) // lg.HITS_SCALE
    assert got.loc["c", "hub"] == 0


def test_hits_hosts_partition_invariance():
    e = lg.link_edges(SF)
    a = lg.hits_hosts(e, num_partitions=3).to_pandas().sort_values(
        "host").reset_index(drop=True)
    b = lg.hits_hosts(e, num_partitions=11).to_pandas().sort_values(
        "host").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
