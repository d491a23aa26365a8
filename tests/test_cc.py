"""Large-star/small-star connected components vs driver union-find."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from data_dedup_ray.pipelines import cc
from data_dedup_ray.pipelines.components import dsu_components


def _run(nodes, edges, **kw):
    nds = ray.data.from_pandas(pd.DataFrame({"url": list(nodes)}))
    eds = ray.data.from_pandas(
        pd.DataFrame({"url_a": [a for a, _ in edges],
                      "url_b": [b for _, b in edges]})
        if edges else
        pd.DataFrame({"url_a": pd.Series([], dtype=object),
                      "url_b": pd.Series([], dtype=object)})
    )
    out = cc.largestar_components(nds, eds, **kw).to_pandas()
    return dict(zip(out["url"], out["cluster_id"]))


def _expected(nodes, edges):
    if edges:
        asg = dsu_components(pd.DataFrame(
            {"url_a": [a for a, _ in edges],
             "url_b": [b for _, b in edges]}))
    else:
        asg = {}
    return {n: asg.get(n, n) for n in nodes}


def test_empty_edges_all_singletons():
    nodes = [f"n{i:03d}" for i in range(7)]
    assert _run(nodes, []) == {n: n for n in nodes}


def test_chain_star_clique_mix():
    # a long chain (diameter stress: label propagation needs diameter
    # rounds; large-star needs O(log^2)), a star, a clique, singletons
    chain = [(f"c{i:04d}", f"c{i + 1:04d}") for i in range(200)]
    star = [("s000", f"s{i:03d}") for i in range(1, 30)]
    clique_nodes = [f"k{i:02d}" for i in range(8)]
    clique = [(x, y) for x in clique_nodes for y in clique_nodes if x < y]
    edges = chain + star + clique
    nodes = sorted({x for e in edges for x in e} | {"z1", "z2"})
    got = _run(nodes, edges, num_partitions=8)
    assert got == _expected(nodes, edges)
    assert got["c0150"] == "c0000" and got["s007"] == "s000"


@pytest.mark.parametrize("seed,p", [(0, 0.02), (1, 0.08), (2, 0.3)])
def test_random_graphs_match_dsu(seed, p):
    rng = np.random.default_rng(seed)
    n = 120
    nodes = [f"v{i:03d}" for i in range(n)]
    mask = rng.random((n, n)) < p
    edges = [(nodes[i], nodes[j]) for i in range(n) for j in range(i + 1, n)
             if mask[i, j]]
    assert _run(nodes, edges, num_partitions=8) == _expected(nodes, edges)


def test_partition_invariance_and_dup_self_edges():
    edges = [("b", "a"), ("a", "b"), ("b", "c"), ("c", "c"), ("d", "e"),
             ("e", "d"), ("x", "x")]
    nodes = ["a", "b", "c", "d", "e", "x"]
    want = _expected(nodes, edges)
    for P in (1, 3, 16):
        assert _run(nodes, edges, num_partitions=P) == want


def test_e2e_near_dup_edges_match_dsu(sf_dir):
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    ds = web_pages(sf_dir)
    sh = near.shingle_rows(ds, id_col="url", text_col="text", shingle_k=5)
    sh = sh.materialize()
    edges = near.minhash_dedup_pairs(ds, threshold=0.7, sh=sh).materialize()
    got = cc.largestar_components(
        sh.select_columns(["url"]), edges, num_partitions=8
    ).to_pandas()
    asg = dsu_components(edges.to_pandas())
    urls = sh.select_columns(["url"]).to_pandas()["url"]
    want = {u: asg.get(u, u) for u in urls}
    assert dict(zip(got["url"], got["cluster_id"])) == want
    assert len(got) == len(urls)
