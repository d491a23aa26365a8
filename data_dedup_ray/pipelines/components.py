"""Connected components over candidate-pair edges → cluster ids.

Two strategies (SURVEY.md §7 M4):

- ``dsu_components``: driver-side union-find. Edges after near-dup
  verification are a tiny fraction of the corpus (bounded by the true
  duplicate rate), so collecting them is safe far beyond sandbox scale;
  the guard raises if that assumption breaks.
- ``label_propagation``: iterative min-label propagation expressed as Ray
  Data shuffles (``groupby(node).min``), for when the edge set itself is
  too large to collect.  Rounds = O(component diameter); near-dup
  components are star/clique-like, so 2-4 rounds in practice.

Deterministic: cluster_id = lexicographic min member id, independent of
execution order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.util import autoscale_pool
from ray.data.aggregate import Min


class DSU:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.parent[x] = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def dsu_components(edges: pd.DataFrame, a: str = "url_a", b: str = "url_b",
                   max_edges: int = 20_000_000) -> dict:
    """node → min-member cluster id, driver-side union-find."""
    if len(edges) > max_edges:
        raise ValueError(
            f"{len(edges)} edges exceed the driver-side DSU guard; use "
            "label_propagation"
        )
    d = DSU()
    for ea, eb in zip(edges[a], edges[b]):
        d.union(ea, eb)
    # path-compress everything, then map each node to its root; the root is
    # the min member because union always roots at the smaller id... only
    # per-union, so finish with an explicit min pass for determinism.
    roots: dict = {}
    for n in list(d.parent):
        r = d.find(n)
        roots.setdefault(r, []).append(n)
    out = {}
    for r, members in roots.items():
        m = min(min(members), r)
        for n in members:
            out[n] = m
        out[r] = m
    return out


def attach_clusters(ds: ray.data.Dataset, assignment: dict, *,
                    id_col: str = "url", out_col: str = "cluster_id") -> ray.data.Dataset:
    """Broadcast the (small) assignment and map every row to its cluster;
    rows absent from the assignment are their own singleton cluster.

    Plain task map: the state is one zero-copy ``ray.get`` of the
    broadcast dict per task — actor pools only added spawn latency."""
    ref = ray.put(assignment)

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = batch[id_col].to_pylist()
        vals = [m.get(i, i) for i in ids]
        return batch.append_column(out_col, pa.array(vals, type=pa.string()))

    return ds.map_batches(attach, batch_format="pyarrow")


def label_propagation(nodes: ray.data.Dataset, edges: ray.data.Dataset, *,
                      node_col: str = "url", a: str = "url_a", b: str = "url_b",
                      max_rounds: int = 16) -> ray.data.Dataset:
    """Distributed min-label propagation: ``(node, cluster_id)`` rows.

    Each round: every node sends its current label along every incident
    edge; labels = min(own, incoming).  Shuffle key: node id.  Converges
    when a round changes nothing (checked with a small aggregate).
    """
    sym = edges.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t[a].combine_chunks(), t[b].combine_chunks()]
                ),
                "dst": pa.concat_arrays(
                    [t[b].combine_chunks(), t[a].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    labels = nodes.select_columns([node_col]).map_batches(
        lambda t: pa.table({"node": t[node_col], "label": t[node_col]}),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_rounds):
        # join labels onto edges by src: union both streams, group by src —
        # the label row carries lab, the edge rows carry the destinations
        lab_as_src = labels.map_batches(
            lambda t: pa.table({"src": t["node"], "dst": t["node"], "lab": t["label"]}),
            batch_format="pyarrow",
        )
        tagged = sym.map_batches(
            lambda t: pa.table({"src": t["src"], "dst": t["dst"],
                                "lab": pa.nulls(t.num_rows, pa.string())}),
            batch_format="pyarrow",
        ).union(lab_as_src)

        def _fwd(g: pd.DataFrame) -> pd.DataFrame:
            lab = g["lab"].dropna().min()
            dsts = g.loc[g["lab"].isna(), "dst"]
            out = pd.DataFrame({"node": dsts})
            out["cand"] = lab
            self_row = pd.DataFrame({"node": [g["src"].iloc[0]], "cand": [lab]})
            return pd.concat([out, self_row], ignore_index=True)

        cands = tagged.groupby("src").map_groups(_fwd, batch_format="pandas")
        new_labels = cands.groupby("node").aggregate(
            Min(on="cand", alias_name="label")
        ).materialize()
        # convergence: did any label change?
        joined = labels.union(
            new_labels.map_batches(
                lambda t: pa.table({"node": t["node"], "label": t["label"]}),
                batch_format="pyarrow",
            )
        )
        changed = (
            joined.groupby("node")
            .map_groups(
                lambda g: pd.DataFrame({"c": [int(g["label"].nunique() > 1)]}),
                batch_format="pandas",
            )
            .sum("c")
        )
        merged = joined.groupby("node").aggregate(Min(on="label", alias_name="label"))
        labels = merged.materialize()
        if not changed:
            break

    return labels.map_batches(
        lambda t: pa.table({"url": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )
