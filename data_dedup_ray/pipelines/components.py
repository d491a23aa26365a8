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



class DSU:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        # iterative two-pass (chase, then compress): a pathological union
        # order can build chains past Python's recursion limit long before
        # the edge-count guard trips
        p = self.parent
        if x not in p:
            p[x] = x
            return x
        r = x
        while p[r] != r:
            r = p[r]
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes the root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def map_roots_int64(values: np.ndarray, mapping: dict) -> np.ndarray:
    """Map int64 ``values`` through ``mapping`` with identity fallback,
    entirely in the integer domain.

    pandas' ``map(...).fillna(values)`` round-trips misses through
    float64, which corrupts |v| > 2^53 (values near ±2^63 even overflow
    to INT64_MIN on the cast back) — distinct simhash fingerprints can
    then collapse to one root and merge unrelated clusters."""
    return np.fromiter(
        (mapping.get(int(v), int(v)) for v in values), np.int64, len(values)
    )


def dsu_components(edges: pd.DataFrame, a: str = "url_a", b: str = "url_b",
                   max_edges: int = 20_000_000) -> dict:
    """node → min-member cluster id, driver-side union-find."""
    if not len(edges):
        # an empty Dataset round-trips to a column-less DataFrame, so
        # bail before touching edges[a]: every node is its own cluster
        return {}
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
        # vectorized dict map with identity fallback (string domain — no
        # float round-trip hazard), not a per-row Python loop
        ids = batch[id_col].to_pandas()
        vals = ids.map(m)
        vals = vals.where(vals.notna(), ids)
        return batch.append_column(
            out_col, pa.array(vals.to_numpy(), type=pa.string()))

    return ds.map_batches(attach, batch_format="pyarrow")


def label_propagation(nodes: ray.data.Dataset, edges: ray.data.Dataset, *,
                      node_col: str = "url", a: str = "url_a", b: str = "url_b",
                      max_rounds: int = 16,
                      num_partitions: int = 32) -> ray.data.Dataset:
    """Distributed min-label propagation: ``(url, cluster_id)`` rows.

    Each round: every node sends its current label along every incident
    edge; labels = min(own, incoming); stop when a round changes nothing.
    This is the designated BIG-GRAPH fallback (edge lists past the driver
    DSU guard), so a round is two vectorized ``hash_exchange`` passes and
    nothing else — no per-group Python, no driver collection:

    1. propagate (keyed on src): per partition, one pandas merge of the
       edge bucket against the label bucket → candidate ``(dst, cand)``
       rows, pre-combined map-side to one min per dst before the shuffle;
    2. min-merge (keyed on node): per partition, groupby-min of the
       candidates + merge with the old labels; the per-row ``chg`` flag
       is folded into the same pass and summed as the convergence check
       (one cheap aggregate over the already-shuffled result).

    The symmetric edge table is bucketized ONCE and its buckets are
    reused every round (``engine/exchange.Bucketed``); only the
    label/candidate streams move per round.  Rounds = O(component
    diameter); near-dup components are star/clique-like, so 2-4 rounds.
    """
    from data_dedup_ray.engine.exchange import (
        Bucketed, bucketize, hash_exchange, key_partition)

    P = num_partitions

    def _with_part(col: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_part", pa.array(key_partition(
                    t[col].to_numpy(zero_copy_only=False), P)))
        return fn

    sym = edges.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t[a].combine_chunks().cast(pa.string()),
                     t[b].combine_chunks().cast(pa.string())]
                ),
                "dst": pa.concat_arrays(
                    [t[b].combine_chunks().cast(pa.string()),
                     t[a].combine_chunks().cast(pa.string())]
                ),
            }
        ),
        batch_format="pyarrow",
    ).map_batches(_with_part("src"), batch_format="pyarrow")
    sym_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    sym_b = bucketize(sym, num_partitions=P, in_schema=pa.schema(
        [("src", pa.string()), ("dst", pa.string()),
         ("_part", pa.int64())]))

    labels = nodes.select_columns([node_col]).map_batches(
        lambda t: pa.table({"node": t[node_col].combine_chunks(),
                            "label": t[node_col].combine_chunks()}),
        batch_format="pyarrow",
    ).map_batches(_with_part("node"), batch_format="pyarrow")
    lab_schema = pa.schema([("node", pa.string()), ("label", pa.string()),
                            ("_part", pa.int64())])
    lab_in = pa.schema([("node", pa.string()), ("label", pa.string())])

    def propagate(lab: pd.DataFrame, ed: pd.DataFrame) -> pd.DataFrame:
        # labels and edges share this partition by construction (both
        # keyed on the src node id): one vectorized merge, then one
        # groupby-min per dst — the partition's contribution collapses
        # to ≤1 candidate row per destination before the shuffle
        m = ed.merge(lab, left_on="src", right_on="node", how="inner")
        cand = (m.groupby("dst", sort=False, as_index=False)["label"]
                .min().rename(columns={"dst": "node", "label": "cand"}))
        cand["_part"] = key_partition(cand["node"].to_numpy(), P)
        return cand

    cand_schema = pa.schema([("node", pa.string()), ("cand", pa.string()),
                             ("_part", pa.int64())])
    cand_in = pa.schema([("node", pa.string()), ("cand", pa.string())])

    def min_merge(cand: pd.DataFrame, lab: pd.DataFrame) -> pd.DataFrame:
        cmin = (cand.groupby("node", sort=False, as_index=False)["cand"]
                .min())
        m = lab.merge(cmin, on="node", how="left")
        new = m["cand"].where(
            m["cand"].notna() & (m["cand"] < m["label"]), m["label"])
        out = pd.DataFrame({"node": m["node"], "label": new})
        out["chg"] = (new != m["label"]).astype(np.int64)
        out["_part"] = key_partition(out["node"].to_numpy(), P)
        return out

    out_schema = pa.schema([("node", pa.string()), ("label", pa.string()),
                            ("chg", pa.int64()), ("_part", pa.int64())])

    for _ in range(max_rounds):
        lab_b = bucketize(labels, num_partitions=P, in_schema=lab_schema)
        cands = hash_exchange(
            [lab_b, sym_b], propagate, num_partitions=P,
            schema=cand_schema, in_schemas=[lab_in, sym_schema],
        )
        merged = hash_exchange(
            [cands, Bucketed(lab_b.splits, lab_b.base_schema, P)],
            min_merge, num_partitions=P,
            schema=out_schema, in_schemas=[cand_in, lab_in],
        )
        changed = merged.sum("chg")
        labels = merged.drop_columns(["chg"])
        if not changed:
            break

    return labels.map_batches(
        lambda t: pa.table({"url": t["node"].combine_chunks(),
                            "cluster_id": t["label"].combine_chunks()}),
        batch_format="pyarrow",
    )
