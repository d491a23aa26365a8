"""Alternating large-star/small-star connected components.

The third components strategy beside ``components.dsu_components`` (driver
union-find, edge list must fit) and ``components.label_propagation``
(rounds = component DIAMETER — fine for star/clique-shaped near-dup
components, slow on chain-shaped ones).  Large-star/small-star (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
MapReduce and Beyond", SoCC'14) converges in O(log² n) rounds REGARDLESS
of diameter and keeps per-round state edge-shaped, so it is the designated
path for huge edge sets whose components may be long chains (e.g. the
containment/substring graphs, where A⊂B⊂C⊂… chains are natural).

Round = two ``hash_exchange`` passes over string node ids (no global sort,
no driver state):

- **large-star** (keyed on every node u over the symmetrized edge set):
  ``m = min(Γ(u) ∪ {u})``; emit ``(v, m)`` for each neighbor ``v > u``.
- **small-star** (keyed on the child side of the now parent-pointing
  edges): ``m = min(Γ⁻(u) ∪ {u})``; emit ``(v, m)`` for each parent
  ``v ≠ m`` plus ``(u, m)``.

Both maps only ever REPLACE an edge with a path through the group's
minimum, so connectivity is exactly preserved; at the fixed point the edge
set is a star forest centered at each component's minimum member — the
same ``cluster_id = min member`` contract as the other two strategies
(pinned against DSU in tests/test_cc.py).  Convergence is detected with an
order-independent 64-bit edge-set signature (count + wraparound sum of
per-edge hashes), one tiny aggregate per round; every edge table is
deduped inside its owning partition (small-star's key places each
``(child, parent)`` in exactly one partition, so per-partition
``drop_duplicates`` is global dedup).

Partitioning assumption: a round's working set per partition is the edges
incident on ``1/P`` of the nodes — balanced unless one node's degree is a
large fraction of all edges; near-dup edge sets are already
star-capped/skew-split upstream (pipelines/near.py), which bounds degree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_SYM_IN = pa.schema([("src", pa.string()), ("dst", pa.string())])
_EDGE_IN = pa.schema([("child", pa.string()), ("parent", pa.string())])
_EDGE_OUT = pa.schema([("child", pa.string()), ("parent", pa.string()),
                       ("_part", pa.int64())])
_PLAIN_OUT = pa.schema([("child", pa.string()), ("parent", pa.string())])
_LAB_IN = pa.schema([("node", pa.string()), ("label", pa.string())])
_LAB_OUT = pa.schema([("url", pa.string()), ("cluster_id", pa.string())])


def _normalize(edges: ray.data.Dataset, a: str, b: str) -> ray.data.Dataset:
    """Arbitrary undirected pairs → ``(child=max, parent=min)`` rows,
    self-loops dropped (vectorized; input is edge-shaped, not corpus)."""

    def fn(t: pa.Table) -> pa.Table:
        ea = t[a].to_pandas().to_numpy(dtype=object)
        eb = t[b].to_pandas().to_numpy(dtype=object)
        keep = ea != eb
        ea, eb = ea[keep], eb[keep]
        child = np.maximum(ea, eb)
        parent = np.minimum(ea, eb)
        return pa.table({"child": pa.array(child, pa.string()),
                         "parent": pa.array(parent, pa.string())})

    return edges.map_batches(fn, batch_format="pyarrow")


def _symmetrize(P: int):
    def fn(t: pa.Table) -> pa.Table:
        c = t["child"].combine_chunks()
        p = t["parent"].combine_chunks()
        src = pa.concat_arrays([c, p])
        dst = pa.concat_arrays([p, c])
        part = key_partition(src.to_numpy(zero_copy_only=False), P)
        return pa.table({"src": src, "dst": dst, "_part": pa.array(part)})

    return fn


def _lstar(P: int):
    """Per-partition large-star: all edges incident on this partition's
    ``src`` nodes arrive together (symmetric emission + src key)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"child": pd.Series([], dtype=object),
                                 "parent": pd.Series([], dtype=object),
                                 "_part": pd.Series([], dtype=np.int64)})
        g = df.groupby("src", sort=False)["dst"].min()
        m = pd.Series(
            np.minimum(g.to_numpy(dtype=object), g.index.to_numpy(dtype=object)),
            index=g.index, name="m",
        )
        mg = df.merge(m, left_on="src", right_index=True)
        out = (mg.loc[mg["dst"] > mg["src"], ["dst", "m"]]
               .drop_duplicates())
        out.columns = ["child", "parent"]
        out["_part"] = key_partition(out["child"].to_numpy(dtype=object), P)
        return out

    return fn


def _sstar(df: pd.DataFrame) -> pd.DataFrame:
    """Per-partition small-star over parent-pointing edges
    (``child > parent`` invariant; the child key makes per-partition
    dedup global)."""
    if not len(df):
        return pd.DataFrame({"child": pd.Series([], dtype=object),
                             "parent": pd.Series([], dtype=object)})
    df = df.drop_duplicates()
    g = df.groupby("child", sort=False)["parent"].min().rename("m")
    mg = df.merge(g, left_on="child", right_index=True)
    e1 = mg.loc[mg["parent"] != mg["m"], ["parent", "m"]]
    e1.columns = ["child", "parent"]
    e2 = pd.DataFrame({"child": g.index.to_numpy(dtype=object),
                       "parent": g.to_numpy(dtype=object)})
    return (pd.concat([e1, e2], ignore_index=True)
            .drop_duplicates())


def _edge_signature(edges: ray.data.Dataset) -> tuple[int, int]:
    """Order-independent set signature: (count, wraparound sum of combined
    per-edge 64-bit hashes).  Internal convergence check only — never in
    oracle-checked output."""

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        hc = pd.util.hash_array(t["child"].to_pandas().to_numpy(dtype=object))
        hp = pd.util.hash_array(t["parent"].to_pandas().to_numpy(dtype=object))
        with np.errstate(over="ignore"):
            h = hc * np.uint64(0x9E3779B97F4A7C15) + hp
            s = np.uint64(h.sum())
        return pa.table({"h": pa.array([np.int64(s.astype(np.int64))]),
                         "n": pa.array([np.int64(t.num_rows)])})

    # fold the per-batch partials on the driver (one row per batch) with
    # explicit mod-2^64 masking: Ray's sum() combines int64 partials as
    # unbounded Python ints, and a >2^63 total fails Arrow conversion
    rows = edges.map_batches(fn, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    h = 0
    for r in rows:
        h = (h + int(r["h"])) & 0xFFFFFFFFFFFFFFFF
    return (int(n), h)


def largestar_components(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    *,
    node_col: str = "url",
    a: str = "url_a",
    b: str = "url_b",
    max_rounds: int = 32,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """``(url, cluster_id)`` rows for every node: cluster_id = the
    lexicographic min member of the node's connected component.

    Same output contract as ``components.label_propagation``; rounds scale
    with log²(n), not component diameter."""
    P = num_partitions
    cur = _normalize(edges, a, b).materialize()
    prev_sig = None
    if cur.count():
        for _ in range(max_rounds):
            sym = cur.map_batches(_symmetrize(P), batch_format="pyarrow")
            half = hash_exchange(
                [sym], _lstar(P), num_partitions=P,
                schema=_EDGE_OUT, in_schemas=[_SYM_IN],
            )
            cur = hash_exchange(
                [half], _sstar, num_partitions=P,
                schema=_PLAIN_OUT, in_schemas=[_EDGE_IN],
            ).materialize()
            sig = _edge_signature(cur)
            if sig == prev_sig:
                break
            prev_sig = sig

    # one exchange keyed on node: star edges say child→root, roots and
    # singletons default to themselves; groupby-min absorbs duplicates
    def as_labels(t: pa.Table) -> pa.Table:
        node = t["child"].combine_chunks()
        return pa.table({
            "node": node, "label": t["parent"].combine_chunks(),
            "_part": pa.array(key_partition(
                node.to_numpy(zero_copy_only=False), P)),
        })

    def self_labels(t: pa.Table) -> pa.Table:
        node = t[node_col].combine_chunks().cast(pa.string())
        return pa.table({
            "node": node, "label": node,
            "_part": pa.array(key_partition(
                node.to_numpy(zero_copy_only=False), P)),
        })

    star_lab = cur.map_batches(as_labels, batch_format="pyarrow")
    self_lab = nodes.select_columns([node_col]).map_batches(
        self_labels, batch_format="pyarrow")

    def min_label(stars: pd.DataFrame, selfs: pd.DataFrame) -> pd.DataFrame:
        df = pd.concat([stars, selfs], ignore_index=True)
        if not len(df):
            return pd.DataFrame({"url": pd.Series([], dtype=object),
                                 "cluster_id": pd.Series([], dtype=object)})
        g = df.groupby("node", sort=False)["label"].min()
        return pd.DataFrame({"url": g.index.to_numpy(dtype=object),
                             "cluster_id": g.to_numpy(dtype=object)})

    return hash_exchange(
        [star_lab, self_lab], min_label, num_partitions=P,
        schema=_LAB_OUT, in_schemas=[_LAB_IN, _LAB_IN],
    )
