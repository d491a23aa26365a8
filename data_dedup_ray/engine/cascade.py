"""The lazy digest cascade — reference Engine semantics, Ray-Data-first.

The reference routes objects one at a time down a digest-key trie, computing
digest k for an object iff ≥2 objects share its level-(k-1) key prefix
(/root/reference/lib/Data/Dedup/Engine.pm:368-407 — the push-down in
``_block_to_keystore``, Engine.pm:351-364).  This module reproduces those
semantics *level-wise* over a streaming ``ray.data.Dataset``:

Pass 1 (planning, slim):
    one ``map_batches`` computes every *eager* (cheap) digest plus a running
    64-bit prefix hash per level, and emits per-batch partial counts
    ``(level, pfx, cnt)``; a small ``groupby(level, pfx).sum`` yields the
    per-level collision sets, which are broadcast with ``ray.put``.  Only
    fixed-width hash columns are shuffled — never content.

Pass 2 (assignment):
    an actor-pool ``map_batches`` recomputes eager digests, closes every row
    at the first level where its prefix is collision-free
    (``n_keys = level+1``, its own block — Engine.pm:397-404), and computes
    the *expensive* digests ONLY for surviving candidate rows (the lazy
    cascade's entire point, Theory.pod:55-67).  Candidates then shuffle once,
    keyed on the eager digest tuple, and a local per-group trie over the
    expensive digests closes the remaining blocks exactly as the reference
    trie would (singleton at level j → ``n_keys = j+1``; agreement through
    all levels → one duplicate block, Engine.pm:391-395).

Observable-semantics note: eager digests are computed for every row even
where the reference would have short-circuited — they are vectorized
in-memory column ops here, cheaper than the bookkeeping to avoid them — but
the *reported* counters (``count_keys_computed`` / ``count_collisions``) and
all block structure (membership, key-prefix lengths) follow the reference
definitions exactly (Engine.pm:500-578).

Scale notes: the broadcast collision sets are bounded by the number of
*distinct colliding prefixes* (≪ corpus size at realistic dup rates); at
extreme scale swap the frozenset for a Bloom filter (false positives only
cost extra expensive-digest computations, never correctness, because the
final grouping keys on actual digest values).  The candidate shuffle moves
only id + digest columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from data_dedup_ray.util import autoscale_pool
from ray.data.aggregate import Sum

from data_dedup_ray.engine.stage import DigestStage

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _hash64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic 64-bit hash of a digest column (uint64)."""
    if pa.types.is_integer(arr.type):
        vals = arr.to_numpy(zero_copy_only=False)
        return pd.util.hash_array(np.ascontiguousarray(vals, dtype=np.int64))
    return pd.util.hash_array(np.asarray(arr.to_pylist(), dtype=object))


def _mix(parent: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Running prefix-hash combine (boost hash_combine shape)."""
    with np.errstate(over="ignore"):
        return parent ^ (
            h + _GOLDEN + (parent << np.uint64(6)) + (parent >> np.uint64(2))
        )


def _pfx_chain(batch: pa.Table, stages: list[DigestStage]) -> tuple[list[pa.Array], np.ndarray]:
    """Compute eager digest columns + per-level running prefix hashes."""
    digests, pfx = [], []
    parent = np.zeros(batch.num_rows, dtype=np.uint64)
    for st in stages:
        d = st.compute(batch)
        digests.append(d)
        parent = _mix(parent, _hash64(d))
        pfx.append(parent.copy())
    return digests, np.asarray(pfx)


class _PartialCounts:
    """Pass 1: per-batch partial (level, pfx, cnt) rows — a combiner, so the
    planning shuffle moves one row per distinct prefix per batch."""

    def __init__(self, stages: list[DigestStage]):
        self.stages = stages

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, pfx = _pfx_chain(batch, self.stages)
        levels, keys, cnts = [], [], []
        for k in range(len(self.stages)):
            u, c = np.unique(pfx[k], return_counts=True)
            levels.append(np.full(len(u), k, dtype=np.int32))
            keys.append(u.view(np.int64))
            cnts.append(c.astype(np.int64))
        # sentinel row (level=-1) carries the batch's row count so the
        # aggregation can report N without another corpus pass
        levels.append(np.full(1, -1, dtype=np.int32))
        keys.append(np.zeros(1, dtype=np.int64))
        cnts.append(np.full(1, batch.num_rows, dtype=np.int64))
        lv = np.concatenate(levels)
        pf = np.concatenate(keys)
        return pa.table(
            {
                "level": lv,
                "pfx": pf,
                "cnt": np.concatenate(cnts),
                "_part": (pf.view(np.uint64) % np.uint64(64)).astype(np.int64),
            }
        )


def _colliding_sets(ds: ray.data.Dataset, stages: list[DigestStage],
                    eager: list[DigestStage]) -> tuple[list[np.ndarray], int]:
    """Aggregate pass-1 counts → (per-level sorted colliding-pfx arrays, N).

    The merge is the sortless exchange keyed on ``pfx % P``; each bucket
    sums its partial counts and keeps ONLY colliding prefixes (cnt > 1) —
    the driver never sees the unique-content majority (at 10^12 docs the
    full distinct-prefix table would itself be corpus-sized)."""
    from data_dedup_ray.engine.exchange import hash_exchange

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["level", "pfx"], sort=False, as_index=False)[
            "cnt"
        ].sum()
        return agg[(agg["cnt"] > 1) | (agg["level"] == -1)]

    counts = hash_exchange(
        [ds.map_batches(_PartialCounts(eager), batch_format="pyarrow")],
        merge,
        num_partitions=64,
        schema=pa.schema([("level", pa.int32()), ("pfx", pa.int64()),
                          ("cnt", pa.int64())]),
    ).to_pandas()
    n_rows = int(counts.loc[counts["level"] == -1, "cnt"].sum())
    colliding = []
    for k in range(len(eager)):
        lv = counts[(counts["level"] == k) & (counts["cnt"] > 1)]
        colliding.append(np.sort(lv["pfx"].to_numpy(dtype=np.int64)))
    return colliding, n_rows


#: Bloom sizing for ``colliding_filter="bloom"`` (module-level so tests
#: can force a lossy filter and assert block identity survives)
_BLOOM_BITS_PER_KEY = 16
_BLOOM_N_HASHES = 4


def _bloom_remix(x: np.ndarray, seed: np.uint64) -> np.ndarray:
    """splitmix64-style remix — k independent index streams from one
    value without materializing k hash columns."""
    with np.errstate(over="ignore"):
        z = x + seed * _GOLDEN
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bloom_build(arr: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Sorted colliding-prefix array → (bit array, m, n_hashes).  m is
    floored at 64 so an empty level still round-trips.  n_hashes rides in
    the broadcast tuple so build (driver) and probe (workers) can never
    disagree on the filter's parameters."""
    m = max(64, len(arr) * _BLOOM_BITS_PER_KEY)
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    u = arr.view(np.uint64)
    for i in range(_BLOOM_N_HASHES):
        idx = _bloom_remix(u, np.uint64(i + 1)) % np.uint64(m)
        np.bitwise_or.at(
            bits, (idx >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))
    return bits, m, _BLOOM_N_HASHES


def _bloom_contains(bits: np.ndarray, m: int, vals: np.ndarray,
                    n_hashes: int) -> np.ndarray:
    out = np.ones(len(vals), dtype=bool)
    u = vals.view(np.uint64)
    for i in range(n_hashes):
        idx = _bloom_remix(u, np.uint64(i + 1)) % np.uint64(m)
        out &= (
            bits[(idx >> np.uint64(3)).astype(np.int64)]
            & (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        ) != 0
    return out


class _Assign:
    """Pass 2 actor: close unique rows, compute expensive digests for
    candidates only.  Collision sets broadcast once per actor via ray.put.

    ``colliding`` entries are either sorted int64 prefix arrays (exact
    membership) or ``("bloom", bits, m)`` triples.  The lossy mode closes
    rows map-side ONLY at level 0 (a Bloom miss is definite — no false
    negatives — and level 0 has no earlier level whose hit could have
    been a false positive); every later row goes through the candidate
    trie, which recomputes ``n_keys`` from REAL digest values, so block
    structure and key counts are bit-identical to exact mode and the
    filter costs only extra expensive-digest work + shuffle rows (the
    documented extreme-scale trade, module docstring)."""

    def __init__(self, stages, eager_n, id_col, colliding_ref):
        self.stages: list[DigestStage] = stages
        self.eager_n = eager_n
        self.id_col = id_col
        self.colliding: list = ray.get(colliding_ref)
        self.lossy = any(
            isinstance(c, tuple) and c and c[0] == "bloom"
            for c in self.colliding
        )

    def _hit(self, k: int, vals: np.ndarray) -> np.ndarray:
        c = self.colliding[k]
        if isinstance(c, tuple) and c and c[0] == "bloom":
            return _bloom_contains(c[1], c[2], vals, c[3])
        return np.isin(vals, c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        eager = self.stages[: self.eager_n]
        lazy = self.stages[self.eager_n:]
        digests, pfx = _pfx_chain(batch, eager)

        alive = np.ones(n, dtype=bool)
        n_keys = np.zeros(n, dtype=np.int64)
        # lossy filters may only close at level 0 (see class docstring)
        close_levels = 1 if self.lossy else self.eager_n
        for k in range(close_levels):
            hit = self._hit(k, pfx[k].view(np.int64))
            closed = alive & ~hit
            n_keys[closed] = k + 1
            alive &= hit
        n_keys[alive] = -1  # candidates: filled after the shuffle

        cols = {self.id_col: batch[self.id_col]}
        for st, d in zip(eager, digests):
            cols[st.column] = d
        if lazy and alive.any():
            idx = np.flatnonzero(alive)
            sub = batch.take(pa.array(idx))
            for st in lazy:
                vals = st.compute(sub).to_pylist()
                out = np.full(n, None, dtype=object)
                out[idx] = vals
                cols[st.column] = pa.array(out, type=st.dtype)
        else:
            for st in lazy:
                cols[st.column] = pa.nulls(n, type=st.dtype)
        cols["n_keys"] = pa.array(n_keys)
        cols["is_candidate"] = pa.array(alive)
        return pa.table(cols)


def _close_candidates(stages, eager_n, id_col):
    """Partition-local trie over ALL digest levels — the reference's
    subtree semantics (Engine.pm:368-407), applied to one exchange bucket
    holding many eager-prefix groups (equal prefixes co-locate, so the
    level-0 grouping separates them exactly as the global trie would)."""
    all_cols = [st.column for st in stages]
    n_levels = len(stages)

    def close(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        n_keys = np.empty(len(df), dtype=np.int64)
        cluster = np.empty(len(df), dtype=object)
        members = np.empty(len(df), dtype=np.int64)
        ids = df[id_col].to_numpy(dtype=object)

        def rec(idx: np.ndarray, level: int) -> None:
            if level == n_levels:
                n_keys[idx] = n_levels
                cluster[idx] = ids[idx].min()
                members[idx] = len(idx)
                return
            col = df[all_cols[level]].to_numpy(dtype=object)[idx]
            order = {}
            for i, v in zip(idx, col):
                order.setdefault(v, []).append(i)
            for sub in order.values():
                sub = np.asarray(sub)
                if len(sub) == 1:
                    # NOTE: a candidate singleton at an eager level can only
                    # happen for cross-prefix hash aliasing inside a bucket;
                    # closing it at level+1 matches the trie either way
                    n_keys[sub] = level + 1
                    cluster[sub] = ids[sub][0]
                    members[sub] = 1
                else:
                    rec(sub, level + 1)

        rec(np.arange(len(df)), 0)
        out = df.drop(columns=["n_keys", "is_candidate"])
        out["n_keys"] = n_keys
        out["cluster_id"] = np.asarray([str(c) for c in cluster], dtype=object)
        out["n_members"] = members
        return out

    return close


def _mask(expr):
    return lambda t: t.filter(expr(t))


#: ``colliding_filter="auto"`` switches to Bloom broadcast once the total
#: colliding-prefix count crosses this (5M int64 prefixes = 40 MB of exact
#: broadcast state per worker vs ~10 MB of Bloom bits; below it the exact
#: arrays are cheap and candidate sets stay minimal).  Module-level so
#: tests can force the switch on a tiny corpus.
_AUTO_BLOOM_THRESHOLD = 5_000_000


def dedup_cascade(
    ds: ray.data.Dataset,
    stages: list[DigestStage],
    *,
    id_col: str = "url",
    concurrency: int | tuple | None = None,
    colliding_filter: str = "auto",
) -> ray.data.Dataset:
    """Run the lazy digest cascade; returns one row per input row with
    ``[id_col, k_<stage>..., n_keys, cluster_id, n_members]``.

    Two rows are duplicates iff they share one ``cluster_id`` with
    ``n_members > 1`` — i.e. they agreed on every digest in the chain
    (Engine.pm:391-395).  ``n_keys`` is the block's key-prefix length
    (Engine.pm:243-252).

    ``colliding_filter``: ``"exact"`` broadcasts the sorted colliding
    prefix arrays; ``"bloom"`` broadcasts ~16-bit-per-key Bloom filters
    instead — at extreme scale the colliding-prefix set itself can be
    large, and a Bloom false positive only costs extra expensive-digest
    work on a unique row (it closes with identical ``n_keys`` in the
    candidate trie), never block structure.  ``"auto"`` (the default)
    measures the colliding set and picks: exact below
    ``_AUTO_BLOOM_THRESHOLD`` total prefixes, bloom above — so small
    corpora keep minimal candidate sets and a 10^12-row duplicate-heavy
    corpus never ships a corpus-sized broadcast.
    """
    if colliding_filter not in ("exact", "bloom", "auto"):
        raise ValueError(
            f"colliding_filter must be 'exact', 'bloom' or 'auto', "
            f"got {colliding_filter!r}")
    if not stages:
        return _degenerate_block(ds, id_col)

    # The lazy split: everything before the first expensive stage is eager.
    # Level 0 is always computed for every object (Engine.pm:426-430), so the
    # eager prefix is never empty.
    eager_n = max(
        1, next((i for i, s in enumerate(stages) if s.expensive), len(stages))
    )
    eager = stages[:eager_n]

    colliding, n_rows = _colliding_sets(ds, stages, eager)
    if n_rows == 1:
        # Reference corner case: a lone object's block never gets keys
        # (Engine.t "one object in a block"; Engine.pm:397-404).
        out = ds.select_columns([id_col]).map_batches(
            lambda t: _with_const(t, stages, id_col), batch_format="pyarrow"
        )
        return out
    if colliding_filter == "auto":
        total = sum(len(arr) for arr in colliding)
        colliding_filter = ("bloom" if total > _AUTO_BLOOM_THRESHOLD
                            else "exact")
    if colliding_filter == "bloom":
        colliding = [("bloom", *_bloom_build(arr)) for arr in colliding]
    ref = ray.put(colliding)

    from data_dedup_ray.util import stage_task

    # task pool + per-worker cached stage (util.stage_task): the state is
    # one ray.get of the broadcast collision sets — actor spawn latency
    # was the dominant cost of this stage
    assigned = ds.map_batches(
        stage_task(
            _Assign, stages=stages, eager_n=eager_n, id_col=id_col,
            colliding_ref=ref,
        ),
        batch_format="pyarrow",
    )

    out_cols = [id_col] + [st.column for st in stages] + [
        "n_keys", "cluster_id", "n_members",
    ]

    uniques = assigned.map_batches(
        _mask(lambda t: pc.invert(t["is_candidate"])), batch_format="pyarrow"
    ).map_batches(_finalize_unique(id_col), batch_format="pyarrow").select_columns(out_cols)

    candidates = assigned.map_batches(
        _mask(lambda t: t["is_candidate"]), batch_format="pyarrow"
    )
    from data_dedup_ray.engine.exchange import hash_exchange

    # exact mode: candidates collide at EVERY eager level, so the full
    # eager prefix co-locates each row with all its trie mates (best key
    # distribution).  bloom mode: candidates may be unique at a later
    # eager level (only level 0 closes map-side), so the shuffle must key
    # on the level-0 digest alone — complete level-0 groups co-locate and
    # the bucket trie reproduces the global trie's n_keys exactly
    key_stages = eager if colliding_filter == "exact" else eager[:1]

    def add_part(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for st in key_stages:
            h = _mix(h, _hash64(t[st.column]))
        return t.append_column(
            "_part", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    cand_schema = pa.schema(
        [(id_col, pa.string())]
        + [(st.column, st.dtype) for st in stages]
        + [("n_keys", pa.int64()), ("is_candidate", pa.bool_())]
    )
    out_schema = pa.schema(
        [(id_col, pa.string())]
        + [(st.column, st.dtype) for st in stages]
        + [("n_keys", pa.int64()), ("cluster_id", pa.string()),
           ("n_members", pa.int64())]
    )
    closed = hash_exchange(
        [candidates.map_batches(add_part, batch_format="pyarrow")],
        _close_candidates(stages, eager_n, id_col),
        num_partitions=64,
        schema=out_schema,
        in_schemas=[cand_schema],
    ).select_columns(out_cols)

    return uniques.union(closed)


def _finalize_unique(id_col):
    def fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["is_candidate"])
        t = t.append_column("cluster_id", pc.cast(t[id_col], pa.string()))
        return t.append_column("n_members", pa.array(np.ones(t.num_rows, dtype=np.int64)))
    return fn


def _with_const(t: pa.Table, stages, id_col) -> pa.Table:
    cols = {id_col: t[id_col]}
    for st in stages:
        cols[st.column] = pa.nulls(t.num_rows, type=st.dtype)
    cols["n_keys"] = pa.array(np.zeros(t.num_rows, dtype=np.int64))
    cols["cluster_id"] = pc.cast(t[id_col], pa.string())
    cols["n_members"] = pa.array(np.ones(t.num_rows, dtype=np.int64))
    return pa.table(cols)


def _degenerate_block(ds: ray.data.Dataset, id_col: str) -> ray.data.Dataset:
    """Empty blocking config ⇒ every object is one duplicate block
    (Engine.pm:138-139; Engine.t:65-84).

    Needs only two scalars from the corpus — the min id (= cluster_id)
    and the row count — so it runs as two streaming aggregates plus a
    constant-attach map; the id column is never collected."""
    ids = ds.select_columns([id_col]).materialize()
    n = ids.count()
    cid = str(ids.min(id_col))

    def tag(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            "n_keys": pa.array(np.zeros(t.num_rows, np.int64)),
            "cluster_id": pa.array([cid] * t.num_rows, pa.string()),
            "n_members": pa.array(np.full(t.num_rows, n, np.int64)),
        })

    return ids.map_batches(tag, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Counters — reference definitions, computed over the cascade result.
# --------------------------------------------------------------------------


def _result_frame(result) -> pd.DataFrame:
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    return result


def count_keys_computed(result, stages: list[DigestStage]) -> list[int]:
    """Per-level digest evaluation counts (Engine.pm:569-578): level k was
    computed for every object in a block whose key prefix is longer than k,
    i.e. ``#rows with n_keys > k``.  Trailing never-reached levels are
    omitted, as in the reference."""
    df = _result_frame(result)
    depth = int(df["n_keys"].max())
    return [int((df["n_keys"] > k).sum()) for k in range(depth)]


def count_collisions(result, stages: list[DigestStage]) -> list[int]:
    """Per-level collision counts (Engine.pm:500-532): at level k, every
    key-prefix shared by ≥2 objects that did NOT end as a single block
    contributes (#blocks under it − 1)."""
    df = _result_frame(result)
    depth = int(df["n_keys"].max())
    cols = [st.column for st in stages]
    out = []
    for k in range(depth):
        reach = df[df["n_keys"] > k]
        g = reach.groupby(cols[: k + 1], dropna=False, sort=False)
        sizes = g.size()
        nblocks = g["cluster_id"].nunique()
        out.append(int((nblocks[sizes > 1] - 1).sum()))
    return out
