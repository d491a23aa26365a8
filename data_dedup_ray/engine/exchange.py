"""Sortless coarse hash exchange — a raw-Ray custom operator.

``Dataset.groupby(part).map_groups(fn)`` implements co-location via a
sample-SORT shuffle: every row is ordered by the key before grouping.  The
near-dup pipelines only need BUCKETING — all rows with ``_part == p`` in
one place, in any order — so the sort is pure overhead (measured: it
dominated the candidate/verify stages at 32 cpus).  Ray Data has no
sortless keyed repartition, so per SURVEY.md §7 (custom-operator option c)
this is one of the few places the engine drops to raw Ray tasks:

- one ``_split_block`` task per GROUP of input blocks → ``P`` bucket
  tables (``num_returns=P``; a single stable argsort + slice per group).
  Grouping matters: per-block splitting creates ``blocks × P`` tiny
  objects, and at small block sizes the fixed per-object/per-arg cost
  dominates wall time (measured 10-14 s of pure overhead vs 25 ms of
  compute per partition on a 1.3M-row exchange).  Groups are sized to
  ``≈ cluster-CPU`` count for split parallelism but capped by BYTES
  (``_TARGET_GROUP_BYTES``) so a group's concat stays bounded when
  blocks are full-size (128 MB+) — at scale a group degenerates to a
  single block and the scheme is identical to per-block splitting;
- one ``_apply_part`` task per bucket → concat its tables, run the user
  fn, return an Arrow table;
- results re-enter Ray Data via ``from_arrow_refs`` — nothing is
  collected on the driver, and the object store moves each row exactly
  once (vs twice + sort for the groupby path).

Multi-input exchange (the verify join) co-partitions several datasets in
the same round, replacing the union + tag-column trick a Dataset-only
implementation needs.

Fault tolerance: plain task retries + object lineage, same as map_batches
(no actors, no shared state).  Skew: ``_part`` is a hash of the group key
modulo P, so buckets are balanced unless one GROUP is huge — group-level
skew guards (pair caps, salting) live in the per-partition fns.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


#: cap on the bytes one split group concatenates in memory; blocks larger
#: than this run one-per-group, reproducing plain per-block splitting
_TARGET_GROUP_BYTES = 256 << 20



def key_partition(values, P: int) -> np.ndarray:
    """``hash(value) % P`` as int64 — THE partition function every
    exchange keys on (string or integer key arrays; empty-safe).  One
    definition so co-partitioned pipelines can never drift apart."""
    arr = np.asarray(values)
    if arr.dtype.kind not in ("i", "u"):
        arr = np.asarray(values, dtype=object)
    if not len(arr):
        return np.zeros(0, np.int64)
    return (
        pd.util.hash_array(np.ascontiguousarray(arr)) % np.uint64(P)
    ).astype(np.int64)


@ray.remote
def _split_block(col: str, P: int, pre, *tables: pa.Table):
    """One GROUP of input blocks → P bucket tables (order within a bucket
    is the group's concatenated row order — group order is the dataset's
    block order and the argsort is stable, so determinism holds).

    ``pre`` is an optional map-side COMBINER run on the concatenated group
    before bucketing (MapReduce combine): for exchanges whose per-partition
    fn is idempotent over duplicates (pair dedup, distinct), collapsing
    repeats here shrinks the shuffle by the group's duplication factor.
    It must preserve the ``col`` partition column."""
    ts = [t for t in tables if t.num_rows]
    if not ts:
        # empty blocks can arrive with NO columns at all (Ray Data's
        # pandas round-trip drops the schema of empty batches);
        # _apply_part ignores zero-row tables, so the schema is moot
        e = tables[0].slice(0, 0)
        return e if P == 1 else tuple(e for _ in range(P))
    t = ts[0] if len(ts) == 1 else pa.concat_tables(
        ts, promote_options="default"
    )
    if pre is not None:
        pa.set_cpu_count(1)  # same oversubscription guard as _apply_part
        t = pre(t)
        if t.num_rows == 0:
            e = t.slice(0, 0)
            return e if P == 1 else tuple(e for _ in range(P))
    part = np.asarray(t[col].to_numpy(zero_copy_only=False), dtype=np.int64)
    t = t.drop_columns([col])
    order = np.argsort(part, kind="stable")
    counts = np.bincount(part, minlength=P)
    sorted_t = t.take(pa.array(order))
    offs = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    if P == 1:
        return sorted_t  # num_returns=1: the value IS the single return
    return tuple(
        sorted_t.slice(offs[p], offs[p + 1] - offs[p]) for p in range(P)
    )


def _split_groups(refs: list) -> list[list]:
    """Partition a block-ref list into split-task groups.

    Group count targets the cluster CPU count (split parallelism); group
    bytes are capped at ``_TARGET_GROUP_BYTES`` using object-store sizes
    (``get_object_locations`` — metadata only, nothing is fetched), so a
    group never concatenates more than a bounded working set no matter
    how small or large the blocks are."""
    try:
        cpus = max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:  # pragma: no cover - resources unavailable
        cpus = 8
    n = len(refs)
    per_group = max(1, -(-n // cpus))
    if per_group == 1:
        return [[r] for r in refs]
    try:
        locs = ray.experimental.get_object_locations(refs, timeout_ms=2000)
        sizes = [
            (locs.get(r) or {}).get("object_size") or 0 for r in refs
        ]
    except Exception:  # pragma: no cover - location API unavailable
        sizes = [0] * n
    groups: list[list] = []
    cur: list = []
    cur_bytes = 0
    for r, s in zip(refs, sizes):
        if cur and (
            len(cur) >= per_group or cur_bytes + s > _TARGET_GROUP_BYTES
        ):
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(r)
        cur_bytes += s
    if cur:
        groups.append(cur)
    return groups


@ray.remote
def _apply_part(fn: Callable, schema: pa.Schema, sizes: tuple[int, ...],
                in_schemas: tuple, arrow: bool, *tables: pa.Table) -> pa.Table:
    """Concat each input dataset's bucket tables, apply ``fn`` once.

    ``arrow=True`` hands ``fn`` pyarrow Tables and expects one back —
    for fns built on Acero joins/group_bys this avoids the
    arrow→pandas→arrow round trip, whose per-value PyObject allocation
    (especially for binary columns) anti-scales under concurrency."""
    # one Acero thread per task: with N concurrent exchange tasks each
    # spawning a cpu_count-sized arrow thread pool, joins/group_bys
    # oversubscribe the node N× and anti-scale (measured 2× slowdown
    # at 32 cpus); parallelism comes from the tasks, not from Acero
    pa.set_cpu_count(1)
    ins = []
    i = 0
    for n, in_schema in zip(sizes, in_schemas):
        group = [t for t in tables[i: i + n] if t.num_rows]
        if group:
            t = pa.concat_tables(group, promote_options="default")
        else:
            t = in_schema.empty_table()
        ins.append(t if arrow else t.to_pandas())
        i += n
    out = fn(*ins)
    res = out if arrow else pa.Table.from_pandas(out, preserve_index=False)
    if res.num_rows == 0 or res.schema != schema:
        res = res.cast(schema) if res.num_rows else schema.empty_table()
    return res


def _ensure_tuple(refs, P: int):
    """``num_returns=1`` hands back a bare ObjectRef, not a 1-tuple —
    normalize so ``blocks[p]`` indexing works for every P."""
    return (refs,) if P == 1 else refs


class Bucketed:
    """A dataset already split into ``P`` hash buckets — the reusable form
    of an exchange input.

    Produced by ``bucketize``; pass it to ``hash_exchange`` in place of a
    Dataset to skip the split step.  Lets several exchange rounds keyed on
    the SAME hash share one split of a large table (e.g. the shingle table
    is read by both verify-join rounds), halving its object-store traffic.
    The instance holds the bucket refs alive; keep it in scope until the
    last exchange that uses it has run."""

    def __init__(self, splits: list, base_schema: pa.Schema, P: int):
        self.splits = splits  # list over split groups of P-tuples of refs
        self.base_schema = base_schema
        self.P = P


def bucketize(
    ds: ray.data.Dataset,
    *,
    part_col: str = "_part",
    num_partitions: int = 64,
    in_schema: pa.Schema | None = None,
    pre=None,
) -> Bucketed:
    """Split ``ds`` on ``part_col`` into ``num_partitions`` hash buckets
    without applying a partition fn — the reusable half of an exchange."""
    P = num_partitions
    refs = ds.to_arrow_refs()
    if in_schema is not None:
        base = in_schema
    else:
        base = ds.schema().base_schema
        if not isinstance(base, pa.Schema):
            raise TypeError(
                "bucketize needs in_schema for pandas-backed input "
                f"(got {type(base).__name__})"
            )
    if part_col in base.names:
        base = base.remove(base.get_field_index(part_col))
    if not refs:
        refs = [ray.put(base.empty_table())]
    splits = [
        _ensure_tuple(
            _split_block.options(num_returns=P).remote(part_col, P, pre, *g),
            P)
        for g in _split_groups(refs)
    ]
    return Bucketed(splits, base, P)


def hash_exchange(
    datasets: list,
    fn: Callable[..., pd.DataFrame],
    *,
    part_col: str = "_part",
    num_partitions: int = 64,
    schema: pa.Schema,
    in_schemas: list[pa.Schema] | None = None,
    apply_format: str = "pandas",
    pre: list | None = None,
) -> ray.data.Dataset:
    """Co-partition ``datasets`` on ``part_col`` (int in [0, P)) WITHOUT
    sorting, then run ``fn(df_0, …, df_k)`` once per partition.

    ``fn`` receives one pandas DataFrame per input dataset (that
    partition's rows, ``part_col`` removed) and returns a DataFrame with
    ``schema``'s columns; empty results are cast to ``schema`` so the
    output Dataset's schema is stable.

    ``pre``: optional per-input map-side combiners (``pre[k]`` is an
    Arrow-table fn or None), run on each split group before bucketing —
    only valid when ``fn`` is idempotent over the collapse (dedup /
    distinct / partial aggregation).
    """
    P = num_partitions
    splits = []  # per input dataset: list over blocks of P-tuples of refs
    sizes = []
    resolved: list[pa.Schema] = []
    for k, ds in enumerate(datasets):
        if isinstance(ds, Bucketed):  # pre-split input: reuse its buckets
            if ds.P != P:
                raise ValueError(
                    f"Bucketed input #{k} has P={ds.P}, exchange needs {P}"
                )
            resolved.append(ds.base_schema)
            sizes.append(len(ds.splits))
            splits.append(ds.splits)
            continue
        refs = ds.to_arrow_refs()
        # the logical input schema, part col removed — the empty fallback
        # for buckets/datasets with no rows (empty blocks may carry NO
        # schema at all after Ray's pandas round-trip); callers pass
        # ``in_schemas`` when blocks are pandas-backed (no arrow schema)
        if in_schemas is not None:
            base = in_schemas[k]
        else:
            base = ds.schema().base_schema
            if not isinstance(base, pa.Schema):
                raise TypeError(
                    "hash_exchange needs in_schemas for pandas-backed "
                    f"input #{k} (got {type(base).__name__})"
                )
        if part_col in base.names:
            base = base.remove(base.get_field_index(part_col))
        resolved.append(base)
        if not refs:  # empty dataset: keep one typed empty block
            refs = [ray.put(base.empty_table())]
        groups = _split_groups(refs)
        sizes.append(len(groups))
        pre_k = pre[k] if pre else None
        splits.append([
            _ensure_tuple(
                _split_block.options(num_returns=P).remote(
                    part_col, P, pre_k, *g),
                P)
            for g in groups
        ])
    out = []
    for p in range(P):
        args = []
        for dsi in range(len(datasets)):
            args.extend(blocks[p] for blocks in splits[dsi])
        out.append(
            _apply_part.remote(fn, schema, tuple(sizes), tuple(resolved),
                               apply_format == "pyarrow", *args)
        )
    # Hold the local refs (``refs``/``splits``) until every _apply_part has
    # finished resolving its dependencies: small bucket tables are INLINED
    # asynchronously after ``.remote()``, and letting the driver release
    # its local references concurrently races ray-core's borrowed-ref
    # accounting (observed crash: ``Check failed:
    # it->second.submitted_task_ref_count > 0`` in
    # ReferenceCounter::RemoveSubmittedTaskReferences).  The exchange is an
    # all-to-all barrier anyway — to_arrow_refs() above already ran the
    # upstream pipeline — so waiting here costs no pipelining that the
    # shuffle hadn't already given up.
    ray.wait(out, num_returns=len(out), fetch_local=False)
    return ray.data.from_arrow_refs(out)
