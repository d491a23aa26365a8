"""Per-partition resumable Parquet sink.

The task brief's resumable-output requirement: write partitioned Parquet
(one directory per key range) so a failed run can skip finished
partitions — never one giant file, never a rerun that rewrites work
already on disk.

Layout under ``path``::

    part=<p>/data.parquet   one deterministic file per hash partition
    part=<p>/_SUCCESS       written LAST, after the data file is closed

Crash safety / idempotence: a partition is "done" iff its ``_SUCCESS``
exists.  A crash mid-write leaves a data file without the marker; the
rerun REWRITES that partition (same deterministic filename → replace, no
duplicate rows) and skips every marked one.  Markers and data files are
hidden from downstream readers' perspective correctly: pyarrow/Ray
dataset discovery ignores ``_``-prefixed files, so ``read_parquet(path)``
over the whole tree just works.

Rows are routed by ``hash(key) % num_partitions`` (the engine-wide
``key_partition``), and each partition's rows are written in sorted key
order, so the BYTES of a partition are a pure function of its row set —
re-running a partition after a crash reproduces the identical file.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_STATUS_SCHEMA = pa.schema([
    ("part", pa.int64()), ("n_rows", pa.int64()), ("written", pa.bool_()),
])


def validate_store_config(path, expect: dict) -> None:
    """Assert a persisted store's ``_META.json`` lineage config matches
    the querying pipeline's parameters (ADVICE r3: a mismatched query —
    different n_perm / seed / shingle_k / token-hash — silently produces
    garbage estimates; fail loudly instead).  Only keys PRESENT in the
    stored config are compared, so older stores without a field stay
    readable.  ``path`` may be one store dir or a list (rolling form:
    every member store must match)."""
    import glob
    import json

    paths = path if isinstance(path, (list, tuple)) else [path]
    for p in paths:
        metas = sorted(glob.glob(os.path.join(p, "part=*", "_META.json")))
        if not metas:
            continue
        with open(metas[0]) as f:
            stored = json.load(f).get("config", {})
        bad = {k: (stored.get(k), v) for k, v in expect.items()
               if k in stored and stored[k] != v}
        if bad:
            raise ValueError(
                f"store at {p} was built with a different configuration "
                "than the query: "
                + ", ".join(f"{k}: stored={s!r} query={q!r}"
                            for k, (s, q) in sorted(bad.items())))


def finished_partitions(path: str) -> set[int]:
    """Partitions whose ``_SUCCESS`` marker exists."""
    done = set()
    if not os.path.isdir(path):
        return done
    for d in os.listdir(path):
        if d.startswith("part=") and os.path.exists(
                os.path.join(path, d, "_SUCCESS")):
            done.add(int(d.split("=", 1)[1]))
    return done


def resumable_write_parquet(
    ds: ray.data.Dataset,
    path: str,
    *,
    key_col: str = "url",
    num_partitions: int = 32,
    config: dict | None = None,
) -> pd.DataFrame:
    """Write ``ds`` to ``path`` as ``num_partitions`` hash-partitioned
    parquet directories, skipping partitions already marked ``_SUCCESS``.

    Returns the per-partition status frame ``(part, n_rows, written)``
    (``written=False`` rows are the skipped, already-finished ones —
    their ``n_rows`` is read back from the existing file's metadata).
    Rows belonging to finished partitions are dropped by one vectorized
    filter BEFORE the shuffle, so a resume moves only the missing data.

    Each partition directory also carries a ``_META.json`` lineage record
    (row count, key column, the producing run's ``config`` + its hash —
    the same shape as stage checkpoints' ``state/checkpoint.py`` meta),
    written before the ``_SUCCESS`` marker.
    """
    import hashlib
    import json

    os.makedirs(path, exist_ok=True)
    done = finished_partitions(path)
    P = num_partitions
    cfg = config or {}
    cfg_hash = hashlib.sha256(
        json.dumps(cfg, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]

    def prep(t: pa.Table) -> pa.Table:
        part = key_partition(t[key_col].to_numpy(zero_copy_only=False), P)
        t = t.append_column("_p", pa.array(part)) \
             .append_column("_part", pa.array(part))
        if done:
            keep = ~np.isin(part, list(done))
            t = t.filter(pa.array(keep))
        return t

    ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
    base = ds.schema().base_schema

    def write_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"part": pd.Series(dtype=np.int64),
                                 "n_rows": pd.Series(dtype=np.int64),
                                 "written": pd.Series(dtype=bool)})
        p = int(df["_p"].iloc[0])
        df = df.drop(columns=["_p"])
        # sort on ALL columns (key first): ties on key_col would otherwise
        # land in arrival order, making the bytes depend on the shuffle
        sort_cols = [key_col] + [c for c in df.columns if c != key_col]
        try:
            df = df.sort_values(sort_cols, kind="stable")
        except TypeError:
            # unorderable payload column (lists/arrays): byte determinism
            # then rests on key uniqueness within the partition
            df = df.sort_values(key_col, kind="stable")
        d = os.path.join(path, f"part={p}")
        os.makedirs(d, exist_ok=True)
        dest = os.path.join(d, "data.parquet")
        # temp-file + atomic rename: a crash mid-write must never leave a
        # torn data.parquet that a plain read_parquet (which ignores the
        # _SUCCESS marker) would choke on or silently include
        tmp = os.path.join(d, "_data.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        os.rename(tmp, dest)
        import json as _json
        with open(os.path.join(d, "_META.json"), "w") as f:
            _json.dump({
                "part": p,
                "n_rows": len(df),
                "key_col": key_col,
                "config_hash": cfg_hash,
                "config": cfg,
            }, f, indent=1, sort_keys=True, default=str)
        # marker LAST: a crash before this line leaves the partition
        # unmarked and the rerun rewrites it in place
        with open(os.path.join(d, "_SUCCESS"), "w"):
            pass
        return pd.DataFrame({"part": [p], "n_rows": [len(df)],
                             "written": [True]})

    in_schema = base.append(pa.field("_p", pa.int64()))
    status = hash_exchange(
        [ds.map_batches(prep, batch_format="pyarrow")],
        write_part,
        num_partitions=P,
        schema=_STATUS_SCHEMA,
        in_schemas=[in_schema],
    ).to_pandas()

    skipped = []
    for p in sorted(done):
        f = os.path.join(path, f"part={p}", "data.parquet")
        n = pq.read_metadata(f).num_rows if os.path.exists(f) else 0
        skipped.append({"part": p, "n_rows": n, "written": False})
    if skipped:
        status = pd.concat([status, pd.DataFrame(skipped)],
                           ignore_index=True)
    return status.sort_values("part").reset_index(drop=True)
