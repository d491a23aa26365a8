"""Per-stage Parquet checkpoints with lineage metadata — SURVEY.md §7 M6.

north_rule mandate: "resumable from checkpoint with per-partition lineage +
metrics".  The reference has no persistence at all (SURVEY.md §4 — the
whole trie lives in process memory); this module adds the ops layer a
100 TB streaming job needs:

- Each pipeline stage writes its output Dataset to its own directory
  ``<root>/<stage>-<config_hash>/`` as partitioned Parquet (one file per
  block — never one giant file), then a ``_META.json`` lineage record
  (stage name, config hash, parent stages, per-partition-file row counts,
  user counters) and finally a ``_SUCCESS`` marker.  The marker is written
  LAST, so a crash mid-write leaves a directory that will be rebuilt, never
  a half-read one.
- ``config_hash`` covers the stage's full configuration (digest chain,
  thresholds, shingle params…), so changing any parameter automatically
  invalidates only the stages it affects; a resumed run with identical
  config is byte-identical to a fresh one (idempotent stage outputs).
- Resume = construct the same ``Checkpointer`` and call ``run`` again:
  completed stages short-circuit to ``read_parquet`` of their directory
  and their build function is never invoked.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from collections.abc import Callable
from typing import Any

import pyarrow.parquet as pq
import ray.data


def config_hash(config: dict) -> str:
    """12-hex-char digest of the canonical-JSON stage configuration."""
    blob = json.dumps(config, sort_keys=True, separators=(",", ":"),
                      default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


class Checkpointer:
    """Stage-output store rooted at ``root`` for one pipeline config."""

    def __init__(self, root: str, config: dict | None = None):
        self.root = root
        self.config = config or {}
        self.hash = config_hash(self.config)
        os.makedirs(root, exist_ok=True)

    # ---------------------------------------------------------------- paths
    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}-{self.hash}")

    def _success(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), "_SUCCESS")

    def _meta(self, stage: str) -> str:
        return os.path.join(self.stage_dir(stage), "_META.json")

    # ---------------------------------------------------------------- state
    def has(self, stage: str) -> bool:
        return os.path.exists(self._success(stage))

    def meta(self, stage: str) -> dict[str, Any]:
        with open(self._meta(stage)) as f:
            return json.load(f)

    def invalidate(self, stage: str) -> None:
        d = self.stage_dir(stage)
        if os.path.isdir(d):
            shutil.rmtree(d)

    # ------------------------------------------------------------------ run
    def run(
        self,
        stage: str,
        build: Callable[[], ray.data.Dataset],
        *,
        parents: list[str] | None = None,
        counters: dict[str, Any] | Callable[[ray.data.Dataset], dict] | None = None,
    ) -> ray.data.Dataset:
        """Return the stage's Dataset, building + persisting it if needed.

        ``build`` is only called when no ``_SUCCESS`` marker exists; its
        result streams straight to partitioned Parquet.  The returned
        Dataset always reads from the checkpoint directory, so downstream
        stages re-execute nothing upstream of a completed checkpoint.

        ``counters`` may be a callable: it runs on the just-checkpointed
        Dataset (reading back the Parquet, so the metric pass never
        re-executes the pipeline) and its dict lands in ``_META.json`` —
        the per-stage hash/signature counter record."""
        d = self.stage_dir(stage)
        if not self.has(stage):
            self.invalidate(stage)  # drop any half-written attempt
            os.makedirs(d, exist_ok=True)
            ds = build()
            ds.write_parquet(d)
            if callable(counters):
                counters = counters(ray.data.read_parquet(d))
            files = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
            lineage = {
                "stage": stage,
                "config_hash": self.hash,
                "config": self.config,
                "parents": parents or [],
                "partitions": {
                    f: pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
                    for f in files
                },
                "counters": (counters if isinstance(counters, dict)
                             else {}),
            }
            with open(self._meta(stage), "w") as f:
                json.dump(lineage, f, indent=1, sort_keys=True, default=str)
            with open(self._success(stage), "w") as f:
                f.write(self.hash)
        return ray.data.read_parquet(self.stage_dir(stage))
