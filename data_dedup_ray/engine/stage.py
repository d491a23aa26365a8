"""DigestStage protocol + registry — the ``blocking`` config surface.

The reference lets users select an ordered digest chain by name with repeated
``--alg`` flags (/root/reference/lib/Data/Dedup/Files/CLI.pm:89-97,262-264),
where each algorithm is a ``BlockingFunction`` — a callable wrapped with
id/name metadata (/root/reference/lib/Data/Dedup/Files/BlockingFunction.pm:24-37)
produced by a ``BlockingFactory`` (BlockingFactory.pm:24-53).

Here a stage is a named, Arrow-typed, vectorized batch kernel.  ``expensive``
marks stages the cascade evaluates lazily — only for rows still colliding
after every eager stage (the reference's cost model: cheapest/weakest digests
first, Engine.pm:558-566, Theory.pod:55-67).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow as pa

from data_dedup_ray.stages import hashes


@dataclass(frozen=True)
class DigestStage:
    """One level of the blocking cascade.

    ``compute(batch) -> pa.Array`` returns one digest value per row; digests
    are grouping keys, so their Arrow type must be hashable/sortable
    (int64 / string / binary).
    """

    id: str
    compute: Callable[[pa.Table], pa.Array]
    dtype: pa.DataType
    expensive: bool = False

    @property
    def column(self) -> str:
        return f"k_{self.id}"


def _stage(id, fn, dtype, expensive=False):
    return DigestStage(id=id, compute=fn, dtype=dtype, expensive=expensive)


#: Name → stage, mirroring the reference's DigestFactory ids
#: (DigestFactory.pm:41-228).  Reference names kept as aliases.
REGISTRY: dict[str, DigestStage] = {}


def register(stage: DigestStage, *aliases: str) -> DigestStage:
    REGISTRY[stage.id] = stage
    for a in aliases:
        REGISTRY[a] = stage
    return stage


register(_stage("size", hashes.size, pa.int64()), "filesize")
register(_stage("head_sample", hashes.head_sample, pa.binary()), "sample")
register(_stage("tail_sample", hashes.tail_sample, pa.binary()), "end_sample")
register(_stage("mid_sample", hashes.mid_sample, pa.binary()))
register(_stage("head_1k", hashes.head_1k, pa.binary()), "file_head")
register(_stage("tail_1k", hashes.tail_1k, pa.binary()), "file_tail")
register(_stage("fast_prefix_hash", hashes.fast_prefix_hash, pa.int64()),
         "fast_initial_xxhash")
register(_stage("prefix_hash", hashes.prefix_hash, pa.int64()), "initial_xxhash")
register(_stage("suffix_hash", hashes.suffix_hash, pa.int64()), "final_xxhash")
register(_stage("fast_prefix_sha", hashes.fast_prefix_sha, pa.string(),
                expensive=True),
         "fast_initial_sha")
register(_stage("prefix_sha", hashes.prefix_sha, pa.string(), expensive=True),
         "initial_sha")
register(_stage("suffix_sha", hashes.suffix_sha, pa.string(), expensive=True),
         "final_sha")
register(_stage("sha", hashes.sha, pa.string(), expensive=True))

#: The reference's default chain [filesize, initial_xxhash, sha]
#: (DigestFactory.pm:33-39 — authoritative over the doc claim at
#: bin/dedup_files:51, see SURVEY.md §2.2).
DEFAULT_CHAIN = ["size", "prefix_hash", "sha"]


def resolve_chain(names: list[str] | None = None) -> list[DigestStage]:
    """``--alg``-style chain resolution by name (CLI.pm:89-97 analogue)."""
    names = names if names is not None else DEFAULT_CHAIN
    missing = [n for n in names if n not in REGISTRY]
    if missing:
        raise KeyError(f"unknown digest stage(s): {missing}; known: {sorted(set(REGISTRY))}")
    return [REGISTRY[n] for n in names]
