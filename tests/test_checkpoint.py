"""Checkpoint/resume: idempotent stage outputs, lineage, config isolation."""

import json
import os

import pandas as pd
import pytest
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import exact
from data_dedup_ray.state import Checkpointer

SF = "/root/testdata/sf0.001"


def _result(ds):
    return ds.to_pandas().sort_values("url").reset_index(drop=True)


def test_run_resume_skips_completed_stages(ray_session, tmp_path):
    ck = Checkpointer(str(tmp_path), {"chain": None})

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return exact.dedup_pages(web_pages(SF), collapse=False)

    first = _result(ck.run("dedup", build))
    assert calls["n"] == 1 and ck.has("dedup")

    # resume: same config → build NOT invoked, identical rows
    again = _result(ck.run("dedup", build))
    assert calls["n"] == 1
    pd.testing.assert_frame_equal(first, again)

    # fresh Checkpointer (new process analogue) also resumes
    ck2 = Checkpointer(str(tmp_path), {"chain": None})
    assert ck2.has("dedup")
    resumed = _result(ck2.run("dedup", lambda: (_ for _ in ()).throw(
        AssertionError("must not rebuild"))))
    pd.testing.assert_frame_equal(first, resumed)


def test_lineage_metadata(ray_session, tmp_path):
    ck = Checkpointer(str(tmp_path), {"chain": ["size", "sha"]})
    ck.run("dedup", lambda: exact.dedup_pages(
        web_pages(SF), chain=["size", "sha"], collapse=False),
        counters={"rows_in": 713})
    meta = ck.meta("dedup")
    assert meta["stage"] == "dedup"
    assert meta["config_hash"] == ck.hash
    assert meta["counters"] == {"rows_in": 713}
    # per-partition lineage: every parquet file accounted for with rows
    d = ck.stage_dir("dedup")
    files = {f for f in os.listdir(d) if f.endswith(".parquet")}
    assert set(meta["partitions"]) == files
    assert sum(meta["partitions"].values()) > 0


def test_config_change_invalidates(ray_session, tmp_path):
    a = Checkpointer(str(tmp_path), {"chain": None})
    b = Checkpointer(str(tmp_path), {"chain": ["size"]})
    assert a.hash != b.hash
    a.run("dedup", lambda: exact.dedup_pages(web_pages(SF), collapse=False))
    assert a.has("dedup") and not b.has("dedup")


def test_half_written_stage_is_rebuilt(ray_session, tmp_path):
    ck = Checkpointer(str(tmp_path), {"v": 1})
    # simulate a crash mid-write: directory with data but no _SUCCESS
    d = ck.stage_dir("s")
    os.makedirs(d)
    with open(os.path.join(d, "junk.parquet"), "w") as f:
        f.write("corrupt")
    assert not ck.has("s")
    out = ck.run("s", lambda: ray.data.from_items(
        [{"x": 1}, {"x": 2}]))
    assert sorted(out.to_pandas()["x"]) == [1, 2]
    assert ck.has("s")
    assert "junk.parquet" not in os.listdir(d)


def test_counters_callable_lands_in_meta(tmp_path, sf_dir):
    import ray.data

    from data_dedup_ray.state.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path), {"k": 1})

    def build():
        return ray.data.range(10)

    res = ck.run("stage_x", build,
                 counters=lambda d: {"rows_seen": d.count()})
    assert res.count() == 10
    meta = ck.meta("stage_x")
    assert meta["counters"] == {"rows_seen": 10}
