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


# --------------------------------------------------------------------------
# Per-partition resumable parquet sink (state/sink.py)
# --------------------------------------------------------------------------


def test_resumable_sink_roundtrip_and_skip(ray_session, tmp_path):
    import os

    import pandas as pd
    import ray.data

    from data_dedup_ray.state import (finished_partitions,
                                      resumable_write_parquet)

    df = pd.DataFrame({"url": [f"u{i:04d}" for i in range(500)],
                       "val": range(500)})
    ds = ray.data.from_pandas(df)
    out = str(tmp_path / "sink")
    st1 = resumable_write_parquet(ds, out, key_col="url", num_partitions=8)
    assert st1["written"].all() and st1["n_rows"].sum() == 500
    assert finished_partitions(out) == set(st1["part"])
    # read back through standard discovery (markers ignored via _ prefix;
    # the hive-style part=N dirs surface as a prunable 'part' column)
    back = ray.data.read_parquet(out).to_pandas() \
        .drop(columns=["part"]).sort_values("url")
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True),
        df.sort_values("url").reset_index(drop=True))
    # full rerun: everything skipped, bytes untouched
    mtimes = {p: os.path.getmtime(os.path.join(out, p, "data.parquet"))
              for p in os.listdir(out)}
    st2 = resumable_write_parquet(ds, out, key_col="url", num_partitions=8)
    assert (~st2["written"]).all()
    assert st2["n_rows"].sum() == 500
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, p, "data.parquet")) == m


def test_resumable_sink_rewrites_crashed_partition(ray_session, tmp_path):
    import os

    import pandas as pd
    import ray.data

    from data_dedup_ray.state import resumable_write_parquet

    df = pd.DataFrame({"url": [f"u{i:04d}" for i in range(300)],
                       "val": range(300)})
    ds = ray.data.from_pandas(df)
    out = str(tmp_path / "sink")
    resumable_write_parquet(ds, out, key_col="url", num_partitions=4)
    # simulate a crash: one partition lost its marker and has garbage data
    victim = sorted(d for d in os.listdir(out) if d.startswith("part="))[1]
    os.remove(os.path.join(out, victim, "_SUCCESS"))
    with open(os.path.join(out, victim, "data.parquet"), "wb") as f:
        f.write(b"corrupt")
    st = resumable_write_parquet(ds, out, key_col="url", num_partitions=4)
    rewritten = st[st["written"]]
    assert len(rewritten) == 1
    assert rewritten["part"].iloc[0] == int(victim.split("=")[1])
    back = ray.data.read_parquet(out).to_pandas() \
        .drop(columns=["part"]).sort_values("url")
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True),
        df.sort_values("url").reset_index(drop=True))


def test_resumable_sink_meta_lineage_on_resume(ray_session, tmp_path):
    """Every finished partition carries a _META.json lineage record
    (n_rows, key_col, config + hash), surviving a crash-resume cycle
    with the rewritten partition's meta refreshed."""
    import json
    import os

    import pandas as pd
    import ray.data

    from data_dedup_ray.state import resumable_write_parquet

    df = pd.DataFrame({"url": [f"u{i:04d}" for i in range(200)],
                       "val": range(200)})
    ds = ray.data.from_pandas(df)
    out = str(tmp_path / "sink")
    cfg = {"alg": ["size", "sha"], "near": False}
    st = resumable_write_parquet(ds, out, key_col="url",
                                 num_partitions=4, config=cfg)
    metas = {}
    for d in sorted(os.listdir(out)):
        mp = os.path.join(out, d, "_META.json")
        assert os.path.exists(mp), f"missing _META.json in {d}"
        with open(mp) as f:
            metas[d] = json.load(f)
    assert sum(m["n_rows"] for m in metas.values()) == 200
    assert all(m["key_col"] == "url" for m in metas.values())
    assert all(m["config"] == cfg for m in metas.values())
    hashes = {m["config_hash"] for m in metas.values()}
    assert len(hashes) == 1
    # crash one partition; the resume rewrites its data AND its meta
    victim = sorted(d for d in os.listdir(out) if d.startswith("part="))[0]
    os.remove(os.path.join(out, victim, "_SUCCESS"))
    os.remove(os.path.join(out, victim, "_META.json"))
    resumable_write_parquet(ds, out, key_col="url", num_partitions=4,
                            config=cfg)
    with open(os.path.join(out, victim, "_META.json")) as f:
        again = json.load(f)
    assert again == metas[victim]
