"""CLI conformance: report format, option policy, resume."""

import os
import subprocess
import sys

import pytest

from data_dedup_ray.corpus import web_pages

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_parquet(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    web_pages(SF).write_parquet(d)
    return d


def _run(args, **kw):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    cmd = [sys.executable, "-m", "data_dedup_ray.cli", *args]
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=420, cwd=cwd, **kw)
    if r.returncode != 0:
        # observed once-in-many-runs environmental flake: the subprocess
        # CLI's own single-node Ray cluster can fail to bootstrap while
        # the pytest-session cluster is alive.  Retry exactly once with
        # the first attempt's stderr preserved for the assertion message.
        first_err = r.stderr
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=420, cwd=cwd, **kw)
        if r.returncode != 0:
            r.stderr = (f"[first attempt stderr]\n{first_err}\n"
                        f"[retry stderr]\n{r.stderr}")
    return r


def test_tsv_report_golden_shape(ray_session, pages_parquet, tmp_path):
    out = tmp_path / "report.tsv"
    r = _run(["--input", pages_parquet, "--output", str(out),
              "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = out.read_text().splitlines()
    assert lines  # the corpus plants exact duplicates
    # each line: ≥2 tab-separated members, sorted; lines sorted
    for ln in lines:
        members = ln.split("\t")
        assert len(members) >= 2 and members == sorted(members)
    assert lines == sorted(lines)


def test_repeated_input_warns_and_dedupes(ray_session, pages_parquet, tmp_path):
    out = tmp_path / "r.tsv"
    r = _run(["--input", pages_parquet, "--input", pages_parquet,
              "--output", str(out), "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ignoring repeated input" in r.stderr
    # dedupe of inputs → same report as single input
    single = tmp_path / "s.tsv"
    r2 = _run(["--input", pages_parquet, "--output", str(single),
               "--quiet", "--num-cpus", "4"])
    assert r2.returncode == 0
    assert out.read_text() == single.read_text()
    assert "ignoring repeated input" not in r2.stderr


def test_checkpoint_resume_cli(ray_session, pages_parquet, tmp_path):
    ck = tmp_path / "ck"
    out1 = tmp_path / "a.tsv"
    r = _run(["--input", pages_parquet, "--output", str(out1),
              "--checkpoint-dir", str(ck), "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    stage_dirs = [d for d in os.listdir(ck) if d.startswith("exact_dedup-")]
    assert len(stage_dirs) == 1
    assert os.path.exists(ck / stage_dirs[0] / "_SUCCESS")
    # resume produces the identical report from the checkpoint
    out2 = tmp_path / "b.tsv"
    r2 = _run(["--input", pages_parquet, "--output", str(out2),
               "--checkpoint-dir", str(ck), "--num-cpus", "4"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert out1.read_text() == out2.read_text()


def test_checkpoint_meta_records_counters(ray_session, pages_parquet, tmp_path):
    import json

    out = tmp_path / "r.tsv"
    ck = tmp_path / "ck"
    r = _run(["--input", pages_parquet, "--output", str(out),
              "--checkpoint-dir", str(ck), "--quiet"])
    assert r.returncode == 0, r.stderr
    stage_dirs = [d for d in os.listdir(ck) if d.startswith("exact_dedup")]
    assert stage_dirs
    with open(os.path.join(ck, stage_dirs[0], "_META.json")) as f:
        meta = json.load(f)
    # the --verbose tallies land in lineage (hash/signature counters)
    assert meta["counters"], meta
    assert all(isinstance(v, int) for v in meta["counters"].values())


def test_near_mode_tsv_and_checkpoint_resume(ray_session, pages_parquet,
                                             tmp_path):
    """--near produces the near-dup cluster TSV; a second run with the same
    --checkpoint-dir resumes from the checkpoint (byte-identical output)
    and records counters in _META."""
    import json

    out1, out2 = tmp_path / "n1.tsv", tmp_path / "n2.tsv"
    ck = tmp_path / "ck"
    r1 = _run(["--input", pages_parquet, "--near", "--threshold", "0.7",
               "--output", str(out1), "--checkpoint-dir", str(ck),
               "--quiet"])
    assert r1.returncode == 0, r1.stderr
    r2 = _run(["--input", pages_parquet, "--near", "--threshold", "0.7",
               "--output", str(out2), "--checkpoint-dir", str(ck),
               "--quiet"])
    assert r2.returncode == 0, r2.stderr
    assert out1.read_bytes() == out2.read_bytes()
    text = out1.read_text()
    assert text and all("\t" in line for line in text.splitlines())
    stage = [d for d in os.listdir(ck) if d.startswith("near_clusters")]
    assert stage
    with open(os.path.join(ck, stage[0], "_META.json")) as f:
        meta = json.load(f)
    assert meta["counters"]["n_pages"] > 0
    assert meta["counters"]["n_clusters"] <= meta["counters"]["n_pages"]


# --------------------------------------------------------------------------
# Warning policy + human_readable_bytes (CLI.pm:42-86,256-277; CLI.t:141-216)
# --------------------------------------------------------------------------


def test_human_readable_bytes_goldens():
    from data_dedup_ray.cli import human_readable_bytes as hrb

    assert hrb(0) == "0 B"
    assert hrb(1023) == "1023 B"
    assert hrb(1024) == "1024 B"          # strictly greater, CLI.pm:57
    assert hrb(1025) == "1.0 KiB"
    assert hrb(1536) == "1.5 KiB"
    assert hrb(1024**2 + 1) == "1.0 MiB"
    assert hrb(3 * 1024**3) == "3.0 GiB"
    assert hrb(2 * 1024**4) == "2.0 TiB"
    assert hrb(-1536) == "-1.5 KiB"       # abs() scale pick, CLI.pm:58


def test_remove_source_loc():
    from data_dedup_ray.cli import remove_source_loc

    # same-line location stripped
    assert remove_source_loc(
        "something failed at /x/y.py line 12.") == "something failed\n"
    # carp-style: location on its own line → line dropped entirely and
    # everything AFTER the first located line dropped too (CLI.t:212-216)
    assert remove_source_loc(
        "warned you\n at /x/y.py line 9.\n  trace frame called at z"
    ) == "warned you\n"
    # plain warnings untouched
    assert remove_source_loc("plain warning") == "plain warning\n"


def test_warning_policy_modes():
    import io

    from data_dedup_ray.cli import make_warn

    msgs = ["plain warning",
            "located warning at /a/b.py line 3."]

    def run(**kw):
        buf = io.StringIO()
        w = make_warn(stream=buf, **kw)
        for m in msgs:
            w(m)
        return buf.getvalue()

    # normal: locations stripped (CLI.t:141-165)
    assert run() == "plain warning\nlocated warning\n"
    # quiet: nothing (CLI.t:167-187)
    assert run(quiet=True) == ""
    # debug: verbatim incl. locations (CLI.t:190-216)
    assert run(debug=True) == ("plain warning\n"
                               "located warning at /a/b.py line 3.\n")
    # verbose/debug override quiet (CLI.pm:260)
    assert run(quiet=True, debug=True) != ""
    assert run(quiet=True, verbose=True) == "plain warning\nlocated warning\n"


def test_cli_verbose_scan_summary(ray_session, pages_parquet, tmp_path):
    out = tmp_path / "v.tsv"
    r = _run(["--input", pages_parquet, "--output", str(out),
              "--verbose", "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    import re as _re

    m = _re.search(r"scanned (\d+) pages, (.+B)$", r.stderr, _re.M)
    assert m, r.stderr[-2000:]
    # EXACT count: the tap is materialized-through once, so lineage
    # re-execution by later cascade branches must not multi-count
    import duckdb

    n_pages = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{pages_parquet}/*.parquet')"
    ).fetchone()[0]
    assert int(m.group(1)) == n_pages, (m.group(1), n_pages)


def test_progress_display_throttle_and_clear():
    """CLI.pm:115-156 semantics: updates every `granularity` files,
    \\r-overwrite with overflow padding, clear blanks the line."""
    import io

    from data_dedup_ray.cli import ProgressDisplay

    buf = io.StringIO()
    p = ProgressDisplay(stream=buf, granularity=3)
    p.update(1, 100)        # files=1 ≥ next(0) → prints
    p.update(1, 100)        # files=2 < next(3) → silent
    assert buf.getvalue() == "\rscanned 1 files, 100 B"
    p.update(1, 300)        # files=3 ≥ 3 → prints
    assert buf.getvalue().endswith("\rscanned 3 files, 500 B")
    # shrinkage pads with spaces to blank the previous longer message
    q = ProgressDisplay(stream=io.StringIO(), granularity=1)
    q.update(1, 123456789)  # "scanned 1 files, 117.7 MiB"
    long_len = q._msg_len
    q.files, q.bytes = 0, 0   # simulate a reset to a shorter message
    q._next_print = 0
    q.update(1, 1)
    short = "scanned 1 files, 1 B"
    assert q.stream.getvalue().endswith(
        "\r" + short + " " * (long_len - len(short)))
    # clear blanks the whole line and resets the throttle
    line_len = q._msg_len
    q.clear()
    assert q.stream.getvalue().endswith("\r" + " " * line_len + "\r")
    assert q._msg_len == 0 and q._next_print == 0


def test_progress_display_force():
    import io

    from data_dedup_ray.cli import ProgressDisplay

    buf = io.StringIO()
    p = ProgressDisplay(stream=buf, granularity=1000)
    p.update(5, 500)         # 5 ≥ 0 → prints, next=1000
    p.update(5, 500)         # silent
    p.update(0, 0, force=True)
    assert buf.getvalue().count("\r") == 2
    assert buf.getvalue().endswith("scanned 10 files, 1000 B")


def test_cli_parquet_output_resumable(ray_session, pages_parquet, tmp_path):
    import os

    out = str(tmp_path / "pq")
    r = _run(["--input", pages_parquet, "--output", out,
              "--format", "parquet", "--quiet", "--num-cpus", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    parts = [d for d in os.listdir(out) if d.startswith("part=")]
    assert parts
    assert all(os.path.exists(os.path.join(out, d, "_SUCCESS"))
               for d in parts)
    import ray.data

    back = ray.data.read_parquet(out).to_pandas()
    assert {"url", "cluster_id", "n_members"} <= set(back.columns)
    assert len(back) > 0


def test_near_tiered_matches_flat(ray_session, pages_parquet, tmp_path):
    """--near --tiered routes through the funnel and produces the exact
    same duplicate-cluster TSV as the flat pipeline."""
    flat, tiered = tmp_path / "flat.tsv", tmp_path / "tiered.tsv"
    r1 = _run(["--input", pages_parquet, "--near", "--threshold", "0.7",
               "--output", str(flat), "--quiet"])
    assert r1.returncode == 0, r1.stderr
    r2 = _run(["--input", pages_parquet, "--near", "--tiered",
               "--threshold", "0.7", "--output", str(tiered), "--quiet"])
    assert r2.returncode == 0, r2.stderr
    assert flat.read_bytes() == tiered.read_bytes()
    assert flat.read_bytes()  # non-empty: the fixture plants duplicates
