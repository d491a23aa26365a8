"""CLI — the ``ray job submit`` entrypoint (reference CLI.pm analogue).

Mirrors ``bin/dedup_files`` option-for-option where the concept survives
(/root/reference/lib/Data/Dedup/Files/CLI.pm:30-39, bin/dedup_files:22-36):

    --dir       → --input      (parquet dir/file of web_pages-schema rows;
                                repeated values accepted, duplicates skipped
                                with a warning, CLI.pm:178-195)
    --alg       → --alg        (ordered digest chain by name, repeatable;
                                CLI.pm:89-97)
    --outfile   → --output     (TSV report path or parquet dir)
    --format    → --format     (tsv | parquet)
    --quiet/--verbose          (same warning/statistics policy,
                                CLI.pm:209-247,273-277)
    (new)         --ignore-empty, --checkpoint-dir (resume), --near
                  (MinHash/LSH near-dup instead of exact), --num-cpus

Cluster usage::

    ray job submit --working-dir . -- python -m data_dedup_ray.cli \
        --input s3://corpus/pages --output s3://out/dups --format parquet

Exit code 0 on success (bin/dedup_files:10; CLI.pm:333).
"""

from __future__ import annotations

import argparse
import re
import sys

_KIBI = 1024
_MEBI = _KIBI * 1024
_GIBI = _MEBI * 1024
_TEBI = _GIBI * 1024


def human_readable_bytes(n: float) -> str:
    """CLI.pm:42-67: '%.1f <prefix>B' at the largest binary scale the
    value EXCEEDS (strictly greater, per the reference), else '<n> B'."""
    for scale, prefix in ((_TEBI, "Ti"), (_GIBI, "Gi"),
                          (_MEBI, "Mi"), (_KIBI, "Ki")):
        if abs(n) > scale:
            return f"{n / scale:.1f} {prefix}B"
    return f"{n} B"


#: " at FILE line ##" suffix of a warning line (CLI.pm:71-86)
_SOURCE_LOC_RE = re.compile(r" at .+? line \d+.*$")


def remove_source_loc(msg: str) -> str:
    """CLI.pm:72-86: strip the ' at FILE line ##' source location from a
    warning and DROP every line after the first one that carried it (a
    stack trace adds nothing for users)."""
    out = []
    for line in msg.splitlines():
        m = _SOURCE_LOC_RE.search(line)
        if m:
            line = line[: m.start()]
            if line:
                out.append(line)
            break
        out.append(line)
    return "".join(f"{line}\n" for line in out)


def make_warn(*, quiet: bool = False, debug: bool = False,
              verbose: bool = False, stream=None):
    """The reference's warning policy (CLI.pm:256-277) as a warn fn:
    ``--verbose``/``--debug`` override ``--quiet``; quiet suppresses all;
    debug passes everything through verbatim; the default strips source
    locations."""
    stream = stream if stream is not None else sys.stderr

    if verbose or debug:
        quiet = False
    if quiet:
        return lambda msg: None
    if debug:
        return lambda msg: stream.write(
            msg if msg.endswith("\n") else msg + "\n")
    return lambda msg: stream.write(remove_source_loc(msg))


class ProgressDisplay:
    """The reference's throttled scan-progress display (CLI.pm:115-156):
    an update every ``granularity`` files, ``\\r``-overwritten in place
    with overflow padding when the message shrinks, cleared when done.
    ``force`` mirrors the reference's ``force_display`` arg."""

    def __init__(self, stream=None, granularity: int = 1000):
        self.stream = stream if stream is not None else sys.stderr
        self.granularity = granularity
        self.files = 0
        self.bytes = 0
        self._next_print = 0
        self._msg_len = 0

    def update(self, n_files: int, n_bytes: int, *,
               force: bool = False) -> None:
        self.files += n_files
        self.bytes += n_bytes
        if self.files < self._next_print and not force:
            return
        msg = (f"scanned {self.files} files, "
               f"{human_readable_bytes(self.bytes)}")
        pad = max(0, self._msg_len - len(msg))
        self._msg_len = len(msg)
        self.stream.write("\r" + msg + " " * pad)
        self._next_print = (
            self.files // self.granularity + 1) * self.granularity

    def clear(self) -> None:
        """CLI.pm:149-152: blank the line and re-display ASAP."""
        self.stream.write("\r" + " " * self._msg_len + "\r")
        self._msg_len = 0
        self._next_print = 0


def _make_tally():
    """Zero-cpu counter actor: the scan-progress tally the input tap
    feeds while the dedup pipeline streams (one actor, fire-and-forget
    adds — never on the data path's critical chain)."""
    import ray

    @ray.remote(num_cpus=0)
    class Tally:
        def __init__(self):
            self.files = 0
            self.bytes = 0

        def add(self, n_files: int, n_bytes: int) -> None:
            self.files += n_files
            self.bytes += n_bytes

        def get(self) -> tuple:
            return self.files, self.bytes

    return Tally.remote()


def _counting(ds, tally):
    """Pass-through map_batches that tallies (rows, text bytes) into the
    progress actor.  The caller must consume the tapped dataset EXACTLY
    once (the CLI materializes through it) — Ray re-executes lineage per
    consumer, so an unmaterialized tap would multi-count the corpus once
    per downstream cascade branch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def tap(t: pa.Table) -> pa.Table:
        tally.add.remote(
            t.num_rows,
            int(pc.sum(pc.binary_length(t["text"])).as_py() or 0),
        )
        return t

    return ds.map_batches(tap, batch_format="pyarrow")


def _settled_totals(tally):
    """Read the tally until stable: worker adds are fire-and-forget, so a
    few may still be in the actor's mailbox when the pipeline returns."""
    import time

    import ray

    f, b = ray.get(tally.get.remote())
    while True:
        time.sleep(0.05)
        f2, b2 = ray.get(tally.get.remote())
        if (f2, b2) == (f, b):
            return f, b
        f, b = f2, b2


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data_dedup_ray",
                                description=__doc__.split("\n")[0])
    p.add_argument("--input", action="append", required=True,
                   help="parquet path of web_pages rows (repeatable)")
    p.add_argument("--output", default=None,
                   help="report destination (default: stdout for tsv)")
    p.add_argument("--format", choices=["tsv", "parquet"], default="tsv")
    p.add_argument("--alg", action="append", default=None,
                   help="digest stage name, repeatable, order = chain order")
    p.add_argument("--ignore-empty", action="store_true")
    p.add_argument("--tiered", action="store_true",
                   help="with --near: run the exact-collapse funnel "
                        "(pipelines/tiered) instead of the flat MinHash "
                        "pipeline — identical clusters, cheaper on "
                        "duplicate-heavy corpora")
    p.add_argument("--near", action="store_true",
                   help="MinHash/LSH near-dup clusters instead of exact")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--checkpoint-dir", default=None,
                   help="per-stage parquet checkpoints; rerun to resume")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--debug", action="store_true",
                   help="pass warnings through verbatim incl. source "
                        "locations (CLI.pm:273-277); overrides --quiet")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for standalone runs; ignored under ray job")
    return p


def _dedupe_inputs(paths: list[str], warn) -> list[str]:
    seen, out = set(), []
    for d in paths:
        if d in seen:
            warn(f"warning: ignoring repeated input {d}")
            continue
        seen.add(d)
        out.append(d)
    return out


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    warn = make_warn(quiet=args.quiet, debug=args.debug,
                     verbose=args.verbose)

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)

    import ray.data

    from data_dedup_ray.pipelines import exact

    inputs = _dedupe_inputs(args.input, warn)
    ds = ray.data.read_parquet(inputs)

    if args.checkpoint_dir:
        from data_dedup_ray.state import Checkpointer

        ck = Checkpointer(
            args.checkpoint_dir,
            {"alg": args.alg, "near": args.near,
             "tiered": args.tiered, "threshold": args.threshold,
             "ignore_empty": args.ignore_empty, "inputs": inputs},
        )
    else:
        ck = None

    if args.near:
        if args.tiered:
            from data_dedup_ray.pipelines import tiered as _tiered

            def build():
                return _tiered.tiered_dedup_clusters(
                    ds, threshold=args.threshold)
        else:
            from data_dedup_ray.pipelines import near

            def build():
                return near.minhash_dedup_clusters(
                    ds, threshold=args.threshold)

        def _near_counters(d):
            sizes = d.groupby("cluster_id").count().to_pandas()
            return {
                "n_pages": int(sizes["count()"].sum()),
                "n_clusters": int(len(sizes)),
                "n_dup_pages": int(
                    sizes.loc[sizes["count()"] > 1, "count()"].sum()
                ),
            }

        result = (
            ck.run("near_clusters", build, counters=_near_counters)
            if ck else build()
        )
        if args.format == "parquet":
            from data_dedup_ray.state import resumable_write_parquet

            resumable_write_parquet(
                result, args.output, key_col="url",
                config={"near": True, "threshold": args.threshold,
                        "inputs": inputs})
        else:
            # same exchange rollup as the exact report: multi-member
            # clusters are reduced inside the partitions and only the
            # output-sized (members) lines reach the driver — never the
            # corpus-sized assignment table
            rep = exact.cluster_report(result, key="cluster_id")
            lines = sorted(rep.to_pandas()["members"])
            _emit("".join(line + "\n" for line in lines), args.output)
    else:
        prog = tally = poll_stop = poll_thread = None
        if args.verbose:
            # the reference's LIVE progress display (CLI.pm:115-156): a
            # tap on the ONE real input scan feeds a counter actor; a
            # poll thread repaints the throttled \r line while the dedup
            # pipeline streams (no second read of the corpus)
            import threading

            tally = _make_tally()
            ds = _counting(ds, tally)
            prog = ProgressDisplay()
            poll_stop = threading.Event()

            def _poll():
                last = (0, 0)
                while not poll_stop.wait(0.2):
                    cur = ray.get(tally.get.remote())
                    prog.update(cur[0] - last[0], cur[1] - last[1])
                    last = cur

            poll_thread = threading.Thread(target=_poll, daemon=True)
            poll_thread.start()
            # materialize THROUGH the tap: the counted scan executes
            # exactly once, right now, with the poll thread repainting
            # live — and every downstream cascade branch (planning,
            # uniques, candidates) reuses the materialized blocks instead
            # of re-reading (and re-counting) the input per branch.
            # Resumed checkpoint runs count the same way (the tally no
            # longer depends on whether the pipeline re-executes).
            ds = ds.materialize()

        def build():
            return exact.dedup_pages(
                ds, chain=args.alg, ignore_empty=args.ignore_empty
            )

        result = (
            ck.run("exact_dedup", build, counters=exact.dedup_stats)
            if ck else build()
        )
        if args.format == "parquet":
            from data_dedup_ray.state import resumable_write_parquet

            resumable_write_parquet(
                result, args.output, key_col="url",
                config={"near": False, "alg": args.alg,
                        "ignore_empty": args.ignore_empty,
                        "inputs": inputs})
        else:
            _emit(exact.report_text(result), args.output)
        if args.verbose:
            poll_stop.set()
            poll_thread.join()
            files, nbytes = _settled_totals(tally)
            prog.update(files - prog.files, nbytes - prog.bytes,
                        force=True)
            print("", file=sys.stderr)  # keep the final line
            print(
                f"scanned {prog.files} pages, "
                f"{human_readable_bytes(prog.bytes)}",
                file=sys.stderr,
            )
            # a checkpointed run already computed the tallies into _META
            stats = (ck.meta("exact_dedup")["counters"]
                     if ck else exact.dedup_stats(result))
            for k, v in stats.items():
                print(f"{k}: {v}", file=sys.stderr)

    ray.shutdown()
    return 0


def _emit(text: str, output: str | None) -> None:
    if output:
        with open(output, "w") as f:
            f.write(text)
    else:
        sys.stdout.write(text)


if __name__ == "__main__":
    sys.exit(main())
