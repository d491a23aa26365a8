"""Fault tolerance: the streaming pipeline must survive worker deaths via
Ray's task retry + lineage re-execution (SURVEY.md §4 — the reference has
no retries at all; Ray provides them, these tests prove we don't defeat
them)."""

import os

import ray.data


def test_map_batches_survives_worker_crash(tmp_path, sf_dir):
    """Kill one worker process mid-stage (os._exit simulates a node/OOM
    death, a system failure Ray retries); the job must complete with the
    full, correct result."""
    marker = str(tmp_path / "crashed-once")

    def kamikaze(t):
        if not os.path.exists(marker):
            try:
                with open(marker, "x") as f:
                    f.write(str(os.getpid()))
            except FileExistsError:
                pass
            else:
                os._exit(1)  # hard worker death AFTER claiming the marker
        return t

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    n_docs = docs.count()
    out = docs.map_batches(kamikaze, batch_format="pyarrow")
    assert out.count() == n_docs
    assert os.path.exists(marker)  # the crash really happened


def test_exchange_survives_worker_crash(tmp_path, sf_dir):
    """Same, through the custom raw-task hash_exchange — its split/apply
    tasks must also be retryable."""
    from data_dedup_ray.pipelines import snapshots
    from data_dedup_ray.corpus import web_pages

    marker = str(tmp_path / "crashed-exchange")

    def kamikaze(t):
        if not os.path.exists(marker):
            try:
                with open(marker, "x") as f:
                    f.write(str(os.getpid()))
            except FileExistsError:
                pass
            else:
                os._exit(1)
        return t

    pages = web_pages(sf_dir).map_batches(kamikaze, batch_format="pyarrow")
    got = snapshots.domain_stats(pages).to_pandas()
    want = snapshots.domain_stats(web_pages(sf_dir)).to_pandas()
    g = got.sort_values("domain").reset_index(drop=True)
    w = want.sort_values("domain").reset_index(drop=True)
    assert g.equals(w)
    assert os.path.exists(marker)
