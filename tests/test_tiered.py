"""Tiered (exact-collapse → MinHash) dedup funnel: equality with the flat
pipeline, collapse effectiveness, empty-set semantics, partition
invariance, and the funnel stats row."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.pipelines import near, tiered

SF = "/root/testdata/sf0.001"


def _micro_ds():
    """base doc + exact copy + near copy + unrelated + two empty-ish docs."""
    base = " ".join(f"tok{i}" for i in range(40))
    near_txt = " ".join(f"tok{i}" for i in range(40)) + " extra"
    other = " ".join(f"zz{i} yy{i}" for i in range(40))
    rows = {
        "url": ["u/base", "u/copy", "u/near", "u/other", "u/tiny1", "u/tiny2"],
        "text": [base, base, near_txt, other, "one two", "one two"],
    }
    return ray.data.from_arrow(pa.table(rows))


def _labels(res) -> dict:
    df = res.to_pandas()
    return dict(zip(df["url"], df["cluster_id"]))


def test_micro_semantics():
    ds = _micro_ds()
    lab = _labels(tiered.tiered_dedup_clusters(ds, threshold=0.7))
    assert len(lab) == 6
    # exact copy + near copy collapse to the base's min url
    assert lab["u/base"] == lab["u/copy"] == lab["u/near"] == "u/base"
    assert lab["u/other"] == "u/other"
    # sub-shingle-length docs have EMPTY shingle sets: never grouped, even
    # though their text is byte-identical (flat-pipeline parity)
    assert lab["u/tiny1"] == "u/tiny1"
    assert lab["u/tiny2"] == "u/tiny2"


def test_equality_with_flat_pipeline():
    ds = web_pages(SF)
    flat = (near.minhash_dedup_clusters(ds, threshold=0.7)
            .to_pandas().sort_values("url").reset_index(drop=True))
    funnel = (tiered.tiered_dedup_clusters(ds, threshold=0.7)
              .to_pandas().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(flat[["url", "cluster_id"]],
                                  funnel[["url", "cluster_id"]])


def test_exact_tier_collapses():
    """web_pages plants exact-copy families: tier 2 must see strictly fewer
    rows than the corpus, and every group rep is its group's min url."""
    ds = web_pages(SF)
    sh = near.shingle_rows(ds)
    groups = tiered.exact_shingle_groups(sh).to_pandas()
    n_rows = len(groups)
    reps = groups[groups["sh"].notna()]
    assert len(reps) < n_rows
    # reps are self-assigned; every rep equals its group's min url
    assert (reps["url"] == reps["rep"]).all()
    gmin = groups.groupby("rep")["url"].min()
    assert (gmin.index == gmin.values).all()


def test_partition_invariance():
    ds = _micro_ds()
    a = _labels(tiered.tiered_dedup_clusters(ds, num_partitions=4))
    b = _labels(tiered.tiered_dedup_clusters(ds, num_partitions=16))
    assert a == b


def test_stats_row():
    ds = _micro_ds()
    st = tiered.tiered_dedup_stats(ds, threshold=0.7)
    assert st.iloc[0]["n_pages"] == 6
    # groups: {base, copy} + near + other + tiny1 + tiny2 = 5
    assert st.iloc[0]["n_exact_groups"] == 5
    # clusters: {base,copy,near} + other + tiny1 + tiny2 = 4
    assert st.iloc[0]["n_clusters"] == 4
