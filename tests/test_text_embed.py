"""Text-analysis + embedding-search pipelines vs DuckDB oracles."""

import duckdb
import pandas as pd
import pytest

from data_dedup_ray import oracles
from data_dedup_ray.pipelines import text
from data_dedup_ray.pipelines.search import (
    ann_lsh_topk,
    augmented_embeddings,
    embedding_dup_pairs,
    knn_topk,
)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ["documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _cmp(got, want, keys):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    g = got.sort_index(axis=1).sort_values(keys).reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values(keys).reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_token_stats(sf_dir, con):
    _cmp(text.token_stats(sf_dir), con.execute(oracles.token_stats_sql()).fetchdf(),
         ["doc_id"])


def test_quality_scores(sf_dir, con):
    _cmp(text.quality_scores(sf_dir),
         con.execute(oracles.quality_scores_sql()).fetchdf(), ["doc_id"])


def test_lang_id(sf_dir, con):
    _cmp(text.lang_id(sf_dir), con.execute(oracles.lang_id_sql()).fetchdf(),
         ["doc_id"])


def test_doc_stats(sf_dir, con):
    _cmp(text.doc_stats_by_lang(sf_dir),
         con.execute(oracles.doc_stats_sql()).fetchdf(), ["lang", "source"])


def test_fingerprints_deterministic(sf_dir):
    a = text.fingerprints(sf_dir).to_pandas().sort_values("doc_id")
    b = text.fingerprints(sf_dir).to_pandas().sort_values("doc_id")
    assert (a["fingerprint"].values == b["fingerprint"].values).all()
    # exact-duplicate texts share the fingerprint; distinct texts mostly don't
    assert a["fingerprint"].nunique() > 400


def test_knn_topk(sf_dir, con):
    import ray.data

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    got = knn_topk(emb, k=5, n_queries=10)
    want = con.execute(oracles.knn_topk_sql(5, 10)).fetchdf()
    _cmp(got, want, ["query_id", "rank"])


def test_embedding_dup_pairs(sf_dir, con):
    got = embedding_dup_pairs(
        augmented_embeddings(sf_dir), threshold=0.99).to_pandas()
    want = con.execute(oracles.embedding_dup_sql(0.99)).fetchdf()
    _cmp(got, want, ["vec_id_a", "vec_id_b"])
    # every planted copy pair is found at cos_bp == 10000
    assert (got["cos_bp"] == 10000).all()
    assert len(got) == 50  # sf0.001: 500 vectors → 50 planted copies


def test_embedding_dup_pairs_block_invariance(sf_dir):
    # the exact block-pair join must be independent of num_blocks
    a = embedding_dup_pairs(augmented_embeddings(sf_dir), threshold=0.99,
                            num_blocks=3).to_pandas() \
        .sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
    b = embedding_dup_pairs(augmented_embeddings(sf_dir), threshold=0.99,
                            num_blocks=11).to_pandas() \
        .sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_embedding_dup_pairs_lsh_vs_exact(sf_dir):
    from data_dedup_ray.pipelines.search import embedding_dup_pairs_lsh

    exact = embedding_dup_pairs(
        augmented_embeddings(sf_dir), threshold=0.99).to_pandas()
    lsh = embedding_dup_pairs_lsh(
        augmented_embeddings(sf_dir), threshold=0.99).to_pandas()
    e = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    l = set(zip(lsh["vec_id_a"], lsh["vec_id_b"]))
    # exact-verified candidates: always a subset of the exact join …
    assert l <= e
    # … and identical vectors share every signature: planted copies
    # (cos_bp == 10000) can NEVER be missed
    planted = set(zip(exact.loc[exact["cos_bp"] == 10000, "vec_id_a"],
                      exact.loc[exact["cos_bp"] == 10000, "vec_id_b"]))
    assert planted <= l
    assert len(lsh) == len(l)  # cross-table dedup leaves one row per pair


def test_ann_recall_vs_exact(sf_dir):
    import ray.data

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    exact = knn_topk(emb, k=5, n_queries=10)
    approx = ann_lsh_topk(emb, k=5, n_queries=10)
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(e & a) / len(e)
    # near-random vectors are the worst case for LSH; just assert the
    # bucketing machinery finds a meaningful fraction and stays a subset
    # of plausible neighbors
    assert recall >= 0.2, recall
    assert len(approx) > 0


def test_ann_ivf_recall_vs_exact(ray_session, sf_dir):
    import ray.data

    from data_dedup_ray.pipelines.search import ann_ivf_topk, knn_topk

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    exact = knn_topk(emb, k=5, n_queries=10)
    approx = ann_ivf_topk(emb, k=5, n_queries=10, nlist=16, nprobe=8)
    ex = set(zip(exact["query_id"], exact["neighbor_id"]))
    ap = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, recall
    # determinism
    again = ann_ivf_topk(emb, k=5, n_queries=10, nlist=16, nprobe=8)
    assert approx.equals(again)


def test_top_terms_oracle(sf_dir, con):
    from data_dedup_ray.pipelines import text as text_pipe

    got = text_pipe.top_terms(sf_dir, k=50).to_pandas()
    want = con.execute(text_pipe.top_terms_sql(50)).fetchdf()
    assert list(got["term"]) == list(want["term"])
    assert list(got["df"]) == list(want["df"])


def test_top_terms_partition_invariance(sf_dir, con):
    from data_dedup_ray.pipelines import text as text_pipe

    got = text_pipe.top_terms(sf_dir, k=20, num_partitions=3).to_pandas()
    want = con.execute(text_pipe.top_terms_sql(20)).fetchdf()
    assert list(got["term"]) == list(want["term"])
    assert list(got["df"]) == list(want["df"])


def test_embedding_centroids_oracle(sf_dir, con):
    from data_dedup_ray.pipelines.search import (embedding_centroids,
                                                 embedding_centroids_sql)

    got = embedding_centroids(sf_dir).to_pandas()
    want = con.execute(embedding_centroids_sql()).fetchdf()
    g = got.sort_index(axis=1).sort_values(["label", "dim"]).reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values(["label", "dim"]).reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_embedding_centroids_mean_close_to_numpy(sf_dir):
    import numpy as np

    from data_dedup_ray.pipelines.search import embedding_centroids

    got = embedding_centroids(sf_dir).to_pandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["label", "embedding"])
    mat = np.stack(emb["embedding"].to_numpy())
    for lab in sorted(emb["label"].unique())[:3]:
        want = mat[emb["label"].to_numpy() == lab].mean(axis=0)
        sub = got[got["label"] == lab].sort_values("dim")
        mean = sub["sum_e6"].to_numpy() / sub["n_vecs"].to_numpy() / 1e6
        assert np.abs(mean - want).max() < 1e-5


def test_embedding_dup_clusters_oracle(sf_dir, con):
    from data_dedup_ray.pipelines.search import (embedding_dup_clusters,
                                                 embedding_dup_clusters_sql)

    got = embedding_dup_clusters(sf_dir).to_pandas()
    want = con.execute(embedding_dup_clusters_sql()).fetchdf()
    g = got.sort_index(axis=1).sort_values("vec_id").reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values("vec_id").reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_embedding_dup_clusters_planted_copies(sf_dir):
    from data_dedup_ray.pipelines.search import embedding_dup_clusters

    got = embedding_dup_clusters(sf_dir).to_pandas().set_index("vec_id")
    # each planted exact copy (vec_id+100000) clusters with its original
    originals = [i for i in got.index if i < 100000 and i % 10 == 0]
    assert originals
    for i in originals[:20]:
        assert got.loc[i + 100000, "cluster_id"] == got.loc[i, "cluster_id"]


def test_normalize_text_oracle(sf_dir, con):
    got = text.normalize_text(sf_dir).to_pandas()
    want = con.execute(text.normalize_text_sql()).fetchdf()
    g = got.sort_index(axis=1).sort_values("doc_id").reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values("doc_id").reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_normalize_text_idempotent_and_clean(sf_dir):
    got = text.normalize_text(sf_dir).to_pandas()
    for s in got["norm_text"].head(50):
        assert s == s.lower() and s == s.strip()
        assert "  " not in s


def test_lang_confusion_oracle(sf_dir, con):
    got = text.lang_confusion(sf_dir).to_pandas()
    want = con.execute(text.lang_confusion_sql()).fetchdf()
    g = got.sort_index(axis=1).sort_values(
        ["lang", "lang_pred"]).reset_index(drop=True)
    w = want.sort_index(axis=1).sort_values(
        ["lang", "lang_pred"]).reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_lang_confusion_mass(sf_dir):
    got = text.lang_confusion(sf_dir).to_pandas()
    n_docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"]).shape[0]
    assert got["n"].sum() == n_docs


def test_embedding_dup_clusters_fallback_matches_dsu(sf_dir):
    """Forcing the edge-count guard must route through distributed label
    propagation — edges handed over as a Dataset, never collected — and
    yield the identical clustering."""
    from data_dedup_ray.pipelines.search import embedding_dup_clusters

    want = embedding_dup_clusters(sf_dir).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    got = embedding_dup_clusters(sf_dir, dsu_max_edges=0).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_bpe_token_counts_oracle(sf_dir, con):
    from data_dedup_ray.pipelines import text as text_pipe

    _cmp(text_pipe.bpe_token_counts(sf_dir),
         con.execute(text_pipe.bpe_token_counts_sql()).fetchdf(),
         ["doc_id"])


def test_embedding_lsh_star_fallback_on_mega_cluster(ray_session):
    """An identical-vector mega-cluster (boilerplate) lands whole in one
    bucket of every table; beyond group_cap the bucket emits a linear
    STAR around the min id — pairs stay exact-verified and connectivity
    is preserved without O(g²) work."""
    import numpy as np
    import pandas as pd
    import ray.data

    from data_dedup_ray.pipelines.components import dsu_components
    from data_dedup_ray.pipelines.search import embedding_dup_pairs_lsh

    n = 300
    rng = np.random.default_rng(7)
    base = rng.standard_normal(16).astype(np.float32)
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [base.tolist()] * n,   # all identical
    })
    ds = ray.data.from_pandas(df)
    pairs = embedding_dup_pairs_lsh(
        ds, threshold=0.99, dim=16, group_cap=50).to_pandas()
    # star: linear pair count (≤ n-1 per table before dedup → ≤ n-1 after)
    assert 0 < len(pairs) <= n - 1
    assert (pairs["cos_bp"] == 10000).all()
    # connectivity: one component containing every vector
    comp = dsu_components(pairs, a="vec_id_a", b="vec_id_b")
    roots = {comp.get(i, i) for i in range(n)}
    assert roots == {0}


def test_embedding_dup_pairs_empty_block_no_duplicates(ray_session):
    """Regression: a mixed (lo,hi) partition fed rows from only ONE block
    must emit nothing — inferring the pair from np.unique(blk) re-emitted
    that block's diagonal pairs (4 identical vectors → 11 pairs, not 6)."""
    import numpy as np
    import pandas as pd
    import ray.data

    v = [0.1, 0.2, 0.3, 0.4]
    df = pd.DataFrame({
        "vec_id": np.arange(4, dtype=np.int64),
        "embedding": [v] * 4,
    })
    ds = ray.data.from_pandas(df)
    got = embedding_dup_pairs(ds, threshold=0.99, num_blocks=8).to_pandas()
    pairs = list(zip(got["vec_id_a"], got["vec_id_b"]))
    assert len(pairs) == len(set(pairs)) == 6
    assert (got["cos_bp"] == 10000).all()


def test_matrix_rejects_ragged_embeddings(ray_session):
    import pyarrow as pa

    from data_dedup_ray.pipelines.search import _matrix

    t = pa.table({"embedding": pa.array([[1.0, 2.0], [3.0, 4.0, 5.0],
                                         [6.0]])})
    with pytest.raises(ValueError, match="ragged"):
        _matrix(t)
    # total divisible by n but rows ragged — still rejected
    t2 = pa.table({"embedding": pa.array([[1.0], [2.0, 3.0, 4.0],
                                          [5.0, 6.0]])})
    with pytest.raises(ValueError, match="ragged"):
        _matrix(t2)


def test_bpe_merged_token_counts_oracle(sf_dir, con):
    _cmp(text.bpe_merged_token_counts(sf_dir),
         con.execute(
             __import__("data_dedup_ray.pipelines.text",
                        fromlist=["x"]).bpe_merged_token_counts_sql()
         ).fetchdf(), ["doc_id"])


def test_bpe_merge_counter_goldens():
    """Hand-checked merge closures, incl. ranked-priority behavior on a
    non-fixture merges table (the general BPE path)."""
    from data_dedup_ray.pipelines.text import _BPEMergeCounter

    c = _BPEMergeCounter([("t", "h"), ("e", "r"), ("i", "n"), ("o", "u")])
    assert c._merged_len("the") == 2          # th + e
    assert c._merged_len("ther") == 2         # th + er
    assert c._merged_len("xyz") == 3
    assert c._merged_len("") == 0
    assert c._merged_len("thth") == 2
    # ranked priority: ("a","b") outranks ("b","c") → "abc" = ab + c;
    # a rank-reversed table merges bc first → a + bc (still 2 tokens),
    # but "abcb" distinguishes: ab,c,b (3) vs a,bc,b (3)… use "abc"+rank
    hi = _BPEMergeCounter([("a", "b"), ("ab", "c")])
    assert hi._merged_len("abc") == 1          # ab then ab+c — multi-level
    lo = _BPEMergeCounter([("b", "c"), ("a", "b")])
    assert lo._merged_len("abc") == 2          # bc first → a + bc


def test_ann_planted_copy_is_rank1_both_index_types(ray_session, sf_dir):
    """Planted exact copies are guaranteed retrievals for BOTH ANN paths:
    identical vectors share every LSH hyperplane signature and the
    query's own IVF coarse cell, so the copy is always a candidate and
    wins rank 1 at cos 1.0 (the driver's ann_*_planted_top1 oracles)."""
    from data_dedup_ray.pipelines.search import (ann_ivf_topk, ann_lsh_topk,
                                                 augmented_embeddings)

    emb = augmented_embeddings(sf_dir)
    for fn in (ann_lsh_topk, ann_ivf_topk):
        res = fn(emb, k=5, n_queries=100)
        top1 = res[(res["rank"] == 1) & (res["query_id"] % 10 == 0)]
        assert len(top1) == 10, fn.__name__
        assert (top1["neighbor_id"].to_numpy()
                == top1["query_id"].to_numpy() + 100000).all(), fn.__name__
        assert (top1["cos_bp"] == 10000).all(), fn.__name__


def test_fingerprints_sha_oracle(ray_session, sf_dir):
    """min-k-shingle sha256 fingerprint vs its verbatim DuckDB twin."""
    import duckdb

    from data_dedup_ray.pipelines import text

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    got = text.fingerprints_sha(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = con.execute(text.fingerprints_sha_sql()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["fingerprint_sha"].tolist() == \
        want["fingerprint_sha"].tolist()
    # every real doc has >= 5 tokens in the synthetic corpus
    assert (got["fingerprint_sha"].str.len() == 16).all()


def test_quantize_int8_rule():
    import numpy as np

    from data_dedup_ray.pipelines.search import quantize_int8

    X = np.array([[0.5, -1.0, 0.25, 0.0],
                  [0.0, 0.0, 0.0, 0.0],
                  [2.0, 2.0, 2.0, 2.0]], dtype=np.float32)
    q = quantize_int8(X)
    # floor(x*127/max|x|): max element hits ±127 exactly; zero rows stay 0
    assert list(q[0]) == [63, -127, 31, 0]
    assert list(q[1]) == [0, 0, 0, 0]
    assert list(q[2]) == [127, 127, 127, 127]


def test_embedding_dup_pairs_int8(sf_dir, con):
    from data_dedup_ray.pipelines.search import embedding_dup_pairs_int8

    got = embedding_dup_pairs_int8(
        augmented_embeddings(sf_dir)).to_pandas()
    want = con.execute(oracles.embedding_dup_int8_sql()).fetchdf()
    _cmp(got, want, ["vec_id_a", "vec_id_b"])
    # planted EXACT copies quantize identically → cos² exactly 1:
    # quantization is loss-free on true duplicates
    assert (got["cos2_bp"] == 10000).all()
    assert len(got) == 50
    # and the int8 tier finds the same pair set as the float join here
    f = embedding_dup_pairs(
        augmented_embeddings(sf_dir), threshold=0.99).to_pandas()
    assert set(zip(got["vec_id_a"], got["vec_id_b"])) \
        == set(zip(f["vec_id_a"], f["vec_id_b"]))


def test_emit_pairs_int8_rejects_overflow_dims():
    """Dims past the int64-exact bound (1883) must fail loudly: numpy
    would silently wrap dot²·10⁴ while the HUGEINT SQL twin stays
    exact (ADVICE r3)."""
    import numpy as np
    import pytest

    from data_dedup_ray.pipelines.search import (
        _INT8_MAX_DIM,
        _emit_pairs_int8,
    )

    d = _INT8_MAX_DIM + 1
    Q = np.full((2, d), 127, dtype=np.int64)
    ids = np.array([0, 1], dtype=np.int64)
    with pytest.raises(ValueError, match="int64-exact"):
        _emit_pairs_int8(ids, Q, ids, Q, 9801, diagonal=True)
    # the bound itself is the worst case that still fits: the fully
    # saturated all-127 pair (maximal dot) scores exactly 10000 at
    # d = _INT8_MAX_DIM, while one dim more would wrap int64
    ok = _emit_pairs_int8(
        ids, np.full((2, _INT8_MAX_DIM), 127, dtype=np.int64),
        ids, np.full((2, _INT8_MAX_DIM), 127, dtype=np.int64),
        9801, diagonal=True)
    assert ok.num_rows == 1 and ok["cos2_bp"][0].as_py() == 10000
    assert (_INT8_MAX_DIM * 127**2) ** 2 * 10000 < 2**63
    assert ((_INT8_MAX_DIM + 1) * 127**2) ** 2 * 10000 >= 2**63


def test_embedding_dup_pairs_int8_block_invariance(sf_dir):
    from data_dedup_ray.pipelines.search import embedding_dup_pairs_int8

    outs = [embedding_dup_pairs_int8(
        augmented_embeddings(sf_dir), num_blocks=b).to_pandas()
        .sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)
        for b in (3, 11)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_vocab_coverage_oracle_and_laws(sf_dir, con):
    got = (text.vocab_coverage(sf_dir).to_pandas()
           .sort_values("vocab_size").reset_index(drop=True))
    want = (con.execute(text.vocab_coverage_sql()).fetchdf()
            .sort_values("vocab_size").reset_index(drop=True))
    _cmp(got, want, ["vocab_size"])
    # monotone in the budget; saturates at 10000 once N ≥ n_distinct
    assert (got["coverage_bp"].diff().dropna() >= 0).all()
    sat = got[got["vocab_size"] >= got["n_distinct"]]
    assert (sat["coverage_bp"] == 10000).all()
    assert (sat["covered"] == sat["total"]).all()
    # total is the corpus occurrence count, constant across rows
    assert got["total"].nunique() == 1


def test_vocab_coverage_bruteforce(sf_dir):
    import re
    from collections import Counter

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    c = Counter()
    for s in docs["text"]:
        c.update(re.findall(r"[a-z0-9]+", s.lower()))
    ordered = sorted(c.values(), reverse=True)
    got = (text.vocab_coverage(sf_dir, cutoffs=(1, 5, 10**6))
           .to_pandas().set_index("vocab_size"))
    for n in (1, 5, 10**6):
        assert got.loc[n, "covered"] == sum(ordered[:n])
    assert got["n_distinct"].iloc[0] == len(c)
