"""Corpus-cleaning operators — the filters a training-data pipeline runs
between crawling and training.

The reference deduplicates opaque bytes and never inspects content
(/root/reference/lib/Data/Dedup/Engine.pm:133-136; SURVEY.md §2.6 lists
string functions as absent).  A 100 TB web corpus additionally needs the
standard cleaning passes (C4 / Gopher style): PII redaction, repetition
filters, corpus-frequency boilerplate removal, eval-benchmark
decontamination, and the final keep-one-per-near-dup-cluster projection.
Each operator here has a DuckDB SQL twin so the driver value-hash-checks
it end to end.

Scale shapes
------------
- ``pii_scrub`` / ``repetition_stats``: embarrassingly parallel
  ``map_batches`` kernels; regexes compiled once per worker
  (util.stage_task — build-once-per-process without actor-spawn cost).
- ``boilerplate_terms``: per-batch partial document-frequency counts (one
  row per distinct term per batch — shuffle volume is bounded by
  vocabulary, not token count) through one sortless ``hash_exchange``;
  the ≥-half-the-corpus threshold is applied INSIDE the owning partition
  (each term's total lands whole there), so only boilerplate terms leave
  the exchange.
- ``remove_boilerplate`` / ``decontaminate``: broadcast small-side
  lookup — ``ray.put`` the term set / benchmark n-gram set once, fetch
  once per worker in the stage constructor; never a shuffle join, never
  a per-batch closure re-ship.  At real scale the benchmark side is an
  eval suite (thousands of docs → millions of n-grams): ship 64-bit
  gram hashes or a Bloom filter instead of strings; exact strings here
  keep the oracle airtight at test scale.
- ``near_dup_keep_first``: a filter over the already-computed near-dup
  cluster assignment (pipelines/near.py) — no extra shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition
from data_dedup_ray.stages.textstats import TOKEN_RE
from data_dedup_ray.util import stage_task

# --------------------------------------------------------------------------
# PII scrub (planted deterministically — the synthetic docs carry no PII)
# --------------------------------------------------------------------------

PII_EVERY = 5

#: RE2-compatible (no backrefs/lookaround) so Python ``re`` and DuckDB
#: agree match-for-match.
EMAIL_PATTERN = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IP_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _plant_pii(batch: pd.DataFrame) -> pd.DataFrame:
    """Append a deterministic contact line (email + IPv4) to every
    ``doc_id % PII_EVERY == 0`` document."""
    d = batch["doc_id"]
    suffix = (
        " contact user" + d.astype(str) + "@mail.example from host 10."
        + (d % 250).astype(str) + "." + (d % 199).astype(str)
        + "." + (d % 97).astype(str)
    )
    out = batch.copy()
    out["text"] = out["text"].where((d % PII_EVERY) != 0, out["text"] + suffix)
    return out


#: SQL twin of ``_plant_pii`` over the ``documents`` view.
PII_PAGES_CTE = (
    "pii_pages AS (SELECT doc_id, CASE WHEN doc_id % " + str(PII_EVERY)
    + " = 0 THEN text || ' contact user' || doc_id ||"
    " '@mail.example from host 10.' || (doc_id % 250) || '.' ||"
    " (doc_id % 199) || '.' || (doc_id % 97) ELSE text END AS text"
    " FROM documents)"
)


class _PiiScrub:
    """Redact emails then IPv4s; patterns compiled once per worker."""

    def __init__(self):
        self.email = re.compile(EMAIL_PATTERN)
        self.ip = re.compile(IP_PATTERN)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        clean = []
        nred = np.zeros(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            s1, n1 = self.email.subn("<EMAIL>", s)
            s2, n2 = self.ip.subn("<IP>", s1)
            clean.append(s2)
            nred[i] = n1 + n2
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "clean_text": pa.array(clean, pa.string()),
            "n_redactions": pa.array(nred),
        })


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """Redacted corpus: ``(doc_id, clean_text, n_redactions)``."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    planted = docs.map_batches(_plant_pii, batch_format="pandas")
    return planted.map_batches(stage_task(_PiiScrub), batch_format="pyarrow")


def pii_scrub_sql() -> str:
    email = EMAIL_PATTERN.replace("'", "''")
    ip = IP_PATTERN.replace("'", "''")
    return f"""
WITH {PII_PAGES_CTE},
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{email}')) AS n_email,
         regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
  FROM pii_pages)
SELECT doc_id, regexp_replace(t1, '{ip}', '<IP>', 'g') AS clean_text,
       CAST(n_email + len(regexp_extract_all(t1, '{ip}')) AS BIGINT)
         AS n_redactions
FROM s1"""


# --------------------------------------------------------------------------
# Repetition / diversity quality signals (Gopher-style filters)
# --------------------------------------------------------------------------

#: keep docs whose most frequent token is < 15% of all tokens
TOP_TOKEN_KEEP_BP = 1500


def _token_top_counts(texts: list[str]):
    """Per-text (n_tokens, n_distinct_tokens, top_token_count) — THE
    repetition signal both ``repetition_stats`` and ``build_clean_corpus``
    gate on; one definition so the two can never drift."""
    from collections import Counter

    n = len(texts)
    n_tok = np.zeros(n, np.int64)
    n_dis = np.zeros(n, np.int64)
    top = np.zeros(n, np.int64)
    for i, s in enumerate(texts):
        c = Counter(TOKEN_RE.findall(s.lower()))
        n_tok[i] = sum(c.values())
        n_dis[i] = len(c)
        if c:
            top[i] = max(c.values())
    return n_tok, n_dis, top


def _repetition_kernel(t: pa.Table) -> pa.Table:
    texts = t["text"].to_pylist()
    n = len(texts)
    n_tok, n_dis, top = _token_top_counts(texts)
    n_bg = np.zeros(n, np.int64)
    n_dbg = np.zeros(n, np.int64)
    for i, s in enumerate(texts):
        toks = TOKEN_RE.findall(s.lower())
        if len(toks) >= 2:
            bgs = [toks[j] + " " + toks[j + 1] for j in range(len(toks) - 1)]
            n_bg[i] = len(bgs)
            n_dbg[i] = len(set(bgs))
    dt = np.maximum(n_tok, 1)
    db = np.maximum(n_bg, 1)
    ttr = n_dis * 10000 // dt
    topf = top * 10000 // dt
    dupb = (n_bg - n_dbg) * 10000 // db
    return pa.table({
        "doc_id": t["doc_id"].combine_chunks(),
        "n_tokens": pa.array(n_tok),
        "n_distinct_tokens": pa.array(n_dis),
        "top_token_count": pa.array(top),
        "ttr_bp": pa.array(ttr),
        "top_token_frac_bp": pa.array(topf),
        "dup_bigram_frac_bp": pa.array(dupb),
        "keep": pa.array(topf < TOP_TOKEN_KEEP_BP),
    })


def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-doc repetition signals: type-token ratio, most-frequent-token
    fraction, duplicate-bigram fraction (integer basis points) + ``keep``."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(_repetition_kernel, batch_format="pyarrow")


def repetition_stats_sql() -> str:
    return f"""
WITH s AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
           FROM documents),
c AS (SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(t) AS tok FROM s) GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS top_count, count(*) AS n_distinct
        FROM c GROUP BY doc_id),
bg AS (SELECT doc_id, count(*) AS n_bigrams,
              count(DISTINCT t[i] || ' ' || t[i+1]) AS n_distinct_bigrams
       FROM s, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
       GROUP BY doc_id)
SELECT s.doc_id, len(t) AS n_tokens,
       coalesce(top.n_distinct, 0) AS n_distinct_tokens,
       coalesce(top.top_count, 0) AS top_token_count,
       coalesce(top.n_distinct, 0) * 10000 // greatest(len(t), 1) AS ttr_bp,
       coalesce(top.top_count, 0) * 10000 // greatest(len(t), 1)
         AS top_token_frac_bp,
       (coalesce(bg.n_bigrams, 0) - coalesce(bg.n_distinct_bigrams, 0))
         * 10000 // greatest(coalesce(bg.n_bigrams, 0), 1)
         AS dup_bigram_frac_bp,
       coalesce(top.top_count, 0) * 10000 // greatest(len(t), 1)
         < {TOP_TOKEN_KEEP_BP} AS keep
FROM s LEFT JOIN top USING (doc_id) LEFT JOIN bg USING (doc_id)"""


# --------------------------------------------------------------------------
# Corpus-frequency boilerplate: terms in ≥ half of all docs, and their
# removal from every document
# --------------------------------------------------------------------------


def boilerplate_terms(sf_dir: str, *,
                      num_partitions: int = 16) -> ray.data.Dataset:
    """Terms whose document frequency is ≥ half the corpus: ``(term, df)``.

    Same DF-combiner shape as text.top_terms; the threshold filter runs
    inside the term's owning partition (exact — the full count is local),
    so the exchange emits only the boilerplate rows.
    """
    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    n_docs = docs.count()  # parquet metadata read — no scan

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(set(TOKEN_RE.findall(s.lower())))
        terms = np.asarray(list(c.keys()), dtype=object)
        part = key_partition(terms, P)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "df": pa.array(np.fromiter(c.values(), np.int64, len(c))),
            "_part": pa.array(part),
        })

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["term", "_part"]).aggregate([("df", "sum")])
            .rename_columns(["term", "_part", "df"])
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("term", sort=False, as_index=False)["df"].sum()
        return out.loc[2 * out["df"] >= n_docs, ["term", "df"]]

    part_schema = pa.schema([("term", pa.string()), ("df", pa.int64())])
    return hash_exchange(
        [docs.map_batches(partial, batch_format="pyarrow")],
        per_part,
        num_partitions=P,
        schema=part_schema,
        in_schemas=[part_schema],
        pre=[combine],
    )


def boilerplate_terms_sql() -> str:
    return """
WITH u AS (SELECT DISTINCT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents)
SELECT term, count(*) AS df FROM u GROUP BY term
HAVING 2 * count(*) >= (SELECT count(*) FROM documents)"""


class _TokenBlocklist:
    """Drop blocklisted tokens from each doc's token stream; the set is a
    broadcast ObjectRef fetched once per worker."""

    def __init__(self, blocked_ref):
        import ray

        blocked = (
            ray.get(blocked_ref)
            if isinstance(blocked_ref, ray.ObjectRef) else blocked_ref
        )
        self.blocked = frozenset(blocked)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        clean = []
        nrem = np.zeros(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            toks = TOKEN_RE.findall(s.lower())
            kept = [w for w in toks if w not in self.blocked]
            clean.append(" ".join(kept))
            nrem[i] = len(toks) - len(kept)
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "clean_text": pa.array(clean, pa.string()),
            "n_removed": pa.array(nrem),
        })


def remove_boilerplate(sf_dir: str, *,
                       num_partitions: int = 16) -> ray.data.Dataset:
    """Each doc's token stream minus the corpus-boilerplate terms:
    ``(doc_id, clean_text, n_removed)``.

    Two phases: the DF exchange above (small output — bounded by
    vocabulary), driver-collected and re-broadcast via ``ray.put``; then
    one embarrassingly-parallel filter pass over the corpus.
    """
    import ray

    bl = boilerplate_terms(sf_dir, num_partitions=num_partitions)
    terms = sorted(r["term"] for r in bl.take_all())  # ≤ vocabulary size
    ref = ray.put(terms)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        stage_task(_TokenBlocklist, blocked_ref=ref), batch_format="pyarrow"
    )


def remove_boilerplate_sql() -> str:
    return """
WITH s AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
           FROM documents),
u AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM s),
dfreq AS (SELECT tok, count(*) AS df FROM u GROUP BY tok),
bl AS (SELECT tok FROM dfreq
       WHERE 2 * df >= (SELECT count(*) FROM documents)),
ex AS (SELECT doc_id, i, t[i] AS tok
       FROM s, UNNEST(generate_series(1, len(t))) AS g(i)),
k AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
             count(*) AS n
      FROM ex WHERE tok NOT IN (SELECT tok FROM bl) GROUP BY doc_id)
SELECT s.doc_id, coalesce(k.clean_text, '') AS clean_text,
       CAST(len(s.t) - coalesce(k.n, 0) AS BIGINT) AS n_removed
FROM s LEFT JOIN k USING (doc_id)"""


# --------------------------------------------------------------------------
# Eval-benchmark decontamination (n-gram overlap vs a broadcast set)
# --------------------------------------------------------------------------

DECON_NGRAM = 8
BENCH_MOD = 50  # docs with doc_id % BENCH_MOD == 0 form the "benchmark"


def _gram_set(s: str, n: int) -> set[str]:
    toks = TOKEN_RE.findall(s.lower())
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _gram_hash64(grams) -> set[int]:
    """Deterministic 64-bit gram hashes (blake2b-8; NOT Python ``hash``,
    which is per-process salted and would desync workers)."""
    import hashlib

    return {
        int.from_bytes(
            hashlib.blake2b(g.encode(), digest_size=8).digest(), "little")
        for g in grams
    }


class _ContaminationProbe:
    def __init__(self, bench_ref, n: int, hashed: bool = False):
        import ray

        bench = (
            ray.get(bench_ref)
            if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        )
        self.bench = frozenset(bench)
        self.n = n
        self.hashed = hashed

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        hits = np.zeros(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            g = _gram_set(s, self.n)
            if self.hashed:
                g = _gram_hash64(g)
            hits[i] = len(g & self.bench)
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "n_hits": pa.array(hits),
            "contaminated": pa.array(hits > 0),
        })


def decontaminate(sf_dir: str, *, n: int = DECON_NGRAM,
                  bench_mod: int = BENCH_MOD,
                  grams: str = "exact") -> ray.data.Dataset:
    """Flag corpus docs sharing any ``n``-gram with the benchmark set
    (docs with ``doc_id % bench_mod == 0``): ``(doc_id, n_hits,
    contaminated)``.  ``n_hits`` counts the doc's DISTINCT contaminated
    n-grams; benchmark members flag themselves — exactly the docs a
    training run must drop.

    ``grams``: ``"exact"`` broadcasts the benchmark n-gram STRINGS (the
    airtight SQL-oracle mode); ``"hash64"`` is the scale mode — the
    broadcast set carries 8-byte blake2b hashes instead of strings
    (~10-20× smaller for an eval suite's millions of grams), trading an
    ~n²/2⁶⁴ collision false-positive chance for broadcast size.
    """
    import ray

    if grams not in ("exact", "hash64"):
        raise ValueError(f"grams must be 'exact' or 'hash64', got {grams!r}")
    hashed = grams == "hash64"
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out: set[str] = set()
        for s, d in zip(t["text"].to_pylist(), ids):
            if d % bench_mod == 0:
                out |= _gram_set(s, n)
        if hashed:
            return pa.table({"gram": pa.array(
                np.fromiter(_gram_hash64(out), np.uint64, len(out)))})
        return pa.table({"gram": pa.array(list(out), pa.string())})

    grams_ds = docs.map_batches(bench_grams, batch_format="pyarrow")
    bench = frozenset(r["gram"] for r in grams_ds.take_all())
    ref = ray.put(list(bench))
    return docs.map_batches(
        stage_task(_ContaminationProbe, bench_ref=ref, n=n, hashed=hashed),
        batch_format="pyarrow",
    )


def decontaminate_sql(n: int = DECON_NGRAM,
                      bench_mod: int = BENCH_MOD) -> str:
    return f"""
WITH s AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
           FROM documents),
g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS gram
      FROM s, UNNEST(generate_series(1, len(t) - {n - 1})) AS u(i)
      WHERE len(t) >= {n}),
bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {bench_mod} = 0),
hits AS (SELECT doc_id, count(*) AS n_hits FROM g JOIN bg USING (gram)
         GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id"""


# --------------------------------------------------------------------------
# Keep-one-per-near-dup-cluster (the cleaned corpus after near dedup)
# --------------------------------------------------------------------------


def near_dup_keep_first(sf_dir: str, *,
                        threshold: float = 0.7) -> ray.data.Dataset:
    """The surviving page urls after near-dup removal: the deterministic
    representative (min url) of each MinHash/LSH cluster."""
    import pyarrow.compute as pc

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    clusters = near.minhash_dedup_clusters(web_pages(sf_dir),
                                           threshold=threshold)
    return clusters.map_batches(
        lambda t: t.filter(pc.equal(t["url"], t["cluster_id"])),
        batch_format="pyarrow",
    ).select_columns(["url"])


def near_dup_keep_first_sql(threshold: float = 0.7) -> str:
    from data_dedup_ray.oracles import near_dup_clusters_sql

    return (
        "SELECT url FROM (" + near_dup_clusters_sql(threshold)
        + ") q WHERE url = cluster_id"
    )


# --------------------------------------------------------------------------
# Quality-aware representative selection per near-dup cluster
# --------------------------------------------------------------------------


def near_dup_keep_best(
    sf_dir: str, *, threshold: float = 0.7, num_partitions: int = 16
) -> ray.data.Dataset:
    """The highest-quality member of each near-dup cluster:
    ``(cluster_id, url, n_tokens)`` — best = most tokens, ties broken by
    min url.  ``near_dup_keep_first`` keeps a deterministic-but-arbitrary
    representative; a training corpus wants the best one (longest /
    cleanest capture of the page family).

    Shape: cluster assignment (url-keyed) and the per-page quality signal
    (url-keyed, computed in the same pass shape as text.token_stats)
    co-partition on hash(url) in one exchange; the argmax then
    co-partitions on hash(cluster_id) with a per-split-group combiner
    that already collapses to one candidate row per cluster, so the
    second shuffle carries one row per (cluster, split group).
    """
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    P = num_partitions
    pages = web_pages(sf_dir)
    clusters = near.minhash_dedup_clusters(pages, threshold=threshold)

    def _upart(t: pa.Table, col: str) -> pa.Array:
        return pa.array(key_partition(t[col].to_pylist(), P))

    def prep_clusters(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"].combine_chunks(),
            "cluster_id": t["cluster_id"].combine_chunks(),
            "_part": _upart(t, "url"),
        })

    def prep_quality(t: pa.Table) -> pa.Table:
        from data_dedup_ray.stages.minhash import token_counts

        n_tok = token_counts(t["text"], lowercase=True)
        out = pa.table({
            "url": t["url"].combine_chunks(),
            "n_tokens": pa.array(n_tok),
        })
        return out.append_column("_part", _upart(out, "url"))

    def join_q(cdf: pd.DataFrame, qdf: pd.DataFrame) -> pd.DataFrame:
        return cdf.merge(qdf, on="url", how="inner")

    joined_schema = pa.schema([
        ("url", pa.string()), ("cluster_id", pa.string()),
        ("n_tokens", pa.int64()),
    ])
    joined = hash_exchange(
        [
            clusters.map_batches(prep_clusters, batch_format="pyarrow"),
            pages.map_batches(prep_quality, batch_format="pyarrow"),
        ],
        join_q,
        num_partitions=P,
        schema=joined_schema,
        in_schemas=[
            pa.schema([("url", pa.string()), ("cluster_id", pa.string())]),
            pa.schema([("url", pa.string()), ("n_tokens", pa.int64())]),
        ],
    )

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cluster_id", "n_tokens", "url"],
            ascending=[True, False, True], kind="stable",
        )
        return df.groupby("cluster_id", sort=False).head(1)

    def rekey(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _upart(t, "cluster_id"))

    def combine_best(t: pa.Table) -> pa.Table:
        out = _best(t.to_pandas())
        return pa.Table.from_pandas(out, preserve_index=False)

    out_schema = pa.schema([
        ("cluster_id", pa.string()), ("url", pa.string()),
        ("n_tokens", pa.int64()),
    ])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return _best(df)[["cluster_id", "url", "n_tokens"]]

    rekeyed_schema = pa.schema([
        ("url", pa.string()), ("cluster_id", pa.string()),
        ("n_tokens", pa.int64()),
    ])
    return hash_exchange(
        [joined.map_batches(rekey, batch_format="pyarrow")],
        per_part,
        num_partitions=P,
        schema=out_schema,
        in_schemas=[rekeyed_schema],
        pre=[combine_best],
    )


def near_dup_keep_best_sql(threshold: float = 0.7) -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import near_dup_clusters_sql

    # the clusters oracle is a full WITH-RECURSIVE statement; it nests as
    # a CTE body (its inner web_pages shadows the outer one harmlessly)
    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},
clusters AS (
{near_dup_clusters_sql(threshold)}
),
q AS (SELECT url, len(regexp_extract_all(lower(text), '[a-z0-9]+'))
             AS n_tokens
      FROM web_pages)
SELECT cluster_id, url, n_tokens FROM (
  SELECT c.cluster_id, c.url, q.n_tokens,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.n_tokens DESC, c.url) AS rn
  FROM clusters c JOIN q ON q.url = c.url)
WHERE rn = 1"""


def near_dup_keep_medoid(
    sf_dir: str, *, threshold: float = 0.7, num_partitions: int = 16
) -> ray.data.Dataset:
    """The MEDOID of each near-dup cluster: ``(cluster_id, url,
    score_bp)`` where score = Σ floor(jaccard·10⁴) over the member's
    verified intra-cluster edges — the most-central capture of the page
    family (keep_first is arbitrary, keep_best trusts a length proxy;
    the medoid is the member most similar to everything else, the
    canonical-representative rule clustering texts recommend).
    Singleton clusters keep their only member at score 0; ties break on
    min url.

    Shape: ONE extra skinny exchange beyond the cluster pipeline — the
    verified pair list (output-sized) explodes symmetrically and sums
    per member keyed on url together with the cluster assignment; the
    argmax co-partitions on cluster_id with a per-split-group combiner
    (the keep_best machinery)."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    P = num_partitions
    pages = web_pages(sf_dir)
    from data_dedup_ray.pipelines.near import shingle_rows
    sh = shingle_rows(pages).materialize()
    edges = near.minhash_dedup_pairs(pages, threshold=threshold,
                                     sh=sh).materialize()
    clusters = near.minhash_dedup_clusters(pages, threshold=threshold)

    def _upart(t: pa.Table, col: str) -> pa.Array:
        return pa.array(key_partition(t[col].to_pylist(), P))

    def sym_scores(t: pa.Table) -> pa.Table:
        jbp = np.floor(
            t["jaccard"].to_numpy(zero_copy_only=False) * 10000
        ).astype(np.int64)
        ua = t["url_a"].to_numpy(zero_copy_only=False)
        ub = t["url_b"].to_numpy(zero_copy_only=False)
        out = pa.table({
            "url": pa.array(np.concatenate([ua, ub]), pa.string()),
            "s": pa.array(np.concatenate([jbp, jbp])),
        })
        return out.append_column("_part", _upart(out, "url"))

    def prep_clusters(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"].combine_chunks(),
            "cluster_id": t["cluster_id"].combine_chunks(),
            "_part": _upart(t, "url"),
        })

    def join_s(cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        if len(sdf) and "url" in sdf:
            ssum = sdf.groupby("url", as_index=False)["s"].sum()
            m = cdf.merge(ssum, on="url", how="left")
            m["score_bp"] = m["s"].fillna(0).astype(np.int64)
        else:
            m = cdf.copy()
            m["score_bp"] = np.int64(0)
        return m[["url", "cluster_id", "score_bp"]]

    joined = hash_exchange(
        [clusters.map_batches(prep_clusters, batch_format="pyarrow"),
         edges.map_batches(sym_scores, batch_format="pyarrow")],
        join_s, num_partitions=P,
        schema=pa.schema([("url", pa.string()),
                          ("cluster_id", pa.string()),
                          ("score_bp", pa.int64())]),
        in_schemas=[
            pa.schema([("url", pa.string()), ("cluster_id", pa.string())]),
            pa.schema([("url", pa.string()), ("s", pa.int64())]),
        ],
    )

    def _medoid(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster_id", "score_bp", "url"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("cluster_id", sort=False).head(1)

    def rekey(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _upart(t, "cluster_id"))

    def combine(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_medoid(t.to_pandas()),
                                    preserve_index=False)

    return hash_exchange(
        [joined.map_batches(rekey, batch_format="pyarrow")],
        lambda df: _medoid(df)[["cluster_id", "url", "score_bp"]],
        num_partitions=P,
        schema=pa.schema([("cluster_id", pa.string()),
                          ("url", pa.string()),
                          ("score_bp", pa.int64())]),
        in_schemas=[pa.schema([("url", pa.string()),
                               ("cluster_id", pa.string()),
                               ("score_bp", pa.int64())])],
        pre=[combine],
    ).sort("cluster_id")


def near_dup_keep_latest(
    sf_dir: str, *, threshold: float = 0.7, num_partitions: int = 16
) -> ray.data.Dataset:
    """The FRESHEST member of each near-dup cluster: ``(cluster_id,
    url, warc_ts)`` — max capture timestamp, ties min url (the
    recency-wins rule a news/product corpus wants where keep_first's
    arbitrary min-url may be a stale capture).  Same two-exchange shape
    as keep_best with warc_ts as the signal."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    P = num_partitions
    pages = web_pages(sf_dir)
    clusters = near.minhash_dedup_clusters(pages, threshold=threshold)

    def _upart(t: pa.Table, col: str) -> pa.Array:
        return pa.array(key_partition(t[col].to_pylist(), P))

    def prep_clusters(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"].combine_chunks(),
            "cluster_id": t["cluster_id"].combine_chunks(),
            "_part": _upart(t, "url"),
        })

    def prep_ts(t: pa.Table) -> pa.Table:
        out = pa.table({
            "url": t["url"].combine_chunks(),
            "warc_ts": t["warc_ts"].combine_chunks(),
        })
        return out.append_column("_part", _upart(out, "url"))

    joined = hash_exchange(
        [clusters.map_batches(prep_clusters, batch_format="pyarrow"),
         pages.select_columns(["url", "warc_ts"])
              .map_batches(prep_ts, batch_format="pyarrow")],
        lambda cdf, tdf: cdf.merge(tdf, on="url", how="inner"),
        num_partitions=P,
        schema=pa.schema([("url", pa.string()),
                          ("cluster_id", pa.string()),
                          ("warc_ts", pa.timestamp("us"))]),
        in_schemas=[
            pa.schema([("url", pa.string()), ("cluster_id", pa.string())]),
            pa.schema([("url", pa.string()),
                       ("warc_ts", pa.timestamp("us"))]),
        ],
    )

    def _latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["cluster_id", "warc_ts", "url"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("cluster_id", sort=False).head(1)

    def rekey(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _upart(t, "cluster_id"))

    def combine(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_latest(t.to_pandas()),
                                    preserve_index=False)

    return hash_exchange(
        [joined.map_batches(rekey, batch_format="pyarrow")],
        lambda df: _latest(df)[["cluster_id", "url", "warc_ts"]],
        num_partitions=P,
        schema=pa.schema([("cluster_id", pa.string()),
                          ("url", pa.string()),
                          ("warc_ts", pa.timestamp("us"))]),
        in_schemas=[pa.schema([("url", pa.string()),
                               ("cluster_id", pa.string()),
                               ("warc_ts", pa.timestamp("us"))])],
        pre=[combine],
    ).sort("cluster_id")


def near_dup_keep_latest_sql(threshold: float = 0.7) -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import near_dup_clusters_sql

    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},
clusters AS (
{near_dup_clusters_sql(threshold)}
)
SELECT cluster_id, url, warc_ts FROM (
  SELECT c.cluster_id, c.url, w.warc_ts,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY w.warc_ts DESC, c.url) AS rn
  FROM clusters c JOIN web_pages w ON w.url = c.url)
WHERE rn = 1 ORDER BY cluster_id"""


def near_dup_keep_medoid_sql(threshold: float = 0.7) -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import _SHINGLE_CTES, near_dup_clusters_sql

    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},{_SHINGLE_CTES},
clusters AS (
{near_dup_clusters_sql(threshold)}
),
sym AS (SELECT url_a AS url, CAST(floor(j * 10000) AS BIGINT) AS s
        FROM jac WHERE j >= {threshold}
        UNION ALL
        SELECT url_b, CAST(floor(j * 10000) AS BIGINT)
        FROM jac WHERE j >= {threshold}),
scores AS (SELECT url, CAST(sum(s) AS BIGINT) AS score_bp
           FROM sym GROUP BY url)
SELECT cluster_id, url, score_bp FROM (
  SELECT c.cluster_id, c.url,
         coalesce(s.score_bp, 0) AS score_bp,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY coalesce(s.score_bp, 0) DESC,
                                     c.url) AS rn
  FROM clusters c LEFT JOIN scores s ON s.url = c.url)
WHERE rn = 1 ORDER BY cluster_id"""


def near_dup_keep_authoritative(
    sf_dir: str, *, threshold: float = 0.7, iters: int = 3,
    num_partitions: int = 16
) -> ray.data.Dataset:
    """The most AUTHORITATIVE member of each near-dup cluster:
    ``(cluster_id, url, pagerank)`` — best = highest page-level
    exact-integer PageRank (pipelines/linkgraph), ties broken by min
    url.  The link-structure complement to ``near_dup_keep_best``'s
    content signal: among syndicated copies a search/crawl stack keeps
    the page the web points AT, not the longest capture.  Pages outside
    the link graph (family variants that carry no anchors) rank 0, so
    they are kept only when a cluster has no linked member.

    Shape: identical to ``near_dup_keep_best`` — cluster labels and the
    per-page signal co-partition on hash(url) in one exchange (LEFT
    join, missing rank → 0), then the argmax co-partitions on
    hash(cluster_id) with a per-split-group combiner that collapses to
    one candidate row per cluster.  PageRank itself moves only
    ``(url, w)`` rows; no stage touches page text."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import linkgraph, near

    P = num_partitions
    pages = web_pages(sf_dir)
    clusters = near.minhash_dedup_clusters(pages, threshold=threshold)
    pr = linkgraph.pagerank_pages(linkgraph.link_edges(sf_dir), iters=iters)

    def _upart(t: pa.Table, col: str) -> pa.Array:
        return pa.array(key_partition(t[col].to_pylist(), P))

    def prep_clusters(t: pa.Table) -> pa.Table:
        return pa.table({
            "url": t["url"].combine_chunks(),
            "cluster_id": t["cluster_id"].combine_chunks(),
            "_part": _upart(t, "url"),
        })

    def prep_pr(t: pa.Table) -> pa.Table:
        out = pa.table({
            "url": t["url"].combine_chunks(),
            "pagerank": t["pagerank"].combine_chunks(),
        })
        return out.append_column("_part", _upart(out, "url"))

    def join_pr(cdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        m = cdf.merge(pdf, on="url", how="left")
        m["pagerank"] = m["pagerank"].fillna(0).astype(np.int64)
        return m

    joined_schema = pa.schema([
        ("url", pa.string()), ("cluster_id", pa.string()),
        ("pagerank", pa.int64()),
    ])
    joined = hash_exchange(
        [
            clusters.map_batches(prep_clusters, batch_format="pyarrow"),
            pr.map_batches(prep_pr, batch_format="pyarrow"),
        ],
        join_pr,
        num_partitions=P,
        schema=joined_schema,
        in_schemas=[
            pa.schema([("url", pa.string()), ("cluster_id", pa.string())]),
            pa.schema([("url", pa.string()), ("pagerank", pa.int64())]),
        ],
    )

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cluster_id", "pagerank", "url"],
            ascending=[True, False, True], kind="stable",
        )
        return df.groupby("cluster_id", sort=False).head(1)

    def rekey(t: pa.Table) -> pa.Table:
        return t.append_column("_part", _upart(t, "cluster_id"))

    def combine_best(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_best(t.to_pandas()),
                                    preserve_index=False)

    out_schema = pa.schema([
        ("cluster_id", pa.string()), ("url", pa.string()),
        ("pagerank", pa.int64()),
    ])

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return _best(df)[["cluster_id", "url", "pagerank"]]

    rekeyed_schema = pa.schema([
        ("url", pa.string()), ("cluster_id", pa.string()),
        ("pagerank", pa.int64()),
    ])
    return hash_exchange(
        [joined.map_batches(rekey, batch_format="pyarrow")],
        per_part,
        num_partitions=P,
        schema=out_schema,
        in_schemas=[rekeyed_schema],
        pre=[combine_best],
    )


def near_dup_keep_authoritative_sql(threshold: float = 0.7,
                                    iters: int = 3) -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import near_dup_clusters_sql
    from data_dedup_ray.pipelines.linkgraph import pagerank_pages_sql

    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},
clusters AS (
{near_dup_clusters_sql(threshold)}
)
SELECT cluster_id, url, pagerank FROM (
  SELECT c.cluster_id, c.url, COALESCE(p.pagerank, 0) AS pagerank,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY COALESCE(p.pagerank, 0) DESC, c.url)
           AS rn
  FROM clusters c LEFT JOIN ({pagerank_pages_sql(iters)}) p
    ON p.url = c.url)
WHERE rn = 1"""


# --------------------------------------------------------------------------
# Flagship composition: the cleaned training corpus end-to-end
# --------------------------------------------------------------------------

MIN_TOKENS = 10


def build_clean_corpus(
    sf_dir: str, *, threshold: float = 0.7, num_partitions: int = 16
) -> ray.data.Dataset:
    """The corpus a training run would actually consume: one best-quality
    representative per near-dup cluster, minus repetition-degenerate and
    too-short pages.  ``(url, n_tokens)``.

    Composition (each stage is an operator already oracle-checked on its
    own): MinHash/LSH clustering → keep-best representative (argmax
    tokens) → Gopher-style repetition gate (most-frequent-token fraction
    < 15%) → minimum-length gate.  One extra exchange co-partitions the
    representatives with the per-page repetition signal on hash(url);
    everything upstream reuses the shared shingle table, so the corpus
    text is still tokenized exactly once per signal pass.
    """
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.stages.textstats import TOKEN_RE

    P = num_partitions
    best = near_dup_keep_best(
        sf_dir, threshold=threshold, num_partitions=P
    )
    pages = web_pages(sf_dir)

    def _upart(t: pa.Table, col: str) -> pa.Array:
        return pa.array(key_partition(t[col].to_pylist(), P))

    def prep_best(t: pa.Table) -> pa.Table:
        out = pa.table({
            "url": t["url"].combine_chunks(),
            "n_tokens": t["n_tokens"].combine_chunks(),
        })
        return out.append_column("_part", _upart(out, "url"))

    def prep_rep(t: pa.Table) -> pa.Table:
        n_tok, _, top = _token_top_counts(t["text"].to_pylist())
        topf = top * 10000 // np.maximum(n_tok, 1)
        out = pa.table({
            "url": t["url"].combine_chunks(),
            "top_frac_bp": pa.array(topf),
        })
        return out.append_column("_part", _upart(out, "url"))

    def keep(bdf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        m = bdf.merge(rdf, on="url", how="inner")
        out = m[(m["top_frac_bp"] < TOP_TOKEN_KEEP_BP)
                & (m["n_tokens"] >= MIN_TOKENS)]
        return out[["url", "n_tokens"]].reset_index(drop=True)

    return hash_exchange(
        [
            best.map_batches(prep_best, batch_format="pyarrow"),
            pages.map_batches(prep_rep, batch_format="pyarrow"),
        ],
        keep,
        num_partitions=P,
        schema=pa.schema([("url", pa.string()), ("n_tokens", pa.int64())]),
        in_schemas=[
            pa.schema([("url", pa.string()), ("n_tokens", pa.int64())]),
            pa.schema([("url", pa.string()), ("top_frac_bp", pa.int64())]),
        ],
    )


def build_clean_corpus_sql(threshold: float = 0.7) -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.pipelines.clean import near_dup_keep_best_sql

    best = near_dup_keep_best_sql(threshold)
    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},
best AS (
{best}
),
s AS (SELECT url, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM web_pages),
c AS (SELECT url, tok, count(*) AS c
      FROM (SELECT url, unnest(t) AS tok FROM s) GROUP BY 1, 2),
top AS (SELECT url, max(c) AS top FROM c GROUP BY url),
rep AS (SELECT s.url,
               coalesce(top.top, 0) * 10000 // greatest(len(s.t), 1)
                 AS top_frac_bp
        FROM s LEFT JOIN top USING (url))
SELECT b.url, b.n_tokens
FROM best b JOIN rep r ON r.url = b.url
WHERE r.top_frac_bp < {TOP_TOKEN_KEEP_BP} AND b.n_tokens >= {MIN_TOKENS}"""


# --------------------------------------------------------------------------
# Corpus-frequency LINE dedup (sub-document granularity — the
# CCNet/RefinedWeb-style boilerplate-line removal, adapted to the flat
# token streams of the synthetic corpus: a "line" is a positional k-token
# chunk)
# --------------------------------------------------------------------------


def _doc_lines(texts: list, k: int) -> list:
    """Per doc: the list of k-token line strings (last partial kept)."""
    out = []
    for s in texts:
        toks = TOKEN_RE.findall(s) if s else []
        out.append([" ".join(toks[i: i + k])
                    for i in range(0, len(toks), k)])
    return out


def line_dedup(sf_dir: str, *, k: int = 10, max_df: int = 2,
               num_partitions: int = 16) -> ray.data.Dataset:
    """``(doc_id, clean_text, n_removed)`` — remove every line that occurs
    in MORE than ``max_df`` distinct documents, then reassemble each doc
    from its kept lines (in order, single-space joined).

    Scale shape: only 8-byte line HASHES enter the DF shuffle (line text
    is regenerated locally at rebuild time); the per-batch partial counts
    distinct docs per line (a doc's rows never split across batches), the
    exchange sums partials and thresholds inside the owning partition,
    and the resulting common-line set — boilerplate-sized by definition —
    is broadcast once via ``ray.put`` for the rebuild pass."""
    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for lines in _doc_lines(t["text"].to_pylist(), k):
            if lines:
                c.update(set(pd.util.hash_array(
                    np.asarray(list(set(lines)), dtype=object)).tolist()))
        lh = np.fromiter(c.keys(), np.uint64, len(c))
        return pa.table({
            "lh": pa.array(lh.view(np.int64)),
            "df": pa.array(np.fromiter(c.values(), np.int64, len(c))),
            "_part": pa.array((lh % np.uint64(P)).astype(np.int64)),
        })

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["lh", "_part"]).aggregate([("df", "sum")])
            .rename_columns(["lh", "_part", "df"])
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("lh", sort=False, as_index=False)["df"].sum()
        return out.loc[out["df"] > max_df, ["lh"]]

    common = hash_exchange(
        [docs.map_batches(partial, batch_format="pyarrow")],
        per_part,
        num_partitions=P,
        schema=pa.schema([("lh", pa.int64())]),
        in_schemas=[pa.schema([("lh", pa.int64()), ("df", pa.int64())])],
        pre=[combine],
    ).to_pandas()
    import ray as _ray

    # an all-empty exchange can round-trip to a column-less DataFrame
    blocked_set = (
        frozenset(common["lh"].to_numpy().view(np.uint64).tolist())
        if len(common) else frozenset()
    )
    ref = _ray.put(blocked_set)

    def rebuild(t: pa.Table) -> pa.Table:
        blocked = _ray.get(ref)
        texts = t["text"].to_pylist()
        clean, removed = [], []
        for lines in _doc_lines(texts, k):
            if not lines:
                clean.append("")
                removed.append(0)
                continue
            lhs = pd.util.hash_array(np.asarray(lines, dtype=object))
            keep = [ln for ln, h in zip(lines, lhs.tolist())
                    if h not in blocked]
            clean.append(" ".join(keep))
            removed.append(len(lines) - len(keep))
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "clean_text": pa.array(clean, pa.string()),
            "n_removed": pa.array(removed, pa.int64()),
        })

    return docs.map_batches(rebuild, batch_format="pyarrow")


def line_dedup_sql(k: int = 10, max_df: int = 2) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS t FROM documents),
lines AS (
  SELECT doc_id, g.i AS line_idx,
         array_to_string(t[(g.i - 1) * {k} + 1 : g.i * {k}], ' ') AS line
  FROM toks, UNNEST(generate_series(
      1, CAST(ceil(len(t) / {k}.0) AS BIGINT))) AS g(i)
  WHERE len(t) > 0),
common AS (
  SELECT line FROM lines GROUP BY line
  HAVING count(DISTINCT doc_id) > {max_df}),
kept AS (
  SELECT l.doc_id,
         string_agg(l.line, ' ' ORDER BY l.line_idx)
           FILTER (WHERE c.line IS NULL) AS clean_text,
         count(*) FILTER (WHERE c.line IS NOT NULL) AS n_removed
  FROM lines l LEFT JOIN common c USING (line)
  GROUP BY l.doc_id)
SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text,
       CAST(coalesce(k.n_removed, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN kept k USING (doc_id)"""


# --------------------------------------------------------------------------
# Keep-FIRST passage dedup (MassiveText/Gopher-style exact sub-document
# dedup): unlike line_dedup's DF-threshold removal of EVERY occurrence of
# a common line, keep-first removes all but the globally first occurrence
# (ordered by doc_id, then position) of each duplicated passage — the
# semantics used when duplicated content is valuable once.
# --------------------------------------------------------------------------


def _passage_occurrences(k: int, num_partitions: int):
    """Batch fn: one (lh, pack, _part) row per passage occurrence — 8-byte
    line hash plus doc_id·2³²+pos packed ordinal; text never leaves the
    batch."""
    P = num_partitions

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        lhs, packs = [], []
        for did, lines in zip(ids, _doc_lines(t["text"].to_pylist(), k)):
            if not lines:
                continue
            lhs.append(pd.util.hash_array(np.asarray(lines, dtype=object)))
            packs.append(np.int64(did) << np.int64(32)
                         | np.arange(len(lines), dtype=np.int64))
        lh = (np.concatenate(lhs) if lhs else np.empty(0, np.uint64))
        pk = (np.concatenate(packs) if packs else np.empty(0, np.int64))
        return pa.table({
            "lh": pa.array(lh.view(np.int64)),
            "pack": pa.array(pk),
            "_part": pa.array((lh % np.uint64(P)).astype(np.int64)),
        })

    return fn


def _rebuild_from_removals(t: pa.Table, removed: np.ndarray,
                           k: int) -> pa.Table:
    """Reassemble each doc from its kept passages; ``removed`` is a SORTED
    int64 array of packed (doc_id·2³² + pos) removal ordinals.  Membership
    is one vectorized searchsorted over all occurrences in the batch."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    docs_lines = _doc_lines(t["text"].to_pylist(), k)
    clean, n_removed = [], np.zeros(len(ids), dtype=np.int64)
    for i, (did, lines) in enumerate(zip(ids, docs_lines)):
        if not lines:
            clean.append("")
            continue
        packs = (np.int64(did) << np.int64(32)
                 | np.arange(len(lines), dtype=np.int64))
        if len(removed):
            pos = np.searchsorted(removed, packs)
            hit = (pos < len(removed)) & (removed[np.minimum(
                pos, len(removed) - 1)] == packs)
        else:
            hit = np.zeros(len(lines), dtype=bool)
        clean.append(" ".join(ln for ln, h in zip(lines, hit) if not h))
        n_removed[i] = int(hit.sum())
    return pa.table({
        "doc_id": t["doc_id"].combine_chunks(),
        "clean_text": pa.array(clean, pa.string()),
        "n_removed": pa.array(n_removed),
    })


def passage_dedup_keep_first(
    sf_dir: str, *, k: int = 10, num_partitions: int = 16,
    broadcast_max_removals: int = 5_000_000,
) -> ray.data.Dataset:
    """``(doc_id, clean_text, n_removed)`` — every duplicated passage kept
    only at its globally FIRST occurrence (min packed (doc_id, pos) per
    line hash), docs reassembled from the survivors in order.

    Scale shape: occurrences ship 16-byte hash-only rows through ONE
    exchange; the winner per line hash is a vectorized groupby-min inside
    the owning partition, and only the REMOVALS (duplicate-occurrence-
    sized) come back.  Below ``broadcast_max_removals`` the removal set is
    broadcast once via ``ray.put`` and the rebuild is a second streaming
    pass over the corpus (text never shuffled); past the guard the docs
    and removals are co-partitioned on doc_id instead — text then moves
    through exactly one exchange, never collected on the driver.

    64-bit line-hash caveat (same exposure as ``line_dedup``): two
    distinct passages colliding under ``pd.util.hash_array`` would dedup
    as one; at 10¹² lines use a 128-bit hash here."""
    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def removals_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"pack": pd.Series([], dtype="int64")})
        win = df.groupby("lh", sort=False)["pack"].transform("min")
        return df.loc[df["pack"].to_numpy() != win.to_numpy(), ["pack"]]

    removals = hash_exchange(
        [docs.map_batches(_passage_occurrences(k, P),
                          batch_format="pyarrow")],
        removals_part,
        num_partitions=P,
        schema=pa.schema([("pack", pa.int64())]),
        in_schemas=[pa.schema([("lh", pa.int64()), ("pack", pa.int64())])],
    ).materialize()

    if removals.count() <= broadcast_max_removals:
        rem = removals.to_pandas()
        arr = (np.sort(rem["pack"].to_numpy())
               if len(rem) else np.empty(0, np.int64))
        import ray as _ray

        ref = _ray.put(arr)

        def rebuild(t: pa.Table) -> pa.Table:
            return _rebuild_from_removals(t, _ray.get(ref), k)

        return docs.map_batches(rebuild, batch_format="pyarrow")

    # big-removal fallback: co-partition docs and removals on doc_id
    def prep_docs(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "_part", pa.array((ids % P).astype(np.int64)))

    def prep_rem(t: pa.Table) -> pa.Table:
        did = np.right_shift(t["pack"].to_numpy(), 32)
        return t.append_column(
            "_part", pa.array((did % P).astype(np.int64)))

    def fin(d: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        arr = (np.sort(r["pack"].to_numpy())
               if len(r) else np.empty(0, np.int64))
        if not len(d):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "clean_text": pd.Series([], dtype=object),
                                 "n_removed": pd.Series([], dtype="int64")})
        return _rebuild_from_removals(
            pa.Table.from_pandas(d, preserve_index=False), arr, k
        ).to_pandas()

    return hash_exchange(
        [docs.map_batches(prep_docs, batch_format="pyarrow"),
         removals.map_batches(prep_rem, batch_format="pyarrow")],
        fin,
        num_partitions=P,
        schema=pa.schema([("doc_id", pa.int64()),
                          ("clean_text", pa.string()),
                          ("n_removed", pa.int64())]),
        in_schemas=[pa.schema([("doc_id", pa.int64()),
                               ("text", pa.string())]),
                    pa.schema([("pack", pa.int64())])],
    )


def passage_dedup_keep_first_sql(k: int = 10) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS t FROM documents),
lines AS (
  SELECT doc_id, g.i AS line_idx,
         array_to_string(t[(g.i - 1) * {k} + 1 : g.i * {k}], ' ') AS line
  FROM toks, UNNEST(generate_series(
      1, CAST(ceil(len(t) / {k}.0) AS BIGINT))) AS g(i)
  WHERE len(t) > 0),
ranked AS (
  SELECT doc_id, line_idx, line,
         row_number() OVER (PARTITION BY line
                            ORDER BY doc_id, line_idx) AS rn
  FROM lines),
kept AS (
  SELECT doc_id,
         string_agg(line, ' ' ORDER BY line_idx)
           FILTER (WHERE rn = 1) AS clean_text,
         count(*) FILTER (WHERE rn > 1) AS n_removed
  FROM ranked GROUP BY doc_id)
SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text,
       CAST(coalesce(k.n_removed, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN kept k USING (doc_id)"""
