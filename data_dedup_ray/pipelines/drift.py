"""Cross-crawl token-distribution DRIFT — the corpus-health check a
rolling web pipeline runs before pointing a training mix at a new crawl.

Given two crawls A (the reference, e.g. last month's web_pages) and B
(the candidate, e.g. this month's re-crawl), report how far B's token
frequency distribution has moved:

- ``tv_bp``          — total-variation distance in basis points,
                       ``TV = 1/2 * sum_t |p_t - q_t|``.  With integer
                       counts this is EXACT: ``10^4 * sum|c_a*N_b -
                       c_b*N_a| // (2*N_a*N_b)`` — one big-integer floor
                       division, no float ever (the repo's standing
                       basis-point discipline).
- ``oov_mass_b_bp``  — fraction of B's token OCCURRENCES whose token
                       was never seen in A (out-of-vocabulary mass —
                       the quantity that breaks a tokenizer/LM fit on A).
- vocab sizes / overlap / new-vocabulary count, plus both totals.

Scale shape: tokens are 64-bit polars string hashes from the moment of
tokenization (stages/minhash.tokenize_batch — the same convention the
tf-idf and shingle pipelines ship), so the ONLY shuffle moves
``(hash, partial_count)`` rows pre-combined per batch: vocabulary-sized,
never corpus-sized.  The merged ``(tok, c_a, c_b)`` frequency table is
a first-class Dataset (``token_freq_table``) usable on its own; the
drift row is two bounded passes over it (a 2-scalar sum, then P
partition partials whose big-integer numerators travel as decimal
strings so a 10^13-token crawl cannot overflow int64 — only the P-row
partial table ever reaches the driver).

The SQL twin (``crawl_drift_sql``) restates everything over token
STRINGS with DuckDB HUGEINT arithmetic; parity therefore also witnesses
that the hashed vocabulary is collision-free on the test corpus, the
same evidence contract as ``tf_cosine_pairs``.

North_rule extension surface (SURVEY §8): distribution-shift gating for
rolling crawls (cf. the corpus-comparison statistics in Kilgarriff 2001,
"Comparing Corpora" — TV distance is his rank-free baseline measure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

_FREQ_SCHEMA = pa.schema([
    ("tok", pa.int64()), ("c_a", pa.int64()), ("c_b", pa.int64()),
])

_PARTIAL_IN = pa.schema([("tok", pa.int64()), ("c", pa.int64())])

_DRIFT_SCHEMA = pa.schema([
    ("n_tokens_a", pa.int64()), ("n_tokens_b", pa.int64()),
    ("vocab_a", pa.int64()), ("vocab_b", pa.int64()),
    ("vocab_shared", pa.int64()), ("new_vocab_b", pa.int64()),
    ("oov_mass_b_bp", pa.int64()), ("tv_bp", pa.int64()),
])


def _count_batches(text_col: str, P: int):
    """Per-batch token-count combiner: (tok, partial c) rows."""
    from data_dedup_ray.stages.minhash import tokenize_batch

    def fn(t: pa.Table) -> pa.Table:
        hashes, _ = tokenize_batch(t[text_col].combine_chunks())
        toks, counts = np.unique(hashes, return_counts=True)
        toks = toks.view(np.int64)
        return pa.table({
            "tok": toks, "c": counts.astype(np.int64),
            "_part": (toks.view(np.uint64) % np.uint64(P)).astype(np.int64),
        })
    return fn


def _merged_freqs(stage_a: ray.data.Dataset,
                  stage_b: ray.data.Dataset,
                  P: int) -> ray.data.Dataset:
    """Full-outer merge of two ``(tok, c, _part)`` count streams."""

    def merge(da: pd.DataFrame, db: pd.DataFrame) -> pd.DataFrame:
        # per-split-group combiners mean partial rows repeat per token:
        # re-aggregate here (the hash_exchange `pre` contract)
        ca = da.groupby("tok", sort=False, as_index=False)["c"].sum()
        cb = db.groupby("tok", sort=False, as_index=False)["c"].sum()
        v = ca.merge(cb, on="tok", how="outer", suffixes=("_a", "_b"))
        return pd.DataFrame({
            "tok": v["tok"].astype(np.int64),
            "c_a": v["c_a"].fillna(0).astype(np.int64),
            "c_b": v["c_b"].fillna(0).astype(np.int64),
        })

    return hash_exchange(
        [stage_a, stage_b], merge, num_partitions=P,
        schema=_FREQ_SCHEMA, in_schemas=[_PARTIAL_IN, _PARTIAL_IN],
    )


def token_freq_table(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    *,
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Merged per-token occurrence counts ``(tok, c_a, c_b)`` for two
    crawls — full outer over the two hashed vocabularies."""
    P = num_partitions
    return _merged_freqs(
        a.map_batches(_count_batches(text_col, P),
                      batch_format="pyarrow"),
        b.map_batches(_count_batches(text_col, P),
                      batch_format="pyarrow"),
        P)


def crawl_drift(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    *,
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """One drift row (``_DRIFT_SCHEMA``) grading crawl ``b`` against
    reference crawl ``a``."""
    return _drift_row(token_freq_table(
        a, b, text_col=text_col, num_partitions=num_partitions,
    ).materialize())


def _drift_row(v: ray.data.Dataset) -> ray.data.Dataset:
    """Metric row over a materialized ``(tok, c_a, c_b)`` table."""
    tot = v.sum(["c_a", "c_b"]) or {"sum(c_a)": 0, "sum(c_b)": 0}
    na, nb = int(tot["sum(c_a)"] or 0), int(tot["sum(c_b)"] or 0)

    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        c_a, c_b = df["c_a"].to_numpy(), df["c_b"].to_numpy()
        # |c_a*nb - c_b*na| in arbitrary precision: object dtype keeps
        # Python ints elementwise, so 10^13-token crawls can't overflow
        tv_num = int(np.abs(
            c_a.astype(object) * nb - c_b.astype(object) * na).sum())
        return pa.table({
            "vocab_a": [int((c_a > 0).sum())],
            "vocab_b": [int((c_b > 0).sum())],
            "vocab_shared": [int(((c_a > 0) & (c_b > 0)).sum())],
            "new_vocab_b": [int(((c_a == 0) & (c_b > 0)).sum())],
            "oov_mass_b": [int(c_b[c_a == 0].sum())],
            "tv_num": [str(tv_num)],
        })

    p = v.map_batches(partials, batch_format="pyarrow").to_pandas()
    tv_num = sum(int(s) for s in p["tv_num"]) if len(p) else 0
    oov_b = int(p["oov_mass_b"].sum()) if len(p) else 0
    return ray.data.from_arrow(pa.table({
        "n_tokens_a": [na], "n_tokens_b": [nb],
        "vocab_a": [int(p["vocab_a"].sum()) if len(p) else 0],
        "vocab_b": [int(p["vocab_b"].sum()) if len(p) else 0],
        "vocab_shared": [int(p["vocab_shared"].sum()) if len(p) else 0],
        "new_vocab_b": [int(p["new_vocab_b"].sum()) if len(p) else 0],
        "oov_mass_b_bp": [10000 * oov_b // max(nb, 1)],
        "tv_bp": [10000 * tv_num // max(2 * na * nb, 1)],
    }, schema=_DRIFT_SCHEMA))


def build_vocab_store(
    ds: ray.data.Dataset,
    path: str,
    *,
    text_col: str = "text",
    num_partitions: int = 32,
):
    """Persist a crawl's token-frequency vocabulary ``(tok, c)`` as a
    resumable store — the 4th tier of the incremental state ladder
    (content-sha 32 B, simhash 8 B, minhash signatures ~1 KB, and now
    the vocab table: VOCABULARY-sized, not corpus-sized).  A standing
    drift gate then grades every new crawl against it without ever
    re-reading the old crawl's text (``incremental_drift``)."""
    from data_dedup_ray.state.sink import resumable_write_parquet

    P = num_partitions

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("tok", sort=False, as_index=False)["c"].sum()

    counts = hash_exchange(
        [ds.map_batches(_count_batches(text_col, P),
                        batch_format="pyarrow")],
        agg, num_partitions=P,
        schema=pa.schema([("tok", pa.int64()), ("c", pa.int64())]),
        in_schemas=[_PARTIAL_IN],
    )
    return resumable_write_parquet(
        counts, path, key_col="tok", num_partitions=P,
        config={"kind": "vocab_store", "text_col": text_col},
    )


def incremental_drift(
    new_ds: ray.data.Dataset,
    store_path: str | list[str],
    *,
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """``crawl_drift`` with the REFERENCE side read from a persisted
    vocab store instead of re-tokenizing the old crawl — byte-identical
    output to the live pipeline (the store holds exact counts), at
    vocabulary-sized read cost."""
    from data_dedup_ray.pipelines.fpstore import _read_store

    P = num_partitions

    def from_store(t: pa.Table) -> pa.Table:
        toks = t["tok"].to_numpy(zero_copy_only=False)
        return pa.table({
            "tok": toks, "c": t["c"].combine_chunks(),
            "_part": (toks.view(np.uint64)
                      % np.uint64(P)).astype(np.int64),
        })

    return _drift_row(_merged_freqs(
        _read_store(store_path if isinstance(store_path, list)
                    else [store_path])
        .map_batches(from_store, batch_format="pyarrow"),
        new_ds.map_batches(_count_batches(text_col, P),
                           batch_format="pyarrow"),
        P).materialize())


_LANG_DRIFT_SCHEMA = pa.schema([("lang", pa.string())]
                               + list(_DRIFT_SCHEMA))

_LANG_PARTIAL_IN = pa.schema([
    ("lang", pa.string()), ("tok", pa.int64()), ("c", pa.int64()),
])

_LANG_FREQ_SCHEMA = pa.schema([
    ("lang", pa.string()), ("tok", pa.int64()),
    ("c_a", pa.int64()), ("c_b", pa.int64()),
])


def crawl_drift_by_lang(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    *,
    lang_col: str = "lang",
    text_col: str = "text",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-LANGUAGE drift rows — the CCNet-shaped variant: a rolling
    multilingual pipeline shards by language, so the shift gate must
    too (aggregate drift hides a single language collapsing).  One row
    per language present in either crawl, same metrics as
    ``crawl_drift`` with per-language totals.

    Same scale shape: the exchange is keyed on the token hash (same
    token ⇒ same partition ⇒ every ``(lang, tok)`` pair co-located),
    vocabulary-sized; the driver sees language-count-sized rollups
    only."""
    P = num_partitions

    def count_by_lang(t: pa.Table) -> pa.Table:
        from data_dedup_ray.stages.minhash import tokenize_batch

        hashes, counts = tokenize_batch(t[text_col].combine_chunks())
        langs = np.repeat(
            t[lang_col].to_numpy(zero_copy_only=False), counts)
        df = pd.DataFrame({"lang": langs,
                           "tok": hashes.view(np.int64)})
        # NULL langs go to the lang-id module's unknown tag on BOTH
        # sides (SQL: coalesce(lang,'und')); a plain groupby would
        # silently DROP them (pandas dropna default)
        df["lang"] = df["lang"].fillna("und")
        g = df.groupby(["lang", "tok"], sort=False,
                       as_index=False).size()
        toks = g["tok"].to_numpy()
        return pa.table({
            "lang": g["lang"].astype(str),
            "tok": toks,
            "c": g["size"].astype(np.int64),
            "_part": (toks.view(np.uint64)
                      % np.uint64(P)).astype(np.int64),
        })

    def merge(da: pd.DataFrame, db: pd.DataFrame) -> pd.DataFrame:
        ca = da.groupby(["lang", "tok"], sort=False,
                        as_index=False)["c"].sum()
        cb = db.groupby(["lang", "tok"], sort=False,
                        as_index=False)["c"].sum()
        v = ca.merge(cb, on=["lang", "tok"], how="outer",
                     suffixes=("_a", "_b"))
        return pd.DataFrame({
            "lang": v["lang"], "tok": v["tok"].astype(np.int64),
            "c_a": v["c_a"].fillna(0).astype(np.int64),
            "c_b": v["c_b"].fillna(0).astype(np.int64),
        })

    v = hash_exchange(
        [a.map_batches(count_by_lang, batch_format="pyarrow"),
         b.map_batches(count_by_lang, batch_format="pyarrow")],
        merge,
        num_partitions=P,
        schema=_LANG_FREQ_SCHEMA,
        in_schemas=[_LANG_PARTIAL_IN, _LANG_PARTIAL_IN],
    ).materialize()

    # pass 1: per-language totals (language-count-sized rollup)
    def tot_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("lang", as_index=False)[
            ["c_a", "c_b"]].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    tot = (v.map_batches(tot_partial, batch_format="pyarrow")
            .to_pandas().groupby("lang")[["c_a", "c_b"]].sum())
    na = {l: int(r["c_a"]) for l, r in tot.iterrows()}
    nb = {l: int(r["c_b"]) for l, r in tot.iterrows()}

    # pass 2: per-(partition, language) partials with big-int TV
    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        rows = []
        for lang, g in df.groupby("lang"):
            c_a, c_b = g["c_a"].to_numpy(), g["c_b"].to_numpy()
            tv_num = int(np.abs(
                c_a.astype(object) * nb[lang]
                - c_b.astype(object) * na[lang]).sum())
            rows.append({
                "lang": lang,
                "vocab_a": int((c_a > 0).sum()),
                "vocab_b": int((c_b > 0).sum()),
                "vocab_shared": int(((c_a > 0) & (c_b > 0)).sum()),
                "new_vocab_b": int(((c_a == 0) & (c_b > 0)).sum()),
                "oov_mass_b": int(c_b[c_a == 0].sum()),
                "tv_num": str(tv_num),
            })
        return pa.Table.from_pylist(rows) if rows else pa.table({
            "lang": pa.array([], pa.string()),
            "vocab_a": pa.array([], pa.int64()),
            "vocab_b": pa.array([], pa.int64()),
            "vocab_shared": pa.array([], pa.int64()),
            "new_vocab_b": pa.array([], pa.int64()),
            "oov_mass_b": pa.array([], pa.int64()),
            "tv_num": pa.array([], pa.string()),
        })

    p = v.map_batches(partials, batch_format="pyarrow").to_pandas()
    out = []
    for lang in sorted(na):
        g = p[p["lang"] == lang]
        tv_num = sum(int(s) for s in g["tv_num"])
        oov = int(g["oov_mass_b"].sum()) if len(g) else 0
        out.append({
            "lang": lang,
            "n_tokens_a": na[lang], "n_tokens_b": nb[lang],
            "vocab_a": int(g["vocab_a"].sum()),
            "vocab_b": int(g["vocab_b"].sum()),
            "vocab_shared": int(g["vocab_shared"].sum()),
            "new_vocab_b": int(g["new_vocab_b"].sum()),
            "oov_mass_b_bp": 10000 * oov // max(nb[lang], 1),
            "tv_bp": (10000 * tv_num
                      // max(2 * na[lang] * nb[lang], 1)),
        })
    return ray.data.from_arrow(
        pa.Table.from_pylist(out, schema=_LANG_DRIFT_SCHEMA)
        if out else _LANG_DRIFT_SCHEMA.empty_table())


def crawl_drift_by_lang_sql() -> str:
    """DuckDB twin of ``crawl_drift_by_lang(web_pages, snapshot2)``."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    return snapshots_sql("""
, ta AS (SELECT coalesce(lang, 'und') AS lang,
                unnest(regexp_extract_all(text, '[a-z0-9]+'))
                AS tok FROM web_pages),
tb AS (SELECT coalesce(lang, 'und') AS lang,
              unnest(regexp_extract_all(text, '[a-z0-9]+'))
              AS tok FROM snapshot2),
ca AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c_a
       FROM ta GROUP BY lang, tok),
cb AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c_b
       FROM tb GROUP BY lang, tok),
v AS (
  SELECT coalesce(ca.lang, cb.lang) AS lang,
         coalesce(ca.c_a, 0) AS c_a, coalesce(cb.c_b, 0) AS c_b
  FROM ca FULL JOIN cb ON ca.lang = cb.lang AND ca.tok = cb.tok),
m AS (
  SELECT lang, sum(c_a) AS na, sum(c_b) AS nb,
         sum(CASE WHEN c_a > 0 THEN 1 ELSE 0 END) AS vocab_a,
         sum(CASE WHEN c_b > 0 THEN 1 ELSE 0 END) AS vocab_b,
         sum(CASE WHEN c_a > 0 AND c_b > 0 THEN 1 ELSE 0 END)
           AS vocab_shared,
         sum(CASE WHEN c_a = 0 AND c_b > 0 THEN 1 ELSE 0 END)
           AS new_vocab_b,
         sum(CASE WHEN c_a = 0 THEN c_b ELSE 0 END) AS oov_mass_b
  FROM v GROUP BY lang),
tv AS (
  SELECT v.lang, sum(abs(v.c_a * m.nb - v.c_b * m.na)) AS tv_num
  FROM v JOIN m ON v.lang = m.lang GROUP BY v.lang)
SELECT m.lang,
       CAST(m.na AS BIGINT) AS n_tokens_a,
       CAST(m.nb AS BIGINT) AS n_tokens_b,
       CAST(m.vocab_a AS BIGINT) AS vocab_a,
       CAST(m.vocab_b AS BIGINT) AS vocab_b,
       CAST(m.vocab_shared AS BIGINT) AS vocab_shared,
       CAST(m.new_vocab_b AS BIGINT) AS new_vocab_b,
       CAST(10000 * m.oov_mass_b // greatest(m.nb, 1) AS BIGINT)
         AS oov_mass_b_bp,
       CAST(10000 * tv.tv_num // greatest(2 * m.na * m.nb, 1) AS BIGINT)
         AS tv_bp
FROM m JOIN tv ON m.lang = tv.lang""")


def crawl_drift_sql() -> str:
    """DuckDB twin of ``crawl_drift(web_pages, snapshot2)`` — token
    strings instead of hashes, HUGEINT products, identical floor
    divisions."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    return snapshots_sql("""
, ta AS (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
         FROM web_pages),
tb AS (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
       FROM snapshot2),
ca AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_a FROM ta GROUP BY tok),
cb AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_b FROM tb GROUP BY tok),
v AS (
  SELECT coalesce(ca.c_a, 0) AS c_a, coalesce(cb.c_b, 0) AS c_b
  FROM ca FULL JOIN cb ON ca.tok = cb.tok),
m AS (
  SELECT sum(c_a) AS na, sum(c_b) AS nb,
         sum(CASE WHEN c_a > 0 THEN 1 ELSE 0 END) AS vocab_a,
         sum(CASE WHEN c_b > 0 THEN 1 ELSE 0 END) AS vocab_b,
         sum(CASE WHEN c_a > 0 AND c_b > 0 THEN 1 ELSE 0 END)
           AS vocab_shared,
         sum(CASE WHEN c_a = 0 AND c_b > 0 THEN 1 ELSE 0 END)
           AS new_vocab_b,
         sum(CASE WHEN c_a = 0 THEN c_b ELSE 0 END) AS oov_mass_b
  FROM v),
tv AS (SELECT sum(abs(v.c_a * m.nb - v.c_b * m.na)) AS tv_num FROM v, m)
SELECT CAST(m.na AS BIGINT) AS n_tokens_a,
       CAST(m.nb AS BIGINT) AS n_tokens_b,
       CAST(m.vocab_a AS BIGINT) AS vocab_a,
       CAST(m.vocab_b AS BIGINT) AS vocab_b,
       CAST(m.vocab_shared AS BIGINT) AS vocab_shared,
       CAST(m.new_vocab_b AS BIGINT) AS new_vocab_b,
       CAST(10000 * m.oov_mass_b // greatest(m.nb, 1) AS BIGINT)
         AS oov_mass_b_bp,
       CAST(10000 * tv.tv_num // greatest(2 * m.na * m.nb, 1) AS BIGINT)
         AS tv_bp
FROM m, tv""")


# --------------------------------------------------------------------------
# Dedup distribution shift: what keep-first removal does to the corpus
# --------------------------------------------------------------------------


def dedup_drift(
    sf_dir: str, *, threshold: float = 0.7, num_partitions: int = 16,
) -> ray.data.Dataset:
    """One drift row grading the KEEP-FIRST-DEDUPED corpus against the
    raw crawl — the audit a data team reads before shipping a dedup
    config: how much token mass does removal delete (``n_tokens_b`` vs
    ``n_tokens_a``), does any vocabulary vanish (``vocab_b`` vs
    ``vocab_a``), and how far does the token DISTRIBUTION move
    (``tv_bp`` — SoftDedup's motivation: aggressive dedup reshapes the
    distribution, not just the volume).  ``new_vocab_b`` and
    ``oov_mass_b_bp`` are structurally 0 (survivors ⊆ corpus) — the
    oracle pins that law too.

    Composition: MinHash/LSH clusters → keep-first survivors (min-url
    representative, the near_dup_keep_first contract) → ONE url-keyed
    semi-join exchange attaches survivor text → the shared drift
    machinery.  The semi-join is the one place survivor TEXT transits
    the object store (unavoidable: the survivor distribution must be
    re-counted); everything else is the vocabulary-sized drift shuffle."""
    import pyarrow.compute as pc

    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    P = num_partitions
    pages = web_pages(sf_dir).select_columns(["url", "text"])
    clusters = near.minhash_dedup_clusters(web_pages(sf_dir),
                                           threshold=threshold)
    keep = clusters.map_batches(
        lambda t: t.filter(pc.equal(t["url"], t["cluster_id"]))
        .select(["url"]),
        batch_format="pyarrow",
    )

    def part_on_url(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(key_partition(
            t["url"].to_numpy(zero_copy_only=False), P)))

    def semi(pg: pd.DataFrame, kp: pd.DataFrame) -> pd.DataFrame:
        if not len(pg) or not len(kp):
            return pd.DataFrame({"url": pd.Series(dtype=object),
                                 "text": pd.Series(dtype=object)})
        return pg[pg["url"].isin(set(kp["url"]))]

    kept_pages = hash_exchange(
        [pages.map_batches(part_on_url, batch_format="pyarrow"),
         keep.map_batches(part_on_url, batch_format="pyarrow")],
        semi, num_partitions=P,
        schema=pa.schema([("url", pa.string()), ("text", pa.string())]),
        in_schemas=[pa.schema([("url", pa.string()),
                               ("text", pa.string())]),
                    pa.schema([("url", pa.string())])],
    )
    return crawl_drift(pages, kept_pages, num_partitions=P)


def dedup_drift_sql(threshold: float = 0.7) -> str:
    """DuckDB twin of ``dedup_drift``: the keep-first survivor set
    (``clean.near_dup_keep_first_sql`` nested as a subquery, its own
    recursive closure in scope) semi-joined to web_pages for the B
    side, then the exact token-string drift tail shared with
    ``crawl_drift_sql``."""
    from data_dedup_ray.corpus import web_pages_sql
    from data_dedup_ray.pipelines.clean import near_dup_keep_first_sql

    keep = near_dup_keep_first_sql(threshold)
    return web_pages_sql(f"""
, keep AS (SELECT url FROM ({keep}) k),
ta AS (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
       FROM web_pages),
tb AS (SELECT unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
       FROM web_pages JOIN keep USING (url)),
ca AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_a FROM ta GROUP BY tok),
cb AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_b FROM tb GROUP BY tok),
v AS (
  SELECT coalesce(ca.c_a, 0) AS c_a, coalesce(cb.c_b, 0) AS c_b
  FROM ca FULL JOIN cb ON ca.tok = cb.tok),
m AS (
  SELECT sum(c_a) AS na, sum(c_b) AS nb,
         sum(CASE WHEN c_a > 0 THEN 1 ELSE 0 END) AS vocab_a,
         sum(CASE WHEN c_b > 0 THEN 1 ELSE 0 END) AS vocab_b,
         sum(CASE WHEN c_a > 0 AND c_b > 0 THEN 1 ELSE 0 END)
           AS vocab_shared,
         sum(CASE WHEN c_a = 0 AND c_b > 0 THEN 1 ELSE 0 END)
           AS new_vocab_b,
         sum(CASE WHEN c_a = 0 THEN c_b ELSE 0 END) AS oov_mass_b
  FROM v),
tv AS (SELECT sum(abs(v.c_a * m.nb - v.c_b * m.na)) AS tv_num FROM v, m)
SELECT CAST(m.na AS BIGINT) AS n_tokens_a,
       CAST(m.nb AS BIGINT) AS n_tokens_b,
       CAST(m.vocab_a AS BIGINT) AS vocab_a,
       CAST(m.vocab_b AS BIGINT) AS vocab_b,
       CAST(m.vocab_shared AS BIGINT) AS vocab_shared,
       CAST(m.new_vocab_b AS BIGINT) AS new_vocab_b,
       CAST(10000 * m.oov_mass_b // greatest(m.nb, 1) AS BIGINT)
         AS oov_mass_b_bp,
       CAST(10000 * tv.tv_num // greatest(2 * m.na * m.nb, 1) AS BIGINT)
         AS tv_bp
FROM m, tv""")
