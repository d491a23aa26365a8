"""Text-analysis pipelines over the ``documents`` table.

Each is the scalable composition of the stages in stages/textstats.py:
stateless vectorized ``map_batches`` for per-row signals, and the
pre-aggregate-then-small-groupby pattern for the wide stats (one partial
row per (lang, source) per batch enters the shuffle — not one per doc).
"""

from __future__ import annotations

import pandas as pd
import ray.data

from data_dedup_ray.util import autoscale_pool
from ray.data.aggregate import Sum

from data_dedup_ray.stages import textstats


def token_stats(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(textstats.token_stats, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_token_chars", "n_punct"]
    )


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(textstats.quality_scores, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_token_chars", "n_punct", "n_stopwords",
         "stop_ratio_bp", "punct_ratio_bp", "keep"]
    )


def lang_id(sf_dir: str, *, concurrency: int | tuple | None = None) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    from data_dedup_ray.util import stage_task

    return docs.map_batches(
        stage_task(textstats.LangId), batch_format="pyarrow"
    ).select_columns(["doc_id", "lang_pred"])


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        textstats.doc_fingerprint, batch_format="pyarrow"
    ).select_columns(["doc_id", "fingerprint"])


def fingerprints_sha(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, fingerprint_sha): the oracle-checked fingerprint variant
    (see ``textstats.doc_fingerprint_sha``)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        textstats.doc_fingerprint_sha, batch_format="pyarrow"
    ).select_columns(["doc_id", "fingerprint_sha"])


def fingerprints_sha_sql(shingle_k: int = 5) -> str:
    """DuckDB twin: identical tokenization, shingling, hash, and min."""
    return f"""
WITH toks AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents)
SELECT doc_id,
       coalesce(list_min(
         [substr(sha256(array_to_string(ts[i:i+{shingle_k - 1}], ' ')), 1, 16)
          FOR i IN generate_series(1, len(ts) - {shingle_k - 1})]), '')
         AS fingerprint_sha
FROM toks"""


def doc_stats_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Grouped corpus stats with per-batch pre-aggregation (combiner) before
    the small shuffle — the scalable aggregate shape (SURVEY.md §4)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_tokens"] = [
            len(textstats.TOKEN_RE.findall(t.lower())) for t in b["text"]
        ]
        return (
            b.groupby(["lang", "source"], sort=False)
            .agg(
                n_docs=("doc_id", "count"),
                sum_chars=("n_chars", "sum"),
                total_tokens=("n_tokens", "sum"),
            )
            .reset_index()
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source"])
        .aggregate(
            Sum(on="n_docs", alias_name="n_docs"),
            Sum(on="sum_chars", alias_name="sum_chars"),
            Sum(on="total_tokens", alias_name="total_tokens"),
        )
    )


def top_terms(sf_dir: str, *, k: int = 100,
              num_partitions: int = 16) -> ray.data.Dataset:
    """Vocabulary building: the ``k`` terms with highest document
    frequency.  ``(term, df)``, ties → lexicographically-first term.

    Scale shape: per-batch partial DF counts (one row per distinct term
    per batch — the combiner bounds shuffle volume by vocabulary size,
    not token count), a hash exchange on the term so each term's total
    lands whole in one partition, then a global sort+limit over the
    already-tiny (≤ vocab) aggregate.  Stop-word-like heavy hitters are
    exactly the terms the per-batch combiner compresses hardest, so the
    classic word-count skew never reaches the shuffle.
    """
    import numpy as np
    import pyarrow as pa

    from data_dedup_ray.engine.exchange import hash_exchange

    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(set(textstats.TOKEN_RE.findall(s.lower())))
        if not c:
            return pa.table({
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64()),
            })
        terms = np.asarray(list(c.keys()), dtype=object)
        part = (pd.util.hash_array(terms) % np.uint64(P)).astype(np.int64)
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
        out = (
            df.groupby("term", sort=False, as_index=False)["df"].sum()
            .sort_values(["df", "term"], ascending=[False, True],
                         kind="stable")
            .head(k)  # exact: each term's full count is in this partition
        )
        return out[["term", "df"]]

    part_schema = pa.schema([("term", pa.string()), ("df", pa.int64())])
    cands = hash_exchange(
        [docs.map_batches(partial, batch_format="pyarrow")],
        per_part,
        num_partitions=P,
        schema=part_schema,
        in_schemas=[part_schema],
        pre=[combine],
    )
    return cands.sort(["df", "term"], descending=[True, False]).limit(k)


def top_terms_sql(k: int = 100) -> str:
    return (
        "SELECT term, count(*) AS df FROM ("
        "  SELECT DISTINCT doc_id, term FROM ("
        "    SELECT doc_id,"
        "     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term"
        "    FROM documents))"
        " GROUP BY term ORDER BY df DESC, term LIMIT " + str(k)
    )


#: RE2's \s is exactly [\t\n\f\r ] (ASCII, no \v, no Unicode spaces);
#: Python re's \s is Unicode-aware — the explicit class keeps the Python
#: kernel and the DuckDB (RE2) oracle matching byte-for-byte.
_WS_CLASS = "[\t\n\f\r ]"


def norm_text_py(s: str) -> str:
    """THE normalization rule (NFC → lower → collapse RE2-\s runs →
    strip) — single definition shared by normalize_text and
    exact.dedup_pages_normalized."""
    import re
    import unicodedata

    ws = re.compile(_WS_CLASS + "+")
    out = ws.sub(" ", unicodedata.normalize("NFC", s).lower())
    return out.strip(" \t\n\f\r")


def norm_sql_expr(col: str) -> str:
    """SQL twin of ``norm_text_py`` over column ``col``."""
    ws = _WS_CLASS.replace("\t", "\\t").replace("\n", "\\n") \
                  .replace("\f", "\\f").replace("\r", "\\r")
    return (
        f"trim(regexp_replace(lower(nfc_normalize({col})),"
        f" '{ws}+', ' ', 'g'), E'\\t\\n\\f\\r ')"
    )


def normalize_text(sf_dir: str) -> ray.data.Dataset:
    """Canonical text normalization — the pass run before any hashing so
    trivially-different captures dedup together: unicode NFC, lowercase,
    collapse whitespace runs, strip.  ``(doc_id, norm_text, changed)``.
    Embarrassingly parallel; rule-for-rule identical to the SQL twin."""
    import numpy as np
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out = [norm_text_py(s) for s in texts]
        changed = np.fromiter(
            (a != b for a, b in zip(out, texts)), bool, len(texts)
        )
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "norm_text": pa.array(out, pa.string()),
            "changed": pa.array(changed),
        })

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(fn, batch_format="pyarrow")


def normalize_text_sql() -> str:
    e = norm_sql_expr("text")
    return f"""
SELECT doc_id, {e} AS norm_text, {e} <> text AS changed
FROM documents"""


def lang_confusion(sf_dir: str) -> ray.data.Dataset:
    """Heuristic-language-ID evaluation: confusion counts of predicted vs
    labeled language — ``(lang, lang_pred, n)``.  Per-batch partial counts
    (combiner) → one tiny groupby over ≤ |langs|² rows."""
    import pyarrow as pa

    from data_dedup_ray.util import stage_task
    from ray.data.aggregate import Sum

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pred = docs.map_batches(
        stage_task(textstats.LangId), batch_format="pyarrow"
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "lang_pred"]).aggregate([("lang", "count")])
        return g.rename_columns(["lang", "lang_pred", "n"])

    return (
        pred.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum(on="n", alias_name="n"))
    )


def lang_confusion_sql() -> str:
    from data_dedup_ray.oracles import lang_id_sql

    return f"""
WITH pred AS ({lang_id_sql()})
SELECT d.lang, p.lang_pred, count(*) AS n
FROM documents d JOIN pred p ON p.doc_id = d.doc_id
GROUP BY d.lang, p.lang_pred"""


#: GPT-2-style pretokenizer, simplified to the subset that means the same
#: thing in Python re and DuckDB's RE2: contractions, letter runs, digit
#: runs, symbol runs, whitespace runs (explicit ASCII classes — no \p or
#: Unicode-dependent shorthands).
BPE_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?[a-zA-Z]+"
    "| ?[0-9]+"
    "| ?[^a-zA-Z0-9 \t\n\f\r]+"
    "|[ \t\n\f\r]+"
)
_WS_TOKEN_PATTERN = "[^ \t\n\f\r]+"


def bpe_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Token counting two ways — whitespace tokens and a BPE-ish
    pretokenizer split (the GPT-2 pattern family): ``(doc_id,
    n_ws_tokens, n_bpe_tokens)``.  The BPE count is what a training-cost
    estimate runs over 100 TB; one compiled-regex pass per doc."""
    import re

    import numpy as np
    import pyarrow as pa

    bpe = re.compile(BPE_PATTERN)
    ws = re.compile(_WS_TOKEN_PATTERN)

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_ws = np.fromiter((len(ws.findall(s)) for s in texts),
                           np.int64, len(texts))
        n_bpe = np.fromiter((len(bpe.findall(s)) for s in texts),
                            np.int64, len(texts))
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "n_ws_tokens": pa.array(n_ws),
            "n_bpe_tokens": pa.array(n_bpe),
        })

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(fn, batch_format="pyarrow")


#: fixture merge table for the driver oracle: pairwise NON-INTERACTING
#: rules (no rule's second char is another rule's first, none
#: self-overlaps), so the merge closure has a closed form a SQL oracle
#: can restate — merged length = chars − Σ non-overlapping pair
#: occurrences.  The tokenizer itself is a general ranked-merges BPE
#: (any merges table works, e.g. GPT-2's 50k merges at real scale).
DEFAULT_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("e", "r"), ("i", "n"), ("o", "u"),
]


class _BPEMergeCounter:
    """Per-worker BPE tokenizer state: merge ranks + compiled pretokenizer
    built ONCE per process (util.stage_task), merges table broadcast via
    ``ray.put``.  Counts merged tokens per doc; a word-level memo caches
    each distinct pretoken's merged length (the standard BPE serving
    trick — natural text reuses a small word vocabulary)."""

    def __init__(self, merges_ref):
        import re as _re

        import ray as _ray

        merges = (
            _ray.get(merges_ref)
            if isinstance(merges_ref, _ray.ObjectRef) else merges_ref
        )
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.pre = _re.compile(BPE_PATTERN)
        self.cache: dict[str, int] = {}

    def _merged_len(self, piece: str) -> int:
        n = self.cache.get(piece)
        if n is not None:
            return n
        word = list(piece)
        while len(word) > 1:
            best, best_rank = None, None
            for i in range(len(word) - 1):
                r = self.ranks.get((word[i], word[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = (word[i], word[i + 1]), r
            if best is None:
                break
            # merge ALL occurrences of the best pair, leftmost first —
            # the standard BPE step
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1
                        and (word[i], word[i + 1]) == best):
                    out.append(word[i] + word[i + 1])
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        n = len(word)
        if len(self.cache) < 1_000_000:  # bound actor memory
            self.cache[piece] = n
        return n

    def __call__(self, t: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow as pa

        texts = t["text"].to_pylist()
        counts = np.fromiter(
            (sum(self._merged_len(p) for p in self.pre.findall(s))
             for s in texts),
            np.int64, len(texts),
        )
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks(),
            "n_merged_tokens": pa.array(counts),
        })


def bpe_merged_token_counts(
    sf_dir: str, merges: list[tuple[str, str]] | None = None,
) -> ray.data.Dataset:
    """REAL merged-BPE token counts: ``(doc_id, n_merged_tokens)`` — the
    GPT-2-pattern pretokenizer pieces run through ranked pair merges
    (``_BPEMergeCounter``), not just the pretokenizer split that
    ``bpe_token_counts`` reports.  The merges table is broadcast once
    (``ray.put``); per-worker tokenizer state builds once per process."""
    import ray

    from data_dedup_ray.util import stage_task

    ref = ray.put(list(merges if merges is not None else DEFAULT_MERGES))
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return docs.map_batches(
        stage_task(_BPEMergeCounter, merges_ref=ref),
        batch_format="pyarrow",
    )


def bpe_merged_token_counts_sql() -> str:
    """SQL twin for the DEFAULT_MERGES fixture: the rules are pairwise
    non-interacting (see DEFAULT_MERGES), so merged length per pretoken
    piece = char length − Σ non-overlapping occurrences of each pair,
    and ``replace()`` counts exactly the occurrences BPE merges."""
    def esc(p: str) -> str:
        return (p.replace("\\", "\\\\").replace("'", "''")
                 .replace("\t", "\\t").replace("\n", "\\n")
                 .replace("\f", "\\f").replace("\r", "\\r"))

    terms = " + ".join(
        f"(length(piece) - length(replace(piece, '{a}{b}', ''))) / 2"
        for a, b in DEFAULT_MERGES
    )
    return f"""
WITH p AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '{esc(BPE_PATTERN)}')) AS piece
  FROM documents),
c AS (SELECT doc_id, sum(length(piece) - ({terms})) AS n
      FROM p GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_merged_tokens
FROM documents d LEFT JOIN c USING (doc_id)"""


def bpe_token_counts_sql() -> str:
    def esc(p: str) -> str:
        return (p.replace("\\", "\\\\").replace("'", "''")
                 .replace("\t", "\\t").replace("\n", "\\n")
                 .replace("\f", "\\f").replace("\r", "\\r"))

    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{esc(_WS_TOKEN_PATTERN)}'))
         AS n_ws_tokens,
       len(regexp_extract_all(text, '{esc(BPE_PATTERN)}'))
         AS n_bpe_tokens
FROM documents"""


# spans both regimes: the synthetic corpus's ~31-term vocabulary
# (so the test-scale curve is non-trivial) and real budgets
DEFAULT_VOCAB_CUTS = (4, 16, 1000, 64000)


def vocab_coverage(sf_dir: str, *, cutoffs=DEFAULT_VOCAB_CUTS,
                   num_partitions: int = 16) -> ray.data.Dataset:
    """Tokenizer-budget planner: for each candidate vocabulary size N,
    what fraction of all token OCCURRENCES the top-N terms (by count,
    ties lexicographic) cover — ``(vocab_size, n_distinct, covered,
    total, coverage_bp)``, the curve read before fixing a vocab/merge
    budget (the Zipf-coverage table of Sennrich 2016 §5 / any
    BPE-budget discussion).

    Scale shape: per-batch occurrence counts enter ONE term-keyed
    exchange (combiner bounds shuffle volume by vocabulary, the
    ``top_terms`` shape), each partition reduces its terms to a
    (count-value → n_terms) HISTOGRAM — coverage needs only sums, and
    every term with the same count contributes identically, so the
    tie-break order never matters — and the driver walks the tiny
    merged histogram (≤ distinct count values ≤ 2·√total rows).  No
    global sort, no top-N materialization."""
    import numpy as np
    import pyarrow as pa

    from data_dedup_ray.engine.exchange import hash_exchange

    P = num_partitions
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update(textstats.TOKEN_RE.findall(s.lower()))
        if not c:
            return pa.table({
                "term": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
                "_part": pa.array([], pa.int64()),
            })
        terms = np.asarray(list(c.keys()), dtype=object)
        part = (pd.util.hash_array(terms) % np.uint64(P)).astype(np.int64)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "c": pa.array(np.fromiter(c.values(), np.int64, len(c))),
            "_part": pa.array(part),
        })

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["term", "_part"]).aggregate([("c", "sum")])
            .rename_columns(["term", "_part", "c"])
        )

    def hist_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"c": pd.Series(dtype=np.int64),
                                 "n_terms": pd.Series(dtype=np.int64)})
        tot = df.groupby("term", sort=False)["c"].sum()
        h = tot.value_counts()
        return pd.DataFrame({"c": h.index.to_numpy(np.int64),
                             "n_terms": h.to_numpy(np.int64)})

    hist = hash_exchange(
        [docs.map_batches(partial, batch_format="pyarrow")],
        hist_part, num_partitions=P,
        schema=pa.schema([("c", pa.int64()), ("n_terms", pa.int64())]),
        in_schemas=[pa.schema([("term", pa.string()),
                               ("c", pa.int64())])],
        pre=[combine],
    ).to_pandas()  # histogram-sized: ≤ distinct count values × P rows

    hist = hist.groupby("c", as_index=False)["n_terms"].sum() \
        .sort_values("c", ascending=False).reset_index(drop=True)
    total = int((hist["c"] * hist["n_terms"]).sum()) if len(hist) else 0
    n_distinct = int(hist["n_terms"].sum()) if len(hist) else 0

    rows = []
    for n in sorted(int(x) for x in cutoffs):
        slots, covered = n, 0
        for cv, g in zip(hist["c"], hist["n_terms"]):
            take = min(slots, int(g))
            covered += int(cv) * take
            slots -= take
            if slots == 0:
                break
        rows.append({
            "vocab_size": n, "n_distinct": n_distinct,
            "covered": covered, "total": total,
            "coverage_bp": 10000 * covered // max(total, 1),
        })
    schema = pa.schema([
        ("vocab_size", pa.int64()), ("n_distinct", pa.int64()),
        ("covered", pa.int64()), ("total", pa.int64()),
        ("coverage_bp", pa.int64()),
    ])
    return ray.data.from_arrow(pa.Table.from_pandas(
        pd.DataFrame(rows, columns=[f.name for f in schema]),
        schema=schema, preserve_index=False))


def vocab_coverage_sql(cutoffs=DEFAULT_VOCAB_CUTS) -> str:
    """DuckDB twin: rank terms by (count desc, term) and sum the top-N
    counts per cutoff — ties share a count value, so the rank order
    inside a tie never changes the sum and both sides agree exactly."""
    cuts = ", ".join(f"({int(n)})" for n in sorted(cutoffs))
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
tf AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
r AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rn FROM tf),
tot AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_distinct FROM tf),
cuts(vocab_size) AS (VALUES {cuts})
SELECT CAST(vocab_size AS BIGINT) AS vocab_size, t.n_distinct,
       CAST(coalesce((SELECT sum(c) FROM r WHERE rn <= vocab_size), 0)
            AS BIGINT) AS covered,
       t.total,
       CAST(10000 * coalesce((SELECT sum(c) FROM r
                              WHERE rn <= vocab_size), 0)
            // greatest(t.total, 1) AS BIGINT) AS coverage_bp
FROM cuts, tot t"""


def extract_text_pages(sf_dir: str) -> ray.data.Dataset:
    """``(url, extracted_text)`` — the deterministic HTML→text extractor
    (stages/extract.py) run over the raw ``html`` BYTES of every page:
    the literal input_hint invariant ``extract_text(html) == text``
    (BASELINE.json:16) as a driver-checkable query.  The ``text`` column
    is dropped before the stage runs, so the output provably comes from
    the html payload; the SQL twin selects the corpus CTE's ``text``,
    and a value-hash match IS the byte-identity proof."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.stages.extract import extract_text

    return (web_pages(sf_dir)
            .select_columns(["url", "html"])
            .map_batches(extract_text, batch_format="pyarrow")
            .select_columns(["url", "extracted_text"]))


def extract_text_sql() -> str:
    """Twin: the corpus derivation's ``text`` column — equality with the
    html-extracted Ray output closes the input_hint clause exactly."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE

    return (f"WITH {WEB_PAGES_CTE}\n"
            "SELECT url, text AS extracted_text FROM web_pages")
