"""DuckDB oracle SQL builders for the non-trivial pipelines.

Each function returns ANSI SQL (DuckDB dialect) over the pre-registered
``documents`` view that reproduces the corresponding Ray pipeline's output
exactly — including the web_pages derivation CTE (corpus.WEB_PAGES_CTE).

Float discipline: similarity values are emitted as integer basis points
(``floor(x * 10000)``) on BOTH sides, so the driver's value-hash compare
never sees float formatting noise.  The floor of the identical IEEE double
expression is deterministic across DuckDB and numpy.
"""

from __future__ import annotations

from data_dedup_ray.corpus import WEB_PAGES_CTE

#: shingle/tokenization CTEs shared by the Jaccard oracles (k=5 word
#: shingles over the same [a-z0-9]+ tokenizer as stages/minhash.py)
_SHINGLE_CTES = """
toks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t FROM web_pages),
sh AS (
  SELECT DISTINCT url, array_to_string(t[i:i+4], ' ') AS s
  FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS g(i)
  WHERE len(t) >= 5
),
cnt AS (SELECT url, count(*) AS n FROM sh GROUP BY url),
inter AS (
  SELECT a.url AS url_a, b.url AS url_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.url < b.url
  GROUP BY 1, 2
),
jac AS (
  SELECT url_a, url_b, i * 1.0 / (ca.n + cb.n - i) AS j
  FROM inter
  JOIN cnt ca ON ca.url = inter.url_a
  JOIN cnt cb ON cb.url = inter.url_b
)"""


def minhash_pairs_sql(threshold: float = 0.7) -> str:
    """Exact all-pairs k-shingle Jaccard ≥ threshold — the ground truth the
    LSH pipeline must reproduce (dup-pair recall 1.0 at this scale)."""
    return (
        f"WITH {WEB_PAGES_CTE},{_SHINGLE_CTES}\n"
        f"SELECT url_a, url_b, CAST(floor(j * 10000) AS BIGINT) AS jaccard_bp"
        f" FROM jac WHERE j >= {threshold}"
    )


_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"
_EN = "('the','a','of','and','to','is','in','that','it','for')"


def token_stats_sql() -> str:
    return (
        f"SELECT doc_id, len({_TOKS}) AS n_tokens,"
        f" len(array_to_string({_TOKS}, '')) AS n_token_chars,"
        f" len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct"
        f" FROM documents"
    )


def quality_scores_sql(min_tokens: int = 10) -> str:
    return f"""
WITH s AS (
  SELECT doc_id, length(text) AS n_len, len({_TOKS}) AS n_tokens,
         len(array_to_string({_TOKS}, '')) AS n_token_chars,
         len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS n_punct,
         len(list_filter({_TOKS}, x -> x IN {_EN})) AS n_stopwords
  FROM documents)
SELECT doc_id, n_tokens, n_token_chars, n_punct, n_stopwords,
       CAST(floor(n_stopwords * 10000.0 / greatest(n_tokens, 1)) AS BIGINT) AS stop_ratio_bp,
       CAST(floor(n_punct * 10000.0 / greatest(n_len, 1)) AS BIGINT) AS punct_ratio_bp,
       (n_tokens >= {min_tokens}
        AND floor(n_punct * 10000.0 / greatest(n_len, 1)) < 2000) AS keep
FROM s"""


def lang_id_sql() -> str:
    from data_dedup_ray.stages.textstats import LANG_MARKERS

    def inlist(lang):
        ws = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        return f"len(list_filter(t, x -> x IN ({ws})))"

    return f"""
WITH s AS (
  SELECT doc_id, {_TOKS} AS t FROM documents),
c AS (
  SELECT doc_id, {inlist('en')} AS en, {inlist('de')} AS de,
         {inlist('fr')} AS fr, {inlist('es')} AS es FROM s)
SELECT doc_id, CASE
  WHEN greatest(en, de, fr, es) = 0 THEN 'und'
  WHEN en >= de AND en >= fr AND en >= es THEN 'en'
  WHEN de >= fr AND de >= es THEN 'de'
  WHEN fr >= es THEN 'fr'
  ELSE 'es' END AS lang_pred
FROM c"""


def doc_stats_sql() -> str:
    return (
        f"SELECT lang, source, count(*) AS n_docs,"
        f" CAST(sum(n_chars) AS BIGINT) AS sum_chars,"
        f" CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens"
        f" FROM documents GROUP BY lang, source"
    )


_COS = (
    "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),"
    " CAST(e.embedding AS DOUBLE[]))"
)


def knn_topk_sql(k: int = 5, n_queries: int = 10) -> str:
    """Exact cosine top-k (double math; basis points half-up rounded to
    match the Ray side's floor(x*10000+0.5))."""
    return f"""
SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       row_number() OVER (PARTITION BY q.vec_id ORDER BY {_COS} DESC, e.vec_id) AS rank,
       CAST(round({_COS} * 10000) AS BIGINT) AS cos_bp
FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
WHERE q.vec_id < {n_queries}
QUALIFY rank <= {k}"""


def embedding_dup_sql(threshold: float = 0.99) -> str:
    """Pairs with cosine ≥ threshold over the augmented table (exact-copy
    vectors planted at vec_id+100000 for vec_id % 10 == 0 — the SQL twin of
    pipelines/search.py augmented_embeddings)."""
    cos = (
        "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
        " CAST(b.embedding AS DOUBLE[]))"
    )
    return f"""
WITH emb AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       CAST(round({cos} * 10000) AS BIGINT) AS cos_bp
FROM emb a JOIN emb b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}"""


def embedding_dup_int8_sql(min_cos2_bp: int = 9801) -> str:
    """SQL twin of pipelines/search.embedding_dup_pairs_int8 over the
    augmented table: the per-vector int8 quantization rule restated in
    DOUBLE (``floor(v · 127 / max|v|)`` — the same IEEE multiply/divide/
    floor sequence numpy runs after the exact float32→float64 cast),
    then exact-integer dot/norm arithmetic in HUGEINT with the
    cross-multiplied floor-division predicate shared with tf_cosine."""
    return f"""
WITH emb AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0),
x AS (
  SELECT vec_id, g.i AS i, CAST(embedding[g.i] AS DOUBLE) AS v
  FROM emb, UNNEST(generate_series(1, len(embedding))) AS g(i)),
mx AS (SELECT vec_id, max(abs(v)) AS m FROM x GROUP BY 1),
q AS (
  SELECT x.vec_id, i,
         CAST(floor(v * 127 / CASE WHEN m = 0 THEN 1 ELSE m END)
              AS BIGINT) AS q
  FROM x JOIN mx USING (vec_id)),
n2 AS (SELECT vec_id, CAST(sum(q*q) AS HUGEINT) AS n2 FROM q GROUP BY 1),
d AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         CAST(sum(a.q * b.q) AS HUGEINT) AS dot
  FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2)
SELECT vec_id_a, vec_id_b,
       CAST(dot*dot*10000 // (na.n2 * nb.n2) AS BIGINT) AS cos2_bp
FROM d JOIN n2 na ON na.vec_id = d.vec_id_a
       JOIN n2 nb ON nb.vec_id = d.vec_id_b
WHERE dot > 0 AND dot*dot*10000 >= {int(min_cos2_bp)} * na.n2 * nb.n2"""


def near_dup_clusters_sql(threshold: float = 0.7) -> str:
    """Connected components of the verified near-dup pair graph via a
    recursive transitive closure; singletons keep their own url."""
    return (
        f"WITH RECURSIVE {WEB_PAGES_CTE},{_SHINGLE_CTES},\n"
        f"dup AS (SELECT url_a, url_b FROM jac WHERE j >= {threshold}),\n"
        "edges AS (SELECT url_a AS a, url_b AS b FROM dup"
        " UNION SELECT url_b, url_a FROM dup),\n"
        "reach(a, b) AS (SELECT a, b FROM edges"
        " UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),\n"
        "comp AS (SELECT a AS url, least(a, min(b)) AS cluster_id"
        " FROM reach GROUP BY a)\n"
        "SELECT w.url, coalesce(c.cluster_id, w.url) AS cluster_id"
        " FROM web_pages w LEFT JOIN comp c ON c.url = w.url"
    )


def tiered_dedup_stats_sql(threshold: float = 0.7) -> str:
    """Funnel telemetry twin (pipelines/tiered.tiered_dedup_stats): pages,
    exact shingle-set groups (empty-set docs are singleton groups), and
    final near-dup components.  Exact groups key on the shingle STRING
    set — equal iff the Ray side's canonical hash-set blobs are equal."""
    return (
        f"WITH RECURSIVE {WEB_PAGES_CTE},{_SHINGLE_CTES},\n"
        f"dup AS (SELECT url_a, url_b FROM jac WHERE j >= {threshold}),\n"
        "edges AS (SELECT url_a AS a, url_b AS b FROM dup"
        " UNION SELECT url_b, url_a FROM dup),\n"
        "reach(a, b) AS (SELECT a, b FROM edges"
        " UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),\n"
        "comp AS (SELECT a AS url, least(a, min(b)) AS cluster_id"
        " FROM reach GROUP BY a),\n"
        "labels AS (SELECT w.url, coalesce(c.cluster_id, w.url)"
        " AS cluster_id FROM web_pages w LEFT JOIN comp c ON c.url = w.url),\n"
        "sets AS (SELECT url, string_agg(s, chr(1) ORDER BY s) AS k"
        " FROM sh GROUP BY url)\n"
        "SELECT (SELECT count(*) FROM web_pages) AS n_pages,\n"
        "       (SELECT count(DISTINCT k) FROM sets)\n"
        "         + (SELECT count(*) FROM web_pages)\n"
        "         - (SELECT count(*) FROM sets) AS n_exact_groups,\n"
        "       (SELECT count(DISTINCT cluster_id) FROM labels) AS n_clusters"
    )


def substring_dup_sql(min_tokens: int = 50) -> str:
    """Exact windowed-substring oracle: per url, the number of token-window
    positions whose ``min_tokens``-token text occurs in ≥1 other document
    (the SQL twin of pipelines/substring.substring_dup_docs — same
    tokenizer, same MD5 window hash)."""
    L = min_tokens
    return (
        f"WITH {WEB_PAGES_CTE},\n"
        f"toks AS (SELECT url, regexp_extract_all(text, '[a-z0-9]+') AS t"
        f" FROM web_pages),\n"
        f"win AS (SELECT url, md5(array_to_string(t[i:i+{L - 1}], ' ')) AS h\n"
        f"  FROM toks, UNNEST(generate_series(1, len(t) - {L - 1})) AS g(i)\n"
        f"  WHERE len(t) >= {L}),\n"
        f"dup AS (SELECT h FROM win GROUP BY h"
        f" HAVING count(DISTINCT url) > 1)\n"
        f"SELECT url, count(*) AS n_dup_windows FROM win JOIN dup USING (h)"
        f" GROUP BY url"
    )


# --------------------------------------------------------------------------
# Temporal operators over the events table (pipelines/events.py)
# --------------------------------------------------------------------------

#: exact int money, matching events.py _cents (np.rint(value*100))
_CENTS = "CAST(round(value * 100) AS BIGINT)"


def windowed_agg_sql(window_s: int = 3600) -> str:
    return (
        f"SELECT user_id,"
        f" CAST(floor(epoch(ts) / {window_s}) * {window_s} AS BIGINT)"
        f" AS window_start,"
        f" count(*) AS n_events,"
        f" CAST(sum({_CENTS}) AS BIGINT) AS sum_value_cents"
        f" FROM events GROUP BY 1, 2"
    )


def sessionize_sql(gap_s: int = 1800) -> str:
    gap_us = gap_s * 1_000_000
    return f"""
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR date_diff('microseconds', lag(ts) OVER w, ts) > {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM d)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       date_diff('microseconds', min(ts), max(ts)) AS duration_us
FROM s GROUP BY user_id, session_idx"""


def asof_join_sql(left_type: str = "click", right_type: str = "view") -> str:
    return f"""
SELECT c.event_id, v.event_id AS matched_event_id,
       date_diff('microseconds', v.ts, c.ts) AS lag_us
FROM (SELECT * FROM events WHERE event_type = '{left_type}') c
ASOF JOIN (SELECT * FROM events WHERE event_type = '{right_type}') v
  ON c.user_id = v.user_id AND c.ts >= v.ts"""


def range_counts_sql(window_s: int = 3600) -> str:
    return f"""
SELECT e.event_id,
       (SELECT count(*) FROM events e2
        WHERE e2.user_id = e.user_id
          AND e2.ts >= e.ts - INTERVAL {window_s} SECONDS
          AND e2.ts < e.ts) AS n_prev
FROM events e"""


def top_k_per_user_sql(k: int = 3) -> str:
    return f"""
SELECT user_id, event_id, rnk, value_cents FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY {_CENTS} DESC, event_id) AS rnk,
         {_CENTS} AS value_cents
  FROM events)
WHERE rnk <= {k}"""


def cascade_counters_sql() -> str:
    """Reference counter semantics (Engine.pm:500-578) for the DEFAULT chain
    [size, prefix_hash(first 4096B), sha(full)] expressed via content
    equality: hash-key equality ⟺ the hashed byte-range equality (no
    collisions at oracle scale), so the SQL groups on the byte ranges
    directly.  ``n_keys``: first level whose group is a singleton (+1), or
    full depth.  ``block_id``: own url for early-closed singletons, min url
    of the full-content group otherwise."""
    return (
        f"WITH {WEB_PAGES_CTE},\n"
        "lv AS (SELECT url,\n"
        "  octet_length(encode(text)) AS k1, substr(text, 1, 4096) AS k2,"
        " text AS k3,\n"
        "  count(*) OVER (PARTITION BY octet_length(encode(text))) AS c1,\n"
        "  count(*) OVER (PARTITION BY octet_length(encode(text)),"
        " substr(text, 1, 4096)) AS c2\n"
        "  FROM web_pages),\n"
        "r AS (SELECT *,\n"
        "  CASE WHEN c1 = 1 THEN 1 WHEN c2 = 1 THEN 2 ELSE 3 END AS n_keys,\n"
        "  CASE WHEN c1 = 1 OR c2 = 1 THEN url"
        " ELSE min(url) OVER (PARTITION BY k3) END AS block_id\n"
        "  FROM lv),\n"
        "g0 AS (SELECT k1, count(*) AS sz, count(DISTINCT block_id) AS nb"
        " FROM r WHERE n_keys > 0 GROUP BY k1),\n"
        "g1 AS (SELECT k1, k2, count(*) AS sz, count(DISTINCT block_id) AS nb"
        " FROM r WHERE n_keys > 1 GROUP BY k1, k2),\n"
        "g2 AS (SELECT k1, k2, k3, count(*) AS sz,"
        " count(DISTINCT block_id) AS nb"
        " FROM r WHERE n_keys > 2 GROUP BY k1, k2, k3),\n"
        "kc AS (SELECT count(*) AS kc0,"
        " count(*) FILTER (WHERE n_keys > 1) AS kc1,"
        " count(*) FILTER (WHERE n_keys > 2) AS kc2 FROM r),\n"
        "c0 AS (SELECT CAST(coalesce(sum(nb - 1) FILTER (WHERE sz > 1), 0) AS BIGINT) AS v"
        " FROM g0),\n"
        "c1 AS (SELECT CAST(coalesce(sum(nb - 1) FILTER (WHERE sz > 1), 0) AS BIGINT) AS v"
        " FROM g1),\n"
        "c2 AS (SELECT CAST(coalesce(sum(nb - 1) FILTER (WHERE sz > 1), 0) AS BIGINT) AS v"
        " FROM g2)\n"
        "SELECT CAST(0 AS BIGINT) AS level, kc0 AS keys_computed,"
        " c0.v AS collisions FROM kc, c0\n"
        "UNION ALL SELECT 1, kc1, c1.v FROM kc, c1\n"
        "UNION ALL SELECT 2, kc2, c2.v FROM kc, c2"
    )


def chunk_dedup_fixed_sql(chunk_size: int = 512) -> str:
    """SQL twin of pipelines/chunks.chunk_dedup_fixed: fixed-size chunks of
    the html BLOB via hex-string slicing (2 hex chars per byte — DuckDB's
    ``sha256`` takes VARCHAR, so both sides hash the lowercase hex of the
    chunk bytes), grouped to the multi-copy chunk table."""
    from data_dedup_ray.corpus import web_pages_sql

    L = int(chunk_size)
    return web_pages_sql(
        ", chunks AS (\n"
        "  SELECT url,\n"
        f"    substring(hex(html), CAST(1 + i*{2 * L} AS BIGINT), {2 * L})"
        " AS hx\n"
        "  FROM (SELECT url, html,\n"
        "    unnest(range(CAST(ceil(octet_length(html)"
        f" / {L}.0) AS BIGINT))) AS i\n"
        "    FROM web_pages))\n"
        "SELECT sha256(lower(hx)) AS chunk_hash,\n"
        "  CAST(count(*) AS BIGINT) AS n_copies,\n"
        "  CAST(length(hx) // 2 AS BIGINT) AS chunk_len,\n"
        "  min(url) AS canonical_url\n"
        "FROM chunks GROUP BY hx HAVING count(*) > 1"
    )


def chunk_delta_snap2_sql(chunk_size: int = 512) -> str:
    """SQL twin of pipelines/chunks.chunk_delta_snap2: fixed-size chunks
    of the re-crawl (snapshot2) anti-joined by hash against the DISTINCT
    chunk set of the base corpus, rolled up per url.  Same hex-slice
    chunk identity as ``chunk_dedup_fixed_sql``."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    L = int(chunk_size)
    slice_ = (f"substring(hex(html), CAST(1 + i*{2 * L} AS BIGINT),"
              f" {2 * L})")
    rng = (f"unnest(range(CAST(ceil(octet_length(html) / {L}.0)"
           " AS BIGINT))) AS i")
    return snapshots_sql(
        ", widx AS (\n"
        f"  SELECT DISTINCT sha256(lower({slice_})) AS ch\n"
        f"  FROM (SELECT html, {rng} FROM web_pages)),\n"
        "s AS (\n"
        "  SELECT url, sha256(lower(hx)) AS ch,\n"
        "    CAST(length(hx) // 2 AS BIGINT) AS len\n"
        f"  FROM (SELECT url, {slice_} AS hx\n"
        f"    FROM (SELECT url, html, {rng} FROM snapshot2)))\n"
        "SELECT url, CAST(count(*) AS BIGINT) AS n_chunks,\n"
        "  CAST(sum(CASE WHEN w.ch IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_new_chunks,\n"
        "  CAST(sum(CASE WHEN w.ch IS NULL THEN len ELSE 0 END) AS BIGINT)"
        " AS new_bytes\n"
        "FROM s LEFT JOIN widx w ON s.ch = w.ch GROUP BY url"
    )


def chunk_gc_snap2_sql(chunk_size: int = 512) -> str:
    """SQL twin of pipelines/chunks.chunk_gc_snap2: the base corpus's
    distinct chunk set (= the persisted chunk store's provable contents)
    anti-joined against the re-crawl's distinct chunk hashes — stored
    chunks no live page references.  Same hex-slice chunk identity as
    ``chunk_dedup_fixed_sql``."""
    from data_dedup_ray.pipelines.snapshots import snapshots_sql

    L = int(chunk_size)
    slice_ = (f"substring(hex(html), CAST(1 + i*{2 * L} AS BIGINT),"
              f" {2 * L})")
    rng = (f"unnest(range(CAST(ceil(octet_length(html) / {L}.0)"
           " AS BIGINT))) AS i")
    return snapshots_sql(
        ", store AS (\n"
        "  SELECT sha256(lower(hx)) AS chunk_hash,\n"
        "    CAST(length(hx) // 2 AS BIGINT) AS chunk_len\n"
        f"  FROM (SELECT {slice_} AS hx\n"
        f"    FROM (SELECT html, {rng} FROM web_pages))\n"
        "  GROUP BY hx),\n"
        "live AS (\n"
        f"  SELECT DISTINCT sha256(lower({slice_})) AS ch\n"
        f"  FROM (SELECT html, {rng} FROM snapshot2))\n"
        "SELECT s.chunk_hash, s.chunk_len\n"
        "FROM store s LEFT JOIN live l ON s.chunk_hash = l.ch\n"
        "WHERE l.ch IS NULL"
    )


def tf_cosine_pairs_sql(max_df: int = 256, min_cos2_bp: int = 8100) -> str:
    """SQL twin of pipelines/tfidf.tf_cosine_pairs: exact integer
    TF-cosine pairs over the df-pruned vocabulary.  Everything stays in
    the integer domain (DuckDB sums BIGINT into HUGEINT), so the
    threshold predicate and the reported ``cos2_bp`` = ⌊dot²·10⁴ /
    (n2a·n2b)⌋ match the Ray side bit-for-bit — no float rounding to
    drift on."""
    from data_dedup_ray.corpus import web_pages_sql

    return web_pages_sql(
        ", toks AS (\n"
        "  SELECT url, unnest(regexp_extract_all(lower(text),"
        " '[a-z0-9]+')) AS token FROM web_pages),\n"
        "tf AS (\n"
        "  SELECT url, token, CAST(count(*) AS BIGINT) AS tf\n"
        "  FROM toks GROUP BY url, token),\n"
        "dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY token),\n"
        "vocab AS (\n"
        "  SELECT tf.url, tf.token, tf.tf FROM tf JOIN dfx USING (token)\n"
        f"  WHERE dfx.df <= {int(max_df)}),\n"
        "norms AS (SELECT url, sum(tf*tf) AS n2 FROM vocab GROUP BY url),\n"
        "dots AS (\n"
        "  SELECT a.url AS url_a, b.url AS url_b, sum(a.tf*b.tf) AS dot\n"
        "  FROM vocab a JOIN vocab b USING (token)\n"
        "  WHERE a.url < b.url GROUP BY 1, 2)\n"
        "SELECT d.url_a, d.url_b, CAST(d.dot AS BIGINT) AS dot,\n"
        "  CAST(d.dot*d.dot*10000 // (na.n2*nb.n2) AS BIGINT) AS cos2_bp\n"
        "FROM dots d\n"
        "JOIN norms na ON na.url = d.url_a\n"
        "JOIN norms nb ON nb.url = d.url_b\n"
        f"WHERE d.dot*d.dot*10000 >= {int(min_cos2_bp)} * na.n2 * nb.n2"
    )


def _tf_edge_ctes(max_df: int) -> str:
    """``t``-prefixed CTE fragment of ``tf_cosine_pairs_sql`` (integer TF
    dot products over the df-pruned vocabulary), shared by the ensemble
    closure and the tier-eval oracle."""
    return f"""ttoks AS (
  SELECT url, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM web_pages),
ttf AS (
  SELECT url, token, CAST(count(*) AS BIGINT) AS tf
  FROM ttoks GROUP BY url, token),
tdfx AS (SELECT token, count(*) AS df FROM ttf GROUP BY token),
tvocab AS (
  SELECT ttf.url, ttf.token, ttf.tf FROM ttf JOIN tdfx USING (token)
  WHERE tdfx.df <= {int(max_df)}),
tnorms AS (SELECT url, sum(tf*tf) AS n2 FROM tvocab GROUP BY url),
tdots AS (
  SELECT a.url AS url_a, b.url AS url_b, sum(a.tf*b.tf) AS dot
  FROM tvocab a JOIN tvocab b USING (token)
  WHERE a.url < b.url GROUP BY 1, 2)"""


def _simhash_edge_ctes() -> str:
    """``s``-prefixed CTE fragment of ``near.simhash_sha_pairs_sql`` (the
    sha-token bit-majority fingerprint and pairwise Hamming distances)."""
    return """stoks AS (
  SELECT url, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
  FROM web_pages),
sth AS (SELECT url, substr(sha256(tok), 1, 16) AS h FROM stoks),
sbits AS (
  SELECT url, g.j,
         CASE WHEN 2 * sum(
           (strpos('0123456789abcdef', substr(h, 16 - (g.j // 4), 1)) - 1)
             // (1 << (g.j % 4)) % 2
         ) > count(*) THEN 1 ELSE 0 END AS fpbit
  FROM sth CROSS JOIN generate_series(0, 63) AS g(j)
  GROUP BY url, g.j),
sham AS (
  SELECT a.url AS url_a, b.url AS url_b,
         sum(CASE WHEN a.fpbit <> b.fpbit THEN 1 ELSE 0 END) AS d
  FROM sbits a JOIN sbits b ON a.j = b.j AND a.url < b.url
  GROUP BY 1, 2)"""


def dedup_tier_eval_sql(
    threshold: float = 0.7, max_df: int = 256, min_cos2_bp: int = 8100,
    max_hamming: int = 3,
) -> str:
    """SQL twin of pipelines/evaluation.dedup_tier_eval: per cheap tier
    (sha-simhash Hamming ≤ max_hamming, integer TF-cosine ≥ min_cos2_bp),
    integer-exact precision / recall / F1 basis points against the exact
    shingle-Jaccard ≥ threshold pair set.  F1 is the Dice identity
    ``2·hit/(pred+true)`` so every metric is one BIGINT floor division —
    no float ratio ever crosses the value-hash."""
    return f"""
WITH {WEB_PAGES_CTE},{_SHINGLE_CTES},
{_tf_edge_ctes(max_df)},
{_simhash_edge_ctes()},
truth AS (SELECT url_a, url_b FROM jac WHERE j >= {threshold}),
psim AS (SELECT url_a, url_b FROM sham WHERE d <= {int(max_hamming)}),
pcos AS (
  SELECT d.url_a, d.url_b FROM tdots d
  JOIN tnorms na ON na.url = d.url_a
  JOIN tnorms nb ON nb.url = d.url_b
  WHERE d.dot*d.dot*10000 >= {int(min_cos2_bp)} * na.n2 * nb.n2),
m AS (
  SELECT 'simhash_sha' AS tier,
         (SELECT count(*) FROM psim) AS n_pred,
         (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM psim p JOIN truth t
            ON p.url_a = t.url_a AND p.url_b = t.url_b) AS n_hit
  UNION ALL
  SELECT 'tf_cosine',
         (SELECT count(*) FROM pcos),
         (SELECT count(*) FROM truth),
         (SELECT count(*) FROM pcos p JOIN truth t
            ON p.url_a = t.url_a AND p.url_b = t.url_b))
SELECT tier, CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(10000 * n_hit // greatest(n_pred, 1) AS BIGINT) AS precision_bp,
       CAST(10000 * n_hit // greatest(n_true, 1) AS BIGINT) AS recall_bp,
       CAST(20000 * n_hit // greatest(n_pred + n_true, 1) AS BIGINT) AS f1_bp
FROM m"""


def sig_estimator_eval_sql(threshold: float = 0.7) -> str:
    """SQL twin of grading the 1 KB/doc SIGNATURE estimator
    (sigstore.incremental_sig_near_pairs, sha token hash) against the
    exact cross-corpus Jaccard truth — the 'can dedup run from stored
    signatures alone?' quality row.  Both pair sets are the standing
    oracles, MATERIALIZED once each."""
    from data_dedup_ray.pipelines.near import cross_corpus_near_pairs_sql
    from data_dedup_ray.pipelines.sigstore import (
        incremental_sig_near_pairs_sql,
    )

    pred = incremental_sig_near_pairs_sql(threshold)
    tru = cross_corpus_near_pairs_sql(threshold)
    return f"""
WITH pred AS MATERIALIZED (
  SELECT new_url, index_url FROM ({pred}) p),
tru AS MATERIALIZED (
  SELECT new_url, index_url FROM ({tru}) t),
m AS (SELECT
  (SELECT count(*) FROM pred) AS n_pred,
  (SELECT count(*) FROM tru) AS n_true,
  (SELECT count(*) FROM pred p JOIN tru t
     ON p.new_url = t.new_url AND p.index_url = t.index_url) AS n_hit)
SELECT 'sig_estimate' AS tier,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(10000 * n_hit // greatest(n_pred, 1) AS BIGINT) AS precision_bp,
       CAST(10000 * n_hit // greatest(n_true, 1) AS BIGINT) AS recall_bp,
       CAST(20000 * n_hit // greatest(n_pred + n_true, 1) AS BIGINT) AS f1_bp
FROM m"""


def dedup_savings_sql(threshold: float = 0.7) -> str:
    """SQL twin of evaluation.dedup_savings: keep-first near-dup
    savings over the closure labels (removed = url <> cluster_id)."""
    return (
        f"WITH RECURSIVE {WEB_PAGES_CTE},{_SHINGLE_CTES},\n"
        f"dup AS (SELECT url_a, url_b FROM jac WHERE j >= {threshold}),\n"
        "edges AS (SELECT url_a AS a, url_b AS b FROM dup"
        " UNION SELECT url_b, url_a FROM dup),\n"
        "reach(a, b) AS (SELECT a, b FROM edges"
        " UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),\n"
        "comp AS (SELECT a AS url, least(a, min(b)) AS cluster_id"
        " FROM reach GROUP BY a),\n"
        "labels AS (SELECT w.url, coalesce(c.cluster_id, w.url)"
        " AS cluster_id FROM web_pages w LEFT JOIN comp c"
        " ON c.url = w.url),\n"
        "tok AS (SELECT url, len(regexp_extract_all(text, '[a-z0-9]+'))"
        " AS nt, length(text) AS nb FROM web_pages)\n"
        "SELECT CAST(count(*) AS BIGINT) AS n_docs,\n"
        " CAST(sum(CASE WHEN l.url <> l.cluster_id THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_removed,\n"
        " CAST(sum(nt) AS BIGINT) AS tokens_total,\n"
        " CAST(sum(CASE WHEN l.url <> l.cluster_id THEN nt ELSE 0 END)"
        " AS BIGINT) AS tokens_removed,\n"
        " CAST(10000 * sum(CASE WHEN l.url <> l.cluster_id THEN nt"
        " ELSE 0 END) // greatest(sum(nt), 1) AS BIGINT)"
        " AS tokens_removed_bp,\n"
        " CAST(sum(nb) AS BIGINT) AS chars_total,\n"
        " CAST(sum(CASE WHEN l.url <> l.cluster_id THEN nb ELSE 0 END)"
        " AS BIGINT) AS chars_removed,\n"
        " CAST(10000 * sum(CASE WHEN l.url <> l.cluster_id THEN nb"
        " ELSE 0 END) // greatest(sum(nb), 1) AS BIGINT)"
        " AS chars_removed_bp\n"
        "FROM labels l JOIN tok USING (url)"
    )


def simhash_threshold_sweep_sql(
    threshold: float = 0.7, max_hamming: int = 3,
) -> str:
    """SQL twin of evaluation.simhash_threshold_sweep: one metric row
    per Hamming cutoff ``h0..h<max_hamming>`` against the exact
    shingle-Jaccard truth set."""
    cuts = ", ".join(f"({h})" for h in range(int(max_hamming) + 1))
    return f"""
WITH {WEB_PAGES_CTE},{_SHINGLE_CTES},
{_simhash_edge_ctes()},
truth AS (SELECT url_a, url_b FROM jac WHERE j >= {threshold}),
cut(h) AS (VALUES {cuts}),
m AS (
  SELECT 'h' || c.h AS tier,
         (SELECT count(*) FROM sham WHERE d <= c.h) AS n_pred,
         (SELECT count(*) FROM truth) AS n_true,
         (SELECT count(*) FROM sham p JOIN truth t
            ON p.url_a = t.url_a AND p.url_b = t.url_b
          WHERE p.d <= c.h) AS n_hit
  FROM cut c)
SELECT tier, CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(10000 * n_hit // greatest(n_pred, 1) AS BIGINT) AS precision_bp,
       CAST(10000 * n_hit // greatest(n_true, 1) AS BIGINT) AS recall_bp,
       CAST(20000 * n_hit // greatest(n_pred + n_true, 1) AS BIGINT) AS f1_bp
FROM m"""


def ensemble_clusters_sql(
    threshold: float = 0.7, max_df: int = 256, min_cos2_bp: int = 8100,
    max_hamming: int = 3,
) -> str:
    """SQL twin of pipelines/ensemble.ensemble_clusters: recursive
    transitive closure over the UNION of three edge sets — shingle
    Jaccard ≥ threshold (``_SHINGLE_CTES``), exact integer TF-cosine
    (fragment of ``tf_cosine_pairs_sql``, ``t``-prefixed), and the
    sha-token simhash bit-majority Hamming ≤ max_hamming (fragment of
    ``near.simhash_sha_pairs_sql``, ``s``-prefixed).  Singletons keep
    their own url, exactly like ``near_dup_clusters_sql``."""
    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},{_SHINGLE_CTES},
{_tf_edge_ctes(max_df)},
{_simhash_edge_ctes()},
dup AS (
  SELECT url_a, url_b FROM jac WHERE j >= {threshold}
  UNION
  SELECT d.url_a, d.url_b FROM tdots d
  JOIN tnorms na ON na.url = d.url_a
  JOIN tnorms nb ON nb.url = d.url_b
  WHERE d.dot*d.dot*10000 >= {int(min_cos2_bp)} * na.n2 * nb.n2
  UNION
  SELECT url_a, url_b FROM sham WHERE d <= {int(max_hamming)}),
edges AS (SELECT url_a AS a, url_b AS b FROM dup
          UNION SELECT url_b, url_a FROM dup),
reach(a, b) AS (SELECT a, b FROM edges
  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS url, least(a, min(b)) AS cluster_id
         FROM reach GROUP BY a)
SELECT w.url, coalesce(c.cluster_id, w.url) AS cluster_id
FROM web_pages w LEFT JOIN comp c ON c.url = w.url"""


def detector_agreement_sql(
    threshold: float = 0.7,
    max_df: int = 256,
    min_cos2_bp: int = 8100,
    max_hamming: int = 3,
) -> str:
    """SQL twin of pipelines/ensemble.detector_agreement: tag each edge
    set with its detector name, self-join on the pair, count unordered
    detector combos (diagonal = per-detector pair counts)."""
    return f"""
WITH {WEB_PAGES_CTE},{_SHINGLE_CTES},
{_tf_edge_ctes(max_df)},
{_simhash_edge_ctes()},
tagged AS (
  SELECT 'jaccard' AS det, url_a, url_b FROM jac WHERE j >= {threshold}
  UNION ALL
  SELECT 'tfcos', d.url_a, d.url_b FROM tdots d
  JOIN tnorms na ON na.url = d.url_a
  JOIN tnorms nb ON nb.url = d.url_b
  WHERE d.dot*d.dot*10000 >= {int(min_cos2_bp)} * na.n2 * nb.n2
  UNION ALL
  SELECT 'simhash', url_a, url_b FROM sham WHERE d <= {int(max_hamming)})
SELECT a.det AS detector_a, b.det AS detector_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM tagged a JOIN tagged b USING (url_a, url_b)
WHERE a.det <= b.det
GROUP BY 1, 2"""


def simhash_sha_clusters_sql(max_hamming: int = 3) -> str:
    """Closure twin of ``near.simhash_clusters(hash_fn='sha')``:
    recursive connected components over the brute-force sha-simhash
    Hamming ≤ ``max_hamming`` pair graph (the shared
    ``_simhash_edge_ctes`` fragment), min-member labels, token-less
    docs as their own singleton clusters."""
    return (
        f"WITH RECURSIVE {WEB_PAGES_CTE},\n{_simhash_edge_ctes()},\n"
        f"dup AS (SELECT url_a, url_b FROM sham WHERE d <= {max_hamming}),\n"
        "edges AS (SELECT url_a AS a, url_b AS b FROM dup"
        " UNION SELECT url_b, url_a FROM dup),\n"
        "reach(a, b) AS (SELECT a, b FROM edges"
        " UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),\n"
        "comp AS (SELECT a AS url, least(a, min(b)) AS cluster_id"
        " FROM reach GROUP BY a)\n"
        "SELECT w.url, coalesce(c.cluster_id, w.url) AS cluster_id"
        " FROM web_pages w LEFT JOIN comp c ON c.url = w.url"
    )


def bbit_estimator_eval_sql(threshold: float = 0.7) -> str:
    """SQL twin of grading the 16 B/doc b-bit estimator
    (bbit.incremental_bbit_pairs, sha token hash, Ĵ = 2c−1) against the
    exact cross-corpus Jaccard truth — the 'can dedup run from 16 bytes
    of stored state per doc?' row of the estimator-quality ladder
    (sig_estimator_eval's shape at 1/64 the state)."""
    from data_dedup_ray.pipelines.bbit import incremental_bbit_pairs_sql
    from data_dedup_ray.pipelines.near import cross_corpus_near_pairs_sql

    pred = incremental_bbit_pairs_sql(threshold)
    tru = cross_corpus_near_pairs_sql(threshold)
    return f"""
WITH pred AS MATERIALIZED (
  SELECT new_url, index_url FROM ({pred}) p),
tru AS MATERIALIZED (
  SELECT new_url, index_url FROM ({tru}) t),
m AS (SELECT
  (SELECT count(*) FROM pred) AS n_pred,
  (SELECT count(*) FROM tru) AS n_true,
  (SELECT count(*) FROM pred p JOIN tru t
     ON p.new_url = t.new_url AND p.index_url = t.index_url) AS n_hit)
SELECT 'bbit_estimate' AS tier,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(10000 * n_hit // greatest(n_pred, 1) AS BIGINT) AS precision_bp,
       CAST(10000 * n_hit // greatest(n_true, 1) AS BIGINT) AS recall_bp,
       CAST(20000 * n_hit // greatest(n_pred + n_true, 1) AS BIGINT) AS f1_bp
FROM m"""


def oph_estimator_eval_sql(threshold: float = 0.7) -> str:
    """SQL twin of grading the one-permutation-MinHash estimator
    (oph.oph_pairs_web, sha token hash) against the exact single-corpus
    Jaccard truth — the 'does the 13×-cheaper signature kernel cost
    recall?' row."""
    from data_dedup_ray.pipelines.oph import oph_pairs_sql

    pred = oph_pairs_sql(threshold)
    tru = minhash_pairs_sql(threshold)
    return f"""
WITH pred AS MATERIALIZED (
  SELECT url_a, url_b FROM ({pred}) p),
tru AS MATERIALIZED (
  SELECT url_a, url_b FROM ({tru}) t),
m AS (SELECT
  (SELECT count(*) FROM pred) AS n_pred,
  (SELECT count(*) FROM tru) AS n_true,
  (SELECT count(*) FROM pred p JOIN tru t
     ON p.url_a = t.url_a AND p.url_b = t.url_b) AS n_hit)
SELECT 'oph_estimate' AS tier,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_true AS BIGINT) AS n_true, CAST(n_hit AS BIGINT) AS n_hit,
       CAST(10000 * n_hit // greatest(n_pred, 1) AS BIGINT) AS precision_bp,
       CAST(10000 * n_hit // greatest(n_true, 1) AS BIGINT) AS recall_bp,
       CAST(20000 * n_hit // greatest(n_pred + n_true, 1) AS BIGINT) AS f1_bp
FROM m"""
