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
