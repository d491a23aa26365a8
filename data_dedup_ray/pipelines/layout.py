"""Similarity-ordered storage layout: place near-duplicate pages next
to each other on disk.

Sharded training corpora compress and dedup-scan dramatically better
when similar documents are ADJACENT (a zstd/LZ window then sees the
shared bytes; incremental scans touch one region per duplicate family).
The standard cheap recipe is to sort by a locality-sensitive
fingerprint — SimHash order places small-Hamming (hence high-Jaccard)
pages side by side (the curve-ordering trick of Chierichetti et al.,
"Compressing social networks", and common in web-archive layout).

``similarity_layout`` assigns every token-bearing page a dense global
position in ``(simhash_sha fingerprint, url)`` order — no global sort:
the composite ranks ride the sampled-bounds ordered-prefix-sum shared
with the sorted-neighborhood operator.  ``layout_locality`` is the
PROOF metric: the mean exact Jaccard of ADJACENT pairs under (a) the
fingerprint order and (b) the naive url order — one integer row per
ordering; the fingerprint order should score far higher.  Adjacent
pairs are rank-diff-1 windows (the SNM window machinery at w = 2),
scored by the shared exact-Jaccard join, reduced by a bounded partial
sum — the corpus never lands on the driver.

Both the positions and the metric have exact SQL twins: the sha
fingerprint is the bit-majority restatement of near.simhash_sha_pairs_sql,
reassembled to a HUGEINT whose numeric order equals the zero-padded-hex
composite order the Ray side sorts by.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.corpus import web_pages
from data_dedup_ray.engine.exchange import hash_exchange
from data_dedup_ray.stages.minhash import sha256_token_hash
from data_dedup_ray.stages.simhash import simhash_batch

_SEP = "\x00"

#: shared SQL fragment: per-url sha-simhash fingerprint as HUGEINT
#: (bit-majority vote, ties → 0 — near.simhash_sha_pairs_sql's bits CTE)
_FP_CTES = """
ltoks AS (
  SELECT url, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS tok
  FROM web_pages),
lth AS (SELECT url, substr(sha256(tok), 1, 16) AS h FROM ltoks),
lbits AS (
  SELECT url, g.j,
         CASE WHEN 2 * sum(
           (strpos('0123456789abcdef', substr(h, 16 - (g.j // 4), 1)) - 1)
             // (1 << (g.j % 4)) % 2
         ) > count(*) THEN 1 ELSE 0 END AS fpbit
  FROM lth CROSS JOIN generate_series(0, 63) AS g(j)
  GROUP BY url, g.j),
fps AS (SELECT url, sum(fpbit * (1::HUGEINT << j)) AS fpv
        FROM lbits GROUP BY url)"""


def _fp_comp_rows(sf_dir: str) -> ray.data.Dataset:
    """(comp, url) for token-bearing pages: comp = 16-digit zero-padded
    hex fingerprint + NUL + url (hex order == numeric fp order)."""
    pages = web_pages(sf_dir).select_columns(["url", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        fp, has = simhash_batch(t["text"], token_hash=sha256_token_hash)
        urls = t["url"].combine_chunks().filter(pa.array(has))
        hexes = pa.array([f"{v:016x}" for v in fp], pa.string())
        comp = pc.binary_join_element_wise(hexes, urls, _SEP)
        return pa.table({"comp": comp, "url": urls})

    return pages.map_batches(keyed, batch_format="pyarrow").materialize()


def similarity_layout(sf_dir: str, *,
                      num_partitions: int = 16) -> ray.data.Dataset:
    """``(url, layout_pos)`` — dense 0-based positions in
    (fingerprint, url) order over token-bearing pages, sorted by url."""
    from data_dedup_ray.pipelines.sortedneighborhood import \
        rank_by_composite
    ranked = rank_by_composite(_fp_comp_rows(sf_dir),
                               num_partitions=num_partitions)
    return ranked.map_batches(
        lambda t: t.rename_columns(["url", "layout_pos"]),
        batch_format="pyarrow").sort("url")


def layout_locality(sf_dir: str, *,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """``(ordering, n_pairs, mean_adj_jaccard_bp)`` for the simhash
    layout vs the naive url order — the compression-locality proof."""
    from data_dedup_ray.pipelines.near import verify_pairs_partitioned
    from data_dedup_ray.pipelines.sortedneighborhood import (
        _window_candidates, rank_by_composite)
    P = num_partitions
    pages = web_pages(sf_dir)
    comp_fp = _fp_comp_rows(sf_dir)

    def url_comp(t: pa.Table) -> pa.Table:
        # same token-bearing subset, url order: comp = url itself
        u = t["url"].combine_chunks()
        return pa.table({"comp": u, "url": u})

    comp_url = comp_fp.map_batches(url_comp, batch_format="pyarrow") \
        .materialize()

    out = []
    for name, comp in (("simhash", comp_fp), ("url", comp_url)):
        ranked = rank_by_composite(comp, num_partitions=P)
        adj = _window_candidates(ranked, window=2, num_partitions=P)
        scored = verify_pairs_partitioned(
            pages, adj, threshold=0.0, num_partitions=P)

        def partial(t: pa.Table) -> pa.Table:
            j = t["jaccard"].to_numpy(zero_copy_only=False)
            return pa.table({
                "s": pa.array([int(np.floor(j * 10000).sum())],
                              pa.int64()),
                "n": pa.array([len(j)], pa.int64()),
            })

        agg = scored.map_batches(partial, batch_format="pyarrow") \
            .to_pandas()                      # block-count-sized
        s, n = int(agg["s"].sum()), int(agg["n"].sum())
        out.append((name, n, s // max(n, 1)))
    return ray.data.from_arrow(pa.table({
        "ordering": pa.array([o[0] for o in out], pa.string()),
        "n_pairs": pa.array([o[1] for o in out], pa.int64()),
        "mean_adj_jaccard_bp": pa.array([o[2] for o in out], pa.int64()),
    }))


def similarity_layout_sql() -> str:
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    return (
        f"WITH {WEB_PAGES_CTE},{_FP_CTES}\n"
        "SELECT url, CAST(row_number() OVER (ORDER BY fpv, url) - 1"
        " AS BIGINT) AS layout_pos\n"
        "FROM fps ORDER BY url"
    )


def layout_locality_sql() -> str:
    """Twin: adjacent (rank-diff-1) pairs under each ordering, mean of
    floor(jaccard·10⁴) with zero-overlap pairs counting 0."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import _SHINGLE_CTES

    def one(name, order_expr):
        return f"""
SELECT '{name}' AS ordering,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(coalesce(CAST(floor(j.j * 10000) AS BIGINT), 0))
            // greatest(count(*), 1) AS BIGINT) AS mean_adj_jaccard_bp
FROM (SELECT url, row_number() OVER (ORDER BY {order_expr}) AS r
      FROM fps) a
JOIN (SELECT url, row_number() OVER (ORDER BY {order_expr}) AS r
      FROM fps) b ON b.r = a.r + 1
LEFT JOIN jac j
  ON j.url_a = least(a.url, b.url) AND j.url_b = greatest(a.url, b.url)"""

    return (
        f"WITH {WEB_PAGES_CTE},{_SHINGLE_CTES},{_FP_CTES}\n"
        + one("simhash", "fpv, url")
        + "\nUNION ALL" + one("url", "url")
        + "\nORDER BY ordering"
    )
