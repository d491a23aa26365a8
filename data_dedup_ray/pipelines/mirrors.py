"""Mirror-host intelligence over the web corpus — which HOSTS duplicate
each other, not just which pages.

The reference reports duplicate files and their groups
(/root/reference/lib/Data/Dedup/CLI.pm:286-321); at Common-Crawl scale
the operational question one level up is *which hosts are mirrors of
which* — the host-pair view drives crawl scheduling (skip a mirror
farm), dedup prioritisation (co-partition known-mirror hosts) and
budget allocation (spend fetches where unique content lives).  This
module derives all of that from exact content identity (sha256 of
``text``, the same key the exact-dedup family groups on):

- ``mirror_host_pairs``   — unordered host pairs ranked by how many
  distinct content blobs they share, with each side's distinct-content
  count and an overlap rate in basis points;
- ``dup_locality_stats``  — the intra-host vs cross-host split of all
  exact-duplicate page pairs (template noise vs true mirroring);
- ``mirror_host_clusters``— connected components over the
  ``n_shared >= min_shared`` host-pair graph (mirror farms);
- ``crawl_budget_allocation`` — exact largest-remainder (Hamilton)
  apportionment of a global fetch budget across hosts proportional to
  each host's distinct-content yield.

Scale shape: page text never enters a shuffle — every exchange moves
``(host, sha)`` or smaller.  The sha-keyed exchange co-locates all
copies of one content blob, so per-content host sets and per-content
pair counts are exact with NO global sort; the pair rollup is keyed on
the host-pair string.  Host-level tables (pair list, per-host counts,
allocations) are output-sized — hosts number in the millions where
pages number in the trillions — so collecting THEM on the driver is the
documented small-side pattern, never the page table.  A content blob
mirrored across a huge number of hosts would make its pair emission
quadratic; ``max_hosts_per_content`` drops such blobs (they are
boilerplate, not mirroring) — ``None`` keeps the exact all-pairs
semantics the SQL twin states.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from data_dedup_ray.corpus import WEB_PAGES_CTE
from data_dedup_ray.engine.exchange import hash_exchange, key_partition
from data_dedup_ray.pipelines.components import dsu_components
from data_dedup_ray.pipelines.fpstore import sha256_hex

#: SQL host expression — must match ``_hosts_of`` (split on '/', take the
#: authority component).
_SQL_HOST = "split_part(split_part(url, '//', 2), '/', 1)"


def _hosts_of(urls: pd.Series) -> pd.Series:
    # fillna("") = split_part(url, '/', 3) semantics for malformed urls
    return urls.astype(object).str.split("/").str[2].fillna("")


def _host_sha_prep(P: int, *, counted: bool):
    """Per-batch ``(host, sha[, n])`` partials keyed on sha.  ``counted``
    keeps per-(host, sha) page counts (for pair arithmetic); otherwise
    rows are distinct (host, sha) memberships."""

    def prep(t: pa.Table) -> pa.Table:
        urls = pd.Series(t["url"].to_pylist(), dtype=object)
        host = _hosts_of(urls)
        sha = pd.Series(sha256_hex(t["text"].to_pylist()), dtype=object)
        df = pd.DataFrame({"host": host, "sha": sha})
        g = df.groupby(["host", "sha"], sort=False).size().rename("n")
        g = g.reset_index()
        if not counted:
            g = g.drop(columns=["n"])
        g["_part"] = key_partition(g["sha"].to_numpy(object), P)
        return pa.Table.from_pandas(g, preserve_index=False)

    return prep


def _distinct_member(t: pa.Table) -> pa.Table:
    """Map-side combiner: collapse repeated (host, sha) memberships."""
    return t.group_by(["host", "sha", "_part"]).aggregate([])


def _sum_counts(t: pa.Table) -> pa.Table:
    return (t.group_by(["host", "sha", "_part"]).aggregate([("n", "sum")])
            .rename_columns(["host", "sha", "_part", "n"]))


_MEMBER_SCHEMA = pa.schema([("host", pa.string()), ("sha", pa.string())])
_COUNTED_SCHEMA = pa.schema([
    ("host", pa.string()), ("sha", pa.string()), ("n", pa.int64())])

_PAIR_PART_SCHEMA = pa.schema([
    ("host_a", pa.string()), ("host_b", pa.string()), ("n", pa.int64())])
_PAIR_SCHEMA = pa.schema([
    ("host_a", pa.string()), ("host_b", pa.string()),
    ("n_shared", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64()),
    ("overlap_bp", pa.int64()),
])


def host_content_counts(ds: ray.data.Dataset, *,
                        num_partitions: int = 16) -> ray.data.Dataset:
    """``(host, n_pages, n_distinct)`` — per-host page and distinct-sha
    counts via ONE host-keyed exchange (each host fully local, so the
    nunique is exact)."""
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        urls = pd.Series(t["url"].to_pylist(), dtype=object)
        host = _hosts_of(urls)
        sha = pd.Series(sha256_hex(t["text"].to_pylist()), dtype=object)
        g = (pd.DataFrame({"host": host, "sha": sha})
             .groupby(["host", "sha"], sort=False).size().rename("n")
             .reset_index())
        g["_part"] = key_partition(g["host"].to_numpy(object), P)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("host", sort=False).agg(
            n_pages=("n", "sum"), n_distinct=("sha", "nunique")
        ).reset_index()
        out["n_pages"] = out["n_pages"].astype(np.int64)
        return out

    return hash_exchange(
        [ds.map_batches(prep, batch_format="pyarrow")],
        final, num_partitions=P,
        schema=pa.schema([("host", pa.string()), ("n_pages", pa.int64()),
                          ("n_distinct", pa.int64())]),
        in_schemas=[_COUNTED_SCHEMA], pre=[_sum_counts])


def mirror_host_pairs(
    ds: ray.data.Dataset, *, num_partitions: int = 16,
    max_hosts_per_content: int | None = None,
) -> ray.data.Dataset:
    """Host pairs ranked by shared distinct content: ``(host_a, host_b,
    n_shared, n_a, n_b, overlap_bp)`` with ``host_a < host_b`` and
    ``overlap_bp = n_shared * 10000 // min(n_a, n_b)``.

    Sha-keyed exchange → per-content host set → pair emission (self-merge
    within the sha-local partition) → pair-keyed exchange summing across
    content blobs.  Per-host denominators come from
    ``host_content_counts`` (host-count-sized) broadcast into the final
    vectorized map."""
    P = num_partitions

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["host", "sha"])
        if max_hosts_per_content is not None:
            sizes = df.groupby("sha", sort=False)["host"].transform("size")
            df = df[sizes <= max_hosts_per_content]
        m = df.merge(df, on="sha", suffixes=("_a", "_b"))
        m = m[m["host_a"] < m["host_b"]]
        if not len(m):
            return pd.DataFrame({"host_a": pd.Series([], dtype=object),
                                 "host_b": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.int64)})
        g = (m.groupby(["host_a", "host_b"], sort=False)
             .size().rename("n").reset_index())
        key = g["host_a"].astype(object) + "|" + g["host_b"].astype(object)
        g["_part"] = key_partition(key.to_numpy(object), P)
        return g

    partial = hash_exchange(
        [ds.map_batches(_host_sha_prep(P, counted=False),
                        batch_format="pyarrow")],
        emit_pairs, num_partitions=P,
        schema=pa.schema([("host_a", pa.string()), ("host_b", pa.string()),
                          ("n", pa.int64()), ("_part", pa.int64())]),
        in_schemas=[_MEMBER_SCHEMA], pre=[_distinct_member])

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["host_a", "host_b"], sort=False)["n"].sum()
                .rename("n_shared").reset_index())

    pairs = hash_exchange(
        [partial], sum_pairs, num_partitions=P,
        schema=pa.schema([("host_a", pa.string()), ("host_b", pa.string()),
                          ("n_shared", pa.int64())]),
        in_schemas=[_PAIR_PART_SCHEMA])

    # per-host distinct counts: host-count-sized small side (the pattern:
    # collect the HOST table, never the page table; at extreme host
    # counts this becomes a ray.put broadcast into the same map)
    hc = host_content_counts(ds, num_partitions=P).to_pandas()
    # empty Datasets round-trip to column-less DataFrames — guard len
    n_of = (dict(zip(hc["host"], hc["n_distinct"].astype(np.int64)))
            if len(hc) else {})

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        na = df["host_a"].map(n_of).astype(np.int64)
        nb = df["host_b"].map(n_of).astype(np.int64)
        out = pd.DataFrame({
            "host_a": df["host_a"], "host_b": df["host_b"],
            "n_shared": df["n_shared"].astype(np.int64),
            "n_a": na, "n_b": nb,
            "overlap_bp": (df["n_shared"].astype(np.int64) * 10000
                           // np.minimum(na, nb)),
        })
        return out

    return pairs.map_batches(finish, batch_format="pandas")


def mirror_host_pairs_sql() -> str:
    return (
        f"""WITH {WEB_PAGES_CTE},
ph AS (SELECT DISTINCT {_SQL_HOST} AS host, text
           FROM web_pages),
hp AS (SELECT a.host AS host_a, b.host AS host_b,
              CAST(count(*) AS BIGINT) AS n_shared
       FROM ph a JOIN ph b ON a.text = b.text AND a.host < b.host
       GROUP BY 1, 2),
hc AS (SELECT host, CAST(count(*) AS BIGINT) AS n_distinct
       FROM ph GROUP BY 1)
SELECT host_a, host_b, n_shared,
       x.n_distinct AS n_a, y.n_distinct AS n_b,
       n_shared * 10000 // least(x.n_distinct, y.n_distinct) AS overlap_bp
FROM hp JOIN hc x ON x.host = host_a JOIN hc y ON y.host = host_b"""
    )


_LOCALITY_SCHEMA = pa.schema([
    ("n_dup_pairs", pa.int64()), ("n_intra_host", pa.int64()),
    ("n_cross_host", pa.int64()), ("cross_bp", pa.int64()),
])


def dup_locality_stats(ds: ray.data.Dataset, *,
                       num_partitions: int = 16) -> ray.data.Dataset:
    """ONE row: of all exact-duplicate page pairs, how many are
    intra-host (template / self-duplication) vs cross-host (mirroring /
    syndication) — ``(n_dup_pairs, n_intra_host, n_cross_host,
    cross_bp)``.  Per content blob with ``k`` pages of which ``k_h`` sit
    on host ``h``: pairs = C(k,2), intra = Σ_h C(k_h,2).  The sha-keyed
    exchange makes both exact per partition; the driver sums P tiny
    partial rows."""
    P = num_partitions

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"pairs": pd.Series([], dtype=np.int64),
                                 "intra": pd.Series([], dtype=np.int64)})
        hs = (df.groupby(["sha", "host"], sort=False)["n"].sum()
              .reset_index())
        c = hs["n"].to_numpy(np.int64)
        intra = int((c * (c - 1) // 2).sum())
        k = hs.groupby("sha", sort=False)["n"].sum().to_numpy(np.int64)
        pairs = int((k * (k - 1) // 2).sum())
        return pd.DataFrame({"pairs": [pairs], "intra": [intra]})

    parts = hash_exchange(
        [ds.map_batches(_host_sha_prep(P, counted=True),
                        batch_format="pyarrow")],
        partial, num_partitions=P,
        schema=pa.schema([("pairs", pa.int64()), ("intra", pa.int64())]),
        in_schemas=[_COUNTED_SCHEMA], pre=[_sum_counts],
    ).to_pandas()  # P one-row partials — trivially output-sized
    pairs = int(parts["pairs"].sum()) if len(parts) else 0
    intra = int(parts["intra"].sum()) if len(parts) else 0
    cross = pairs - intra
    return ray.data.from_arrow(pa.table({
        "n_dup_pairs": pa.array([pairs], pa.int64()),
        "n_intra_host": pa.array([intra], pa.int64()),
        "n_cross_host": pa.array([cross], pa.int64()),
        "cross_bp": pa.array([cross * 10000 // max(pairs, 1)], pa.int64()),
    }))


def dup_locality_stats_sql() -> str:
    return (
        f"""WITH {WEB_PAGES_CTE},
th AS (SELECT {_SQL_HOST} AS host, text,
                  CAST(count(*) AS BIGINT) AS c
           FROM web_pages GROUP BY 1, 2),
t AS (SELECT text, CAST(sum(c) AS BIGINT) AS k,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS intra
      FROM th GROUP BY 1),
s AS (SELECT CAST(sum(k * (k - 1) // 2) AS BIGINT) AS pairs,
             CAST(sum(intra) AS BIGINT) AS intra FROM t)
SELECT pairs AS n_dup_pairs, intra AS n_intra_host,
       pairs - intra AS n_cross_host,
       (pairs - intra) * 10000 // greatest(pairs, 1) AS cross_bp
FROM s"""
    )


def mirror_host_clusters(ds: ray.data.Dataset, *, min_shared: int = 2,
                         num_partitions: int = 16) -> ray.data.Dataset:
    """``(host, cluster_id)`` — connected components over the host-pair
    graph restricted to pairs sharing ≥ ``min_shared`` distinct content
    blobs; cluster_id is the component's min host, singletons label
    themselves.  The edge list and host list are HOST-scale (output-
    sized), so the driver union-find is the honest tool here — this is
    the small graph distilled FROM the page-scale exchanges above, not a
    page graph."""
    pairs = mirror_host_pairs(ds, num_partitions=num_partitions).to_pandas()
    edges = (pairs.loc[pairs["n_shared"] >= min_shared,
                       ["host_a", "host_b"]]
             if len(pairs) else pd.DataFrame(columns=["host_a", "host_b"]))
    hc = host_content_counts(ds, num_partitions=num_partitions).to_pandas()
    hosts = hc["host"] if len(hc) else pd.Series([], dtype=object)
    label = dsu_components(
        edges.rename(columns={"host_a": "url_a", "host_b": "url_b"}))
    out = pd.DataFrame({
        "host": hosts.astype(object),
        "cluster_id": hosts.map(lambda h: label.get(h, h)).astype(object),
    })
    return ray.data.from_arrow(pa.Table.from_pandas(
        out, schema=pa.schema([("host", pa.string()),
                               ("cluster_id", pa.string())]),
        preserve_index=False))


def mirror_host_clusters_sql(min_shared: int = 2) -> str:
    body = f"""ph AS (SELECT DISTINCT {_SQL_HOST} AS host, text
       FROM web_pages),
hp AS (SELECT a.host AS host_a, b.host AS host_b
       FROM ph a JOIN ph b ON a.text = b.text AND a.host < b.host
       GROUP BY 1, 2 HAVING count(*) >= {min_shared}),
edges AS (SELECT host_a AS a, host_b AS b FROM hp
          UNION SELECT host_b, host_a FROM hp),
reach(a, b) AS (SELECT a, b FROM edges
  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
comp AS (SELECT a AS host, least(a, min(b)) AS cluster_id
         FROM reach GROUP BY a),
hosts AS (SELECT DISTINCT {_SQL_HOST} AS host FROM web_pages)
SELECT h.host, coalesce(c.cluster_id, h.host) AS cluster_id
FROM hosts h LEFT JOIN comp c ON c.host = h.host"""
    return f"WITH RECURSIVE {WEB_PAGES_CTE},\n{body}"


_NEAR_HP_SCHEMA = pa.schema([
    ("host_a", pa.string()), ("host_b", pa.string()),
    ("n_pairs", pa.int64()),
])


def near_host_pairs(pairs: ray.data.Dataset, *,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """Host-pair rollup of VERIFIED near-dup page pairs: ``(host_a,
    host_b, n_pairs)`` with ``host_a <= host_b`` (equal = intra-host
    template duplication; distinct = cross-host syndication the exact-sha
    mirror view can't see).  Input is the output-sized verified pair list
    (e.g. ``near.minhash_dedup_pairs``); one pair-keyed exchange sums the
    per-batch partials."""
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        ha = _hosts_of(pd.Series(t["url_a"].to_pylist(), dtype=object))
        hb = _hosts_of(pd.Series(t["url_b"].to_pylist(), dtype=object))
        lo = np.minimum(ha.to_numpy(object), hb.to_numpy(object))
        hi = np.maximum(ha.to_numpy(object), hb.to_numpy(object))
        g = (pd.DataFrame({"host_a": lo, "host_b": hi})
             .groupby(["host_a", "host_b"], sort=False)
             .size().rename("n").reset_index())
        key = g["host_a"].astype(object) + "|" + g["host_b"].astype(object)
        g["_part"] = key_partition(key.to_numpy(object), P)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["host_a", "host_b"], sort=False)["n"].sum()
                .rename("n_pairs").reset_index())

    return hash_exchange(
        [pairs.map_batches(prep, batch_format="pyarrow")],
        final, num_partitions=P, schema=_NEAR_HP_SCHEMA,
        in_schemas=[pa.schema([("host_a", pa.string()),
                               ("host_b", pa.string()),
                               ("n", pa.int64())])])


def near_host_pairs_sql(threshold: float = 0.7) -> str:
    from data_dedup_ray.oracles import _SHINGLE_CTES

    ha = "split_part(split_part(url_a, '//', 2), '/', 1)"
    hb = "split_part(split_part(url_b, '//', 2), '/', 1)"
    return (
        f"WITH {WEB_PAGES_CTE},{_SHINGLE_CTES},\n"
        f"d AS (SELECT least({ha}, {hb}) AS host_a,"
        f" greatest({ha}, {hb}) AS host_b"
        f" FROM jac WHERE j >= {threshold})\n"
        f"SELECT host_a, host_b, CAST(count(*) AS BIGINT) AS n_pairs"
        f" FROM d GROUP BY 1, 2"
    )


_SAVINGS_SCHEMA = pa.schema([
    ("host", pa.string()), ("n_pages", pa.int64()),
    ("total_tokens", pa.int64()), ("kept_tokens", pa.int64()),
    ("savings_bp", pa.int64()),
])


def token_savings_by_host(ds: ray.data.Dataset, *,
                          num_partitions: int = 16) -> ray.data.Dataset:
    """Per-host training-cost impact of exact dedup: ``(host, n_pages,
    total_tokens, kept_tokens, savings_bp)`` where ``kept_tokens`` keeps
    ONE copy per distinct content blob within the host and
    ``savings_bp = (total - kept) * 10000 // total``.  Token counts use
    the shared case-folded ``[a-z0-9]+`` tokenizer (stages/minhash
    ``token_counts`` — one vectorized polars pass), so the number means
    the same thing here as in every other token operator.  The exchange
    moves ``(host, sha, n_copies, n_tokens)`` partials only."""
    from data_dedup_ray.stages.minhash import token_counts

    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        urls = pd.Series(t["url"].to_pylist(), dtype=object)
        host = _hosts_of(urls)
        sha = pd.Series(sha256_hex(t["text"].to_pylist()), dtype=object)
        nt = token_counts(t["text"], lowercase=True)
        g = (pd.DataFrame({"host": host, "sha": sha, "nt": nt})
             .groupby(["host", "sha"], sort=False)
             .agg(n=("nt", "size"), nt=("nt", "first")).reset_index())
        g["_part"] = key_partition(g["host"].to_numpy(object), P)
        return pa.Table.from_pandas(g, preserve_index=False)

    def pre(t: pa.Table) -> pa.Table:
        # combiner: same (host, sha) rows carry identical nt — sum copies
        return (t.group_by(["host", "sha", "_part"])
                .aggregate([("n", "sum"), ("nt", "max")])
                .rename_columns(["host", "sha", "_part", "n", "nt"]))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64 if c != "host" else object)
                 for c in _SAVINGS_SCHEMA.names})
        # the pre combiner runs per SPLIT GROUP — re-aggregate (host, sha)
        # here or kept_tokens double-counts blobs seen by several groups
        df = (df.groupby(["host", "sha"], sort=False)
              .agg(n=("n", "sum"), nt=("nt", "max")).reset_index())
        total = (df["n"].to_numpy(np.int64) * df["nt"].to_numpy(np.int64))
        tmp = df.assign(tot=total)
        out = tmp.groupby("host", sort=False).agg(
            n_pages=("n", "sum"), total_tokens=("tot", "sum"),
            kept_tokens=("nt", "sum")).reset_index()
        t = out["total_tokens"].to_numpy(np.int64)
        k = out["kept_tokens"].to_numpy(np.int64)
        out["savings_bp"] = (t - k) * 10000 // np.maximum(t, 1)
        return out.astype({c: np.int64 for c in out.columns
                           if c != "host"})

    return hash_exchange(
        [ds.map_batches(prep, batch_format="pyarrow")],
        final, num_partitions=P, schema=_SAVINGS_SCHEMA,
        in_schemas=[pa.schema([
            ("host", pa.string()), ("sha", pa.string()),
            ("n", pa.int64()), ("nt", pa.int64())])],
        pre=[pre])


def token_savings_by_host_sql() -> str:
    nt = "len(regexp_extract_all(lower(text), '[a-z0-9]+'))"
    return (
        f"""WITH {WEB_PAGES_CTE},
th AS (SELECT {_SQL_HOST} AS host, text,
              CAST(count(*) AS BIGINT) AS c,
              CAST({nt} AS BIGINT) AS nt
       FROM web_pages GROUP BY 1, 2),
s AS (SELECT host, CAST(sum(c) AS BIGINT) AS n_pages,
             CAST(sum(c * nt) AS BIGINT) AS total_tokens,
             CAST(sum(nt) AS BIGINT) AS kept_tokens
      FROM th GROUP BY 1)
SELECT host, n_pages, total_tokens, kept_tokens,
       (total_tokens - kept_tokens) * 10000
         // greatest(total_tokens, 1) AS savings_bp
FROM s"""
    )


_TOPDUP_SCHEMA = pa.schema([
    ("sha", pa.string()), ("n_copies", pa.int64()),
    ("n_hosts", pa.int64()), ("first_url", pa.string()),
])


def top_dup_content(ds: ray.data.Dataset, *, k: int = 20,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """The "what IS all this duplication" ops view: top-``k`` content
    blobs by copy count — ``(sha, n_copies, n_hosts, first_url)`` with
    deterministic ties (count desc, sha asc) and ``first_url`` = min url
    of the blob (the canonical exemplar to eyeball).  Sha-keyed exchange
    makes per-blob counts/host-sets/min-url exact per partition; each
    partition prunes to its own top-k, so the driver sees ≤ P·k rows."""
    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        urls = pd.Series(t["url"].to_pylist(), dtype=object)
        sha = pd.Series(sha256_hex(t["text"].to_pylist()), dtype=object)
        host = _hosts_of(urls)
        g = (pd.DataFrame({"sha": sha, "host": host, "url": urls})
             .groupby(["sha", "host"], sort=False)
             .agg(n=("url", "size"), url=("url", "min")).reset_index())
        g["_part"] = key_partition(g["sha"].to_numpy(object), P)
        return pa.Table.from_pandas(g, preserve_index=False)

    def pre(t: pa.Table) -> pa.Table:
        return (t.group_by(["sha", "host", "_part"])
                .aggregate([("n", "sum"), ("url", "min")])
                .rename_columns(["sha", "host", "_part", "n", "url"]))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "sha": pd.Series([], dtype=object),
                "n_copies": pd.Series([], dtype=np.int64),
                "n_hosts": pd.Series([], dtype=np.int64),
                "first_url": pd.Series([], dtype=object)})
        # re-aggregate (sha, host): the combiner ran per split group
        df = (df.groupby(["sha", "host"], sort=False)
              .agg(n=("n", "sum"), url=("url", "min")).reset_index())
        g = df.groupby("sha", sort=False).agg(
            n_copies=("n", "sum"), n_hosts=("host", "nunique"),
            first_url=("url", "min")).reset_index()
        g = g.sort_values(["n_copies", "sha"], ascending=[False, True],
                          kind="mergesort").head(k)
        g["n_copies"] = g["n_copies"].astype(np.int64)
        g["n_hosts"] = g["n_hosts"].astype(np.int64)
        return g

    cand = hash_exchange(
        [ds.map_batches(prep, batch_format="pyarrow")],
        topk, num_partitions=P, schema=_TOPDUP_SCHEMA,
        in_schemas=[pa.schema([
            ("sha", pa.string()), ("host", pa.string()),
            ("n", pa.int64()), ("url", pa.string())])],
        pre=[pre],
    ).to_pandas()  # ≤ P·k candidate rows
    out = cand.sort_values(["n_copies", "sha"], ascending=[False, True],
                           kind="mergesort").head(k)
    return ray.data.from_arrow(pa.Table.from_pandas(
        out, schema=_TOPDUP_SCHEMA, preserve_index=False))


def top_dup_content_sql(k: int = 20) -> str:
    return (
        f"""WITH {WEB_PAGES_CTE},
g AS (SELECT sha256(text) AS sha,
             CAST(count(*) AS BIGINT) AS n_copies,
             CAST(count(DISTINCT {_SQL_HOST}) AS BIGINT) AS n_hosts,
             min(url) AS first_url
      FROM web_pages GROUP BY text)
SELECT sha, n_copies, n_hosts, first_url FROM g
ORDER BY n_copies DESC, sha LIMIT {k}"""
    )


_AUDIT_SCHEMA = pa.schema([
    ("url_a", pa.string()), ("url_b", pa.string()),
    ("jaccard_bp", pa.int64()),
])


def audit_sample_pairs(pairs: ray.data.Dataset, *,
                       keep_mod: int = 7) -> ray.data.Dataset:
    """Deterministic 1/``keep_mod`` QA sample of verified near-dup pairs
    for human audit: keep a pair iff the first 8 hex chars of
    ``md5(url_a || chr(1) || url_b)`` parse to an int ≡ 0 mod
    ``keep_mod`` — the same selection every run, every engine, every
    scale (no RNG state), restated verbatim in the DuckDB twin.  A plain
    streaming filter over the output-sized pair list; per-row hashing is
    fine here because the input is pairs, not pages."""
    import hashlib

    def keep(t: pa.Table) -> pa.Table:
        ua = t["url_a"].to_pylist()
        ub = t["url_b"].to_pylist()
        mask = np.fromiter(
            (int(hashlib.md5((a + "\x01" + b).encode("utf-8"))
                 .hexdigest()[:8], 16) % keep_mod == 0
             for a, b in zip(ua, ub)),
            dtype=bool, count=len(ua))
        jb = np.floor(np.asarray(
            t["jaccard"].to_numpy(zero_copy_only=False), dtype=np.float64)
            * 10000).astype(np.int64)
        out = pa.table({
            "url_a": pa.array(ua, pa.string()),
            "url_b": pa.array(ub, pa.string()),
            "jaccard_bp": pa.array(jb),
        })
        return out.filter(pa.array(mask))

    return pairs.map_batches(keep, batch_format="pyarrow")


def audit_sample_pairs_sql(threshold: float = 0.7,
                           keep_mod: int = 7) -> str:
    from data_dedup_ray.oracles import _SHINGLE_CTES

    return (
        f"WITH {WEB_PAGES_CTE},{_SHINGLE_CTES}\n"
        f"SELECT url_a, url_b,"
        f" CAST(floor(j * 10000) AS BIGINT) AS jaccard_bp\n"
        f"FROM jac WHERE j >= {threshold}\n"
        f"AND CAST(('0x' || substr(md5(url_a || chr(1) || url_b), 1, 8))"
        f" AS BIGINT) % {keep_mod} = 0"
    )


_BUDGET_SCHEMA = pa.schema([
    ("host", pa.string()), ("n_distinct", pa.int64()),
    ("alloc", pa.int64()),
])


def crawl_budget_allocation(ds: ray.data.Dataset, *,
                            budget: int = 100_000,
                            num_partitions: int = 16) -> ray.data.Dataset:
    """Exact largest-remainder (Hamilton) apportionment of ``budget``
    fetches across hosts proportional to distinct-content yield:
    ``(host, n_distinct, alloc)`` with ``sum(alloc) == budget`` exactly.
    Floor share = ``budget * n_h // S``; the ``budget - Σfloor`` leftover
    goes to the largest remainders (ties broken by host ascending) — all
    int64, so bit-identical to the window-function SQL twin.  The
    apportionment itself runs on the HOST table (output-sized); only the
    distinct-count exchange touches pages."""
    hc = host_content_counts(ds, num_partitions=num_partitions).to_pandas()
    if not len(hc):
        return ray.data.from_arrow(_BUDGET_SCHEMA.empty_table())
    hc = hc.sort_values("host", kind="mergesort").reset_index(drop=True)
    n = hc["n_distinct"].to_numpy(np.int64)
    total = int(n.sum())
    floor = budget * n // total
    rem = budget * n % total
    extra = budget - int(floor.sum())
    order = np.lexsort((hc["host"].to_numpy(object), -rem))
    alloc = floor.copy()
    alloc[order[:extra]] += 1
    return ray.data.from_arrow(pa.table({
        "host": pa.array(hc["host"].to_numpy(object), pa.string()),
        "n_distinct": pa.array(n),
        "alloc": pa.array(alloc),
    }))


def crawl_budget_allocation_sql(budget: int = 100_000) -> str:
    return (
        f"""WITH {WEB_PAGES_CTE},
hc AS (SELECT {_SQL_HOST} AS host,
                 CAST(count(DISTINCT text) AS BIGINT) AS n_distinct
          FROM web_pages GROUP BY 1),
tot AS (SELECT CAST(sum(n_distinct) AS BIGINT) AS s FROM hc),
q AS (SELECT host, n_distinct,
             {budget} * n_distinct // s AS fl,
             {budget} * n_distinct % s AS rem
      FROM hc, tot),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rn FROM q),
k AS (SELECT {budget} - CAST(sum(fl) AS BIGINT) AS extra FROM q)
SELECT host, n_distinct,
       CAST(fl + CASE WHEN rn <= extra THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r, k"""
    )


# --------------------------------------------------------------------------
# Host-shard placement plan: deterministic hash sharding + skew report
# --------------------------------------------------------------------------

_SHARD_SCHEMA = pa.schema([
    ("shard_id", pa.int64()), ("n_hosts", pa.int64()),
    ("n_pages", pa.int64()), ("text_bytes", pa.int64()),
    ("load_bp", pa.int64()),
])

_SHARD_IN = pa.schema([
    ("host", pa.string()), ("n_pages", pa.int64()),
    ("text_bytes", pa.int64()),
])

_SHARD_MID = pa.schema([
    ("shard_id", pa.int64()), ("n_hosts", pa.int64()),
    ("n_pages", pa.int64()), ("text_bytes", pa.int64()),
])


def host_shard_plan(ds: ray.data.Dataset, *, n_shards: int = 8,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """Deterministic host→shard placement plan + its skew report:
    ``(shard_id, n_hosts, n_pages, text_bytes, load_bp)`` where
    ``shard_id = int(md5(host)[:8], 16) % n_shards`` (stable across
    runs, engines and cluster sizes — the co-location key an index or a
    dedup store would partition on, since same-host pages MUST land
    together for politeness and template locality) and ``load_bp =
    n_pages * 10000 * n_shards // total_pages`` (10000 = perfectly
    balanced).  The table an operator reads before picking ``n_shards``:
    a hot host shows up as a shard with load_bp ≫ 10000.

    Shape: per-batch (host, pages, bytes) partials → ONE host-keyed
    exchange makes per-host totals exact → shard rollup keyed on
    shard_id (host-count-sized rows, S exact rows out); the total for
    load_bp folds in driver-side from the S-row table — text never
    shuffles, byte lengths are computed in the read pass."""
    import hashlib

    P = num_partitions

    def prep(t: pa.Table) -> pa.Table:
        urls = pd.Series(t["url"].to_pylist(), dtype=object)
        host = _hosts_of(urls)
        tb = np.fromiter(
            (len(s.encode("utf-8")) for s in t["text"].to_pylist()),
            np.int64, len(urls))
        g = (pd.DataFrame({"host": host, "text_bytes": tb})
             .groupby("host", sort=False)
             .agg(n_pages=("text_bytes", "size"),
                  text_bytes=("text_bytes", "sum")).reset_index())
        return pa.table({
            "host": pa.array(g["host"], pa.string()),
            "n_pages": pa.array(g["n_pages"].to_numpy(np.int64)),
            "text_bytes": pa.array(g["text_bytes"].to_numpy(np.int64)),
            "_part": pa.array(key_partition(
                g["host"].to_numpy(object), P)),
        })

    def per_host(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("host", sort=False)
             .agg(n_pages=("n_pages", "sum"),
                  text_bytes=("text_bytes", "sum")).reset_index())
        g["shard_id"] = [
            int(hashlib.md5(h.encode("utf-8")).hexdigest()[:8], 16)
            % n_shards for h in g["host"]]
        s = (g.groupby("shard_id", sort=False)
             .agg(n_hosts=("host", "size"), n_pages=("n_pages", "sum"),
                  text_bytes=("text_bytes", "sum")).reset_index())
        s["_part"] = s["shard_id"].to_numpy(np.int64) % P
        return s

    hosts = hash_exchange(
        [ds.map_batches(prep, batch_format="pyarrow")], per_host,
        num_partitions=P,
        schema=pa.schema(list(_SHARD_MID) + [("_part", pa.int64())]),
        in_schemas=[_SHARD_IN])

    def per_shard(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("shard_id", sort=False)
                .agg(n_hosts=("n_hosts", "sum"),
                     n_pages=("n_pages", "sum"),
                     text_bytes=("text_bytes", "sum")).reset_index())

    shards = hash_exchange(
        [hosts], per_shard, num_partitions=P,
        schema=_SHARD_MID, in_schemas=[_SHARD_MID]).to_pandas()
    total = int(shards["n_pages"].sum()) if len(shards) else 0
    if total:
        shards["load_bp"] = (shards["n_pages"].to_numpy(np.int64)
                             * 10000 * n_shards // total)
    else:
        shards["load_bp"] = pd.Series([], dtype=np.int64)
    return ray.data.from_pandas(
        shards[["shard_id", "n_hosts", "n_pages", "text_bytes",
                "load_bp"]])


def host_shard_plan_sql(n_shards: int = 8) -> str:
    return f"""WITH {WEB_PAGES_CTE},
h AS (
  SELECT {_SQL_HOST} AS host, count(*) AS n_pages,
         CAST(sum(strlen(text)) AS BIGINT) AS text_bytes
  FROM web_pages GROUP BY 1
), s AS (
  SELECT CAST(('0x' || substr(md5(host), 1, 8)) AS BIGINT) % {n_shards}
           AS shard_id,
         count(*) AS n_hosts,
         CAST(sum(n_pages) AS BIGINT) AS n_pages,
         CAST(sum(text_bytes) AS BIGINT) AS text_bytes
  FROM h GROUP BY 1
)
SELECT shard_id, n_hosts, n_pages, text_bytes,
       CAST(n_pages * 10000 * {n_shards}
            // (SELECT sum(n_pages) FROM s) AS BIGINT) AS load_bp
FROM s"""


_PROV_SCHEMA = pa.schema([
    ("cluster_id", pa.string()), ("n_members", pa.int64()),
    ("n_hosts", pa.int64()), ("first_us", pa.int64()),
    ("last_us", pa.int64()), ("span_days", pa.int64()),
])

_PROV_PARTIAL = pa.schema([
    ("cluster_id", pa.string()), ("host", pa.string()),
    ("n", pa.int64()), ("min_us", pa.int64()), ("max_us", pa.int64()),
])


def cluster_provenance(
    sf_dir: str, *, threshold: float = 0.7, num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per multi-member near-dup cluster: ``(cluster_id, n_members,
    n_hosts, first_us, last_us, span_days)`` — the PROVENANCE view of a
    duplicate family (how broadly is this content syndicated, how long
    has it been circulating), the row a crawl-policy or takedown
    review reads per family.  ``first_us/last_us`` are epoch
    microseconds of the earliest/latest capture.

    Shape: the (url, cluster_id) assignment co-partitions with the
    page metadata on url (one exchange; two short columns + one int64
    per page — text never moves), reduced to per-(cluster, host)
    partials; a second cluster-keyed exchange rolls families up whole
    (distinct-host counts are local because members co-locate).
    Output is multi-member-cluster-sized."""
    from data_dedup_ray.corpus import web_pages
    from data_dedup_ray.pipelines import near

    P = num_partitions
    clusters = near.minhash_dedup_clusters(web_pages(sf_dir),
                                           threshold=threshold)

    def prep_assign(t: pa.Table) -> pa.Table:
        urls = t["url"].combine_chunks().cast(pa.string())
        out = pa.table({"url": urls,
                        "cluster_id": t["cluster_id"].combine_chunks()
                        .cast(pa.string())})
        return out.append_column("_part", pa.array(key_partition(
            urls.to_numpy(zero_copy_only=False), P)))

    def prep_meta(t: pa.Table) -> pa.Table:
        urls = t["url"].combine_chunks().cast(pa.string())
        ts = t["warc_ts"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64())
        out = pa.table({"url": urls, "ts_us": ts})
        return out.append_column("_part", pa.array(key_partition(
            urls.to_numpy(zero_copy_only=False), P)))

    meta = web_pages(sf_dir).select_columns(["url", "warc_ts"]) \
        .map_batches(prep_meta, batch_format="pyarrow")

    def join_partials(da: pd.DataFrame, dm: pd.DataFrame) -> pd.DataFrame:
        if not len(da):
            return pd.DataFrame({
                "cluster_id": pd.Series([], dtype=object),
                "host": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "min_us": pd.Series([], dtype=np.int64),
                "max_us": pd.Series([], dtype=np.int64)})
        m = da.merge(dm, on="url")
        m["host"] = _hosts_of(m["url"])
        g = m.groupby(["cluster_id", "host"], sort=False,
                      as_index=False).agg(
            n=("url", "size"), min_us=("ts_us", "min"),
            max_us=("ts_us", "max"))
        return g

    partials = hash_exchange(
        [clusters.map_batches(prep_assign, batch_format="pyarrow"),
         meta],
        join_partials, num_partitions=P, schema=_PROV_PARTIAL,
        in_schemas=[
            pa.schema([("url", pa.string()),
                       ("cluster_id", pa.string())]),
            pa.schema([("url", pa.string()), ("ts_us", pa.int64())]),
        ],
    )

    def with_part(t: pa.Table) -> pa.Table:
        return t.append_column("_part", pa.array(key_partition(
            t["cluster_id"].combine_chunks()
            .to_numpy(zero_copy_only=False), P)))

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "cluster_id": pd.Series([], dtype=object),
                "n_members": pd.Series([], dtype=np.int64),
                "n_hosts": pd.Series([], dtype=np.int64),
                "first_us": pd.Series([], dtype=np.int64),
                "last_us": pd.Series([], dtype=np.int64),
                "span_days": pd.Series([], dtype=np.int64)})
        g = df.groupby("cluster_id", sort=False).agg(
            n_members=("n", "sum"), n_hosts=("host", "nunique"),
            first_us=("min_us", "min"), last_us=("max_us", "max"))
        g = g[g["n_members"] >= 2].reset_index()
        g["span_days"] = (g["last_us"] - g["first_us"]) \
            .to_numpy(np.int64) // 86_400_000_000
        return g[["cluster_id", "n_members", "n_hosts", "first_us",
                  "last_us", "span_days"]]

    return hash_exchange(
        [partials.map_batches(with_part, batch_format="pyarrow")],
        rollup, num_partitions=P, schema=_PROV_SCHEMA,
        in_schemas=[_PROV_PARTIAL],
    )


def cluster_provenance_sql(threshold: float = 0.7) -> str:
    """DuckDB twin: the near-dup closure labels (nested full statement,
    the keep_best pattern) + per-cluster member / distinct-host /
    epoch_us capture-window aggregates over multi-member clusters."""
    from data_dedup_ray.corpus import WEB_PAGES_CTE
    from data_dedup_ray.oracles import near_dup_clusters_sql

    return f"""
WITH RECURSIVE {WEB_PAGES_CTE},
clusters AS (
{near_dup_clusters_sql(threshold)}
),
m AS (
  SELECT c.cluster_id,
         {_SQL_HOST.replace("url", "w.url")} AS host,
         epoch_us(w.warc_ts) AS ts_us
  FROM clusters c JOIN web_pages w ON w.url = c.url)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(min(ts_us) AS BIGINT) AS first_us,
       CAST(max(ts_us) AS BIGINT) AS last_us,
       CAST((max(ts_us) - min(ts_us)) // 86400000000 AS BIGINT)
         AS span_days
FROM m GROUP BY cluster_id HAVING count(*) >= 2"""
