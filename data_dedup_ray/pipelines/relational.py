"""Relational operators over the TPC-H-style tables — the generic
query shapes (scan-filter-aggregate, multi-stage equi-join, semi-join,
join + top-k) expressed through the same sortless ``hash_exchange`` the
dedup pipelines use.

The reference has no joins or general aggregations at all (SURVEY.md
§2.6); these operators exist to show the engine's exchange/combiner
machinery is a general query substrate, not dedup-only.  They also
exercise the driver's TPC-H tables (customer/orders/lineitem/nation),
which no dedup pipeline touches.

Money arithmetic is EXACT integer fixed-point on both sides: prices are
``round(x*100)`` cents and discounts ``round(x*100)`` percent, so every
aggregate is a BIGINT sum — float summation order can never make the Ray
and DuckDB sides disagree.  ``revenue_c100`` = cents × (100 − disc_pct),
i.e. money scaled by 10^4.

Scale shapes
------------
- ``pricing_summary``: per-batch partial aggregation (combiner) → a
  groupby over ≤ |flags×statuses| rows.  Shuffle volume is O(groups ×
  batches), independent of row count.
- ``revenue_by_nation``: two co-partitioned exchanges (orders⋈customer
  on custkey, result⋈lineitem on orderkey) with per-batch revenue
  pre-aggregation per orderkey; the 25-row nation dimension is a
  broadcast dict, never a shuffle side.
- ``late_order_counts``: semi-join made algebraic — the lineitem side
  collapses to max(shipdate) per orderkey in the map-side combiner, so
  the EXISTS test is one comparison per order inside its partition.
- ``top_revenue_orders``: per-batch revenue partials → orderkey
  exchange (each order's total lands whole) → per-partition top-k →
  global sort+limit over ≤ P×k rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_dedup_ray.engine.exchange import hash_exchange, key_partition

#: Q1-style as-of cutoff and Q3-style order-date cutoff (driver queries)
SHIP_CUTOFF = "2000-12-01"
ORDER_CUTOFF = "1998-01-01"


def _cents(col: pa.ChunkedArray) -> pa.Array:
    # half_towards_infinity == DuckDB round()'s half-away-from-zero for
    # the non-negative money/discount columns; pyarrow's default
    # half_to_even would diverge on exact .5 products
    return pc.round(
        pc.multiply(col, 100.0), round_mode="half_towards_infinity"
    ).cast(pa.int64())


def _key_part(vals: np.ndarray, P: int) -> np.ndarray:
    return key_partition(vals, P)


# --------------------------------------------------------------------------
# Q1 shape: scan → filter → combiner → tiny groupby
# --------------------------------------------------------------------------


def pricing_summary(sf_dir: str, *, cutoff: str = SHIP_CUTOFF) -> ray.data.Dataset:
    """Per (returnflag, linestatus): total quantity, base price (cents),
    discounted price (cents×100) and line count, for lines shipped on or
    before ``cutoff``."""
    from ray.data.aggregate import Sum

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cut = pd.Timestamp(cutoff)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cut)))
        ep = _cents(t["l_extendedprice"])
        disc = _cents(t["l_discount"])  # percent, 0..100
        qty = pc.round(t["l_quantity"]).cast(pa.int64())
        rev = pc.multiply(ep, pc.subtract(pa.scalar(100, pa.int64()), disc))
        flat = pa.table({
            "l_returnflag": t["l_returnflag"].combine_chunks(),
            "l_linestatus": t["l_linestatus"].combine_chunks(),
            "qty": qty, "base": ep, "disc_rev": rev,
            "one": pa.array(np.ones(len(t), np.int64)),
        })
        g = flat.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc_rev", "sum"),
             ("one", "sum")]
        )
        return g.rename_columns([
            "l_returnflag", "l_linestatus", "sum_qty",
            "sum_base_price_cents", "sum_disc_price_c100", "count_order",
        ])

    return (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum(on="sum_qty", alias_name="sum_qty"),
            Sum(on="sum_base_price_cents", alias_name="sum_base_price_cents"),
            Sum(on="sum_disc_price_c100", alias_name="sum_disc_price_c100"),
            Sum(on="count_order", alias_name="count_order"),
        )
    )


def pricing_summary_sql(cutoff: str = SHIP_CUTOFF) -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
         AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
         AS sum_disc_price_c100,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '{cutoff}'
GROUP BY l_returnflag, l_linestatus"""


# --------------------------------------------------------------------------
# Q5 shape: two-stage co-partitioned join + broadcast dimension
# --------------------------------------------------------------------------


def _lineitem_revenue_partials(sf_dir: str, P: int) -> ray.data.Dataset:
    """lineitem → per-batch revenue partials per orderkey, bucketed."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        ep = _cents(t["l_extendedprice"])
        disc = _cents(t["l_discount"])
        rev = pc.multiply(ep, pc.subtract(pa.scalar(100, pa.int64()), disc))
        flat = pa.table({
            "o_orderkey": t["l_orderkey"].combine_chunks(), "rev": rev,
        })
        g = flat.group_by(["o_orderkey"]).aggregate([("rev", "sum")])
        g = g.rename_columns(["o_orderkey", "revenue_c100"])
        keys = g["o_orderkey"].to_numpy(zero_copy_only=False)
        return g.append_column("_part", pa.array(_key_part(keys, P)))

    return li.map_batches(partial, batch_format="pyarrow")


_LI_PART_SCHEMA = pa.schema([
    ("o_orderkey", pa.int64()), ("revenue_c100", pa.int64()),
])


def _combine_li(t: pa.Table) -> pa.Table:
    return (
        t.group_by(["o_orderkey", "_part"])
        .aggregate([("revenue_c100", "sum")])
        .rename_columns(["o_orderkey", "_part", "revenue_c100"])
    )


def revenue_by_nation(
    sf_dir: str, *, num_partitions: int = 16
) -> ray.data.Dataset:
    """Total lineitem revenue per customer nation:
    ``(n_name, revenue_c100, n_orders)``.

    orders⋈customer co-partitioned on custkey, the result⋈lineitem
    co-partitioned on orderkey, nation names attached from a broadcast
    25-row dict."""
    import ray

    P = num_partitions
    nation = pd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nation_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def prep_cust(t: pa.Table) -> pa.Table:
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": t["c_custkey"].combine_chunks(),
            "c_nationkey": t["c_nationkey"].combine_chunks(),
            "_part": pa.array(_key_part(keys, P)),
        })

    def prep_orders(t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": t["o_orderkey"].combine_chunks(),
            "o_custkey": t["o_custkey"].combine_chunks(),
            "_part": pa.array(_key_part(keys, P)),
        })

    def join_cust(odf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        out = odf.merge(
            cdf, left_on="o_custkey", right_on="c_custkey", how="inner"
        )[["o_orderkey", "c_nationkey"]]
        return out.reset_index(drop=True)

    ord_nation = hash_exchange(
        [
            orders.map_batches(prep_orders, batch_format="pyarrow"),
            cust.map_batches(prep_cust, batch_format="pyarrow"),
        ],
        join_cust,
        num_partitions=P,
        schema=pa.schema([
            ("o_orderkey", pa.int64()), ("c_nationkey", pa.int64()),
        ]),
        in_schemas=[
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
            pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
        ],
    )

    def rekey_orders(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return t.append_column("_part", pa.array(_key_part(keys, P)))

    def join_li(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        rev = ldf.groupby("o_orderkey", sort=False, as_index=False)[
            "revenue_c100"
        ].sum()
        out = odf.merge(rev, on="o_orderkey", how="inner")
        agg = out.groupby("c_nationkey", sort=False).agg(
            revenue_c100=("revenue_c100", "sum"),
            n_orders=("o_orderkey", "nunique"),
        )
        return agg.reset_index()

    per_nation = hash_exchange(
        [
            ord_nation.map_batches(rekey_orders, batch_format="pyarrow"),
            _lineitem_revenue_partials(sf_dir, P),
        ],
        join_li,
        num_partitions=P,
        schema=pa.schema([
            ("c_nationkey", pa.int64()), ("revenue_c100", pa.int64()),
            ("n_orders", pa.int64()),
        ]),
        in_schemas=[
            pa.schema([
                ("o_orderkey", pa.int64()), ("c_nationkey", pa.int64()),
            ]),
            _LI_PART_SCHEMA,
        ],
        pre=[None, _combine_li],
    )

    from ray.data.aggregate import Sum

    class _AttachNation:
        def __init__(self, ref):
            self.names = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["c_nationkey"].to_pylist()
            return pa.table({
                "n_name": pa.array([self.names[k] for k in keys], pa.string()),
                "revenue_c100": t["revenue_c100"].combine_chunks(),
                "n_orders": t["n_orders"].combine_chunks(),
            })

    from data_dedup_ray.util import stage_task

    return (
        per_nation.map_batches(
            stage_task(_AttachNation, ref=nation_ref), batch_format="pyarrow"
        )
        .groupby("n_name")
        .aggregate(
            Sum(on="revenue_c100", alias_name="revenue_c100"),
            Sum(on="n_orders", alias_name="n_orders"),
        )
    )


def revenue_by_nation_sql() -> str:
    return """
SELECT n.n_name,
       CAST(sum(r.revenue_c100) AS BIGINT) AS revenue_c100,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN (SELECT l_orderkey,
             sum(CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT)))
               AS revenue_c100
      FROM lineitem GROUP BY l_orderkey) r  -- sum re-cast at outer level
  ON r.l_orderkey = o.o_orderkey
GROUP BY n.n_name"""


# --------------------------------------------------------------------------
# Q4 shape: algebraic semi-join (EXISTS → max-per-key comparison)
# --------------------------------------------------------------------------


def late_order_counts(
    sf_dir: str, *, num_partitions: int = 16
) -> ray.data.Dataset:
    """Orders with at least one line shipped AFTER the order date,
    counted per priority: ``(o_orderpriority, n_orders)``.

    The EXISTS probe never materializes pairs: the lineitem side's
    combiner keeps only max(l_shipdate) per orderkey, so the exchange
    carries one row per order per side and the test is a comparison."""
    P = num_partitions
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    )

    def prep_orders(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": t["o_orderkey"].combine_chunks(),
            "o_orderdate_us": t["o_orderdate"].combine_chunks().cast(pa.int64()),
            "o_orderpriority": t["o_orderpriority"].combine_chunks(),
            "_part": pa.array(_key_part(keys, P)),
        })

    def prep_li(t: pa.Table) -> pa.Table:
        flat = pa.table({
            "o_orderkey": t["l_orderkey"].combine_chunks(),
            "max_ship_us": t["l_shipdate"].combine_chunks().cast(pa.int64()),
        })
        g = flat.group_by(["o_orderkey"]).aggregate([("max_ship_us", "max")])
        g = g.rename_columns(["o_orderkey", "max_ship_us"])
        keys = g["o_orderkey"].to_numpy(zero_copy_only=False)
        return g.append_column("_part", pa.array(_key_part(keys, P)))

    def combine_li(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["o_orderkey", "_part"])
            .aggregate([("max_ship_us", "max")])
            .rename_columns(["o_orderkey", "_part", "max_ship_us"])
        )

    def semi(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        # the pre combiner is per split group — finish the max here
        ldf = ldf.groupby("o_orderkey", sort=False, as_index=False)[
            "max_ship_us"
        ].max()
        m = odf.merge(ldf, on="o_orderkey", how="inner")
        late = m[m["max_ship_us"] > m["o_orderdate_us"]]
        out = late.groupby("o_orderpriority", sort=False).size()
        return out.rename("n_orders").reset_index()

    partials = hash_exchange(
        [
            orders.map_batches(prep_orders, batch_format="pyarrow"),
            li.map_batches(prep_li, batch_format="pyarrow"),
        ],
        semi,
        num_partitions=P,
        schema=pa.schema([
            ("o_orderpriority", pa.string()), ("n_orders", pa.int64()),
        ]),
        in_schemas=[
            pa.schema([
                ("o_orderkey", pa.int64()), ("o_orderdate_us", pa.int64()),
                ("o_orderpriority", pa.string()),
            ]),
            pa.schema([
                ("o_orderkey", pa.int64()), ("max_ship_us", pa.int64()),
            ]),
        ],
        pre=[None, combine_li],
    )
    from ray.data.aggregate import Sum

    return partials.groupby("o_orderpriority").aggregate(
        Sum(on="n_orders", alias_name="n_orders")
    )


def late_order_counts_sql() -> str:
    return """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority"""


# --------------------------------------------------------------------------
# Q3 shape: join + global top-k with per-partition prune
# --------------------------------------------------------------------------


def top_revenue_orders(
    sf_dir: str, *, k: int = 10, cutoff: str = ORDER_CUTOFF,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """The ``k`` highest-revenue orders placed before ``cutoff``:
    ``(o_orderkey, o_orderdate_us, revenue_c100)``; ties broken by
    orderkey so the result is unique."""
    P = num_partitions
    cut = pd.Timestamp(cutoff)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def prep_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": t["o_orderkey"].combine_chunks(),
            "o_orderdate_us": t["o_orderdate"].combine_chunks().cast(pa.int64()),
            "_part": pa.array(_key_part(keys, P)),
        })

    def topk_part(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        rev = ldf.groupby("o_orderkey", sort=False, as_index=False)[
            "revenue_c100"
        ].sum()
        m = odf.merge(rev, on="o_orderkey", how="inner")
        m = m.sort_values(
            ["revenue_c100", "o_orderkey"], ascending=[False, True],
            kind="stable",
        ).head(k)
        return m[["o_orderkey", "o_orderdate_us", "revenue_c100"]]

    cands = hash_exchange(
        [
            orders.map_batches(prep_orders, batch_format="pyarrow"),
            _lineitem_revenue_partials(sf_dir, P),
        ],
        topk_part,
        num_partitions=P,
        schema=pa.schema([
            ("o_orderkey", pa.int64()), ("o_orderdate_us", pa.int64()),
            ("revenue_c100", pa.int64()),
        ]),
        in_schemas=[
            pa.schema([
                ("o_orderkey", pa.int64()), ("o_orderdate_us", pa.int64()),
            ]),
            _LI_PART_SCHEMA,
        ],
        pre=[None, _combine_li],
    )
    return cands.sort(
        ["revenue_c100", "o_orderkey"], descending=[True, False]
    ).limit(k)


def top_revenue_orders_sql(k: int = 10, cutoff: str = ORDER_CUTOFF) -> str:
    return f"""
SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us,
       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
            AS BIGINT) AS revenue_c100
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < TIMESTAMP '{cutoff}'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue_c100 DESC, o.o_orderkey LIMIT {k}"""
