"""Relational demonstration queries over the TPC-H-style star schema.

The reference has zero relational algebra (SURVEY.md §2.7); these exist to
prove the engine side of the graft: broadcast-joined dimensions, map-side
combinable aggregations, ranking windows — each DuckDB-oracle-checkable.

Money columns are summed in integer CENTS (`round(x*100)` per row, then
BIGINT sum) so cross-engine equality is exact — double sums of different
association orders differ in the last ulps and would flake a value-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _cents(col):
    return F.round(col * 100).cast("long")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped: per (returnflag, linestatus) totals."""
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_c"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_suppliers(lineitem: DataFrame, supplier: DataFrame, k: int = 10) -> DataFrame:
    """Revenue per supplier, top-k; the supplier dim broadcasts."""
    rev = lineitem.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_c"
        )
    )
    joined = rev.join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
    w = Window.orderBy(F.col("revenue_c").desc(), F.col("s_suppkey").asc())
    return (
        joined.select("s_suppkey", "s_name", "revenue_c")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def region_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue per region through the 4-join chain; every dimension side is
    broadcast — the fact table never shuffles for the joins, only for the
    final small aggregation."""
    return (
        lineitem.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_c"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14-shaped: promo vs total discounted revenue per part brand.
    Integer-cent numerator and denominator instead of the ratio — exact
    cross-engine; the part dimension broadcasts."""
    disc_c = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type").startswith("PROMO"), disc_c).otherwise(
        F.lit(0).cast("long")
    )
    return (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type")),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(promo).alias("promo_revenue_c"),
            F.sum(disc_c).alias("total_revenue_c"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def shipping_priority(
    lineitem: DataFrame, orders: DataFrame, k: int = 10
) -> DataFrame:
    """TPC-H Q3-shaped: top-k orders by revenue with priority context.
    Orders/customer broadcast; the fact table shuffles once for the
    per-order aggregation."""
    rev = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_c")
        )
    )
    joined = rev.join(
        F.broadcast(orders.select("o_orderkey", "o_orderdate", "o_orderpriority")),
        rev.l_orderkey == F.col("o_orderkey"),
    )
    w = Window.orderBy(F.col("revenue_c").desc(), F.col("l_orderkey").asc())
    return (
        joined.select("l_orderkey", "revenue_c", "o_orderdate", "o_orderpriority")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
