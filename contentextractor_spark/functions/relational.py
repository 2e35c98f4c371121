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
    """Revenue per supplier, top-k; the supplier dim broadcasts.

    Top-k plan (VERDICT r2 #1): orderBy().limit(k) — Spark plans this as
    TakeOrderedAndProject, a DISTRIBUTED top-k (each partition keeps its own
    k rows before the merge).  The earlier global un-partitioned
    Window.orderBy forced the entire per-supplier aggregate through ONE
    task's sort — fine at sf0.1, a scale-killer at 10^12 lineitems.  The
    rank window now runs over only the k surviving rows (plan-audited)."""
    rev = lineitem.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_c"
        )
    )
    joined = rev.join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
    order = [F.col("revenue_c").desc(), F.col("s_suppkey").asc()]
    topk = joined.select("s_suppkey", "s_name", "revenue_c").orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def region_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue per region through the 4-join chain.

    Broadcast policy (VERDICT r2 #2): nation (25 rows) and region (5) are
    TRUE dimensions at every scale factor — force-broadcast them.  orders
    (~1.5B rows at sf1000) and customer (~150M) are NOT: a forced
    F.broadcast there OOMs the driver/executors at 100× scale, so those two
    joins carry no hint and AQE picks the strategy (it still broadcasts
    them at sf0.1, falls back to shuffle joins at scale)."""
    return (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
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
    # part is fact-sized (~200M rows at sf1000) — no broadcast hint; AQE
    # broadcasts at small SF and shuffle-joins at scale (VERDICT r2 #2)
    return (
        lineitem.join(
            part.select("p_partkey", "p_brand", "p_type"),
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

    orders is fact-sized (~1.5B rows at sf1000) — no broadcast hint, AQE
    decides (VERDICT r2 #2).  Top-k via orderBy().limit(k) →
    TakeOrderedAndProject: distributed per-partition top-k instead of the
    old global Window sort that funneled every per-order aggregate
    (~10^9 rows at sf1000) through a single task (VERDICT r2 #1).  The
    rank window runs over only the k surviving rows."""
    rev = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_c")
        )
    )
    joined = rev.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        rev.l_orderkey == F.col("o_orderkey"),
    )
    order = [F.col("revenue_c").desc(), F.col("l_orderkey").asc()]
    topk = (
        joined.select("l_orderkey", "revenue_c", "o_orderdate", "o_orderpriority")
        .orderBy(*order)
        .limit(k)
    )
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def order_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q4-shaped: orders placed in [date_from, date_to) with at
    least one LATE line (l_shipdate > o_orderdate — this schema carries
    no commit/receipt dates, so lateness is ship-after-order), counted
    per order priority.  The left-semi join shape: the EXISTS probe
    never duplicates orders however many lines are late, and Spark
    hash-joins on the equi key (orderkey) with the inequality as a
    post-probe filter.

    Scale: the date window prunes the orders scan first (pushed-down
    range predicate); the semi-join shuffles on the uniform orderkey;
    the final groupBy has |priorities| rows.  Counts only — exact."""
    win = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    late = win.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


def large_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty_c: int = 15000,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total line quantity exceeds the
    threshold (150 units = 15000 centi-units here), joined back to
    order and customer detail, top-k by order value — the
    AGGREGATE-THEN-JOIN shape: the HAVING filter prunes ~80% of
    orderkeys BEFORE any wide row is built, so the expensive joins see
    only survivors.  The inverted form (join first, aggregate later)
    ships every lineitem's customer payload through the shuffle — the
    classic Q18 plan mistake.

    Scale: the qty rollup is map-side combinable on the uniform
    orderkey; orders and customer carry NO broadcast hint (fact-sized
    at 10^12 rows — AQE decides, the dimension-hint policy); top-k is
    orderBy().limit(k) → TakeOrderedAndProject (distributed, no single
    global sort), rank derived over the k survivors only."""
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > min_qty_c)
    )
    j = qty.join(orders, qty.l_orderkey == orders.o_orderkey).join(
        customer, orders.o_custkey == customer.c_custkey
    )
    sel = j.select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        "o_orderdate",
        _cents(F.col("o_totalprice")).alias("total_price_c"),
        "sum_qty_c",
    )
    order = [F.col("total_price_c").desc(), F.col("o_orderkey").asc()]
    topk = sel.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q7-shaped, generalized to ALL cross-border nation pairs
    (the two-nation literal form is vacuous at small SF — the
    good_turing degenerate-fixture lesson): revenue per (supp_nation,
    cust_nation, ship year) where the supplier's nation differs from
    the customer's, inside the date window.  The topology is the
    point: TWO independent dimension chains meet at lineitem —
    supplier (broadcast dim) resolves the selling nation, orders →
    customer (fact-sized, NO hint) resolves the buying nation, and the
    tiny nation table broadcasts twice under different aliases.

    Scale: the date window is a pushed-down range predicate on the
    lineitem scan; the only real shuffles are the two fact joins on
    uniform keys (orderkey, custkey); the final groupBy cardinality is
    nations² × years.  Revenue in integer cents — exact."""
    win = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("sk"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("ck"),
        F.col("n_name").alias("cust_nation"),
    )
    j = (
        win.join(
            F.broadcast(supplier), win.l_suppkey == supplier.s_suppkey
        )
        .join(orders, win.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue_c"),
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
    )


def customer_order_histogram(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13-shaped: distribution of customers by order count,
    INCLUDING the zero-order customers the inner join would silently
    drop — (c_count, custdist).  The left-outer + coalesce(0) shape is
    the point: a churn/coverage report that misses never-ordering
    customers overstates engagement.

    Scale: one map-side-combinable groupBy(o_custkey) over orders, one
    left join back to the customer dim on the uniform custkey, one tiny
    histogram aggregate.  Counts only — exact."""
    per = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        customer.join(
            per, customer["c_custkey"] == per["o_custkey"], "left"
        )
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


def min_cost_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """TPC-H Q2-shaped min-cost supplier, re-sourced from lineitem
    (this dataset has no partsupp): per part, the supplier with the
    cheapest observed UNIT price — the correlated-min shape
    (min per group, pick the row achieving it) that Q2 spells as a
    correlated subquery.  Spark-first: the min + its achiever collapse
    into ONE packed argmin aggregate, min(unit_c * 2^20 + suppkey) —
    a min-min objective (cheapest unit, tie -> smallest suppkey), so
    plain min() IS the argmin (revisit_records' rule) and there is no
    join-back, no second aggregate, no window.

    unit_c = ext_c * 100 div qty_c is exact integer cents/unit on both
    engines (all operands non-negative, so Spark div == DuckDB //).
    Packing refused per row (unit_c < 2^42, suppkey < 2^20).

    Scale: one map-side-combinable groupBy(partkey) over lineitem;
    supplier and nation broadcast (dimensions); part joins on the
    uniform partkey with NO hint (fact-sized at spec scale — the
    dimension-hint policy, AQE decides).  Output: (p_partkey, p_name,
    s_suppkey, s_name, nation_name, unit_cost_c)."""
    unit_c = F.expr(
        "(cast(round(l_extendedprice * 100) as long) * 100)"
        " div cast(round(l_quantity * 100) as long)"
    )
    sk = F.col("l_suppkey").cast("long")
    packed = F.when(
        (unit_c >= 0) & (unit_c < F.lit(2**42)) & (sk >= 0) & (sk < F.lit(2**20)),
        unit_c * F.lit(2**20) + sk,
    )
    guarded = lineitem.select(
        F.col("l_partkey").alias("pk"),
        F.when(
            packed.isNull(),
            F.raise_error(
                F.lit(
                    "min_cost_supplier: unit_c/suppkey outside packing "
                    "bounds (unit_c < 2^42, suppkey < 2^20)"
                )
            ).cast("long"),
        )
        .otherwise(packed)
        .alias("p"),
    )
    best = guarded.groupBy("pk").agg(F.min("p").alias("bp"))
    picked = best.select(
        "pk",
        F.pmod("bp", F.lit(2**20)).alias("best_suppkey"),
        F.shiftright("bp", 20).alias("unit_cost_c"),
    )
    return (
        picked.join(part, picked.pk == part.p_partkey)
        .join(
            F.broadcast(supplier),
            picked.best_suppkey == supplier.s_suppkey,
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation.n_nationkey,
        )
        .select(
            "p_partkey",
            "p_name",
            F.col("best_suppkey").alias("s_suppkey"),
            "s_name",
            F.col("n_name").alias("nation_name"),
            "unit_cost_c",
        )
    )


def important_parts(
    lineitem: DataFrame, mult_num: int = 5, mult_den: int = 4
) -> DataFrame:
    """TPC-H Q11-shaped 'important stock': parts whose revenue exceeds
    mult_num/mult_den times the AVERAGE per-part revenue — the
    global-threshold-subquery shape (Q11's HAVING > SUM(...) *
    fraction), made scale-free by expressing the fraction relative to
    n_parts so the row set is non-degenerate at every SF.  The default
    is 5/4: this dataset's per-part revenue is near-uniform (max/avg
    ~1.8), so an integer 2x threshold is VACUOUS — the good_turing
    degenerate-fixture lesson, hence a rational threshold.  Keep iff
    value_c * n_parts * mult_den > mult_num * total_c — integer
    cross-multiplication, no division in the predicate; share_micro =
    value_c * 10^6 div total_c reported for reading.  The product is
    refused via raise_error near 2^63.

    Scale: ONE map-side-combinable groupBy(partkey); the global total
    and part count ride a one-row broadcast crossJoin (never a second
    scan); the filter is a projection-level predicate."""
    val = lineitem.groupBy(F.col("l_partkey")).agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("value_c")
    )
    tot = val.agg(
        F.sum("value_c").alias("total_c"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    guarded = val.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "value_c",
        "total_c",
        F.when(
            F.col("value_c")
            > F.lit(2**62) / (F.col("n_parts") * F.lit(int(mult_den))),
            F.raise_error(
                F.lit("important_parts: value_c * n_parts overflows")
            ).cast("long"),
        )
        .otherwise(F.col("value_c") * F.col("n_parts") * F.lit(int(mult_den)))
        .alias("scaled"),
    )
    return (
        guarded.filter(
            F.col("scaled") > F.lit(int(mult_num)) * F.col("total_c")
        )
        .select(
            "l_partkey",
            "value_c",
            F.expr("value_c * 1000000 div total_c").alias("share_micro"),
        )
    )
