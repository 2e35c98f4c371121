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


def revenue_delta(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo_c: int = 5,
    disc_hi_c: int = 7,
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue-change: the single filter+agg
    scan whose whole point is PREDICATE PUSHDOWN — the date window,
    discount band, and quantity cap all reach the parquet scan
    (PushedFilters), so at 10^12 rows the job reads only matching
    row groups and two columns beyond the filter set.

    revenue = sum(extendedprice * discount) in integer TENTH-MILLI
    dollars: ext_c (cents) * disc_c (centi-discount, exact — the
    fixture's discounts are 1% steps) = 1e-4-dollar units, summed as
    BIGINT.  ext_c < 2^33 and disc_c <= 10, so no overflow.  Exact
    cross-engine; a double sum would flake the value-hash."""
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    win = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (F.col("l_discount") >= (disc_lo_c - 0.5) / 100.0)
        & (F.col("l_discount") <= (disc_hi_c + 0.5) / 100.0)
        & (F.col("l_quantity") < max_qty)
    )
    return win.agg(
        F.sum(_cents(F.col("l_extendedprice")) * disc_c).alias(
            "revenue_tenthmilli"
        ),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def returned_items(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: revenue lost to returns
    ('R' lines) per customer inside an order-date quarter, top-k
    customers with nation context.

    Shape: the date window prunes orders FIRST (pushed-down range), the
    returnflag filter prunes lineitem at its scan, the two fact joins
    shuffle on uniform keys (orderkey, custkey), nation broadcasts
    (true dimension), and top-k is orderBy().limit(k) →
    TakeOrderedAndProject with rank derived over the k survivors only
    (the top_suppliers policy).  Revenue in integer cents — exact."""
    win = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    ret = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_c"
        ),
    )
    per_cust = (
        ret.join(win, ret.l_orderkey == win.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_c").alias("revenue_c"))
    )
    j = per_cust.join(
        customer, per_cust.o_custkey == customer.c_custkey
    ).join(
        F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey
    )
    sel = j.select(
        "c_custkey",
        "c_name",
        F.col("n_name").alias("nation_name"),
        _cents(F.col("c_acctbal")).alias("acctbal_c"),
        "revenue_c",
    )
    order = [F.col("revenue_c").desc(), F.col("c_custkey").asc()]
    topk = sel.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def late_line_priority(
    lineitem: DataFrame, orders: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q12-shaped priority split of late shipments: per line
    status, how many LATE lines (shipped more than late_days after the
    order date — this schema carries no shipmode/commit/receipt dates)
    belong to critical-priority orders (1-URGENT/2-HIGH) vs the rest.
    The Q12 point survives the adaptation: one fact-fact equi-join with
    an inequality post-filter, then a conditional-aggregate split —
    never two passes over lineitem.

    Scale: the join shuffles on the uniform orderkey; the CASE split is
    a projection; output is |linestatus| rows.  Counts only — exact."""
    j = lineitem.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        lineitem.l_orderkey == F.col("o_orderkey"),
    ).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias(
            "high_line_count"
        ),
        F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias(
            "low_line_count"
        ),
    )


def supplier_part_types(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    exclude_brand: str = "Brand#13",
) -> DataFrame:
    """TPC-H Q16-shaped supplier-relationship count: distinct suppliers
    able to supply each (brand, type, size), excluding one brand and
    suppliers in arrears (s_acctbal < 0 stands in for Q16's complaint
    comment — this schema has no comments; supplier-part pairs come
    from observed lineitem, there is no partsupp).

    Shape: dedup the (partkey, suppkey) pairs FIRST (map-side
    combinable distinct on the uniform partkey) so the part join sees
    one row per relationship, not one per lineitem; bad suppliers leave
    via a broadcast LEFT-ANTI join (the dimension is small); the final
    count(DISTINCT suppkey) groups by the part attributes.

    Scale: the distinct is the only fact-sized shuffle; part joins on
    the uniform partkey with no hint (fact-sized at spec scale, AQE
    decides)."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    good = pairs.join(
        F.broadcast(bad),
        pairs.l_suppkey == F.col("s_suppkey"),
        "left_anti",
    )
    j = good.join(
        part.filter(F.col("p_brand") != exclude_brand),
        good.l_partkey == F.col("p_partkey"),
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt")
    )


def discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-shaped OR-of-three-branches revenue: each branch pins
    a brand with its own part-size and line-quantity band (no
    containers/shipmodes in this schema).  Reported PER BRANCH rather
    than Q19's single row so the row set is non-degenerate and each
    branch is separately hash-checked.

    The plan point: the OR-triple is ONE join + ONE disjunctive filter
    — not three scans unioned.  Catalyst pushes the common
    brand-membership predicate into the part scan; the quantity bands
    post-filter the joined rows.  Revenue in integer cents — exact."""
    # bands widened from the spec's so every branch is non-vacuous on
    # the 200-part sf0.001 fixture (the good_turing degenerate lesson;
    # 86/55/52 rows measured at sf0.001, 743/609/650 at sf0.01)
    branches = [
        ("Brand#12", 1, 50, 1, 15),
        ("Brand#23", 10, 50, 10, 25),
        ("Brand#15", 1, 45, 20, 35),
    ]
    cond = None
    for brand, s_lo, s_hi, q_lo, q_hi in branches:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        cond = c if cond is None else (cond | c)
    j = lineitem.join(
        part.filter(
            F.col("p_brand").isin([b[0] for b in branches])
        ).select("p_partkey", "p_brand", "p_size"),
        lineitem.l_partkey == F.col("p_partkey"),
    ).filter(cond)
    return j.groupBy("p_brand").agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).alias("revenue_c"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def waiting_suppliers(
    lineitem: DataFrame, supplier: DataFrame, k: int = 20
) -> DataFrame:
    """TPC-H Q21-shaped 'suppliers who kept orders waiting': in every
    multi-supplier order, the supplier whose lines shipped STRICTLY
    after every other supplier's (the sole latest shipper — this
    schema's stand-in for Q21's sole receipt>commit offender), counted
    per supplier, top-k.

    Q21's EXISTS(other supplier) + NOT EXISTS(other late supplier)
    double correlation collapses into one aggregate-then-join: per
    (orderkey, suppkey) take max(shipdate); per orderkey count
    suppliers, take the global max and COUNT THE ACHIEVERS of that max
    — 'sole latest' is n_at_max = 1, no anti-join, no second pass over
    lineitem.  Timestamps are only compared (max/equality), never
    differenced — no epoch conversion, no TZ dependence.

    Scale: two map-side-combinable groupBys on the uniform orderkey +
    one join between them (both already partitioned by orderkey —
    AQE reuses the exchange); supplier broadcasts; top-k is
    orderBy().limit(k) → TakeOrderedAndProject."""
    per_supp = lineitem.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.max("supp_last").alias("order_last"),
    )
    j = per_supp.join(per_order, "l_orderkey").filter(
        (F.col("n_supp") >= 2) & (F.col("supp_last") == F.col("order_last"))
    )
    sole = (
        j.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_at_max"),
            F.max("l_suppkey").alias("the_supp"),
        )
        .filter(F.col("n_at_max") == 1)
    )
    waits = sole.groupBy("the_supp").agg(
        F.count(F.lit(1)).cast("long").alias("numwait")
    )
    out = waits.join(
        F.broadcast(supplier), waits.the_supp == supplier.s_suppkey
    ).select(
        F.col("the_supp").alias("s_suppkey"), "s_name", "numwait"
    )
    order = [F.col("numwait").desc(), F.col("s_suppkey").asc()]
    topk = out.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w).cast("int"))


def idle_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    lapsed_since: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q22-shaped 'global sales opportunity': per nation (phone
    prefixes don't exist here), the count and total balance of
    customers whose account balance beats the average POSITIVE balance
    yet who have placed NO ORDER since `lapsed_since` — above-average
    wealth, lapsed engagement.  (Q22's literal never-ordered set is
    EMPTY on this fixture — every customer orders at sf0.001 — so the
    recency window keeps the anti-join non-vacuous: 5 customers at
    sf0.001, 55 at sf0.01, measured.)

    The two Q22 subqueries survive intact: the scalar AVG rides a
    one-row broadcast crossJoin and the threshold is integer
    CROSS-MULTIPLIED (bal_c * n_pos > sum_pos_c — no float division,
    exact at the boundary where avg comparisons flake); the NOT EXISTS
    is a left-anti join against the distinct order custkeys.

    Scale: the anti-join shuffles on the uniform custkey; everything
    else is dimension-sized.  Balances in integer cents."""
    bal_c = _cents(F.col("c_acctbal"))
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_c).alias("sum_pos_c"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    cust = customer.select(
        "c_custkey", "c_nationkey", bal_c.alias("bal_c")
    )
    rich = (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_pos_c"))
        .drop("sum_pos_c", "n_pos")
    )
    recent = (
        orders.filter(
            F.col("o_orderdate") >= F.lit(lapsed_since).cast("timestamp")
        )
        .select("o_custkey")
        .distinct()
    )
    never = rich.join(
        recent, rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return (
        never.join(
            F.broadcast(nation),
            never.c_nationkey == nation.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("bal_c").alias("totacctbal_c"),
        )
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    nation_name: str = "NATION_2",
    p_type_part: DataFrame | None = None,
) -> DataFrame:
    """TPC-H Q8-shaped national market share: within one customer
    REGION's purchases of one part type, the per-order-year revenue
    share supplied by one NATION — the classic two-role nation join
    (customer side picks the market, supplier side picks the
    competitor).

    share_milli = nation_rev * 1000 div total_rev, both sums in
    integer cents (exact; a double ratio would flake the hash).

    Shape: part-type filter prunes at the part scan and semi-joins
    lineitem; orders carries the year; customer→nation→region
    restricts the market with two broadcast dims; supplier→nation
    tags the origin (broadcast).  One (year) groupBy with a
    conditional sum — the share needs no second pass."""
    rev = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_c"
        ),
    )
    if p_type_part is not None:
        rev = rev.join(
            p_type_part.select(F.col("p_partkey").alias("l_partkey")),
            "l_partkey",
        )
    mkt_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nationkey"))
    )
    mkt_cust = customer.join(F.broadcast(mkt_nations), "c_nationkey").select(
        F.col("c_custkey").alias("o_custkey")
    )
    ords = orders.join(mkt_cust, "o_custkey").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    )
    supp = supplier.join(
        F.broadcast(nation),
        supplier.s_nationkey == nation.n_nationkey,
    ).select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("n_name").alias("supp_nation"),
    )
    j = rev.join(ords, "l_orderkey").join(F.broadcast(supp), "l_suppkey")
    return (
        j.groupBy("o_year")
        .agg(
            F.sum(
                F.when(
                    F.col("supp_nation") == nation_name, F.col("rev_c")
                ).otherwise(F.lit(0))
            ).alias("nation_rev_c"),
            F.sum("rev_c").alias("total_rev_c"),
        )
        .select(
            "o_year",
            "nation_rev_c",
            "total_rev_c",
            F.expr(
                "nation_rev_c * 1000 div greatest(total_rev_c, 1)"
            ).alias("share_milli"),
        )
    )


def product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_word: str = "widget",
) -> DataFrame:
    """TPC-H Q9-shaped product-line amount by supplier nation and
    order year, for parts whose name contains `name_word`.  ADAPTED:
    the fixture has no partsupp/supplycost, so the metric is revenue
    (extendedprice net of discount, integer cents), not profit — the
    join topology (part name filter → lineitem → orders year →
    supplier nation) is the Q9 shape the planner cares about.

    Shape: the part filter semi-joins lineitem at its scan side; the
    orders join carries only (orderkey, year); supplier+nation ride
    as one broadcast dim."""
    pp = part.filter(F.col("p_name").contains(name_word)).select(
        F.col("p_partkey").alias("l_partkey")
    )
    rev = lineitem.join(pp, "l_partkey").select(
        "l_orderkey",
        "l_suppkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev_c"
        ),
    )
    ords = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    )
    supp = supplier.join(
        F.broadcast(nation),
        supplier.s_nationkey == nation.n_nationkey,
    ).select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("n_name").alias("nation_name"),
    )
    return (
        rev.join(ords, "l_orderkey")
        .join(F.broadcast(supp), "l_suppkey")
        .groupBy("nation_name", "o_year")
        .agg(
            F.sum("rev_c").alias("amount_c"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def small_qty_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#13",
    frac_num: int = 1,
    frac_den: int = 5,
    years: int = 7,
) -> DataFrame:
    """TPC-H Q17-shaped small-quantity-order revenue: for one brand's
    parts, the revenue of lines whose quantity is below frac_num/
    frac_den of that part's average line quantity — the 'would
    eliminating tiny orders matter' report.

    Integer conventions: the fixture's quantities are integral —
    cast long and compare frac_den * qty * n_p < frac_num * sumq_p
    (cross-multiplied, no division at all); avg_yearly_c = total
    cents div `years` (the Q17 /7.0 as an integer div, non-negative).

    Shape: one per-part aggregate over lineitem (map-side
    combinable), re-joined on l_partkey (uniform key) — the classic
    correlated-subquery-to-aggregate-join rewrite; the brand filter
    semi-joins both sides at the part scan."""
    pp = part.filter(F.col("p_brand") == brand).select(
        F.col("p_partkey").alias("l_partkey")
    )
    li = lineitem.join(F.broadcast(pp), "l_partkey")
    ag = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_p"),
        F.sum(F.col("l_quantity").cast("long")).alias("sumq_p"),
    )
    j = li.join(ag, "l_partkey").filter(
        F.lit(frac_den)
        * F.col("l_quantity").cast("long")
        * F.col("n_p")
        < F.lit(frac_num) * F.col("sumq_p")
    )
    return j.agg(
        F.coalesce(
            F.sum(_cents(F.col("l_extendedprice"))), F.lit(0)
        ).alias("total_c"),
        F.count(F.lit(1)).alias("n_lines"),
    ).select(
        F.expr(f"total_c div {years}").alias("avg_yearly_c"),
        "total_c",
        "n_lines",
    )


def promo_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_prefix: str = "hot",
    date_from: str = "1997-01-01",
    date_to: str = "1998-01-01",
    min_qty: int = 300,
) -> DataFrame:
    """TPC-H Q20-shaped promotion-candidate suppliers: suppliers who
    shipped more than `min_qty` units of `name_prefix`* parts inside
    the date window, with nation context.  ADAPTED: the fixture has
    no partsupp availqty, so the Q20 'availqty > half of shipped'
    correlation becomes a shipped-quantity threshold — the join
    topology (part name prefix → lineitem window → supplier groupBy →
    dim join) is the Q20 shape.

    Shape: date window + prefix filter both push to their scans; one
    supplier groupBy (map-side combinable); nation broadcasts."""
    pp = part.filter(F.col("p_name").startswith(name_prefix)).select(
        F.col("p_partkey").alias("l_partkey")
    )
    win = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    )
    per = (
        win.join(F.broadcast(pp), "l_partkey")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"))
        .filter(F.col("qty_sum") > min_qty)
    )
    return (
        per.join(supplier, per.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation.n_nationkey,
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation_name"),
            "qty_sum",
        )
    )
