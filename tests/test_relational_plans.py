"""Plan audits for the scale-sensitive relational/events queries.

VERDICT r2 #1/#2: the three top-k queries must plan as a DISTRIBUTED
top-k (TakeOrderedAndProject — per-partition limit + merge) instead of a
global un-partitioned Window sort that funnels the whole aggregate through
one task; and the fact-sized join sides (orders/customer/part) must carry
NO forced broadcast hint (AQE decides), while true dimensions
(nation/region/supplier) keep theirs.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tpch(spark):
    return {
        t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        for t in ("lineitem", "orders", "customer", "supplier", "part",
                  "nation", "region")
    }


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _hint_count(df) -> int:
    # forced broadcast hints survive into the optimized logical plan as
    # join-side annotations: leftHint/rightHint=(strategy=broadcast)
    return df._jdf.queryExecution().optimizedPlan().toString().count(
        "strategy=broadcast"
    )


def _assert_distributed_topk(df):
    plan = _physical(df)
    assert "TakeOrderedAndProject" in plan, plan
    # the rank window must sit ABOVE the limit (operate on k rows), never
    # directly over the full aggregate: no Exchange SinglePartition feeding
    # a Sort of the aggregate output
    assert "Exchange SinglePartition" not in plan, plan


def test_top_suppliers_plan_and_values(tpch):
    from contentextractor_spark.functions.relational import top_suppliers

    out = top_suppliers(tpch["lineitem"], tpch["supplier"], k=5)
    _assert_distributed_topk(out)
    rows = out.orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    revs = [r.revenue_c for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_shipping_priority_plan_and_values(tpch):
    from contentextractor_spark.functions.relational import shipping_priority

    out = shipping_priority(tpch["lineitem"], tpch["orders"], k=5)
    _assert_distributed_topk(out)
    # orders is fact-sized: no forced broadcast hint anywhere in the plan
    assert _hint_count(out) == 0
    rows = out.orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]


def test_top_users_plan_and_values(events):
    from contentextractor_spark.functions.events import top_users_by_value

    out = top_users_by_value(events, k=5)
    _assert_distributed_topk(out)
    rows = out.orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    vals = [r.total_value_c for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_region_revenue_hints_only_on_dimensions(tpch):
    from contentextractor_spark.functions.relational import region_revenue

    out = region_revenue(
        tpch["lineitem"], tpch["orders"], tpch["customer"],
        tpch["nation"], tpch["region"],
    )
    # exactly the two true dimensions (nation, region) are hinted
    assert _hint_count(out) == 2
    assert out.count() == 5  # five regions


def test_promo_share_no_forced_broadcast(tpch):
    from contentextractor_spark.functions.relational import promo_revenue_share

    out = promo_revenue_share(tpch["lineitem"], tpch["part"])
    assert _hint_count(out) == 0
    assert out.count() > 0


def test_top_suppliers_matches_window_form(tpch):
    """The limit(k) rewrite must return EXACTLY the rows the old global
    window form returned (same oracle): re-derive via a driver-side sort."""
    from contentextractor_spark.functions.relational import top_suppliers

    li, su = tpch["lineitem"], tpch["supplier"]
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                           * 100).cast("long")).alias("revenue_c"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "revenue_c")
        .collect()
    )
    expected = sorted(rev, key=lambda r: (-r.revenue_c, r.s_suppkey))[:5]
    got = top_suppliers(li, su, k=5).orderBy("rank").collect()
    assert [(r.s_suppkey, r.revenue_c) for r in got] == [
        (r.s_suppkey, r.revenue_c) for r in expected
    ]


def test_large_orders_plan_and_values(tpch):
    from contentextractor_spark.functions.relational import large_orders

    out = large_orders(
        tpch["lineitem"], tpch["orders"], tpch["customer"],
        min_qty_c=15000, k=20,
    )
    _assert_distributed_topk(out)
    # orders AND customer are fact-sized: no forced broadcast hint
    assert _hint_count(out) == 0
    rows = out.orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 20
    prices = [r.total_price_c for r in rows]
    assert prices == sorted(prices, reverse=True)
    # the HAVING threshold really binds
    assert all(r.sum_qty_c > 15000 for r in rows)


def test_volume_shipping_plan_and_values(tpch):
    from contentextractor_spark.functions.relational import volume_shipping

    out = volume_shipping(
        tpch["lineitem"], tpch["orders"], tpch["customer"],
        tpch["supplier"], tpch["nation"],
    )
    # exactly the dimension sides are hinted: supplier + nation twice
    assert _hint_count(out) == 3
    rows = out.collect()
    assert rows, "cross-border pairs must be populated at sf0.001"
    assert all(r.supp_nation != r.cust_nation for r in rows)
    assert all(1995 <= r.l_year <= 1996 for r in rows)
    assert all(r.n_lineitems >= 1 for r in rows)


def test_returned_items_plan_and_values(tpch):
    from contentextractor_spark.functions.relational import returned_items

    out = returned_items(
        tpch["lineitem"], tpch["orders"], tpch["customer"],
        tpch["nation"], k=5,
    )
    _assert_distributed_topk(out)
    rows = out.orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    revs = [r.revenue_c for r in rows]
    assert revs == sorted(revs, reverse=True)
    # only nation carries a forced broadcast hint
    assert _hint_count(out) == 1


def test_waiting_suppliers_sole_latest_semantics(spark):
    from contentextractor_spark.functions.relational import waiting_suppliers

    import datetime
    t = lambda d: datetime.datetime(2024, 1, d)
    li = spark.createDataFrame(
        [
            # order 1: supp 7 ships last, strictly -> counted for 7
            (1, 7, t(9)), (1, 7, t(5)), (1, 3, t(4)),
            # order 2: suppliers 3 and 7 TIE at the max -> nobody counted
            (2, 3, t(6)), (2, 7, t(6)),
            # order 3: single supplier -> excluded (n_supp < 2)
            (3, 7, t(8)),
            # order 4: supp 3 ships last
            (4, 3, t(7)), (4, 7, t(2)),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp_ntz",
    )
    supp = spark.createDataFrame(
        [(3, "S3"), (7, "S7")], "s_suppkey long, s_name string"
    )
    rows = {r.s_suppkey: r.numwait
            for r in waiting_suppliers(li, supp, k=10).collect()}
    assert rows == {3: 1, 7: 1}


def test_waiting_suppliers_plan(tpch):
    from contentextractor_spark.functions.relational import waiting_suppliers

    out = waiting_suppliers(tpch["lineitem"], tpch["supplier"], k=5)
    _assert_distributed_topk(out)


def test_idle_customers_threshold_and_lapse(spark):
    from contentextractor_spark.functions.relational import idle_customers

    import datetime
    cust = spark.createDataFrame(
        [
            # positive balances: 100.00, 200.00, 300.00 -> avg 200.00
            (1, 100.00, 10), (2, 200.00, 10), (3, 300.00, 10),
            # negative balance never passes (below any positive avg)
            (4, -50.00, 11),
            # above avg but ordered recently -> excluded
            (5, 250.00, 11),
        ],
        "c_custkey long, c_acctbal double, c_nationkey int",
    )
    orders = spark.createDataFrame(
        [
            (100, 5, datetime.datetime(2001, 1, 1)),   # recent
            (101, 3, datetime.datetime(1999, 1, 1)),   # stale: 3 stays
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz",
    )
    nat = spark.createDataFrame(
        [(10, "N10"), (11, "N11")], "n_nationkey int, n_name string"
    )
    rows = idle_customers(cust, orders, nat).collect()
    # bal*n > sum: 300*3=900 > 600 yes; 250*3=750 > 600 yes but recent;
    # 200*3=600 NOT > 600 (strict boundary, exactly avg excluded)
    assert len(rows) == 1
    assert rows[0].nation_name == "N10"
    assert rows[0].numcust == 1
    assert rows[0].totacctbal_c == 30000


def test_revenue_delta_filters_pushed(tpch):
    from contentextractor_spark.functions.relational import revenue_delta

    out = revenue_delta(tpch["lineitem"])
    plan = _physical(out)
    # the date/discount/quantity predicates must reach the parquet scan
    assert "PushedFilters: [" in plan, plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400], plan


def test_discounted_revenue_single_join(tpch):
    from contentextractor_spark.functions.relational import (
        discounted_revenue,
    )

    out = discounted_revenue(tpch["lineitem"], tpch["part"])
    plan = _physical(out)
    # the OR-triple is ONE join, not three unioned scans
    assert plan.count("Scan parquet") == 2, plan
    rows = out.collect()
    assert {r.p_brand for r in rows} == {
        "Brand#12", "Brand#23", "Brand#15"
    }


def test_market_share_plan_and_values(tpch):
    from contentextractor_spark.functions.relational import market_share

    out = market_share(
        tpch["lineitem"], tpch["orders"], tpch["customer"],
        tpch["supplier"], tpch["nation"], tpch["region"],
        p_type_part=tpch["part"].filter(F.col("p_type") == "ECONOMY"),
    )
    # exactly the four dim-side hints (region, nation in both roles,
    # supplier) — facts (lineitem/orders/customer/part) never hinted
    assert _hint_count(out) == 4
    plan = _physical(out)
    assert "Exchange SinglePartition" not in plan, plan
    rows = out.collect()
    assert len(rows) >= 5  # one row per order year
    for r in rows:
        assert 0 <= r["nation_rev_c"] <= r["total_rev_c"]
        assert 0 <= r["share_milli"] <= 1000


def test_promo_suppliers_pushdown(tpch):
    from contentextractor_spark.functions.relational import promo_suppliers

    out = promo_suppliers(
        tpch["lineitem"], tpch["supplier"], tpch["nation"], tpch["part"]
    )
    plan = _physical(out)
    # the ship-date window must reach the lineitem parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1][:400], plan
    rows = out.collect()
    assert rows and all(r["qty_sum"] > 300 for r in rows)


def test_small_qty_revenue_values(tpch):
    from contentextractor_spark.functions.relational import (
        small_qty_revenue,
    )

    r = small_qty_revenue(tpch["lineitem"], tpch["part"]).collect()[0]
    assert r["n_lines"] > 0  # the threshold bites on the fixture
    assert r["avg_yearly_c"] == r["total_c"] // 7
