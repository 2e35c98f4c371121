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
