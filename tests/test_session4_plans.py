"""Plan audits for the r5 session-4 scale-sensitive operators.

- pmi_collocations / zipf_fit top-N must plan as TakeOrderedAndProject
  (per-partition top-k), never a global Window sort of the whole term
  table.
- triangle_count / co_citation must contain no CartesianProduct and no
  BroadcastNestedLoopJoin beyond the documented benign one-row
  count-crossJoin rides (<= the number of fixture crossJoins).
- dataset_digest must be a single-exchange aggregation (one shuffle for
  the final groupBy, no join).
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pmi_topk_plan(docs):
    from contentextractor_spark.functions.analysis import pmi_collocations

    plan = _physical(pmi_collocations(docs, min_count=5, k=50))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_zipf_topn_plan(docs):
    from contentextractor_spark.functions.analysis import zipf_fit

    plan = _physical(zipf_fit(docs, top_n=256))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_graph_plans_no_cartesian(spark, docs):
    import __spark_entry__ as entry

    for name in ("triangle_count", "co_citation", "degree_histogram"):
        df = entry.queries()[name](spark, SF_DIR)
        plan = _physical(df)
        assert "CartesianProduct" not in plan, (name, plan)
        # the ONLY nested-loop joins allowed are the benign one-row
        # broadcast count rides from the fixture edge builder
        assert plan.count("BroadcastNestedLoopJoin") <= 2, (name, plan)


def test_dataset_digest_single_exchange_no_join(docs):
    from contentextractor_spark.functions.analysis import dataset_digest

    plan = _physical(dataset_digest(docs, n_shards=16))
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    # map-side combine: a partial_count/partial_sum hashaggregate must
    # sit below the exchange
    assert plan.count("HashAggregate") == 2, plan
