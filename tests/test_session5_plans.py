"""Plan audits for the r5 session-5 scale-sensitive operators.

- phrase_search must be join-free (the anchor trick is two hashaggs over
  one filtered posexplode) and the phrase-term filter must sit BELOW the
  first exchange (pre-shuffle pruning).
- weighted_sample must be exchange-free (a pure scan-side projection +
  filter — the sampling decision never shuffles).
- recrawl_priority must shuffle exactly once, on url (the window), with
  the final aggregate map-side-combined on the same partitioning (no
  second exchange).
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_phrase_search_plan_join_free(docs):
    from contentextractor_spark.functions.analysis import phrase_search

    plan = _physical(phrase_search(docs, ["table", "scan"]))
    assert "Join" not in plan, plan
    # two aggregation exchanges ((doc_id, anchor) then doc_id), no more
    assert plan.count("Exchange") <= 2, plan
    # the term filter prunes BEFORE the generate's output is shuffled
    assert "Filter" in plan and "Generate" in plan, plan


def test_weighted_sample_plan_shuffle_free(docs):
    from contentextractor_spark.functions.analysis import weighted_sample

    plan = _physical(weighted_sample(docs, w_max=300))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_recrawl_priority_single_url_shuffle(spark, docs):
    import sys

    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _revisit_snaps
    from contentextractor_spark.functions.analysis import recrawl_priority

    plan = _physical(recrawl_priority(_revisit_snaps(docs)))
    # one exchange for the url window; the groupBy(url) reuses the
    # window's hashpartitioning(url) so no second shuffle appears
    assert plan.count("Exchange") == 1, plan
    assert "hashpartitioning" in plan, plan


def test_bfs_and_ppr_run_from_checkpoints(spark, docs, monkeypatch):
    # r6: below GRAPH_DRIVER_MAX_EDGES the iteration replays on the
    # driver and the result is a LocalTableScan (nothing left to
    # re-execute at all); force the distributed loop to keep auditing
    # the localCheckpoint lineage cut (the pagerank re-execution lesson)
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from contentextractor_spark.functions import analysis as A

    for name in ("crawl_depth", "personalized_ppr"):
        df = entry.queries()[name](spark, SF_DIR)
        plan = _physical(df)
        assert "LocalTableScan" in plan, (name, plan)
        assert "Exchange" not in plan, (name, plan)
    monkeypatch.setattr(A, "GRAPH_DRIVER_MAX_EDGES", 0)
    for name in ("crawl_depth", "personalized_ppr"):
        df = entry.queries()[name](spark, SF_DIR)
        plan = _physical(df)
        assert "Scan ExistingRDD" in plan, (name, plan)
        assert "Exchange" not in plan, (name, plan)
